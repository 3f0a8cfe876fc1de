package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry.table

/** Remaining relational-operator and scalar-function coverage
  * (SURVEY §2.2 P2-P9, §2.3 J5/J6/J10-J12, §2.4 A9/A10/A16, §2.6 O1-O4,
  * §2.8 function categories, §2.1 S3/S6/S8 shapes).
  */
object QueriesRel {

  // ------------------------------------------------------------------
  // Projections / filters
  // ------------------------------------------------------------------

  /** P2/P3/P4 — name-selector projection (startsWith/contains), rename,
    * drop (load_data.py:243's `~s.contains("_right")` anti-select shape).
    */
  def q_p2p3p4_projection(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val kept = o.columns.filter(c => c.startsWith("o_") && !c.contains("priority"))
    o.select(kept.toIndexedSeq.map(col): _*)
      .withColumnRenamed("o_totalprice", "total")
      .drop("o_orderstatus")
      .withColumn("total", round(col("total"), 4))
  }

  /** P6/J12 — membership filter as a left_semi join (never a collected
    * isin list, impute.py:100-105 shape).
    */
  def q_p6_semi_filter(spark: SparkSession, dir: String): DataFrame = {
    val bigSpenders = table(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("c_custkey"))
    table(spark, dir, "customer")
      .join(bigSpenders, Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** J12 — anti join: customers with no qualifying order. */
  def q_j12_anti(spark: SparkSession, dir: String): DataFrame = {
    val bigSpenders = table(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("c_custkey"))
    table(spark, dir, "customer")
      .join(bigSpenders, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"))
  }

  /** P7 — boolean-mask conditional update (df.loc[mask, col] = v). */
  def q_p7_conditional_update(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .withColumn("adj_price",
        when(col("l_discount") > 0.05, col("l_extendedprice") * 0.95)
          .otherwise(col("l_extendedprice")))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line"),
        round(col("adj_price"), 4).as("adj_price"))

  /** P8 — validator gating: null-out the measure where the validator
    * fails (the reference's INTENT at aggregate.py:403-406; its
    * `is False` comparison is a no-op bug not reproduced, SURVEY P8).
    */
  def q_p8_validator_gate(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("validate_value", col("event_type") =!= "error")
      .withColumn("gated",
        when(col("validate_value") === false, lit(null)).otherwise(col("value")))
      .select(col("event_id"), col("validate_value"),
        round(col("gated"), 6).as("gated"))

  /** P9 — null-introspection report (load_data.py:410-473 shape). */
  def q_p9_null_report(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("gated", when(col("event_type") =!= "error", col("value")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("gated")).as("n_present"),
        count(when(col("gated").isNull, 1)).as("n_missing"))

  // ------------------------------------------------------------------
  // Joins / set ops
  // ------------------------------------------------------------------

  /** J6 — full-outer assembly of two aggregates (aggregate.py:530-539;
    * the engine's single-pass agg makes this an artifact, demonstrated
    * for parity).
    */
  def q_j6_full_outer(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val r = li.filter(col("l_returnflag") === "R").groupBy("l_suppkey")
      .agg(round(sum("l_quantity"), 2).as("qty_r"))
    val a = li.filter(col("l_returnflag") === "A").groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_a"))
    r.join(a, Seq("l_suppkey"), "full_outer")
  }

  /** J10 — sibling aggregates joined on keys (the sound replacement for
    * the reference's positional concat, SURVEY §7.4.7).
    */
  def q_j10_key_join(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val m = ev.groupBy("user_id").agg(round(avg("value"), 6).as("avg_v"))
    val x = ev.groupBy("user_id").agg(round(max("value"), 6).as("max_v"))
    m.join(x, Seq("user_id"))
  }

  /** S3/S8/J11/P6 — multi-source combine: two stamped scans unioned by
    * name, then the Meenemen include-filter as a broadcast semi-join
    * against the index (aggregate.py:84-121 shape; the real glob+
    * input_file_name path is Sources.combineHouseholds, unit-tested).
    */
  def q_s3_combine(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val a = ev.filter(col("event_type").isin("view", "click"))
      .withColumn("src", lit("batch_a"))
    val b = ev.filter(col("event_type").isin("purchase", "signup"))
      .withColumn("src", lit("batch_b"))
    val index = ev.select(col("user_id")).distinct()
      .withColumn("Meenemen", pmod(col("user_id"), lit(3L)) =!= 0)
    val combined = a.unionByName(b)
    combined.join(broadcast(index.filter(col("Meenemen")).select("user_id")),
        Seq("user_id"), "left_semi")
      .select(col("event_id"), col("user_id"), col("src"))
  }

  /** S6 — in-memory literal table joined against a scanned dimension. */
  def q_s6_memtable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val zones = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"), (3L, "delta"),
      (4L, "epsilon")).toDF("r_regionkey", "zone")
    table(spark, dir, "region")
      .join(broadcast(zones), Seq("r_regionkey"), "left")
      .select(col("r_regionkey"), col("r_name"), col("zone"))
  }

  // ------------------------------------------------------------------
  // Aggregates / sorts / limits
  // ------------------------------------------------------------------

  /** A9/A10 — distinct pairs + unique-values report. */
  def q_a9_distinct(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select("user_id", "event_type").distinct()

  def q_a10_unique_report(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents").select("lang", "source").distinct()

  /** A16 — rollup producing house- and project-level summaries in one
    * pass (the optional improvement SURVEY notes over the reference's
    * two separate passes).
    */
  def q_a16_rollup(spark: SparkSession, dir: String): DataFrame =
    // exactMean, not round(avg): the grand-total group is the whole
    // table, whose exact mean can land on a 6dp half-step where the two
    // engines' double sums (different association) disagree
    table(spark, dir, "events")
      .withColumn("project", pmod(col("user_id"), lit(5L)))
      .rollup("project", "user_id")
      .agg(count(lit(1)).as("n"),
        graft.etd.Aggregates.exactMean(col("value")).as("avg_v"))

  /** §2.7 — intersect/except (absent in the reference, free in Spark):
    * users seen purchasing AND erroring; users purchasing but never
    * erroring.
    */
  def q_setops(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val purchasers = ev.filter(col("event_type") === "purchase").select("user_id")
    val erroring = ev.filter(col("event_type") === "error").select("user_id")
    purchasers.intersect(erroring).withColumn("op", lit("both"))
      .unionByName(purchasers.except(erroring).withColumn("op", lit("purchase_only")))
  }

  /** O1/O4 — deterministic multi-key sort + limit. */
  def q_o1o4_sort_limit(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(100)

  /** O3/W4 — top-k per group via row_number. */
  def q_o3_topk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("bucket")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(spark, dir, "orders")
      .withColumn("bucket", pmod(col("o_custkey"), lit(10L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("bucket"), col("o_orderkey"),
        round(col("o_totalprice"), 4).as("price"), col("rn").cast("long").as("rn"))
  }

  // ------------------------------------------------------------------
  // Scalar-function categories (§2.8)
  // ------------------------------------------------------------------

  /** Strings: upper/trim/substring/lpad/concat/regexp_replace
    * (knmi.py:24-76, load_data.py:148-167, aggregate.py:322 safe-name).
    */
  def q_fn_string(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        trim(concat(lit("  "), col("p_type"), lit(" "))).as("type_t"),
        substring(col("p_name"), 1, 8).as("name8"),
        lpad(col("p_size").cast("string"), 4, "0").as("size4"),
        regexp_replace(col("p_type"), "\\W+", "_").as("safe_name"))

  /** Date/time: year/weekofyear/weekday/hour/date_format/interval
    * arithmetic (load_data.py:148-174, 301-305).
    */
  def q_fn_datetime(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_wk"),
        weekday(col("o_orderdate")).cast("long").as("wd"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("long").as("ymd"),
        date_format(col("o_orderdate") + expr("INTERVAL 14 DAYS"),
          "yyyy-MM-dd").as("plus14"))

  /** Math: the KNMI vapor-pressure formula (exp), log10/floor/abs/round
    * (knmi.py:77-98, impute.py:243-257).
    */
  def q_fn_math(spark: SparkSession, dir: String): DataFrame = {
    val t = col("value") / 10
    table(spark, dir, "events")
      .select(col("event_id"),
        round(lit(6.105) * exp(t * 17.27 / (t + lit(237.7))), 6).as("vapor"),
        round(log10(abs(col("value")) + 1), 6).as("log_mag"),
        floor(col("value")).as("flr"),
        round(abs(col("value")), 6).as("mag"))
  }

  /** Conditional/null: coalesce/when-cascade/zero-division guard
    * (calculated_columns.py:41-89, vectorized_impute.py:579-582 — Spark
    * double division yields Infinity, not null, so the guard is explicit).
    */
  def q_fn_conditional(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line"),
        coalesce(when(col("l_discount") > 0, col("l_discount")), lit(0.0))
          .as("disc_nz"),
        when(col("l_tax") =!= 0.0, round(col("l_discount") / col("l_tax"), 6))
          .as("ratio_guarded"),
        when(col("l_quantity") < 10, lit("small"))
          .when(col("l_quantity") < 30, lit("mid"))
          .otherwise(lit("large")).as("bucket3"))

  /** Casts: string<->number round-trips; double->long via explicit floor
    * (plain casts truncate in Spark but round in other engines — the
    * deterministic form is floor/round then cast).
    */
  def q_fn_casts(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier")
      .select(col("s_suppkey"),
        col("s_suppkey").cast("string").as("key_str"),
        concat(lit("S"), col("s_suppkey").cast("string")).as("tag"),
        floor(col("s_acctbal")).cast("long").as("bal_floor"),
        col("s_acctbal").cast("decimal(12,2)").cast("string").as("bal_2dp"))

  /** Bitwise: and/or/xor/shifts/bit_count (vectorized_impute.py:44-53,
    * impute.py:703-714).
    */
  def q_fn_bitwise(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier")
      .select(col("s_suppkey"),
        col("s_suppkey").bitwiseAND(15L).as("lo4"),
        col("s_suppkey").bitwiseOR(256L).as("or256"),
        col("s_suppkey").bitwiseXOR(85L).as("x85"),
        shiftleft(col("s_suppkey"), 3).as("shl3"),
        shiftright(col("s_suppkey"), 2).as("shr2"),
        bit_count(col("s_suppkey")).cast("long").as("popcnt"))

  /** Arrays: split/element_at/slice/array_distinct/sort/size
    * (A12/A15 plumbing).
    */
  def q_fn_array(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    table(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(w, 1).as("first_tok"),
        size(w).cast("long").as("n_tok"),
        size(array_distinct(w)).cast("long").as("n_uniq"),
        concat_ws("|", slice(array_sort(array_distinct(w)), 1, 3)).as("top3_sorted"))
  }

  /** Two-phase salted aggregation ([[graft.ops.Skew.saltedAggregate]])
    * over a plain GROUP BY oracle: salting must be invisible in the
    * result, which holds exactly because every aggregate here is
    * order-independent (decimal sum, long max, count) — the same
    * property that makes the engine 1000-executor-stable.
    */
  def q_skew_salted_agg(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedAggregate(
        table(spark, dir, "events")
          .withColumn("vdec", col("value").cast("decimal(28,10)"))
          .withColumn("n", col("user_id")),
        Seq("event_type"),
        Seq("vdec" -> "sum", "event_id" -> "max", "n" -> "count"),
        salt = 8)
      .select(col("event_type"),
        col("vdec").cast("decimal(20,6)").cast("double").as("sum_value"),
        col("event_id").as("max_event"),
        col("n"))

  /** Salted replicate-side join vs its unsalted twin: the salt spreads a
    * hot key over `salt` tasks, the oracle is the PLAIN join — salting
    * must be invisible in the result.
    */
  def q_skew_salted_join(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedJoin(
        table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")),
        table(spark, dir, "part").select(col("p_partkey").as("l_partkey"),
          col("p_name")),
        Seq("l_partkey"), salt = 8)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast("double").as("qty"), col("p_name"))

  // ------------------------------------------------------------------
  // Registry + oracles
  // ------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_salted_agg" -> (q_skew_salted_agg _),
    "q_skew_salted_join" -> (q_skew_salted_join _),
    "q_p2p3p4_projection" -> (q_p2p3p4_projection _),
    "q_p6_semi_filter" -> (q_p6_semi_filter _),
    "q_j12_anti" -> (q_j12_anti _),
    "q_p7_conditional_update" -> (q_p7_conditional_update _),
    "q_p8_validator_gate" -> (q_p8_validator_gate _),
    "q_p9_null_report" -> (q_p9_null_report _),
    "q_j6_full_outer" -> (q_j6_full_outer _),
    "q_j10_key_join" -> (q_j10_key_join _),
    "q_s3_combine" -> (q_s3_combine _),
    "q_s6_memtable" -> (q_s6_memtable _),
    "q_a9_distinct" -> (q_a9_distinct _),
    "q_a10_unique_report" -> (q_a10_unique_report _),
    "q_a16_rollup" -> (q_a16_rollup _),
    "q_setops" -> (q_setops _),
    "q_o1o4_sort_limit" -> (q_o1o4_sort_limit _),
    "q_o3_topk" -> (q_o3_topk _),
    "q_fn_string" -> (q_fn_string _),
    "q_fn_datetime" -> (q_fn_datetime _),
    "q_fn_math" -> (q_fn_math _),
    "q_fn_conditional" -> (q_fn_conditional _),
    "q_fn_casts" -> (q_fn_casts _),
    "q_fn_bitwise" -> (q_fn_bitwise _),
    "q_fn_array" -> (q_fn_array _),
  )

  val oracles: Map[String, String] = Map(
    "q_skew_salted_agg" ->
      """SELECT event_type,
        |  (sum(value::DECIMAL(28,10))::DECIMAL(20,6))::DOUBLE AS sum_value,
        |  max(event_id)::BIGINT AS max_event,
        |  count(user_id)::BIGINT AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q_skew_salted_join" ->
      """SELECT l.l_orderkey, l.l_partkey, l.l_quantity::DOUBLE AS qty, p.p_name
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin,
    "q_p2p3p4_projection" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS total, o_orderdate
        |FROM orders""".stripMargin,
    "q_p6_semi_filter" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""".stripMargin,
    "q_j12_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""".stripMargin,
    "q_p7_conditional_update" ->
      """SELECT l_orderkey, l_linenumber::BIGINT AS line,
        |  round(CASE WHEN l_discount > 0.05 THEN l_extendedprice * 0.95
        |    ELSE l_extendedprice END, 4) AS adj_price
        |FROM lineitem""".stripMargin,
    "q_p8_validator_gate" ->
      """SELECT event_id, (event_type <> 'error') AS validate_value,
        |  round(CASE WHEN NOT (event_type <> 'error') THEN NULL ELSE value END, 6) AS gated
        |FROM events""".stripMargin,
    "q_p9_null_report" ->
      """SELECT event_type, count(*) AS n,
        |  count(CASE WHEN event_type <> 'error' THEN value END) AS n_present,
        |  count(CASE WHEN (CASE WHEN event_type <> 'error' THEN value END) IS NULL
        |    THEN 1 END) AS n_missing
        |FROM events GROUP BY event_type""".stripMargin,
    "q_j6_full_outer" ->
      """WITH r AS (
        |  SELECT l_suppkey, round(sum(l_quantity), 2) AS qty_r FROM lineitem
        |  WHERE l_returnflag = 'R' GROUP BY 1
        |), a AS (
        |  SELECT l_suppkey, count(*) AS n_a FROM lineitem
        |  WHERE l_returnflag = 'A' GROUP BY 1
        |)
        |SELECT coalesce(r.l_suppkey, a.l_suppkey) AS l_suppkey, r.qty_r, a.n_a
        |FROM r FULL OUTER JOIN a ON r.l_suppkey = a.l_suppkey""".stripMargin,
    "q_j10_key_join" ->
      """SELECT user_id, round(avg(value), 6) AS avg_v, round(max(value), 6) AS max_v
        |FROM events GROUP BY user_id""".stripMargin,
    "q_s3_combine" ->
      """WITH combined AS (
        |  SELECT event_id, user_id, 'batch_a' AS src FROM events
        |  WHERE event_type IN ('view', 'click')
        |  UNION ALL
        |  SELECT event_id, user_id, 'batch_b' AS src FROM events
        |  WHERE event_type IN ('purchase', 'signup')
        |)
        |SELECT event_id, user_id, src FROM combined WHERE user_id % 3 <> 0""".stripMargin,
    "q_s6_memtable" ->
      """SELECT region.r_regionkey AS r_regionkey, r_name, z.zone
        |FROM region LEFT JOIN (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma'),
        |  (3, 'delta'), (4, 'epsilon')) z(r_regionkey, zone)
        |  ON region.r_regionkey = z.r_regionkey""".stripMargin,
    "q_a9_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q_a10_unique_report" ->
      "SELECT DISTINCT lang, source FROM documents",
    "q_a16_rollup" ->
      """SELECT user_id % 5 AS project, user_id, count(*) AS n,
        |  floor((sum(value::DECIMAL(28,12))::DOUBLE / count(value)) * 1000000 + 0.5) / 1000000 AS avg_v
        |FROM events GROUP BY ROLLUP (project, user_id)""".stripMargin,
    "q_setops" ->
      """SELECT user_id, 'both' AS op FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |UNION ALL
        |SELECT user_id, 'purchase_only' AS op FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'error')""".stripMargin,
    "q_o1o4_sort_limit" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS price FROM orders
        |ORDER BY price DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_o3_topk" ->
      """SELECT bucket, o_orderkey, round(o_totalprice, 4) AS price, rn::BIGINT AS rn
        |FROM (
        |  SELECT o_custkey % 10 AS bucket, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey % 10
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "q_fn_string" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        |  trim('  ' || p_type || ' ') AS type_t,
        |  substr(p_name, 1, 8) AS name8,
        |  lpad(p_size::VARCHAR, 4, '0') AS size4,
        |  regexp_replace(p_type, '\W+', '_', 'g') AS safe_name
        |FROM part""".stripMargin,
    "q_fn_datetime" ->
      """SELECT o_orderkey,
        |  year(o_orderdate)::BIGINT AS yr,
        |  weekofyear(o_orderdate)::BIGINT AS iso_wk,
        |  (isodow(o_orderdate) - 1)::BIGINT AS wd,
        |  strftime(o_orderdate, '%Y%m%d')::BIGINT AS ymd,
        |  strftime(o_orderdate + INTERVAL 14 DAY, '%Y-%m-%d') AS plus14
        |FROM orders""".stripMargin,
    "q_fn_math" ->
      """SELECT event_id,
        |  round(6.105 * exp((value/10) * 17.27 / ((value/10) + 237.7)), 6) AS vapor,
        |  round(log10(abs(value) + 1), 6) AS log_mag,
        |  floor(value)::BIGINT AS flr,
        |  round(abs(value), 6) AS mag
        |FROM events""".stripMargin,
    "q_fn_conditional" ->
      """SELECT l_orderkey, l_linenumber::BIGINT AS line,
        |  coalesce(CASE WHEN l_discount > 0 THEN l_discount END, 0.0) AS disc_nz,
        |  CASE WHEN l_tax <> 0.0 THEN round(l_discount / l_tax, 6) END AS ratio_guarded,
        |  CASE WHEN l_quantity < 10 THEN 'small'
        |       WHEN l_quantity < 30 THEN 'mid'
        |       ELSE 'large' END AS bucket3
        |FROM lineitem""".stripMargin,
    "q_fn_casts" ->
      """SELECT s_suppkey, s_suppkey::VARCHAR AS key_str,
        |  'S' || s_suppkey::VARCHAR AS tag,
        |  floor(s_acctbal)::BIGINT AS bal_floor,
        |  s_acctbal::DECIMAL(12,2)::VARCHAR AS bal_2dp
        |FROM supplier""".stripMargin,
    "q_fn_bitwise" ->
      """SELECT s_suppkey, s_suppkey & 15 AS lo4, s_suppkey | 256 AS or256,
        |  xor(s_suppkey, 85) AS x85, s_suppkey << 3 AS shl3,
        |  s_suppkey >> 2 AS shr2, bit_count(s_suppkey)::BIGINT AS popcnt
        |FROM supplier""".stripMargin,
    "q_fn_array" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id, w[1] AS first_tok, len(w)::BIGINT AS n_tok,
        |  len(list_distinct(w))::BIGINT AS n_uniq,
        |  array_to_string(list_sort(list_distinct(w))[1:3], '|') AS top3_sorted
        |FROM t""".stripMargin,
  )
}
