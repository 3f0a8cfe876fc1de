package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the within-run bench-contention detector (VERDICT r16 #1)
  * against the REAL poisoned and clean readings from the r15/r16
  * artifacts — the two driver rounds whose environment poisoning evaded
  * the whole-run offset rule. The decision function is pure; these are
  * the exact numbers it must separate.
  */
class BenchDetectorSpec extends AnyFunSuite {

  test("r16 poisoned readings alert: q_simhash 7.17s at cpu/wall 1.16 (20x pin)") {
    // BENCH_r16 (driver, poisoned): q_simhash 7.17 s, cpu/wall 1.16
    // vs pins 0.35 s / 1.90 — both the collapse and the slow gate trip
    val rs = Bench.alertReasons("q_simhash", 7.17, 1.0, 1.16)
    assert(rs.contains("cpu_wall_collapse"))
    assert(rs.contains("slow_vs_pin"))
  }

  test("r16 poisoned q_minhash_fast 18.15s alerts even with unknown dispersion") {
    val rs = Bench.alertReasons("q_minhash_fast", 18.15, 1.0, 1.5)
    assert(rs.contains("slow_vs_pin"))
    assert(rs.contains("cpu_wall_collapse"))
  }

  test("clean readings do NOT alert (r16 judge + r17 builder sessions)") {
    // q_simhash isolated judge rerun: 0.43 s at healthy ratio
    assert(Bench.alertReasons("q_simhash", 0.43, 1.2, 1.83).isEmpty)
    // r17 builder clean protocol values
    assert(Bench.alertReasons("q_simhash", 0.439, 1.3, 1.97).isEmpty)
    assert(Bench.alertReasons("q_minhash_fast", 1.18, 1.4, 4.43).isEmpty)
    assert(Bench.alertReasons("q_jaccard_join", 1.22, 1.5, 2.52).isEmpty)
  }

  test("JIT-warm-up family residuals stay under the alert band (attributed, not poisoned)") {
    // q_i7 judge reading 2.49 vs pin 1.63 (1.53x) at healthy cpu/wall;
    // q_kn_score judge 2.97 vs 1.89 (1.57x) — the documented warm-up
    // families must not trigger spurious reruns
    assert(Bench.alertReasons("q_i7_impute_cascade", 2.49, 1.8, 3.45).isEmpty)
    assert(Bench.alertReasons("q_kn_score", 2.97, 1.6, 3.24).isEmpty)
  }

  test("dispersion alone alerts, pinned or not") {
    assert(Bench.alertReasons("q_simhash", 0.43, 2.3, 1.9) == List("dispersion"))
    // a query without pins (new this round) still gets dispersion cover
    assert(Bench.alertReasons("q_not_pinned_yet", 9.9, 2.6, 0.4) ==
      List("dispersion"))
    assert(Bench.alertReasons("q_not_pinned_yet", 9.9, 1.4, 0.4).isEmpty)
  }

  test("collapse requires BOTH stolen cores and inflated wall") {
    // collapsed ratio at NORMAL wall (e.g. a genuinely I/O-light query
    // variant) must not alert...
    assert(Bench.alertReasons("q_simhash", 0.36, 1.1, 0.9).isEmpty)
    // ...and slow wall at HEALTHY ratio under 2.5x (a plausible real
    // regression inside the alert-free band) must not mark either
    assert(Bench.alertReasons("q_simhash", 0.80, 1.1, 2.0).isEmpty)
  }

  test("every headline query with a median pin also carries a cpu/wall pin") {
    val missing = Bench.headline.filter(q =>
      Bench.referenceMedians.contains(q) && !Bench.referenceCpuWall.contains(q))
    assert(missing.isEmpty, s"cpu/wall pins missing for: $missing")
  }

  test("cpu_vs_pin (r19): wall drift never fires it; a real CPU " +
      "regression fires it even when drift hides the wall") {
    // the r18 morning/evening pair ran IDENTICAL binaries: totals
    // 71.2 s at offset 0.92 vs 97.3 s at offset 1.20 — ~1.37x wall on
    // zero plan change, single-core throughput stable. A drifted-slow
    // reading (wall 1.37x pin, CPU at pin) must stay alert-free.
    // Arms are PIN-RELATIVE (r21: the ceilings re-derive each time a
    // clean session is folded in, so hardcoded CPU values would rot)
    val cpuPin = Bench.referenceCpuSec("q_pagerank")
    assert(Bench.alertReasons("q_pagerank", 3.53 * 1.37, 1.3,
      cpuPin / (3.53 * 1.37), cpuPin).isEmpty)
    // a REAL plan regression burns cores: CPU 3x pin. On a drifted-FAST
    // day the wall can sit under slow_vs_pin's 2.5x while the work
    // tripled — the load-independent gate is what catches it
    val rs = Bench.alertReasons("q_pagerank", 3.53 * 2.0, 1.3,
      (cpuPin * 3.0) / (3.53 * 2.0), cpuPin * 3.0)
    assert(rs == List("cpu_vs_pin"))
    // boundary: 2.5x CPU at healthy wall fires cpu_vs_pin alone (on a
    // pin big enough to clear the +2 s absolute-excess floor)
    assert(Bench.alertReasons("q_pagerank", 3.5, 1.2, 11.7, cpuPin * 2.6) ==
      List("cpu_vs_pin"))
    assert(Bench.alertReasons("q_pagerank", 3.5, 1.2, 10.8, cpuPin * 2.4)
      .isEmpty)
    // unpinned or unmeasured CPU (cpuSec <= 0, the default) never fires
    assert(Bench.alertReasons("q_not_pinned_yet", 1.0, 1.2, 2.0, 99.0)
      .isEmpty)
    assert(Bench.alertReasons("q_pagerank", 3.5, 1.2, 4.0).isEmpty)
  }

  test("sub-second contention spikes stay alert-free under the " +
      "absolute-excess floors (r19 close readings)") {
    // the r19 closing evening box (offsets 1.15-1.16, contended=false):
    // q_blocklist_filter wall 1.148 vs pin 0.40 (2.87x but +0.75 s) —
    // environment, not plan; clean under the +1 s wall floor
    assert(Bench.alertReasons("q_blocklist_filter", 1.148, 1.4, 0.9).isEmpty)
    // q_sitemap_entries' collapse-shaped sub-second reading: wall
    // 0.497 vs pin 0.20 at a collapsed cpu/wall ratio (pin 2.7) —
    // the ratio conditions hold but the +1 s floor suppresses
    assert(Bench.alertReasons("q_sitemap_entries", 0.497, 1.3, 0.8).isEmpty)
    // a GC landing on a tiny row triples its CPU-seconds without the
    // plan changing: q_embed_dup_ivf's spiked reading at pin + 1.8 s
    // clears the 2.5x ratio on a ~1 s pin but sits under the +2 s CPU
    // floor — the covering value for the cpuExcess branch (pin-relative
    // since r21: the ceilings re-derive per clean session)
    val ivfPin = Bench.referenceCpuSec("q_embed_dup_ivf")
    // the covering value (ratio fires, floor suppresses) only exists
    // while 2.5x·pin < pin + 2 s, i.e. pin < 1.33 — if the ceiling ever
    // grows past that, pick a smaller-pinned row for this arm
    assert(ivfPin < 1.33, s"q_embed_dup_ivf CPU pin $ivfPin too large " +
      "for the floor-covering arm — re-anchor this test on a <1.33 pin")
    assert(Bench.alertReasons("q_embed_dup_ivf", 0.55, 1.3, 3.0,
      math.max(ivfPin * 2.5, ivfPin + 1.8)).isEmpty)
    // ...and pin + 2.1 clears both the ratio and the floor — fires
    assert(Bench.alertReasons("q_embed_dup_ivf", 0.55, 1.3, 3.0,
      ivfPin + 2.01) == List("cpu_vs_pin"))
    // the floors must NOT absorb real poison: the r16 q_simhash row
    // (7.17 s over a 0.35 pin, +6.8 s) still alerts on both gates
    val rs = Bench.alertReasons("q_simhash", 7.17, 1.0, 1.16)
    assert(rs.contains("slow_vs_pin") && rs.contains("cpu_wall_collapse"))
  }

  test("every headline query with a median pin also carries a CPU-seconds pin") {
    val missing = Bench.headline.filter(q =>
      Bench.referenceMedians.contains(q) && !Bench.referenceCpuSec.contains(q))
    assert(missing.isEmpty, s"cpu-seconds pins missing for: $missing")
  }
}
