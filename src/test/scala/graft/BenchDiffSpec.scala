package graft

import org.scalatest.funsuite.AnyFunSuite

/** BenchDiff's parsing/diffing core — pure text, no SparkSession: the
  * artifact-tail unwrap (including surrounding raw text), per-query
  * median extraction from both line shapes, truncation tolerance, and
  * the regression computation Bench's trailer embeds.
  */
class BenchDiffSpec extends AnyFunSuite {

  private val bigLine =
    """{"metric":"total","value":12.5,"unit":"sec","queries":{"q_a":1.5,"q_b":2.0,"q_fail":-1.0},""" +
      """"queries_stats":{"q_a":{"median":1.5,"tmean":1.6,"n":5,"min":1.4,"max":1.9},"q_b":{"median":2.0,"tmean":2.1,"n":5,"min":1.9,"max":2.4}},""" +
      """"failed":{"q_fail":"boom"},"iters":5,"sf":"/x"}"""
  private val trailer =
    """{"metric":"bench_summary","total":12.5,"unit":"sec","n_queries":2,"stream":{"curation_docs_per_sec":900,"stream_reps":3},"failed_n":1,"iters":5,"sf":"/x"}"""

  test("raw stdout passes through; queries parse from stats first, plain map fills gaps, -1 dropped") {
    val text = BenchDiff.extractText(bigLine + "\n" + trailer)
    assert(text == bigLine + "\n" + trailer)
    val qs = BenchDiff.parseQueries(text)
    assert(qs == Map("q_a" -> 1.5, "q_b" -> 2.0), qs)
    // totals prefer the trailer's summary header
    assert(BenchDiff.parseTotal(text).contains(12.5))
  }

  test("driver artifact tail unwraps, keeping the raw text around it") {
    val artifact =
      s"""{"n":12,"rc":0,"tail":"${bigLine.replace("\\", "\\\\").replace("\"", "\\\"")}\\n","parsed":{"total":12.5}}"""
    val text = BenchDiff.extractText(artifact)
    assert(text.contains(""""q_a":{"median":1.5"""), text.take(200))
    // surrounding raw text survives the unwrap (the r11 review fix):
    // the header BEFORE the tail and the parsed echo AFTER it
    assert(text.startsWith("""{"n":12,"rc":0,"""))
    assert(text.contains(""""parsed":{"total":12.5}"""))
    assert(BenchDiff.parseQueries(text) == Map("q_a" -> 1.5, "q_b" -> 2.0))
  }

  test("truncated-front tail still yields the medians it contains") {
    // keep only the last 120 chars of the big line (the r09/r10 shape)
    val cut = bigLine.takeRight(160)
    val qs = BenchDiff.parseQueries(cut)
    assert(qs.contains("q_b"), qs) // whatever survived parses
    assert(!qs.values.exists(_ < 0))
  }

  test("bench_full artifact: round extraction, below-round prev resolution, prefer-full upgrade") {
    assert(BenchDiff.artifactRound("BENCH_r13.json").contains(13))
    assert(BenchDiff.artifactRound("bench_full_r7.json").contains(7))
    assert(BenchDiff.artifactRound("CORRECTNESS_r13.json").isEmpty)

    val dir = java.nio.file.Files.createTempDirectory("benchdiff").toFile
    def put(name: String, text: String): java.io.File = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.write(f.toPath, text.getBytes("UTF-8"))
      f
    }
    put("BENCH_r12.json", """{"n":12,"tail":"\"queries_stats\":{\"q_a\":{\"median\":1.0}}"}""")
    put("BENCH_r13.json", """{"n":13,"tail":"\"queries_stats\":{\"q_a\":{\"median\":2.0}}"}""")
    val full13 =
      """{"metric":"bench_full","round":13,"total":9.5,"unit":"sec","n_queries":2,""" +
        """"queries":{"q_a":3.0,"q_b":6.5},"queries_stats":{"q_a":{"median":3.0,"tmean":3.0,"n":5,"min":2.9,"max":3.2},"q_b":{"median":6.5,"tmean":6.4,"n":5,"min":6.1,"max":7.0}},"failed":{},"iters":5,"sf":"/x"}"""
    put("bench_full_r13.json", full13)

    // below-round guard: asking below 14 yields r13; below 13 yields r12;
    // below 12 yields nothing (self-comparison impossible)
    assert(BenchDiff.newestArtifactBelow(dir, """BENCH_r\d+\.json""", 14)
      .exists(_.endsWith("BENCH_r13.json")))
    assert(BenchDiff.newestArtifactBelow(dir, """bench_full_r\d+\.json""", 14)
      .exists(_.endsWith("bench_full_r13.json")))
    assert(BenchDiff.newestArtifactBelow(dir, """BENCH_r\d+\.json""", 13)
      .exists(_.endsWith("BENCH_r12.json")))
    assert(BenchDiff.newestArtifactBelow(dir, """bench_full_r\d+\.json""", 13).isEmpty)

    // a BENCH_r13 path upgrades to its complete bench_full_r13 sibling:
    // the truncated tail only knows q_a, the full artifact knows both
    val viaDriver = BenchDiff.loadFile(new java.io.File(dir, "BENCH_r13.json").getPath)
    assert(viaDriver._1 == Map("q_a" -> 3.0, "q_b" -> 6.5), viaDriver._1)
    assert(viaDriver._2.contains(9.5)) // bench_full header total parses
    // r12 has no full sibling → tail parse as before
    val viaTail = BenchDiff.loadFile(new java.io.File(dir, "BENCH_r12.json").getPath)
    assert(viaTail._1 == Map("q_a" -> 1.0))
  }

  test("regressions: shared queries past threshold only, worst first") {
    val prev = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_gone" -> 5.0)
    val cur = Map("q_a" -> 1.5, "q_b" -> 2.1, "q_new" -> 9.0)
    val regs = BenchDiff.regressions(prev, cur, threshold = 1.3)
    // q_a 1.5x > 1.3 → flagged; q_b 1.05x → not; q_new/q_gone unshared
    assert(regs.map(_._1) == Seq("q_a"), regs)
    val (_, p, c, r) = regs.head
    assert(p == 1.0 && c == 1.5 && math.abs(r - 1.5) < 1e-9)
    // threshold is strict: exactly 1.3x does not flag
    assert(BenchDiff.regressions(Map("q" -> 1.0), Map("q" -> 1.3)).isEmpty)
    // a zero/negative prev never divides
    assert(BenchDiff.regressions(Map("q" -> 0.0), Map("q" -> 9.0)).isEmpty)
  }

  test("n-guard: n=1 medians never flag (suppressed + disclosed), n<3 marks the verdict unreliable") {
    val prev = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0)
    val cur = Map("q_a" -> 20.0, "q_b" -> 2.0, "q_c" -> 1.05)
    // q_a regressed 20x but has ONE sample → suppressed, not flagged
    // (the r17 artifact's 127-phantom failure mode); q_b at n=2 flags
    val (regs, suppressed, unreliable) = BenchDiff.guardedRegressions(
      prev, cur, Map("q_a" -> 1, "q_b" -> 2, "q_c" -> 5))
    assert(regs.map(_._1) == Seq("q_b"), regs)
    assert(suppressed == 1)
    assert(unreliable) // q_a and q_b sit below the n >= 3 protocol
    // all-n>=3 run: no suppression, verdict trustworthy
    val (regs2, sup2, unrel2) = BenchDiff.guardedRegressions(
      prev, cur, Map("q_a" -> 5, "q_b" -> 5, "q_c" -> 5))
    assert(regs2.map(_._1) == Seq("q_a", "q_b"), regs2)
    assert(sup2 == 0 && !unrel2)
    // a query MISSING from curN counts as n=0: suppressed + unreliable
    val (regs3, sup3, unrel3) =
      BenchDiff.guardedRegressions(prev, cur, Map("q_b" -> 5, "q_c" -> 5))
    assert(regs3.map(_._1) == Seq("q_b") && sup3 == 1 && unrel3)
    // RESHAPED rule (round 20): a thin-sampled query BELOW the
    // threshold neither suppresses nor marks the verdict unreliable —
    // reliability is judged only where a flag is in question, so a
    // budget-clamped run whose flagged set was topped up to n >= 3
    // produces a verdict that can speak
    val (regs4, sup4, unrel4) = BenchDiff.guardedRegressions(
      prev, cur, Map("q_a" -> 5, "q_b" -> 5, "q_c" -> 1))
    assert(regs4.map(_._1) == Seq("q_a", "q_b"), regs4)
    assert(sup4 == 0 && !unrel4)
  }

  test("topup targets: past-threshold queries below targetN, median-based, deterministic order") {
    val prev = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0, "q_d" -> 1.0)
    val samples = Map(
      "q_a" -> List(2.0),             // past threshold, n=1 → target
      "q_b" -> List(2.0, 2.1, 1.9),   // past threshold but n=3 → done
      "q_c" -> List(1.05),            // under threshold → not a target
      "q_d" -> List(0.5, 9.0),        // MEDIAN 4.75 past threshold, n=2
      "q_new" -> List(9.0))           // unshared → never a target
    assert(BenchDiff.topupTargets(prev, samples) == Seq("q_a", "q_d"))
    // a topped-up query leaves the set once its median drops back
    assert(BenchDiff.topupTargets(prev,
      samples + ("q_a" -> List(2.0, 1.0, 1.0))) == Seq("q_d"))
    assert(BenchDiff.topupTargets(prev,
      samples + ("q_d" -> List(0.5, 9.0, 0.6))) == Seq("q_a"))
  }
}
