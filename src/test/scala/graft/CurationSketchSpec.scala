package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The sketch column of [[graft.ext.Curation.corpusProfile]]:
  * `approx_distinct_tokens` is HyperLogLog++ — deterministic (hash-based,
  * no RNG) but approximate and engine-specific, so it is deliberately
  * outside the cross-engine oracle contract (t_corpus_profile drops it).
  * This spec is its gate instead: per-domain error against the exact
  * distinct count stays within the configured relative standard
  * deviation's practical envelope, and determinism holds run-to-run.
  */
class CurationSketchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"
  private def corpusPresent = new java.io.File(s"$sf/documents.parquet").exists()

  test("approx distinct tokens per domain stays within the HLL error envelope of the exact count") {
    assume(corpusPresent)
    val docs = Tables.documents(spark, sf)
    val rsd = 0.05
    val approx = graft.ext.Curation.corpusProfile(docs, approxRsd = rsd)
      .select("source", "approx_distinct_tokens")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val exact = docs.filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source").agg(count_distinct(col("w")).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(approx.nonEmpty && exact.keySet.subsetOf(approx.keySet),
      s"every domain with tokens needs a sketch row: ${approx.keySet} vs ${exact.keySet}")
    exact.foreach { case (dom, n) =>
      val a = approx(dom)
      // 4× the configured rsd: HLL++'s error is a standard deviation,
      // not a hard bound — 4σ is the practical envelope (P ~ 6e-5 per
      // domain of exceeding it if the estimator meets its contract)
      val tol = math.max(4.0 * rsd * n, 4.0)
      assert(math.abs(a - n) <= tol,
        s"domain $dom: approx $a vs exact $n exceeds ±$tol (rsd $rsd)")
    }
    // deterministic: the sketch is hash-based, two runs agree exactly
    val again = graft.ext.Curation.corpusProfile(docs, approxRsd = rsd)
      .select("source", "approx_distinct_tokens")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(again == approx, "approx_count_distinct must be deterministic")
  }

  test("a tighter rsd tightens the estimate; domains with no text sketch to zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 500).map(i => s"w$i").mkString(" "), "A"),
      (2L, null.asInstanceOf[String], "B"))
      .toDF("doc_id", "text", "source")
    val p = graft.ext.Curation.corpusProfile(docs, approxRsd = 0.01)
      .select("source", "approx_distinct_tokens", "n_docs")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSeq
    val a = p.find(_._1.contains("A")).get
    assert(math.abs(a._2 - 500L) <= 20, s"rsd=0.01 on 500 distinct: ${a._2}")
    val b = p.find(_._1.contains("B")).get
    assert(b._2 == 0L && b._3 == 1L,
      s"null-text domain keeps its exact row with a zero sketch: $b")
  }

  test("cross-engine HLL: mergeable registers, duplicate-invariant, error envelope, single pass") {
    import spark.implicits._
    import graft.ext.FreqSketch
    assume(corpusPresent)
    val docs = Tables.documents(spark, sf)
    // error envelope on the real corpus: raw-HLL expected rsd is
    // 1.04/sqrt(64) = 13%; 4 sigma = 52% is the practical hard gate
    val rep = FreqSketch.hllShingleReport(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(rep.nonEmpty)
    rep.foreach { case (dom, (est, exact)) =>
      assert(math.abs(est - exact) <= math.max(0.52 * exact, 8.0),
        s"domain $dom: hll $est vs exact $exact outside 4-sigma envelope")
    }
    // duplicate invariance: the register table (and thus estimate) of
    // corpus ++ corpus is identical — max absorbs repetition, so the
    // sketch needs no distinct pass
    val items = docs.filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source").as("group"),
        explode(graft.ext.Dedup.shingleHashes(col("text"))).as("h"))
    val once = FreqSketch.hllRegisters(items, col("group"), col("h"))
    val twice = FreqSketch.hllRegisters(items.union(items), col("group"), col("h"))
    assert(rows(once) == rows(twice), "registers must be duplicate-invariant")
    // mergeability: registers(A union B) == elementwise max of
    // registers(A), registers(B) — shards combine without re-reading
    val (ia, ib) = (items.filter(col("h") % 2 === 0), items.filter(col("h") % 2 =!= 0))
    val merged = FreqSketch.hllRegisters(ia, col("group"), col("h"))
      .union(FreqSketch.hllRegisters(ib, col("group"), col("h")))
      .groupBy("group", "reg").agg(max("rank").as("rank"))
    assert(rows(once) == rows(merged), "sketch union law must hold")
    // hand-checked register: hash 193 = 3*64 + 1 → reg 1, payload 3
    // (bits '11', bitlength 2) → rank 24; payload 0 → rank 26
    val hand = FreqSketch.hllRegisters(
      Seq(("g", 193L), ("g", 1L)).toDF("group", "h"),
      col("group"), col("h"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(hand == Map(1L -> 26L), s"got $hand")
    // scale shape: one partial-aggregated exchange builds the
    // registers — no distinct, no second shuffle before the estimate
    val plan = FreqSketch.hllEstimate(
      FreqSketch.hllRegisters(items, col("group"), col("h")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"), plan)
    // range guard (r16 advice): a hash wider than the 31-bit polyhash
    // (e.g. the 62-bit polyFingerprint64) must FAIL LOUD, not corrupt
    // registers silently with rank ≤ 0
    val wide = Seq(("g", (1L << 40) + 5L), ("g", 7L)).toDF("group", "h")
    val ex = intercept[Exception] {
      FreqSketch.hllRegisters(wide, col("group"), col("h")).collect()
    }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ causes(e.getCause))
    assert(causes(ex).exists(_.contains("31-bit polyhash")), ex.toString)
    // negative hashes are out of range too
    val exNeg = intercept[Exception] {
      FreqSketch.hllRegisters(Seq(("g", -3L)).toDF("group", "h"),
        col("group"), col("h")).collect()
    }
    assert(causes(exNeg).exists(_.contains("31-bit polyhash")),
      exNeg.toString)
  }
}
