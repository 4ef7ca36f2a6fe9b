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
}
