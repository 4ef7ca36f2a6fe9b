package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.functions.{CmsEstimate, CmsPositions, wordTfs}

/** Count-min-sketch frequency machinery for vocabularies too large to
  * aggregate exactly: a web-scale corpus has billions of distinct
  * tokens, almost all in the long tail — an exact
  * `groupBy(word).count()` shuffles every distinct token every
  * partition emits, dominated by tail tokens nobody will look at. The
  * two-pass heavy-hitter path:
  *
  *   1. [[buildCms]]: ONE partial-aggregated pass folds the token
  *      stream into a d×w cell table (≤ d·w rows cross the wire — a
  *      CONFIG bound; 4×16384 longs = 512 KB at the default);
  *   2. [[heavyHitterWords]]: a second scan probes every token
  *      MAP-SIDE against the broadcast table (codegen'd min-of-d-cells
  *      expression) and only tokens whose ESTIMATE reaches the
  *      threshold enter the exact aggregation — the tail dies before
  *      the exchange. Count-min never undercounts, so no true heavy
  *      hitter is pruned, and the exact confirm discards the
  *      collision-inflated survivors: the output is bit-identical to
  *      the plain exact query (the Bloom-gate invisibility contract).
  */
object FreqSketch {

  val DefaultDepth: Int = 4
  val DefaultWidth: Int = 16384

  /** Build-side Column: flat cell positions of a token. */
  def cmsPositions(word: Column, d: Int = DefaultDepth,
                   w: Int = DefaultWidth): Column =
    Bridge.column(CmsPositions(Bridge.expression(word), d, w))

  /** Probe-side Column: count-min estimate against a built table. */
  def cmsEstimate(word: Column, table: Array[Long], d: Int = DefaultDepth,
                  w: Int = DefaultWidth): Column =
    Bridge.column(CmsEstimate(Bridge.expression(word), table, d, w))

  /** Distributed CMS build over a weighted token relation (`word`,
    * `weight`): explode the d positions, sum per cell — partial
    * aggregation means each executor ships its local cells and only
    * ≤ d·w rows reach the driver (config-bounded, never data-bounded).
    */
  def buildCms(tokens: DataFrame, wordCol: Column, weightCol: Column,
               d: Int = DefaultDepth, w: Int = DefaultWidth): Array[Long] = {
    val table = new Array[Long](d * w)
    tokens.select(explode(cmsPositions(wordCol, d, w)).as("pos"),
        weightCol.cast("long").as("wt"))
      .groupBy("pos").agg(sum("wt").as("cnt"))
      .collect()
      .foreach(r => table(r.getLong(0).toInt) = r.getLong(1))
    table
  }

  /** Corpus-wide weighted token relation (`word`, `weight`) via the
    * row-local [[wordTfs]] expression — the build/probe input.
    */
  def tokenWeights(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(wordTfs(col(textCol))).as("wt"))
      .select(col("wt.word").as("word"), col("wt.tf").as("weight"))

  /** Exact corpus heavy hitters (`word`, `n` with n ≥ threshold)
    * behind the CMS prune — bit-identical to the plain exact
    * aggregation; the sketch only deletes the tail's shuffle.
    */
  def heavyHitterWords(docs: DataFrame, threshold: Long,
                       textCol: String = "text", d: Int = DefaultDepth,
                       w: Int = DefaultWidth): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val toks = tokenWeights(docs, textCol)
    val table = buildCms(toks, col("word"), col("weight"), d, w)
    toks.filter(cmsEstimate(col("word"), table, d, w) >= threshold)
      .groupBy("word").agg(sum("weight").cast("long").as("n"))
      .filter(col("n") >= threshold)
  }
}
