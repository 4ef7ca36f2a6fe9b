package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Formal re-identification-risk audits for training corpora — the
  * governance readout that sits NEXT to the PII scrubbers
  * ([[TextAnalysis.redactPii]] removes direct identifiers; this family
  * measures what the remaining QUASI-identifiers still leak): a row is
  * k-anonymous when at least k rows share its quasi-identifier tuple
  * (Sweeney 2002), and a class is l-diverse when its sensitive
  * attribute takes at least l distinct values (Machanavajjhala et al.
  * 2007) — the classic pair of release-risk laws, both pure relational
  * aggregations and therefore oracle-gated exactly.
  *
  * Null semantics: a null quasi value is a VALUE — rows sharing the
  * null tuple form one class (SQL GROUP BY semantics in both engines,
  * disclosed); a null sensitive value does not count toward diversity
  * (count-distinct ignores nulls — a class whose sensitive column is
  * all null reports l = 0).
  *
  * Scale shape: ONE quasi-keyed partial aggregation over the corpus
  * (map-side combinable — class count is bounded by the quasi domain,
  * never the row count) + one bounded rollup for the report; nothing
  * here grows faster than a groupBy at 100 TB.
  */
object Privacy {

  /** The equivalence classes over `quasiCols`: one row per distinct
    * quasi tuple with `class_size` (its k) and, when `sensitiveCol` is
    * given, `l_distinct` (its diversity). The per-class relation an
    * auditor drills into after [[kAnonymityReport]] flags the corpus.
    */
  def equivalenceClasses(df: DataFrame, quasiCols: Seq[String],
                         sensitiveCol: Option[String] = None): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(quasiCols.distinct.size == quasiCols.size,
      s"duplicate quasi columns in $quasiCols")
    require(sensitiveCol.forall(s => !quasiCols.contains(s)),
      "the sensitive column cannot also be a quasi-identifier")
    val base = df.groupBy(quasiCols.map(col): _*)
    sensitiveCol match {
      case Some(s) => base.agg(count(lit(1)).as("class_size"),
        countDistinct(col(s)).as("l_distinct"))
      case None => base.agg(count(lit(1)).as("class_size"))
    }
  }

  /** One-row corpus release-risk report: `k_anonymity` = the smallest
    * class size (the corpus IS k-anonymous for exactly this k),
    * `l_diversity` = the smallest per-class distinct-sensitive count
    * (null without a `sensitiveCol`), `n_rows_at_risk` = rows living
    * in classes below `kThreshold` (the re-identification candidates a
    * release policy counts), `risk_x10000` their corpus share. Empty
    * corpus → one row of zeros with null k/l (disclosed, not dropped).
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: Option[String] = None,
                       kThreshold: Long = 5L): DataFrame = {
    require(kThreshold >= 1L, s"kThreshold must be >= 1, got $kThreshold")
    val classes = equivalenceClasses(df, quasiCols, sensitiveCol)
    val lAgg = sensitiveCol match {
      case Some(_) => min(col("l_distinct"))
      case None => lit(null).cast("long")
    }
    classes.agg(
      coalesce(sum(col("class_size")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("class_size")).as("k_anonymity"),
      lAgg.as("l_diversity"),
      coalesce(sum(when(col("class_size") < kThreshold,
        col("class_size")).otherwise(0L)), lit(0L)).as("n_rows_at_risk"))
      .select(col("n_rows"), col("n_classes"), col("k_anonymity"),
        col("l_diversity"), col("n_rows_at_risk"),
        when(col("n_rows") > 0L,
          expr("(n_rows_at_risk * 10000) div n_rows")).as("risk_x10000"))
  }

  /** The standard GENERALIZATION step that trades precision for k: a
    * numeric quasi column coarsened to its `width`-wide bucket index
    * (floor division — both engines' IEEE doubles divide and floor
    * identically, so the bucket is oracle-exact). Re-running
    * [[kAnonymityReport]] with the generalized column shows how much k
    * the coarsening bought.
    */
  def generalizeNumeric(c: Column, width: Double): Column = {
    require(width > 0, s"width must be positive, got $width")
    floor(c / lit(width)).cast("long")
  }
}
