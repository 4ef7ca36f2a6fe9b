package graft

import graft.core.{Sessions, Tables}
import graft.ext.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** TEMPORARY measurement scaffold for the r21 optimization round —
  * times the sub-stages of the curation flagships in isolation so the
  * expensive stage is identified before anything is changed (guide §1).
  * Not part of the engine; removed before round close.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build("graft-probe", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    time("warmup ccnetCurate") { noop(Curation.ccnetCurate(docs)) }

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      time("quality gate only") {
        noop(docs.withColumn("quality",
          TextAnalysis.qualityScore(col("text")).cast("long"))
          .filter(col("quality") >= 3))
      }
      val gated = docs.withColumn("quality",
        TextAnalysis.qualityScore(col("text")).cast("long"))
        .filter(col("quality") >= 3)
      time("nearDupClusters over gated") {
        noop(Dedup.nearDupClusters(gated, strict = true))
      }
      time("dedupedCorpus over gated") {
        noop(Dedup.dedupedCorpus(gated, strict = true))
      }
      time("curate full") { noop(Curation.curate(docs)) }
      time("unigramSurprisal") {
        noop(TextAnalysis.unigramSurprisal(docs, "doc_id", "text"))
      }
      time("perplexityBuckets") { noop(Curation.perplexityBuckets(docs)) }
      time("ccnetCurate full") { noop(Curation.ccnetCurate(docs)) }
      time("trigramSurprisal") {
        noop(TextAnalysis.trigramSurprisal(docs, "doc_id", "text"))
      }
    }
    spark.stop()
  }
}
