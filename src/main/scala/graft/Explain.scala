package graft

import graft.core.Sessions

/** Plan-inspection entry point: prints the formatted physical plan of
  * one or all registered queries — the working surface for the
  * scale-review loop (check pushdown, pruning, join strategies, codegen
  * spans before trusting a plan at 100 TB).
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.benchQueries.map(_._1)
    val spark = Sessions.build("graft-explain", "4")
    val byName = SparkEntry.benchQueries.toMap
    names.foreach { n =>
      println(s"\n========== $n ==========")
      byName.get(n) match {
        case Some(fn) => println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
