package graft

import org.apache.spark.sql.functions._
import graft.core.{Layout, Sessions, Tables}

/** Console demonstration of the physical-layout tools (SURVEY §4 scale
  * knobs): writes two tables bucketed on the join key and shows the
  * join plan has NO Exchange — the co-located fact⋈fact path — then a
  * salted join over a skewed corpus. Broadcast is disabled so the plan
  * shows what happens when neither side fits in memory (the 100 TB
  * shape).
  *
  * Usage: runMain graft.LayoutDemo [sfDir]
  */
object LayoutDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.build("graft-layout-demo", "4")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._

    Layout.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
      "demo_orders", "o_orderkey", 8)
    Layout.writeBucketed(
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "demo_lineitem", "o_orderkey", 8)
    val joined = Layout.bucketedJoin(spark, "demo_orders", "demo_lineitem",
      "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    println(s"=== bucketed join: rows=${joined.count()} " +
      s"exchange_free=${!plan.contains("Exchange")} ===")
    println(plan.linesIterator.take(10).mkString("\n"))

    Tables.registerAll(spark, sf)
    println("=== SQL console (M4): registered tables + injected functions ===")
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n, polyhash(min(c_name)) AS fp
        |FROM customer GROUP BY 1 ORDER BY 1 LIMIT 3""".stripMargin).show(false)

    val partDir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Layout.writeDatePartitioned(Tables.events(spark, sf), partDir, "ts")
    val pruned = spark.read.parquet(partDir).filter(col("p_date") === "2024-01-03")
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    println(s"=== date-partitioned scan: rows=${pruned.count()} " +
      s"partition_filtered=${prunedPlan.contains("PartitionFilters: [isnotnull(p_date")} ===")
    println(new java.io.File(partDir).list().sorted.take(4).mkString(", "))

    val left = (1 to 1000).map(i =>
      (if (i <= 900) 1L else i.toLong % 50, s"v$i")).toDF("k", "v")
    val right = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val salted = Layout.saltedJoin(left, right, "k", salt = 8)
    println(s"=== salted join: rows=${salted.count()} " +
      s"(plain=${left.join(right, "k").count()}) ===")
    spark.stop()
    println("LAYOUT-DEMO-DONE")
  }
}
