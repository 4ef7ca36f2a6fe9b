package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Single-row-group corpus mitigation (round-13): the regenerated driver
  * corpus writes each table as ONE parquet row group, and a row group is
  * the read-parallelism quantum — without intervention every scan (and
  * every map stage before the first shuffle) serializes onto one task.
  * Tables.load round-robin-repartitions qualifying tables after load;
  * these tests pin the gate (big tables split, dims don't) and that
  * Catalyst still pushes filters and prunes columns THROUGH the
  * repartition into the parquet scan.
  */
class TablesSplitSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def corpusPresent = new java.io.File(s"$sf/lineitem.parquet").exists()

  test("single-row-group tables above the row gate load with full parallelism") {
    assume(corpusPresent)
    val li = Tables.lineitem(spark, sf) // 6000 rows, 1 row group
    assert(li.rdd.getNumPartitions == spark.sparkContext.defaultParallelism,
      s"lineitem should split to defaultParallelism, got ${li.rdd.getNumPartitions}")
    assert(li.count() == 6000L)
  }

  test("small dims stay single-partition (broadcast-cheap, no pointless shuffle)") {
    assume(corpusPresent)
    for (dim <- Seq("region", "nation", "supplier")) {
      val df = Tables.load(spark, sf, dim)
      assert(df.rdd.getNumPartitions == 1,
        s"$dim (tiny dim) should not repartition, got ${df.rdd.getNumPartitions}")
    }
  }

  test("filters and column pruning reach the parquet scan through the repartition") {
    assume(corpusPresent)
    val plan = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40"),
      s"filter must push through Repartition into the scan:\n$plan")
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity")
      && !readSchema.contains("l_comment"),
      s"column pruning must reach the scan (got: $readSchema)")
  }

  test("events loader composes the split with timestamp normalization") {
    assume(corpusPresent)
    val ev = Tables.events(spark, sf) // 1000 rows at sf0.001: below gate
    // whatever the gate decides, the ts column is TimestampType and the
    // row count survives the plumbing
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() == 1000L)
  }
}
