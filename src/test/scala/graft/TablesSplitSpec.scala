package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Single-row-group corpus mitigation (round-13): the regenerated driver
  * corpus writes each table as ONE parquet row group, and a row group is
  * the read-parallelism quantum — without intervention every scan (and
  * every map stage before the first shuffle) serializes onto one task.
  * `Tables.load(split = true)` round-robin-repartitions qualifying
  * tables after load. The mitigation is OPT-IN per table: a measured
  * sf0.1 A/B showed it pays only where per-row map work dominates
  * (documents text compute) and COSTS on fact tables whose partial-agg
  * pipelines collapse rows before any shuffle (see Tables.load doc).
  * These tests pin the opt-in surface, the row gate, and that Catalyst
  * still pushes filters and prunes columns THROUGH the repartition into
  * the parquet scan.
  */
class TablesSplitSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def corpusPresent = new java.io.File(s"$sf/lineitem.parquet").exists()

  test("opted-in single-row-group tables above the row gate load with full parallelism") {
    assume(corpusPresent)
    // lineitem at sf0.001 is 6000 rows in one row group: above the gate
    val opted = Tables.load(spark, sf, "lineitem", split = true)
    assert(opted.rdd.getNumPartitions == spark.sparkContext.defaultParallelism,
      s"opted-in lineitem should split, got ${opted.rdd.getNumPartitions}")
    assert(opted.count() == 6000L)
    // documents at sf0.001 is 500 rows: BELOW the gate even though the
    // loader opts in — tiny corpora keep deterministic single-partition
    // order (limit() sampling, zero-exchange plan tests)
    assert(Tables.documents(spark, sf).rdd.getNumPartitions == 1)
    // at sf0.1 (5000 rows — the bench corpus the A/B measured) it splits
    val sf01 = "/root/testdata/sf0.1"
    if (new java.io.File(s"$sf01/documents.parquet").exists())
      assert(Tables.documents(spark, sf01).rdd.getNumPartitions ==
        spark.sparkContext.defaultParallelism)
  }

  test("fact tables and dims stay unsplit (partial-agg pipelines keep their map-side combine)") {
    assume(corpusPresent)
    for (t <- Seq("lineitem", "orders", "region", "nation", "supplier")) {
      val df = Tables.load(spark, sf, t)
      assert(df.rdd.getNumPartitions == 1,
        s"$t should not repartition by default, got ${df.rdd.getNumPartitions}")
    }
  }

  test("split opt-in set is configurable (graft.split.tables property / SPARK_GRAFT_SPLIT_TABLES)") {
    assume(corpusPresent)
    // default: only documents
    assert(Tables.splitTables == Set("documents"))
    val prev = sys.props.get("graft.split.tables")
    try {
      // add lineitem, drop documents — a corpus whose per-row cost lives
      // in the fact table opts in without a code change
      sys.props("graft.split.tables") = "lineitem, orders"
      assert(Tables.splitTables == Set("lineitem", "orders"))
      assert(Tables.load(spark, sf, "lineitem").rdd.getNumPartitions ==
        spark.sparkContext.defaultParallelism)
      val sf01 = "/root/testdata/sf0.1"
      if (new java.io.File(s"$sf01/documents.parquet").exists())
        assert(Tables.documents(spark, sf01).rdd.getNumPartitions == 1,
          "documents must NOT split when removed from the opt-in set")
      // explicit split=true call-site override still wins
      sys.props("graft.split.tables") = ""
      assert(Tables.splitTables == Set.empty)
      assert(Tables.load(spark, sf, "lineitem", split = true)
        .rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.split.tables") = v
        case None    => sys.props -= "graft.split.tables"
      }
    }
  }

  test("filters and column pruning reach the parquet scan through the repartition") {
    assume(corpusPresent)
    val plan = Tables.load(spark, sf, "lineitem", split = true)
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

  test("events loader composes timestamp normalization with the default no-split path") {
    assume(corpusPresent)
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() == 1000L)
  }
}
