package graft

import org.apache.spark.sql.functions._
import graft.core.{Layout, Tables}

/** Physical layout semantics + plan-shape proofs: bucketed joins must
  * drop the shuffle entirely; salted joins must be result-identical to
  * plain joins while splitting hot keys.
  */
class LayoutSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed tables join with zero Exchange (co-located fact join)") {
    // tiny test tables would broadcast — disable so the plan shows the
    // shuffle behavior the layout is about (at 100 TB neither side
    // broadcasts; bucketing is what removes the exchange)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try bucketedProof()
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  private def bucketedProof(): Unit = {
    Layout.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    Layout.writeBucketed(
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 8)
    val joined = Layout.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join should be shuffle-free:\n$plan")

    // and it is the same result as the plain join
    val plain = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "o_orderkey")
    assert(joined.count() == plain.count())
  }

  test("recentWindowPruned: literal anchor puts the date cut in PartitionFilters, same rows as the subquery form") {
    val ratings = graft.queries.ParityQueries.ratings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-rwp").toString
    Layout.writeDatePartitioned(ratings, dir, "ts")
    val pruned = Layout.recentWindowPruned(spark, dir, "ts", 360)
    val plan = pruned.queryExecution.executedPlan.toString
    // the p_date cut is foldable → listing-level prune, not a data filter
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"), plan)
    assert("""p_date#\d+ >=""".r.findFirstIn(plan).isDefined, plan)
    // identical rows to the subquery-anchored A9 window
    val viaSubquery = graft.ops.RatingsOps.recentWindow(ratings, "ts", 360)
    assert(rows(pruned.select("RATING_ID", "USER_ID", "ts")) ==
      rows(viaSubquery.select("RATING_ID", "USER_ID", "ts")))
    assert(pruned.count() > 0)
  }

  test("enrich broadcastDim=false drops the driver-side build for a large dim") {
    import spark.implicits._
    // a customers side far past any dim bound: the default hinted plan
    // would force a driver broadcast build; the escape hatch lets AQE
    // pick a shuffle join
    val bigCustomers = spark.range(0, 200000L)
      .select(col("id").cast("int").as("id"),
        concat(lit("F"), col("id")).as("first_name"),
        concat(lit("L"), col("id")).as("last_name"),
        concat(lit("e"), col("id"), lit("@x.test")).as("email"),
        lit("gold").as("club_status"))
    // disable the size-based auto-broadcast so the contrast below is the
    // HINT itself (an explicit hint overrides the threshold; the escape
    // hatch removes the hint and leaves the strategy to size/AQE)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val hinted = graft.ops.RatingsOps.enrich(ratingsDf, bigCustomers)
      val unhinted = graft.ops.RatingsOps.enrich(ratingsDf, bigCustomers,
        broadcastDim = false)
      assert(hinted.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
      assert(!unhinted.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        unhinted.queryExecution.sparkPlan.toString)
      // escape hatch changes the physical strategy only, never the rows
      assert(rows(unhinted) == rows(hinted))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("date-partitioned layout prunes partitions at the scan (dashboard path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Layout.writeDatePartitioned(Tables.events(spark, sf), dir, "ts")
    val pruned = spark.read.parquet(dir)
      .filter(col("p_date") === "2024-01-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"), plan)
    // only the matching day's rows are read, and they match a full scan
    val full = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === "2024-01-03").count()
    assert(pruned.count() == full && full > 0)
  }

  test("salted join equals plain join on a skewed corpus") {
    import spark.implicits._
    // 90% of left rows hit one hot key — the classic skew shape
    val left = (1 to 1000).map(i =>
      (if (i <= 900) 1L else i.toLong % 50, s"v$i")).toDF("k", "v")
    val right = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "dim")

    val plain = left.join(right, "k")
    val salted = Layout.saltedJoin(left, right, "k", salt = 8)
    assert(salted.count() == plain.count())
    // same multiset of (k, v, dim) rows
    assert(rows(salted.select("k", "v", "dim")) ==
      rows(plain.select("k", "v", "dim")))
  }
}
