package graft

import org.apache.spark.sql.functions._
import graft.ops.TemporalJoins

/** AS-OF and RANGE join semantics beyond the oracle (which checks them
  * against DuckDB's native ASOF JOIN / raw range predicate on events):
  * tie inclusivity, null handling, the matched-row-as-a-unit payload
  * law, bin spanning, guard disclosure, and plan shape (the range join
  * must be an equi-join, never a nested-loop product).
  */
class TemporalJoinsSpec extends SparkSuite {

  private def T(s: String) = ts(s)

  test("asof join: inclusive tie, carry-forward, no-prior null, null right rows never match") {
    import spark.implicits._
    val left = Seq(
      (1L, "u", T("2024-01-01 10:00:00")), // before any state → null
      (2L, "u", T("2024-01-01 10:05:00")), // == state@10:05 → inclusive
      (3L, "u", T("2024-01-01 10:09:00")), // between → carries 10:05
      (4L, "u", T("2024-01-01 10:20:00")), // after 10:10 → latest wins
      (5L, "v", T("2024-01-01 10:30:00")), // other key: own timeline
      (6L, "w", T("2024-01-01 10:00:00")), // key with no right rows
      (7L, null.asInstanceOf[String], T("2024-01-01 10:00:00")))
      .toDF("event_id", "k", "t")
    val right = Seq(
      ("u", T("2024-01-01 10:05:00"), 100L),
      ("u", T("2024-01-01 10:10:00"), 200L),
      ("v", T("2024-01-01 10:00:00"), 300L),
      ("v", T("2024-01-01 11:00:00"), 999L), // in the future for event 5
      (null.asInstanceOf[String], T("2024-01-01 09:00:00"), 777L))
      .toDF("k", "t", "state")
      .union(Seq(("u", null.asInstanceOf[java.sql.Timestamp], 888L))
        .toDF("k", "t", "state"))
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t")
      .select("event_id", "state")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> None, 2L -> Some(100L), 3L -> Some(100L),
      4L -> Some(200L), 5L -> Some(300L), 6L -> None, 7L -> None), out)
    assert(out.size == 7, "left row count preserved")
  }

  test("asof join: matched row is taken as a unit — its null column never leaks an older value") {
    import spark.implicits._
    val left = Seq((1L, "u", T("2024-01-01 10:30:00")))
      .toDF("event_id", "k", "t")
    val right = Seq(
      ("u", T("2024-01-01 10:00:00"), Some(100L), Some("old")),
      ("u", T("2024-01-01 10:20:00"), None, Some("new")))
      .toDF("k", "t", "a", "b")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t")
      .select("a", "b").as[(Option[Long], String)].collect().toSeq
    // the 10:20 row matches; its a=null must NOT fall back to 100
    assert(got == Seq((None, "new")), got)
  }

  test("asof join: contract violations rejected") {
    import spark.implicits._
    val l = Seq((1L, "u", T("2024-01-01 10:00:00"))).toDF("event_id", "k", "t")
    val collide = Seq(("u", T("2024-01-01 09:00:00"), 5L))
      .toDF("k", "t", "event_id") // payload name collides with left
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(l, collide, Seq("k"), "t", "t"))
    val noPayload = Seq(("u", T("2024-01-01 09:00:00"))).toDF("k", "t")
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(l, noPayload, Seq("k"), "t", "t"))
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(l, collide, Seq(), "t", "t"))
  }

  test("range join: half-open bounds, multi-bin intervals, degenerate and over-wide intervals excluded") {
    import spark.implicits._
    val left = Seq(
      (1L, "u", T("2024-01-01 10:00:00")), // == start → in
      (2L, "u", T("2024-01-01 10:09:59")), // inside, later bin
      (3L, "u", T("2024-01-01 10:10:00")), // == end → OUT (half-open)
      (4L, "v", T("2024-01-01 10:05:00")), // wrong key
      (5L, "u", T("2024-01-01 09:59:59"))) // just before
      .toDF("event_id", "k", "t")
    val iv = Seq(
      (10L, "u", T("2024-01-01 10:00:00"), T("2024-01-01 10:10:00")),
      (11L, "u", T("2024-01-01 10:10:00"), T("2024-01-01 10:10:00")), // empty
      (12L, "v", T("2024-01-01 10:00:00"), T("2024-01-01 10:10:00")))
      .toDF("iid", "k", "s", "e")
    // 1-minute bins → the 10-min interval spans 10 bins
    val out = TemporalJoins.rangeJoin(left, iv, Seq("k"), "t", "s", "e",
        binMicros = 60L * 1000000L)
      .select("event_id", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L), (4L, 12L)), out)
    // over-wide guard: with maxBins = 2 the 10-bin intervals are
    // excluded (disclosed via WARN) and nothing matches
    val gated = TemporalJoins.rangeJoin(left, iv, Seq("k"), "t", "s", "e",
      binMicros = 60L * 1000000L, maxBins = 2)
    assert(gated.count() == 0L)
    intercept[IllegalArgumentException](
      TemporalJoins.rangeJoin(left, iv, Seq("k"), "t", "s", "e",
        binMicros = 0L))
  }

  test("plan shape: range join is an equi-join on (keys, bin) — no nested-loop product; asof is one window, no join") {
    import spark.implicits._
    val left = Seq((1L, "u", T("2024-01-01 10:00:00"))).toDF("event_id", "k", "t")
    val iv = Seq((10L, "u", T("2024-01-01 10:00:00"), T("2024-01-01 10:10:00")))
      .toDF("iid", "k", "s", "e")
    val rPlan = TemporalJoins.rangeJoin(left, iv, Seq("k"), "t", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!rPlan.contains("BroadcastNestedLoopJoin") &&
      !rPlan.contains("CartesianProduct"), rPlan)
    val right = Seq(("u", T("2024-01-01 09:00:00"), 5L)).toDF("k", "t", "state")
    val aPlan = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(aPlan.contains("Window") && !aPlan.contains("Join"), aPlan)
  }
}
