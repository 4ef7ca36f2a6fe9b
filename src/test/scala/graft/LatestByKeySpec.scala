package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.tables.LatestByKey

final case class CustVersion(id: Int, first_name: String, last_name: String,
                             ts: java.sql.Timestamp)

/** S4 changelog-table semantics (SURVEY §1.1): latest value per key,
  * batch and streaming, including the reference's signature live-update
  * probe — update a customer row and watch the running table change
  * (README.md:201–210).
  */
class LatestByKeySpec extends SparkSuite {

  private def v(id: Int, fn: String, ln: String, at: String) =
    CustVersion(id, fn, ln, ts(at))

  test("batch latest-by-key picks max-ts row per key with tiebreak") {
    import spark.implicits._
    val versions = Seq(
      v(1, "A", "One", "2024-01-01 10:00:00"),
      v(1, "A2", "One", "2024-01-01 11:00:00"),
      v(2, "B", "Two", "2024-01-01 10:00:00"),
      // same-ts duplicate for key 3: tiebreak on first_name keeps max
      v(3, "C1", "Three", "2024-01-01 10:00:00"),
      v(3, "C2", "Three", "2024-01-01 10:00:00")).toDF()
    val latest = LatestByKey.batch(versions, "id", "ts", "first_name")
      .as[CustVersion].collect().map(c => c.id -> c.first_name).toMap
    assert(latest == Map(1 -> "A2", 2 -> "B", 3 -> "C2"))
  }

  test("streaming latest-by-key emits changelog updates; update probe propagates") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[CustVersion]
    val table = LatestByKey.streaming(ms.toDF(), "id", "ts")
    val q = table.writeStream.format("memory").queryName("cust_table")
      .outputMode("update").start()
    try {
      ms.addData(
        v(42, "Rica", "Blaisdell", "2024-01-01 10:00:00"),
        v(7, "Seven", "Of9", "2024-01-01 10:00:00"))
      q.processAllAvailable()
      val after1 = spark.table("cust_table").as[CustVersion].collect()
      assert(after1.map(c => c.id -> c.first_name).toSet ==
        Set(42 -> "Rica", 7 -> "Seven"))

      // the README probe: UPDATE customer 42 → Rick Astley
      ms.addData(v(42, "Rick", "Astley", "2024-01-01 12:00:00"))
      q.processAllAvailable()
      val emitted = spark.table("cust_table").as[CustVersion].collect()
      // changelog: 2 initial emissions + 1 update, only for key 42
      assert(emitted.length == 3)
      val latest42 = emitted.filter(_.id == 42).maxBy(_.ts.getTime)
      assert(latest42.first_name == "Rick" && latest42.last_name == "Astley")

      // a LATE (older) version must NOT override the newer state
      ms.addData(v(42, "Stale", "Old", "2024-01-01 09:00:00"))
      q.processAllAvailable()
      assert(spark.table("cust_table").count() == 3) // no new emission
    } finally q.stop()
  }

  test("streaming latest-by-key resolves equal-ts versions by the tiebreak, matching batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[CustVersion]
    val table = LatestByKey.streaming(ms.toDF(), "id", "ts",
      tiebreak = Seq("first_name"))
    val q = table.writeStream.format("memory").queryName("cust_tb")
      .outputMode("update").start()
    try {
      // two versions with the SAME timestamp, split across micro-batches
      ms.addData(v(9, "Aaa", "X", "2024-01-01 10:00:00"))
      q.processAllAvailable()
      ms.addData(v(9, "Zzz", "X", "2024-01-01 10:00:00"))
      q.processAllAvailable()
      val latest = spark.table("cust_tb").as[CustVersion].collect()
        .maxBy(_.first_name)
      // batch max_by((ts, first_name)) keeps Zzz; streaming must agree
      val batch = LatestByKey.batch(
        Seq(v(9, "Aaa", "X", "2024-01-01 10:00:00"),
          v(9, "Zzz", "X", "2024-01-01 10:00:00")).toDF(),
        "id", "ts", "first_name").as[CustVersion].collect().head
      assert(latest.first_name == "Zzz" && batch.first_name == "Zzz")
    } finally q.stop()
  }
}
