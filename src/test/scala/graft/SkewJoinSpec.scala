package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

/** Salting must be semantically invisible: multiset-identical results
  * to the plain join on a deliberately skewed fixture, while actually
  * spreading the hot key over multiple sub-keys.
  */
class SkewJoinSpec extends SparkSuite {

  test("salted join: multiset-equal to the plain join under skew; hot key actually spreads; left_outer preserved") {
    import spark.implicits._
    // 200 probe rows on ONE hot key + a handful elsewhere + a null key
    val left = ((1L to 200L).map(i => (i, "hot")) ++
      Seq((201L, "cold"), (202L, "cold2"), (203L, "nomatch")) :+
      (204L, null.asInstanceOf[String]))
      .toDF("row_id", "k")
    // duplicate build rows on the hot key: multiplicity must survive
    val right = Seq(("hot", 1L), ("hot", 2L), ("cold", 3L),
      ("cold2", 4L), (null.asInstanceOf[String], 5L)).toDF("k", "payload")

    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id", "k", "payload")
        .as[(Long, Option[String], Option[Long])].collect().sortBy(r =>
          (r._1, r._3.getOrElse(-1L))).toSeq

    val plainInner = sortedRows(left.join(right, Seq("k")))
    val saltedInner = sortedRows(
      SkewJoin.saltedJoin(left, right, Seq("k"), "row_id", salt = 8))
    assert(saltedInner == plainInner,
      s"salted ${saltedInner.size} vs plain ${plainInner.size}")
    assert(plainInner.size == 200 * 2 + 2, "hot multiplicity exercised")

    val plainLeft = sortedRows(left.join(right, Seq("k"), "left_outer"))
    val saltedLeft = sortedRows(SkewJoin.saltedJoin(left, right, Seq("k"),
      "row_id", salt = 8, joinType = "left_outer"))
    assert(saltedLeft == plainLeft)

    // the hot key's probe rows really land on several sub-keys
    val spread = left.filter(col("k") === "hot")
      .select(pmod(graft.functions.polyFingerprint(
        col("row_id").cast("string")), lit(8L)))
      .distinct().count()
    assert(spread > 4, s"hot key spread over only $spread sub-keys")

    // a NULL unique id must still join (it salts like the empty string
    // — the plain join would match it, so the salted one must too)
    val nullId = Seq((Option.empty[Long], "cold")).toDF("row_id", "k")
    assert(SkewJoin.saltedJoin(nullId, right, Seq("k"), "row_id")
      .count() == 1L)

    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(left, right, Seq("k"), "row_id", salt = 0))
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(left, right, Seq("k"), "row_id",
        joinType = "full_outer"))
  }
}
