package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for — AS-OF
  * (point-in-time: each left row picks the single most recent right row
  * at or before its timestamp, per key; the feature-store join every
  * training pipeline needs for leakage-free feature attachment) and
  * RANGE (each left row matches the right intervals containing its
  * timestamp). Both are expressed as compositions Catalyst can optimize
  * — no custom physical operator is required because the semantics
  * decompose into window/equi-join primitives:
  *
  *  - AS-OF: the sort-merge formulation — union the two sides tagged,
  *    one window per key carries the latest right payload forward, left
  *    rows read it. ONE shuffle on the key (both sides), no point-in-
  *    time self-join explosion, no driver work. This is the formulation
  *    that survives 100 TB: per-key event history sorts inside its own
  *    partition; a hot key degrades to a single sorted partition (the
  *    inherent lower bound for sort-based as-of), never a cross join.
  *  - RANGE: the bin-and-verify formulation — intervals explode into
  *    covered fixed-width bins (bounded by a disclosed cap), left
  *    timestamps bin once, an equi-join on (keys, bin) prunes the
  *    quadratic space, and the exact range predicate verifies. Work is
  *    O(|left| + Σ bins(interval) + matches) — never the
  *    BroadcastNestedLoopJoin a naive `t BETWEEN start AND end` join
  *    plan falls into when the build side outgrows broadcast range.
  */
object TemporalJoins {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** AS-OF join: every `left` row, plus `right`'s payload columns from
    * the single right row with the greatest `rightTime <=` the left
    * row's `leftTime` for the same `keys` (inclusive match — a right
    * row AT the left timestamp is visible), or nulls when no right row
    * precedes it (left-outer semantics; left row count is preserved).
    *
    * Contracts (violations would make "the" match ill-defined):
    *  - `right` is unique per (keys, rightTime) — pre-aggregate first
    *    (e.g. latest-by-key per timestamp) if it is not;
    *  - right rows with a null key or null time never match anything
    *    and are dropped here (a null-keyed LEFT row still flows
    *    through, with null payload);
    *  - right payload column names must not collide with left columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String = "ts", rightTime: String = "ts"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val payload = right.columns.toSeq
      .filterNot(c => keys.contains(c) || c == rightTime)
    require(payload.nonEmpty,
      s"right side carries no payload columns beyond keys $keys and time " +
        s"'$rightTime'")
    val clash = payload.intersect(left.columns.toSeq)
    require(clash.isEmpty,
      s"right payload column(s) ${clash.mkString(", ")} collide with left " +
        "columns — rename before joining")
    val leftCols = left.columns.toSeq
    // the payload rides as ONE struct so a matched right row is taken
    // as a unit — per-column last(ignoreNulls) would leak an OLDER
    // row's value through any null payload column of the true match
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    // aligned union schema: [left columns..., __aj_p, __aj_t, __aj_tag]
    val lPart = left.select(
      leftCols.map(col) ++ Seq(lit(null).cast(pType).as("__aj_p"),
        col(leftTime).as("__aj_t"), lit(1).as("__aj_tag")): _*)
    val rPart = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(
        leftCols.map(c => if (keys.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payload.map(col): _*).as("__aj_p"),
          col(rightTime).as("__aj_t"), lit(0).as("__aj_tag")): _*)
    // tag orders right (0) before left (1) at equal timestamps → the
    // inclusive <= match; rows-between running `last ignoreNulls` is
    // the carry-forward
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__aj_t"), col("__aj_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPart.union(rPart)
      .withColumn("__aj_p", last(col("__aj_p"), ignoreNulls = true).over(w))
      .filter(col("__aj_tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("__aj_p")(c).as(c)): _*)
  }

  /** Cap on time bins per interval in [[rangeJoin]]: an interval
    * spanning more bins than this (relative to `binMicros`) would
    * explode into an unbounded row blow-up; such intervals are EXCLUDED
    * from the join and disclosed (WARN), mirroring the dedup family's
    * hot-bucket guard — pick `binMicros` near the typical interval
    * length so intervals cover a handful of bins.
    */
  val DefaultMaxBinsPerInterval: Int = 1024

  /** RANGE (interval) join: (left row, right row) for every pair with
    * equal `keys` and `startCol <= timeCol < endCol` (half-open, the
    * convention window semantics use). Output: all left columns + all
    * right columns except the keys (inner-join semantics — unmatched
    * rows on either side drop).
    *
    * Null keys/times/bounds never match and are filtered; degenerate
    * intervals (end <= start) match nothing by the half-open predicate.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                timeCol: String, startCol: String, endCol: String,
                binMicros: Long = 300L * 1000000L,
                maxBins: Int = DefaultMaxBinsPerInterval): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one key column")
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    require(maxBins > 0, s"maxBins must be positive, got $maxBins")
    val clash = right.columns.toSeq.filterNot(keys.contains)
      .intersect(left.columns.toSeq)
    require(clash.isEmpty,
      s"right column(s) ${clash.mkString(", ")} collide with left columns " +
        "— rename before joining")
    val rBase = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__rj_s", unix_micros(col(startCol)))
      .withColumn("__rj_e", unix_micros(col(endCol)))
      // end is EXCLUSIVE: an interval ending exactly on a bin edge does
      // not cover that bin — last covered instant is end-1 micro
      .withColumn("__rj_nb",
        when(col("__rj_e") > col("__rj_s"),
          floor((col("__rj_e") - 1) / binMicros) -
            floor(col("__rj_s") / binMicros) + 1).otherwise(lit(0L)))
      // materialized once: the disclosure probe below and the join both
      // read the interval side (the semDedupPairs guard pattern)
      .localCheckpoint()
    // disclosure probe: over-wide intervals leave the join, visibly.
    // The probe is a dim-sized action (right is the interval side).
    val over = rBase.filter(col("__rj_nb") > maxBins)
      .select(keys.map(col) :+ col("__rj_nb"): _*).limit(21).collect()
    if (over.nonEmpty)
      log.warn(s"rangeJoin: ${over.length}${if (over.length > 20) "+" else ""} " +
        s"interval(s) spanning more than $maxBins bins of $binMicros micros " +
        s"excluded from the join (raise binMicros or maxBins): " +
        over.take(20).map(_.toString).mkString(", "))
    val rBinned = rBase
      .filter(col("__rj_nb").between(1, maxBins))
      .withColumn("__rj_bin", explode(sequence(
        floor(col("__rj_s") / binMicros),
        floor((col("__rj_e") - 1) / binMicros))))
      .drop("__rj_nb")
    val lBinned = left
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(timeCol).isNotNull)
      .withColumn("__rj_t", unix_micros(col(timeCol)))
      .withColumn("__rj_bin", floor(col("__rj_t") / binMicros))
    lBinned.join(rBinned, keys :+ "__rj_bin")
      .filter(col("__rj_t") >= col("__rj_s") && col("__rj_t") < col("__rj_e"))
      .drop("__rj_bin", "__rj_t", "__rj_s", "__rj_e")
  }
}
