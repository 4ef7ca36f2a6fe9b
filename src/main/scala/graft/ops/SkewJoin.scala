package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.polyFingerprint

/** Deterministic key-salting for skewed equi-joins — the standard
  * 100 TB remedy when one join key holds a disproportionate share of
  * the probe side (a celebrity user, a default value) and AQE's
  * skew-join split cannot help (e.g. the skew is in a grouped
  * downstream, or the build side must replicate anyway).
  *
  * Semantics are EXACTLY the unsalted join's: the probe side's salt is
  * a pure function of a caller-named unique column (PolyHash — no RNG,
  * stable across runs/partitionings), the build side replicates once
  * per salt value, and the join adds the salt to the key set, so each
  * probe row meets each matching build row exactly once. Row
  * multiplicity, null-key behavior (equi-join: null keys never match)
  * and left-outer preservation are untouched — the DuckDB oracle runs
  * the PLAIN join and must agree row-for-row.
  */
object SkewJoin {

  /** Join `left` (large, possibly key-skewed) with `right` (build
    * side) on `keys`, spreading each hot key's probe rows over `salt`
    * sub-keys. `leftUniqueCol` names any left column unique per row
    * (an id) — it seeds the deterministic salt. `joinType`: `inner`
    * or `left_outer` (an unmatched left row survives exactly once).
    * Cost: the build side is replicated `salt`× — size it like a
    * broadcast decision (salt · |right| rows through the build
    * exchange).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftUniqueCol: String, salt: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      val hit = df.columns.filter(_.startsWith("__sj_"))
      require(hit.isEmpty,
        s"$side column(s) ${hit.mkString(", ")} use the reserved internal " +
          "prefix '__sj_' — rename before joining (withColumn would " +
          "silently replace them and change join semantics)")
    }
    // null-safe: PolyHash propagates null, and a null salt would drop
    // the row from the equi-join — a null unique id hashes like the
    // empty string instead (the Sampling.bucket convention), keeping
    // salted semantics identical to the plain join for every row
    val l = left.withColumn("__sj_s",
      pmod(polyFingerprint(
        coalesce(col(leftUniqueCol).cast("string"), lit(""))),
        lit(salt.toLong)))
    val r = right.withColumn("__sj_s",
      explode(sequence(lit(0L), lit(salt.toLong - 1L))))
    l.join(r, keys :+ "__sj_s", joinType).drop("__sj_s")
  }
}
