package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation & annotation analytics — the scoring rungs a training-data
  * platform runs AFTER the model: eval-set scoring (exact match, token
  * F1 — the SQuAD-lineage pair every QA/extraction eval reports) and
  * annotation aggregation (majority vote, Cohen's κ) over human or
  * model-judge labels. Every law is INTEGER-exact (cross-multiplied
  * ratios, explicit floor division) so the DuckDB oracles replay the
  * scores bit-for-bit — an eval number that can't be reproduced in a
  * second engine is a number nobody should ship.
  */
object Eval {

  /** Per-item exact-match + bag-of-tokens F1 between a prediction and
    * a reference relation (joined on `idCol`; items present on only
    * one side are dropped — they have no score). Tokens follow the
    * [[TextAnalysis.normalizeText]] law, so "The cat." matches
    * "the cat"; overlap = Σ_w min(tf_pred(w), tf_ref(w)) — the bag
    * (clipped-count) formulation SQuAD uses, not set intersection.
    *
    *   f1_x100 = (2 · overlap · 100) div (n_pred + n_ref)
    *
    * with the empty-vs-empty convention: two empty token bags are a
    * PERFECT match (em=true, f1=100) — the SQuAD null-answer rule.
    * Output: (idCol, n_pred, n_ref, overlap, em, f1_x100).
    *
    * Scale shape: one row-local tokenize/explode per side, one
    * (id, word) partial-agg join, one id-keyed rollup — eval sets are
    * small next to corpora, but nothing here collects or crosses.
    */
  def tokenF1(preds: DataFrame, refs: DataFrame,
              idCol: String = "doc_id", predCol: String = "pred",
              refCol: String = "ref"): DataFrame = {
    // normalized relations PINNED: each feeds two plan branches (the
    // count/em join AND its token bag) — unpinned, the regex
    // normalization chain runs twice per side (measured 2.6 s → 1.5 s
    // at sf0.1); eval relations are small next to corpora, so the pin
    // is cheap by construction
    val nP = preds.filter(col(predCol).isNotNull).select(col(idCol),
      TextAnalysis.normalizeText(col(predCol)).as("__ev_np"))
      .localCheckpoint()
    val nR = refs.filter(col(refCol).isNotNull).select(col(idCol),
      TextAnalysis.normalizeText(col(refCol)).as("__ev_nr"))
      .localCheckpoint()
    def bag(df: DataFrame, c: String, side: String): DataFrame =
      df.select(col(idCol), explode(
          when(col(c) === "", expr("cast(array() AS array<string>)"))
            .otherwise(split(col(c), " "))).as("__ev_w"))
        .groupBy(col(idCol), col("__ev_w"))
        .agg(count(lit(1)).as(s"__ev_tf_$side"))
    val joined = nP.join(nR, idCol)
    val ov = bag(nP, "__ev_np", "p")
      .join(bag(nR, "__ev_nr", "r"), Seq(idCol, "__ev_w"))
      .groupBy(col(idCol))
      .agg(sum(least(col("__ev_tf_p"), col("__ev_tf_r"))).as("__ev_ov"))
    val counts = joined
      .withColumn("n_pred", when(col("__ev_np") === "", lit(0L))
        .otherwise(size(split(col("__ev_np"), " ")).cast("long")))
      .withColumn("n_ref", when(col("__ev_nr") === "", lit(0L))
        .otherwise(size(split(col("__ev_nr"), " ")).cast("long")))
    counts.join(ov, Seq(idCol), "left")
      .select(col(idCol), col("n_pred"), col("n_ref"),
        coalesce(col("__ev_ov"), lit(0L)).as("overlap"),
        (col("__ev_np") === col("__ev_nr")).as("em"),
        when(col("n_pred") + col("n_ref") === 0L, lit(100L))
          .otherwise(expr("(2 * coalesce(__ev_ov, 0) * 100) div " +
            "(n_pred + n_ref)")).as("f1_x100"))
  }

  /** Classification CONFUSION MATRIX + per-class precision/recall —
    * the readout every classifier gate (language ID, quality, safety)
    * ships with: predictions joined to references on `idCol`, one row
    * per observed (ref, pred) cell with the count, plus the cell's
    * share of its reference row (recall direction) and its prediction
    * column (precision direction), both ×100 integer-truncating —
    * replayed exactly by the oracle. Items present on only one side
    * or with a null label have no verdict and are dropped.
    *
    * Output: (ref, pred, n, recall_x100, precision_x100) — the
    * diagonal rows carry the per-class recall/precision; off-diagonal
    * rows show where the mass leaks. Scale shape: one id join + one
    * (ref, pred) partial-agg + two label-keyed marginal joins, all
    * bounded by the label vocabulary.
    */
  def confusionMatrix(preds: DataFrame, refs: DataFrame,
                      idCol: String = "doc_id", predCol: String = "pred",
                      refCol: String = "ref"): DataFrame = {
    val cells = preds.filter(col(predCol).isNotNull)
      .select(col(idCol), col(predCol))
      .join(refs.filter(col(refCol).isNotNull)
        .select(col(idCol), col(refCol)), idCol)
      .groupBy(col(refCol).as("ref"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
    val refTot = cells.groupBy(col("ref"))
      .agg(sum(col("n")).as("__cm_rn"))
    val predTot = cells.groupBy(col("pred"))
      .agg(sum(col("n")).as("__cm_pn"))
    cells.join(refTot, "ref").join(predTot, "pred")
      .select(col("ref"), col("pred"), col("n"),
        expr("(n * 100) div __cm_rn").as("recall_x100"),
        expr("(n * 100) div __cm_pn").as("precision_x100"))
  }

  /** Majority-vote label aggregation over an annotation relation
    * (`itemCol`, `annotatorCol`, `labelCol`) — the consensus step of
    * every labeling pipeline. Per item: the label with the most votes;
    * ties break to the LEXICOGRAPHICALLY SMALLEST label (a stated,
    * engine-independent rule — "first annotator wins" depends on row
    * order, which a distributed engine does not have). Null labels are
    * abstentions and don't vote; items where every annotator abstained
    * are absent. Output: (itemCol, label, votes, n_votes, unanimous).
    *
    * Scale shape: two partial-agg shuffles (item×label counts, then
    * per-item max via a bounded struct-max — never a window sort over
    * the corpus).
    */
  def majorityVote(labels: DataFrame, itemCol: String = "item_id",
                   annotatorCol: String = "annotator",
                   labelCol: String = "label"): DataFrame = {
    val votes = labels.filter(col(labelCol).isNotNull)
      .groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    // per-item argmax with smallest-label tie: max over
    // struct(votes, NEGATED label order) is wrong for strings — use
    // min over struct(-votes, label) instead: most votes first, then
    // smallest label
    votes.groupBy(col(itemCol))
      .agg(min(struct((-col("votes")).as("nv"), col(labelCol).as("l")))
          .as("__mv_top"),
        sum(col("votes")).as("n_votes"))
      .select(col(itemCol), col("__mv_top.l").as("label"),
        (-col("__mv_top.nv")).as("votes"), col("n_votes"),
        (col("__mv_top.nv") === -col("n_votes")).as("unanimous"))
  }

  /** Cohen's κ between every PAIR of annotators sharing items, scaled
    * ×10⁴ and floor-divided so both engines render the same integer:
    *
    *   κ·10⁴ = floor( (agree·n − Σ_l cntA(l)·cntB(l)) · 10⁴
    *                  / (n² − Σ_l cntA(l)·cntB(l)) )
    *
    * (the usual (p_o − p_e)/(1 − p_e) with every term multiplied by
    * n², divided with the TRUNCATING integer division BOTH engines
    * natively share — Spark `div` and DuckDB `//` each round toward
    * zero, verified on negative κ, which worse-than-chance annotators
    * legitimately produce.) Pairs ordered a < b; the degenerate n² = Σ
    * case (both
    * annotators constant and identical — p_e = 1) yields null κ,
    * disclosed rather than invented. Null labels are abstentions; a
    * pair's universe is the items BOTH labeled.
    *
    * Output: (ann_a, ann_b, n, agree, kappa_x10000).
    */
  def cohenKappa(labels: DataFrame, itemCol: String = "item_id",
                 annotatorCol: String = "annotator",
                 labelCol: String = "label"): DataFrame = {
    val l = labels.filter(col(labelCol).isNotNull)
      .select(col(itemCol), col(annotatorCol), col(labelCol))
    val a = l.select(col(itemCol), col(annotatorCol).as("ann_a"),
      col(labelCol).as("__ck_la"))
    val b = l.select(col(itemCol), col(annotatorCol).as("ann_b"),
      col(labelCol).as("__ck_lb"))
    val pairs = a.join(b, Seq(itemCol))
      .filter(col("ann_a") < col("ann_b"))
    val agg = pairs.groupBy(col("ann_a"), col("ann_b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__ck_la") === col("__ck_lb"), 1L).otherwise(0L))
          .as("agree"))
    // per-pair marginal products: Σ_label cntA(label) · cntB(label)
    val margA = pairs.groupBy(col("ann_a"), col("ann_b"),
        col("__ck_la").as("__ck_l"))
      .agg(count(lit(1)).as("__ck_ca"))
    val margB = pairs.groupBy(col("ann_a"), col("ann_b"),
        col("__ck_lb").as("__ck_l"))
      .agg(count(lit(1)).as("__ck_cb"))
    val pe = margA.join(margB, Seq("ann_a", "ann_b", "__ck_l"))
      .groupBy(col("ann_a"), col("ann_b"))
      .agg(sum(col("__ck_ca") * col("__ck_cb")).as("__ck_pe"))
    agg.join(pe, Seq("ann_a", "ann_b"))
      .select(col("ann_a"), col("ann_b"), col("n"), col("agree"),
        when(col("n") * col("n") === col("__ck_pe"), lit(null))
          .otherwise(expr(
            "((agree * n - __ck_pe) * 10000) div (n * n - __ck_pe)"))
          .cast("long").as("kappa_x10000"))
  }
}
