package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.TextAnalysis

/** Corpus-mining query surface: collocation statistics and rule-based
  * page filters beyond the Gopher/quality families in [[LlmQueries]].
  * Same contract — every query carries a DuckDB oracle replaying the
  * exact integer arithmetic, and name-aligned output columns.
  */
object TextMiningQueries {

  /** minCount for the PMI tail cut — shared by the operator call and the
    * generated oracle so the two can never drift.
    */
  private val PmiMinCount = 5L

  val defs: Seq[QueryDef] = Seq(

    // ── PMI collocations (Church & Hanks 1990) ─────────────────────
    // Bigram association strength, integer-exact via the overflow-safe
    // per-factor bin-length decomposition
    //   pmi_bits = (L(c12) − L(c1)) + (L(N) − L(c2)),  L(x) = length(bin(x))
    // — the textbook c12·N / (c1·c2) products overflow int64 at 100 TB
    // token counts, so no multiplication ever happens. minCount drops
    // the degenerate low-frequency tail.
    QueryDef("t_pmi_collocations",
      s"""WITH toks AS (
         |  SELECT string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |bg AS (
         |  SELECT unnest(CASE WHEN len(ws) >= 2
         |    THEN list_transform(generate_series(1, len(ws) - 1),
         |           i -> ws[i] || ' ' || ws[i + 1])
         |    ELSE [] END) AS bigram FROM toks),
         |pc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n_pair
         |  FROM bg GROUP BY 1),
         |uc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
         |  SELECT unnest(string_split(text, ' ')) AS word
         |  FROM documents WHERE text IS NOT NULL) u GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_pair) AS BIGINT) AS n_total FROM pc)
         |SELECT string_split(p.bigram, ' ')[1] AS w1,
         |       string_split(p.bigram, ' ')[2] AS w2,
         |       p.n_pair, u1.cnt AS n_w1, u2.cnt AS n_w2, t.n_total,
         |       CAST((length(bin(p.n_pair)) - length(bin(u1.cnt))) +
         |            (length(bin(t.n_total)) - length(bin(u2.cnt)))
         |            AS BIGINT) AS pmi_bits
         |FROM pc p
         |JOIN uc u1 ON u1.word = string_split(p.bigram, ' ')[1]
         |JOIN uc u2 ON u2.word = string_split(p.bigram, ' ')[2]
         |CROSS JOIN tot t
         |WHERE p.n_pair >= $PmiMinCount
         |ORDER BY w1, w2""".stripMargin) { (s, d) =>
      TextAnalysis.pmiCollocations(Tables.documents(s, d),
        minCount = PmiMinCount)
    }.sortedBy(col("w1"), col("w2")))
}
