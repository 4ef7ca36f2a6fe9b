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

  // ── C4 test-harness lineification ────────────────────────────────
  // The corpus is punctuation-free word soup, so the C4 line rules
  // would be vacuously all-drop on raw text. Both engines first derive
  // the SAME newline-delimited page deterministically from (doc_id,
  // text): 6-word chunks with a (doc_id + i) % 5 ending — '.', '!',
  // '?', '' (non-terminal → dropped), ' javascript.' (terminal but
  // poisoned → dropped) — plus doc_id-keyed page-level injections that
  // exercise each page flag (badword / lorem ipsum / brace). The
  // operator under test is the real rule set; the lineifier is just
  // the fixture generator, replayed verbatim in the oracle.
  private val LineifySpark = expr(
    """concat_ws(chr(10), concat(
      |  transform(sequence(1, (size(split(text, ' ')) + 5) div 6),
      |    i -> concat(
      |      array_join(slice(split(text, ' '), (i - 1) * 6 + 1, 6), ' '),
      |      element_at(array('.', '!', '?', '', ' javascript.'),
      |        cast((doc_id + i) % 5 AS int) + 1))),
      |  if(doc_id % 11 = 0, array('what the hell happened here.'),
      |     cast(array() AS array<string>)),
      |  if(doc_id % 13 = 0, array('lorem ipsum dolor sit amet.'),
      |     cast(array() AS array<string>)),
      |  if(doc_id % 17 = 0, array('config { toggles }.'),
      |     cast(array() AS array<string>))))""".stripMargin)

  private val LineifyCte =
    """lined AS (
      |  SELECT doc_id, array_to_string(list_concat(list_concat(list_concat(
      |    list_transform(generate_series(1, (len(ws) + 5) // 6),
      |      i -> array_to_string(ws[(i - 1) * 6 + 1 : i * 6], ' ') ||
      |           CASE CAST((doc_id + i) % 5 AS INT)
      |             WHEN 0 THEN '.' WHEN 1 THEN '!' WHEN 2 THEN '?'
      |             WHEN 3 THEN '' ELSE ' javascript.' END),
      |    CASE WHEN doc_id % 11 = 0
      |         THEN ['what the hell happened here.'] ELSE [] END),
      |    CASE WHEN doc_id % 13 = 0
      |         THEN ['lorem ipsum dolor sit amet.'] ELSE [] END),
      |    CASE WHEN doc_id % 17 = 0
      |         THEN ['config { toggles }.'] ELSE [] END),
      |    chr(10)) AS lined
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |        FROM documents WHERE text IS NOT NULL) t)""".stripMargin

  /** The C4 rule replay over the lineified page — clean text, line and
    * sentence counts, page flags, pass under the ≥5-sentence rule.
    */
  private val C4StatsCtes =
    s"""$LineifyCte,
       |flt AS (
       |  SELECT doc_id, lined,
       |    CAST(len(string_split(lined, chr(10))) AS BIGINT) AS n_lines,
       |    list_filter(string_split(lined, chr(10)), l ->
       |      length(l) > 0
       |      AND substr(l, length(l), 1) IN ('.', '!', '?', '"')
       |      AND len(list_filter(string_split(l, ' '),
       |            w -> length(w) > 0)) >= 3
       |      AND NOT contains(lower(l), 'javascript')) AS kept
       |  FROM lined),
       |st AS (
       |  SELECT doc_id,
       |    array_to_string(kept, chr(10)) AS clean_text,
       |    n_lines,
       |    CAST(len(kept) AS BIGINT) AS n_kept,
       |    CAST(length(array_to_string(kept, chr(10)))
       |         - length(replace(replace(replace(
       |             array_to_string(kept, chr(10)), '.', ''), '!', ''),
       |             '?', '')) AS BIGINT) AS n_sentences,
       |    CAST(CASE WHEN contains(lower(lined), 'lorem ipsum')
       |         THEN 1 ELSE 0 END AS BIGINT) AS has_lorem,
       |    CAST(CASE WHEN contains(lined, '{')
       |         THEN 1 ELSE 0 END AS BIGINT) AS has_brace,
       |    CAST(CASE WHEN len(list_intersect(
       |           regexp_split_to_array(lower(lined), '[^a-z0-9]+'),
       |           ['hell', 'damn', 'shit'])) > 0
       |         THEN 1 ELSE 0 END AS BIGINT) AS has_badword
       |  FROM flt),
       |c4 AS (
       |  SELECT d.doc_id,
       |    coalesce(s.clean_text, '') AS clean_text,
       |    coalesce(s.n_lines, 0) AS n_lines,
       |    coalesce(s.n_kept, 0) AS n_kept,
       |    coalesce(s.n_sentences, 0) AS n_sentences,
       |    coalesce(s.has_lorem, 0) AS has_lorem,
       |    coalesce(s.has_brace, 0) AS has_brace,
       |    coalesce(s.has_badword, 0) AS has_badword,
       |    CAST(CASE WHEN coalesce(s.n_sentences, 0) >= 5
       |              AND coalesce(s.has_lorem, 0) = 0
       |              AND coalesce(s.has_brace, 0) = 0
       |              AND coalesce(s.has_badword, 0) = 0
       |         THEN 1 ELSE 0 END AS BIGINT) AS c4_pass
       |  FROM documents d LEFT JOIN st s USING (doc_id))""".stripMargin

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
    }.sortedBy(col("w1"), col("w2")),

    // ── C4 page cleaning (Raffel et al. 2020 §2.2) ────────────────
    // The full rule set over the lineified corpus: per-page stats +
    // flags + pass. The Spark side is ONE row-local codegen'd
    // expression (functions/C4Stats.scala) — zero shuffles.
    QueryDef("t_c4_stats",
      s"""WITH $C4StatsCtes
         |SELECT * FROM c4 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val lined = Tables.documents(s, d)
        .select(col("doc_id"), LineifySpark.as("lined"))
      TextAnalysis.c4Stats(lined, textCol = "lined")
    }.sortedBy(col("doc_id")),

    // ... and the page REWRITE a pipeline feeds downstream: surviving
    // pages only, text replaced by the line-filtered clean form.
    QueryDef("t_c4_clean",
      s"""WITH $C4StatsCtes
         |SELECT doc_id, clean_text, n_kept, n_sentences
         |FROM c4 WHERE c4_pass = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val lined = Tables.documents(s, d)
        .select(col("doc_id"), LineifySpark.as("lined"))
      TextAnalysis.c4Clean(lined, textCol = "lined")
    }.sortedBy(col("doc_id")),

    // ── CMS-pruned heavy hitters ───────────────────────────────────
    // Exact corpus word frequencies ≥ threshold, with the long tail cut
    // MAP-SIDE by a count-min estimate (ext/FreqSketch.scala) before
    // the exact aggregation — CMS never undercounts, so the output is
    // bit-identical to the plain exact query the oracle runs (the
    // Bloom-gate invisibility contract). A deliberately narrow 2×64
    // sketch forces collisions; the exact confirm absorbs them.
    QueryDef("t_heavy_hitters",
      """SELECT word, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word
        |      FROM documents WHERE text IS NOT NULL) u
        |GROUP BY 1 HAVING count(*) >= 100
        |ORDER BY word""".stripMargin) { (s, d) =>
      graft.ext.FreqSketch.heavyHitterWords(Tables.documents(s, d),
        threshold = 100L, d = 2, w = 64)
    }.sortedBy(col("word")),

    // ── Cross-engine HLL distinct-shingle sketch ───────────────────
    // Per-domain distinct 3-shingle count by a 64-register HyperLogLog
    // on the engine's polyhash — unlike approx_count_distinct (an
    // engine-private HLL++), registers AND the raw integer estimate
    // replay exactly in DuckDB, so the sketch itself is oracle-gated.
    // The exact count + err_x100 ride along as the sf-scale
    // verification columns a 100 TB run drops.
    QueryDef("t_hll_shingles",
      s"""WITH hw AS (SELECT source, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |hsh AS (SELECT source,
         |  CASE WHEN len(ws) >= 3 THEN list_transform(
         |         generate_series(1, len(ws)-2),
         |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
         |       ELSE [array_to_string(ws, ' ')] END AS sh FROM hw),
         |hhs AS (SELECT source,
         |  list_distinct(list_transform(sh, s -> ${LlmOracle.polyhash("s")}))
         |    AS hs FROM hsh),
         |items AS (SELECT source, unnest(hs) AS h FROM hhs),
         |regs AS (SELECT source, h % 64 AS reg,
         |  max(CASE WHEN h // 64 = 0 THEN 26
         |           ELSE 26 - length(bin(h // 64)) END) AS rank
         |  FROM items GROUP BY 1, 2),
         |rl AS (SELECT source, rank,
         |  max(rank) OVER (PARTITION BY source) AS l FROM regs),
         |pg AS (SELECT source, CAST(max(l) AS BIGINT) AS max_rank,
         |  CAST(count(*) AS BIGINT) AS n_regs,
         |  CAST(sum(CAST(1 AS BIGINT) << CAST(l - rank AS INT)) AS BIGINT)
         |    AS sp FROM rl GROUP BY 1),
         |fin AS (SELECT source, n_regs, max_rank,
         |  sp + (64 - n_regs) * (CAST(1 AS BIGINT) << CAST(max_rank AS INT))
         |    AS s FROM pg),
         |est AS (SELECT source, n_regs, max_rank,
         |  (7094 * 4096 * (CAST(1 AS BIGINT) << CAST(max_rank AS INT)))
         |    // (10000 * s) AS hll_distinct FROM fin),
         |ex AS (SELECT source, CAST(count(DISTINCT h) AS BIGINT) AS n_exact
         |  FROM items GROUP BY 1)
         |SELECT e.source, e.n_regs, e.max_rank, e.hll_distinct, x.n_exact,
         |  abs(e.hll_distinct - x.n_exact) * 100 // x.n_exact AS err_x100
         |FROM est e JOIN ex x USING (source)
         |ORDER BY e.source""".stripMargin) { (s, d) =>
      graft.ext.FreqSketch.hllShingleReport(Tables.documents(s, d))
    }.sortedBy(col("source")),

    // ── Per-domain tokenizer fertility ─────────────────────────────
    // chars-per-BPE-token by source domain — the "how many tokens will
    // this domain cost to train on" planning statistic (fertility
    // regressions are how tokenizer/corpus mismatches surface). One
    // partial-aggregated shuffle over the codegen'd token counter;
    // integer fixed-point ratio.
    QueryDef("t_domain_fertility", {
      val pat = TextAnalysis.BpePattern.replace("'", "''")
      s"""SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
         |  CAST(sum(len(regexp_extract_all(text, '$pat'))) AS BIGINT)
         |    AS n_bpe_tokens,
         |  CASE WHEN sum(len(regexp_extract_all(text, '$pat'))) > 0
         |       THEN CAST(sum(length(text)) * 100
         |            // sum(len(regexp_extract_all(text, '$pat'))) AS BIGINT)
         |       ELSE 0 END AS chars_per_token_x100
         |FROM documents GROUP BY 1 ORDER BY source""".stripMargin
    }) { (s, d) =>
      Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("n_chars"),
          sum(TextAnalysis.bpeTokenCount(col("text"))).cast("long")
            .as("n_bpe_tokens"))
        .withColumn("chars_per_token_x100",
          when(col("n_bpe_tokens") > 0,
            expr("n_chars * 100 div n_bpe_tokens")).otherwise(0L))
    }.sortedBy(col("source")))
}
