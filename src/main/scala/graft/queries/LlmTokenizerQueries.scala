package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Tokenizer-training (BPE/WordPiece/unigram), Gopher rule and line-dedup queries.
  * Split out of the monolithic LlmQueries registry (round 20); order
  * and semantics unchanged — [[LlmQueries.defs]] concatenates the
  * families in the original sequence.
  */
private[graft] object LlmTokenizerQueries {
  import LlmOracle._
  import LlmShared._

  val defs: Seq[QueryDef] = Seq(
    // ── WordPiece tokenizer training (BERT lineage) ────────────────
    // The learnBpeMerges iteration shape with the likelihood-score
    // argmax: next merge maximizes count(ab)/(count(a)·count(b)) as a
    // 10¹²-fixed-point integer — rare-but-cohesive pairs outrank
    // frequent-but-independent ones. Oracle replays the same unrolled
    // walk with the scored best-pair selection.
    QueryDef("t_wordpiece_train", wordPieceTrainSql(BpeTrainMerges)) { (s, d) =>
      import s.implicits._
      learnedWordPieceFor(s, d, BpeTrainMerges).zipWithIndex
        .map { case ((a, b, n, sc), i) => (i.toLong, a, b, n, sc) }
        .toDF("rank", "lhs", "rhs", "n", "score_fp")
    }.sortedBy(col("rank")),

    // ... and tokenize the corpus under the WordPiece-learned table
    // (rank-ordered merge application — the training objective is
    // WordPiece's, the inference rule the shared merge walk).
    QueryDef("t_wordpiece_tokenize",
      bpeTrainTokenizeSql(BpeTrainMerges, scored = true)) { (s, d) =>
      val learned = learnedWordPieceFor(s, d, BpeTrainMerges)
        .map(m => (m._1, m._2))
      val toks = TextAnalysis.bpeMergeTokensWith(col("text"), learned)
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(array_join(toks, "\u0001"), lit("")).as("learned_tokens"),
        coalesce(size(toks).cast("long"), lit(0L)).as("n_learned_tokens"))
    }.sortedBy(col("doc_id")),

    // ── BYTE-LEVEL WordPiece training + tokenize: the likelihood-
    // scored trainer over byte symbols — completes the byte-level
    // story across all three tokenizer families (merge-BPE, unigram,
    // WordPiece), same planted multibyte corpus, same unrolled replay.
    QueryDef("t_wordpiece_bytes_train",
      wordPieceTrainSql(BpeTrainMerges, rel = "plantedmb",
        byteLevel = true, prefixCtes = PlantedMbCte)) { (s, d) =>
      import s.implicits._
      learnedByteWordPieceFor(s, d, BpeTrainMerges).zipWithIndex
        .map { case ((a, b, n, sc), i) => (i.toLong, a, b, n, sc) }
        .toDF("rank", "lhs", "rhs", "n", "score_fp")
    }.sortedBy(col("rank")),

    QueryDef("t_wordpiece_bytes_tokenize",
      bpeTrainTokenizeSql(BpeTrainMerges, scored = true,
        rel = "plantedmb", byteLevel = true,
        prefixCtes = PlantedMbCte)) { (s, d) =>
      val learned = learnedByteWordPieceFor(s, d, BpeTrainMerges)
        .map(m => (m._1, m._2))
      val toks = TextAnalysis.bpeMergeTokensWith(col("text"), learned,
        byteLevel = true)
      plantedMbDocs(s, d).select(col("doc_id"),
        coalesce(array_join(toks, "\u0001"), lit("")).as("learned_tokens"),
        coalesce(size(toks).cast("long"), lit(0L)).as("n_learned_tokens"))
    }.sortedBy(col("doc_id")),

    // ── Unigram-LM (SentencePiece-style) tokenizer training ────────
    // Integer-exact hard-EM over the weighted pre-token block
    // vocabulary: seed substring counts → surprisal-bit costs → exact
    // Viterbi DP (longer-piece tie-break) → usage recount, with the
    // char-fallback likelihood-loss prune between rounds. The oracle
    // replays every stage unrolled — seeds, both EM rounds' DP levels,
    // the recursive chosen-piece walk, and the prune ranking.
    QueryDef("t_unigram_lm_train", unigramTrainSql()) { (s, d) =>
      import s.implicits._
      learnedUnigramFor(s, d).zipWithIndex
        .map { case ((p, c, b), i) => (i.toLong, p, c, b) }
        .toDF("rank", "piece", "cnt", "bits")
    }.sortedBy(col("rank")),

    // ... and Viterbi-tokenize the corpus under the inventory just
    // learned (final smoothed bits) — the full train → tokenize
    // lifecycle, compared token-for-token like t_bpe_train_tokenize.
    QueryDef("t_unigram_lm_tokenize", unigramTokenizeSql()) { (s, d) =>
      val inv = learnedUnigramFor(s, d)
      val toks = TextAnalysis.unigramTokensWith(col("text"), inv)
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(array_join(toks, "\u0001"), lit("")).as("learned_tokens"),
        coalesce(size(toks).cast("long"), lit(0L)).as("n_learned_tokens"))
    }.sortedBy(col("doc_id")),

    // Per-domain tokenizer coverage: planted '~' runs (absent from the
    // training corpus, hence from every vocab piece) must surface as
    // unknown-fallback pieces — the which-domain-breaks-my-tokenizer
    // readout, counted identically by the SQL Viterbi replay.
    QueryDef("t_tokenizer_coverage", tokenizerCoverageSql) { (s, d) =>
      val inv = learnedUnigramFor(s, d)
      val planted = Tables.documents(s, d).select(col("source"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" ~~~")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.tokenizerCoverage(planted, inv)
    }.sortedBy(col("source")),

    QueryDef("t_bpe_train", bpeTrainSql(BpeTrainMerges)) { (s, d) =>
      import s.implicits._
      learnedMergesFor(s, d, BpeTrainMerges).zipWithIndex
        .map { case ((a, b, n), i) => (i.toLong, a, b, n) }
        .toDF("rank", "lhs", "rhs", "n")
    }.sortedBy(col("rank")),

    // ... and tokenize the corpus under the table just learned -- the
    // full train -> tokenize lifecycle, compared token-for-token.
    QueryDef("t_bpe_train_tokenize", bpeTrainTokenizeSql(BpeTrainMerges)) { (s, d) =>
      val learned = learnedMergesFor(s, d, BpeTrainMerges).map(m => (m._1, m._2))
      val toks = TextAnalysis.bpeMergeTokensWith(col("text"), learned)
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(array_join(toks, "\u0001"), lit("")).as("learned_tokens"),
        coalesce(size(toks).cast("long"), lit(0L)).as("n_learned_tokens"))
    }.sortedBy(col("doc_id")),

    // ── BYTE-LEVEL BPE training (the GPT-2/Llama-lineage byte walk) ──
    // Same Sennrich loop, starting symbols = each pre-token's UTF-8
    // bytes through the bytes_to_unicode table instead of code points,
    // on a corpus with a planted multibyte tail (é/è/CJK) where the two
    // modes provably diverge — merges here can and do join the bytes of
    // one multibyte character. The oracle replays the byte expansion
    // arithmetically (ord → UTF-8 bytes → the three CASE ranges) and
    // must produce the identical (rank, lhs, rhs, count) table.
    QueryDef("t_bpe_train_bytes",
      bpeTrainSql(BpeTrainMerges, rel = "plantedmb", byteLevel = true,
        prefixCtes = PlantedMbCte)) { (s, d) =>
      import s.implicits._
      learnedByteMergesFor(s, d, BpeTrainMerges).zipWithIndex
        .map { case ((a, b, n), i) => (i.toLong, a, b, n) }
        .toDF("rank", "lhs", "rhs", "n")
    }.sortedBy(col("rank")),

    // ... and tokenize the planted corpus under the byte-level table —
    // tokens are byte symbols (Ġ-prefixed words, split multibyte
    // chars), compared token-for-token against the SQL replay.
    QueryDef("t_bpe_bytes_tokenize",
      bpeTrainTokenizeSql(BpeTrainMerges, scored = false,
        rel = "plantedmb", byteLevel = true,
        prefixCtes = PlantedMbCte)) { (s, d) =>
      val learned = learnedByteMergesFor(s, d, BpeTrainMerges)
        .map(m => (m._1, m._2))
      val toks = TextAnalysis.bpeMergeTokensWith(col("text"), learned,
        byteLevel = true)
      plantedMbDocs(s, d).select(col("doc_id"),
        coalesce(array_join(toks, "\u0001"), lit("")).as("learned_tokens"),
        coalesce(size(toks).cast("long"), lit(0L)).as("n_learned_tokens"))
    }.sortedBy(col("doc_id")),

    // ── BYTE-LEVEL unigram-LM training + tokenize: the SentencePiece
    // lifecycle over byte symbols — pre-tokens byte-encoded before
    // block-cutting, so seeds, Viterbi pieces and the prune all count
    // bytes; learned pieces can span a multibyte character's bytes.
    // Same planted corpus and unrolled replay as the BPE byte pair.
    QueryDef("t_unigram_bytes_train",
      unigramTrainSql(rel = "plantedmb", byteLevel = true,
        prefixCtes = PlantedMbCte)) { (s, d) =>
      import s.implicits._
      learnedByteUnigramFor(s, d).zipWithIndex
        .map { case ((p, c, b), i) => (i.toLong, p, c, b) }
        .toDF("rank", "piece", "cnt", "bits")
    }.sortedBy(col("rank")),

    QueryDef("t_unigram_bytes_tokenize",
      unigramTokenizeSql(rel = "plantedmb", byteLevel = true,
        prefixCtes = PlantedMbCte)) { (s, d) =>
      val inv = learnedByteUnigramFor(s, d)
      val toks = TextAnalysis.unigramTokensWith(col("text"), inv,
        byteLevel = true)
      plantedMbDocs(s, d).select(col("doc_id"),
        coalesce(array_join(toks, "\u0001"), lit("")).as("learned_tokens"),
        coalesce(size(toks).cast("long"), lit(0L)).as("n_learned_tokens"))
    }.sortedBy(col("doc_id")),

    // The SAME chain with the tokenizer ROUND-TRIPPED THROUGH DISK
    // (writeMergeTokenizer → rank-ordered vocab table + _meta →
    // loadTokenizer) — the t_nb_classify_persisted lifecycle for
    // tokenizers: one oracle gates that a persisted tokenizer cuts
    // every document bit-identically to the in-session trainer output
    // (a silently retrained/drifted tokenizer changes every token
    // count downstream).
    QueryDef("t_bpe_persisted_tokenize",
      bpeTrainTokenizeSql(BpeTrainMerges)) { (s, d) =>
      val bundle = TextAnalysis.loadTokenizer(s, bpeTokenizerFor(s, d))
      val toks = bundle.tokens(col("text"))
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(array_join(toks, "\u0001"), lit("")).as("learned_tokens"),
        coalesce(size(toks).cast("long"), lit(0L)).as("n_learned_tokens"))
    }.sortedBy(col("doc_id")),

    // ... and the unigram-LM family through the same disk round-trip
    // (counts persist so the loaded artifact re-derives the smoothing
    // denominator exactly; max_piece_len pins in _meta).
    QueryDef("t_unigram_persisted_tokenize", unigramTokenizeSql()) { (s, d) =>
      val bundle = TextAnalysis.loadTokenizer(s, unigramTokenizerFor(s, d))
      val toks = bundle.tokens(col("text"))
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(array_join(toks, "\u0001"), lit("")).as("learned_tokens"),
        coalesce(size(toks).cast("long"), lit(0L)).as("n_learned_tokens"))
    }.sortedBy(col("doc_id")),

    // Gopher-style repetition signals: word-2-gram counts as integers
    // (total / most-frequent / duplicated occurrences) — the repeated-
    // content filter a curation pipeline cuts spam on.
    // ── Full Gopher repetition rule set (Rae et al. 2021) ──────────
    // Per n: top-{2,3,4}-gram max count·length and dup-{5..10}-gram
    // Σ count·length, as x100 char fractions + the pass flag under the
    // paper thresholds. One generated CTE trio per n-size; the Spark
    // side is one native single-pass expression.
    QueryDef("t_gopher_stats", {
      val tops = graft.functions.GopherRepetition.TopNs
      val dups = graft.functions.GopherRepetition.DupNs
      val thr = TextAnalysis.GopherThresholdsX100
      def cte(n: Int): String =
        s"""gg$n AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= $n
           |    THEN list_transform(generate_series(1, len(ws) - ${n - 1}),
           |           gi -> array_to_string(ws[gi:gi+${n - 1}], ' '))
           |    ELSE [] END) AS gm FROM gow),
           |gc$n AS (SELECT doc_id, gm, CAST(count(*) AS BIGINT) AS c
           |  FROM gg$n GROUP BY 1, 2),
           |ga$n AS (SELECT doc_id,
           |  CAST(max(c * length(gm)) AS BIGINT) AS top,
           |  CAST(coalesce(sum(CASE WHEN c >= 2 THEN c * length(gm) END), 0)
           |       AS BIGINT) AS dup
           |  FROM gc$n GROUP BY 1)"""
      val fracs = tops.map(n =>
        s"""  CASE WHEN coalesce(length(d.text), 0) > 0
           |       THEN CAST(coalesce(ga$n.top, 0) * 100 // length(d.text)
           |            AS BIGINT) ELSE 0 END AS top${n}_frac_x100""") ++
        dups.map(n =>
          s"""  CASE WHEN coalesce(length(d.text), 0) > 0
             |       THEN CAST(coalesce(ga$n.dup, 0) * 100 // length(d.text)
             |            AS BIGINT) ELSE 0 END AS dup${n}_frac_x100""")
      val passTerms = (tops.map(n => s"top${n}_frac_x100") ++
        dups.map(n => s"dup${n}_frac_x100")).zip(thr)
        .map { case (c, t) => s"$c <= $t" }.mkString(" AND ")
      val joins = (tops ++ dups)
        .map(n => s"LEFT JOIN ga$n ON ga$n.doc_id = d.doc_id").mkString("\n|")
      s"""WITH gow AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |${(tops ++ dups).map(cte).mkString(",\n|")},
         |gall AS (SELECT d.doc_id,
         |  CAST(coalesce(length(d.text), 0) AS BIGINT) AS n_chars,
         |${fracs.mkString(",\n|")}
         |FROM documents d
         |$joins)
         |SELECT *, CAST(CASE WHEN $passTerms THEN 1 ELSE 0 END AS BIGINT)
         |  AS gopher_pass
         |FROM gall ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      TextAnalysis.gopherStats(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Line/paragraph Gopher rules over PLANTED multiline structure ─
    // The corpus is flat single-space text, so the fixture rebuilds
    // every doc as 2 paragraphs × 3 lines IN SQL ON BOTH SIDES (the
    // t_mirror_docs planted pattern): doc_id % 3 repeats a line inside
    // paragraph 1, doc_id % 5 repeats the whole paragraph — so the
    // corpus exercises line-dup-only, para-dup-only (which drags line
    // dups with it), both (%15), and clean docs. Duplicates counted as
    // all-but-first occurrences (n − n_distinct), char fractions over
    // unit-char totals (separators excluded on both engines).
    QueryDef("t_gopher_lines",
      s"""WITH mlv AS (
         |  SELECT doc_id,
         |    coalesce(array_to_string(ws[1:4], ' '), '') AS l1,
         |    coalesce(array_to_string(ws[5:8], ' '), '') AS l2,
         |    CASE WHEN doc_id % 3 = 0
         |         THEN coalesce(array_to_string(ws[1:4], ' '), '')
         |         ELSE coalesce(array_to_string(ws[9:12], ' '), '')
         |    END AS l3,
         |    coalesce(array_to_string(ws[13:20], ' '), '') AS tl
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM documents WHERE text IS NOT NULL)),
         |mlt AS (
         |  SELECT doc_id,
         |    l1 || chr(10) || l2 || chr(10) || l3 || chr(10) || chr(10) ||
         |    CASE WHEN doc_id % 5 = 0
         |         THEN l1 || chr(10) || l2 || chr(10) || l3
         |         ELSE tl END AS text
         |  FROM mlv),
         |gls AS (SELECT doc_id,
         |    string_split(text, chr(10)) AS ls,
         |    string_split(text, chr(10) || chr(10)) AS ps
         |  FROM mlt),
         |glm AS (SELECT doc_id,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(len(ps) AS BIGINT) AS n_paras,
         |    CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS dl,
         |    CAST(coalesce(list_sum(list_transform(ls, x -> length(x))), 0)
         |      AS BIGINT) AS lc,
         |    CAST(coalesce(list_sum(list_transform(list_distinct(ls),
         |      x -> length(x))), 0) AS BIGINT) AS lcd,
         |    CAST(len(ps) - len(list_distinct(ps)) AS BIGINT) AS dp,
         |    CAST(coalesce(list_sum(list_transform(ps, x -> length(x))), 0)
         |      AS BIGINT) AS pc,
         |    CAST(coalesce(list_sum(list_transform(list_distinct(ps),
         |      x -> length(x))), 0) AS BIGINT) AS pcd
         |  FROM gls),
         |glf AS (SELECT doc_id, n_lines, n_paras,
         |    CASE WHEN n_lines > 0
         |         THEN CAST(dl * 100 // n_lines AS BIGINT) ELSE 0 END
         |      AS dup_line_frac_x100,
         |    CASE WHEN lc > 0
         |         THEN CAST((lc - lcd) * 100 // lc AS BIGINT) ELSE 0 END
         |      AS dup_line_char_frac_x100,
         |    CASE WHEN n_paras > 0
         |         THEN CAST(dp * 100 // n_paras AS BIGINT) ELSE 0 END
         |      AS dup_para_frac_x100,
         |    CASE WHEN pc > 0
         |         THEN CAST((pc - pcd) * 100 // pc AS BIGINT) ELSE 0 END
         |      AS dup_para_char_frac_x100
         |  FROM glm)
         |SELECT *, CAST(CASE WHEN dup_line_frac_x100 <= 30
         |    AND dup_line_char_frac_x100 <= 20
         |    AND dup_para_frac_x100 <= 30
         |    AND dup_para_char_frac_x100 <= 20 THEN 1 ELSE 0 END
         |  AS BIGINT) AS gopher_lines_pass
         |FROM glf ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val ws = split(col("text"), " ")
      def seg(st: Int, len: Int) = concat_ws(" ", slice(ws, st, len))
      val l1 = seg(1, 4)
      val l2 = seg(5, 4)
      val l3 = when(col("doc_id") % 3 === 0, seg(1, 4)).otherwise(seg(9, 4))
      val p1 = concat(l1, lit("\n"), l2, lit("\n"), l3)
      val planted = docs.select(col("doc_id"),
        concat(p1, lit("\n\n"),
          when(col("doc_id") % 5 === 0, p1).otherwise(seg(13, 8)))
          .as("text"))
      TextAnalysis.gopherLineStats(planted)
    }.sortedBy(col("doc_id")),

    // ── Corpus-level line dedup (CCNet stage 1) over the SAME planted
    // multiline fixture: %3 docs lose their repeated intra-doc line,
    // %5 docs lose the mirrored paragraph's lines, and the empty
    // boundary line (which EVERY doc contributes) survives only in the
    // globally-first document — the global-scope proof. The replay is
    // the t_passage_dedup packed-key law at line granularity with a
    // chr(10) rebuild.
    QueryDef("t_dedup_lines",
      s"""WITH mlv AS (
         |  SELECT doc_id,
         |    coalesce(array_to_string(ws[1:4], ' '), '') AS l1,
         |    coalesce(array_to_string(ws[5:8], ' '), '') AS l2,
         |    CASE WHEN doc_id % 3 = 0
         |         THEN coalesce(array_to_string(ws[1:4], ' '), '')
         |         ELSE coalesce(array_to_string(ws[9:12], ' '), '')
         |    END AS l3,
         |    coalesce(array_to_string(ws[13:20], ' '), '') AS tl
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM documents WHERE text IS NOT NULL)),
         |mlt AS (
         |  SELECT doc_id,
         |    l1 || chr(10) || l2 || chr(10) || l3 || chr(10) || chr(10) ||
         |    CASE WHEN doc_id % 5 = 0
         |         THEN l1 || chr(10) || l2 || chr(10) || l3
         |         ELSE tl END AS text
         |  FROM mlv),
         |gls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM mlt),
         |lp AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(ls)),
         |    i -> struct_pack(cid := CAST(i - 1 AS BIGINT), ct := ls[i])))
         |    AS u FROM gls),
         |ph AS (SELECT doc_id, u.cid AS cid, u.ct AS ct,
         |  ${polyhash64("u.ct")} AS h,
         |  doc_id * ${Dedup.PassageKeyBase} + u.cid AS k FROM lp),
         |f AS (SELECT h, min(k) AS mk FROM ph GROUP BY h),
         |fl AS (SELECT ph.doc_id, ph.cid, ph.ct, ph.k = f.mk AS keep
         |  FROM ph JOIN f ON f.h = ph.h),
         |agg AS (SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS np,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS nk,
         |  string_agg(CASE WHEN keep THEN ct END, chr(10) ORDER BY cid)
         |    AS ctext
         |  FROM fl GROUP BY doc_id)
         |SELECT m.doc_id, coalesce(a.ctext, '') AS clean_text,
         |  CAST(coalesce(a.np, 0) AS BIGINT) AS n_passages,
         |  CAST(coalesce(a.nk, 0) AS BIGINT) AS n_kept
         |FROM mlt m LEFT JOIN agg a ON a.doc_id = m.doc_id
         |ORDER BY m.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val ws = split(col("text"), " ")
      def seg(st: Int, len: Int) = concat_ws(" ", slice(ws, st, len))
      val l1 = seg(1, 4)
      val l2 = seg(5, 4)
      val l3 = when(col("doc_id") % 3 === 0, seg(1, 4)).otherwise(seg(9, 4))
      val p1 = concat(l1, lit("\n"), l2, lit("\n"), l3)
      val planted = docs.select(col("doc_id"),
        concat(p1, lit("\n\n"),
          when(col("doc_id") % 5 === 0, p1).otherwise(seg(13, 8)))
          .as("text"))
      Dedup.dedupLines(planted)
    }.sortedBy(col("doc_id")),

    // ── Per-domain DF boilerplate strip (the CCNet/Dolma stage line
    // DEDUP cannot express): every doc gains its domain's banner line
    // (DF 1000‰ → stripped from EVERY doc, first copy included) and %5
    // docs share a quote line (DF ~200‰ → kept everywhere — the case
    // first-occurrence dedup gets wrong in both directions). The replay
    // is the full integer law: distinct-doc DF per (domain, line-hash),
    // cross-multiplied threshold, chr(10) rebuild.
    QueryDef("t_strip_boilerplate",
      s"""WITH p AS (SELECT doc_id, source,
         |    'BANNER ' || source || chr(10) ||
         |    coalesce(array_to_string(string_split(text, ' ')[1:8], ' '), '') ||
         |    CASE WHEN doc_id % 5 = 0
         |         THEN chr(10) || 'QUOTE shared wisdom' ELSE '' END AS text
         |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |gls AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls
         |  FROM p),
         |lp AS (SELECT doc_id, source, unnest(list_transform(
         |    generate_series(1, len(ls)),
         |    i -> struct_pack(cid := CAST(i - 1 AS BIGINT), ct := ls[i])))
         |    AS u FROM gls),
         |ph AS (SELECT doc_id, source, u.cid AS cid, u.ct AS ct,
         |  ${polyhash64("u.ct")} AS h FROM lp),
         |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS ndd
         |  FROM p GROUP BY source),
         |dfr AS (SELECT source, h,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM ph GROUP BY source, h),
         |boiler AS (SELECT dfr.source, dfr.h
         |  FROM dfr JOIN nd ON nd.source = dfr.source
         |  WHERE nd.ndd >= 4 AND dfr.df * 1000 > 500 * nd.ndd),
         |fl AS (SELECT ph.doc_id, ph.source, ph.cid, ph.ct,
         |    b.h IS NOT NULL AS dropped
         |  FROM ph LEFT JOIN boiler b
         |    ON b.source = ph.source AND b.h = ph.h)
         |SELECT doc_id, source,
         |  coalesce(string_agg(CASE WHEN NOT dropped THEN ct END,
         |    chr(10) ORDER BY cid), '') AS clean_text,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN dropped THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_kept
         |FROM fl GROUP BY doc_id, source
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .filter(col("text").isNotNull && col("source").isNotNull)
      val own = concat_ws(" ", slice(split(col("text"), " "), 1, 8))
      val planted = docs.select(col("doc_id"), col("source"),
        concat(lit("BANNER "), col("source"), lit("\n"), own,
          when(col("doc_id") % 5 === 0, lit("\nQUOTE shared wisdom"))
            .otherwise(lit(""))).as("text"))
      Dedup.stripBoilerplateLines(planted)
    }.sortedBy(col("doc_id")),

    QueryDef("t_text_repetition",
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |grams AS (
         |  SELECT doc_id, unnest(CASE WHEN len(w) >= 2
         |    THEN list_transform(generate_series(1, len(w) - 1),
         |           i -> w[i] || ' ' || w[i + 1])
         |    ELSE [] END) AS gram
         |  FROM ws),
         |per_gram AS (
         |  SELECT doc_id, gram, count(*) AS n FROM grams GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_2grams,
         |         CAST(max(n) AS BIGINT) AS max_2gram_count,
         |         CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_2grams
         |  FROM per_gram GROUP BY 1)
         |SELECT d.doc_id,
         |       coalesce(a.n_2grams, 0) AS n_2grams,
         |       coalesce(a.max_2gram_count, 0) AS max_2gram_count,
         |       coalesce(a.n_dup_2grams, 0) AS n_dup_2grams
         |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.repetitionStats(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // Document fingerprint via the codegen'd PolyHash expression.
    QueryDef("t_fingerprint",
      s"""SELECT doc_id, ${polyhash("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    }.sortedBy(col("doc_id")),

    // 62-bit packed double fingerprint — the content-dedup key whose
    // birthday bound survives corpus scale (the passage/line/mirror
    // exact-collapse families key on THIS).
    QueryDef("t_fingerprint64",
      s"""SELECT doc_id, ${polyhash64("text")} AS fingerprint64
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        graft.functions.polyFingerprint64(col("text")).as("fingerprint64"))
    }.sortedBy(col("doc_id")),

    // Same fingerprint through the SQL surface: GraftExtensions
    // registers polyhash()/cosine_sim() via SparkSessionExtensions, so
    // spark.sql text works exactly like the Column API.
    QueryDef("t_fingerprint_sql",
      s"""SELECT doc_id, ${polyhash("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).createOrReplaceTempView("graft_documents")
      s.sql("SELECT doc_id, polyhash(text) AS fingerprint FROM graft_documents")
    }.sortedBy(col("doc_id")),
  )
}
