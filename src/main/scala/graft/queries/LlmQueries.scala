package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Oracle SQL fragments for the LLM-ops families. The minhash/simhash/
  * fingerprint pipelines are integer arithmetic on the PolyHash rolling
  * hash, so DuckDB reproduces every signature exactly; the SQL is
  * generated from the same constants (Dedup.Perms) the Spark operators
  * use — one source of truth.
  */
object LlmOracle {

  /** PolyHash of a string expression: fold over code points (the corpus
    * is ASCII, so code point == UTF-8 byte, matching PolyHash exactly).
    */
  def polyhash(expr: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(generate_series(1, length($expr)),
       |      i -> CAST(ord(substring($expr, i, 1)) AS BIGINT))),
       |  (acc, c) -> (acc * 31 + c) % 2147483647)""".stripMargin

  /** 62-bit packed double PolyHash (mirrors functions.PolyHash64):
    * h31 · (2³¹−19) + h37, the content-dedup key whose birthday bound
    * survives corpus scale.
    */
  def polyhash64(expr: String): String =
    s"""(${polyhash(expr)} * 2147483629 + list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(generate_series(1, length($expr)),
       |      i -> CAST(ord(substring($expr, i, 1)) AS BIGINT))),
       |  (acc, c) -> (acc * 37 + c) % 2147483629))""".stripMargin

  /** CTE: doc_id + distinct 3-word-shingle hash set per document of
    * `rel` (any relation exposing doc_id + text). `prefix` renames the
    * chain (`<p>words`/`<p>shing`/`<p>hashes`) so a query can carry two
    * independent hash chains (e.g. corpus vs benchmark) without CTE
    * collisions.
    */
  def hashesCteFrom(rel: String, prefix: String = ""): String =
    s"""${prefix}words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $rel),
       |${prefix}shing AS (SELECT doc_id,
       |  CASE WHEN len(ws) >= 3 THEN list_transform(generate_series(1, len(ws)-2),
       |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
       |       ELSE [array_to_string(ws, ' ')] END AS sh FROM ${prefix}words),
       |${prefix}hashes AS (SELECT doc_id,
       |  list_distinct(list_transform(sh, s -> ${polyhash("s")})) AS hs
       |  FROM ${prefix}shing)""".stripMargin

  val hashesCte: String = hashesCteFrom("documents")

  /** CTEs replaying the hot-bucket guard's exact-collapse over the
    * `hashes` CTE ([[graft.ext.Dedup.withExactReps]]): `grp` maps each
    * distinct hash set to its min-id representative; `mem` maps every
    * document to its rep (null-hash docs represent themselves — the
    * LEFT JOIN's null keys never match, exactly like the Spark window's
    * isNull guard).
    */
  val repCollapseCtes: String =
    s"""grp AS (SELECT hs, min(doc_id) AS rep FROM hashes
       |        WHERE hs IS NOT NULL GROUP BY hs),
       |mem AS (SELECT h.doc_id, coalesce(g.rep, h.doc_id) AS rep
       |        FROM hashes h LEFT JOIN grp g ON h.hs = g.hs)""".stripMargin

  /** CTEs: LSH band keys + canonically-ordered candidate pairs at
    * REPRESENTATIVE level — replaying [[graft.ext.Dedup.repLevelPairs]]'
    * guarded candidate generation for any banding layout, INCLUDING the
    * hot-bucket cap (QUALIFY count per (band, bkey) ≤ maxBucket, the
    * same [[graft.ext.Dedup.DefaultMaxBucketWidth]] constant the Spark
    * side applies — the cap is part of the verified contract, not a
    * Spark-only cut). Requires `sig` and the [[repCollapseCtes]] in
    * scope. Shared verbatim by the t_dedup_near oracle and
    * [[clusterCtes]] so the two formulations can never drift; alias
    * parameters avoid CTE-name collisions.
    */
  def bandCandidatesCte(numBands: Int = 4, rowsPerBand: Int = 2,
                        bandsAlias: String = "bands",
                        candAlias: String = "cand",
                        maxBucket: Int = Dedup.DefaultMaxBucketWidth): String =
    s"""$bandsAlias AS (
       |  SELECT s.doc_id, b.band, ${bandKeyExpr(rowsPerBand)} AS bkey
       |  FROM sig s JOIN grp g ON g.rep = s.doc_id
       |  CROSS JOIN (VALUES ${bandValues(numBands)}) b(band)
       |  QUALIFY count(*) OVER (PARTITION BY b.band, bkey) <= $maxBucket),
       |${selfCandCte(bandsAlias, candAlias)}""".stripMargin

  /** CTEs replaying [[graft.ext.Dedup.nearDupClusters]] exactly,
    * INCLUDING the hot-bucket guard: exact-collapse ([[repCollapseCtes]]),
    * capped representative-level LSH candidates, the integer
    * cross-multiplied Jaccard cut, STAR edges (member → rep, the m−1
    * expansion whose components provably equal the full member-pair
    * edge set), then connected components as a recursive reachability
    * walk whose min per node IS the fixpoint of Spark's min-label
    * propagation (both equal the component's minimum member id — the
    * oracle replays the RESULT, not the iteration schedule). Requires
    * `WITH RECURSIVE`. Yields `clusters(doc_id, cluster_id)` over the
    * node set `nodesRel` (any relation exposing doc_id). Banding layout
    * (`numBands` × `rowsPerBand`) must match the Spark call's.
    */
  def clusterCtes(nodesRel: String, jNum: Int, jDen: Int,
                  numBands: Int = 4, rowsPerBand: Int = 2,
                  maxBucket: Int = Dedup.DefaultMaxBucketWidth): String =
    s"""$repCollapseCtes,
       |${bandCandidatesCte(numBands, rowsPerBand, "cbands", "ccand", maxBucket)},
       |cpairs AS (
       |  SELECT doc_a, doc_b,
       |         len(list_intersect(ha.hs, hb.hs)) AS inter,
       |         len(ha.hs) + len(hb.hs)
       |           - len(list_intersect(ha.hs, hb.hs)) AS uni
       |  FROM ccand
       |  JOIN hashes ha ON ha.doc_id = ccand.doc_a
       |  JOIN hashes hb ON hb.doc_id = ccand.doc_b),
       |cedges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM cpairs
       |  WHERE inter * $jDen >= uni * $jNum
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM cpairs
       |  WHERE inter * $jDen >= uni * $jNum
       |  UNION ALL
       |  SELECT doc_id, rep FROM mem WHERE doc_id <> rep
       |  UNION ALL
       |  SELECT rep, doc_id FROM mem WHERE doc_id <> rep),
       |walk(id, r) AS (
       |  SELECT doc_id, doc_id FROM $nodesRel
       |  UNION
       |  SELECT w.id, e.dst FROM walk w JOIN cedges e ON e.src = w.r),
       |clusters AS (
       |  SELECT id AS doc_id, min(r) AS cluster_id FROM walk GROUP BY id)""".stripMargin

  /** The band-key expression over a `sig` row alias — THE one
    * definition of the banding layout, shared by every band CTE.
    */
  private def bandKeyExpr(rowsPerBand: Int): String =
    (1 to rowsPerBand)
      .map(r => s"CAST(sig[b.band * $rowsPerBand + $r] AS VARCHAR)")
      .mkString(" || '_' || ")

  private def bandValues(numBands: Int): String =
    (0 until numBands).map(b => s"($b)").mkString(", ")

  /** Canonically-ordered same-bucket candidate pairs from a band CTE —
    * the one definition of the self-join shape.
    */
  def selfCandCte(bandsAlias: String, alias: String): String =
    s"""$alias AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM $bandsAlias l JOIN $bandsAlias r
       |    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id)""".stripMargin

  /** Band-key rows of `sig` restricted to the ids of `rel(doc_id)`,
    * optionally width-capped (cap = 0 → uncapped, the shape of the
    * gate's store-side join).
    */
  def bandsOverCte(rel: String, alias: String, cap: Int,
                   numBands: Int = 4, rowsPerBand: Int = 2): String = {
    val qualify = if (cap > 0)
      s"\n  QUALIFY count(*) OVER (PARTITION BY b.band, bkey) <= $cap" else ""
    s"""$alias AS (
       |  SELECT s.doc_id, b.band, ${bandKeyExpr(rowsPerBand)} AS bkey
       |  FROM sig s JOIN $rel r ON r.doc_id = s.doc_id
       |  CROSS JOIN (VALUES ${bandValues(numBands)}) b(band)$qualify)""".stripMargin
  }

  /** The docs of `candRel(doc_a, doc_b)` whose exact Jaccard clears
    * num/den — emitting doc_b (the canonically-larger / batch side),
    * i.e. the DROP set of a pairwise keep-smallest rule. inter/uni are
    * computed once per pair (the list intersection is the expensive
    * part) and filtered in an outer select.
    */
  def jaccardDropCte(candRel: String, alias: String, jNum: Int, jDen: Int): String =
    s"""$alias AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM (
       |    SELECT doc_b, inter, lena + lenb - inter AS uni FROM (
       |      SELECT c.doc_b,
       |             len(list_intersect(ha.hs, hb.hs)) AS inter,
       |             len(ha.hs) AS lena, len(hb.hs) AS lenb
       |      FROM $candRel c
       |      JOIN hashes ha ON ha.doc_id = c.doc_a
       |      JOIN hashes hb ON hb.doc_id = c.doc_b))
       |  WHERE inter * $jDen >= uni * $jNum)""".stripMargin

  /** Exact-collapse of the docs matching `pred` to min-id reps
    * (null-hash docs represent themselves), prefixed CTE names.
    */
  def collapseCtes(pred: String, p: String): String =
    s"""${p}grp AS (SELECT hs, min(doc_id) AS rep FROM hashes
       |  WHERE ($pred) AND hs IS NOT NULL GROUP BY hs),
       |${p}reps AS (SELECT rep AS doc_id FROM ${p}grp
       |  UNION ALL SELECT doc_id FROM hashes WHERE ($pred) AND hs IS NULL)""".stripMargin

  /** Per-permutation minhash min expressions over the `hs` column. */
  def minhashExprs: Seq[String] = Dedup.Perms.map { case (a, b) =>
    s"coalesce(list_min(list_transform(hs, h -> ($a * h + $b) % ${Dedup.P})), ${Dedup.P})"
  }

  val sigCte: String =
    s"""sig AS (SELECT doc_id, [${minhashExprs.mkString(",\n  ")}] AS sig
       |  FROM hashes)""".stripMargin

  /** CTEs replaying [[graft.ext.Decontamination.fuzzyContaminationReport]]:
    * two independent hash/sig chains (corpus `fc*`, benchmark `fb*`),
    * band keys on both sides, the bipartite band join, and the exact
    * integer-Jaccard cut. Yields `fhits(doc_id, bench_id, inter, uni)`.
    * No exact-collapse or bucket cap — the bipartite operator applies
    * neither (the benchmark side is eval-set-sized by contract).
    * Null-text rows are filtered from BOTH chains: Spark gives a null
    * doc null band keys (dropped before its join), while this hash
    * chain would give it hs=[0] like the empty string — the filter
    * keeps the oracle aligned with "a null doc never pairs".
    */
  def fuzzyDeconCtes(corpRel: String, benchRel: String, jNum: Int,
                     jDen: Int, numBands: Int = 4,
                     rowsPerBand: Int = 2): String =
    s"""${hashesCteFrom(
      s"(SELECT doc_id, text FROM $corpRel WHERE text IS NOT NULL)", "fc")},
       |${hashesCteFrom(
      s"(SELECT doc_id, text FROM $benchRel WHERE text IS NOT NULL)", "fb")},
       |fcsig AS (SELECT doc_id, [${minhashExprs.mkString(",\n  ")}] AS sig
       |  FROM fchashes),
       |fbsig AS (SELECT doc_id, [${minhashExprs.mkString(",\n  ")}] AS sig
       |  FROM fbhashes),
       |fcb AS (SELECT s.doc_id, b.band, ${bandKeyExpr(rowsPerBand)} AS bkey
       |  FROM fcsig s CROSS JOIN (VALUES ${bandValues(numBands)}) b(band)),
       |fbb AS (SELECT s.doc_id AS bench_id, b.band,
       |    ${bandKeyExpr(rowsPerBand)} AS bkey
       |  FROM fbsig s CROSS JOIN (VALUES ${bandValues(numBands)}) b(band)),
       |fcand AS (SELECT DISTINCT c.doc_id, bb.bench_id
       |  FROM fcb c JOIN fbb bb ON c.band = bb.band AND c.bkey = bb.bkey),
       |fhits AS (SELECT * FROM (
       |  SELECT f.doc_id, f.bench_id,
       |    CAST(len(list_intersect(ch.hs, bh.hs)) AS BIGINT) AS inter,
       |    CAST(len(ch.hs) + len(bh.hs)
       |      - len(list_intersect(ch.hs, bh.hs)) AS BIGINT) AS uni
       |  FROM fcand f
       |  JOIN fchashes ch ON ch.doc_id = f.doc_id
       |  JOIN fbhashes bh ON bh.doc_id = f.bench_id)
       |  WHERE inter * $jDen >= uni * $jNum)""".stripMargin

  /** SimHash (majority vote per bit) over the `hs` column at any width
    * up to 63 — replays [[graft.functions.SimHash]] bit for bit.
    */
  def simhashExprBits(bits: Int): String =
    (0 until bits).map { b =>
      s"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> $b) & 1 = 1)) >= len(hs) THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " +\n ", ")")

  /** SimHash (16-bit majority vote) over the `hs` column. */
  def simhashExpr: String = simhashExprBits(16)

  /** The [[graft.ext.Dedup.simhashCombos]] block-combination plan as a
    * VALUES list `(band, b0..b{agree-1})` — generated from the SAME
    * combination enumeration the Spark operator joins on.
    */
  def simhashComboValues(blocks: Int, agree: Int): String =
    graft.ext.Dedup.simhashCombos(blocks, agree).zipWithIndex.map {
      case (combo, ci) => s"($ci, ${combo.mkString(", ")})"
    }.mkString(",\n    ")

  /** The combo join key over a BIGINT simhash column `sim` and the
    * VALUES columns c.b0.. — the agreed slices packed into one BIGINT,
    * identical arithmetic to the Spark operator's shift/mask fold.
    */
  def simhashComboKeyExpr(sim: String, sliceBits: Int, agree: Int): String =
    (0 until agree).map { pos =>
      val block = s"(($sim >> (c.b$pos * $sliceBits)) & ${(1L << sliceBits) - 1})"
      if (pos == 0) block else s"($block << ${pos * sliceBits})"
    }.mkString(" + ")

  /** Double-precision cosine between two FLOAT[] columns, same fold
    * order as Similarity.cosine (left-to-right over 64 dims).
    */
  def cosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, 64), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  /** CTEs reproducing [[graft.ext.Similarity.lshTableBuckets]] exactly:
    * the ±1 hyperplane weights are materialized from the SAME
    * `LshBuckets.planeWeight` constants the native expression uses (one
    * source of truth), and each projection is a left-to-right
    * `list_sum(list_transform(...))` fold — bit-identical to the fused
    * expression's double accumulation, so sign buckets agree exactly.
    * Yields `buckets(vec_id, tbl, bucket)` over the embeddings table.
    */
  def lshBucketsCte(tables: Int, planes: Int, dims: Int,
                    rel: String = "embeddings"): String = {
    val rows = (for (t <- 0 until tables; p <- 0 until planes) yield {
      val ws = (0 until dims).map(d =>
        if (graft.functions.LshBuckets.planeWeight(t, p, d) > 0) "1" else "-1")
      s"($t, $p, ${ws.mkString("[", ",", "]")}::DOUBLE[])"
    }).mkString(",\n  ")
    s"""w(tbl, plane, wv) AS (VALUES
       |  $rows),
       |proj AS (
       |  SELECT e.vec_id, w.tbl, w.plane,
       |         list_sum(list_transform(generate_series(1, $dims),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * w.wv[i])) AS proj
       |  FROM $rel e CROSS JOIN w),
       |buckets AS (
       |  SELECT vec_id, tbl,
       |         CAST(SUM(CASE WHEN proj >= 0 THEN 1 << plane ELSE 0 END)
       |              AS BIGINT) AS bucket
       |  FROM proj GROUP BY vec_id, tbl)""".stripMargin
  }

  val stopwordList: String =
    TextAnalysis.Stopwords.map(w => s"'$w'").mkString("[", ",", "]")

  /** The word-2-gram occurrence list over a token-list expression `w` —
    * [[graft.ext.TextAnalysis]]'s gram definition replayed.
    */
  def gramListExpr(w: String): String =
    s"""CASE WHEN len($w) >= 2
       |  THEN list_transform(generate_series(1, len($w) - 1),
       |         i -> $w[i] || ' ' || $w[i + 1])
       |  ELSE [] END""".stripMargin

  /** The most frequent gram's count over a gram-list expression (0 on
    * an empty list) — per-row, like the Spark run-length scan.
    */
  def maxGramExpr(g: String): String =
    s"""coalesce(list_max(list_transform(list_distinct($g),
       |  x -> len(list_filter($g, y -> y = x)))), 0)""".stripMargin

  /** Quality score 0–4 over (n_tokens, token_chars, n_stopwords,
    * n_2grams, max_2gram_count) columns —
    * [[graft.ext.TextAnalysis.qualityScore]] replayed; shared by
    * t_text_stats and the t_curate_corpus flagship so the two cannot
    * drift. The 4th term is the Gopher-style repetition cut (most
    * frequent 2-gram over 1/5 of occurrences loses the point; docs
    * with under 5 2-grams keep it).
    */
  val qualityExpr: String =
    """CAST((CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 1 ELSE 0 END) +
      |       (CASE WHEN n_stopwords > 0 THEN 1 ELSE 0 END) +
      |       (CASE WHEN token_chars >= n_tokens * 3
      |              AND token_chars <= n_tokens * 12 THEN 1 ELSE 0 END) +
      |       (CASE WHEN n_2grams < 5
      |              OR max_2gram_count * 5 <= n_2grams THEN 1 ELSE 0 END) AS BIGINT)""".stripMargin

  /** CTEs replaying [[graft.ext.Packing.spanCorruption]] over `rel`
    * (exposing doc_id + text): yields `calc(doc_id, n_tokens, inputs,
    * targets, n_masked, n_spans)` for every non-null-text row — the
    * same per-index block/offset arithmetic in DuckDB list lambdas
    * (the coalesce around each array_to_string bridges
    * NULL-for-empty-list vs Spark's ''-for-empty-array). Shared by
    * t_span_corruption and the denoising-prep flagship.
    */
  /** CTEs: FIM PSM transform per (doc_id, text) of `rel` →
    * `fimc(doc_id, pick, text_out, n_tokens, n_middle, n_out)` with
    * `n_out` = the output token count (n + 3 sentinels when picked).
    * Mirrors Packing.fimTransform; null-text rows are absent (join
    * LEFT and coalesce).
    */
  def fimCtes(rel: String, rate: Int = 50): String =
    s"""fb AS (SELECT doc_id, text, string_split(text, ' ') AS ws,
       |           len(string_split(text, ' ')) AS n
       |    FROM $rel WHERE text IS NOT NULL),
       |fcut AS (SELECT doc_id, text, ws, n,
       |  (${polyhash("CAST(doc_id AS VARCHAR) || ':fim'")} % 100) < $rate
       |    AS pick,
       |  ${polyhash("CAST(doc_id AS VARCHAR) || ':fimA'")} % (n + 1) AS c1,
       |  ${polyhash("CAST(doc_id AS VARCHAR) || ':fimB'")} % (n + 1) AS c2
       |  FROM fb),
       |fhl AS (SELECT doc_id, text, ws, n, pick,
       |             least(c1, c2) AS lo, greatest(c1, c2) AS hi
       |      FROM fcut),
       |fimc AS (SELECT doc_id, pick,
       |    CASE WHEN NOT pick THEN text
       |         ELSE array_to_string(
       |           list_concat(list_concat(list_concat(list_concat(
       |             list_concat(['<fim_prefix>'], ws[1:lo]),
       |             ['<fim_suffix>']), ws[hi+1:n]),
       |             ['<fim_middle>']), ws[lo+1:hi]), ' ')
       |    END AS text_out,
       |    CAST(n AS BIGINT) AS n_tokens,
       |    CAST(CASE WHEN pick THEN hi - lo ELSE 0 END AS BIGINT)
       |      AS n_middle,
       |    CAST(CASE WHEN pick THEN n + 3 ELSE n END AS BIGINT) AS n_out
       |  FROM fhl)""".stripMargin

  def spanCorruptionCtes(rel: String): String = {
    val blk = "((i-1)//20)"
    val off = s"o.offs[$blk + 1]"
    val pos = "((i-1) % 20)"
    val masked = s"($pos >= $off AND $pos < $off + 3)"
    val isStart = s"($pos = $off)"
    val sent = s"'<extra_id_' || CAST($blk AS VARCHAR) || '>'"
    s"""scbase AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ws,
       |         len(string_split(text, ' ')) AS n
       |  FROM $rel),
       |offs AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(0, ((n + 19) // 20) - 1),
       |      b -> CAST(${polyhash(
            "CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")}
       |           % 18 AS INT)) AS offs
       |  FROM scbase WHERE text IS NOT NULL),
       |calc AS (
       |  SELECT b.doc_id,
       |    CAST(b.n AS BIGINT) AS n_tokens,
       |    coalesce(array_to_string(list_transform(list_filter(
       |        generate_series(1, b.n),
       |        i -> NOT ($masked AND NOT $isStart)),
       |      i -> CASE WHEN $isStart THEN $sent
       |           ELSE b.ws[i] END), ' '), '') AS inputs,
       |    coalesce(array_to_string(list_transform(list_filter(
       |        generate_series(1, b.n), i -> $masked),
       |      i -> CASE WHEN $isStart THEN $sent || ' ' || b.ws[i]
       |           ELSE b.ws[i] END), ' '), '') AS targets,
       |    CAST(len(list_filter(generate_series(1, b.n),
       |      i -> $masked)) AS BIGINT) AS n_masked,
       |    CAST(len(list_filter(generate_series(1, b.n),
       |      i -> $isStart)) AS BIGINT) AS n_spans
       |  FROM scbase b JOIN offs o USING (doc_id)
       |  WHERE b.text IS NOT NULL)""".stripMargin
  }

  /** CTEs: token stats + quality score per document of `rel`, yielding
    * `qscored(doc_id, text, quality)`.
    */
  def qualityCtes(rel: String): String =
    s"""qtok AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS w FROM $rel),
       |qbase AS (
       |  SELECT doc_id, text,
       |         CAST(len(w) AS BIGINT) AS n_tokens,
       |         CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS token_chars,
       |         CAST(len(list_filter(w,
       |              t -> list_contains($stopwordList, t))) AS BIGINT) AS n_stopwords,
       |         CAST(len(${gramListExpr("w")}) AS BIGINT) AS n_2grams,
       |         CAST(${maxGramExpr(gramListExpr("w"))} AS BIGINT) AS max_2gram_count
       |  FROM qtok),
       |qscored AS (
       |  SELECT doc_id, text, $qualityExpr AS quality FROM qbase)""".stripMargin

  /** CTEs reproducing [[graft.ext.Similarity.pqTrainCodebooks]] +
    * [[graft.ext.Similarity.pqEncode]] + the ADC lookup exactly: per
    * subspace, the same hash-sampled seeds, squared-L2 assignment
    * (row_number with cell tiebreak, identical double folds), the
    * quantized-integer Lloyd mean, encoding against the trained
    * codebook, and the per-query quantized sub-dot LUT. Yields
    * `pqparts(query_id, vec_id, pd)` — one row per (query, vector,
    * subspace); integer-summing pd per (query, vector) is the ADC
    * score, order-independent on both engines.
    */
  def pqCtes(m: Int, sub: Int, k: Int, queryPred: String,
             prefix: String = "", trainRel: String = "embeddings"): String = {
    val P = prefix
    def l2seed(off: Int): String =
      s"""list_sum(list_transform(generate_series(1, $sub),
         |           i -> (CAST(e.embedding[i + $off] AS DOUBLE) - CAST(s.svec[i + $off] AS DOUBLE))
         |              * (CAST(e.embedding[i + $off] AS DOUBLE) - CAST(s.svec[i + $off] AS DOUBLE))))""".stripMargin
    def l2cent(off: Int): String =
      s"""list_sum(list_transform(generate_series(1, $sub),
         |           i -> (CAST(e.embedding[i + $off] AS DOUBLE) - c.cvec[i])
         |              * (CAST(e.embedding[i + $off] AS DOUBLE) - c.cvec[i])))""".stripMargin
    def dotq(off: Int): String =
      s"""list_sum(list_transform(generate_series(1, $sub),
         |           i -> CAST(q.embedding[i + $off] AS DOUBLE) * c.cvec[i]))""".stripMargin
    val chains = (0 until m).map { j =>
      val off = j * sub
      s"""${P}s0_$j AS (
         |  SELECT e.vec_id, s.cell, ${l2seed(off)} AS dist
         |  FROM $trainRel e CROSS JOIN ${P}seeds s),
         |${P}a0_$j AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cell) AS rn FROM ${P}s0_$j) WHERE rn = 1),
         |${P}upd_$j AS (
         |  SELECT a.cell, g.i,
         |         CAST(SUM(CAST(round(CAST(e.embedding[g.i + $off] AS DOUBLE)
         |                * 1000000.0) AS BIGINT)) AS DOUBLE)
         |           / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS c
         |  FROM ${P}a0_$j a JOIN $trainRel e ON e.vec_id = a.vec_id
         |  CROSS JOIN generate_series(1, $sub) AS g(i)
         |  GROUP BY a.cell, g.i),
         |${P}cents_$j AS (SELECT cell, list(c ORDER BY i) AS cvec
         |             FROM ${P}upd_$j GROUP BY cell),
         |${P}sc_$j AS (
         |  SELECT e.vec_id, c.cell, ${l2cent(off)} AS dist
         |  FROM embeddings e CROSS JOIN ${P}cents_$j c),
         |${P}code_$j AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cell) AS rn FROM ${P}sc_$j) WHERE rn = 1),
         |${P}lut_$j AS (
         |  SELECT q.vec_id AS query_id, c.cell,
         |         CAST(round(${dotq(off)} * 1000000.0) AS BIGINT) AS pd
         |  FROM embeddings q CROSS JOIN ${P}cents_$j c WHERE $queryPred),
         |${P}part_$j AS (
         |  SELECT l.query_id, x.vec_id, l.pd
         |  FROM ${P}code_$j x JOIN ${P}lut_$j l ON l.cell = x.cell)""".stripMargin
    }
    s"""${P}seeds AS (
       |  SELECT vec_id AS cell, embedding AS svec FROM $trainRel t0
       |  ORDER BY ${polyhash("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT $k),
       |${chains.mkString(",\n")},
       |${P}pqparts AS (
       |  ${(0 until m).map(j => s"SELECT * FROM ${P}part_$j").mkString("\n  UNION ALL ")})""".stripMargin
  }

  /** CTEs reproducing [[graft.ext.Similarity.trainCentroids]] +
    * [[graft.ext.Similarity.ivfSearch]] exactly: hash-sampled seeds
    * (same polyhash), raw-double cosine assignment with cell tiebreak,
    * and the one Lloyd refinement whose element-wise mean is
    * order-independent quantized-integer arithmetic — every double on
    * the DuckDB side is produced by the same IEEE operation sequence as
    * the Spark side, so centroids (and therefore cells, probes, and
    * candidates) agree bit-for-bit. Yields `assigned(vec_id, cell)` and
    * `probes(query_id, cell)`.
    */
  def ivfCtes(k: Int, nProbe: Int, queryPred: String,
              trainRel: String = "embeddings"): String =
    s"""seeds AS (
       |  SELECT vec_id AS cell, embedding AS svec
       |  FROM $trainRel t0
       |  ORDER BY ${polyhash("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT $k),
       |s0 AS (
       |  SELECT e.vec_id, e.embedding, s.cell,
       |         ${cosine("e.embedding", "s.svec")} AS cos
       |  FROM $trainRel e CROSS JOIN seeds s),
       |a0 AS (
       |  SELECT cell, embedding FROM (
       |    SELECT cell, embedding,
       |           row_number() OVER (PARTITION BY vec_id
       |             ORDER BY cos DESC, cell) AS rn
       |    FROM s0) WHERE rn = 1),
       |upd AS (
       |  SELECT cell, g.i,
       |         CAST(SUM(CAST(round(CAST(embedding[g.i] AS DOUBLE)
       |                * 1000000.0) AS BIGINT)) AS DOUBLE)
       |           / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS c
       |  FROM a0 CROSS JOIN generate_series(1, 64) AS g(i)
       |  GROUP BY cell, g.i),
       |cents AS (SELECT cell, list(c ORDER BY i) AS cvec
       |          FROM upd GROUP BY cell),
       |sc AS (
       |  SELECT e.vec_id, c.cell,
       |         ${cosine("e.embedding", "c.cvec")} AS cos
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |             ORDER BY cos DESC, cell) AS rn
       |    FROM sc) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |             ORDER BY cos DESC, cell) AS rn
       |    FROM sc WHERE $queryPred) WHERE rn <= $nProbe)""".stripMargin

  /** CTEs replaying [[graft.ext.Sampling.dsirWeights]]: hashed word
    * {1,2}-gram bucket tfs over the corpus (`dstf`), the raw and target
    * bucket models, the per-bucket bit weights L(tgt+1) − L(raw+1), the
    * 1-row total shift L(T_r+B) − L(T_t+B), and the per-doc aggregate
    * `dsagg(doc_id, gb, n_grams)`. Same PolyHash-mod bucketing and
    * bin-length law as the Spark side — integer-exact end to end.
    */
  def dsirCtes(corpusRel: String, targetRel: String, buckets: Int): String =
    s"""dsw AS (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM $corpusRel WHERE text IS NOT NULL),
       |dsg AS (SELECT doc_id, unnest(list_concat(ws,
       |    list_transform(generate_series(2, len(ws)),
       |      i -> ws[i-1] || ' ' || ws[i]))) AS gram FROM dsw),
       |dstf AS (SELECT doc_id, ${polyhash("gram")} % $buckets AS bkt,
       |    CAST(count(*) AS BIGINT) AS tf FROM dsg GROUP BY 1, 2),
       |dsraw AS (SELECT bkt, CAST(sum(tf) AS BIGINT) AS cr
       |          FROM dstf GROUP BY 1),
       |tsw AS (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM $targetRel WHERE text IS NOT NULL),
       |tsg AS (SELECT doc_id, unnest(list_concat(ws,
       |    list_transform(generate_series(2, len(ws)),
       |      i -> ws[i-1] || ' ' || ws[i]))) AS gram FROM tsw),
       |dstgt AS (SELECT ${polyhash("gram")} % $buckets AS bkt,
       |    CAST(count(*) AS BIGINT) AS ct FROM tsg GROUP BY 1),
       |dswt AS (SELECT r.bkt,
       |    CAST(length(bin(coalesce(t.ct, 0) + 1)) - length(bin(r.cr + 1))
       |      AS BIGINT) AS w
       |  FROM dsraw r LEFT JOIN dstgt t USING (bkt)),
       |dsshift AS (SELECT
       |    CAST(length(bin((SELECT sum(cr) FROM dsraw) + $buckets))
       |       - length(bin((SELECT sum(ct) FROM dstgt) + $buckets)) AS BIGINT)
       |      AS shift),
       |dsagg AS (SELECT doc_id, CAST(sum(tf * w) AS BIGINT) AS gb,
       |    CAST(sum(tf) AS BIGINT) AS n_grams
       |  FROM dstf JOIN dswt USING (bkt) GROUP BY 1)""".stripMargin
}

/** LLM-data-pipeline operators as oracle-verified queries (BASELINE
  * north star: dedup, similarity search, multimodal, text analysis —
  * first-class components alongside SURVEY §2).
  */
object LlmQueries {
  import LlmOracle._

  /** The planted annotation panel shared by the majority-vote and κ
    * oracles: a1 = lang; a2 mislabels %4 as 'xx'; a3 abstains (null)
    * on %5 and labels %3 'yy'; a4 (κ only) rotates every lang — the
    * below-chance annotator whose κ is negative, exercising the
    * floor-division law where trunc-vs-floor engines diverge.
    */
  private def annotationPanel(s: org.apache.spark.sql.SparkSession,
                              d: String, withRotator: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val base = Tables.documents(s, d).filter(col("lang").isNotNull)
    val a1 = base.select(col("doc_id").as("item_id"),
      lit("a1").as("annotator"), col("lang").as("label"))
    val a2 = base.select(col("doc_id").as("item_id"),
      lit("a2").as("annotator"),
      when(col("doc_id") % 4 === 0, lit("xx")).otherwise(col("lang"))
        .as("label"))
    val a3 = base.select(col("doc_id").as("item_id"),
      lit("a3").as("annotator"),
      when(col("doc_id") % 5 === 0, lit(null).cast("string"))
        .when(col("doc_id") % 3 === 0, lit("yy"))
        .otherwise(col("lang")).as("label"))
    val three = a1.unionByName(a2).unionByName(a3)
    if (!withRotator) three
    else three.unionByName(base.select(col("doc_id").as("item_id"),
      lit("a4").as("annotator"),
      when(col("lang") === "en", lit("zh"))
        .when(col("lang") === "zh", lit("es"))
        .when(col("lang") === "es", lit("de"))
        .when(col("lang") === "de", lit("fr"))
        .otherwise(lit("en")).as("label")))
  }

  /** Build the persisted ANN index artifacts once per (JVM, sf dir) —
    * the warehouse is per-JVM (Sessions), so a JVM-local lock closes the
    * check-then-write race. Queries then exercise the SEARCH-ONLY hot
    * path; in the bench's interleaved sweeps only the first call pays
    * the build, which is exactly the write-once/query-many lifecycle.
    */
  private val builtIndexes = scala.collection.mutable.Set[String]()

  /** Catalog-safe table-name stem for a dataset dir: the sanitized path
    * plus a stable hex hash of the RAW string, so distinct dirs that
    * sanitize identically (sf-1 vs sf_1) can never share an index.
    */
  private def dirStem(d: String): String = {
    val h = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(d))
    d.replaceAll("[^A-Za-z0-9]", "_") + "_" + h
  }

  def ivfIndexFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_ivf_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        Similarity.buildIvfIndex(Tables.embeddings(s, d), name, centroids = 16)
        builtIndexes += name
      }
      name
    }

  def lshIndexFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_lsh_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        Similarity.buildLshIndex(Tables.embeddings(s, d), name,
          planes = 4, dims = 64)
        builtIndexes += name
      }
      name
    }

  /** The written-once NB language bundle per (JVM, sf dir) — the
    * train-once/classify-many model lifecycle (ANN-index memo posture):
    * the first consumer pays the training write, later consumers load
    * the persisted tables.
    */
  def nbBundleFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_nb_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        val lab = Tables.documents(s, d)
          .select(col("doc_id"), col("lang").as("label"), col("text"))
        TextAnalysis.writeNbBundle(lab, name, labelCol = "label")
        builtIndexes += name
      }
      name
    }

  /** The persisted CHAR-TRIGRAM language-ID bundle per (JVM, sf dir) —
    * the write-once half of t_nb_langid_persisted /
    * t_code_switch_persisted ([[nbBundleFor]] with tokenizer `char3`).
    */
  def langIdBundleFor(s: org.apache.spark.sql.SparkSession,
                      d: String): String =
    synchronized {
      val name = "graft_nbl_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        val lab = Tables.documents(s, d)
          .select(col("doc_id"), col("lang").as("label"), col("text"))
        TextAnalysis.writeNbBundle(lab, name, labelCol = "label",
          tokenizer = "char3")
        builtIndexes += name
      }
      name
    }

  /** The chat-turn fixture shared by t_chat_render/t_chat_spans and
    * ScaleCheck's chat_prep probe: 4 docs per conversation (conv =
    * doc_id div 4, turn = doc_id mod 4), roles alternating
    * user/assistant by doc_id parity, content = the document text
    * (non-null only).
    */
  def chatTurnsOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("text").isNotNull)
      .select(expr("doc_id div 4").as("conv_id"),
        (col("doc_id") % 4).as("turn_idx"),
        when(col("doc_id") % 2 === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        col("text").as("content"))

  def chatTurns(s: org.apache.spark.sql.SparkSession,
                d: String): org.apache.spark.sql.DataFrame =
    chatTurnsOf(Tables.documents(s, d))

  /** The t_chat_prep chain as ONE shared definition (QueryDef and
    * ScaleCheck both measure exactly this): conversations → per-conv
    * token accounting (content whitespace tokens + one tag token per
    * turn; assistant share disclosed as loss_tokens) → the
    * packSequences tape at 512.
    */
  def chatPrepOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val perConv = chatTurnsOf(docs).groupBy(col("conv_id")).agg(
      (sum(size(split(col("content"), " ")).cast("long"))
        + count(lit(1))).as("n_tokens"),
      sum(when(col("role") === "assistant",
        size(split(col("content"), " ")).cast("long")).otherwise(0L))
        .as("loss_tokens"))
    graft.ext.Packing.packSequences(perConv, col("conv_id"),
        col("n_tokens"), 512L)
      .select(col("conv_id"), col("n_tokens"), col("loss_tokens"),
        col("pack"))
  }

  /** The t_dpo_prep chain as ONE shared definition: quality-scored
    * responses per source → [[graft.ext.Preference.dpoPairs]] → both
    * texts' whitespace token counts → the packSequences tape at 1024,
    * keyed by prompt.
    */
  def dpoPrepOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val nn = docs.filter(col("text").isNotNull)
    val resp = nn.select(col("source").as("prompt_id"), col("doc_id"),
      TextAnalysis.qualityScore(col("text")).cast("long").as("score"))
    val toks = nn.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("__dq_t"))
    val pairs = graft.ext.Preference
      .dpoPairs(resp, "prompt_id", "doc_id", "score")
      .join(toks.withColumnRenamed("doc_id", "chosen_id")
        .withColumnRenamed("__dq_t", "chosen_tokens"), "chosen_id")
      .join(toks.withColumnRenamed("doc_id", "rejected_id")
        .withColumnRenamed("__dq_t", "rejected_tokens"), "rejected_id")
    graft.ext.Packing.packSequences(pairs, col("prompt_id"),
        col("chosen_tokens") + col("rejected_tokens"), 1024L)
      .select(col("prompt_id"), col("chosen_id"), col("rejected_id"),
        col("chosen_tokens"), col("rejected_tokens"), col("pack"))
  }

  /** The persisted QUALITY-classifier bundle per (JVM, sf dir) — the
    * write-once half of t_quality_classifier_persisted, same memo
    * discipline as [[nbBundleFor]].
    */
  def qualityBundleFor(s: org.apache.spark.sql.SparkSession,
                       d: String): String =
    synchronized {
      val name = "graft_qc_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        TextAnalysis.writeQualityBundle(Tables.documents(s, d), name)
        builtIndexes += name
      }
      name
    }

  /** The learned-once unigram-LM inventory per (JVM, sf dir) — shared
    * by t_unigram_lm_train and t_unigram_lm_tokenize (the
    * [[learnedMergeTables]] discipline for the unigram family).
    */
  private val learnedUnigramInvs =
    scala.collection.mutable.Map[String, Seq[(String, Long, Long)]]()

  def learnedUnigramFor(s: org.apache.spark.sql.SparkSession,
                        d: String): Seq[(String, Long, Long)] =
    synchronized {
      learnedUnigramInvs.getOrElseUpdate(dirStem(d),
        TextAnalysis.learnUnigramLm(Tables.documents(s, d),
          vocabSize = UnigramVocab, seedSize = UnigramSeeds))
    }

  /** Unigram-LM oracle parameters: the sf0.01 corpus has ~308 distinct
    * ≤4-cp pieces and ~25 single chars, so seeds = 256 exercises the
    * seed cut and vocab = 64 exercises the likelihood-loss prune.
    */
  private val UnigramVocab = 64
  private val UnigramSeeds = 256

  /** The learned-once BPE merge table per (JVM, sf dir, n) — the two
    * tokenizer-training queries share one training run, mirroring the
    * train-once/tokenize-many lifecycle (and the ANN index memo above).
    */
  private val learnedMergeTables =
    scala.collection.mutable.Map[String, Seq[(String, String, Long)]]()

  def learnedMergesFor(s: org.apache.spark.sql.SparkSession, d: String,
                       n: Int): Seq[(String, String, Long)] =
    synchronized {
      learnedMergeTables.getOrElseUpdate(dirStem(d) + "#" + n,
        TextAnalysis.learnBpeMerges(Tables.documents(s, d), n))
    }

  /** The learned-once WordPiece table per (JVM, sf dir, n) — the
    * [[learnedMergesFor]] discipline for the likelihood-scored trainer.
    */
  private val learnedWpTables =
    scala.collection.mutable.Map[String, Seq[(String, String, Long, Long)]]()

  def learnedWordPieceFor(s: org.apache.spark.sql.SparkSession, d: String,
                          n: Int): Seq[(String, String, Long, Long)] =
    synchronized {
      learnedWpTables.getOrElseUpdate(dirStem(d) + "#" + n,
        TextAnalysis.learnWordPieceMerges(Tables.documents(s, d), n))
    }

  /** The learned-once BYTE-LEVEL WordPiece table per (JVM, sf dir, n)
    * — trained on the multibyte-planted corpus ([[plantedMbDocs]]).
    */
  def learnedByteWordPieceFor(s: org.apache.spark.sql.SparkSession,
                              d: String,
                              n: Int): Seq[(String, String, Long, Long)] =
    synchronized {
      learnedWpTables.getOrElseUpdate(dirStem(d) + "#b" + n,
        TextAnalysis.learnWordPieceMerges(plantedMbDocs(s, d), n,
          byteLevel = true))
    }

  /** Stage count for the tokenizer-training oracle pair — small enough
    * that the unrolled DuckDB replay stays cheap, large enough to learn
    * real multi-level merges (outputs of earlier merges appear as sides
    * of later ones on this corpus).
    */
  val BpeTrainMerges = 8

  /** Multibyte tail planted on every document for the BYTE-LEVEL
    * tokenizer oracles: 2-byte Latin accents (é, è) and 3-byte CJK —
    * exactly where the code-point walk and the byte walk provably
    * diverge (é is one atomic symbol there, two mergeable byte symbols
    * here). Shared verbatim with the SQL fixture.
    */
  val MultiByteTail = "café résumé 中文 élève"

  private val PlantedMbCte =
    s"""plantedmb AS (SELECT doc_id, text || ' $MultiByteTail' AS text
       |  FROM documents),
       |""".stripMargin

  def plantedMbDocs(s: org.apache.spark.sql.SparkSession,
                    d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" " + MultiByteTail)).as("text"))

  /** The learned-once BYTE-LEVEL merge table per (JVM, sf dir, n) —
    * trained on the multibyte-planted corpus.
    */
  private val learnedByteTables =
    scala.collection.mutable.Map[String, Seq[(String, String, Long)]]()

  def learnedByteMergesFor(s: org.apache.spark.sql.SparkSession, d: String,
                           n: Int): Seq[(String, String, Long)] =
    synchronized {
      learnedByteTables.getOrElseUpdate(dirStem(d) + "#b" + n,
        TextAnalysis.learnBpeMerges(plantedMbDocs(s, d), n,
          byteLevel = true))
    }

  /** The learned-once BYTE-LEVEL unigram inventory per (JVM, sf dir) —
    * trained on the same multibyte-planted corpus.
    */
  private val learnedByteUnigramInvs =
    scala.collection.mutable.Map[String, Seq[(String, Long, Long)]]()

  def learnedByteUnigramFor(s: org.apache.spark.sql.SparkSession,
                            d: String): Seq[(String, Long, Long)] =
    synchronized {
      learnedByteUnigramInvs.getOrElseUpdate(dirStem(d),
        TextAnalysis.learnUnigramLm(plantedMbDocs(s, d),
          vocabSize = UnigramVocab, seedSize = UnigramSeeds,
          byteLevel = true))
    }

  /** The trigram stupid-backoff scoring oracle — shared verbatim by
    * t_trigram_surprisal (in-session model) and t_trigram_persisted
    * (model round-tripped through disk): one SQL gating that both
    * paths score identically, the nbClassifyLangSql pattern for LMs.
    */
  private lazy val trigramSurprisalSql: String =
    s"""WITH tw AS (SELECT string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0),
         |uni AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(ws) AS gram FROM tw) GROUP BY 1),
         |nv AS (SELECT CAST(sum(cnt) + count(*) AS BIGINT) AS nv FROM uni),
         |bi AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(2, len(ws)),
         |      i -> ws[i-1] || ' ' || ws[i])) AS gram FROM tw) GROUP BY 1),
         |tri AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(3, len(ws)),
         |      i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS gram
         |    FROM tw) GROUP BY 1),
         |dw AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |occ AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(3, len(ws)),
         |    i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS g123
         |  FROM dw),
         |otf AS (SELECT doc_id, g123, CAST(count(*) AS BIGINT) AS tf
         |  FROM occ GROUP BY 1, 2),
         |ox AS (SELECT doc_id, g123, tf,
         |    string_split(g123, ' ')[1] AS w1,
         |    string_split(g123, ' ')[2] AS w2,
         |    string_split(g123, ' ')[3] AS w3 FROM otf),
         |sc AS (SELECT o.doc_id, o.tf,
         |    CAST(CASE
         |      WHEN t.cnt IS NOT NULL AND b12.cnt IS NOT NULL
         |        THEN length(bin(b12.cnt)) - length(bin(t.cnt))
         |      WHEN b23.cnt IS NOT NULL AND u2.cnt IS NOT NULL
         |        THEN length(bin(u2.cnt * 5)) - length(bin(b23.cnt * 2))
         |      ELSE length(bin(n.nv * 25)) -
         |           length(bin((coalesce(u3.cnt, 0) + 1) * 4))
         |    END AS BIGINT) AS bits
         |  FROM ox o
         |  LEFT JOIN tri t ON t.gram = o.g123
         |  LEFT JOIN bi b12 ON b12.gram = o.w1 || ' ' || o.w2
         |  LEFT JOIN bi b23 ON b23.gram = o.w2 || ' ' || o.w3
         |  LEFT JOIN uni u2 ON u2.gram = o.w2
         |  LEFT JOIN uni u3 ON u3.gram = o.w3
         |  CROSS JOIN nv n),
         |tagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n_trigrams FROM sc GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.surprisal, 0) AS surprisal,
         |  coalesce(a.n_trigrams, 0) AS n_trigrams,
         |  CASE WHEN coalesce(a.n_trigrams, 0) > 0
         |       THEN CAST((a.surprisal * 100) // a.n_trigrams AS BIGINT)
         |       ELSE 0 END AS mean_bits_x100
         |FROM documents d LEFT JOIN tagg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin

  /** The KN absolute-discount scoring oracle — shared verbatim by
    * t_kn_surprisal and t_kn_persisted ([[trigramSurprisalSql]]'s
    * discipline for the KN rung).
    */
  private lazy val knSurprisalSql: String =
    s"""WITH tw AS (SELECT string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0),
         |uni AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(ws) AS gram FROM tw) GROUP BY 1),
         |bi AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(2, len(ws)),
         |      i -> ws[i-1] || ' ' || ws[i])) AS gram FROM tw) GROUP BY 1),
         |tri AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(3, len(ws)),
         |      i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS gram
         |    FROM tw) GROUP BY 1),
         |kn12 AS (SELECT string_split(gram, ' ')[1] || ' ' ||
         |      string_split(gram, ' ')[2] AS g,
         |    CAST(count(*) AS BIGINT) AS cnt FROM tri GROUP BY 1),
         |kn23 AS (SELECT string_split(gram, ' ')[2] || ' ' ||
         |      string_split(gram, ' ')[3] AS g,
         |    CAST(count(*) AS BIGINT) AS cnt FROM tri GROUP BY 1),
         |knd2 AS (SELECT string_split(g, ' ')[1] AS g2,
         |    CAST(sum(cnt) AS BIGINT) AS cnt FROM kn23 GROUP BY 1),
         |knn2 AS (SELECT string_split(g, ' ')[1] AS g2,
         |    CAST(count(*) AS BIGINT) AS cnt FROM kn23 GROUP BY 1),
         |kn1 AS (SELECT string_split(gram, ' ')[2] AS g1,
         |    CAST(count(*) AS BIGINT) AS cnt FROM bi GROUP BY 1),
         |knbu AS (SELECT CAST((SELECT count(*) FROM bi) +
         |    (SELECT count(*) FROM uni) AS BIGINT) AS bu),
         |dw AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |occ AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(3, len(ws)),
         |    i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS g123
         |  FROM dw),
         |otf AS (SELECT doc_id, g123, CAST(count(*) AS BIGINT) AS tf
         |  FROM occ GROUP BY 1, 2),
         |ox AS (SELECT doc_id, g123, tf,
         |    string_split(g123, ' ')[1] AS w1,
         |    string_split(g123, ' ')[2] AS w2,
         |    string_split(g123, ' ')[3] AS w3 FROM otf),
         |sc AS (SELECT o.doc_id, o.tf,
         |    CAST(CASE
         |      WHEN t.cnt IS NOT NULL AND b12.cnt IS NOT NULL
         |        THEN length(bin(b12.cnt * 4)) - length(bin(t.cnt * 4 - 3))
         |      WHEN k23.cnt IS NOT NULL AND kd.cnt IS NOT NULL
         |        THEN (CASE WHEN b12.cnt IS NOT NULL AND n12.cnt IS NOT NULL
         |                THEN length(bin(b12.cnt * 4)) -
         |                     length(bin(n12.cnt * 3)) ELSE 0 END)
         |          + length(bin(kd.cnt * 4)) - length(bin(k23.cnt * 4 - 3))
         |      ELSE (CASE WHEN b12.cnt IS NOT NULL AND n12.cnt IS NOT NULL
         |              THEN length(bin(b12.cnt * 4)) -
         |                   length(bin(n12.cnt * 3)) ELSE 0 END)
         |        + (CASE WHEN kd.cnt IS NOT NULL AND nk.cnt IS NOT NULL
         |             THEN length(bin(kd.cnt * 4)) -
         |                  length(bin(nk.cnt * 3)) ELSE 0 END)
         |        + length(bin(n.bu)) - length(bin(coalesce(k1.cnt, 0) + 1))
         |    END AS BIGINT) AS bits
         |  FROM ox o
         |  LEFT JOIN tri t ON t.gram = o.g123
         |  LEFT JOIN bi b12 ON b12.gram = o.w1 || ' ' || o.w2
         |  LEFT JOIN kn12 n12 ON n12.g = o.w1 || ' ' || o.w2
         |  LEFT JOIN kn23 k23 ON k23.g = o.w2 || ' ' || o.w3
         |  LEFT JOIN knd2 kd ON kd.g2 = o.w2
         |  LEFT JOIN knn2 nk ON nk.g2 = o.w2
         |  LEFT JOIN kn1 k1 ON k1.g1 = o.w3
         |  CROSS JOIN knbu n),
         |tagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n_trigrams FROM sc GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.surprisal, 0) AS surprisal,
         |  coalesce(a.n_trigrams, 0) AS n_trigrams,
         |  CASE WHEN coalesce(a.n_trigrams, 0) > 0
         |       THEN CAST((a.surprisal * 100) // a.n_trigrams AS BIGINT)
         |       ELSE 0 END AS mean_bits_x100
         |FROM documents d LEFT JOIN tagg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin

  /** The PERSISTED trigram LM bundle per (JVM, sf dir): the even-half
    * model written through the writeLmModel lifecycle (the
    * [[nbBundleFor]] memo discipline) so t_trigram_persisted exercises
    * a disk round-trip, not a cache.
    */
  def trigramLmFor(s: org.apache.spark.sql.SparkSession,
                   d: String): String =
    synchronized {
      val name = "graft_lm3_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        TextAnalysis.writeLmModel(TextAnalysis.trigramModel(
          Tables.documents(s, d).filter(col("doc_id") % 2 === 0)),
          name, kind = "trigram")
        builtIndexes += name
      }
      name
    }

  /** The PERSISTED KN LM bundle per (JVM, sf dir) — [[trigramLmFor]]
    * for the absolute-discount rung.
    */
  def knLmFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_lmkn_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        TextAnalysis.writeLmModel(TextAnalysis.knTrigramModel(
          Tables.documents(s, d).filter(col("doc_id") % 2 === 0)),
          name, kind = "kn")
        builtIndexes += name
      }
      name
    }

  /** The PERSISTED BPE tokenizer bundle per (JVM, sf dir) — writes the
    * learned-once merge table through the writeMergeTokenizer lifecycle
    * (the [[nbBundleFor]] memo discipline) so
    * t_bpe_persisted_tokenize exercises a disk round-trip, not a cache.
    */
  def bpeTokenizerFor(s: org.apache.spark.sql.SparkSession,
                      d: String): String =
    synchronized {
      val name = "graft_bpe_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        TextAnalysis.writeMergeTokenizer(s, name,
          learnedMergesFor(s, d, BpeTrainMerges))
        builtIndexes += name
      }
      name
    }

  /** The PERSISTED unigram-LM tokenizer bundle per (JVM, sf dir) —
    * [[bpeTokenizerFor]] for the unigram family.
    */
  def unigramTokenizerFor(s: org.apache.spark.sql.SparkSession,
                          d: String): String =
    synchronized {
      val name = "graft_ug_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        TextAnalysis.writeUnigramTokenizer(s, name, learnedUnigramFor(s, d))
        builtIndexes += name
      }
      name
    }

  /** Query-term fixture for the sparse-retrieval oracle — mixed
    * document frequencies from this corpus's vocabulary, multi-term
    * bags so the per-(query, doc) score aggregation is exercised.
    */
  val SearchQueries: Seq[(Long, String)] = Seq(
    0L -> "query", 0L -> "window",
    1L -> "stream", 1L -> "join", 1L -> "sort",
    2L -> "spark", 2L -> "hash")

  /** The sparse-retrieval CTE chain (s-prefixed names so the hybrid
    * oracle can compose it beside the dense chain): integer tf-idf
    * scoring of documents against the [[SearchQueries]] term bags,
    * ending in `sranked` (query_id, doc_id, score, n_terms, rank).
    */
  /** The tf-idf scoring half of the sparse chain, parameterized by the
    * query relation and prefix — shared by the first-pass oracle
    * (prefix `s` over `sq`) and the PRF second pass (prefix `x` over
    * the expanded term relation), both reading the one corpus tf CTE.
    */
  private def searchScoreCtes(p: String, queryRel: String,
                              tfRel: String): String =
    s"""${p}mt AS (SELECT t0.doc_id, t0.word, t0.tf FROM $tfRel t0
       |  JOIN (SELECT DISTINCT term FROM $queryRel) t ON t0.word = t.term),
       |${p}df AS (SELECT word, count(*) AS df FROM ${p}mt GROUP BY 1),
       |${p}sc AS (SELECT m.doc_id, m.word, (m.tf * 1000000) // d.df AS tscore
       |  FROM ${p}mt m JOIN ${p}df d USING (word)),
       |${p}pq AS (SELECT q.query_id, s.doc_id,
       |  CAST(sum(s.tscore) AS BIGINT) AS score,
       |  CAST(count(*) AS BIGINT) AS n_terms
       |  FROM ${p}sc s
       |  JOIN (SELECT DISTINCT query_id, term FROM $queryRel) q
       |    ON q.term = s.word GROUP BY 1, 2),
       |${p}ranked AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  score, n_terms,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |       ORDER BY score DESC, doc_id) AS BIGINT) AS rank FROM ${p}pq)""".stripMargin

  private def searchDocsCtes: String = {
    val qRows = SearchQueries
      .map { case (q, t) => s"($q, '${t.replace("'", "''")}')" }
      .mkString(", ")
    s"""sq(query_id, term) AS (VALUES $qRows),
       |sterms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents WHERE text IS NOT NULL),
       |stf AS (SELECT doc_id, word, count(*) AS tf FROM sterms GROUP BY 1, 2),
       |${searchScoreCtes("s", "sq", "stf")}""".stripMargin
  }

  /** The PRF feedback/expansion CTEs over the first-pass chain:
    * per-query top-`kFirst` docs → tf·score term weights → original
    * terms excluded → top-`nExpand` per query as `pexp`.
    */
  private def prfCtes(kFirst: Int, nExpand: Int): String =
    s"""ptop AS (SELECT query_id, doc_id, score FROM sranked
       |  WHERE rank <= $kFirst),
       |pfb AS (SELECT t.query_id, s.word,
       |    CAST(sum(s.tf * t.score) AS BIGINT) AS weight
       |  FROM stf s JOIN ptop t USING (doc_id) GROUP BY 1, 2),
       |pcand AS (SELECT f.query_id, f.word, f.weight FROM pfb f
       |  LEFT JOIN (SELECT DISTINCT query_id, term FROM sq) q
       |    ON q.query_id = f.query_id AND q.term = f.word
       |  WHERE q.term IS NULL),
       |pexp AS (SELECT query_id, word AS term, weight,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY weight DESC, word) AS BIGINT) AS rank
       |  FROM pcand)""".stripMargin

  /** Term-coverage qrels replay
    * ([[graft.ext.Retrieval.termCoverageQrels]]): distinct query terms
    * present per doc (stf is one row per (doc, word), so count(*) IS
    * the distinct-match count), rel = 2 on full coverage, 1 on ≥ half.
    * Composes after [[searchDocsCtes]]; yields `qrels`.
    */
  private val qrelsCtes: String =
    s"""qn AS (SELECT query_id, CAST(count(DISTINCT term) AS BIGINT) AS nq
       |  FROM sq GROUP BY 1),
       |qm AS (SELECT q.query_id, t.doc_id, CAST(count(*) AS BIGINT) AS m
       |  FROM stf t JOIN (SELECT DISTINCT query_id, term FROM sq) q
       |    ON t.word = q.term GROUP BY 1, 2),
       |qrels AS (SELECT qm.query_id, qm.doc_id,
       |    CAST(CASE WHEN m = nq THEN 2 ELSE 1 END AS BIGINT) AS rel
       |  FROM qm JOIN qn USING (query_id) WHERE 2 * m >= nq)""".stripMargin

  /** The [[graft.ext.Eval.rankEval]] replay over run relation `runRel`
    * (query_id, doc_id, rank) cut at `k`, against `qrels`: lcm-scaled
    * harmonic sums (`L = lcm(1..k+1)` inlined as a literal — the same
    * constant the engine derives), trec P@k / R@k / AP / RR and the
    * harmonic-discount nDCG@k. Yields `${p}metrics`, one row per run
    * query.
    */
  private def rankEvalCtes(p: String, runRel: String, k: Int,
                           L: Long): String =
    s"""${p}run AS (SELECT query_id, doc_id, rank FROM $runRel
       |  WHERE rank <= $k),
       |${p}rj AS (SELECT r.query_id, r.doc_id, r.rank,
       |    coalesce(q.rel, 0) AS g
       |  FROM ${p}run r LEFT JOIN qrels q USING (query_id, doc_id)),
       |${p}rh AS (SELECT query_id, rank, g,
       |    sum(CASE WHEN g > 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY query_id ORDER BY rank) AS h
       |  FROM ${p}rj),
       |${p}pq AS (SELECT query_id,
       |    CAST(count(*) AS BIGINT) AS n_ret,
       |    CAST(sum(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_rel_ret,
       |    min(CASE WHEN g > 0 THEN rank END) AS frr,
       |    CAST(sum(CASE WHEN g > 0 THEN h * ($L // rank) ELSE 0 END)
       |      AS BIGINT) AS apn,
       |    CAST(sum(g * ($L // (rank + 1))) AS BIGINT) AS dcgn
       |  FROM ${p}rh GROUP BY 1),
       |${p}nr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
       |  FROM qrels GROUP BY 1),
       |${p}id AS (SELECT query_id,
       |    CAST(sum(rel * ($L // (i + 1))) AS BIGINT) AS idcgn
       |  FROM (SELECT query_id, rel, row_number() OVER (
       |          PARTITION BY query_id ORDER BY rel DESC, doc_id) AS i
       |        FROM qrels) x
       |  WHERE i <= $k GROUP BY 1),
       |${p}metrics AS (SELECT q.query_id,
       |    q.n_ret, coalesce(n.n_rel, 0) AS n_rel, q.n_rel_ret,
       |    CAST(q.frr AS BIGINT) AS first_rel_rank,
       |    CAST(coalesce(10000 // q.frr, 0) AS BIGINT) AS rr_x10000,
       |    CAST((q.n_rel_ret * 10000) // $k AS BIGINT) AS precision_x10000,
       |    CAST(CASE WHEN coalesce(n.n_rel, 0) > 0
       |         THEN (q.n_rel_ret * 10000) // n.n_rel END AS BIGINT)
       |      AS recall_x10000,
       |    CAST(CASE WHEN coalesce(n.n_rel, 0) > 0
       |         THEN (q.apn * 10000) // ($L * n.n_rel) END AS BIGINT)
       |      AS ap_x10000,
       |    CAST(CASE WHEN coalesce(i.idcgn, 0) > 0
       |         THEN (q.dcgn * 10000) // i.idcgn END AS BIGINT)
       |      AS ndcg_x10000
       |  FROM ${p}pq q LEFT JOIN ${p}nr n USING (query_id)
       |  LEFT JOIN ${p}id i USING (query_id))""".stripMargin

  /** The tri-arm fusion CTE chain (dense cosine arm + the tf-idf/BM25
    * arms' 20-cuts → integer RRF → `tr3`) — shared by the t_hybrid_tri
    * oracle and the retrieval leaderboard so the two formulations can
    * never drift. Requires [[searchDocsCtes]] and [[bm25Ctes]] in
    * scope.
    */
  private lazy val hybridTriCtes: String = {
    val qIds = SearchQueries.map(_._1).distinct.sorted.mkString(", ")
    s"""dq AS (
       |  SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE vec_id IN ($qIds)),
       |dscored AS (
       |  SELECT dq.query_id, e.vec_id AS neighbor_id,
       |         round(${cosine("dq.qv", "e.embedding")}, 6) AS cos
       |  FROM dq JOIN embeddings e ON e.vec_id <> dq.query_id),
       |dranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM dscored),
       |tids AS (
       |  SELECT DISTINCT query_id, doc_id FROM (
       |    SELECT query_id, doc_id FROM sranked WHERE rank <= 20
       |    UNION ALL
       |    SELECT query_id, doc_id FROM branked WHERE rank <= 20
       |    UNION ALL
       |    SELECT query_id, neighbor_id FROM dranked WHERE rank <= 20)),
       |tf3 AS (
       |  SELECT i.query_id, i.doc_id,
       |    CAST(coalesce(1000000 // (60 + s.rank), 0)
       |       + coalesce(1000000 // (60 + b.rank), 0)
       |       + coalesce(1000000 // (60 + d.rank), 0) AS BIGINT) AS rrf,
       |    s.rank AS tfidf_rank, b.rank AS bm25_rank,
       |    d.rank AS dense_rank
       |  FROM tids i
       |  LEFT JOIN (SELECT * FROM sranked WHERE rank <= 20) s
       |    ON s.query_id = i.query_id AND s.doc_id = i.doc_id
       |  LEFT JOIN (SELECT * FROM branked WHERE rank <= 20) b
       |    ON b.query_id = i.query_id AND b.doc_id = i.doc_id
       |  LEFT JOIN (SELECT * FROM dranked WHERE rank <= 20) d
       |    ON d.query_id = i.query_id AND d.neighbor_id = i.doc_id),
       |tr3 AS (
       |  SELECT query_id, doc_id, rrf,
       |         tfidf_rank, bm25_rank, dense_rank,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
       |  FROM tf3)""".stripMargin
  }

  /** One system's leaderboard row over a `${p}metrics` relation
    * ([[rankEvalCtes]]) — the t_ir_report rollup parameterized so the
    * retrieval leaderboard can UNION one row per system.
    */
  private def irReportSelect(p: String, system: String, k: Int,
                             L: Long): String =
    s"""SELECT '$system' AS system,
       |  CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_with_rel,
       |  CAST(CASE WHEN count(*) > 0 THEN
       |    (sum(coalesce($L // first_rel_rank, 0)) * 10000)
       |      // ($L * count(*)) END AS BIGINT) AS mrr_x10000,
       |  CAST(CASE WHEN count(ap_x10000) > 0
       |    THEN sum(ap_x10000) // count(ap_x10000) END AS BIGINT)
       |    AS map_x10000,
       |  CAST(CASE WHEN count(ndcg_x10000) > 0
       |    THEN sum(ndcg_x10000) // count(ndcg_x10000) END AS BIGINT)
       |    AS ndcg_mean_x10000,
       |  CAST(CASE WHEN count(recall_x10000) > 0
       |    THEN sum(recall_x10000) // count(recall_x10000) END AS BIGINT)
       |    AS recall_mean_x10000,
       |  CAST(CASE WHEN count(*) > 0
       |    THEN sum(precision_x10000) // count(*) END AS BIGINT)
       |    AS precision_mean_x10000
       |FROM ${p}metrics""".stripMargin

  /** BM25 replay: the same integer arithmetic as
    * [[graft.ext.TextAnalysis.searchDocsBm25]] — floor-log2 idf via
    * length(bin(x)), ×100 fixed-point k1/b, cross-multiplied length
    * norm, one truncating division per term contribution. dlen is the
    * split-size token count (`len(string_split)`), which equals the
    * WordTfs tf-sum by the keep-empties law — mirroring the engine's
    * cheap stats path.
    */
  private def bm25Ctes(k1X100: Int, bX100: Int): String = {
    val qRows = SearchQueries
      .map { case (q, t) => s"($q, '${t.replace("'", "''")}')" }
      .mkString(", ")
    s"""bsq(query_id, term) AS (VALUES $qRows),
       |bterms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents WHERE text IS NOT NULL),
       |btf AS (SELECT doc_id, word, count(*) AS tf FROM bterms GROUP BY 1, 2),
       |bdl AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS dlen
       |  FROM documents WHERE text IS NOT NULL),
       |bst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(dlen) AS BIGINT) AS tot_len FROM bdl),
       |bmt AS (SELECT btf.doc_id, btf.word, btf.tf FROM btf
       |  JOIN (SELECT DISTINCT term FROM bsq) t ON btf.word = t.term),
       |bdf AS (SELECT word, count(*) AS df FROM bmt GROUP BY 1),
       |bsc AS (SELECT m.doc_id, m.word,
       |  (CAST(length(bin(s.n_docs)) - length(bin(d.df)) AS BIGINT)
       |     * m.tf * ($k1X100 + 100) * 100000000)
       |  // (m.tf * 10000 + $k1X100 *
       |      (100 - $bX100 + ($bX100 * l.dlen * s.n_docs) // s.tot_len))
       |    AS contrib
       |  FROM bmt m JOIN bdf d USING (word) JOIN bdl l USING (doc_id)
       |  CROSS JOIN bst s),
       |bpq AS (SELECT q.query_id, s.doc_id,
       |  CAST(sum(s.contrib) AS BIGINT) AS score,
       |  CAST(count(*) AS BIGINT) AS n_terms
       |  FROM bsc s
       |  JOIN (SELECT DISTINCT query_id, term FROM bsq) q
       |    ON q.term = s.word GROUP BY 1, 2),
       |branked AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  score, n_terms,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |       ORDER BY score DESC, doc_id) AS BIGINT) AS rank FROM bpq)""".stripMargin
  }

  /** Shared by t_ann_lsh and t_ann_lsh_indexed — the persisted index
    * must be bit-identical to inline bucketing, so one oracle serves
    * both.
    */
  private val annLshSql: String =
    s"""WITH ${lshBucketsCte(tables = 8, planes = 4, dims = 64)},
       |q AS (
       |  SELECT tbl, bucket, vec_id AS query_id
       |  FROM buckets WHERE vec_id < 5),
       |cand AS (
       |  SELECT DISTINCT q.query_id, b.vec_id AS neighbor_id
       |  FROM buckets b JOIN q ON b.tbl = q.tbl AND b.bucket = q.bucket
       |  WHERE b.vec_id <> q.query_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         round(${cosine("qe.embedding", "ne.embedding")}, 6) AS cos
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT * FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** Multi-probe variant of [[annLshSql]]: the probe set per (query,
    * table) is the bucket itself plus every 1-bit flip — and, at
    * `probeBits = 2`, every C(planes, 2) 2-bit flip — the same
    * list_prepend/xor expansion the Spark side explodes. The CTE chain
    * (ending at `ranked`) is exposed separately so the hybrid-indexed
    * oracle can compose it beside the BM25 chain; `idPred` selects the
    * query vectors.
    */
  private def annLshMultiProbeSqlFor(probeBits: Int): String =
    s"""WITH ${annLshMultiProbeCtes(probeBits)}
       |SELECT * FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  private def annLshMultiProbeCtes(probeBits: Int,
                                   idPred: String = "vec_id < 5"): String = {
    val oneBitList =
      """list_prepend(bucket,
        |           list_transform(generate_series(0, 3),
        |             i -> xor(bucket, CAST(1 AS BIGINT) << i)))""".stripMargin
    val probeList =
      if (probeBits < 2) oneBitList
      else s"""list_concat($oneBitList,
        |           flatten(list_transform(generate_series(0, 2),
        |             i -> list_transform(generate_series(i + 1, 3),
        |               j -> xor(bucket, (CAST(1 AS BIGINT) << i)
        |                                + (CAST(1 AS BIGINT) << j))))))""".stripMargin
    s"""${lshBucketsCte(tables = 8, planes = 4, dims = 64)},
       |q AS (
       |  SELECT tbl, bucket, vec_id AS query_id
       |  FROM buckets WHERE $idPred),
       |probes AS (
       |  SELECT tbl,
       |         unnest($probeList) AS bucket,
       |         query_id
       |  FROM q),
       |cand AS (
       |  SELECT DISTINCT p.query_id, b.vec_id AS neighbor_id
       |  FROM buckets b JOIN probes p ON b.tbl = p.tbl AND b.bucket = p.bucket
       |  WHERE b.vec_id <> p.query_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         round(${cosine("qe.embedding", "ne.embedding")}, 6) AS cos
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored)""".stripMargin
  }

  /** BPE tokenizer TRAINING replayed in SQL — the Sennrich loop
    * UNROLLED into `n` chained stages (a recursive CTE cannot aggregate
    * over the whole corpus per step, but the oracle SQL is GENERATED,
    * so the loop unrolls at generation time): stage k re-tokenizes the
    * weighted pre-token vocabulary under the k merges learned so far
    * (the same per-rank fixpoint-replace walk as t_token_bpe_merges,
    * parameterized by the mg_k RELATION instead of literal VALUES),
    * counts adjacent pairs weighted by pre-token frequency, and takes
    * the (count DESC, lhs, rhs) argmax as merge k. Exact under the same
    * caveat as the replay oracle: no learned merge may have lhs = rhs
    * (replace() would group an odd run differently than the engine's
    * left-to-right pass) — asserted against this corpus in LlmOpsSpec.
    *
    * Every chain CTE is AS MATERIALIZED: DuckDB inlines CTEs by
    * default, and a recursive walk whose step joins an INLINED mg_k
    * re-evaluates mg_k — and therefore the ENTIRE previous stage's
    * recursion — once per iteration, an exponential blowup that hangs
    * the oracle (measured: >10 min inlined vs 0.2 s materialized at
    * sf0.001). Materialization pins each stage to run exactly once.
    */
  /** Shared by the BPE and WordPiece training oracles: identical
    * walk/pair machinery, ONE substitution in `best$k` — raw-count
    * argmax (BPE) vs the 10¹²-fixed-point likelihood score
    * `n·10¹² // (cₐ·c_b)` over the iteration's symbol counts
    * (WordPiece, `scored = true`).
    */
  /** DuckDB replay of [[graft.functions.ByteLevel]]: the symbol LIST of
    * an expression's UTF-8 bytes under the GPT-2 bytes_to_unicode table
    * — ord() per code point, the arithmetic UTF-8 byte expansion, then
    * the three printable-range CASEs (non-printables 0–32 → 256+b,
    * 127–160 → b+162, 173 → 323: the same increasing-byte-order
    * assignment the Scala table builds).
    */
  private def byteSymSql(e: String): String =
    s"""list_transform(flatten(list_transform(
       |    regexp_extract_all($e, '[\\s\\S]'),
       |    gch -> CASE WHEN ord(gch) < 128 THEN [ord(gch)]
       |      WHEN ord(gch) < 2048
       |        THEN [192 + ord(gch) // 64, 128 + ord(gch) % 64]
       |      WHEN ord(gch) < 65536 THEN [224 + ord(gch) // 4096,
       |        128 + (ord(gch) // 64) % 64, 128 + ord(gch) % 64]
       |      ELSE [240 + ord(gch) // 262144, 128 + (ord(gch) // 4096) % 64,
       |        128 + (ord(gch) // 64) % 64, 128 + ord(gch) % 64] END)),
       |  gb -> CASE WHEN (gb BETWEEN 33 AND 126) OR (gb BETWEEN 161 AND 172)
       |      OR (gb BETWEEN 174 AND 255) THEN chr(gb)
       |    WHEN gb <= 32 THEN chr(256 + gb)
       |    WHEN gb = 173 THEN chr(323)
       |    ELSE chr(gb + 162) END)""".stripMargin

  /** The delimited starting-symbol string of a pre-token expression:
    * per code point (the engine's default walk) or per GPT-2-mapped
    * UTF-8 byte (`byteLevel`).
    */
  private def symStringSql(e: String, byteLevel: Boolean): String = {
    val anyChar = "[\\s\\S]"
    val lst = if (byteLevel) byteSymSql(e)
              else s"regexp_extract_all($e, '$anyChar')"
    s"chr(1) || array_to_string($lst, chr(1)) || chr(1)"
  }

  private def bpeTrainCtes(n: Int, scored: Boolean = false,
                           rel: String = "documents",
                           byteLevel: Boolean = false): String = {
    val pat = TextAnalysis.BpePattern.replace("'", "''")
    val sb = new StringBuilder
    sb.append(
      s"""vocabpt AS MATERIALIZED (
         |  SELECT pt, CAST(count(*) AS BIGINT) AS w FROM (
         |    SELECT unnest(regexp_extract_all(text, '$pat')) AS pt
         |    FROM $rel WHERE text IS NOT NULL) u GROUP BY pt),
         |tbase AS MATERIALIZED (
         |  SELECT pt, w,
         |         ${symStringSql("pt", byteLevel)} AS s
         |  FROM vocabpt),
         |mg0(rank, a, b) AS MATERIALIZED (SELECT 0, '', '' WHERE 1 = 0)""".stripMargin)
    for (k <- 0 until n) {
      sb.append(",\n")
      val bestK =
        if (!scored)
          s"""best$k AS MATERIALIZED (SELECT a, b, n FROM pairs$k ORDER BY n DESC, a, b LIMIT 1)"""
        else
          s"""uni$k AS (SELECT sym, CAST(sum(w) AS BIGINT) AS c FROM (
             |    SELECT w, unnest(toks) AS sym FROM fin$k) q GROUP BY sym),
             |best$k AS MATERIALIZED (
             |  SELECT a, b, n, s FROM (
             |    SELECT p.a, p.b, p.n, (p.n * 1000000000000) // (ua.c * ub.c) AS s
             |    FROM pairs$k p
             |    JOIN uni$k ua ON ua.sym = p.a
             |    JOIN uni$k ub ON ub.sym = p.b) z
             |  ORDER BY s DESC, n DESC, a, b LIMIT 1)""".stripMargin
      sb.append(
        s"""walk$k(pt, w, s, rank) AS (
           |  SELECT pt, w, s, 0 FROM tbase
           |  UNION ALL
           |  SELECT pt, w, new_s,
           |         CASE WHEN new_s = s THEN rank + 1 ELSE rank END
           |  FROM (SELECT wk.pt, wk.w, wk.s, wk.rank,
           |               replace(wk.s, chr(1) || m.a || chr(1) || m.b || chr(1),
           |                             chr(1) || m.a || m.b || chr(1)) AS new_s
           |        FROM walk$k wk JOIN mg$k m ON m.rank = wk.rank
           |        WHERE wk.rank < $k) t),
           |fin$k AS MATERIALIZED (SELECT w, string_split(trim(s, chr(1)), chr(1)) AS toks
           |          FROM walk$k WHERE rank = $k),
           |pairs$k AS (
           |  SELECT p.a AS a, p.b AS b, CAST(sum(w) AS BIGINT) AS n FROM (
           |    SELECT w, unnest(list_transform(generate_series(1, len(toks) - 1),
           |           idx -> struct_pack(a := toks[idx], b := toks[idx + 1]))) AS p
           |    FROM fin$k WHERE len(toks) >= 2) q
           |  GROUP BY p.a, p.b),
           |$bestK,
           |mg${k + 1}(rank, a, b) AS MATERIALIZED (
           |  SELECT rank, a, b FROM mg$k
           |  UNION ALL SELECT $k, a, b FROM best$k)""".stripMargin)
    }
    sb.toString
  }

  /** Unrolled DuckDB replay of [[TextAnalysis.learnUnigramLm]] — the
    * unigram-LM (SentencePiece-style) training loop, bit-for-bit:
    * weighted pre-token vocabulary → block cut → seed substring counts
    * (top `seeds` ∪ all single chars) → per EM round, integer
    * surprisal bits (the NB bit law), an exact suffix-distance Viterbi
    * DP unrolled to [[TextAnalysis.UnigramBlockLen]] levels with the
    * engine's tie-break (`ORDER BY cost ASC, l DESC`), a recursive
    * walk that re-reads the chosen piece chain, and weighted usage
    * recounts — with the char-fallback likelihood-loss prune between
    * rounds. `withFinalSeg` additionally runs the inference DP under
    * the FINAL bits and emits `usegF(block, pos, piece)` — the
    * tokenize oracle's per-block segmentation relation.
    */
  /** Exact suffix-distance Viterbi DP + walk under tag `t`'s bits
    * relations (`ubits$t`/`uunk$t`) over `blocksRel` (a relation with a
    * block column `b`) → `useg$t(block, pos, piece)`. Extracted from
    * [[unigramCtes]] so inference can run over blocks BEYOND the
    * training corpus (the t_tokenizer_coverage planted-OOV corpus).
    */
  private def unigramDpCtes(t: String,
                            blocksRel: String = "ublocks"): String = {
    val L = 4
    val K = TextAnalysis.UnigramBlockLen
    val levels = (1 to K).map { d =>
      val branches = (1 to math.min(L, d)).map { l =>
        val pieceExpr = s"substr(bl.b, length(bl.b) - $d + 1, $l)"
        if (l == 1)
          s"""      SELECT bl.b AS block, coalesce(bb.bits, uu.bits) + pv.cost AS cost,
             |             1 AS l, $pieceExpr AS piece
             |      FROM $blocksRel bl CROSS JOIN uunk$t uu
             |      LEFT JOIN ubits$t bb ON bb.piece = $pieceExpr
             |      JOIN udp${t}_${d - 1} pv ON pv.block = bl.b
             |      WHERE length(bl.b) >= $d""".stripMargin
        else
          s"""      SELECT bl.b AS block, bb.bits + pv.cost AS cost,
             |             $l AS l, $pieceExpr AS piece
             |      FROM $blocksRel bl
             |      JOIN ubits$t bb ON bb.piece = $pieceExpr
             |      JOIN udp${t}_${d - l} pv ON pv.block = bl.b
             |      WHERE length(bl.b) >= $d""".stripMargin
      }.mkString("\n      UNION ALL\n")
      s"""udp${t}_$d AS MATERIALIZED (
         |  SELECT block, cost, l, piece FROM (
         |    SELECT q.*, row_number() OVER (PARTITION BY q.block
         |             ORDER BY q.cost ASC, q.l DESC) AS rn FROM (
         |$branches
         |    ) q) z WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""udp${t}_0 AS (SELECT b AS block, CAST(0 AS BIGINT) AS cost FROM $blocksRel),
       |$levels,
       |udpall$t AS MATERIALIZED (
       |${(1 to K).map(d => s"  SELECT block, $d AS d, l, piece FROM udp${t}_$d")
           .mkString("\n  UNION ALL\n")}),
       |uwalk$t(block, d, piece, pos) AS (
       |  SELECT b, length(b), CAST(NULL AS VARCHAR), CAST(0 AS BIGINT) FROM $blocksRel
       |  UNION ALL
       |  SELECT w.block, w.d - a.l, a.piece,
       |         CAST(length(w.block) - w.d AS BIGINT)
       |  FROM uwalk$t w JOIN udpall$t a ON a.block = w.block AND a.d = w.d
       |  WHERE w.d > 0),
       |useg$t AS MATERIALIZED (
       |  SELECT block, pos, piece FROM uwalk$t WHERE piece IS NOT NULL)""".stripMargin
  }

  /** The pre-token expression of the unigram chain: raw, or GPT-2
    * byte-encoded (each UTF-8 byte one mapped char, [[byteSymSql]]
    * joined back to a string) so every downstream substr/length counts
    * byte symbols.
    */
  private def uniPtExpr(e: String, byteLevel: Boolean): String =
    if (byteLevel) s"array_to_string(${byteSymSql(e)}, '')" else e

  private def unigramCtes(seeds: Int, vocab: Int, withFinalSeg: Boolean,
                          rel: String = "documents",
                          byteLevel: Boolean = false): String = {
    val pat = TextAnalysis.BpePattern.replace("'", "''")
    val L = 4
    val K = TextAnalysis.UnigramBlockLen
    val sb = new StringBuilder
    sb.append(
      s"""vocabpt AS MATERIALIZED (
         |  SELECT pt, CAST(count(*) AS BIGINT) AS w FROM (
         |    SELECT ${uniPtExpr("pt0", byteLevel)} AS pt FROM (
         |      SELECT unnest(regexp_extract_all(text, '$pat')) AS pt0
         |      FROM $rel WHERE text IS NOT NULL) u0) u GROUP BY pt),
         |ublocks AS MATERIALIZED (
         |  SELECT b, CAST(sum(w) AS BIGINT) AS w FROM (
         |    SELECT unnest(list_transform(generate_series(0, (length(pt) - 1) // $K),
         |           bi -> substr(pt, bi * $K + 1, $K))) AS b, w
         |    FROM vocabpt) u GROUP BY b),
         |usubs AS MATERIALIZED (
         |  SELECT piece, CAST(sum(w) AS BIGINT) AS cnt FROM (
         |    SELECT w, unnest(flatten(list_transform(generate_series(1, length(b)),
         |           p -> list_transform(generate_series(1, least($L, length(b) - p + 1)),
         |                l -> substr(b, p, l))))) AS piece
         |    FROM ublocks) u GROUP BY piece),
         |useeds AS (SELECT piece, cnt FROM usubs ORDER BY cnt DESC, piece LIMIT $seeds),
         |uchars AS (SELECT piece, cnt FROM usubs WHERE length(piece) = 1),
         |uinv0 AS MATERIALIZED (SELECT DISTINCT piece, cnt FROM (
         |  SELECT * FROM useeds UNION ALL SELECT * FROM uchars) z)""".stripMargin)

    // bits + unk of an inventory relation, under tag `t`
    def bitsCtes(t: String, invRel: String): String =
      s"""utot$t AS (SELECT CAST(sum(cnt) + count(*) AS BIGINT) AS t FROM $invRel),
         |ubits$t AS MATERIALIZED (
         |  SELECT piece, CAST(length(bin(tt.t)) - length(bin(cnt + 1)) AS BIGINT) AS bits
         |  FROM $invRel CROSS JOIN utot$t tt),
         |uunk$t AS (SELECT CAST(length(bin(t)) AS BIGINT) AS bits FROM utot$t)""".stripMargin

    def dpCtes(t: String): String = unigramDpCtes(t)

    def countCtes(t: String): String =
      s"""ucnt$t AS (SELECT s.piece, CAST(sum(bl.w) AS BIGINT) AS cnt
         |  FROM useg$t s JOIN ublocks bl ON bl.b = s.block GROUP BY s.piece)""".stripMargin

    // round 1: bits from uinv0, E-step, M-step, PRUNE → uinv1
    sb.append(",\n").append(bitsCtes("1", "uinv0"))
    sb.append(",\n").append(dpCtes("1"))
    sb.append(",\n").append(countCtes("1"))
    sb.append(",\n").append(
      s"""uinvm1 AS MATERIALIZED (
         |  SELECT i.piece, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
         |  FROM uinv0 i LEFT JOIN ucnt1 c USING (piece)),
         |upch AS (SELECT piece, unnest(list_transform(generate_series(1, length(piece)),
         |    i -> substr(piece, i, 1))) AS ch FROM uinvm1 WHERE length(piece) > 1),
         |upcb AS (SELECT p.piece, CAST(sum(coalesce(b2.bits, u.bits)) AS BIGINT) AS charbits
         |  FROM upch p CROSS JOIN uunk1 u
         |  LEFT JOIN ubits1 b2 ON b2.piece = p.ch GROUP BY p.piece),
         |uloss AS (SELECT m.piece, m.cnt, m.cnt * (cb.charbits - b1.bits) AS loss
         |  FROM uinvm1 m JOIN upcb cb USING (piece)
         |  JOIN ubits1 b1 ON b1.piece = m.piece),
         |ukeepn AS (SELECT CAST($vocab AS BIGINT) - count(*) AS n
         |  FROM uinvm1 WHERE length(piece) = 1),
         |ukept AS (SELECT piece, cnt FROM (
         |    SELECT piece, cnt, row_number() OVER (ORDER BY loss DESC, cnt DESC, piece) AS rn
         |    FROM uloss) z CROSS JOIN ukeepn WHERE rn <= n),
         |uinv1 AS MATERIALIZED (
         |  SELECT piece, cnt FROM uinvm1 WHERE length(piece) = 1
         |  UNION ALL SELECT piece, cnt FROM ukept)""".stripMargin)
    // round 2: bits from uinv1, E-step, M-step → uinv2 (final counts)
    sb.append(",\n").append(bitsCtes("2", "uinv1"))
    sb.append(",\n").append(dpCtes("2"))
    sb.append(",\n").append(countCtes("2"))
    sb.append(",\n").append(
      s"""uinv2 AS MATERIALIZED (
         |  SELECT i.piece, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
         |  FROM uinv1 i LEFT JOIN ucnt2 c USING (piece))""".stripMargin)
    // final bits (the returned inventory's), + optional inference DP
    sb.append(",\n").append(bitsCtes("F", "uinv2"))
    if (withFinalSeg) sb.append(",\n").append(dpCtes("F"))
    sb.toString
  }

  private def unigramTrainSql(rel: String = "documents",
                              byteLevel: Boolean = false,
                              prefixCtes: String = ""): String =
    s"""WITH RECURSIVE $prefixCtes${unigramCtes(UnigramSeeds, UnigramVocab,
           withFinalSeg = false, rel, byteLevel)}
       |SELECT CAST(row_number() OVER (ORDER BY f.cnt DESC, f.piece) - 1 AS BIGINT) AS rank,
       |       f.piece, f.cnt, b.bits
       |FROM uinv2 f JOIN ubitsF b USING (piece)
       |ORDER BY rank""".stripMargin

  private def unigramTokenizeSql(rel: String = "documents",
                                 byteLevel: Boolean = false,
                                 prefixCtes: String = ""): String = {
    val pat = TextAnalysis.BpePattern.replace("'", "''")
    val K = TextAnalysis.UnigramBlockLen
    s"""WITH RECURSIVE $prefixCtes${unigramCtes(UnigramSeeds, UnigramVocab,
           withFinalSeg = true, rel, byteLevel)},
       |udpts AS (
       |  SELECT doc_id, x.i AS i, ${uniPtExpr("x.pt", byteLevel)} AS pt
       |  FROM (SELECT doc_id,
       |          unnest(list_transform(regexp_extract_all(text, '$pat'),
       |                 (y, ii) -> struct_pack(pt := y, i := ii))) AS x
       |        FROM $rel) s),
       |udblk AS (
       |  SELECT doc_id, i, bi, substr(pt, bi * $K + 1, $K) AS b
       |  FROM (SELECT doc_id, i, pt,
       |          unnest(generate_series(0, (length(pt) - 1) // $K)) AS bi
       |        FROM udpts) t),
       |uper_doc AS (
       |  SELECT doc_id,
       |         string_agg(piece, chr(1) ORDER BY i, bi, pos) AS learned_tokens,
       |         CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT d.doc_id, d.i, d.bi, s.pos, s.piece
       |    FROM udblk d JOIN usegF s ON s.block = d.b) q
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |       coalesce(p.learned_tokens, '') AS learned_tokens,
       |       CAST(coalesce(p.n, 0) AS BIGINT) AS n_learned_tokens
       |FROM documents d LEFT JOIN uper_doc p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Per-domain OOV coverage under the learned unigram inventory, over
    * a corpus with PLANTED out-of-alphabet chars (' ~~~' appended to
    * every 5th doc — '~' never occurs in the corpus, so each planted
    * doc yields exactly 3 unknown-fallback pieces). The final-bits
    * Viterbi DP runs over the MEASURED corpus's distinct blocks
    * (unigramDpCtes with a custom blocks relation), not the training
    * blocks — inference and training corpora differ here by design.
    */
  private def tokenizerCoverageSql: String = {
    val pat = TextAnalysis.BpePattern.replace("'", "''")
    val K = TextAnalysis.UnigramBlockLen
    s"""WITH RECURSIVE ${unigramCtes(UnigramSeeds, UnigramVocab, withFinalSeg = false)},
       |cvdocs AS (SELECT source,
       |    CASE WHEN doc_id % 5 = 0 THEN text || ' ~~~' ELSE text END AS text
       |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
       |cvblk AS (
       |  SELECT source, substr(pt, bi * $K + 1, $K) AS b
       |  FROM (SELECT source, pt,
       |          unnest(generate_series(0, (length(pt) - 1) // $K)) AS bi
       |        FROM (SELECT source,
       |                unnest(regexp_extract_all(text, '$pat')) AS pt
       |              FROM cvdocs) p) t),
       |cvball AS (SELECT DISTINCT b FROM cvblk),
       |${unigramDpCtes("F", "cvball")},
       |cvo AS (SELECT c.source,
       |    CASE WHEN v.piece IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM cvblk c JOIN usegF s ON s.block = c.b
       |  LEFT JOIN uinv2 v ON v.piece = s.piece)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_pieces,
       |  CAST(sum(oov) AS BIGINT) AS n_oov,
       |  CAST(sum(oov) * 1000000 // count(*) AS BIGINT) AS oov_ppm
       |FROM cvo GROUP BY source ORDER BY source""".stripMargin
  }

  private def bpeTrainSql(n: Int, rel: String = "documents",
                          byteLevel: Boolean = false,
                          prefixCtes: String = ""): String = {
    val learned = (0 until n).map(k =>
      s"SELECT CAST($k AS BIGINT) AS rank, a AS lhs, b AS rhs, n FROM best$k")
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE $prefixCtes${bpeTrainCtes(n, scored = false, rel, byteLevel)}
       |SELECT * FROM (
       |$learned
       |) ORDER BY rank""".stripMargin
  }

  private def wordPieceTrainSql(n: Int, rel: String = "documents",
                                byteLevel: Boolean = false,
                                prefixCtes: String = ""): String = {
    val learned = (0 until n).map(k =>
      s"SELECT CAST($k AS BIGINT) AS rank, a AS lhs, b AS rhs, n, s AS score_fp FROM best$k")
      .mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE $prefixCtes${bpeTrainCtes(n, scored = true, rel, byteLevel)}
       |SELECT * FROM (
       |$learned
       |) ORDER BY rank""".stripMargin
  }

  /** Tokenize the corpus under the TRAINED table (mg_n as the walk's
    * merge relation over full documents) — proves the learn → tokenize
    * composition end to end, the full tokenizer lifecycle.
    */
  private def bpeTrainTokenizeSql(n: Int, scored: Boolean = false,
                                  rel: String = "documents",
                                  byteLevel: Boolean = false,
                                  prefixCtes: String = ""): String = {
    val pat = TextAnalysis.BpePattern.replace("'", "''")
    s"""WITH RECURSIVE $prefixCtes${bpeTrainCtes(n, scored, rel, byteLevel)},
       |dpts AS (
       |  SELECT doc_id, x.i AS i, x.pt AS pt
       |  FROM (SELECT doc_id,
       |          unnest(list_transform(regexp_extract_all(text, '$pat'),
       |                 (y, ii) -> struct_pack(pt := y, i := ii))) AS x
       |        FROM $rel) s),
       |dwalk(doc_id, i, s, rank) AS (
       |  SELECT doc_id, i,
       |         ${symStringSql("pt", byteLevel)},
       |         0
       |  FROM dpts
       |  UNION ALL
       |  SELECT doc_id, i, new_s,
       |         CASE WHEN new_s = s THEN rank + 1 ELSE rank END
       |  FROM (SELECT wk.doc_id, wk.i, wk.s, wk.rank,
       |               replace(wk.s, chr(1) || m.a || chr(1) || m.b || chr(1),
       |                             chr(1) || m.a || m.b || chr(1)) AS new_s
       |        FROM dwalk wk JOIN mg$n m ON m.rank = wk.rank
       |        WHERE wk.rank < $n) t),
       |dfin AS (SELECT doc_id, i, trim(s, chr(1)) AS toks
       |         FROM dwalk WHERE rank = $n),
       |per_doc AS (
       |  SELECT doc_id,
       |         string_agg(toks, chr(1) ORDER BY i) AS learned_tokens,
       |         CAST(sum(len(string_split(toks, chr(1)))) AS BIGINT) AS n_learned_tokens
       |  FROM dfin GROUP BY doc_id)
       |SELECT d.doc_id,
       |       coalesce(p.learned_tokens, '') AS learned_tokens,
       |       CAST(coalesce(p.n_learned_tokens, 0) AS BIGINT) AS n_learned_tokens
       |FROM $rel d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Shared by t_ann_ivf and t_ann_ivf_indexed — ditto: the persisted
    * quantizer + inverted lists round-trip parquet exactly.
    * `trainRel` parameterizes the quantizer's training relation so the
    * append-lifecycle oracle (frozen quantizer trained on the initial
    * half, delta assigned later) replays the same arithmetic.
    */
  private def annIvfSqlFor(trainRel: String): String =
    s"""WITH ${ivfCtes(k = 16, nProbe = 6, queryPred = "vec_id < 5", trainRel)},
       |cand AS (
       |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
       |  FROM assigned a JOIN probes p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.query_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         round(${cosine("qe.embedding", "ne.embedding")}, 6) AS cos
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT * FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  private val annIvfSql: String = annIvfSqlFor("embeddings")

  /** The append-lifecycle cut: index built on the first half of the
    * corpus, the rest appended as a delta (LSH: pure re-bucketing; IVF:
    * frozen quantizer trained on the first half only).
    */
  private val AppendCut = 250L

  def lshAppendIndexFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_lshap_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        val emb = Tables.embeddings(s, d)
        Similarity.buildLshIndex(emb.filter(col("vec_id") < AppendCut), name,
          planes = 4, dims = 64)
        Similarity.appendToLshIndex(emb.filter(col("vec_id") >= AppendCut), name,
          planes = 4, dims = 64)
        builtIndexes += name
      }
      name
    }

  def ivfAppendIndexFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_ivfap_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        val emb = Tables.embeddings(s, d)
        Similarity.buildIvfIndex(emb.filter(col("vec_id") < AppendCut), name,
          centroids = 16)
        Similarity.appendToIvfIndex(emb.filter(col("vec_id") >= AppendCut), name)
        builtIndexes += name
      }
      name
    }

  /** The gate-oracle split: the store is seeded (through the gate's own
    * admit pipeline) from EVEN doc ids; the probed batch is a 10% slice
    * of odd ids (micro-batch-sized, as the gate runs in production)
    * plus a few redelivered evens so the id-anti-join path is
    * exercised.
    */
  private val GateStorePred = "doc_id % 2 = 0"
  private val GateBatchPred = "doc_id % 10 = 1 OR doc_id <= 4"

  def gateStoreFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_gate_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        val seed = Tables.documents(s, d).filter(expr(GateStorePred))
        graft.streaming.IngestDedupGate.appendToStore(
          graft.streaming.IngestDedupGate.filterNovel(seed, name), name)
        builtIndexes += name
      }
      name
    }

  def pqIndexFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_pq_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        Similarity.buildPqIndex(Tables.embeddings(s, d), name,
          m = 8, codebookSize = 16, dims = 64)
        builtIndexes += name
      }
      name
    }

  def pqAppendIndexFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_pqap_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        val emb = Tables.embeddings(s, d)
        Similarity.buildPqIndex(emb.filter(col("vec_id") < AppendCut), name,
          m = 8, codebookSize = 16, dims = 64)
        Similarity.appendToPqIndex(emb.filter(col("vec_id") >= AppendCut), name,
          m = 8, dims = 64)
        builtIndexes += name
      }
      name
    }

  def ivfPqIndexFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_ivfpq_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        Similarity.buildIvfPqIndex(Tables.embeddings(s, d), name,
          centroids = 16, m = 8, codebookSize = 16, dims = 64)
        builtIndexes += name
      }
      name
    }

  def ivfPqAppendIndexFor(s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      val name = "graft_ivfpqap_" + dirStem(d)
      if (!builtIndexes.contains(name)) {
        val emb = Tables.embeddings(s, d)
        Similarity.buildIvfPqIndex(emb.filter(col("vec_id") < AppendCut), name,
          centroids = 16, m = 8, codebookSize = 16, dims = 64)
        Similarity.appendToIvfPqIndex(emb.filter(col("vec_id") >= AppendCut),
          name, m = 8, dims = 64)
        builtIndexes += name
      }
      name
    }

  /** Shared by t_ann_pq / t_ann_pq_indexed / t_ann_pq_appended: the
    * oracle retrains the m codebooks on `trainRel` (the full corpus for
    * build-at-once, the pre-append half for the frozen-codebook append
    * replay), re-encodes the WHOLE corpus and replays every quantized
    * score.
    */
  private def annPqSqlFor(trainRel: String): String =
    s"""WITH ${pqCtes(m = 8, sub = 8, k = 16, queryPred = "q.vec_id < 5",
                      trainRel = trainRel)},
       |scores AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |         CAST(SUM(pd) AS BIGINT) AS score
       |  FROM pqparts WHERE query_id <> vec_id GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scores)
       |SELECT * FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  private val annPqSql: String = annPqSqlFor("embeddings")

  /** t_ann_pq_rerank: the proven PQ CTE chain selects the ADC top-30
    * window (score-desc, neighbor-id tiebreak — the exact rule
    * rankTopK applies), then the window's true vectors join back for
    * the round-6 exact-cosine rerank.
    */
  private val annPqRerankSql: String =
    s"""WITH ${pqCtes(m = 8, sub = 8, k = 16, queryPred = "q.vec_id < 5",
                      trainRel = "embeddings")},
       |scores AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |         CAST(SUM(pd) AS BIGINT) AS score
       |  FROM pqparts WHERE query_id <> vec_id GROUP BY 1, 2),
       |window_cand AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |              ORDER BY score DESC, neighbor_id) AS arank
       |  FROM scores),
       |exact AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         round(${cosine("qe.embedding", "ne.embedding")}, 6) AS cos
       |  FROM window_cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id
       |  WHERE c.arank <= 30),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM exact)
       |SELECT * FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** Shared by t_ann_ivfpq / t_ann_ivfpq_indexed / t_ann_ivfpq_appended:
    * the composite of the two proven CTE generators (prefix-isolated),
    * with BOTH quantizers trained on `trainRel`.
    */
  private def annIvfPqSqlFor(trainRel: String): String =
    s"""WITH ${ivfCtes(k = 16, nProbe = 6, queryPred = "vec_id < 5", trainRel)},
       |${pqCtes(m = 8, sub = 8, k = 16, queryPred = "q.vec_id < 5",
                 prefix = "x", trainRel = trainRel)},
       |cand AS (
       |  SELECT DISTINCT p.query_id, a.vec_id
       |  FROM assigned a JOIN probes p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.query_id),
       |scores AS (
       |  SELECT c.query_id, c.vec_id AS neighbor_id,
       |         CAST(SUM(pp.pd) AS BIGINT) AS score
       |  FROM cand c JOIN xpqparts pp
       |    ON pp.query_id = c.query_id AND pp.vec_id = c.vec_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scores)
       |SELECT * FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  private val annIvfPqSql: String = annIvfPqSqlFor("embeddings")

  /** t_ann_ivfpq_rerank: the composite CTE chain selects the ADC top-30
    * window per query over the probe-pruned candidates (score-desc,
    * neighbor-id tiebreak — rankTopK's rule), then only the window's
    * true vectors join back for the round-6 exact-cosine rerank.
    */
  private val annIvfPqRerankSql: String =
    s"""WITH ${ivfCtes(k = 16, nProbe = 6, queryPred = "vec_id < 5", "embeddings")},
       |${pqCtes(m = 8, sub = 8, k = 16, queryPred = "q.vec_id < 5",
                 prefix = "x", trainRel = "embeddings")},
       |cand AS (
       |  SELECT DISTINCT p.query_id, a.vec_id
       |  FROM assigned a JOIN probes p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.query_id),
       |scores AS (
       |  SELECT c.query_id, c.vec_id AS neighbor_id,
       |         CAST(SUM(pp.pd) AS BIGINT) AS score
       |  FROM cand c JOIN xpqparts pp
       |    ON pp.query_id = c.query_id AND pp.vec_id = c.vec_id
       |  GROUP BY 1, 2),
       |window_cand AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |              ORDER BY score DESC, neighbor_id) AS arank
       |  FROM scores),
       |exact AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         round(${cosine("qe.embedding", "ne.embedding")}, 6) AS cos
       |  FROM window_cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id
       |  WHERE c.arank <= 30),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM exact)
       |SELECT * FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  private val HalfCorpus = s"(SELECT * FROM embeddings WHERE vec_id < $AppendCut)"

  /** CTE chain of the char-trigram NB language-ID classifier over
    * `documents` (shared by t_nb_langid and t_lang_mix): re-encoded
    * code-point trigrams, add-one-smoothed per-label model, ranked
    * per-doc labels in `nrk` (rn = 1 is the argmin) and the
    * prior-only ranking `npk` for the null-text fallback.
    */
  private def nbLangIdCtes: String = nbLangIdCtesFor("documents", "doc_id")

  /** Shared verbatim by t_nb_langid (in-session training) and
    * t_nb_langid_persisted (char3 bundle round-tripped through disk) —
    * one SQL gating that both paths classify identically, the
    * nbClassifyLangSql pattern for the char-trigram space.
    */
  private lazy val nbLangIdSql: String =
    s"""WITH $nbLangIdCtes
       |SELECT d.doc_id,
       |  coalesce(r.label, p.label) AS pred,
       |  CAST(coalesce(r.bits, p.prior_bits) AS BIGINT) AS bits,
       |  CAST(CASE WHEN r.doc_id IS NOT NULL
       |            THEN coalesce(r.nxt - r.bits, 0)
       |            ELSE coalesce(p.nxt - p.prior_bits, 0) END AS BIGINT)
       |    AS margin,
       |  coalesce(r.n_tokens, 0) AS n_tokens
       |FROM documents d
       |LEFT JOIN (SELECT * FROM nrk WHERE rn = 1) r USING (doc_id)
       |CROSS JOIN (SELECT * FROM npk WHERE rn = 1) p
       |ORDER BY d.doc_id""".stripMargin

  /** Shared by t_domain_lang_mix and its persisted-bundle twin. */
  private lazy val domainLangMixSql: String =
    s"""WITH $nbLangIdCtes,
       |dlp AS (SELECT d.doc_id, d.source,
       |    coalesce(r.label, p.label) AS pred
       |  FROM documents d
       |  LEFT JOIN (SELECT * FROM nrk WHERE rn = 1) r USING (doc_id)
       |  CROSS JOIN (SELECT * FROM npk WHERE rn = 1) p
       |  WHERE d.source IS NOT NULL),
       |dlc AS (SELECT source, pred, CAST(count(*) AS BIGINT) AS c
       |  FROM dlp GROUP BY 1, 2),
       |dlr AS (SELECT source, pred, c,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY c DESC, pred) AS rn FROM dlc),
       |dla AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
       |    CAST(count(*) AS BIGINT) AS n_langs FROM dlc GROUP BY 1)
       |SELECT a.source, a.n_docs, a.n_langs, t.pred AS dom_lang,
       |  (t.c * 100 // a.n_docs) AS dom_share_x100
       |FROM dla a JOIN (SELECT * FROM dlr WHERE rn = 1) t USING (source)
       |ORDER BY a.source""".stripMargin

  /** Shared by t_lang_mix and its persisted-bundle twin. */
  private lazy val langMixSql: String =
    s"""WITH $nbLangIdCtes,
       |lmp AS (SELECT d.doc_id, coalesce(r.label, p.label) AS lang_pred
       |  FROM documents d
       |  LEFT JOIN (SELECT * FROM nrk WHERE rn = 1) r USING (doc_id)
       |  CROSS JOIN (SELECT * FROM npk WHERE rn = 1) p),
       |lmc AS (SELECT lang_pred, count(*) AS c FROM lmp GROUP BY 1),
       |lmm AS (SELECT min(c) AS cm FROM lmc),
       |lmt AS (SELECT lang_pred,
       |          (CAST(floor(sqrt(CAST(c * cm AS DOUBLE))) AS BIGINT)
       |             * 10000 // c) AS keep_thr
       |        FROM lmc CROSS JOIN lmm)
       |SELECT p.doc_id, p.lang_pred FROM lmp p JOIN lmt USING (lang_pred)
       |WHERE ${polyhash("CAST(p.doc_id AS VARCHAR)")} % 10000 < keep_thr
       |ORDER BY p.doc_id""".stripMargin

  /** Ditto for t_code_switch / t_code_switch_persisted. */
  private lazy val codeSwitchSql: String =
    s"""WITH cch AS (
       |  SELECT CAST(doc_id AS VARCHAR) || ':' ||
       |         CAST(st // 30 AS VARCHAR) AS ckey,
       |         array_to_string(ws[st+1:st+30], ' ') AS text
       |  FROM (SELECT doc_id, ws,
       |          unnest(CASE WHEN len(ws) > 0 THEN range(0, len(ws), 30)
       |                 ELSE [] END) AS st
       |        FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |              FROM documents WHERE text IS NOT NULL) w) s),
       |${nbLangIdCtesFor("cch", "ckey")},
       |cpred AS (SELECT c.ckey, coalesce(r.label, p.label) AS pred
       |  FROM cch c
       |  LEFT JOIN (SELECT * FROM nrk WHERE rn = 1) r
       |    ON r.doc_id = c.ckey
       |  CROSS JOIN (SELECT * FROM npk WHERE rn = 1) p),
       |cvotes AS (SELECT CAST(split_part(ckey, ':', 1) AS BIGINT)
       |    AS doc_id, pred, CAST(count(*) AS BIGINT) AS c
       |  FROM cpred GROUP BY 1, 2),
       |crk AS (SELECT doc_id, pred, c,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY c DESC, pred) AS rn
       |  FROM cvotes),
       |cagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chunks,
       |    CAST(count(*) AS BIGINT) AS n_langs
       |  FROM cvotes GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(a.n_chunks, 0) AS n_chunks,
       |  coalesce(a.n_langs, 0) AS n_langs,
       |  k.pred AS dom_lang,
       |  coalesce(k.c * 100 // a.n_chunks, 0) AS dom_share_x100,
       |  CAST(CASE WHEN coalesce(a.n_langs, 0) > 1 THEN 1 ELSE 0 END
       |    AS BIGINT) AS switched
       |FROM documents d
       |LEFT JOIN cagg a USING (doc_id)
       |LEFT JOIN (SELECT * FROM crk WHERE rn = 1) k USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** The char-trigram NB language-ID chain with a parameterized SCORING
    * relation: training always reads `documents.lang`, but the rows
    * being classified come from `scoreRel` (exposing `scoreKey` + text)
    * — `documents` itself for t_nb_langid/t_lang_mix, the chunk
    * relation for t_code_switch. The scoring key is aliased `doc_id`
    * throughout the chain so the nrk/npk tail stays shared.
    */
  private def nbLangIdCtesFor(scoreRel: String, scoreKey: String): String =
    s"""lre AS (SELECT doc_id, lang, replace(text, ' ', '_') AS s
         |  FROM documents WHERE text IS NOT NULL),
         |lg AS (SELECT doc_id, lang,
         |    CASE WHEN length(s) >= 3
         |         THEN list_transform(generate_series(1, length(s) - 2),
         |                i -> s[i:i+2])
         |         ELSE [s] END AS gs FROM lre),
         |vtf0 AS (SELECT doc_id, lang AS label, unnest(gs) AS word
         |  FROM lg WHERE lang IS NOT NULL),
         |sre AS (SELECT $scoreKey AS doc_id, replace(text, ' ', '_') AS s
         |  FROM $scoreRel WHERE text IS NOT NULL),
         |sg AS (SELECT doc_id,
         |    CASE WHEN length(s) >= 3
         |         THEN list_transform(generate_series(1, length(s) - 2),
         |                i -> s[i:i+2])
         |         ELSE [s] END AS gs FROM sre),
         |ntf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(gs) AS word FROM sg) u GROUP BY 1, 2),
         |vwc AS (SELECT label, word, CAST(count(*) AS BIGINT) AS cnt
         |  FROM vtf0 GROUP BY 1, 2),
         |vv AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM vwc),
         |vprior AS (SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
         |vn AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM vprior),
         |vtok AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tok
         |  FROM vwc GROUP BY 1),
         |vcls AS (SELECT p.label,
         |    CAST(coalesce(t.tok, 0) + vv.v AS BIGINT) AS denom,
         |    CAST(length(bin(vn.n)) - length(bin(p.n_docs)) AS BIGINT)
         |      AS prior_bits
         |  FROM vprior p LEFT JOIN vtok t USING (label)
         |  CROSS JOIN vn CROSS JOIN vv),
         |vcls2 AS (SELECT label, prior_bits,
         |    CAST(length(bin(denom)) - 1 AS BIGINT) AS default_bits, denom
         |  FROM vcls),
         |vmodel AS (SELECT w.label, w.word,
         |    CAST(length(bin(c.denom)) - length(bin(w.cnt + 1)) AS BIGINT)
         |      AS bits
         |  FROM vwc w JOIN vcls2 c USING (label)),
         |nmatched AS (SELECT t.doc_id, t.word, t.tf FROM ntf t
         |  WHERE t.word IN (SELECT DISTINCT word FROM vwc)),
         |nsc AS (SELECT m.doc_id, c.label, c.prior_bits,
         |    CAST(sum(m.tf * coalesce(md.bits, c.default_bits)) AS BIGINT)
         |      AS evid,
         |    CAST(sum(m.tf) AS BIGINT) AS n_tokens
         |  FROM nmatched m CROSS JOIN vcls2 c
         |  LEFT JOIN vmodel md ON md.word = m.word AND md.label = c.label
         |  GROUP BY 1, 2, 3),
         |nrk AS (SELECT doc_id, label,
         |    CAST(prior_bits + evid AS BIGINT) AS bits, n_tokens,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY prior_bits + evid, label) AS rn,
         |    lead(prior_bits + evid) OVER (PARTITION BY doc_id
         |      ORDER BY prior_bits + evid, label) AS nxt
         |  FROM nsc),
         |npk AS (SELECT label, prior_bits,
         |    row_number() OVER (ORDER BY prior_bits, label) AS rn,
         |    lead(prior_bits) OVER (ORDER BY prior_bits, label) AS nxt
         |  FROM vcls2)"""
      .stripMargin

  /** The language-teacher NB classification oracle — shared verbatim by
    * t_nb_classify (in-session training) and t_nb_classify_persisted
    * (bundle round-tripped through disk): one SQL gating that both
    * paths produce the identical result.
    */
  private lazy val nbClassifyLangSql: String =
    s"""WITH nblab AS (SELECT doc_id, lang AS label, text FROM documents),
       |${nbWordCtes("nblab")}
       |SELECT d.doc_id,
       |  coalesce(r.label, p.label) AS pred,
       |  CAST(coalesce(r.bits, p.prior_bits) AS BIGINT) AS bits,
       |  CAST(CASE WHEN r.doc_id IS NOT NULL
       |            THEN coalesce(r.nxt - r.bits, 0)
       |            ELSE coalesce(p.nxt - p.prior_bits, 0) END AS BIGINT)
       |    AS margin,
       |  coalesce(r.n_tokens, 0) AS n_tokens
       |FROM documents d
       |LEFT JOIN (SELECT * FROM nrk WHERE rn = 1) r USING (doc_id)
       |CROSS JOIN (SELECT * FROM npk WHERE rn = 1) p
       |ORDER BY d.doc_id""".stripMargin

  /** The quality-teacher NB classification oracle — shared verbatim by
    * t_quality_classifier (in-session training) and
    * t_quality_classifier_persisted (bundle round-tripped through
    * disk): one SQL gating that both paths produce the identical
    * result, the [[nbClassifyLangSql]] pattern for the quality teacher.
    */
  private lazy val qualityNbCtes: String =
    s"""${qualityCtes("documents")},
       |nblab AS (SELECT doc_id,
       |    CASE WHEN quality >= 3 THEN 'good' ELSE 'bad' END AS label,
       |    text FROM qscored WHERE text IS NOT NULL),
       |${nbWordCtes("nblab")},
       |qcls AS (SELECT d.doc_id,
       |    coalesce(r.label, p.label) AS pred,
       |    CAST(coalesce(r.bits, p.prior_bits) AS BIGINT) AS bits,
       |    CAST(CASE WHEN r.doc_id IS NOT NULL
       |              THEN coalesce(r.nxt - r.bits, 0)
       |              ELSE coalesce(p.nxt - p.prior_bits, 0) END AS BIGINT)
       |      AS margin,
       |    coalesce(r.n_tokens, 0) AS n_tokens
       |  FROM documents d
       |  LEFT JOIN (SELECT * FROM nrk WHERE rn = 1) r USING (doc_id)
       |  CROSS JOIN (SELECT * FROM npk WHERE rn = 1) p)""".stripMargin

  private lazy val qualityClassifySql: String =
    s"""WITH $qualityNbCtes
       |SELECT doc_id, pred, bits, margin, n_tokens
       |FROM qcls ORDER BY doc_id""".stripMargin

  /** CTE chain of the word-unigram NB classifier: trained on
    * `labeledRel` (must expose doc_id, label, text), scoring every
    * `documents` row; ends with `nrk` (per-doc ranked labels) and
    * `npk` (prior-only fallback ranking). Shared by t_nb_classify
    * and t_quality_classifier.
    */
  private def nbWordCtes(labeledRel: String): String =
    s"""vtf0 AS (SELECT doc_id, label,
         |    unnest(string_split(text, ' ')) AS word
         |  FROM $labeledRel WHERE label IS NOT NULL AND text IS NOT NULL),
         |ntf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents WHERE text IS NOT NULL) u GROUP BY 1, 2),
         |vwc AS (SELECT label, word, CAST(count(*) AS BIGINT) AS cnt
         |  FROM vtf0 GROUP BY 1, 2),
         |vv AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM vwc),
         |vprior AS (SELECT label, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM $labeledRel WHERE label IS NOT NULL GROUP BY 1),
         |vn AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM vprior),
         |vtok AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tok
         |  FROM vwc GROUP BY 1),
         |vcls AS (SELECT p.label,
         |    CAST(coalesce(t.tok, 0) + vv.v AS BIGINT) AS denom,
         |    CAST(length(bin(vn.n)) - length(bin(p.n_docs)) AS BIGINT)
         |      AS prior_bits
         |  FROM vprior p LEFT JOIN vtok t USING (label)
         |  CROSS JOIN vn CROSS JOIN vv),
         |vcls2 AS (SELECT label, prior_bits,
         |    CAST(length(bin(denom)) - 1 AS BIGINT) AS default_bits, denom
         |  FROM vcls),
         |vmodel AS (SELECT w.label, w.word,
         |    CAST(length(bin(c.denom)) - length(bin(w.cnt + 1)) AS BIGINT)
         |      AS bits
         |  FROM vwc w JOIN vcls2 c USING (label)),
         |nmatched AS (SELECT t.doc_id, t.word, t.tf FROM ntf t
         |  WHERE t.word IN (SELECT DISTINCT word FROM vwc)),
         |nsc AS (SELECT m.doc_id, c.label, c.prior_bits,
         |    CAST(sum(m.tf * coalesce(md.bits, c.default_bits)) AS BIGINT)
         |      AS evid,
         |    CAST(sum(m.tf) AS BIGINT) AS n_tokens
         |  FROM nmatched m CROSS JOIN vcls2 c
         |  LEFT JOIN vmodel md ON md.word = m.word AND md.label = c.label
         |  GROUP BY 1, 2, 3),
         |nrk AS (SELECT doc_id, label,
         |    CAST(prior_bits + evid AS BIGINT) AS bits, n_tokens,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY prior_bits + evid, label) AS rn,
         |    lead(prior_bits + evid) OVER (PARTITION BY doc_id
         |      ORDER BY prior_bits + evid, label) AS nxt
         |  FROM nsc),
         |npk AS (SELECT label, prior_bits,
         |    row_number() OVER (ORDER BY prior_bits, label) AS rn,
         |    lead(prior_bits) OVER (ORDER BY prior_bits, label) AS nxt
         |  FROM vcls2)"""
      .stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ── Text analysis ──────────────────────────────────────────────
    // ── HTML → text extraction (the crawl pipeline's stage zero):
    // planted pages wrap each doc's words in script/style/heading/
    // paragraph markup with entities; the 6-step chain (script, style,
    // block tags → newline, tags → space, entity decode with &amp;
    // LAST, whitespace law) replays regex-for-regex — every construct
    // in the common Java/RE2 subset.
    QueryDef("t_html_extract",
      s"""WITH p AS (SELECT doc_id,
         |  '<html><head><script type="x">var a = 1 < 2;</script>' ||
         |  '<style>.c { color: red }</style></head><body><h1>Title ' ||
         |  CAST(doc_id AS VARCHAR) || '</h1><p>' ||
         |  coalesce(array_to_string(string_split(text, ' ')[1:8], ' '), '')
         |  || '</p><p>more &amp; stuff&nbsp;&lt;kept&gt;</p></body></html>'
         |  AS html FROM documents WHERE text IS NOT NULL),
         |s1 AS (SELECT doc_id, regexp_replace(html,
         |  '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS h FROM p),
         |s2 AS (SELECT doc_id, regexp_replace(h,
         |  '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS h FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(h,
         |  '(?i)</?(p|br|div|li|h[1-6]|tr)[^>]*>', chr(10), 'g') AS h
         |  FROM s2),
         |s4 AS (SELECT doc_id, regexp_replace(h, '<[^>]*>', ' ', 'g')
         |  AS h FROM s3),
         |s5 AS (SELECT doc_id,
         |  replace(replace(replace(replace(replace(replace(h,
         |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
         |    '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS h
         |  FROM s4),
         |s6 AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |  regexp_replace(h, '[ ' || chr(9) || ']+', ' ', 'g'),
         |  ' ?' || chr(10) || '[ ' || chr(10) || ']*', chr(10), 'g'),
         |  '^' || chr(10) || '+|' || chr(10) || '+$$', '', 'g'))
         |  AS text FROM s5)
         |SELECT doc_id, text FROM s6 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val html = concat(
        lit("<html><head><script type=\"x\">var a = 1 < 2;</script>" +
          "<style>.c { color: red }</style></head><body><h1>Title "),
        col("doc_id").cast("string"), lit("</h1><p>"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 8)),
        lit("</p><p>more &amp; stuff&nbsp;&lt;kept&gt;</p></body></html>"))
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"),
          TextAnalysis.htmlToText(html).as("text"))
    }.sortedBy(col("doc_id")),

    // ── Code-file screen (The Stack/StarCoder rules): planted code
    // (short lines, comments — passes), a minified blob (one 1200-char
    // line — fails max_line_len), and raw prose (single ~300-char line
    // — fails the avg-line rule); every ratio integer cross-multiplied.
    QueryDef("t_code_stats",
      s"""WITH p AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN 'def f():' || chr(10) || '# comment line' ||
         |      chr(10) || '  return ' || CAST(doc_id AS VARCHAR) ||
         |      chr(10) || '// done'
         |    WHEN 1 THEN repeat('x7', 600)
         |    ELSE text END AS text
         |  FROM documents WHERE text IS NOT NULL),
         |ls AS (SELECT doc_id, text, string_split(text, chr(10)) AS l
         |  FROM p),
         |st AS (SELECT doc_id,
         |  CAST(len(l) AS BIGINT) AS n_lines,
         |  CAST(coalesce(list_max(list_transform(l, x -> length(x))), 0)
         |    AS BIGINT) AS max_line_len,
         |  CAST((coalesce(list_sum(list_transform(l, x -> length(x))), 0)
         |    * 100) // len(l) AS BIGINT) AS avg_line_len_x100,
         |  CAST(CASE WHEN length(text) > 0
         |    THEN (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
         |      * 1000) // length(text) ELSE 0 END AS BIGINT)
         |    AS alpha_frac_x1000,
         |  CAST((len(list_filter(l, x -> regexp_matches(ltrim(x),
         |    '^(#|//|--|/\\*|\\*)'))) * 1000) // len(l) AS BIGINT)
         |    AS comment_frac_x1000
         |  FROM ls)
         |SELECT *, CAST(CASE WHEN avg_line_len_x100 <= 10000
         |    AND max_line_len <= 1000 AND alpha_frac_x1000 >= 250
         |  THEN 1 ELSE 0 END AS BIGINT) AS code_pass
         |FROM st ORDER BY doc_id""".stripMargin) { (s, d) =>
      val planted = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat(lit("def f():\n# comment line\n  return "),
              col("doc_id").cast("string"), lit("\n// done")))
          .when(col("doc_id") % 4 === 1, lit("x7" * 600))
          .otherwise(col("text")).as("text"))
      TextAnalysis.codeStats(planted)
    }.sortedBy(col("doc_id")),

    // ── Eval scoring: SQuAD-style exact match + bag-of-tokens F1 over
    // planted predictions (perfect / truncated / padded / unrelated per
    // doc_id % 4); every score integer cross-multiplied, the
    // empty-vs-empty null-answer rule included.
    QueryDef("t_eval_f1",
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL),
         |preds AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN text
         |    WHEN 1 THEN coalesce(array_to_string(
         |      string_split(text, ' ')[1:8], ' '), '')
         |    WHEN 2 THEN text || ' EXTRA extra tokens'
         |    ELSE 'completely different words here' END AS pred
         |  FROM base),
         |np AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(pred), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM preds),
         |nr AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM base),
         |tp AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(n, ' ')) AS w
         |        FROM np WHERE n <> '') GROUP BY doc_id, w),
         |tr AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(n, ' ')) AS w
         |        FROM nr WHERE n <> '') GROUP BY doc_id, w),
         |ov AS (SELECT tp.doc_id,
         |    CAST(sum(least(tp.tf, tr.tf)) AS BIGINT) AS ov
         |  FROM tp JOIN tr ON tr.doc_id = tp.doc_id AND tr.w = tp.w
         |  GROUP BY tp.doc_id),
         |cts AS (SELECT np.doc_id, np.n AS pn, nr.n AS rn,
         |  CASE WHEN np.n = '' THEN 0
         |       ELSE len(string_split(np.n, ' ')) END AS n_pred,
         |  CASE WHEN nr.n = '' THEN 0
         |       ELSE len(string_split(nr.n, ' ')) END AS n_ref
         |  FROM np JOIN nr ON nr.doc_id = np.doc_id)
         |SELECT c.doc_id, CAST(c.n_pred AS BIGINT) AS n_pred,
         |  CAST(c.n_ref AS BIGINT) AS n_ref,
         |  CAST(coalesce(o.ov, 0) AS BIGINT) AS overlap,
         |  c.pn = c.rn AS em,
         |  CAST(CASE WHEN c.n_pred + c.n_ref = 0 THEN 100
         |    ELSE (2 * coalesce(o.ov, 0) * 100) // (c.n_pred + c.n_ref)
         |  END AS BIGINT) AS f1_x100
         |FROM cts c LEFT JOIN ov o ON o.doc_id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).filter(col("text").isNotNull)
      val preds = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .when(col("doc_id") % 4 === 1,
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"), lit(" EXTRA extra tokens")))
          .otherwise(lit("completely different words here")).as("pred"))
      graft.ext.Eval.tokenF1(preds,
        base.select(col("doc_id"), col("text").as("ref")))
    }.sortedBy(col("doc_id")),

    // ── Annotation aggregation over a planted 4-annotator panel
    // (a1 = lang; a2 mislabels %4 as 'xx'; a3 abstains on %5, labels
    // %3 'yy'; a4 rotates every lang — the below-chance annotator that
    // forces κ NEGATIVE, exactly where trunc-vs-floor division
    // diverges between engines).
    QueryDef("t_majority_vote",
      s"""WITH ann AS (
         |  SELECT doc_id AS item_id, 'a1' AS annotator, lang AS label
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a2',
         |    CASE WHEN doc_id % 4 = 0 THEN 'xx' ELSE lang END
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a3',
         |    CASE WHEN doc_id % 5 = 0 THEN NULL
         |         WHEN doc_id % 3 = 0 THEN 'yy' ELSE lang END
         |    FROM documents WHERE lang IS NOT NULL),
         |votes AS (SELECT item_id, label, CAST(count(*) AS BIGINT) AS v
         |  FROM ann WHERE label IS NOT NULL GROUP BY item_id, label),
         |tot AS (SELECT item_id, CAST(sum(v) AS BIGINT) AS n_votes
         |  FROM votes GROUP BY item_id),
         |top AS (SELECT item_id, label, v FROM (
         |    SELECT item_id, label, v, row_number() OVER (
         |      PARTITION BY item_id ORDER BY v DESC, label) AS rn
         |    FROM votes) WHERE rn = 1)
         |SELECT t.item_id, t.label, t.v AS votes, o.n_votes,
         |  t.v = o.n_votes AS unanimous
         |FROM top t JOIN tot o ON o.item_id = t.item_id
         |ORDER BY t.item_id""".stripMargin) { (s, d) =>
      graft.ext.Eval.majorityVote(annotationPanel(s, d))
    }.sortedBy(col("item_id")),

    // Confusion matrix: annotator a1 (truth) vs a2 (the %4='xx'
    // mislabeler) — diagonal rows carry per-class recall/precision,
    // the 'xx' column shows exactly where the mass leaks.
    QueryDef("t_confusion",
      s"""WITH refs AS (SELECT doc_id, lang AS ref FROM documents
         |  WHERE lang IS NOT NULL),
         |preds AS (SELECT doc_id,
         |    CASE WHEN doc_id % 4 = 0 THEN 'xx' ELSE lang END AS pred
         |  FROM documents WHERE lang IS NOT NULL),
         |cells AS (SELECT r.ref, p.pred, CAST(count(*) AS BIGINT) AS n
         |  FROM preds p JOIN refs r ON r.doc_id = p.doc_id
         |  GROUP BY 1, 2),
         |rt AS (SELECT ref, CAST(sum(n) AS BIGINT) AS rn
         |  FROM cells GROUP BY 1),
         |pt AS (SELECT pred, CAST(sum(n) AS BIGINT) AS pn
         |  FROM cells GROUP BY 1)
         |SELECT c.ref, c.pred, c.n,
         |  CAST((c.n * 100) // rt.rn AS BIGINT) AS recall_x100,
         |  CAST((c.n * 100) // pt.pn AS BIGINT) AS precision_x100
         |FROM cells c JOIN rt ON rt.ref = c.ref
         |JOIN pt ON pt.pred = c.pred
         |ORDER BY c.ref, c.pred""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).filter(col("lang").isNotNull)
      graft.ext.Eval.confusionMatrix(
        base.select(col("doc_id"),
          when(col("doc_id") % 4 === 0, lit("xx"))
            .otherwise(col("lang")).as("pred")),
        base.select(col("doc_id"), col("lang").as("ref")))
    }.sortedBy(col("ref"), col("pred")),

    QueryDef("t_kappa",
      s"""WITH ann AS (
         |  SELECT doc_id AS item_id, 'a1' AS annotator, lang AS label
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a2',
         |    CASE WHEN doc_id % 4 = 0 THEN 'xx' ELSE lang END
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a3',
         |    CASE WHEN doc_id % 5 = 0 THEN NULL
         |         WHEN doc_id % 3 = 0 THEN 'yy' ELSE lang END
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a4',
         |    CASE lang WHEN 'en' THEN 'zh' WHEN 'zh' THEN 'es'
         |      WHEN 'es' THEN 'de' WHEN 'de' THEN 'fr' ELSE 'en' END
         |    FROM documents WHERE lang IS NOT NULL),
         |l AS (SELECT * FROM ann WHERE label IS NOT NULL),
         |pairs AS (SELECT a.item_id, a.annotator AS ann_a,
         |    b.annotator AS ann_b, a.label AS la, b.label AS lb
         |  FROM l a JOIN l b ON b.item_id = a.item_id
         |    AND a.annotator < b.annotator),
         |agg AS (SELECT ann_a, ann_b, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS agree
         |  FROM pairs GROUP BY 1, 2),
         |ma AS (SELECT ann_a, ann_b, la AS lab,
         |    CAST(count(*) AS BIGINT) AS ca
         |  FROM pairs GROUP BY 1, 2, 3),
         |mb AS (SELECT ann_a, ann_b, lb AS lab,
         |    CAST(count(*) AS BIGINT) AS cb
         |  FROM pairs GROUP BY 1, 2, 3),
         |pe AS (SELECT ma.ann_a, ma.ann_b,
         |    CAST(sum(ma.ca * mb.cb) AS BIGINT) AS pe
         |  FROM ma JOIN mb ON mb.ann_a = ma.ann_a
         |    AND mb.ann_b = ma.ann_b AND mb.lab = ma.lab
         |  GROUP BY 1, 2)
         |SELECT g.ann_a, g.ann_b, g.n, g.agree,
         |  CAST(CASE WHEN g.n * g.n = p.pe THEN NULL
         |    ELSE ((g.agree * g.n - p.pe) * 10000)
         |         // (g.n * g.n - p.pe) END AS BIGINT) AS kappa_x10000
         |FROM agg g JOIN pe p
         |  ON p.ann_a = g.ann_a AND p.ann_b = g.ann_b
         |ORDER BY g.ann_a, g.ann_b""".stripMargin) { (s, d) =>
      graft.ext.Eval.cohenKappa(annotationPanel(s, d, withRotator = true))
    }.sortedBy(col("ann_a"), col("ann_b")),

    // Fleiss' κ over the SAME 4-annotator panel (generalized to the
    // varying rater count a3's abstentions create: r_i ∈ {3,4}, so the
    // oracle's generation-time L = lcm(6,12) = 12; the engine derives L
    // from data — the output columns are L-invariant by construction).
    // All cross-multiplications HUGEINT/DECIMAL(38,0); the rotating
    // annotator keeps overall agreement below chance territory.
    QueryDef("t_fleiss_kappa",
      s"""WITH ann AS (
         |  SELECT doc_id AS item_id, 'a1' AS annotator, lang AS label
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a2',
         |    CASE WHEN doc_id % 4 = 0 THEN 'xx' ELSE lang END
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a3',
         |    CASE WHEN doc_id % 5 = 0 THEN NULL
         |         WHEN doc_id % 3 = 0 THEN 'yy' ELSE lang END
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a4',
         |    CASE lang WHEN 'en' THEN 'zh' WHEN 'zh' THEN 'es'
         |      WHEN 'es' THEN 'de' WHEN 'de' THEN 'fr' ELSE 'en' END
         |    FROM documents WHERE lang IS NOT NULL),
         |cells AS (SELECT item_id, label, CAST(count(*) AS BIGINT) AS nij
         |  FROM ann WHERE label IS NOT NULL GROUP BY 1, 2),
         |items AS (SELECT item_id, CAST(sum(nij) AS BIGINT) AS ri,
         |    CAST(sum(nij * nij) AS BIGINT) AS sq
         |  FROM cells GROUP BY 1 HAVING sum(nij) >= 2),
         |iagg AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
         |    CAST(sum((sq - ri) * (12 // (ri * (ri - 1)))) AS BIGINT) AS s
         |  FROM items),
         |cats AS (SELECT label, CAST(sum(nij) AS BIGINT) AS cj FROM cells
         |  WHERE item_id IN (SELECT item_id FROM items) GROUP BY 1),
         |cagg AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
         |    CAST(coalesce(sum(cj), 0) AS BIGINT) AS n_ratings,
         |    CAST(sum(cj * cj) AS BIGINT) AS q FROM cats)
         |SELECT i.n_items, c.n_ratings, c.n_categories,
         |  CAST(CASE WHEN i.n_items > 0 THEN
         |    (i.s::HUGEINT * 1000000) // (12::HUGEINT * i.n_items)
         |  END AS BIGINT) AS p_bar_x106,
         |  CAST(CASE WHEN c.n_ratings > 0 THEN
         |    (c.q::HUGEINT * 1000000)
         |      // (c.n_ratings::HUGEINT * c.n_ratings)
         |  END AS BIGINT) AS p_e_x106,
         |  CAST(CASE WHEN i.n_items > 0
         |      AND c.n_ratings::HUGEINT * c.n_ratings <> c.q::HUGEINT THEN
         |    ((i.s::HUGEINT * c.n_ratings * c.n_ratings
         |        - 12::HUGEINT * i.n_items * c.q) * 10000)
         |      // (12::HUGEINT * i.n_items
         |         * (c.n_ratings::HUGEINT * c.n_ratings - c.q))
         |  END AS BIGINT) AS kappa_x10000
         |FROM iagg i CROSS JOIN cagg c""".stripMargin) { (s, d) =>
      graft.ext.Eval.fleissKappa(annotationPanel(s, d, withRotator = true))
    },

    // Krippendorff's α (nominal) over the same panel — the
    // missing-data agreement coefficient: a3's abstentions are simply
    // absent pairs (r_u ∈ {3,4} → generation-time L = lcm(2,3) = 6;
    // outputs L-invariant). The disagreeing-pair collapse
    // r² − Σ n_c² and the unweighted coincidence totals make the law
    // three integers; everything HUGEINT/DECIMAL(38,0).
    QueryDef("t_krippendorff_alpha",
      s"""WITH ann AS (
         |  SELECT doc_id AS item_id, 'a1' AS annotator, lang AS label
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a2',
         |    CASE WHEN doc_id % 4 = 0 THEN 'xx' ELSE lang END
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a3',
         |    CASE WHEN doc_id % 5 = 0 THEN NULL
         |         WHEN doc_id % 3 = 0 THEN 'yy' ELSE lang END
         |    FROM documents WHERE lang IS NOT NULL
         |  UNION ALL SELECT doc_id, 'a4',
         |    CASE lang WHEN 'en' THEN 'zh' WHEN 'zh' THEN 'es'
         |      WHEN 'es' THEN 'de' WHEN 'de' THEN 'fr' ELSE 'en' END
         |    FROM documents WHERE lang IS NOT NULL),
         |cells AS (SELECT item_id, label, CAST(count(*) AS BIGINT) AS nij
         |  FROM ann WHERE label IS NOT NULL GROUP BY 1, 2),
         |items AS (SELECT item_id, CAST(sum(nij) AS BIGINT) AS ri,
         |    CAST(sum(nij * nij) AS BIGINT) AS sq
         |  FROM cells GROUP BY 1 HAVING sum(nij) >= 2),
         |iagg AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
         |    CAST(sum((ri * ri - sq) * (6 // (ri - 1))) AS BIGINT) AS dop
         |  FROM items),
         |cats AS (SELECT label, CAST(sum(nij) AS BIGINT) AS cj FROM cells
         |  WHERE item_id IN (SELECT item_id FROM items) GROUP BY 1),
         |cagg AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
         |    CAST(coalesce(sum(cj), 0) AS BIGINT) AS n_ratings,
         |    CAST(sum(cj * cj) AS BIGINT) AS q FROM cats)
         |SELECT i.n_units, c.n_ratings, c.n_categories,
         |  CAST(CASE WHEN i.n_units > 0 THEN
         |    (i.dop::HUGEINT * 1000000) // (6::HUGEINT * c.n_ratings)
         |  END AS BIGINT) AS do_x106,
         |  CAST(CASE WHEN i.n_units > 0 AND c.n_ratings > 1 THEN
         |    ((c.n_ratings::HUGEINT * c.n_ratings - c.q) * 1000000)
         |      // (c.n_ratings::HUGEINT * (c.n_ratings - 1))
         |  END AS BIGINT) AS de_x106,
         |  CAST(CASE WHEN i.n_units > 0
         |      AND c.n_ratings::HUGEINT * c.n_ratings - c.q <> 0 THEN
         |    ((6::HUGEINT * (c.n_ratings::HUGEINT * c.n_ratings - c.q)
         |        - i.dop::HUGEINT * (c.n_ratings - 1)) * 10000)
         |      // (6::HUGEINT
         |         * (c.n_ratings::HUGEINT * c.n_ratings - c.q))
         |  END AS BIGINT) AS alpha_x10000
         |FROM iagg i CROSS JOIN cagg c""".stripMargin) { (s, d) =>
      graft.ext.Eval.krippendorffAlpha(
        annotationPanel(s, d, withRotator = true))
    },

    // ── Corpus BLEU-4 sufficient statistics over the planted eval
    // predictions (the t_eval_f1 fixture: perfect / truncated / padded
    // / unrelated by doc_id % 4). Clipped n-gram matches, totals and
    // ×10⁴ precisions are integer-exact; the geometric mean rides only
    // IEEE-mandated exactly-rounded ops (÷, ×, √) with the SAME
    // parenthesization both sides, so the double is bit-identical. The
    // exp-based brevity penalty stays out of the gated columns
    // (bp_applies discloses c < r; Eval.bleu layers the FP headline).
    QueryDef("t_eval_bleu",
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL),
         |preds AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN text
         |    WHEN 1 THEN coalesce(array_to_string(
         |      string_split(text, ' ')[1:8], ' '), '')
         |    WHEN 2 THEN text || ' EXTRA extra tokens'
         |    ELSE 'completely different words here' END AS pred
         |  FROM base),
         |np AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(pred), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM preds),
         |nr AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM base),
         |bt AS (SELECT np.doc_id,
         |    CASE WHEN np.n = '' THEN [] ELSE string_split(np.n, ' ')
         |    END AS pt,
         |    CASE WHEN nr.n = '' THEN [] ELSE string_split(nr.n, ' ')
         |    END AS rt
         |  FROM np JOIN nr ON nr.doc_id = np.doc_id),
         |lens AS (SELECT CAST(sum(len(pt)) AS BIGINT) AS pred_len,
         |    CAST(sum(len(rt)) AS BIGINT) AS ref_len FROM bt),
         |pg AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS tfp
         |  FROM (SELECT doc_id, o.n AS n,
         |      unnest(CASE WHEN len(pt) >= o.n THEN
         |        list_transform(generate_series(1, len(pt) - o.n + 1),
         |          i -> array_to_string(pt[i:i+o.n-1], ' '))
         |        ELSE [] END) AS g
         |    FROM bt CROSS JOIN (VALUES (1),(2),(3),(4)) o(n))
         |  GROUP BY 1, 2, 3),
         |rg AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS tfr
         |  FROM (SELECT doc_id, o.n AS n,
         |      unnest(CASE WHEN len(rt) >= o.n THEN
         |        list_transform(generate_series(1, len(rt) - o.n + 1),
         |          i -> array_to_string(rt[i:i+o.n-1], ' '))
         |        ELSE [] END) AS g
         |    FROM bt CROSS JOIN (VALUES (1),(2),(3),(4)) o(n))
         |  GROUP BY 1, 2, 3),
         |ov AS (SELECT n, CAST(sum(least(tfp, tfr)) AS BIGINT) AS m
         |  FROM pg JOIN rg USING (doc_id, n, g) GROUP BY 1),
         |tot AS (SELECT o.n AS n,
         |    CAST(sum(greatest(0, len(pt) - o.n + 1)) AS BIGINT) AS t
         |  FROM bt CROSS JOIN (VALUES (1),(2),(3),(4)) o(n) GROUP BY 1),
         |wide AS (SELECT
         |${(1 to 4).map(n =>
            s"""  CAST(sum(CASE WHEN t.n = $n THEN coalesce(o.m, 0) END) AS BIGINT) AS m$n,
               |  CAST(sum(CASE WHEN t.n = $n THEN t.t END) AS BIGINT) AS t$n"""
              .stripMargin).mkString(",\n")}
         |  FROM tot t LEFT JOIN ov o ON o.n = t.n)
         |SELECT l.pred_len, l.ref_len,
         |${(1 to 4).map(n =>
            s"""  m$n, t$n, CAST(CASE WHEN t$n > 0 THEN (m$n * 10000) // t$n
               |  END AS BIGINT) AS p${n}_x10000""".stripMargin).mkString(",\n")},
         |  CAST(CASE WHEN t1 > 0 AND t2 > 0 AND t3 > 0 AND t4 > 0 THEN
         |    floor(10000 * sqrt(sqrt(
         |      ((CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE))
         |        * (CAST(m2 AS DOUBLE) / CAST(t2 AS DOUBLE)))
         |      * ((CAST(m3 AS DOUBLE) / CAST(t3 AS DOUBLE))
         |        * (CAST(m4 AS DOUBLE) / CAST(t4 AS DOUBLE))))))
         |  END AS BIGINT) AS gm_x10000,
         |  l.pred_len < l.ref_len AS bp_applies
         |FROM wide CROSS JOIN lens l""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).filter(col("text").isNotNull)
      val preds = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .when(col("doc_id") % 4 === 1,
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"), lit(" EXTRA extra tokens")))
          .otherwise(lit("completely different words here")).as("pred"))
      graft.ext.Eval.bleuStats(preds,
        base.select(col("doc_id"), col("text").as("ref")))
    },

    // ── Corpus ROUGE-1/2: the recall-oriented n-gram readout over the
    // same planted predictions — per order the clipped match count,
    // pred/ref totals, and exact ×10⁴ recall/precision/F (β = 1
    // collapse), completing BLEU (precision) and ROUGE-L (subsequence).
    QueryDef("t_eval_rouge_n",
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL),
         |preds AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN text
         |    WHEN 1 THEN coalesce(array_to_string(
         |      string_split(text, ' ')[1:8], ' '), '')
         |    WHEN 2 THEN text || ' EXTRA extra tokens'
         |    ELSE 'completely different words here' END AS pred
         |  FROM base),
         |np AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(pred), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM preds),
         |nr AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM base),
         |bt AS (SELECT np.doc_id,
         |    CASE WHEN np.n = '' THEN [] ELSE string_split(np.n, ' ')
         |    END AS pt,
         |    CASE WHEN nr.n = '' THEN [] ELSE string_split(nr.n, ' ')
         |    END AS rt
         |  FROM np JOIN nr ON nr.doc_id = np.doc_id),
         |pg AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS tfp
         |  FROM (SELECT doc_id, o.n AS n,
         |      unnest(CASE WHEN len(pt) >= o.n THEN
         |        list_transform(generate_series(1, len(pt) - o.n + 1),
         |          i -> array_to_string(pt[i:i+o.n-1], ' '))
         |        ELSE [] END) AS g
         |    FROM bt CROSS JOIN (VALUES (1),(2)) o(n))
         |  GROUP BY 1, 2, 3),
         |rg AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS tfr
         |  FROM (SELECT doc_id, o.n AS n,
         |      unnest(CASE WHEN len(rt) >= o.n THEN
         |        list_transform(generate_series(1, len(rt) - o.n + 1),
         |          i -> array_to_string(rt[i:i+o.n-1], ' '))
         |        ELSE [] END) AS g
         |    FROM bt CROSS JOIN (VALUES (1),(2)) o(n))
         |  GROUP BY 1, 2, 3),
         |ov AS (SELECT n, CAST(sum(least(tfp, tfr)) AS BIGINT) AS m
         |  FROM pg JOIN rg USING (doc_id, n, g) GROUP BY 1),
         |tot AS (SELECT o.n AS n,
         |    CAST(sum(greatest(0, len(pt) - o.n + 1)) AS BIGINT) AS tp,
         |    CAST(sum(greatest(0, len(rt) - o.n + 1)) AS BIGINT) AS tr
         |  FROM bt CROSS JOIN (VALUES (1),(2)) o(n) GROUP BY 1),
         |wide AS (SELECT
         |${(1 to 2).map(n =>
            s"""  CAST(sum(CASE WHEN t.n = $n THEN coalesce(o.m, 0) END) AS BIGINT) AS m$n,
               |  CAST(sum(CASE WHEN t.n = $n THEN t.tp END) AS BIGINT) AS tp$n,
               |  CAST(sum(CASE WHEN t.n = $n THEN t.tr END) AS BIGINT) AS tr$n"""
              .stripMargin).mkString(",\n")}
         |  FROM tot t LEFT JOIN ov o ON o.n = t.n)
         |SELECT
         |${(1 to 2).map(n =>
            s"""  m$n, tp$n, tr$n,
               |  CAST(CASE WHEN tr$n > 0 THEN (m$n * 10000) // tr$n
               |    END AS BIGINT) AS r${n}_x10000,
               |  CAST(CASE WHEN tp$n > 0 THEN (m$n * 10000) // tp$n
               |    END AS BIGINT) AS p${n}_x10000,
               |  CAST(CASE WHEN tp$n + tr$n > 0
               |    THEN (2 * m$n * 10000) // (tp$n + tr$n)
               |    END AS BIGINT) AS f${n}_x10000""".stripMargin)
              .mkString(",\n")}
         |FROM wide""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).filter(col("text").isNotNull)
      val preds = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .when(col("doc_id") % 4 === 1,
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"), lit(" EXTRA extra tokens")))
          .otherwise(lit("completely different words here")).as("pred"))
      graft.ext.Eval.rougeN(preds,
        base.select(col("doc_id"), col("text").as("ref")))
    },

    // ── Per-domain eval report flagship: tokenF1 + ROUGE-L composed
    // per item over the planted predictions, rolled up per SOURCE —
    // the leaderboard row an eval platform renders (exact-match rate
    // ×10⁴, mean F1/ROUGE ×10² under the documented sum-div-count
    // law). One chained replay of both proven per-item CTE families.
    QueryDef("w_eval_report",
      s"""WITH RECURSIVE base AS (SELECT doc_id, source, text
         |  FROM documents WHERE text IS NOT NULL),
         |preds AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN text
         |    WHEN 1 THEN coalesce(array_to_string(
         |      string_split(text, ' ')[1:8], ' '), '')
         |    WHEN 2 THEN text || ' EXTRA extra tokens'
         |    ELSE 'completely different words here' END AS pred
         |  FROM base),
         |np AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(pred), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM preds),
         |nr AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM base),
         |tp AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(n, ' ')) AS w
         |        FROM np WHERE n <> '') GROUP BY doc_id, w),
         |tr AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(n, ' ')) AS w
         |        FROM nr WHERE n <> '') GROUP BY doc_id, w),
         |ovl AS (SELECT tp.doc_id,
         |    CAST(sum(least(tp.tf, tr.tf)) AS BIGINT) AS ov
         |  FROM tp JOIN tr ON tr.doc_id = tp.doc_id AND tr.w = tp.w
         |  GROUP BY tp.doc_id),
         |f1 AS (SELECT np.doc_id, np.n = nr.n AS em,
         |  CAST(CASE WHEN (CASE WHEN np.n = '' THEN 0
         |        ELSE len(string_split(np.n, ' ')) END)
         |      + (CASE WHEN nr.n = '' THEN 0
         |        ELSE len(string_split(nr.n, ' ')) END) = 0 THEN 100
         |    ELSE (2 * coalesce(o.ov, 0) * 100)
         |      // ((CASE WHEN np.n = '' THEN 0
         |           ELSE len(string_split(np.n, ' ')) END)
         |        + (CASE WHEN nr.n = '' THEN 0
         |           ELSE len(string_split(nr.n, ' ')) END))
         |  END AS BIGINT) AS f1_x100
         |  FROM np JOIN nr ON nr.doc_id = np.doc_id
         |  LEFT JOIN ovl o ON o.doc_id = np.doc_id),
         |rtoks AS MATERIALIZED (SELECT np.doc_id,
         |    list_slice(CASE WHEN np.n = '' THEN []
         |      ELSE string_split(np.n, ' ') END, 1, 16) AS pt,
         |    list_slice(CASE WHEN nr.n = '' THEN []
         |      ELSE string_split(nr.n, ' ') END, 1, 16) AS rt
         |  FROM np JOIN nr ON nr.doc_id = np.doc_id),
         |walk(doc_id, i, dp) AS (
         |  SELECT doc_id, 0,
         |    list_transform(range(len(rt) + 1), x -> CAST(0 AS BIGINT))
         |  FROM rtoks
         |  UNION ALL
         |  SELECT doc_id, i + 1,
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, m + 1), j -> list_max(cv[1:j])))
         |  FROM (SELECT w.doc_id, w.i AS i, len(r.rt) AS m,
         |      list_transform(range(1, len(r.rt) + 1),
         |        j2 -> greatest(w.dp[j2 + 1], w.dp[j2]
         |          + CASE WHEN r.rt[j2] = r.pt[w.i + 1]
         |                 THEN 1 ELSE 0 END)) AS cv
         |    FROM walk w JOIN rtoks r ON r.doc_id = w.doc_id
         |    WHERE w.i < len(r.pt)) q),
         |rl AS (SELECT t.doc_id,
         |  CAST(CASE WHEN len(t.pt) + len(t.rt) = 0 THEN 100
         |    ELSE (2 * f.dp[len(t.rt) + 1] * 100)
         |      // (len(t.pt) + len(t.rt)) END AS BIGINT) AS rf
         |  FROM rtoks t JOIN (SELECT w.doc_id, w.dp
         |    FROM walk w JOIN rtoks r ON r.doc_id = w.doc_id
         |    WHERE w.i = len(r.pt)) f ON f.doc_id = t.doc_id)
         |SELECT b.source, CAST(count(*) AS BIGINT) AS n_items,
         |  CAST(sum(CASE WHEN f1.em THEN 1 ELSE 0 END) AS BIGINT) AS n_em,
         |  CAST((sum(CASE WHEN f1.em THEN 1 ELSE 0 END) * 10000)
         |    // count(*) AS BIGINT) AS em_x10000,
         |  CAST(sum(f1.f1_x100) // count(*) AS BIGINT) AS f1_mean_x100,
         |  CAST(sum(rl.rf) // count(*) AS BIGINT) AS rouge_mean_x100
         |FROM f1 JOIN rl ON rl.doc_id = f1.doc_id
         |JOIN base b ON b.doc_id = f1.doc_id
         |GROUP BY b.source ORDER BY b.source""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).filter(col("text").isNotNull)
      val preds = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .when(col("doc_id") % 4 === 1,
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"), lit(" EXTRA extra tokens")))
          .otherwise(lit("completely different words here")).as("pred"))
      graft.ext.Eval.evalReport(preds,
        base.select(col("doc_id"), col("text").as("ref")),
        base.select(col("doc_id"), col("source")), maxTokens = 16)
    }.sortedBy(col("source")),

    // Corpus chrF2 over the same planted predictions — the character
    // n-gram F completing the generation-metric trio: per order 1..6
    // the β=2 F collapses to the integer form 5m/(4·tr+tp) ×10⁴, and
    // the headline is the documented mean-of-floored-orders law.
    QueryDef("t_eval_chrf",
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL),
         |preds AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN text
         |    WHEN 1 THEN coalesce(array_to_string(
         |      string_split(text, ' ')[1:8], ' '), '')
         |    WHEN 2 THEN text || ' EXTRA extra tokens'
         |    ELSE 'completely different words here' END AS pred
         |  FROM base),
         |np AS (SELECT doc_id, replace(trim(regexp_replace(regexp_replace(
         |    lower(pred), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')),
         |    ' ', '') AS t FROM preds),
         |nr AS (SELECT doc_id, replace(trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')),
         |    ' ', '') AS t FROM base),
         |bt AS (SELECT np.doc_id, np.t AS pt, nr.t AS rt
         |  FROM np JOIN nr ON nr.doc_id = np.doc_id),
         |pg AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS tfp
         |  FROM (SELECT doc_id, o.n AS n,
         |      unnest(CASE WHEN length(pt) >= o.n THEN
         |        list_transform(generate_series(1, length(pt) - o.n + 1),
         |          i -> substring(pt, i, o.n))
         |        ELSE [] END) AS g
         |    FROM bt CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6)) o(n))
         |  GROUP BY 1, 2, 3),
         |rg AS (SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS tfr
         |  FROM (SELECT doc_id, o.n AS n,
         |      unnest(CASE WHEN length(rt) >= o.n THEN
         |        list_transform(generate_series(1, length(rt) - o.n + 1),
         |          i -> substring(rt, i, o.n))
         |        ELSE [] END) AS g
         |    FROM bt CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6)) o(n))
         |  GROUP BY 1, 2, 3),
         |ov AS (SELECT n, CAST(sum(least(tfp, tfr)) AS BIGINT) AS m
         |  FROM pg JOIN rg USING (doc_id, n, g) GROUP BY 1),
         |tot AS (SELECT o.n AS n,
         |    CAST(sum(greatest(0, length(pt) - o.n + 1)) AS BIGINT) AS tp,
         |    CAST(sum(greatest(0, length(rt) - o.n + 1)) AS BIGINT) AS tr
         |  FROM bt CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6)) o(n)
         |  GROUP BY 1),
         |pern AS (SELECT t.n, CAST(coalesce(o.m, 0) AS BIGINT) AS m,
         |    t.tp, t.tr,
         |    CAST(CASE WHEN t.tp + t.tr > 0 THEN
         |      (5 * coalesce(o.m, 0) * 10000) // (4 * t.tr + t.tp)
         |    END AS BIGINT) AS f
         |  FROM tot t LEFT JOIN ov o ON o.n = t.n)
         |SELECT
         |${(1 to 6).map(n =>
            s"""  CAST(sum(CASE WHEN n = $n THEN m END) AS BIGINT) AS m$n,
               |  CAST(sum(CASE WHEN n = $n THEN tp END) AS BIGINT) AS tp$n,
               |  CAST(sum(CASE WHEN n = $n THEN tr END) AS BIGINT) AS tr$n,
               |  CAST(sum(CASE WHEN n = $n THEN f END) AS BIGINT) AS f${n}_x10000"""
              .stripMargin).mkString(",\n")},
         |  CAST(CASE WHEN count(f) > 0 THEN sum(f) // count(f)
         |  END AS BIGINT) AS chrf2_x10000
         |FROM pern""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).filter(col("text").isNotNull)
      val preds = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .when(col("doc_id") % 4 === 1,
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"), lit(" EXTRA extra tokens")))
          .otherwise(lit("completely different words here")).as("pred"))
      graft.ext.Eval.chrF(preds,
        base.select(col("doc_id"), col("text").as("ref")))
    },

    // ── Per-item ROUGE-L over the same planted predictions: the LCS
    // runs as ONE codegen'd row-local DP (graft.functions.LcsLen); the
    // oracle replays it as a recursive-CTE row carry — per pred token,
    // cvals once in a subquery, then the running-max expansion of the
    // relaxed max-of-three recurrence. Both sides capped at 16 tokens
    // (the operator's disclosed maxTokens), bounding engine DP and
    // oracle recursion alike.
    QueryDef("t_eval_rouge_l",
      s"""WITH RECURSIVE base AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL),
         |preds AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN text
         |    WHEN 1 THEN coalesce(array_to_string(
         |      string_split(text, ' ')[1:8], ' '), '')
         |    WHEN 2 THEN text || ' EXTRA extra tokens'
         |    ELSE 'completely different words here' END AS pred
         |  FROM base),
         |np AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(pred), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM preds),
         |nr AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM base),
         |rtoks AS MATERIALIZED (SELECT np.doc_id,
         |    list_slice(CASE WHEN np.n = '' THEN []
         |      ELSE string_split(np.n, ' ') END, 1, 16) AS pt,
         |    list_slice(CASE WHEN nr.n = '' THEN []
         |      ELSE string_split(nr.n, ' ') END, 1, 16) AS rt
         |  FROM np JOIN nr ON nr.doc_id = np.doc_id),
         |walk(doc_id, i, dp) AS (
         |  SELECT doc_id, 0,
         |    list_transform(range(len(rt) + 1), x -> CAST(0 AS BIGINT))
         |  FROM rtoks
         |  UNION ALL
         |  SELECT doc_id, i + 1,
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, m + 1), j -> list_max(cv[1:j])))
         |  FROM (SELECT w.doc_id, w.i AS i, len(r.rt) AS m,
         |      list_transform(range(1, len(r.rt) + 1),
         |        j2 -> greatest(w.dp[j2 + 1], w.dp[j2]
         |          + CASE WHEN r.rt[j2] = r.pt[w.i + 1]
         |                 THEN 1 ELSE 0 END)) AS cv
         |    FROM walk w JOIN rtoks r ON r.doc_id = w.doc_id
         |    WHERE w.i < len(r.pt)) q),
         |fin AS (SELECT w.doc_id, w.dp[len(r.rt) + 1] AS lcs
         |  FROM walk w JOIN rtoks r ON r.doc_id = w.doc_id
         |  WHERE w.i = len(r.pt))
         |SELECT t.doc_id, CAST(len(t.pt) AS BIGINT) AS n_pred,
         |  CAST(len(t.rt) AS BIGINT) AS n_ref,
         |  CAST(f.lcs AS BIGINT) AS lcs,
         |  CAST(CASE WHEN len(t.pt) + len(t.rt) = 0 THEN 100
         |    WHEN len(t.pt) = 0 THEN 0
         |    ELSE (f.lcs * 100) // len(t.pt) END AS BIGINT) AS p_x100,
         |  CAST(CASE WHEN len(t.pt) + len(t.rt) = 0 THEN 100
         |    WHEN len(t.rt) = 0 THEN 0
         |    ELSE (f.lcs * 100) // len(t.rt) END AS BIGINT) AS r_x100,
         |  CAST(CASE WHEN len(t.pt) + len(t.rt) = 0 THEN 100
         |    ELSE (2 * f.lcs * 100) // (len(t.pt) + len(t.rt))
         |  END AS BIGINT) AS f_x100
         |FROM rtoks t JOIN fin f ON f.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).filter(col("text").isNotNull)
      val preds = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .when(col("doc_id") % 4 === 1,
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"), lit(" EXTRA extra tokens")))
          .otherwise(lit("completely different words here")).as("pred"))
      graft.ext.Eval.rougeL(preds,
        base.select(col("doc_id"), col("text").as("ref")), maxTokens = 16)
    }.sortedBy(col("doc_id")),

    // ── Per-column table profile (the data-quality audit row DESCRIBE
    // can't give): one multi-distinct aggregation over one scan; the
    // oracle replays every count exactly, with the dtype labels pinned
    // to the engine's schema rendering.
    QueryDef("t_table_profile",
      s"""WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(doc_id) AS BIGINT) AS nn0,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS nd0,
         |  CAST(count(text) AS BIGINT) AS nn1,
         |  CAST(count(DISTINCT text) AS BIGINT) AS nd1,
         |  CAST(count(lang) AS BIGINT) AS nn2,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS nd2,
         |  CAST(count(source) AS BIGINT) AS nn3,
         |  CAST(count(DISTINCT source) AS BIGINT) AS nd3,
         |  CAST(count(n_chars) AS BIGINT) AS nn4,
         |  CAST(count(DISTINCT n_chars) AS BIGINT) AS nd4
         | FROM documents)
         |SELECT * FROM (
         |  SELECT 'doc_id' AS "column", 'bigint' AS dtype, n,
         |    nn0 AS n_nonnull, n - nn0 AS n_null, nd0 AS n_distinct FROM s
         |  UNION ALL SELECT 'text', 'string', n, nn1, n - nn1, nd1 FROM s
         |  UNION ALL SELECT 'lang', 'string', n, nn2, n - nn2, nd2 FROM s
         |  UNION ALL SELECT 'source', 'string', n, nn3, n - nn3, nd3 FROM s
         |  UNION ALL SELECT 'n_chars', 'bigint', n, nn4, n - nn4, nd4 FROM s)
         |ORDER BY "column"""".stripMargin) { (s, d) =>
      graft.meta.Describe.profileTable(Tables.documents(s, d))
    }.sortedBy(col("column")),

    QueryDef("t_text_stats",
      s"""WITH tok AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
         |base AS (
         |  SELECT doc_id,
         |         CAST(length(text) AS BIGINT) AS n_chars,
         |         CAST(len(w) AS BIGINT) AS n_tokens,
         |         CAST(list_sum(list_transform(w, t -> length(t))) AS BIGINT) AS token_chars,
         |         CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
         |         CAST(len(list_filter(w,
         |              t -> list_contains($stopwordList, t))) AS BIGINT) AS n_stopwords,
         |         CAST(len(${gramListExpr("w")}) AS BIGINT) AS n_2grams,
         |         CAST(${maxGramExpr(gramListExpr("w"))} AS BIGINT) AS max_2gram_count,
         |         ${polyhash("text")} AS fingerprint
         |  FROM tok)
         |SELECT doc_id, n_chars, n_tokens, token_chars, n_punct, n_stopwords,
         |       CASE WHEN n_stopwords * 1000 >= n_tokens * 30
         |            THEN 'en' ELSE 'und' END AS lang_id,
         |       $qualityExpr AS quality
         |FROM base ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.stats(Tables.documents(s, d))
        .withColumn("n_chars", col("n_chars").cast("long"))
        .select("doc_id", "n_chars", "n_tokens", "token_chars", "n_punct",
          "n_stopwords", "lang_id", "quality", "fingerprint")
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          col("token_chars"), col("n_punct"), col("n_stopwords"),
          col("lang_id"), col("quality"))
    }.sortedBy(col("doc_id")),

    // BPE-ish token counting next to whitespace counting (both engines
    // run the identical lookaround-free pattern).
    QueryDef("t_token_bpe",
      s"""SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '${TextAnalysis.BpePattern.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens,
         |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws_tokens"))
    }.sortedBy(col("doc_id")),

    // Real-vocabulary token counting: greedy longest-match against the
    // shared TextAnalysis.Vocab over BpePattern pre-tokens. The oracle
    // replays the greedy rule as a recursive CTE whose step width is the
    // longest matching vocab entry at the cursor (else 1 = unknown
    // char) — the vocabulary VALUES list is generated from the same
    // Scala constant the native expression embeds.
    QueryDef("t_token_vocab", {
      val vocabRows = TextAnalysis.Vocab
        .map(v => s"('${v.replace("'", "''")}')").mkString(", ")
      val pat = TextAnalysis.BpePattern.replace("'", "''")
      s"""WITH RECURSIVE vocab(tok) AS (VALUES $vocabRows),
         |pts AS (
         |  SELECT doc_id, x.i AS i, x.pt AS pt
         |  FROM (SELECT doc_id,
         |          unnest(list_transform(regexp_extract_all(text, '$pat'),
         |                 (y, ii) -> struct_pack(pt := y, i := ii))) AS x
         |        FROM documents) s),
         |walk(doc_id, i, pos, cnt) AS (
         |  SELECT doc_id, i, 1, 0 FROM pts
         |  UNION ALL
         |  SELECT w.doc_id, w.i,
         |         w.pos + coalesce((SELECT max(length(v.tok)) FROM vocab v
         |                           WHERE substring(p.pt, w.pos, length(v.tok)) = v.tok), 1),
         |         w.cnt + 1
         |  FROM walk w JOIN pts p ON p.doc_id = w.doc_id AND p.i = w.i
         |  WHERE w.pos <= length(p.pt)),
         |per_pt AS (SELECT doc_id, i, max(cnt) AS n FROM walk GROUP BY doc_id, i)
         |SELECT d.doc_id, CAST(coalesce(sum(p.n), 0) AS BIGINT) AS n_vocab_tokens
         |FROM documents d LEFT JOIN per_pt p ON p.doc_id = d.doc_id
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
    }) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(TextAnalysis.vocabTokenCount(col("text")), lit(0L))
          .as("n_vocab_tokens"))
    }.sortedBy(col("doc_id")),

    // TRUE merge-based BPE (the GPT-2 inference loop): rank-ordered
    // pair merges over BpePattern pre-tokens, one native codegen'd
    // expression (graft.functions.BpeMergeTokens). The oracle replays
    // the merge table IN RANK ORDER as a recursive CTE over a
    // chr(1)-delimited symbol string — sound because the table is
    // well-formed (constructor-checked: each side is a single char or
    // an earlier merge's output, so merge k never creates a pair ranked
    // <= k and the min-rank loop degenerates to rank-order replay) —
    // iterating replace() to fixpoint within a rank (adjacent
    // occurrences share a delimiter, so one replace() can miss the
    // next; no merge has equal sides, so occurrences never overlap and
    // the fixpoint equals the engine's left-to-right pass). The merge
    // VALUES are generated from the same Scala constant the expression
    // embeds. Compares the FULL tokenization (delimiter-joined), not
    // just counts.
    QueryDef("t_token_bpe_merges", {
      val mergeRows = TextAnalysis.Merges.zipWithIndex
        .map { case ((a, b), i) =>
          s"($i, '${a.replace("'", "''")}', '${b.replace("'", "''")}')" }
        .mkString(", ")
      val nMerges = TextAnalysis.Merges.size
      val pat = TextAnalysis.BpePattern.replace("'", "''")
      val anyChar = "[\\s\\S]"
      s"""WITH RECURSIVE merges(rank, a, b) AS (VALUES $mergeRows),
         |pts AS (
         |  SELECT doc_id, x.i AS i, x.pt AS pt
         |  FROM (SELECT doc_id,
         |          unnest(list_transform(regexp_extract_all(text, '$pat'),
         |                 (y, ii) -> struct_pack(pt := y, i := ii))) AS x
         |        FROM documents) s),
         |walk(doc_id, i, s, rank) AS (
         |  SELECT doc_id, i,
         |         chr(1) || array_to_string(regexp_extract_all(pt, '$anyChar'), chr(1)) || chr(1),
         |         0
         |  FROM pts
         |  UNION ALL
         |  SELECT doc_id, i, new_s,
         |         CASE WHEN new_s = s THEN rank + 1 ELSE rank END
         |  FROM (SELECT w.doc_id, w.i, w.s, w.rank,
         |               replace(w.s, chr(1) || m.a || chr(1) || m.b || chr(1),
         |                            chr(1) || m.a || m.b || chr(1)) AS new_s
         |        FROM walk w JOIN merges m ON m.rank = w.rank
         |        WHERE w.rank < $nMerges) t),
         |fin AS (SELECT doc_id, i, trim(s, chr(1)) AS toks
         |        FROM walk WHERE rank = $nMerges),
         |per_doc AS (
         |  SELECT doc_id,
         |         string_agg(toks, chr(1) ORDER BY i) AS merge_tokens,
         |         CAST(sum(len(string_split(toks, chr(1)))) AS BIGINT) AS n_merge_tokens
         |  FROM fin GROUP BY doc_id)
         |SELECT d.doc_id,
         |       coalesce(p.merge_tokens, '') AS merge_tokens,
         |       CAST(coalesce(p.n_merge_tokens, 0) AS BIGINT) AS n_merge_tokens
         |FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, d) =>
      val toks = TextAnalysis.bpeMergeTokens(col("text"))
      Tables.documents(s, d).select(col("doc_id"),
        coalesce(array_join(toks, "\u0001"), lit("")).as("merge_tokens"),
        coalesce(TextAnalysis.bpeMergeTokenCount(col("text")), lit(0L))
          .as("n_merge_tokens"))
    }.sortedBy(col("doc_id")),

    // BPE tokenizer TRAINING: learn the merge table from the corpus
    // (weighted distinct pre-tokens, iterative argmax pair). The oracle
    // unrolls the same loop into chained CTE stages (see bpeTrainCtes)
    // and must produce the identical (rank, lhs, rhs, count) table.
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

    // ── Dedup family ───────────────────────────────────────────────
    QueryDef("t_dedup_exact",
      """SELECT text AS dedup_key, min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin) { (s, d) =>
      Dedup.exactByKey(Tables.documents(s, d), col("text"), "doc_id")
    }.sortedBy(col("keep_id")),

    QueryDef("t_minhash_sig",
      s"""WITH $hashesCte, $sigCte
         |SELECT doc_id, array_to_string(sig, ',') AS sig_str
         |FROM sig ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.features(Tables.documents(s, d))
        .select(col("doc_id"),
          array_join(transform(col("sig"), _.cast("string")), ",").as("sig_str"))
    }.sortedBy(col("doc_id")),

    QueryDef("t_simhash",
      s"""WITH $hashesCte
         |SELECT doc_id, CAST($simhashExpr AS BIGINT) AS simhash
         |FROM hashes ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.features(Tables.documents(s, d))
        .select(col("doc_id"), col("simhash"))
    }.sortedBy(col("doc_id")),

    // LSH-banded near-dup candidates with exact-Jaccard verification —
    // the FULL hot-bucket-guarded pipeline replayed: exact-collapse,
    // capped rep-level band candidates, verification on reps, then the
    // exact expansion back to member pairs (cross-group pairs inherit
    // the rep pair's inter/uni; intra-group pairs have inter = uni =
    // |hash set|). Candidate generation is a band-key equi-join, NOT an
    // n² product, and the cap is part of the verified contract.
    QueryDef("t_dedup_near",
      s"""WITH $hashesCte, $sigCte,
         |$repCollapseCtes,
         |${bandCandidatesCte()},
         |rpairs AS (
         |  SELECT doc_a, doc_b,
         |         len(list_intersect(ha.hs, hb.hs)) AS inter,
         |         len(ha.hs) + len(hb.hs)
         |           - len(list_intersect(ha.hs, hb.hs)) AS uni
         |  FROM cand
         |  JOIN hashes ha ON ha.doc_id = cand.doc_a
         |  JOIN hashes hb ON hb.doc_id = cand.doc_b),
         |pairs AS (
         |  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
         |         greatest(ma.doc_id, mb.doc_id) AS doc_b, p.inter, p.uni
         |  FROM rpairs p
         |  JOIN mem ma ON ma.rep = p.doc_a
         |  JOIN mem mb ON mb.rep = p.doc_b
         |  UNION ALL
         |  SELECT ma.doc_id, mb.doc_id, len(h.hs), len(h.hs)
         |  FROM mem ma JOIN mem mb ON ma.rep = mb.rep AND ma.doc_id < mb.doc_id
         |  JOIN hashes h ON h.doc_id = ma.rep)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
         |       CAST(uni AS BIGINT) AS uni
         |FROM pairs ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      Dedup.nearDupPairs(Tables.documents(s, d))
    }.sortedBy(col("doc_a"), col("doc_b")),

    // ── LSH config recall audit: on a deterministic 25% key-hash
    // sample, the banding layout's candidates vs exact df-capped
    // inverted-index ground truth at J ≥ 1/2 — recall says what the
    // 4×2 banding + hot-bucket cap MISS, precision what the band join
    // wastes. The dedup config's own eval row, replayed end-to-end.
    QueryDef("t_lsh_recall_audit", {
      val jNum = 1; val jDen = 2
      def jcut(rel: String) =
        s"""(SELECT doc_a, doc_b FROM (
           |    SELECT c.doc_a, c.doc_b,
           |      len(list_intersect(ha.hs, hb.hs)) AS inter,
           |      len(ha.hs) + len(hb.hs)
           |        - len(list_intersect(ha.hs, hb.hs)) AS uni
           |    FROM $rel c
           |    JOIN lahashes ha ON ha.doc_id = c.doc_a
           |    JOIN lahashes hb ON hb.doc_id = c.doc_b)
           |  WHERE inter * $jDen >= uni * $jNum)""".stripMargin
      s"""WITH samp AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL
         |    AND ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 < 2500),
         |${hashesCteFrom("samp", "la")},
         |lasig AS (SELECT doc_id,
         |  [${minhashExprs.mkString(",\n  ")}] AS sig FROM lahashes),
         |lapost AS (SELECT doc_id, unnest(hs) AS h FROM lahashes),
         |ladf AS (SELECT doc_id, h FROM (
         |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df
         |    FROM lapost)
         |  WHERE df <= 200),
         |latc AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM ladf l JOIN ladf r ON l.h = r.h AND l.doc_id < r.doc_id),
         |latruth AS ${jcut("latc")},
         |labands AS (SELECT s.doc_id, b.band,
         |    CAST(sig[b.band * 2 + 1] AS VARCHAR) || '_' ||
         |    CAST(sig[b.band * 2 + 2] AS VARCHAR) AS bkey
         |  FROM lasig s CROSS JOIN (VALUES (0), (1), (2), (3)) b(band)
         |  QUALIFY count(*) OVER (PARTITION BY b.band, bkey)
         |    <= ${Dedup.DefaultMaxBucketWidth}),
         |lacand AS (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM labands l JOIN labands r
         |    ON l.band = r.band AND l.bkey = r.bkey
         |    AND l.doc_id < r.doc_id),
         |laver AS ${jcut("lacand")},
         |lahit AS (SELECT t.doc_a, t.doc_b FROM latruth t
         |  JOIN lacand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
         |SELECT n_sampled, n_truth_pairs, n_candidates, n_verified,
         |  n_hits,
         |  CAST(CASE WHEN n_truth_pairs > 0
         |    THEN (n_hits * 10000) // n_truth_pairs END AS BIGINT)
         |    AS recall_x10000,
         |  CAST(CASE WHEN n_candidates > 0
         |    THEN (n_verified * 10000) // n_candidates END AS BIGINT)
         |    AS precision_x10000
         |FROM (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM lahashes) AS n_sampled,
         |  (SELECT CAST(count(*) AS BIGINT) FROM latruth) AS n_truth_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM lacand) AS n_candidates,
         |  (SELECT CAST(count(*) AS BIGINT) FROM laver) AS n_verified,
         |  (SELECT CAST(count(*) AS BIGINT) FROM lahit) AS n_hits)""".stripMargin
    }) { (s, d) =>
      Dedup.lshRecallAudit(Tables.documents(s, d))
    },

    // ── SimHash config recall audit: the Hamming-ball analog — on the
    // same 25% sample, the production (60-bit, 6-block, radius-3)
    // member pairs vs the exact df-capped Jaccard ground truth at
    // J ≥ 1/2. The block-combination join is ball-complete by
    // construction, so recall measures the SEMANTIC gap (does
    // signature proximity track Jaccard at this radius), precision
    // what the Hamming ball admits below the cut.
    QueryDef("t_simhash_recall_audit", {
      val jNum = 1; val jDen = 2
      def jcut(rel: String) =
        s"""(SELECT doc_a, doc_b FROM (
           |    SELECT c.doc_a, c.doc_b,
           |      len(list_intersect(ha.hs, hb.hs)) AS inter,
           |      len(ha.hs) + len(hb.hs)
           |        - len(list_intersect(ha.hs, hb.hs)) AS uni
           |    FROM $rel c
           |    JOIN sahashes ha ON ha.doc_id = c.doc_a
           |    JOIN sahashes hb ON hb.doc_id = c.doc_b)
           |  WHERE inter * $jDen >= uni * $jNum)""".stripMargin
      s"""WITH samp AS (SELECT doc_id, text FROM documents
         |  WHERE text IS NOT NULL
         |    AND ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 < 2500),
         |${hashesCteFrom("samp", "sa")},
         |sapost AS (SELECT doc_id, unnest(hs) AS h FROM sahashes),
         |sadf AS (SELECT doc_id, h FROM (
         |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df
         |    FROM sapost)
         |  WHERE df <= 200),
         |satc AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM sadf l JOIN sadf r ON l.h = r.h AND l.doc_id < r.doc_id),
         |satruth AS ${jcut("satc")},
         |ssims AS (SELECT doc_id,
         |  CAST(${simhashExprBits(60)} AS BIGINT) AS sim FROM sahashes),
         |ssgrp AS (SELECT sim, min(doc_id) AS rep FROM ssims
         |          WHERE sim IS NOT NULL GROUP BY sim),
         |ssmem AS (SELECT s.doc_id, coalesce(g.rep, s.doc_id) AS rep,
         |            s.sim
         |          FROM ssims s LEFT JOIN ssgrp g ON s.sim = g.sim),
         |ssbands AS (
         |  SELECT g.rep AS doc_id, c.band,
         |         ${simhashComboKeyExpr("g.sim", 10, 3)} AS bkey
         |  FROM ssgrp g CROSS JOIN (VALUES
         |    ${simhashComboValues(6, 3)}) c(band, b0, b1, b2)
         |  QUALIFY count(*) OVER (PARTITION BY c.band, bkey)
         |    <= ${Dedup.DefaultMaxBucketWidth}),
         |sscand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM ssbands a JOIN ssbands b
         |    ON a.band = b.band AND a.bkey = b.bkey
         |    AND a.doc_id < b.doc_id),
         |ssr AS (SELECT c.doc_a, c.doc_b
         |  FROM sscand c
         |  JOIN ssims s1 ON s1.doc_id = c.doc_a
         |  JOIN ssims s2 ON s2.doc_id = c.doc_b
         |  WHERE bit_count(xor(s1.sim, s2.sim)) <= 3),
         |sspairs AS (
         |  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
         |         greatest(ma.doc_id, mb.doc_id) AS doc_b
         |  FROM ssr p
         |  JOIN ssmem ma ON ma.rep = p.doc_a
         |  JOIN ssmem mb ON mb.rep = p.doc_b
         |  UNION ALL
         |  SELECT ma.doc_id, mb.doc_id
         |  FROM ssmem ma JOIN ssmem mb
         |    ON ma.rep = mb.rep AND ma.doc_id < mb.doc_id
         |  WHERE ma.sim IS NOT NULL),
         |ssver AS ${jcut("sspairs")},
         |sshit AS (SELECT t.doc_a, t.doc_b FROM satruth t
         |  JOIN sspairs c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
         |SELECT n_sampled, n_truth_pairs, n_candidates, n_verified,
         |  n_hits,
         |  CAST(CASE WHEN n_truth_pairs > 0
         |    THEN (n_hits * 10000) // n_truth_pairs END AS BIGINT)
         |    AS recall_x10000,
         |  CAST(CASE WHEN n_candidates > 0
         |    THEN (n_verified * 10000) // n_candidates END AS BIGINT)
         |    AS precision_x10000
         |FROM (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM sahashes) AS n_sampled,
         |  (SELECT CAST(count(*) AS BIGINT) FROM satruth) AS n_truth_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM sspairs) AS n_candidates,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ssver) AS n_verified,
         |  (SELECT CAST(count(*) AS BIGINT) FROM sshit) AS n_hits)""".stripMargin
    }) { (s, d) =>
      Dedup.simhashRecallAudit(Tables.documents(s, d))
    },

    // ── Embedding-LSH recall audit: third member of the audit family
    // — on the same deterministic 25% sample, the production
    // (8-table, 7-plane) random-hyperplane member pairs vs EXACT
    // all-pairs cosine truth at 0.25. Candidates replay the full
    // production plan (collapse, cap, expansion) with no cosine cut;
    // the verified count applies the real threshold.
    QueryDef("t_embed_recall_audit",
      s"""WITH esamp AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE embedding IS NOT NULL
         |    AND ${polyhash("CAST(vec_id AS VARCHAR)")} % 10000 < 2500),
         |${lshBucketsCte(tables = 8, planes = 7, dims = 64, rel = "esamp")},
         |etruth AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM esamp a JOIN esamp b ON a.vec_id < b.vec_id
         |  WHERE round(${cosine("a.embedding", "b.embedding")}, 6)
         |    >= 0.25),
         |evgrp AS (SELECT embedding AS emb, min(vec_id) AS rep
         |          FROM esamp GROUP BY embedding),
         |evmem AS (SELECT e.vec_id, g.rep FROM esamp e
         |          JOIN evgrp g ON e.embedding = g.emb),
         |erbuckets AS (
         |  SELECT b.vec_id, b.tbl, b.bucket
         |  FROM buckets b JOIN evgrp g ON g.rep = b.vec_id
         |  QUALIFY count(*) OVER (PARTITION BY b.tbl, b.bucket)
         |          <= ${Dedup.DefaultMaxBucketWidth}),
         |ercand AS (
         |  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
         |  FROM erbuckets l JOIN erbuckets r
         |    ON l.tbl = r.tbl AND l.bucket = r.bucket
         |    AND l.vec_id < r.vec_id),
         |erscored AS (
         |  SELECT c.id_a, c.id_b,
         |         round(${cosine("a.embedding", "b.embedding")}, 6) AS cos
         |  FROM ercand c
         |  JOIN esamp a ON a.vec_id = c.id_a
         |  JOIN esamp b ON b.vec_id = c.id_b),
         |eself AS (
         |  SELECT g.rep, round(${cosine("e.embedding", "e.embedding")}, 6)
         |    AS cos
         |  FROM evgrp g JOIN esamp e ON e.vec_id = g.rep),
         |ecand AS (
         |  SELECT least(ma.vec_id, mb.vec_id) AS id_a,
         |         greatest(ma.vec_id, mb.vec_id) AS id_b, p.cos
         |  FROM erscored p
         |  JOIN evmem ma ON ma.rep = p.id_a
         |  JOIN evmem mb ON mb.rep = p.id_b
         |  UNION ALL
         |  SELECT ma.vec_id, mb.vec_id, s.cos
         |  FROM evmem ma JOIN evmem mb
         |    ON ma.rep = mb.rep AND ma.vec_id < mb.vec_id
         |  JOIN eself s ON s.rep = ma.rep),
         |ever AS (SELECT id_a, id_b FROM ecand WHERE cos >= 0.25),
         |ehit AS (SELECT t.id_a, t.id_b FROM etruth t
         |  JOIN ecand c ON c.id_a = t.id_a AND c.id_b = t.id_b)
         |SELECT n_sampled, n_truth_pairs, n_candidates, n_verified,
         |  n_hits,
         |  CAST(CASE WHEN n_truth_pairs > 0
         |    THEN (n_hits * 10000) // n_truth_pairs END AS BIGINT)
         |    AS recall_x10000,
         |  CAST(CASE WHEN n_candidates > 0
         |    THEN (n_verified * 10000) // n_candidates END AS BIGINT)
         |    AS precision_x10000
         |FROM (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM esamp) AS n_sampled,
         |  (SELECT CAST(count(*) AS BIGINT) FROM etruth) AS n_truth_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ecand) AS n_candidates,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ever) AS n_verified,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ehit) AS n_hits)""".stripMargin) {
      (s, d) =>
      Similarity.embeddingRecallAudit(Tables.embeddings(s, d))
    },

    // ── Normalization + normalization-robust dedup ─────────────────
    // Canonical lowercase/strip-punct/collapse-space normalization
    // (the C4/RefinedWeb preprocessing), then exact grouping over the
    // normalized form. Re-serialized variants are PLANTED in SQL on
    // both sides (upper-cased text + punctuation tail for doc_id < 20
    // under shifted ids) so the grouping provably collapses what
    // byte-exact dedup misses.
    // Mojibake repair: UTF-8-as-Latin-1 artifacts PLANTED in SQL on
    // both sides (every 7th doc gains smart-quote/accent mojibake)
    // must repair to the intended characters; clean docs untouched.
    QueryDef("t_fix_mojibake", {
      // the NBSP artifact is Â + a REAL U+00A0 (r16 advice fix): the
      // char after Â below is 0xC2 0xA0, not an ASCII space
      val nbsp = "Â "
      val planted =
        s"""CASE WHEN doc_id % 7 = 0
           |  THEN text || ' cafÃ© â€œquotedâ€™ naÃ¯ve A${nbsp}B' END""".stripMargin
      val chain = TextAnalysis.MojibakePairs.foldLeft(
        "coalesce(p.planted, p.text)") { case (inner, (pat, rep)) =>
        s"replace($inner, '${pat.replace("'", "''")}', " +
          s"'${rep.replace("'", "''")}')"
      }
      s"""WITH p AS (SELECT doc_id, text, $planted AS planted
         |           FROM documents)
         |SELECT doc_id, $chain AS text FROM p
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"),
        coalesce(when(col("doc_id") % 7 === 0,
            concat(col("text"),
              lit(" cafÃ© â€œquotedâ€™ naÃ¯ve AÂ B"))),
          col("text")).as("text"))
      planted.select(col("doc_id"),
        TextAnalysis.fixMojibake(col("text")).as("text"))
    }.sortedBy(col("doc_id")),

    QueryDef("t_normalize_text",
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.normalizeText(col("text")).as("norm_text"))
    }.sortedBy(col("doc_id")),

    // ── Weighted-lexicon safety screen (C4 blocklist / Dolma list
    // layer): a severity-graded term lexicon planted as VALUES on both
    // sides; hits = the tall per-(doc, category) audit relation,
    // screen = the per-doc verdict under an integer per-mille-of-tokens
    // density budget (cross-multiplied — long docs aren't over-dropped
    // by raw counts).
    QueryDef("t_lexicon_hits",
      s"""WITH lex(term, category, weight_x100) AS (VALUES
         |    ('slow','perf',100),('merge','perf',150),
         |    ('hash','risky',250),('big','risky',50),('the','noise',10)),
         |norm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM documents WHERE text IS NOT NULL),
         |tok AS (SELECT doc_id, unnest(string_split(n, ' ')) AS w
         |  FROM norm WHERE n <> '')
         |SELECT doc_id, category, CAST(count(*) AS BIGINT) AS hits,
         |  CAST(sum(weight_x100) AS BIGINT) AS score_x100
         |FROM tok JOIN lex ON lex.term = tok.w
         |GROUP BY doc_id, category
         |ORDER BY doc_id, category""".stripMargin) { (s, d) =>
      import s.implicits._
      val lex = Seq(("slow", "perf", 100), ("merge", "perf", 150),
        ("hash", "risky", 250), ("big", "risky", 50), ("the", "noise", 10))
        .toDF("term", "category", "weight_x100")
      TextAnalysis.lexiconHits(Tables.documents(s, d), lex)
    }.sortedBy(col("doc_id"), col("category")),

    QueryDef("t_lexicon_screen",
      s"""WITH lex(term, category, weight_x100) AS (VALUES
         |    ('slow','perf',100),('merge','perf',150),
         |    ('hash','risky',250),('big','risky',50),('the','noise',10)),
         |norm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
         |  FROM documents WHERE text IS NOT NULL),
         |nt AS (SELECT doc_id, CASE WHEN n = '' THEN 0
         |    ELSE len(string_split(n, ' ')) END AS n_tokens FROM norm),
         |tok AS (SELECT doc_id, unnest(string_split(n, ' ')) AS w
         |  FROM norm WHERE n <> ''),
         |hits AS (SELECT doc_id, category,
         |    CAST(sum(weight_x100) AS BIGINT) AS score_x100
         |  FROM tok JOIN lex ON lex.term = tok.w GROUP BY doc_id, category),
         |fl AS (SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_flagged
         |  FROM hits h JOIN nt ON nt.doc_id = h.doc_id
         |  WHERE h.score_x100 * 1000 > nt.n_tokens * 2500
         |  GROUP BY h.doc_id)
         |SELECT nt.doc_id, CAST(nt.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(coalesce(fl.n_flagged, 0) AS BIGINT) AS n_flagged,
         |  coalesce(fl.n_flagged, 0) = 0 AS screen_pass
         |FROM nt LEFT JOIN fl ON fl.doc_id = nt.doc_id
         |ORDER BY nt.doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val lex = Seq(("slow", "perf", 100), ("merge", "perf", 150),
        ("hash", "risky", 250), ("big", "risky", 50), ("the", "noise", 10))
        .toDF("term", "category", "weight_x100")
      TextAnalysis.lexiconScreen(Tables.documents(s, d), lex,
        maxScoreX100PerKtok = 2500L)
    }.sortedBy(col("doc_id")),

    // ── URL canonicalization (crawl dedup-key normalizer): four URL
    // shapes planted per doc_id — mixed-case scheme/host + default port
    // + tracking params + fragment, bare default-port host, a non-URL
    // (must pass through UNCHANGED), and unsorted params with tracking
    // interleaved. The replay is the full 5-step law: fragment strip,
    // scheme/host lowering, default-port strip, '/' path, filtered +
    // sorted params.
    QueryDef("t_canonical_url",
      s"""WITH p AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN 'HTTPS://Example.COM:443/Path/' ||
         |      CAST(doc_id AS VARCHAR) || '?utm_source=x&b=2&a=1&fbclid=zz#frag'
         |    WHEN 1 THEN 'http://site.org:80'
         |    WHEN 2 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
         |    ELSE 'http://Host.net/a?ref=h&z=1&utm_campaign=c&b=' ||
         |      CAST(doc_id % 7 AS VARCHAR) END AS url
         |  FROM documents),
         |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u
         |  FROM p),
         |s2 AS (SELECT doc_id, url, u,
         |  regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme,
         |  lower(regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1)) AS host0,
         |  regexp_extract(u, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path0,
         |  regexp_extract(u, '(?s)^[^?]*\\?(.*)', 1) AS q FROM s1),
         |s3 AS (SELECT doc_id, url, scheme, lower(scheme) AS ls,
         |  CASE WHEN lower(scheme)='http'
         |         THEN regexp_replace(host0, ':80$$', '')
         |       WHEN lower(scheme)='https'
         |         THEN regexp_replace(host0, ':443$$', '')
         |       ELSE host0 END AS host,
         |  CASE WHEN path0='' THEN '/' ELSE path0 END AS path,
         |  list_sort(list_filter(string_split(q, '&'),
         |    pp -> pp <> '' AND NOT regexp_matches(pp,
         |      '^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$$'))) AS params
         |  FROM s2)
         |SELECT doc_id, url, CASE WHEN scheme='' THEN url
         |  ELSE ls || '://' || host || path ||
         |    CASE WHEN len(params) > 0
         |      THEN '?' || array_to_string(params, '&') ELSE '' END
         |  END AS canon_url FROM s3
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(lit("HTTPS://Example.COM:443/Path/"),
            col("doc_id").cast("string"),
            lit("?utm_source=x&b=2&a=1&fbclid=zz#frag")))
        .when(col("doc_id") % 4 === 1, lit("http://site.org:80"))
        .when(col("doc_id") % 4 === 2,
          concat(lit("not a url "), col("doc_id").cast("string")))
        .otherwise(concat(
          lit("http://Host.net/a?ref=h&z=1&utm_campaign=c&b="),
          (col("doc_id") % 7).cast("string"))).as("url"))
      planted.select(col("doc_id"), col("url"),
        TextAnalysis.canonicalizeUrl(col("url")).as("canon_url"))
    }.sortedBy(col("doc_id")),

    // ── URL-level dedup over the same planted shapes: every %4=1 doc
    // canonicalizes to the SAME 'http://site.org/' (only the smallest
    // doc_id keeps), the Host.net variants collide within their
    // doc_id%7 class — the cross-snapshot crawl dedup byte-exact URL
    // keys miss entirely.
    QueryDef("t_url_dedup",
      s"""WITH p AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
         |    WHEN 0 THEN 'HTTPS://Example.COM:443/Path/' ||
         |      CAST(doc_id AS VARCHAR) || '?utm_source=x&b=2&a=1&fbclid=zz#frag'
         |    WHEN 1 THEN 'http://site.org:80'
         |    WHEN 2 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
         |    ELSE 'http://Host.net/a?ref=h&z=1&utm_campaign=c&b=' ||
         |      CAST(doc_id % 7 AS VARCHAR) END AS url
         |  FROM documents),
         |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u
         |  FROM p),
         |s2 AS (SELECT doc_id, url, u,
         |  regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme,
         |  lower(regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1)) AS host0,
         |  regexp_extract(u, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path0,
         |  regexp_extract(u, '(?s)^[^?]*\\?(.*)', 1) AS q FROM s1),
         |s3 AS (SELECT doc_id, url, scheme, lower(scheme) AS ls,
         |  CASE WHEN lower(scheme)='http'
         |         THEN regexp_replace(host0, ':80$$', '')
         |       WHEN lower(scheme)='https'
         |         THEN regexp_replace(host0, ':443$$', '')
         |       ELSE host0 END AS host,
         |  CASE WHEN path0='' THEN '/' ELSE path0 END AS path,
         |  list_sort(list_filter(string_split(q, '&'),
         |    pp -> pp <> '' AND NOT regexp_matches(pp,
         |      '^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$$'))) AS params
         |  FROM s2),
         |canon AS (SELECT doc_id, url, CASE WHEN scheme='' THEN url
         |  ELSE ls || '://' || host || path ||
         |    CASE WHEN len(params) > 0
         |      THEN '?' || array_to_string(params, '&') ELSE '' END
         |  END AS canon_url FROM s3),
         |f AS (SELECT canon_url, min(doc_id) AS fid FROM canon
         |  WHERE canon_url IS NOT NULL GROUP BY 1)
         |SELECT c.doc_id, c.url, c.canon_url,
         |  c.canon_url IS NULL OR c.doc_id = f.fid AS url_keep
         |FROM canon c LEFT JOIN f ON f.canon_url = c.canon_url
         |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(lit("HTTPS://Example.COM:443/Path/"),
            col("doc_id").cast("string"),
            lit("?utm_source=x&b=2&a=1&fbclid=zz#frag")))
        .when(col("doc_id") % 4 === 1, lit("http://site.org:80"))
        .when(col("doc_id") % 4 === 2,
          concat(lit("not a url "), col("doc_id").cast("string")))
        .otherwise(concat(
          lit("http://Host.net/a?ref=h&z=1&utm_campaign=c&b="),
          (col("doc_id") % 7).cast("string"))).as("url"))
      Dedup.dedupByUrl(planted)
        .select(col("doc_id"), col("url"), col("canon_url"),
          col("url_keep"))
    }.sortedBy(col("doc_id")),

    // ── Winnowing fingerprints (MOSS): 4-gram hashes, 5-hash windows,
    // rightmost-tie minimum per window, consecutive duplicates
    // collapsed. The replay is RELATIONAL (window × gram join, min per
    // window, max(i) at the min = the rightmost-tie law) against the
    // engine's row-local HOF scan — two independent formulations of
    // the same integer law.
    QueryDef("t_winnow",
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents WHERE text IS NOT NULL),
         |gr AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(1, greatest(len(w) - 3, 0)),
         |    i -> struct_pack(i := CAST(i AS BIGINT),
         |      t := array_to_string(w[i:i+3], ' ')))) AS u FROM ws),
         |g AS (SELECT doc_id, u.i AS i, ${polyhash64("u.t")} AS h FROM gr),
         |mm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m
         |  FROM g GROUP BY doc_id),
         |wins AS (SELECT doc_id, m, unnest(generate_series(1,
         |    greatest(m - 4, 1))) AS j FROM mm),
         |wg AS (SELECT wn.doc_id, wn.j, g.i, g.h
         |  FROM wins wn JOIN g ON g.doc_id = wn.doc_id
         |    AND g.i >= wn.j AND g.i <= least(wn.j + 4, wn.m)),
         |mh AS (SELECT doc_id, j, min(h) AS fp FROM wg
         |  GROUP BY doc_id, j),
         |sel AS (SELECT wg.doc_id, wg.j, max(wg.i) AS pos, mh.fp
         |  FROM wg JOIN mh ON mh.doc_id = wg.doc_id AND mh.j = wg.j
         |    AND wg.h = mh.fp
         |  GROUP BY wg.doc_id, wg.j, mh.fp)
         |SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp
         |FROM sel ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      Dedup.winnowFingerprints(Tables.documents(s, d), k = 4, w = 5)
    }.sortedBy(col("doc_id"), col("pos")),

    // ── Winnow overlap pairs (the MOSS pair report): docs 10m/10m+1
    // (m ≡ 2 mod 5) gain a shared 8-word tail — exactly w+k−1, the
    // guarantee threshold, so every planted pair MUST share a selected
    // fingerprint; incidental same-4-gram collisions across the
    // 31-word corpus vocabulary surface identically in both engines.
    QueryDef("t_winnow_pairs", {
      val sharedSql = ('a' to 'h').map(c =>
        s"' shr' || CAST(doc_id // 10 AS VARCHAR) || '$c'").mkString(" || ")
      s"""WITH p AS (SELECT doc_id,
         |    CASE WHEN doc_id % 10 <= 1 AND (doc_id // 10) % 5 = 2
         |      THEN text || $sharedSql ELSE text END AS text
         |  FROM documents WHERE text IS NOT NULL),
         |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM p),
         |gr AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(1, greatest(len(w) - 3, 0)),
         |    i -> struct_pack(i := CAST(i AS BIGINT),
         |      t := array_to_string(w[i:i+3], ' ')))) AS u FROM ws),
         |g AS (SELECT doc_id, u.i AS i, ${polyhash64("u.t")} AS h FROM gr),
         |mm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m
         |  FROM g GROUP BY doc_id),
         |wins AS (SELECT doc_id, m, unnest(generate_series(1,
         |    greatest(m - 4, 1))) AS j FROM mm),
         |wg AS (SELECT wn.doc_id, wn.j, g.i, g.h
         |  FROM wins wn JOIN g ON g.doc_id = wn.doc_id
         |    AND g.i >= wn.j AND g.i <= least(wn.j + 4, wn.m)),
         |mh AS (SELECT doc_id, j, min(h) AS fp FROM wg
         |  GROUP BY doc_id, j),
         |wf AS (SELECT DISTINCT doc_id, fp FROM mh)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS shared
         |FROM wf a JOIN wf b ON b.fp = a.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, d) =>
      val m = expr("doc_id div 10")
      val tail = concat(('a' to 'h').map(c =>
        concat(lit(" shr"), m.cast("string"), lit(c.toString))): _*)
      val planted = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 10 <= 1 && m % 5 === 2,
            concat(col("text"), tail)).otherwise(col("text")).as("text"))
      Dedup.winnowOverlap(planted, k = 4, w = 5, minShared = 1,
        maxBucket = 1 << 20)
    }.sortedBy(col("doc_a"), col("doc_b")),

    // ── Paragraph dedup over the same planted multiline fixture as
    // t_dedup_lines: the %5 docs' mirrored second paragraph collapses
    // to its first occurrence; the replay is the packed-key law at
    // blank-line granularity with a chr(10)||chr(10) rebuild.
    QueryDef("t_dedup_paragraphs",
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
         |  string_split(text, chr(10) || chr(10)) AS ls FROM mlt),
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
         |  string_agg(CASE WHEN keep THEN ct END,
         |    chr(10) || chr(10) ORDER BY cid) AS ctext
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
      Dedup.dedupParagraphs(planted)
    }.sortedBy(col("doc_id")),

    // Continuation pairs (pagination splits): docs whose first 8 words
    // equal another doc's last 8 — page-two fragments PLANTED in SQL
    // both sides (doc_id < 12 gains a continuation page under a
    // shifted id). Hash equi-join + text verify on the Spark side; the
    // oracle joins on the gram text directly (same pairs).
    QueryDef("t_continuation_pairs",
      """WITH cpb AS (SELECT doc_id, text,
        |    string_split(text, ' ') AS ws,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents WHERE text IS NOT NULL),
        |cpu AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    array_to_string(ws[n-7:n], ' ') ||
        |    ' page two continues here with fresh words'
        |  FROM cpb WHERE doc_id < 12 AND n >= 8),
        |cpk AS (SELECT doc_id,
        |    array_to_string(string_split(text, ' ')[1:8], ' ') AS head,
        |    array_to_string(string_split(text, ' ')
        |      [len(string_split(text, ' '))-7:len(string_split(text, ' '))],
        |      ' ') AS tail
        |  FROM cpu WHERE len(string_split(text, ' ')) >= 8)
        |SELECT t.doc_id AS prev_id, h.doc_id AS next_id,
        |       t.tail AS boundary_gram
        |FROM cpk t JOIN cpk h
        |  ON t.tail = h.head AND t.doc_id <> h.doc_id
        |ORDER BY prev_id, next_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val ws = split(col("text"), " ")
      val n = size(ws)
      val pages = docs
        .filter(col("text").isNotNull && col("doc_id") < 12 && n >= 8)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(concat_ws(" ", slice(ws, -8, 8)),
            lit(" page two continues here with fresh words")).as("text"))
      Dedup.continuationPairs(docs.union(pages), window = 8)
    }.sortedBy(col("prev_id"), col("next_id")),

    // Per-domain exact-dup rates: which feed ships dupes — the triage
    // number deciding where dedup effort goes.
    QueryDef("t_domain_dup_rate",
      s"""WITH ddr AS (SELECT source, ${polyhash64("text")} AS fp,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
         |  GROUP BY 1, 2)
         |SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(sum(c) - count(*) AS BIGINT) AS n_dups,
         |  CAST((CAST(sum(c) AS BIGINT) - count(*)) * 100
         |    // CAST(sum(c) AS BIGINT) AS BIGINT) AS dup_x100
         |FROM ddr GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Dedup.domainDupRates(Tables.documents(s, d))
    }.sortedBy(col("source")),

    // Doc-level mirror detection: the same text under more than one
    // source — syndication named at document granularity. Mirrors are
    // PLANTED in SQL on both sides (doc_id < 15 re-appears under a
    // shifted id with a rotated source label).
    QueryDef("t_mirror_docs",
      s"""WITH mm AS (
         |  SELECT doc_id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000,
         |         'src' || CAST((doc_id + 1) % 20 AS VARCHAR), text
         |  FROM documents WHERE doc_id < 15),
         |mg AS (SELECT ${polyhash64("text")} AS content_fp,
         |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |    CAST(count(*) AS BIGINT) AS n_copies,
         |    min(doc_id) AS keep_id
         |  FROM mm WHERE text IS NOT NULL AND source IS NOT NULL
         |  GROUP BY 1)
         |SELECT content_fp, n_sources, n_copies, keep_id FROM mg
         |WHERE n_sources > 1 ORDER BY keep_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val mirrored = docs.filter(col("doc_id") < 15)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("src"), ((col("doc_id") + 1) % 20).cast("string"))
            .as("source"),
          col("text"))
      Dedup.mirrorDocs(
        docs.select("doc_id", "source", "text").union(mirrored))
    }.sortedBy(col("keep_id")),

    QueryDef("t_dedup_normalized", {
      val norm = (e: String) =>
        s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      s"""WITH nm AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, upper(text) || ' !!'
         |  FROM documents WHERE doc_id < 20),
         |ng AS (SELECT ${polyhash64(norm("text"))} AS norm_fp,
         |         min(doc_id) AS keep_id,
         |         CAST(count(*) AS BIGINT) AS n_copies
         |       FROM nm WHERE text IS NOT NULL GROUP BY 1)
         |SELECT norm_fp, keep_id, n_copies FROM ng WHERE n_copies > 1
         |ORDER BY keep_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val variants = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text"))
      Dedup.normalizedDupGroups(
        docs.select("doc_id", "text").union(variants))
    }.sortedBy(col("keep_id")),

    // Contrastive training triplets: near-dup pairs at Jaccard >= 1/2
    // as (anchor, positive); the negative is the corpus doc at hash
    // rank polyhash(anchor:positive) mod n in the global hash order,
    // skipping forward past the pair itself — RNG-free, so both
    // engines mine identical triplets. Spark ranks via the decomposed
    // bucket-grouped prefix sum; the oracle's one global window is the
    // executable spec.
    QueryDef("t_contrastive_triplets",
      s"""WITH $hashesCte, $sigCte,
         |$repCollapseCtes,
         |${bandCandidatesCte()},
         |rpairs AS (
         |  SELECT doc_a, doc_b,
         |         len(list_intersect(ha.hs, hb.hs)) AS inter,
         |         len(ha.hs) + len(hb.hs)
         |           - len(list_intersect(ha.hs, hb.hs)) AS uni
         |  FROM cand
         |  JOIN hashes ha ON ha.doc_id = cand.doc_a
         |  JOIN hashes hb ON hb.doc_id = cand.doc_b),
         |pairs AS (
         |  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
         |         greatest(ma.doc_id, mb.doc_id) AS doc_b, p.inter, p.uni
         |  FROM rpairs p
         |  JOIN mem ma ON ma.rep = p.doc_a
         |  JOIN mem mb ON mb.rep = p.doc_b
         |  UNION ALL
         |  SELECT ma.doc_id, mb.doc_id, len(h.hs), len(h.hs)
         |  FROM mem ma JOIN mem mb ON ma.rep = mb.rep AND ma.doc_id < mb.doc_id
         |  JOIN hashes h ON h.doc_id = ma.rep),
         |strong AS (SELECT doc_a AS anchor_id, doc_b AS positive_id
         |  FROM pairs WHERE inter * 2 >= uni * 1),
         |ctrk AS (SELECT doc_id AS cand_id,
         |    CAST(row_number() OVER (ORDER BY
         |      ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000, doc_id)
         |      AS BIGINT) AS rank
         |  FROM documents),
         |ctn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |ctc AS (SELECT s.anchor_id, s.positive_id, k.k,
         |    ((${polyhash(
              "CAST(s.anchor_id AS VARCHAR) || ':' || CAST(s.positive_id AS VARCHAR)")}
         |      % ctn.n) + k.k) % ctn.n + 1 AS rank
         |  FROM strong s CROSS JOIN ctn
         |  CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)),
         |                     (CAST(2 AS BIGINT))) k(k)),
         |ctj AS (SELECT c.anchor_id, c.positive_id, c.k, r.cand_id
         |  FROM ctc c JOIN ctrk r USING (rank)
         |  WHERE r.cand_id <> c.anchor_id AND r.cand_id <> c.positive_id)
         |SELECT anchor_id, positive_id, cand_id AS negative_id
         |FROM (SELECT anchor_id, positive_id, cand_id,
         |        row_number() OVER (PARTITION BY anchor_id, positive_id
         |          ORDER BY k) AS rn FROM ctj) WHERE rn = 1
         |ORDER BY anchor_id, positive_id""".stripMargin) { (s, d) =>
      Dedup.contrastiveTriplets(Tables.documents(s, d))
    }.sortedBy(col("anchor_id"), col("positive_id")),

    // Asymmetric containment (quote/boilerplate detection): directed
    // pairs where >= 9/10 of the contained doc's kept shingle hashes
    // appear in the container. EXACT inverted-index overlap join (NOT
    // the Jaccard-tuned LSH, which misses low-Jaccard containment),
    // quadratic blowup bounded by the hot-hash guard: shingles in more
    // than 50 docs leave the universe; inter AND sizes count over the
    // kept universe so the ratio stays consistent. The oracle replays
    // the identical cut and integer cross-multiplied threshold.
    QueryDef("t_containment",
      s"""WITH $hashesCte,
         |cex AS (SELECT doc_id, unnest(hs) AS h FROM hashes
         |        WHERE hs IS NOT NULL),
         |chdf AS (SELECT h, count(*) AS hdf FROM cex GROUP BY 1),
         |ckept AS (SELECT cex.doc_id, cex.h FROM cex
         |  JOIN chdf USING (h) WHERE chdf.hdf <= 50),
         |csizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nh
         |  FROM ckept GROUP BY 1),
         |cinter AS (SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM ckept l JOIN ckept r ON l.h = r.h AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2),
         |cj AS (SELECT i.doc_a, i.doc_b, i.inter, sa.nh AS nh_a, sb.nh AS nh_b
         |  FROM cinter i
         |  JOIN csizes sa ON sa.doc_id = i.doc_a
         |  JOIN csizes sb ON sb.doc_id = i.doc_b)
         |SELECT doc_id, container_id, inter, n_grams FROM (
         |  SELECT doc_a AS doc_id, doc_b AS container_id, inter,
         |         nh_a AS n_grams
         |  FROM cj WHERE inter * 10 >= nh_a * 9
         |  UNION ALL
         |  SELECT doc_b, doc_a, inter, nh_b
         |  FROM cj WHERE inter * 10 >= nh_b * 9) u
         |ORDER BY doc_id, container_id""".stripMargin) { (s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), num = 9, den = 10,
        maxDf = 50)
    }.sortedBy(col("doc_id"), col("container_id")),

    // SimHash Hamming-ball near-dup (Manku et al., WWW'07): 60-bit
    // signature cut into 6 blocks of 10; a pair within Hamming 3 agrees
    // on >= 3 blocks, so the C(6,3) = 20 packed-combo keys find every
    // qualifying pair by equi-join. Full guarded pipeline replayed:
    // hamming-0 collapse to reps, capped combo buckets (QUALIFY), one
    // bit_count(xor) verify per candidate, exact member expansion.
    QueryDef("t_dedup_simhash",
      s"""WITH $hashesCte,
         |sims AS (SELECT doc_id,
         |  CAST(${simhashExprBits(60)} AS BIGINT) AS sim FROM hashes),
         |sgrp AS (SELECT sim, min(doc_id) AS rep FROM sims
         |         WHERE sim IS NOT NULL GROUP BY sim),
         |smem AS (SELECT s.doc_id, coalesce(g.rep, s.doc_id) AS rep, s.sim
         |         FROM sims s LEFT JOIN sgrp g ON s.sim = g.sim),
         |sbands AS (
         |  SELECT g.rep AS doc_id, c.band,
         |         ${simhashComboKeyExpr("g.sim", 10, 3)} AS bkey
         |  FROM sgrp g CROSS JOIN (VALUES
         |    ${simhashComboValues(6, 3)}) c(band, b0, b1, b2)
         |  QUALIFY count(*) OVER (PARTITION BY c.band, bkey)
         |    <= ${Dedup.DefaultMaxBucketWidth}),
         |scand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sbands a JOIN sbands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |srpairs AS (
         |  SELECT c.doc_a, c.doc_b, bit_count(xor(sa.sim, sb.sim)) AS hamming
         |  FROM scand c
         |  JOIN sims sa ON sa.doc_id = c.doc_a
         |  JOIN sims sb ON sb.doc_id = c.doc_b
         |  WHERE bit_count(xor(sa.sim, sb.sim)) <= 3),
         |spairs AS (
         |  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
         |         greatest(ma.doc_id, mb.doc_id) AS doc_b, p.hamming
         |  FROM srpairs p
         |  JOIN smem ma ON ma.rep = p.doc_a
         |  JOIN smem mb ON mb.rep = p.doc_b
         |  UNION ALL
         |  SELECT ma.doc_id, mb.doc_id, 0
         |  FROM smem ma JOIN smem mb
         |    ON ma.rep = mb.rep AND ma.doc_id < mb.doc_id
         |  WHERE ma.sim IS NOT NULL)
         |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
         |FROM spairs ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      Dedup.simhashNearDups(Tables.documents(s, d))
    }.sortedBy(col("doc_a"), col("doc_b")),

    // Near-dup clustering: candidate pairs → Jaccard ≥ 8/10 edges →
    // connected components (Spark: min-label propagation to fixpoint;
    // oracle: recursive reachability walk — both yield the component's
    // min member id). Every doc appears; singletons label themselves.
    QueryDef("t_dedup_clusters",
      s"""WITH RECURSIVE $hashesCte, $sigCte,
         |${clusterCtes("documents", jNum = 8, jDen = 10)}
         |SELECT doc_id, cluster_id FROM clusters
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.nearDupClusters(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // Same transitive closure via the ALTERNATING large-star/small-star
    // rewriting (O(log n) rounds vs O(diameter)) — both clustering
    // algorithms must land on the identical component labels, so the
    // SAME recursive-CTE oracle gates this path.
    QueryDef("t_dedup_clusters_star",
      s"""WITH RECURSIVE $hashesCte, $sigCte,
         |${clusterCtes("documents", jNum = 8, jDen = 10)}
         |SELECT doc_id, cluster_id FROM clusters
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.nearDupClustersStar(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Label propagation over the near-dup graph ──────────────────
    // Trusted lang labels (seed = every 10th doc) spread across
    // jaccard ≥ 0.8 near-dup edges in 2 synchronized sweeps: majority
    // label among labeled neighbors, smallest label on ties, earlier
    // labels frozen. `round` = propagation distance (0 = seed).
    QueryDef("t_label_prop", {
      def sweep(i: Int, prev: String) =
        s"""v$i AS (SELECT u.b AS node, l.label, count(*) AS n
           |  FROM und u JOIN $prev l ON u.a = l.node GROUP BY 1, 2),
           |w$i AS (SELECT node, label,
           |    row_number() OVER (PARTITION BY node
           |      ORDER BY n DESC, label) AS rk
           |  FROM v$i),
           |f$i AS (SELECT w.node, w.label, $i AS round FROM w$i w
           |  WHERE rk = 1 AND NOT EXISTS
           |    (SELECT 1 FROM $prev p WHERE p.node = w.node)),
           |l$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM f$i)""".stripMargin
      s"""WITH $hashesCte, $sigCte,
         |$repCollapseCtes,
         |${bandCandidatesCte()},
         |rpairs AS (
         |  SELECT doc_a, doc_b,
         |         len(list_intersect(ha.hs, hb.hs)) AS inter,
         |         len(ha.hs) + len(hb.hs)
         |           - len(list_intersect(ha.hs, hb.hs)) AS uni
         |  FROM cand
         |  JOIN hashes ha ON ha.doc_id = cand.doc_a
         |  JOIN hashes hb ON hb.doc_id = cand.doc_b),
         |pairs AS (
         |  SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
         |         greatest(ma.doc_id, mb.doc_id) AS doc_b, p.inter, p.uni
         |  FROM rpairs p
         |  JOIN mem ma ON ma.rep = p.doc_a
         |  JOIN mem mb ON mb.rep = p.doc_b
         |  UNION ALL
         |  SELECT ma.doc_id, mb.doc_id, len(h.hs), len(h.hs)
         |  FROM mem ma JOIN mem mb ON ma.rep = mb.rep AND ma.doc_id < mb.doc_id
         |  JOIN hashes h ON h.doc_id = ma.rep),
         |eg AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |       WHERE inter * 10 >= uni * 8 AND doc_a <> doc_b),
         |und AS (SELECT a, b FROM eg UNION SELECT b, a FROM eg),
         |l0 AS (SELECT doc_id AS node, lang AS label, 0 AS round
         |       FROM documents WHERE doc_id % 10 = 0 AND lang IS NOT NULL),
         |${sweep(1, "l0")},
         |${sweep(2, "l1")}
         |SELECT CAST(node AS VARCHAR) AS node, label,
         |       CAST(round AS BIGINT) AS round
         |FROM l2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val edges = Dedup.nearDupPairs(docs)
        .filter(col("inter") * 10 >= col("uni") * 8)
      val seeds = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("lang"))
      graft.ext.Graph.labelPropagation(edges, "doc_a", "doc_b",
        seeds, "doc_id", "lang")
    }.sortedBy(col("node"), col("label")),

    // Canonical keep-list: the consumable dedup artifact — one
    // representative per cluster with its member count.
    QueryDef("t_dedup_keep",
      s"""WITH RECURSIVE $hashesCte, $sigCte,
         |${clusterCtes("documents", jNum = 8, jDen = 10)}
         |SELECT cluster_id AS keep_id, count(*) AS n_members
         |FROM clusters GROUP BY 1 ORDER BY keep_id""".stripMargin) { (s, d) =>
      Dedup.keepList(Dedup.nearDupClusters(Tables.documents(s, d)))
    }.sortedBy(col("keep_id")),

    // Quality-aware keep list: per cluster keep the HIGHEST-quality
    // member (tie: lowest id) — the cleanest serialization survives,
    // not whichever copy crawled first.
    QueryDef("t_dedup_keep_best",
      s"""WITH RECURSIVE $hashesCte, $sigCte,
         |${clusterCtes("documents", jNum = 8, jDen = 10)},
         |${qualityCtes("documents")},
         |kb AS (SELECT c.cluster_id, c.doc_id, q.quality
         |  FROM clusters c JOIN qscored q USING (doc_id)),
         |kbr AS (SELECT cluster_id, doc_id, quality,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY quality DESC, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY cluster_id) AS n_members
         |  FROM kb)
         |SELECT cluster_id, doc_id AS keep_id,
         |  CAST(quality AS BIGINT) AS score,
         |  CAST(n_members AS BIGINT) AS n_members
         |FROM kbr WHERE rn = 1 ORDER BY cluster_id""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val scored = docs.select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).cast("long").as("quality"))
        Dedup.keepBest(Dedup.nearDupClusters(docs), scored)
    }.sortedBy(col("cluster_id")),

    // ── Similarity search ──────────────────────────────────────────
    // Exact brute-force top-10 for 5 query vectors: broadcast query set
    // × corpus scan (O(|Q|·n)), ranked on round(cos, 6) with id
    // tiebreak so both engines select identical neighbours.
    QueryDef("t_similarity_topk",
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         round(${cosine("q.qv", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT * FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      Similarity.topKByIds(Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L), 10)
    }.sortedBy(col("query_id"), col("rank")),

    // Same top-k through the custom TopKPerKey physical operator
    // (graft.plans): bounded per-partition heaps + k-rows-per-key
    // shuffle instead of window-sort — must match the same oracle.
    QueryDef("t_topk_operator",
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         round(${cosine("q.qv", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT * FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      Similarity.topKByIdsNative(Tables.embeddings(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), 10)
    }.sortedBy(col("query_id"), col("rank")),

    // ── INT8 quantization (exact integer similarity) ───────────────
    // Per-vector symmetric int8 grid: q_i = floor(x_i·127/maxabs) —
    // floor, not round, so the cell is one IEEE double expression with
    // no tie rule. Report: scale + integer summaries of the quantized
    // vector (sum, L1, saturation count) — the full qvec replayed as
    // scalars both engines hash identically.
    QueryDef("t_embed_quantize",
      s"""WITH mq AS (SELECT vec_id, embedding,
         |  coalesce(list_max(list_transform(embedding,
         |    x -> abs(CAST(x AS DOUBLE)))), 0.0) AS maxabs
         |  FROM embeddings),
         |qv AS (SELECT vec_id, maxabs,
         |  CASE WHEN maxabs > 0 THEN list_transform(embedding,
         |         x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs)
         |              AS BIGINT))
         |       ELSE list_transform(embedding, x -> CAST(0 AS BIGINT))
         |  END AS q FROM mq)
         |SELECT vec_id, maxabs,
         |  CAST(list_sum(q) AS BIGINT) AS sum_q,
         |  CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT) AS l1_q,
         |  CAST(list_sum(list_transform(q,
         |    v -> CASE WHEN abs(v) = 127 THEN 1 ELSE 0 END)) AS BIGINT)
         |    AS n_sat
         |FROM qv ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.quantizeInt8(Tables.embeddings(s, d))
        .select(col("vec_id"), col("maxabs"),
          aggregate(col("qvec"), lit(0L), (a, v) => a + v).as("sum_q"),
          aggregate(col("qvec"), lit(0L), (a, v) => a + abs(v)).as("l1_q"),
          aggregate(col("qvec"), lit(0L),
            (a, v) => a + when(abs(v) === 127L, 1L).otherwise(0L)).as("n_sat"))
    }.sortedBy(col("vec_id")),

    // Top-8 neighbours for 3 queries by INT8 dot product — ranking
    // never touches a float (the bit-reproducibility float cosine only
    // gets via round-to-6dp). Engine: fused IntDot codegen kernel +
    // bounded-heap TopKPerKey; oracle: the same integer grid and a
    // list_sum-of-products scan.
    QueryDef("t_ann_int8",
      s"""WITH mq AS (SELECT vec_id, embedding,
         |  coalesce(list_max(list_transform(embedding,
         |    x -> abs(CAST(x AS DOUBLE)))), 0.0) AS maxabs
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |qv AS (SELECT vec_id,
         |  CASE WHEN maxabs > 0 THEN list_transform(embedding,
         |         x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs)
         |              AS BIGINT))
         |       ELSE list_transform(embedding, x -> CAST(0 AS BIGINT))
         |  END AS q FROM mq),
         |qq AS (SELECT vec_id AS query_id, q AS qvq FROM qv
         |       WHERE vec_id < 3),
         |scored AS (SELECT qq.query_id, e.vec_id AS neighbor_id,
         |  CAST(list_sum(list_transform(generate_series(1, len(e.q)),
         |    i -> qq.qvq[i] * e.q[i])) AS BIGINT) AS qdot
         |  FROM qq JOIN qv e ON e.vec_id <> qq.query_id),
         |ranked AS (SELECT query_id, neighbor_id, qdot,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |       ORDER BY qdot DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT * FROM ranked WHERE rank <= 8
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      Similarity.int8TopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L), 8)
    }.sortedBy(col("query_id"), col("rank")),

    // ── BINARY (1-bit) quantization: sign bits packed 32/long word by
    // the positional fold acc·2+b (shift-free — both engines replay it
    // exactly, no 1<<63 overflow divergence). Report: word count,
    // first word, total popcount — the packed array replayed as
    // scalars both engines hash identically.
    QueryDef("t_embed_binary",
      s"""WITH bq AS (SELECT vec_id,
         |  CAST(len(embedding) AS BIGINT) AS dims,
         |  CASE WHEN len(embedding) = 0 THEN CAST([] AS BIGINT[])
         |    ELSE list_transform(
         |      generate_series(0, (len(embedding) - 1) // 32),
         |      w -> list_reduce(list_prepend(0::BIGINT, list_transform(
         |        generate_series(least((w + 1) * 32, len(embedding)),
         |          w * 32 + 1, -1),
         |        i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT
         |             ELSE 0::BIGINT END)),
         |        (acc, b) -> acc * 2 + b))
         |  END AS bv
         |  FROM embeddings WHERE embedding IS NOT NULL)
         |SELECT vec_id, dims, CAST(len(bv) AS BIGINT) AS n_words,
         |  CASE WHEN len(bv) >= 1 THEN bv[1] ELSE 0 END AS word0,
         |  CAST(coalesce(list_sum(list_transform(bv,
         |    v -> CAST(bit_count(v) AS BIGINT))), 0) AS BIGINT)
         |    AS popcount
         |FROM bq ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.quantizeBinary(Tables.embeddings(s, d))
        .select(col("vec_id"), col("dims"),
          size(col("bvec")).cast("long").as("n_words"),
          coalesce(element_at(col("bvec"), 1), lit(0L)).as("word0"),
          coalesce(aggregate(col("bvec"), lit(0L),
            (a, v) => a + bit_count(v).cast("long")), lit(0L))
            .as("popcount"))
    }.sortedBy(col("vec_id")),

    // Top-8 neighbours for 3 queries by HAMMING distance over the
    // packed sign bits — the 1/32-scan shortlist rung; ranking
    // (hamming ASC, id ASC) is pure integer.
    QueryDef("t_ann_hamming",
      s"""WITH bq AS (SELECT vec_id,
         |  list_transform(generate_series(0, (len(embedding) - 1) // 32),
         |    w -> list_reduce(list_prepend(0::BIGINT, list_transform(
         |      generate_series(least((w + 1) * 32, len(embedding)),
         |        w * 32 + 1, -1),
         |      i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT
         |           ELSE 0::BIGINT END)),
         |      (acc, b) -> acc * 2 + b)) AS bv
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND len(embedding) > 0),
         |qq AS (SELECT vec_id AS query_id, bv AS qbv FROM bq
         |       WHERE vec_id < 3),
         |scored AS (SELECT qq.query_id, e.vec_id AS neighbor_id,
         |  CAST(list_sum(list_transform(generate_series(1, len(e.bv)),
         |    i -> CAST(bit_count(xor(qq.qbv[i], e.bv[i])) AS BIGINT)))
         |    AS BIGINT) AS hamming
         |  FROM qq JOIN bq e ON e.vec_id <> qq.query_id),
         |ranked AS (SELECT query_id, neighbor_id, hamming,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |       ORDER BY hamming, neighbor_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT * FROM ranked WHERE rank <= 8
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      Similarity.hammingTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L), 8)
    }.sortedBy(col("query_id"), col("rank")),

    // Hamming shortlist (20) + exact round-6 cosine rerank to top-8 —
    // the binary rung's production recipe, both stages' tie laws
    // replayed whole.
    QueryDef("t_ann_hamming_rerank",
      s"""WITH bq AS (SELECT vec_id,
         |  list_transform(generate_series(0, (len(embedding) - 1) // 32),
         |    w -> list_reduce(list_prepend(0::BIGINT, list_transform(
         |      generate_series(least((w + 1) * 32, len(embedding)),
         |        w * 32 + 1, -1),
         |      i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT
         |           ELSE 0::BIGINT END)),
         |      (acc, b) -> acc * 2 + b)) AS bv
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND len(embedding) > 0),
         |qq AS (SELECT vec_id AS query_id, bv AS qbv FROM bq
         |       WHERE vec_id < 3),
         |hs AS (SELECT qq.query_id, e.vec_id AS neighbor_id,
         |  CAST(list_sum(list_transform(generate_series(1, len(e.bv)),
         |    i -> CAST(bit_count(xor(qq.qbv[i], e.bv[i])) AS BIGINT)))
         |    AS BIGINT) AS hamming
         |  FROM qq JOIN bq e ON e.vec_id <> qq.query_id),
         |short AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rn
         |    FROM hs) WHERE rn <= 20),
         |qv AS (SELECT vec_id AS query_id, embedding AS qvv
         |  FROM embeddings WHERE vec_id < 3),
         |rer AS (SELECT s.query_id, s.neighbor_id,
         |    round(${cosine("q.qvv", "e.embedding")}, 6) AS cos
         |  FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
         |  JOIN qv q ON q.query_id = s.query_id),
         |ranked AS (SELECT query_id, neighbor_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |       ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM rer)
         |SELECT * FROM ranked WHERE rank <= 8
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      Similarity.hammingTopKReranked(Tables.embeddings(s, d),
        Seq(0L, 1L, 2L), kNn = 8, rerank = 20)
    }.sortedBy(col("query_id"), col("rank")),

    // ANN (LSH-bucketed) variant, fully oracle-checked: the DuckDB side
    // reproduces the sign buckets from the same planeWeight constants
    // (lshBucketsCte), then the same candidate join + exact rerank.
    // Recall vs exact top-k is additionally asserted in the test suite.
    // ANN quality report: recall@10 of the LSH search vs exact brute
    // force, per query — the spec-only recall metric elevated to the
    // oracle surface (both sides' full chains replayed, the comparison
    // a |Q|·k-bounded join).
    QueryDef("t_ann_recall",
      s"""WITH annr AS (SELECT query_id, neighbor_id FROM ($annLshSql) a),
         |exq AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |exs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |    round(${cosine("q.qv", "e.embedding")}, 6) AS cos
         |  FROM exq q JOIN embeddings e ON e.vec_id <> q.query_id),
         |exr AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id) AS rn FROM exs)
         |  WHERE rn <= 10),
         |rhit AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM exr e JOIN annr a USING (query_id, neighbor_id)
         |  GROUP BY 1),
         |rtot AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
         |  FROM exr GROUP BY 1)
         |SELECT t.query_id, t.n_exact, coalesce(h.n_hit, 0) AS n_hit,
         |  coalesce(h.n_hit, 0) * 100 // t.n_exact AS recall_x100
         |FROM rtot t LEFT JOIN rhit h USING (query_id)
         |ORDER BY query_id""".stripMargin) { (s, d) =>
      Similarity.annRecallReport(Tables.embeddings(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10, planes = 4, dims = 64)
    }.sortedBy(col("query_id")),

    // Multi-probe recall report: the recall side of the probe-budget
    // trade next to t_ann_recall's single-probe number.
    QueryDef("t_ann_recall_multiprobe",
      s"""WITH annr AS (SELECT query_id, neighbor_id
         |  FROM (${annLshMultiProbeSqlFor(1)}) a),
         |exq AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |exs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |    round(${cosine("q.qv", "e.embedding")}, 6) AS cos
         |  FROM exq q JOIN embeddings e ON e.vec_id <> q.query_id),
         |exr AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id) AS rn FROM exs)
         |  WHERE rn <= 10),
         |rhit AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM exr e JOIN annr a USING (query_id, neighbor_id)
         |  GROUP BY 1),
         |rtot AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
         |  FROM exr GROUP BY 1)
         |SELECT t.query_id, t.n_exact, coalesce(h.n_hit, 0) AS n_hit,
         |  coalesce(h.n_hit, 0) * 100 // t.n_exact AS recall_x100
         |FROM rtot t LEFT JOIN rhit h USING (query_id)
         |ORDER BY query_id""".stripMargin) { (s, d) =>
      Similarity.annRecallReportMultiProbe(Tables.embeddings(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10, planes = 4, dims = 64,
        probeBits = 1)
    }.sortedBy(col("query_id")),

    QueryDef("t_ann_lsh", annLshSql) { (s, d) =>
      Similarity.annTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L),
        k = 10, planes = 4, dims = 64)
    }.sortedBy(col("query_id"), col("rank")),

    // Same ANN search over the PERSISTED LSH index (write-once bucketed
    // tables, search-only hot path): bit-identical to t_ann_lsh, so the
    // same oracle gates the whole write/read lifecycle.
    QueryDef("t_ann_lsh_indexed", annLshSql) { (s, d) =>
      Similarity.annTopKIndexed(s, lshIndexFor(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10)
    }.sortedBy(col("query_id"), col("rank")),

    // Multi-probe search over the SAME persisted index (probe the
    // bucket + every 1-bit flip; zero index growth). The oracle expands
    // the identical probe list and reranks exactly — and since the
    // indexed buckets are bit-identical to inline bucketing, this one
    // oracle gates the multi-probe path end to end.
    QueryDef("t_ann_lsh_multiprobe", annLshMultiProbeSqlFor(1)) { (s, d) =>
      Similarity.annTopKMultiProbeIndexed(s, lshIndexFor(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10, planes = 4)
    }.sortedBy(col("query_id"), col("rank")),

    // 2-bit probe budget over the SAME persisted index: the probe set
    // adds every C(planes, 2) two-bit flip (Lv et al.'s extended
    // perturbation sequence) — another recall step at zero index cost.
    // The oracle expands the identical 1-bit + 2-bit xor list.
    QueryDef("t_ann_lsh_multiprobe2", annLshMultiProbeSqlFor(2)) { (s, d) =>
      Similarity.annTopKMultiProbeIndexed(s, lshIndexFor(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10, planes = 4, probeBits = 2)
    }.sortedBy(col("query_id"), col("rank")),

    // IVF variant (deterministic k-means coarse quantizer + nProbe cell
    // probing + exact rerank through the TopKPerKey operator), fully
    // oracle-checked: the DuckDB side retrains the same centroids
    // (ivfCtes) and replays the same search. Recall and the
    // probe-all-cells==brute-force degeneration are additionally
    // asserted in the test suite.
    QueryDef("t_ann_ivf", annIvfSql) { (s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L),
        k = 10, centroids = 16, nProbe = 6)
    }.sortedBy(col("query_id"), col("rank")),

    // Same IVF search over the PERSISTED index (trained quantizer +
    // cell-bucketed inverted lists written once): the search-only path
    // must replay the identical oracle through a write/read cycle —
    // this is the index-lifecycle gate, and the scale answer to
    // train-per-query.
    QueryDef("t_ann_ivf_indexed", annIvfSql) { (s, d) =>
      Similarity.ivfTopKIndexed(s, ivfIndexFor(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10, nProbe = 6)
    }.sortedBy(col("query_id"), col("rank")),

    // ── Semantic packing (in-context-pretraining layout) ───────────
    // Related documents land in the same training pack: docs take
    // their embedding's IVF cell (trainCentroids + assignCells — the
    // proven quantizer CTEs) and pack cell-ordered (curriculumPack
    // with stage = cell), so a context window reads topically related
    // neighbors instead of random crawl order.
    QueryDef("t_semantic_pack",
      s"""WITH ${ivfCtes(k = 16, nProbe = 1, queryPred = "FALSE",
              "embeddings")},
         |spt AS (SELECT d.doc_id, a.cell,
         |  CASE WHEN d.text IS NULL THEN 0
         |       ELSE len(string_split(d.text, ' ')) END AS toks,
         |  ${polyhash("CAST(d.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM documents d JOIN assigned a ON a.vec_id = d.doc_id),
         |spc AS (SELECT doc_id, cell, toks,
         |  sum(toks) OVER (ORDER BY cell, bkt, doc_id
         |                  ROWS UNBOUNDED PRECEDING) AS cum FROM spt)
         |SELECT doc_id, CAST(cell AS BIGINT) AS cell,
         |  CAST((cum - toks) // 512 AS BIGINT) AS pack
         |FROM spc ORDER BY doc_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.trainCentroids(emb, k = 16)
      val cells = Similarity.assignCells(emb, cents)
        .select(col("vec_id").as("doc_id"), col("cell"))
      val staged = Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("text").isNull, 0)
            .otherwise(size(split(col("text"), " "))).as("toks"))
        .join(cells, "doc_id")
      graft.ext.Packing.curriculumPack(staged, col("doc_id"),
          col("toks"), col("cell"), 512L)
        .select(col("doc_id"), col("cell"), col("pack"))
    }.sortedBy(col("doc_id")),

    // ── Hard-negative mining ───────────────────────────────────────
    // Exact rung: per anchor, the 10 highest-cosine DIFFERENT-label
    // vectors (the negatives a contrastive loss actually learns from).
    // Self-pairs fall out for free (a vector shares its own label).
    QueryDef("t_hard_negatives",
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv, label AS ql
         |  FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         e.label AS neg_label,
         |         round(${cosine("q.qv", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.label <> q.ql),
         |ranked AS (
         |  SELECT query_id, neighbor_id, neg_label, cos,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT * FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      Similarity.hardNegatives(Tables.embeddings(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10)
    }.sortedBy(col("query_id"), col("rank")),

    // IVF-probed mining — the 100 TB path: only the anchors' probed
    // inverted lists are scored and label-filtered. Same deterministic
    // quantizer CTEs as t_ann_ivf, so cells/probes/candidates replay
    // bit-for-bit; the label cut is applied to the identical candidate
    // set on both engines.
    QueryDef("t_hard_negatives_ivf",
      s"""WITH ${ivfCtes(k = 16, nProbe = 6, queryPred = "vec_id < 5", "embeddings")},
         |cand AS (
         |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
         |  FROM assigned a JOIN probes p ON a.cell = p.cell),
         |scored AS (
         |  SELECT c.query_id, c.neighbor_id, ne.label AS neg_label,
         |         round(${cosine("qe.embedding", "ne.embedding")}, 6) AS cos
         |  FROM cand c
         |  JOIN embeddings qe ON qe.vec_id = c.query_id
         |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id
         |  WHERE ne.label <> qe.label),
         |ranked AS (
         |  SELECT query_id, neighbor_id, neg_label, cos,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT * FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      Similarity.hardNegativesIvf(Tables.embeddings(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10, centroids = 16, nProbe = 6)
    }.sortedBy(col("query_id"), col("rank")),

    // Incremental LSH index maintenance: index built on the first half,
    // the rest APPENDED as a delta (only the delta is ever bucketed).
    // Sign-buckets are data-independent, so the appended index must be
    // bit-identical to a full build — the SAME t_ann_lsh oracle gates it.
    QueryDef("t_ann_lsh_appended", annLshSql) { (s, d) =>
      Similarity.annTopKIndexed(s, lshAppendIndexFor(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10)
    }.sortedBy(col("query_id"), col("rank")),

    // Incremental IVF index maintenance: quantizer trained on the first
    // half and FROZEN; the delta is assigned against it and appended to
    // the cell-bucketed lists (standard IVF maintenance — no retrain, no
    // rebuild). The oracle retrains the same half-corpus quantizer in
    // DuckDB and assigns the full corpus against it.
    QueryDef("t_ann_ivf_appended",
      annIvfSqlFor(s"(SELECT * FROM embeddings WHERE vec_id < $AppendCut)")) { (s, d) =>
      Similarity.ivfTopKIndexed(s, ivfAppendIndexFor(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), k = 10, nProbe = 6)
    }.sortedBy(col("query_id"), col("rank")),

    // PQ (product-quantization) ANN — the memory-bound scale path:
    // per-subspace codebooks (deterministic k-means, same seed sampling
    // and quantized-integer Lloyd mean as IVF), m-code encoding, and
    // ADC scoring as integer sums of quantized sub-dots. The oracle
    // retrains all m codebooks, re-encodes the corpus and replays every
    // score bit-for-bit.
    QueryDef("t_ann_pq", annPqSql) { (s, d) =>
      Similarity.pqTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L),
        kNn = 10, m = 8, codebookSize = 16, dims = 64)
    }.sortedBy(col("query_id"), col("rank")),

    // PQ + exact rerank — the standard recall repair: ADC (codes-only)
    // prunes to a 30-candidate window per query; only those windows'
    // float vectors are read back for the exact-cosine rerank. Float
    // reads are candidate-bound, never corpus-bound.
    QueryDef("t_ann_pq_rerank", annPqRerankSql) { (s, d) =>
      Similarity.pqTopKReranked(Tables.embeddings(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), kNn = 10, rerank = 30, m = 8,
        codebookSize = 16, dims = 64)
    }.sortedBy(col("query_id"), col("rank")),

    // Same PQ search over the PERSISTED index (codebooks + codes
    // written once; the query path is a LUT + codes scan with zero
    // training/encoding) — the same oracle gates the whole lifecycle.
    QueryDef("t_ann_pq_indexed", annPqSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopKIndexed(s, pqIndexFor(s, d),
        emb.filter(col("vec_id") < 5), kNn = 10, m = 8, dims = 64)
    }.sortedBy(col("query_id"), col("rank")),

    // Incremental PQ index maintenance: codebooks trained on the first
    // half and FROZEN; the delta is encoded against them and appended.
    // The oracle retrains the half-corpus codebooks in DuckDB and
    // re-encodes the full corpus against them.
    QueryDef("t_ann_pq_appended", annPqSqlFor(HalfCorpus)) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopKIndexed(s, pqAppendIndexFor(s, d),
        emb.filter(col("vec_id") < 5), kNn = 10, m = 8, dims = 64)
    }.sortedBy(col("query_id"), col("rank")),

    // IVF×PQ composite — the standard large-scale ANN architecture:
    // IVF probing prunes candidates to nProbe inverted lists, ADC over
    // PQ codes scores the survivors. The oracle composes the two proven
    // CTE generators (prefix-isolated) and joins candidate pruning with
    // the quantized score parts.
    QueryDef("t_ann_ivfpq", annIvfPqSql) { (s, d) =>
      Similarity.ivfPqTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L, 3L, 4L),
        kNn = 10, centroids = 16, nProbe = 6, m = 8, codebookSize = 16,
        dims = 64)
    }.sortedBy(col("query_id"), col("rank")),

    // Same composite over the PERSISTED IVF×PQ index (quantizer, bare
    // id inverted lists, codebooks and id-bucketed codes written once;
    // the query path runs zero training, zero encoding and reads zero
    // corpus floats) — the same oracle gates the whole lifecycle, and
    // the plan proof in LlmOpsSpec asserts no Lloyd/encode stages.
    QueryDef("t_ann_ivfpq_indexed", annIvfPqSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqTopKIndexed(s, ivfPqIndexFor(s, d),
        emb.filter(col("vec_id") < 5), kNn = 10, nProbe = 6, m = 8, dims = 64)
    }.sortedBy(col("query_id"), col("rank")),

    // IVF×PQ + exact rerank — the full production ANN recipe (probe
    // pruning, memory-bound ADC window, candidate-bound float rerank);
    // both stages' tie-breaks replay exactly in the oracle.
    QueryDef("t_ann_ivfpq_rerank", annIvfPqRerankSql) { (s, d) =>
      Similarity.ivfPqTopKReranked(Tables.embeddings(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), kNn = 10, rerank = 30, centroids = 16,
        nProbe = 6, m = 8, codebookSize = 16, dims = 64)
    }.sortedBy(col("query_id"), col("rank")),

    // Incremental composite maintenance: BOTH quantizers trained on the
    // first half and frozen; the delta is assigned + encoded against
    // them in one appendToIvfPqIndex call. The oracle retrains both
    // half-corpus quantizers and replays assignment + encoding of the
    // full corpus against them.
    QueryDef("t_ann_ivfpq_appended", annIvfPqSqlFor(HalfCorpus)) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqTopKIndexed(s, ivfPqAppendIndexFor(s, d),
        emb.filter(col("vec_id") < 5), kNn = 10, nProbe = 6, m = 8, dims = 64)
    }.sortedBy(col("query_id"), col("rank")),

    // Embedding-cosine near-dup pairs (dedup family): LSH-bucketed
    // candidates ≥ threshold, oracle-checked end-to-end (bucket
    // reproduction + canonical pair join + exact cosine cut).
    // 7 planes = 128 buckets: candidate volume scales as n²/2^planes per
    // table — too few planes floods the rerank (3 planes ≈ 25M pairs at
    // sf0.1, ~12s; 7 planes ≈ 0.8M, sub-second).
    QueryDef("t_embed_neardup",
      s"""WITH ${lshBucketsCte(tables = 8, planes = 7, dims = 64)},
         |vgrp AS (SELECT embedding AS emb, min(vec_id) AS rep
         |         FROM embeddings WHERE embedding IS NOT NULL
         |         GROUP BY embedding),
         |vmem AS (SELECT e.vec_id, g.rep FROM embeddings e
         |         JOIN vgrp g ON e.embedding = g.emb),
         |rbuckets AS (
         |  SELECT b.vec_id, b.tbl, b.bucket
         |  FROM buckets b JOIN vgrp g ON g.rep = b.vec_id
         |  QUALIFY count(*) OVER (PARTITION BY b.tbl, b.bucket)
         |          <= ${Dedup.DefaultMaxBucketWidth}),
         |cand AS (
         |  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
         |  FROM rbuckets l JOIN rbuckets r
         |    ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id),
         |rscored AS (
         |  SELECT c.id_a, c.id_b,
         |         round(${cosine("a.embedding", "b.embedding")}, 6) AS cos
         |  FROM cand c
         |  JOIN embeddings a ON a.vec_id = c.id_a
         |  JOIN embeddings b ON b.vec_id = c.id_b),
         |rpass AS (SELECT * FROM rscored WHERE cos >= 0.25),
         |selfcos AS (
         |  SELECT g.rep, round(${cosine("e.embedding", "e.embedding")}, 6) AS cos
         |  FROM vgrp g JOIN embeddings e ON e.vec_id = g.rep),
         |pairs AS (
         |  SELECT least(ma.vec_id, mb.vec_id) AS id_a,
         |         greatest(ma.vec_id, mb.vec_id) AS id_b, p.cos
         |  FROM rpass p
         |  JOIN vmem ma ON ma.rep = p.id_a
         |  JOIN vmem mb ON mb.rep = p.id_b
         |  UNION ALL
         |  SELECT ma.vec_id, mb.vec_id, s.cos
         |  FROM vmem ma JOIN vmem mb ON ma.rep = mb.rep AND ma.vec_id < mb.vec_id
         |  JOIN selfcos s ON s.rep = ma.rep
         |  WHERE s.cos >= 0.25)
         |SELECT id_a, id_b, cos FROM pairs ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Similarity.embeddingNearDups(Tables.embeddings(s, d),
        threshold = 0.25, planes = 7, dims = 64)
    }.sortedBy(col("id_a"), col("id_b")),

    // ── Deterministic split/sample (training-data pipeline core) ───
    // Assignment is polyhash(key) mod 10000 against cumulative weight
    // ranges — a pure key function, so the oracle reproduces every row's
    // split exactly (no RNG, no partitioning dependence).
    QueryDef("t_split_assign",
      s"""WITH b AS (
         |  SELECT doc_id,
         |         ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM documents)
         |SELECT doc_id,
         |       CASE WHEN bkt < 8000 THEN 'train'
         |            WHEN bkt < 9000 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.ext.Sampling.assignSplit(
        Tables.documents(s, d).select("doc_id"), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    }.sortedBy(col("doc_id")),

    QueryDef("t_sample_by_key",
      s"""SELECT doc_id FROM documents
         |WHERE ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 < 2500
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.ext.Sampling.sampleByKey(
        Tables.documents(s, d).select("doc_id"), col("doc_id"), 0.25)
    }.sortedBy(col("doc_id")),

    // Weighted variant: per-row keep rate (n_chars % 5)/4 — rates 0
    // (never), 1/4 … 4/4 (always) all exercised; same pure key-hash
    // law, cross-multiplied integers, shuffle-free.
    QueryDef("t_sample_weighted",
      s"""SELECT doc_id FROM documents
         |WHERE (${polyhash("CAST(doc_id AS VARCHAR)")} % 10000) * 4
         |      < 10000 * (n_chars % 5)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.ext.Sampling.sampleByRate(
        Tables.documents(s, d).select("doc_id", "n_chars"),
        col("doc_id"), col("n_chars") % 5, den = 4)
        .select("doc_id")
    }.sortedBy(col("doc_id")),

    // ── Deterministic epoch shuffle (training-order materialization) ─
    // Epoch-2 permutation into 8 shards: order key = polyhash('ep2:'
    // ++ id) — the per-epoch salt rides inside the hash, so every
    // engine replays the identical (shard, pos) coordinates. Oracle:
    // the same hash chain + one partitioned row_number.
    QueryDef("t_epoch_shuffle",
      s"""WITH t AS (SELECT doc_id,
         |  ${polyhash("'ep2:' || CAST(doc_id AS VARCHAR)")} AS ord
         |  FROM documents),
         |s AS (SELECT doc_id, ord, ord % 8 AS shard FROM t)
         |SELECT doc_id, ord, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
         |       - 1 AS BIGINT) AS pos
         |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.ext.Sampling.epochShuffle(
        Tables.documents(s, d).select("doc_id"), col("doc_id"),
        epoch = 2, numShards = 8)
    }.sortedBy(col("doc_id")),

    // ── Document chunking (overlapping token windows) ──────────────
    // 8-token windows every 4 tokens, final windows clipped — one row
    // per (doc, chunk). DuckDB's exclusive range(0, n, stride) equals
    // Spark's inclusive sequence(0, n-1, stride) for n > 0; empty/null
    // texts yield no chunks on both engines.
    QueryDef("t_chunk_docs",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT doc_id, ws,
         |  unnest(CASE WHEN len(ws) > 0 THEN range(0, len(ws), 4)
         |         ELSE [] END) AS st FROM w)
         |SELECT doc_id, CAST(st // 4 AS BIGINT) AS chunk_id,
         |       array_to_string(ws[st+1:st+8], ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      TextAnalysis.chunkDocuments(Tables.documents(s, d),
        window = 8, stride = 4)
    }.sortedBy(col("doc_id"), col("chunk_id")),

    // ── PII redaction (engine-portable regex chain) ────────────────
    // PII is PLANTED in SQL on both sides (emails, dotted-quad IPs,
    // long digit runs derived from doc_id), so the oracle exercises
    // real replacements, not an identity pass. The nested
    // regexp_replace chain is generated from the same
    // TextAnalysis.PiiPatterns constants the Spark expression folds —
    // one source of truth, Java-regex/RE2-portable patterns.
    QueryDef("t_redact_pii", {
      val planted =
        """text || ' contact u' || CAST(doc_id AS VARCHAR) ||
          |  '@ex.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
          |  '.7 acct 9001234' || CAST(doc_id + 100 AS VARCHAR)""".stripMargin
      val chain = TextAnalysis.PiiPatterns.foldLeft("text") {
        case (inner, (pat, rep)) =>
          s"regexp_replace($inner, '$pat', '$rep', 'g')"
      }
      s"""WITH planted AS (SELECT doc_id, $planted AS text FROM documents)
         |SELECT doc_id, $chain AS text FROM planted
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" contact u"),
          col("doc_id").cast("string"), lit("@ex.com from 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 acct 9001234"),
          (col("doc_id") + 100).cast("string")).as("text"))
      planted.select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("text"))
    }.sortedBy(col("doc_id")),

    // ── Per-domain PII audit ───────────────────────────────────────
    // Counts per PII type under the CHAIN order (each pattern counted
    // after its predecessors replaced — IP octets never double-count
    // as digit runs) over the same planted PII as t_redact_pii.
    QueryDef("t_pii_report", {
      val planted =
        """text || ' contact u' || CAST(doc_id AS VARCHAR) ||
          |  '@ex.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
          |  '.7 acct 9001234' || CAST(doc_id + 100 AS VARCHAR)""".stripMargin
      val Seq((ePat, eRep), (iPat, iRep), (nPat, _)) =
        TextAnalysis.PiiPatterns
      s"""WITH planted AS (
         |  SELECT doc_id, source, $planted AS t0 FROM documents
         |  WHERE text IS NOT NULL AND source IS NOT NULL),
         |s1 AS (SELECT source,
         |    len(regexp_extract_all(t0, '$ePat')) AS c_email,
         |    regexp_replace(t0, '$ePat', '$eRep', 'g') AS t1 FROM planted),
         |s2 AS (SELECT source, c_email,
         |    len(regexp_extract_all(t1, '$iPat')) AS c_ip,
         |    regexp_replace(t1, '$iPat', '$iRep', 'g') AS t2 FROM s1),
         |s3 AS (SELECT source, c_email, c_ip,
         |    len(regexp_extract_all(t2, '$nPat')) AS c_num FROM s2)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(c_email) AS BIGINT) AS n_email,
         |  CAST(sum(c_ip) AS BIGINT) AS n_ip,
         |  CAST(sum(c_num) AS BIGINT) AS n_num,
         |  CAST(sum(CASE WHEN c_email + c_ip + c_num > 0 THEN 1 ELSE 0
         |      END) AS BIGINT) AS docs_with_pii
         |FROM s3 GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"),
        col("source"),
        concat(col("text"), lit(" contact u"),
          col("doc_id").cast("string"), lit("@ex.com from 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 acct 9001234"),
          (col("doc_id") + 100).cast("string")).as("text"))
      TextAnalysis.piiReport(planted)
    }.sortedBy(col("source")),

    // ── Per-domain DATASHEET (the data card) ───────────────────────
    // One wide row per domain joining the audit families: size +
    // language spread + exact-dup rate + quality pass rate + PII
    // matches — every column inherits its law from an already-gated
    // component query.
    QueryDef("t_datasheet", {
      val Seq((ePat, eRep), (iPat, iRep), (nPat, _)) =
        TextAnalysis.PiiPatterns
      s"""WITH ${qualityCtes("documents")},
         |db AS (SELECT * FROM documents WHERE source IS NOT NULL),
         |dcore AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN text IS NULL THEN 0
         |       ELSE len(string_split(text, ' ')) END) AS BIGINT)
         |    AS n_tokens,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |  FROM db GROUP BY 1),
         |dqr AS (SELECT d.source,
         |  CAST(sum(CASE WHEN d.text IS NULL THEN 0
         |       WHEN q.quality >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pass
         |  FROM db d JOIN qscored q USING (doc_id) GROUP BY 1),
         |dfp AS (SELECT source, ${polyhash64("text")} AS fp,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM db WHERE text IS NOT NULL GROUP BY 1, 2),
         |ddup AS (SELECT source,
         |  CAST(sum(c) - count(*) AS BIGINT) AS n_dups,
         |  CAST((CAST(sum(c) AS BIGINT) - count(*)) * 100
         |    // CAST(sum(c) AS BIGINT) AS BIGINT) AS dup_x100
         |  FROM dfp GROUP BY 1),
         |dp1 AS (SELECT source,
         |    len(regexp_extract_all(text, '$ePat')) AS ce,
         |    regexp_replace(text, '$ePat', '$eRep', 'g') AS t1
         |  FROM db WHERE text IS NOT NULL),
         |dp2 AS (SELECT source, ce,
         |    len(regexp_extract_all(t1, '$iPat')) AS ci,
         |    regexp_replace(t1, '$iPat', '$iRep', 'g') AS t2 FROM dp1),
         |dpii AS (SELECT source,
         |  CAST(sum(ce + ci + len(regexp_extract_all(t2, '$nPat')))
         |    AS BIGINT) AS n_pii
         |  FROM dp2 GROUP BY 1)
         |SELECT c.source, c.n_docs, c.n_tokens, c.n_langs,
         |  coalesce(d.n_dups, 0) AS n_dups,
         |  coalesce(d.dup_x100, 0) AS dup_x100,
         |  q.n_pass, q.n_pass * 100 // c.n_docs AS pass_x100,
         |  coalesce(p.n_pii, 0) AS n_pii
         |FROM dcore c JOIN dqr q USING (source)
         |LEFT JOIN ddup d USING (source)
         |LEFT JOIN dpii p USING (source)
         |ORDER BY c.source""".stripMargin
    }) { (s, d) =>
      graft.ext.Curation.dataSheet(Tables.documents(s, d))
    }.sortedBy(col("source")),

    // ── Per-domain corpus profile (mixture report) ─────────────────
    // One row per source: doc count, token/char totals, integer
    // quality-score sum — the read-before/verify-after companion to
    // t_domain_mix. The oracle reuses the proven quality CTEs.
    QueryDef("t_corpus_profile",
      s"""WITH ${qualityCtes("documents")}
         |SELECT d.source,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN d.text IS NULL THEN 0
         |           ELSE len(string_split(d.text, ' ')) END) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN d.text IS NULL THEN 0
         |           ELSE length(d.text) END) AS BIGINT) AS n_chars,
         |  CAST(sum(CASE WHEN d.text IS NULL THEN 0
         |           ELSE q.quality END) AS BIGINT) AS quality_sum
         |FROM documents d JOIN qscored q ON q.doc_id = d.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, d) =>
      // approx_distinct_tokens is an HLL sketch — deterministic but
      // engine-specific, so it cannot be oracle-gated cross-engine;
      // CurationSketchSpec pins its error bound against the exact
      // count instead, and the oracle keeps gating the exact columns
      graft.ext.Curation.corpusProfile(Tables.documents(s, d))
        .drop("approx_distinct_tokens")
    }.sortedBy(col("source")),

    // ── Top-share quality rejection (FineWeb-Edu cut) ─────────────
    // Keep each domain's top 30% by integral quality score: threshold
    // = the domain's k-th largest score (k = ceil(n·30/100)) from the
    // descending histogram cumulative — all ties at the threshold
    // survive, and the threshold itself is disclosed per kept row.
    QueryDef("t_keep_top_share",
      s"""WITH ${qualityCtes("documents")},
         |d AS (SELECT q.doc_id, dd.source,
         |        CAST(q.quality AS BIGINT) AS score
         |      FROM qscored q JOIN documents dd USING (doc_id)
         |      WHERE q.quality IS NOT NULL),
         |h AS (SELECT source, score, count(*) AS c FROM d GROUP BY 1, 2),
         |cum AS (SELECT source, score,
         |        sum(c) OVER (PARTITION BY source ORDER BY score DESC
         |          ROWS UNBOUNDED PRECEDING) AS ct,
         |        sum(c) OVER (PARTITION BY source) AS n
         |        FROM h),
         |thr AS (SELECT source, max(score) AS threshold FROM cum
         |        WHERE ct >= (n * 30 + 99) // 100 GROUP BY source)
         |SELECT d.doc_id, d.source, d.score, t.threshold
         |FROM d JOIN thr t USING (source)
         |WHERE d.score >= t.threshold
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = docs.select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).cast("long").as("score"))
      graft.ext.Curation.keepTopShare(scored, "source", "score", 30)
        .select("doc_id", "source", "score", "threshold")
    }.sortedBy(col("doc_id")),

    // ── One-row corpus health report (dataset-card headline) ───────
    // Totals + exact-dup count (distinct polyhash fingerprints) +
    // quality-pass count + language spread with dominant share — the
    // cross-engine one-row complement of the per-domain profile.
    QueryDef("t_corpus_report",
      s"""WITH ${qualityCtes("documents")},
         |crb AS (SELECT
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN d.text IS NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_null_text,
         |    CAST(sum(CASE WHEN d.text IS NULL THEN 0
         |             ELSE len(string_split(d.text, ' ')) END)
         |      AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN d.text IS NULL THEN 0
         |             WHEN q.quality >= 3 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_quality_pass
         |  FROM documents d JOIN qscored q ON q.doc_id = d.doc_id),
         |crd AS (SELECT
         |    CAST(count(*) - count(DISTINCT ${polyhash("text")})
         |      AS BIGINT) AS n_dup_docs
         |  FROM documents WHERE text IS NOT NULL),
         |crl AS (SELECT lang, CAST(count(*) AS BIGINT) AS c
         |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
         |crt AS (SELECT lang, c,
         |    row_number() OVER (ORDER BY c DESC, lang) AS rn FROM crl),
         |cra AS (SELECT CAST(count(*) AS BIGINT) AS n_langs,
         |    CAST(sum(c) AS BIGINT) AS nl FROM crl)
         |SELECT b.n_docs, b.n_null_text, b.n_tokens, d.n_dup_docs,
         |  b.n_quality_pass, a.n_langs, t.lang AS dom_lang,
         |  (t.c * 100 // a.nl) AS dom_lang_share_x100
         |FROM crb b CROSS JOIN crd d CROSS JOIN cra a
         |CROSS JOIN (SELECT * FROM crt WHERE rn = 1) t""".stripMargin) {
      (s, d) =>
        graft.ext.Curation.corpusReport(Tables.documents(s, d))
    },

    // ── Corpus snapshot diff (dataset versioning) ──────────────────
    // "New" snapshot simulated in SQL on both sides: drop % 13 = 5
    // (removed), append ' v2' where % 11 = 3 (changed), re-add % 17 = 2
    // under id+100000 (added). Compare by text PolyHash — membership
    // and content drift in one full-outer pass, unchanged docs omitted.
    QueryDef("t_corpus_diff",
      s"""WITH newc AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 11 = 3 THEN text || ' v2' ELSE text END AS text
         |  FROM documents WHERE doc_id % 13 <> 5
         |  UNION ALL
         |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 17 = 2),
         |ofp AS (SELECT doc_id, ${polyhash("text")} AS fp,
         |        ${polyhash("reverse(text)")} AS rfp FROM documents),
         |nfp AS (SELECT doc_id, ${polyhash("text")} AS fp,
         |        ${polyhash("reverse(text)")} AS rfp FROM newc),
         |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN o.fp IS DISTINCT FROM n.fp
         |         OR o.rfp IS DISTINCT FROM n.rfp THEN 'changed' END AS status
         |  FROM ofp o FULL JOIN nfp n ON o.doc_id = n.doc_id)
         |SELECT doc_id, status FROM j WHERE status IS NOT NULL
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val newc = docs.filter("doc_id % 13 <> 5")
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 3, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .union(docs.filter("doc_id % 17 = 2")
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      graft.ext.Curation.corpusDiff(docs, newc)
    }.sortedBy(col("doc_id")),

    // ── Keyword extraction (integer-exact TF-IDF ranking) ──────────
    // Per doc: top-3 terms by tf·10⁶ div df (fixed-point idf — no float
    // log in the comparator, so DuckDB reproduces the ranking exactly),
    // lexicographic tiebreak. Spark runs the per-doc top-k on the
    // custom TopKPerKey operator; the oracle uses a window.
    QueryDef("t_keywords",
      s"""WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM terms GROUP BY 1, 2),
         |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (SELECT t.doc_id, t.word, t.tf, d.df,
         |  (t.tf * 1000000) // d.df AS score FROM tf t JOIN df d USING (word)),
         |ranked AS (SELECT doc_id, word, tf, df, score,
         |  CAST(row_number() OVER (PARTITION BY doc_id
         |       ORDER BY score DESC, word) AS BIGINT) AS rank FROM scored)
         |SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         |       CAST(score AS BIGINT) AS score, rank
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) {
      (s, d) =>
        TextAnalysis.keywords(Tables.documents(s, d), k = 3)
          .select(col("doc_id"), col("word"), col("tf"), col("df"),
            col("score"), col("rank"))
    }.sortedBy(col("doc_id"), col("rank")),

    // ── Unigram surprisal (perplexity-filter analog) ───────────────
    // Integer-exact quality signal: per-occurrence surprisal is the
    // floor-log2 gap length(bin(total)) - length(bin(count)) — both
    // engines render positive ints to the same binary string, so no
    // float log enters the score.
    QueryDef("t_surprisal",
      s"""WITH utf AS (
         |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |    FROM documents WHERE text IS NOT NULL) u GROUP BY 1, 2),
         |ucnt AS (SELECT word, CAST(sum(tf) AS BIGINT) AS cnt
         |  FROM utf GROUP BY 1),
         |utot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM ucnt),
         |usc AS (SELECT t.doc_id, t.tf,
         |    CAST(length(bin(u.total)) - length(bin(c.cnt)) AS BIGINT) AS bits
         |  FROM utf t JOIN ucnt c USING (word) CROSS JOIN utot u),
         |uagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n_tokens
         |  FROM usc GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(a.surprisal, 0) AS surprisal,
         |  coalesce(a.n_tokens, 0) AS n_tokens,
         |  CASE WHEN coalesce(a.n_tokens, 0) > 0
         |       THEN CAST((a.surprisal * 100) // a.n_tokens AS BIGINT)
         |       ELSE 0 END AS mean_bits_x100
         |FROM documents d LEFT JOIN uagg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.unigramSurprisal(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Per-signal quality breakdown (threshold-tuning readout) ────
    // The four qualityScore terms as separate 0/1 columns + the sum —
    // replayed from the SAME qbase CTE the quality chain uses.
    QueryDef("t_quality_report",
      s"""WITH ${qualityCtes("documents")}
         |SELECT doc_id,
         |  CAST(CASE WHEN n_tokens BETWEEN 10 AND 1000
         |       THEN 1 ELSE 0 END AS BIGINT) AS len_ok,
         |  CAST(CASE WHEN n_stopwords > 0
         |       THEN 1 ELSE 0 END AS BIGINT) AS stopword_ok,
         |  CAST(CASE WHEN token_chars >= n_tokens * 3
         |        AND token_chars <= n_tokens * 12
         |       THEN 1 ELSE 0 END AS BIGINT) AS shape_ok,
         |  CAST(CASE WHEN n_2grams < 5 OR max_2gram_count * 5 <= n_2grams
         |       THEN 1 ELSE 0 END AS BIGINT) AS repetition_ok,
         |  $qualityExpr AS quality
         |FROM qbase ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.qualityReport(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Bigram (conditional) surprisal — word-order signal ─────────
    // Add-one-smoothed conditional bits per bigram occurrence,
    // L(ctx(w1)+V) − L(cnt(w1,w2)+1) — the nbModel smoothing with the
    // context word as the class; same bin-length law as t_surprisal.
    QueryDef("t_bigram_surprisal",
      s"""WITH bw AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |bg AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(2, len(ws)), i -> ws[i-1] || ' ' || ws[i]))
         |    AS bigram FROM bw),
         |btf AS (SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS tf
         |  FROM bg GROUP BY 1, 2),
         |bc2 AS (SELECT bigram, CAST(sum(tf) AS BIGINT) AS cnt,
         |    string_split(bigram, ' ')[1] AS w1 FROM btf GROUP BY 1),
         |bc1 AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS ctx
         |  FROM bc2 GROUP BY 1),
         |bv AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM (
         |    SELECT unnest(string_split(text, ' ')) AS word
         |    FROM documents WHERE text IS NOT NULL)),
         |bsc AS (SELECT t.doc_id, t.tf,
         |    CAST(length(bin(c1.ctx + v.v)) - length(bin(c2.cnt + 1))
         |      AS BIGINT) AS bits
         |  FROM btf t JOIN bc2 c2 USING (bigram)
         |  JOIN bc1 c1 ON c1.w1 = c2.w1 CROSS JOIN bv v),
         |bagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n_bigrams FROM bsc GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.surprisal, 0) AS surprisal,
         |  coalesce(a.n_bigrams, 0) AS n_bigrams,
         |  CASE WHEN coalesce(a.n_bigrams, 0) > 0
         |       THEN CAST((a.surprisal * 100) // a.n_bigrams AS BIGINT)
         |       ELSE 0 END AS mean_bits_x100
         |FROM documents d LEFT JOIN bagg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.bigramSurprisal(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Trigram stupid-backoff surprisal (cross-corpus LM scoring) ─
    // Model trained on the EVEN doc_ids only, scoring the WHOLE corpus
    // — odd documents hit unseen trigrams, so both backoff hops (the
    // ×2/5 penalty folded into the bin-length law: L(den·5ᵏ)−L(num·2ᵏ))
    // and the add-one unigram floor are all exercised, not just the
    // seen-trigram fast path.
    QueryDef("t_trigram_surprisal", trigramSurprisalSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      TextAnalysis.trigramScoreWith(docs,
        TextAnalysis.trigramModel(docs.filter(col("doc_id") % 2 === 0)))
    }.sortedBy(col("doc_id")),

    // ── Kneser–Ney-grade absolute-discount trigram rung ────────────
    // Same split as t_trigram_surprisal (model on the even half, score
    // everything — the odd half exercises every backoff hop). Lower
    // orders use CONTINUATION counts off the distinct trigram/bigram
    // type relations; the D=3/4 discount and γ mass render as the
    // per-factor bin-length sum, every term a positive integer.
    QueryDef("t_kn_surprisal", knSurprisalSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      TextAnalysis.knTrigramScoreWith(docs,
        TextAnalysis.knTrigramModel(docs.filter(col("doc_id") % 2 === 0)))
    }.sortedBy(col("doc_id")),

    // The SAME scoring chains with the model ROUND-TRIPPED THROUGH
    // DISK (writeLmModel → gram-bucketed model table + _meta(kind) →
    // loadLmModel) — the CCNet posture: the reference-perplexity model
    // trains once and every crawl scores against the same artifact.
    // One oracle per rung gates that the persisted model scores
    // bit-identically to in-session training.
    QueryDef("t_trigram_persisted", trigramSurprisalSql) { (s, d) =>
      TextAnalysis.loadLmModel(s, trigramLmFor(s, d))
        .score(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    QueryDef("t_kn_persisted", knSurprisalSql) { (s, d) =>
      TextAnalysis.loadLmModel(s, knLmFor(s, d))
        .score(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── CCNet perplexity buckets (per-domain head/middle/tail) ─────
    // Composes two proven chains: the t_surprisal CTEs produce the
    // integer mean-bits score, the t_group_percentiles histogram CTEs
    // produce each domain's tercile cutoffs, and a CASE assigns the
    // bucket — the thresholds-then-assign decomposition (never a
    // per-domain ntile over the corpus).
    QueryDef("t_ppl_buckets",
      s"""WITH utf AS (
         |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |    FROM documents WHERE text IS NOT NULL) u GROUP BY 1, 2),
         |ucnt AS (SELECT word, CAST(sum(tf) AS BIGINT) AS cnt
         |  FROM utf GROUP BY 1),
         |utot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM ucnt),
         |usc AS (SELECT t.doc_id, t.tf,
         |    CAST(length(bin(u.total)) - length(bin(c.cnt)) AS BIGINT) AS bits
         |  FROM utf t JOIN ucnt c USING (word) CROSS JOIN utot u),
         |uagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n_tokens FROM usc GROUP BY 1),
         |sc AS (SELECT d.doc_id, d.source,
         |    CASE WHEN coalesce(a.n_tokens, 0) > 0
         |         THEN CAST((a.surprisal * 100) // a.n_tokens AS BIGINT)
         |         ELSE CAST(0 AS BIGINT) END AS m
         |  FROM documents d LEFT JOIN uagg a USING (doc_id)),
         |bhist AS (SELECT source, m AS v, count(*) AS c FROM sc GROUP BY 1, 2),
         |bcum AS (SELECT source, v, sum(c) OVER (PARTITION BY source ORDER BY v
         |        ROWS UNBOUNDED PRECEDING) AS cumc FROM bhist),
         |btot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |         FROM bhist GROUP BY 1),
         |b33 AS (SELECT c.source, min(v) AS p33 FROM bcum c
         |  JOIN btot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 33 + 99) // 100 GROUP BY 1),
         |b67 AS (SELECT c.source, min(v) AS p67 FROM bcum c
         |  JOIN btot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 67 + 99) // 100 GROUP BY 1)
         |SELECT s.doc_id, s.source, s.m AS mean_bits_x100,
         |  CASE WHEN b33.p33 IS NULL THEN NULL
         |       WHEN s.m <= b33.p33 THEN 'head'
         |       WHEN s.m <= b67.p67 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM sc s
         |LEFT JOIN b33 ON b33.source = s.source
         |LEFT JOIN b67 ON b67.source = s.source
         |ORDER BY s.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Curation.perplexityBuckets(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Perplexity buckets under the TRIGRAM scorer ────────────────
    // The pluggable-scorer path oracle-gated: the same
    // thresholds-then-assign chain as t_ppl_buckets, driven by the
    // self-scored trigram surprisal (model over the full corpus — no
    // backoff fires; t_trigram_surprisal covers the backoff hops).
    QueryDef("t_ppl_buckets_tri",
      s"""WITH tw AS (SELECT string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |uni AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(ws) AS gram FROM tw) GROUP BY 1),
         |bi AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(2, len(ws)),
         |      i -> ws[i-1] || ' ' || ws[i])) AS gram FROM tw) GROUP BY 1),
         |tri AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(3, len(ws)),
         |      i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS gram
         |    FROM tw) GROUP BY 1),
         |dw AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |occ AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(3, len(ws)),
         |    i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS g123
         |  FROM dw),
         |otf AS (SELECT doc_id, g123, CAST(count(*) AS BIGINT) AS tf
         |  FROM occ GROUP BY 1, 2),
         |tsc AS (SELECT o.doc_id, o.tf,
         |    CAST(length(bin(b12.cnt)) - length(bin(t.cnt)) AS BIGINT) AS bits
         |  FROM otf o
         |  JOIN tri t ON t.gram = o.g123
         |  JOIN bi b12 ON b12.gram =
         |    string_split(o.g123, ' ')[1] || ' ' || string_split(o.g123, ' ')[2]),
         |tagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n FROM tsc GROUP BY 1),
         |psc AS (SELECT d.doc_id, d.source,
         |    CASE WHEN coalesce(a.n, 0) > 0
         |         THEN CAST((a.surprisal * 100) // a.n AS BIGINT)
         |         ELSE CAST(0 AS BIGINT) END AS m
         |  FROM documents d LEFT JOIN tagg a USING (doc_id)),
         |phist AS (SELECT source, m AS v, count(*) AS c FROM psc GROUP BY 1, 2),
         |pcum AS (SELECT source, v, sum(c) OVER (PARTITION BY source ORDER BY v
         |        ROWS UNBOUNDED PRECEDING) AS cumc FROM phist),
         |ptot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |         FROM phist GROUP BY 1),
         |p33 AS (SELECT c.source, min(v) AS p33 FROM pcum c
         |  JOIN ptot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 33 + 99) // 100 GROUP BY 1),
         |p67 AS (SELECT c.source, min(v) AS p67 FROM pcum c
         |  JOIN ptot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 67 + 99) // 100 GROUP BY 1)
         |SELECT s.doc_id, s.source, s.m AS mean_bits_x100,
         |  CASE WHEN p33.p33 IS NULL THEN NULL
         |       WHEN s.m <= p33.p33 THEN 'head'
         |       WHEN s.m <= p67.p67 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM psc s
         |LEFT JOIN p33 ON p33.source = s.source
         |LEFT JOIN p67 ON p67.source = s.source
         |ORDER BY s.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Curation.perplexityBuckets(Tables.documents(s, d),
        scorer = TextAnalysis.trigramSurprisal(_, _, _))
    }.sortedBy(col("doc_id")),

    // ── Duplication profile (corpus-wide boilerplate share) ────────
    // Per doc: share of its DISTINCT 3-gram shingles that occur in
    // >= 2 documents corpus-wide — the document-level readout of the
    // duplication the dedup family removes. Reuses the t_minhash hash
    // chain (same ShingleHashes constants), so the oracle replays the
    // identical shingle → PolyHash sets.
    QueryDef("t_dup_profile",
      s"""WITH $hashesCte,
         |dpx AS (SELECT doc_id, unnest(hs) AS h FROM hashes
         |        WHERE hs IS NOT NULL),
         |dpf AS (SELECT h, CAST(count(*) AS BIGINT) AS df
         |        FROM dpx GROUP BY 1),
         |dpa AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |    CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS dup_shingles
         |  FROM dpx x JOIN dpf f USING (h) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(a.n_shingles, 0) AS n_shingles,
         |  coalesce(a.dup_shingles, 0) AS dup_shingles,
         |  CASE WHEN coalesce(a.n_shingles, 0) > 0
         |       THEN CAST((a.dup_shingles * 100) // a.n_shingles AS BIGINT)
         |       ELSE 0 END AS dup_frac_x100
         |FROM documents d LEFT JOIN dpa a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Dedup.duplicationProfile(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Cross-domain duplication matrix ────────────────────────────
    // For every domain pair sharing distinct 3-gram shingles: the
    // shared count and its x100 share of each side's shingle
    // vocabulary. Pair counting excludes shingles present in > 64
    // domains (the crossDomainDup boilerplate guard — vacuous on this
    // 20-domain corpus, law replayed regardless).
    QueryDef("t_cross_domain_dup",
      s"""WITH $hashesCte,
         |cdx AS (SELECT d.source AS dom, unnest(h.hs) AS h
         |  FROM hashes h JOIN documents d USING (doc_id)
         |  WHERE d.source IS NOT NULL),
         |cdd AS (SELECT DISTINCT dom, h FROM cdx),
         |cdt AS (SELECT dom, CAST(count(*) AS BIGINT) AS types
         |  FROM cdd GROUP BY 1),
         |cdw AS (SELECT h, count(*) AS nd FROM cdd GROUP BY 1),
         |cdp AS (SELECT a.dom AS domain_a, b.dom AS domain_b,
         |    CAST(count(*) AS BIGINT) AS shared
         |  FROM cdd a JOIN cdd b ON a.h = b.h AND a.dom < b.dom
         |  JOIN cdw w ON w.h = a.h AND w.nd BETWEEN 2 AND 64
         |  GROUP BY 1, 2)
         |SELECT p.domain_a, p.domain_b, p.shared AS shared_shingles,
         |  CAST(p.shared * 100 // ta.types AS BIGINT) AS share_a_x100,
         |  CAST(p.shared * 100 // tb.types AS BIGINT) AS share_b_x100
         |FROM cdp p JOIN cdt ta ON ta.dom = p.domain_a
         |JOIN cdt tb ON tb.dom = p.domain_b
         |ORDER BY p.domain_a, p.domain_b""".stripMargin) { (s, d) =>
      Dedup.crossDomainDup(Tables.documents(s, d))
    }.sortedBy(col("domain_a"), col("domain_b")),

    // ── SoftDeDup duplicate-aware reweighting (She et al. 2024) ────
    // Commonness = mean corpus df of the doc's distinct 3-gram
    // shingles; weight = its reciprocal, integer-exact
    // (weight_x100 = 10000 div ((Σdf·100) div n_shingles)).
    QueryDef("t_softdedup_weights",
      s"""WITH $hashesCte,
         |sdx AS (SELECT doc_id, unnest(hs) AS h FROM hashes
         |        WHERE hs IS NOT NULL),
         |sdf AS (SELECT h, CAST(count(*) AS BIGINT) AS df
         |        FROM sdx GROUP BY 1),
         |sda AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ns,
         |    CAST(sum(f.df) AS BIGINT) AS sdfs
         |  FROM sdx x JOIN sdf f USING (h) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(a.ns, 0) AS n_shingles,
         |  coalesce(a.sdfs, 0) AS sum_df,
         |  CASE WHEN coalesce(a.ns, 0) > 0
         |       THEN CAST((a.sdfs * 100) // a.ns AS BIGINT)
         |       ELSE 0 END AS commonness_x100,
         |  CASE WHEN coalesce(a.ns, 0) > 0
         |       THEN CAST(10000 // ((a.sdfs * 100) // a.ns) AS BIGINT)
         |       ELSE 100 END AS weight_x100
         |FROM documents d LEFT JOIN sda a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Dedup.softDedupWeights(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // SoftDeDup SELECTION over a corpus with PLANTED duplicate
    // clusters (each doc_id < 20 appears 3×) — the deterministic
    // polyhash keep rule applies each doc's weight, so the planted
    // clusters contribute ~1 doc's worth of mass instead of 3.
    QueryDef("t_softdedup_sample", {
      val chain = LlmOracle.hashesCteFrom("pl")
      s"""WITH pl AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000, text FROM documents
         |  WHERE doc_id < 20 AND text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id + 3000000, text FROM documents
         |  WHERE doc_id < 20 AND text IS NOT NULL),
         |$chain,
         |sdx AS (SELECT doc_id, unnest(hs) AS h FROM hashes
         |        WHERE hs IS NOT NULL),
         |sdf AS (SELECT h, CAST(count(*) AS BIGINT) AS df
         |        FROM sdx GROUP BY 1),
         |sda AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ns,
         |    CAST(sum(f.df) AS BIGINT) AS sdfs
         |  FROM sdx x JOIN sdf f USING (h) GROUP BY 1),
         |wts AS (SELECT d.doc_id,
         |  CASE WHEN coalesce(a.ns, 0) > 0
         |       THEN CAST(10000 // ((a.sdfs * 100) // a.ns) AS BIGINT)
         |       ELSE 100 END AS weight_x100
         |  FROM pl d LEFT JOIN sda a USING (doc_id))
         |SELECT doc_id, weight_x100 FROM wts
         |WHERE (${polyhash("CAST(doc_id AS VARCHAR)")} % 10000) * 100
         |      < 10000 * weight_x100
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val dup = docs.filter(col("doc_id") < 20 && col("text").isNotNull)
      val planted = docs.select(col("doc_id"), col("text"))
        .union(dup.select((col("doc_id") + 2000000).as("doc_id"), col("text")))
        .union(dup.select((col("doc_id") + 3000000).as("doc_id"), col("text")))
      Dedup.softDedupSample(planted)
    }.sortedBy(col("doc_id")),

    // ── Naive Bayes: model-based filtering (fastText analog) ───────
    // Multinomial NB trained distributed on the lang label — the
    // learned language-ID / quality-classifier shape every CCNet-style
    // pipeline runs. Integer-exact floor-log2 likelihoods (the
    // t_surprisal bin-length trick), so DuckDB replays the MODEL
    // bit-for-bit: bits(w,c) = L(tok_c + V) - L(cnt+1).
    QueryDef("t_nb_model",
      s"""WITH vtf AS (SELECT lang AS label,
         |    unnest(string_split(text, ' ')) AS word
         |  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
         |vwc AS (SELECT label, word, CAST(count(*) AS BIGINT) AS cnt
         |  FROM vtf GROUP BY 1, 2),
         |vv AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM vwc),
         |vtok AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tok
         |  FROM vwc GROUP BY 1),
         |vcls AS (SELECT t.label, CAST(t.tok + vv.v AS BIGINT) AS denom
         |  FROM vtok t CROSS JOIN vv)
         |SELECT w.label, w.word, w.cnt,
         |  CAST(length(bin(c.denom)) - length(bin(w.cnt + 1)) AS BIGINT)
         |    AS bits
         |FROM vwc w JOIN vcls c USING (label)
         |ORDER BY label, word""".stripMargin) { (s, d) =>
      TextAnalysis.nbModel(Tables.documents(s, d))
    }.sortedBy(col("label"), col("word")),

    // ... and CLASSIFY the corpus under that model: per doc the
    // minimum-total-bits class (prior + summed evidence, add-one
    // smoothed defaults for in-vocab words unseen in a class, OOV
    // dropped), margin = runner-up - winner. The oracle replays the
    // identical integer argmin with a window.
    QueryDef("t_nb_classify", nbClassifyLangSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      TextAnalysis.classifyNaiveBayes(docs, docs)
    }.sortedBy(col("doc_id")),

    // The SAME chain with the model ROUND-TRIPPED THROUGH DISK
    // (writeNbBundle → bucketed tables + _meta → loadNbBundle →
    // classifyWith): one oracle gates that a persisted bundle
    // classifies bit-identically to in-session training — the
    // train-once/reuse-across-jobs lifecycle a 100 TB pipeline needs
    // (round-14 verdict ask #4).
    QueryDef("t_nb_classify_persisted", nbClassifyLangSql) { (s, d) =>
      val bundle = TextAnalysis.loadNbBundle(s, nbBundleFor(s, d))
      TextAnalysis.classifyWith(Tables.documents(s, d), bundle)
    }.sortedBy(col("doc_id")),

    // ── Model-based quality classifier (rule-gate as teacher) ──────
    // Docs labeled good/bad by the replayed quality rules (shared
    // qualityCtes), the word-unigram NB chain trains on those labels
    // and scores every document — same nbWordCtes the language
    // classifier consumes, different teacher.
    QueryDef("t_quality_classifier", qualityClassifySql) { (s, d) =>
      TextAnalysis.qualityClassifier(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // The SAME chain with the model ROUND-TRIPPED THROUGH DISK
    // (writeQualityBundle → bucketed tables + _meta → loadNbBundle →
    // classifyWith) — the t_nb_classify_persisted lifecycle for the
    // QUALITY teacher (round-15 verdict ask #4): one oracle gates
    // that the persisted quality model scores bit-identically to
    // in-session training.
    QueryDef("t_quality_classifier_persisted", qualityClassifySql) { (s, d) =>
      val bundle = TextAnalysis.loadNbBundle(s, qualityBundleFor(s, d))
      TextAnalysis.classifyWith(Tables.documents(s, d), bundle)
    }.sortedBy(col("doc_id")),

    // ── Exact ROC-AUC of the learned quality classifier against its
    // rule teacher: score = signed NB margin toward 'good' (margin if
    // pred good, −margin otherwise — integer), label = the teacher
    // rule (quality ≥ 3); Mann–Whitney rank-sum with half-credit ties,
    // the whole law three integers — the calibration number that says
    // whether the student's CONFIDENCE actually ranks the teacher's
    // verdicts.
    // Both calibration gates score under the PERSISTED quality bundle
    // (bit-identical to inline training by the
    // t_quality_classifier_persisted gate) — the train-once shape, so
    // the bench pays scoring-only cost, not a third and fourth NB
    // training.
    QueryDef("t_roc_auc",
      s"""WITH $qualityNbCtes,
         |rlab AS (SELECT doc_id, quality >= 3 AS lab FROM qscored
         |  WHERE text IS NOT NULL),
         |rsc AS (SELECT c.doc_id,
         |    CASE WHEN c.pred = 'good' THEN c.margin
         |         ELSE -c.margin END AS score, l.lab
         |  FROM qcls c JOIN rlab l USING (doc_id)),
         |rby AS (SELECT score,
         |    CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS p,
         |    CAST(sum(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS n
         |  FROM rsc GROUP BY 1),
         |rpre AS (SELECT score, p, n,
         |    CAST(coalesce(sum(n) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS nb
         |  FROM rby),
         |ragg AS (SELECT
         |    CAST(coalesce(sum(p), 0) AS BIGINT) AS n_pos,
         |    CAST(coalesce(sum(n), 0) AS BIGINT) AS n_neg,
         |    CAST(coalesce(sum(p * (2 * nb + n)), 0) AS BIGINT) AS u2
         |  FROM rpre)
         |SELECT n_pos, n_neg, u2,
         |  CAST(CASE WHEN n_pos > 0 AND n_neg > 0
         |    THEN (u2 * 10000) // (2 * n_pos * n_neg) END AS BIGINT)
         |    AS auc_x10000
         |FROM ragg""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cls = TextAnalysis.classifyWith(docs,
        TextAnalysis.loadNbBundle(s, qualityBundleFor(s, d)))
      val lab = docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          (TextAnalysis.qualityScore(col("text")) >= 3).as("label"))
      val scored = cls.join(lab, "doc_id")
        .select(when(col("pred") === "good", col("margin"))
          .otherwise(-col("margin")).as("score"), col("label"))
      graft.ext.Eval.rocAuc(scored)
    },

    // ── Margin-bucket reliability of the quality classifier: per
    // 16-bit margin bucket, how often the NB prediction agrees with
    // its rule teacher — the calibration table that says WHERE a
    // margin threshold earns its keep (t_roc_auc's ranking number,
    // resolved along the confidence axis).
    QueryDef("t_margin_reliability",
      s"""WITH $qualityNbCtes,
         |mlab AS (SELECT doc_id,
         |    CASE WHEN quality >= 3 THEN 'good' ELSE 'bad' END AS ref
         |  FROM qscored WHERE text IS NOT NULL),
         |mj AS (SELECT c.margin // 16 AS bucket,
         |    CASE WHEN c.pred = l.ref THEN 1 ELSE 0 END AS ok
         |  FROM qcls c JOIN mlab l USING (doc_id)),
         |mb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(ok) AS BIGINT) AS n_correct
         |  FROM mj GROUP BY 1)
         |SELECT CAST(bucket AS BIGINT) AS bucket, n, n_correct,
         |  CAST((n_correct * 10000) // n AS BIGINT) AS acc_x10000
         |FROM mb ORDER BY bucket""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cls = TextAnalysis.classifyWith(docs,
        TextAnalysis.loadNbBundle(s, qualityBundleFor(s, d)))
      val refs = docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(TextAnalysis.qualityScore(col("text")) >= 3, lit("good"))
            .otherwise(lit("bad")).as("ref"))
      graft.ext.Eval.marginReliability(cls, refs, bucketWidth = 16L)
    }.sortedBy(col("bucket")),

    // ── Uncertainty sampling: per source, the 5 docs the quality
    // classifier is LEAST sure about (smallest margin) — the
    // active-learning "label these next" list, bounded-heap cut.
    QueryDef("t_uncertainty_sample",
      s"""WITH $qualityNbCtes,
         |usrc AS (SELECT c.doc_id, d.source, c.pred, c.margin
         |  FROM qcls c JOIN documents d USING (doc_id)
         |  WHERE d.text IS NOT NULL),
         |urk AS (SELECT doc_id, source, pred, margin,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY margin, doc_id) AS rn
         |  FROM usrc)
         |SELECT doc_id, source, pred, margin, CAST(rn AS BIGINT) AS rank
         |FROM urk WHERE rn <= 5
         |ORDER BY source, rank""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val cls = TextAnalysis.classifyWith(docs,
        TextAnalysis.loadNbBundle(s, qualityBundleFor(s, d)))
        .select(col("doc_id"), col("pred"), col("margin"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      graft.ext.Sampling.uncertaintySample(cls, k = 5)
        .select(col("doc_id"), col("source"), col("pred"),
          col("margin"), col("rank"))
    }.sortedBy(col("source"), col("rank")),

    // ── Drift-CUSUM trajectory (the pure batch face of the streaming
    // monitor): doc_id % 4 as four ordered batches — batch 1 PLANTED
    // all-null-text so quality_rate/short_doc_rate go ABSENT
    // mid-trajectory and the carry-forward law is actually exercised
    // — the three ×10⁴ quality-shape rates per batch vs the
    // whole-corpus profile, the up/down CUSUM pages folded by a
    // recursive CTE that steps over BATCH INDEX (state carried through
    // absent batches, rows emitted only where the metric is present,
    // mirroring cusumTrajectory exactly).
    QueryDef("t_drift_trajectory",
      s"""WITH RECURSIVE ${qualityCtes("documents")},
         |ddb AS (SELECT d.doc_id % 4 AS b,
         |    (d.text IS NULL OR d.doc_id % 4 = 1) AS isn,
         |    d.text IS NULL AS isno,
         |    q.quality, qb.n_tokens
         |  FROM documents d
         |  LEFT JOIN qscored q ON q.doc_id = d.doc_id
         |  LEFT JOIN qbase qb ON qb.doc_id = d.doc_id),
         |drates AS (SELECT b,
         |    CASE WHEN count(*) > 0 THEN
         |      (sum(CASE WHEN isn THEN 1 ELSE 0 END) * 10000)
         |        // count(*) END AS nullr,
         |    CASE WHEN sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) > 0 THEN
         |      (sum(CASE WHEN NOT isn AND quality >= 3 THEN 1 ELSE 0 END)
         |        * 10000)
         |        // sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) END AS qr,
         |    CASE WHEN sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) > 0 THEN
         |      (sum(CASE WHEN NOT isn AND n_tokens < 10 THEN 1 ELSE 0 END)
         |        * 10000)
         |        // sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) END AS sr
         |  FROM ddb GROUP BY b),
         |dtall AS (
         |  SELECT b, 'null_text_rate' AS metric, nullr AS x FROM drates
         |    WHERE nullr IS NOT NULL
         |  UNION ALL SELECT b, 'quality_rate', qr FROM drates
         |    WHERE qr IS NOT NULL
         |  UNION ALL SELECT b, 'short_doc_rate', sr FROM drates
         |    WHERE sr IS NOT NULL),
         |dmu AS (SELECT metric, x AS mu FROM (
         |  SELECT 'null_text_rate' AS metric,
         |    CASE WHEN count(*) > 0 THEN
         |      (sum(CASE WHEN isno THEN 1 ELSE 0 END) * 10000)
         |        // count(*) END AS x FROM ddb
         |  UNION ALL SELECT 'quality_rate',
         |    CASE WHEN sum(CASE WHEN NOT isno THEN 1 ELSE 0 END) > 0 THEN
         |      (sum(CASE WHEN NOT isno AND quality >= 3 THEN 1 ELSE 0 END)
         |        * 10000)
         |        // sum(CASE WHEN NOT isno THEN 1 ELSE 0 END) END FROM ddb
         |  UNION ALL SELECT 'short_doc_rate',
         |    CASE WHEN sum(CASE WHEN NOT isno THEN 1 ELSE 0 END) > 0 THEN
         |      (sum(CASE WHEN NOT isno AND n_tokens < 10 THEN 1 ELSE 0 END)
         |        * 10000)
         |        // sum(CASE WHEN NOT isno THEN 1 ELSE 0 END) END FROM ddb)
         |  WHERE x IS NOT NULL),
         |dcus(b, metric, x, s_up, s_dn) AS (
         |  SELECT 0, m.metric, t.x,
         |    CASE WHEN t.x IS NULL THEN 0
         |         ELSE greatest(0, t.x - m.mu - 200) END,
         |    CASE WHEN t.x IS NULL THEN 0
         |         ELSE greatest(0, m.mu - t.x - 200) END
         |  FROM dmu m LEFT JOIN dtall t ON t.metric = m.metric
         |    AND t.b = 0
         |  UNION ALL
         |  SELECT c.b + 1, c.metric, t.x,
         |    CASE WHEN t.x IS NULL THEN c.s_up
         |         ELSE greatest(0, c.s_up + (t.x - m.mu - 200)) END,
         |    CASE WHEN t.x IS NULL THEN c.s_dn
         |         ELSE greatest(0, c.s_dn + (m.mu - t.x - 200)) END
         |  FROM dcus c JOIN dmu m ON m.metric = c.metric
         |  LEFT JOIN dtall t ON t.metric = c.metric AND t.b = c.b + 1
         |  WHERE c.b < 3)
         |SELECT CAST(b AS BIGINT) AS batch_idx, metric,
         |  CAST(x AS BIGINT) AS x, CAST(s_up AS BIGINT) AS s_up,
         |  CAST(s_dn AS BIGINT) AS s_dn
         |FROM dcus WHERE x IS NOT NULL
         |ORDER BY batch_idx, metric""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val batches = (0 to 3).map { i =>
        val b = docs.filter(col("doc_id") % 4 === i)
        if (i == 1) b.withColumn("text", lit(null).cast("string")) else b
      }
      val profile = graft.streaming.DriftMonitor.metrics(docs)
        .select(col("metric"), col("x").as("mu"))
      graft.streaming.DriftMonitor.cusumTrajectory(batches, profile)
    }.sortedBy(col("batch_idx"), col("metric")),

    // ── PER-DOMAIN drift trajectory: the "WHICH source drifted"
    // readout — per-source CUSUM pages against per-source baselines
    // (a one-domain collapse moves the global rate by 1/|domains|,
    // under slack; it pages its own CUSUM at full strength). Batches
    // by polyhash(doc_id) % 4 (hash "arrival order" — doc_id % 4 is
    // perfectly correlated with source in this corpus), carry-forward
    // through (source, batch) cells the hash leaves empty.
    QueryDef("t_drift_by_domain", {
      val b4 = s"${polyhash("CAST(d.doc_id AS VARCHAR)")} % 10000 % 4"
      s"""WITH RECURSIVE ${qualityCtes("documents")},
         |ddb AS (SELECT d.source, $b4 AS b, d.text IS NULL AS isn,
         |    q.quality, qb.n_tokens
         |  FROM documents d
         |  LEFT JOIN qscored q ON q.doc_id = d.doc_id
         |  LEFT JOIN qbase qb ON qb.doc_id = d.doc_id),
         |drates AS (SELECT source, b,
         |    CASE WHEN count(*) > 0 THEN
         |      (sum(CASE WHEN isn THEN 1 ELSE 0 END) * 10000)
         |        // count(*) END AS nullr,
         |    CASE WHEN sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) > 0 THEN
         |      (sum(CASE WHEN NOT isn AND quality >= 3 THEN 1 ELSE 0 END)
         |        * 10000)
         |        // sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) END AS qr,
         |    CASE WHEN sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) > 0 THEN
         |      (sum(CASE WHEN NOT isn AND n_tokens < 10 THEN 1 ELSE 0 END)
         |        * 10000)
         |        // sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) END AS sr
         |  FROM ddb GROUP BY source, b),
         |dtall AS (
         |  SELECT source, b, 'null_text_rate' AS metric, nullr AS x
         |    FROM drates WHERE nullr IS NOT NULL
         |  UNION ALL SELECT source, b, 'quality_rate', qr FROM drates
         |    WHERE qr IS NOT NULL
         |  UNION ALL SELECT source, b, 'short_doc_rate', sr FROM drates
         |    WHERE sr IS NOT NULL),
         |dmug AS (SELECT source, metric, x AS mu FROM (
         |  SELECT source, 'null_text_rate' AS metric,
         |    CASE WHEN count(*) > 0 THEN
         |      (sum(CASE WHEN isn THEN 1 ELSE 0 END) * 10000)
         |        // count(*) END AS x FROM ddb GROUP BY source
         |  UNION ALL SELECT source, 'quality_rate',
         |    CASE WHEN sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) > 0 THEN
         |      (sum(CASE WHEN NOT isn AND quality >= 3 THEN 1 ELSE 0 END)
         |        * 10000)
         |        // sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) END
         |    FROM ddb GROUP BY source
         |  UNION ALL SELECT source, 'short_doc_rate',
         |    CASE WHEN sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) > 0 THEN
         |      (sum(CASE WHEN NOT isn AND n_tokens < 10 THEN 1 ELSE 0 END)
         |        * 10000)
         |        // sum(CASE WHEN NOT isn THEN 1 ELSE 0 END) END
         |    FROM ddb GROUP BY source)
         |  WHERE x IS NOT NULL),
         |dcus(b, source, metric, x, s_up, s_dn) AS (
         |  SELECT 0, m.source, m.metric, t.x,
         |    CASE WHEN t.x IS NULL THEN 0
         |         ELSE greatest(0, t.x - m.mu - 200) END,
         |    CASE WHEN t.x IS NULL THEN 0
         |         ELSE greatest(0, m.mu - t.x - 200) END
         |  FROM dmug m LEFT JOIN dtall t ON t.source = m.source
         |    AND t.metric = m.metric AND t.b = 0
         |  UNION ALL
         |  SELECT c.b + 1, c.source, c.metric, t.x,
         |    CASE WHEN t.x IS NULL THEN c.s_up
         |         ELSE greatest(0, c.s_up + (t.x - m.mu - 200)) END,
         |    CASE WHEN t.x IS NULL THEN c.s_dn
         |         ELSE greatest(0, c.s_dn + (m.mu - t.x - 200)) END
         |  FROM dcus c JOIN dmug m ON m.source = c.source
         |    AND m.metric = c.metric
         |  LEFT JOIN dtall t ON t.source = c.source
         |    AND t.metric = c.metric AND t.b = c.b + 1
         |  WHERE c.b < 3)
         |SELECT CAST(b AS BIGINT) AS batch_idx, source, metric,
         |  CAST(x AS BIGINT) AS x, CAST(s_up AS BIGINT) AS s_up,
         |  CAST(s_dn AS BIGINT) AS s_dn
         |FROM dcus WHERE x IS NOT NULL
         |ORDER BY batch_idx, source, metric""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val withB = docs.withColumn("__db_b",
        graft.ext.Sampling.bucket(col("doc_id")) % 4)
      val batches = (0 to 3).map(i =>
        withB.filter(col("__db_b") === i).drop("__db_b"))
      val profile = graft.streaming.DriftMonitor.metricsBy(docs)
        .select(col("source"), col("metric"), col("x").as("mu"))
      graft.streaming.DriftMonitor.cusumTrajectoryBy(batches, profile)
    }.sortedBy(col("batch_idx"), col("source"), col("metric")),

    // ── Per-domain AUC: the same signed-margin ranking law resolved
    // per source — the readout that says WHICH corpus slice the
    // learned gate actually ranks well (a per-group prefix window, so
    // no global sort exists anywhere in this variant).
    QueryDef("t_roc_auc_by",
      s"""WITH $qualityNbCtes,
         |rlab AS (SELECT doc_id, quality >= 3 AS lab FROM qscored
         |  WHERE text IS NOT NULL),
         |rsc AS (SELECT d.source, c.doc_id,
         |    CASE WHEN c.pred = 'good' THEN c.margin
         |         ELSE -c.margin END AS score, l.lab
         |  FROM qcls c JOIN rlab l USING (doc_id)
         |  JOIN documents d USING (doc_id)),
         |rby AS (SELECT source, score,
         |    CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS p,
         |    CAST(sum(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS n
         |  FROM rsc GROUP BY 1, 2),
         |rpre AS (SELECT source, score, p, n,
         |    CAST(coalesce(sum(n) OVER (PARTITION BY source
         |      ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS nb
         |  FROM rby)
         |SELECT source,
         |  CAST(sum(p) AS BIGINT) AS n_pos,
         |  CAST(sum(n) AS BIGINT) AS n_neg,
         |  CAST(sum(p * (2 * nb + n)) AS BIGINT) AS u2,
         |  CAST(CASE WHEN sum(p) > 0 AND sum(n) > 0
         |    THEN (sum(p * (2 * nb + n)) * 10000)
         |      // (2 * sum(p) * sum(n)) END AS BIGINT) AS auc_x10000
         |FROM rpre GROUP BY source
         |ORDER BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cls = TextAnalysis.classifyWith(docs,
        TextAnalysis.loadNbBundle(s, qualityBundleFor(s, d)))
      val lab = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          (TextAnalysis.qualityScore(col("text")) >= 3).as("label"))
      val scored = cls.join(lab, "doc_id")
        .select(col("source"),
          when(col("pred") === "good", col("margin"))
            .otherwise(-col("margin")).as("score"), col("label"))
      graft.ext.Eval.rocAucBy(scored)
    }.sortedBy(col("source")),

    // ── Per-domain accuracy of the learned quality gate vs its rule
    // teacher, with 95% Wilson bounds — the evidence-bearing accuracy
    // table (same engine-exact float law as w_win_rates).
    QueryDef("t_accuracy_ci",
      s"""WITH $qualityNbCtes,
         |alab AS (SELECT q.doc_id, d.source,
         |    CASE WHEN q.quality >= 3 THEN 'good' ELSE 'bad' END AS r
         |  FROM qscored q JOIN documents d USING (doc_id)
         |  WHERE q.text IS NOT NULL),
         |aagg AS (SELECT l.source,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN c.pred = l.r THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_correct
         |  FROM qcls c JOIN alab l USING (doc_id)
         |  GROUP BY 1)
         |SELECT source, n, n_correct,
         |  CAST((n_correct * 10000) // n AS BIGINT) AS acc_x10000,
         |  CAST(floor(10000.0 * (((n_correct + 1.9208)
         |    - 1.96 * sqrt(CAST(n_correct * (n - n_correct) AS DOUBLE)
         |        / CAST(n AS DOUBLE) + 0.9604))
         |    / (CAST(n AS DOUBLE) + 3.8416))) AS BIGINT)
         |    AS wilson_lo_x10000,
         |  CAST(floor(10000.0 * (((n_correct + 1.9208)
         |    + 1.96 * sqrt(CAST(n_correct * (n - n_correct) AS DOUBLE)
         |        / CAST(n AS DOUBLE) + 0.9604))
         |    / (CAST(n AS DOUBLE) + 3.8416))) AS BIGINT)
         |    AS wilson_hi_x10000
         |FROM aagg ORDER BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val nb = TextAnalysis.classifyWith(docs,
        TextAnalysis.loadNbBundle(s, qualityBundleFor(s, d)))
        .select(col("doc_id"), col("pred"))
      val teacher = docs.select(col("doc_id"), col("source"),
        when(TextAnalysis.qualityScore(col("text")) >= 3, lit("good"))
          .otherwise(lit("bad")).as("ref"))
      graft.ext.Eval.accuracyCi(nb, teacher)
    }.sortedBy(col("source")),

    // ── McNemar paired test: does the LEARNED quality gate beat the
    // single-feature length baseline on rule-teacher agreement, with
    // statistical support? Discordant counts only, exact integer χ²,
    // significance against the documented 3.8415 critical literal.
    QueryDef("t_mcnemar",
      s"""WITH $qualityNbCtes,
         |nref AS (SELECT doc_id,
         |    CASE WHEN quality >= 3 THEN 'good' ELSE 'bad' END AS r
         |  FROM qscored WHERE text IS NOT NULL),
         |nbase AS (SELECT doc_id,
         |    CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 'good'
         |         ELSE 'bad' END AS pb
         |  FROM qbase WHERE text IS NOT NULL),
         |ncell AS (SELECT (c.pred = r.r) AS ra, (b.pb = r.r) AS rb
         |  FROM qcls c JOIN nbase b USING (doc_id)
         |  JOIN nref r USING (doc_id)),
         |nagg AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
         |    CAST(sum(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n11,
         |    CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n10,
         |    CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n01,
         |    CAST(sum(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n00
         |  FROM ncell)
         |SELECT n_items, n11, n10, n01, n00,
         |  CAST(CASE WHEN n10 + n01 > 0
         |    THEN ((n10 - n01) * (n10 - n01) * 10000) // (n10 + n01)
         |    END AS BIGINT) AS chi2_x10000,
         |  coalesce(CASE WHEN n10 + n01 > 0
         |    THEN ((n10 - n01) * (n10 - n01) * 10000) // (n10 + n01)
         |      > 38415 END, FALSE) AS significant_05
         |FROM nagg""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val nb = TextAnalysis.classifyWith(docs,
        TextAnalysis.loadNbBundle(s, qualityBundleFor(s, d)))
        .select(col("doc_id"), col("pred"))
      val baseline = docs.select(col("doc_id"),
        when(TextAnalysis.tokenCount(col("text")).between(10, 1000),
          lit("good")).otherwise(lit("bad")).as("pred"))
      val teacher = docs.select(col("doc_id"),
        when(TextAnalysis.qualityScore(col("text")) >= 3, lit("good"))
          .otherwise(lit("bad")).as("ref"))
      graft.ext.Eval.mcnemar(nb, baseline, teacher)
    },

    // ── Char-trigram NB language ID (fastText analog) ──────────────
    // The t_nb_classify chain with ONE substitution: both training and
    // classified text pass through the char-trigram re-encoding
    // (spaces → '_', every 3-char substring; short texts survive as
    // their collapsed form) — orthographic evidence instead of word
    // unigrams, the upgrade that classifies text whose words are OOV.
    // ── Unicode-script profile: the model-free orthographic routing
    // signal — per doc, code-point counts per BMP script range (length
    // delta of a strip-regex — pure codegen'd string ops, zero
    // shuffle), dominant script + ×100 share. Multibyte fixtures
    // PLANTED in SQL on both sides (Cyrillic/Greek/CJK+Arabic+Hangul
    // tails by doc_id % 6); every range strictly inside the BMP so
    // Java code units and RE2 code points count identically.
    QueryDef("t_script_profile", {
      val ranges = Seq("latin" -> "[A-Za-z]", "digit" -> "[0-9]",
        "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
        "greek" -> "[\\x{0370}-\\x{03FF}]",
        "arabic" -> "[\\x{0600}-\\x{06FF}]",
        "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
        "hangul" -> "[\\x{AC00}-\\x{D7A3}]")
      val cnts = ranges.map { case (nm, re) =>
        s"""  CAST(length(s) - length(regexp_replace(s, '$re', '', 'g'))
           |    AS BIGINT) AS n_$nm""".stripMargin
      }.mkString(",\n")
      val packs = ranges.map { case (nm, _) =>
        s"struct_pack(nm := '$nm', c := n_$nm)"
      }.mkString(",\n    ")
      s"""WITH sp AS (SELECT doc_id,
         |  CASE CAST(doc_id % 6 AS INTEGER)
         |    WHEN 0 THEN coalesce(text, '') || ' привет мир'
         |    WHEN 1 THEN coalesce(text, '') || ' γεια σου'
         |    WHEN 2 THEN coalesce(text, '') || ' 你好世界 مرحبا 안녕하세요'
         |    ELSE coalesce(text, '') END AS s
         |  FROM documents),
         |counts AS (SELECT doc_id,
         |  CAST(length(s) AS BIGINT) AS n_chars,
         |$cnts
         |  FROM sp),
         |tall AS (SELECT doc_id, unnest([
         |    $packs]) AS t FROM counts),
         |top AS (SELECT doc_id, t.nm AS nm, t.c AS c,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY t.c DESC, t.nm) AS rn
         |  FROM tall)
         |SELECT c.*,
         |  CASE WHEN t.c = 0 THEN 'none' ELSE t.nm END
         |    AS dominant_script,
         |  CAST(CASE WHEN t.c = 0 THEN 0
         |    ELSE (t.c * 100) // c.n_chars END AS BIGINT)
         |    AS dominant_share_x100
         |FROM counts c JOIN top t ON t.doc_id = c.doc_id AND t.rn = 1
         |ORDER BY c.doc_id""".stripMargin
    }) { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 6 === 0,
          concat(coalesce(col("text"), lit("")), lit(" привет мир")))
          .when(col("doc_id") % 6 === 1,
            concat(coalesce(col("text"), lit("")), lit(" γεια σου")))
          .when(col("doc_id") % 6 === 2,
            concat(coalesce(col("text"), lit("")),
              lit(" 你好世界 مرحبا 안녕하세요")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.scriptProfile(planted)
    }.sortedBy(col("doc_id")),

    QueryDef("t_nb_langid", nbLangIdSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      TextAnalysis.classifyLangId(docs, docs)
    }.sortedBy(col("doc_id")),

    // The SAME chain under the char-trigram bundle ROUND-TRIPPED
    // THROUGH DISK (writeNbBundle tokenizer='char3' → loadNbBundle →
    // classifyWith) — the t_nb_classify_persisted lifecycle for the
    // language-ID space: train once, score everywhere, bit-identical.
    QueryDef("t_nb_langid_persisted", nbLangIdSql) { (s, d) =>
      val bundle = TextAnalysis.loadNbBundle(s, langIdBundleFor(s, d))
      TextAnalysis.classifyWith(Tables.documents(s, d), bundle)
    }.sortedBy(col("doc_id")),

    // ── Code-switch detection (per-chunk language mixture) ─────────
    // Non-overlapping 30-token chunks, each language-ID'd by the SAME
    // char-trigram NB chain (nbLangIdCtesFor with the chunk relation as
    // the scoring side), rolled up per doc: chunk count, distinct
    // predicted languages, dominant language + share, switched flag.
    QueryDef("t_code_switch", codeSwitchSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      TextAnalysis.codeSwitch(docs, docs)
    }.sortedBy(col("doc_id")),

    // ... and per-chunk language ID under the PERSISTED char-trigram
    // bundle (codeSwitchWith) — the round's heaviest inline-training
    // flagship on its train-once path, gated bit-identical by the same
    // SQL.
    QueryDef("t_code_switch_persisted", codeSwitchSql) { (s, d) =>
      val bundle = TextAnalysis.loadNbBundle(s, langIdBundleFor(s, d))
      TextAnalysis.codeSwitchWith(Tables.documents(s, d), bundle)
    }.sortedBy(col("doc_id")),

    // Per-domain quality pass rates: the gate dashboard per source.
    QueryDef("t_domain_quality_rate",
      s"""WITH ${qualityCtes("documents")}
         |SELECT d.source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN d.text IS NULL THEN 0
         |           WHEN q.quality >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pass,
         |  (CAST(sum(CASE WHEN d.text IS NULL THEN 0
         |           WHEN q.quality >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |    * 100 // count(*)) AS pass_x100
         |FROM documents d JOIN qscored q USING (doc_id)
         |WHERE d.source IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("source").isNotNull)
      docs.select(col("source"),
          when(col("text").isNull, 0L)
            .otherwise(when(TextAnalysis.qualityScore(col("text")) >= 3, 1L)
              .otherwise(0L)).as("__dq_p"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("__dq_p").as("n_pass"))
        .withColumn("pass_x100", expr("n_pass * 100 div n_docs"))
    }.sortedBy(col("source")),

    // ── Lexical diversity (TTR + per-domain hapax profile) ─────────
    QueryDef("t_lexical_diversity",
      """SELECT doc_id,
        |  CAST(CASE WHEN text IS NULL THEN 0
        |       ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN text IS NULL THEN 0
        |       ELSE len(list_distinct(string_split(text, ' '))) END
        |    AS BIGINT) AS n_types,
        |  CAST(CASE WHEN text IS NULL OR len(string_split(text, ' ')) = 0
        |       THEN 0
        |       ELSE len(list_distinct(string_split(text, ' '))) * 100
        |            // len(string_split(text, ' ')) END AS BIGINT)
        |    AS ttr_x100
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.lexicalDiversity(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    QueryDef("t_domain_lexical",
      """WITH dlw AS (SELECT source, word, CAST(sum(tf) AS BIGINT) AS cnt
        |  FROM (SELECT source, word, count(*) AS tf FROM (
        |      SELECT doc_id, source,
        |        unnest(string_split(text, ' ')) AS word
        |      FROM documents
        |      WHERE text IS NOT NULL AND source IS NOT NULL) u
        |    GROUP BY source, word, doc_id) g
        |  GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS vocab_size,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hapax_count,
        |  (CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 100 // count(*)) AS hapax_x100
        |FROM dlw GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      TextAnalysis.domainLexicalProfile(Tables.documents(s, d))
    }.sortedBy(col("source")),

    // ── Corpus-driven stopword discovery ───────────────────────────
    // Words in >= 40% of documents by exact df (integer
    // cross-multiplied) — how a stopword list is built for a language
    // the curated lists don't cover. wordTfs emits distinct words per
    // doc, so counting rows IS df.
    QueryDef("t_stopword_discovery",
      """WITH swd AS (SELECT doc_id, word, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL) u GROUP BY 1, 2),
        |swf AS (SELECT word, CAST(count(*) AS BIGINT) AS df
        |  FROM swd GROUP BY 1),
        |swn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents
        |        WHERE text IS NOT NULL)
        |SELECT word, df, (df * 100 // n) AS df_x100
        |FROM swf CROSS JOIN swn WHERE df * 100 >= 40 * n
        |ORDER BY word""".stripMargin) { (s, d) =>
      TextAnalysis.discoverStopwords(Tables.documents(s, d),
        minDfX100 = 40L)
    }.sortedBy(col("word")),

    // ── Vocabulary drift between snapshots ─────────────────────────
    // Old = even doc_ids, new = odd; per-word ppm share on each side,
    // top-20 absolute movers. Integer ppm — no float log-ratio.
    QueryDef("t_vocab_drift",
      s"""WITH vow AS (SELECT unnest(string_split(text, ' ')) AS word
         |  FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL),
         |voc AS (SELECT word, CAST(count(*) AS BIGINT) AS c_old
         |  FROM vow GROUP BY 1),
         |vnw AS (SELECT unnest(string_split(text, ' ')) AS word
         |  FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL),
         |vnc AS (SELECT word, CAST(count(*) AS BIGINT) AS c_new
         |  FROM vnw GROUP BY 1),
         |vot AS (SELECT CAST(sum(c_old) AS BIGINT) AS t FROM voc),
         |vnt AS (SELECT CAST(sum(c_new) AS BIGINT) AS t FROM vnc),
         |vj AS (SELECT coalesce(o.word, n.word) AS word,
         |    coalesce(o.c_old, 0) AS c_old, coalesce(n.c_new, 0) AS c_new
         |  FROM voc o FULL OUTER JOIN vnc n ON o.word = n.word),
         |vd AS (SELECT word, c_old, c_new,
         |    abs(c_new * 1000000 // vnt.t - c_old * 1000000 // vot.t)
         |      AS drift_x1m
         |  FROM vj CROSS JOIN vot CROSS JOIN vnt)
         |SELECT word, c_old, c_new, drift_x1m,
         |  CAST(row_number() OVER (ORDER BY drift_x1m DESC, word)
         |    AS BIGINT) AS rank
         |FROM vd ORDER BY drift_x1m DESC, word LIMIT 20""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        graft.ext.Curation.vocabDrift(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), k = 20)
    }.sortedBy(col("rank")),

    // ── Per-domain language mixture (multilingual source report) ───
    // Every doc language-ID'd by the shared NB chain, rolled up per
    // source: doc/language counts, dominant predicted language + x100
    // share — the routing report for a mixed crawl.
    QueryDef("t_domain_lang_mix", domainLangMixSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Curation.domainLangProfile(docs, docs)
    }.sortedBy(col("source")),

    // ... and the SAME profile under the persisted char-trigram bundle
    // (domainLangProfileWith) — scoring-only cost, same gating SQL.
    QueryDef("t_domain_lang_mix_persisted", domainLangMixSql) { (s, d) =>
      val bundle = TextAnalysis.loadNbBundle(s, langIdBundleFor(s, d))
      graft.ext.Curation.domainLangProfileWith(Tables.documents(s, d),
        bundle)
    }.sortedBy(col("source")),

    // ── Language-balanced mix (α-temperature over PREDICTED lang) ──
    // The mBERT/XLM-R multilingual α-mix applied to the char-trigram
    // NB classifier's output instead of self-reported metadata: the
    // shared nbLangIdCtes chain predicts, then the t_temperature_mix
    // threshold law resamples per predicted language (α = 1/2).
    QueryDef("t_lang_mix", langMixSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Curation.langBalancedMix(docs, docs)
    }.sortedBy(col("doc_id")),

    // ... and the SAME α-mix under the persisted char-trigram bundle
    // (langBalancedMixWith) — the train-once path, same gating SQL.
    QueryDef("t_lang_mix_persisted", langMixSql) { (s, d) =>
      val bundle = TextAnalysis.loadNbBundle(s, langIdBundleFor(s, d))
      graft.ext.Curation.langBalancedMixWith(Tables.documents(s, d),
        bundle)
    }.sortedBy(col("doc_id")),

    // ── Sparse keyword retrieval (search, not extraction) ──────────
    // Per query (a bag of terms): top-10 docs by summed integer tf-idf
    // — the lexical complement of the dense ANN searches, same
    // fixed-point arithmetic as t_keywords. Spark cuts the corpus tf
    // map with a broadcast term join and runs per-query top-k on
    // TopKPerKey; the oracle replays the identical integer scoring
    // with a window.
    // ── PRF query expansion (RM1/Rocchio-shaped second stage) ──────
    // The top-10 first-pass docs are the feedback set; every term of
    // theirs weighs in at Σ tf·score (exact integers), original terms
    // excluded, top-5 per query. The companion t_search_docs_prf runs
    // the SECOND PASS over original ∪ expansion terms — the x-chain is
    // the same scoring CTE family over the expanded query relation.
    QueryDef("t_prf_expand",
      s"""WITH $searchDocsCtes,
         |${prfCtes(10, 5)}
         |SELECT CAST(query_id AS BIGINT) AS query_id, term, weight, rank
         |FROM pexp WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      import s.implicits._
      TextAnalysis.prfExpandTerms(Tables.documents(s, d),
        SearchQueries.toDF("query_id", "term"))
    }.sortedBy(col("query_id"), col("rank")),

    QueryDef("t_search_docs_prf",
      s"""WITH $searchDocsCtes,
         |${prfCtes(10, 5)},
         |pq AS (SELECT query_id, term FROM sq
         |  UNION SELECT query_id, term FROM pexp WHERE rank <= 5),
         |${searchScoreCtes("x", "pq", "stf")}
         |SELECT * FROM xranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      import s.implicits._
      TextAnalysis.searchDocsPrf(Tables.documents(s, d),
        SearchQueries.toDF("query_id", "term"))
    }.sortedBy(col("query_id"), col("rank")),

    QueryDef("t_search_docs",
      s"""WITH $searchDocsCtes
         |SELECT * FROM sranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      TextAnalysis.searchDocs(Tables.documents(s, d), queries, k = 10)
        .select(col("query_id"), col("doc_id"), col("score"),
          col("n_terms"), col("rank"))
    }.sortedBy(col("query_id"), col("rank")),

    // BM25-shaped variant: saturation + length norm + floor-log2 idf,
    // every step exact integer arithmetic replayed by the oracle.
    QueryDef("t_search_docs_bm25",
      s"""WITH ${bm25Ctes(k1X100 = 120, bX100 = 75)}
         |SELECT * FROM branked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      TextAnalysis.searchDocsBm25(Tables.documents(s, d), queries, k = 10)
        .select(col("query_id"), col("doc_id"), col("score"),
          col("n_terms"), col("rank"))
    }.sortedBy(col("query_id"), col("rank")),

    // ── IR ranking eval: qrels + trec metrics + corpus report ──────
    // Deterministic graded qrels by term coverage (rel 2 = all query
    // terms present, 1 = at least half) — judgment counts PRESENCE,
    // not tf, so it is not an alias of the tf-idf run it evaluates.
    QueryDef("t_qrels",
      s"""WITH $searchDocsCtes,
         |$qrelsCtes
         |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rel
         |FROM qrels ORDER BY query_id, doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      graft.ext.Retrieval.termCoverageQrels(Tables.documents(s, d),
        SearchQueries.toDF("query_id", "term"))
    }.sortedBy(col("query_id"), col("doc_id")),

    // Per-query trec readout of the tf-idf run at k = 10: RR, P@k,
    // R@k, AP and harmonic-discount nDCG@k, every column an lcm-scaled
    // exact integer (L = lcm(1..11) = 27720 inlined on both sides).
    QueryDef("t_rank_eval",
      s"""WITH $searchDocsCtes,
         |$qrelsCtes,
         |${rankEvalCtes("e", "sranked", 10, 27720L)}
         |SELECT * FROM emetrics ORDER BY query_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      val docs = Tables.documents(s, d)
      val run = TextAnalysis.searchDocs(docs, queries, k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      graft.ext.Eval.rankEval(run,
        graft.ext.Retrieval.termCoverageQrels(docs, queries))
    }.sortedBy(col("query_id")),

    // One-row corpus IR report over the BM25 arm — MRR exact via the
    // same lcm law, MAP / mean-nDCG / mean-recall as the documented
    // mean-of-floors over queries where defined (n_with_rel
    // disclosed), mean precision over all queries.
    QueryDef("t_ir_report",
      s"""WITH $searchDocsCtes,
         |${bm25Ctes(k1X100 = 120, bX100 = 75)},
         |$qrelsCtes,
         |${rankEvalCtes("e", "branked", 10, 27720L)}
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_with_rel,
         |  CAST(CASE WHEN count(*) > 0 THEN
         |    (sum(coalesce(27720 // first_rel_rank, 0)) * 10000)
         |      // (27720 * count(*)) END AS BIGINT) AS mrr_x10000,
         |  CAST(CASE WHEN count(ap_x10000) > 0
         |    THEN sum(ap_x10000) // count(ap_x10000) END AS BIGINT)
         |    AS map_x10000,
         |  CAST(CASE WHEN count(ndcg_x10000) > 0
         |    THEN sum(ndcg_x10000) // count(ndcg_x10000) END AS BIGINT)
         |    AS ndcg_mean_x10000,
         |  CAST(CASE WHEN count(recall_x10000) > 0
         |    THEN sum(recall_x10000) // count(recall_x10000) END AS BIGINT)
         |    AS recall_mean_x10000,
         |  CAST(CASE WHEN count(*) > 0
         |    THEN sum(precision_x10000) // count(*) END AS BIGINT)
         |    AS precision_mean_x10000
         |FROM emetrics""".stripMargin) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      val docs = Tables.documents(s, d)
      val run = TextAnalysis.searchDocsBm25(docs, queries, k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      graft.ext.Eval.irReport(run,
        graft.ext.Retrieval.termCoverageQrels(docs, queries))
    },

    // Kendall τ-a between the tf-idf and BM25 runs per query — the
    // "how differently do the two arms rank" readout, exact integers
    // over shared docs (distinct ranks ⇒ no tie term), < 2 shared
    // docs → null τ, disclosed.
    QueryDef("t_rank_tau",
      s"""WITH $searchDocsCtes,
         |${bm25Ctes(k1X100 = 120, bX100 = 75)},
         |tsh AS (SELECT s.query_id, s.doc_id, s.rank AS ra, b.rank AS rb
         |  FROM (SELECT * FROM sranked WHERE rank <= 10) s
         |  JOIN (SELECT * FROM branked WHERE rank <= 10) b
         |    USING (query_id, doc_id)),
         |tns AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM tsh GROUP BY 1),
         |tpr AS (SELECT a.query_id,
         |    CAST(sum(CASE WHEN (a.ra < b.ra AND a.rb < b.rb)
         |      OR (a.ra > b.ra AND a.rb > b.rb) THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN (a.ra < b.ra AND a.rb < b.rb)
         |      OR (a.ra > b.ra AND a.rb > b.rb) THEN 0 ELSE 1 END)
         |      AS BIGINT) AS d
         |  FROM tsh a JOIN tsh b ON b.query_id = a.query_id
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1)
         |SELECT n.query_id, n.n_shared,
         |  coalesce(p.c, 0) AS concordant,
         |  coalesce(p.d, 0) AS discordant,
         |  CAST(CASE WHEN coalesce(p.c, 0) + coalesce(p.d, 0) > 0
         |    THEN ((p.c - p.d) * 10000) // (p.c + p.d) END AS BIGINT)
         |    AS tau_x10000
         |FROM tns n LEFT JOIN tpr p USING (query_id)
         |ORDER BY query_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      val docs = Tables.documents(s, d)
      val a = TextAnalysis.searchDocs(docs, queries, k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val b = TextAnalysis.searchDocsBm25(docs, queries, k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      graft.ext.Eval.rankCorrelation(a, b)
    }.sortedBy(col("query_id")),

    // Rank-biased precision at p = 4/5 over the BM25 run — the
    // user-persistence metric, exact because the rational p makes every
    // geometric weight an integer over 5^k; the residual bound (mass a
    // deeper ranking could still claim) disclosed per row.
    QueryDef("t_rank_rbp", {
      def ipow(b: Long, e: Int): Long =
        (1 to e).foldLeft(1L)((a, _) => a * b)
      val k = 10; val denK = ipow(5L, k)
      val wRows = (1 to k)
        .map(r => s"($r, ${ipow(4L, r - 1) * ipow(5L, k - r)})")
        .mkString(", ")
      val resid = ipow(4L, k) * 10000L / denK
      s"""WITH $searchDocsCtes,
         |${bm25Ctes(k1X100 = 120, bX100 = 75)},
         |$qrelsCtes,
         |rbw(r, w) AS (VALUES $wRows),
         |rbh AS (SELECT b.query_id,
         |    CAST(count(*) AS BIGINT) AS n_rel_ret,
         |    CAST(sum(w.w) AS BIGINT) AS num
         |  FROM (SELECT query_id, doc_id, rank FROM branked
         |        WHERE rank <= $k) b
         |  JOIN qrels q ON q.query_id = b.query_id
         |    AND q.doc_id = b.doc_id
         |  JOIN rbw w ON w.r = b.rank
         |  GROUP BY 1),
         |rbq AS (SELECT DISTINCT query_id FROM branked WHERE rank <= $k)
         |SELECT q.query_id,
         |  coalesce(h.n_rel_ret, 0) AS n_rel_ret,
         |  coalesce(h.num, 0) AS rbp_num,
         |  CAST((coalesce(h.num, 0) * 10000) // $denK AS BIGINT)
         |    AS rbp_x10000,
         |  CAST($resid AS BIGINT) AS residual_x10000
         |FROM rbq q LEFT JOIN rbh h USING (query_id)
         |ORDER BY q.query_id""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      val docs = Tables.documents(s, d)
      val run = TextAnalysis.searchDocsBm25(docs, queries, k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      graft.ext.Eval.rankBiasedPrecision(run,
        graft.ext.Retrieval.termCoverageQrels(docs, queries))
    }.sortedBy(col("query_id")),

    // ── Hybrid retrieval: reciprocal-rank fusion ───────────────────
    // Sparse (integer tf-idf) top-20 fused with dense (exact cosine)
    // top-20 by rrf = Σ 10⁶ div (60 + rank) — rank-only, so the fusion
    // replays integer-exactly; per-system ranks ride along (null =
    // unranked by that arm). The dense arm reuses the t_similarity_topk
    // scoring; query ids double as vector ids (the TESTDATA contract).
    // TRI-ARM fusion: tf-idf + BM25 + dense through the n-ary
    // rrfFuseAll — lexical precision, saturation-weighted lexical
    // recall, and semantic match in one integer-exact ranking. The
    // oracle unions the three cut arms' id space and left-joins each
    // (≡ the engine's chained full-outer fusion).
    QueryDef("t_hybrid_tri",
      s"""WITH $searchDocsCtes,
         |${bm25Ctes(k1X100 = 120, bX100 = 75)},
         |$hybridTriCtes
         |SELECT * FROM tr3 WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      val docs = Tables.documents(s, d)
      val qIds = SearchQueries.map(_._1).distinct.sorted
      val sparse = TextAnalysis.searchDocs(docs, queries, k = 20)
        .select(col("query_id"), col("doc_id"),
          col("rank").as("tfidf_rank"))
      val bm25 = TextAnalysis.searchDocsBm25(docs, queries, k = 20)
        .select(col("query_id"), col("doc_id"),
          col("rank").as("bm25_rank"))
      val dense = Similarity
        .topKByIdsNative(Tables.embeddings(s, d), qIds, 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("dense_rank"))
      graft.ext.Retrieval.rrfFuseAll(Seq(sparse, bm25, dense), k = 10)
    }.sortedBy(col("query_id"), col("rank")),

    // ── Retrieval LEADERBOARD: the three lexical/hybrid systems'
    // irReport rows side by side against the same term-coverage qrels
    // — one relation answering "which retrieval arm should this corpus
    // run", every number the proven lcm-exact rollup. One UNION of
    // three shared CTE chains; the fusion arm is the same tr3 relation
    // t_hybrid_tri gates.
    QueryDef("w_retrieval_leaderboard",
      s"""WITH $searchDocsCtes,
         |${bm25Ctes(k1X100 = 120, bX100 = 75)},
         |$hybridTriCtes,
         |$qrelsCtes,
         |${rankEvalCtes("ls", "sranked", 10, 27720L)},
         |${rankEvalCtes("lb", "branked", 10, 27720L)},
         |${rankEvalCtes("lh", "tr3", 10, 27720L)}
         |${irReportSelect("ls", "tfidf", 10, 27720L)}
         |UNION ALL
         |${irReportSelect("lb", "bm25", 10, 27720L)}
         |UNION ALL
         |${irReportSelect("lh", "hybrid_tri", 10, 27720L)}
         |ORDER BY system""".stripMargin) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      val docs = Tables.documents(s, d)
      val qrels = graft.ext.Retrieval.termCoverageQrels(docs, queries)
        .localCheckpoint()
      val qIds = SearchQueries.map(_._1).distinct.sorted
      val sparse20 = TextAnalysis.searchDocs(docs, queries, k = 20)
        .select(col("query_id"), col("doc_id"),
          col("rank").as("tfidf_rank")).localCheckpoint()
      val bm2520 = TextAnalysis.searchDocsBm25(docs, queries, k = 20)
        .select(col("query_id"), col("doc_id"),
          col("rank").as("bm25_rank")).localCheckpoint()
      val dense = Similarity
        .topKByIdsNative(Tables.embeddings(s, d), qIds, 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("dense_rank"))
      val tri = graft.ext.Retrieval
        .rrfFuseAll(Seq(sparse20, bm2520, dense), k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      def row(system: String, run: org.apache.spark.sql.DataFrame) =
        graft.ext.Eval.irReport(run.filter(col("rank") <= 10), qrels)
          .select(Seq(lit(system).as("system")) ++
            Seq("n_queries", "n_with_rel", "mrr_x10000", "map_x10000",
              "ndcg_mean_x10000", "recall_mean_x10000",
              "precision_mean_x10000").map(col): _*)
      row("tfidf", sparse20.withColumnRenamed("tfidf_rank", "rank"))
        .unionByName(row("bm25",
          bm2520.withColumnRenamed("bm25_rank", "rank")))
        .unionByName(row("hybrid_tri", tri))
    }.sortedBy(col("system")),

    // ── MMR diversified re-ranking: greedy λ-tradeoff between dense
    // relevance and max-similarity-to-already-selected, the WHOLE
    // trajectory on the exact ×10⁶ integer cosine grain — the oracle
    // replays every greedy pick as a recursive CTE carrying the
    // selected list (1 row per query per step, argmax by window).
    QueryDef("t_mmr_rerank",
      s"""WITH RECURSIVE mq AS (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |mscored AS (
         |  SELECT mq.query_id, e.vec_id AS nid,
         |         round(${cosine("mq.qv", "e.embedding")}, 6) AS cos
         |  FROM mq JOIN embeddings e ON e.vec_id <> mq.query_id),
         |mcand AS (SELECT query_id, nid,
         |    CAST(round(cos * 1000000, 0) AS BIGINT) AS rel
         |  FROM (SELECT query_id, nid, cos, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, nid) AS rnk
         |    FROM mscored)
         |  WHERE rnk <= 20),
         |msim AS (SELECT a.query_id, a.nid AS ia, b.nid AS ib,
         |    CAST(round(round(${cosine("ea.embedding", "eb.embedding")},
         |      6) * 1000000, 0) AS BIGINT) AS sim
         |  FROM mcand a JOIN mcand b ON b.query_id = a.query_id
         |    AND b.nid <> a.nid
         |  JOIN embeddings ea ON ea.vec_id = a.nid
         |  JOIN embeddings eb ON eb.vec_id = b.nid),
         |mmr(query_id, step, nid, score, sel) AS (
         |  SELECT query_id, CAST(1 AS BIGINT), nid,
         |    CAST(70 * rel AS BIGINT), [nid]
         |  FROM (SELECT query_id, nid, rel, row_number() OVER (
         |      PARTITION BY query_id ORDER BY 70 * rel DESC, nid) AS rn
         |    FROM mcand)
         |  WHERE rn = 1
         |  UNION ALL
         |  SELECT query_id, step + 1, nid, score, list_append(sel, nid)
         |  FROM (
         |    SELECT query_id, step, sel, nid, score, row_number() OVER (
         |        PARTITION BY query_id ORDER BY score DESC, nid) AS rn
         |    FROM (
         |      SELECT m.query_id, m.step, m.sel, c.nid,
         |        CAST(70 * c.rel - 30 * (SELECT max(s.sim) FROM msim s
         |          WHERE s.query_id = m.query_id AND s.ia = c.nid
         |            AND list_contains(m.sel, s.ib)) AS BIGINT) AS score
         |      FROM mmr m JOIN mcand c ON c.query_id = m.query_id
         |        AND NOT list_contains(m.sel, c.nid)
         |      WHERE m.step < 5))
         |  WHERE rn = 1)
         |SELECT query_id, nid AS neighbor_id, step AS mmr_rank,
         |  score AS mmr_score
         |FROM mmr ORDER BY query_id, mmr_rank""".stripMargin) { (s, d) =>
      graft.ext.Retrieval.mmrRerank(Tables.embeddings(s, d),
        Seq(0L, 1L, 2L, 3L, 4L), kCand = 20, k = 5, lambdaX100 = 70)
    }.sortedBy(col("query_id"), col("mmr_rank")),

    QueryDef("t_hybrid_search", {
      val qIds = SearchQueries.map(_._1).distinct.sorted.mkString(", ")
      s"""WITH $searchDocsCtes,
         |dq AS (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id IN ($qIds)),
         |dscored AS (
         |  SELECT dq.query_id, e.vec_id AS neighbor_id,
         |         round(${cosine("dq.qv", "e.embedding")}, 6) AS cos
         |  FROM dq JOIN embeddings e ON e.vec_id <> dq.query_id),
         |dranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM dscored),
         |fused AS (
         |  SELECT coalesce(s.query_id, d.query_id) AS query_id,
         |         coalesce(s.doc_id, d.neighbor_id) AS doc_id,
         |         coalesce(1000000 // (60 + s.rank), 0)
         |           + coalesce(1000000 // (60 + d.rank), 0) AS rrf,
         |         s.rank AS sparse_rank, d.rank AS dense_rank
         |  FROM (SELECT * FROM sranked WHERE rank <= 20) s
         |  FULL JOIN (SELECT * FROM dranked WHERE rank <= 20) d
         |    ON s.query_id = d.query_id AND s.doc_id = d.neighbor_id),
         |hranked AS (
         |  SELECT query_id, doc_id, CAST(rrf AS BIGINT) AS rrf,
         |         sparse_rank, dense_rank,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
         |  FROM fused)
         |SELECT * FROM hranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      graft.ext.Retrieval.hybridSearch(Tables.documents(s, d),
        Tables.embeddings(s, d), queries, k = 10)
    }.sortedBy(col("query_id"), col("rank")),

    // PRODUCTION hybrid: BM25 arm + PERSISTED-INDEX dense arm
    // (multi-probe LSH over the same index t_ann_lsh_multiprobe gates)
    // through rrfFuseAll — the at-scale shape where the dense arm
    // touches only probed buckets, zero train/bucket work per query.
    // The oracle composes the two proven CTE chains (bm25Ctes +
    // annLshMultiProbeCtes) and replays the integer RRF fusion.
    QueryDef("t_hybrid_indexed", {
      val qIds = SearchQueries.map(_._1).distinct.sorted.mkString(", ")
      s"""WITH ${bm25Ctes(k1X100 = 120, bX100 = 75)},
         |${annLshMultiProbeCtes(1, s"vec_id IN ($qIds)")},
         |hifused AS (
         |  SELECT coalesce(s.query_id, d.query_id) AS query_id,
         |         coalesce(s.doc_id, d.neighbor_id) AS doc_id,
         |         coalesce(1000000 // (60 + s.rank), 0)
         |           + coalesce(1000000 // (60 + d.rank), 0) AS rrf,
         |         s.rank AS bm25_rank, d.rank AS dense_rank
         |  FROM (SELECT * FROM branked WHERE rank <= 20) s
         |  FULL JOIN (SELECT * FROM ranked WHERE rank <= 20) d
         |    ON s.query_id = d.query_id AND s.doc_id = d.neighbor_id),
         |hiranked AS (
         |  SELECT query_id, doc_id, CAST(rrf AS BIGINT) AS rrf,
         |         bm25_rank, dense_rank,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
         |  FROM hifused)
         |SELECT * FROM hiranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      val queries = SearchQueries.toDF("query_id", "term")
      graft.ext.Retrieval.hybridSearchIndexed(Tables.documents(s, d),
        queries, lshIndexFor(s, d), k = 10)
    }.sortedBy(col("query_id"), col("rank")),

    // ── Deterministic sequence packing ─────────────────────────────
    // Context-window packing: docs in polyhash-bucket order, running
    // whitespace-token total cut into 512-token packs (pack = tokens
    // BEFORE the doc, integer-divided). The oracle computes the global
    // cumsum in one window; Spark decomposes it into a partitioned
    // within-group window + broadcast group offsets — same numbers,
    // no single-task stage.
    // ── Span-corruption prep (T5/UL2 denoising pairs) ──────────────
    // Deterministic span masking: each 20-token block hides one 3-token
    // span at offset polyhash(doc:block) % 18 (15% corruption, spans
    // never overlap, sentinel id = block index). The oracle replays the
    // same per-index arithmetic with DuckDB list lambdas; the coalesce
    // around each array_to_string bridges DuckDB's NULL-for-empty-list
    // vs Spark's ''-for-empty-array (a fully-unmasked doc has empty
    // targets).
    QueryDef("t_span_corruption",
      s"""WITH ${spanCorruptionCtes("documents")}
         |SELECT d.doc_id, c.inputs, c.targets,
         |  coalesce(c.n_tokens, 0) AS n_tokens,
         |  coalesce(c.n_masked, 0) AS n_masked,
         |  coalesce(c.n_spans, 0) AS n_spans
         |FROM documents d LEFT JOIN calc c USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Packing.spanCorruption(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Denoising-prep flagship (round-14 composition) ─────────────
    // The round's new ops end-to-end: near-dup clusters keep their
    // BEST-quality member → survivors pack curriculum-ordered
    // (cleanest first) → each packed doc becomes a T5/UL2
    // (inputs, targets) denoising pair. One consumable derived
    // relation, every stage an already-proven CTE family.
    QueryDef("t_denoising_prep",
      s"""WITH RECURSIVE $hashesCte, $sigCte,
         |${clusterCtes("documents", jNum = 8, jDen = 10)},
         |${qualityCtes("documents")},
         |dpkb AS (SELECT c.cluster_id, c.doc_id, q.quality
         |  FROM clusters c JOIN qscored q USING (doc_id)),
         |dpkr AS (SELECT cluster_id, doc_id, quality,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY quality DESC, doc_id) AS rn
         |  FROM dpkb),
         |dpkept AS (SELECT d.doc_id, d.text, k.quality
         |  FROM (SELECT doc_id, quality FROM dpkr WHERE rn = 1) k
         |  JOIN documents d USING (doc_id)),
         |dpt AS (SELECT doc_id, (4 - quality) AS stage,
         |  CASE WHEN text IS NULL THEN 0
         |       ELSE len(string_split(text, ' ')) END AS toks,
         |  ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM dpkept),
         |dpc AS (SELECT doc_id, stage, toks,
         |  sum(toks) OVER (ORDER BY stage, bkt, doc_id
         |                  ROWS UNBOUNDED PRECEDING) AS cum FROM dpt),
         |${spanCorruptionCtes("dpkept")}
         |SELECT p.doc_id, CAST(p.stage AS BIGINT) AS stage,
         |  CAST((p.cum - p.toks) // 512 AS BIGINT) AS pack,
         |  c.inputs, c.targets, coalesce(c.n_spans, 0) AS n_spans
         |FROM dpc p LEFT JOIN calc c USING (doc_id)
         |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).cast("long").as("quality"))
      val best = Dedup.keepBest(Dedup.nearDupClusters(docs), scored)
        .select(col("keep_id").as("doc_id"), col("score").as("quality"))
      // PIN the survivor relation (consumed by the packing side twice
      // and the span side once) and RESTORE parallelism first: AQE
      // coalesces the small survivor-join shuffle to one partition,
      // which serialized the span stage's per-row HOF work onto a
      // single task — measured 12.3 s at sf0.1 vs 4.6 s with the
      // repartition (the Tables split-mitigation rationale applied to
      // a derived relation whose per-row map cost dominates its scan)
      val kept = docs.select("doc_id", "text").join(best, "doc_id")
        .repartition(s.sparkContext.defaultParallelism)
        .localCheckpoint()
      val staged = kept.select(col("doc_id"),
        (lit(4) - col("quality")).cast("long").as("stage"),
        when(col("text").isNull, 0)
          .otherwise(size(split(col("text"), " "))).as("toks"))
      val packed = graft.ext.Packing.curriculumPack(staged, col("doc_id"),
          col("toks"), col("stage"), 512L)
        .select("doc_id", "stage", "pack")
      val pairs = graft.ext.Packing.spanCorruption(kept)
        .select("doc_id", "inputs", "targets", "n_spans")
      packed.join(pairs, "doc_id")
        .select("doc_id", "stage", "pack", "inputs", "targets", "n_spans")
    }.sortedBy(col("doc_id")),

    QueryDef("t_pack_sequences",
      s"""WITH t AS (SELECT doc_id,
         |  CASE WHEN text IS NULL THEN 0 ELSE len(string_split(text, ' ')) END AS toks,
         |  ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 AS bkt FROM documents),
         |c AS (SELECT doc_id, toks,
         |  sum(toks) OVER (ORDER BY bkt, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT doc_id, CAST((cum - toks) // 512 AS BIGINT) AS pack FROM c
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"),
        when(col("text").isNull, 0)
          .otherwise(size(split(col("text"), " "))).as("toks"))
      graft.ext.Packing.packSequences(docs, col("doc_id"), col("toks"), 512L)
        .select(col("doc_id"), col("pack"))
    }.sortedBy(col("doc_id")),

    // Packing QA: per-pack fill report over the same packing — the
    // check that catches a collapsed fill or a pack-owning giant doc.
    QueryDef("t_pack_stats",
      s"""WITH t AS (SELECT doc_id,
         |  CASE WHEN text IS NULL THEN 0 ELSE len(string_split(text, ' ')) END AS toks,
         |  ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 AS bkt FROM documents),
         |c AS (SELECT doc_id, toks,
         |  sum(toks) OVER (ORDER BY bkt, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t),
         |p AS (SELECT doc_id, toks, CAST((cum - toks) // 512 AS BIGINT) AS pack
         |      FROM c)
         |SELECT pack, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(toks) * 100 // 512 AS BIGINT) AS fill_x100
         |FROM p GROUP BY pack ORDER BY pack""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"),
        when(col("text").isNull, 0)
          .otherwise(size(split(col("text"), " "))).as("toks"))
      val packed = graft.ext.Packing.packSequences(docs, col("doc_id"),
        col("toks"), 512L)
      graft.ext.Packing.packStats(packed, col("toks"), 512L)
    }.sortedBy(col("pack")),

    // ── Fill-in-the-middle (FIM) transform ─────────────────────────
    // Rewrite polyhash-selected 50% of docs into the PSM layout
    // `<fim_prefix> P <fim_suffix> S <fim_middle> M`; cuts are two
    // independent polyhashes mod (n+1). Degenerate cuts kept (empty
    // middle is a valid training case). Row-local slicing only.
    QueryDef("t_fim_transform",
      s"""WITH ${fimCtes("documents")}
         |SELECT d.doc_id, coalesce(f.pick, FALSE) AS fim, f.text_out,
         |  CAST(coalesce(f.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(f.n_middle, 0) AS BIGINT) AS n_middle
         |FROM documents d LEFT JOIN fimc f USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Packing.fimTransform(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Code-training prep flagship (round-16 composition) ─────────
    // Near-dup clusters keep their BEST-quality member → survivors go
    // through the FIM transform (50% PSM, the paper's AR/FIM mix) →
    // the transformed corpus packs into 512-token sequences (FIM'd
    // docs cost their 3 sentinels). One consumable relation; every
    // stage an already-proven CTE family.
    QueryDef("t_fim_prep",
      s"""WITH RECURSIVE $hashesCte, $sigCte,
         |${clusterCtes("documents", jNum = 8, jDen = 10)},
         |${qualityCtes("documents")},
         |fpkb AS (SELECT c.cluster_id, c.doc_id, q.quality
         |  FROM clusters c JOIN qscored q USING (doc_id)),
         |fpkr AS (SELECT cluster_id, doc_id,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY quality DESC, doc_id) AS rn
         |  FROM fpkb),
         |fpkept AS (SELECT d.doc_id, d.text
         |  FROM (SELECT doc_id FROM fpkr WHERE rn = 1) k
         |  JOIN documents d USING (doc_id)),
         |${fimCtes("fpkept")},
         |fpt AS (SELECT k.doc_id, coalesce(f.n_out, 0) AS toks,
         |  ${polyhash("CAST(k.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM fpkept k LEFT JOIN fimc f USING (doc_id)),
         |fpc AS (SELECT doc_id, toks,
         |  sum(toks) OVER (ORDER BY bkt, doc_id ROWS UNBOUNDED PRECEDING)
         |    AS cum FROM fpt)
         |SELECT c.doc_id, coalesce(f.pick, FALSE) AS fim, f.text_out,
         |  CAST(coalesce(f.n_middle, 0) AS BIGINT) AS n_middle,
         |  CAST((c.cum - c.toks) // 512 AS BIGINT) AS pack
         |FROM fpc c LEFT JOIN fimc f USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).cast("long").as("quality"))
      val best = Dedup.keepBest(Dedup.nearDupClusters(docs), scored)
        .select(col("keep_id").as("doc_id"))
      // pin + restore parallelism: the t_denoising_prep rationale —
      // AQE coalesces the small survivor join to one partition, which
      // would serialize the FIM stage's per-row slicing onto one task
      val kept = docs.select("doc_id", "text").join(best, "doc_id")
        .repartition(s.sparkContext.defaultParallelism)
        .localCheckpoint()
      val fimmed = graft.ext.Packing.fimTransform(kept)
        .withColumn("toks",
          col("n_tokens") + when(col("fim"), 3L).otherwise(0L))
      graft.ext.Packing.packSequences(fimmed, col("doc_id"), col("toks"),
          512L)
        .select(col("doc_id"), col("fim"), col("text_out"),
          col("n_middle"), col("pack"))
    }.sortedBy(col("doc_id")),

    // ── Code-corpus prep flagship: the end-to-end chain a StarCoder-
    // style pipeline runs, composed entirely from proven stages —
    // codeStats gate (drops the minified-spam plant) → winnowing (MOSS)
    // overlap pairs under a tuned bucket cap (corpus-wide template
    // grams excluded, disclosed) → min-label connected components →
    // keepBest on the alpha score → FIM transform → sequence packing.
    // The plant: %4==1 minified spam (fails max_line_len); evens get a
    // 4-line loader template parameterized by doc_id div 40 (blocks of
    // 20 near-identical files — the vendored-copy case MOSS groups);
    // remaining odds get a unique 3-line file (no near-dups — their one
    // corpus-wide shared gram lands in an over-cap bucket and is
    // correctly excluded).
    QueryDef("t_code_prep",
      s"""WITH RECURSIVE cdocs AS (SELECT doc_id, CASE
         |    WHEN doc_id % 4 = 1 THEN repeat('x7', 600)
         |    WHEN doc_id % 2 = 0 THEN
         |      'def load' || CAST(doc_id // 40 AS VARCHAR) || '(path):'
         |      || chr(10) || '# parse the '
         |      || CAST(doc_id // 40 AS VARCHAR) || ' records' || chr(10)
         |      || 'rows = read(path)' || chr(10)
         |      || 'return rows + ' || CAST(doc_id AS VARCHAR)
         |    ELSE 'def main' || CAST(doc_id AS VARCHAR) || '():'
         |      || chr(10) || 'value = ' || CAST(doc_id AS VARCHAR)
         |      || ' * 31' || chr(10) || 'return value' END AS text
         |  FROM documents WHERE text IS NOT NULL),
         |cls AS (SELECT doc_id, text, string_split(text, chr(10)) AS l
         |  FROM cdocs),
         |cst AS (SELECT doc_id,
         |  CAST(len(l) AS BIGINT) AS n_lines,
         |  CAST(coalesce(list_max(list_transform(l, x -> length(x))), 0)
         |    AS BIGINT) AS max_line_len,
         |  CAST((coalesce(list_sum(list_transform(l, x -> length(x))), 0)
         |    * 100) // len(l) AS BIGINT) AS avg_line_len_x100,
         |  CAST(CASE WHEN length(text) > 0
         |    THEN (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
         |      * 1000) // length(text) ELSE 0 END AS BIGINT)
         |    AS alpha_frac_x1000
         |  FROM cls),
         |cgate AS (SELECT doc_id, alpha_frac_x1000 FROM cst
         |  WHERE avg_line_len_x100 <= 10000 AND max_line_len <= 1000
         |    AND alpha_frac_x1000 >= 250),
         |gated AS (SELECT c.doc_id, c.text
         |  FROM cdocs c JOIN cgate USING (doc_id)),
         |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM gated),
         |gr AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(1, greatest(len(w) - 3, 0)),
         |    i -> struct_pack(i := CAST(i AS BIGINT),
         |      t := array_to_string(w[i:i+3], ' ')))) AS u FROM ws),
         |g AS (SELECT doc_id, u.i AS i, ${polyhash64("u.t")} AS h FROM gr),
         |mm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m
         |  FROM g GROUP BY doc_id),
         |wins AS (SELECT doc_id, m, unnest(generate_series(1,
         |    greatest(m - 4, 1))) AS j FROM mm),
         |wg AS (SELECT wn.doc_id, wn.j, g.i, g.h
         |  FROM wins wn JOIN g ON g.doc_id = wn.doc_id
         |    AND g.i >= wn.j AND g.i <= least(wn.j + 4, wn.m)),
         |mh AS (SELECT doc_id, j, min(h) AS fp FROM wg
         |  GROUP BY doc_id, j),
         |wf AS (SELECT DISTINCT doc_id, fp FROM mh),
         |wwidth AS (SELECT fp, count(*) AS wn FROM wf GROUP BY fp),
         |wkeep AS (SELECT wf.doc_id, wf.fp FROM wf
         |  JOIN wwidth USING (fp) WHERE wn <= 24),
         |wpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM wkeep a JOIN wkeep b ON b.fp = a.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |cedges AS (SELECT doc_a AS src, doc_b AS dst FROM wpairs
         |  UNION ALL SELECT doc_b, doc_a FROM wpairs),
         |cwalk(id, r) AS (
         |  SELECT doc_id, doc_id FROM gated
         |  UNION
         |  SELECT w.id, e.dst FROM cwalk w JOIN cedges e ON e.src = w.r),
         |cclust AS (SELECT id AS doc_id, min(r) AS cluster_id
         |  FROM cwalk GROUP BY id),
         |ckb AS (SELECT c.cluster_id, c.doc_id, q.alpha_frac_x1000 AS q
         |  FROM cclust c JOIN cgate q USING (doc_id)),
         |ckr AS (SELECT cluster_id, doc_id, row_number() OVER (
         |    PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rn
         |  FROM ckb),
         |ckept AS (SELECT d.doc_id, d.text
         |  FROM (SELECT doc_id FROM ckr WHERE rn = 1) k
         |  JOIN gated d USING (doc_id)),
         |${fimCtes("ckept")},
         |cpt AS (SELECT k.doc_id, coalesce(f.n_out, 0) AS toks,
         |  ${polyhash("CAST(k.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM ckept k LEFT JOIN fimc f USING (doc_id)),
         |cpc AS (SELECT doc_id, toks,
         |  sum(toks) OVER (ORDER BY bkt, doc_id ROWS UNBOUNDED PRECEDING)
         |    AS cum FROM cpt)
         |SELECT c.doc_id, coalesce(f.pick, FALSE) AS fim, f.text_out,
         |  CAST(coalesce(f.n_middle, 0) AS BIGINT) AS n_middle,
         |  CAST((c.cum - c.toks) // 512 AS BIGINT) AS pack
         |FROM cpc c LEFT JOIN fimc f USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).filter(col("text").isNotNull)
      val g = expr("doc_id div 40").cast("string")
      val planted = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 1, lit("x7" * 600))
          .when(col("doc_id") % 2 === 0, concat(
            lit("def load"), g, lit("(path):\n# parse the "), g,
            lit(" records\nrows = read(path)\nreturn rows + "),
            col("doc_id").cast("string")))
          .otherwise(concat(
            lit("def main"), col("doc_id").cast("string"),
            lit("():\nvalue = "), col("doc_id").cast("string"),
            lit(" * 31\nreturn value"))).as("text"))
        .localCheckpoint()
      val st = TextAnalysis.codeStats(planted).localCheckpoint()
      val gated = planted.join(st.filter(col("code_pass") === 1L)
        .select("doc_id"), Seq("doc_id"), "left_semi").localCheckpoint()
      // bucket cap 24: wider than any planted 20-member vendored-copy
      // block, narrower than the evens-wide template grams at EVERY sf
      // (>= 25 even docs at sf0.001) — the corpus-wide grams are
      // excluded (disclosed recall loss), the block grams survive
      val pairs = Dedup.winnowOverlap(gated, k = 4, w = 5, minShared = 1,
        maxBucket = 24)
      val clusters = Dedup.clusterLabels(
          gated.select(col("doc_id").as("id")),
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        .select(col("id").as("doc_id"), col("cluster_id"))
      val best = Dedup.keepBest(clusters,
          st.select(col("doc_id"), col("alpha_frac_x1000").as("quality")))
        .select(col("keep_id").as("doc_id"))
      // pin + restore parallelism: the t_fim_prep rationale — AQE
      // coalesces the small survivor join to one partition, which would
      // serialize the FIM stage's per-row slicing onto one task
      val kept = gated.join(best, "doc_id")
        .repartition(s.sparkContext.defaultParallelism)
        .localCheckpoint()
      val fimmed = graft.ext.Packing.fimTransform(kept)
        .withColumn("toks",
          col("n_tokens") + when(col("fim"), 3L).otherwise(0L))
      graft.ext.Packing.packSequences(fimmed, col("doc_id"), col("toks"),
          512L)
        .select(col("doc_id"), col("fim"), col("text_out"),
          col("n_middle"), col("pack"))
    }.sortedBy(col("doc_id")),

    // ── Loss-masked SFT packing ────────────────────────────────────
    // (prompt, response) pairs on the packing tape with per-example
    // loss-span coordinates: prompt = first min(4, n) tokens, response
    // = the rest. The oracle replays the tape with one global window
    // cumsum; Spark runs the decomposed prefix-sum. spans_packs
    // discloses examples crossing a pack boundary.
    QueryDef("t_sft_pack",
      s"""WITH t AS (SELECT doc_id,
         |  CASE WHEN text IS NULL THEN 0 ELSE len(string_split(text, ' ')) END AS n,
         |  ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 AS bkt FROM documents),
         |s AS (SELECT doc_id, least(n, 4) AS p, n - least(n, 4) AS r, n, bkt
         |      FROM t),
         |c AS (SELECT doc_id, p, r, n,
         |  sum(n) OVER (ORDER BY bkt, doc_id ROWS UNBOUNDED PRECEDING) - n AS pos
         |  FROM s)
         |SELECT doc_id,
         |  CAST(pos // 512 AS BIGINT) AS pack,
         |  CAST(pos % 512 AS BIGINT) AS seq_off,
         |  CAST(pos % 512 + p AS BIGINT) AS loss_start,
         |  CAST(pos % 512 + p + r AS BIGINT) AS loss_end,
         |  (n > 0 AND pos // 512 != (pos + n - 1) // 512) AS spans_packs
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val pairs = Tables.documents(s, d).select(col("doc_id"),
          when(col("text").isNull, 0)
            .otherwise(size(split(col("text"), " "))).as("n"))
        .select(col("doc_id"), least(col("n"), lit(4)).as("p"),
          (col("n") - least(col("n"), lit(4))).as("r"))
      graft.ext.Packing.sftPack(pairs, col("doc_id"), col("p"), col("r"),
          512L)
        .select(col("doc_id"), col("pack"), col("seq_off"),
          col("loss_start"), col("loss_end"), col("spans_packs"))
    }.sortedBy(col("doc_id")),

    // ── DPO preference-pair construction ───────────────────────────
    // Per prompt (source domain), chosen = highest-quality doc,
    // rejected = lowest, margin floor 1 — the reward-model/DPO
    // training-pair build from a scored response pool. One prompt-
    // keyed argmax/argmin fold; ties break to the smallest doc_id on
    // both sides (engine law = oracle row_number law).
    QueryDef("t_dpo_pairs",
      s"""WITH ${qualityCtes("documents")},
         |resp AS (SELECT d.source, q.doc_id, q.quality
         |  FROM documents d JOIN qscored q USING (doc_id)
         |  WHERE d.text IS NOT NULL),
         |rk AS (SELECT source, doc_id, quality,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id) AS rc,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY quality ASC, doc_id) AS rr,
         |    count(*) OVER (PARTITION BY source) AS nr
         |  FROM resp)
         |SELECT c.source AS prompt_id, c.doc_id AS chosen_id,
         |  CAST(c.quality AS BIGINT) AS chosen_score,
         |  r.doc_id AS rejected_id,
         |  CAST(r.quality AS BIGINT) AS rejected_score,
         |  CAST(c.quality - r.quality AS BIGINT) AS margin,
         |  CAST(c.nr AS BIGINT) AS n_responses
         |FROM rk c JOIN rk r ON r.source = c.source
         |  AND c.rc = 1 AND r.rr = 1
         |WHERE c.quality - r.quality >= 1
         |ORDER BY prompt_id""".stripMargin) { (s, d) =>
      val resp = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("source").as("prompt_id"), col("doc_id"),
          TextAnalysis.qualityScore(col("text")).cast("long").as("score"))
      graft.ext.Preference.dpoPairs(resp, "prompt_id", "doc_id", "score")
    }.sortedBy(col("prompt_id")),

    // ── DPO pair prep flagship: pairs → texts → packed ─────────────
    // The composed build a DPO trainer consumes: the preference pairs
    // above joined back to BOTH texts, whitespace token counts per
    // side, and the pair laid onto the packing tape by combined
    // length (packSequences' decomposed prefix sum, keyed by prompt).
    QueryDef("t_dpo_prep",
      s"""WITH ${qualityCtes("documents")},
         |resp AS (SELECT d.source, q.doc_id, q.quality
         |  FROM documents d JOIN qscored q USING (doc_id)
         |  WHERE d.text IS NOT NULL),
         |rk AS (SELECT source, doc_id, quality,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id) AS rc,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY quality ASC, doc_id) AS rr
         |  FROM resp),
         |dp AS (SELECT c.source AS prompt_id, c.doc_id AS chosen_id,
         |    r.doc_id AS rejected_id
         |  FROM rk c JOIN rk r ON r.source = c.source
         |    AND c.rc = 1 AND r.rr = 1
         |  WHERE c.quality - r.quality >= 1),
         |wt AS (SELECT p.prompt_id, p.chosen_id, p.rejected_id,
         |    CAST(len(string_split(dc.text, ' ')) AS BIGINT) AS chosen_tokens,
         |    CAST(len(string_split(dr.text, ' ')) AS BIGINT) AS rejected_tokens,
         |    ${polyhash("prompt_id")} % 10000 AS bkt
         |  FROM dp p JOIN documents dc ON dc.doc_id = p.chosen_id
         |  JOIN documents dr ON dr.doc_id = p.rejected_id),
         |cm AS (SELECT prompt_id, chosen_id, rejected_id,
         |    chosen_tokens, rejected_tokens,
         |    sum(chosen_tokens + rejected_tokens) OVER (
         |      ORDER BY bkt, prompt_id ROWS UNBOUNDED PRECEDING)
         |      - (chosen_tokens + rejected_tokens) AS pos
         |  FROM wt)
         |SELECT prompt_id, chosen_id, rejected_id, chosen_tokens,
         |  rejected_tokens, CAST(pos // 1024 AS BIGINT) AS pack
         |FROM cm ORDER BY prompt_id""".stripMargin) { (s, d) =>
      dpoPrepOf(Tables.documents(s, d))
    }.sortedBy(col("prompt_id")),

    // ── Chat-template rendering (SFT prep) ─────────────────────────
    // Turn-structured conversations (4 docs per conversation, roles
    // alternating user/assistant) rendered to the single training
    // string `<|role|>\ncontent\n`…, with n_chars in code points —
    // one conv-keyed fold, turns sorted inside their own conversation.
    QueryDef("t_chat_render",
      s"""WITH ct AS (SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn_idx,
         |    CASE WHEN doc_id % 2 = 0 THEN 'user'
         |         ELSE 'assistant' END AS role,
         |    text AS content
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT conv_id,
         |  string_agg('<|' || role || '|>' || chr(10) || content
         |      || chr(10), '' ORDER BY turn_idx) AS text,
         |  CAST(count(*) AS BIGINT) AS n_turns,
         |  CAST(sum(length(role) + length(content) + 6) AS BIGINT)
         |    AS n_chars
         |FROM ct GROUP BY conv_id ORDER BY conv_id""".stripMargin) {
      (s, d) =>
      graft.ext.Packing.renderChat(chatTurns(s, d))
    }.sortedBy(col("conv_id")),

    // The LOSS-SPAN face of the same template: per turn, the half-open
    // code-point span its content occupies in the rendered string and
    // the assistant-only loss flag — what the trainer masks on. Spans
    // agree with t_chat_render by construction (shared turn-length
    // law).
    // Chat-prep composition: conversations → per-conv token accounting
    // (content whitespace tokens + one tag token per turn; assistant
    // share disclosed as loss_tokens) → packSequences tape at 512 —
    // the render/span/pack chain an SFT data build runs end to end.
    QueryDef("t_chat_prep",
      s"""WITH ct AS (SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn_idx,
         |    CASE WHEN doc_id % 2 = 0 THEN 'user'
         |         ELSE 'assistant' END AS role,
         |    text AS content
         |  FROM documents WHERE text IS NOT NULL),
         |ag AS (SELECT conv_id,
         |    CAST(sum(len(string_split(content, ' ')) + 1) AS BIGINT)
         |      AS n_tokens,
         |    CAST(sum(CASE WHEN role = 'assistant'
         |      THEN len(string_split(content, ' ')) ELSE 0 END)
         |      AS BIGINT) AS loss_tokens
         |  FROM ct GROUP BY conv_id),
         |wt AS (SELECT conv_id, n_tokens, loss_tokens,
         |    ${polyhash("CAST(conv_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM ag),
         |cm AS (SELECT conv_id, n_tokens, loss_tokens,
         |    sum(n_tokens) OVER (ORDER BY bkt, conv_id
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS pos
         |  FROM wt)
         |SELECT conv_id, n_tokens, loss_tokens,
         |  CAST(pos // 512 AS BIGINT) AS pack
         |FROM cm ORDER BY conv_id""".stripMargin) { (s, d) =>
      chatPrepOf(Tables.documents(s, d))
    }.sortedBy(col("conv_id")),

    QueryDef("t_chat_spans",
      s"""WITH ct AS (SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn_idx,
         |    CASE WHEN doc_id % 2 = 0 THEN 'user'
         |         ELSE 'assistant' END AS role,
         |    text AS content
         |  FROM documents WHERE text IS NOT NULL),
         |sp AS (SELECT conv_id, turn_idx, role, content,
         |    coalesce(sum(length(role) + length(content) + 6) OVER (
         |      PARTITION BY conv_id ORDER BY turn_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS pre
         |  FROM ct)
         |SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
         |  CAST(pre + length(role) + 5 AS BIGINT) AS content_start,
         |  CAST(pre + length(role) + 5 + length(content) AS BIGINT)
         |    AS content_end,
         |  (role = 'assistant') AS is_loss
         |FROM sp ORDER BY conv_id, turn_idx""".stripMargin) { (s, d) =>
      graft.ext.Packing.chatSpans(chatTurns(s, d))
    }.sortedBy(col("conv_id"), col("turn_idx")),

    // ── Budget-capped best-first selection ─────────────────────────
    // Fill a 12k-token budget with the highest-quality docs first
    // (quality DESC, then hash order — deterministic cut). The oracle
    // reuses the proven quality CTEs and one global window cumsum;
    // Spark runs the decomposed prefix-sum with (quality, bucket-range)
    // groups. Inclusive prefix rule: kept iff running total ≤ budget.
    QueryDef("t_select_budget",
      s"""WITH ${qualityCtes("documents")},
         |t AS (SELECT q.doc_id, q.quality,
         |  len(string_split(q.text, ' ')) AS toks,
         |  ${polyhash("CAST(q.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM qscored q),
         |c AS (SELECT doc_id, quality, toks,
         |  sum(toks) OVER (ORDER BY quality DESC, bkt, doc_id
         |                  ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         |SELECT doc_id, CAST(quality AS BIGINT) AS quality FROM c
         |WHERE cum <= 12000 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val scored = Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).cast("long").as("quality"),
        size(split(col("text"), " ")).as("toks"))
      graft.ext.Packing.selectByBudget(scored, col("doc_id"), col("toks"),
          col("quality"), 12000L)
        .select(col("doc_id"), col("quality"))
    }.sortedBy(col("doc_id")),

    // ── Curriculum-ordered packing ─────────────────────────────────
    // Stage = inverted quality score (0 = cleanest): docs lay out
    // (stage, hash bucket, id) and cut into 512-token packs, so pack
    // order IS the curriculum. Oracle: one global window cumsum over
    // the same ordering; Spark runs the decomposed (stage, bucket-
    // range) prefix sum.
    QueryDef("t_curriculum_pack",
      s"""WITH ${qualityCtes("documents")},
         |t AS (SELECT q.doc_id, (4 - q.quality) AS stage,
         |  CASE WHEN q.text IS NULL THEN 0
         |       ELSE len(string_split(q.text, ' ')) END AS toks,
         |  ${polyhash("CAST(q.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM qscored q),
         |c AS (SELECT doc_id, stage, toks,
         |  sum(toks) OVER (ORDER BY stage, bkt, doc_id
         |                  ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         |SELECT doc_id, CAST(stage AS BIGINT) AS stage,
         |  CAST((cum - toks) // 512 AS BIGINT) AS pack
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"),
        (lit(4) - TextAnalysis.qualityScore(col("text")))
          .cast("long").as("stage"),
        when(col("text").isNull, 0)
          .otherwise(size(split(col("text"), " "))).as("toks"))
      graft.ext.Packing.curriculumPack(docs, col("doc_id"), col("toks"),
          col("stage"), 512L)
        .select(col("doc_id"), col("stage"), col("pack"))
    }.sortedBy(col("doc_id")),

    // Length-bucketed packing: stage = bit-length of the token count
    // (power-of-2 length bins), so similar-length docs pack together —
    // the padding-efficiency batching trick, on the same curriculum
    // machinery.
    QueryDef("t_length_bucket_pack",
      s"""WITH t AS (SELECT doc_id,
         |  CASE WHEN text IS NULL THEN 0 ELSE len(string_split(text, ' ')) END AS toks,
         |  ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 AS bkt FROM documents),
         |s AS (SELECT doc_id, toks,
         |  CAST(length(bin(toks)) AS BIGINT) AS stage, bkt FROM t),
         |c AS (SELECT doc_id, stage, toks,
         |  sum(toks) OVER (ORDER BY stage, bkt, doc_id
         |                  ROWS UNBOUNDED PRECEDING) AS cum FROM s)
         |SELECT doc_id, stage, CAST((cum - toks) // 512 AS BIGINT) AS pack
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"),
        when(col("text").isNull, 0)
          .otherwise(size(split(col("text"), " "))).as("toks"))
        .withColumn("stage", expr("length(bin(toks))").cast("long"))
      graft.ext.Packing.curriculumPack(docs, col("doc_id"), col("toks"),
          col("stage"), 512L)
        .select(col("doc_id"), col("stage"), col("pack"))
    }.sortedBy(col("doc_id")),

    // Per-domain top-5 bigrams — what each source actually says; the
    // (domain, gram) counts partial-agg to vocab-bounded rows, then
    // the bounded-heap TopKPerKey cut (no per-domain vocabulary sort).
    QueryDef("t_domain_ngrams", {
      val ws = "string_split(text, ' ')"
      s"""WITH dg AS (SELECT source, unnest(
         |    CASE WHEN len($ws) >= 2
         |      THEN list_transform(generate_series(2, len($ws)),
         |        i -> $ws[i-1] || ' ' || $ws[i])
         |      ELSE [] END) AS gram
         |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |dc AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS cnt
         |       FROM dg GROUP BY 1, 2),
         |dr AS (SELECT source, gram, cnt,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY cnt DESC, gram) AS BIGINT) AS rank FROM dc)
         |SELECT source, gram, cnt, rank FROM dr WHERE rank <= 5
         |ORDER BY source, rank""".stripMargin
    }) { (s, d) =>
      TextAnalysis.domainTopNgrams(Tables.documents(s, d), k = 5, n = 2)
    }.sortedBy(col("source"), col("rank")),

    // ── Domain-mixture resampling ──────────────────────────────────
    // Downsample each weighted source so survivors match a 3:2:1 mix
    // (unweighted sources drop). Thresholds are pure Long floor
    // division over the per-domain counts — the oracle recomputes them
    // in SQL (// is DuckDB integer division) and replays the same
    // polyhash-bucket keep rule row for row.
    // ── DoReMi-style domain reweighting (model-signal data mixing) ──
    // Per domain: excess mean surprisal of the unigram PROXY rung over
    // the self-trained trigram REFERENCE rung (the self-trained model
    // never backs off — every corpus trigram is in its own model, so
    // the replay is the pure trigram case), apportioned to exactly
    // 10000 weight units by the largest-remainder law the mixers
    // consume. The oracle chains the two PROVEN scorer CTE families
    // and replays the Hamilton allocation (floor shares, then +1 to
    // the largest remainders, ties by weight then domain).
    QueryDef("t_domain_reweight",
      s"""WITH utf AS (
         |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |    FROM documents WHERE text IS NOT NULL) u GROUP BY 1, 2),
         |ucnt AS (SELECT word, CAST(sum(tf) AS BIGINT) AS cnt
         |  FROM utf GROUP BY 1),
         |utot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM ucnt),
         |usc AS (SELECT t.doc_id, t.tf,
         |    CAST(length(bin(u.total)) - length(bin(c.cnt)) AS BIGINT) AS bits
         |  FROM utf t JOIN ucnt c USING (word) CROSS JOIN utot u),
         |uagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n_tokens
         |  FROM usc GROUP BY 1),
         |drw AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |drbi AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(2, len(ws)),
         |      i -> ws[i-1] || ' ' || ws[i])) AS gram FROM drw) GROUP BY 1),
         |drtri AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(3, len(ws)),
         |      i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS gram
         |    FROM drw) GROUP BY 1),
         |drocc AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(3, len(ws)),
         |    i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS g123
         |  FROM drw),
         |drotf AS (SELECT doc_id, g123, CAST(count(*) AS BIGINT) AS tf
         |  FROM drocc GROUP BY 1, 2),
         |drsc AS (SELECT o.doc_id, o.tf,
         |    CAST(length(bin(b12.cnt)) - length(bin(t.cnt)) AS BIGINT) AS bits
         |  FROM drotf o
         |  JOIN drtri t ON t.gram = o.g123
         |  JOIN drbi b12 ON b12.gram =
         |    string_split(o.g123, ' ')[1] || ' ' || string_split(o.g123, ' ')[2]),
         |tagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n FROM drsc GROUP BY 1),
         |drdom AS (SELECT doc_id, source AS domain FROM documents
         |  WHERE source IS NOT NULL),
         |dragg AS (SELECT d.domain, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(coalesce(u.surprisal, 0)) AS BIGINT) AS psur,
         |    CAST(sum(coalesce(u.n_tokens, 0)) AS BIGINT) AS pn,
         |    CAST(sum(coalesce(t.surprisal, 0)) AS BIGINT) AS rsur,
         |    CAST(sum(coalesce(t.n, 0)) AS BIGINT) AS rn
         |  FROM drdom d
         |  LEFT JOIN uagg u USING (doc_id)
         |  LEFT JOIN tagg t USING (doc_id)
         |  GROUP BY 1),
         |drm AS (SELECT domain, n_docs,
         |   CASE WHEN pn > 0 THEN CAST((psur * 100) // pn AS BIGINT)
         |        ELSE CAST(0 AS BIGINT) END AS proxy_bits_x100,
         |   CASE WHEN rn > 0 THEN CAST((rsur * 100) // rn AS BIGINT)
         |        ELSE CAST(0 AS BIGINT) END AS ref_bits_x100
         |  FROM dragg),
         |dre AS (SELECT *, CAST(greatest(proxy_bits_x100 - ref_bits_x100, 0)
         |    AS BIGINT) AS excess_x100 FROM drm),
         |drwts AS (SELECT domain,
         |    CASE WHEN (SELECT max(excess_x100) FROM dre) > 0
         |         THEN excess_x100 ELSE CAST(1 AS BIGINT) END AS wt
         |  FROM dre),
         |drtot AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM drwts),
         |drbase AS (SELECT domain, wt, (10000 * wt) // w.tw AS q,
         |    (10000 * wt) % w.tw AS r FROM drwts CROSS JOIN drtot w),
         |drrem AS (SELECT 10000 - CAST(sum(q) AS BIGINT) AS rem FROM drbase),
         |drrank AS (SELECT *, row_number() OVER
         |    (ORDER BY r DESC, wt DESC, domain) AS rnk FROM drbase),
         |drfin AS (SELECT domain, CAST(q + CASE
         |    WHEN rnk <= (SELECT rem FROM drrem) THEN 1 ELSE 0 END AS BIGINT)
         |  AS weight FROM drrank)
         |SELECT e.domain, e.n_docs, e.proxy_bits_x100, e.ref_bits_x100,
         |       e.excess_x100, f.weight
         |FROM dre e JOIN drfin f USING (domain)
         |ORDER BY e.domain""".stripMargin) { (s, d) =>
      graft.ext.Curation.domainReweight(Tables.documents(s, d))
    }.sortedBy(col("domain")),

    // DoReMi reweighting under PERSISTED models — the production
    // posture (train once, reweight every snapshot against the SAME
    // pinned artifacts): proxy = the disk-round-tripped stupid-backoff
    // trigram bundle, reference = the Kneser–Ney bundle, both trained
    // on the even-id half (the t_trigram_persisted/t_kn_persisted
    // lifecycle). The oracle chains the two PROVEN persisted-rung
    // scoring CTE families over one shared even-half model and replays
    // the same domain rollup + Hamilton allocation as
    // t_domain_reweight.
    QueryDef("t_domain_reweight_persisted",
      s"""WITH tw AS (SELECT string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0),
         |uni AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(ws) AS gram FROM tw) GROUP BY 1),
         |nv AS (SELECT CAST(sum(cnt) + count(*) AS BIGINT) AS nv FROM uni),
         |bi AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(2, len(ws)),
         |      i -> ws[i-1] || ' ' || ws[i])) AS gram FROM tw) GROUP BY 1),
         |tri AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(3, len(ws)),
         |      i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS gram
         |    FROM tw) GROUP BY 1),
         |kn12 AS (SELECT string_split(gram, ' ')[1] || ' ' ||
         |      string_split(gram, ' ')[2] AS g,
         |    CAST(count(*) AS BIGINT) AS cnt FROM tri GROUP BY 1),
         |kn23 AS (SELECT string_split(gram, ' ')[2] || ' ' ||
         |      string_split(gram, ' ')[3] AS g,
         |    CAST(count(*) AS BIGINT) AS cnt FROM tri GROUP BY 1),
         |knd2 AS (SELECT string_split(g, ' ')[1] AS g2,
         |    CAST(sum(cnt) AS BIGINT) AS cnt FROM kn23 GROUP BY 1),
         |knn2 AS (SELECT string_split(g, ' ')[1] AS g2,
         |    CAST(count(*) AS BIGINT) AS cnt FROM kn23 GROUP BY 1),
         |kn1 AS (SELECT string_split(gram, ' ')[2] AS g1,
         |    CAST(count(*) AS BIGINT) AS cnt FROM bi GROUP BY 1),
         |knbu AS (SELECT CAST((SELECT count(*) FROM bi) +
         |    (SELECT count(*) FROM uni) AS BIGINT) AS bu),
         |dw AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |occ AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(3, len(ws)),
         |    i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS g123
         |  FROM dw),
         |otf AS (SELECT doc_id, g123, CAST(count(*) AS BIGINT) AS tf
         |  FROM occ GROUP BY 1, 2),
         |ox AS (SELECT doc_id, g123, tf,
         |    string_split(g123, ' ')[1] AS w1,
         |    string_split(g123, ' ')[2] AS w2,
         |    string_split(g123, ' ')[3] AS w3 FROM otf),
         |psc AS (SELECT o.doc_id, o.tf,
         |    CAST(CASE
         |      WHEN t.cnt IS NOT NULL AND b12.cnt IS NOT NULL
         |        THEN length(bin(b12.cnt)) - length(bin(t.cnt))
         |      WHEN b23.cnt IS NOT NULL AND u2.cnt IS NOT NULL
         |        THEN length(bin(u2.cnt * 5)) - length(bin(b23.cnt * 2))
         |      ELSE length(bin(n.nv * 25)) -
         |           length(bin((coalesce(u3.cnt, 0) + 1) * 4))
         |    END AS BIGINT) AS bits
         |  FROM ox o
         |  LEFT JOIN tri t ON t.gram = o.g123
         |  LEFT JOIN bi b12 ON b12.gram = o.w1 || ' ' || o.w2
         |  LEFT JOIN bi b23 ON b23.gram = o.w2 || ' ' || o.w3
         |  LEFT JOIN uni u2 ON u2.gram = o.w2
         |  LEFT JOIN uni u3 ON u3.gram = o.w3
         |  CROSS JOIN nv n),
         |pagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n FROM psc GROUP BY 1),
         |rsc AS (SELECT o.doc_id, o.tf,
         |    CAST(CASE
         |      WHEN t.cnt IS NOT NULL AND b12.cnt IS NOT NULL
         |        THEN length(bin(b12.cnt * 4)) - length(bin(t.cnt * 4 - 3))
         |      WHEN k23.cnt IS NOT NULL AND kd.cnt IS NOT NULL
         |        THEN (CASE WHEN b12.cnt IS NOT NULL AND n12.cnt IS NOT NULL
         |                THEN length(bin(b12.cnt * 4)) -
         |                     length(bin(n12.cnt * 3)) ELSE 0 END)
         |          + length(bin(kd.cnt * 4)) - length(bin(k23.cnt * 4 - 3))
         |      ELSE (CASE WHEN b12.cnt IS NOT NULL AND n12.cnt IS NOT NULL
         |              THEN length(bin(b12.cnt * 4)) -
         |                   length(bin(n12.cnt * 3)) ELSE 0 END)
         |        + (CASE WHEN kd.cnt IS NOT NULL AND nk.cnt IS NOT NULL
         |             THEN length(bin(kd.cnt * 4)) -
         |                  length(bin(nk.cnt * 3)) ELSE 0 END)
         |        + length(bin(n.bu)) - length(bin(coalesce(k1.cnt, 0) + 1))
         |    END AS BIGINT) AS bits
         |  FROM ox o
         |  LEFT JOIN tri t ON t.gram = o.g123
         |  LEFT JOIN bi b12 ON b12.gram = o.w1 || ' ' || o.w2
         |  LEFT JOIN kn12 n12 ON n12.g = o.w1 || ' ' || o.w2
         |  LEFT JOIN kn23 k23 ON k23.g = o.w2 || ' ' || o.w3
         |  LEFT JOIN knd2 kd ON kd.g2 = o.w2
         |  LEFT JOIN knn2 nk ON nk.g2 = o.w2
         |  LEFT JOIN kn1 k1 ON k1.g1 = o.w3
         |  CROSS JOIN knbu n),
         |ragg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n FROM rsc GROUP BY 1),
         |drdom AS (SELECT doc_id, source AS domain FROM documents
         |  WHERE source IS NOT NULL),
         |dragg AS (SELECT d.domain, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(coalesce(p.surprisal, 0)) AS BIGINT) AS psur,
         |    CAST(sum(coalesce(p.n, 0)) AS BIGINT) AS pn,
         |    CAST(sum(coalesce(r.surprisal, 0)) AS BIGINT) AS rsur,
         |    CAST(sum(coalesce(r.n, 0)) AS BIGINT) AS rn
         |  FROM drdom d
         |  LEFT JOIN pagg p USING (doc_id)
         |  LEFT JOIN ragg r USING (doc_id)
         |  GROUP BY 1),
         |drm AS (SELECT domain, n_docs,
         |   CASE WHEN pn > 0 THEN CAST((psur * 100) // pn AS BIGINT)
         |        ELSE CAST(0 AS BIGINT) END AS proxy_bits_x100,
         |   CASE WHEN rn > 0 THEN CAST((rsur * 100) // rn AS BIGINT)
         |        ELSE CAST(0 AS BIGINT) END AS ref_bits_x100
         |  FROM dragg),
         |dre AS (SELECT *, CAST(greatest(proxy_bits_x100 - ref_bits_x100, 0)
         |    AS BIGINT) AS excess_x100 FROM drm),
         |drwts AS (SELECT domain,
         |    CASE WHEN (SELECT max(excess_x100) FROM dre) > 0
         |         THEN excess_x100 ELSE CAST(1 AS BIGINT) END AS wt
         |  FROM dre),
         |drtot AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM drwts),
         |drbase AS (SELECT domain, wt, (10000 * wt) // w.tw AS q,
         |    (10000 * wt) % w.tw AS r FROM drwts CROSS JOIN drtot w),
         |drrem AS (SELECT 10000 - CAST(sum(q) AS BIGINT) AS rem FROM drbase),
         |drrank AS (SELECT *, row_number() OVER
         |    (ORDER BY r DESC, wt DESC, domain) AS rnk FROM drbase),
         |drfin AS (SELECT domain, CAST(q + CASE
         |    WHEN rnk <= (SELECT rem FROM drrem) THEN 1 ELSE 0 END AS BIGINT)
         |  AS weight FROM drrank)
         |SELECT e.domain, e.n_docs, e.proxy_bits_x100, e.ref_bits_x100,
         |       e.excess_x100, f.weight
         |FROM dre e JOIN drfin f USING (domain)
         |ORDER BY e.domain""".stripMargin) { (s, d) =>
      graft.ext.Curation.domainReweightWith(Tables.documents(s, d),
        TextAnalysis.loadLmModel(s, trigramLmFor(s, d)),
        TextAnalysis.loadLmModel(s, knLmFor(s, d)))
    }.sortedBy(col("domain")),

    QueryDef("t_domain_mix",
      s"""WITH counts AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
         |w(source, wt) AS (VALUES ('src0', CAST(3 AS BIGINT)),
         |                         ('src1', CAST(2 AS BIGINT)),
         |                         ('src2', CAST(1 AS BIGINT))),
         |tot AS (SELECT sum(wt) AS tw FROM w),
         |tmax AS (SELECT min(c * tw // wt) AS t
         |         FROM counts JOIN w USING (source) CROSS JOIN tot),
         |thr AS (SELECT source, ((wt * t // tw) * 10000 // c) AS keep_thr
         |        FROM counts JOIN w USING (source)
         |        CROSS JOIN tot CROSS JOIN tmax)
         |SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source)
         |WHERE ${polyhash("CAST(d.doc_id AS VARCHAR)")} % 10000 < keep_thr
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Sampling.mixByDomain(
        Tables.documents(s, d).select("doc_id", "source"),
        col("source"), col("doc_id"),
        Seq("src0" -> 3, "src1" -> 2, "src2" -> 1))
    }.sortedBy(col("doc_id")),

    // ── Exact budget apportionment (largest-remainder / Hamilton) ──
    // 37 docs split 5:3:2 over three domains — floor shares 18/11/7,
    // the leftover unit goes to the largest fractional remainder
    // (src0). Unlike the rate-threshold mixers, Σ selected == budget
    // EXACTLY; selection is the stratifiedTake hash order cut to each
    // domain's quota.
    QueryDef("t_apportion_take",
      s"""WITH w(source, wt) AS (VALUES ('src0', CAST(5 AS BIGINT)),
         |                              ('src1', CAST(3 AS BIGINT)),
         |                              ('src2', CAST(2 AS BIGINT))),
         |tw AS (SELECT sum(wt) AS w FROM w),
         |qb AS (SELECT source, wt, 37 * wt // w AS q, (37 * wt) % w AS r
         |       FROM w CROSS JOIN tw),
         |rem AS (SELECT 37 - sum(q) AS rem FROM qb),
         |bump AS (SELECT source, q,
         |    row_number() OVER (ORDER BY r DESC, wt DESC, source) AS rn
         |  FROM qb),
         |quota AS (SELECT source,
         |    CAST(q + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS BIGINT)
         |      AS quota
         |  FROM bump CROSS JOIN rem),
         |sel AS (SELECT d.doc_id, d.source, qt.quota,
         |    row_number() OVER (PARTITION BY d.source
         |      ORDER BY ${polyhash("CAST(d.doc_id AS VARCHAR)")}, d.doc_id)
         |      AS rank
         |  FROM documents d JOIN quota qt USING (source))
         |SELECT doc_id, source, CAST(rank AS BIGINT) AS rank, quota
         |FROM sel WHERE rank <= quota ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        graft.ext.Sampling.takeApportioned(
          Tables.documents(s, d).select("doc_id", "source"),
          "source", "doc_id",
          Seq("src0" -> 5L, "src1" -> 3L, "src2" -> 2L), budget = 37L)
    }.sortedBy(col("doc_id")),

    // ── TOKEN-budget apportioned mix (training mixes are tokens) ───
    // 30k tokens at 3:2:1 over src0/src1/src2: Hamilton-apportioned
    // token quotas, then per domain the inclusive prefix rule over the
    // (hash bucket, id) order — a doc survives iff its running token
    // total fits the domain's quota. The oracle replays the allocation
    // and one partitioned window cumsum; Spark runs the decomposed
    // (domain, bucket-range) prefix sum.
    QueryDef("t_token_apportion",
      s"""WITH w(source, wt) AS (VALUES ('src0', CAST(3 AS BIGINT)),
         |                              ('src1', CAST(2 AS BIGINT)),
         |                              ('src2', CAST(1 AS BIGINT))),
         |tw AS (SELECT sum(wt) AS w FROM w),
         |qb AS (SELECT source, wt, 30000 * wt // w AS q,
         |              (30000 * wt) % w AS r FROM w CROSS JOIN tw),
         |rem AS (SELECT 30000 - sum(q) AS rem FROM qb),
         |bump AS (SELECT source, q,
         |    row_number() OVER (ORDER BY r DESC, wt DESC, source) AS rn
         |  FROM qb),
         |quota AS (SELECT source,
         |    CAST(q + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS BIGINT)
         |      AS quota
         |  FROM bump CROSS JOIN rem),
         |t AS (SELECT d.doc_id, d.source,
         |    CASE WHEN d.text IS NULL THEN 0
         |         ELSE len(string_split(d.text, ' ')) END AS toks,
         |    ${polyhash("CAST(d.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM documents d JOIN quota USING (source)),
         |c AS (SELECT doc_id, source, toks,
         |    sum(toks) OVER (PARTITION BY source ORDER BY bkt, doc_id
         |                    ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         |SELECT c.doc_id, c.source, CAST(c.toks AS BIGINT) AS toks,
         |       q.quota
         |FROM c JOIN quota q USING (source)
         |WHERE c.cum <= q.quota ORDER BY c.doc_id""".stripMargin) {
      (s, d) =>
        graft.ext.Sampling.takeTokenApportioned(
          Tables.documents(s, d).select("doc_id", "source", "text"),
          "source", "doc_id",
          when(col("text").isNull, 0L)
            .otherwise(size(split(col("text"), " ")).cast("long")),
          Seq("src0" -> 3L, "src1" -> 2L, "src2" -> 1L),
          totalTokens = 30000L)
          .select("doc_id", "source", "toks", "quota")
    }.sortedBy(col("doc_id")),

    // ── Token-balanced shard plan ─────────────────────────────────
    // Contiguous cuts of the exclusive token prefix sum in (hash
    // bucket, key) order: shard = min(6, cum_excl DIV ceil(total/7)).
    // Integer division on BOTH engines (DuckDB // = Spark DIV), so an
    // exact boundary can never misround.
    QueryDef("t_shard_plan",
      s"""WITH b AS (
         |  SELECT doc_id, coalesce(n_chars, 0) AS tok,
         |         ${polyhash("CAST(doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, tok,
         |         coalesce(sum(tok) OVER (ORDER BY bkt, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |           0) AS cum_excl
         |  FROM b),
         |t AS (SELECT coalesce(sum(tok), 0) AS total FROM b)
         |SELECT c.doc_id,
         |       CAST(least(6, c.cum_excl
         |            // greatest(1, (t.total + 6) // 7)) AS BIGINT)
         |         AS shard
         |FROM c CROSS JOIN t
         |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Sampling.planShards(
        Tables.documents(s, d).select("doc_id", "n_chars"),
        col("doc_id"), col("n_chars"), numShards = 7)
        .select("doc_id", "shard")
    }.sortedBy(col("doc_id")),

    // ── Deterministic upsampling (epochs-per-domain repeat) ───────
    // src0 repeats 2.5× (2 copies each + hash-selected half get a 3rd),
    // src1 drops to 0×, src2 stays integral 3×, everything else passes
    // through at 1×. copy is the 0-based repeat index.
    QueryDef("t_upsample",
      s"""WITH f(source, num, den) AS (VALUES
         |    ('src0', CAST(5 AS BIGINT), CAST(2 AS BIGINT)),
         |    ('src1', CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
         |    ('src2', CAST(3 AS BIGINT), CAST(1 AS BIGINT))),
         |b AS (
         |  SELECT d.doc_id, d.source,
         |         coalesce(f.num, 1) AS num, coalesce(f.den, 1) AS den,
         |         ${polyhash("CAST(d.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM documents d LEFT JOIN f USING (source)),
         |n AS (
         |  SELECT doc_id, source,
         |         (num - num % den) // den
         |         + CASE WHEN bkt * den < 10000 * (num % den)
         |                THEN 1 ELSE 0 END AS nc
         |  FROM b)
         |SELECT doc_id, source,
         |       CAST(unnest(generate_series(0, CAST(nc - 1 AS BIGINT)))
         |         AS BIGINT) AS copy
         |FROM n WHERE nc > 0
         |ORDER BY doc_id, copy""".stripMargin) { (s, d) =>
      graft.ext.Sampling.upsampleByFactor(
        Tables.documents(s, d).select("doc_id", "source"),
        "source", col("doc_id"),
        Seq("src0" -> (5L, 2L), "src1" -> (0L, 1L), "src2" -> (3L, 1L)))
        .select("doc_id", "source", "copy")
    }.sortedBy(col("doc_id"), col("copy")),

    // ── Curriculum mixing schedule ────────────────────────────────
    // Interpolated per-step domain token budgets: lattice-linear
    // weights start→end over 4 steps (pure endpoints at steps 0/3,
    // news fades out, code fades in), each step Hamilton-apportioned
    // to exactly 1000 tokens. Pure plan arithmetic — no table read.
    QueryDef("t_mix_schedule",
      s"""WITH sw(domain, s) AS (VALUES
         |    ('web', CAST(6 AS BIGINT)), ('books', CAST(3 AS BIGINT)),
         |    ('news', CAST(1 AS BIGINT))),
         |ewt(domain, e) AS (VALUES
         |    ('web', CAST(2 AS BIGINT)), ('books', CAST(3 AS BIGINT)),
         |    ('code', CAST(5 AS BIGINT))),
         |doms AS (SELECT d.domain, coalesce(s.s, 0) AS s,
         |               coalesce(e.e, 0) AS e
         |         FROM (SELECT domain FROM sw
         |               UNION SELECT domain FROM ewt) d
         |         LEFT JOIN sw s USING (domain)
         |         LEFT JOIN ewt e USING (domain)),
         |steps AS (SELECT unnest(generate_series(0, 3)) AS st),
         |iw AS (SELECT st, domain, s * (3 - st) + e * st AS w
         |       FROM doms CROSS JOIN steps),
         |tw AS (SELECT st, sum(w) AS tot FROM iw GROUP BY 1),
         |qb AS (SELECT iw.st, domain, w, 1000 * w // tot AS q,
         |              (1000 * w) % tot AS r
         |       FROM iw JOIN tw USING (st)),
         |rem AS (SELECT st, 1000 - sum(q) AS rem FROM qb GROUP BY 1),
         |bump AS (SELECT st, domain, q,
         |    row_number() OVER (PARTITION BY st
         |      ORDER BY r DESC, w DESC, domain) AS rn
         |  FROM qb)
         |SELECT CAST(b.st AS BIGINT) AS step, b.domain,
         |       CAST(q + CASE WHEN rn <= rem THEN 1 ELSE 0 END
         |         AS BIGINT) AS tokens
         |FROM bump b JOIN rem USING (st)
         |ORDER BY step, domain""".stripMargin) { (s, d) =>
      graft.ext.Sampling.mixSchedule(s,
        Seq("web" -> 6L, "books" -> 3L, "news" -> 1L),
        Seq("web" -> 2L, "books" -> 3L, "code" -> 5L),
        steps = 4, tokensPerStep = 1000L)
    }.sortedBy(col("step"), col("domain")),

    // ── Temperature-smoothed domain resampling (alpha = 1/2) ──────
    // keep_d = floor(sqrt(c_d · c_min)) — the geometric interpolation
    // between natural mixture and uniform; threshold math then mirrors
    // t_domain_mix. The Spark side computes the root in exact BigInt
    // (Sampling.iroot); the oracle's floor(sqrt(double)) agrees exactly
    // while c_d·c_min < ~2^50 (IEEE sqrt is correctly rounded, and at
    // oracle scale the gap to the next integer dwarfs one ulp).
    QueryDef("t_temperature_mix",
      s"""WITH counts AS (SELECT source, count(*) AS c FROM documents
         |               WHERE source IS NOT NULL GROUP BY source),
         |cmin AS (SELECT min(c) AS cm FROM counts),
         |thr AS (SELECT source,
         |          (CAST(floor(sqrt(CAST(c * cm AS DOUBLE))) AS BIGINT)
         |             * 10000 // c) AS keep_thr
         |        FROM counts CROSS JOIN cmin)
         |SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source)
         |WHERE ${polyhash("CAST(d.doc_id AS VARCHAR)")} % 10000 < keep_thr
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Sampling.temperatureMix(
        Tables.documents(s, d).select("doc_id", "source"),
        col("source"), col("doc_id"), alphaNum = 1, alphaDen = 2)
    }.sortedBy(col("doc_id")),

    // ── DSIR importance weights (Xie et al. 2023) ──────────────────
    // Every corpus doc scored by how much more likely its hashed
    // {1,2}-gram bag is under the TARGET distribution (source = src0)
    // than under the raw corpus — add-one-smoothed bucket models,
    // integer-exact via the bin-length floor-log2 law. The oracle
    // replays the PolyHash-mod-4096 feature hashing, both models, the
    // per-bucket weights and the total shift bit for bit.
    QueryDef("t_dsir_weights",
      s"""WITH tgt AS (SELECT doc_id, text FROM documents
         |            WHERE source = 'src0'),
         |${dsirCtes("documents", "tgt", 4096)}
         |SELECT d.doc_id,
         |  CAST(coalesce(a.gb, 0) + coalesce(a.n_grams, 0)
         |       * (SELECT shift FROM dsshift) AS BIGINT) AS dsir_bits,
         |  coalesce(a.n_grams, 0) AS n_grams
         |FROM documents d LEFT JOIN dsagg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Sampling.dsirWeights(docs,
        docs.filter(col("source") === "src0"))
    }.sortedBy(col("doc_id")),

    // ── DSIR selection (deterministic top-n most target-like) ──────
    QueryDef("t_dsir_select",
      s"""WITH tgt AS (SELECT doc_id, text FROM documents
         |            WHERE source = 'src0'),
         |${dsirCtes("documents", "tgt", 4096)},
         |dscored AS (SELECT d.doc_id,
         |    CAST(coalesce(a.gb, 0) + coalesce(a.n_grams, 0)
         |         * (SELECT shift FROM dsshift) AS BIGINT) AS dsir_bits,
         |    coalesce(a.n_grams, 0) AS n_grams
         |  FROM documents d LEFT JOIN dsagg a USING (doc_id))
         |SELECT doc_id, dsir_bits, n_grams,
         |  CAST(row_number() OVER (ORDER BY dsir_bits DESC, doc_id)
         |    AS BIGINT) AS rank
         |FROM dscored ORDER BY dsir_bits DESC, doc_id
         |LIMIT 100""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Sampling.dsirSelect(docs,
        docs.filter(col("source") === "src0"), n = 100)
    }.sortedBy(col("rank")),

    // ── Benchmark decontamination (n-gram overlap vs a held-out set) ──
    // Corpus docs sharing >= 2 distinct word 3-gram hashes with the
    // benchmark slice (doc_id % 97 = 3) are contaminated. The oracle
    // replays the same shingle → PolyHash chain on both relations and
    // counts per-doc join hits against the benchmark's DISTINCT gram
    // set (a doc's hash set is list_distinct, so hits = distinct
    // overlap). Spark side broadcasts the benchmark gram set — the
    // corpus scan is never shuffled.
    QueryDef("t_contamination_report",
      s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 3),
         |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 3),
         |${hashesCteFrom("bench", "b")},
         |${hashesCteFrom("corpus", "c")},
         |bgrams AS (SELECT DISTINCT unnest(hs) AS gram FROM bhashes),
         |cgrams AS (SELECT doc_id, unnest(hs) AS gram FROM chashes),
         |hits AS (SELECT c.doc_id, count(*) AS overlap_grams
         |         FROM cgrams c JOIN bgrams b USING (gram) GROUP BY c.doc_id)
         |SELECT doc_id, overlap_grams FROM hits WHERE overlap_grams >= 2
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Decontamination.contaminationReport(
        docs.filter("doc_id % 97 <> 3"), docs.filter("doc_id % 97 = 3"),
        minOverlap = 2)
    }.sortedBy(col("doc_id")),

    QueryDef("t_decontaminate",
      s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 3),
         |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 3),
         |${hashesCteFrom("bench", "b")},
         |${hashesCteFrom("corpus", "c")},
         |bgrams AS (SELECT DISTINCT unnest(hs) AS gram FROM bhashes),
         |cgrams AS (SELECT doc_id, unnest(hs) AS gram FROM chashes),
         |hits AS (SELECT c.doc_id, count(*) AS overlap_grams
         |         FROM cgrams c JOIN bgrams b USING (gram) GROUP BY c.doc_id)
         |SELECT doc_id FROM corpus
         |WHERE doc_id NOT IN (SELECT doc_id FROM hits WHERE overlap_grams >= 2)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Decontamination.decontaminate(
        docs.filter("doc_id % 97 <> 3"), docs.filter("doc_id % 97 = 3"),
        minOverlap = 2)
        .select(col("doc_id"))
    }.sortedBy(col("doc_id")),

    // Bloom-gated decontamination: the corpus-vs-corpus scale path —
    // a reference gram set too large to broadcast folds into an m-bit
    // Bloom bitset (one distributed OR-fold pass), corpus grams are cut
    // MAP-SIDE by the codegen'd probe, and the exact confirm join
    // removes the false positives. Zero false negatives ⇒ the result is
    // bit-identical to the plain exact operator, so the oracle IS the
    // plain exact query (the j_salted_join invisibility contract). A
    // deliberately tiny bitset (4096 bits → high FPR) keeps the confirm
    // join honest in the compare.
    QueryDef("t_bloom_decontaminate",
      s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 89 = 7),
         |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 89 <> 7),
         |${hashesCteFrom("bench", "b")},
         |${hashesCteFrom("corpus", "c")},
         |bgrams AS (SELECT DISTINCT unnest(hs) AS gram FROM bhashes),
         |cgrams AS (SELECT doc_id, unnest(hs) AS gram FROM chashes),
         |hits AS (SELECT c.doc_id, count(*) AS overlap_grams
         |         FROM cgrams c JOIN bgrams b USING (gram) GROUP BY c.doc_id)
         |SELECT doc_id FROM corpus
         |WHERE doc_id NOT IN (SELECT doc_id FROM hits WHERE overlap_grams >= 2)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.BloomGate.decontaminate(
        docs.filter("doc_id % 89 <> 7"), docs.filter("doc_id % 89 = 7"),
        minOverlap = 2, numBits = 4096, k = 5)
        .select(col("doc_id"))
    }.sortedBy(col("doc_id")),

    // N-gram novelty scoring — the positive complement of
    // decontamination: per target document, how many of its distinct
    // shingles the reference split has NOT seen (data-selection
    // pipelines upweight novel text over boilerplate the previous
    // snapshot already carried). Same shingle machinery, scoring
    // instead of filtering.
    QueryDef("t_novelty",
      s"""WITH ref AS (SELECT doc_id, text FROM documents WHERE doc_id % 83 = 5),
         |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 83 <> 5),
         |${hashesCteFrom("ref", "r")},
         |${hashesCteFrom("corpus", "c")},
         |rgrams AS (SELECT DISTINCT unnest(hs) AS gram FROM rhashes),
         |cgrams AS (SELECT doc_id, unnest(hs) AS gram FROM chashes),
         |agg AS (SELECT c.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(coalesce(sum(CASE WHEN r.gram IS NOT NULL THEN 1 END), 0)
         |         AS BIGINT) AS n_seen
         |  FROM cgrams c LEFT JOIN rgrams r USING (gram) GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(a.n_grams, 0) AS n_grams,
         |  coalesce(a.n_seen, 0) AS n_seen,
         |  CASE WHEN coalesce(a.n_grams, 0) > 0
         |       THEN CAST((a.n_grams - a.n_seen) * 100 // a.n_grams AS BIGINT)
         |       ELSE 100 END AS novelty_x100
         |FROM corpus d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Decontamination.novelty(
        docs.filter("doc_id % 83 <> 5"), docs.filter("doc_id % 83 = 5"))
    }.sortedBy(col("doc_id")),

    // ── End-to-end corpus-curation flagship ────────────────────────
    // quality gate → near-dup dedup (keep cluster representatives
    // among SURVIVORS) → deterministic split — one consumable derived
    // relation, the whole LLM-pipeline chained and oracle-gated. The
    // DuckDB side re-chains the exact CTEs of t_text_stats (quality),
    // t_dedup_clusters (collapse) and t_split_assign (assignment) over
    // the quality-filtered sub-relation.
    // ── TRAINING-PREP flagship: the full batch path a training run
    // consumes — curate (quality gate → near-dup keep → split) → take
    // the train split → fill a token budget best-quality-first → pack
    // into 512-token context windows. Every stage is an
    // already-oracle-verified operator; this query proves they COMPOSE
    // (one SQL chain replays quality CTEs + recursive clustering +
    // split + both decomposed prefix-sums).
    QueryDef("t_training_prep",
      s"""WITH RECURSIVE ${qualityCtes("documents")},
         |curated AS (SELECT doc_id, text FROM qscored WHERE quality >= 3),
         |${hashesCteFrom("curated")},
         |$sigCte,
         |${clusterCtes("curated", jNum = 8, jDen = 10)},
         |keeps AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
         |withb AS (
         |  SELECT q.doc_id, q.quality,
         |         ${polyhash("CAST(q.doc_id AS VARCHAR)")} % 10000 AS bkt,
         |         CAST(len(string_split(q.text, ' ')) AS BIGINT) AS toks
         |  FROM qscored q JOIN keeps k ON k.doc_id = q.doc_id),
         |trn AS (SELECT * FROM withb WHERE bkt < 8000),
         |bsel AS (SELECT doc_id, quality, toks, bkt,
         |  sum(toks) OVER (ORDER BY quality DESC, bkt, doc_id
         |                  ROWS UNBOUNDED PRECEDING) AS cum FROM trn),
         |sel AS (SELECT * FROM bsel WHERE cum <= 12000),
         |pck AS (SELECT doc_id, quality, toks,
         |  sum(toks) OVER (ORDER BY bkt, doc_id
         |                  ROWS UNBOUNDED PRECEDING) AS pcum FROM sel)
         |SELECT doc_id, CAST(quality AS BIGINT) AS quality,
         |       CAST((pcum - toks) // 512 AS BIGINT) AS pack
         |FROM pck ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val curated = graft.ext.Curation.curate(docs)
      val toks = docs.select(col("doc_id"),
        when(col("text").isNull, 0)
          .otherwise(size(split(col("text"), " "))).as("toks"))
      val train = curated.filter(col("split") === "train")
        .join(toks, "doc_id")
      val sel = graft.ext.Packing.selectByBudget(train, col("doc_id"),
        col("toks"), col("quality"), 12000L)
      graft.ext.Packing.packSequences(sel, col("doc_id"), col("toks"), 512L)
        .select(col("doc_id"), col("quality"), col("pack"))
    }.sortedBy(col("doc_id")),

    // ── CCNet flagship: perplexity buckets → keep head+middle →
    // curate → split (Wenzek et al. end-to-end). The DuckDB side chains
    // the PROVEN CTE families: the t_surprisal + t_ppl_buckets chain
    // computes per-domain buckets, `ckept` keeps head/middle (null
    // buckets — null domain — drop with the tail), and the
    // t_curate_corpus chain (quality CTEs + recursive clustering +
    // split buckets) runs over the survivors.
    QueryDef("t_ccnet_curate",
      s"""WITH RECURSIVE utf AS (
         |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |    FROM documents WHERE text IS NOT NULL) u GROUP BY 1, 2),
         |ucnt AS (SELECT word, CAST(sum(tf) AS BIGINT) AS cnt
         |  FROM utf GROUP BY 1),
         |utot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM ucnt),
         |usc AS (SELECT t.doc_id, t.tf,
         |    CAST(length(bin(u.total)) - length(bin(c.cnt)) AS BIGINT) AS bits
         |  FROM utf t JOIN ucnt c USING (word) CROSS JOIN utot u),
         |uagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n_tokens FROM usc GROUP BY 1),
         |psc AS (SELECT d.doc_id, d.source,
         |    CASE WHEN coalesce(a.n_tokens, 0) > 0
         |         THEN CAST((a.surprisal * 100) // a.n_tokens AS BIGINT)
         |         ELSE CAST(0 AS BIGINT) END AS m
         |  FROM documents d LEFT JOIN uagg a USING (doc_id)),
         |phist AS (SELECT source, m AS v, count(*) AS c FROM psc GROUP BY 1, 2),
         |pcum AS (SELECT source, v, sum(c) OVER (PARTITION BY source ORDER BY v
         |        ROWS UNBOUNDED PRECEDING) AS cumc FROM phist),
         |ptot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |         FROM phist GROUP BY 1),
         |p33 AS (SELECT c.source, min(v) AS p33 FROM pcum c
         |  JOIN ptot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 33 + 99) // 100 GROUP BY 1),
         |p67 AS (SELECT c.source, min(v) AS p67 FROM pcum c
         |  JOIN ptot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 67 + 99) // 100 GROUP BY 1),
         |cbuck AS (SELECT s.doc_id, s.m,
         |    CASE WHEN p33.p33 IS NULL THEN NULL
         |         WHEN s.m <= p33.p33 THEN 'head'
         |         WHEN s.m <= p67.p67 THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |  FROM psc s
         |  LEFT JOIN p33 ON p33.source = s.source
         |  LEFT JOIN p67 ON p67.source = s.source),
         |ckept AS (SELECT d.doc_id, d.text FROM documents d
         |  JOIN cbuck b ON b.doc_id = d.doc_id
         |  WHERE b.bucket IN ('head', 'middle')),
         |${qualityCtes("ckept")},
         |curated AS (SELECT doc_id, text FROM qscored WHERE quality >= 3),
         |${hashesCteFrom("curated")},
         |$sigCte,
         |${clusterCtes("curated", jNum = 8, jDen = 10)},
         |keeps AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
         |withb AS (
         |  SELECT q.doc_id, q.quality,
         |         ${polyhash("CAST(q.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM qscored q JOIN keeps k ON k.doc_id = q.doc_id)
         |SELECT w.doc_id, b.m AS mean_bits_x100, b.bucket,
         |       CAST(w.quality AS BIGINT) AS quality,
         |       CASE WHEN w.bkt < 8000 THEN 'train'
         |            WHEN w.bkt < 9000 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM withb w JOIN cbuck b ON b.doc_id = w.doc_id
         |ORDER BY w.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Curation.ccnetCurate(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // The CCNet flagship under a PERSISTED perplexity model — the
    // production posture (train once on the trusted half, curate every
    // snapshot against the SAME pinned artifact): the proxy scorer is
    // the disk-round-tripped stupid-backoff trigram bundle
    // (t_trigram_persisted's lifecycle), swapped into the identical
    // bucket → keep → curate → split chain. The oracle is
    // t_ccnet_curate with its unigram scoring CTEs replaced by the
    // proven even-half trigram scoring CTEs.
    QueryDef("t_ccnet_curate_persisted",
      s"""WITH RECURSIVE tw AS (SELECT string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0),
         |uni AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(ws) AS gram FROM tw) GROUP BY 1),
         |nv AS (SELECT CAST(sum(cnt) + count(*) AS BIGINT) AS nv FROM uni),
         |bi AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(2, len(ws)),
         |      i -> ws[i-1] || ' ' || ws[i])) AS gram FROM tw) GROUP BY 1),
         |tri AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(generate_series(3, len(ws)),
         |      i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS gram
         |    FROM tw) GROUP BY 1),
         |dw AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |occ AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(3, len(ws)),
         |    i -> ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i])) AS g123
         |  FROM dw),
         |otf AS (SELECT doc_id, g123, CAST(count(*) AS BIGINT) AS tf
         |  FROM occ GROUP BY 1, 2),
         |ox AS (SELECT doc_id, g123, tf,
         |    string_split(g123, ' ')[1] AS w1,
         |    string_split(g123, ' ')[2] AS w2,
         |    string_split(g123, ' ')[3] AS w3 FROM otf),
         |tsc AS (SELECT o.doc_id, o.tf,
         |    CAST(CASE
         |      WHEN t.cnt IS NOT NULL AND b12.cnt IS NOT NULL
         |        THEN length(bin(b12.cnt)) - length(bin(t.cnt))
         |      WHEN b23.cnt IS NOT NULL AND u2.cnt IS NOT NULL
         |        THEN length(bin(u2.cnt * 5)) - length(bin(b23.cnt * 2))
         |      ELSE length(bin(n.nv * 25)) -
         |           length(bin((coalesce(u3.cnt, 0) + 1) * 4))
         |    END AS BIGINT) AS bits
         |  FROM ox o
         |  LEFT JOIN tri t ON t.gram = o.g123
         |  LEFT JOIN bi b12 ON b12.gram = o.w1 || ' ' || o.w2
         |  LEFT JOIN bi b23 ON b23.gram = o.w2 || ' ' || o.w3
         |  LEFT JOIN uni u2 ON u2.gram = o.w2
         |  LEFT JOIN uni u3 ON u3.gram = o.w3
         |  CROSS JOIN nv n),
         |tagg AS (SELECT doc_id, CAST(sum(tf * bits) AS BIGINT) AS surprisal,
         |    CAST(sum(tf) AS BIGINT) AS n FROM tsc GROUP BY 1),
         |psc AS (SELECT d.doc_id, d.source,
         |    CASE WHEN coalesce(a.n, 0) > 0
         |         THEN CAST((a.surprisal * 100) // a.n AS BIGINT)
         |         ELSE CAST(0 AS BIGINT) END AS m
         |  FROM documents d LEFT JOIN tagg a USING (doc_id)),
         |phist AS (SELECT source, m AS v, count(*) AS c FROM psc GROUP BY 1, 2),
         |pcum AS (SELECT source, v, sum(c) OVER (PARTITION BY source ORDER BY v
         |        ROWS UNBOUNDED PRECEDING) AS cumc FROM phist),
         |ptot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |         FROM phist GROUP BY 1),
         |p33 AS (SELECT c.source, min(v) AS p33 FROM pcum c
         |  JOIN ptot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 33 + 99) // 100 GROUP BY 1),
         |p67 AS (SELECT c.source, min(v) AS p67 FROM pcum c
         |  JOIN ptot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 67 + 99) // 100 GROUP BY 1),
         |cbuck AS (SELECT s.doc_id, s.m,
         |    CASE WHEN p33.p33 IS NULL THEN NULL
         |         WHEN s.m <= p33.p33 THEN 'head'
         |         WHEN s.m <= p67.p67 THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |  FROM psc s
         |  LEFT JOIN p33 ON p33.source = s.source
         |  LEFT JOIN p67 ON p67.source = s.source),
         |ckept AS (SELECT d.doc_id, d.text FROM documents d
         |  JOIN cbuck b ON b.doc_id = d.doc_id
         |  WHERE b.bucket IN ('head', 'middle')),
         |${qualityCtes("ckept")},
         |curated AS (SELECT doc_id, text FROM qscored WHERE quality >= 3),
         |${hashesCteFrom("curated")},
         |$sigCte,
         |${clusterCtes("curated", jNum = 8, jDen = 10)},
         |keeps AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
         |withb AS (
         |  SELECT q.doc_id, q.quality,
         |         ${polyhash("CAST(q.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM qscored q JOIN keeps k ON k.doc_id = q.doc_id)
         |SELECT w.doc_id, b.m AS mean_bits_x100, b.bucket,
         |       CAST(w.quality AS BIGINT) AS quality,
         |       CASE WHEN w.bkt < 8000 THEN 'train'
         |            WHEN w.bkt < 9000 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM withb w JOIN cbuck b ON b.doc_id = w.doc_id
         |ORDER BY w.doc_id""".stripMargin) { (s, d) =>
      graft.ext.Curation.ccnetCurateWith(Tables.documents(s, d),
        TextAnalysis.loadLmModel(s, trigramLmFor(s, d)))
    }.sortedBy(col("doc_id")),

    QueryDef("t_curate_corpus",
      s"""WITH RECURSIVE ${qualityCtes("documents")},
         |curated AS (SELECT doc_id, text FROM qscored WHERE quality >= 3),
         |${hashesCteFrom("curated")},
         |$sigCte,
         |${clusterCtes("curated", jNum = 8, jDen = 10)},
         |keeps AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_id),
         |withb AS (
         |  SELECT q.doc_id, q.quality,
         |         ${polyhash("CAST(q.doc_id AS VARCHAR)")} % 10000 AS bkt
         |  FROM qscored q JOIN keeps k ON k.doc_id = q.doc_id)
         |SELECT doc_id, quality,
         |       CASE WHEN bkt < 8000 THEN 'train'
         |            WHEN bkt < 9000 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM withb ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.ext.Curation.curate(Tables.documents(s, d))
    }.sortedBy(col("doc_id")),

    // ── Streaming ingest gate, batch core oracle-gated ─────────────
    // The gate's admit decision replayed end to end in SQL: stage 1
    // seeds the store through the SAME pipeline (exact-collapse of the
    // even ids, capped within-batch near-dup drop); stage 2 probes the
    // odd ids + redelivered evens — store-id anti-join, near-dups vs
    // the store's (uncapped) band rows, then the capped within-batch
    // pairwise rule. Output = admitted doc ids.
    QueryDef("t_ingest_gate",
      s"""WITH $hashesCte, $sigCte,
         |${collapseCtes(GateStorePred, "s")},
         |${bandsOverCte("sreps", "sbands", Dedup.DefaultMaxBucketWidth)},
         |${selfCandCte("sbands", "scand")},
         |${jaccardDropCte("scand", "sdrop", 8, 10)},
         |store AS (SELECT doc_id FROM sreps
         |  WHERE doc_id NOT IN (SELECT doc_id FROM sdrop)),
         |${collapseCtes(GateBatchPred, "b")},
         |unknown AS (SELECT doc_id FROM breps
         |  WHERE doc_id NOT IN (SELECT doc_id FROM store)),
         |${bandsOverCte("unknown", "ubands", 0)},
         |${bandsOverCte("store", "stbands", 0)},
         |ncand AS (SELECT DISTINCT t.doc_id AS doc_a, u.doc_id AS doc_b
         |  FROM ubands u JOIN stbands t
         |    ON u.band = t.band AND u.bkey = t.bkey),
         |${jaccardDropCte("ncand", "ndrop", 8, 10)},
         |surv AS (SELECT doc_id FROM unknown
         |  WHERE doc_id NOT IN (SELECT doc_id FROM ndrop)),
         |${bandsOverCte("surv", "wbands", Dedup.DefaultMaxBucketWidth)},
         |${selfCandCte("wbands", "wcand")},
         |${jaccardDropCte("wcand", "wdrop", 8, 10)}
         |SELECT doc_id FROM surv
         |WHERE doc_id NOT IN (SELECT doc_id FROM wdrop)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val batch = Tables.documents(s, d).filter(expr(GateBatchPred))
      graft.streaming.IngestDedupGate.filterNovel(batch, gateStoreFor(s, d))
        .select(col("doc_id"))
    }.sortedBy(col("doc_id")),

    // The BATCH PROBE against the same pre-committed store: every doc
    // of the offline drop gets the stage that decided it (exact copy in
    // the drop / id already stored / near-dup of stored content /
    // near-dup of a smaller-id drop survivor / admit) — the read-only
    // "backfill arrives as files" screen. The oracle replays all four
    // stages with the verdict CASE in filterNovel's stage order; the
    // admit set is definitionally t_ingest_gate's output (and
    // IngestGateSpec asserts probe ≡ filterNovel on a live store).
    QueryDef("t_gate_probe_batch",
      s"""WITH $hashesCte, $sigCte,
         |${collapseCtes(GateStorePred, "s")},
         |${bandsOverCte("sreps", "sbands", Dedup.DefaultMaxBucketWidth)},
         |${selfCandCte("sbands", "scand")},
         |${jaccardDropCte("scand", "sdrop", 8, 10)},
         |store AS (SELECT doc_id FROM sreps
         |  WHERE doc_id NOT IN (SELECT doc_id FROM sdrop)),
         |${collapseCtes(GateBatchPred, "b")},
         |bmem AS (SELECT h.doc_id, coalesce(g.rep, h.doc_id) AS rep
         |  FROM hashes h LEFT JOIN bgrp g ON h.hs = g.hs
         |  WHERE ($GateBatchPred)),
         |unknown AS (SELECT doc_id FROM breps
         |  WHERE doc_id NOT IN (SELECT doc_id FROM store)),
         |${bandsOverCte("unknown", "ubands", 0)},
         |${bandsOverCte("store", "stbands", 0)},
         |ncand AS (SELECT DISTINCT t.doc_id AS doc_a, u.doc_id AS doc_b
         |  FROM ubands u JOIN stbands t
         |    ON u.band = t.band AND u.bkey = t.bkey),
         |${jaccardDropCte("ncand", "ndrop", 8, 10)},
         |surv AS (SELECT doc_id FROM unknown
         |  WHERE doc_id NOT IN (SELECT doc_id FROM ndrop)),
         |${bandsOverCte("surv", "wbands", Dedup.DefaultMaxBucketWidth)},
         |${selfCandCte("wbands", "wcand")},
         |${jaccardDropCte("wcand", "wdrop", 8, 10)}
         |SELECT m.doc_id,
         |  CASE WHEN m.doc_id <> m.rep THEN 'exact_dup_batch'
         |       WHEN m.doc_id IN (SELECT doc_id FROM store) THEN 'known_id'
         |       WHEN m.doc_id IN (SELECT doc_id FROM ndrop)
         |         THEN 'store_near_dup'
         |       WHEN m.doc_id IN (SELECT doc_id FROM wdrop)
         |         THEN 'batch_near_dup'
         |       ELSE 'admit' END AS verdict
         |FROM bmem m ORDER BY m.doc_id""".stripMargin) { (s, d) =>
      val drop = Tables.documents(s, d).filter(expr(GateBatchPred))
      graft.streaming.IngestDedupGate.probeBatch(drop, gateStoreFor(s, d))
    }.sortedBy(col("doc_id")),

    // ── Passage-level exact dedup (CCNet/RefinedWeb line dedup) ────
    // 8-word passages hashed corpus-wide; duplicated passages keep
    // only the first occurrence (min doc·2²⁰+idx key — a skew-safe min
    // aggregation on both engines); documents reassembled from
    // surviving passages. Natural duplication: the generator plants
    // repeated spans across documents, so the keep set is non-trivial.
    QueryDef("t_passage_dedup",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT doc_id, ws,
         |  unnest(CASE WHEN len(ws) > 0 THEN range(0, len(ws), 8)
         |         ELSE [] END) AS st FROM w),
         |p AS (SELECT doc_id, CAST(st // 8 AS BIGINT) AS cid,
         |  array_to_string(ws[st+1:st+8], ' ') AS ct FROM s),
         |ph AS (SELECT doc_id, cid, ct, ${polyhash64("ct")} AS h,
         |  doc_id * ${Dedup.PassageKeyBase} + cid AS k FROM p),
         |f AS (SELECT h, min(k) AS mk FROM ph GROUP BY h),
         |fl AS (SELECT ph.doc_id, ph.cid, ph.ct, ph.k = f.mk AS keep
         |  FROM ph JOIN f ON f.h = ph.h),
         |agg AS (SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS np,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS nk,
         |  string_agg(CASE WHEN keep THEN ct END, ' ' ORDER BY cid) AS ctext
         |  FROM fl GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN d.text IS NULL THEN NULL
         |       ELSE coalesce(a.ctext, '') END AS clean_text,
         |  CAST(coalesce(a.np, 0) AS BIGINT) AS n_passages,
         |  CAST(coalesce(a.nk, 0) AS BIGINT) AS n_kept
         |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Dedup.dedupPassages(Tables.documents(s, d), window = 8)
    }.sortedBy(col("doc_id")),

    // Per-DOCUMENT scope: intra-doc repeated-span trim. Each doc's own
    // first 8-word passage is PLANTED again at its head (both sides),
    // so every ≥8-word document carries a genuine intra-doc duplicate;
    // cross-doc duplicates must survive (scope is the document).
    QueryDef("t_passage_dedup_doc",
      s"""WITH w0 AS (SELECT doc_id, text, string_split(text, ' ') AS ws0
         |  FROM documents),
         |pl AS (SELECT doc_id,
         |  CASE WHEN text IS NULL THEN NULL
         |       ELSE array_to_string(ws0[1:8], ' ') || ' ' || text
         |  END AS text FROM w0),
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM pl
         |  WHERE text IS NOT NULL),
         |s AS (SELECT doc_id, ws,
         |  unnest(CASE WHEN len(ws) > 0 THEN range(0, len(ws), 8)
         |         ELSE [] END) AS st FROM w),
         |p AS (SELECT doc_id, CAST(st // 8 AS BIGINT) AS cid,
         |  array_to_string(ws[st+1:st+8], ' ') AS ct FROM s),
         |ph AS (SELECT doc_id, cid, ct, ${polyhash64("ct")} AS h,
         |  doc_id * ${Dedup.PassageKeyBase} + cid AS k FROM p),
         |f AS (SELECT doc_id, h, min(k) AS mk FROM ph GROUP BY 1, 2),
         |fl AS (SELECT ph.doc_id, ph.cid, ph.ct, ph.k = f.mk AS keep
         |  FROM ph JOIN f ON f.h = ph.h AND f.doc_id = ph.doc_id),
         |agg AS (SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS np,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS nk,
         |  string_agg(CASE WHEN keep THEN ct END, ' ' ORDER BY cid) AS ctext
         |  FROM fl GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN d.text IS NULL THEN NULL
         |       ELSE coalesce(a.ctext, '') END AS clean_text,
         |  CAST(coalesce(a.np, 0) AS BIGINT) AS n_passages,
         |  CAST(coalesce(a.nk, 0) AS BIGINT) AS n_kept
         |FROM pl d LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val planted = docs.select(col("doc_id"),
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(concat(
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)),
            lit(" "), col("text"))).as("text"))
      Dedup.dedupPassages(planted, window = 8, perDocument = true)
    }.sortedBy(col("doc_id")),

    // ── Content-defined chunking passage dedup (edit-robust) ───────
    // Chunk boundaries fall where the trailing 4-word shingle's
    // PolyHash ≡ 0 mod 8 — a pure function of local content, so the
    // PLANTED copies (every doc_id < 25 re-appears under +100000 with
    // one word PREPENDED) re-synchronize after the first boundary and
    // their chunks dedup against the originals, where fixed-stride
    // windows would all shift and match nothing. Oracle replays the
    // boundary rule, bounds assembly, slicing, min-key law and
    // reassembly bit for bit.
    QueryDef("t_passage_dedup_cdc", {
      // the boundary lambda variable must NOT be `i` — polyhash()'s own
      // inner list_transform binds `i`, and DuckDB resolves the inner
      // binding (shadowing), which would hash with the character index
      // in place of the word index
      val shingle = "ws[bi-3] || ' ' || ws[bi-2] || ' ' || ws[bi-1] || ' ' || ws[bi]"
      s"""WITH aug AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, 'zzz ' || text FROM documents
         |  WHERE doc_id < 25 AND text IS NOT NULL),
         |cw AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM aug WHERE text IS NOT NULL),
         |cbn AS (SELECT doc_id, ws, list_concat(list_concat(
         |    [0],
         |    CASE WHEN len(ws) - 1 >= 4 THEN
         |      list_filter(generate_series(4, len(ws) - 1),
         |        bi -> (${polyhash(shingle)}) % 8 = 0)
         |    ELSE [] END),
         |    [len(ws)]) AS bounds FROM cw),
         |cch AS (SELECT doc_id, ws, bounds,
         |    unnest(generate_series(2, len(bounds))) AS j FROM cbn),
         |p AS (SELECT doc_id, CAST(j - 2 AS BIGINT) AS cid,
         |    array_to_string(ws[bounds[j-1]+1 : bounds[j]], ' ') AS ct
         |  FROM cch),
         |ph AS (SELECT doc_id, cid, ct, ${polyhash64("ct")} AS h,
         |  doc_id * ${Dedup.PassageKeyBase} + cid AS k FROM p),
         |f AS (SELECT h, min(k) AS mk FROM ph GROUP BY h),
         |fl AS (SELECT ph.doc_id, ph.cid, ph.ct, ph.k = f.mk AS keep
         |  FROM ph JOIN f ON f.h = ph.h),
         |agg AS (SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS np,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS nk,
         |  string_agg(CASE WHEN keep THEN ct END, ' ' ORDER BY cid) AS ctext
         |  FROM fl GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN d.text IS NULL THEN NULL
         |       ELSE coalesce(a.ctext, '') END AS clean_text,
         |  CAST(coalesce(a.np, 0) AS BIGINT) AS n_passages,
         |  CAST(coalesce(a.nk, 0) AS BIGINT) AS n_kept
         |FROM aug d LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val planted = docs.select(col("doc_id"), col("text")).union(
        docs.filter(col("doc_id") < 25 && col("text").isNotNull)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(lit("zzz "), col("text")).as("text")))
      Dedup.dedupPassagesCdc(planted, window = 4, divisor = 8)
    }.sortedBy(col("doc_id")),

    // ── ExactSubstr duplicated-span statistics (Lee et al. 2022) ───
    // Stride-1 10-token windows; a window hash seen ≥ 2× corpus-wide
    // flags its tokens, the globally-first occurrence exempt
    // (keepFirst). PLANTED twins (every doc_id < 25 re-appears under
    // +1000000 with 'xq7' prepended) guarantee long duplicated spans:
    // the twin's copied text is one maximal span while the original
    // (first occurrence) scores 0. Oracle replays window hashing, the
    // min-key exemption, and gaps-and-islands interval merging.
    QueryDef("t_dup_spans",
      s"""WITH pl AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, 'xq7 ' || text FROM documents
         |  WHERE doc_id < 25 AND text IS NOT NULL),
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM pl WHERE text IS NOT NULL),
         |wins AS (SELECT doc_id, ws,
         |  unnest(CASE WHEN len(ws) >= 10 THEN range(0, len(ws) - 9)
         |         ELSE [] END) AS wi FROM w),
         |wt AS (SELECT doc_id, wi,
         |  array_to_string(ws[wi+1:wi+10], ' ') AS t10 FROM wins),
         |h AS (SELECT doc_id, wi, ${polyhash64("t10")} AS h,
         |  doc_id * ${Dedup.PassageKeyBase} + wi AS k FROM wt),
         |f AS (SELECT h, count(*) AS c, min(k) AS mk FROM h GROUP BY h),
         |fl AS (SELECT h.doc_id, h.wi FROM h JOIN f ON f.h = h.h
         |  WHERE f.c >= 2 AND h.k <> f.mk),
         |x AS (SELECT doc_id, wi, max(wi + 10) OVER (PARTITION BY doc_id
         |    ORDER BY wi ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    AS pmax FROM fl),
         |g AS (SELECT doc_id, wi, CASE WHEN pmax IS NULL OR wi > pmax
         |    THEN 1 ELSE 0 END AS ng FROM x),
         |gi AS (SELECT doc_id, wi, sum(ng) OVER (PARTITION BY doc_id
         |    ORDER BY wi) AS grp FROM g),
         |iv AS (SELECT doc_id, grp, min(wi) AS s, max(wi) + 10 AS e
         |  FROM gi GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS dup_tokens,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(max(e - s) AS BIGINT) AS max_span FROM iv GROUP BY doc_id)
         |SELECT p.doc_id,
         |  CAST(CASE WHEN p.text IS NULL THEN 0
         |       ELSE len(string_split(p.text, ' ')) END AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(coalesce(a.max_span, 0) AS BIGINT) AS max_span
         |FROM pl p LEFT JOIN agg a ON a.doc_id = p.doc_id
         |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val planted = docs.select(col("doc_id"), col("text")).union(
        docs.filter(col("doc_id") < 25 && col("text").isNotNull)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(lit("xq7 "), col("text")).as("text")))
      Dedup.dupSpanStats(planted, minLen = 10)
    }.sortedBy(col("doc_id")),

    // ExactSubstr REMOVAL over the same planted corpus: every token
    // covered by a non-first duplicated window drops; the oracle
    // expands flagged windows to covered positions and anti-joins the
    // token stream.
    QueryDef("t_dup_span_removal",
      s"""WITH pl AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, 'xq7 ' || text FROM documents
         |  WHERE doc_id < 25 AND text IS NOT NULL),
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM pl WHERE text IS NOT NULL),
         |wins AS (SELECT doc_id, ws,
         |  unnest(CASE WHEN len(ws) >= 10 THEN range(0, len(ws) - 9)
         |         ELSE [] END) AS wi FROM w),
         |wt AS (SELECT doc_id, wi,
         |  array_to_string(ws[wi+1:wi+10], ' ') AS t10 FROM wins),
         |h AS (SELECT doc_id, wi, ${polyhash64("t10")} AS h,
         |  doc_id * ${Dedup.PassageKeyBase} + wi AS k FROM wt),
         |f AS (SELECT h, count(*) AS c, min(k) AS mk FROM h GROUP BY h),
         |fl AS (SELECT h.doc_id, h.wi FROM h JOIN f ON f.h = h.h
         |  WHERE f.c >= 2 AND h.k <> f.mk),
         |cov0 AS (SELECT doc_id, unnest(range(wi, wi + 10)) AS t FROM fl),
         |cov AS (SELECT DISTINCT doc_id, t FROM cov0),
         |tok0 AS (SELECT doc_id, ws,
         |  unnest(range(0, len(ws))) AS t FROM w),
         |tok AS (SELECT doc_id, t, ws[t+1] AS wd FROM tok0),
         |kept AS (SELECT tok.doc_id, tok.t, tok.wd FROM tok
         |  LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.t = tok.t
         |  WHERE cov.t IS NULL),
         |agg AS (SELECT doc_id,
         |  string_agg(wd, ' ' ORDER BY t) AS ctext,
         |  CAST(count(*) AS BIGINT) AS nk FROM kept GROUP BY doc_id)
         |SELECT p.doc_id,
         |  CASE WHEN p.text IS NULL THEN NULL
         |       ELSE coalesce(a.ctext, '') END AS clean_text,
         |  CAST(CASE WHEN p.text IS NULL THEN 0
         |       ELSE len(string_split(p.text, ' ')) END AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.nk, 0) AS BIGINT) AS kept_tokens
         |FROM pl p LEFT JOIN agg a ON a.doc_id = p.doc_id
         |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val planted = docs.select(col("doc_id"), col("text")).union(
        docs.filter(col("doc_id") < 25 && col("text").isNotNull)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(lit("xq7 "), col("text")).as("text")))
      Dedup.removeDupSpans(planted, minLen = 10)
    }.sortedBy(col("doc_id")),

    // ── SemDeDup (cluster-then-cosine semantic dedup) ──────────────
    // The DuckDB side retrains the same 16 k-means cells (shared
    // ivfCtes — hash-sampled seeds, one quantized-integer Lloyd step),
    // then replays the within-cell pair scan + cosine cut exactly.
    QueryDef("t_semdedup_pairs",
      s"""WITH ${ivfCtes(k = 16, nProbe = 1, queryPred = "FALSE")},
         |swidths AS (SELECT cell, count(*) AS w FROM assigned GROUP BY cell),
         |qcap AS (SELECT a.vec_id, a.cell FROM assigned a
         |  JOIN swidths sw ON sw.cell = a.cell
         |    AND sw.w <= ${Similarity.DefaultMaxCellWidth}),
         |spairs AS (
         |  SELECT id_a, id_b, cos FROM (
         |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |           round(${cosine("ea.embedding", "eb.embedding")}, 6) AS cos
         |    FROM qcap a JOIN qcap b
         |      ON a.cell = b.cell AND a.vec_id < b.vec_id
         |    JOIN embeddings ea ON ea.vec_id = a.vec_id
         |    JOIN embeddings eb ON eb.vec_id = b.vec_id)
         |  WHERE cos >= 0.3)
         |SELECT id_a, id_b, cos FROM spairs
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Similarity.semDedupPairs(Tables.embeddings(s, d), threshold = 0.3)
    }.sortedBy(col("id_a"), col("id_b")),

    // Connected components over the SemDeDup pair graph → one label
    // per vector (recursive reachability CTE, min id per component —
    // the same walk shape as t_dedup_clusters). spairs is MATERIALIZED
    // so the recursion's per-iteration join reads a computed table
    // instead of re-evaluating the whole Lloyd chain each step.
    QueryDef("t_semdedup_clusters",
      s"""WITH RECURSIVE ${ivfCtes(k = 16, nProbe = 1, queryPred = "FALSE")},
         |swidths AS (SELECT cell, count(*) AS w FROM assigned GROUP BY cell),
         |qcap AS (SELECT a.vec_id, a.cell FROM assigned a
         |  JOIN swidths sw ON sw.cell = a.cell
         |    AND sw.w <= ${Similarity.DefaultMaxCellWidth}),
         |spairs AS MATERIALIZED (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |           round(${cosine("ea.embedding", "eb.embedding")}, 6) AS cos
         |    FROM qcap a JOIN qcap b
         |      ON a.cell = b.cell AND a.vec_id < b.vec_id
         |    JOIN embeddings ea ON ea.vec_id = a.vec_id
         |    JOIN embeddings eb ON eb.vec_id = b.vec_id)
         |  WHERE cos >= 0.3),
         |sedges AS MATERIALIZED (
         |  SELECT id_a AS src, id_b AS dst FROM spairs
         |  UNION ALL
         |  SELECT id_b, id_a FROM spairs),
         |walk(id, r) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT w.id, e.dst FROM walk w JOIN sedges e ON e.src = w.r)
         |SELECT id AS vec_id, min(r) AS cluster_id FROM walk GROUP BY id
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.semDedupClusters(Tables.embeddings(s, d), threshold = 0.3)
    }.sortedBy(col("vec_id")),

    // ── Fuzzy (MinHash-Jaccard) decontamination ────────────────────
    // Benchmark = every 7th document (a split that crosses 14 natural
    // near-dup pairs at sf0.01); corpus docs within Jaccard 0.8 of any
    // benchmark doc are reported / dropped — the lightly-edited-copy
    // case exact n-gram overlap underweights and semantic decon needs
    // embeddings for.
    QueryDef("t_fuzzy_contamination",
      s"""WITH corp AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % 7 <> 0),
         |bench AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % 7 = 0),
         |${fuzzyDeconCtes("corp", "bench", jNum = 8, jDen = 10)}
         |SELECT doc_id, bench_id, inter, uni FROM fhits
         |ORDER BY doc_id, bench_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Decontamination.fuzzyContaminationReport(
        docs.filter(col("doc_id") % 7 =!= 0).select("doc_id", "text"),
        docs.filter(col("doc_id") % 7 === 0).select("doc_id", "text"))
    }.sortedBy(col("doc_id"), col("bench_id")),

    QueryDef("t_decontaminate_fuzzy",
      s"""WITH corp AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % 7 <> 0),
         |bench AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % 7 = 0),
         |${fuzzyDeconCtes("corp", "bench", jNum = 8, jDen = 10)}
         |SELECT doc_id FROM corp
         |WHERE doc_id NOT IN (SELECT doc_id FROM fhits)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ext.Decontamination.fuzzyDecontaminate(
        docs.filter(col("doc_id") % 7 =!= 0).select("doc_id", "text"),
        docs.filter(col("doc_id") % 7 === 0).select("doc_id", "text"))
        .select("doc_id")
    }.sortedBy(col("doc_id")),

    // ── Stratified exact-N take (per-domain eval sampling) ─────────
    // Up to 5 docs per source by ascending polyhash(doc_id) order —
    // deterministic uniform-without-RNG; runs on the bounded-heap
    // TopKPerKey operator, replayed as a plain ranked window in SQL.
    QueryDef("t_stratified_sample",
      s"""WITH r AS (
         |  SELECT source, doc_id,
         |         CAST(row_number() OVER (PARTITION BY source
         |              ORDER BY ${polyhash("CAST(doc_id AS VARCHAR)")},
         |              doc_id) AS BIGINT) AS rank
         |  FROM documents)
         |SELECT source, doc_id, rank FROM r WHERE rank <= 5
         |ORDER BY source, rank""".stripMargin) { (s, d) =>
      graft.ext.Sampling.stratifiedTake(
        Tables.documents(s, d).select("source", "doc_id"),
        strataCol = "source", keyCol = "doc_id", n = 5)
    }.sortedBy(col("source"), col("rank")),

    // ── Cluster-stratified diversity sampling (coverage subset) ────
    // Up to 20 vectors per k-means cell: the same deterministic
    // 16-cell quantizer the IVF family trains (shared ivfCtes replay —
    // centroids, assignment and tiebreaks agree bit-for-bit), then the
    // stratifiedTake hash-order quota per cell.
    QueryDef("t_diversity_sample",
      s"""WITH ${ivfCtes(16, 1, "FALSE")},
         |dvr AS (SELECT vec_id, cell,
         |    CAST(row_number() OVER (PARTITION BY cell
         |         ORDER BY ${polyhash("CAST(vec_id AS VARCHAR)")}, vec_id)
         |      AS BIGINT) AS rank
         |  FROM assigned)
         |SELECT vec_id, cell, rank FROM dvr WHERE rank <= 20
         |ORDER BY cell, rank""".stripMargin) { (s, d) =>
      graft.ext.Similarity.diversitySample(Tables.embeddings(s, d), n = 20)
    }.sortedBy(col("cell"), col("rank")),

    // ── Embedding classifiers ──────────────────────────────────────
    // Rocchio nearest-centroid: per-label prototypes over the training
    // split (every vec_id % 7 <> 0), held-out seventh classified by
    // most-cosine-similar prototype. Centroid means replay the same
    // order-independent quantized-integer arithmetic as the IVF
    // quantizer oracle, so both engines agree bit-for-bit.
    QueryDef("t_rocchio_classify",
      s"""WITH train AS (SELECT * FROM embeddings WHERE vec_id % 7 <> 0),
         |upd AS (
         |  SELECT label, g.i,
         |         CAST(SUM(CAST(round(CAST(embedding[g.i] AS DOUBLE)
         |                * 1000000.0) AS BIGINT)) AS DOUBLE)
         |           / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS c
         |  FROM train CROSS JOIN generate_series(1, 64) AS g(i)
         |  GROUP BY label, g.i),
         |cents AS (SELECT label, list(c ORDER BY i) AS cvec
         |          FROM upd GROUP BY label),
         |sc AS (
         |  SELECT e.vec_id, c.label, ${cosine("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN cents c
         |  WHERE e.vec_id % 7 = 0 AND e.embedding IS NOT NULL)
         |SELECT vec_id, label AS pred_label, round(cos, 6) AS cos
         |FROM (SELECT vec_id, label, cos,
         |        row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cos DESC, label) AS rn
         |      FROM sc) WHERE rn = 1
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.classifyRocchio(emb.filter(col("vec_id") % 7 === 0),
        emb.filter(col("vec_id") % 7 =!= 0))
    }.sortedBy(col("vec_id")),

    // IVF-probed kNN classification of the held-out seventh: quantizer
    // trained on the training split only, candidates from a plain cell
    // equi-join (the corpus-scale-query shape — probes are NOT
    // broadcast), majority label of the 10 nearest training
    // neighbours, vote-count tiebreak toward the lowest label.
    QueryDef("t_knn_classify",
      s"""WITH ${ivfCtes(k = 16, nProbe = 4,
           queryPred = "vec_id % 7 = 0 AND vec_id IN " +
             "(SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL)",
           trainRel = "(SELECT * FROM embeddings WHERE vec_id % 7 <> 0)")},
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM assigned a JOIN probes p ON a.cell = p.cell
         |  WHERE a.vec_id <> p.query_id AND a.vec_id % 7 <> 0),
         |scored AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         round(${cosine("qe.embedding", "ne.embedding")}, 6) AS cos
         |  FROM cand c
         |  JOIN embeddings qe ON qe.vec_id = c.query_id
         |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id),
         |knn AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos DESC, neighbor_id) AS rn
         |    FROM scored) WHERE rn <= 10),
         |votes AS (
         |  SELECT k.query_id, e.label, CAST(count(*) AS BIGINT) AS votes
         |  FROM knn k JOIN embeddings e ON e.vec_id = k.neighbor_id
         |  GROUP BY 1, 2)
         |SELECT query_id AS vec_id, label AS pred_label, votes
         |FROM (SELECT query_id, label, votes,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY votes DESC, label) AS rn
         |      FROM votes) WHERE rn = 1
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.knnClassify(emb.filter(col("vec_id") % 7 =!= 0),
        emb.filter(col("vec_id") % 7 === 0), k = 10, centroids = 16,
        nProbe = 4)
    }.sortedBy(col("vec_id")),

    // ── Embedding-space health report ──────────────────────────────
    // One row: vector/null/zero-norm counts + p50/p90 of the quantized
    // squared norm (histogram percentile law, no corpus sort). The dot
    // fold matches the cosine oracle's list_sum order exactly.
    QueryDef("t_embed_norm_report", {
      val n2 = s"""CAST(round(list_sum(list_transform(generate_series(1, 64),
        |  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
        |  * 1000000.0) AS BIGINT)""".stripMargin
      s"""WITH nr AS (SELECT vec_id,
         |  CASE WHEN embedding IS NULL THEN NULL ELSE $n2 END AS n2
         |  FROM embeddings),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs,
         |    CAST(sum(CASE WHEN n2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_null,
         |    CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_zero
         |  FROM nr),
         |nh AS (SELECT n2 AS v, count(*) AS c FROM nr
         |       WHERE n2 IS NOT NULL GROUP BY 1),
         |nc AS (SELECT v, sum(c) OVER (ORDER BY v
         |         ROWS UNBOUNDED PRECEDING) AS cumc FROM nh),
         |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM nh),
         |np50 AS (SELECT min(v) AS p50_norm2_x1e6 FROM nc CROSS JOIN nt
         |         WHERE cumc >= (n * 50 + 99) // 100),
         |np90 AS (SELECT min(v) AS p90_norm2_x1e6 FROM nc CROSS JOIN nt
         |         WHERE cumc >= (n * 90 + 99) // 100)
         |SELECT b.n_vecs, b.n_null, b.n_zero,
         |  p50.p50_norm2_x1e6, p90.p90_norm2_x1e6
         |FROM nb b CROSS JOIN np50 p50 CROSS JOIN np90 p90""".stripMargin
    }) { (s, d) =>
      Similarity.normReport(Tables.embeddings(s, d))
    },

    // ── Semantic decontamination (embedding space) ─────────────────
    // Benchmark = every 97th embedding; the corpus side must shed any
    // doc within 0.3 cosine of a benchmark vector. The engine runs a
    // map-only broadcast check (the eval set is small by definition);
    // the oracle states the raw bipartite predicate.
    QueryDef("t_embed_contamination",
      s"""WITH b AS (SELECT vec_id AS bench_id, embedding
         |  FROM embeddings WHERE vec_id % 97 = 0),
         |c AS (SELECT vec_id, embedding
         |  FROM embeddings WHERE vec_id % 97 <> 0),
         |p AS (SELECT c.vec_id, b.bench_id,
         |  round(${cosine("c.embedding", "b.embedding")}, 6) AS cos
         |  FROM c CROSS JOIN b)
         |SELECT vec_id, bench_id, cos FROM p WHERE cos >= 0.3
         |ORDER BY vec_id, bench_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.ext.Decontamination.embeddingContaminationReport(
        emb.filter(col("vec_id") % 97 =!= 0),
        emb.filter(col("vec_id") % 97 === 0), threshold = 0.3)
    }.sortedBy(col("vec_id"), col("bench_id")),

    QueryDef("t_decontaminate_semantic",
      s"""WITH b AS (SELECT vec_id AS bench_id, embedding
         |  FROM embeddings WHERE vec_id % 97 = 0),
         |c AS (SELECT vec_id, embedding
         |  FROM embeddings WHERE vec_id % 97 <> 0),
         |bad AS (SELECT DISTINCT c.vec_id FROM c CROSS JOIN b
         |  WHERE round(${cosine("c.embedding", "b.embedding")}, 6) >= 0.3)
         |SELECT c.vec_id FROM c
         |WHERE c.vec_id NOT IN (SELECT vec_id FROM bad)
         |ORDER BY c.vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.ext.Decontamination.decontaminateEmbeddings(
        emb.filter(col("vec_id") % 97 =!= 0),
        emb.filter(col("vec_id") % 97 === 0), threshold = 0.3)
        .select("vec_id")
    }.sortedBy(col("vec_id")),

    // ── Integer-exact per-domain percentiles (histogram formulation)
    // p50/p90/p99 of n_chars per source — the lower empirical quantile
    // (smallest value whose cumulative count reaches ceil(n·q/100)),
    // pure integer arithmetic, no corpus sort on either engine.
    QueryDef("t_group_percentiles",
      s"""WITH hist AS (
         |  SELECT source, CAST(n_chars AS BIGINT) AS v, count(*) AS c
         |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
         |cum AS (
         |  SELECT source, v, sum(c) OVER (PARTITION BY source ORDER BY v
         |         ROWS UNBOUNDED PRECEDING) AS cumc FROM hist),
         |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |        FROM hist GROUP BY 1),
         |p50 AS (SELECT c.source, min(v) AS p50 FROM cum c
         |  JOIN tot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 50 + 99) // 100 GROUP BY 1),
         |p90 AS (SELECT c.source, min(v) AS p90 FROM cum c
         |  JOIN tot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 90 + 99) // 100 GROUP BY 1),
         |p99 AS (SELECT c.source, min(v) AS p99 FROM cum c
         |  JOIN tot t ON t.source = c.source
         |  WHERE c.cumc >= (t.n * 99 + 99) // 100 GROUP BY 1)
         |SELECT t.source, t.n, p50.p50, p90.p90, p99.p99
         |FROM tot t
         |JOIN p50 ON p50.source = t.source
         |JOIN p90 ON p90.source = t.source
         |JOIN p99 ON p99.source = t.source
         |ORDER BY t.source""".stripMargin) { (s, d) =>
      graft.ext.Curation.groupPercentiles(Tables.documents(s, d),
        groupCol = "source", valueCol = "n_chars",
        percentiles = Seq(50, 90, 99))
    }.sortedBy(col("source")),

    // ── Multimodal exact dedup (raw-byte fingerprint groups) ───────
    // Duplicate payloads are PLANTED in SQL on both sides (a re-crawl
    // copy of every doc_id < 20 under a shifted media id), so the
    // grouping is exercised on real collisions; only multi-copy groups
    // are emitted. The fingerprint is the binary PolyHash64 — equal
    // to the string PolyHash64 on UTF-8 text (NativeExprSpec), which
    // is what the oracle computes.
    QueryDef("t_media_dup_groups",
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20),
         |g AS (SELECT ${polyhash64("coalesce(text, '')")} AS content_fp,
         |        min(media_id) AS keep_id,
         |        CAST(count(*) AS BIGINT) AS n_copies
         |      FROM m GROUP BY 1)
         |SELECT content_fp, keep_id, n_copies FROM g WHERE n_copies > 1
         |ORDER BY keep_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val media = Multimodal.asMedia(docs, "doc_id", "text").union(
        Multimodal.asMedia(docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")),
          "doc_id", "text"))
      Multimodal.exactDupGroups(media).filter(col("n_copies") > 1)
    }.sortedBy(col("keep_id")),

    // ── Perceptual media near-dup (dHash → Hamming-ball) ───────────
    // Re-encoded copies are PLANTED at signature level: every doc_id
    // < 20 gains a variant under a shifted id whose stub dHash differs
    // by XOR 5 (2 bits — deterministic codec noise), so the full
    // guarded Hamming machinery (collapse → C(8,5) combo banding →
    // capped buckets → bit_count verify → member expansion) is
    // exercised on real near-collisions. The REAL raster path (decode
    // PNG/BMP, 9×8 area-average, gradient bits) is spec-gated
    // (LlmOpsSpec: a re-encode hashes identically, distinct images
    // don't); the stub hash is the engine-portable arithmetic DuckDB
    // replays here.
    QueryDef("t_media_neardup", {
      val dhExpr = s"(${polyhash("coalesce(text, '')")} * 4294967296 + " +
        s"${polyhash("concat(coalesce(text, ''), '#')")})"
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, $dhExpr AS dh FROM documents),
         |u AS (
         |  SELECT media_id, dh FROM m
         |  UNION ALL
         |  SELECT media_id + 100000, xor(dh, 5) FROM m WHERE media_id < 20),
         |ugrp AS (SELECT dh, min(media_id) AS rep FROM u GROUP BY dh),
         |umem AS (SELECT u.media_id, g.rep, u.dh
         |         FROM u JOIN ugrp g ON u.dh = g.dh),
         |ubands AS (
         |  SELECT g.rep AS media_id, c.band,
         |         ${simhashComboKeyExpr("g.dh", 8, 5)} AS bkey
         |  FROM ugrp g CROSS JOIN (VALUES
         |    ${simhashComboValues(8, 5)}) c(band, b0, b1, b2, b3, b4)
         |  QUALIFY count(*) OVER (PARTITION BY c.band, bkey)
         |    <= ${Dedup.DefaultMaxBucketWidth}),
         |ucand AS (SELECT DISTINCT a.media_id AS ma, b.media_id AS mb
         |  FROM ubands a JOIN ubands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.media_id < b.media_id),
         |urp AS (
         |  SELECT c.ma, c.mb, bit_count(xor(ga.dh, gb.dh)) AS hamming
         |  FROM ucand c
         |  JOIN ugrp ga ON ga.rep = c.ma
         |  JOIN ugrp gb ON gb.rep = c.mb
         |  WHERE bit_count(xor(ga.dh, gb.dh)) <= 3),
         |upairs AS (
         |  SELECT least(ma2.media_id, mb2.media_id) AS media_a,
         |         greatest(ma2.media_id, mb2.media_id) AS media_b, p.hamming
         |  FROM urp p
         |  JOIN umem ma2 ON ma2.rep = p.ma
         |  JOIN umem mb2 ON mb2.rep = p.mb
         |  UNION ALL
         |  SELECT a.media_id, b.media_id, 0
         |  FROM umem a JOIN umem b
         |    ON a.rep = b.rep AND a.media_id < b.media_id)
         |SELECT media_a, media_b, CAST(hamming AS BIGINT) AS hamming
         |FROM upairs ORDER BY media_a, media_b""".stripMargin
    }) { (s, d) =>
      val media = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text")
      val base = Multimodal.dHash(media)
      val reenc = base.filter(col("media_id") < 20)
        .select((col("media_id") + 100000).as("media_id"),
          col("dhash").bitwiseXOR(lit(5L)).as("dhash"))
      Dedup.hammingNearDups(base.union(reenc), idCol = "media_id",
          sigCol = "dhash", bits = 64, blocks = 8, maxHamming = 3)
        .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
          col("hamming"))
    }.sortedBy(col("media_a"), col("media_b")),

    // ── Multimodal columns ─────────────────────────────────────────
    // ── Acoustic fingerprint (PCM energy-delta contour) ────────────
    // Payload bytes as 8-bit PCM: 16-sample frames, exact integer
    // energy Σs², 60 energy-rise bits — the native PcmFingerprint
    // expression; the oracle replays the identical arithmetic with
    // nested DuckDB list lambdas over the same bytes (ASCII corpus:
    // char ord == byte, the polyhash oracle's standing assumption).
    QueryDef("t_audio_fingerprint",
      s"""WITH ab AS (SELECT doc_id, coalesce(text, '') AS s
         |  FROM documents),
         |ae AS (SELECT doc_id, length(s) AS n,
         |  list_transform(generate_series(0, ((length(s)+15)//16)-1),
         |    f -> list_sum(list_transform(
         |      generate_series(f*16+1, least(f*16+16, length(s))),
         |      i -> CAST(ord(substring(s, i, 1)) AS BIGINT)
         |           * CAST(ord(substring(s, i, 1)) AS BIGINT)))) AS es
         |  FROM ab)
         |SELECT doc_id AS media_id,
         |  CAST((n + 15) // 16 AS BIGINT) AS n_frames,
         |  CAST(coalesce(list_sum(list_transform(
         |    generate_series(1, least((n+15)//16 - 1, 60)),
         |    f -> CASE WHEN es[f+1] > es[f]
         |         THEN (CAST(1 AS BIGINT) << (f-1))
         |         ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS audio_fp
         |FROM ae ORDER BY media_id""".stripMargin) { (s, d) =>
      graft.ext.Multimodal.audioFingerprint(
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text",
          mediaType = "audio/pcm"))
    }.sortedBy(col("media_id")),

    // Acoustic near-dup: tail-edited re-encodes PLANTED for real (4
    // appended samples on every doc_id < 20 under a shifted id — the
    // contour disturbs by <= 2 bits, inside the Hamming-3 ball), then
    // the full guarded machinery: collapse -> C(8,5) combo banding ->
    // capped buckets -> bit_count verify -> member expansion.
    QueryDef("t_audio_neardup", {
      val esExpr =
        s"""list_transform(generate_series(0, ((length(s)+15)//16)-1),
           |    f -> list_sum(list_transform(
           |      generate_series(f*16+1, least(f*16+16, length(s))),
           |      i -> CAST(ord(substring(s, i, 1)) AS BIGINT)
           |           * CAST(ord(substring(s, i, 1)) AS BIGINT))))""".stripMargin
      s"""WITH am AS (
         |  SELECT doc_id AS media_id, coalesce(text, '') AS s FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, coalesce(text, '') || 'zzzz'
         |  FROM documents WHERE doc_id < 20),
         |ae AS (SELECT media_id, length(s) AS n, $esExpr AS es FROM am),
         |u AS (SELECT media_id,
         |  CAST(coalesce(list_sum(list_transform(
         |    generate_series(1, least((n+15)//16 - 1, 60)),
         |    f -> CASE WHEN es[f+1] > es[f]
         |         THEN (CAST(1 AS BIGINT) << (f-1))
         |         ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS dh
         |  FROM ae),
         |ugrp AS (SELECT dh, min(media_id) AS rep FROM u GROUP BY dh),
         |umem AS (SELECT u.media_id, g.rep, u.dh
         |         FROM u JOIN ugrp g ON u.dh = g.dh),
         |ubands AS (
         |  SELECT g.rep AS media_id, c.band,
         |         ${simhashComboKeyExpr("g.dh", 8, 5)} AS bkey
         |  FROM ugrp g CROSS JOIN (VALUES
         |    ${simhashComboValues(8, 5)}) c(band, b0, b1, b2, b3, b4)
         |  QUALIFY count(*) OVER (PARTITION BY c.band, bkey)
         |    <= ${Dedup.DefaultMaxBucketWidth}),
         |ucand AS (SELECT DISTINCT a.media_id AS ma, b.media_id AS mb
         |  FROM ubands a JOIN ubands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.media_id < b.media_id),
         |urp AS (
         |  SELECT c.ma, c.mb, bit_count(xor(ga.dh, gb.dh)) AS hamming
         |  FROM ucand c
         |  JOIN ugrp ga ON ga.rep = c.ma
         |  JOIN ugrp gb ON gb.rep = c.mb
         |  WHERE bit_count(xor(ga.dh, gb.dh)) <= 3),
         |upairs AS (
         |  SELECT least(ma2.media_id, mb2.media_id) AS media_a,
         |         greatest(ma2.media_id, mb2.media_id) AS media_b, p.hamming
         |  FROM urp p
         |  JOIN umem ma2 ON ma2.rep = p.ma
         |  JOIN umem mb2 ON mb2.rep = p.mb
         |  UNION ALL
         |  SELECT a.media_id, b.media_id, 0
         |  FROM umem a JOIN umem b
         |    ON a.rep = b.rep AND a.media_id < b.media_id)
         |SELECT media_a, media_b, CAST(hamming AS BIGINT) AS hamming
         |FROM upairs ORDER BY media_a, media_b""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val media = Multimodal.asMedia(docs, "doc_id", "text",
        mediaType = "audio/pcm")
      val edited = Multimodal.asMedia(
        docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(coalesce(col("text"), lit("")), lit("zzzz")).as("text")),
        "doc_id", "text", mediaType = "audio/pcm")
      Multimodal.nearDupAudioPairs(media.union(edited))
    }.sortedBy(col("media_a"), col("media_b")),

    QueryDef("t_multimodal_meta",
      s"""SELECT doc_id AS media_id,
         |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |       md5(text) AS content_md5,
         |       ${polyhash("text")} % 1280 AS width,
         |       ${polyhash("text")} % 720 AS height,
         |       CAST(octet_length(encode(text)) % 32 + 1 AS BIGINT) AS n_frames
         |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.metadata(
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"))
    }.sortedBy(col("media_id"))
  )
}
