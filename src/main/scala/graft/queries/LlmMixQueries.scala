package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Curriculum/temperature/DSIR mixing, decontamination and curation-flagship queries.
  * Split out of the monolithic LlmQueries registry (round 20); order
  * and semantics unchanged — [[LlmQueries.defs]] concatenates the
  * families in the original sequence.
  */
private[graft] object LlmMixQueries {
  import LlmOracle._
  import LlmShared._

  val defs: Seq[QueryDef] = Seq(
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
  )
}
