package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Eval-scoring, annotation-agreement, BLEU/chrF/ROUGE and table-profile queries.
  * Split out of the monolithic LlmQueries registry (round 20); order
  * and semantics unchanged — [[LlmQueries.defs]] concatenates the
  * families in the original sequence.
  */
private[graft] object LlmEvalQueries {
  import LlmOracle._
  import LlmShared._

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

    // ── Per-item WER over the same planted predictions: token-level
    // Levenshtein distance as ONE codegen'd row-local DP
    // (graft.functions.EditDist); the oracle replays it as a
    // recursive-CTE row carry — the running-MIN expansion of the
    // within-row dependency (D[i+1][j] = j + min_{j'≤j}(c[j'] − j')
    // with c[j] = min(D[i][j−1] + neq, D[i][j] + 1), c[0] = i+1).
    // Both sides capped at 16 tokens, bounding engine DP and oracle
    // recursion alike.
    QueryDef("t_eval_wer",
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
         |wtoks AS MATERIALIZED (SELECT np.doc_id,
         |    list_slice(CASE WHEN np.n = '' THEN []
         |      ELSE string_split(np.n, ' ') END, 1, 16) AS pt,
         |    list_slice(CASE WHEN nr.n = '' THEN []
         |      ELSE string_split(nr.n, ' ') END, 1, 16) AS rt
         |  FROM np JOIN nr ON nr.doc_id = np.doc_id),
         |wwalk(doc_id, i, dp) AS (
         |  SELECT doc_id, 0,
         |    list_transform(range(len(rt) + 1), x -> CAST(x AS BIGINT))
         |  FROM wtoks
         |  UNION ALL
         |  SELECT doc_id, i + 1,
         |    list_transform(range(0, m + 1),
         |      j -> CAST(j AS BIGINT) + list_min(cv2[1:CAST(j AS INTEGER) + 1]))
         |  FROM (SELECT w.doc_id, w.i AS i, len(r.rt) AS m,
         |      list_prepend(CAST(w.i + 1 AS BIGINT),
         |        list_transform(range(1, len(r.rt) + 1),
         |          j2 -> least(w.dp[CAST(j2 AS INTEGER)]
         |              + CASE WHEN r.rt[CAST(j2 AS INTEGER)]
         |                          = r.pt[w.i + 1] THEN 0 ELSE 1 END,
         |            w.dp[CAST(j2 AS INTEGER) + 1] + 1) - j2)) AS cv2
         |    FROM wwalk w JOIN wtoks r ON r.doc_id = w.doc_id
         |    WHERE w.i < len(r.pt)) q),
         |fin AS (SELECT w.doc_id, w.dp[len(r.rt) + 1] AS dist
         |  FROM wwalk w JOIN wtoks r ON r.doc_id = w.doc_id
         |  WHERE w.i = len(r.pt))
         |SELECT t.doc_id, CAST(len(t.pt) AS BIGINT) AS n_pred,
         |  CAST(len(t.rt) AS BIGINT) AS n_ref,
         |  CAST(f.dist AS BIGINT) AS edit_dist,
         |  CAST(CASE WHEN len(t.rt) > 0 THEN (f.dist * 100) // len(t.rt)
         |       WHEN len(t.pt) = 0 THEN 0 END AS BIGINT) AS wer_x100
         |FROM wtoks t JOIN fin f ON f.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).filter(col("text").isNotNull)
      val preds = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .when(col("doc_id") % 4 === 1,
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"), lit(" EXTRA extra tokens")))
          .otherwise(lit("completely different words here")).as("pred"))
      graft.ext.Eval.wer(preds,
        base.select(col("doc_id"), col("text").as("ref")), maxTokens = 16)
    }.sortedBy(col("doc_id")),

    // Corpus WER rollup (the micro-average an ASR/MT leaderboard
    // prints): total edits over pooled reference tokens — the same DP
    // walk, summed.
    QueryDef("t_eval_wer_report",
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
         |wtoks AS MATERIALIZED (SELECT np.doc_id,
         |    list_slice(CASE WHEN np.n = '' THEN []
         |      ELSE string_split(np.n, ' ') END, 1, 16) AS pt,
         |    list_slice(CASE WHEN nr.n = '' THEN []
         |      ELSE string_split(nr.n, ' ') END, 1, 16) AS rt
         |  FROM np JOIN nr ON nr.doc_id = np.doc_id),
         |wwalk(doc_id, i, dp) AS (
         |  SELECT doc_id, 0,
         |    list_transform(range(len(rt) + 1), x -> CAST(x AS BIGINT))
         |  FROM wtoks
         |  UNION ALL
         |  SELECT doc_id, i + 1,
         |    list_transform(range(0, m + 1),
         |      j -> CAST(j AS BIGINT) + list_min(cv2[1:CAST(j AS INTEGER) + 1]))
         |  FROM (SELECT w.doc_id, w.i AS i, len(r.rt) AS m,
         |      list_prepend(CAST(w.i + 1 AS BIGINT),
         |        list_transform(range(1, len(r.rt) + 1),
         |          j2 -> least(w.dp[CAST(j2 AS INTEGER)]
         |              + CASE WHEN r.rt[CAST(j2 AS INTEGER)]
         |                          = r.pt[w.i + 1] THEN 0 ELSE 1 END,
         |            w.dp[CAST(j2 AS INTEGER) + 1] + 1) - j2)) AS cv2
         |    FROM wwalk w JOIN wtoks r ON r.doc_id = w.doc_id
         |    WHERE w.i < len(r.pt)) q),
         |fin AS (SELECT w.doc_id, w.dp[len(r.rt) + 1] AS dist
         |  FROM wwalk w JOIN wtoks r ON r.doc_id = w.doc_id
         |  WHERE w.i = len(r.pt))
         |SELECT CAST(count(*) AS BIGINT) AS n_items,
         |  CAST(sum(len(t.rt)) AS BIGINT) AS n_ref_tokens,
         |  CAST(sum(f.dist) AS BIGINT) AS n_edits,
         |  CAST(CASE WHEN sum(len(t.rt)) > 0
         |    THEN (sum(f.dist) * 100) // sum(len(t.rt)) END AS BIGINT)
         |    AS wer_x100
         |FROM wtoks t JOIN fin f ON f.doc_id = t.doc_id""".stripMargin) {
      (s, d) =>
      val base = Tables.documents(s, d).filter(col("text").isNotNull)
      val preds = base.select(col("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .when(col("doc_id") % 4 === 1,
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"), lit(" EXTRA extra tokens")))
          .otherwise(lit("completely different words here")).as("pred"))
      graft.ext.Eval.werReport(preds,
        base.select(col("doc_id"), col("text").as("ref")), maxTokens = 16)
    },

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
  )
}
