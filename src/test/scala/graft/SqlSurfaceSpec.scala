package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The SQL entry point (SURVEY §2.7 M4 + §3.2 analog): after
  * Tables.registerAll, a user can run ksqlDB-ported SQL text directly —
  * including the engine's injected functions — and gets the same
  * Catalyst plans (whole-stage codegen, pushdown) as the Dataset API.
  */
class SqlSurfaceSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  // drop the corpus views after the suite: the session is shared and a
  // later suite's SQL must not silently resolve these names
  override def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally Tables.names.foreach(spark.catalog.dropTempView)

  test("full pipeline statement runs as plain SQL over registered tables") {
    Tables.registerAll(spark, sf)
    // the UNHAPPY_PLATINUM_CUSTOMERS shape, ported from
    // ksqldb-statements.sql:50-68 to ANSI SQL
    val unhappy = spark.sql(
      """SELECT c.c_name || ' ' || c.c_mktsegment AS full_name,
        |       e.value AS stars, e.props AS message
        |FROM events e LEFT JOIN customer c
        |  ON CAST(e.user_id AS STRING) = CAST(c.c_custkey AS STRING)
        |WHERE c.c_name IS NOT NULL
        |  AND e.value < 50.0 AND c.c_mktsegment = 'BUILDING'""".stripMargin)
    assert(unhappy.count() > 0)

    // engine functions compose inside SQL text
    val fp = spark.sql(
      "SELECT doc_id, polyhash(text) AS fp FROM documents LIMIT 3")
    assert(fp.count() == 3)
  }

  test("dedup/ANN signature chain is SQL-reachable and matches the Column API") {
    Tables.registerAll(spark, sf)
    // full chain in SQL text: text → shingles → minhash sig + simhash
    val viaSql = spark.sql(
      """SELECT doc_id,
        |       minhash_sig(shingle_hashes(text)) AS sig,
        |       simhash(shingle_hashes(text)) AS sh
        |FROM documents ORDER BY doc_id""".stripMargin)
    val viaApi = graft.ext.Dedup.features(Tables.documents(spark, sf))
      .select(col("doc_id"), col("sig"), col("simhash").as("sh"))
      .orderBy(col("doc_id"))
    assert(rows(viaSql) == rows(viaApi))

    // hyperplane buckets with literal knobs
    val b = spark.sql(
      "SELECT lsh_buckets(embedding, 2, 4, 64) AS b FROM embeddings LIMIT 5")
    assert(b.collect().forall(_.getSeq[Long](0).length == 2))

    // acoustic fingerprint via SQL matches the Column API
    val pcmSql = spark.sql(
      "SELECT doc_id, pcm_fingerprint(cast(text AS binary)) AS fp FROM documents ORDER BY doc_id")
    val pcmApi = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.pcmFingerprint(col("text").cast("binary")).as("fp"))
      .orderBy(col("doc_id"))
    assert(rows(pcmSql) == rows(pcmApi))

    // real-vocab token counting via SQL matches the Column API
    val tokSql = spark.sql(
      "SELECT doc_id, vocab_token_count(text) AS n FROM documents ORDER BY doc_id")
    val tokApi = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.ext.TextAnalysis.vocabTokenCount(col("text")).as("n"))
      .orderBy(col("doc_id"))
    assert(rows(tokSql) == rows(tokApi))

    // merge-based BPE tokenization via SQL matches the Column API
    val bpeSql = spark.sql(
      "SELECT doc_id, bpe_merge_tokens(text) AS toks FROM documents ORDER BY doc_id")
    val bpeApi = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.ext.TextAnalysis.bpeMergeTokens(col("text")).as("toks"))
      .orderBy(col("doc_id"))
    assert(rows(bpeSql) == rows(bpeApi))

    // per-doc word tf map via SQL matches the Column API
    val tfSql = spark.sql(
      "SELECT doc_id, word_tfs(text) AS w FROM documents ORDER BY doc_id")
    val tfApi = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.wordTfs(col("text")).as("w"))
      .orderBy(col("doc_id"))
    assert(rows(tfSql) == rows(tfApi))

    // pii redaction via SQL matches the Column API fold
    val redSql = spark.sql(
      "SELECT redact_pii('u9@x.io then 10.0.0.1 then 999999999') AS r")
      .collect().head.getString(0)
    assert(redSql == "<EMAIL> then <IP> then <NUM>", redSql)

    // the 62-bit packed fingerprint: SQL matches the Column API and
    // the packing law (h64 divmod 2147483629 recovers h31)
    val fp = spark.sql("SELECT polyhash64('abc') AS h64, " +
      "polyhash('abc') AS h31").collect().head
    assert(fp.getLong(0) / 2147483629L == fp.getLong(1),
      s"${fp.getLong(0)} vs ${fp.getLong(1)}")

    // mojibake repair via SQL matches the Column API fold
    val mjSql = spark.sql(
      "SELECT fix_mojibake('cafÃ© â€œquotedâ€™') AS m")
      .collect().head.getString(0)
    assert(mjSql == "café \"quoted'", mjSql)

    // winnow fingerprints via SQL match the Column API (defaults AND
    // explicit literal knobs); non-literal knobs fail at analysis
    val wnSql = spark.sql(
      "SELECT doc_id, explode(winnow_fps(text)) AS s FROM documents")
      .select(col("doc_id"), col("s.pos"), col("s.fp"))
    val wnApi = graft.ext.Dedup.winnowFingerprints(
      Tables.documents(spark, sf))
    assert(rows(wnSql.orderBy(col("doc_id"), col("pos"))) ==
      rows(wnApi.orderBy(col("doc_id"), col("pos"))))
    assert(spark.sql(
      "SELECT winnow_fps(text, 4, 5) FROM documents LIMIT 1").count() == 1)
    // wide integral literals resolve too (SQL generators emit typed
    // literals — the same width tolerance the other injected knobs get)
    assert(spark.sql(
      "SELECT winnow_fps(text, CAST(4 AS BIGINT), CAST(5 AS BIGINT)) " +
        "FROM documents LIMIT 1").count() == 1)
    intercept[Exception](
      spark.sql("SELECT winnow_fps(text, doc_id, 5) FROM documents")
        .collect())

    // URL canonicalization: the fused native SQL function matches the
    // declarative Column chain (its executable spec) on the tricky
    // shapes — mixed case, default ports, tracking params, bare host,
    // non-URLs, empty query, scheme-less colons
    import spark.implicits._
    val fixtures = Seq(
      "HTTPS://Ex.COM:443/P?utm_source=x&b=2&a=1#f",
      "http://site.org:80", "not a url 5", "HTTP://H.io:80/a?ref=h&z=1",
      "https://h.io:8443/x", "ftp://Case.Host/Q?b=1&a=2",
      "http://h/?", "weird://:80", "a b://c", "http://h/p#x#y",
      "http://h/p?utm_a=1&utm_b=2",
      // newline-bearing query: the spec's (?s) and the native
      // substring-after-'?' must keep the SAME full query
      "http://h/p?b=2\nmore&a=1", "http://h/p#f\nrag?z=1").toDF("url")
    fixtures.createOrReplaceTempView("url_fixtures")
    val viaSqlUrl = spark.sql(
      "SELECT url, canonical_url(url) AS u FROM url_fixtures")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaApiUrl = fixtures.select(col("url"),
        graft.ext.TextAnalysis.canonicalizeUrl(col("url")).as("u"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaSqlUrl == viaApiUrl,
      s"native vs chain: ${viaSqlUrl.toSet.diff(viaApiUrl.toSet)}")
    assert(viaSqlUrl("HTTPS://Ex.COM:443/P?utm_source=x&b=2&a=1#f") ==
      "https://ex.com/P?a=1&b=2")

    // HTML extraction via SQL matches the Column API chain
    val htmlFix = Seq(
      "<html><script>var a=1;</script><p>Hello &amp; bye</p></html>",
      "<h1>T</h1><style>.x{}</style><p>a&nbsp;b &lt;c&gt;</p>")
      .toDF("h")
    htmlFix.createOrReplaceTempView("html_fixtures")
    val htmlSql = spark.sql(
      "SELECT h, html_to_text(h) AS t FROM html_fixtures")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val htmlApi = htmlFix.select(col("h"),
        graft.ext.TextAnalysis.htmlToText(col("h")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(htmlSql == htmlApi, s"$htmlSql vs $htmlApi")
    assert(htmlApi.values.toSet ==
      Set("Hello & bye", "T\na b <c>"), htmlApi)

    // integral literal knobs of any width resolve (SQL generators emit
    // typed literals); non-literal knobs are analysis-time errors
    val wide = spark.sql(
      "SELECT simhash(shingle_hashes(text), CAST(16 AS BIGINT)) AS sh " +
        "FROM documents LIMIT 1")
    assert(wide.count() == 1)
    intercept[Exception](
      spark.sql("SELECT simhash(shingle_hashes(text), doc_id) FROM documents")
        .collect())

    // byte-level encode via SQL matches the table object (and the
    // space → Ġ law every GPT-lineage vocab shows)
    val blSql = spark.sql("SELECT byte_level_encode(' café 中') AS e")
      .collect().head.getString(0)
    assert(blSql == graft.functions.ByteLevel.encode(" café 中"), blSql)
    assert(blSql.startsWith("Ġ"), blSql)

    // lcs_len via SQL: the ROUGE-L kernel; wrong arity/type is an
    // analysis-time error
    assert(spark.sql(
      "SELECT lcs_len(array('a','b','c'), array('x','a','c')) AS l")
      .collect().head.getLong(0) == 2L)
    intercept[Exception](
      spark.sql("SELECT lcs_len(array('a'), 5)").collect())
  }

  test("eval/retrieval family is SQL-reachable: roc_auc aggregate and rrf_weight match the operator API") {
    import spark.implicits._
    // scored relation with ties on both classes at one score
    val scored = Seq((5L, true), (5L, false), (3L, true), (3L, true),
        (1L, false), (2L, false), (8L, true), (8L, false), (0L, false))
      .toDF("score", "label")
    scored.createOrReplaceTempView("sql_scored")
    val viaSql = spark.sql(
      """SELECT r.n_pos, r.n_neg, r.u2, r.auc_x10000
        |FROM (SELECT roc_auc(score, label) AS r FROM sql_scored)"""
        .stripMargin)
    val viaApi = graft.ext.Eval.rocAuc(scored)
    assert(rows(viaSql) == rows(viaApi))
    // per-group face == rocAucBy
    val grouped = Seq(("a", 5L, true), ("a", 1L, false), ("a", 3L, true),
        ("b", 2L, false), ("b", 9L, true), ("b", 9L, false))
      .toDF("source", "score", "label")
    grouped.createOrReplaceTempView("sql_scored_by")
    val bySql = spark.sql(
      """SELECT source, r.n_pos, r.n_neg, r.u2, r.auc_x10000
        |FROM (SELECT source, roc_auc(score, label) AS r
        |      FROM sql_scored_by GROUP BY source)"""
        .stripMargin)
    val byApi = graft.ext.Eval.rocAucBy(grouped)
    assert(rows(bySql) == rows(byApi))
    // null rows don't vote (the batch filter)
    val withNulls = spark.sql(
      """SELECT r.n_pos, r.n_neg FROM (SELECT roc_auc(score, label) AS r
        |FROM (SELECT * FROM sql_scored
        |      UNION ALL SELECT NULL, true UNION ALL SELECT 7, NULL))"""
        .stripMargin).collect().head
    assert(withNulls.getLong(0) == 4L && withNulls.getLong(1) == 5L,
      withNulls)
    // a fractional score column fails analysis loud
    intercept[Exception](
      spark.sql("SELECT roc_auc(CAST(1.5 AS DOUBLE), true)").collect())

    // rrf_weight pins the fusion grain: SQL-side full-outer fusion
    // reproduces rrfFuseAll bit-exactly
    val armA = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "sparse_rank")
    val armB = Seq((1L, 11L, 1L), (1L, 13L, 2L), (1L, 10L, 3L))
      .toDF("query_id", "doc_id", "dense_rank")
    armA.createOrReplaceTempView("sql_arm_a")
    armB.createOrReplaceTempView("sql_arm_b")
    val fusedSql = spark.sql(
      """SELECT * FROM (
        |  SELECT query_id, doc_id,
        |    coalesce(rrf_weight(sparse_rank), 0)
        |      + coalesce(rrf_weight(dense_rank), 0) AS rrf,
        |    sparse_rank, dense_rank,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY coalesce(rrf_weight(sparse_rank), 0)
        |        + coalesce(rrf_weight(dense_rank), 0) DESC, doc_id)
        |      AS BIGINT) AS rank
        |  FROM sql_arm_a FULL OUTER JOIN sql_arm_b
        |    USING (query_id, doc_id))
        |WHERE rank <= 3""".stripMargin)
    val fusedApi = graft.ext.Retrieval.rrfFuseAll(Seq(armA, armB), k = 3)
    assert(rows(fusedSql) == rows(fusedApi))
    // the default grain: 10^6 div (60 + rank)
    assert(spark.sql("SELECT rrf_weight(1)").collect().head.getLong(0)
      == 1000000L / 61L)
    assert(spark.sql("SELECT rrf_weight(1, 10)").collect().head.getLong(0)
      == 1000000L / 11L)
  }

  test("hot paths stay inside whole-stage codegen") {
    // AQE assigns codegen stages only at execution: run the plan, then
    // inspect the finalized executedPlan for WholeStageCodegen wrappers
    import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // count WholeStageCodegenExec nodes, descending through the AQE
    // wrappers (AdaptiveSparkPlanExec/QueryStageExec hide their subtrees
    // from plain collect)
    def countCodegen(p: SparkPlan): Int = {
      val here = p match {
        case _: WholeStageCodegenExec => 1
        case a: AdaptiveSparkPlanExec => countCodegen(a.executedPlan)
        case s: QueryStageExec => countCodegen(s.plan)
        case _ => 0
      }
      here + p.children.map(countCodegen).sum
    }
    // a WholeStageCodegenExec subtree containing an operator matching
    // `marker` — "the aggregate/join itself is fused", which a lone
    // codegen'd scan would not satisfy
    def codegenContains(p: SparkPlan, marker: String): Boolean = {
      def regions(x: SparkPlan): Seq[SparkPlan] = {
        val here = x match {
          case w: WholeStageCodegenExec => Seq(w)
          case a: AdaptiveSparkPlanExec => regions(a.executedPlan)
          case s: QueryStageExec => regions(s.plan)
          case _ => Nil
        }
        here ++ x.children.flatMap(regions)
      }
      regions(p).exists(_.toString.contains(marker))
    }
    def finalized(q: String): SparkPlan = {
      val qe = SparkEntry.queries(q)(spark, sf).queryExecution
      qe.executedPlan.execute().count() // finalize the adaptive plan
      qe.executedPlan
    }
    // the heavy operator itself must be INSIDE a codegen region
    assert(countCodegen(finalized("q1_agg")) >= 1, "q1_agg lost codegen")
    assert(codegenContains(finalized("q1_agg"), "HashAggregate"),
      "q1_agg aggregation fell out of whole-stage codegen")
    assert(codegenContains(finalized("p_enrich_join"), "BroadcastHashJoin"),
      "enrich join fell out of whole-stage codegen")
    // the dedup signature projection must be fused too (reference-object
    // doGenCode, not CodegenFallback which would exclude the operator)
    assert(codegenContains(finalized("t_minhash_sig"), "shinglehashes"),
      "shingle-hash projection fell out of whole-stage codegen")
    // and no interpreted lambda functions in the similarity hot path
    val simPlan = SparkEntry.queries("t_similarity_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!simPlan.contains("lambdafunction"), simPlan)
  }
}
