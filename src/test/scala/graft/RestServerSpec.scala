package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.meta.RestServer

/** M4 REST surface: the ksqlDB /query analog over the spark.sql text
  * engine — pull queries over HTTP, ksqlDB-envelope and raw-SQL bodies,
  * error contract, catalog status.
  */
class RestServerSpec extends SparkSuite {

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def get(port: Int, path: String): (Int, String) = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("POST /query runs SQL through the engine (ksqlDB envelope AND raw SQL)") {
    customersDf.createOrReplaceTempView("rest_customers")
    val server = RestServer.start(spark)
    val port = server.getAddress.getPort
    try {
      // ksqlDB-style envelope (rest_example.sh:6-16)
      val (code, body) = post(port, "/query",
        """{"ksql": "SELECT club_status, count(*) AS n FROM rest_customers GROUP BY club_status ORDER BY club_status;"}""")
      assert(code == 200, body)
      assert(body.contains(""""columns":["club_status","n"]"""), body)
      assert(body.contains("""{"club_status":"bronze","n":5}"""), body)

      // raw SQL body, engine SQL functions reachable (GraftExtensions)
      val (c2, b2) = post(port, "/query", "SELECT polyhash('abc') AS fp")
      assert(c2 == 200, b2)
      assert(b2.contains(s""""fp":${((97L * 31 + 98) * 31 + 99) % 2147483647L}"""), b2)

      // error contract: analysis failure -> 400 with an error payload
      val (c3, b3) = post(port, "/query", "SELECT * FROM no_such_table_xyz")
      assert(c3 == 400 && b3.contains("error"), s"$c3 $b3")

      // malformed envelope (JSON without sql/ksql key) is a CLIENT error
      val (c5, b5) = post(port, "/query", """{"statement":"SELECT 1"}""")
      assert(c5 == 400 && b5.contains("error"), s"$c5 $b5")

      // GET /status lists the catalog
      val (c4, b4) = get(port, "/status")
      assert(c4 == 200 && b4.contains("rest_customers"), b4)
    } finally server.stop(0)
  }

  test("POST /ops reaches the eval/retrieval operators over registered relations") {
    import spark.implicits._
    Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
      .createOrReplaceTempView("rest_run")
    Seq((1L, 10L, 1L), (1L, 13L, 1L))
      .toDF("query_id", "doc_id", "rel")
      .createOrReplaceTempView("rest_qrels")
    Seq((7L, true), (3L, false), (9L, true), (1L, false))
      .toDF("score", "label")
      .createOrReplaceTempView("rest_scored")
    Seq((1L, 10L, 1L), (1L, 11L, 2L))
      .toDF("query_id", "doc_id", "sparse_rank")
      .createOrReplaceTempView("rest_arm_a")
    Seq((1L, 11L, 1L), (1L, 12L, 2L))
      .toDF("query_id", "doc_id", "dense_rank")
      .createOrReplaceTempView("rest_arm_b")
    val server = RestServer.start(spark)
    val port = server.getAddress.getPort
    try {
      // rank_eval over registered run/qrels == the operator API
      val (c1, b1) = post(port, "/ops",
        """{"op":"rank_eval","run":"rest_run","qrels":"rest_qrels","k":3}""")
      assert(c1 == 200, b1)
      val apiRow = graft.ext.Eval.rankEval(
        spark.table("rest_run"), spark.table("rest_qrels"), k = 3)
        .collect().head
      assert(b1.contains(s""""n_rel_ret":${apiRow.getLong(
        apiRow.fieldIndex("n_rel_ret"))}"""), b1)
      assert(b1.contains(s""""ndcg_x10000":${apiRow.getLong(
        apiRow.fieldIndex("ndcg_x10000"))}"""), b1)

      // roc_auc (global face)
      val (c2, b2) = post(port, "/ops",
        """{"op":"roc_auc","table":"rest_scored"}""")
      assert(c2 == 200 && b2.contains(""""auc_x10000":10000"""), s"$c2 $b2")

      // rrf_fuse over two arms == rrfFuseAll
      val (c3, b3) = post(port, "/ops",
        """{"op":"rrf_fuse","arms":["rest_arm_a","rest_arm_b"],"k":3}""")
      assert(c3 == 200, b3)
      val fusedTop = graft.ext.Retrieval.rrfFuseAll(
        Seq(spark.table("rest_arm_a"), spark.table("rest_arm_b")), k = 3)
        .orderBy("rank").collect().head
      assert(b3.contains(s""""doc_id":${fusedTop.getLong(1)}"""), b3)

      // wer over registered pred/ref views (per-item and report faces)
      Seq((1L, "the cat sat"), (2L, "wrong words here"))
        .toDF("doc_id", "pred").createOrReplaceTempView("rest_preds")
      Seq((1L, "the cat sat"), (2L, "the dog ran"))
        .toDF("doc_id", "ref").createOrReplaceTempView("rest_refs")
      val (c7, b7) = post(port, "/ops",
        """{"op":"wer","preds":"rest_preds","refs":"rest_refs"}""")
      assert(c7 == 200 && b7.contains(""""edit_dist":0""") &&
        b7.contains(""""edit_dist":3"""), s"$c7 $b7")
      val (c8, b8) = post(port, "/ops",
        """{"op":"wer","preds":"rest_preds","refs":"rest_refs","report":true}""")
      assert(c8 == 200 && b8.contains(""""n_edits":3""") &&
        b8.contains(""""wer_x100":50"""), s"$c8 $b8")

      // error contracts: unknown op, bad relation NAME (not SQL), and
      // a non-identifier are all CLIENT errors
      val (c4, b4) = post(port, "/ops", """{"op":"frobnicate"}""")
      assert(c4 == 400 && b4.contains("unknown op"), s"$c4 $b4")
      val (c5, b5) = post(port, "/ops",
        """{"op":"roc_auc","table":"no_such_view_xyz"}""")
      assert(c5 == 400 && b5.contains("error"), s"$c5 $b5")
      val (c6, b6) = post(port, "/ops",
        """{"op":"roc_auc","table":"x; DROP TABLE y"}""")
      assert(c6 == 400 && b6.contains("registered relation name"),
        s"$c6 $b6")
    } finally server.stop(0)
  }
}
