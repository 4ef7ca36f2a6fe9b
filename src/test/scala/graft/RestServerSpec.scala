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
}
