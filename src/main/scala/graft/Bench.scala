package graft

import graft.core.Sessions

/** Throughput benchmark over the headline queries (driver-run per round →
  * BENCH_r{N}.json). Design notes (round-1 verdict fixes):
  *
  *  - one *warm-up* pass (untimed) so JIT/parquet-footer/session warm-up
  *    doesn't land on whichever query happens to run first;
  *  - queries run in deterministic (name-sorted) order;
  *  - the timed action is a `noop`-format write — materializes every row
  *    and column (unlike `count()`, which lets Catalyst prune columns and
  *    eliminate sorts, under-measuring the plan);
  *  - failures are *reported*, not swallowed: a failed query records -1
  *    and is listed in `failed`, never silently contributing a fake time;
  *  - bench plans exclude verification-only output sorts
  *    (SparkEntry.benchQueries vs .queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.build("graft-bench", cpus)

    val ordered = SparkEntry.benchQueries.sortBy(_._1)
    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Warm-up: run everything once, untimed; a warm-up failure is recorded
    // and the query skipped in the timed pass.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    ordered.foreach { case (name, fn) =>
      try runOnce(fn)
      catch { case e: Throwable =>
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }

    val results = ordered.map { case (name, fn) =>
      if (failed.contains(name)) name -> -1.0
      else {
        val t0 = System.nanoTime()
        try { runOnce(fn); name -> (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          name -> -1.0
        }
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val fails = failed.map { case (k, v) => s"${jstr(k)}:${jstr(v.take(200))}" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fails,"sf":${jstr(sfDir)}}""")
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.keys.mkString(", ")}")
    spark.stop()
  }
}
