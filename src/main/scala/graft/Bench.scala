package graft

import graft.core.Sessions

/** Throughput benchmark over the headline queries (driver-run per round →
  * BENCH_r{N}.json). Design notes (round-1 + round-2 verdict fixes):
  *
  *  - one *warm-up* pass (untimed) so JIT/parquet-footer/session warm-up
  *    doesn't land on whichever query happens to run first;
  *  - `iters` TIMED SWEEPS (default 3) in deterministic (name-sorted)
  *    order, reporting the per-query MEDIAN: single-pass times carried
  *    ±2 s run-to-run variance under system contention — comparable to
  *    the per-query times themselves. Sweeps interleave queries rather
  *    than back-to-back repeating one, so a contention spike degrades one
  *    sample of many queries instead of all samples of one;
  *  - the timed action is a `noop`-format write — materializes every row
  *    and column (unlike `count()`, which lets Catalyst prune columns and
  *    eliminate sorts, under-measuring the plan);
  *  - failures are *reported*, not swallowed: a failed query records -1
  *    and is listed in `failed`, never silently contributing a fake time;
  *  - bench plans exclude verification-only output sorts
  *    (SparkEntry.benchQueries vs .queries).
  *
  * Output: one JSON line; `queries` maps name → median seconds (the
  * driver contract), `queries_stats` maps name → {median, n, min, max}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val spark = Sessions.build("graft-bench", cpus)

    val ordered = SparkEntry.benchQueries.sortBy(_._1)
    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Warm-up: run everything once, untimed; a warm-up failure is recorded
    // and the query skipped in the timed sweeps.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    ordered.foreach { case (name, fn) =>
      try runOnce(fn)
      catch { case e: Throwable =>
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }

    val samples = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    (1 to iters).foreach { _ =>
      ordered.foreach { case (name, fn) =>
        if (!failed.contains(name)) {
          val t0 = System.nanoTime()
          try {
            runOnce(fn)
            samples(name) = samples.getOrElse(name, Nil) :+
              (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            samples.remove(name)
          }
        }
      }
    }

    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = ordered.map { case (name, _) =>
      samples.get(name).filter(_.nonEmpty) match {
        case Some(xs) => (name, median(xs), xs)
        case None     => (name, -1.0, Nil)
      }
    }

    def jstr(s: String): String = graft.core.Json.str(s)
    val qs = results.map { case (k, m, _) => s"${jstr(k)}:$m" }.mkString("{", ",", "}")
    val stats = results.collect { case (k, m, xs) if xs.nonEmpty =>
      s"${jstr(k)}:{\"median\":$m,\"n\":${xs.size},\"min\":${xs.min},\"max\":${xs.max}}"
    }.mkString("{", ",", "}")
    val fails = failed.map { case (k, v) => s"${jstr(k)}:${jstr(v.take(200))}" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, m, xs) if xs.nonEmpty => m }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_stats":$stats,"failed":$fails,"iters":$iters,"sf":${jstr(sfDir)}}""")
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.keys.mkString(", ")}")
    spark.stop()
  }
}
