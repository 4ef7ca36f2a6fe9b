package graft

import graft.core.Sessions

/** Throughput benchmark over the headline queries (driver-run per round →
  * BENCH_r{N}.json). Design notes (round-1 + round-2 verdict fixes;
  * restructured round 17 after the r16 driver run was SIGTERM-killed):
  *
  *  - one *warm-up* pass (untimed for the medians, but recorded as a
  *    COLD fallback sample) so JIT/parquet-footer/session warm-up
  *    doesn't land on whichever query happens to run first;
  *  - up to `iters` TIMED SWEEPS (default 5) in deterministic
  *    (name-sorted) order, reporting the per-query MEDIAN: single-pass
  *    times carried ±2 s run-to-run variance under system contention.
  *    Sweeps interleave queries rather than back-to-back repeating one,
  *    so a contention spike degrades one sample of many queries instead
  *    of all samples of one;
  *  - WALL-CLOCK BUDGET (round-17 fix): `SPARK_GRAFT_BENCH_BUDGET_SECS`
  *    (default 1400) bounds the whole run. The r16 driver run overran
  *    its harness timeout on a load-12 box (222 queries × 6 passes),
  *    took a SIGTERM, and Spark's shutdown hook stopped the context
  *    while the sweep loop was still running — every remaining query
  *    recorded a bogus "stopped SparkContext"/INTERNAL_ERROR failure
  *    and the artifact carried 0 samples. Now: the streaming anchors
  *    run FIRST (fixed ~3-rep cost), the warm-up always completes, and
  *    additional sweeps run only while the remaining budget fits
  *    another pass (estimated from the last pass's duration). At least
  *    one timed sweep always runs;
  *  - KILL INSURANCE: a JVM shutdown hook emits the artifact + trailer
  *    from whatever samples exist (marked `"partial":true`; queries
  *    with only the warm-up sample fall back to it, counted in
  *    `cold_n`), so even a harness SIGTERM leaves a complete parseable
  *    record instead of rc-124 silence. A stopped SparkContext mid-run
  *    aborts the loops with ONE `context_stopped` entry instead of
  *    per-query junk;
  *  - the timed action is a `noop`-format write — materializes every row
  *    and column (unlike `count()`, which lets Catalyst prune columns and
  *    eliminate sorts, under-measuring the plan);
  *  - failures are *reported*, not swallowed: a failed query records -1
  *    and is listed in `failed`, never silently contributing a fake time;
  *  - bench plans exclude verification-only output sorts
  *    (SparkEntry.benchQueries vs .queries);
  *  - `queries_stats` carries a TRIMMED mean (drop one min + one max)
  *    beside the median: n≥3 with a trimmed mean absorbs one
  *    contention outlier completely;
  *  - the two STREAMING anchors (composed curation flagship docs/s,
  *    ratings-topology ev/s) run `SPARK_GRAFT_BENCH_STREAM_REPS`
  *    (default 3) times each, untimed-warm-up included per rep, and
  *    report the MEDIAN rep — single runs carried ±2× contention
  *    variance, unusable as a regression gate; `stream_reps` rides in
  *    the stanza. `SPARK_GRAFT_BENCH_STREAM=0` skips them.
  *  - `SPARK_GRAFT_BENCH_PREV=<prior BENCH artifact or raw stdout>`
  *    appends an in-process regression verdict to the trailer
  *    (`shared_n` + `regressions_n` + the worst ≤10 shared queries past
  *    1.3×, via BenchDiff's truncation-tolerant parser). N-GUARD
  *    (round-18 fix for r17's 127 phantom flags on n=1 medians,
  *    RESHAPED round 19): a query is regression-ELIGIBLE only at
  *    n ≥ 2 TIMED samples; the COLD warm-up sample is a fallback for
  *    queries with ZERO timed samples only (SIGTERM partials,
  *    `"cold":true`), never folded into a timed median — r18's fold
  *    promoted 1-timed-sweep queries to an eligible n=2 whose "median"
  *    was mean(cold, warm), and the artifact self-flagged 50 phantom
  *    regressions that an idle-box n=5 re-run measured at or below
  *    baseline. Each regression entry carries its `n`; the stanza
  *    carries `regressions_unreliable: true` whenever any shared query
  *    sits below the protocol's n ≥ 3, plus `regressions_suppressed_n`
  *    for ineligible shared queries — a budget-clamped 1-sweep run now
  *    suppresses EVERYTHING instead of crying wolf. Unset, it
  *    DEFAULTS to the newest `bench_full_r{M}.json` (else
  *    `BENCH_r{M}.json`) in the working directory with M STRICTLY below
  *    the current round — never this round's own output (the round-13
  *    advice fix for vacuous same-round self-comparison).
  *  - ADAPTIVE TOP-UP (round 20, r19 verdict ask #6): after the full
  *    sweeps stop, leftover budget re-sweeps ONLY the queries whose
  *    current median sits past the 1.3× threshold vs prev
  *    (BenchDiff.topupTargets) until each reaches n ≥ 3 — so even a
  *    1-full-sweep run produces a regression verdict that can SPEAK
  *    on every query it would flag, instead of suppressing all of
  *    them. Paired with the reshaped unreliable rule (the marker now
  *    judges only past-threshold queries), disclosed as
  *    `topup_sweeps` in both output lines.
  *  - every FULL run (no SPARK_GRAFT_BENCH_ONLY subset) also writes
  *    `bench_full_r{N}.json` to cwd: the complete per-query stats
  *    record, immune to the driver's stdout-tail truncation that left
  *    BENCH_r12.json with stats for ~1 of 106 queries. Next round's
  *    regression check (and BenchDiff, via resolvePreferFull) prefers
  *    this file, so `regressions_n` is computed over the full shared
  *    query set (`shared_n` in the trailer proves the denominator).
  *
  * Output: TWO JSON lines. First the full line: `queries` maps name →
  * median seconds (the driver contract), `queries_stats` maps name →
  * {median, tmean, n, min, max}. Then a COMPACT TRAILER line
  * (`"metric":"bench_summary"`) carrying total + stream + store +
  * failed + iters + sf WITHOUT the per-query maps. The driver's
  * artifact keeps the TAIL (the END) of stdout — BENCH_r09/r10 both
  * proved the FRONT gets cut (`parsed: null`, the leading
  * `"metric":"total"` and a front-placed `stream` section were lost) —
  * so the headline numbers must be in the LAST bytes printed. The big
  * line stays first; the trailer is small enough to always survive.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val wallStart = System.nanoTime()
    def elapsedSecs: Double = (System.nanoTime() - wallStart) / 1e9
    val budgetSecs = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SECS", "1400")
      .toDouble.max(60.0)
    def remainingSecs: Double = budgetSecs - elapsedSecs

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt.max(1)
    val spark = Sessions.build("graft-bench", cpus)
    // ERROR, not WARN: the r16 driver tail was 100% WindowExec-warning
    // spam (the deliberate tiny-table global windows), which crowded the
    // useful bytes out of the driver's kept-tail window
    spark.sparkContext.setLogLevel("ERROR")
    def stopped: Boolean = spark.sparkContext.isStopped

    // Ambient-load context (round-14 verdict ask #3): this sandbox's
    // totals swing ±15% with NEIGHBOR contention (five same-code full
    // runs measured 161–182 s in r14; an interleaved r15 A/B put the
    // SAME binary at 3.5–5.8 s on one query) — the 1-/5-/15-min load
    // averages at run start/end ride in the trailer so a cross-round
    // ratio can be normalized against how loaded the box actually was.
    def loadAvg(): String =
      try {
        val parts = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
          .split("\\s+")
        s"[${parts(0)},${parts(1)},${parts(2)}]"
      } catch { case _: Throwable => "[]" }
    val loadStart = loadAvg()

    // optional subset for local iteration (comma-separated names);
    // unset = all queries (the driver path) — mirrors
    // SPARK_GRAFT_VERIFY_ONLY on the Verify main
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = only.fold(SparkEntry.benchQueries)(names =>
      SparkEntry.benchQueries.filter { case (n, _) => names.contains(n) })
      .sortBy(_._1)
    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Shared mutable run state. TrieMaps: the shutdown-hook emitter
    // snapshots these WHILE the main thread may still be appending — a
    // LinkedHashMap iteration would risk a ConcurrentModificationException
    // exactly on the kill path the hook exists for.
    val failed = scala.collection.concurrent.TrieMap[String, String]()
    val samples = scala.collection.concurrent.TrieMap[String, List[Double]]()
    val coldSamples = scala.collection.concurrent.TrieMap[String, Double]()
    @volatile var streamStanza: Option[String] = None
    @volatile var storeStanza: Option[String] = None
    @volatile var sweepsDone = 0
    @volatile var topupSweeps = 0

    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // trimmed mean: drop one min and one max, average the rest — one
    // contention spike contributes zero instead of skewing the mean
    def tmean(xs: List[Double]): Double = {
      val s = xs.sorted
      val kept = if (s.size >= 3) s.slice(1, s.size - 1) else s
      kept.sum / kept.size
    }
    def jstr(s: String): String = graft.core.Json.str(s)

    // Current ROUND number: env override, else (newest DRIVER-written
    // BENCH_r{N}.json in cwd) + 1 — the driver writes BENCH_r{N} only
    // AFTER the round-N bench run, so at run time the newest such
    // artifact is the PRIOR round's. Deliberately ignores
    // bench_full_r{M}.json here: the engine writes that file DURING the
    // round (including local full runs), so counting it would bump the
    // detected round past the real one.
    val round: Int = sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt).getOrElse {
      Option(new java.io.File(".").listFiles()).toSeq.flatten
        .filter(f => f.isFile && f.getName.matches("BENCH_r\\d+\\.json"))
        .flatMap(f => BenchDiff.artifactRound(f.getName))
        .sortBy(identity).lastOption.map(_ + 1).getOrElse(1)
    }

    // Regression baseline resolution (all file I/O — done up front so the
    // shutdown-hook emitter never touches the filesystem search path).
    // A default-resolved candidate must MATCH the current sf: a
    // bench_full written by a local sf0.001 iteration must never serve
    // as the regression baseline for the driver's sf0.1 run (every
    // ratio would read ~100× slower). An explicit SPARK_GRAFT_BENCH_PREV
    // is trusted as-is; an artifact with no parseable sf is accepted.
    def sfMatches(path: String): Boolean =
      try {
        val raw = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        // matches both raw JSON ("sf":"/dir") and the driver artifact's
        // tail-escaped form (\"sf\":\"/dir\")
        """\\?"sf\\?":\\?"([^"\\]+)""".r.findFirstMatchIn(raw)
          .forall(_.group(1) == sfDir)
      } catch { case _: Throwable => false }
    val cwd = new java.io.File(".")
    val prevArtifact: Option[String] =
      sys.env.get("SPARK_GRAFT_BENCH_PREV")
        .orElse(BenchDiff.newestArtifactBelow(cwd, """bench_full_r\d+\.json""", round)
          .filter(sfMatches))
        .orElse(BenchDiff.newestArtifactBelow(cwd, """BENCH_r\d+\.json""", round)
          .filter(sfMatches))
    val prevMedians: Option[(String, Map[String, Double])] =
      prevArtifact.flatMap { p =>
        try Some((new java.io.File(p).getName, BenchDiff.loadFile(p)._1))
        catch { case e: Throwable =>
          // disclose an unreadable prev artifact, don't fail the bench
          failed.putIfAbsent("bench_prev",
            Option(e.getMessage).getOrElse(e.getClass.getName))
          None
        }
      }

    /** Emit the full artifact + the two stdout JSON lines from the
      * CURRENT run state. Idempotent (first caller wins): invoked once
      * at normal completion, or by the shutdown hook on a kill. Queries
      * with no timed sample fall back to their warm-up (cold) sample,
      * disclosed via `cold_n` + per-query `"cold":true`.
      */
    val emitted = new java.util.concurrent.atomic.AtomicBoolean(false)
    def emit(partial: Boolean): Unit = {
      if (!emitted.compareAndSet(false, true)) return
      val samp = samples.readOnlySnapshot().toMap
      val cold = coldSamples.readOnlySnapshot().toMap
      val fsnap = failed.readOnlySnapshot().toMap
      // (name, median, samples, isCold) — the COLD warm-up sample is a
      // fallback for ZERO timed samples only (SIGTERM partials). It is
      // never folded into a timed median: the r18 driver artifact
      // folded it at timed-n < 3, which promoted 1-sweep queries to an
      // ELIGIBLE n=2 whose "median" was mean(cold, warm) — 50 phantom
      // regression flags that an idle-box n=5 re-run measured at or
      // below baseline. Timed medians stay warm-on-warm; a 1-sweep
      // query reports n=1 and the eligibility gate below suppresses it
      // (disclosed via regressions_suppressed_n + unreliable marker).
      val results: Seq[(String, Double, List[Double], Boolean)] =
        ordered.map { case (name, _) =>
          samp.get(name).filter(_.nonEmpty) match {
            case Some(xs0) => (name, median(xs0), xs0, false)
            case None => cold.get(name) match {
              case Some(c) => (name, c, List(c), true)
              case None    => (name, -1.0, Nil, false)
            }
          }
        }
      // per-query effective sample count — the regression gate guards
      // on this (BASELINE.md protocol: "compare medians only where
      // n ≥ 3"; the artifact now enforces what the prose promised)
      val curN: Map[String, Int] =
        results.collect { case (k, _, xs, _) if xs.nonEmpty => k -> xs.size }
          .toMap
      val coldN = results.count(_._4)
      val cur = results.collect {
        case (k, m, xs, _) if xs.nonEmpty => k -> m
      }.toMap

      // Bench tiers (round-15 verdict ask #6, rule recorded in
      // BASELINE.md §Bench tiers): a query's tier follows its BASELINE
      // median when a prev artifact covers it (so a query can't switch
      // tiers by merely regressing), else its current median.
      // `flagship` = train-per-query compositions (≥ 2 s); `core` =
      // simple relational/windowed plans. One 1.3× gate over both kept
      // drowning the signal: 1.35× on a 0.4 s core query is sandbox
      // noise, the same ratio on a 5 s flagship is ~2 s of real work —
      // so core regressions additionally need a ≥0.3 s absolute delta
      // and a higher 1.5× ratio before they're flagged.
      val TierCutSecs = 2.0
      def tierOf(q: String): String = {
        val base = prevMedians.flatMap(_._2.get(q)).orElse(cur.get(q)).getOrElse(0.0)
        if (base >= TierCutSecs) "flagship" else "core"
      }
      val tiersJson: String = {
        val byTier = cur.keys.toSeq.groupBy(tierOf)
        Seq("core", "flagship").map { t =>
          val qs = byTier.getOrElse(t, Nil)
          val tot = qs.map(cur).sum
          f""""$t%s":{"n":${qs.size}%d,"total":$tot%.2f}"""
        }.mkString(""","tiers":{""", ",", "}")
      }
      val regressionJson: String = prevMedians match {
        case None => ""
        case Some((prevName, prev)) =>
          val shared = prev.keySet & cur.keySet
          val sharedN = shared.size
          // n-guard (r17 verdict fix): a query is ELIGIBLE for a
          // regression flag only at effective n ≥ 2 — an n=1 median is
          // a single sample and flagging on it is exactly the 127-
          // phantom-regression artifact r17 shipped. Suppression is
          // disclosed (suppressed count + unreliable marker whenever
          // ANY shared query sits below the protocol's n ≥ 3).
          val (all, suppressedN, unreliable) =
            BenchDiff.guardedRegressions(prev, cur, curN, threshold = 1.3)
          def item(e: (String, Double, Double, Double)): String = {
            val (k, pv, cv, r) = e
            f"""{"q":${jstr(k)},"prev":$pv%.3f,"cur":$cv%.3f,"ratio":$r%.2f,"n":${curN.getOrElse(k, 0)}%d}"""
          }
          val (flag, coreAll) = all.partition { case (k, _, _, _) => tierOf(k) == "flagship" }
          val coreReg = coreAll.filter { case (_, pv, cv, r) => r >= 1.5 && cv - pv >= 0.3 }
          val unreliableJson =
            if (unreliable) s""","regressions_unreliable":true""" else ""
          val suppressedJson =
            if (suppressedN > 0) s""","regressions_suppressed_n":$suppressedN""" else ""
          s""","shared_n":$sharedN,"prev_artifact":${jstr(prevName)}$unreliableJson$suppressedJson,"regressions_n":${all.size},"regressions":[${all.take(10).map(item).mkString(",")}],"regressions_flagship":[${flag.take(10).map(item).mkString(",")}],"regressions_core":[${coreReg.take(10).map(item).mkString(",")}]"""
      }

      val qs = results.map { case (k, m, _, _) => s"${jstr(k)}:$m" }
        .mkString("{", ",", "}")
      val stats = results.collect { case (k, m, xs, isCold) if xs.nonEmpty =>
        val coldKey = if (isCold) ""","cold":true""" else ""
        s"${jstr(k)}:{\"median\":$m,\"tmean\":${tmean(xs)},\"n\":${xs.size},\"min\":${xs.min},\"max\":${xs.max}$coldKey}"
      }.mkString("{", ",", "}")
      val fails = fsnap.map { case (k, v) => s"${jstr(k)}:${jstr(v.take(200))}" }
        .mkString("{", ",", "}")
      val total = results.collect { case (_, m, xs, _) if xs.nonEmpty => m }.sum
      val streamJson = streamStanza.map(s => s""""stream":$s,""").getOrElse("")
      val partialJson = if (partial) s""""partial":true,"cold_n":$coldN,""" else ""
      val sweepsJson = s""""sweeps":$sweepsDone,"topup_sweeps":$topupSweeps,"""

      // Self-contained per-round artifact (round-13 verdict ask #1): the
      // driver keeps only the TAIL of stdout, so BENCH_r{N}.json carries
      // per-query stats for however few queries survive truncation. This
      // file is the COMPLETE record, written to cwd where
      // BenchDiff.resolvePreferFull and next round's prev-resolution find
      // it. Skipped on subset runs (SPARK_GRAFT_BENCH_ONLY): a 3-query
      // local iteration must not poison the next round's regression
      // baseline.
      if (only.isEmpty) {
        val storeJson = storeStanza.map(s => s""","store":$s""").getOrElse("")
        val fullLine =
          s"""{"metric":"bench_full","round":$round,$partialJson$sweepsJson"total":$total,"unit":"sec","n_queries":${results.count(_._3.nonEmpty)},$streamJson"queries":$qs,"queries_stats":$stats,"failed":$fails$storeJson$tiersJson$regressionJson,"load_start":$loadStart,"load_end":${loadAvg()},"iters":$iters,"sf":${jstr(sfDir)}}"""
        try
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"bench_full_r$round.json"),
            (fullLine + "\n").getBytes("UTF-8"))
        catch { case _: Throwable => () }
      }

      println(s"""{"metric":"total","value":$total,"unit":"sec",$partialJson$streamJson"queries":$qs,"queries_stats":$stats,"failed":$fails,"iters":$iters,"sf":${jstr(sfDir)}}""")
      // Compact TRAILER line, printed LAST: the driver's artifact keeps
      // the tail (end) of stdout, so the headline numbers must be in the
      // final bytes — small enough (~400 B) to always survive truncation.
      val streamTrail = streamStanza.map(s => s""","stream":$s""").getOrElse("")
      val storeTrail = storeStanza.map(s => s""","store":$s""").getOrElse("")
      // the trailer must stay small even on a MASS-failure run (84 ×
      // 200-char messages ≈ 18 KB would push "total" past the kept-tail
      // window — the exact r09/r10 truncation this line exists to
      // survive): the trailer carries only a failure COUNT + up to 10
      // names; full messages live in the big line's "failed" map
      val failTrail =
        if (fsnap.isEmpty) ""","failed_n":0"""
        else s""","failed_n":${fsnap.size},"failed_names":${fsnap.keys.take(10).map(jstr).mkString("[", ",", "]")}"""
      val partialTrail = if (partial) s""","partial":true,"cold_n":$coldN""" else ""
      println(s"""{"metric":"bench_summary","total":$total,"unit":"sec","n_queries":${results.count(_._3.nonEmpty)}$partialTrail,"sweeps":$sweepsDone,"topup_sweeps":$topupSweeps$streamTrail$storeTrail$failTrail$tiersJson$regressionJson,"load_start":$loadStart,"load_end":${loadAvg()},"iters":$iters,"sf":${jstr(sfDir)}}""")
      System.out.flush()
    }

    // Kill insurance: the harness `timeout` sends SIGTERM; Spark's own
    // shutdown hook stops the context while this main thread is still in
    // the sweep loop. Emitting here turns an rc-124 zero-artifact run
    // (the r16 failure mode) into a partial-but-parseable record.
    val hook = new Thread(() => try emit(partial = true) catch { case _: Throwable => () })
    Runtime.getRuntime.addShutdownHook(hook)

    // ── 1. Warm-up: run everything once; timings recorded as COLD
    // fallback samples (used only if a kill prevents any timed sweep for
    // a query). A warm-up failure is recorded and the query skipped in
    // the timed sweeps.
    var abort = false
    ordered.foreach { case (name, fn) =>
      if (!abort) {
        if (stopped) {
          failed.putIfAbsent("context_stopped",
            s"SparkContext stopped during warm-up before $name")
          abort = true
        } else {
          val t0 = System.nanoTime()
          try {
            runOnce(fn)
            coldSamples(name) = (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            if (stopped) {
              failed.putIfAbsent("context_stopped",
                s"SparkContext stopped during warm-up at $name")
              abort = true
            } else failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          }
        }
      }
    }
    val warmupSecs = elapsedSecs

    // ── 2. Streaming anchors AFTER the query warm-up (the JVM and
    // Spark machinery are JIT-hot, comparable to the r16-and-earlier
    // artifacts where the stream ran last) but BEFORE the budget-capped
    // sweeps — a budget squeeze lands on extra batch sweeps, never on
    // the cross-round streaming regression gate. MEDIAN of `streamReps`
    // runs each, preceded by ONE quarter-size UNTIMED warm rep per
    // anchor (first-use streaming codepaths otherwise drag rep 1 and
    // the median with it). Single runs carried ±2× run-to-run variance
    // under sandbox contention (r11 verdict); the median of 3 is the
    // stable signal.
    val streamReps =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAM_REPS", "3").toInt.max(1)
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_STREAM", "1") != "0" && !stopped) {
      try {
        // a user-set tiny budget (local iteration) shrinks to one rep
        val reps = if (remainingSecs < 240) 1 else streamReps
        def med(xs: Seq[(Double, Double, Long)]): (Double, Double, Long) =
          xs.sortBy(_._1).apply(xs.size / 2)
        // 4000-doc micro-batches — the batch size the flagship's
        // published docs/s uses; StreamBench pins shuffle partitioning
        // to the published 8-partition shape (thread count still
        // follows SPARK_GRAFT_CPUS — compare like-configured rounds)
        StreamBench.pipelineRun(spark, 2000, 1,
          storeName = "bench_curation_w")
        val (dps, dSecs, admitted) = med((1 to reps).map(r =>
          StreamBench.pipelineRun(spark, 8000, 2,
            storeName = s"bench_curation_$r")))
        StreamBench.ratingsRun(spark, 10000, 2, tag = "sbrw")
        val (eps, eSecs, aggRows) = med((1 to reps).map(r =>
          StreamBench.ratingsRun(spark, 60000, 6, tag = s"sbr$r")))
        // round-14 anchor: the incremental flatMapGroupsWithState
        // feature stage (EventFeatureStream.lagFeatures) — ev/s through
        // per-key seq/lag/gap/session derivation
        StreamBench.featuresRun(spark, 10000, 2, tag = "sbfw")
        val (fps, fSecs, fRows) = med((1 to reps).map(r =>
          StreamBench.featuresRun(spark, 60000, 6, tag = s"sbf$r")))
        streamStanza = Some(f"""{"curation_docs_per_sec":$dps%.0f,"curation_secs":$dSecs%.2f,"curation_admitted":$admitted,"ratings_events_per_sec":$eps%.0f,"ratings_secs":$eSecs%.2f,"ratings_agg_rows":$aggRows,"features_events_per_sec":$fps%.0f,"features_secs":$fSecs%.2f,"features_rows":$fRows,"stream_reps":$reps}""")
        // gate-store operational snapshot (listing-only probe) — lets
        // each round's artifact show whether the maintenance cadence is
        // keeping version/file growth bounded; piggybacks on the store
        // the curation anchor just wrote
        try {
          val r = graft.streaming.IngestDedupGate
            .storeStats(spark, s"bench_curation_$reps").collect().head
          storeStanza = Some(s"""{"version":${r.getLong(0)},"dirs":${r.getLong(1)},"band_files":${r.getLong(2)},"band_bytes":${r.getLong(3)},"feat_files":${r.getLong(4)},"feat_bytes":${r.getLong(5)}}""")
        } catch { case e: Throwable =>
          // disclose, don't swallow: a corrupt store should show up as
          // failed("store") in the artifact, not a silently absent key
          failed.putIfAbsent("store",
            Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      } catch { case e: Throwable =>
        // a streaming-anchor failure must cost the stream section, not
        // the batch samples
        failed.putIfAbsent("stream",
          Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }

    // ── 3. Timed sweeps under the wall budget: sweep 1 always runs
    // (one timed sample per query is the artifact's floor); each further
    // sweep runs only if the remaining budget fits another pass,
    // estimated from the last pass's measured duration.
    var lastPassSecs = warmupSecs
    while (!abort && sweepsDone < iters &&
           (sweepsDone == 0 || remainingSecs > lastPassSecs * 1.15)) {
      val passStart = System.nanoTime()
      ordered.foreach { case (name, fn) =>
        if (!abort && !failed.contains(name)) {
          if (stopped) {
            failed.putIfAbsent("context_stopped",
              s"SparkContext stopped during sweep ${sweepsDone + 1} before $name")
            abort = true
          } else {
            val t0 = System.nanoTime()
            try {
              runOnce(fn)
              samples(name) = samples.getOrElse(name, Nil) :+
                (System.nanoTime() - t0) / 1e9
            } catch { case e: Throwable =>
              if (stopped) {
                failed.putIfAbsent("context_stopped",
                  s"SparkContext stopped during sweep ${sweepsDone + 1} at $name")
                abort = true
              } else {
                failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                samples.remove(name)
              }
            }
          }
        }
      }
      if (!abort) sweepsDone += 1
      lastPassSecs = (System.nanoTime() - passStart) / 1e9
    }

    // ── 3b. ADAPTIVE TOP-UP (round 20): when the full-sweep budget
    // stopped below the protocol's n ≥ 3, re-spend what remains on
    // ONLY the queries whose current median sits past the 1.3×
    // regression threshold vs prev — each top-up pass re-runs just the
    // flagged set, so flagged queries reach n ≥ 3 (and the gate can
    // speak) at a fraction of a full sweep's cost. Queries whose
    // median drops back under the threshold leave the target set
    // between passes; TopupCap bounds pathological oscillation.
    if (!abort && prevMedians.isDefined && sweepsDone > 0) {
      val prev = prevMedians.get._2
      val TopupCap = 8
      val byName = ordered.toMap
      def targets: Seq[String] = BenchDiff.topupTargets(prev,
        samples.readOnlySnapshot().toMap)
      def passCost(qs: Seq[String]): Double = {
        val snap = samples.readOnlySnapshot()
        qs.flatMap(k => snap.get(k).flatMap(_.lastOption)).sum
      }
      var flagged = targets
      while (!abort && flagged.nonEmpty && topupSweeps < TopupCap &&
             remainingSecs > passCost(flagged) * 1.3 + 10) {
        flagged.foreach { name =>
          if (!abort && !failed.contains(name)) {
            if (stopped) {
              failed.putIfAbsent("context_stopped",
                s"SparkContext stopped during top-up before $name")
              abort = true
            } else {
              val t0 = System.nanoTime()
              try {
                runOnce(byName(name))
                samples(name) = samples.getOrElse(name, Nil) :+
                  (System.nanoTime() - t0) / 1e9
              } catch { case e: Throwable =>
                if (stopped) {
                  failed.putIfAbsent("context_stopped",
                    s"SparkContext stopped during top-up at $name")
                  abort = true
                } else {
                  failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                  samples.remove(name)
                }
              }
            }
          }
        }
        if (!abort) topupSweeps += 1
        flagged = targets
      }
    }

    emit(partial = abort)
    try Runtime.getRuntime.removeShutdownHook(hook)
    catch { case _: Throwable => () } // already shutting down
    spark.stop()
  }
}
