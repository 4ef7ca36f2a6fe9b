package graft

/** Compare two bench outputs: `sbt "runMain graft.BenchDiff a.json b.json"`.
  *
  * Accepts, for each side, ANY of:
  *  - raw Bench stdout (the big `"metric":"total"` line and/or the
  *    `"metric":"bench_summary"` trailer line);
  *  - a driver BENCH_r{N}.json artifact (`{"n":…,"tail":"…","parsed":…}`)
  *    — including the truncated-front tails rounds 9/10 produced, where
  *    `parsed` is null and only a suffix of the big line survives.
  *
  * Extraction is regex-based rather than a strict JSON parse precisely so
  * a truncated tail still yields every per-query median it contains:
  * `queries_stats` fragments (`"name":{"median":s,…}`) are preferred,
  * the plain `queries` map (`"name":s`) fills gaps, and totals come from
  * either line's header. Output: per-query ratio table sorted worst-first
  * (b/a, regressions at the top), then queries present on one side only,
  * then totals. No SparkSession — pure text, instant.
  */
object BenchDiff {
  private val StatsPair = """"([A-Za-z0-9_]+)":\{"median":([-0-9.eE+]+)""".r
  private val PlainPair = """"([A-Za-z0-9_]+)":([-0-9.eE+]+)""".r
  private val QueriesMap = """"queries":\{([^}]*)\}""".r
  private val TotalHead = """"metric":"total","value":([-0-9.eE+]+)""".r
  private val SummaryHead = """"metric":"bench_summary","total":([-0-9.eE+]+)""".r
  private val FullHead = """"metric":"bench_full","round":\d+,"total":([-0-9.eE+]+)""".r
  private val StreamStanza = """"stream":(\{[^}]*\})""".r

  /** Unwrap a driver artifact's escaped `tail` string if present; pass raw
    * stdout through untouched. Hand-rolled unescape (\" \\ \uXXXX \n \t)
    * — the tail only ever contains what Bench itself printed.
    */
  private[graft] def extractText(fileText: String): String = {
    val tailField = """"tail"\s*:\s*"""".r.findFirstMatchIn(fileText)
    tailField match {
      case None => fileText
      case Some(m) =>
        val sb = new StringBuilder
        var i = m.end
        var done = false
        while (i < fileText.length && !done) {
          fileText.charAt(i) match {
            case '"' => done = true
            case '\\' if i + 1 < fileText.length =>
              fileText.charAt(i + 1) match {
                case '"'  => sb += '"'; i += 1
                case '\\' => sb += '\\'; i += 1
                case 'n'  => sb += '\n'; i += 1
                case 't'  => sb += '\t'; i += 1
                case 'u' if i + 5 < fileText.length =>
                  sb += Integer.parseInt(fileText.substring(i + 2, i + 6), 16).toChar
                  i += 5
                case c => sb += c; i += 1
              }
              i += 1
            case c => sb += c; i += 1
          }
        }
        // keep the raw text AROUND the tail field too (the artifact's
        // parsed echo after the closing quote, headers before it) — a
        // per-query median present only there must not be dropped
        val after =
          if (done && i + 1 < fileText.length) fileText.substring(i + 1)
          else ""
        fileText.substring(0, m.start) + sb.toString + after
    }
  }

  private[graft] def parseQueries(text: String): Map[String, Double] = {
    // queries_stats medians first (survive truncation independently),
    // then the plain queries map fills anything the stats lack
    val fromStats = StatsPair.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val fromPlain = QueriesMap.findAllMatchIn(text).flatMap { qm =>
      PlainPair.findAllMatchIn(qm.group(1))
        .map(m => m.group(1) -> m.group(2).toDouble)
    }.toMap
    (fromPlain ++ fromStats).filter(_._2 >= 0) // -1 = failed, not a time
  }

  private[graft] def parseTotal(text: String): Option[Double] =
    SummaryHead.findFirstMatchIn(text).map(_.group(1).toDouble)
      .orElse(FullHead.findFirstMatchIn(text).map(_.group(1).toDouble))
      .orElse(TotalHead.findFirstMatchIn(text).map(_.group(1).toDouble))

  /** Shared queries whose current median regressed past `threshold`
    * (cur/prev), worst first: (query, prev, cur, ratio). Shared with
    * [[Bench]]'s in-process regression trailer (SPARK_GRAFT_BENCH_PREV)
    * so each round's artifact carries its own regression verdict.
    */
  private[graft] def regressions(prev: Map[String, Double],
                                 cur: Map[String, Double],
                                 threshold: Double = 1.3)
      : Seq[(String, Double, Double, Double)] =
    cur.toSeq.flatMap { case (k, c) =>
      prev.get(k).filter(p => p > 0 && c / p > threshold)
        .map(p => (k, p, c, c / p))
    }.sortBy(-_._4)

  /** [[regressions]] under the SAMPLE-COUNT GUARD (the r17-verdict fix,
    * rule recorded in BASELINE.md §Regression gate; RESHAPED round 20
    * for the adaptive top-up): a query is ELIGIBLE for a regression
    * flag only at effective n ≥ 2 — an n=1 median is a single sample,
    * and flagging on it is exactly the 127-phantom-regression artifact
    * r17 shipped. Returns (flagged, suppressedN, unreliable):
    * `suppressedN` = shared queries PAST the threshold but excluded by
    * the n-guard (a flag would have fired on thin evidence — disclosed
    * in the trailer); `unreliable` = any PAST-THRESHOLD shared query
    * sits below the protocol's n ≥ 3. Round-19's rule marked the
    * verdict unreliable when ANY shared query sat below n = 3, which
    * at 291 queries × a 1400 s budget was permanently true — honest
    * but mute. The reshaped rule judges reliability where it matters:
    * the queries whose flags are in question. A below-threshold n=1
    * sample can hide a real regression behind one lucky sample, but
    * that is a false-NEGATIVE risk the gate has always accepted (it
    * exists at any n); the marker's job is guarding the flags the
    * artifact actually raises, and the [[topupTargets]] loop spends
    * leftover budget driving exactly those queries to n ≥ 3.
    */
  private[graft] def guardedRegressions(prev: Map[String, Double],
                                        cur: Map[String, Double],
                                        curN: Map[String, Int],
                                        threshold: Double = 1.3)
      : (Seq[(String, Double, Double, Double)], Int, Boolean) = {
    val shared = prev.keySet & cur.keySet
    def pastThreshold(k: String): Boolean =
      prev.get(k).exists(p => p > 0 &&
        cur.get(k).exists(c => c / p > threshold))
    val eligible = cur.filter { case (k, _) => curN.getOrElse(k, 0) >= 2 }
    val suppressedN =
      shared.count(k => pastThreshold(k) && curN.getOrElse(k, 0) < 2)
    val unreliable =
      shared.exists(k => pastThreshold(k) && curN.getOrElse(k, 0) < 3)
    (regressions(prev, eligible, threshold), suppressedN, unreliable)
  }

  /** The ADAPTIVE TOP-UP target set (round 20): queries whose CURRENT
    * median sits past the regression threshold vs `prev` but whose
    * sample count is still below `targetN` — the queries the budget
    * should be re-spent on so the regression gate can speak with n ≥ 3
    * instead of suppressing. Sorted for deterministic sweep order.
    */
  private[graft] def topupTargets(prev: Map[String, Double],
                                  samples: Map[String, List[Double]],
                                  threshold: Double = 1.3,
                                  targetN: Int = 3): Seq[String] = {
    def med(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    samples.toSeq.collect {
      case (k, xs) if xs.nonEmpty && xs.size < targetN &&
        prev.get(k).exists(p => p > 0 && med(xs) / p > threshold) => k
    }.sorted
  }

  /** Round number embedded in a bench artifact file name
    * (`BENCH_r13.json` / `bench_full_r13.json` → 13).
    */
  private val ArtifactNum = """(?:BENCH|bench_full)_r(\d+)\.json""".r

  private[graft] def artifactRound(name: String): Option[Int] =
    ArtifactNum.findFirstMatchIn(name).map(_.group(1).toInt)

  /** The newest artifact in `dir` matching `pattern` whose round is
    * strictly below `belowRound` — the self-comparison guard: a bench
    * re-run inside round N must diff against round N-1's artifact, never
    * the BENCH_rN.json its own round already produced.
    */
  private[graft] def newestArtifactBelow(dir: java.io.File, pattern: String,
                                         belowRound: Int): Option[String] = {
    val rx = pattern.r
    Option(dir.listFiles()).flatMap(_
      .filter(f => f.isFile && rx.pattern.matcher(f.getName).matches())
      .flatMap(f => artifactRound(f.getName).filter(_ < belowRound).map(_ -> f))
      .sortBy(_._1).lastOption.map(_._2.getPath))
  }

  /** Given a driver `BENCH_r{N}.json` path, prefer the engine's own
    * complete sibling `bench_full_r{N}.json` when present: the driver
    * artifact keeps only the TAIL of stdout (per-query stats for ~1
    * query survive truncation), while the full artifact Bench writes to
    * cwd carries every query's stats. Non-BENCH paths pass through.
    */
  private[graft] def resolvePreferFull(path: String): String = {
    val f = new java.io.File(path)
    val m = """BENCH_r(\d+)\.json""".r.findFirstMatchIn(f.getName)
    m.map { mm =>
      val full = new java.io.File(f.getParentFile, s"bench_full_r${mm.group(1)}.json")
      if (full.isFile) full.getPath else path
    }.getOrElse(path)
  }

  /** Load + extract + parse one bench artifact/stdout file: per-query
    * medians, reported total, stream stanza. A driver `BENCH_r{N}.json`
    * is transparently upgraded to its complete `bench_full_r{N}.json`
    * sibling when one exists (see [[resolvePreferFull]]).
    */
  private[graft] def loadFile(path: String)
      : (Map[String, Double], Option[Double], Option[String]) = {
    val resolved = resolvePreferFull(path)
    val raw = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(resolved)), "UTF-8")
    val text = extractText(raw)
    (parseQueries(text), parseTotal(text),
      StreamStanza.findFirstMatchIn(text).map(_.group(1)))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BenchDiff <a.json> <b.json>")
    val (qa, ta, sa) = loadFile(args(0))
    val (qb, tb, sb) = loadFile(args(1))

    val common = (qa.keySet & qb.keySet).toSeq
    val rows = common.map { k =>
      val (a, b) = (qa(k), qb(k))
      (k, a, b, if (a > 0) b / a else Double.PositiveInfinity)
    }.sortBy(-_._4)
    println(f"${"query"}%-34s ${"a_sec"}%9s ${"b_sec"}%9s ${"b/a"}%7s")
    rows.foreach { case (k, a, b, r) =>
      val flag = if (r >= 1.25) "  <-- regressed" else if (r <= 0.8) "  (faster)" else ""
      println(f"$k%-34s $a%9.3f $b%9.3f $r%7.2f$flag")
    }
    val onlyA = (qa.keySet -- qb.keySet).toSeq.sorted
    val onlyB = (qb.keySet -- qa.keySet).toSeq.sorted
    if (onlyA.nonEmpty) println(s"only in a (${onlyA.size}): ${onlyA.mkString(", ")}")
    if (onlyB.nonEmpty) println(s"only in b (${onlyB.size}): ${onlyB.mkString(", ")}")
    val (ca, cb) = (rows.map(_._2).sum, rows.map(_._3).sum)
    println(f"common-subset total: a=$ca%.2f s  b=$cb%.2f s  b/a=${if (ca > 0) cb / ca else 0.0}%.2f (${rows.size} queries)")
    (ta, tb) match {
      case (Some(x), Some(y)) => println(f"reported totals:     a=$x%.2f s  b=$y%.2f s")
      case _ => println(s"reported totals:     a=${ta.fold("?")(x => f"$x%.2f")} s  b=${tb.fold("?")(x => f"$x%.2f")} s")
    }
    (sa, sb) match {
      case (Some(x), Some(y)) => println(s"stream a: $x\nstream b: $y")
      case _ => ()
    }
  }
}
