package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.RatingsOps

/** The reference pipeline's derived relations (SURVEY.md §0/§2), run as
  * batch analogs over the driver corpus so the DuckDB oracle can verify
  * them (SURVEY.md §5.3): `events` plays the ratings stream
  * (event_type↔CHANNEL, value↔STARS, props↔MESSAGE), `customer` plays the
  * CDC dimension table (c_mktsegment↔club_status). The same RatingsOps
  * plans run in streaming mode in graft.streaming.
  *
  * Reference test-analog filter: the corpus has no channel containing
  * "test", so the live/test split uses '%err%' (event_type 'error'),
  * preserving the LIKE-on-LCASE shape of ksqldb-statements.sql:13–17.
  */
object ParityQueries {

  private val testPattern = "%err%"
  private val unhappyStars = 50.0
  private val platinum = "BUILDING" // corpus analog of club_status='platinum'

  /** events → canonical ratings shape (FIXTURES.md §A1). */
  def ratings(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id").as("RATING_ID"),
      col("user_id").cast("int").as("USER_ID"),
      col("value").as("STARS"),
      col("event_type").as("CHANNEL"),
      col("props").as("MESSAGE"),
      col("ts"))

  /** customer → canonical customers dimension shape (FIXTURES.md §A2). */
  def customers(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").cast("int").as("id"),
      col("c_name").as("first_name"),
      col("c_mktsegment").as("last_name"),
      concat(lower(col("c_name")), lit("@acme.test")).as("email"),
      col("c_mktsegment").as("club_status"))

  def enriched(s: SparkSession, d: String): DataFrame =
    RatingsOps.enrich(ratings(s, d), customers(s, d))

  private def lc(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** Date-partitioned copy of the ratings shape for the pruned dashboard
    * variant: written once per (JVM warehouse, sf dir). The corpus is
    * immutable and the warehouse per-JVM, so an existing _SUCCESS marker
    * skips the rewrite — the bench then measures the pruned READ, not a
    * repeated one-time layout job.
    */
  def datePartitionedRatings(s: SparkSession, d: String): String =
    // the warehouse is per-JVM (Sessions), so a JVM-local lock closes the
    // check-then-write race between concurrent in-process callers
    synchronized {
      val dir = s"${s.conf.get("spark.sql.warehouse.dir")}/ratings_by_date_" +
        d.replaceAll("[^A-Za-z0-9.]", "_")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")))
        graft.core.Layout.writeDatePartitioned(ratings(s, d), dir, "ts")
      dir
    }

  // Shared oracle CTE prelude mirroring the adapters above.
  private val prelude = ParityOracle.prelude

  val defs: Seq[QueryDef] = Seq(

    // P5+P8+P12: derived filtered stream, not-test split.
    QueryDef("p_ratings_live",
      prelude +
        """SELECT rating_id, user_id, stars, channel, message, ts
          |FROM ratings WHERE lower(channel) NOT LIKE '%err%'
          |ORDER BY rating_id""".stripMargin) { (s, d) =>
      lc(RatingsOps.live(ratings(s, d), testPattern))
    }.sortedBy(col("rating_id")),

    // P12 complement.
    QueryDef("p_ratings_test",
      prelude +
        """SELECT rating_id, user_id, stars, channel, message, ts
          |FROM ratings WHERE lower(channel) LIKE '%err%'
          |ORDER BY rating_id""".stripMargin) { (s, d) =>
      lc(RatingsOps.test(ratings(s, d), testPattern))
    }.sortedBy(col("rating_id")),

    // J1: the enrichment join (stream–table LEFT JOIN on expression key).
    QueryDef("p_enrich_join",
      prelude +
        """SELECT rating_id, message, stars, channel, customer_id,
          |       full_name, club_status, email, ts
          |FROM enriched ORDER BY rating_id""".stripMargin) { (s, d) =>
      lc(enriched(s, d))
    }.sortedBy(col("rating_id")),

    // P9+P10+P11: UNHAPPY_PLATINUM_CUSTOMERS.
    QueryDef("p_unhappy_platinum",
      prelude +
        s"""SELECT full_name, club_status, email, stars, message, rating_id, ts
           |FROM enriched
           |WHERE stars < $unhappyStars AND club_status = '$platinum'
           |ORDER BY rating_id""".stripMargin) { (s, d) =>
      lc(RatingsOps.unhappyPlatinum(enriched(s, d), unhappyStars, platinum))
    }.sortedBy(col("rating_id")),

    // A2: tumbling 15-min window per customer; COLLECT_LIST surfaced as a
    // canonical comma-joined sorted string so the hash compare is
    // representation-independent.
    QueryDef("p_ratings_per_customer_15min",
      prelude +
        """SELECT make_timestamp((floor(epoch(ts) / 900) * 900)::BIGINT * 1000000) AS window_start,
          |       full_name,
          |       count(*) AS ratings_count,
          |       string_agg(CAST(rating_id AS VARCHAR), ',' ORDER BY rating_id) AS rating_ids,
          |       CAST(sum(CAST(round(stars * 100) AS BIGINT)) AS BIGINT) AS stars_cents
          |FROM enriched
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      enriched(s, d)
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("FULL_NAME"))
        .agg(
          count(lit(1)).as("ratings_count"),
          array_join(transform(sort_array(collect_list(col("RATING_ID"))),
            x => x.cast("string")), ",").as("rating_ids"),
          sum(round(col("STARS") * 100).cast("long")).as("stars_cents"))
        .select(col("w.start").as("window_start"), col("FULL_NAME").as("full_name"),
          col("ratings_count"), col("rating_ids"), col("stars_cents"))
    }.sortedBy(col("window_start"), col("full_name")),

    // A1: tumbling 1-min COUNT per club_status.
    QueryDef("p_ratings_by_club_status_1min",
      prelude +
        """SELECT make_timestamp((floor(epoch(ts) / 60) * 60)::BIGINT * 1000000) AS window_start,
          |       club_status, count(*) AS rating_count
          |FROM enriched GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      lc(RatingsOps.byClubStatus1min(enriched(s, d)))
    }.sortedBy(col("window_start"), col("club_status")),

    // A6+A7: median metric under a date_histogram × terms split.
    QueryDef("p_median_stars",
      prelude +
        """SELECT date_trunc('day', ts) AS day, club_status,
          |       median(stars) AS median_stars
          |FROM enriched GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      lc(RatingsOps.medianStarsByStatus(enriched(s, d)))
    }.sortedBy(col("day"), col("club_status")),

    // A8: terms top-5 with deterministic tiebreak.
    QueryDef("p_top5_channels",
      prelude +
        """SELECT channel, count(*) AS doc_count FROM ratings
          |GROUP BY 1 ORDER BY doc_count DESC, channel ASC LIMIT 5""".stripMargin) { (s, d) =>
      lc(RatingsOps.top5Terms(ratings(s, d), "CHANNEL"))
    },

    // A7: date_histogram (hour).
    QueryDef("p_date_histogram_hour",
      prelude +
        """SELECT date_trunc('hour', ts) AS bucket, count(*) AS doc_count
          |FROM ratings GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      lc(RatingsOps.dateHistogram(ratings(s, d), "ts", "hour"))
    }.sortedBy(col("bucket")),

    // A9: trailing dashboard window anchored at max event time
    // (6h instead of the dashboard's 15min so every scale factor has rows).
    QueryDef("p_recent_window",
      prelude +
        """SELECT rating_id, user_id, stars, channel, ts FROM ratings
          |WHERE ts >= (SELECT max(ts) FROM ratings) - INTERVAL 360 MINUTE
          |ORDER BY rating_id""".stripMargin) { (s, d) =>
      lc(RatingsOps.recentWindow(ratings(s, d), "ts", 360))
        .select("rating_id", "user_id", "stars", "channel", "ts")
    }.sortedBy(col("rating_id")),

    // A9 scale variant: the SAME trailing window over a DATE-PARTITIONED
    // store with a literal anchor — the executed plan prunes at the file
    // listing (PartitionFilters on p_date, proven in LayoutSpec), where
    // p_recent_window's subquery anchor must scan every partition.
    // Shares p_recent_window's oracle: results must be identical.
    QueryDef("p_recent_window_pruned",
      prelude +
        """SELECT rating_id, user_id, stars, channel, ts FROM ratings
          |WHERE ts >= (SELECT max(ts) FROM ratings) - INTERVAL 360 MINUTE
          |ORDER BY rating_id""".stripMargin) { (s, d) =>
      lc(graft.core.Layout.recentWindowPruned(s, datePartitionedRatings(s, d),
        "ts", 360))
        .select("rating_id", "user_id", "stars", "channel", "ts")
    }.sortedBy(col("rating_id")),

    // A3: windowed-table pull query — materialize the 15-min table, then a
    // key+window-range point lookup.
    QueryDef("p_pull_query_windowed",
      prelude +
        """SELECT make_timestamp((floor(epoch(ts) / 900) * 900)::BIGINT * 1000000) AS window_start,
          |       full_name, count(*) AS ratings_count
          |FROM enriched
          |WHERE full_name LIKE 'Customer#000000002%'
          |GROUP BY 1, 2
          |HAVING window_start > TIMESTAMP '2024-01-05 00:00:00'
          |ORDER BY 1""".stripMargin) { (s, d) =>
      RatingsOps.perCustomer15min(enriched(s, d))
        .filter(col("FULL_NAME").like("Customer#000000002%") &&
          col("WINDOW_START") > lit("2024-01-05 00:00:00").cast("timestamp"))
        .select(col("WINDOW_START").as("window_start"),
          col("FULL_NAME").as("full_name"),
          col("RATINGS_COUNT").as("ratings_count"))
    }.sortedBy(col("window_start")),

    // P4: TIMESTAMPTOSTRING(ROWTIME, fmt) (README.md:238) — the engine's
    // timestampToString over epoch millis, verified against strftime.
    QueryDef("p_timestamp_format",
      prelude +
        """SELECT rating_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
          |FROM ratings ORDER BY rating_id""".stripMargin) { (s, d) =>
      ratings(s, d).select(
        col("RATING_ID").as("rating_id"),
        graft.functions.timestampToString(
          // cast-before-unix_micros: identical for TimestampType, and
          // keeps the query alive if `ts` arrives as TIMESTAMP_NTZ
          // (unix_micros on raw NTZ is an analysis error — round 12)
          expr("unix_micros(cast(ts as timestamp)) div 1000"),
          "yyyy-MM-dd HH:mm:ss").as("ts_str"))
    }.sortedBy(col("rating_id")),

    // ksqlDB EXTRACTJSONFIELD over the JSON-string payload column
    // (events.props, TESTDATA.md) — ksqlDB's scalar JSON surface on the
    // shape the reference's rating MESSAGE would carry if structured.
    // STRING-returning extract + explicit cast, both engines.
    QueryDef("p_json_extract",
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(col("event_id"),
        graft.functions.extractJsonField(col("props"), "$.k")
          .cast("long").as("k"))
    }.sortedBy(col("event_id")),

    // L3: PARTITION BY re-key (physical repartition on the Spark side; the
    // oracle checks content invariance).
    QueryDef("p_rekey_by_name",
      prelude +
        s"""SELECT full_name, rating_id FROM enriched
           |WHERE stars < $unhappyStars AND club_status = '$platinum'
           |ORDER BY rating_id""".stripMargin) { (s, d) =>
      lc(RatingsOps.rekey(
          RatingsOps.unhappyPlatinum(enriched(s, d), unhappyStars, platinum),
          "FULL_NAME"))
        .select("full_name", "rating_id")
    }.sortedBy(col("rating_id"))
  )
}

/** The oracle-side CTE prelude shared by every query family that builds
  * on the ratings/customers/enriched adapter relations (ParityQueries,
  * PipelineQueries): events→ratings shape, customer→customers dimension,
  * and the reference enrichment join (ksqldb-statements.sql:50–60).
  */
object ParityOracle {
  val prelude: String =
    """WITH ratings AS (
      |  SELECT event_id AS rating_id, CAST(user_id AS INT) AS user_id,
      |         value AS stars, event_type AS channel, props AS message, ts
      |  FROM events
      |), customers AS (
      |  SELECT CAST(c_custkey AS INT) AS id, c_name AS first_name,
      |         c_mktsegment AS last_name,
      |         lower(c_name) || '@acme.test' AS email,
      |         c_mktsegment AS club_status
      |  FROM customer
      |), enriched AS (
      |  SELECT r.rating_id, r.message, r.stars, r.channel,
      |         CAST(c.id AS VARCHAR) AS customer_id,
      |         c.first_name || ' ' || c.last_name AS full_name,
      |         c.club_status, c.email, r.ts
      |  FROM ratings r LEFT JOIN customers c
      |    ON CAST(r.user_id AS VARCHAR) = CAST(c.id AS VARCHAR)
      |  WHERE c.first_name IS NOT NULL
      |)
      |""".stripMargin
}
