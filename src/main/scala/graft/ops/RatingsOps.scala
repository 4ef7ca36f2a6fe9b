package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.fullName

/** The reference topology's derived relations (SURVEY.md §0 diagram),
  * expressed over the canonical ratings/customers shapes (FIXTURES.md §A):
  *
  *   ratings:   RATING_ID, USER_ID, STARS, CHANNEL, MESSAGE, ts
  *   customers: id, first_name, last_name, email, club_status, ...
  *
  * Each function is one ksqlDB statement from
  * /root/reference/ksqldb-statements.sql re-expressed as declarative
  * DataFrame logic: Catalyst gets whole plans (filter → join → agg), so
  * pushdown/pruning/broadcast come free (SURVEY.md §4). The same
  * functions run over batch DataFrames and streaming DataFrames —
  * structured streaming reuses the identical plan shapes
  * (graft.streaming.RatingsPipeline).
  */
object RatingsOps {

  /** RATINGS_LIVE: `WHERE LCASE(CHANNEL) NOT LIKE '%test%'`
    * (ksqldb-statements.sql:13–14). P5+P8 in SURVEY §2.3.
    */
  def live(ratings: DataFrame, testPattern: String = "%test%"): DataFrame =
    ratings.filter(!lower(col("CHANNEL")).like(testPattern))

  /** RATINGS_TEST: the complementary split (ksqldb-statements.sql:16–17). */
  def test(ratings: DataFrame, testPattern: String = "%test%"): DataFrame =
    ratings.filter(lower(col("CHANNEL")).like(testPattern))

  /** RATINGS_WITH_CUSTOMER_DATA (ksqldb-statements.sql:50–60): stream–table
    * LEFT OUTER equi-join on an *expression* key — `CAST(R.USER_ID AS
    * STRING) = C.CUSTOMER_ID` — then the 8-column projection with
    * FULL_NAME concat, then `WHERE C.FIRST_NAME IS NOT NULL` (which makes
    * the outer join inner in effect; kept as written for parity).
    *
    * Scale note: the customers side is a dimension table (20 rows in the
    * reference; 150–15k in the corpus) — Catalyst broadcast-hash-joins it,
    * so unlike ksqlDB's internal repartition topic there is NO shuffle of
    * the fact stream at any scale. We add an explicit `broadcast` hint so
    * the plan survives even when dim-side size estimates are off.
    * `broadcastDim = false` is the escape hatch for a customers side too
    * large to build on the driver (e.g. a full CDC snapshot): the hint is
    * dropped and AQE picks shuffled-hash/sort-merge from runtime sizes.
    */
  def enrich(ratings: DataFrame, customers: DataFrame,
             dropUnmatched: Boolean = true,
             broadcastDim: Boolean = true): DataFrame = {
    val r = ratings.alias("r")
    val c0 = customers.alias("c")
    val c = if (broadcastDim) broadcast(c0) else c0
    val joined = r.join(
      c,
      col("r.USER_ID").cast("string") === col("c.id").cast("string"),
      "left_outer")
    val projected = joined.select(
      col("r.RATING_ID").as("RATING_ID"),
      col("r.MESSAGE").as("MESSAGE"),
      col("r.STARS").as("STARS"),
      col("r.CHANNEL").as("CHANNEL"),
      col("c.id").cast("string").as("CUSTOMER_ID"),
      fullName(col("c.first_name"), col("c.last_name")).as("FULL_NAME"),
      col("c.club_status").as("CLUB_STATUS"),
      col("c.email").as("EMAIL"),
      col("r.ts").as("ts"))
    if (dropUnmatched) projected.filter(col("FULL_NAME").isNotNull)
    else projected
  }

  /** UNHAPPY_PLATINUM_CUSTOMERS (ksqldb-statements.sql:62–68):
    * `WHERE STARS < 3 AND CLUB_STATUS = 'platinum'` over the enriched
    * stream, projecting the alert payload columns. The reference also
    * re-keys with `PARTITION BY FULL_NAME`; in batch that is a physical
    * placement concern — see [[rekey]].
    */
  def unhappyPlatinum(enriched: DataFrame,
                      starsBelow: Double = 3.0,
                      status: String = "platinum"): DataFrame =
    enriched
      .filter(col("STARS") < starsBelow && col("CLUB_STATUS") === status)
      .select("FULL_NAME", "CLUB_STATUS", "EMAIL", "STARS", "MESSAGE", "RATING_ID", "ts")

  /** `PARTITION BY FULL_NAME` (ksqldb-statements.sql:68, L3): re-key the
    * relation so downstream consumers see key-partitioned data. In Spark
    * this is `repartition(key)` — an explicit hash exchange — plus the key
    * column first, mirroring a Kafka message key.
    */
  def rekey(df: DataFrame, key: String): DataFrame =
    df.repartition(col(key))

  /** RATINGS_PER_CUSTOMER_PER_15MINUTE (ksqldb-statements.sql:88–93):
    * tumbling 15-min window per FULL_NAME with COUNT(*) and
    * COLLECT_LIST(STARS). A2 in SURVEY §2.5. `collect_list` order is
    * nondeterministic under parallelism, so we expose the sorted form —
    * same multiset, stable for verification.
    */
  def perCustomer15min(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("FULL_NAME"))
      .agg(count(lit(1)).as("RATINGS_COUNT"),
           sort_array(collect_list(col("RATING_ID"))).as("RATING_IDS"))
      .select(col("w.start").as("WINDOW_START"), col("FULL_NAME"),
              col("RATINGS_COUNT"), col("RATING_IDS"))

  /** RATINGS_BY_CLUB_STATUS (README.md:333–353): tumbling 1-min COUNT per
    * CLUB_STATUS. A1 in SURVEY §2.5.
    */
  def byClubStatus1min(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(window(col("ts"), "1 minute").as("w"), col("CLUB_STATUS"))
      .agg(count(lit(1)).as("RATING_COUNT"))
      .select(col("w.start").as("WINDOW_START"), col("CLUB_STATUS"),
              col("RATING_COUNT"))

  // ── Kibana-side aggregations the pipeline feeds (SURVEY §2.5 A5–A9) ──

  /** A6: median STARS per CLUB_STATUS per day bucket
    * (docker-compose.yml:326 — percentiles[50] × date_histogram × terms).
    * Exact median (Kibana's is approximate; SURVEY notes exact acceptable).
    */
  def medianStarsByStatus(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(date_trunc("day", col("ts")).as("DAY"), col("CLUB_STATUS"))
      .agg(median(col("STARS")).as("MEDIAN_STARS"))

  /** A7: date_histogram — event count per fixed bucket. */
  def dateHistogram(df: DataFrame, ts: String, bucket: String): DataFrame =
    df.groupBy(date_trunc(bucket, col(ts)).as("BUCKET"))
      .agg(count(lit(1)).as("DOC_COUNT"))

  /** A8: terms top-5 — group, count, order desc-by-count (term asc as
    * deterministic tiebreak), limit 5. Catalyst plans sort+limit as
    * TakeOrderedAndProject — no global sort materialization.
    */
  def top5Terms(df: DataFrame, term: String): DataFrame =
    df.groupBy(col(term))
      .agg(count(lit(1)).as("DOC_COUNT"))
      .orderBy(col("DOC_COUNT").desc, col(term).asc)
      .limit(5)

  /** A9: "last 15 minutes of events" dashboard window (README.md:315),
    * anchored to the max event time so it is deterministic over a static
    * corpus. The anchor is computed as a scalar aggregate and joined in
    * (crossJoin of a 1-row frame — broadcast, no shuffle).
    */
  def recentWindow(df: DataFrame, ts: String, minutes: Int): DataFrame = {
    val anchor = df.agg(max(col(ts)).as("MAX_TS"))
    df.crossJoin(broadcast(anchor))
      .filter(col(ts) >= col("MAX_TS") - expr(s"INTERVAL $minutes MINUTES"))
      .drop("MAX_TS")
  }
}
