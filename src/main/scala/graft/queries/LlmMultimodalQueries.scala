package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Multimodal media dedup, perceptual near-dup and metadata queries.
  * Split out of the monolithic LlmQueries registry (round 20); order
  * and semantics unchanged — [[LlmQueries.defs]] concatenates the
  * families in the original sequence.
  */
private[graft] object LlmMultimodalQueries {
  import LlmOracle._
  import LlmShared._

  val defs: Seq[QueryDef] = Seq(
    // ── Multimodal columns ─────────────────────────────────────────
    // ── Acoustic fingerprint (PCM energy-delta contour) ────────────
    // Payload bytes as 8-bit PCM: 16-sample frames, exact integer
    // energy Σs², 60 energy-rise bits — the native PcmFingerprint
    // expression; the oracle replays the identical arithmetic with
    // nested DuckDB list lambdas over the same bytes (ASCII corpus:
    // char ord == byte, the polyhash oracle's standing assumption).
    QueryDef("t_audio_fingerprint",
      s"""WITH ab AS (SELECT doc_id, coalesce(text, '') AS s
         |  FROM documents),
         |ae AS (SELECT doc_id, length(s) AS n,
         |  list_transform(generate_series(0, ((length(s)+15)//16)-1),
         |    f -> list_sum(list_transform(
         |      generate_series(f*16+1, least(f*16+16, length(s))),
         |      i -> CAST(ord(substring(s, i, 1)) AS BIGINT)
         |           * CAST(ord(substring(s, i, 1)) AS BIGINT)))) AS es
         |  FROM ab)
         |SELECT doc_id AS media_id,
         |  CAST((n + 15) // 16 AS BIGINT) AS n_frames,
         |  CAST(coalesce(list_sum(list_transform(
         |    generate_series(1, least((n+15)//16 - 1, 60)),
         |    f -> CASE WHEN es[f+1] > es[f]
         |         THEN (CAST(1 AS BIGINT) << (f-1))
         |         ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS audio_fp
         |FROM ae ORDER BY media_id""".stripMargin) { (s, d) =>
      graft.ext.Multimodal.audioFingerprint(
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text",
          mediaType = "audio/pcm"))
    }.sortedBy(col("media_id")),

    // Acoustic near-dup: tail-edited re-encodes PLANTED for real (4
    // appended samples on every doc_id < 20 under a shifted id — the
    // contour disturbs by <= 2 bits, inside the Hamming-3 ball), then
    // the full guarded machinery: collapse -> C(8,5) combo banding ->
    // capped buckets -> bit_count verify -> member expansion.
    QueryDef("t_audio_neardup", {
      val esExpr =
        s"""list_transform(generate_series(0, ((length(s)+15)//16)-1),
           |    f -> list_sum(list_transform(
           |      generate_series(f*16+1, least(f*16+16, length(s))),
           |      i -> CAST(ord(substring(s, i, 1)) AS BIGINT)
           |           * CAST(ord(substring(s, i, 1)) AS BIGINT))))""".stripMargin
      s"""WITH am AS (
         |  SELECT doc_id AS media_id, coalesce(text, '') AS s FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, coalesce(text, '') || 'zzzz'
         |  FROM documents WHERE doc_id < 20),
         |ae AS (SELECT media_id, length(s) AS n, $esExpr AS es FROM am),
         |u AS (SELECT media_id,
         |  CAST(coalesce(list_sum(list_transform(
         |    generate_series(1, least((n+15)//16 - 1, 60)),
         |    f -> CASE WHEN es[f+1] > es[f]
         |         THEN (CAST(1 AS BIGINT) << (f-1))
         |         ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS dh
         |  FROM ae),
         |ugrp AS (SELECT dh, min(media_id) AS rep FROM u GROUP BY dh),
         |umem AS (SELECT u.media_id, g.rep, u.dh
         |         FROM u JOIN ugrp g ON u.dh = g.dh),
         |ubands AS (
         |  SELECT g.rep AS media_id, c.band,
         |         ${simhashComboKeyExpr("g.dh", 8, 5)} AS bkey
         |  FROM ugrp g CROSS JOIN (VALUES
         |    ${simhashComboValues(8, 5)}) c(band, b0, b1, b2, b3, b4)
         |  QUALIFY count(*) OVER (PARTITION BY c.band, bkey)
         |    <= ${Dedup.DefaultMaxBucketWidth}),
         |ucand AS (SELECT DISTINCT a.media_id AS ma, b.media_id AS mb
         |  FROM ubands a JOIN ubands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.media_id < b.media_id),
         |urp AS (
         |  SELECT c.ma, c.mb, bit_count(xor(ga.dh, gb.dh)) AS hamming
         |  FROM ucand c
         |  JOIN ugrp ga ON ga.rep = c.ma
         |  JOIN ugrp gb ON gb.rep = c.mb
         |  WHERE bit_count(xor(ga.dh, gb.dh)) <= 3),
         |upairs AS (
         |  SELECT least(ma2.media_id, mb2.media_id) AS media_a,
         |         greatest(ma2.media_id, mb2.media_id) AS media_b, p.hamming
         |  FROM urp p
         |  JOIN umem ma2 ON ma2.rep = p.ma
         |  JOIN umem mb2 ON mb2.rep = p.mb
         |  UNION ALL
         |  SELECT a.media_id, b.media_id, 0
         |  FROM umem a JOIN umem b
         |    ON a.rep = b.rep AND a.media_id < b.media_id)
         |SELECT media_a, media_b, CAST(hamming AS BIGINT) AS hamming
         |FROM upairs ORDER BY media_a, media_b""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val media = Multimodal.asMedia(docs, "doc_id", "text",
        mediaType = "audio/pcm")
      val edited = Multimodal.asMedia(
        docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(coalesce(col("text"), lit("")), lit("zzzz")).as("text")),
        "doc_id", "text", mediaType = "audio/pcm")
      Multimodal.nearDupAudioPairs(media.union(edited))
    }.sortedBy(col("media_a"), col("media_b")),

    QueryDef("t_multimodal_meta",
      s"""SELECT doc_id AS media_id,
         |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |       md5(text) AS content_md5,
         |       ${polyhash("text")} % 1280 AS width,
         |       ${polyhash("text")} % 720 AS height,
         |       CAST(octet_length(encode(text)) % 32 + 1 AS BIGINT) AS n_frames
         |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.metadata(
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"))
    }.sortedBy(col("media_id"))
  )
}
