package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{ChangelogDim, ManifestStore}

object ManifestStoreSpec {
  val joined = new ConcurrentLinkedQueue[(Int, String)]()
}

/** Transactional dim store: atomic manifest commits, snapshot-pinned
  * readers, tombstones, replay idempotence, compaction — plus the
  * contrast case showing why the raw dynamic-overwrite store needed it.
  */
class ManifestStoreSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("reader pins a committed snapshot; concurrent upserts never tear it (raw store breaks)") {
    import spark.implicits._
    val dim = (1 to 20).map(i => (i, s"name$i", s"tier${i % 4}"))
      .toDF("id", "name", "tier")

    // manifest store: a pinned read survives any number of commits
    val mdir = tmp("mstore")
    ManifestStore.seed(dim, "id", mdir)
    val pinned = ManifestStore.read(spark, mdir, "id")
    ManifestStore.upsert(Seq((5, "NEW5", "tierX")).toDF("id", "name", "tier"), "id", mdir)
    ManifestStore.upsert(Seq((7, "NEW7", "tierY")).toDF("id", "name", "tier"), "id", mdir)
    val snap = pinned.collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(snap(5) == "name5" && snap(7) == "name7" && snap.size == 20,
      "pinned plan must read the version it pinned, untorn")
    val fresh = ManifestStore.read(spark, mdir, "id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(fresh(5) == "NEW5" && fresh(7) == "NEW7" && fresh.size == 20)

    // raw store: the same sequence leaves the pinned listing pointing at
    // files the dynamic partition overwrite deleted
    val rdir = tmp("rawstore")
    ChangelogDim.seed(dim, "id", rdir)
    val rawPinned = spark.read.parquet(rdir)
    ChangelogDim.upsert(Seq((5, "NEW5", "tierX")).toDF("id", "name", "tier"), "id", rdir)
    val torn = intercept[Throwable] { rawPinned.collect() }
    assert(torn.toString.toLowerCase.contains("file") || torn.getCause != null,
      s"raw store read over a replaced partition must fail: $torn")
  }

  test("commit race: the second writer of one version fails loudly, never silently overwrites") {
    import spark.implicits._
    val dir = tmp("mstore-race")
    ManifestStore.seed(Seq((1, "a")).toDF("id", "v"), "id", dir)
    // two writers race version 2: the winner's commit sticks
    ManifestStore.commit(spark, dir,
      ManifestStore.Manifest(2L, ManifestStore.latestManifest(spark, dir).get.dirs))
    val loser = intercept[IllegalStateException] {
      ManifestStore.commit(spark, dir, ManifestStore.Manifest(2L, Nil))
    }
    assert(loser.getMessage.contains("commit race"))
    // the winner's manifest content is intact (the loser's Nil list
    // would have emptied the store had rename silently replaced it)
    assert(ManifestStore.latestManifest(spark, dir).get.dirs.nonEmpty)
  }

  test("tombstones delete, re-inserts resurrect, epoch replay is idempotent in effect") {
    import spark.implicits._
    val dir = tmp("mstore-del")
    ManifestStore.seed((1 to 5).map(i => (i, s"v$i")).toDF("id", "v"), "id", dir)
    // delete id=3 via tombstone
    ManifestStore.applyChanges(
      Seq((3, null: String, "d")).toDF("id", "v", "__op"), "id", dir)
    def state(): Map[Int, String] = ManifestStore.read(spark, dir, "id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(state() == Map(1 -> "v1", 2 -> "v2", 4 -> "v4", 5 -> "v5"))
    // re-insert resurrects
    val reinsert = Seq((3, "v3b")).toDF("id", "v")
    ManifestStore.upsert(reinsert, "id", dir)
    val afterReinsert = state()
    assert(afterReinsert(3) == "v3b" && afterReinsert.size == 5)
    // replaying the same change batch (epoch replay) recommits identical
    // rows: a new version, the same merged view
    val vBefore = ManifestStore.latestManifest(spark, dir).get.version
    ManifestStore.upsert(reinsert, "id", dir)
    assert(state() == afterReinsert)
    assert(ManifestStore.latestManifest(spark, dir).get.version == vBefore + 1)
  }

  test("compact folds history to one dir; vacuum removes unreferenced files; view unchanged") {
    import spark.implicits._
    val dir = tmp("mstore-compact")
    ManifestStore.seed((1 to 10).map(i => (i, i * 10)).toDF("id", "x"), "id", dir)
    (1 to 5).foreach(i => ManifestStore.upsert(Seq((i, i * 100)).toDF("id", "x"), "id", dir))
    ManifestStore.applyChanges(Seq((10, 0, "d")).toDF("id", "x", "__op"), "id", dir)
    val before = rows(ManifestStore.read(spark, dir, "id"))
    ManifestStore.compact(spark, dir, "id")
    assert(ManifestStore.latestManifest(spark, dir).get.dirs.size == 1)
    assert(rows(ManifestStore.read(spark, dir, "id")) == before)
    ManifestStore.vacuum(spark, dir)
    val left = new java.io.File(dir).listFiles().map(_.getName)
    assert(left.count(_.startsWith("d-")) == 1, left.mkString(","))
    assert(left.count(_.startsWith("_manifest")) == 1, left.mkString(","))
    assert(rows(ManifestStore.read(spark, dir, "id")) == before)
  }

  test("vacuum retention floor protects pinned readers; in-flight writer dir is never deleted") {
    import spark.implicits._
    val dir = tmp("mstore-vac")
    ManifestStore.seed((1 to 5).map(i => (i, i)).toDF("id", "x"), "id", dir) // v1
    ManifestStore.upsert(Seq((1, 100)).toDF("id", "x"), "id", dir) // v2
    val pinned = ManifestStore.read(spark, dir, "id") // pins v2 → dirs {d1, d2}
    ManifestStore.compact(spark, dir, "id") // v3 → one fresh dir
    // a racing writer's in-flight dir: version ahead of the committed head
    new java.io.File(dir, "d-9-inflight").mkdirs()
    ManifestStore.vacuum(spark, dir, minVersionsToKeep = 2)
    // floor = v2: its dirs survive, so the pinned reader still evaluates
    assert(pinned.collect().map(r => (r.getInt(0), r.getInt(1))).toMap ==
      Map(1 -> 100, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5))
    val kept = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(kept.exists(_.startsWith("d-9-")), s"in-flight dir deleted: $kept")
    // eager vacuum reclaims the pre-compaction dirs — but never the
    // in-flight dir (its version is still ahead of the head)
    ManifestStore.vacuum(spark, dir, minVersionsToKeep = 1)
    val after = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(after.exists(_.startsWith("d-9-")), s"in-flight dir deleted: $after")
    assert(after.count(n => n.startsWith("d-") && !n.startsWith("d-9-")) == 1,
      after.mkString(","))
    assert(after.count(_.startsWith("_manifest")) == 1, after.mkString(","))
    assert(ManifestStore.read(spark, dir, "id").count() == 5)
    intercept[IllegalArgumentException] {
      ManifestStore.vacuum(spark, dir, minVersionsToKeep = 0)
    }
  }

  test("CDC envelopes drive the transactional store: upserts, tombstones, same-ms ordering, one commit per batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = tmp("mstore-cdc")
    ManifestStore.seed(customersDf, "id", dir) // ids 1..20

    val ms = MemoryStream[CdcCust]
    val after = struct(col("id"), col("first_name"), col("last_name"),
      col("email"), col("club_status"))
    val envelopes = ms.toDF().select(struct(
      lit(null).cast(customersDf.schema).as("before"),
      after.as("after"), col("op"), col("ts_ms")).as("value"))
    val q = ManifestStore.maintainCdc(envelopes, col("value"), "id", dir,
      tmp("ck-cdc"))
    def state() = ManifestStore.read(spark, dir, "id")
    try {
      // update #1 and tombstone #2 in ONE batch → one atomic commit
      val v0 = ManifestStore.latestManifest(spark, dir).get.version
      ms.addData(
        CdcCust("u", 1, "Rick", "Astley", "r@x.test", "platinum", 100L),
        CdcCust("d", 2, "Gone", "Gone", "g@x.test", "gold", 101L))
      q.processAllAvailable()
      assert(ManifestStore.latestManifest(spark, dir).get.version == v0 + 1)
      assert(state().count() == 19)
      assert(state().filter(col("id") === 1).select("first_name")
        .collect().head.getString(0) == "Rick")
      assert(state().filter(col("id") === 2).isEmpty)
      // re-insert resurrects the key
      ms.addData(CdcCust("c", 2, "Back", "Again", "b@x.test", "gold", 102L))
      q.processAllAvailable()
      assert(state().filter(col("id") === 2).select("first_name")
        .collect().head.getString(0) == "Back")
      // same-millisecond update-then-delete: arrival order wins
      ms.addData(
        CdcCust("u", 5, "Same", "Milli", "m@x.test", "gold", 200L),
        CdcCust("d", 5, "Same", "Milli", "m@x.test", "gold", 200L))
      q.processAllAvailable()
      assert(state().filter(col("id") === 5).isEmpty)
    } finally q.stop()
  }

  test("maintain with compactEvery folds merge-on-read history; merged view and vacuum floor intact") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = tmp("mstore-cad")
    ManifestStore.seed(
      Seq((1, "bronze"), (2, "silver")).toDF("id", "tier"), "id", dir)
    val ms = MemoryStream[(Int, String, java.sql.Timestamp)]
    val q = ManifestStore.maintain(
      ms.toDF().toDF("id", "tier", "uts"), "id", "uts", dir, tmp("ck-cad"),
      compactEvery = 3)
    try {
      val sizes = (1 to 8).map { i =>
        ms.addData((1, s"t$i", ts(s"2024-01-01 10:00:0$i")))
        q.processAllAvailable()
        ManifestStore.latestManifest(spark, dir).get.dirs.size
      }
      assert(sizes.max <= 3, s"cadence failed to bound history: $sizes")
      assert(sizes.min == 1, s"compaction never folded the store: $sizes")
    } finally q.stop()
    // the merged latest-by-key view is exactly what uncompacted
    // merge-on-read would produce
    val st = ManifestStore.read(spark, dir, "id").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(st == Map(1 -> "t8", 2 -> "silver"), st.toString)
    // vacuum (retention floor 2) reclaimed the folded dirs
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nDirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).count(_.startsWith("d-"))
    assert(nDirs <= 5, s"vacuum left $nDirs version dirs")
  }

  test("streaming topology: maintain + joinEachBatch see committed dim updates batch over batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    ManifestStoreSpec.joined.clear()
    val dimDir = tmp("mstore-dim")
    ManifestStore.seed(
      Seq((1, "bronze"), (2, "platinum")).toDF("id", "tier"), "id", dimDir)

    val dimMs = MemoryStream[(Int, String, java.sql.Timestamp)]
    val maintainQ = ManifestStore.maintain(
      dimMs.toDF().toDF("id", "tier", "uts"), "id", "uts", dimDir, tmp("ck-m"))

    val factMs = MemoryStream[(Long, Int)]
    val joinQ = ManifestStore.joinEachBatch(
      factMs.toDF().toDF("fact_id", "id"), dimDir, "id", tmp("ck-j"),
      (facts, dim) => facts.join(broadcast(dim), "id")) { (out, _) =>
      out.select("fact_id", "tier").collect()
        .foreach(r => ManifestStoreSpec.joined.add((r.getLong(0).toInt, r.getString(1))))
    }
    try {
      factMs.addData((100L, 1))
      joinQ.processAllAvailable()
      assert(ManifestStoreSpec.joined.asScala.toSet == Set((100, "bronze")))
      // live dim update commits a new version; the NEXT fact batch joins it
      dimMs.addData((1, "gold", ts("2024-01-01 10:00:00")))
      maintainQ.processAllAvailable()
      factMs.addData((101L, 1))
      joinQ.processAllAvailable()
      assert(ManifestStoreSpec.joined.asScala.toSet ==
        Set((100, "bronze"), (101, "gold")))
    } finally { joinQ.stop(); maintainQ.stop() }
  }
}
