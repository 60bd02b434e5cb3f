package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.commands.CloneCommand
import graft.meta.SnapshotManagement
import graft.tables.GraftTable

class CloneSuite extends GraftFunSuite {
  import spark.implicits._

  private def dataFilesUnder(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Nil
    val out = Seq.newBuilder[String]
    Files.walk(root).forEach { p =>
      val s = p.toString
      if (s.endsWith(".parquet") && !s.contains("_graft_log")) out += s
    }
    out.result()
  }

  private def snap(dir: String) =
    SnapshotManagement.snapshot(SnapshotManagement.normalize(dir))

  test("non-PK shallow clone: zero data copy, same content, independent " +
      "thereafter in both directions") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/clone"
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
        .write.format("graft").save(src)
      val v = CloneCommand.run(spark, src, dest)
      assert(v == snap(src).version)
      assert(dataFilesUnder(dest).isEmpty,
        "shallow clone must not copy any data file")
      assert(CloneCommand.hasExternalRefs(snap(dest)))
      assertSameRows(spark.read.format("graft").load(dest),
        spark.read.format("graft").load(src))

      // clone-side append stays local to the clone
      Seq((4L, "d")).toDF("id", "v")
        .write.format("graft").mode("append").save(dest)
      assert(spark.read.format("graft").load(dest).count() == 4)
      assert(spark.read.format("graft").load(src).count() == 3,
        "append to the clone must not leak into the source")
      assert(dataFilesUnder(dest).nonEmpty, "the new file lives in the clone")

      // source-side append after the clone is invisible to the clone
      Seq((9L, "z")).toDF("id", "v")
        .write.format("graft").mode("append").save(src)
      assert(spark.read.format("graft").load(dest).count() == 4)
    } }
  }

  test("DEEP clone: localized on return, survives source deletion, " +
      "PK delta-stack merge result identical to the source") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/deep"
      // delta-stacked PK source: deep clone must materialize the MERGED
      // state (localization goes through the ordinary compaction merge)
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("id", "v", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.upsert(Seq((2L, "B", 21L), (4L, "d", 40L)).toDF("id", "v", "n"))
      t.delete(col("id") === 3L)
      val want = spark.read.format("graft").load(src).collect()
        .map(_.toString).sorted.toSeq

      val v = CloneCommand.run(spark, src, dest, deep = true)
      assert(v == snap(src).version)
      assert(!CloneCommand.hasExternalRefs(snap(dest)),
        "deep clone must return with zero external references")
      assert(dataFilesUnder(dest).nonEmpty,
        "deep clone materializes local files")
      assert(spark.read.format("graft").load(dest).collect()
        .map(_.toString).sorted.toSeq == want)

      // full independence: wipe the source's storage, the clone still reads
      SnapshotManagement.invalidate(SnapshotManagement.normalize(src))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
      SnapshotManagement.invalidate(SnapshotManagement.normalize(dest))
      assert(spark.read.format("graft").load(dest).collect()
        .map(_.toString).sorted.toSeq == want)
    } }
  }

  test("CALL system.clone(deep => true) localizes via SQL") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/deep_sql"
      Seq((1L, "x"), (2L, "y")).toDF("id", "v")
        .write.format("graft").save(src)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog",
        "graft.catalog.GraftCatalog")
      val row = s2.sql(
        s"CALL system.clone(source => '$src', dest => '$dest', " +
          "deep => true)").collect().head
      assert(row.getLong(1) == snap(src).version)
      assert(!CloneCommand.hasExternalRefs(snap(dest)))
      assertSameRows(spark.read.format("graft").load(dest),
        spark.read.format("graft").load(src))
    } }
  }

  test("PK clone preserves delta-stack merge order (no pre-compaction " +
      "needed); post-clone upserts outrank cloned state") {
    withTempTable { src => withTempTable { scratch =>
      val destLive = scratch + "/clone_live"
      val dest = scratch + "/clone"
      Seq((1L, 10), (2L, 20)).toDF("id", "n")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.upsert(Seq((1L, 11), (3L, 30)).toDF("id", "n"))
      // LIVE delta stack: the order-preserving writeVersion remap keeps
      // the upsert above the base it overwrites — id 1 must read 11, and
      // nothing is copied
      CloneCommand.run(spark, src, destLive)
      assert(dataFilesUnder(destLive).isEmpty,
        "delta-stacked shallow clone must not copy any data file")
      assertSameRows(spark.read.format("graft").load(destLive),
        spark.read.format("graft").load(src))
      // deeper stack with a tombstone and a re-insert: relative order of
      // THREE cloned generations must survive
      t.delete(col("id") === 2L)
      t.upsert(Seq((2L, 22), (1L, 12)).toDF("id", "n"))
      val destDeep = scratch + "/clone_deep"
      CloneCommand.run(spark, src, destDeep)
      assertSameRows(spark.read.format("graft").load(destDeep),
        Seq((1L, 12), (2L, 22), (3L, 30)).toDF("id", "n"))
      // divergent DML on the deep clone: upsert + delete resolve against
      // cloned generations exactly as they would on the source
      GraftTable.forPath(spark, destDeep)
        .upsert(Seq((3L, 33)).toDF("id", "n"))
      GraftTable.forPath(spark, destDeep).delete(col("id") === 1L)
      assertSameRows(spark.read.format("graft").load(destDeep),
        Seq((2L, 22), (3L, 33)).toDF("id", "n"))
      // and localization via forced compaction still works on the stack
      graft.commands.CompactionCommand.run(spark,
        SnapshotManagement.normalize(destDeep), force = true)
      assert(!CloneCommand.hasExternalRefs(snap(destDeep)))
      assertSameRows(spark.read.format("graft").load(destDeep),
        Seq((2L, 22), (3L, 33)).toDF("id", "n"))
      // source unaffected by everything above
      assertSameRows(spark.read.format("graft").load(src),
        Seq((1L, 12), (2L, 22), (3L, 30)).toDF("id", "n"))

      t.compaction()
      CloneCommand.run(spark, src, dest)
      assertSameRows(spark.read.format("graft").load(dest),
        Seq((1L, 12), (2L, 22), (3L, 30)).toDF("id", "n"))

      // the writeVersion remap must leave post-clone commits on top:
      // an upsert overwriting a cloned key has to win the merge
      GraftTable.forPath(spark, dest)
        .upsert(Seq((1L, 111), (4L, 40)).toDF("id", "n"))
      assertSameRows(spark.read.format("graft").load(dest),
        Seq((1L, 111), (2L, 22), (3L, 30), (4L, 40)).toDF("id", "n"))
      // and a tombstone delete of a cloned key resolves against it
      GraftTable.forPath(spark, dest).delete(col("id") === 2L)
      assert(spark.read.format("graft").load(dest)
        .filter(col("id") === 2L).count() == 0)
      // source never moved
      assertSameRows(spark.read.format("graft").load(src),
        Seq((1L, 12), (2L, 22), (3L, 30)).toDF("id", "n"))
    } }
  }

  test("clone at a past version pins that state; the clone's own time " +
      "travel starts at its v0") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/clone"
      Seq((1L, "a")).toDF("id", "v").write.format("graft").save(src)
      val v0 = snap(src).version
      Seq((2L, "b")).toDF("id", "v")
        .write.format("graft").mode("append").save(src)
      assert(CloneCommand.run(spark, src, dest, Some(v0)) == v0)
      assert(spark.read.format("graft").load(dest).count() == 1,
        "clone at v0 must not see the later append")
      Seq((3L, "c")).toDF("id", "v")
        .write.format("graft").mode("append").save(dest)
      val travel = spark.read.format("graft").option("versionAsOf", "0")
        .load(dest)
      assert(travel.count() == 1, "clone v0 = the cloned state")

      // timestamp form: epoch-millis "now" resolves to the source's
      // latest version (two rows — the v0-pinned clone above has one)
      val dest2 = scratch + "/clone_ts"
      GraftTable.forPath(spark, src).cloneToAtTimestamp(dest2,
        System.currentTimeMillis().toString)
      assert(spark.read.format("graft").load(dest2).count() == 2)
    } }
  }

  test("vacuum on a clone never deletes source files; localization by " +
      "compaction makes the clone survive source deletion") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/clone"
      (1 to 100).map(i => (i.toLong, i.toString)).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      CloneCommand.run(spark, src, dest)
      val srcFilesBefore = dataFilesUnder(src).toSet
      withSQLConf("spark.graft.cleanup.retentionCheck.enabled" -> "false") {
        val deleted = GraftTable.forPath(spark, dest).cleanup(retainMillis = 0)
        assert(deleted.isEmpty, s"clone vacuum deleted: $deleted")
      }
      assert(dataFilesUnder(src).toSet == srcFilesBefore)
      assert(spark.read.format("graft").load(dest).count() == 100)

      // localize: force-compaction rewrites through the external refs
      GraftTable.forPath(spark, dest).compaction(force = true)
      assert(!CloneCommand.hasExternalRefs(snap(dest)),
        "force compaction must leave no external references")
      // the clone now survives the source disappearing entirely
      graft.write.TransactionalWrite.deleteRecursively(Paths.get(src))
      SnapshotManagement.invalidate(src)
      assert(spark.read.format("graft").load(dest).count() == 100)
    } }
  }

  test("DV flows: a clone sees the source's deletion vectors, and a DV " +
      "delete on the clone masks the SHARED file only clone-side") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/clone"
      // ONE multi-row file: with a row per file, a single-row delete drops
      // the whole file (fullyGone) and never exercises the DV path
      (1 to 10).map(i => (i.toLong, i)).toDF("id", "n").coalesce(1)
        .write.format("graft").save(src)
      // non-PK delete → deletion vector against the source file
      GraftTable.forPath(spark, src).delete(col("id") === 1L)
      assert(snap(src).files.exists(_.hasDv), "source delete must be a DV")
      CloneCommand.run(spark, src, dest)
      assert(spark.read.format("graft").load(dest).count() == 9,
        "clone must read through the source's DV")

      GraftTable.forPath(spark, dest).delete(col("id") === 2L)
      assert(spark.read.format("graft").load(dest).count() == 8)
      assert(spark.read.format("graft").load(src).count() == 9,
        "the clone's DV must not mask rows in the source")
      // the clone's new DV bitmap lives under the clone root
      val cloneDvs = snap(dest).files.filter(_.hasDv).map(_.dvPath)
      assert(cloneDvs.nonEmpty &&
        cloneDvs.forall(!graft.meta.DataFileInfo.isExternal(_)),
        s"clone-side DV must be clone-relative: $cloneDvs")
    } }
  }

  test("CALL clone procedure: SQL surface, optional version, " +
      "dest-must-not-exist error") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/clone"
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.format("graft").save(src)
      // CALL resolves through the GraftCatalog's ProcedureCatalog: catalog
      // conf is read at session creation, so use a fresh session
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog",
        "graft.catalog.GraftCatalog")
      val out = s2.sql(
        s"CALL spark_catalog.system.clone('$src', '$dest')").collect()
      assert(out.length == 1)
      assert(spark.read.format("graft").load(dest).count() == 2)
      val e = intercept[Exception] {
        s2.sql(s"CALL spark_catalog.system.clone('$src', '$dest')")
          .collect()
      }
      assert(e.getMessage.contains("exists"), e.getMessage)
      // provenance recorded
      val conf = snap(dest).tableInfo.configuration
      assert(conf.get("graft.clone.sourcePath")
        .contains(SnapshotManagement.normalize(src)))
      assert(conf.contains("graft.clone.sourceVersion"))

      // timestamp form: clone the newest version at or before the cut —
      // an append AFTER the cut must not be in the clone
      val cut = System.currentTimeMillis()
      Thread.sleep(5)
      Seq((3L, "c")).toDF("id", "v")
        .write.format("graft").mode("append").save(src)
      val destTs = scratch + "/clone-ts"
      s2.sql(s"CALL spark_catalog.system.clone('$src', '$destTs', " +
        s"timestamp => '$cut')").collect()
      assert(spark.read.format("graft").load(destTs).count() == 2)
      // version and timestamp together is an error
      val e2 = intercept[Exception] {
        s2.sql(s"CALL spark_catalog.system.clone('$src', " +
          s"'$scratch/clone-x', version => 0, timestamp => '$cut')")
          .collect()
      }
      assert(e2.getMessage.contains("not both"), e2.getMessage)
    } }
  }

  test("chained clone: a fork of a fork reads through refs into BOTH " +
      "ancestors; localization cuts the whole chain") {
    withTempTable { src => withTempTable { scratch =>
      val b = scratch + "/b"; val c = scratch + "/c"
      Seq((1L, 10), (2L, 20)).toDF("id", "n")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1")
        .save(src)
      CloneCommand.run(spark, src, b)
      // B diverges with a local delta, then compacts so it is
      // clone-eligible again (some files B-local, none external anymore —
      // compaction of a PK clone localizes as it merges)
      GraftTable.forPath(spark, b).upsert(Seq((3L, 30)).toDF("id", "n"))
      GraftTable.forPath(spark, b).compaction()
      // re-mix: an appended non-PK? stay PK — clone B → C, then verify C
      CloneCommand.run(spark, b, c)
      assertSameRows(spark.read.format("graft").load(c),
        Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "n"))
      // C's refs point into B (absolute); localize C and drop both
      // ancestors — C must survive alone
      GraftTable.forPath(spark, c).compaction(force = true)
      assert(!CloneCommand.hasExternalRefs(snap(c)))
      Seq(src, b).foreach { p =>
        graft.write.TransactionalWrite.deleteRecursively(Paths.get(p))
        SnapshotManagement.invalidate(p)
      }
      assert(spark.read.format("graft").load(c).count() == 3)
    } }
  }

  test("change feed and streaming read of a clone treat the cloned state " +
      "as its initial commit") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/clone"
      Seq((1L, 10), (2L, 20)).toDF("id", "n")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1")
        .save(src)
      CloneCommand.run(spark, src, dest)
      GraftTable.forPath(spark, dest)
        .upsert(Seq((3L, 30)).toDF("id", "n"))
      val feed = graft.tables.ChangeFeed.changes(spark, dest, 0,
        snap(dest).version)
      val inserts = feed.filter(col(graft.tables.ChangeFeed.CHANGE_TYPE)
        === "insert").select("id").as[Long].collect().toSet
      assert(inserts == Set(1L, 2L),
        s"cloned rows must surface as v0 inserts: $inserts")
      val upserts = feed.filter(col(graft.tables.ChangeFeed.CHANGE_TYPE)
        === "upsert").select("id").as[Long].collect().toSet
      assert(upserts == Set(3L),
        s"the post-clone delta must follow as an upsert: $upserts")

      // plain streaming source: the clone commit is append-like, so a
      // stream over the clone drains the cloned rows as its snapshot
      val q1 = spark.readStream.format("graft").load(dest)
        .writeStream.format("memory").queryName("clone_stream").start()
      try {
        q1.processAllAvailable()
        assert(spark.table("clone_stream").select("id").as[Long]
          .collect().toSet == Set(1L, 2L, 3L))
      } finally q1.stop()
      // CDF stream from version 0: the clone commit's rows surface as
      // insert change rows, the post-clone delta as an upsert (the
      // default start is snapshot-as-inserts, which hides the split)
      val q2 = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0").load(dest)
        .writeStream.format("memory").queryName("clone_cdf").start()
      try {
        q2.processAllAvailable()
        val byType = spark.table("clone_cdf")
          .groupBy(graft.tables.ChangeFeed.CHANGE_TYPE).count()
          .as[(String, Long)].collect().toMap
        assert(byType.getOrElse("insert", 0L) == 2L &&
          byType.getOrElse("upsert", 0L) == 1L, byType.toString)
      } finally q2.stop()
    } }
  }
}
