package graft

import org.apache.spark.sql.functions._

import graft.tables.{ChangeFeed, GraftTable}

/** RESTORE: metadata-only rewind to a past version, lineage preserved. */
class RestoreSuite extends GraftFunSuite {
  import spark.implicits._

  test("PK table: restore reverts upsert+delete, merge order intact") {
    withTempTable { dir =>
      Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val v0 = t.snapshot.version
      t.upsert(Seq((1L, 99)).toDF("id", "v"))
      t.delete($"id" === 3L)
      val vPre = t.snapshot.version
      assert(rowsOf(t.toDF) == Seq(Seq(1L, 99), Seq(2L, 20)))

      val vRestore = t.restore(v0)
      assert(vRestore == vPre + 1, "restore is a NEW commit on the log")
      assert(rowsOf(GraftTable.forPath(spark, dir).toDF) ==
        Seq(Seq(1L, 10), Seq(2L, 20), Seq(3L, 30)))
      // lineage preserved: the pre-restore state is still time-travelable
      assert(spark.read.format("graft").option("versionAsOf", vPre.toString)
        .load(dir).count() == 2)
      // restoring FORWARD to the pre-restore version works too
      t.restore(vPre)
      assert(rowsOf(GraftTable.forPath(spark, dir).toDF) ==
        Seq(Seq(1L, 99), Seq(2L, 20)))
    }
  }

  test("restore preserves writeVersions: re-added delta stack merges in " +
      "original order") {
    withTempTable { dir =>
      Seq((1L, "v0")).toDF("id", "s").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, "v1")).toDF("id", "s")) // delta 1
      t.upsert(Seq((1L, "v2")).toDF("id", "s")) // delta 2 — newest must win
      val vPreCompact = t.snapshot.version
      t.compaction()
      // restore re-adds base + both deltas; if commit restamped their
      // writeVersions to the restore version, merge order would fall back
      // to file-path sort and an older value could win
      t.restore(vPreCompact)
      val snap = GraftTable.forPath(spark, dir).snapshot
      assert(snap.files.map(_.writeVersion).distinct.length > 1,
        "restored files must keep their ORIGINAL writeVersions")
      assert(GraftTable.forPath(spark, dir).toDF
        .select("s").as[String].collect().toSeq == Seq("v2"))
    }
  }

  test("PK restore dropping only a delta emits update pre/post, not a " +
      "spurious delete") {
    withTempTable { dir =>
      Seq((1L, 10)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 99)).toDF("id", "v"))
      val vR = t.restore(t.snapshot.version - 1)
      // the key is STILL LIVE at the older value: the feed must say
      // update(99 -> 10), not delete(99)
      val ch = t.changes(vR, vR)
      val got = ch.select(col(ChangeFeed.CHANGE_TYPE), $"v")
        .as[(String, Int)].collect().toSet
      assert(got == Set(("update_preimage", 99), ("update_postimage", 10)),
        s"got $got")
      assert(rowsOf(t.toDF) == Seq(Seq(1L, 10)))
    }
  }

  test("adds-only restore detects a concurrent commit (rewriteGuard)") {
    withTempTable { dir =>
      Seq((1L, 10)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 99)).toDF("id", "v")) // v1: delta d1
      t.restore(0)                            // v2: removes d1
      // hand-stage the adds-only restore-to-v1 (adds=[d1], removes=[]),
      // let a concurrent upsert commit in the window, then commit: the
      // rewrite guard must flag the conflict instead of silently
      // shadowing the concurrent write with the resurrected delta
      val store = graft.meta.SnapshotManagement.store
      val txn = new graft.meta.Transaction(t.path, store)
      val current = txn.snapshotOpt.get // pins the read version
      val target = graft.meta.Snapshot.replay(store, t.path, 1L)
      val live = current.files.map(_.path).toSet
      val adds = target.files.filterNot(f => live.contains(f.path))
      assert(adds.nonEmpty && adds.forall(_.writeVersion > 0L))
      t.upsert(Seq((1L, 55)).toDF("id", "v")) // concurrent commit
      intercept[graft.meta.GraftConcurrentModificationException] {
        txn.commit("restore", None, adds, Nil,
          rewriteGuard = true, preserveWriteVersions = true)
      }
      // the PUBLIC API restarts from a fresh snapshot and wins cleanly
      t.restore(1L)
      assert(GraftTable.forPath(spark, dir).toDF
        .select("v").as[Int].collect().toSeq == Seq(99))
    }
  }

  test("restoreToTimestamp resolves against commit times") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val afterV0 = System.currentTimeMillis()
      Thread.sleep(20)
      Seq((2L, 2)).toDF("id", "v").write.format("graft").mode("append").save(dir)
      assert(t.toDF.count() == 2)
      t.restoreToTimestamp(afterV0.toString) // epoch-millis form
      assert(GraftTable.forPath(spark, dir).toDF.count() == 1)
      // a timestamp older than the table is rejected upstream
      intercept[Exception] { t.restoreToTimestamp("19700102") }
    }
  }

  test("restore reverts schema evolution along with the data") {
    withTempTable { dir =>
      Seq((1L, "a")).toDF("id", "s").write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val v0 = t.snapshot.version
      withSQLConf("spark.graft.schema.autoMerge.enabled" -> "true") {
        Seq((2L, "b", 5)).toDF("id", "s", "extra").write.format("graft")
          .mode("append").save(dir)
      }
      assert(spark.read.format("graft").load(dir).columns.contains("extra"))
      t.restore(v0)
      val restored = spark.read.format("graft").load(dir)
      assert(!restored.columns.contains("extra"))
      assert(restored.count() == 1)
    }
  }

  test("restore is refused when a needed file was vacuumed") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val v0 = t.snapshot.version
      t.upsert(Seq((1L, 2)).toDF("id", "v"))
      t.compaction()
      withSQLConf("spark.graft.cleanup.retentionCheck.enabled" -> "false") {
        assert(t.cleanup(retainMillis = 0L).nonEmpty)
      }
      val e = intercept[IllegalStateException] { t.restore(v0) }
      assert(e.getMessage.contains("vacuum"))
      // table unharmed
      assert(rowsOf(GraftTable.forPath(spark, dir).toDF) == Seq(Seq(1L, 2)))
    }
  }

  test("restore surfaces in the change feed as delete+insert; CALL works") {
    withTempTable { dir =>
      Seq(("us", 1)).toDF("c", "n").write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val v0 = t.snapshot.version
      Seq(("de", 2)).toDF("c", "n").write.format("graft").mode("append").save(dir)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      val out = s2.sql(
        s"CALL spark_catalog.system.restore('$dir', $v0)").collect()
      assert(out.length == 1)
      val vR = out.head.getLong(1)
      val ch = t.changes(vR, vR)
      assert(ch.groupBy(ChangeFeed.CHANGE_TYPE).count().as[(String, Long)]
        .collect().toMap == Map("delete" -> 1L))
      assert(rowsOf(t.toDF) == Seq(Seq("us", 1)))
      // out-of-range version rejected
      intercept[IllegalArgumentException] { t.restore(99L) }
    }
  }
}
