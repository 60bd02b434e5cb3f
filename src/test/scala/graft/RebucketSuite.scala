package graft

import org.apache.spark.sql.functions._

import graft.tables.{ChangeFeed, GraftTable}

/** REBUCKET: transactional hash-bucket-count change on PK tables — content
  * stability, layout adoption by scans and later writes, time travel,
  * stream/feed classification, and the commit-time layout guard against
  * writers pinned to the old layout.
  */
class RebucketSuite extends GraftFunSuite {
  import spark.implicits._

  private def bucketIds(dir: String): Seq[Int] =
    GraftTable.forPath(spark, dir).snapshot.files
      .map(_.bucket).filter(_ >= 0).distinct.sorted

  test("rebucket grows the bucket count; content and merge semantics survive") {
    withTempTable { dir =>
      (1L to 100L).map(i => (i, i * 10)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((7L, -7L), (101L, 1010L)).toDF("id", "v")) // delta stack
      t.delete($"id" === 50L)
      val before = t.toDF.orderBy("id").as[(Long, Long)].collect().toSeq
      val vPre = GraftTable.forPath(spark, dir).snapshot.version

      val vNew = t.rebucket(8)
      assert(vNew == vPre + 1)
      val after = GraftTable.forPath(spark, dir)
      assert(after.snapshot.tableInfo.bucketNum == 8)
      assert(after.snapshot.files.forall(_.isBase),
        "rebucket materializes the merged state as base files")
      assert(bucketIds(dir).nonEmpty && bucketIds(dir).max >= 2,
        s"files should spread beyond the old 2 buckets: ${bucketIds(dir)}")
      assert(after.toDF.orderBy("id").as[(Long, Long)].collect().toSeq == before)

      // later writes adopt the new layout: upsert + point read still work
      after.upsert(Seq((1L, 111L)).toDF("id", "v"))
      val got = GraftTable.forPath(spark, dir).toDF
        .filter($"id" === 1L).select("v").as[Long].collect()
      assert(got.toSeq == Seq(111L))

      // time travel to the pre-rebucket version pairs OLD info + OLD files
      val old = spark.read.format("graft")
        .option("versionAsOf", vPre.toString).load(dir)
      assert(old.orderBy("id").as[(Long, Long)].collect().toSeq == before)
    }
  }

  test("rebucket shrink works and no-op bucket count commits nothing") {
    withTempTable { dir =>
      (1L to 40L).map(i => (i, s"s$i")).toDF("id", "s").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "8").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val v0 = t.snapshot.version
      assert(t.rebucket(8) == v0, "same bucket count is a no-op")
      assert(GraftTable.forPath(spark, dir).snapshot.version == v0)
      t.rebucket(3)
      val snap = GraftTable.forPath(spark, dir).snapshot
      assert(snap.tableInfo.bucketNum == 3)
      assert(bucketIds(dir).forall(_ < 3))
      assert(snap.version == v0 + 1)
      assert(GraftTable.forPath(spark, dir).toDF.count() == 40)
    }
  }

  test("rebucket refuses non-PK tables") {
    withTempTable { dir =>
      Seq((1, "a")).toDF("id", "s").write.format("graft").save(dir)
      val e = intercept[IllegalArgumentException] {
        GraftTable.forPath(spark, dir).rebucket(4)
      }
      assert(e.getMessage.contains("primary-key"))
    }
  }

  test("layout guard: delta staged against the old layout conflicts after " +
      "a rebucket commit") {
    withTempTable { dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(dir)
      val norm = graft.meta.SnapshotManagement.normalize(dir)
      val txn = new graft.meta.Transaction(norm,
        graft.meta.SnapshotManagement.store)
      val pinnedInfo = txn.snapshotOpt.get.tableInfo // bucketNum = 4
      val staged = graft.write.TransactionalWrite.writeFiles(
        spark, norm, pinnedInfo, Seq((3L, "c")).toDF("id", "s"),
        isBase = false)
      // rebucket lands while the delta writer is between stage and commit
      GraftTable.forPath(spark, dir).rebucket(2)
      intercept[graft.meta.GraftConcurrentModificationException] {
        txn.commit("delta", None, staged, Nil)
      }
      // the table is uncorrupted: still 2 rows under the new layout
      assert(GraftTable.forPath(spark, dir).toDF.count() == 2)
      assert(GraftTable.forPath(spark, dir)
        .snapshot.tableInfo.bucketNum == 2)
    }
  }

  test("rebucket classifies as a rewrite: stream skips it, feed emits " +
      "nothing for it") {
    withTempTable { dir =>
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val out = java.nio.file.Files.createTempDirectory("rb_sink_").toString
      def drain(): Unit = {
        val q = spark.readStream.format("graft").load(dir)
          .writeStream.format("parquet")
          .option("path", s"$out/data")
          .option("checkpointLocation", s"$out/cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(60000)
      }
      drain() // initial snapshot: rows 1, 2
      val t = GraftTable.forPath(spark, dir)
      val vRebucket = t.rebucket(4)
      t.upsert(Seq((3L, 30L)).toDF("id", "v"))

      // batch change feed: the rebucket version contributes no rows
      val feed = ChangeFeed.changes(spark, dir, vRebucket, vRebucket)
      assert(feed.count() == 0, "rebucket is a rewrite — no row change")

      // resuming across the rebucket commit must not throw, must not
      // re-emit the rewritten rows, and must deliver the new upsert
      drain()
      val streamed = spark.read.parquet(s"$out/data")
        .select("id").as[Long].collect().toSeq
      assert(streamed.sorted == Seq(1L, 2L, 3L),
        s"stream should carry the snapshot once plus the post-rebucket " +
        s"upsert, got $streamed")
    }
  }

  test("rebucket under sustained writes converges via catch-up rounds, " +
      "not a second full rewrite") {
    withTempTable { dir =>
      (1L to 200L).map(i => (i, i)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      // the hook fires after the full base rewrite and before the first
      // cutover attempt — exactly where a busy table's commits land
      var raced = false
      val vNew = graft.commands.RebucketCommand.run(spark, dir, 6,
        onBaseRewritten = () => if (!raced) {
          raced = true
          val t = GraftTable.forPath(spark, dir)
          t.upsert(Seq((5L, 555L), (300L, 300L)).toDF("id", "v"))
          t.delete($"id" === 10L)
          t.upsert(Seq((300L, 301L)).toDF("id", "v")) // re-overwrite
        })
      val after = GraftTable.forPath(spark, dir)
      assert(after.snapshot.version == vNew)
      assert(after.snapshot.tableInfo.bucketNum == 6)
      // content reflects EVERY concurrent commit: update, insert, delete,
      // and the second overwrite of the inserted key
      val got = after.toDF.as[(Long, Long)].collect().toMap
      assert(got(5L) == 555L)
      assert(got(300L) == 301L)
      assert(!got.contains(10L))
      assert(got.size == 200L) // 200 - deleted + inserted
      // the convergence was incremental: the rebucket commit carries the
      // base rewrite PLUS catch-up delta files (a second full rewrite
      // would have produced base-only files like the quiet-path test)
      val files = after.snapshot.files
      assert(files.exists(!_.isBase), "expected catch-up delta files")
      assert(files.filter(!_.isBase).forall(f =>
        files.filter(_.isBase).forall(_.writeVersion < f.writeVersion)),
        "catch-up deltas must merge-order after the rewritten base")
      // a later upsert merge-orders after the catch-up rows
      after.upsert(Seq((5L, 5555L)).toDF("id", "v"))
      assert(GraftTable.forPath(spark, dir).toDF
        .filter($"id" === 5L).select("v").as[Long].head() == 5555L)
    }
  }

  test("CALL graft.rebucket procedure") {
    withTempTable { dir =>
      Seq((1L, "x"), (2L, "y")).toDF("id", "s").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      val rows = s2.sql(
        s"CALL spark_catalog.system.rebucket(table => '$dir', " +
        "bucket_num => 6)").collect()
      assert(rows.length == 1)
      assert(GraftTable.forPath(spark, dir).snapshot.tableInfo.bucketNum == 6)
      assert(GraftTable.forPath(spark, dir).toDF.count() == 2)
    }
  }
}
