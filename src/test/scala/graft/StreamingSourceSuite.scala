package graft

import org.apache.spark.sql.streaming.StreamingQuery

import graft.tables.GraftTable

/** `readStream.format("graft")` — micro-batch source over the commit log
  * (offsets = versions; initial batch = live snapshot; later batches =
  * append-like commits' files; rewrites skipped or rejected). */
class StreamingSourceSuite extends GraftFunSuite {
  import spark.implicits._

  private def startToMemory(dir: String, name: String,
      options: Map[String, String] = Map.empty): StreamingQuery = {
    val reader = spark.readStream.format("graft").options(options)
    reader.load(dir).writeStream.format("memory").queryName(name).start()
  }

  test("initial snapshot then incremental appends, exactly once") {
    withTempTable { dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft").save(dir)
      val q = startToMemory(dir, "gss1")
      try {
        q.processAllAvailable()
        assert(spark.table("gss1").count() == 2)
        // two more append commits
        Seq((3L, "c")).toDF("id", "v").write.format("graft").mode("append").save(dir)
        Seq((4L, "d")).toDF("id", "v").write.format("graft").mode("append").save(dir)
        q.processAllAvailable()
        assert(rowsOf(spark.table("gss1")) ==
          Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"), Seq(4L, "d")))
      } finally q.stop()
    }
  }

  test("PK table: delta upserts stream as records; compaction adds nothing") {
    withTempTable { dir =>
      Seq((1L, 1), (2L, 2)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val q = startToMemory(dir, "gss2")
      try {
        q.processAllAvailable()
        assert(spark.table("gss2").count() == 2)
        t.upsert(Seq((1L, 11), (3L, 3)).toDF("id", "v"))
        q.processAllAvailable()
        // the delta batch streams its two upsert records
        assert(spark.table("gss2").count() == 4)
        // compaction rewrites but appends no rows to the stream
        graft.commands.CompactionCommand.run(spark, t.path, force = true)
        q.processAllAvailable()
        assert(spark.table("gss2").count() == 4)
      } finally q.stop()
    }
  }

  test("data-changing commit fails the stream unless ignoreChanges") {
    withTempTable { dir =>
      Seq((1L, 1), (2L, 2)).toDF("id", "v").write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val q = startToMemory(dir, "gss3")
      try {
        q.processAllAvailable()
        t.deleteExpr("id = 2")
        val e = intercept[Exception] { q.processAllAvailable() }
        def messages(x: Throwable): Seq[String] =
          if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
        assert(messages(e).exists(_.contains("ignoreChanges")),
          s"unexpected failure: ${messages(e)}")
      } finally q.stop()

      // ignoreChanges: the delete commit is skipped, the stream continues
      val q2 = startToMemory(dir, "gss3b", Map("ignoreChanges" -> "true"))
      try {
        q2.processAllAvailable()
        // initial snapshot AFTER the delete: only the surviving row
        assert(spark.table("gss3b").count() == 1)
        Seq((9L, 9)).toDF("id", "v").write.format("graft").mode("append").save(dir)
        t.deleteExpr("id = 9") // skipped change
        Seq((10L, 10)).toDF("id", "v").write.format("graft").mode("append").save(dir)
        q2.processAllAvailable()
        assert(spark.table("gss3b").count() == 3) // 1 + appended 9 + 10
      } finally q2.stop()
    }
  }

  test("ignoreChanges re-emits rewritten files (Delta at-least-once parity)") {
    withTempTable { dir =>
      Seq((1L, 1), (2L, 2)).toDF("id", "v").write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val q = startToMemory(dir, "gss_reemit", Map("ignoreChanges" -> "true"))
      try {
        q.processAllAvailable()
        assert(spark.table("gss_reemit").count() == 2)
        t.updateExpr("id = 1", Map("v" -> "100"))
        q.processAllAvailable()
        val rows = spark.table("gss_reemit").select("id", "v")
          .as[(Long, Int)].collect().toSeq
        // the UPDATE's new value must reach the stream (the old behavior
        // dropped the whole commit); sibling rows may repeat — that is the
        // documented at-least-once contract
        assert(rows.contains((1L, 100)),
          s"updated row must be re-emitted, got $rows")
        assert(!rows.contains((1L, 1)) || rows.count(_ == (1L, 1)) == 1,
          "the masked pre-image must not be emitted by the update commit")
      } finally q.stop()
    }
  }

  test("ignoreChanges: MERGE with a DELETE clause re-emits fresh " +
      "insert/update rows, withholds only the deletions") {
    withTempTable { dir =>
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "v", "n")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val q = startToMemory(dir, "gss_mergedel", Map("ignoreChanges" -> "true"))
      try {
        q.processAllAvailable()
        assert(spark.table("gss_mergedel").count() == 3)
        // one MERGE commit: deletes id=1, updates id=2, inserts id=4 — its
        // delta files all carry the tombstone marker column
        Seq((1L, "x", 0), (2L, "B", 200), (4L, "d", 40)).toDF("id", "v", "n")
          .createOrReplaceTempView("gss_mergedel_src")
        spark.sql(
          s"""MERGE INTO graft.`$dir` t USING gss_mergedel_src s ON t.id = s.id
             WHEN MATCHED AND s.id = 1 THEN DELETE
             WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
             WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, s.n)""")
        q.processAllAvailable()
        val rows = spark.table("gss_mergedel").select("id", "v", "n")
          .as[(Long, String, Int)].collect().toSeq
        // the commit's NEW rows must reach the stream (they were never
        // processed before)
        assert(rows.contains((2L, "B", 200)),
          s"merge-updated row must be re-emitted, got $rows")
        assert(rows.contains((4L, "d", 40)),
          s"merge-inserted row must be re-emitted, got $rows")
        // the delete marker itself must NOT surface as a row
        assert(!rows.exists(r => r._1 == 1L && r._2 == null),
          s"delete marker must not surface as a ghost row, got $rows")
        assert(rows.count(_._1 == 1L) == 1, // only the initial snapshot's
          s"deleted key must not be re-emitted by the merge commit, got $rows")
      } finally q.stop()
    }
  }

  test("ignoreChanges: a pure tombstone DELETE commit re-emits nothing") {
    withTempTable { dir =>
      Seq((1L, 1), (2L, 2)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val q = startToMemory(dir, "gss_tombdel", Map("ignoreChanges" -> "true"))
      try {
        q.processAllAvailable()
        assert(spark.table("gss_tombdel").count() == 2)
        t.deleteExpr("id = 2") // PK tombstone delete: marker-only delta file
        q.processAllAvailable()
        assert(spark.table("gss_tombdel").count() == 2,
          "a marker-only commit must add no rows to the stream")
      } finally q.stop()
    }
  }

  test("ignoreDeletes: partition-scoped metadata-only delete streams " +
      "through; data-predicate delete still fails") {
    withTempTable { dir =>
      // one file per partition (repartition(1)) so the later data-predicate
      // delete can't resolve metadata-only by dropping a single-row file
      Seq((1L, "us", 1), (2L, "de", 2), (3L, "us", 3))
        .toDF("id", "country", "v").repartition(1)
        .write.format("graft").partitionBy("country").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val q = startToMemory(dir, "gss_igdel", Map("ignoreDeletes" -> "true"))
      try {
        q.processAllAvailable()
        assert(spark.table("gss_igdel").count() == 3)
        // whole-partition delete: metadata-only (files removed, no adds)
        t.deleteExpr("country = 'de'")
        Seq((4L, "us", 4)).toDF("id", "country", "v")
          .write.format("graft").mode("append").save(dir)
        q.processAllAvailable()
        // delete skipped silently, the append flows
        assert(spark.table("gss_igdel").count() == 4)
        // a delete that touches rows INSIDE files is not covered by
        // ignoreDeletes — it must still fail the stream
        t.deleteExpr("v = 1")
        val e = intercept[Exception] { q.processAllAvailable() }
        def messages(x: Throwable): Seq[String] =
          if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
        assert(messages(e).exists(_.contains("ignoreChanges")),
          s"data-predicate delete must fail under ignoreDeletes: ${messages(e)}")
      } finally q.stop()
    }
  }

  test("ignoreDeletes does NOT swallow a removes-only RESTORE") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 2)).toDF("id", "v")) // v1: delta
      val q = startToMemory(dir, "gss_igres", Map("ignoreDeletes" -> "true"))
      try {
        q.processAllAvailable()
        // RESTORE to v0: removes the delta file, adds nothing — it REVERTS
        // key 1 to its old value and must fail the stream, not skip
        t.restore(0L)
        val e = intercept[Exception] { q.processAllAvailable() }
        def messages(x: Throwable): Seq[String] =
          if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
        assert(messages(e).exists(_.contains("ignoreChanges")),
          s"restore must fail under ignoreDeletes: ${messages(e)}")
        // and the error must NOT suggest ignoreDeletes — the option would
        // not skip this commit, so the hint would loop the user through a
        // restart into the same failure
        assert(!messages(e).exists(_.contains("ignoreDeletes")),
          s"restore error must not hint ignoreDeletes: ${messages(e)}")
      } finally q.stop()
    }
  }

  test("range-partitioned table streams partition column values") {
    withTempTable { dir =>
      Seq((1L, "us", 1), (2L, "de", 2)).toDF("id", "country", "v")
        .write.format("graft").partitionBy("country").save(dir)
      val q = startToMemory(dir, "gss4")
      try {
        q.processAllAvailable()
        assert(rowsOf(spark.table("gss4").select("id", "country", "v")) ==
          Seq(Seq(1L, "us", 1), Seq(2L, "de", 2)))
      } finally q.stop()
    }
  }

  test("streaming source follows a log living in the object store") {
    withTempTable { dir =>
      val prev = graft.meta.SnapshotManagement.store
      graft.meta.SnapshotManagement.setStore(
        new graft.meta.ObjectStoreMetaStore(
          new graft.meta.InMemoryObjectStoreClient))
      try {
        Seq((1L, 1)).toDF("id", "v").write.format("graft").save(dir)
        val q = startToMemory(dir, "gss6")
        try {
          q.processAllAvailable()
          assert(spark.table("gss6").count() == 1)
          Seq((2L, 2)).toDF("id", "v").write.format("graft")
            .mode("append").save(dir)
          q.processAllAvailable()
          assert(spark.table("gss6").count() == 2)
        } finally q.stop()
      } finally graft.meta.SnapshotManagement.setStore(prev)
    }
  }

  test("PK initial snapshot emits the MERGED current state, each key once") {
    withTempTable { dir =>
      Seq((1L, 1, "x1"), (2L, 2, "x2")).toDF("id", "v", "w")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // pre-stream delta upserts: an update of key 1 and a new key 3
      t.upsert(Seq((1L, 11), (3L, 3)).toDF("id", "v"))
      val q = startToMemory(dir, "gss7")
      try {
        q.processAllAvailable()
        // merged state: 3 keys, each exactly once; key 1 carries the
        // upserted v with its PRE-upsert w (partial-column upsert keeps it)
        assert(rowsOf(spark.table("gss7").select("id", "v", "w")) ==
          Seq(Seq(1L, 11, "x1"), Seq(2L, 2, "x2"), Seq(3L, 3, null)))
      } finally q.stop()
    }
  }

  test("maxFilesPerTrigger=1 drains snapshot and backlog over many batches") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft").save(dir)
      for (i <- 2 to 4) {
        Seq((i.toLong, i)).toDF("id", "v").write.format("graft")
          .mode("append").save(dir)
      }
      // 4 live files at stream start: the initial snapshot itself must
      // split over ≥4 micro-batches
      val q = startToMemory(dir, "gss8", Map("maxFilesPerTrigger" -> "1"))
      try {
        q.processAllAvailable()
        assert(rowsOf(spark.table("gss8")) ==
          Seq(Seq(1L, 1), Seq(2L, 2), Seq(3L, 3), Seq(4L, 4)))
        val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
        assert(nonEmpty >= 4, s"expected >=4 admission-capped batches, " +
          s"got $nonEmpty")
        // a post-start backlog of 3 commits also drains one file at a time
        val before = q.recentProgress.length
        for (i <- 5 to 7) {
          Seq((i.toLong, i)).toDF("id", "v").write.format("graft")
            .mode("append").save(dir)
        }
        q.processAllAvailable()
        assert(spark.table("gss8").count() == 7)
        val incremental = q.recentProgress.drop(before).count(_.numInputRows > 0)
        assert(incremental >= 3, s"expected >=3 backlog batches, got " +
          s"$incremental")
      } finally q.stop()
    }
  }

  test("Trigger.AvailableNow drains the pinned state in capped batches " +
      "and self-terminates") {
    withTempTable { dir =>
      for (i <- 1 to 3) {
        Seq((i.toLong, i)).toDF("id", "v").write.format("graft")
          .mode(if (i == 1) "error" else "append").save(dir)
      }
      val q = spark.readStream.format("graft")
        .option("maxFilesPerTrigger", "1").load(dir)
        .writeStream.format("memory").queryName("gssan")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        // AvailableNow self-terminates once the pinned snapshot is drained
        assert(q.awaitTermination(60000), "AvailableNow query did not " +
          "terminate on its own")
        assert(rowsOf(spark.table("gssan")) ==
          Seq(Seq(1L, 1), Seq(2L, 2), Seq(3L, 3)))
        // admission control still applies inside AvailableNow
        val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
        assert(nonEmpty >= 3, s"expected >=3 capped batches, got $nonEmpty")
      } finally q.stop()
      // a commit after termination is not lost: the next AvailableNow run
      // picks it up from the checkpointed offset... without a checkpoint a
      // fresh query just re-reads the whole table; assert the pin does not
      // swallow the post-run commit in a NEW run
      Seq((4L, 4)).toDF("id", "v").write.format("graft").mode("append").save(dir)
      val q2 = spark.readStream.format("graft").load(dir)
        .writeStream.format("memory").queryName("gssan2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        assert(q2.awaitTermination(60000))
        assert(spark.table("gssan2").count() == 4)
      } finally q2.stop()
    }
  }

  test("checkpoint restart mid-backlog loses and duplicates nothing") {
    withTempTable { dir =>
      val cp = dir + "-cp"
      val out = dir + "-out"
      Seq((1L, 1)).toDF("id", "v").write.format("graft").save(dir)
      for (i <- 2 to 4) {
        Seq((i.toLong, i)).toDF("id", "v").write.format("graft")
          .mode("append").save(dir)
      }
      @volatile var failedOnce = false
      def run(expectFailure: Boolean): Unit = {
        val q = spark.readStream.format("graft")
          .option("maxFilesPerTrigger", "1").load(dir)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], batchId: Long) =>
            // fail batch 1 BEFORE writing, once: the batch is uncommitted,
            // so the restart must replay it exactly
            if (batchId == 1 && !failedOnce) {
              failedOnce = true
              throw new RuntimeException("injected mid-backlog failure")
            }
            batch.write.mode("append").parquet(out)
          }
          .option("checkpointLocation", cp).start()
        try {
          q.processAllAvailable()
          assert(!expectFailure, "expected the injected failure")
        } catch {
          case e: Exception if expectFailure =>
            def messages(x: Throwable): Seq[String] =
              if (x == null) Nil
              else Option(x.getMessage).toSeq ++ messages(x.getCause)
            assert(messages(e).exists(_.contains("injected")),
              s"unexpected failure: ${messages(e)}")
        } finally q.stop()
      }
      run(expectFailure = true)
      run(expectFailure = false)
      assert(rowsOf(spark.read.parquet(out)) ==
        Seq(Seq(1L, 1), Seq(2L, 2), Seq(3L, 3), Seq(4L, 4)))
    }
  }

  test("restart from checkpoint resumes at the committed offset") {
    withTempTable { dir =>
      val cp = dir + "-cp"
      val out = dir + "-out"
      Seq((1L, 1)).toDF("id", "v").write.format("graft").save(dir)
      def run(): Unit = {
        // parquet sink: supports checkpoint recovery (memory sink does not)
        val q = spark.readStream.format("graft").load(dir)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", cp).start()
        try q.processAllAvailable() finally q.stop()
      }
      run()
      assert(spark.read.parquet(out).count() == 1)
      // rows appended while the stream is down arrive after restart,
      // without re-emitting the initial snapshot
      Seq((2L, 2)).toDF("id", "v").write.format("graft").mode("append").save(dir)
      run()
      assert(rowsOf(spark.read.parquet(out)) == Seq(Seq(1L, 1), Seq(2L, 2)))
    }
  }
}
