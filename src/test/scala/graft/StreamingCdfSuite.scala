package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.tables.{ChangeFeed, GraftTable}

/** Streaming Change Data Feed:
  * `readStream.format("graft").option("readChangeFeed", "true")` — change
  * rows per commit with `_change_type`/`_commit_version`/`_commit_timestamp`,
  * through the admission-controlled source with checkpoint restart.
  */
class StreamingCdfSuite extends GraftFunSuite {
  import spark.implicits._

  private def startCdf(dir: String, name: String,
      options: Map[String, String] = Map.empty): StreamingQuery =
    spark.readStream.format("graft")
      .option("readChangeFeed", "true").options(options)
      .load(dir)
      .writeStream.format("memory").queryName(name).start()

  private def mkPk(dir: String): Unit =
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft")
      .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)

  /** (change_type, id, v, version) rows of a memory table, sorted. */
  private def changeRows(name: String): Seq[(String, Long, String, Long)] =
    spark.table(name)
      .select(col(ChangeFeed.CHANGE_TYPE), col("id"), col("v"),
        col(ChangeFeed.COMMIT_VERSION))
      .as[(String, Long, String, Long)].collect().toSeq
      .sortBy(t => (t._4, t._1, t._2))

  test("upserts, deletes and a restore stream out as change rows") {
    withTempTable { dir =>
      mkPk(dir) // v0: {1->a, 2->b}
      val t = GraftTable.forPath(spark, dir)
      val q = startCdf(dir, "cdf1")
      try {
        q.processAllAvailable()
        // initial snapshot: inserts at the pinned version
        assert(changeRows("cdf1") == Seq(
          ("insert", 1L, "a", 0L), ("insert", 2L, "b", 0L)))

        t.upsert(Seq((2L, "b2"), (3L, "c")).toDF("id", "v")) // v1 delta
        q.processAllAvailable()
        assert(changeRows("cdf1").filter(_._4 == 1L) == Seq(
          ("upsert", 2L, "b2", 1L), ("upsert", 3L, "c", 1L)))

        t.delete(expr("id = 1")) // v2: rewrite — diff must emit ONLY key 1
        q.processAllAvailable()
        assert(changeRows("cdf1").filter(_._4 == 2L) == Seq(
          ("delete", 1L, "a", 2L)))

        t.update(expr("id = 2"), Map("v" -> lit("B2"))) // v3
        q.processAllAvailable()
        assert(changeRows("cdf1").filter(_._4 == 3L) == Seq(
          ("update_postimage", 2L, "B2", 3L),
          ("update_preimage", 2L, "b2", 3L)))

        // restore to v1 (state {1->a, 2->b2, 3->c}): key 1 comes back,
        // key 2 reverts, key 3 unchanged (suppressed)
        val restored = t.restore(1L) // v4
        q.processAllAvailable()
        assert(changeRows("cdf1").filter(_._4 == restored) == Seq(
          ("insert", 1L, "a", restored),
          ("update_postimage", 2L, "b2", restored),
          ("update_preimage", 2L, "B2", restored)))

        // compaction is a pure rewrite: nothing new in the feed
        t.compaction(force = true)
        q.processAllAvailable()
        assert(changeRows("cdf1").count(_._4 > restored) == 0)
      } finally q.stop()
    }
  }

  test("startingVersion skips the initial snapshot") {
    withTempTable { dir =>
      mkPk(dir) // v0
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((3L, "c")).toDF("id", "v")) // v1
      t.upsert(Seq((4L, "d")).toDF("id", "v")) // v2
      val q = startCdf(dir, "cdf2", Map("startingVersion" -> "2"))
      try {
        q.processAllAvailable()
        assert(changeRows("cdf2") == Seq(("upsert", 4L, "d", 2L)))
      } finally q.stop()
    }
  }

  test("checkpoint restart mid-window loses and duplicates nothing") {
    withTempTable { dir =>
      val cp = dir + "-cp"
      val out = dir + "-out"
      mkPk(dir) // v0
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((3L, "c")).toDF("id", "v")) // v1
      t.delete(expr("id = 2")) // v2
      t.restore(1L) // v3: key 2 comes back
      @volatile var failedOnce = false
      def run(expectFailure: Boolean): Unit = {
        val q = spark.readStream.format("graft")
          .option("readChangeFeed", "true")
          .option("startingVersion", "0") // replay history version-by-version
          .option("maxFilesPerTrigger", "1")
          .load(dir)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], batchId: Long) =>
            if (batchId == 2 && !failedOnce) {
              failedOnce = true
              throw new RuntimeException("injected mid-window failure")
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
      val got = spark.read.parquet(out)
        .select(col(ChangeFeed.CHANGE_TYPE), col("id"), col("v"),
          col(ChangeFeed.COMMIT_VERSION))
        .as[(String, Long, String, Long)].collect().toSeq
        .sortBy(x => (x._4, x._1, x._2))
      assert(got == Seq(
        ("insert", 1L, "a", 0L), ("insert", 2L, "b", 0L),
        ("upsert", 3L, "c", 1L),
        ("delete", 2L, "b", 2L),
        ("insert", 2L, "b", 3L)))
    }
  }

  test("CDC replication: streamed change feed keeps a replica table in sync") {
    // the change feed's primary audience end-to-end: source mutations ->
    // CDF stream -> foreachBatch applies upserts/deletes to a REPLICA
    // graft table, across several micro-batches and a stream restart
    withTempTable { dir =>
      val srcDir = s"$dir/src"
      val repDir = s"$dir/rep"
      val cp = s"$dir/cp"
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(srcDir) // v0
      // replica starts empty with the same layout
      spark.emptyDataset[(Long, String)].toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(repDir)

      def applyChanges(): Unit = {
        val q = spark.readStream.format("graft")
          .option("readChangeFeed", "true")
          .option("maxFilesPerTrigger", "1") // several micro-batches
          .load(srcDir)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            val rep = GraftTable.forPath(batch.sparkSession, repDir)
            // versions apply IN ORDER; within one version upserts and
            // deletes touch disjoint keys (a rewrite diff), so the split
            // below cannot reorder a key's operations
            val versions = batch.select(col(ChangeFeed.COMMIT_VERSION))
              .distinct().collect().map(_.getLong(0)).sorted
            versions.foreach { ver =>
              val b = batch.filter(col(ChangeFeed.COMMIT_VERSION) === ver)
              val dels = b.filter(col(ChangeFeed.CHANGE_TYPE) === "delete")
                .select("id").collect().map(_.getLong(0))
              val ups = b.filter(col(ChangeFeed.CHANGE_TYPE).isin(
                  "insert", "upsert", "update_postimage"))
                .select("id", "v")
              if (!ups.isEmpty) rep.upsert(ups)
              if (dels.nonEmpty) rep.delete(col("id").isin(dels.toSeq: _*))
            }
          }
          .option("checkpointLocation", cp).start()
        try q.processAllAvailable() finally q.stop()
      }

      val t = GraftTable.forPath(spark, srcDir)
      t.upsert(Seq((2L, "b2"), (4L, "d")).toDF("id", "v")) // v1
      t.delete(expr("id = 1")) // v2
      applyChanges()
      def snap(path: String): Seq[(Long, String)] =
        spark.read.format("graft").load(path)
          .as[(Long, String)].collect().toSeq.sorted
      assert(snap(repDir) == snap(srcDir),
        s"replica diverged: ${snap(repDir)} vs ${snap(srcDir)}")

      // more mutations, then resume from the SAME checkpoint
      t.update(expr("id = 3"), Map("v" -> lit("C3"))) // v3
      t.upsert(Seq((5L, "e")).toDF("id", "v")) // v4
      t.delete(expr("id = 4")) // v5
      applyChanges()
      assert(snap(repDir) == snap(srcDir),
        s"replica diverged after restart: ${snap(repDir)} vs ${snap(srcDir)}")
      assert(snap(repDir) == Seq((2L, "b2"), (3L, "C3"), (5L, "e")))
    }
  }

  test("non-PK data-changing commit fails the CDF stream unless ignoreChanges") {
    withTempTable { dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.format("graft").save(dir) // non-PK
      val q = startCdf(dir, "cdf4")
      try {
        q.processAllAvailable()
        // a RESTORE is the non-PK commit shape no stream can express:
        // removes-only, but it REVERTS live rows rather than deleting them
        // (a whole-file 'delete' commit, by contrast, now streams — its
        // removed rows ARE the deletions; see the partition-delete test)
        Seq((5L, "e")).toDF("id", "v").write.format("graft")
          .mode("append").save(dir) // v1
        GraftTable.forPath(spark, dir).restore(0L) // v2: removes-only revert
        val e = intercept[Exception] { q.processAllAvailable() }
        def messages(x: Throwable): Seq[String] =
          if (x == null) Nil
          else Option(x.getMessage).toSeq ++ messages(x.getCause)
        assert(messages(e).exists(_.contains("graft_table_changes")))
      } finally q.stop()
      // ignoreChanges: the commit is skipped, the stream proceeds
      Seq((9L, "z")).toDF("id", "v").write.format("graft")
        .mode("append").save(dir) // v3
      val q2 = startCdf(dir, "cdf4b", Map("ignoreChanges" -> "true",
        "startingVersion" -> "2"))
      try {
        q2.processAllAvailable()
        assert(changeRows("cdf4b") == Seq(("insert", 9L, "z", 3L)))
      } finally q2.stop()
    }
  }

  test("non-PK partition-scoped metadata-only delete streams as deletions") {
    withTempTable { dir =>
      // range-partitioned non-PK table: deleting a whole partition removes
      // files whole (metadata-only commit, no adds) — the removed files'
      // rows ARE the deletions, so the CDF stream emits them without
      // needing a key to pair pre/post images
      Seq((1L, "us", "a"), (2L, "us", "b"), (3L, "de", "c"))
        .toDF("id", "country", "v")
        .write.format("graft").partitionBy("country").save(dir)
      val q = startCdf(dir, "cdf_pdel")
      try {
        q.processAllAvailable()
        GraftTable.forPath(spark, dir).delete(expr("country = 'de'"))
        q.processAllAvailable()
        val got = changeRows("cdf_pdel")
        assert(got.contains(("delete", 3L, "c", 1L)),
          s"partition delete must stream as delete rows: $got")
        assert(got.count(_._1 == "delete") == 1,
          s"only the dropped partition's rows are deletions: $got")
        // batch feed agrees on the same window
        val batch = ChangeFeed.changes(spark, dir, 1, 1)
          .select(col(ChangeFeed.CHANGE_TYPE), col("id"))
          .as[(String, Long)].collect().toSeq
        assert(batch == Seq(("delete", 3L)), s"batch feed disagrees: $batch")
      } finally q.stop()
    }
  }

  test("CDF stream survives a map column on a PK table") {
    withTempTable { dir =>
      Seq((1L, Map("a" -> "1")), (2L, Map("b" -> "2")))
        .toDF("id", "attrs").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val q = startCdf(dir, "cdf_map")
      try {
        q.processAllAvailable()
        // the update routes through the diff reader, whose change
        // detection must not build a codegen ORDERING over the map column
        // (maps are unorderable — only equality is needed)
        GraftTable.forPath(spark, dir).update(expr("id = 1"),
          Map("attrs" -> map(lit("a"), lit("9"))))
        q.processAllAvailable()
        val got = spark.table("cdf_map")
          .select(col(ChangeFeed.CHANGE_TYPE), col("id"),
            col("attrs")("a").as("a"), col(ChangeFeed.COMMIT_VERSION))
          .as[(String, Long, String, Long)].collect().toSeq
          .filter(_._4 == 1L).sortBy(_._1)
        // id=1 changed -> pre/post pair; id=2 carried over UNchanged ->
        // suppressed (map equality, not byte luck)
        assert(got == Seq(
          ("update_postimage", 1L, "9", 1L),
          ("update_preimage", 1L, "1", 1L)),
          s"map-column diff emitted: $got")
      } finally q.stop()
    }
  }

  test("streamed feed matches the batch ChangeFeed for the same window") {
    withTempTable { dir =>
      mkPk(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((2L, "b2"), (3L, "c")).toDF("id", "v")) // v1
      t.update(expr("id = 3"), Map("v" -> lit("C"))) // v2
      t.delete(expr("id = 1")) // v3
      val q = startCdf(dir, "cdf5", Map("startingVersion" -> "1"))
      try {
        q.processAllAvailable()
        val streamed = changeRows("cdf5")
        val batch = t.changes(1L, 3L)
          .select(col(ChangeFeed.CHANGE_TYPE), col("id"), col("v"),
            col(ChangeFeed.COMMIT_VERSION))
          .as[(String, Long, String, Long)].collect().toSeq
          .sortBy(x => (x._4, x._1, x._2))
        assert(streamed == batch)
      } finally q.stop()
    }
  }
}
