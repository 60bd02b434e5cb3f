package graft

import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Reference-parity `StarTable` API conveniences on [[GraftTable]]:
  * no-arg delete, unconditional update, the fluent TableCreator,
  * registerMergeOperator-with-name, and createMaterialView layout
  * options. */
class TableApiSuite extends GraftFunSuite {
  import spark.implicits._

  test("delete() clears every row; update(set) touches every row") {
    withTempTable { dir =>
      Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "n")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.update(Map("n" -> (col("n") * 10)))
      assert(t.toDF.select(sum("n")).as[Long].head() == 60L)
      t.updateExpr(Map("n" -> "n + 1"))
      assert(t.toDF.select(sum("n")).as[Long].head() == 63L)
      t.delete()
      assert(t.toDF.count() == 0)
    }
  }

  test("TableCreator builder creates a PK table with the fluent options") {
    withTempTable { dir =>
      GraftTable.create()
        .data(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
        .path(dir)
        .hashPartitions("id")
        .hashBucketNum(2)
        .create()
      val t = GraftTable.forPath(spark, dir)
      assert(t.snapshot.tableInfo.hashColumns == Seq("id"))
      assert(t.snapshot.tableInfo.bucketNum == 2)
      // PK layout is live: upsert works
      t.upsert(Seq((1L, "A"), (3L, "c")).toDF("id", "v"))
      assert(rowsOf(t.toDF.select("id", "v")) ==
        Seq(Seq(1L, "A"), Seq(2L, "b"), Seq(3L, "c")))
    }
  }

  test("registerMergeOperator registers a class under the given name") {
    GraftTable.registerMergeOperator(spark,
      classOf[TestMaxMergeOp].getName, "tapi_max")
    withTempTable { dir =>
      Seq((1L, 5)).toDF("id", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 3)).toDF("id", "n"))
      val got = spark.read.format("graft")
        .option("mergeOperators", "n:tapi_max").load(dir)
        .select("n").as[Int].head()
      assert(got == 5, s"max merge op should keep 5, got $got")
    }
  }

  test("createMaterialView applies layout options and registers the name") {
    withTempTable { base => withTempTable { view =>
      Seq((1L, "us", 10), (2L, "de", 20), (3L, "us", 30))
        .toDF("id", "country", "amt").write.format("graft").save(base)
      spark.sql(s"CREATE TABLE tapi_base USING graft LOCATION '$base'")
      try {
        GraftTable.createMaterialView(spark, viewName = "",
          viewPath = view,
          sqlText = s"SELECT id, country, amt FROM tapi_base WHERE amt > 5",
          hashPartitions = "id", hashBucketNum = 2)
        val vt = GraftTable.forPath(spark, view)
        assert(vt.snapshot.tableInfo.hashColumns == Seq("id"),
          "MV table must carry the requested PK layout")
        // stale after a base write; updateMaterialView refreshes
        Seq((4L, "fr", 40)).toDF("id", "country", "amt")
          .write.format("graft").mode("append").save(base)
        assert(vt.updateMaterialView(), "stale view must refresh")
        assert(GraftTable.forPath(spark, view).toDF.count() == 4)
      } finally spark.sql("DROP TABLE IF EXISTS tapi_base")
    } }
  }

  test("TableCreator refuses to clobber an existing table (ErrorIfExists)") {
    withTempTable { dir =>
      Seq((1L, "keep")).toDF("id", "v").write.format("graft").save(dir)
      val e = intercept[Exception] {
        GraftTable.create().data(Seq((9L, "new")).toDF("id", "v"))
          .path(dir).create()
      }
      assert(e.getMessage.contains("already exists"),
        s"create() over an existing table must error: ${e.getMessage}")
      // the existing table's data survives the failed create
      val got = spark.read.format("graft").load(dir)
        .select("v").as[String].collect().toSeq
      assert(got == Seq("keep"), s"existing data must be untouched: $got")
    }
  }

  test("createMaterialView rejects a PK layout whose view SQL has duplicate keys") {
    withTempTable { base => withTempTable { view =>
      Seq((1L, "us", 10), (1L, "us", 20), (2L, "de", 30))
        .toDF("id", "country", "amt").write.format("graft").save(base)
      spark.sql(s"CREATE TABLE tapi_base3 USING graft LOCATION '$base'")
      try {
        val e = intercept[IllegalStateException] {
          GraftTable.createMaterialView(spark, viewName = "", viewPath = view,
            sqlText = "SELECT id, country, amt FROM tapi_base3",
            hashPartitions = "id", hashBucketNum = 2)
        }
        assert(e.getMessage.contains("multiple rows"),
          s"dup-key PK view must fail loudly: ${e.getMessage}")
        // an aggregated (unique-key) view over the same base is fine
        GraftTable.createMaterialView(spark, viewName = "", viewPath = view,
          sqlText =
            "SELECT id, sum(amt) AS amt FROM tapi_base3 GROUP BY id",
          hashPartitions = "id", hashBucketNum = 2)
        assert(GraftTable.forPath(spark, view).toDF.count() == 2)
      } finally spark.sql("DROP TABLE IF EXISTS tapi_base3")
    } }
  }

  test("refresh re-checks key uniqueness after the base grows duplicates") {
    withTempTable { base => withTempTable { view =>
      Seq((1L, 10), (2L, 20)).toDF("id", "amt")
        .write.format("graft").save(base)
      spark.sql(s"CREATE TABLE tapi_base4 USING graft LOCATION '$base'")
      try {
        GraftTable.createMaterialView(spark, viewName = "", viewPath = view,
          sqlText = "SELECT id, amt FROM tapi_base4",
          hashPartitions = "id", hashBucketNum = 2)
        // base grows a duplicate id — the stale refresh must refuse to
        // rebuild a view that would silently drop one of the rows
        Seq((1L, 99)).toDF("id", "amt")
          .write.format("graft").mode("append").save(base)
        val e = intercept[IllegalStateException] {
          GraftTable.forPath(spark, view).updateMaterialView()
        }
        assert(e.getMessage.contains("multiple rows"),
          s"refresh over dup keys must fail loudly: ${e.getMessage}")
      } finally spark.sql("DROP TABLE IF EXISTS tapi_base4")
    } }
  }

  test("a name already bound to another path fails registration loudly") {
    withTempTable { p1 => withTempTable { p2 => withTempTable { view =>
      Seq((1L, "old")).toDF("id", "v").write.format("graft").save(p1)
      spark.sql(s"CREATE TABLE tapi_bound USING graft LOCATION '$p1'")
      try {
        // conflicting binding: the name must NOT silently keep pointing at
        // the old table while the caller believes it registered the new one
        val e = intercept[IllegalStateException] {
          GraftTable.create().data(Seq((3L, "x")).toDF("id", "v"))
            .path(p2).shortTableName("tapi_bound").create()
        }
        assert(e.getMessage.contains("already bound"),
          s"conflicting name registration must error: ${e.getMessage}")
        // SAME name+path twice (MV re-create) is an idempotent no-op
        GraftTable.createMaterialView(spark, viewName = "tapi_bound_mv",
          viewPath = view, sqlText = "SELECT 1 AS one")
        GraftTable.createMaterialView(spark, viewName = "tapi_bound_mv",
          viewPath = view, sqlText = "SELECT 1 AS one")
        assert(spark.table("tapi_bound_mv").count() == 1)
      } finally {
        spark.sql("DROP TABLE IF EXISTS tapi_bound")
        spark.sql("DROP TABLE IF EXISTS tapi_bound_mv")
      }
    } } }
  }

  test("createMaterialView rejects hashPartitions without a bucket count") {
    withTempTable { base => withTempTable { view =>
      Seq((1L, 10)).toDF("id", "amt").write.format("graft").save(base)
      spark.sql(s"CREATE TABLE tapi_base2 USING graft LOCATION '$base'")
      try {
        val e = intercept[IllegalArgumentException] {
          GraftTable.createMaterialView(spark, viewName = "", viewPath = view,
            sqlText = "SELECT id, amt FROM tapi_base2",
            hashPartitions = "id") // hashBucketNum left at -1
        }
        assert(e.getMessage.contains("hashBucketNum"),
          s"missing bucket count must be an explicit error: ${e.getMessage}")
      } finally spark.sql("DROP TABLE IF EXISTS tapi_base2")
    } }
  }
  test("detail() and partitions(): manifest-only table introspection") {
    withTempTable { dir =>
      Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"))
        .toDF("id", "lang", "v").write.format("graft")
        .option("rangePartitions", "lang")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((4L, "en", "d")).toDF("id", "lang", "v"))

      val d = t.detail().collect().head
      assert(d.getAs[String]("rangeColumns") == "lang")
      assert(d.getAs[String]("hashColumns") == "id")
      assert(d.getAs[Int]("bucketNum") == 2)
      assert(d.getAs[Long]("version") == 1L)
      assert(d.getAs[Long]("numFiles") > 0 &&
        d.getAs[Long]("sizeInBytes") > 0)
      assert(d.getAs[Long]("numDeltaFiles") > 0, "upsert left a delta stack")

      val parts = t.partitions().collect()
        .map(r => r.getAs[String]("partition") ->
          (r.getAs[Long]("numFiles"), r.getAs[Long]("approxRows"))).toMap
      assert(parts.keySet == Set("lang=en", "lang=de"), parts.keySet)
      assert(parts("lang=de")._2 == 1L, s"de rows: ${parts("lang=de")}")
      // en: 2 base rows + 1 delta row, all keys distinct -> 3 exact
      assert(parts("lang=en")._2 == 3L, s"en rows: ${parts("lang=en")}")
      // zero data I/O claim: both run with scans disabled would be nice,
      // but the cheap proxy is that they answer from the SNAPSHOT even
      // with the parquet files unreadable — rename one data file away
      val snap = t.snapshot
      val f = snap.files.head.path
      val p = java.nio.file.Paths.get(dir, f)
      java.nio.file.Files.move(p, p.resolveSibling(p.getFileName.toString + ".bak"))
      try {
        assert(GraftTable.forPath(spark, dir).detail().count() == 1)
        assert(GraftTable.forPath(spark, dir).partitions().count() == 2)
      } finally {
        java.nio.file.Files.move(p.resolveSibling(p.getFileName.toString + ".bak"), p)
      }
    }
  }
  test("applyChanges: mixed multi-change CDC batch == sequential replay, " +
      "one atomic commit, deletes win sequence ties") {
    withTempTable { dir =>
      import org.apache.spark.sql.functions._
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L), (4L, "d", 1L))
        .toDF("id", "v", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      val v0 = t.snapshot.version
      // per-key histories: 1 updated twice (latest wins), 2 deleted after
      // an update, 3 delete-then-reinsert, 5 inserted, 6 insert+delete tie
      // at one sequence (delete must win), 4 untouched
      val batch = Seq(
        (1L, "a1", 2L, "u", 10L), (1L, "a2", 3L, "u", 20L),
        (2L, "b1", 2L, "u", 10L), (2L, null, 0L, "d", 20L),
        (3L, null, 0L, "D", 10L), (3L, "c2", 9L, "u", 20L),
        (5L, "e", 5L, "i", 10L),
        (6L, "f", 6L, "u", 10L), (6L, null, 0L, "delete", 10L))
        .toDF("id", "v", "n", "op", "seq")
      t.applyChanges(batch, "op", Seq("seq"))
      assert(t.snapshot.version == v0 + 1, "one atomic commit")
      val got = spark.read.format("graft").load(dir)
        .collect().map(_.toString).sorted.toSeq
      // sequential replay of the same histories
      val want = Seq((1L, "a2", 3L), (3L, "c2", 9L), (4L, "d", 1L),
        (5L, "e", 5L)).map { case (i, v, n) => s"[$i,$v,$n]" }.sorted
      assert(got == want, s"got $got\nwant $want")

      // change feed of the apply commit carries both upserts and deletes
      val ops = graft.tables.ChangeFeed
        .changes(spark, dir, v0 + 1, v0 + 1)
        .select(col("id"), col("_change_type"))
        .as[(Long, String)].collect().toMap
      assert(ops.get(2L).exists(_.contains("delete")), ops)

      // without sequence columns, a multi-change key is an in-plan error
      val dup = Seq((7L, "x", 1L, "u"), (7L, "y", 2L, "u"))
        .toDF("id", "v", "n", "op")
      val e = intercept[Exception] { t.applyChanges(dup, "op") }
      assert(e.getMessage != null)
      // single-change-per-key batch without sequences is fine
      t.applyChanges(Seq((8L, "z", 8L, "u")).toDF("id", "v", "n", "op"), "op")
      assert(spark.read.format("graft").load(dir)
        .filter(col("id") === 8L).count() == 1)
    }
  }

  test("applyChanges: a NULL op value is an in-plan error, never a " +
      "silently-dropped change") {
    withTempTable { dir =>
      Seq((1L, "a")).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      // the NULL-op row would WIN the window (seq 2) and then vanish from
      // both the live and tombstone branches — must fail loudly instead
      val e = intercept[Exception] {
        GraftTable.forPath(spark, dir).applyChanges(
          Seq((1L, "new", null: String, 2L), (1L, "old", "u", 1L))
            .toDF("id", "v", "op", "seq"), "op", Seq("seq"))
      }
      assert(e.getMessage != null)
      assert(spark.read.format("graft").load(dir)
        .as[(Long, String)].collect().toMap == Map(1L -> "a"),
        "failed apply must leave the table untouched")
    }
  }

  test("applyChanges refuses operator-merge tables (CDC images are " +
      "absolute; a replay would double-fold)") {
    withTempTable { dir =>
      Seq((1L, 5L)).toDF("id", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .option("graft.mergeOperators", "n:sum")
        .save(dir)
      val e = intercept[IllegalArgumentException] {
        GraftTable.forPath(spark, dir).applyChanges(
          Seq((1L, 7L, "u")).toDF("id", "n", "op"), "op")
      }
      assert(e.getMessage.contains("merge operators"), e.getMessage)
    }
  }

  test("applyChangesStream: CDC stream ingests microbatches atomically") {
    withTempTable { dir =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      val ckpt = java.nio.file.Files
        .createTempDirectory("apply_ck_").toString
      val input = MemoryStream[(Long, String, String, Long)]
      val q = GraftTable.forPath(spark, dir).applyChangesStream(
        input.toDF().toDF("id", "v", "op", "seq"), "op", ckpt, Seq("seq"))
      try {
        input.addData((1L, "a1", "u", 1L), (1L, "a2", "u", 2L),
          (3L, "c", "u", 1L))
        q.processAllAvailable()
        assert(spark.read.format("graft").load(dir)
          .as[(Long, String)].collect().toMap ==
          Map(1L -> "a2", 2L -> "b", 3L -> "c"))
        input.addData((2L, null, "d", 1L))
        q.processAllAvailable()
        assert(spark.read.format("graft").load(dir)
          .as[(Long, String)].collect().toMap ==
          Map(1L -> "a2", 3L -> "c"))
      } finally q.stop()
    }
  }

  test("replicateTo: a cloned replica follows the source through upserts " +
      "and deletes via the CDF stream") {
    withTempTable { src => withTempTable { scratch =>
      import org.apache.spark.sql.functions._
      val dest = scratch + "/replica"
      (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.cloneTo(dest) // instant zero-copy initial state
      val ckpt = java.nio.file.Files
        .createTempDirectory("repl_ck_").toString
      val q = t.replicateTo(dest, ckpt)
      try {
        // cloned replica: the stream starts AFTER the clone's source
        // version — no full-snapshot replay lands on the replica
        q.processAllAvailable()
        assert(graft.meta.SnapshotManagement.snapshot(
            graft.meta.SnapshotManagement.normalize(dest)).version == 0L,
          "an idle clone-fed replica must not receive a snapshot replay")
        t.upsert(Seq((1L, "A"), (31L, "new")).toDF("id", "v"))
        t.delete(col("id") === 2L)
        t.upsert(Seq((1L, "A2")).toDF("id", "v")) // same key, later commit
        q.processAllAvailable()
        def state(p: String) = spark.read.format("graft").load(p)
          .as[(Long, String)].collect().toMap
        assert(state(dest) == state(src),
          s"replica diverged:\n src ${state(src)}\n dst ${state(dest)}")
        // replica keeps following
        t.delete(col("id") === 31L)
        q.processAllAvailable()
        assert(state(dest) == state(src))

        // OVERWRITE on the source: CDF emits delete(pre-state) +
        // insert(new) at ONE version; surviving keys must keep their new
        // image in the replica (the insert outranks the same-version
        // delete), removed keys must tombstone
        (1L to 10L).map(i => (i, s"ow$i")).toDF("id", "v")
          .write.format("graft").mode("overwrite").save(src)
        q.processAllAvailable()
        assert(state(dest) == state(src),
          s"overwrite diverged:\n src ${state(src)}\n dst ${state(dest)}")
        assert(state(dest).size == 10 && state(dest)(3L) == "ow3")

        // RESTART from the same checkpoint: no replays double-apply, no
        // window is skipped — the exactly-once claim
        q.stop()
        t.upsert(Seq((5L, "after-restart")).toDF("id", "v"))
        t.delete(col("id") === 6L)
        val q2 = t.replicateTo(dest, ckpt)
        try {
          q2.processAllAvailable()
          assert(state(dest) == state(src),
            s"post-restart divergence:\n src ${state(src)}\n dst ${state(dest)}")
        } finally q2.stop()
      } finally q.stop()
    } }
  }

  test("replication under source schema evolution: the stream fails " +
      "LOUDLY (never silently drops the new column) and a restart " +
      "evolves the replica") {
    withTempTable { src => withTempTable { scratch =>
      import org.apache.spark.sql.functions._
      val dest = scratch + "/replica"
      Seq((1L, "a")).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.cloneTo(dest)
      val ckpt = java.nio.file.Files
        .createTempDirectory("repl_evo_ck_").toString
      // selfHeal OFF: this test pins the raw loud-fail contract
      val q = t.replicateTo(dest, ckpt, selfHealSchemaEvolution = false)
      try {
        spark.conf.set("spark.graft.schema.autoMerge.enabled", "true")
        t.upsert(Seq((2L, "b", 7L)).toDF("id", "v", "extra"))
        val e = intercept[Exception] { q.processAllAvailable() }
        assert(e.getMessage.contains("extra") ||
          Option(e.getCause).exists(_.getMessage.contains("extra")),
          s"schema change must fail naming the column: ${e.getMessage}")
      } finally {
        spark.conf.unset("spark.graft.schema.autoMerge.enabled")
        q.stop()
      }
      // restart on the SAME checkpoint: the replayed window carries the
      // new column and the replica evolves to match
      val q2 = t.replicateTo(dest, ckpt, selfHealSchemaEvolution = false)
      try {
        q2.processAllAvailable()
        val d = spark.read.format("graft").load(dest)
        assert(d.columns.map(_.toLowerCase).contains("extra"),
          s"replica must gain the column: ${d.columns.mkString(",")}")
        assert(d.filter(col("id") === 2L).select("extra")
          .as[Long].head() == 7L)
      } finally q2.stop()
    } }
  }

  test("SELF-HEALING replication: source schema evolution restarts the " +
      "CDF reader automatically — replica evolves with NO manual restart") {
    withTempTable { src => withTempTable { scratch =>
      import org.apache.spark.sql.functions._
      val dest = scratch + "/replica"
      Seq((1L, "a")).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.cloneTo(dest)
      val ckpt = java.nio.file.Files
        .createTempDirectory("repl_heal_ck_").toString
      val q = t.replicateTo(dest, ckpt) // default: selfHeal ON
      try {
        spark.conf.set("spark.graft.schema.autoMerge.enabled", "true")
        t.upsert(Seq((2L, "b", 7L)).toDF("id", "v", "extra"))
        // ONE call, no intercept, no manual restart: the facade rides
        // through the deliberate failure + monitor restart
        q.processAllAvailable()
        val d = spark.read.format("graft").load(dest)
        assert(d.columns.map(_.toLowerCase).contains("extra"),
          s"replica must gain the column: ${d.columns.mkString(",")}")
        assert(d.filter(col("id") === 2L).select("extra")
          .as[Long].head() == 7L)
        assert(q.isActive, "healed query must still be running")
        // the healed stream keeps replicating, including the new column
        t.upsert(Seq((3L, "c", 9L)).toDF("id", "v", "extra"))
        t.delete(col("id") === 1L)
        q.processAllAvailable()
        def state(p: String) = spark.read.format("graft").load(p)
          .select("id", "v", "extra").as[(Long, String, Option[Long])]
          .collect().map { case (k, v2, e) => k -> (v2, e) }.toMap
        assert(spark.read.format("graft").load(dest)
            .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
        assert(state(dest) == state(src))
      } finally {
        spark.conf.unset("spark.graft.schema.autoMerge.enabled")
        q.stop()
      }
    } }
  }

  test("self-heal hot-loop guard: persistent evolution-classified failures " +
      "terminate the facade after the consecutive-restart cap instead of " +
      "looping forever") {
    import org.apache.spark.sql.streaming.Trigger
    val restarts = new java.util.concurrent.atomic.AtomicInteger(0)
    // every (re)start fails its first batch with an evolution-classified
    // error and never completes one — the persistent-failure shape the cap
    // exists for (e.g. a false-positive message match)
    def failing(): org.apache.spark.sql.streaming.StreamingQuery = {
      restarts.incrementAndGet()
      spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .writeStream
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new GraftTable.ReplicationSchemaEvolved(
            GraftTable.EVOLVED_SENTINEL + " synthetic persistent failure")
        }
        .trigger(Trigger.ProcessingTime("10 milliseconds"))
        .start()
    }
    val facade = new GraftTable.SelfHealingQuery(() => failing(), failing(),
      maxConsecutiveHeals = 3, healBackoffBaseMs = 1L)
    try {
      val e = intercept[Exception] { facade.awaitTermination() }
      def texts(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ texts(t.getCause)
      assert(texts(e).exists(_.contains("self-heal aborted")),
        s"must surface the abort reason, got: ${texts(e)}")
      assert(!facade.isActive, "facade must terminate, not keep healing")
      assert(restarts.get() == 4, // first start + cap restarts, no more
        s"expected 1 + cap = 4 starts, got ${restarts.get()}")
      assert(facade.exception.nonEmpty,
        "exception()-polling callers must see a failure")
    } finally facade.stop()
  }

  test("replicationStatus: lag counts only change-bearing unapplied " +
      "versions and returns to zero after a drain") {
    withTempTable { src => withTempTable { scratch =>
      import org.apache.spark.sql.functions._
      val dest = scratch + "/replica"
      (1L to 20L).map(i => (i, i)).toDF("id", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.cloneTo(dest)
      // cloned, never-synced: in sync as of the clone version
      val st0 = GraftTable.replicationStatus(spark, dest)
      assert(st0.pendingVersions == 0L && st0.inSync, s"fresh clone: $st0")
      val ckpt = java.nio.file.Files
        .createTempDirectory("repl_lag_ck_").toString
      val q = t.replicateTo(dest, ckpt)
      try {
        q.processAllAvailable()
        t.upsert(Seq((1L, 100L), (21L, 21L)).toDF("id", "n"))
        t.delete(col("id") === 2L)
        val behind = t.replicationStatus(dest)
        assert(behind.pendingVersions == 2L,
          s"two change-bearing versions must pend: $behind")
        assert(!behind.inSync)
        q.processAllAvailable()
        val synced = t.replicationStatus(dest)
        assert(synced.inSync && synced.appliedVersion == synced.sourceVersion,
          s"after drain: $synced")
        // pure rewrites are NOT lag: replica state is already equal
        t.compaction(force = true)
        val afterCompaction = t.replicationStatus(dest)
        assert(afterCompaction.inSync,
          s"compaction must not count as lag: $afterCompaction")
        // wrong-source guard on the instance form
        val other = scratch + "/other"
        Seq((1L, 1L)).toDF("id", "n").write.format("graft").save(other)
        intercept[IllegalArgumentException] {
          GraftTable.forPath(spark, other).replicationStatus(dest)
        }
      } finally q.stop()
    } }
  }

  test("replicationStatus is CROSS-DRIVER: the applied version rides the " +
      "apply commit itself — no driver-local sidecar, a session that " +
      "never ran the stream reads the same status, and a rewound source " +
      "still fails loudly") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/replica"
      (1L to 10L).map(i => (i, i)).toDF("id", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.cloneTo(dest)
      val ckpt = java.nio.file.Files
        .createTempDirectory("repl_xd_ck_").toString
      val q = t.replicateTo(dest, ckpt)
      try {
        t.upsert(Seq((1L, 100L), (11L, 11L)).toDF("id", "n"))
        q.processAllAvailable()
        // the watermark landed IN the apply commit, not in a local file
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(dest, "_graft_replication.json")),
          "no driver-local sidecar may be written")
        val st = GraftTable.replicationStatus(spark, dest)
        assert(st.inSync && st.sourcePath ==
          graft.meta.SnapshotManagement.normalize(src), s"status: $st")
        // a session that never ran the stream sees the same status — it
        // reads only the replica's log
        assert(GraftTable.replicationStatus(spark.newSession(), dest) == st)
      } finally q.stop()

      // LEGACY sidecar fallback: a replica whose only record is the old
      // driver-local file format still reports
      val dest2 = scratch + "/replica2"
      Seq((1L, 1L)).toDF("id", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dest2)
      graft.llm.SyncSidecar.write(
        graft.meta.SnapshotManagement.normalize(dest2),
        GraftTable.REPLICATION_SYNC_FILE,
        graft.meta.SnapshotManagement.normalize(src), 1L)
      val stLegacy = GraftTable.replicationStatus(spark, dest2)
      assert(stLegacy.sourcePath ==
          graft.meta.SnapshotManagement.normalize(src) &&
        stLegacy.appliedVersion == 1L, s"legacy fallback: $stLegacy")
      // rewound source: the record claims an applied version beyond the
      // source's head — must fail the probe, never report in-sync
      graft.llm.SyncSidecar.write(
        graft.meta.SnapshotManagement.normalize(dest2),
        GraftTable.REPLICATION_SYNC_FILE,
        graft.meta.SnapshotManagement.normalize(src), 10000L)
      val e = intercept[IllegalArgumentException] {
        GraftTable.replicationStatus(spark, dest2)
      }
      assert(e.getMessage.contains("rewound"), e.getMessage)
    } }
  }

  test("replicationStatus under an OBJECT-STORE MetaStore: replication " +
      "and the lag probe both work with no POSIX log") {
    import graft.meta._
    val prev = SnapshotManagement.store
    SnapshotManagement.setStore(
      new ObjectStoreMetaStore(new InMemoryObjectStoreClient))
    try withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/replica"
      (1L to 10L).map(i => (i, i)).toDF("id", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      assert(!java.nio.file.Files.exists(FsMetaStore.logDir(src)),
        "log must live in the object store")
      val t = GraftTable.forPath(spark, src)
      t.cloneTo(dest)
      val ckpt = java.nio.file.Files
        .createTempDirectory("repl_os_ck_").toString
      val q = t.replicateTo(dest, ckpt)
      try {
        t.upsert(Seq((1L, 100L), (11L, 11L)).toDF("id", "n"))
        t.delete(col("id") === 2L)
        q.processAllAvailable()
        val st = t.replicationStatus(dest)
        assert(st.inSync, s"object-store status: $st")
        assert(spark.read.format("graft").load(dest)
          .as[(Long, Long)].collect().toMap ==
          spark.read.format("graft").load(src)
            .as[(Long, Long)].collect().toMap)
        // and lag is visible while behind
        t.upsert(Seq((3L, 33L)).toDF("id", "n"))
        val behind = t.replicationStatus(dest)
        assert(behind.pendingVersions == 1L, s"behind: $behind")
      } finally q.stop()
    } } finally SnapshotManagement.setStore(prev)
  }

  test("one source feeds TWO replicas concurrently (dest-qualified " +
      "query names)") {
    withTempTable { src => withTempTable { scratch =>
      import org.apache.spark.sql.functions._
      val d1 = scratch + "/r1"; val d2 = scratch + "/r2"
      (1L to 10L).map(i => (i, i)).toDF("id", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.cloneTo(d1); t.cloneTo(d2)
      val ck1 = java.nio.file.Files.createTempDirectory("two_ck1_").toString
      val ck2 = java.nio.file.Files.createTempDirectory("two_ck2_").toString
      val q1 = t.replicateTo(d1, ck1)
      // pre-fix this second start failed: duplicate active query name
      val q2 = t.replicateTo(d2, ck2)
      def state(p: String) = spark.read.format("graft").load(p)
        .as[(Long, Long)].collect().toMap
      try {
        t.upsert(Seq((1L, 11L), (11L, 11L)).toDF("id", "n"))
        q1.processAllAvailable(); q2.processAllAvailable()
        assert(state(d1) == state(src) && state(d2) == state(src))
      } finally { q1.stop(); q2.stop() }
    } }
  }

  test("chained replication A -> B -> C: the tail replica follows the " +
      "head through B's apply commits") {
    withTempTable { a => withTempTable { scratch =>
      import org.apache.spark.sql.functions._
      val b = scratch + "/b"; val c = scratch + "/c"
      (1L to 20L).map(i => (i, i)).toDF("id", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(a)
      val ta = GraftTable.forPath(spark, a)
      ta.cloneTo(b)
      GraftTable.forPath(spark, b).cloneTo(c)
      val ck1 = java.nio.file.Files
        .createTempDirectory("chain_ck1_").toString
      val ck2 = java.nio.file.Files
        .createTempDirectory("chain_ck2_").toString
      val q1 = ta.replicateTo(b, ck1)
      val q2 = GraftTable.forPath(spark, b).replicateTo(c, ck2)
      def state(p: String) = spark.read.format("graft").load(p)
        .as[(Long, Long)].collect().toMap
      try {
        ta.upsert(Seq((1L, 100L), (21L, 21L)).toDF("id", "n"))
        ta.delete(col("id") === 2L)
        q1.processAllAvailable() // A's changes land in B as apply commits
        q2.processAllAvailable() // B's apply commits stream on to C
        assert(state(b) == state(a), "B diverged from A")
        assert(state(c) == state(a), "C diverged through the chain")
      } finally { q1.stop(); q2.stop() }
    } }
  }

  test("replicateTo soak: randomized upserts/deletes/overwrites/" +
      "compactions/rebuckets — replica equals source after every round") {
    withTempTable { src => withTempTable { scratch =>
      import org.apache.spark.sql.functions._
      val dest = scratch + "/replica"
      val rnd = new scala.util.Random(83)
      (1L to 40L).map(i => (i, i)).toDF("id", "n")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.cloneTo(dest)
      val ckpt = java.nio.file.Files
        .createTempDirectory("repl_soak_ck_").toString
      val q = t.replicateTo(dest, ckpt)
      def state(p: String) = spark.read.format("graft").load(p)
        .as[(Long, Long)].collect().toMap
      try {
        (1 to 8).foreach { round =>
          rnd.nextInt(6) match {
            case 0 | 1 =>
              t.upsert((0 until 1 + rnd.nextInt(4))
                .map(_ => (1L + rnd.nextInt(60), rnd.nextInt(500).toLong))
                .distinctBy(_._1).toDF("id", "n"))
            case 2 =>
              t.delete(col("id") === (1L + rnd.nextInt(60)))
            case 3 => // full overwrite: delete+insert ties per key
              (1L to (20L + rnd.nextInt(20)))
                .map(i => (i, round * 1000L + i)).toDF("id", "n")
                .write.format("graft").mode("overwrite").save(src)
            case 4 => // rewrite: must be INVISIBLE to the feed
              t.compaction(force = true)
            case _ => // layout change: also invisible row-wise
              t.rebucket(1 + rnd.nextInt(4))
          }
          q.processAllAvailable()
          assert(state(dest) == state(src),
            s"round $round diverged:\n src ${state(src)}\n dst ${state(dest)}")
        }
      } finally q.stop()
    } }
  }

  test("applyChanges fuzz: random change batches == naive per-key fold") {
    withTempTable { dir =>
      import org.apache.spark.sql.functions._
      val rnd = new scala.util.Random(71)
      (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      val state = scala.collection.mutable.Map(
        (1L to 40L).map(i => i -> s"v$i"): _*)
      (1 to 4).foreach { round =>
        val changes = (0 until 30).map { j =>
          val id = 1L + rnd.nextInt(60)
          if (rnd.nextInt(4) == 0) (id, null: String, "d", j.toLong)
          else (id, s"r$round-$j", "u", j.toLong)
        }
        // naive fold: apply in sequence order, deletes win ties (no ties
        // here — seq is unique per batch)
        changes.sortBy(_._4).foreach { case (id, v, op, _) =>
          if (op == "d") state.remove(id) else state(id) = v
        }
        t.applyChanges(changes.toDF("id", "v", "op", "seq"),
          "op", Seq("seq"))
        val got = spark.read.format("graft").load(dir)
          .as[(Long, String)].collect().toMap
        assert(got == state.toMap,
          s"round $round diverged: extra=${got.toSet -- state.toSet} " +
            s"missing=${state.toSet -- got.toSet}")
      }
    }
  }
}

/** Test merge operator: numeric max (exists to exercise registration by
  * class name under an arbitrary function name). */
class TestMaxMergeOp extends graft.merge.GraftMergeOperator {
  override def name: String = "test_max_default_name"
  override def merge(values: Seq[Any]): Any = {
    val nn = values.filter(_ != null)
    if (nn.isEmpty) null else nn.maxBy(_.asInstanceOf[Number].doubleValue())
  }

}
