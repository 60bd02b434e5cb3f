package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Time travel, SQL DELETE, auto-compaction, and concurrent-writer safety. */
class AdvancedSuite extends GraftFunSuite {
  import spark.implicits._

  test("versionAsOf time travel") {
    withTempTable { dir =>
      Seq((1L, "v0")).toDF("id", "v").write.format("graft").save(dir)
      Seq((2L, "v1")).toDF("id", "v").write.format("graft").mode("append").save(dir)
      Seq((3L, "v2")).toDF("id", "v").write.format("graft").mode("append").save(dir)
      assert(spark.read.format("graft").option("versionAsOf", "0").load(dir).count() == 1)
      assert(spark.read.format("graft").option("versionAsOf", "1").load(dir).count() == 2)
      assert(spark.read.format("graft").load(dir).count() == 3)
      intercept[Exception] {
        spark.read.format("graft").option("versionAsOf", "9").load(dir).count()
      }
    }
  }

  test("timestampAsOf time travel resolves against commit timestamps") {
    withTempTable { dir =>
      Seq((1L, "v0")).toDF("id", "v").write.format("graft").save(dir)
      Thread.sleep(20)
      val betweenCommits = System.currentTimeMillis()
      Thread.sleep(20)
      val t = GraftTable.forPath(spark, dir)
      t.update($"id" === 1L, Map("v" -> org.apache.spark.sql.functions.lit("UPD")))
      Seq((2L, "v1")).toDF("id", "v").write.format("graft").mode("append").save(dir)

      // between v0 and the update: the PRE-update snapshot serves
      val pre = spark.read.format("graft")
        .option("timestampAsOf", betweenCommits.toString).load(dir)
      assert(rowsOf(pre) == Seq(Seq(1L, "v0")))
      // at/after the newest commit: full current state
      val now = spark.read.format("graft")
        .option("timestampAsOf", System.currentTimeMillis().toString).load(dir)
      assert(rowsOf(now) == Seq(Seq(1L, "UPD"), Seq(2L, "v1")))
      // a human-readable local timestamp parses too (same instant)
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
      val preStr = spark.read.format("graft")
        .option("timestampAsOf", fmt.format(new java.util.Date(betweenCommits)))
        .load(dir)
      assert(rowsOf(preStr) == Seq(Seq(1L, "v0")))
      // before the table existed: error
      intercept[Exception] {
        spark.read.format("graft").option("timestampAsOf", "1000").load(dir).count()
      }
    }
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF via the catalog") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gtt")
      s2.sql(s"CREATE TABLE gtt (id BIGINT, v STRING) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gtt VALUES (1, 'v0')")
      Thread.sleep(20)
      val betweenCommits = System.currentTimeMillis()
      Thread.sleep(20)
      s2.sql("INSERT INTO gtt VALUES (2, 'v1')")

      // CREATE is version 0, first insert 1, second insert 2
      assert(rowsOf(s2.sql("SELECT * FROM gtt VERSION AS OF 1")) ==
        Seq(Seq(1L, "v0")))
      assert(rowsOf(s2.sql("SELECT * FROM gtt")) ==
        Seq(Seq(1L, "v0"), Seq(2L, "v1")))
      // TIMESTAMP AS OF between the inserts serves the pre-insert snapshot
      // (timestamp_millis is timezone-unambiguous, unlike a string literal)
      assert(rowsOf(s2.sql(
        s"SELECT * FROM gtt TIMESTAMP AS OF timestamp_millis($betweenCommits)")) ==
        Seq(Seq(1L, "v0")))
      // a version beyond the head errors
      intercept[Exception] {
        s2.sql("SELECT * FROM gtt VERSION AS OF 99").collect()
      }
      // time-travel relations are pinned: the MV rewrite must skip them
      // (isPinned guard) and writes against them are not attempted here
      s2.sql("DROP TABLE gtt")
    }
  }

  test("SQL DELETE FROM via SupportsDelete (catalog table)") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gdel")
      s2.sql(s"CREATE TABLE gdel (id BIGINT, g STRING) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gdel VALUES (1, 'a'), (2, 'b'), (3, 'a')")
      s2.sql("DELETE FROM gdel WHERE g = 'a'")
      assert(rowsOf(s2.sql("SELECT * FROM gdel")) == Seq(Seq(2L, "b")))
      s2.sql("DROP TABLE gdel")
    }
  }

  test("auto-compaction keeps delta fan-in bounded") {
    withTempTable { dir =>
      spark.conf.set("spark.graft.compaction.auto", "true")
      spark.conf.set("spark.graft.compaction.deltaFileMaxNum", "3")
      try {
        (1 to 4).map(i => (i.toLong, i)).toDF("id", "v").write.format("graft")
          .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
        val t = GraftTable.forPath(spark, dir)
        (1 to 5).foreach { r =>
          t.upsert(Seq((1L, r * 10), (4L + r, r)).toDF("id", "v"))
        }
        val deltasPerBucket = t.snapshot.files.filter(!_.isBase)
          .groupBy(_.bucket).values.map(_.size)
        assert(deltasPerBucket.forall(_ < 5),
          s"auto-compaction should bound deltas, got $deltasPerBucket")
        assert(t.toDF.filter($"id" === 1L).select("v").head().getInt(0) == 50)
      } finally {
        spark.conf.unset("spark.graft.compaction.auto")
        spark.conf.unset("spark.graft.compaction.deltaFileMaxNum")
      }
    }
  }

  test("concurrent upserts all commit (optimistic retry)") {
    withTempTable { dir =>
      (1 to 8).map(i => (i.toLong, 0)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val pool = Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = (1 to 4).map { w =>
        Future { t.upsert(Seq((100L + w, w)).toDF("id", "v")) }
      }
      Await.result(Future.sequence(futures), 120.seconds)
      pool.shutdown()
      // all four writers' rows are present
      assert(t.toDF.filter($"id" >= 100L).count() == 4)
      // log versions are dense and unique
      val versions = (0L to t.snapshot.version)
      versions.foreach(v => assert(
        graft.meta.MetaStore.fs.read(t.path, v).nonEmpty))
    }
  }

  test("merge-mode upsert: full-outer rewrite equals delta-mode result") {
    withTempTable { dir =>
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "s", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((2L, "B", 200), (3L, "c", 30)).toDF("id", "s", "v"),
        mode = "merge")
      // merge mode leaves only base files
      assert(!t.snapshot.hasDeltaFiles)
      assertSameRows(t.toDF.select("id", "s", "v"),
        Seq((1L, "a", 10), (2L, "B", 200), (3L, "c", 30)).toDF("id", "s", "v"))
      // partial-column source keeps unmentioned values
      t.upsert(Seq((1L, 100)).toDF("id", "v"), mode = "merge")
      assertSameRows(t.toDF.select("id", "s", "v"),
        Seq((1L, "a", 100), (2L, "B", 200), (3L, "c", 30)).toDF("id", "s", "v"))
    }
  }

  test("CTAS via GraftCatalog") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gctas")
      Seq((1L, "x"), (2L, "y")).toDF("id", "v").createOrReplaceTempView("ctas_src")
      // temp view registered on the default session; register on s2 too
      Seq((1L, "x"), (2L, "y")).toDF("id", "v")
        .write.format("graft").save(s"$dir/src")
      s2.sql(
        s"CREATE TABLE gctas USING graft LOCATION '$dir/t' AS " +
        s"SELECT * FROM graft.`$dir/src`")
      assert(s2.sql("SELECT * FROM gctas").count() == 2)
      s2.sql("DROP TABLE gctas")
    }
  }

  test("concurrent remove conflict raises GraftConcurrentModificationException") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val snap = t.snapshot
      // writer A overwrites (removes the file)...
      Seq((2L, 2)).toDF("id", "v").write.format("graft").mode("overwrite").save(dir)
      // ...writer B, still holding the old snapshot, tries to remove the
      // same file (stale compaction-style commit)
      intercept[graft.meta.GraftConcurrentModificationException] {
        graft.meta.SnapshotManagement.withNewTransaction(t.path) { txn =>
          txn.commit("delete", None, Nil, snap.files)
        }
      }
    }
  }

  test("compaction racing a concurrent delta upsert does not lose the upsert") {
    withTempTable { dir =>
      Seq((1L, 0), (2L, 0)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 1)).toDF("id", "v")) // delta to compact
      // Simulate a compaction that pins its snapshot and stages its rewrite…
      val txn = new graft.meta.Transaction(t.path, graft.meta.MetaStore.fs)
      val snap = txn.snapshotOpt.get
      val merged = graft.commands.GraftTableFiles.read(spark, t.path, snap, snap.files)
      val staged = graft.write.TransactionalWrite.writeFiles(
        spark, t.path, snap.tableInfo, merged, isBase = true)
      // …while a delta upsert commits in between (the lost-update window):
      t.upsert(Seq((1L, 99)).toDF("id", "v"))
      // the stale compaction must NOT commit (its base would get a newer
      // writeVersion and shadow the committed upsert)
      intercept[graft.meta.GraftConcurrentModificationException] {
        txn.commit("compaction", None, staged, snap.files)
      }
      assert(t.toDF.filter($"id" === 1L).head().getInt(1) == 99)
      // a fresh compaction (new snapshot) succeeds and preserves the upsert
      graft.commands.CompactionCommand.run(spark, t.path, force = true)
      assert(!t.snapshot.hasDeltaFiles)
      assert(t.toDF.filter($"id" === 1L).head().getInt(1) == 99)
    }
  }

  test("withRewriteTransaction restarts the body on conflict") {
    withTempTable { dir =>
      Seq((1L, 0)).toDF("id", "v").write.format("graft").save(dir)
      var calls = 0
      val r = graft.meta.SnapshotManagement.withRewriteTransaction(dir) { _ =>
        calls += 1
        if (calls == 1)
          throw new graft.meta.GraftConcurrentModificationException("induced")
        42
      }
      assert(r == 42 && calls == 2)
    }
  }

  test("count() on a fully compacted PK table (empty projection)") {
    withTempTable { dir =>
      Seq((1L, 1), (2L, 2)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 10)).toDF("id", "v"))
      t.compaction()
      // empty-projection scan must not require PK columns in the read schema
      assert(t.toDF.count() == 2)
    }
  }

  test("scan-time part-merge compacts pre-existing deep delta stacks") {
    withTempTable { dir =>
      spark.conf.set("spark.graft.scan.mergeFanInLimit", "5")
      try {
        Seq((1L, 0)).toDF("id", "v").write.format("graft")
          .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
        val t = GraftTable.forPath(spark, dir)
        (1 to 7).foreach(i => t.upsert(Seq((1L, i)).toDF("id", "v")))
        assert(t.snapshot.files.count(!_.isBase) >= 6, "expected a deep stack")
        // a read heals the stack before planning, committing merged files
        assert(t.toDF.select("v").head().getInt(0) == 7)
        assert(!GraftTable.forPath(spark, dir).snapshot.hasDeltaFiles)
      } finally spark.conf.unset("spark.graft.scan.mergeFanInLimit")
    }
  }

  test("scan-time heal compacts only the offending range partition") {
    withTempTable { dir =>
      spark.conf.set("spark.graft.scan.mergeFanInLimit", "5")
      try {
        Seq((1L, "a", 0), (2L, "b", 0)).toDF("id", "g", "v")
          .write.format("graft").option("rangePartitions", "g")
          .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
        val t = GraftTable.forPath(spark, dir)
        (1 to 7).foreach(i => t.upsert(Seq((1L, "a", i)).toDF("id", "g", "v")))
        val bBefore = GraftTable.forPath(spark, dir).snapshot.files
          .filter(_.rangeKey == "g=b").map(_.path).sorted
        assert(t.toDF.filter(col("g") === "a").select("v").head().getInt(0) == 7)
        val after = GraftTable.forPath(spark, dir).snapshot
        assert(!after.files.exists(f => f.rangeKey == "g=a" && !f.isBase),
          "deep partition must be healed")
        assert(after.files.filter(_.rangeKey == "g=b").map(_.path).sorted
          == bBefore, "shallow partition must not be rewritten by the heal")
      } finally spark.conf.unset("spark.graft.scan.mergeFanInLimit")
    }
  }

  test("scan-time heal can be disabled; wide fan-in merge still reads") {
    withTempTable { dir =>
      spark.conf.set("spark.graft.scan.mergeFanInLimit", "5")
      spark.conf.set("spark.graft.scan.heal.enabled", "false")
      try {
        Seq((1L, 0)).toDF("id", "v").write.format("graft")
          .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
        val t = GraftTable.forPath(spark, dir)
        (1 to 7).foreach(i => t.upsert(Seq((1L, i)).toDF("id", "v")))
        // no commit happens from the read path; the merge just opens wide
        assert(t.toDF.select("v").head().getInt(0) == 7)
        assert(GraftTable.forPath(spark, dir).snapshot.hasDeltaFiles,
          "disabled heal must not commit")
      } finally {
        spark.conf.unset("spark.graft.scan.mergeFanInLimit")
        spark.conf.unset("spark.graft.scan.heal.enabled")
      }
    }
  }

  test("metadata checkpointing bounds replay to the checkpoint interval") {
    withTempTable { dir =>
      Seq((0L, 0)).toDF("id", "v").write.format("graft").save(dir) // v0
      (1 to 30).foreach(i => Seq((i.toLong, i)).toDF("id", "v")
        .write.format("graft").mode("append").save(dir)) // v1..v30
      val path = graft.meta.SnapshotManagement.normalize(dir)
      class SpyStore extends graft.meta.FsMetaStore {
        var logReads = 0
        override def read(tablePath: String, version: Long) = {
          logReads += 1; super.read(tablePath, version)
        }
      }
      class NoCpStore extends graft.meta.FsMetaStore {
        override def readCheckpoint(tablePath: String, maxVersion: Long) = None
      }
      val spy = new SpyStore
      val snap = graft.meta.Snapshot.replay(spy, path, 30)
      assert(spy.logReads <= graft.meta.Snapshot.CHECKPOINT_INTERVAL,
        s"replay read ${spy.logReads} log files, expected <= interval")
      // checkpoint-seeded state identical to a full replay
      val full = graft.meta.Snapshot.replay(new NoCpStore, path, 30)
      assert(snap.files.map(_.path).toSet == full.files.map(_.path).toSet)
      assert(snap.tableInfo == full.tableInfo)
      // time travel below the first checkpoint still works
      val old = graft.meta.Snapshot.replay(new SpyStore, path, 5)
      assert(old.files.map(_.path).toSet ==
        graft.meta.Snapshot.replay(new NoCpStore, path, 5).files.map(_.path).toSet)
      // public API reads stay correct
      assert(spark.read.format("graft").load(dir).count() == 31)
      // old checkpoints are pruned (newest 2 kept)
      val cps = java.nio.file.Files.list(
          java.nio.file.Paths.get(path, graft.meta.FsMetaStore.LOG_DIR_NAME))
        .toArray.map(_.toString).filter(_.endsWith(".checkpoint.json"))
      assert(cps.length <= 2, s"checkpoints not pruned: ${cps.toSeq}")
    }
  }

  test("model: concurrent upserts + compactions never lose committed updates") {
    withTempTable { dir =>
      // 3 writer threads own disjoint key sets; a compactor thread forces
      // compactions throughout. Every writer's LAST committed value must
      // survive — the exact lost-update race the commit protocol guards.
      val writers = 3
      val rounds = 6
      (0 until writers * 4).map(k => (k.toLong, -1)).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val pool = Executors.newFixedThreadPool(writers + 1)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      @volatile var writersDone = false
      val compactor = Future {
        while (!writersDone) {
          try graft.commands.CompactionCommand.run(spark, t.path, force = true)
          catch { case _: graft.meta.GraftConcurrentModificationException => () }
        }
      }
      val futures = (0 until writers).map { w =>
        Future {
          (1 to rounds).foreach { r =>
            val keys = (0 until 4).map(i => ((w * 4 + i).toLong, w * 1000 + r))
            t.upsert(keys.toDF("id", "v"))
          }
        }
      }
      Await.result(Future.sequence(futures), 300.seconds)
      writersDone = true
      Await.result(compactor, 300.seconds)
      pool.shutdown()
      val got = t.toDF.select("id", "v").as[(Long, Int)].collect().toMap
      (0 until writers).foreach { w =>
        (0 until 4).foreach { i =>
          val k = (w * 4 + i).toLong
          assert(got(k) == w * 1000 + rounds,
            s"key $k lost its final upsert: got ${got(k)}, " +
            s"expected ${w * 1000 + rounds}")
        }
      }
    }
  }

  test("pk files are sorted within buckets (merge reader precondition)") {
    withTempTable { dir =>
      val df = (1 to 5000).map(i => ((i * 2654435761L) % 100000, i))
        .toDF("id", "v")
      df.write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.snapshot.files.foreach { f =>
        val rows = spark.read.parquet(s"$dir/${f.path}")
          .select("id").as[Long].collect()
        assert(rows.sameElements(rows.sorted),
          s"bucket file ${f.path} is not PK-sorted")
      }
    }
  }
}
