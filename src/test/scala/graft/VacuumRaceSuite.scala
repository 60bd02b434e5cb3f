package graft

import graft.commands.{CleanupCommand, RestoreCommand}
import graft.meta.{CommitInfo, GraftConcurrentModificationException, LogEntry, MetaStore, SnapshotManagement, Transaction}
import graft.tables.GraftTable

/** Vacuum serializes with restore THROUGH THE COMMIT LOG: a leased `vacuum`
  * marker commits (strict-window conflict rules) before any delete, and
  * restores fail cleanly while the lease is open. The loser of either race
  * stops BEFORE deleting/committing.
  */
class VacuumRaceSuite extends GraftFunSuite {
  import spark.implicits._

  private def mkTable(dir: String): Unit = {
    Seq((1L, "a")).toDF("id", "v").write.format("graft")
      .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
    GraftTable.forPath(spark, dir).upsert(Seq((2L, "b")).toDF("id", "v"))
  }

  test("restore fails cleanly while a vacuum lease is open; runs after release") {
    withTempTable { dir =>
      mkTable(dir)
      val path = SnapshotManagement.normalize(dir)
      // simulate a vacuum mid-delete: marker committed, lease open
      SnapshotManagement.withNewTransaction(path) { txn =>
        txn.snapshotOpt
        txn.commit("vacuum", None, Nil, Nil, strictWindow = true,
          leaseUntil = System.currentTimeMillis() + 600000L)
      }
      val e = intercept[IllegalStateException] {
        RestoreCommand.run(spark, dir, 0L)
      }
      assert(e.getMessage.contains("vacuum in progress"))
      // release the lease; the same restore now succeeds
      SnapshotManagement.withNewTransaction(path)(
        _.commit("vacuum_end", None, Nil, Nil))
      RestoreCommand.run(spark, dir, 0L)
      assert(spark.read.format("graft").load(dir).count() == 1L)
    }
  }

  test("an expired lease does not block restore") {
    withTempTable { dir =>
      mkTable(dir)
      val path = SnapshotManagement.normalize(dir)
      SnapshotManagement.withNewTransaction(path) { txn =>
        txn.snapshotOpt
        txn.commit("vacuum", None, Nil, Nil, strictWindow = true,
          leaseUntil = System.currentTimeMillis() - 1L)
      }
      RestoreCommand.run(spark, dir, 0L)
      assert(spark.read.format("graft").load(dir).count() == 1L)
    }
  }

  test("vacuum marker loses a concurrent-commit race BEFORE deleting") {
    withTempTable { dir =>
      mkTable(dir)
      val path = SnapshotManagement.normalize(dir)
      val store = SnapshotManagement.store
      val txn = new Transaction(path, store)
      txn.snapshotOpt // pin
      // a concurrent commit (e.g. a restore) lands inside the window
      GraftTable.forPath(spark, dir).upsert(Seq((3L, "c")).toDF("id", "v"))
      intercept[GraftConcurrentModificationException] {
        txn.commit("vacuum", None, Nil, Nil, strictWindow = true,
          leaseUntil = System.currentTimeMillis() + 600000L)
      }
      // the failed marker wrote NOTHING — no lease left behind
      val latest = store.latestVersion(path)
      val types = (0L to latest).flatMap(v =>
        store.read(path, v).flatMap(_.commit).headOption.map(_.commitType))
      assert(!types.contains("vacuum"), s"stale vacuum marker in $types")
      assert(CleanupCommand.activeLease(
        store, path, latest, System.currentTimeMillis()).isEmpty)
    }
  }

  test("end-to-end vacuum: marker pair committed, orphans reclaimed, " +
      "restore past the reclaim fails loudly") {
    withTempTable { dir =>
      mkTable(dir) // v0 write, v1 delta
      val preCompaction = GraftTable.forPath(spark, dir).snapshot.version
      GraftTable.forPath(spark, dir).compaction(force = true)
      val deleted = withSQLConf(
          "spark.graft.cleanup.retentionCheck.enabled" -> "false") {
        CleanupCommand.run(spark, dir, retainMillis = 0L)
      }
      assert(deleted.nonEmpty, "compaction orphans should be reclaimed")
      val path = SnapshotManagement.normalize(dir)
      val store = SnapshotManagement.store
      val latest = store.latestVersion(path)
      val types = (0L to latest).flatMap(v =>
        store.read(path, v).flatMap(_.commit).headOption.map(_.commitType))
      assert(types.count(_ == "vacuum") == 1, types.mkString(","))
      assert(types.count(_ == "vacuum_end") == 1, types.mkString(","))
      assert(types.indexOf("vacuum") < types.indexOf("vacuum_end"))
      // lease released; table intact
      assert(CleanupCommand.activeLease(
        store, path, latest, System.currentTimeMillis()).isEmpty)
      assert(spark.read.format("graft").load(dir).count() == 2L)
      // files the pre-compaction version needed are gone: loud failure
      val e = intercept[IllegalStateException] {
        RestoreCommand.run(spark, dir, preCompaction)
      }
      assert(e.getMessage.contains("vacuumed"))
    }
  }

  test("a second vacuum is rejected while a lease is open") {
    withTempTable { dir =>
      mkTable(dir)
      GraftTable.forPath(spark, dir).compaction(force = true)
      val path = SnapshotManagement.normalize(dir)
      SnapshotManagement.withNewTransaction(path) { txn =>
        txn.snapshotOpt
        txn.commit("vacuum", None, Nil, Nil, strictWindow = true,
          leaseUntil = System.currentTimeMillis() + 600000L)
      }
      val e = withSQLConf(
          "spark.graft.cleanup.retentionCheck.enabled" -> "false") {
        intercept[IllegalStateException] {
          CleanupCommand.run(spark, dir, retainMillis = 0L)
        }
      }
      assert(e.getMessage.contains("another vacuum"))
      // release: the same vacuum now proceeds
      SnapshotManagement.withNewTransaction(path)(
        _.commit("vacuum_end", None, Nil, Nil))
      withSQLConf("spark.graft.cleanup.retentionCheck.enabled" -> "false") {
        CleanupCommand.run(spark, dir, retainMillis = 0L)
      }
      assert(spark.read.format("graft").load(dir).count() == 2L)
    }
  }

  test("restore whose commit loses to a vacuum marker restarts and " +
      "fails cleanly on the fresh lease — never commits blind") {
    withTempTable { dir =>
      mkTable(dir)
      val path = SnapshotManagement.normalize(dir)
      val real = SnapshotManagement.store
      val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
      // sneak a leased vacuum marker in at the restore's own CAS version:
      // the restore's first commit attempt must lose the race AFTER its
      // lease check already passed
      val racing = new MetaStore {
        override def latestVersion(p: String): Long = real.latestVersion(p)
        override def read(p: String, v: Long): Seq[LogEntry] = real.read(p, v)
        override def commit(p: String, v: Long, entries: Seq[LogEntry]): Boolean = {
          val isRestore = entries.headOption.flatMap(_.commit)
            .exists(_.commitType == "restore")
          if (isRestore && injected.compareAndSet(false, true)) {
            real.commit(p, v, Seq(LogEntry(commit = Some(CommitInfo(
              "vacuum", System.currentTimeMillis(),
              leaseUntil = System.currentTimeMillis() + 600000L)))))
          }
          real.commit(p, v, entries)
        }
      }
      SnapshotManagement.setStore(racing)
      try {
        val e = intercept[IllegalStateException] {
          RestoreCommand.run(spark, dir, 0L)
        }
        // the in-loop CAS retry must NOT blind-commit past the marker: the
        // strict window restarts the body, which re-checks the lease
        assert(e.getMessage.contains("vacuum in progress"), e.getMessage)
        val latest = real.latestVersion(path)
        val types = (0L to latest).flatMap(v =>
          real.read(path, v).flatMap(_.commit).headOption.map(_.commitType))
        assert(!types.contains("restore"),
          s"restore committed despite the open lease: $types")
      } finally SnapshotManagement.setStore(real)
    }
  }

  test("dry-run vacuum commits no markers") {
    withTempTable { dir =>
      mkTable(dir)
      GraftTable.forPath(spark, dir).compaction(force = true)
      val path = SnapshotManagement.normalize(dir)
      val store = SnapshotManagement.store
      val before = store.latestVersion(path)
      val listed = withSQLConf(
          "spark.graft.cleanup.retentionCheck.enabled" -> "false") {
        CleanupCommand.run(spark, dir, retainMillis = 0L, dryRun = true)
      }
      assert(listed.nonEmpty)
      assert(store.latestVersion(path) == before, "dryRun must not commit")
    }
  }
}
