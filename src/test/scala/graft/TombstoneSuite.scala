package graft

import org.apache.spark.sql.functions._

import graft.commands.{CleanupCommand, PkTombstoneDelete, RestoreCommand}
import graft.meta.{GraftConcurrentModificationException, SnapshotManagement, Tombstones}
import graft.tables.GraftTable

/** Conflict matrix + maintenance lifecycle for PK tombstone deletes: the
  * marker commit is adds-only but must still SERIALIZE against concurrent
  * writers (the keys to kill were decided on a pinned merged view), and
  * markers must leave the system on the normal maintenance cadence
  * (compaction resolves them, vacuum reclaims them, restore steps over
  * them).
  */
class TombstoneSuite extends GraftFunSuite {
  import spark.implicits._

  private def mkPk(dir: String): Unit =
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("id", "v", "n").write.format("graft")
      .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)

  private def liveMarkers(dir: String): Seq[graft.meta.DataFileInfo] =
    SnapshotManagement.snapshot(SnapshotManagement.normalize(dir))
      .files.filter(Tombstones.fileHas)

  test("tombstone DELETE routes PK tables away from rewrites") {
    withTempTable { dir =>
      mkPk(dir)
      val before = SnapshotManagement
        .snapshot(SnapshotManagement.normalize(dir)).files.map(_.path).toSet
      GraftTable.forPath(spark, dir).deleteExpr("n = 20")
      val snap = SnapshotManagement.snapshot(SnapshotManagement.normalize(dir))
      // every pre-delete file is still live (no rewrite), plus marker file(s)
      assert(before.subsetOf(snap.files.map(_.path).toSet))
      assert(liveMarkers(dir).nonEmpty)
      assert(spark.read.format("graft").load(dir)
        .select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
    }
  }

  test("tombstone commit conflicts with a concurrent upsert instead of " +
      "killing its fresh value") {
    withTempTable { dir =>
      mkPk(dir)
      val path = SnapshotManagement.normalize(dir)
      intercept[GraftConcurrentModificationException] {
        SnapshotManagement.withRewriteTransaction(path, maxRestarts = 0) { txn =>
          txn.snapshotOpt // pin: delete decides on this merged view
          // a concurrent upsert gives key 2 a value OUTSIDE the predicate
          GraftTable.forPath(spark, dir).upsert(
            Seq((2L, "fresh", 999)).toDF("id", "v", "n"))
          PkTombstoneDelete.tryRunIn(spark, path, col("n") < 100, txn)
        }
      }
      // loser stopped BEFORE committing: key 2's fresh value survives
      assert(spark.read.format("graft").load(dir)
        .filter(col("id") === 2).select("n").as[Int].head() == 999)
      // the public ladder (with restarts) now re-decides correctly
      GraftTable.forPath(spark, dir).deleteExpr("n < 100")
      assertSameRows(
        spark.read.format("graft").load(dir).select("id", "n"),
        Seq((2L, 999)).toDF("id", "n"))
    }
  }

  test("a compaction pinned before a concurrent tombstone commit must " +
      "restart, not shadow the delete") {
    withTempTable { dir =>
      mkPk(dir)
      val path = SnapshotManagement.normalize(dir)
      SnapshotManagement.withRewriteTransaction(path, maxRestarts = 0) { txn =>
        val snap = txn.snapshotOpt.get
        val stack = snap.files
        // tombstone delete lands while the "compaction" holds its pin
        GraftTable.forPath(spark, dir).deleteExpr("id = 2")
        intercept[GraftConcurrentModificationException] {
          txn.commit("compaction", None, Nil, stack)
        }
      }
      // the real compaction (fresh snapshot) preserves the delete
      GraftTable.forPath(spark, dir).compaction()
      assert(spark.read.format("graft").load(dir)
        .select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
    }
  }

  test("compaction drops resolved markers from the manifest; vacuum " +
      "reclaims the marker files") {
    withTempTable { dir =>
      mkPk(dir)
      GraftTable.forPath(spark, dir).deleteExpr("id = 2")
      val markerPaths = liveMarkers(dir).map(_.path)
      assert(markerPaths.nonEmpty)
      GraftTable.forPath(spark, dir).compaction()
      assert(liveMarkers(dir).isEmpty,
        "compaction must resolve tombstones out of the live manifest")
      assert(spark.read.format("graft").load(dir)
        .select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
      // the physical marker files are vacuumable now
      val deleted = withSQLConf(
          "spark.graft.cleanup.retentionCheck.enabled" -> "false") {
        CleanupCommand.run(spark, dir, retainMillis = 0L)
      }
      assert(markerPaths.forall(p =>
        deleted.exists(_.endsWith(p)) || !new java.io.File(p).exists()))
      assert(spark.read.format("graft").load(dir)
        .select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
    }
  }

  test("restore steps back over a tombstone delete; time travel reads " +
      "the pre-delete snapshot") {
    withTempTable { dir =>
      mkPk(dir)
      val path = SnapshotManagement.normalize(dir)
      val preDelete = SnapshotManagement.snapshot(path).version
      GraftTable.forPath(spark, dir).deleteExpr("id = 2")
      // time travel: the deleted key is visible at the older version
      assert(spark.read.format("graft")
        .option("versionAsOf", preDelete.toString).load(dir)
        .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
      // restore: the key comes back live
      RestoreCommand.run(spark, dir, preDelete)
      assert(spark.read.format("graft").load(dir)
        .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
      // and a fresh delete still works after the restore
      GraftTable.forPath(spark, dir).deleteExpr("id = 2")
      assert(spark.read.format("graft").load(dir)
        .select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
    }
  }

  test("tombstoned key re-upserted AFTER the marker is visible again " +
      "(marker resets history, does not ban the key)") {
    withTempTable { dir =>
      mkPk(dir)
      val t = GraftTable.forPath(spark, dir)
      t.deleteExpr("id = 2")
      t.upsert(Seq((2L, "reborn", 21)).toDF("id", "v", "n"))
      // the reborn row must NOT see pre-delete history (v/n fully reset)
      assertSameRows(
        spark.read.format("graft").load(dir)
          .filter(col("id") === 2).select("id", "v", "n"),
        Seq((2L, "reborn", 21)).toDF("id", "v", "n"))
      // partial-column re-upsert after ANOTHER delete: missing columns
      // must be null (history reset), not resurrect old values
      t.deleteExpr("id = 2")
      t.upsert(Seq((2L, "again")).toDF("id", "v"))
      val r = spark.read.format("graft").load(dir)
        .filter(col("id") === 2).select("v", "n")
        .as[(String, Option[Int])].head()
      assert(r == ("again", None),
        s"partial re-upsert after delete resurrected old columns: $r")
    }
  }
}
