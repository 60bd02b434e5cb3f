package graft

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.meta._
import graft.tables.GraftTable

/** One contract, three stores: the POSIX hard-link log, the object-store
  * log over the in-memory client (exact conditional-write semantics), and
  * the object-store log over the directory client (durable emulation).
  * Every implementation must satisfy the same CAS/read/checkpoint rules the
  * transaction layer builds on — plus, for the object store, the full table
  * lifecycle and the concurrent-writer model run with the store swapped in
  * process-wide.
  */
class MetaStoreContractSuite extends GraftFunSuite {
  import org.apache.spark.sql.functions._

  private def stores(): Seq[(String, MetaStore)] = Seq(
    "fs" -> new FsMetaStore,
    "objstore-mem" -> new ObjectStoreMetaStore(new InMemoryObjectStoreClient),
    "objstore-dir" -> new ObjectStoreMetaStore(new DirObjectStoreClient(
      Files.createTempDirectory("graft-objstore-"))))

  // fresh namespace per run: the fs store writes real directories, so a
  // reused absolute path would leak state across test runs
  private val ns = Files.createTempDirectory("graft-contract-").toString

  private def entry(n: Int): LogEntry =
    LogEntry(add = Some(DataFileInfo(s"part-$n.parquet", size = n.toLong)))

  private def tableEntry: LogEntry =
    LogEntry(table = Some(TableInfo("tid-contract",
      "{\"type\":\"struct\",\"fields\":[]}")))

  for ((name, store) <- stores()) {
    test(s"[$name] versions are dense, CAS rejects duplicates, reads round-trip") {
      val t = s"$ns/$name/t1"
      assert(store.latestVersion(t) == -1L && !store.exists(t))
      assert(store.commit(t, 0, Seq(tableEntry, entry(0))))
      assert(store.latestVersion(t) == 0L && store.exists(t))
      // CAS: a second commit at the same version must lose
      assert(!store.commit(t, 0, Seq(entry(99))))
      assert(store.commit(t, 1, Seq(entry(1))))
      assert(store.latestVersion(t) == 1L)
      // reads round-trip the entries of the WINNING commit
      val e0 = store.read(t, 0)
      assert(e0.exists(_.table.nonEmpty))
      assert(e0.flatMap(_.add).map(_.path) == Seq("part-0.parquet"))
      assert(store.read(t, 1).flatMap(_.add).map(_.path) == Seq("part-1.parquet"))
    }

    test(s"[$name] concurrent committers: exactly one winner per version") {
      val t = s"$ns/$name/t2"
      assert(store.commit(t, 0, Seq(tableEntry)))
      val pool = Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // 8 writers race 20 versions; each claims versions optimistically
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val fs = (1 to 8).map { w => Future {
        var mine = 0
        while (store.latestVersion(t) < 20) {
          val v = store.latestVersion(t) + 1
          if (v <= 20 && store.commit(t, v, Seq(entry(w * 1000 + v.toInt))))
            mine += 1
        }
        mine
      }}
      val total = Await.result(Future.sequence(fs), 60.seconds).sum
      pool.shutdown()
      assert(store.latestVersion(t) == 20L)
      assert(total == 20, s"20 versions must have exactly 20 winners, got $total")
      // every version readable, one entry each
      (1L to 20L).foreach(v => assert(store.read(t, v).size == 1))
    }

    test(s"[$name] checkpoints: newest-at-or-below wins, pruning keeps two") {
      val t = s"$ns/$name/t3"
      assert(store.commit(t, 0, Seq(tableEntry)))
      (1 to 30).foreach(v => assert(store.commit(t, v, Seq(entry(v)))))
      val ti = TableInfo("tid-contract", "{\"type\":\"struct\",\"fields\":[]}")
      Seq(10L, 20L, 30L).foreach { v =>
        store.writeCheckpoint(t, v,
          CheckpointState(ti, Seq(entry(v.toInt).add.get), Map.empty))
      }
      // newest at or below the asked version
      assert(store.readCheckpoint(t, 30).map(_._1).contains(30L))
      assert(store.readCheckpoint(t, 29).map(_._1).contains(20L))
      // v10 was pruned (keep-2): replay below the retained ones finds none
      assert(store.readCheckpoint(t, 19).isEmpty)
      // checkpoint payload round-trips
      val (v, cp) = store.readCheckpoint(t, 30).get
      assert(cp.files.map(_.path) == Seq(s"part-$v.parquet"))
    }
  }

  /** Full table lifecycle + the concurrency model with the object store
    * swapped in process-wide: everything above the MetaStore seam (writes,
    * merge-on-read scans, upserts, compaction, conflict detection) must not
    * notice the log moved off POSIX. */
  test("object store end-to-end: lifecycle, races, and conflict detection") {
    import spark.implicits._
    val prev = SnapshotManagement.store
    SnapshotManagement.setStore(
      new ObjectStoreMetaStore(new InMemoryObjectStoreClient))
    try withTempTable { dir =>
      (1 to 100).map(i => (i.toLong, 0)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      // no POSIX log may exist: the log lives in the object store
      assert(!Files.exists(FsMetaStore.logDir(dir)),
        "log written to the filesystem despite the object store being active")
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 11), (101L, 1)).toDF("id", "v"))
      assert(t.toDF.count() == 101)
      assert(t.toDF.filter($"id" === 1L).head().getInt(1) == 11)
      // history() must read the ACTIVE store (create + upsert = 2 commits);
      // reading MetaStore.fs here would see no log and return nothing
      assert(t.history().count() == 2,
        "history() bypassed the swapped-in object store")

      // concurrent upserts all land (optimistic CAS retry over the store)
      val pool = Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = (1 to 4).map { w =>
        Future { t.upsert(Seq((200L + w, w)).toDF("id", "v")) }
      }
      Await.result(Future.sequence(futures), 120.seconds)
      pool.shutdown()
      assert(t.toDF.filter($"id" >= 200L).count() == 4)

      // compaction + merge-on-read stay correct
      graft.commands.CompactionCommand.run(spark, t.path, force = true)
      assert(!t.snapshot.hasDeltaFiles)
      assert(t.toDF.filter($"id" === 1L).head().getInt(1) == 11)

      // stale-snapshot rewrite conflict still detected
      val snap = t.snapshot
      t.upsert(Seq((1L, 99)).toDF("id", "v"))
      intercept[GraftConcurrentModificationException] {
        SnapshotManagement.withNewTransaction(t.path) { txn =>
          txn.commit("compaction", None, Nil, snap.files)
        }
      }

      // enough commits ran to cross a checkpoint interval: replay from the
      // object-store checkpoint returns the same state
      (1 to Snapshot.CHECKPOINT_INTERVAL).foreach(i =>
        t.upsert(Seq((300L + i, i)).toDF("id", "v")))
      val latest = SnapshotManagement.store.latestVersion(t.path)
      assert(latest >= Snapshot.CHECKPOINT_INTERVAL)
      assert(SnapshotManagement.store
        .readCheckpoint(t.path, latest).nonEmpty,
        "expected an object-store checkpoint after 10+ commits")
      SnapshotManagement.invalidate(t.path)
      assert(t.toDF.filter($"id" === 1L).head().getInt(1) == 99)
    } finally {
      SnapshotManagement.setStore(prev)
    }
  }
}
