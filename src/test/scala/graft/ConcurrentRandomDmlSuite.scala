package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.meta.{GraftConcurrentModificationException, SnapshotManagement}
import graft.tables.GraftTable

/** CONCURRENT randomized DML: several writer threads race upserts, MERGEs
  * and forced compactions against one PK table with no external
  * coordination. The engine's job is to serialize them — conflicting
  * read-modify-writes must restart or fail cleanly, never commit a stale
  * decision.
  *
  * Validation needs no knowledge of which racing ops won: the commit log
  * IS the ground truth. Every state-changing commit here is a delta
  * commit whose added files carry rows-as-written (upsert rows, merge
  * images, tombstone markers), so the expected final state is a plain
  * LAST-WINS REPLAY of the log's add-files in version order — computed
  * independently of the engine's merge-on-read reader, then compared
  * against what the engine actually reads (before AND after a final
  * compaction). A lost update, a stale merge decision surviving a
  * conflict, or a reader/replay disagreement all surface as a diff.
  */
class ConcurrentRandomDmlSuite extends GraftFunSuite {
  import spark.implicits._

  private val TombCol = graft.meta.Tombstones.COL

  /** Last-wins replay of every delta-type commit's added files, up to
    * `upTo` (default: the whole log) — the bounded form validates what a
    * mid-melee SHALLOW CLONE pinned. */
  private def replayLog(
      dir: String, upTo: Long = Long.MaxValue): Map[Long, (String, Int)] = {
    val path = SnapshotManagement.normalize(dir)
    val store = SnapshotManagement.store
    val latest = math.min(store.latestVersion(path), upTo)
    val model = mutable.Map.empty[Long, (String, Int)]
    (0L to latest).foreach { v =>
      val entries = store.read(path, v)
      val commitType = entries.flatMap(_.commit).headOption
        .map(_.commitType).getOrElse("append")
      // compaction/vacuum rewrite existing rows — replay must skip them;
      // create/delta commits carry the actual writes
      if (Set("create", "append", "delta", "streaming").contains(commitType)) {
        val files = entries.flatMap(_.add).map(f => s"$path/${f.path}")
        if (files.nonEmpty) {
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField(TombCol,
              org.apache.spark.sql.types.BooleanType)))
          // one commit writes each key at most once (upsert dedups, the
          // merge guard enforces it), so within-commit order is irrelevant
          spark.read.schema(schema).parquet(files: _*).collect().foreach { r =>
            val id = r.getLong(0)
            if (!r.isNullAt(3) && r.getBoolean(3)) model.remove(id)
            else model(id) = (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2))
          }
        }
      }
    }
    model.toMap
  }

  private def engineState(dir: String): Map[Long, (String, Int)] =
    spark.read.format("graft").load(dir).select("id", "v", "n")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toMap

  test("racing writers serialize: engine state == last-wins replay of " +
      "the commit log (3 threads x 12 ops, conflicts restart or fail clean)") {
    withTempTable { dir =>
      (0L until 10L).map(i => (i, s"init$i", i.toInt)).toDF("id", "v", "n")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)

      val unexpected = new ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 3).map { t =>
        new Thread(() => {
          val rnd = new scala.util.Random(1000 + t)
          (0 until 12).foreach { i =>
            try {
              rnd.nextInt(5) match {
                case 0 | 1 => // upsert: blind delta write, tagged uniquely
                  val rows = (0 until 1 + rnd.nextInt(3)).map(_ =>
                    (rnd.nextInt(20).toLong, s"u$t-$i", t * 1000 + i))
                    .distinctBy(_._1)
                  GraftTable.forPath(spark, dir)
                    .upsert(rows.toDF("id", "v", "n"))
                case 2 | 3 => // MERGE: read-modify-write with DELETE clause
                  val rows = (0 until 1 + rnd.nextInt(3)).map(_ =>
                    (rnd.nextInt(20).toLong, s"m$t-$i",
                      rnd.nextInt(100) - 20)).distinctBy(_._1)
                  val view = s"crdml_${t}_$i"
                  rows.toDF("id", "v", "n").createOrReplaceTempView(view)
                  spark.sql(
                    s"""MERGE INTO graft.`$dir` tg USING $view s
                       ON tg.id = s.id
                       WHEN MATCHED AND s.n < 0 THEN DELETE
                       WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
                       WHEN NOT MATCHED THEN
                         INSERT (id, v, n) VALUES (s.id, s.v, s.n)""")
                case 4 if i % 4 == 1 => // layout change racing the writers:
                  // rebucket restarts itself on conflict; writers pinned to
                  // the old layout must conflict cleanly (layout guard),
                  // never land mis-bucketed files
                  GraftTable.forPath(spark, dir).rebucket(1 + rnd.nextInt(4))
                case 4 if i % 4 == 3 => // CDC APPLY racing the writers: a
                  // multi-change-per-key batch folds to winner-per-key
                  // images + tombstones in ONE delta commit — shaped
                  // exactly like an upsert to the replay model
                  val ks = (0 until 1 + rnd.nextInt(3))
                    .map(_ => rnd.nextInt(20).toLong).distinct
                  val changes = ks.flatMap(k => Seq(
                    (k, s"a$t-$i-1", t * 1000 + i, "u", 1L),
                    if (rnd.nextBoolean())
                      (k, s"a$t-$i-2", t * 1000 + i, "u", 2L)
                    else (k, null: String, 0, "d", 2L)))
                  GraftTable.forPath(spark, dir).applyChanges(
                    changes.toDF("id", "v", "n", "op", "seq"),
                    "op", Seq("seq"))
                case _ => // rewrite racing the writers
                  GraftTable.forPath(spark, dir).compaction(force = true)
              }
            } catch {
              // a cleanly-refused conflicting commit is CORRECT behavior:
              // the op simply never happened and the log stays the truth
              case _: GraftConcurrentModificationException => ()
              case e: Throwable
                  if Option(e.getCause).exists(
                    _.isInstanceOf[GraftConcurrentModificationException]) => ()
              case e: Throwable => unexpected.add(e)
            }
          }
        })
      }
      // a racing READER: snapshot isolation means every read during the
      // melee must succeed and see a complete, un-torn state (compaction
      // and rebucket swap files in one commit; vacuum is the only deleter
      // and never runs here). The reader asserts basic shape invariants —
      // ids unique (merge-on-read dedups), values well-formed.
      @volatile var readerDone = false
      val reader = new Thread(() => {
        try {
          while (!readerDone) {
            val rows = spark.read.format("graft").load(dir)
              .select("id", "v").collect()
            val ids = rows.map(_.getLong(0))
            if (ids.length != ids.distinct.length)
              unexpected.add(new IllegalStateException(
                s"reader saw duplicate ids: ${ids.toSeq.sorted}"))
            if (rows.exists(_.isNullAt(1)))
              unexpected.add(new IllegalStateException("reader saw null v"))
          }
        } catch { case e: Throwable => unexpected.add(e) }
      })
      // a racing CLONER: shallow clones pin a snapshot mid-melee. A clone
      // must either refuse cleanly (delta stacks — the compact-first
      // contract) or commit a fork whose content equals the last-wins
      // replay of the SOURCE log at exactly its pinned version — a torn
      // clone (files from two versions) or a mis-pinned sourceVersion
      // would diverge.
      val cloned = new ConcurrentLinkedQueue[(String, Long)]()
      val cloner = new Thread(() => {
        (0 until 6).foreach { i =>
          try {
            GraftTable.forPath(spark, dir).compaction(force = true)
            val dest = dir + s"-race-clone$i"
            val v = graft.commands.CloneCommand.run(spark, dir, dest)
            cloned.add((dest, v))
          } catch {
            case _: GraftConcurrentModificationException => ()
            case e: IllegalStateException
                if e.getMessage.contains("compact") => () // clean refusal
            case e: Throwable
                if Option(e.getCause).exists(
                  _.isInstanceOf[GraftConcurrentModificationException]) => ()
            case e: Throwable => unexpected.add(e)
          }
        }
      })
      reader.start()
      cloner.start()
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
      cloner.join(300000)
      readerDone = true
      reader.join(60000)
      assert(!reader.isAlive, "reader thread still running after join — " +
        "its queue may hold unasserted violations")
      assert(unexpected.isEmpty,
        s"non-conflict failures under concurrency: " +
        s"${unexpected.toArray.take(3).mkString("\n")}")

      val expected = replayLog(dir)
      assert(engineState(dir) == expected,
        "engine read diverged from last-wins replay of the commit log")
      // compaction must preserve the merged state exactly
      GraftTable.forPath(spark, dir).compaction(force = true)
      assert(engineState(dir) == expected,
        "state changed across post-race compaction")

      // one guaranteed post-race clone (the melee clones are opportunistic)
      val destF = dir + "-race-clone-final"
      val vF = graft.commands.CloneCommand.run(spark, dir, destF)
      cloned.add((destF, vF))
      cloned.forEach { case (dest, v) =>
        assert(engineState(dest) == replayLog(dir, v),
          s"clone $dest diverged from the source log replayed at v$v")
        graft.write.TransactionalWrite.deleteRecursively(
          java.nio.file.Paths.get(dest))
        SnapshotManagement.invalidate(dest)
      }
    }
  }
}
