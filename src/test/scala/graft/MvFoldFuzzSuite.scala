package graft

import org.apache.spark.sql.functions._

import graft.mv.{MaterializedViews, RewriteQueryByMaterialView => RQ}
import graft.tables.GraftTable

/** Randomized soak for the incremental MV fold: arbitrary CDC windows
  * (inserts, raw-image overwrites including group moves and NULL flips,
  * tombstone deletes, compactions) against a view holding EVERY foldable
  * aggregate kind at once — count(*), count(col), sum(col), avg(col), and
  * FILTER variants — hash-compared against the from-scratch recompute
  * after every refresh. The targeted MvIncrementalSuite cases pin each
  * mechanism; this suite hunts their INTERACTIONS (a fold bug that only
  * shows when a delete retracts the last filtered contributor of a group
  * whose key just moved, etc.). A run must also actually FOLD most
  * windows — a silently-recomputing fold would pass content checks while
  * testing nothing. */
class MvFoldFuzzSuite extends GraftFunSuite {
  import spark.implicits._

  private def incCount = MaterializedViews.incrementalRefreshes.get()

  private def groups = Seq("a", "b", "c", "d", "e")

  test("fold == recompute over randomized CDC windows (3 seeds x 8 rounds)") {
    Seq(11, 47, 101).foreach { seed =>
      withTempTable { dir =>
        val viewDir = dir + "-mv"
        val rnd = new scala.util.Random(seed)
        def mkRows(n: Int, idRange: Int): Seq[(Long, String, Option[Long], String)] =
          (0 until n).map { _ =>
            (rnd.nextInt(idRange).toLong,
              groups(rnd.nextInt(groups.size)),
              if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000).toLong),
              if (rnd.nextBoolean()) "eu" else "us")
          }.distinctBy(_._1)
        mkRows(30, 60).toDF("id", "g", "v", "region")
          .write.format("graft")
          .option("hashPartitions", "id").option("hashBucketNum", "2")
          .save(dir)
        val view = s"mvf_$seed"
        spark.read.format("graft").load(dir).createOrReplaceTempView(view)
        val sql = s"SELECT g, count(*) AS cnt, count(v) AS cv, " +
          s"sum(v) AS sv, avg(v) AS av, count(DISTINCT v) AS dv, " +
          s"count(v) FILTER (WHERE region = 'eu') AS cv_eu, " +
          s"sum(v) FILTER (WHERE region = 'eu') AS sv_eu " +
          s"FROM $view GROUP BY g"
        MaterializedViews.create(spark, viewDir, sql)

        val t = GraftTable.forPath(spark, dir)
        var folds = 0
        (1 to 8).foreach { round =>
          // 1-3 commits per window, weighted toward the CDC shapes
          (0 until 1 + rnd.nextInt(3)).foreach { _ =>
            rnd.nextInt(10) match {
              case 0 => // tombstone delete of a random id slice
                t.delete(col("id") % (2 + rnd.nextInt(5)) === 0)
              case 1 | 2 => // compaction: rewrite commit, no rows change
                t.compaction()
              case _ => // raw-image upsert: overwrites, moves, NULL flips
                val rows = mkRows(3 + rnd.nextInt(8), 80)
                if (rows.nonEmpty)
                  t.upsert(rows.toDF("id", "g", "v", "region"))
            }
          }
          val before = incCount
          MaterializedViews.refresh(spark, viewDir)
          if (incCount == before + 1) folds += 1
          val fresh = RQ.withoutRewrite { rowsOf(spark.sql(sql)) }
          val stored = rowsOf(spark.read.format("graft").load(viewDir))
          assert(stored == fresh,
            s"seed $seed round $round: fold diverged from recompute\n" +
              s" view: $stored\n sql:  $fresh")
        }
        assert(folds >= 5,
          s"seed $seed: only $folds/8 windows folded — the soak is " +
            "exercising the recompute path, not the fold")
      }
    }
  }

  test("MIN/MAX fold == recompute over randomized append-only windows") {
    Seq(7, 23).foreach { seed =>
      withTempTable { dir =>
        val viewDir = dir + "-mv"
        val rnd = new scala.util.Random(seed)
        var nextId = 0L
        def fresh(n: Int): Seq[(Long, String, Option[Long])] =
          (0 until n).map { _ =>
            nextId += 1
            (nextId, groups(rnd.nextInt(groups.size)),
              if (rnd.nextInt(6) == 0) None
              else Some(rnd.nextInt(2000).toLong - 1000))
          }
        fresh(20).toDF("id", "g", "v")
          .write.format("graft").save(dir)
        val view = s"mvf_mm_$seed"
        spark.read.format("graft").load(dir).createOrReplaceTempView(view)
        val sql = s"SELECT g, count(*) AS cnt, min(v) AS mn, max(v) AS mx, " +
          s"max(v) FILTER (WHERE v >= 0) AS mx_pos " +
          s"FROM $view GROUP BY g"
        MaterializedViews.create(spark, viewDir, sql)
        var folds = 0
        (1 to 6).foreach { round =>
          fresh(2 + rnd.nextInt(6)).toDF("id", "g", "v")
            .write.format("graft").mode("append").save(dir)
          val before = incCount
          MaterializedViews.refresh(spark, viewDir)
          if (incCount == before + 1) folds += 1
          val want = RQ.withoutRewrite { rowsOf(spark.sql(sql)) }
          val got = rowsOf(spark.read.format("graft").load(viewDir))
          assert(got == want,
            s"seed $seed round $round: min/max fold diverged\n" +
              s" view: $got\n sql:  $want")
        }
        assert(folds == 6, s"seed $seed: append-only windows must all fold")
      }
    }
  }

  test("MIN/MAX fold == recompute over randomized RETRACTION windows " +
      "(per-group touched-extreme recompute)") {
    Seq(13, 59).foreach { seed =>
      withTempTable { dir =>
        val viewDir = dir + "-mv"
        val rnd = new scala.util.Random(seed)
        def mkRows(n: Int, idRange: Int): Seq[(Long, String, Option[Long])] =
          (0 until n).map { _ =>
            (rnd.nextInt(idRange).toLong,
              groups(rnd.nextInt(groups.size)),
              if (rnd.nextInt(6) == 0) None
              else Some(rnd.nextInt(2000).toLong - 1000))
          }.distinctBy(_._1)
        mkRows(30, 60).toDF("id", "g", "v")
          .write.format("graft")
          .option("hashPartitions", "id").option("hashBucketNum", "2")
          .save(dir)
        val view = s"mvf_rt_$seed"
        spark.read.format("graft").load(dir).createOrReplaceTempView(view)
        // extremes alongside the additive kinds: a retraction window must
        // fold the counts/sums AND recompute exactly the touched groups'
        // extremes — divergence anywhere fails the hash compare
        val sql = s"SELECT g, count(*) AS cnt, min(v) AS mn, max(v) AS mx, " +
          s"min(v) FILTER (WHERE v >= 0) AS mn_pos " +
          s"FROM $view GROUP BY g"
        MaterializedViews.create(spark, viewDir, sql)
        val t = GraftTable.forPath(spark, dir)
        var folds = 0
        (1 to 8).foreach { round =>
          (0 until 1 + rnd.nextInt(3)).foreach { _ =>
            rnd.nextInt(10) match {
              case 0 => // tombstone delete: retracts whole id slices
                t.delete(col("id") % (2 + rnd.nextInt(5)) === 0)
              case 1 => t.compaction()
              case _ => // raw-image upsert: overwrites, group moves, NULLs
                val rows = mkRows(3 + rnd.nextInt(8), 80)
                if (rows.nonEmpty) t.upsert(rows.toDF("id", "g", "v"))
            }
          }
          val before = incCount
          MaterializedViews.refresh(spark, viewDir)
          if (incCount == before + 1) folds += 1
          val want = RQ.withoutRewrite { rowsOf(spark.sql(sql)) }
          val got = rowsOf(spark.read.format("graft").load(viewDir))
          assert(got == want,
            s"seed $seed round $round: retraction min/max fold diverged\n" +
              s" view: $got\n sql:  $want")
        }
        assert(folds >= 5,
          s"seed $seed: only $folds/8 retraction windows folded")
      }
    }
  }

  test("SELF-JOIN fold == recompute over randomized CDC windows " +
      "(both occurrences change with every commit)") {
    Seq(31, 73).foreach { seed =>
      withTempTable { dir =>
        val viewDir = dir + "-mv"
        val rnd = new scala.util.Random(seed)
        def mkRows(n: Int, idRange: Int): Seq[(Long, String, Option[Long])] =
          (0 until n).map { _ =>
            (rnd.nextInt(idRange).toLong,
              groups(rnd.nextInt(groups.size)),
              if (rnd.nextInt(6) == 0) None
              else Some(rnd.nextInt(200).toLong - 100))
          }.distinctBy(_._1)
        mkRows(25, 50).toDF("id", "g", "v")
          .write.format("graft")
          .option("hashPartitions", "id").option("hashBucketNum", "2")
          .save(dir)
        val view = s"mvf_sj_$seed"
        spark.read.format("graft").load(dir).createOrReplaceTempView(view)
        // within-group pair aggregate: every commit changes BOTH join
        // occurrences at once, so each window runs two telescoped folds
        // whose ΔA ⋈ ΔA cross term must land exactly once
        val sql = s"SELECT a.g AS g, count(*) AS cnt, sum(b.v) AS sv, " +
          s"count(b.v) AS cv, max(b.v) AS mx " +
          s"FROM $view a JOIN $view b ON a.g = b.g GROUP BY a.g"
        MaterializedViews.create(spark, viewDir, sql)
        val t = GraftTable.forPath(spark, dir)
        var folds = 0
        (1 to 6).foreach { round =>
          (0 until 1 + rnd.nextInt(2)).foreach { _ =>
            rnd.nextInt(8) match {
              case 0 => t.delete(col("id") % (2 + rnd.nextInt(4)) === 0)
              case 1 => t.compaction()
              case _ =>
                val rows = mkRows(2 + rnd.nextInt(6), 60)
                if (rows.nonEmpty) t.upsert(rows.toDF("id", "g", "v"))
            }
          }
          val before = incCount
          MaterializedViews.refresh(spark, viewDir)
          if (incCount == before + 1) folds += 1
          val want = RQ.withoutRewrite { rowsOf(spark.sql(sql)) }
          val got = rowsOf(spark.read.format("graft").load(viewDir))
          assert(got == want,
            s"seed $seed round $round: self-join fold diverged\n" +
              s" view: $got\n sql:  $want")
        }
        assert(folds >= 4,
          s"seed $seed: only $folds/6 self-join windows folded")
      }
    }
  }

  test("join-view fold == recompute when BOTH relations mutate every " +
      "window (sequential single-relation folds cover the cross term)") {
    Seq(13, 71).foreach { seed =>
      withTempTable { factDir => withTempTable { dimDir =>
        val viewDir = factDir + "-mv"
        val rnd = new scala.util.Random(seed)
        def mkFacts(n: Int): Seq[(Long, Long, Option[Long])] =
          (0 until n).map { _ =>
            (rnd.nextInt(60).toLong, (rnd.nextInt(6) + 1) * 10L,
              if (rnd.nextInt(5) == 0) None
              else Some(rnd.nextInt(500).toLong))
          }.distinctBy(_._1)
        def mkDims(n: Int): Seq[(Long, String)] =
          (0 until n).map { _ =>
            ((rnd.nextInt(8) + 1) * 10L, s"n${rnd.nextInt(20)}")
          }.distinctBy(_._1)
        mkFacts(25).toDF("id", "dim_id", "v").write.format("graft")
          .option("hashPartitions", "id").option("hashBucketNum", "2")
          .save(factDir)
        mkDims(6).toDF("did", "dname").write.format("graft")
          .option("hashPartitions", "did").option("hashBucketNum", "1")
          .save(dimDir)
        val fv = s"mvfj_f_$seed"; val dv = s"mvfj_d_$seed"
        spark.read.format("graft").load(factDir).createOrReplaceTempView(fv)
        spark.read.format("graft").load(dimDir).createOrReplaceTempView(dv)
        val sql = s"SELECT dname, count(*) AS cnt, count(v) AS cv, " +
          s"sum(v) AS sv FROM $fv JOIN $dv ON dim_id = did GROUP BY dname"
        MaterializedViews.create(spark, viewDir, sql)
        val tf = GraftTable.forPath(spark, factDir)
        val td = GraftTable.forPath(spark, dimDir)
        var folds = 0
        (1 to 8).foreach { round =>
          // BOTH sides mutate each window: upserts (moves, NULL flips,
          // renames), deletes, compactions
          rnd.nextInt(4) match {
            case 0 => tf.delete(col("id") % (3 + rnd.nextInt(4)) === 0)
            case 1 => tf.compaction()
            case _ =>
              val r = mkFacts(2 + rnd.nextInt(6))
              if (r.nonEmpty) tf.upsert(r.toDF("id", "dim_id", "v"))
          }
          rnd.nextInt(4) match {
            case 0 => td.delete(col("did") === (rnd.nextInt(8) + 1) * 10L)
            case _ =>
              val r = mkDims(1 + rnd.nextInt(3))
              if (r.nonEmpty) td.upsert(r.toDF("did", "dname"))
          }
          val before = incCount
          MaterializedViews.refresh(spark, viewDir)
          if (incCount == before + 1) folds += 1
          val want = RQ.withoutRewrite { rowsOf(spark.sql(sql)) }
          val got = rowsOf(spark.read.format("graft").load(viewDir))
          assert(got == want,
            s"seed $seed round $round: both-changed join fold diverged\n" +
              s" view: $got\n sql:  $want")
        }
        assert(folds >= 6,
          s"seed $seed: only $folds/8 windows folded — the soak is " +
            "exercising the recompute path, not the sequential fold")
        MaterializedViews.drop(spark, viewDir)
      } }
    }
  }
}
