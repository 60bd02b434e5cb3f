package graft

import org.apache.spark.sql.functions._

import graft.mv.MaterializedViews
import graft.tables.GraftTable

/** Incremental materialized-view refresh: eligible single-table aggregate
  * views fold the base's change feed into the stored state instead of
  * rescanning the base; anything else falls back to full recompute. Every
  * test cross-checks the refreshed view content against a from-scratch
  * evaluation of the view SQL. */
class MvIncrementalSuite extends GraftFunSuite {
  import spark.implicits._

  private def incCount = MaterializedViews.incrementalRefreshes.get()

  /** View content (rewrite suppressed) vs a fresh evaluation of the SQL. */
  private def assertMatchesRecompute(viewDir: String, sql: String): Unit = {
    val fresh = graft.mv.RewriteQueryByMaterialView.withoutRewrite {
      rowsOf(spark.sql(sql))
    }
    val stored = rowsOf(spark.read.format("graft").load(viewDir))
    assert(stored == fresh, s"view state diverged\n view: $stored\n sql: $fresh")
  }

  test("append-only window refreshes incrementally; content exact") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
        .toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_a")
      // sum(v) over a (nullable-on-read) column: eligibility requires the
      // count(v) companion, the same shape AVG-serving views use
      val sql = "SELECT g, count(*) AS cnt, count(v) AS cv, sum(v) AS sv " +
        "FROM mvi_a GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      Seq((4L, "b", 40L), (5L, "c", 5L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "expected the incremental path")
      assertMatchesRecompute(viewDir, sql)
      // rewrite serves the refreshed state
      assert(rowsOf(spark.sql(sql)).contains(Seq("c", 1L, 1L, 5L)))
    }
  }

  test("MIN/MAX fold incrementally over append-only windows; any other " +
      "commit type sends them back to full recompute") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq[(Long, String, Option[Long])](
          (1L, "a", Some(10L)), (2L, "a", Some(20L)), (3L, "b", Some(30L)))
        .toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_mm")
      val sql = "SELECT g, count(*) AS cnt, min(v) AS mn, max(v) AS mx " +
        "FROM mvi_mm GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)

      // append-only window: extends one extreme, opens a new group, and
      // carries a NULL v (min/max must skip it)
      Seq((4L, "a", 5L), (5L, "c", 7L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      Seq[(Long, String, Option[Long])]((6L, "b", None))
        .toDF("id", "g", "v").write.format("graft").mode("append").save(dir)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1,
        "append-only MIN/MAX must take the incremental path")
      assertMatchesRecompute(viewDir, sql)
      assert(rowsOf(spark.sql(sql)).contains(Seq("a", 3L, 5L, 20L)))

      // routine maintenance mid-window yields ZERO feed rows and must NOT
      // defeat the fold: compaction + another append still folds
      GraftTable.forPath(spark, dir).compaction(force = true)
      Seq[(Long, String, Option[Long])]((7L, "c", Some(3L)))
        .toDF("id", "g", "v").write.format("graft").mode("append").save(dir)
      val beforeC = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == beforeC + 1,
        "a compaction in the window must not force the full recompute")
      assertMatchesRecompute(viewDir, sql)
      assert(rowsOf(spark.sql(sql)).contains(Seq("c", 2L, 3L, 7L)))

      // a DELETE retracting a stored extreme: the fold stays alive —
      // only the TOUCHED group recomputes from a group-pruned base scan
      GraftTable.forPath(spark, dir).delete(col("v") === 5L)
      val before2 = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before2 + 1,
        "a delete-bearing window folds via per-group extreme retraction")
      assertMatchesRecompute(viewDir, sql)
      assert(rowsOf(spark.sql(sql)).contains(Seq("a", 2L, 10L, 20L)))
    }
  }

  test("per-group MIN/MAX retraction: a mixed window folds incrementally, " +
      "recomputing only groups whose stored extreme was touched") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq[(Long, String, Option[Long])](
          (1L, "a", Some(10L)), (2L, "a", Some(20L)), (3L, "a", Some(30L)),
          (4L, "b", Some(1L)), (5L, "b", Some(9L)),
          (6L, "c", Some(4L)), (7L, "c", Some(6L)))
        .toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_rt")
      val sql = "SELECT g, count(*) AS cnt, min(v) AS mn, max(v) AS mx " +
        "FROM mvi_rt GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)

      // ONE window mixing: an append; a delete that removes group a's MIN
      // (touched → recompute a) and a middle value of b (untouched → pure
      // fold); and the runner-up answer for a (20) must come from the base,
      // not from least(stored, inserted)
      Seq((8L, "b", 2L), (9L, "d", 50L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      GraftTable.forPath(spark, dir)
        .delete(col("v") === 10L || col("v") === 9L)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "mixed window must fold")
      assertMatchesRecompute(viewDir, sql)
      val rows = rowsOf(spark.sql(sql))
      assert(rows.contains(Seq("a", 2L, 20L, 30L)), s"runner-up min: $rows")
      assert(rows.contains(Seq("b", 2L, 1L, 2L)))
      assert(rows.contains(Seq("d", 1L, 50L, 50L)))

      // insert-then-delete INSIDE one window: a group born this window has
      // no stored image, so the touch test must compare retractions
      // against the inserted-side candidate, not the stored extreme alone
      Seq((11L, "e", -7L), (12L, "e", 3L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      GraftTable.forPath(spark, dir).delete(col("v") === -7L)
      val beforeE = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == beforeE + 1)
      assertMatchesRecompute(viewDir, sql)
      assert(rowsOf(spark.sql(sql)).contains(Seq("e", 1L, 3L, 3L)))

      // retraction that empties a group entirely: lifecycle still drops it
      GraftTable.forPath(spark, dir).delete(col("g") === "d")
      val before2 = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before2 + 1)
      assertMatchesRecompute(viewDir, sql)
      assert(!rowsOf(spark.sql(sql)).exists(_.head == "d"))

      // an UPDATE moving the stored max DOWN (pre-image touches mx): the
      // group recomputes; simultaneously group c extends via insert only
      GraftTable.forPath(spark, dir)
        .update(col("v") === 30L, Map("v" -> lit(15L)))
      Seq((10L, "c", 8L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      val before3 = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before3 + 1)
      assertMatchesRecompute(viewDir, sql)
      val rows3 = rowsOf(spark.sql(sql))
      assert(rows3.contains(Seq("a", 2L, 15L, 20L)))
      assert(rows3.contains(Seq("c", 3L, 4L, 8L)))
    }
  }

  test("per-group retraction folds CDC raw-image upserts and FILTER " +
      "extremes on a PK table") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
        .toDF("id", "g", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_cdc")
      val sql = "SELECT g, count(*) AS cnt, " +
        "max(v) FILTER (WHERE v < 35) AS mxf, min(v) AS mn " +
        "FROM mvi_cdc GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)

      // raw-image upsert window: id=2 moves 20→50 (retracts a's filtered
      // max AND nothing else — a recomputes), id=5 is a plain new row in b
      GraftTable.forPath(spark, dir).upsert(
        Seq((2L, "a", 50L), (5L, "b", 25L)).toDF("id", "g", "v"))
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "CDC upsert window must fold")
      assertMatchesRecompute(viewDir, sql)
      val rows = rowsOf(spark.sql(sql))
      // a: rows (10, 50) → filtered max 10, min 10; b: (30, 40, 25)
      assert(rows.contains(Seq("a", 2L, 10L, 10L)), s"got $rows")
      assert(rows.contains(Seq("b", 3L, 30L, 25L)))
    }
  }

  test("per-group retraction on a JOIN view: a fact delete touching one " +
      "group's extreme folds; dimension-side retraction too") {
    withTempTable { dir =>
      val fact = dir + "-f"; val dimd = dir + "-d"; val viewDir = dir + "-mv"
      Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 30L), (4L, 2L, 40L))
        .toDF("id", "k", "v").write.format("graft").save(fact)
      Seq((1L, "x"), (2L, "y")).toDF("k", "name")
        .write.format("graft").save(dimd)
      spark.read.format("graft").load(fact).createOrReplaceTempView("mvj_f")
      spark.read.format("graft").load(dimd).createOrReplaceTempView("mvj_d")
      val sql = "SELECT name, count(*) AS cnt, max(v) AS mx " +
        "FROM mvj_f JOIN mvj_d ON mvj_f.k = mvj_d.k GROUP BY name"
      MaterializedViews.create(spark, viewDir, sql)

      // fact-side delete retracts group x's max (20) → x recomputes to 10;
      // y untouched by extremes, extended by an insert
      GraftTable.forPath(spark, fact).delete(col("v") === 20L)
      Seq((5L, 2L, 45L)).toDF("id", "k", "v")
        .write.format("graft").mode("append").save(fact)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "join-view retraction window must fold")
      assertMatchesRecompute(viewDir, sql)
      var rows = rowsOf(spark.sql(sql))
      assert(rows.contains(Seq("x", 1L, 10L)))
      assert(rows.contains(Seq("y", 3L, 45L)))

      // dimension-side retraction: renaming y moves its fact rows to a new
      // group — both the emptied and the created group carry the extreme
      GraftTable.forPath(spark, dimd)
        .update(col("name") === "y", Map("name" -> lit("z")))
      val before2 = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before2 + 1)
      assertMatchesRecompute(viewDir, sql)
      rows = rowsOf(spark.sql(sql))
      assert(rows.contains(Seq("z", 3L, 45L)) && !rows.exists(_.head == "y"))
    }
  }

  test("update and delete commits fold through pre/post images") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      (1L to 10L).map(i => (i, if (i % 2 == 0) "e" else "o", i))
        .toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_b")
      val sql = "SELECT g, count(*) AS cnt, count(v) AS cv, sum(v) AS sv " +
        "FROM mvi_b GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      val t = GraftTable.forPath(spark, dir)
      t.updateExpr("id <= 3", Map("v" -> "v + 100"))
      t.deleteExpr("id >= 9")
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1)
      assertMatchesRecompute(viewDir, sql)
    }
  }

  test("group lifecycle: emptied groups drop, sums return to NULL") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "gone", Some(1L)), (2L, "nulls", Some(7L)),
        (3L, "nulls", Option.empty[Long]), (4L, "keep", Some(4L)))
        .toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_c")
      val sql = "SELECT g, count(*) AS cnt, count(v) AS cv, sum(v) AS sv " +
        "FROM mvi_c GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      val t = GraftTable.forPath(spark, dir)
      t.deleteExpr("id = 1") // 'gone' loses its only row
      t.deleteExpr("id = 2") // 'nulls' loses its only NON-NULL v
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1)
      assertMatchesRecompute(viewDir, sql)
      val rows = rowsOf(spark.read.format("graft").load(viewDir))
      assert(!rows.exists(_.head == "gone"), s"emptied group survived: $rows")
      // the all-null group keeps its row; the sum is NULL again, not 0
      assert(rows.contains(Seq("nulls", 1L, 0L, null)), rows.toString)
    }
  }

  test("view filter scopes the delta") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L), (2L, "b", 90L)).toDF("id", "g", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_d")
      val sql = "SELECT g, count(*) AS cnt FROM mvi_d WHERE v < 50 GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      Seq((3L, "a", 99L), (4L, "a", 7L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1)
      assertMatchesRecompute(viewDir, sql)
      assert(rowsOf(spark.read.format("graft").load(viewDir)) ==
        Seq(Seq("a", 2L))) // only the v<50 append counted
    }
  }

  test("raw-image delta upserts (the canonical CDC shape) fold " +
      "incrementally via resolved pre-images") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "g", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_e")
      val sql = "SELECT g, count(*) AS cnt, count(v) AS cv, sum(v) AS sv " +
        "FROM mvi_e GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      // delta upsert writes raw images; the fold resolves pre-images by
      // diffing the touched buckets' merged state — key 1 overwritten
      // (update pair), key 3 fresh (insert), key 2 moves groups b→c
      GraftTable.forPath(spark, dir)
        .upsert(Seq((1L, "a", 11L), (3L, "c", 30L), (2L, "c", 20L))
          .toDF("id", "g", "v"))
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1,
        "an upsert-only window must take the incremental path")
      assertMatchesRecompute(viewDir, sql)
      assert(rowsOf(spark.sql(sql)).contains(Seq("a", 1L, 1L, 11L)))
      // group b emptied by the move; c holds both movers
      assert(!rowsOf(spark.sql(sql)).exists(_.head == "b"))
      assert(rowsOf(spark.sql(sql)).contains(Seq("c", 2L, 2L, 50L)))

      // a second window mixing another upsert with a tombstone DELETE
      // still folds (both commit kinds yield pre/post images)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((4L, "a", 4L)).toDF("id", "g", "v"))
      t.delete(col("id") === 1L)
      val before2 = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before2 + 1)
      assertMatchesRecompute(viewDir, sql)
    }
  }

  test("AVG folds through its sum+count companions; integral args exact") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", Some(10L)), (2L, "a", Option.empty[Long]),
        (3L, "b", Some(7L))).toDF("id", "g", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_avg")
      val sql = "SELECT g, count(*) AS cnt, count(v) AS cv, sum(v) AS sv, " +
        "avg(v) AS av FROM mvi_avg GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      // window with an insert AND an upsert that retracts a contributor
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((4L, "a", Some(20L))).toDF("id", "g", "v"))
      t.upsert(Seq((3L, "b", Option.empty[Long])).toDF("id", "g", "v"))
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "avg with companions must fold")
      assertMatchesRecompute(viewDir, sql)
      // b's only non-null contributor was retracted: avg returns to NULL
      assert(rowsOf(spark.sql(sql)).contains(Seq("b", 1L, 0L, null, null)))
      assert(rowsOf(spark.sql(sql)).contains(Seq("a", 3L, 2L, 30L, 15.0d)))
    }
  }

  test("join view folds when exactly one relation changed — and when both " +
      "changed in one window") {
    withTempTable { factDir => withTempTable { dimDir =>
      val viewDir = factDir + "-mv"
      Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 10L, 50L))
        .toDF("id", "dim_id", "amount").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(factDir)
      Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("did", "dname")
        .write.format("graft")
        .option("hashPartitions", "did").option("hashBucketNum", "1")
        .save(dimDir)
      spark.read.format("graft").load(factDir)
        .createOrReplaceTempView("mvi_fact")
      spark.read.format("graft").load(dimDir)
        .createOrReplaceTempView("mvi_dim")
      val sql = "SELECT dname, count(*) AS cnt, sum(amount) AS amt " +
        "FROM mvi_fact JOIN mvi_dim ON dim_id = did GROUP BY dname"
      MaterializedViews.create(spark, viewDir, sql)

      // fact-only window: append + upsert (update moves a row across dims,
      // insert lands on a dim with no prior rows)
      val tf = GraftTable.forPath(spark, factDir)
      tf.upsert(Seq((4L, 20L, 1L)).toDF("id", "dim_id", "amount"))
      tf.upsert(Seq((1L, 30L, 100L)).toDF("id", "dim_id", "amount"))
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "fact-only window must fold")
      assertMatchesRecompute(viewDir, sql)
      assert(rowsOf(spark.sql(sql)).contains(Seq("z", 1L, 100L)))
      assert(rowsOf(spark.sql(sql)).contains(Seq("y", 2L, 201L)))

      // dim-only window folds too (the fold is symmetric in which side
      // changed): rename dim 10 — every joined fact row re-labels
      GraftTable.forPath(spark, dimDir)
        .upsert(Seq((10L, "x2")).toDF("did", "dname"))
      val beforeD = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == beforeD + 1, "dim-only window must fold")
      assertMatchesRecompute(viewDir, sql)
      assert(rowsOf(spark.sql(sql)).contains(Seq("x2", 1L, 50L)))

      // both sides changed in one window: two sequential single-relation
      // folds (Δfact ⋈ dim_old, then Δdim ⋈ fact_new) cover the cross
      // term — the new fact row 5 joins dim 30 exactly once even though
      // dim 30 was renamed in the same window
      GraftTable.forPath(spark, factDir)
        .upsert(Seq((5L, 30L, 7L)).toDF("id", "dim_id", "amount"))
      GraftTable.forPath(spark, dimDir)
        .upsert(Seq((30L, "z2")).toDF("did", "dname"))
      val beforeB = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == beforeB + 1, "both-changed window must fold")
      assertMatchesRecompute(viewDir, sql)
      assert(rowsOf(spark.sql(sql)).contains(Seq("z2", 2L, 107L)))
    } }
  }

  test("both-changed fold survives deletes, cross-dim moves and group " +
      "lifecycle on each side of the window; 3-way joins too") {
    withTempTable { factDir => withTempTable { dimDir =>
      val viewDir = factDir + "-mv"
      Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 10L, 50L), (4L, 20L, 5L))
        .toDF("id", "dim_id", "amount").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(factDir)
      Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("did", "dname")
        .write.format("graft")
        .option("hashPartitions", "did").option("hashBucketNum", "1")
        .save(dimDir)
      spark.read.format("graft").load(factDir)
        .createOrReplaceTempView("mvb_fact")
      spark.read.format("graft").load(dimDir)
        .createOrReplaceTempView("mvb_dim")
      val sql = "SELECT dname, count(*) AS cnt, sum(amount) AS amt " +
        "FROM mvb_fact JOIN mvb_dim ON dim_id = did GROUP BY dname"
      MaterializedViews.create(spark, viewDir, sql)

      // one window, both relations: fact deletes a row, moves a row to a
      // dim renamed IN THE SAME WINDOW, and inserts onto a dim deleted in
      // the same window; dim renames 10, deletes 20, inserts 40
      val tf = GraftTable.forPath(spark, factDir)
      val td = GraftTable.forPath(spark, dimDir)
      tf.delete(col("id") === 3L)
      tf.upsert(Seq((1L, 20L, 100L), (5L, 40L, 9L))
        .toDF("id", "dim_id", "amount"))
      td.upsert(Seq((10L, "x9"), (40L, "w")).toDF("did", "dname"))
      td.delete(col("did") === 20L)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1,
        "mixed both-changed window must fold incrementally")
      assertMatchesRecompute(viewDir, sql)
      val got = rowsOf(spark.read.format("graft").load(viewDir))
      // group "y" vanished (dim 20 deleted retracts facts 1, 2 and 4);
      // "w" is born from the cross term (new fact 5 ⋈ new dim 40)
      assert(!got.exists(_.head == "y"))
      assert(got.contains(Seq("w", 1L, 9L)))
      assert(!got.exists(_.head == "x"))

      // 3-way join with two of three relations changing in one window
      withTempTable { catDir =>
        val v3 = factDir + "-mv3"
        Seq((100L, 10L), (200L, 20L), (300L, 40L)).toDF("cid", "cdid")
          .write.format("graft")
          .option("hashPartitions", "cid").option("hashBucketNum", "1")
          .save(catDir)
        spark.read.format("graft").load(catDir)
          .createOrReplaceTempView("mvb_cat")
        val sql3 = "SELECT dname, count(*) AS cnt, sum(amount) AS amt " +
          "FROM mvb_fact JOIN mvb_dim ON dim_id = did " +
          "JOIN mvb_cat ON cdid = did GROUP BY dname"
        MaterializedViews.create(spark, v3, sql3)
        tf.upsert(Seq((6L, 10L, 11L)).toDF("id", "dim_id", "amount"))
        td.upsert(Seq((10L, "x10")).toDF("did", "dname"))
        val b3 = incCount
        assert(MaterializedViews.refresh(spark, v3))
        assert(incCount == b3 + 1, "two-of-three changed must fold")
        assertMatchesRecompute(v3, sql3)
        MaterializedViews.drop(spark, v3)
      }
    } }
  }

  test("FILTER (WHERE p) aggregates fold via guarded args; a filtered " +
      "sum requires the same-filtered count companion") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L, "eu"), (2L, "a", 20L, "us"), (3L, "b", 5L, "eu"))
        .toDF("id", "g", "v", "region")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_flt")
      val sql = "SELECT g, count(*) AS cnt, " +
        "count(v) FILTER (WHERE region = 'eu') AS cv_eu, " +
        "sum(v) FILTER (WHERE region = 'eu') AS sv_eu FROM mvi_flt GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      // window with an insert that passes the filter, one that fails it,
      // and an upsert MOVING a row out of the filter (region eu → us)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((4L, "b", 7L, "eu"), (5L, "a", 100L, "us"))
        .toDF("id", "g", "v", "region"))
      t.upsert(Seq((1L, "a", 10L, "us")).toDF("id", "g", "v", "region"))
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "filtered aggregates must fold")
      assertMatchesRecompute(viewDir, sql)
      val rows = rowsOf(spark.sql(sql))
      // a: row 1 left the filter (sum returns to NULL via the companion
      // guard — zero eu contributors remain), b: gained one
      assert(rows.contains(Seq("a", 3L, 0L, null)), rows.toString)
      assert(rows.contains(Seq("b", 2L, 2L, 12L)), rows.toString)

      // a filtered sum WITHOUT its same-filtered count companion must
      // recompute (the NULL-restore guard has nothing to key on)
      val viewDir2 = dir + "-mv2"
      val sql2 = "SELECT g, count(*) AS cnt, " +
        "sum(v) FILTER (WHERE region = 'eu') AS sv_eu FROM mvi_flt GROUP BY g"
      MaterializedViews.create(spark, viewDir2, sql2)
      t.upsert(Seq((6L, "c", 1L, "eu")).toDF("id", "g", "v", "region"))
      val before2 = incCount
      assert(MaterializedViews.refresh(spark, viewDir2))
      assert(incCount == before2,
        "companion-less filtered sum must take the full recompute")
      assertMatchesRecompute(viewDir2, sql2)
    }
  }

  test("SELF-JOIN view folds: both occurrences change together, the " +
      "per-occurrence telescoping covers the quadratic cross terms") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
        .toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_sj")
      // all pairs within a group: |G|^2 rows per group — the fold must
      // account ΔA ⋈ A_old, A_new ⋈ ΔA and the ΔA ⋈ ΔA cross term
      val sql = "SELECT a.g AS g, count(*) AS cnt, sum(b.v) AS sv, " +
        "count(b.v) AS cv, min(b.v) AS mn " +
        "FROM mvi_sj a JOIN mvi_sj b ON a.g = b.g GROUP BY a.g"
      MaterializedViews.create(spark, viewDir, sql)

      // append-only window: group a 2→3 rows (cnt 4→9), new group c
      Seq((5L, "a", 5L), (6L, "c", 7L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "self-join append window must fold")
      assertMatchesRecompute(viewDir, sql)
      val rows = rowsOf(spark.sql(sql))
      assert(rows.contains(Seq("a", 9L, 105L, 9L, 5L)), s"got $rows")
      assert(rows.contains(Seq("c", 1L, 7L, 1L, 7L)))

      // retraction window: delete group a's min (touches mn on BOTH
      // occurrences) and empty group c entirely
      GraftTable.forPath(spark, dir)
        .delete(col("v") === 5L || col("g") === "c")
      val before2 = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before2 + 1, "self-join retraction window must fold")
      assertMatchesRecompute(viewDir, sql)
      val rows2 = rowsOf(spark.sql(sql))
      assert(rows2.contains(Seq("a", 4L, 60L, 4L, 10L)))
      assert(!rows2.exists(_.head == "c"))
    }
  }

  test("COUNT/SUM(DISTINCT) columns recompute per CHANGED GROUP while " +
      "additive columns fold; unchanged groups keep stored images") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L),
          (4L, "b", 30L), (5L, "c", 7L))
        .toDF("id", "g", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_dd")
      val sql = "SELECT g, count(*) AS cnt, sum(v) AS sv, " +
        "count(DISTINCT v) AS dv, sum(DISTINCT v) AS sdv, " +
        "count(DISTINCT v) FILTER (WHERE v >= 10) AS dvf " +
        "FROM mvi_dd GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)

      // insert-only window: a gains a DUPLICATE value (dv must NOT move),
      // b a new value, c untouched (keeps its stored image verbatim)
      GraftTable.forPath(spark, dir).upsert(
        Seq((6L, "a", 20L), (7L, "b", 40L)).toDF("id", "g", "v"))
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "distinct-bearing view must fold")
      assertMatchesRecompute(viewDir, sql)
      val rows = rowsOf(spark.sql(sql))
      assert(rows.contains(Seq("a", 4L, 60L, 2L, 30L, 2L)), s"got $rows")
      assert(rows.contains(Seq("b", 2L, 70L, 2L, 70L, 2L)))
      assert(rows.contains(Seq("c", 1L, 7L, 1L, 7L, 0L)))

      // retraction window (CDC upsert + tombstone delete): one of a's two
      // 20s goes away (dv unchanged), a's last 10 moves to value 99 (dv
      // unchanged, sdv moves), b loses 40 entirely (dv drops)
      GraftTable.forPath(spark, dir).upsert(
        Seq((2L, "a", 99L)).toDF("id", "g", "v"))
      GraftTable.forPath(spark, dir)
        .delete(col("id") === 6L || col("id") === 7L)
      val before2 = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before2 + 1)
      assertMatchesRecompute(viewDir, sql)
      val rows2 = rowsOf(spark.sql(sql))
      // a: values (10, 99, 20) → dv 3, sdv 129; b: (30) → dv 1
      assert(rows2.contains(Seq("a", 3L, 129L, 3L, 129L, 3L)), s"got $rows2")
      assert(rows2.contains(Seq("b", 1L, 30L, 1L, 30L, 1L)))
      assert(rows2.contains(Seq("c", 1L, 7L, 1L, 7L, 0L)))
    }
  }

  test("multi-key grouped DISTINCT view recomputes changed groups via the " +
      "null-safe semi join (the literal-isin prune is single-key only)") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq[(Long, String, Option[String], Long)](
          (1L, "a", Some("eu"), 10L), (2L, "a", Some("eu"), 10L),
          (3L, "a", None, 5L), (4L, "b", Some("us"), 30L))
        .toDF("id", "g", "region", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_mk")
      val sql = "SELECT g, region, count(*) AS cnt, " +
        "count(DISTINCT v) AS dv, min(v) AS mn " +
        "FROM mvi_mk GROUP BY g, region"
      MaterializedViews.create(spark, viewDir, sql)

      // retraction touching the NULL-region group's min plus a duplicate
      // insert elsewhere: the semi join must match null keys (<=>)
      GraftTable.forPath(spark, dir).delete(col("id") === 3L)
      Seq[(Long, String, Option[String], Long)]((5L, "b", Some("us"), 30L))
        .toDF("id", "g", "region", "v")
        .write.format("graft").mode("append").save(dir)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "multi-key window must fold")
      assertMatchesRecompute(viewDir, sql)
      val rows = rowsOf(spark.sql(sql))
      assert(!rows.exists(r => r.head == "a" && r(1) == null))
      assert(rows.contains(Seq("b", "us", 2L, 1L, 30L)), s"got $rows")
    }
  }

  test("MULTI-KEY group-pruned recompute: a 2-key view's extreme " +
      "recompute pushes per-key isin filters that prune the base scan " +
      "to the touched partitions; content matches full recompute") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      // base range-partitioned by g: the prune is observable in the
      // planned file list of the captured recompute frame
      Seq[(Long, String, String, Long)](
          (1L, "a", "eu", 10L), (2L, "a", "eu", 20L), (3L, "a", "us", 5L),
          (4L, "b", "eu", 30L), (5L, "b", "us", 40L), (6L, "c", "eu", 7L))
        .toDF("id", "g", "region", "v").write.format("graft")
        .option("rangePartitions", "g").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_mkp")
      val sql = "SELECT g, region, count(*) AS cnt, min(v) AS mn " +
        "FROM mvi_mkp GROUP BY g, region"
      MaterializedViews.create(spark, viewDir, sql)
      // retract group (a, eu)'s stored min: exactly that group recomputes
      GraftTable.forPath(spark, dir).delete(col("id") === 1L)
      spark.conf.set("spark.graft.mv.captureRecomputePlan", "true")
      try {
        MaterializedViews.lastRecomputeFrame = None
        val before = incCount
        assert(MaterializedViews.refresh(spark, viewDir))
        assert(incCount == before + 1, "2-key retraction must fold")
        assertMatchesRecompute(viewDir, sql)
        assert(rowsOf(spark.sql(sql)).contains(Seq("a", "eu", 1L, 20L)))
        val frame = MaterializedViews.lastRecomputeFrame
          .getOrElse(fail("recompute frame not captured"))
        // PLAN gate: every file the recompute scan planned comes from the
        // touched g=a partition — the per-key isin pushed into planning
        val scans = org.apache.spark.sql.classic.ClassicConversions
          .castToImpl(frame).queryExecution.sparkPlan.collect {
            case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec => b
          }
        assert(scans.nonEmpty, "recompute must scan the base")
        val files: Seq[String] = scans.flatMap(_.inputPartitions).flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.filePath.toString).toSeq
          case p: graft.sources.GraftPkInputPartition =>
            p.groups.toSeq.flatMap(_.files.toSeq.map(_.absPath))
          case other => Seq(other.toString)
        }
        assert(files.nonEmpty, "recompute scan must plan files")
        assert(files.forall(_.contains("g=a")),
          s"recompute must scan ONLY the touched partition, planned: $files")
        // and the exact semi join behind the superset prune is present
        val hasSemi = org.apache.spark.sql.classic.ClassicConversions
          .castToImpl(frame).queryExecution.optimizedPlan.collectFirst {
            case j: org.apache.spark.sql.catalyst.plans.logical.Join
                if j.joinType.sql.toUpperCase.contains("SEMI") => j
          }.nonEmpty
        assert(hasSemi, "multi-key prune keeps the exact semi join")
      } finally spark.conf.unset("spark.graft.mv.captureRecomputePlan")
    }
  }

  test("multi-key view with a STRUCT group key: refresh stays correct " +
      "(unliterable keys fall back to the semi join, never crash)") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", "x", 10L), (2L, "a", "x", 20L), (3L, "b", "y", 30L))
        .toDF("id", "g", "sub", "v")
        .selectExpr("id", "named_struct('g', g, 'sub', sub) AS k", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_sk")
      val sql = "SELECT k, count(*) AS cnt, min(v) AS mn " +
        "FROM mvi_sk GROUP BY k"
      MaterializedViews.create(spark, viewDir, sql)
      // retraction touching one struct-keyed group's min: the recompute
      // path must not try to literalize the struct key
      GraftTable.forPath(spark, dir).delete(col("id") === 1L)
      assert(MaterializedViews.refresh(spark, viewDir))
      assertMatchesRecompute(viewDir, sql)
      val rows = rowsOf(spark.read.format("graft").load(viewDir))
      assert(rows.exists(r => r(1) == 1L && r(2) == 20L), s"got $rows")
    }
  }

  test("ineligible shapes (no row-count lifecycle, double sum) fall back " +
      "and stay correct") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      val viewDir2 = dir + "-mv2"
      Seq((1L, "a", 10L, 1.5), (2L, "b", 20L, 2.5))
        .toDF("id", "g", "v", "d").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_f")
      // avg without ANY row-count column: group lifecycle is undecidable
      val avgSql = "SELECT g, avg(v) AS av FROM mvi_f GROUP BY g"
      // double sum: accumulation-order-dependent, never folds
      val dblSql = "SELECT g, count(*) AS cnt, sum(d) AS sd " +
        "FROM mvi_f GROUP BY g"
      MaterializedViews.create(spark, viewDir, avgSql)
      MaterializedViews.create(spark, viewDir2, dblSql)
      Seq((3L, "a", 30L, 3.5)).toDF("id", "g", "v", "d")
        .write.format("graft").mode("append").save(dir)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(MaterializedViews.refresh(spark, viewDir2))
      assert(incCount == before,
        "lifecycle-less avg / double-sum views must recompute fully")
      assertMatchesRecompute(viewDir, avgSql)
      assertMatchesRecompute(viewDir2, dblSql)
    }
  }

  test("companion-less, FILTERed and decimal AVG fold via changed-group " +
      "recompute when a row-count column exists") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L, "7.25"), (2L, "a", 21L, "1.50"),
          (3L, "b", 30L, "2.00"))
        .toDF("id", "g", "v", "m")
        .selectExpr("id", "g", "v", "CAST(m AS DECIMAL(10,2)) AS m")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_av")
      val sql = "SELECT g, count(*) AS cnt, avg(v) AS av, " +
        "avg(v) FILTER (WHERE v >= 20) AS avf, avg(m) AS am " +
        "FROM mvi_av GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)

      // insert-only window shifts a's averages; b untouched keeps stored
      Seq[(Long, String, Long, String)]((4L, "a", 29L, "3.25"))
        .toDF("id", "g", "v", "m")
        .selectExpr("id", "g", "v", "CAST(m AS DECIMAL(10,2)) AS m")
        .write.format("graft").mode("append").save(dir)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1, "companion-less avg view must fold")
      assertMatchesRecompute(viewDir, sql)

      // retraction window: delete one of a's rows — avg recomputes from
      // the surviving rows, not from any foldable scalar
      GraftTable.forPath(spark, dir).delete(col("id") === 2L)
      val before2 = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before2 + 1)
      assertMatchesRecompute(viewDir, sql)
      val rows = rowsOf(spark.sql(sql))
      // a = {10, 29}: avg 19.5, filtered avg 29.0, decimal avg 5.25
      assert(rows.exists(r => r.head == "a" && r(1) == 2L &&
        r(2) == 19.5 && r(3) == 29.0), s"got $rows")
    }
  }

  test("PK-layout view: incremental refresh writes only changed groups") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "b", 5L), (4L, "gone", 9L))
        .toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_pk")
      val sql = "SELECT g, count(*) AS cnt, count(v) AS cv, sum(v) AS sv " +
        "FROM mvi_pk GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql,
        Map("hashPartitions" -> "g", "hashBucketNum" -> "2"))
      Seq((5L, "b", 100L), (6L, "c", 7L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      GraftTable.forPath(spark, dir).deleteExpr("g = 'gone'")
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1)
      assertMatchesRecompute(viewDir, sql)
      // the refresh committed a DELTA (changed groups + tombstone), not an
      // overwrite of the whole view table
      val norm = graft.meta.SnapshotManagement.normalize(viewDir)
      val lastV = graft.meta.SnapshotManagement.store.latestVersion(norm)
      val ct = graft.meta.SnapshotManagement.store.read(norm, lastV)
        .flatMap(_.commit).head.commitType
      assert(ct == "delta", s"expected a delta commit, got $ct")
      // emptied group is gone through the merge-on-read tombstone
      assert(!rowsOf(spark.read.format("graft").load(viewDir))
        .exists(_.head == "gone"))
      // a second incremental window composes on top of the delta state
      Seq((7L, "c", 3L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 2)
      assertMatchesRecompute(viewDir, sql)
    }
  }

  test("PK layout narrower than the group key fails loudly on collision") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", "b1", 10L)).toDF("id", "g1", "g2", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_nk")
      val sql = "SELECT g1, g2, count(*) AS cnt FROM mvi_nk GROUP BY g1, g2"
      // hash key g1 is unique at create (one group) — legal then
      MaterializedViews.create(spark, viewDir, sql,
        Map("hashPartitions" -> "g1", "hashBucketNum" -> "1"))
      // a second g2 under the same g1 collides on the narrow hash key:
      // last-wins storage would silently drop one of the two groups
      Seq((2L, "a", "b2", 20L)).toDF("id", "g1", "g2", "v")
        .write.format("graft").mode("append").save(dir)
      val e = intercept[IllegalStateException] {
        MaterializedViews.refresh(spark, viewDir)
      }
      assert(e.getMessage.contains("multiple rows for hash key"))
    }
  }

  test("a view table advanced past its meta pin falls back to recompute") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L)).toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_h")
      val sql = "SELECT g, count(*) AS cnt FROM mvi_h GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      // simulate the crash window: the view TABLE commits a state the meta
      // file never recorded (here: a stray direct write) — folding a delta
      // onto that state would double-count, so the pin must force the
      // idempotent full path
      graft.mv.RewriteQueryByMaterialView.withoutRewrite {
        spark.read.format("graft").load(viewDir)
          .write.format("graft").mode("overwrite").save(viewDir)
      }
      Seq((2L, "a", 20L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      val before = incCount
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before, "unpinned view state must not fold a delta")
      assertMatchesRecompute(viewDir, sql)
      // the recompute re-pinned: the next eligible window is incremental
      Seq((3L, "b", 30L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(incCount == before + 1)
      assertMatchesRecompute(viewDir, sql)
    }
  }

  test("maintainStream keeps the view continuously fresh; CDC batches " +
      "take the fold path") {
    withTempTable { dir => withTempTable { ckpt =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "g", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      spark.read.format("graft").load(dir)
        .createOrReplaceTempView("mvi_stream")
      val sql = "SELECT g, count(*) AS cnt, count(v) AS cv, sum(v) AS sv " +
        "FROM mvi_stream GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      val queries = MaterializedViews.maintainStream(spark, viewDir, ckpt)
      try {
        assert(queries.size == 1, "single-relation view tails one stream")
        val t = GraftTable.forPath(spark, dir)
        val before = incCount
        t.upsert(Seq((1L, "a", 11L), (3L, "c", 30L)).toDF("id", "g", "v"))
        queries.foreach(_.processAllAvailable())
        assert(incCount > before,
          "the maintenance refresh must take the incremental fold")
        assertMatchesRecompute(viewDir, sql)
        // a second window (including a delete) flows through the same tail
        t.delete(col("id") === 2L)
        queries.foreach(_.processAllAvailable())
        assertMatchesRecompute(viewDir, sql)
        assert(!rowsOf(spark.read.format("graft").load(viewDir))
          .exists(_.head == "b"))
      } finally queries.foreach(_.stop())
    } }
  }

  test("maintainStream tails BOTH relations of a join view; concurrent " +
      "triggers serialize through the per-view lock") {
    withTempTable { factDir => withTempTable { dimDir =>
      val viewDir = factDir + "-mv"
      val ckpt = factDir + "-ckpt"
      Seq((1L, 10L, 100L), (2L, 20L, 200L)).toDF("id", "dim_id", "amount")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(factDir)
      Seq((10L, "x"), (20L, "y")).toDF("did", "dname")
        .write.format("graft")
        .option("hashPartitions", "did").option("hashBucketNum", "1")
        .save(dimDir)
      spark.read.format("graft").load(factDir)
        .createOrReplaceTempView("mvs_fact")
      spark.read.format("graft").load(dimDir)
        .createOrReplaceTempView("mvs_dim")
      val sql = "SELECT dname, count(*) AS cnt, sum(amount) AS amt " +
        "FROM mvs_fact JOIN mvs_dim ON dim_id = did GROUP BY dname"
      MaterializedViews.create(spark, viewDir, sql)
      val queries = MaterializedViews.maintainStream(spark, viewDir, ckpt)
      try {
        assert(queries.size == 2, "join view tails both relations")
        // mutate BOTH sides; the two tails trigger two refreshes (their
        // order is scheduler-chosen — the lock + pins keep state sane)
        GraftTable.forPath(spark, factDir)
          .upsert(Seq((3L, 20L, 7L)).toDF("id", "dim_id", "amount"))
        GraftTable.forPath(spark, dimDir)
          .upsert(Seq((10L, "x2")).toDF("did", "dname"))
        queries.foreach(_.processAllAvailable())
        // one more settle pass: the second refresh may have observed both
        // windows at once (both-changed → full recompute — still exact)
        queries.foreach(_.processAllAvailable())
        assertMatchesRecompute(viewDir, sql)
        val rows = rowsOf(spark.read.format("graft").load(viewDir))
        assert(rows.contains(Seq("x2", 1L, 100L)), rows.toString)
        assert(rows.contains(Seq("y", 2L, 207L)), rows.toString)
      } finally queries.foreach(_.stop())
    } }
  }

  test("refresh races a continuous base writer: every refresh commits an " +
      "exact image of its PINNED base version (fold or full recompute)") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      (1L to 120L).map(i => (i, (i % 6).toString, i))
        .toDF("id", "g", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      spark.read.format("graft").load(dir)
        .createOrReplaceTempView("mvi_race")
      // distinct + min force both the changed-group recompute and the
      // retraction overlay through the race
      val agg = "count(*) AS cnt, sum(v) AS sv, count(v) AS cv, " +
        "min(v) AS mn, count(DISTINCT v) AS dv"
      val sql = s"SELECT g, $agg FROM mvi_race GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)

      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val writer = new Thread(() => {
        val rnd = new scala.util.Random(17)
        val t = GraftTable.forPath(spark, dir)
        var commits = 0
        // throttled + bounded: each commit costs the fold a per-version
        // bucket diff, so an unthrottled writer makes windows quadratic
        while (!stop.get() && commits < 60) {
          try {
            if (rnd.nextInt(5) == 0)
              t.delete(col("id") === (1L + rnd.nextInt(200)))
            else {
              val rows = (0 until 1 + rnd.nextInt(4)).map(_ =>
                ((1L + rnd.nextInt(200)), (rnd.nextInt(6)).toString,
                  rnd.nextInt(500).toLong)).distinctBy(_._1)
              t.upsert(rows.toDF("id", "g", "v"))
            }
            commits += 1
            Thread.sleep(30)
          } catch { case e: Throwable => errs.add(e); stop.set(true) }
        }
      })
      writer.setDaemon(true)
      writer.start()
      try {
        (1 to 4).foreach { round =>
          MaterializedViews.refresh(spark, viewDir)
          // the stored view must equal the view SQL evaluated at EXACTLY
          // the base version the meta pinned — whichever path refresh took
          val info = MaterializedViews.readInfo(viewDir).get
          val (p, pv) = info.relationVersions.head
          spark.read.format("graft").option("versionAsOf", pv).load(p)
            .createOrReplaceTempView("mvi_race_pin")
          val want = graft.mv.RewriteQueryByMaterialView.withoutRewrite {
            rowsOf(spark.sql(
              s"SELECT g, $agg FROM mvi_race_pin GROUP BY g"))
          }
          val got = rowsOf(spark.read.format("graft").load(viewDir))
          assert(got == want,
            s"round $round: view diverged from its pinned base v$pv\n" +
              s" view: $got\n base: $want")
          Thread.sleep(40)
        }
      } finally { stop.set(true); writer.join(30000) }
      assert(errs.isEmpty, s"writer errors: ${errs.peek()}")
    }
  }

  test("conf gate disables the incremental path") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10L)).toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvi_g")
      val sql = "SELECT g, count(*) AS cnt FROM mvi_g GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      Seq((2L, "b", 20L)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      withSQLConf(MaterializedViews.INCREMENTAL_KEY -> "false") {
        val before = incCount
        assert(MaterializedViews.refresh(spark, viewDir))
        assert(incCount == before)
        assertMatchesRecompute(viewDir, sql)
      }
    }
  }
}
