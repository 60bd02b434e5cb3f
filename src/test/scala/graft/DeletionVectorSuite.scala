package graft

import org.apache.spark.sql.functions._

import graft.meta.SnapshotManagement
import graft.tables.GraftTable

class DeletionVectorSuite extends GraftFunSuite {
  import spark.implicits._

  private def files(dir: String) =
    SnapshotManagement.snapshot(SnapshotManagement.normalize(dir)).files

  test("sparse delete writes a deletion vector, not new data files") {
    withTempTable { dir =>
      (0 until 1000).map(i => (i, s"s$i", i % 2)).toDF("id", "s", "g")
        .write.format("graft").partitionBy("g").save(dir)
      val before = files(dir).map(_.path).toSet
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") % 100 === 7) // 10 rows of 1000

      val after = files(dir)
      assert(after.map(_.path).toSet == before, "data files must be unchanged")
      // all matched ids are odd -> only g=1 files hold deleted rows
      val (touched, untouched) = after.partition(_.partitionValues("g") == "1")
      assert(touched.forall(_.hasDv), s"every touched file gets a DV: $after")
      assert(untouched.forall(!_.hasDv))
      assert(after.map(_.dvCardinality).sum == 10)
      assert(touched.forall(f => new java.io.File(s"$dir/${f.dvPath}").isFile))

      val df = t.toDF
      assert(df.count() == 990)
      assert(df.filter(col("id") % 100 === 7).count() == 0)
      assert(df.filter(col("id") === 8).count() == 1)
      // whole-row content survives masking intact
      assertSameRows(
        df.filter(col("id") < 10).select("id", "s", "g"),
        (0 until 10).filter(_ != 7).map(i => (i, s"s$i", i % 2))
          .toDF("id", "s", "g"))
    }
  }

  test("partition-only delete is metadata-only (no new files, no DV)") {
    withTempTable { dir =>
      (0 until 100).map(i => (i, i % 4)).toDF("id", "g")
        .write.format("graft").partitionBy("g").save(dir)
      val before = files(dir)
      val t = GraftTable.forPath(spark, dir)
      t.deleteExpr("g = 1")
      val after = files(dir)
      assert(after.map(_.path).toSet ==
        before.filter(_.partitionValues("g") != "1").map(_.path).toSet)
      assert(after.forall(!_.hasDv))
      assert(t.toDF.count() == 75)
      assert(t.toDF.filter(col("g") === 1).count() == 0)
    }
  }

  test("repeated deletes union vectors; reads stay correct") {
    withTempTable { dir =>
      (0 until 1000).map(i => (i, i % 2)).toDF("id", "g")
        .write.format("graft").partitionBy("g").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") < 10)
      val dv1 = files(dir).filter(_.hasDv)
      t.delete(col("id") >= 10 && col("id") < 20)
      val dv2 = files(dir).filter(_.hasDv)
      assert(dv2.map(_.dvCardinality).sum == 20)
      // vectors are immutable: the second delete wrote NEW dv files
      assert(dv1.map(_.dvPath).toSet.intersect(dv2.map(_.dvPath).toSet).isEmpty)
      assert(t.toDF.count() == 980)
      assert(t.toDF.filter(col("id") < 20).count() == 0)
      assert(t.toDF.filter(col("id") === 20).count() == 1)
    }
  }

  test("high deleted fraction rewrites the file instead") {
    withTempTable { dir =>
      (0 until 1000).map(i => (i, 0)).toDF("id", "g")
        .coalesce(1).write.format("graft").save(dir)
      val before = files(dir).map(_.path).toSet
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") < 900) // 90% > default 0.8 threshold
      val after = files(dir)
      assert(after.map(_.path).toSet.intersect(before).isEmpty,
        "file should be rewritten, not DV'd")
      assert(after.forall(!_.hasDv))
      assert(t.toDF.count() == 100)
    }
  }

  test("fully-deleted file is dropped from the manifest") {
    withTempTable { dir =>
      (0 until 100).map(i => (i, i % 2)).toDF("id", "g")
        .write.format("graft").partitionBy("g").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // g is a partition col but mix with a data predicate so the DV path
      // (not the metadata-only path) handles it
      t.delete(col("g") === 0 && col("id") >= 0)
      val after = files(dir)
      assert(after.forall(_.partitionValues("g") == "1"))
      assert(t.toDF.count() == 50)
    }
  }

  test("compaction purges deletion vectors and keeps results") {
    withTempTable { dir =>
      (0 until 1000).map(i => (i, i % 2)).toDF("id", "g")
        .write.format("graft").partitionBy("g").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") % 10 === 3)
      assert(files(dir).exists(_.hasDv))
      t.compaction()
      val after = files(dir)
      assert(after.forall(!_.hasDv), s"compaction must purge DVs: $after")
      assert(t.toDF.count() == 900)
      assert(t.toDF.filter(col("id") % 10 === 3).count() == 0)
    }
  }

  test("aggregate pushdown is refused while DVs exist (counts stay correct)") {
    withTempTable { dir =>
      (0 until 500).map(i => (i, i % 2)).toDF("id", "g")
        .write.format("graft").partitionBy("g").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") < 50)
      withSQLConf("spark.sql.parquet.aggregatePushdown" -> "true",
          "spark.graft.stats.metadataOnlyCount.enabled" -> "false") {
        val df = t.toDF.agg(count(col("id")))
        assert(df.collect().head.getLong(0) == 450)
      }
    }
  }

  test("disabled DVs fall back to rewrite") {
    withTempTable { dir =>
      (0 until 100).map(i => (i, 0)).toDF("id", "g")
        .write.format("graft").save(dir)
      withSQLConf(graft.commands.DvSupport.ENABLED_CONF -> "false") {
        val before = files(dir).map(_.path).toSet
        val t = GraftTable.forPath(spark, dir)
        t.delete(col("id") < 10)
        val after = files(dir)
        assert(after.forall(!_.hasDv))
        // the touched file was rewritten (untouched files keep their paths)
        assert(after.map(_.path).toSet != before)
        assert(t.toDF.count() == 90)
      }
    }
  }

  test("table property overrides the session conf") {
    withTempTable { dir =>
      (0 until 100).map(i => (i, 0)).toDF("id", "g")
        .write.format("graft")
        .option("graft.deletionVectors", "true").save(dir)
      withSQLConf(graft.commands.DvSupport.ENABLED_CONF -> "false") {
        val t = GraftTable.forPath(spark, dir)
        t.delete(col("id") < 10)
        assert(files(dir).exists(_.hasDv))
        assert(t.toDF.count() == 90)
      }
    }
  }

  test("change feed emits exactly the DV-deleted rows as deletes") {
    withTempTable { dir =>
      (0 until 400).map(i => (i, i % 2)).toDF("id", "g")
        .write.format("graft").partitionBy("g").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") % 50 === 7) // ids 7,57,...,357 — 8 rows
      val v = graft.meta.SnapshotManagement
        .snapshot(graft.meta.SnapshotManagement.normalize(dir)).version
      val feed = graft.tables.ChangeFeed.changes(spark, dir, v, v)
      val rows = feed.select("id", "g", "_change_type")
        .as[(Int, Int, String)].collect().sortBy(_._1)
      assert(rows.forall(_._3 == "delete"), s"all deletes: ${rows.toSeq}")
      assert(rows.map(_._1).toSeq == (0 until 400).filter(_ % 50 == 7),
        s"exact deleted ids: ${rows.map(_._1).toSeq}")
      assert(rows.forall(r => r._2 == r._1 % 2), "range values attached")
    }
  }

  test("change feed: repeated DV deletes only emit the new rows") {
    withTempTable { dir =>
      (0 until 100).map(i => (i, 0)).toDF("id", "g")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") < 5)
      t.delete(col("id") < 10) // 5 NEW deletions (0-4 already gone)
      val v = graft.meta.SnapshotManagement
        .snapshot(graft.meta.SnapshotManagement.normalize(dir)).version
      val feed = graft.tables.ChangeFeed.changes(spark, dir, v, v)
      assert(feed.select("id").as[Int].collect().sorted.toSeq == (5 until 10))
    }
  }

  test("change feed: mixed commit (DV + threshold rewrite) stays exact") {
    withTempTable { dir =>
      // two partitions: g=0 loses 90% (rewrite), g=1 loses 2% (DV)
      val rows = (0 until 1000).map(i => (i, if (i < 500) 0 else 1))
      rows.toDF("id", "g").repartition(1)
        .write.format("graft").partitionBy("g").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete((col("g") === 0 && col("id") < 450) ||
        (col("g") === 1 && col("id") >= 990))
      assert(t.toDF.count() == 1000 - 450 - 10)
      val v = graft.meta.SnapshotManagement
        .snapshot(graft.meta.SnapshotManagement.normalize(dir)).version
      val feed = graft.tables.ChangeFeed.changes(spark, dir, v, v)
        .filter(col("_change_type") === "delete")
      assert(feed.select("id").as[Int].collect().sorted.toSeq ==
        ((0 until 450) ++ (990 until 1000)))
    }
  }

  test("streaming initial snapshot masks deletion vectors") {
    withTempTable { dir =>
      (0 until 300).map(i => (i, i % 3)).toDF("id", "g")
        .write.format("graft").partitionBy("g").save(dir)
      GraftTable.forPath(spark, dir).delete(col("id") % 10 === 0)
      val q = spark.readStream.format("graft").load(dir)
        .writeStream.format("memory").queryName("dv_snap").start()
      try {
        q.processAllAvailable()
        val got = spark.table("dv_snap").select("id").as[Int].collect()
        assert(got.length == 270, s"got ${got.length}")
        assert(got.forall(_ % 10 != 0))
      } finally q.stop()
    }
  }

  test("sparse update masks old rows and appends updated images") {
    withTempTable { dir =>
      (0 until 1000).map(i => (i, i * 10, i % 2)).toDF("id", "v", "g")
        .write.format("graft").partitionBy("g").save(dir)
      val before = files(dir).map(_.path).toSet
      val t = GraftTable.forPath(spark, dir)
      t.update(col("id") % 100 === 7, Map("v" -> (col("v") + 1)))
      val after = files(dir)
      // old files all kept (now DV'd where touched) + appended image files
      assert(before.subsetOf(after.map(_.path).toSet))
      assert(after.exists(_.hasDv))
      assert(t.toDF.count() == 1000)
      val touched = t.toDF.filter(col("id") % 100 === 7)
        .select("id", "v").as[(Int, Int)].collect().toMap
      assert(touched == (0 until 1000).filter(_ % 100 == 7)
        .map(i => i -> (i * 10 + 1)).toMap)
      // untouched rows unchanged
      assert(t.toDF.filter(col("id") === 8).select("v").as[Int].head() == 80)
    }
  }

  test("update after delete cannot resurrect deleted rows") {
    withTempTable { dir =>
      (0 until 100).map(i => (i, i)).toDF("id", "v")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") < 10)
      // condition matches BOTH deleted (0-9) and live (10-19) rows
      t.update(col("id") < 20, Map("v" -> lit(-1)))
      assert(t.toDF.count() == 90, "deleted rows must stay deleted")
      assert(t.toDF.filter(col("v") === -1).count() == 10)
      assert(t.toDF.filter(col("id") < 10).count() == 0)
    }
  }

  test("change feed for a DV update pairs pre and post images") {
    withTempTable { dir =>
      (0 until 200).map(i => (i, i)).toDF("id", "v")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.update(col("id") % 40 === 3, Map("v" -> (col("v") * 2)))
      val ver = graft.meta.SnapshotManagement
        .snapshot(graft.meta.SnapshotManagement.normalize(dir)).version
      val feed = graft.tables.ChangeFeed.changes(spark, dir, ver, ver)
      val byType = feed.select("id", "v", "_change_type")
        .as[(Int, Int, String)].collect().groupBy(_._3)
      val expectIds = (0 until 200).filter(_ % 40 == 3)
      assert(byType("update_preimage").map(_._1).sorted.toSeq == expectIds)
      assert(byType("update_preimage").forall(r => r._2 == r._1))
      assert(byType("update_postimage").map(_._1).sorted.toSeq == expectIds)
      assert(byType("update_postimage").forall(r => r._2 == r._1 * 2))
      assert(byType.keySet == Set("update_preimage", "update_postimage"))
    }
  }

  test("SQL DELETE with a non-pushable predicate routes to the ladder") {
    withTempTable { dir =>
      (0 until 1000).map(i => (i.toLong, i % 2)).toDF("id", "g")
        .write.format("graft").save(dir)
      val before = files(dir).map(_.path).toSet
      // modulo is not expressible as a V1 source filter — previously an
      // AnalysisException via the SupportsDelete bridge
      spark.sql(s"DELETE FROM graft.`$dir` WHERE id % 250 = 3")
      assert(files(dir).map(_.path).toSet == before)
      assert(files(dir).exists(_.hasDv))
      assert(spark.read.format("graft").load(dir).count() == 996)
      // subqueries rejected with a clear message
      val e = intercept[UnsupportedOperationException] {
        spark.sql(s"DELETE FROM graft.`$dir` WHERE id IN " +
          s"(SELECT id FROM graft.`$dir` WHERE g = 1)")
      }
      assert(e.getMessage.contains("subqueries"))
    }
  }

  test("streaming CDF: pure-DV deletes and updates stream without keys") {
    withTempTable { dir =>
      (0 until 300).map(i => (i.toLong, i.toLong, i % 2)).toDF("id", "v", "g")
        .write.format("graft").partitionBy("g").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(dir)
        .writeStream.format("memory").queryName("dv_cdf").start()
      try {
        q.processAllAvailable()
        assert(spark.table("dv_cdf").count() == 300) // snapshot inserts

        t.delete(col("id") % 30 === 7) // v1: pure-DV delete, 10 rows
        q.processAllAvailable()
        val dels = spark.table("dv_cdf")
          .filter(col("_commit_version") === 1)
          .select("_change_type", "id").as[(String, Long)].collect().sorted
        assert(dels.forall(_._1 == "delete"))
        assert(dels.map(_._2).toSeq.sorted ==
          (0 until 300).filter(_ % 30 == 7).map(_.toLong))

        t.update(col("id") === 100, Map("v" -> lit(-1L))) // v2: pure-DV upd
        q.processAllAvailable()
        val upd = spark.table("dv_cdf")
          .filter(col("_commit_version") === 2)
          .select("_change_type", "id", "v").as[(String, Long, Long)]
          .collect().sortBy(_._1)
        assert(upd.toSeq == Seq(("update_postimage", 100L, -1L),
          ("update_preimage", 100L, 100L)))
      } finally q.stop()
    }
  }

  test("streaming CDF: DV commit with a threshold rewrite still refuses") {
    withTempTable { dir =>
      (0 until 100).map(i => (i, 0)).toDF("id", "g")
        .coalesce(1).write.format("graft").save(dir)
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(dir)
        .writeStream.format("memory").queryName("dv_cdf2").start()
      try {
        q.processAllAvailable()
        GraftTable.forPath(spark, dir).delete(col("id") < 90) // 90% → rewrite
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(e.getMessage.contains("delete") ||
          e.getCause.getMessage.contains("delete"))
      } finally q.stop()
    }
  }

  test("time travel reads the pre-delete snapshot unmasked") {
    withTempTable { dir =>
      (0 until 200).map(i => (i, 0)).toDF("id", "g")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") < 100)
      assert(t.toDF.count() == 100)
      val v0 = spark.read.format("graft").option("versionAsOf", "0").load(dir)
      assert(v0.count() == 200)
    }
  }
}
