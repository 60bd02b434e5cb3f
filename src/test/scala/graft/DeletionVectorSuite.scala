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
      withSQLConf(graft.commands.DvDelete.ENABLED_CONF -> "false") {
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
      withSQLConf(graft.commands.DvDelete.ENABLED_CONF -> "false") {
        val t = GraftTable.forPath(spark, dir)
        t.delete(col("id") < 10)
        assert(files(dir).exists(_.hasDv))
        assert(t.toDF.count() == 90)
      }
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
