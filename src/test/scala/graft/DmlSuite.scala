package graft

import org.apache.spark.sql.functions._

import graft.tables.GraftTable

class DmlSuite extends GraftFunSuite {
  import spark.implicits._

  test("delete: partition-only predicate drops whole partitions") {
    withTempTable { dir =>
      Seq((1, "us", 1), (2, "us", 2), (3, "de", 3)).toDF("id", "country", "v")
        .write.format("graft").partitionBy("country").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.deleteExpr("country = 'us'")
      assertSameRows(t.toDF.select("id", "country", "v"),
        Seq((3, "de", 3)).toDF("id", "country", "v"))
    }
  }

  test("delete: data predicate rewrites only touched files") {
    withTempTable { dir =>
      Seq((1, "us", 1), (2, "us", 2), (3, "de", 3), (4, "de", 4))
        .toDF("id", "country", "v")
        .write.format("graft").partitionBy("country").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("v") % 2 === 0)
      assertSameRows(t.toDF.select("id", "country", "v"),
        Seq((1, "us", 1), (3, "de", 3)).toDF("id", "country", "v"))
    }
  }

  test("update: conditional column rewrite") {
    withTempTable { dir =>
      Seq((1, 10), (2, 20), (3, 30)).toDF("id", "v")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.updateExpr("id = 2", Map("v" -> "v * 100"))
      assertSameRows(t.toDF.select("id", "v"),
        Seq((1, 10), (2, 2000), (3, 30)).toDF("id", "v"))
    }
  }

  test("update on pk table preserves merge semantics") {
    withTempTable { dir =>
      Seq((1L, "a", 1), (2L, "b", 2)).toDF("id", "s", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((2L, "B", 20), (3L, "c", 3)).toDF("id", "s", "v"))
      t.updateExpr("v > 2", Map("v" -> "v + 1000"))
      assertSameRows(t.toDF.select("id", "s", "v"),
        Seq((1L, "a", 1), (2L, "B", 1020), (3L, "c", 1003)).toDF("id", "s", "v"))
    }
  }

  test("compaction does not change query results and removes deltas") {
    withTempTable { dir =>
      (1 to 50).map(i => (i.toLong, i)).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert((25 to 75).map(i => (i.toLong, i * 10)).toDF("id", "v"))
      t.upsert((60 to 80).map(i => (i.toLong, i * 100)).toDF("id", "v"))
      val before = rowsOf(t.toDF.select("id", "v"))
      assert(t.snapshot.hasDeltaFiles)
      t.compaction()
      assert(!t.snapshot.hasDeltaFiles)
      val after = rowsOf(t.toDF.select("id", "v"))
      assert(before == after)
      // compacted => one base file per non-empty bucket
      val perBucket = t.snapshot.files.groupBy(_.bucket).values.map(_.size)
      assert(perBucket.forall(_ == 1))
    }
  }

  test("bin-pack compaction merges small files of non-PK tables") {
    withTempTable { dir =>
      // 5 appends -> 5+ small files
      (1 to 5).foreach { i =>
        Seq((i, i * 10)).toDF("id", "v").write.format("graft")
          .mode("append").save(dir)
      }
      val t = GraftTable.forPath(spark, dir)
      val before = rowsOf(t.toDF.select("id", "v"))
      assert(t.snapshot.files.length >= 5)
      t.compaction()
      assert(t.snapshot.files.length == 1,
        s"expected one packed file, got ${t.snapshot.files.map(_.path)}")
      assert(rowsOf(t.toDF.select("id", "v")) == before)
      // history records the compaction
      val hist = t.history().collect()
      assert(hist.head.getAs[String]("commitType") == "compaction")
    }
  }

  test("cleanup removes orphans but keeps live files") {
    withTempTable { dir =>
      Seq((1, 1)).toDF("id", "v").write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      Seq((2, 2)).toDF("id", "v").write.format("graft")
        .mode("overwrite").save(dir)
      // the overwritten file is now unreferenced; sub-floor retention needs
      // an explicit override (in-flight-write safety)
      intercept[IllegalArgumentException] { t.cleanup(retainMillis = -1000) }
      spark.conf.set("spark.graft.cleanup.retentionCheck.enabled", "false")
      try {
        val removed = t.cleanup(retainMillis = -1000)
        assert(removed.nonEmpty)
      } finally spark.conf.unset("spark.graft.cleanup.retentionCheck.enabled")
      assertSameRows(t.toDF.select("id", "v"), Seq((2, 2)).toDF("id", "v"))
    }
  }

  test("cleanup reclaims staging dirs from crashed writes past retention") {
    withTempTable { dir =>
      import java.nio.file.{Files, Paths}
      Seq((1L, 1)).toDF("id", "v").write.format("graft").save(dir)
      // a write that died before moving files into the layout leaves its
      // parquet only under _graft_staging — unreferenced by any snapshot
      val dead = Paths.get(dir, "_graft_staging", "dead-txn")
      Files.createDirectories(dead)
      Files.write(dead.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
      val t = GraftTable.forPath(spark, dir)
      spark.conf.set("spark.graft.cleanup.retentionCheck.enabled", "false")
      try {
        // fresh staging (possible in-flight write) is protected
        assert(t.cleanup(retainMillis = 60000, dryRun = true).isEmpty)
        // past retention it can only be a dead writer's leftovers —
        // liveness is the NEWEST mtime under the dir, so age everything
        val past = java.nio.file.attribute.FileTime
          .fromMillis(System.currentTimeMillis() - 120000)
        Files.setLastModifiedTime(dead, past)
        Files.setLastModifiedTime(dead.resolve("part-0.parquet"), past)
        val removed = t.cleanup(retainMillis = 60000)
        assert(removed.exists(_.contains("dead-txn")), removed.toString)
        assert(!Files.exists(dead))
      } finally spark.conf.unset("spark.graft.cleanup.retentionCheck.enabled")
      assertSameRows(t.toDF.select("id", "v"), Seq((1L, 1)).toDF("id", "v"))
    }
  }

  test("cleanup distributes over partition directories") {
    withTempTable { dir =>
      Seq((1, "us", 1), (2, "de", 2)).toDF("id", "country", "v")
        .write.format("graft").partitionBy("country").save(dir)
      Seq((10, "us", 10)).toDF("id", "country", "v")
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "country = 'us'").save(dir)
      val t = GraftTable.forPath(spark, dir)
      spark.conf.set("spark.graft.cleanup.retentionCheck.enabled", "false")
      try {
        val removed = t.cleanup(retainMillis = -1000)
        assert(removed.nonEmpty && removed.forall(_.contains("country=")),
          s"expected partition-dir orphans, got $removed")
      } finally spark.conf.unset("spark.graft.cleanup.retentionCheck.enabled")
      assertSameRows(t.toDF.select("id", "country", "v"),
        Seq((10, "us", 10), (2, "de", 2)).toDF("id", "country", "v"))
    }
  }

  test("replaceWhere overwrites only matching partitions") {
    withTempTable { dir =>
      Seq((1, "us", 1), (2, "de", 2)).toDF("id", "country", "v")
        .write.format("graft").partitionBy("country").save(dir)
      Seq((10, "us", 10)).toDF("id", "country", "v")
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "country = 'us'").save(dir)
      val t = GraftTable.forPath(spark, dir)
      assertSameRows(t.toDF.select("id", "country", "v"),
        Seq((10, "us", 10), (2, "de", 2)).toDF("id", "country", "v"))
      // data outside the predicate is rejected
      intercept[Exception] {
        Seq((5, "fr", 5)).toDF("id", "country", "v")
          .write.format("graft").mode("overwrite")
          .option("replaceWhere", "country = 'us'").save(dir)
      }
    }
  }

  test("drop partition") {
    withTempTable { dir =>
      Seq((1, "us", 1), (2, "de", 2)).toDF("id", "country", "v")
        .write.format("graft").partitionBy("country").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.dropPartition("country = 'de'")
      assertSameRows(t.toDF.select("id", "country", "v"),
        Seq((1, "us", 1)).toDF("id", "country", "v"))
    }
  }

  test("SQL UPDATE routes through the transactional rewrite") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gupd")
      s2.sql(s"CREATE TABLE gupd (id BIGINT, g STRING, v INT) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gupd VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)")
      s2.sql("UPDATE gupd SET v = v + 100 WHERE g = 'a'")
      assert(rowsOf(s2.sql("SELECT * FROM gupd")) ==
        Seq(Seq(1L, "a", 110), Seq(2L, "b", 20), Seq(3L, "a", 130)).sortBy(_.mkString("|")))
      // unconditional UPDATE rewrites every row
      s2.sql("UPDATE gupd SET g = 'z'")
      assert(s2.sql("SELECT * FROM gupd WHERE g = 'z'").count() == 3)
      s2.sql("DROP TABLE gupd")
    }
  }

  test("SQL UPDATE rejects subqueries and nondeterministic expressions") {
    withTempTable { dir =>
      Seq((1L, 10), (2L, 20)).toDF("id", "v").write.format("graft").save(dir)
      def rejected(sql: String, needle: String): Unit = {
        val e = intercept[Exception](spark.sql(sql))
        assert(e.getMessage.contains(needle),
          s"expected clear '$needle' rejection, got: ${e.getMessage}")
      }
      rejected(
        s"UPDATE graft.`$dir` SET v = 0 WHERE id IN " +
          s"(SELECT id FROM graft.`$dir` WHERE v > 15)",
        "subqueries in the WHERE condition")
      rejected(
        s"UPDATE graft.`$dir` SET v = (SELECT max(v) FROM graft.`$dir`)",
        "subqueries in SET values")
      rejected(s"UPDATE graft.`$dir` SET v = 0 WHERE rand() > 0.5",
        "nondeterministic WHERE condition")
      rejected(s"UPDATE graft.`$dir` SET v = CAST(rand()*10 AS INT)",
        "nondeterministic SET values")
      // table untouched by the rejected statements
      assert(rowsOf(spark.read.format("graft").load(dir)) ==
        Seq(Seq(1L, 10), Seq(2L, 20)))
    }
  }

  test("SQL UPDATE on path table") {
    withTempTable { dir =>
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "g", "v")
        .write.format("graft").save(dir)
      spark.sql(s"UPDATE graft.`$dir` SET v = 99 WHERE id = 2")
      assert(rowsOf(spark.read.format("graft").load(dir).select("id", "v")) ==
        Seq(Seq(1L, 10), Seq(2L, 99)))
    }
  }

  test("concurrent-style conflict: double compaction fails cleanly") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 2)).toDF("id", "v"))
      t.compaction()
      // second compaction with nothing to do is a no-op, not an error
      t.compaction()
      assert(rowsOf(t.toDF.select("id", "v")) == Seq(Seq(1L, 2)))
    }
  }
}
