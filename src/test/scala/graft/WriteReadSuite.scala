package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.tables.GraftTable

class WriteReadSuite extends GraftFunSuite {
  import spark.implicits._

  test("non-partitioned write + read back") {
    withTempTable { dir =>
      val df = Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)).toDF("id", "s", "v")
      df.write.format("graft").save(dir)
      val back = spark.read.format("graft").load(dir)
      assertSameRows(back, df)
    }
  }

  test("range-partitioned write + partition pruning + append") {
    withTempTable { dir =>
      val df = Seq((1, "us", 10), (2, "us", 20), (3, "de", 30), (4, "fr", 40))
        .toDF("id", "country", "v")
      df.write.format("graft").partitionBy("country").save(dir)
      val back = spark.read.format("graft").load(dir)
      assert(back.columns.toSeq == Seq("id", "v", "country"))
      assertSameRows(back.select("id", "country", "v"), df)

      // pruning: only the us partition's files should be scanned
      val pruned = back.filter(col("country") === "us")
      assert(pruned.count() == 2)
      val scanned = pruned.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      assert(!scanned.contains("country=de"), "pruned partition still scanned")

      // append a second batch
      Seq((5, "de", 50)).toDF("id", "country", "v")
        .write.format("graft").mode(SaveMode.Append).save(dir)
      assert(spark.read.format("graft").load(dir).count() == 5)
      assert(spark.read.format("graft").load(dir)
        .filter(col("country") === "de").count() == 2)
    }
  }

  test("overwrite and errorIfExists modes") {
    withTempTable { dir =>
      Seq((1, 1)).toDF("a", "b").write.format("graft").save(dir)
      intercept[Exception] {
        Seq((2, 2)).toDF("a", "b").write.format("graft")
          .mode(SaveMode.ErrorIfExists).save(dir)
      }
      Seq((2, 2)).toDF("a", "b").write.format("graft")
        .mode(SaveMode.Ignore).save(dir)
      assert(spark.read.format("graft").load(dir).collect().head.getInt(0) == 1)
      Seq((3, 3)).toDF("a", "b").write.format("graft")
        .mode(SaveMode.Overwrite).save(dir)
      val rows = spark.read.format("graft").load(dir).collect()
      assert(rows.length == 1 && rows.head.getInt(0) == 3)
    }
  }

  test("pk table: bucketed write, sorted files, bucket scan") {
    withTempTable { dir =>
      val df = (1 to 100).map(i => (i.toLong, s"n$i", i * 2.0)).toDF("id", "name", "v")
      df.write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      val snap = t.snapshot
      assert(snap.files.nonEmpty)
      assert(snap.files.forall(_.bucket >= 0))
      assert(snap.files.map(_.bucket).distinct.sorted ==
        snap.files.map(_.bucket).distinct.sorted.distinct)
      val back = t.toDF
      assertSameRows(back.select("id", "name", "v"), df)
      // one spark partition per bucket
      assert(back.rdd.getNumPartitions == 4)
    }
  }

  test("pk upsert: last-wins merge-on-read") {
    withTempTable { dir =>
      val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "s", "v")
      base.write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((2L, "B", 200), (4L, "d", 40)).toDF("id", "s", "v"))
      t.upsert(Seq((2L, "BB", 2000), (5L, "e", 50)).toDF("id", "s", "v"))
      val expected = Seq((1L, "a", 10), (2L, "BB", 2000), (3L, "c", 30),
        (4L, "d", 40), (5L, "e", 50)).toDF("id", "s", "v")
      assertSameRows(t.toDF.select("id", "s", "v"), expected)
    }
  }

  test("pk upsert: partial columns keep previous values") {
    withTempTable { dir =>
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "s", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 100), (3L, 300)).toDF("id", "v"))
      val expected = Seq((1L, "a", 100), (2L, "b", 20), (3L, null, 300))
        .toDF("id", "s", "v")
      assertSameRows(t.toDF.select("id", "s", "v"), expected)
    }
  }

  test("pk upsert: duplicate keys within one batch keep the last") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // single-partition source => deterministic in-file order
      t.upsert(Seq((2L, 1), (2L, 2), (2L, 3)).toDF("id", "v").coalesce(1))
      val rows = t.toDF.filter(col("id") === 2L).collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Int]("v") == 3)
    }
  }

  test("merge operators: sum and concat") {
    withTempTable { dir =>
      Seq((1L, 10, "x")).toDF("id", "cnt", "tags").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 5, "y"), (2L, 7, "z")).toDF("id", "cnt", "tags"))
      val merged = spark.read.format("graft")
        .option("mergeOperators", "cnt:sum,tags:concat").load(dir)
      val m = merged.collect().map(r =>
        (r.getAs[Long]("id"), r.getAs[Int]("cnt"), r.getAs[String]("tags"))).toSet
      assert(m == Set((1L, 15, "x,y"), (2L, 7, "z")))
    }
  }

  test("upsert with deranged column order resolves by name") {
    withTempTable { dir =>
      Seq((1L, "a", 10)).toDF("id", "s", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // source columns in a different order than the table schema
      t.upsert(Seq((20, "B", 2L), (30, "c", 3L)).toDF("v", "s", "id"))
      assertSameRows(t.toDF.select("id", "s", "v"),
        Seq((1L, "a", 10), (2L, "B", 20), (3L, "c", 30)).toDF("id", "s", "v"))
    }
  }

  test("append to pk table is rejected") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      intercept[Exception] {
        Seq((2L, 2)).toDF("id", "v").write.format("graft")
          .mode(SaveMode.Append).save(dir)
      }
    }
  }
}
