package graft

import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Edge cases ported from the reference's schema/upsert suites:
  * case-insensitive column resolution, subset-column appends, null range
  * partition values, and a randomized upsert chain checked against an
  * in-memory model (`UpsertWithDuplicateDataAndFields`-style).
  */
class EdgeCaseSuite extends GraftFunSuite {
  import spark.implicits._

  test("append resolves columns case-insensitively") {
    withTempTable { dir =>
      Seq((1L, 10)).toDF("id", "value").write.format("graft").save(dir)
      Seq((2L, 20)).toDF("ID", "VALUE").write.format("graft")
        .mode("append").save(dir)
      assert(spark.read.format("graft").load(dir).count() == 2)
    }
  }

  test("append with a column subset null-fills nullable, rejects NOT NULL") {
    withTempTable { dir =>
      // nullable v: subset append null-fills
      Seq((1L, "a", Some(10))).toDF("id", "s", "v")
        .write.format("graft").save(dir)
      Seq((2L, "b")).toDF("id", "s").write.format("graft")
        .mode("append").save(dir)
      val rows = rowsOf(spark.read.format("graft").load(dir).select("id", "s", "v"))
      assert(rows == Seq(Seq(1L, "a", 10), Seq(2L, "b", null)))
    }
    withTempTable { dir =>
      // non-nullable v (primitive encoder): subset append is rejected
      Seq((1L, "a", 10)).toDF("id", "s", "v").write.format("graft").save(dir)
      intercept[Exception] {
        Seq((2L, "b")).toDF("id", "s").write.format("graft")
          .mode("append").save(dir)
      }
    }
  }

  test("append with an incompatible column type is rejected; up-casts pass") {
    withTempTable { dir =>
      Seq((1L, 10L)).toDF("id", "v").write.format("graft").save(dir)
      // int source into bigint column: safe up-cast, accepted
      Seq((2, 20)).toDF("id", "v").write.format("graft").mode("append").save(dir)
      assert(rowsOf(spark.read.format("graft").load(dir)) ==
        Seq(Seq(1L, 10L), Seq(2L, 20L)))
      // string into bigint: rejected with the column named
      val e = intercept[Exception] {
        Seq((3L, "x")).toDF("id", "v").write.format("graft")
          .mode("append").save(dir)
      }
      assert(e.getMessage.contains("v"), e.getMessage)
    }
  }

  test("case-insensitive duplicate source columns are rejected") {
    withTempTable { dir =>
      val dup = Seq((1L, 1, 2)).toDF("id", "v", "V")
      val e = intercept[Exception] { dup.write.format("graft").save(dir) }
      assert(e.getMessage.toLowerCase.contains("duplicate"), e.getMessage)
    }
  }

  test("column names parquet cannot store are rejected") {
    withTempTable { dir =>
      val bad = Seq((1L, 1)).toDF("id", "a b")
      val e = intercept[Exception] { bad.write.format("graft").save(dir) }
      assert(e.getMessage.contains("invalid character"), e.getMessage)
    }
  }

  test("upsert with a new column needs schema auto-merge enabled") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val withNew = Seq((1L, 11, "n")).toDF("id", "v", "note")
      intercept[Exception] { t.upsert(withNew) }
      spark.conf.set("spark.graft.schema.autoMerge.enabled", "true")
      try {
        t.upsert(withNew)
        assert(rowsOf(t.toDF.select("id", "v", "note")) ==
          Seq(Seq(1L, 11, "n")))
      } finally spark.conf.unset("spark.graft.schema.autoMerge.enabled")
    }
  }

  test("null range partition values round-trip and prune") {
    withTempTable { dir =>
      Seq((1L, "us"), (2L, null.asInstanceOf[String]), (3L, "de"))
        .toDF("id", "country")
        .write.format("graft").partitionBy("country").save(dir)
      val df = spark.read.format("graft").load(dir)
      assert(rowsOf(df.select("id", "country")) ==
        rowsOf(Seq((1L, "us"), (2L, null.asInstanceOf[String]), (3L, "de"))
          .toDF("id", "country")))
      assert(df.filter(col("country").isNull).count() == 1)
      assert(df.filter(col("country") === "us").count() == 1)
    }
  }

  test("randomized upsert chain matches an in-memory model") {
    withTempTable { dir =>
      val rnd = new scala.util.Random(11)
      val model = scala.collection.mutable.Map.empty[Long, (String, Int)]
      val init = (1 to 40).map(i => (i.toLong, s"s$i", i))
      init.foreach { case (k, s, v) => model(k) = (s, v) }
      init.toDF("id", "s", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(dir)
      val t = GraftTable.forPath(spark, dir)
      (1 to 6).foreach { round =>
        val batch = (1 to 15).map { _ =>
          val k = rnd.nextInt(60).toLong + 1
          val s = s"r$round-$k"
          val v = rnd.nextInt(1000)
          (k, s, v)
        }
        // in-model: later entries within a batch win, matching coalesce(1)
        // single-partition file order
        batch.foreach { case (k, s, v) =>
          model(k) = (s, v)
        }
        t.upsert(batch.toDF("id", "s", "v").coalesce(1))
        if (round == 3) t.compaction()
      }
      val got = t.toDF.select("id", "s", "v").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
      assert(got == model.toMap)
    }
  }

  test("upsert after compaction keeps merge semantics") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 2), (2L, 2)).toDF("id", "v"))
      t.compaction()
      t.upsert(Seq((1L, 3), (3L, 3)).toDF("id", "v"))
      assert(rowsOf(t.toDF.select("id", "v")) ==
        Seq(Seq(1L, 3), Seq(2L, 2), Seq(3L, 3)))
    }
  }
}
