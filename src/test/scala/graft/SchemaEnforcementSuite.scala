package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.meta.SnapshotManagement

/** Schema-enforcement edge cases ported (behavior, not code) from the
  * reference `star/schema/SchemaEnforcementSuite.scala:76-865`: implicit
  * merge gating (conf vs option), NullType pruning in JSON ETL workflows,
  * overwriteSchema semantics, replaceWhere × schema evolution, and the
  * streaming-sink equivalents for Append/Complete output modes.
  */
class SchemaEnforcementSuite extends GraftFunSuite {
  import spark.implicits._

  private val AUTO_MERGE = "spark.graft.schema.autoMerge.enabled"

  private def enableAutoMerge[T](f: => T): T = withSQLConf(AUTO_MERGE -> "true")(f)
  private def disableAutoMerge[T](f: => T): T = withSQLConf(AUTO_MERGE -> "false")(f)

  private def graftDf(dir: String) = spark.read.format("graft").load(dir)

  private def messagesOf(e: Throwable): String = {
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
  }

  // ---------------------------------------------------------------- append

  test("append: reject schema changes by default") {
    disableAutoMerge {
      withTempTable { dir =>
        spark.range(10).write.format("graft").mode("append").save(dir)
        val e = intercept[Exception] {
          spark.range(10).withColumn("part", $"id" + 1)
            .write.format("graft").mode("append").save(dir)
        }
        assert(e.getMessage.contains("mergeSchema"), e.getMessage)
        assert(e.getMessage.contains("schema mismatch detected"), e.getMessage)
        // append-mode mismatch must NOT suggest overwriteSchema (that path
        // is overwrite-only)
        assert(!e.getMessage.contains("overwriteSchema"), e.getMessage)
      }
    }
  }

  test("append: allow schema changes when autoMerge conf is enabled") {
    enableAutoMerge {
      withTempTable { dir =>
        spark.range(10).write.format("graft").mode("append").save(dir)
        spark.range(10).withColumn("part", $"id" + 1)
          .write.format("graft").mode("append").save(dir)
        assert(graftDf(dir).schema.length == 2)
        // old rows null-fill the merged-in column
        assert(graftDf(dir).where($"part".isNull).count() == 10)
      }
    }
  }

  test("append: disallow schema changes when conf enabled but option disabled") {
    enableAutoMerge {
      withTempTable { dir =>
        spark.range(10).write.format("graft").mode("append").save(dir)
        val e = intercept[Exception] {
          spark.range(10).withColumn("part", $"id" + 1)
            .write.option("mergeSchema", "false")
            .format("graft").mode("append").save(dir)
        }
        assert(e.getMessage.contains("mergeSchema"), e.getMessage)
      }
    }
  }

  test("append: allow schema change with writer option") {
    disableAutoMerge {
      withTempTable { dir =>
        spark.range(10).write.format("graft").mode("append").save(dir)
        spark.range(10).withColumn("part", $"id" + 1)
          .write.option("mergeSchema", "true")
          .format("graft").mode("append").save(dir)
        assert(graftDf(dir).schema.length == 2)
      }
    }
  }

  test("JSON ETL workflow: NullType columns are pruned and merge back") {
    enableAutoMerge {
      withTempTable { dir =>
        val schema1 = new StructType()
          .add("key", StringType).add("id", NullType).add("extra", IntegerType)
        val schema2 = new StructType()
          .add("key", StringType).add("id", IntegerType).add("extra", NullType)
        def write(schema: StructType, row: String): Unit =
          spark.read.schema(schema).json(Seq(row).toDS())
            .write.format("graft").mode("append").save(dir)
        write(schema1, """{"key":"abc","id":null,"extra":1}""")
        write(schema2, """{"key":"def","id":2,"extra":null}""")
        write(schema1, """{"key":"ghi","id":null,"extra":3}""")
        val df = graftDf(dir).select("key", "id", "extra")
        assert(df.schema.fieldNames.sorted.toSeq == Seq("extra", "id", "key"))
        assert(rowsOf(df) == Seq(
          Seq("abc", null, 1), Seq("def", 2, null), Seq("ghi", null, 3)))
      }
    }
  }

  test("JSON ETL workflow: nested NullType fields are pruned and merge back") {
    enableAutoMerge {
      withTempTable { dir =>
        val schema1 = new StructType().add("key", StringType)
          .add("top", new StructType().add("id", NullType).add("extra", IntegerType))
        val schema2 = new StructType().add("key", StringType)
          .add("top", new StructType().add("id", IntegerType).add("extra", NullType))
        def write(schema: StructType, row: String): Unit =
          spark.read.schema(schema).json(Seq(row).toDS())
            .write.format("graft").mode("append").save(dir)
        write(schema1, """{"key":"abc","top":{"id":null,"extra":1}}""")
        write(schema2, """{"key":"def","top":{"id":2,"extra":null}}""")
        val mergedTop = graftDf(dir).schema("top").dataType.asInstanceOf[StructType]
        assert(mergedTop.fieldNames.sorted.toSeq == Seq("extra", "id"))
        // a third write with the original shape does not change the schema
        write(schema1, """{"key":"ghi","top":{"id":null,"extra":3}}""")
        assert(graftDf(dir).schema("top").dataType == mergedTop)
        val df = graftDf(dir)
          .select($"key", $"top.id".as("id"), $"top.extra".as("extra"))
        assert(rowsOf(df) == Seq(
          Seq("abc", null, 1), Seq("def", 2, null), Seq("ghi", null, 3)))
      }
    }
  }

  test("JSON ETL workflow: NullType inside array/map types is an error") {
    enableAutoMerge {
      withTempTable { dir =>
        val schema1 = new StructType()
          .add("key", StringType).add("top", ArrayType(NullType))
        val schema2 = new StructType().add("key", StringType)
          .add("top", ArrayType(new StructType().add("id", NullType)))
        val e1 = intercept[Exception] {
          spark.read.schema(schema1).json(Seq("""{"key":"abc","top":[]}""").toDS())
            .write.format("graft").mode("append").save(dir)
        }
        assert(e1.getMessage.contains("NullType"), e1.getMessage)
        val e2 = intercept[Exception] {
          spark.read.schema(schema2)
            .json(Seq("""{"key":"abc","top":[{"id":null}]}""").toDS())
            .write.format("graft").mode("append").save(dir)
        }
        assert(e2.getMessage.contains("NullType"), e2.getMessage)
      }
    }
  }

  test("JSON ETL workflow: NullType being the only data column is an error") {
    enableAutoMerge {
      val schema1 = new StructType().add("key", StringType).add("id", NullType)
      val row1 = """{"key":"abc","id":null}"""
      withTempTable { dir =>
        val e1 = intercept[Exception] {
          spark.read.schema(schema1).json(Seq(row1).toDS())
            .write.option("rangePartitions", "key")
            .format("graft").mode("append").save(dir)
        }
        assert(e1.getMessage.contains("NullType have been dropped"), e1.getMessage)
        val e2 = intercept[Exception] {
          spark.read.schema(schema1).json(Seq(row1).toDS())
            .write.option("hashPartitions", "key").option("hashBucketNum", "2")
            .format("graft").mode("append").save(dir)
        }
        assert(e2.getMessage.contains("NullType have been dropped"), e2.getMessage)
      }
    }
  }

  test("JSON ETL workflow: NullType partition column is an error (any case)") {
    enableAutoMerge {
      val schema1 = new StructType().add("key", StringType).add("id", NullType)
      val row1 = """{"key":"abc","id":null}"""
      withTempTable { dir =>
        for (decl <- Seq("id", "iD")) {
          val e1 = intercept[Exception] {
            spark.read.schema(schema1).json(Seq(row1).toDS())
              .write.option("rangePartitions", decl)
              .format("graft").mode("append").save(dir)
          }
          assert(e1.getMessage.contains("partition"), e1.getMessage)
          val e2 = intercept[Exception] {
            spark.read.schema(schema1).json(Seq(row1).toDS())
              .write.option("hashPartitions", decl).option("hashBucketNum", "2")
              .format("graft").mode("append").save(dir)
          }
          assert(e2.getMessage.contains("partition"), e2.getMessage)
        }
      }
    }
  }

  test("append: columns differing only by case are rejected even when merging") {
    withSQLConf("spark.sql.caseSensitive" -> "true") {
      withTempTable { dir =>
        intercept[Exception] {
          spark.range(10).withColumn("ID", $"id" + 1)
            .write.format("graft").mode("append").save(dir)
        }
        intercept[Exception] {
          spark.range(10).withColumn("ID", $"id" + 1)
            .write.option("mergeSchema", "true")
            .format("graft").mode("append").save(dir)
        }
      }
    }
  }

  // ------------------------------------------------------------- overwrite

  test("overwrite: reject schema replacement by default, suggest both options") {
    disableAutoMerge {
      withTempTable { dir =>
        spark.range(10).write.format("graft").mode("overwrite").save(dir)
        val e = intercept[Exception] {
          spark.range(10).withColumn("part", $"id" + 1)
            .write.format("graft").mode("overwrite").save(dir)
        }
        assert(e.getMessage.contains("overwriteSchema"), e.getMessage)
        assert(e.getMessage.contains("mergeSchema"), e.getMessage)
      }
    }
  }

  test("overwrite: overwriteSchema=true replaces the schema (drops columns)") {
    disableAutoMerge {
      withTempTable { dir =>
        spark.range(5).toDF("id").withColumn("part", $"id" % 2)
          .write.format("graft").mode("overwrite").save(dir)
        spark.range(5).toDF("id").write
          .option("overwriteSchema", "true")
          .format("graft").mode("overwrite").save(dir)
        val info = SnapshotManagement.snapshot(dir).tableInfo
        assert(info.rangeColumns.isEmpty)
        assert(info.schema.fieldNames.toSeq == Seq("id"))
        assert(graftDf(dir).count() == 5)
      }
    }
  }

  test("overwrite: overwriteSchema=true can change a column's data type") {
    disableAutoMerge {
      withTempTable { dir =>
        spark.range(5).toDF("id").write.format("graft").mode("overwrite").save(dir)
        assert(SnapshotManagement.snapshot(dir).tableInfo.schema.head.dataType ==
          LongType)
        spark.range(5).selectExpr("cast(id as string) as id").write
          .option("overwriteSchema", "true")
          .format("graft").mode("overwrite").save(dir)
        assert(SnapshotManagement.snapshot(dir).tableInfo.schema.head.dataType ==
          StringType)
        assert(rowsOf(graftDf(dir).select("id")).map(_.head.toString).sorted ==
          Seq("0", "1", "2", "3", "4"))
      }
    }
  }

  test("overwrite: autoMerge conf merges schemas instead of rejecting") {
    enableAutoMerge {
      withTempTable { dir =>
        // nullable id: a column-subset write must null-fill it, which a
        // NOT NULL column rejects (see the dedicated test below)
        spark.range(5).selectExpr("nullif(id, -1) as id")
          .write.format("graft").mode("overwrite").save(dir)
        spark.range(5).toDF("value").write.format("graft").mode("overwrite").save(dir)
        val df = graftDf(dir)
        assert(df.schema.fieldNames.toSeq == Seq("id", "value"))
        // overwrite replaced the DATA: only the second write's rows remain
        assert(df.count() == 5)
        assert(df.where($"id".isNull).count() == 5)
      }
    }
  }

  test("overwrite: reject merge when conf enabled but option disabled") {
    enableAutoMerge {
      withTempTable { dir =>
        spark.range(5).toDF("id").write.format("graft").mode("overwrite").save(dir)
        intercept[Exception] {
          spark.range(5).toDF("value").write
            .option("mergeSchema", "false")
            .format("graft").mode("overwrite").save(dir)
        }
        assert(graftDf(dir).schema.fieldNames.toSeq == Seq("id"))
      }
    }
  }

  test("overwrite: changing partition columns is rejected even with overwriteSchema") {
    enableAutoMerge {
      withTempTable { dir =>
        spark.range(5).toDF("id").write.format("graft").mode("overwrite").save(dir)
        val e1 = intercept[Exception] {
          spark.range(5).toDF("id").withColumn("part", $"id" % 2)
            .write.option("overwriteSchema", "true")
            .option("rangePartitions", "part")
            .format("graft").mode("overwrite").save(dir)
        }
        assert(e1.getMessage.contains("partition"), e1.getMessage)
        val e2 = intercept[Exception] {
          spark.range(5).toDF("id").withColumn("part", $"id" % 2)
            .write.option("overwriteSchema", "true")
            .option("hashPartitions", "part").option("hashBucketNum", "2")
            .format("graft").mode("overwrite").save(dir)
        }
        assert(e2.getMessage.contains("partition"), e2.getMessage)
        // the rejected writes left the table untouched
        val info = SnapshotManagement.snapshot(dir).tableInfo
        assert(info.rangeColumns.isEmpty && info.hashColumns.isEmpty)
        assert(info.schema.fieldNames.toSeq == Seq("id"))
      }
    }
  }

  test("overwrite: hash partitioning without a bucket num is rejected") {
    disableAutoMerge {
      withTempTable { dir =>
        val e = intercept[Exception] {
          spark.range(5).toDF("id").withColumn("hash", $"id" % 3)
            .write.option("hashPartitions", "hash")
            .format("graft").mode("overwrite").save(dir)
        }
        assert(e.getMessage.contains("hashBucketNum"), e.getMessage)
      }
    }
  }

  test("overwrite: columns differing only by case are rejected with overwriteSchema") {
    withSQLConf("spark.sql.caseSensitive" -> "true") {
      withTempTable { dir =>
        intercept[Exception] {
          spark.range(10).withColumn("ID", $"id" + 1)
            .write.format("graft").mode("overwrite").save(dir)
        }
        intercept[Exception] {
          spark.range(10).withColumn("ID", $"id" + 1)
            .write.option("overwriteSchema", "true")
            .format("graft").mode("overwrite").save(dir)
        }
      }
    }
  }

  // ----------------------------------------------------- replaceWhere × DDL

  // nullable id so a column-subset replacement may null-fill it
  private def replaceWhereBase(dir: String): Unit =
    spark.range(5).selectExpr("nullif(id, -1) as id")
      .withColumn("part", $"id" % 2)
      .write.option("rangePartitions", "part")
      .format("graft").mode("overwrite").save(dir)

  test("replaceWhere/overwrite: subset write null-filling a NOT NULL column is rejected") {
    // Deliberately STRICTER than the reference, which lets a replaceWhere /
    // merged-overwrite subset write silently store nulls into a column whose
    // schema says NOT NULL. Here the declared constraint wins.
    enableAutoMerge {
      withTempTable { dir =>
        spark.range(5).toDF("id").withColumn("part", $"id" % 2) // id NOT NULL
          .write.option("rangePartitions", "part")
          .format("graft").mode("overwrite").save(dir)
        val e = intercept[Exception] {
          Seq((1L, 0L), (2L, 0L)).toDF("value", "part").write
            .option("replaceWhere", "part = 0")
            .format("graft").mode("overwrite").save(dir)
        }
        assert(e.getMessage.contains("NOT NULL"), e.getMessage)
      }
    }
  }

  test("replaceWhere: schema merging via the autoMerge conf") {
    enableAutoMerge {
      withTempTable { dir =>
        replaceWhereBase(dir)
        Seq((1L, 0L), (2L, 0L)).toDF("value", "part").write
          .option("replaceWhere", "part = 0")
          .format("graft").mode("overwrite").save(dir)
        val df = graftDf(dir).select("id", "part", "value")
        assert(graftDf(dir).schema.fieldNames.sorted.toSeq ==
          Seq("id", "part", "value"))
        // part=1 rows kept (value null), part=0 rows replaced (id null)
        assert(rowsOf(df) == Seq(
          Seq(1L, 1L, null), Seq(3L, 1L, null),
          Seq(null, 0L, 1L), Seq(null, 0L, 2L)))
      }
    }
  }

  test("replaceWhere: schema merging via the writer option (case-insensitive keys)") {
    disableAutoMerge {
      withTempTable { dir =>
        replaceWhereBase(dir)
        Seq((1L, 0L), (2L, 0L)).toDF("value", "part").write
          .option("RePlAcEwHeRe", "part = 0")
          .option("mErGeScHeMa", "true")
          .format("graft").mode("overwrite").save(dir)
        assert(graftDf(dir).schema.fieldNames.sorted.toSeq ==
          Seq("id", "part", "value"))
      }
    }
  }

  test("replaceWhere: schema change without mergeSchema is rejected") {
    disableAutoMerge {
      withTempTable { dir =>
        replaceWhereBase(dir)
        val e = intercept[Exception] {
          Seq((1L, 0L), (2L, 0L)).toDF("value", "part").write
            .option("rangePartitions", "part")
            .option("replaceWhere", "part = 0")
            .format("graft").mode("overwrite").save(dir)
        }
        assert(e.getMessage.contains("mergeSchema"), e.getMessage)
      }
    }
  }

  test("replaceWhere: mergeSchema=false option overrides an enabled conf") {
    enableAutoMerge {
      withTempTable { dir =>
        replaceWhereBase(dir)
        val e = intercept[Exception] {
          Seq((1L, 0L), (2L, 0L)).toDF("value", "part").write
            .option("replaceWhere", "part = 0")
            .option("mergeSchema", "false")
            .format("graft").mode("overwrite").save(dir)
        }
        assert(e.getMessage.contains("mergeSchema"), e.getMessage)
      }
    }
  }

  test("replaceWhere: combining with overwriteSchema is rejected") {
    disableAutoMerge {
      withTempTable { dir =>
        replaceWhereBase(dir)
        val e = intercept[Exception] {
          Seq((1L, 0L), (2L, 0L)).toDF("value", "part").write
            .option("replaceWhere", "part = 0")
            .option("overwriteSchema", "true")
            .format("graft").mode("overwrite").save(dir)
        }
        assert(e.getMessage.contains("mergeSchema"), e.getMessage)
      }
    }
  }

  // ------------------------------------------------------------- streaming

  private def classicSpark = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  test("streaming append: reject schema changes by default") {
    disableAutoMerge {
      withTempTable { dir =>
        implicit val ctx = classicSpark.sqlContext
        val input = MemoryStream[Long]
        val q1 = input.toDF().toDF("id")
          .writeStream.format("graft").outputMode(OutputMode.Append)
          .option("checkpointLocation", dir + "-ckpt")
          .trigger(Trigger.AvailableNow()).start(dir)
        input.addData(1L, 2L)
        q1.awaitTermination(60000)
        // data BEFORE start: AvailableNow snapshots the available offsets
        // at start, so a later addData may not be processed at all and the
        // query would terminate cleanly without attempting the write
        input.addData(3L)
        val q2 = input.toDF().toDF("id").withColumn("part", $"id" + 1)
          .writeStream.format("graft").outputMode(OutputMode.Append)
          .option("checkpointLocation", dir + "-ckpt")
          .trigger(Trigger.AvailableNow()).start(dir)
        val e = intercept[Exception] { q2.awaitTermination(60000) }
        assert(messagesOf(e).contains("mergeSchema"), messagesOf(e))
        assert(graftDf(dir).schema.length == 1)
      }
    }
  }

  test("streaming append: mergeSchema option / autoMerge conf allow evolution") {
    withTempTable { dir =>
      implicit val ctx = classicSpark.sqlContext
      val input = MemoryStream[Long]
      val q1 = input.toDF().toDF("id")
        .writeStream.format("graft").outputMode(OutputMode.Append)
        .option("checkpointLocation", dir + "-ckpt")
        .trigger(Trigger.AvailableNow()).start(dir)
      input.addData(1L, 2L)
      q1.awaitTermination(60000)
      input.addData(3L) // before start — see the rejection test above
      val q2 = input.toDF().toDF("id").withColumn("part", $"id" + 1)
        .writeStream.format("graft").outputMode(OutputMode.Append)
        .option("checkpointLocation", dir + "-ckpt")
        .option("mergeSchema", "true")
        .trigger(Trigger.AvailableNow()).start(dir)
      q2.awaitTermination(60000)
      assert(graftDf(dir).schema.fieldNames.toSeq == Seq("id", "part"))
      enableAutoMerge {
        val q3 = input.toDF().toDF("id")
          .withColumn("part", $"id" + 1).withColumn("more", lit("x"))
          .writeStream.format("graft").outputMode(OutputMode.Append)
          .option("checkpointLocation", dir + "-ckpt")
          .trigger(Trigger.AvailableNow()).start(dir)
        input.addData(4L)
        q3.awaitTermination(60000)
      }
      assert(graftDf(dir).schema.fieldNames.toSeq == Seq("id", "part", "more"))
      assert(rowsOf(graftDf(dir).select("id", "part", "more")) == Seq(
        Seq(1L, null, null), Seq(2L, null, null),
        Seq(3L, 4L, null), Seq(4L, 5L, "x")))
    }
  }

  test("streaming complete: reject a new schema by default") {
    disableAutoMerge {
      withTempTable { dir =>
        implicit val ctx = classicSpark.sqlContext
        val input = MemoryStream[String]
        val q1 = input.toDS().toDF("k").groupBy("k").count()
          .writeStream.format("graft").outputMode(OutputMode.Complete)
          .option("checkpointLocation", dir + "-ckpt")
          .trigger(Trigger.AvailableNow()).start(dir)
        input.addData("a", "a", "b")
        q1.awaitTermination(60000)
        assert(graftDf(dir).schema.length == 2)
        val q2 = input.toDS().toDF("k").groupBy("k").count()
          .withColumn("extra", lit(1))
          .writeStream.format("graft").outputMode(OutputMode.Complete)
          .option("checkpointLocation", dir + "-ckpt")
          .trigger(Trigger.AvailableNow()).start(dir)
        input.addData("b")
        val e = intercept[Exception] { q2.awaitTermination(60000) }
        assert(messagesOf(e).contains("overwriteSchema"), messagesOf(e))
        assert(graftDf(dir).schema.length == 2)
      }
    }
  }

  test("streaming complete: overwriteSchema option replaces the schema") {
    disableAutoMerge {
      withTempTable { dir =>
        implicit val ctx = classicSpark.sqlContext
        val input = MemoryStream[String]
        val q1 = input.toDS().toDF("k").groupBy("k").count()
          .writeStream.format("graft").outputMode(OutputMode.Complete)
          .option("checkpointLocation", dir + "-ckpt")
          .trigger(Trigger.AvailableNow()).start(dir)
        input.addData("a", "a", "b")
        q1.awaitTermination(60000)
        val q2 = input.toDS().toDF("k").groupBy("k").count()
          .withColumnRenamed("count", "total")
          .writeStream.format("graft").outputMode(OutputMode.Complete)
          .option("checkpointLocation", dir + "-ckpt")
          .option("overwriteSchema", "true")
          .trigger(Trigger.AvailableNow()).start(dir)
        input.addData("b")
        q2.awaitTermination(60000)
        assert(graftDf(dir).schema.fieldNames.toSeq == Seq("k", "total"))
        assert(rowsOf(graftDf(dir).select("k", "total")) ==
          Seq(Seq("a", 2L), Seq("b", 2L)))
      }
    }
  }

  test("streaming complete: autoMerge conf migrates the schema") {
    enableAutoMerge {
      withTempTable { dir =>
        implicit val ctx = classicSpark.sqlContext
        val input = MemoryStream[String]
        val q1 = input.toDS().toDF("k").groupBy("k").count()
          .writeStream.format("graft").outputMode(OutputMode.Complete)
          .option("checkpointLocation", dir + "-ckpt")
          .trigger(Trigger.AvailableNow()).start(dir)
        input.addData("a", "a", "b")
        q1.awaitTermination(60000)
        val q2 = input.toDS().toDF("k").groupBy("k").count()
          .withColumn("extra", lit(1))
          .writeStream.format("graft").outputMode(OutputMode.Complete)
          .option("checkpointLocation", dir + "-ckpt")
          .trigger(Trigger.AvailableNow()).start(dir)
        input.addData("b")
        q2.awaitTermination(60000)
        assert(graftDf(dir).schema.fieldNames.toSeq == Seq("k", "count", "extra"))
        // complete mode replaced the DATA with the latest aggregation
        assert(rowsOf(graftDf(dir).select("k", "count", "extra")) ==
          Seq(Seq("a", 2L, 1), Seq("b", 2L, 1)))
      }
    }
  }
}
