package graft

import org.apache.spark.sql.functions._

import graft.meta.SnapshotManagement

/** Case-sensitivity edge cases ported (behavior, not code) from the
  * reference `star/schema/CaseSensitivitySuite.scala:32-460`: partition
  * declarations resolve case-insensitively and store the schema's
  * spelling, option KEYS are case-insensitive, same-name-different-case
  * columns are rejected, schema merge preserves the original case, and
  * replaceWhere follows the session's case-sensitivity conf.
  */
class CaseSensitivitySuite extends GraftFunSuite {
  import spark.implicits._

  private def testBothConfs(name: String)(f: => Unit): Unit =
    test(name) {
      withSQLConf("spark.sql.caseSensitive" -> "true")(f)
      withSQLConf("spark.sql.caseSensitive" -> "false")(f)
    }

  test("rangePartitions option resolves to the schema's column case") {
    withTempTable { dir =>
      Seq((1, "a"), (2, "b")).toDF("Key", "val").write
        .option("rangePartitions", "key") // lower-case declaration
        .format("graft").mode("append").save(dir)
      val info = SnapshotManagement.snapshot(dir).tableInfo
      assert(info.rangeColumns == Seq("Key"))
      assert(info.schema.fieldNames.toSeq == Seq("Key", "val"))
      assert(rowsOf(spark.read.format("graft").load(dir).select("Key", "val")) ==
        Seq(Seq(1, "a"), Seq(2, "b")))
    }
  }

  test("partitionBy resolves to the schema's column case") {
    withTempTable { dir =>
      Seq((1, "a"), (2, "b")).toDF("Key", "val").write
        .partitionBy("key")
        .format("graft").mode("append").save(dir)
      val info = SnapshotManagement.snapshot(dir).tableInfo
      assert(info.rangeColumns == Seq("Key"))
      assert(rowsOf(spark.read.format("graft").load(dir).select("Key", "val")) ==
        Seq(Seq(1, "a"), Seq(2, "b")))
    }
  }

  test("rangePartitions option takes priority over partitionBy") {
    withTempTable { dir =>
      Seq((1, "a"), (2, "b")).toDF("Key", "val").write
        .option("rangePartitions", "val")
        .partitionBy("key")
        .format("graft").mode("append").save(dir)
      val info = SnapshotManagement.snapshot(dir).tableInfo
      assert(info.rangeColumns == Seq("val"))
    }
  }

  testBothConfs("writer option keys are case-insensitive") {
    withTempTable { dir =>
      Seq((1, "a", "1"), (2, "b", "2")).toDF("key", "val", "hash").write
        .option("rAngeParTitionS", "key")
        .option("HaSHParTitionS", "hash")
        .option("HAshBucketNUM", "2")
        .format("graft").mode("overwrite").save(dir)
      val info = SnapshotManagement.snapshot(dir).tableInfo
      assert(info.rangeColumns == Seq("key"))
      assert(info.hashColumns == Seq("hash"))
      assert(info.bucketNum == 2)
      assert(rowsOf(spark.read.format("graft").load(dir).select("key", "val", "hash")) ==
        Seq(Seq(1, "a", "1"), Seq(2, "b", "2")))
    }
  }

  test("unknown partition column is rejected with the declared name") {
    withTempTable { dir =>
      val e = intercept[Exception] {
        Seq((1, "a")).toDF("key", "val").write
          .option("rangePartitions", "nope")
          .format("graft").save(dir)
      }
      assert(e.getMessage.contains("nope"), e.getMessage)
    }
  }

  testBothConfs("two fields with the same name modulo case are rejected") {
    withTempTable { dir =>
      intercept[Exception] {
        spark.sql("SELECT id as Foo, id as foo FROM RANGE(1)")
          .write.format("graft").save(dir)
      }
    }
  }

  testBothConfs("partition columns declared twice modulo case are rejected") {
    withTempTable { dir =>
      intercept[Exception] {
        spark.range(5).withColumn("a", $"id" + 1).write
          .option("rangePartitions", "a,A")
          .format("graft").save(dir)
      }
    }
  }

  testBothConfs("schema merge is case-insensitive and preserves original case") {
    withTempTable { dir =>
      withSQLConf("spark.graft.schema.autoMerge.enabled" -> "true") {
        spark.sql("SELECT id as foo, id as bar FROM RANGE(1)")
          .write.format("graft").save(dir)
        spark.sql("SELECT id + 1 as Foo, id as bar FROM RANGE(1)")
          .write.format("graft").mode("append").save(dir)
        spark.sql("SELECT id as bAr, id + 2 as Foo FROM RANGE(1)") // reordered
          .write.format("graft").mode("append").save(dir)
        val df = spark.read.format("graft").load(dir)
        assert(df.schema.fieldNames.toSeq == Seq("foo", "bar"))
        assert(rowsOf(df.select("foo", "bar")) ==
          Seq(Seq(0L, 0L), Seq(1L, 0L), Seq(2L, 0L)))
      }
    }
  }

  testBothConfs("case sensitivity of partition field values") {
    withTempTable { dir =>
      spark.sql("SELECT id + 1 as Foo, id as Bar FROM RANGE(1)").write
        .option("rangePartitions", "foo")
        .format("graft").save(dir)
      val snap = SnapshotManagement.snapshot(dir)
      assert(snap.tableInfo.rangeColumns == Seq("Foo"))
      assert(snap.files.map(_.partitionValues("Foo")).distinct == Seq("1"))
      assert(rowsOf(spark.read.format("graft").load(dir).select("Foo", "Bar")) ==
        Seq(Seq(1L, 0L)))
    }
  }

  test("replaceWhere predicate follows the case-sensitivity conf") {
    withTempTable { dir =>
      Seq((1, "a"), (2, "b")).toDF("Key", "val").write
        .option("rangePartitions", "Key")
        .format("graft").mode("append").save(dir)

      withSQLConf("spark.sql.caseSensitive" -> "false") {
        Seq((2, "c")).toDF("Key", "val").write
          .format("graft").mode("overwrite")
          .option("replaceWhere", "key = 2") // note the different case
          .save(dir)
      }
      assert(rowsOf(spark.read.format("graft").load(dir).select("Key", "val")) ==
        Seq(Seq(1, "a"), Seq(2, "c")))

      withSQLConf("spark.sql.caseSensitive" -> "true") {
        val e = intercept[Exception] {
          Seq((2, "d")).toDF("Key", "val").write
            .format("graft").mode("overwrite")
            .option("replaceWhere", "key = 2")
            .save(dir)
        }
        assert(e.getMessage.contains("Key"), e.getMessage)
      }
      // the rejected write must not have changed anything
      assert(rowsOf(spark.read.format("graft").load(dir).select("Key", "val")) ==
        Seq(Seq(1, "a"), Seq(2, "c")))
    }
  }

  test("partition columns cannot be changed after table creation") {
    withTempTable { dir =>
      Seq((1, "a", "1"), (2, "b", "2")).toDF("key", "val", "hash").write
        .partitionBy("key")
        .option("hashPartitions", "hash")
        .option("hashBucketNum", "2")
        .format("graft").mode("overwrite").save(dir)

      // re-stating the SAME layout (any case) is a no-op
      Seq((3, "d", "3")).toDF("key", "val", "hash").write
        .option("rangePartitions", "KEY")
        .option("hashPartitions", "HASH")
        .option("hashBucketNum", "2")
        .format("graft").mode("overwrite").save(dir)
      assert(rowsOf(spark.read.format("graft").load(dir).select("key", "val", "hash")) ==
        Seq(Seq(3, "d", "3")))

      val e1 = intercept[Exception] {
        Seq((4, "e", "4")).toDF("key", "val", "hash").write
          .format("graft").mode("overwrite")
          .option("rangePartitions", "val").save(dir)
      }
      assert(e1.getMessage.contains("conflicts"), e1.getMessage)

      val e2 = intercept[Exception] {
        Seq((4, "e", "4")).toDF("key", "val", "hash").write
          .format("graft").mode("overwrite")
          .option("hashPartitions", "val").save(dir)
      }
      assert(e2.getMessage.contains("Hash partition"), e2.getMessage)

      val e3 = intercept[Exception] {
        Seq((4, "e", "4")).toDF("key", "val", "hash").write
          .format("graft").mode("overwrite")
          .option("hashPartitions", "hash").option("hashBucketNum", "4").save(dir)
      }
      assert(e3.getMessage.contains("conflicts"), e3.getMessage)
    }
  }

  test("append to a hash-partitioned table is rejected after first commit") {
    withTempTable { dir =>
      Seq((1, "a")).toDF("key", "val").write
        .option("hashPartitions", "key").option("hashBucketNum", "2")
        .format("graft").mode("append").save(dir)
      val e = intercept[Exception] {
        Seq((3, "d")).toDF("key", "val").write
          .format("graft").mode("append").save(dir)
      }
      assert(e.getMessage.toLowerCase.contains("append"), e.getMessage)
    }
  }
}
