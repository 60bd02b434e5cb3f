package graft

import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Targeted ports of the reference's DML edge-case matrices
  * (`commands/UpsertSuiteBase.scala:147-662`, `UpdateSuiteBase.scala`,
  * `DeleteSuiteBase.scala`) — the shapes that historically break
  * merge-on-read engines: composite range+hash keys, deranged source
  * column order, partial-column batches over multiple rounds, empty
  * batches, NULL semantics in predicates, and key-column guards.
  */
class DmlEdgeCaseSuite extends GraftFunSuite {
  import spark.implicits._

  // ---- upsert matrix ----

  test("upsert with multiple range and multiple hash partitions") {
    withTempTable { dir =>
      Seq((20201101, 1, 1L, 1L, 1), (20201101, 2, 2L, 2L, 2),
          (20201101, 3, 3L, 3L, 3), (20201102, 4, 4L, 4L, 4))
        .toDF("range1", "range2", "hash1", "hash2", "value")
        .write.format("graft").partitionBy("range1", "range2")
        .option("hashPartitions", "hash1,hash2").option("hashBucketNum", "2")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((20201101, 1, 1L, 1L, 11), (20201101, 3, 3L, 3L, 33),
          (20201101, 4, 4L, 4L, 44))
        .toDF("range1", "range2", "hash1", "hash2", "value"))
      assertSameRows(t.toDF.select("range1", "range2", "hash1", "hash2", "value"),
        Seq((20201101, 1, 1L, 1L, 11), (20201101, 2, 2L, 2L, 2),
            (20201101, 3, 3L, 3L, 33), (20201101, 4, 4L, 4L, 44),
            (20201102, 4, 4L, 4L, 4))
          .toDF("range1", "range2", "hash1", "hash2", "value"))
    }
  }

  test("upsert source missing a range partition column fails") {
    withTempTable { dir =>
      Seq((20201101, 1L, 1)).toDF("range1", "hash1", "value")
        .write.format("graft").partitionBy("range1")
        .option("hashPartitions", "hash1").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val e = intercept[Exception] {
        t.upsert(Seq((1L, 11)).toDF("hash1", "value"))
      }
      assert(e.getMessage.contains("range"), e.getMessage)
    }
  }

  test("upsert source missing a hash (primary-key) column fails") {
    withTempTable { dir =>
      Seq((1L, 2L, 1)).toDF("hash1", "hash2", "value")
        .write.format("graft")
        .option("hashPartitions", "hash1,hash2").option("hashBucketNum", "2")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      val e = intercept[Exception] {
        t.upsert(Seq((1L, 11)).toDF("hash1", "value"))
      }
      assert(e.getMessage.toLowerCase.contains("key"), e.getMessage)
    }
  }

  test("upsert into a non-existent table fails") {
    withTempTable { dir =>
      intercept[Exception] {
        graft.commands.UpsertCommand.run(spark, s"$dir/nope",
          Seq((1L, 1)).toDF("id", "v"))
      }
    }
  }

  test("upsert on a non-PK table fails") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft").save(dir)
      val e = intercept[Exception] {
        GraftTable.forPath(spark, dir).upsert(Seq((1L, 11)).toDF("id", "v"))
      }
      assert(e.getMessage.contains("hash-partitioned"), e.getMessage)
    }
  }

  test("empty-batch upsert is a no-op on one and many files") {
    withTempTable { dir =>
      val t0 = Seq((1L, 1), (2L, 2)).toDF("id", "v")
      t0.write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(t0.filter(lit(false)))
      assertSameRows(t.toDF.select("id", "v"), t0)
      // multiple delta files present, then another empty batch
      t.upsert(Seq((3L, 3)).toDF("id", "v"))
      t.upsert(t0.filter(lit(false)))
      assertSameRows(t.toDF.select("id", "v"),
        Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "v"))
    }
  }

  test("deranged source column order lands values in the right columns") {
    withTempTable { dir =>
      Seq((20201101, 1L, 1L, 1, 1, 1), (20201101, 2L, 2L, 2, 2, 2))
        .toDF("range", "hash1", "hash2", "value", "name", "age")
        .write.format("graft").partitionBy("range")
        .option("hashPartitions", "hash1,hash2").option("hashBucketNum", "2")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      // source columns permuted: (range, hash2, name, hash1)
      t.upsert(Seq((20201101, 12L, 11, 1L), (20201101, 22L, 22, 2L),
          (20201101, 32L, 33, 3L))
        .toDF("range", "hash2", "name", "hash1"))
      assertSameRows(
        t.toDF.select("range", "hash1", "hash2", "value", "name", "age"),
        Seq[(Int, Long, Long, Integer, Integer, Integer)](
          (20201101, 1L, 1L, 1, 1, 1), (20201101, 2L, 2L, 2, 2, 2),
          (20201101, 1L, 12L, null, 11, null),
          (20201101, 2L, 22L, null, 22, null),
          (20201101, 3L, 32L, null, 33, null))
          .toDF("range", "hash1", "hash2", "value", "name", "age"))
    }
  }

  test("partial-column upserts over three rounds merge column-wise") {
    withTempTable { dir =>
      Seq((20201102, 1L, 12L, 1, null.asInstanceOf[Integer],
          null.asInstanceOf[Integer]))
        .toDF("range", "hash1", "hash2", "value", "name", "age")
        .write.format("graft").partitionBy("range")
        .option("hashPartitions", "hash1,hash2").option("hashBucketNum", "2")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      // round 2: same key, different subset (name only)
      t.upsert(Seq((20201102, 12L, 11, 1L)).toDF("range", "hash2", "name", "hash1"))
      // round 3: same key again, age+name
      t.upsert(Seq((20201102, 4567, 12L, 456, 1L))
        .toDF("range", "age", "hash2", "name", "hash1"))
      assertSameRows(
        t.toDF.select("range", "hash1", "hash2", "value", "name", "age"),
        Seq((20201102, 1L, 12L, 1, 456, 4567))
          .toDF("range", "hash1", "hash2", "value", "name", "age"))
    }
  }

  test("column-pruned reads after repeated upserts (with and without PKs)") {
    withTempTable { dir =>
      Seq((20201101, 1L, 1, 1), (20201101, 2L, 2, 2))
        .toDF("range", "hash", "value", "name")
        .write.format("graft").partitionBy("range")
        .option("hashPartitions", "hash").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((20201101, 1L, 11), (20201101, 3L, 33))
        .toDF("range", "hash", "value"))
      t.upsert(Seq((20201101, 2L, 222), (20201101, 3L, 333))
        .toDF("range", "hash", "name"))
      // projection including the PK
      assertSameRows(t.toDF.select("hash", "value"),
        Seq[(Long, Integer)]((1L, 11), (2L, 2), (3L, 33)).toDF("hash", "value"))
      // projection NOT including the PK (merge still keyed correctly)
      assertSameRows(t.toDF.select("value", "name"),
        Seq[(Integer, Integer)]((11, 1), (2, 222), (33, 333))
          .toDF("value", "name"))
      // empty projection (count fast path)
      assert(t.toDF.count() == 3)
    }
  }

  test("conditional merge-mode upsert rewrites only the matching partition") {
    withTempTable { dir =>
      Seq((20201101, 1L, 1), (20201101, 2L, 2), (20201102, 4L, 4))
        .toDF("range", "hash", "value")
        .write.format("graft").partitionBy("range")
        .option("hashPartitions", "hash").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val untouched = t.snapshot.files.filter(_.rangeKey.contains("20201102"))
        .map(_.path).toSet
      t.upsert(Seq((20201101, 1L, 11), (20201101, 3L, 33))
        .toDF("range", "hash", "value"),
        mode = "merge", condition = Some("range = 20201101"))
      assertSameRows(t.toDF.select("range", "hash", "value"),
        Seq((20201101, 1L, 11), (20201101, 2L, 2), (20201101, 3L, 33),
            (20201102, 4L, 4)).toDF("range", "hash", "value"))
      // the non-matching partition's files were not rewritten
      val after = t.snapshot.files.filter(_.rangeKey.contains("20201102"))
        .map(_.path).toSet
      assert(after == untouched, s"partition 20201102 was rewritten: $after")
      // a source row OUTSIDE the condition fails the write (would be merged
      // into a partition the commit does not replace)
      intercept[Exception] {
        t.upsert(Seq((20201102, 4L, 44)).toDF("range", "hash", "value"),
          mode = "merge", condition = Some("range = 20201101"))
      }
      // DELTA mode must not silently drop the condition either: the same
      // out-of-condition row fails
      intercept[Exception] {
        t.upsert(Seq((20201102, 4L, 44)).toDF("range", "hash", "value"),
          condition = Some("range = 20201101"))
      }
      // and a condition on a non-range column is rejected with a clear
      // message, like replaceWhere
      val e = intercept[Exception] {
        t.upsert(Seq((20201101, 1L, 1)).toDF("range", "hash", "value"),
          mode = "merge", condition = Some("value > 0"))
      }
      assert(e.getMessage.contains("range partition columns"), e.getMessage)
    }
  }

  // ---- update matrix ----

  test("update with an always-false and always-true condition") {
    withTempTable { dir =>
      val init = Seq((1L, 10), (2L, 20)).toDF("id", "v")
      init.write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.updateExpr("1 = 2", Map("v" -> "0"))
      assertSameRows(t.toDF.select("id", "v"), init)
      t.updateExpr("1 = 1", Map("v" -> "v + 1"))
      assertSameRows(t.toDF.select("id", "v"),
        Seq((1L, 11), (2L, 21)).toDF("id", "v"))
    }
  }

  test("update leaves NULL-condition rows untouched; IS NULL matches them") {
    withTempTable { dir =>
      Seq[(Long, Integer)]((1L, 10), (2L, null), (3L, 30)).toDF("id", "v")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // `v <> 10` is NULL (not true) for the null row: untouched
      t.updateExpr("v <> 10", Map("v" -> "v * 2"))
      assertSameRows(t.toDF.select("id", "v"),
        Seq[(Long, Integer)]((1L, 10), (2L, null), (3L, 60)).toDF("id", "v"))
      t.updateExpr("v IS NULL", Map("v" -> "0"))
      assertSameRows(t.toDF.select("id", "v"),
        Seq[(Long, Integer)]((1L, 10), (2L, 0), (3L, 60)).toDF("id", "v"))
    }
  }

  test("update with multi-column SET referencing other columns") {
    withTempTable { dir =>
      Seq((1L, 10, 100), (2L, 20, 200)).toDF("id", "a", "b")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // both SET expressions must read the OLD row values (simultaneous
      // assignment, not sequential)
      t.updateExpr("id = 1", Map("a" -> "b + 1", "b" -> "a + 1"))
      assertSameRows(t.toDF.select("id", "a", "b"),
        Seq((1L, 101, 11), (2L, 20, 200)).toDF("id", "a", "b"))
    }
  }

  test("update of partition or primary-key columns is rejected") {
    withTempTable { dir =>
      Seq((20201101, 1L, 1)).toDF("range", "hash", "value")
        .write.format("graft").partitionBy("range")
        .option("hashPartitions", "hash").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val e1 = intercept[Exception] {
        t.updateExpr("value = 1", Map("hash" -> "hash + 1"))
      }
      assert(e1.getMessage.contains("primary-key"), e1.getMessage)
      val e2 = intercept[Exception] {
        t.updateExpr("value = 1", Map("range" -> "20201102"))
      }
      assert(e2.getMessage.contains("partition"), e2.getMessage)
    }
  }

  test("update on a deranged-upsert PK table merges before rewriting") {
    withTempTable { dir =>
      Seq((1L, 1, 1), (2L, 2, 2)).toDF("hash", "value", "name")
        .write.format("graft")
        .option("hashPartitions", "hash").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((11, 1L)).toDF("value", "hash")) // deranged delta
      t.updateExpr("value = 11", Map("name" -> "99"))
      assertSameRows(t.toDF.select("hash", "value", "name"),
        Seq((1L, 11, 99), (2L, 2, 2)).toDF("hash", "value", "name"))
    }
  }

  test("nested-field UPDATE: API and SQL, simultaneous with a top-level SET") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gnup")
      s2.sql(s"CREATE TABLE gnup (id BIGINT, flat INT, " +
        s"props STRUCT<a: INT, b: STRING>) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gnup VALUES " +
        "(1, 10, named_struct('a', 1, 'b', 'x'))," +
        "(2, 20, named_struct('a', 2, 'b', 'y'))")

      // SQL route: nested SET reads the OLD flat value while flat is also
      // being SET (simultaneous), sibling field b untouched
      s2.sql("UPDATE gnup SET props.a = flat + 1, flat = 0 WHERE id = 1")
      assert(rowsOf(s2.sql("SELECT id, flat, props.a, props.b FROM gnup")) ==
        Seq(Seq(1L, 0, 11, "x"), Seq(2L, 20, 2, "y")))

      // API route with a dotted key
      GraftTable.forPath(s2, s"$dir/t")
        .updateExpr("id = 2", Map("props.b" -> "'Z'"))
      assert(rowsOf(s2.sql("SELECT id, props.a, props.b FROM gnup")) ==
        Seq(Seq(1L, 11, "x"), Seq(2L, 2, "Z")))
      s2.sql("DROP TABLE gnup")
    }
  }

  // ---- delete matrix ----

  test("delete with always-false predicate keeps data; always-true empties") {
    withTempTable { dir =>
      val init = Seq((1L, 1), (2L, 2)).toDF("id", "v")
      init.write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.deleteExpr("1 = 2")
      assertSameRows(t.toDF.select("id", "v"), init)
      t.deleteExpr("1 = 1")
      assert(t.toDF.count() == 0)
      // table survives empty: a new append works
      Seq((9L, 9)).toDF("id", "v").write.format("graft").mode("append").save(dir)
      assertSameRows(t.toDF.select("id", "v"), Seq((9L, 9)).toDF("id", "v"))
    }
  }

  test("delete on PK column after upserts respects merge-on-read state") {
    withTempTable { dir =>
      Seq((1L, 1), (2L, 2), (3L, 3)).toDF("hash", "value")
        .write.format("graft")
        .option("hashPartitions", "hash").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 11), (4L, 44)).toDF("hash", "value"))
      // delete by CURRENT (merged) value: key 1's value is 11 now, so
      // `value = 1` must delete nothing
      t.deleteExpr("value = 1")
      assert(t.toDF.count() == 4)
      t.deleteExpr("hash = 1")
      assertSameRows(t.toDF.select("hash", "value"),
        Seq((2L, 2), (3L, 3), (4L, 44)).toDF("hash", "value"))
    }
  }

  test("delete with NULL semantics: equality skips nulls, IS NULL hits them") {
    withTempTable { dir =>
      Seq[(Long, Integer)]((1L, 1), (2L, null), (3L, 3)).toDF("id", "v")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.deleteExpr("v = 1") // must not touch the NULL row
      assertSameRows(t.toDF.select("id", "v"),
        Seq[(Long, Integer)]((2L, null), (3L, 3)).toDF("id", "v"))
      t.deleteExpr("v IS NULL")
      assertSameRows(t.toDF.select("id", "v"),
        Seq[(Long, Integer)]((3L, 3)).toDF("id", "v"))
    }
  }

  test("compaction with a partition predicate compacts only that partition") {
    withTempTable { dir =>
      Seq((20201101, 1L, 1), (20201102, 2L, 2)).toDF("range", "hash", "value")
        .write.format("graft").partitionBy("range")
        .option("hashPartitions", "hash").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((20201101, 1L, 11), (20201102, 2L, 22))
        .toDF("range", "hash", "value"))
      assert(t.snapshot.files.count(!_.isBase) == 2)
      t.compaction(force = true, partitionPredicate = Some("range = 20201101"))
      val deltasByRange = t.snapshot.files.filter(!_.isBase)
        .groupBy(_.rangeKey).view.mapValues(_.size).toMap
      assert(!deltasByRange.keySet.exists(_.contains("20201101")),
        s"predicate partition must be compacted: $deltasByRange")
      assert(deltasByRange.exists(_._1.contains("20201102")),
        s"other partition must keep its delta: $deltasByRange")
      assertSameRows(t.toDF.select("range", "hash", "value"),
        Seq((20201101, 1L, 11), (20201102, 2L, 22))
          .toDF("range", "hash", "value"))
    }
  }

  test("compaction with merge operators materializes combined values") {
    withTempTable { dir =>
      Seq((1L, 10L), (2L, 20L)).toDF("id", "cnt").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 5L), (2L, 7L)).toDF("id", "cnt"))
      // plain read before operator compaction is last-wins
      assertSameRows(t.toDF.select("id", "cnt"),
        Seq((1L, 5L), (2L, 7L)).toDF("id", "cnt"))
      t.compaction(mergeOperators = Map("cnt" -> "sum"))
      assert(!t.snapshot.hasDeltaFiles)
      // the SUM is baked into the base files: plain reads see it
      assertSameRows(t.toDF.select("id", "cnt"),
        Seq((1L, 15L), (2L, 27L)).toDF("id", "cnt"))
      // reading with the operator is identity over the single rows
      assertSameRows(
        spark.read.format("graft").option("mergeOperators", "cnt:sum")
          .load(dir).select("id", "cnt"),
        Seq((1L, 15L), (2L, 27L)).toDF("id", "cnt"))
    }
  }

  test("declared merge operators govern plain reads and engine compactions") {
    withTempTable { dir =>
      Seq((1L, 10L), (2L, 20L)).toDF("id", "cnt").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1")
        .option("graft.mergeOperators", "cnt:sum").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 5L)).toDF("id", "cnt"))
      // plain read applies the DECLARED operator — no scan option needed
      assertSameRows(t.toDF.select("id", "cnt"),
        Seq((1L, 15L), (2L, 20L)).toDF("id", "cnt"))
      // engine compaction (no explicit operators) materializes the sums
      // instead of silently collapsing to last-wins
      t.compaction()
      assert(!t.snapshot.hasDeltaFiles)
      assertSameRows(t.toDF.select("id", "cnt"),
        Seq((1L, 15L), (2L, 20L)).toDF("id", "cnt"))
      // later upserts keep summing over the compacted base
      t.upsert(Seq((2L, 2L)).toDF("id", "cnt"))
      assertSameRows(t.toDF.select("id", "cnt"),
        Seq((1L, 15L), (2L, 22L)).toDF("id", "cnt"))
      // validation: unknown or primary-key columns are rejected, not
      // silently dropped (which would materialize wrong values)
      val e1 = intercept[Exception] {
        t.compaction(mergeOperators = Map("nope" -> "sum"))
      }
      assert(e1.getMessage.contains("does not exist"), e1.getMessage)
      val e2 = intercept[Exception] {
        t.compaction(mergeOperators = Map("id" -> "sum"))
      }
      assert(e2.getMessage.contains("primary-key"), e2.getMessage)
      // merge-mode upsert would OVERWRITE the declared sum column instead
      // of combining; it is rejected toward delta mode
      val e3 = intercept[Exception] {
        t.upsert(Seq((1L, 1L)).toDF("id", "cnt"), mode = "merge")
      }
      assert(e3.getMessage.contains("delta mode"), e3.getMessage)
    }
  }

  test("delete whole range partition via predicate on PK table with deltas") {
    withTempTable { dir =>
      Seq((20201101, 1L, 1), (20201101, 2L, 2), (20201102, 3L, 3))
        .toDF("range", "hash", "value")
        .write.format("graft").partitionBy("range")
        .option("hashPartitions", "hash").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((20201101, 1L, 11)).toDF("range", "hash", "value"))
      t.deleteExpr("range = 20201101")
      assertSameRows(t.toDF.select("range", "hash", "value"),
        Seq((20201102, 3L, 3)).toDF("range", "hash", "value"))
    }
  }
}
