package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{GraftPkInputPartition, GraftPkScan, GraftStreamableScan}

/** Runtime (dynamic partition pruning) V2 filtering: a star join's
  * completed build side narrows graft scans before execution — PK IN values
  * hash straight to their buckets; range IN values drop whole partitions.
  * Unit tests drive `SupportsRuntimeV2Filtering.filter` directly with the
  * exact predicate shape Spark emits; the e2e tests assert Spark itself
  * injects the dynamic pruning expression on graft scans. */
class RuntimeFilterSuite extends GraftFunSuite {
  import spark.implicits._

  private def pkScanOf(df: DataFrame): GraftPkScan =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
      .queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec if b.scan.isInstanceOf[GraftPkScan] =>
        b.scan.asInstanceOf[GraftPkScan]
      }.getOrElse(fail("no GraftPkScan leaf"))

  test("runtime PK IN values prune buckets") {
    withTempTable { dir =>
      (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "8").save(dir)
      val scan = pkScanOf(spark.read.format("graft").load(dir))
      val before = scan.planInputPartitions()
      assert(before.length == 8, "partition count is always bucketNum")
      assert(before.forall(_.asInstanceOf[GraftPkInputPartition].groups.nonEmpty))

      scan.filter(Array(SparkShims.v2InPredicate("id", Seq(7L, 13L), LongType)))
      val after = scan.planInputPartitions()
      assert(after.length == 8, "bucket pruning empties partitions, never drops them")
      val nonEmpty = after.map(_.asInstanceOf[GraftPkInputPartition])
        .filter(_.groups.nonEmpty)
      assert(nonEmpty.length <= 2 && nonEmpty.nonEmpty,
        s"two keys hit at most two buckets, got ${nonEmpty.length}")
    }
  }

  test("repeated runtime filter calls intersect; mistyped values are ignored") {
    withTempTable { dir =>
      (0L until 100L).map(i => (i, i.toString)).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "8").save(dir)
      val scan = pkScanOf(spark.read.format("graft").load(dir))
      // a mistyped join key (int vs the table's long) must be a no-op
      scan.filter(Array(SparkShims.v2InPredicate("id", Seq(5), org.apache.spark
        .sql.types.IntegerType)))
      assert(scan.planInputPartitions()
        .map(_.asInstanceOf[GraftPkInputPartition]).count(_.groups.nonEmpty) == 8)
      // two typed calls AND together: {5,7} ∩ {7,9} = {7} -> one bucket
      scan.filter(Array(SparkShims.v2InPredicate("id", Seq(5L, 7L), LongType)))
      scan.filter(Array(SparkShims.v2InPredicate("id", Seq(7L, 9L), LongType)))
      val kept = scan.planInputPartitions()
        .map(_.asInstanceOf[GraftPkInputPartition]).filter(_.groups.nonEmpty)
      assert(kept.length == 1)
      // and the surviving bucket still returns key 7 on read
      val df = spark.read.format("graft").load(dir).filter($"id" === 7L)
      assert(df.count() == 1L)
    }
  }

  test("runtime range IN values drop whole partitions of a PK table") {
    withTempTable { dir =>
      (0L until 300L).map(i => (i, s"p${i % 3}", i * 2)).toDF("id", "part", "x")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4")
        .option("rangePartitions", "part").save(dir)
      val scan = pkScanOf(spark.read.format("graft").load(dir))
      val groupsBefore = scan.planInputPartitions()
        .map(_.asInstanceOf[GraftPkInputPartition]).map(_.groups.length).sum
      scan.filter(Array(SparkShims.v2InPredicate("part",
        Seq(UTF8String.fromString("p1")), StringType)))
      val after = scan.planInputPartitions()
        .map(_.asInstanceOf[GraftPkInputPartition])
      val groupsAfter = after.map(_.groups.length).sum
      assert(groupsAfter < groupsBefore,
        s"expected fewer groups after range pruning: $groupsAfter vs $groupsBefore")
      assert(after.forall(_.groups.forall(_.files.nonEmpty)))
    }
  }

  test("runtime range IN values narrow the no-PK parquet scan's file list") {
    withTempTable { dir =>
      (0L until 300L).map(i => (i, s"p${i % 3}")).toDF("id", "part")
        .write.format("graft").option("rangePartitions", "part").save(dir)
      val scan = org.apache.spark.sql.classic.ClassicConversions
        .castToImpl(spark.read.format("graft").load(dir))
        .queryExecution.executedPlan.collectLeaves()
        .collectFirst { case b: BatchScanExec
            if b.scan.isInstanceOf[GraftStreamableScan] =>
          b.scan.asInstanceOf[GraftStreamableScan]
        }.getOrElse(fail("no GraftStreamableScan leaf"))
      def files(): Long = scan.toBatch.planInputPartitions().map {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          fp.files.length.toLong
        case _ => 1L
      }.sum
      val before = files()
      scan.filter(Array(SparkShims.v2InPredicate("part",
        Seq(UTF8String.fromString("p2")), StringType)))
      val after = files()
      assert(after < before, s"expected file pruning: $after vs $before")
    }
  }

  test("runtime PK values reach the parquet readers as pushed IN filters") {
    withTempTable { dir =>
      (0L until 500L).map(i => (i, s"s${i % 9}", s"v$i")).toDF("id", "s", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(dir)
      val df = spark.read.format("graft").load(dir)
      val scan = pkScanOf(df)
      scan.filter(Array(
        SparkShims.v2InPredicate("id", Seq(7L, 13L), LongType),
        // range/unknown columns never become reader filters
        SparkShims.v2InPredicate("s",
          Seq(UTF8String.fromString("s1")), StringType)))
      // only the PK column becomes a reader filter, with EXTERNAL values
      val readerFilters = scan.runtimePkReaderFilters
      assert(readerFilters == Seq(org.apache.spark.sql.sources.In("id",
        Array[Any](7L, 13L))) ||
        readerFilters == Seq(org.apache.spark.sql.sources.In("id",
          Array[Any](13L, 7L))), s"got $readerFilters")
      // a full read through the narrowed scan still returns the right rows
      // (bucket pruning + reader-pushed IN must drop only non-matching IO,
      // never rows — row-group skipping is coarser than the key set)
      val rows = df.filter($"id".isin(7L, 13L)).collect()
      assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(7L, 13L))
      // and the reader factory builds without error over the merge path too
      assert(scan.createReaderFactory() != null)
    }
  }

  test("string-PK runtime values externalize for the reader filter") {
    withTempTable { dir =>
      (0 until 100).map(i => (s"k$i", i)).toDF("k", "x")
        .write.format("graft")
        .option("hashPartitions", "k").option("hashBucketNum", "4").save(dir)
      val df = spark.read.format("graft").load(dir)
      val scan = pkScanOf(df)
      scan.filter(Array(SparkShims.v2InPredicate("k",
        Seq(UTF8String.fromString("k42")), StringType)))
      assert(scan.runtimePkReaderFilters == Seq(
        org.apache.spark.sql.sources.In("k", Array[Any]("k42"))),
        s"got ${scan.runtimePkReaderFilters}")
      assert(df.filter($"k" === "k42").collect().map(_.getInt(1)).toSeq ==
        Seq(42))
    }
  }

  test("joins over scans whose projection pruned the filter columns away") {
    // regression: filterAttributes advertising a pruned-away column makes
    // PartitionPruning's resolveRefs THROW on any join over the scan
    // ("Unable to resolve lang given [doc_id,text]" — caught by Verify)
    withTempTable { dir =>
      (0L until 100L).map(i => (i, s"t$i", s"p${i % 3}")).toDF("id", "t", "part")
        .write.format("graft").option("rangePartitions", "part").save(s"$dir/a")
      val a = spark.read.format("graft").load(s"$dir/a").select($"id", $"t")
      val b = a.select($"id".as("id2"), $"t".as("t2"))
      assert(a.join(b, $"t" === $"t2").count() == 100L)
      // same for a PK table projected away from its PK
      (0L until 100L).map(i => (i, s"t${i % 5}", i * 2)).toDF("id", "t", "x")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4")
        .save(s"$dir/pk")
      val pk = spark.read.format("graft").load(s"$dir/pk").select($"t", $"x")
      val dim = (0 until 5).map(i => s"t$i").toDF("dt")
      assert(pk.join(dim, $"t" === $"dt").count() == 100L)
    }
  }

  test("e2e: star join injects dynamic pruning into the graft PK scan") {
    withTempTable { dir =>
      val factDir = s"$dir/fact"
      val dimDir = s"$dir/dim"
      (0L until 10000L).map(i => (i, s"v$i")).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4")
        .save(factDir)
      // dim must be a FILE source: a LocalRelation's filter constant-folds
      // away and PartitionPruning no longer sees a selective predicate
      (0L until 100L).map(i => (i, if (i % 33 == 0) "x" else "y"))
        .toDF("did", "flag").write.parquet(dimDir)
      val fact = spark.read.format("graft").load(factDir)
      val dim = spark.read.parquet(dimDir)
      val joined = fact.join(dim.filter($"flag" === "x"), $"id" === $"did")
        .select($"id", $"v")
      assert(joined.collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 33L, 66L, 99L))
      val planStr = org.apache.spark.sql.classic.ClassicConversions
        .castToImpl(joined).queryExecution.executedPlan.toString
      assert(planStr.linesIterator.exists(l =>
        l.contains("GraftPkScan") && l.contains("dynamicpruning")),
        s"no dynamic pruning on the graft scan:\n$planStr")
    }
  }

  test("e2e: star join injects dynamic pruning into the no-PK range scan") {
    withTempTable { dir =>
      val rngDir = s"$dir/rng"
      val dimDir = s"$dir/dim"
      (0L until 1000L).map(i => (i, s"p${i % 10}")).toDF("id", "part")
        .write.format("graft").option("rangePartitions", "part").save(rngDir)
      (0 until 10).map(i => (s"p$i", if (i == 3) "keep" else "drop"))
        .toDF("dpart", "dflag").write.parquet(dimDir)
      val rng = spark.read.format("graft").load(rngDir)
      val dim = spark.read.parquet(dimDir)
      val j = rng.join(dim.filter($"dflag" === "keep"), $"part" === $"dpart")
      assert(j.collect().length == 100)
      val planStr = org.apache.spark.sql.classic.ClassicConversions
        .castToImpl(j).queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning"),
        s"no dynamic pruning in plan:\n$planStr")
    }
  }
}
