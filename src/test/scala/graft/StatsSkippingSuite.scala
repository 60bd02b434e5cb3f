package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.meta.DataFileInfo
import graft.sources.FileStats
import graft.tables.GraftTable

/** Per-file min/max stats in the manifest + file skipping at scan planning
  * + Z-order clustering. */
class StatsSkippingSuite extends GraftFunSuite {
  import spark.implicits._

  /** Files the scan PLANNED tasks for — the manifest-skipping signal
    * (parquet row-group pushdown happens later and cannot hide a planned
    * file). */
  private def plannedFiles(df: DataFrame): Long = {
    val scan = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
      .queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.getOrElse(fail("no BatchScanExec leaf"))
    scan.inputPartitions.map {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.length.toLong
      case p: graft.sources.GraftPkInputPartition =>
        p.groups.map(_.files.length.toLong).sum
      case _ => 1L
    }.sum
  }

  /** Rows the leaf scan EMITTED (files skipped at planning never emit). */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val leaves = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
      .queryExecution.executedPlan.collectLeaves()
    leaves.map((p: SparkPlan) =>
      p.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
  }

  test("write path collects footer stats into the manifest") {
    withTempTable { dir =>
      Seq((1L, "a", 1.5), (2L, "b", -3.0), (3L, null, 2.25))
        .toDF("id", "s", "d").write.format("graft").save(dir)
      val files = GraftTable.forPath(spark, dir).snapshot.files
      assert(files.nonEmpty)
      val f = files.maxBy(_.numRecords)
      assert(f.numRecords > 0)
      assert(f.minValues.get("id").map(_.toLong).exists(_ >= 1L))
      assert(f.maxValues.get("id").map(_.toLong).exists(_ <= 3L))
      assert(files.flatMap(_.minValues.get("s")).nonEmpty, "string stats")
      assert(files.flatMap(_.minValues.get("d")).nonEmpty, "double stats")
      val totalNulls = files.flatMap(_.nullCounts.get("s")).sum
      assert(totalNulls == 1L, s"expected 1 null in s, got $totalNulls")
      // disable switch works
      withSQLConf("spark.graft.stats.enabled" -> "false") {
        Seq((9L, "z", 0.0)).toDF("id", "s", "d").write.format("graft")
          .mode("append").save(dir)
      }
      val newFile = GraftTable.forPath(spark, dir).snapshot.files
        .filterNot(files.toSet)
      assert(newFile.forall(f => f.minValues.isEmpty && f.numRecords == -1L))
    }
  }

  test("evaluator semantics over a statted file") {
    val schema = StructType(Seq(StructField("x", LongType),
      StructField("s", StringType)))
    val f = DataFileInfo("p", numRecords = 10,
      minValues = Map("x" -> "100", "s" -> "mango"),
      maxValues = Map("x" -> "200", "s" -> "peach"),
      nullCounts = Map("x" -> 0L, "s" -> 10L))
    def keep(flt: Filter): Boolean = FileStats.mayMatch(f, Seq(flt), schema)
    assert(!keep(EqualTo("x", 99L)) && keep(EqualTo("x", 100L)) &&
      keep(EqualTo("x", 150L)) && !keep(EqualTo("x", 201L)))
    assert(!keep(GreaterThan("x", 200L)) && keep(GreaterThanOrEqual("x", 200L)))
    assert(!keep(LessThan("x", 100L)) && keep(LessThanOrEqual("x", 100L)))
    assert(!keep(In("x", Array(1L, 99L, 300L))) && keep(In("x", Array(1L, 150L))))
    assert(keep(IsNull("s")) && !keep(IsNull("x")))
    assert(keep(IsNotNull("x")) && !keep(IsNotNull("s")))
    assert(!keep(And(EqualTo("x", 150L), EqualTo("x", 300L))))
    assert(keep(Or(EqualTo("x", 99L), EqualTo("x", 150L))))
    assert(keep(StringStartsWith("s", "pa")) && !keep(StringStartsWith("s", "z")))
    // unknown column / missing stats / unhandled shapes: keep
    assert(keep(EqualTo("nope", 1L)) && keep(Not(EqualTo("x", 150L))))
    // int filter value against long column stats still compares
    assert(!keep(EqualTo("x", 5)))
  }

  test("non-PK scan skips files by stats end-to-end") {
    withTempTable { dir =>
      // two commits with DISJOINT id ranges -> two files with tight stats
      (1L to 100L).toDF("id").withColumn("v", col("id") * 2)
        .coalesce(1).write.format("graft").save(dir)
      (1001L to 1100L).toDF("id").withColumn("v", col("id") * 2)
        .coalesce(1).write.format("graft").mode("append").save(dir)
      val t = spark.read.format("graft").load(dir)
      assert(t.count() == 200)
      assert(plannedFiles(t) == 2L)
      // selective filter: the second file is not even PLANNED
      val hit = t.filter($"id" <= 50)
      assert(plannedFiles(hit) == 1L,
        "second file should be pruned from planning by manifest stats")
      assert(hit.count() == 50)
      // both files match -> both planned
      assert(plannedFiles(t.filter($"id" > 0)) == 2L)
      // no matching file -> nothing planned, correct empty result
      val none = t.filter($"id" === 500L)
      assert(plannedFiles(none) == 0L && none.count() == 0)
    }
  }

  test("PK scan skips by PK stats but NEVER by non-PK stats (merge safety)") {
    withTempTable { dir =>
      Seq((1L, 10), (2L, 20)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // delta upsert flips id=1's v from 10 to 99
      t.upsert(Seq((1L, 99)).toDF("id", "v"))
      // the CRITICAL case: filter on the OLD value of a non-PK column.
      // If stats pruning dropped the delta file (v range [99,99] does not
      // match v=10), the merge would resurrect the stale row. Must be 0.
      val stale = t.toDF.filter($"v" === 10)
      assert(plannedFiles(stale) == 2L,
        "non-PK filter must never drop files from a merge-on-read scan")
      assert(stale.count() == 0,
        "stale pre-image resurrected: non-PK stats pruning corrupted merge")
      assert(t.toDF.filter($"v" === 99).count() == 1)
      // PK stats pruning applies: id=5 (outside [1,2]) hits no file at all
      val none = t.toDF.filter($"id" === 5L)
      assert(plannedFiles(none) == 0L && none.count() == 0)
    }
  }

  test("PK point lookup prunes to the key's single bucket") {
    withTempTable { dir =>
      (1L to 1000L).toDF("id").withColumn("v", col("id") * 7)
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "8").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // delta upsert: the looked-up key must still merge correctly
      t.upsert(Seq((42L, -1L)).toDF("id", "v"))
      val total = t.snapshot.files.length
      assert(total >= 8)
      val point = t.toDF.filter($"id" === 42L)
      val planned = plannedFiles(point)
      assert(planned <= total / 4,
        s"point lookup should plan ~1 bucket's files, planned $planned of $total")
      assert(point.select("v").as[Long].collect().toSeq == Seq(-1L),
        "bucket pruning must not break merge-on-read")
      // IN lookup prunes to the union of candidate buckets
      val in3 = t.toDF.filter($"id".isin(1L, 2L, 3L))
      assert(plannedFiles(in3) < total)
      assert(in3.count() == 3)
      // range filter cannot bucket-prune (hash scatters the domain)
      assert(t.toDF.filter($"id" < 100L).count() == 99L)
    }
  }

  test("z-order clustering makes multi-dimensional skipping effective") {
    withTempTable { dir =>
      // 4k points on a 64x64 grid, written SHUFFLED in 8 files: every file
      // spans nearly the full range of both a and b -> no pruning possible
      val n = 4096
      val rnd = new scala.util.Random(42)
      val pts = (0 until n).map { i =>
        val r = rnd.nextInt(64 * 64)
        (r % 64, r / 64, i.toLong)
      }
      pts.toDF("a", "b", "pid").repartition(8).write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      val q = () => spark.read.format("graft").load(dir)
        .filter($"a" < 8 && $"b" < 8)
      val expected = rowsOf(q())
      assert(expected.nonEmpty, "planted corner region is empty")
      val filesBefore = plannedFiles(q())
      assert(filesBefore == 8L, s"pre-clustering files should not prune " +
        s"(planned $filesBefore of 8)")
      // cluster on (a, b); small target bytes force multiple output files
      withSQLConf("spark.graft.compaction.targetFileBytes" -> "4096") {
        t.zOrder(Seq("a", "b"))
      }
      val nFiles = t.snapshot.files.length
      assert(nFiles >= 4, s"expected a multi-file clustered layout, got $nFiles")
      val filesAfter = plannedFiles(q())
      assert(rowsOf(q()) == expected, "clustering changed query results")
      assert(filesAfter < nFiles / 2 + 1,
        s"z-order should enable pruning: planned $filesAfter of $nFiles " +
        s"clustered files (was $filesBefore of 8 pre-clustering)")
      // guards: PK tables and range columns are rejected
      intercept[IllegalArgumentException] {
        CompactionCommand_zOrderOnPk(dir)
      }
    }
  }

  private def CompactionCommand_zOrderOnPk(ignored: String): Unit =
    withTempTable { dir2 =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir2)
      GraftTable.forPath(spark, dir2).zOrder(Seq("v"))
    }

  test("metadata-only COUNT(*): non-PK answered from the manifest, " +
      "PK and filtered counts still scan") {
    withTempTable { dir =>
      def hasScan(df: DataFrame): Boolean =
        org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
          .queryExecution.sparkPlan.collectLeaves().exists(
            _.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec])
      (1L to 500L).toDF("id").write.format("graft").save(dir)
      val t = () => spark.read.format("graft").load(dir)
      // bare count: no scan in the plan, exact result
      val cnt = t().groupBy().count()
      assert(!hasScan(cnt), "COUNT(*) should be metadata-only")
      assert(cnt.as[Long].head() == 500L)
      assert(t().count() == 500L) // Dataset.count() path
      // stays exact through DML rewrites
      val gt = GraftTable.forPath(spark, dir)
      gt.deleteExpr("id <= 100")
      assert(t().count() == 400L)
      // filtered count must scan
      assert(hasScan(t().filter($"id" > 450).groupBy().count()))
      assert(t().filter($"id" > 450).count() == 50L)
      // conf off -> scans again, same answer
      withSQLConf("spark.graft.stats.metadataOnlyCount.enabled" -> "false") {
        val c2 = t().groupBy().count()
        assert(hasScan(c2) && c2.as[Long].head() == 400L)
      }
    }
    withTempTable { dir =>
      // PK table: merge-on-read dedups keys, metadata counts would lie
      Seq((1L, 1), (2L, 2)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 9)).toDF("id", "v")) // same key: count must stay 2
      val cnt = t.toDF.groupBy().count()
      def hasScan(df: DataFrame): Boolean =
        org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
          .queryExecution.sparkPlan.collectLeaves().exists(
            _.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec])
      assert(hasScan(cnt), "PK COUNT(*) must scan (merge dedups keys)")
      assert(cnt.as[Long].head() == 2L)
    }
  }

  test("metadata-only MIN/MAX/COUNT(col) and partition-filtered counts") {
    def hasScan(df: DataFrame): Boolean =
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
        .queryExecution.sparkPlan.collectLeaves().exists(
          _.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec])
    withTempTable { dir =>
      Seq(("us", 1L, "apple"), ("us", 7L, "pear"), ("de", 3L, null))
        .toDF("country", "n", "s")
        .write.format("graft").option("rangePartitions", "country").save(dir)
      val t = () => spark.read.format("graft").load(dir)
      // min/max/count(col) from the manifest, no scan
      val probe = t().groupBy().agg(
        min($"n").as("mn"), max($"n").as("mx"), count($"s").as("cs"),
        max($"s").as("ms"), count(lit(1)).as("c"))
      assert(!hasScan(probe), "metadata-answerable aggregate should not scan")
      assert(probe.as[(Long, Long, Long, String, Long)].head() ==
        ((1L, 7L, 2L, "pear", 3L)))
      // partition-filtered count: file set restricted, still no scan
      val pc = t().filter($"country" === "us").groupBy().count()
      assert(!hasScan(pc), "partition-filtered COUNT should be metadata-only")
      assert(pc.as[Long].head() == 2L)
      // data-column filter -> scan
      assert(hasScan(t().filter($"n" > 2).groupBy().count()))
      assert(t().filter($"n" > 2).count() == 2L)
      // NON-DETERMINISTIC filter -> scan: rand() carries no references, and
      // a plan-time evaluation would collapse the per-row sample into an
      // all-or-nothing per-partition verdict
      assert(hasScan(t().filter($"country" === "us" && rand(7) < 0.5)
        .groupBy().count()))
      // a computed alias SHADOWING a partition-column name must not be
      // evaluated against manifest partition values: every row maps to
      // 'us' here, so the true count is 3 while the partition-value answer
      // would be 2 — the filter's exprId does not resolve to the
      // relation's output, so the rewrite bails and the scan answers
      val shadow = t()
        .select(when($"n" >= 1, "us").otherwise("de").as("country"))
        .filter($"country" === "us").groupBy().count()
      assert(hasScan(shadow),
        "alias shadowing a partition column must block the rewrite")
      assert(shadow.as[Long].head() == 3L)
      // avg is not answerable -> scan, correct
      val avgQ = t().groupBy().agg(avg($"n"))
      assert(hasScan(avgQ))
      // float min/max excluded from the rewrite
      withTempTable { d2 =>
        Seq(1.5, 2.5).toDF("d").write.format("graft").save(d2)
        val fq = spark.read.format("graft").load(d2).groupBy().agg(min($"d"))
        assert(hasScan(fq) && fq.as[Double].head() == 1.5)
      }
    }
  }

  test("stats survive the log round-trip and checkpoint replay") {
    withTempTable { dir =>
      (1L to 50L).toDF("id").write.format("graft").save(dir)
      // force extra commits so a checkpoint is written (interval = 10)
      for (i <- 1 to 11) {
        Seq(1000L + i).toDF("id").write.format("graft").mode("append").save(dir)
      }
      val files = GraftTable.forPath(spark, dir).snapshot.files
      assert(files.forall(_.minValues.contains("id")),
        "stats lost in log/checkpoint round-trip")
    }
  }
}
