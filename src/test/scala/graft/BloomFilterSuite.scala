package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.tables.GraftTable

/** Declared parquet bloom filters (`graft.bloomFilter.columns` table
  * property): every write path embeds per-row-group blooms for the named
  * columns, so pushed equality/IN filters skip row groups that min/max
  * stats cannot (high-cardinality values scatter across files and every
  * file's range spans the domain). */
class BloomFilterSuite extends GraftFunSuite {
  import spark.implicits._

  /** Column -> has a bloom filter, from the first data file's footer. */
  private def bloomByColumn(dir: String): Map[String, Boolean] = {
    val files = GraftTable.forPath(spark, dir).snapshot.files
    assert(files.nonEmpty)
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new HPath(s"$dir/${files.head.path}"),
      spark.sparkContext.hadoopConfiguration))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      import scala.jdk.CollectionConverters._
      block.getColumns.asScala.map(c =>
        c.getPath.toDotString -> (c.getBloomFilterOffset >= 0)).toMap
    } finally reader.close()
  }

  test("declared columns get bloom filters; others do not") {
    withTempTable { dir =>
      (0L until 2000L).map(i => (i, s"u-$i", i * 3))
        .toDF("id", "uid", "x")
        .write.format("graft")
        .option("graft.bloomFilter.columns", "uid,id").save(dir)
      val blooms = bloomByColumn(dir)
      assert(blooms("uid") && blooms("id"), s"expected blooms: $blooms")
      assert(!blooms("x"), s"undeclared column got a bloom: $blooms")
      // reads with pushed equality over bloom'd columns stay correct
      val df = spark.read.format("graft").load(dir)
      assert(df.filter($"uid" === "u-1234").count() == 1L)
      assert(df.filter($"uid" === "nope").count() == 0L)
    }
  }

  test("blooms survive compaction and apply on PK tables") {
    withTempTable { dir =>
      (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4")
        .option("graft.bloomFilter.columns", "id")
        .option("graft.bloomFilter.ndv", "10000").save(dir)
      assert(bloomByColumn(dir)("id"))
      val t = GraftTable.forPath(spark, dir)
      t.upsert((0L until 100L).map(i => (i, s"w$i")).toDF("id", "v"))
      t.compaction()
      assert(bloomByColumn(dir)("id"), "compacted rewrite lost the bloom")
      val df = spark.read.format("graft").load(dir)
      assert(df.filter($"id" === 42L).collect().map(_.getString(1)).toSeq ==
        Seq("w42"))
    }
  }

  test("stale property entries are ignored, not fatal") {
    withTempTable { dir =>
      (0L until 100L).map(i => (i, s"p${i % 2}")).toDF("id", "part")
        .write.format("graft")
        .option("rangePartitions", "part")
        // no_such is unknown; part is a range column (no physical chunk)
        .option("graft.bloomFilter.columns", "no_such, part, id").save(dir)
      val blooms = bloomByColumn(dir)
      assert(blooms("id"), s"valid entry must still apply: $blooms")
      assert(!blooms.contains("part"), "range column has no physical chunk")
      assert(spark.read.format("graft").load(dir).count() == 100L)
    }
  }
}
