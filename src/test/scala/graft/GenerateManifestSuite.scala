package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.commands.GenerateCommand
import graft.tables.GraftTable

/** symlink_format_manifest export: external engines read EXACTLY the live
  * snapshot through the manifests, and every state they would
  * misinterpret refuses loudly. */
class GenerateManifestSuite extends GraftFunSuite {
  import spark.implicits._

  private def manifestFiles(dir: String): Seq[String] = {
    val root = Paths.get(dir, GenerateCommand.MANIFEST_DIR)
    if (!Files.isDirectory(root)) return Nil
    Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString == "manifest")
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq
  }

  test("partitioned export: one manifest per range partition, an external " +
      "parquet read over the listed files equals the graft read") {
    withTempTable { dir =>
      (1L to 60L).map(i => (i, s"p${i % 3}", i * 2))
        .toDF("id", "part", "v").write.format("graft")
        .option("rangePartitions", "part").save(dir)
      val n = GraftTable.forPath(spark, dir).generateManifest()
      assert(n == 3, s"expected one manifest per partition, wrote $n")
      val listed = manifestFiles(dir)
      assert(listed.nonEmpty && listed.forall(_.startsWith("file://")))
      // the external-engine view: plain parquet over the listed files
      // (partition values live in the directory layout, so compare the
      // non-partition columns)
      val external = spark.read.parquet(
        listed.map(_.stripPrefix("file://")): _*)
      assertSameRows(
        external.select("id", "v"),
        spark.read.format("graft").load(dir).select("id", "v"))

      // regeneration replaces: delete a partition, re-generate, the old
      // partition's manifest is gone
      GraftTable.forPath(spark, dir).deleteExpr("part = 'p0'")
      // tombstones never appear on non-PK range tables — this delete is a
      // metadata-only partition drop, so generate must succeed
      val n2 = GraftTable.forPath(spark, dir).generateManifest()
      assert(n2 == 2, s"regenerate wrote $n2")
      val external2 = spark.read.parquet(
        manifestFiles(dir).map(_.stripPrefix("file://")): _*)
      // partition values live in the directory layout, not the files: the
      // dropped partition's absence shows as the row-count delta
      assert(external2.count() == 40, s"external rows ${external2.count()}")
    }
  }

  test("merge-on-read state refuses: delta stacks, then DVs; compaction " +
      "unlocks both") {
    withTempTable { dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, "A2")).toDF("id", "v"))
      val e = intercept[IllegalArgumentException] { t.generateManifest() }
      assert(e.getMessage.contains("delta"), e.getMessage)
      t.compaction(force = true)
      assert(GraftTable.forPath(spark, dir).generateManifest() >= 1)
      val external = spark.read.parquet(
        manifestFiles(dir).map(_.stripPrefix("file://")): _*)
      assert(external.as[(Long, String)].collect().toMap ==
        Map(1L -> "A2", 2L -> "b"))
    }
    withTempTable { dir =>
      (1L to 40L).map(i => (i, i)).toDF("id", "v").write.format("graft")
        .save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.delete(col("id") === 5L) // non-PK data predicate → deletion vector
      val e = intercept[IllegalArgumentException] { t.generateManifest() }
      assert(e.getMessage.toLowerCase.contains("deletion vector"),
        e.getMessage)
      t.compaction(force = true)
      assert(GraftTable.forPath(spark, dir).generateManifest() >= 1)
      val external = spark.read.parquet(
        manifestFiles(dir).map(_.stripPrefix("file://")): _*)
      assert(external.count() == 39)
    }
  }

  test("hostile partition values escape into flat directory names: no " +
      "traversal, no nesting, external read intact") {
    withTempTable { dir =>
      Seq((1L, "a/b", 1L), (2L, "..", 2L), (3L, "x=y", 3L), (4L, "ok", 4L))
        .toDF("id", "part", "v").write.format("graft")
        .option("rangePartitions", "part").save(dir)
      val n = GraftTable.forPath(spark, dir).generateManifest()
      assert(n == 4)
      val root = Paths.get(dir, GenerateCommand.MANIFEST_DIR)
      // every manifest sits exactly ONE level below the root: a raw '/'
      // or '..' value would nest or escape
      val dirs = Files.list(root).iterator().asScala.toSeq
      assert(dirs.size == 4, dirs.map(_.getFileName))
      dirs.foreach { d =>
        assert(Files.isRegularFile(d.resolve("manifest")),
          s"expected $d/manifest")
        assert(d.toAbsolutePath.normalize.startsWith(
          root.toAbsolutePath.normalize))
      }
      val external = spark.read.parquet(
        manifestFiles(dir).map(_.stripPrefix("file://")): _*)
      assert(external.count() == 4)
    }
  }

  test("continuous manifest maintenance follows appends via the CDF tail") {
    withTempTable { dir =>
      Seq((1L, "a")).toDF("id", "v").write.format("graft").save(dir)
      GraftTable.forPath(spark, dir).generateManifest()
      val ckpt = java.nio.file.Files
        .createTempDirectory("gen_ck_").toString
      val q = GenerateCommand.maintainStream(spark, dir, ckpt)
      try {
        Seq((2L, "b"), (3L, "c")).toDF("id", "v")
          .write.format("graft").mode("append").save(dir)
        q.processAllAvailable()
        val external = spark.read.parquet(
          manifestFiles(dir).map(_.stripPrefix("file://")): _*)
        assert(external.count() == 3,
          "manifest must follow the append without a manual generate")
      } finally q.stop()
    }
  }

  test("CALL system.generate; vacuum leaves manifests alone") {
    withTempTable { dir =>
      Seq((1L, "x")).toDF("id", "v").write.format("graft").save(dir)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog",
        "graft.catalog.GraftCatalog")
      val row = s2.sql(
        s"CALL spark_catalog.system.generate(table => '$dir')")
        .collect().head
      assert(row.getLong(1) >= 1)
      spark.conf.set("spark.graft.cleanup.retentionCheck.enabled", "false")
      try GraftTable.forPath(spark, dir).cleanup(retainMillis = 0L)
      finally spark.conf
        .unset("spark.graft.cleanup.retentionCheck.enabled")
      assert(manifestFiles(dir).nonEmpty,
        "vacuum must not reclaim manifest files")
    }
  }
}
