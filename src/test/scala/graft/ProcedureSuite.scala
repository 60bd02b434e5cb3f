package graft

import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** SQL `CALL` maintenance procedures (ProcedureCatalog on GraftCatalog). */
class ProcedureSuite extends GraftFunSuite {
  import spark.implicits._

  private def sqlSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
    s2
  }

  /** Files the scan PLANNED tasks for (manifest skipping probe). */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    val scan = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
      .queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.getOrElse(fail("no BatchScanExec leaf"))
    scan.inputPartitions.map {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.length.toLong
      case _ => 1L
    }.sum
  }

  /** Clustering probe robust to sampled range-boundary jitter: a z-ordered
    * layout must let the corner filter plan at most half the files (a
    * min/max width check would flake — a sampled boundary landing inside a
    * z-quadrant widens that one file's range to the full domain). */
  private def assertClustered(dir: String, label: String): Unit = {
    val files = GraftTable.forPath(spark, dir).snapshot.files
    assert(files.length >= 4, s"$label: expected multi-file layout, got ${files.length}")
    val q = spark.read.format("graft").load(dir).filter(col("a") < 8 && col("b") < 8)
    assert(q.count() > 0, s"$label: corner region empty")
    val planned = plannedFiles(q)
    assert(planned <= files.length / 2,
      s"$label: clustering not applied — corner filter planned " +
      s"$planned of ${files.length} files")
  }

  test("CALL system.compact merges a delta stack and reports the version") {
    withTempTable { dir =>
      Seq((1L, 1), (2L, 2)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 9)).toDF("id", "v"))
      assert(t.snapshot.hasDeltaFiles)
      val s2 = sqlSession
      val out = s2.sql(s"CALL spark_catalog.system.compact('$dir')").collect()
      assert(out.length == 1 && out.head.getLong(1) ==
        GraftTable.forPath(spark, dir).snapshot.version)
      assert(!GraftTable.forPath(spark, dir).snapshot.hasDeltaFiles)
      assert(spark.read.format("graft").load(dir)
        .filter($"id" === 1L).select("v").as[Int].head() == 9)
    }
  }

  test("CALL system.zorder clusters and named arguments work") {
    withTempTable { dir =>
      (1L to 1000L).toDF("a").withColumn("b", col("a") % 37)
        .repartition(4).write.format("graft").save(dir)
      val s2 = sqlSession
      s2.sql(s"CALL spark_catalog.system.zorder(table => '$dir', " +
        "columns => 'a,b')").collect()
      val files = GraftTable.forPath(spark, dir).snapshot.files
      assert(files.forall(_.isBase))
      assert(spark.read.format("graft").load(dir).count() == 1000)
    }
  }

  test("CALL system.vacuum dry_run lists unreferenced files, then deletes") {
    withTempTable { dir =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 2)).toDF("id", "v"))
      t.compaction() // leaves pre-compaction files unreferenced
      val s2 = sqlSession
      s2.conf.set("spark.graft.cleanup.retentionCheck.enabled", "false")
      val dry = s2.sql(s"CALL spark_catalog.system.vacuum('$dir', " +
        "retain_hours => 0.0, dry_run => true)").collect()
      assert(dry.nonEmpty, "dry run should list reclaimable files")
      val real = s2.sql(s"CALL spark_catalog.system.vacuum('$dir', " +
        "retain_hours => 0.0, dry_run => false)").collect()
      assert(real.map(_.getString(0)).toSet == dry.map(_.getString(0)).toSet)
      // table still reads fine after vacuum
      assert(spark.read.format("graft").load(dir).count() == 1)
    }
  }

  test("declared graft.zOrderBy: plain compact keeps the clustered layout") {
    val s2 = sqlSession
    withTempTable { dir =>
      s2.sql(s"CREATE TABLE zdecl (a BIGINT, b BIGINT) USING graft " +
        s"LOCATION '$dir' TBLPROPERTIES ('graft.zOrderBy'='a,b')")
      try {
        val rnd = new scala.util.Random(11)
        val rows = (0 until 2000).map(_ => (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
        import s2.implicits._
        rows.toDF("a", "b").repartition(4).write.format("graft")
          .mode("append").save(dir)
        // PLAIN compact (no zorder args): the declared clustering applies
        s2.conf.set("spark.graft.compaction.targetFileBytes", "2048")
        s2.sql(s"CALL spark_catalog.system.compact('$dir')").collect()
        assertClustered(dir, "declared-zOrderBy plain compact")
        assert(spark.read.format("graft").load(dir).count() == 2000)
      } finally s2.sql("DROP TABLE IF EXISTS zdecl")
    }
  }

  test("clusterBy is recorded in the log: declaring zOrderBy AFTER a " +
      "bin-pack still clusters exactly once") {
    val s2 = sqlSession
    withTempTable { dir =>
      import s2.implicits._
      s2.sql(s"CREATE TABLE zlate (a BIGINT, b BIGINT) USING graft " +
        s"LOCATION '$dir'") // no clustering declared yet
      try {
        val rnd = new scala.util.Random(23)
        (0 until 2000).map(_ => (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
          .toDF("a", "b").repartition(4).write.format("graft")
          .mode("append").save(dir)
        s2.conf.set("spark.graft.compaction.targetFileBytes", "2048")
        // plain bin-pack: records clusterBy = [] in its CommitInfo
        s2.sql(s"CALL spark_catalog.system.compact('$dir')").collect()
        // declare the clustering AFTER that compaction; commit-type
        // inference would treat the partition as already clustered and
        // never apply it — the recorded-columns comparison must rewrite it
        s2.sql(s"ALTER TABLE zlate SET TBLPROPERTIES ('graft.zOrderBy'='a,b')")
        s2.sql(s"CALL spark_catalog.system.compact('$dir')").collect()
        assertClustered(dir, "late-declared zOrderBy")
        // and the clustered layout is idempotent: a further plain compact
        // commits nothing
        val v = GraftTable.forPath(spark, dir).snapshot.version
        s2.sql(s"CALL spark_catalog.system.compact('$dir')").collect()
        assert(GraftTable.forPath(spark, dir).snapshot.version == v,
          "clustered partition was rewritten again")
      } finally s2.sql("DROP TABLE IF EXISTS zlate")
    }
  }

  test("declared clustering is idempotent and never breaks implicit paths") {
    val s2 = sqlSession
    withTempTable { dir =>
      import s2.implicits._
      s2.sql(s"CREATE TABLE zidem (a BIGINT, b BIGINT) USING graft " +
        s"LOCATION '$dir' TBLPROPERTIES ('graft.zOrderBy'='a,b')")
      try {
        (1L to 500L).map(i => (i % 64, i / 64)).toDF("a", "b")
          .repartition(3).write.format("graft").mode("append").save(dir)
        s2.conf.set("spark.graft.compaction.targetFileBytes", "2048")
        s2.sql(s"CALL spark_catalog.system.compact('$dir')").collect()
        val v1 = GraftTable.forPath(spark, dir).snapshot.version
        // second compact with no new data: already clustered -> NO rewrite
        s2.sql(s"CALL spark_catalog.system.compact('$dir')").collect()
        assert(GraftTable.forPath(spark, dir).snapshot.version == v1,
          "declared-clustering compact must be idempotent")
      } finally s2.sql("DROP TABLE IF EXISTS zidem")
    }
    // a BOGUS declared property on a PK table is ignored with a warning —
    // upserts (auto-compaction) and compaction keep working
    withTempTable { dir =>
      import spark.implicits._
      Seq((1L, 1)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val snap = GraftTable.forPath(spark, dir).snapshot
      // plant the invalid property directly (simulates a pre-validation log)
      graft.meta.SnapshotManagement.withNewTransaction(dir) { txn =>
        txn.commit("alter", Some(snap.tableInfo.copy(configuration =
          snap.tableInfo.configuration + ("graft.zOrderBy" -> "v"))), Nil, Nil)
      }
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 2)).toDF("id", "v"))
      t.compaction() // must not throw
      assert(rowsOf(t.toDF) == Seq(Seq(1L, 2)))
    }
  }

  test("CALL create_mv/refresh_mv/drop_mv: full MV lifecycle through SQL") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      val s2 = sqlSession
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "g", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      s2.sql(s"CALL spark_catalog.system.create_mv('$viewDir', " +
        s"'SELECT g, count(1) AS cnt, count(v) AS cv, sum(v) AS sv " +
        s"FROM graft.`$dir` GROUP BY g')").collect()
      assert(spark.read.format("graft").load(viewDir).count() == 2)

      // CDC window, then SQL refresh: must land the incremental fold
      GraftTable.forPath(spark, dir)
        .upsert(Seq((3L, "c", 30L)).toDF("id", "g", "v"))
      val before = graft.mv.MaterializedViews.incrementalRefreshes.get()
      s2.sql(s"CALL spark_catalog.system.refresh_mv('$viewDir')").collect()
      assert(graft.mv.MaterializedViews.incrementalRefreshes.get()
        == before + 1, "SQL refresh must take the fold path")
      assert(rowsOf(spark.read.format("graft").load(viewDir))
        .contains(Seq("c", 1L, 1L, 30L)))

      s2.sql(s"CALL spark_catalog.system.drop_mv('$viewDir')").collect()
      assert(!graft.meta.SnapshotManagement.exists(viewDir))
      // drop_mv on a non-view path refuses (swapped-argument guard)
      val e = intercept[Exception] {
        s2.sql(s"CALL spark_catalog.system.drop_mv('$dir')").collect()
      }
      assert(e.getMessage.contains("materialized view"), e.getMessage)
      assert(spark.read.format("graft").load(dir).count() == 3,
        "the base table must survive the refused drop")
    }
  }

  test("CALL system.apply_changes lands a CDC batch from a view or " +
      "inline SQL") {
    withTempTable { dir =>
      import spark.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      val s2 = sqlSession
      Seq((1L, "a2", "u", 2L), (1L, "a1", "u", 1L), (2L, null, "d", 1L),
        (3L, "c", "u", 1L))
        .toDF("id", "v", "op", "seq")
        .createOrReplaceGlobalTempView("proc_changes")
      s2.sql(s"CALL spark_catalog.system.apply_changes(" +
        s"table => '$dir', source => 'global_temp.proc_changes', " +
        "op => 'op', sequence => 'seq')").collect()
      assert(spark.read.format("graft").load(dir)
        .as[(Long, String)].collect().toMap ==
        Map(1L -> "a2", 3L -> "c"))
      // inline SQL source form — including a COMPOUND parenthesized query
      // (the source must reach the parser whole, not paren-stripped)
      s2.sql(s"CALL spark_catalog.system.apply_changes(" +
        s"table => '$dir', " +
        "source => '(SELECT 9L AS id, ''z'' AS v, ''u'' AS op) " +
        "UNION ALL (SELECT 10L, ''y'', ''u'')', " +
        "op => 'op')").collect()
      assert(spark.read.format("graft").load(dir)
        .filter($"id" >= 9L).count() == 2)
    }
  }

  test("CALL system.replication_status reports lag through SQL") {
    withTempTable { src => withTempTable { scratch =>
      val dest = scratch + "/replica"
      (1L to 10L).map(i => (i, i)).toDF("id", "n").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(src)
      val t = GraftTable.forPath(spark, src)
      t.cloneTo(dest)
      val s2 = sqlSession
      val fresh = s2.sql(
        s"CALL spark_catalog.system.replication_status('$dest')").collect()
      assert(fresh.head.getAs[Boolean]("in_sync"))
      t.upsert(Seq((1L, 100L)).toDF("id", "n"))
      val behind = s2.sql(
        s"CALL spark_catalog.system.replication_status('$dest')").collect()
      assert(!behind.head.getAs[Boolean]("in_sync") &&
        behind.head.getAs[Long]("pending_versions") == 1L)
    } }
  }

  test("CALL system.ann_rebuild_if_due pays the churn debt and swaps the " +
      "generation") {
    withTempTable { corpusDir =>
      val rndv = new scala.util.Random(67)
      def vec() = Array.fill(6)(rndv.nextFloat() * 2 - 1)
      (0 until 30).map(i => (i.toLong, vec())).toDF("vec_id", "embedding")
        .write.format("graft")
        .option("hashPartitions", "vec_id").option("hashBucketNum", "2")
        .save(corpusDir)
      val idx = java.nio.file.Files
        .createTempDirectory("ann_proc_").toString + "/ix"
      graft.llm.AnnIndex.syncFromTable(spark, idx, corpusDir,
        "vec_id", "embedding", nCentroids = 4)
      val s2 = sqlSession
      // no debt: the procedure is a no-op and says so
      val idle = s2.sql(s"CALL spark_catalog.system.ann_rebuild_if_due(" +
        s"'$idx', '$corpusDir', 'vec_id', 'embedding', 4, 2)").collect()
      assert(!idle.head.getAs[Boolean]("rebuilt"))
      // mark the debt through a sync, then pay it through SQL
      spark.conf.set("spark.graft.ann.index.rebuildChurnFraction", "0.01")
      try {
        GraftTable.forPath(spark, corpusDir)
          .upsert(Seq((1L, vec())).toDF("vec_id", "embedding"))
        graft.llm.AnnIndex.syncFromTable(spark, idx, corpusDir,
          "vec_id", "embedding", nCentroids = 4)
        assert(graft.llm.AnnIndex.rebuildDue(idx))
        val out = s2.sql(s"CALL spark_catalog.system.ann_rebuild_if_due(" +
          s"'$idx', '$corpusDir', 'vec_id', 'embedding', 4, 2)").collect()
        assert(out.head.getAs[Boolean]("rebuilt"))
        assert(out.head.getAs[String]("generation").endsWith("gen-1"))
        assert(!graft.llm.AnnIndex.rebuildDue(idx))
      } finally spark.conf.unset("spark.graft.ann.index.rebuildChurnFraction")
    }
  }

  test("unknown procedure fails loudly; procedures are listable") {
    val s2 = sqlSession
    val e = intercept[Exception] {
      s2.sql("CALL spark_catalog.system.nope('/x')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("failed_to_load_routine") ||
      e.getMessage.toLowerCase.contains("procedure"))
  }
}
