package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.meta.{GraftConcurrentModificationException, SnapshotManagement}
import graft.tables.GraftTable

/** Regressions for the transactional-core review findings: replaceWhere
  * NULL rows, URL-encoded file attribution, create races, merge-mode case
  * sensitivity, bin-pack blocking, dotted z-order columns, and corrupt-
  * checkpoint fallback. */
class CoreHardeningSuite extends GraftFunSuite {
  import spark.implicits._

  test("replaceWhere rejects rows whose predicate evaluates to NULL") {
    withTempTable { dir =>
      Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("date", "v")
        .write.format("graft").option("rangePartitions", "date").save(dir)
      // a NULL date neither satisfies nor violates `date = ...` under
      // three-valued logic — it must be REJECTED, not silently written
      // into a partition the commit does not replace
      val e = intercept[Exception] {
        Seq((Some("2024-01-01"), 10), (None, 99))
          .toDF("date", "v")
          .write.format("graft").mode("overwrite")
          .option("replaceWhere", "date = '2024-01-01'").save(dir)
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
      assert(msgs(e).contains("does not satisfy"),
        s"NULL-predicate row must fail the containment check: ${msgs(e).take(400)}")
      // table untouched by the failed write
      assert(spark.read.format("graft").load(dir).count() == 2)
    }
  }

  test("DML file attribution survives partition values that URL-encode") {
    // partition value with a space: input_file_name()/_metadata.file_path
    // return "p=New%20York"; the manifest records "p=New York" — both the
    // DV path and the rewrite (case-3) path must still find the files
    for (dvEnabled <- Seq("true", "false")) {
      withSQLConf("spark.graft.dv.enabled" -> dvEnabled) {
        withTempTable { dir =>
          Seq((1L, "New York", "a"), (2L, "New York", "b"), (3L, "Boston", "c"))
            .toDF("id", "city", "v")
            .write.format("graft").option("rangePartitions", "city").save(dir)
          val t = GraftTable.forPath(spark, dir)
          // data-predicate delete: must locate the row's file despite the
          // encoded metadata path (silent no-op before the decode fix)
          t.delete(expr("v = 'a'"))
          val left = t.toDF.select("id").as[Long].collect().sorted.toSeq
          assert(left == Seq(2L, 3L),
            s"dv=$dvEnabled: delete silently missed the encoded partition: $left")
          // mixed partition+data predicate exercises the DV join branch
          t.delete(expr("city = 'New York' AND v = 'b'"))
          assert(t.toDF.select("id").as[Long].collect().toSeq == Seq(3L))
        }
      }
    }
  }

  test("losing the create race conflicts instead of committing a second table") {
    withTempTable { dir =>
      val path = SnapshotManagement.normalize(dir)
      SnapshotManagement.withNewTransaction(path) { txn =>
        assert(txn.snapshotOpt.isEmpty)
        // another writer creates the table while our create is staged
        Seq((1L, "winner")).toDF("id", "v").write.format("graft").save(dir)
        val info = graft.meta.TableInfo(path,
          schemaJson = Seq((9L, "loser")).toDF("id", "v").schema.json)
        val files = graft.write.TransactionalWrite.writeFiles(
          spark, path, info, Seq((9L, "loser")).toDF("id", "v"), isBase = true)
        intercept[GraftConcurrentModificationException] {
          txn.commit("append", Some(info), files, Nil, expectVersion = 0L)
        }
      }
      // the winner's table is intact and alone
      val t = GraftTable.forPath(spark, dir)
      assert(t.snapshot.version == 0)
      assert(t.toDF.select("v").as[String].collect().toSeq == Seq("winner"))
    }
  }

  test("two racing first writes: exactly one creates, the loser re-dispatches") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    withTempTable { dir =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val results = (1 to 2).map { w =>
        Future {
          try {
            Seq((w.toLong, s"w$w")).toDF("id", "v")
              .write.format("graft").mode("errorifexists").save(dir)
            "ok"
          } catch { case e: Exception => s"err:${e.getMessage}" }
        }
      }
      val got = Await.result(Future.sequence(results), 120.seconds)
      pool.shutdown()
      val oks = got.count(_ == "ok")
      // ErrorIfExists: exactly one may create; the loser must surface the
      // already-exists error, never union its files into the table
      assert(oks == 1, s"exactly one create must win, got $got")
      assert(got.exists(_.contains("already exists")), s"loser result: $got")
      val rows = spark.read.format("graft").load(dir)
        .select("v").as[String].collect().toSeq
      assert(rows.length == 1 && rows.head.startsWith("w"),
        s"table must hold exactly the winner's data: $rows")
    }
  }

  test("merge-mode upsert matches source columns case-insensitively") {
    withTempTable { dir =>
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "val", "n")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // source says `Val` where the table says `val`: the update must land
      // (not silently keep the old value) and the schema must NOT grow a
      // duplicate-modulo-case column
      t.upsert(Seq((1L, "A")).toDF("id", "Val"), mode = "merge")
      val out = t.toDF
      assert(out.columns.count(_.equalsIgnoreCase("val")) == 1,
        s"duplicate-modulo-case column: ${out.columns.mkString(",")}")
      assert(out.filter($"id" === 1L).select("val").as[String].head() == "A")
      assert(out.filter($"id" === 2L).select("val").as[String].head() == "b")
    }
  }

  test("one large file does not block bin-packing its small neighbors") {
    withSQLConf("spark.graft.compaction.smallFileBytes" -> "1048576") {
      withTempTable { dir =>
        // 4 small files (well under 1 MB each) + the threshold set so all
        // are "small": first verify the baseline packs. Then plant a large
        // file by lowering the threshold below every file's size except
        // none — instead simulate: threshold low so ALL files are "large"
        // except the appended small ones.
        (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
          .coalesce(1).write.format("graft").save(dir)
        withSQLConf("spark.graft.compaction.smallFileBytes" -> "10000") {
          // the base file (> 10 KB) is now "large"; append small files
          (1 to 4).foreach { i =>
            Seq((10000L + i, "s")).toDF("id", "v")
              .coalesce(1).write.format("graft").mode("append").save(dir)
          }
          val t = GraftTable.forPath(spark, dir)
          val before = t.snapshot.files.length
          assert(before == 5, s"expected 1 large + 4 small files, got $before")
          t.compaction()
          val after = GraftTable.forPath(spark, dir).snapshot.files
          // the 4 small files packed into 1; the large file stayed put
          assert(after.length == 2,
            s"small files must pack next to a large one: ${after.map(_.size)}")
          assert(t.toDF.count() == 2004)
        }
      }
    }
  }

  test("zOrder works on a column literally named a.b") {
    withTempTable { dir =>
      (1 to 100).map(i => (i.toLong, (i * 7 % 100).toLong, s"r$i"))
        .toDF("id", "a.b", "v")
        .write.format("graft").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.zOrder(Seq("a.b")) // resolved as ONE column, not a struct path
      assert(t.toDF.count() == 100)
      assert(t.toDF.filter(col("`a.b`") === 7L).count() == 1)
    }
  }

  test("pushed string filters treat % and _ as literals, not wildcards") {
    import org.apache.spark.sql.sources._
    // LIKE would read the user's '100%' as prefix '100' + wildcard
    assert(graft.sources.FilterSql.toSql(StringStartsWith("c", "100%")) ==
      "startswith(`c`, '100%')")
    val df = Seq("100%", "1000", "100abc").toDF("c")
    val kept = df.filter(expr(
        graft.sources.FilterSql.toSql(StringStartsWith("c", "100%"))))
      .as[String].collect().toSeq
    assert(kept == Seq("100%"), s"wildcard leak: $kept")
    assert(graft.sources.FilterSql.toSql(StringContains("c", "a_b")) ==
      "contains(`c`, 'a_b')")
  }

  test("pushed timestamp filters are timezone-proof (absolute instants)") {
    import org.apache.spark.sql.sources._
    // the rendering must carry the INSTANT, not a wall-clock string that
    // re-parses in the session timezone
    val inst = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val sql = graft.sources.FilterSql.toSql(EqualTo("ts", inst))
    assert(sql == s"`ts` = timestamp_micros(${inst.getEpochSecond * 1000000L})")
    val df = Seq(java.sql.Timestamp.from(inst),
      java.sql.Timestamp.from(inst.plusSeconds(3600))).toDF("ts")
    assert(df.filter(expr(sql)).count() == 1)
  }

  test("metadata-only aggregate refuses a Project alias shadowing a column") {
    withTempTable { dir =>
      (1 to 10).map(i => (i.toLong, i * 100L)).toDF("id", "b")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mshadow")
      // inner projection REDEFINES b; answering max(b) from the manifest
      // stats of the real column would return 1000 instead of 0
      val got = spark.sql(
        "SELECT max(b) AS m FROM (SELECT id * 0 AS b FROM mshadow)")
        .as[Long].head()
      assert(got == 0L, s"stats answered a shadowed alias: $got")
      // the genuine metadata path still fires for the real column
      assert(spark.sql("SELECT max(b) FROM mshadow").as[Long].head() == 1000L)
    }
  }

  test("merge-op marker on a non-graft join column fails instead of folding " +
      "the graft side's same-named column") {
    withTempTable { dir =>
      Seq((1L, 10L)).toDF("id", "x").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mg")
      Seq((1L, 7L)).toDF("id", "x").createOrReplaceTempView("mo_other")
      val e = intercept[Exception] {
        spark.sql("""SELECT graft_merge_op_sum(o.x) AS s
          FROM mg g JOIN mo_other o ON g.id = o.id""").collect()
      }
      assert(e.getMessage.contains("graft primary-key table"),
        s"marker on the other side must fail loudly: ${e.getMessage}")
      // the graft side's own column still takes the operator in a join
      val ok = spark.sql("""SELECT graft_merge_op_sum(g.x) AS s
        FROM mg g JOIN mo_other o ON g.id = o.id""").as[Long].head()
      assert(ok == 10L)
    }
  }

  test("catalog CREATE normalizes and validates hashPartitions case") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS ghard1")
      // off-case 'ID' must normalize to the schema's 'id', not commit a
      // layout the case-sensitive write path can never satisfy
      s2.sql(s"CREATE TABLE ghard1 (id BIGINT, v STRING) USING graft " +
        s"LOCATION '$dir/t1' " +
        "TBLPROPERTIES('hashPartitions'='ID','hashBucketNum'='2')")
      try {
        val t = GraftTable.forPath(spark, s"$dir/t1")
        assert(t.snapshot.tableInfo.hashColumns == Seq("id"),
          s"layout must carry the schema spelling: ${t.snapshot.tableInfo.hashColumns}")
        s2.sql("INSERT INTO ghard1 VALUES (1, 'a')")
        assert(s2.sql("SELECT count(*) FROM ghard1").head().getLong(0) == 1)
      } finally s2.sql("DROP TABLE IF EXISTS ghard1")
      // a typo'd column fails at CREATE, not at first INSERT
      val e = intercept[Exception] {
        s2.sql(s"CREATE TABLE ghard2 (id BIGINT, v STRING) USING graft " +
          s"LOCATION '$dir/t2' " +
          "TBLPROPERTIES('hashPartitions'='idd','hashBucketNum'='2')")
      }
      assert(e.getMessage.contains("not found in table schema"),
        s"typo'd key column must fail at CREATE: ${e.getMessage}")
    }
  }

  test("MERGE evolution rejects a typo'd qualifier instead of creating " +
      "the column") {
    withTempTable { dir =>
      Seq((1L, "a")).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      Seq((1L, 9)).toDF("id", "n").createOrReplaceTempView("mq_src")
      val e = intercept[Exception] {
        spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` t
          USING mq_src s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET tt.newcol = s.n""")
      }
      assert(e.getMessage.contains("neither a target column"),
        s"typo'd qualifier must fail analysis: ${e.getMessage}")
      // the honest alias-qualified form still evolves
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` t
        USING mq_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET t.newcol = s.n""")
      assert(spark.read.format("graft").load(dir)
        .select("newcol").as[Int].head() == 9)
    }
  }

  test("graft_table_changes with a typed NULL version argument errors " +
      "cleanly") {
    withTempTable { dir =>
      Seq((1L, "a")).toDF("id", "v").write.format("graft").save(dir)
      val e = intercept[Exception] {
        spark.sql(
          s"SELECT * FROM graft_table_changes('$dir', CAST(NULL AS INT))")
          .collect()
      }
      assert(e.getMessage.contains("integer literal"),
        s"typed NULL must get the friendly error, not an NPE: ${e.getMessage}")
    }
  }

  test("concurrent mergeSchema appends keep BOTH writers' new columns") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    withTempTable { dir =>
      Seq((1L, "base")).toDF("id", "v").write.format("graft").save(dir)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // both writers evolve the schema from the same starting snapshot;
      // without the metadata conflict guard the last TableInfo wins and
      // the other writer's column silently vanishes from the schema
      val fx = Future {
        Seq((2L, "a", 10)).toDF("id", "v", "x").write.format("graft")
          .mode("append").option("mergeSchema", "true").save(dir)
      }
      val fy = Future {
        Seq((3L, "b", 20L)).toDF("id", "v", "y").write.format("graft")
          .mode("append").option("mergeSchema", "true").save(dir)
      }
      Await.result(Future.sequence(Seq(fx, fy)), 120.seconds)
      pool.shutdown()
      val cols = spark.read.format("graft").load(dir).columns.toSet
      assert(cols == Set("id", "v", "x", "y"),
        s"a concurrent evolution dropped a column: $cols")
      assert(spark.read.format("graft").load(dir).count() == 3)
    }
  }

  test("a metadata-changing commit conflicts when the table info moved") {
    withTempTable { dir =>
      Seq((1L, "a")).toDF("id", "v").write.format("graft").save(dir)
      val path = SnapshotManagement.normalize(dir)
      SnapshotManagement.withNewTransaction(path) { txn =>
        val pinnedInfo = txn.snapshotOpt.get.tableInfo
        // a concurrent writer evolves the schema while ours is staged
        Seq((2L, "b", 1)).toDF("id", "v", "w").write.format("graft")
          .mode("append").option("mergeSchema", "true").save(dir)
        val mine = pinnedInfo.copy(schemaJson =
          Seq((9L, "x", 0.5)).toDF("id", "v", "z").schema.json)
        val files = graft.write.TransactionalWrite.writeFiles(
          spark, path, mine, Seq((9L, "x", 0.5)).toDF("id", "v", "z"),
          isBase = true)
        intercept[GraftConcurrentModificationException] {
          txn.commit("append", Some(mine), files, Nil)
        }
      }
    }
  }

  test("object-store log round-trips a scheme'd table path") {
    val store = new graft.meta.ObjectStoreMetaStore(
      new graft.meta.InMemoryObjectStoreClient)
    val path = "s3a://bucket/warehouse/tbl"
    assert(store.latestVersion(path) == -1L)
    // the double slash in the scheme must not wedge list/latestVersion
    assert(store.commit(path, 0L, Seq(graft.meta.LogEntry(
      commit = Some(graft.meta.CommitInfo("create", 1L))))))
    assert(store.latestVersion(path) == 0L,
      "scheme'd path never round-tripped through list()")
    assert(store.read(path, 0L).flatMap(_.commit)
      .exists(_.commitType == "create"))
  }

  test("positional INSERT with an extra column colliding with a table " +
      "column fails cleanly") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gcollide")
      s2.sql(s"CREATE TABLE gcollide (a BIGINT, b STRING) USING graft " +
        s"LOCATION '$dir/t'")
      try {
        val e = intercept[Exception] {
          s2.sql("INSERT INTO gcollide SELECT 1L, 'x', 2L AS a")
        }
        def msgs(t: Throwable): String =
          if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
        assert(msgs(e).contains("collide") || msgs(e).contains("column"),
          s"collision must fail with a clear error: ${msgs(e).take(300)}")
      } finally s2.sql("DROP TABLE IF EXISTS gcollide")
    }
  }

  test("queries with current_date() survive a registered materialized view") {
    withTempTable { base => withTempTable { view =>
      Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("dt", "v")
        .write.format("graft").save(base)
      spark.sql(s"CREATE TABLE mvcur_base USING graft LOCATION '$base'")
      try {
        graft.tables.GraftTable.createMaterialView(spark, "", view,
          "SELECT dt, v FROM mvcur_base WHERE v > 0")
        // the rewrite rule runs at RESOLUTION time, before the optimizer
        // folds current_date(); its containment probe must skip such
        // predicates, not crash the whole query's analysis
        val got = spark.sql(
          "SELECT count(*) FROM mvcur_base WHERE dt >= current_date()")
          .head().getLong(0)
        assert(got == 0L) // test dates are in the past
        assert(spark.sql(
          "SELECT count(*) FROM mvcur_base WHERE dt <= current_timestamp()")
          .head().getLong(0) == 2L)
      } finally spark.sql("DROP TABLE IF EXISTS mvcur_base")
    } }
  }

  test("CHECK constraints and NOT NULL bind case-insensitively") {
    withTempTable { dir =>
      // constraint spelled with the wrong case must still fire
      Seq((1L, 5)).toDF("id", "v").write.format("graft")
        .option("graft.constraints.pos", "V > 0").save(dir)
      val e = intercept[Exception] {
        Seq((2L, -1)).toDF("id", "v").write.format("graft")
          .mode("append").save(dir)
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
      assert(msgs(e).contains("CHECK"),
        s"off-case constraint must still be enforced: ${msgs(e).take(300)}")
      assert(graft.tables.GraftTable.forPath(spark, dir).toDF.count() == 1)
    }
  }

  test("pushed pre-epoch timestamp filters keep fractional seconds") {
    import org.apache.spark.sql.sources._
    // long division truncates toward zero: -500 ms / 1000 * 1e6 = 0, plus
    // the 500 ms nano carry would render +0.5 s instead of -0.5 s
    val t = new java.sql.Timestamp(-500L) // 1969-12-31T23:59:59.5Z
    assert(t.getNanos == 500000000, "Timestamp normalization changed")
    val sql = graft.sources.FilterSql.toSql(EqualTo("ts", t))
    assert(sql == "`ts` = timestamp_micros(-500000)", sql)
    val df = Seq(
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(-500L)),
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(500L)))
      .toDF("ts")
    assert(df.filter(expr(sql)).count() == 1)
  }

  test("MV registry tolerates legacy un-encoded entries with % and +") {
    val cur = spark.conf.getOption(graft.mv.MaterializedViews.CONF_KEY)
    try {
      // a raw (never-encoded) path: '%of' is not valid percent-encoding
      // (URLDecoder would throw inside the analyzer rule, failing every
      // query) and '+' must NOT decode to a space
      spark.conf.set(graft.mv.MaterializedViews.CONF_KEY,
        "/data/50%off/x+y/view")
      assert(Seq(1, 2).toDF("n").count() == 2) // analyzer rule must survive
      // registering another view re-encodes the registry; the legacy entry
      // must round-trip verbatim (no '+'→space, no decode crash)
      graft.mv.MaterializedViews.register(spark, "/tmp/mv_legacy_other")
      val entries = spark.conf.get(graft.mv.MaterializedViews.CONF_KEY)
        .split(",").toSeq
      assert(entries.exists(e =>
        java.net.URLDecoder.decode(e, "UTF-8") == "/data/50%off/x+y/view"),
        entries.toString)
    } finally cur match {
      case Some(v) => spark.conf.set(graft.mv.MaterializedViews.CONF_KEY, v)
      case None => spark.conf.unset(graft.mv.MaterializedViews.CONF_KEY)
    }
  }

  test("MV registry survives a view path containing a comma") {
    withTempTable { base => withTempTable { root =>
      Seq((1L, 1)).toDF("id", "v").write.format("graft").save(base)
      spark.sql(s"CREATE TABLE mvcomma_base USING graft LOCATION '$base'")
      val commaPath = s"$root/a,b/view"
      try {
        graft.tables.GraftTable.createMaterialView(spark, "", commaPath,
          "SELECT id, v FROM mvcomma_base")
        // the comma must not split the registry into garbage entries
        val reg = spark.conf.get(graft.mv.MaterializedViews.CONF_KEY)
        assert(!reg.split(",").exists(_ == s"$root/a"),
          s"registry corrupted by comma path: $reg")
        // the view is findable: refresh() sees it as fresh (false = no-op)
        assert(!graft.mv.MaterializedViews.refresh(spark, commaPath))
        // and goes stale when the base advances
        Seq((2L, 2)).toDF("id", "v").write.format("graft")
          .mode("append").save(base)
        assert(graft.mv.MaterializedViews.refresh(spark, commaPath))
      } finally spark.sql("DROP TABLE IF EXISTS mvcomma_base")
    } }
  }

  test("a corrupt newest checkpoint falls back to the older retained one") {
    withTempTable { dir =>
      Seq((0L, 0)).toDF("id", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "1").save(dir)
      val t = GraftTable.forPath(spark, dir)
      // 21 commits -> checkpoints at v10 and v20 (interval 10, keep 2)
      (1 to 21).foreach(i => t.upsert(Seq((i.toLong, i)).toDF("id", "v")))
      val path = SnapshotManagement.normalize(dir)
      val newest = graft.meta.FsMetaStore.checkpointFile(path, 20)
      assert(Files.exists(newest), "expected a checkpoint at v20")
      // truncate it (crash mid-write shape), drop caches, re-read
      Files.write(newest, "{corrupt".getBytes,
        StandardOpenOption.TRUNCATE_EXISTING)
      SnapshotManagement.invalidate(path)
      val fresh = GraftTable.forPath(spark, dir)
      assert(fresh.toDF.count() == 22,
        "replay must survive a corrupt newest checkpoint")
      assert(fresh.snapshot.version == 21)
    }
  }
}
