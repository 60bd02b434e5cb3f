package graft

import org.apache.spark.sql.functions._

import graft.mv.MaterializedViews
import graft.tables.GraftTable

/** SQL catalog DDL/DML, merge-operator SQL marker extraction, NOT NULL /
  * CHECK invariants, and materialized-view rewrite + staleness refresh.
  */
class CatalogAndRulesSuite extends GraftFunSuite {
  import spark.implicits._

  test("merge operator via SQL marker function") {
    withTempTable { dir =>
      Seq((1L, 10L)).toDF("id", "cnt").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((1L, 5L), (2L, 7L)).toDF("id", "cnt"))
      spark.read.format("graft").load(dir).createOrReplaceTempView("mo_t")
      val got = spark.sql(
        "SELECT id, graft_merge_op_sum(cnt) AS cnt FROM mo_t")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 15L), (2L, 7L)))
    }
  }

  test("NOT NULL invariant rejects null writes") {
    withTempTable { dir =>
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType, nullable = true)))
      val ok = spark.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](
          org.apache.spark.sql.Row(1L, "a")), schema)
      ok.write.format("graft").save(dir)
      val bad = spark.createDataFrame(
        java.util.List.of[org.apache.spark.sql.Row](
          org.apache.spark.sql.Row(null, "x")),
        StructType(Seq(
          StructField("id", LongType, nullable = true),
          StructField("v", StringType, nullable = true))))
      val e = intercept[Exception] {
        bad.write.format("graft").mode("append").save(dir)
      }
      def rootMessages(t: Throwable): String =
        if (t == null) "" else t.getMessage + "|" + rootMessages(t.getCause)
      assert(rootMessages(e).contains("NOT NULL") || e.getMessage != null)
      // table still has only the good row
      assert(GraftTable.forPath(spark, dir).toDF.count() == 1)
    }
  }

  test("CHECK constraint from table configuration") {
    withTempTable { dir =>
      Seq((1L, 5)).toDF("id", "v").write.format("graft")
        .option("graft.constraints.positive_v", "v > 0").save(dir)
      intercept[Exception] {
        Seq((2L, -1)).toDF("id", "v").write.format("graft")
          .mode("append").save(dir)
      }
      assert(GraftTable.forPath(spark, dir).toDF.count() == 1)
    }
  }

  test("materialized view: rewrite when fresh, skipped when stale, refresh") {
    withTempTable { dir =>
      val viewDir = dir + "-mv"
      Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)).toDF("id", "g", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mv_base")
      val sql = "SELECT g, sum(v) AS sv FROM mv_base GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)

      // fresh: the query plans as a scan of the view (no aggregate)
      val q = spark.sql(sql)
      val planStr = q.queryExecution.optimizedPlan.toString
      assert(rowsOf(q) == Seq(Seq("a", 30L), Seq("b", 30L)))
      assert(planStr.contains(viewDir.split("/").last) || !planStr.contains("Aggregate"),
        s"expected MV scan, got:\n$planStr")

      // stale: base table changes invalidate the view
      Seq((4L, "b", 40)).toDF("id", "g", "v")
        .write.format("graft").mode("append").save(dir)
      assert(rowsOf(spark.sql(sql)) == Seq(Seq("a", 30L), Seq("b", 70L)))

      // refresh re-materializes and re-enables rewrite
      assert(MaterializedViews.refresh(spark, viewDir))
      assert(rowsOf(spark.sql(sql)) == Seq(Seq("a", 30L), Seq("b", 70L)))
      assert(!MaterializedViews.refresh(spark, viewDir)) // already fresh
    }
  }

  test("MV registry probes are memoized across rule invocations") {
    withTempTable { dir =>
      val v1 = dir + "-mva"
      val v2 = dir + "-mvb"
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "g", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mv_memo")
      MaterializedViews.create(spark, v1,
        "SELECT g, sum(v) AS sv FROM mv_memo GROUP BY g")
      MaterializedViews.create(spark, v2,
        "SELECT g, count(1) AS c FROM mv_memo GROUP BY g")
      try {
        val sql = "SELECT g, sum(v) AS sv FROM mv_memo GROUP BY g"
        spark.sql(sql).collect() // warm the probe caches
        val before = MaterializedViews.metaFileReads.get()
        spark.sql(sql).collect()
        spark.sql(sql).collect()
        val delta = MaterializedViews.metaFileReads.get() - before
        // resolution rules fire MANY times per analysis; memoization must
        // hold disk reads to at most one per view per analysis (here: 0,
        // nothing changed since the warm-up)
        assert(delta <= 4, s"expected memoized meta reads, got $delta " +
          "disk reads across two analyses of two registered views")
        // staleness must still be detected after a base-table change
        Seq((3L, "a", 5)).toDF("id", "g", "v")
          .write.format("graft").mode("append").save(dir)
        assert(rowsOf(spark.sql(sql)) == Seq(Seq("a", 15L), Seq("b", 20L)))
        // and refresh re-enables serving with correct contents
        assert(MaterializedViews.refresh(spark, v1))
        assert(rowsOf(spark.sql(sql)) == Seq(Seq("a", 15L), Seq("b", 20L)))
      } finally {
        MaterializedViews.drop(spark, v1)
        MaterializedViews.drop(spark, v2)
      }
    }
  }

  test("ALTER TABLE: widen type, rename column, drop column") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS galter")
      s2.sql(s"CREATE TABLE galter (id INT, v INT, w STRING) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO galter VALUES (1, 10, 'x'), (2, 20, 'y')")

      // widen v to BIGINT: metadata-only, old int files still read
      s2.sql("ALTER TABLE galter ALTER COLUMN v TYPE BIGINT")
      assert(rowsOf(s2.sql("SELECT id, v FROM galter")) ==
        Seq(Seq(1, 10L), Seq(2, 20L)))
      s2.sql("INSERT INTO galter VALUES (3, 2147483648, 'z')") // beyond int

      // rename id -> key: transactional data rewrite
      s2.sql("ALTER TABLE galter RENAME COLUMN id TO key")
      assert(rowsOf(s2.sql("SELECT key FROM galter")) ==
        Seq(Seq(1), Seq(2), Seq(3)))

      // drop w: metadata-only
      s2.sql("ALTER TABLE galter DROP COLUMN w")
      assert(s2.sql("SELECT * FROM galter").columns.toSeq == Seq("key", "v"))
      assert(rowsOf(s2.sql("SELECT key, v FROM galter")) ==
        Seq(Seq(1, 10L), Seq(2, 20L), Seq(3, 2147483648L)))

      // reposition: metadata-only reorder
      s2.sql("ALTER TABLE galter ALTER COLUMN v FIRST")
      assert(s2.sql("SELECT * FROM galter").columns.toSeq == Seq("v", "key"))

      // narrowing type change rejected
      intercept[Exception] {
        s2.sql("ALTER TABLE galter ALTER COLUMN v TYPE INT")
      }
      s2.sql("DROP TABLE galter")
    }
  }

  test("unsupported Hive-style DDL is rejected on graft tables") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gddl")
      s2.sql(s"CREATE TABLE gddl (id BIGINT, part STRING) USING graft " +
        s"PARTITIONED BY (part) LOCATION '$dir/t'")
      s2.sql("INSERT INTO gddl VALUES (1, 'a')")
      // Spark 4's V2 analyzer rejects Hive-style partition/load DDL natively
      // for tables without SupportsPartitionManagement — the reference
      // needed a custom check rule for this on Spark 3.1; we only assert
      // the guard exists (reference StarLakeUnsupportedOperationsCheck).
      def rejected(sql: String): Unit = {
        val e = intercept[Exception](s2.sql(sql))
        val m = e.getMessage
        assert(m.contains("not support") || m.contains("NOT_SUPPORTED") ||
          m.contains("UNSUPPORTED"), s"$sql: $m")
      }
      rejected("ALTER TABLE gddl ADD PARTITION (part='x')")
      rejected("ALTER TABLE gddl DROP PARTITION (part='a')")
      rejected("ALTER TABLE gddl RECOVER PARTITIONS")
      rejected(s"LOAD DATA LOCAL INPATH '$dir/nothing' INTO TABLE gddl")
      // COMMENT change is supported (metadata-only)
      s2.sql("ALTER TABLE gddl ALTER COLUMN id COMMENT 'the key'")
      assert(s2.sql("SELECT id FROM gddl").count() == 1)
      s2.sql("DROP TABLE gddl")
    }
  }

  test("GraftTable.forName resolves catalog tables and temp views") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gfn")
      s2.sql(s"CREATE TABLE gfn (id BIGINT, v INT) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gfn VALUES (1, 10), (2, 20)")
      val t = GraftTable.forName(s2, "gfn")
      assert(t.toDF.count() == 2)
      t.deleteExpr("id = 2")
      assert(s2.sql("SELECT * FROM gfn").count() == 1)
      // a temp view over a graft read also resolves
      spark.read.format("graft").load(s"$dir/t")
        .createOrReplaceTempView("gfn_view")
      assert(GraftTable.forName(spark, "gfn_view").path ==
        graft.meta.SnapshotManagement.normalize(s"$dir/t"))
      // a non-graft view does not
      spark.range(3).createOrReplaceTempView("gfn_plain")
      intercept[IllegalArgumentException](GraftTable.forName(spark, "gfn_plain"))
      s2.sql("DROP TABLE gfn")
    }
  }

  test("re-added dropped column reads NULL, not resurrected file data") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gtomb")
      s2.sql(s"CREATE TABLE gtomb (id BIGINT, c INT) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gtomb VALUES (1, 111), (2, 222)")
      s2.sql("ALTER TABLE gtomb DROP COLUMN c")
      // old files still physically hold c=111/222; re-adding the name must
      // NOT resurrect them (files address columns by name)
      s2.sql("ALTER TABLE gtomb ADD COLUMN c INT")
      assert(rowsOf(s2.sql("SELECT id, c FROM gtomb")) ==
        Seq(Seq(1L, null), Seq(2L, null)))
      // and the re-added column is fully writable afterwards
      s2.sql("INSERT INTO gtomb VALUES (3, 333)")
      assert(rowsOf(s2.sql("SELECT id, c FROM gtomb WHERE id = 3")) ==
        Seq(Seq(3L, 333)))
      s2.sql("DROP TABLE gtomb")
    }
  }

  test("nested-field ALTER TABLE: add, rename, drop, re-add with tombstone") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gnest")
      s2.sql(s"CREATE TABLE gnest (id BIGINT, props STRUCT<a: INT, b: STRING>) " +
        s"USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gnest VALUES (1, named_struct('a', 10, 'b', 'x'))," +
        "(2, named_struct('a', 20, 'b', 'y'))")

      // ADD a nested field: metadata-only; old rows read NULL
      s2.sql("ALTER TABLE gnest ADD COLUMN props.c DOUBLE")
      assert(rowsOf(s2.sql("SELECT id, props.c FROM gnest")) ==
        Seq(Seq(1L, null), Seq(2L, null)))
      s2.sql("INSERT INTO gnest VALUES " +
        "(3, named_struct('a', 30, 'b', 'z', 'c', CAST(3.5 AS DOUBLE)))")
      assert(rowsOf(s2.sql("SELECT id, props.c FROM gnest WHERE id = 3")) ==
        Seq(Seq(3L, 3.5)))

      // RENAME a nested field: data rewrite, values preserved
      s2.sql("ALTER TABLE gnest RENAME COLUMN props.a TO alpha")
      assert(rowsOf(s2.sql("SELECT id, props.alpha FROM gnest")) ==
        Seq(Seq(1L, 10), Seq(2L, 20), Seq(3L, 30)))
      intercept[Exception] { s2.sql("SELECT props.a FROM gnest").collect() }

      // DROP a nested field: gone from the schema
      s2.sql("ALTER TABLE gnest DROP COLUMN props.b")
      intercept[Exception] { s2.sql("SELECT props.b FROM gnest").collect() }
      assert(s2.sql("SELECT * FROM gnest").schema("props").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toSeq == Seq("alpha", "c"))

      // WIDEN a nested field's type: metadata-only, old files promote at
      // scan (same per-leaf promotion as top level)
      s2.sql("ALTER TABLE gnest ALTER COLUMN props.alpha TYPE BIGINT")
      assert(rowsOf(s2.sql("SELECT id, props.alpha FROM gnest")) ==
        Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L)))
      // narrowing a nested field is rejected
      intercept[Exception] {
        s2.sql("ALTER TABLE gnest ALTER COLUMN props.alpha TYPE INT")
      }

      // RE-ADD the dropped name: tombstone forces a rewrite — the field
      // reads NULL everywhere, never the resurrected pre-drop values
      s2.sql("ALTER TABLE gnest ADD COLUMN props.b STRING")
      assert(rowsOf(s2.sql("SELECT id, props.b FROM gnest")) ==
        Seq(Seq(1L, null), Seq(2L, null), Seq(3L, null)))
      // and NOT NULL re-add of a tombstoned nested name is rejected (the
      // general existing-files guard fires before the tombstone-specific one)
      s2.sql("ALTER TABLE gnest DROP COLUMN props.b")
      val e = intercept[Exception] {
        s2.sql("ALTER TABLE gnest ADD COLUMN props.b STRING NOT NULL")
      }
      assert(e.getMessage.contains("NOT NULL"), e.getMessage)
      s2.sql("DROP TABLE gnest")
    }
  }

  test("schema-merge append cannot resurrect a dropped column name") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gtomb2")
      s2.sql(s"CREATE TABLE gtomb2 (id BIGINT, c INT) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gtomb2 VALUES (1, 111)")
      s2.sql("ALTER TABLE gtomb2 DROP COLUMN c")
      val e = intercept[Exception] {
        Seq((9L, 9)).toDF("id", "c").write.format("graft").mode("append")
          .option("mergeSchema", "true").save(s"$dir/t")
      }
      assert(e.getMessage.contains("previously"), e.getMessage)
      s2.sql("DROP TABLE gtomb2")
    }
  }

  test("materialized view containment: narrower range query scans the view") {
    withTempTable { dir =>
      val viewDir = dir + "-mvc"
      (1 to 100).map(i => (i.toLong, i % 10, s"r$i")).toDF("id", "v", "s")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvc_base")
      MaterializedViews.create(spark, viewDir,
        "SELECT id, v, s FROM mvc_base WHERE id BETWEEN 1 AND 50")
      val viewToken = viewDir.split("/").last

      // narrower range: rewritten to a view scan with compensating filter
      val q = spark.sql("SELECT id, s FROM mvc_base WHERE id BETWEEN 2 AND 3")
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(viewToken), s"expected view scan, got:\n$plan")
      assert(rowsOf(q) == Seq(Seq(2L, "r2"), Seq(3L, "r3")))

      // equality inside the range also rewrites
      val qe = spark.sql("SELECT s FROM mvc_base WHERE id = 5")
      assert(qe.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(rowsOf(qe) == Seq(Seq("r5")))

      // extra conjuncts on other columns still rewrite (full predicate
      // re-applies as compensation)
      val qx = spark.sql(
        "SELECT id FROM mvc_base WHERE id BETWEEN 2 AND 9 AND v = 3")
      assert(qx.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(rowsOf(qx) == Seq(Seq(3L)))

      // NOT contained (range exceeds the view): untouched, still correct
      val q2 = spark.sql("SELECT id FROM mvc_base WHERE id BETWEEN 40 AND 60")
      val plan2 = q2.queryExecution.optimizedPlan.toString
      assert(!plan2.contains(viewToken), s"must not rewrite:\n$plan2")
      assert(q2.count() == 21)

      // staleness disables containment rewrite too
      Seq((200L, 0, "r200")).toDF("id", "v", "s")
        .write.format("graft").mode("append").save(dir)
      val q3 = spark.sql("SELECT id FROM mvc_base WHERE id BETWEEN 2 AND 3")
      assert(!q3.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(q3.count() == 2)
    }
  }

  test("materialized view containment result equals unrewritten query") {
    withTempTable { dir =>
      val viewDir = dir + "-mvc2"
      (1 to 60).map(i => (i.toLong, s"g${i % 4}", i * 2)).toDF("id", "g", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvc2_base")
      val qSql = "SELECT id, g, v FROM mvc2_base WHERE id > 10 AND id < 20"
      val before = rowsOf(spark.sql(qSql))
      MaterializedViews.create(spark, viewDir,
        "SELECT id, g, v FROM mvc2_base WHERE id > 5 AND id <= 30")
      val q = spark.sql(qSql)
      assert(q.queryExecution.optimizedPlan.toString
        .contains(viewDir.split("/").last))
      assert(rowsOf(q) == before)
    }
  }

  test("view creation records base lineage even when contained by another view") {
    withTempTable { dir =>
      val viewA = dir + "-va"
      val viewB = dir + "-vb"
      (1 to 50).map(i => (i.toLong, i.toLong)).toDF("id", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("lin_base")
      MaterializedViews.create(spark, viewA,
        "SELECT id, v FROM lin_base WHERE id <= 40")
      // B's defining query is contained in A: if the rewrite ran during
      // materialization, B's lineage would point at A and B would NEVER go
      // stale when the base advances
      MaterializedViews.create(spark, viewB,
        "SELECT id, v FROM lin_base WHERE id <= 10")
      val basePath = graft.meta.SnapshotManagement.normalize(dir)
      val info = MaterializedViews.readInfo(viewB).get
      assert(info.relationVersions.keySet == Set(basePath),
        s"lineage must reference the base, got ${info.relationVersions}")
      // base advances -> B is stale and stops serving
      Seq((5L, 999L)).toDF("id", "v").write.format("graft")
        .mode("append").save(dir)
      assert(MaterializedViews.isStale(MaterializedViews.readInfo(viewB).get))
      cleanupView(viewA); cleanupView(viewB)
    }
  }

  test("materialized view containment handles OR-blocks and IN-lists") {
    withTempTable { dir =>
      val viewDir = dir + "-mvo"
      (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "s")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvo_base")
      MaterializedViews.create(spark, viewDir,
        "SELECT id, s FROM mvo_base WHERE id <= 10 OR id >= 90")
      val viewToken = viewDir.split("/").last
      def plan(sql: String) =
        spark.sql(sql).queryExecution.optimizedPlan.toString

      // inside one disjunct: rewritten
      val q1 = spark.sql("SELECT s FROM mvo_base WHERE id >= 2 AND id <= 8")
      assert(q1.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(rowsOf(q1) == (2 to 8).map(i => Seq(s"r$i"))
        .sortBy(_.mkString("|")))
      // IN-list inside a disjunct's range: rewritten (bounds from the list)
      val q2 = spark.sql("SELECT id FROM mvo_base WHERE id IN (93, 95)")
      assert(q2.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(rowsOf(q2) == Seq(Seq(93L), Seq(95L)))
      // straddling the OR gap: NOT contained
      assert(!plan("SELECT id FROM mvo_base WHERE id >= 8 AND id <= 92")
        .contains(viewToken))
      cleanupView(viewDir)

      val viewDir2 = dir + "-mvi"
      MaterializedViews.create(spark, viewDir2,
        "SELECT id, s FROM mvo_base WHERE id IN (2, 3, 5, 7)")
      val tok2 = viewDir2.split("/").last
      // equality pinning to a member: rewritten
      val q3 = spark.sql("SELECT s FROM mvo_base WHERE id = 5")
      assert(q3.queryExecution.optimizedPlan.toString.contains(tok2))
      assert(rowsOf(q3) == Seq(Seq("r5")))
      // IN over a subset: rewritten
      val q4 = spark.sql("SELECT id FROM mvo_base WHERE id IN (3, 7)")
      assert(q4.queryExecution.optimizedPlan.toString.contains(tok2))
      assert(rowsOf(q4) == Seq(Seq(3L), Seq(7L)))
      // non-member / superset: NOT contained
      assert(!plan("SELECT id FROM mvo_base WHERE id = 6").contains(tok2))
      assert(!plan("SELECT id FROM mvo_base WHERE id IN (5, 6)").contains(tok2))
      cleanupView(viewDir2)
    }
  }

  test("materialized view aggregate containment: filtered group-by scans the view") {
    withTempTable { dir =>
      val viewDir = dir + "-mva"
      (1 to 100).map(i => (i.toLong, (i % 10).toLong, i * 3L)).toDF("id", "g", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mva_base")
      val qSql = "SELECT g, count(1) AS cnt, sum(v) AS sv FROM mva_base " +
        "WHERE g >= 2 AND g <= 4 GROUP BY g"
      val before = rowsOf(spark.sql(qSql))
      MaterializedViews.create(spark, viewDir,
        "SELECT g, count(1) AS cnt, sum(v) AS sv FROM mva_base GROUP BY g")
      val viewToken = viewDir.split("/").last

      val q = spark.sql(qSql)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(viewToken), s"expected view scan, got:\n$plan")
      assert(!plan.contains("Aggregate"), s"expected no re-aggregation:\n$plan")
      assert(rowsOf(q) == before)

      // different alias + HAVING on top still serve from the view
      val qh = spark.sql("SELECT g, count(1) AS n FROM mva_base " +
        "WHERE g = 7 GROUP BY g HAVING n > 1")
      assert(qh.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(rowsOf(qh) == Seq(Seq(7L, 10L)))

      // filter on a NON-group column must not rewrite: the view's groups
      // aggregate over rows the query excludes
      val qn = spark.sql(
        "SELECT g, count(1) AS cnt FROM mva_base WHERE v > 150 GROUP BY g")
      assert(!qn.queryExecution.optimizedPlan.toString.contains(viewToken))

      // different grouping must not rewrite
      val qg = spark.sql("SELECT id, count(1) AS cnt FROM mva_base GROUP BY id")
      assert(!qg.queryExecution.optimizedPlan.toString.contains(viewToken))
    }
  }

  test("materialized view aggregate roll-up: coarser grouping re-aggregates") {
    withTempTable { dir =>
      val viewDir = dir + "-mvr"
      (1 to 120).map(i => (i.toLong, (i % 3).toLong, (i % 4).toLong, i.toLong))
        .toDF("id", "a", "b", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvr_base")
      val qSql = "SELECT a, count(1) AS cnt, sum(v) AS sv, min(v) AS mn, " +
        "max(v) AS mx FROM mvr_base WHERE b = 2 GROUP BY a"
      val globalSql = "SELECT count(1) AS cnt, sum(v) AS sv FROM mvr_base"
      val before = rowsOf(spark.sql(qSql))
      val beforeGlobal = rowsOf(spark.sql(globalSql))
      MaterializedViews.create(spark, viewDir,
        "SELECT a, b, count(1) AS cnt, sum(v) AS sv, min(v) AS mn, " +
          "max(v) AS mx FROM mvr_base GROUP BY a, b")
      val viewToken = viewDir.split("/").last

      // coarser grouping + filter on a view group column: re-aggregated
      // from the stored (a, b) partials
      val q = spark.sql(qSql)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(viewToken), s"expected view scan, got:\n$plan")
      assert(rowsOf(q) == before)

      // global aggregate (empty grouping) also rolls up
      val qg = spark.sql(globalSql)
      assert(qg.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(rowsOf(qg) == beforeGlobal)

      // avg is not re-aggregable from THESE partials (count(1), not
      // count(v)): no rewrite
      val qa = spark.sql("SELECT a, avg(v) AS av FROM mvr_base GROUP BY a")
      assert(!qa.queryExecution.optimizedPlan.toString.contains(viewToken))

      // grouping by a column the view did not group by: no rewrite
      val qid = spark.sql("SELECT id, count(1) AS c FROM mvr_base GROUP BY id")
      assert(!qid.queryExecution.optimizedPlan.toString.contains(viewToken))

      // filter on a NON-group column still refuses
      val qv = spark.sql(
        "SELECT a, count(1) AS c FROM mvr_base WHERE v > 60 GROUP BY a")
      assert(!qv.queryExecution.optimizedPlan.toString.contains(viewToken))

      // a filter matching NO stored group must still count 0, not NULL
      // (sum-of-counts over zero rows is NULL; the rewrite compensates)
      val qz = spark.sql("SELECT count(1) AS c FROM mvr_base WHERE b = 77")
      assert(qz.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(rowsOf(qz) == Seq(Seq(0L)))
      cleanupView(viewDir)
    }
  }

  test("forName and INSERT INTO SELECT behave with a covering view registered") {
    withTempTable { dir =>
      val viewDir = dir + "-mvfn"
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gcov")
      s2.sql(s"CREATE TABLE gcov (id BIGINT, v INT) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gcov VALUES (1, 10), (2, 20), (3, 30)")
      MaterializedViews.create(s2, viewDir, "SELECT id, v FROM gcov")
      // forName must resolve the BASE table, not the covering view — DML
      // through the handle would otherwise mutate the view's files
      val t = GraftTable.forName(s2, "gcov")
      assert(t.path == graft.meta.SnapshotManagement.normalize(s"$dir/t"),
        s"forName resolved ${t.path}")
      t.deleteExpr("id = 3")
      assert(s2.sql("SELECT count(1) AS c FROM gcov").head().getLong(0) == 2)
      // the read side of INSERT INTO ... SELECT is still served by a view
      val aggDir = dir + "-mvagg2"
      s2.sql("DROP TABLE IF EXISTS gcov_tgt")
      s2.sql(s"CREATE TABLE gcov_tgt (id BIGINT, v INT) USING graft " +
        s"LOCATION '$dir/tgt'")
      MaterializedViews.create(s2, aggDir, "SELECT id, v FROM gcov WHERE id <= 10")
      // V1-write physical plans hide the read subtree; the logical plans
      // in EXPLAIN EXTENDED show the substituted view scan
      val explain = s2.sql("EXPLAIN EXTENDED INSERT INTO gcov_tgt " +
        "SELECT id, v FROM gcov WHERE id = 1").head().getString(0)
      assert(explain.contains(aggDir.split("/").last),
        s"INSERT read side should serve from the view:\n$explain")
      s2.sql("INSERT INTO gcov_tgt SELECT id, v FROM gcov WHERE id = 1")
      assert(rowsOf(s2.sql("SELECT * FROM gcov_tgt")) == Seq(Seq(1L, 10)))
      s2.sql("DROP TABLE gcov"); s2.sql("DROP TABLE gcov_tgt")
      val norm = graft.meta.SnapshotManagement.normalize _
      val cur = s2.conf.getOption(MaterializedViews.CONF_KEY)
        .filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Nil)
      s2.conf.set(MaterializedViews.CONF_KEY, cur
        .filterNot(p => p == norm(viewDir) || p == norm(aggDir)).mkString(","))
    }
  }

  test("materialized view roll-up derives avg from sum/count partials") {
    withTempTable { dir =>
      val viewDir = dir + "-mvavg"
      (1 to 90).map(i => (i.toLong, (i % 3).toLong, (i % 5).toLong, i.toLong))
        .toDF("id", "a", "b", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvavg_base")
      val qSql = "SELECT a, avg(v) AS av, sum(v) AS sv FROM mvavg_base GROUP BY a"
      val before = rowsOf(spark.sql(qSql))
      MaterializedViews.create(spark, viewDir,
        "SELECT a, b, sum(v) AS sv, count(v) AS cv FROM mvavg_base GROUP BY a, b")
      val viewToken = viewDir.split("/").last
      val q = spark.sql(qSql)
      assert(q.queryExecution.optimizedPlan.toString.contains(viewToken),
        s"expected view scan:\n${q.queryExecution.optimizedPlan}")
      assert(rowsOf(q) == before)
      cleanupView(viewDir)
    }
  }

  test("materialized view aggregate containment honors matching row filters") {
    withTempTable { dir =>
      val viewDir = dir + "-mvaf"
      (1 to 80).map(i => (i.toLong, (i % 8).toLong, i.toLong)).toDF("id", "g", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvaf_base")
      val qSql = "SELECT g, sum(v) AS sv FROM mvaf_base " +
        "WHERE v > 40 AND g <= 3 GROUP BY g"
      val before = rowsOf(spark.sql(qSql))
      // view filters v > 40 too: exact conjunct match; the g <= 3 leftover
      // selects whole groups and compensates post-aggregation
      MaterializedViews.create(spark, viewDir,
        "SELECT g, sum(v) AS sv FROM mvaf_base WHERE v > 40 GROUP BY g")
      val viewToken = viewDir.split("/").last
      val q = spark.sql(qSql)
      assert(q.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(rowsOf(q) == before)

      // NARROWER filter on the non-group column is NOT containment here —
      // unlike the row-level case, aggregates over fewer rows differ
      val qn = spark.sql(
        "SELECT g, sum(v) AS sv FROM mvaf_base WHERE v > 60 GROUP BY g")
      assert(!qn.queryExecution.optimizedPlan.toString.contains(viewToken))
    }
  }

  test("materialized view aggregate-over-join: the star-schema cube shape") {
    withTempTable { dir =>
      val dirR = dir + "-fact"
      val viewDir = dir + "-mvaj"
      (1 to 20).map(i => (i.toLong, s"d${i % 4}")).toDF("k", "dim")
        .write.format("graft").save(dir)
      (1 to 300).map(i => (i.toLong, (i % 20 + 1).toLong, i.toLong))
        .toDF("oid", "fk", "amt").write.format("graft").save(dirR)
      spark.read.format("graft").load(dir).createOrReplaceTempView("maj_d")
      spark.read.format("graft").load(dirR).createOrReplaceTempView("maj_f")
      val qSql = "SELECT dim, count(1) AS cnt, sum(amt) AS sa " +
        "FROM maj_d JOIN maj_f ON k = fk GROUP BY dim"
      val rollSql = "SELECT count(1) AS cnt, sum(amt) AS sa " +
        "FROM maj_d JOIN maj_f ON k = fk WHERE dim = 'd2'"
      val before = rowsOf(spark.sql(qSql))
      val beforeRoll = rowsOf(spark.sql(rollSql))
      MaterializedViews.create(spark, viewDir,
        "SELECT dim, count(1) AS cnt, sum(amt) AS sa " +
          "FROM maj_d JOIN maj_f ON k = fk GROUP BY dim")
      val viewToken = viewDir.split("/").last

      // same grouping over the same join: served from the stored groups
      val q = spark.sql(qSql)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(viewToken), s"expected view scan, got:\n$plan")
      assert(!plan.contains("Join"), s"expected no join re-execution:\n$plan")
      assert(rowsOf(q) == before)

      // global roll-up with a group-column filter also serves
      val qr = spark.sql(rollSql)
      assert(qr.queryExecution.optimizedPlan.toString.contains(viewToken))
      assert(rowsOf(qr) == beforeRoll)

      // different join condition: no rewrite
      val qn = spark.sql("SELECT dim, count(1) AS cnt FROM maj_d " +
        "JOIN maj_f ON k = oid GROUP BY dim")
      assert(!qn.queryExecution.optimizedPlan.toString.contains(viewToken))
      cleanupView(viewDir)
    }
  }

  test("materialized view join containment: filtered equi-join scans the view") {
    withTempTable { dir =>
      val dirR = dir + "-right"
      val viewDir = dir + "-mvj"
      (1 to 50).map(i => (i.toLong, s"n$i")).toDF("k", "name")
        .write.format("graft").save(dir)
      (1 to 200).map(i => (i.toLong, (i % 50 + 1).toLong, i * 2L))
        .toDF("oid", "fk", "amt").write.format("graft").save(dirR)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvj_l")
      spark.read.format("graft").load(dirR).createOrReplaceTempView("mvj_r")
      val qSql = "SELECT name, amt FROM mvj_l JOIN mvj_r ON k = fk " +
        "WHERE k >= 5 AND k <= 10 AND amt > 100"
      val before = rowsOf(spark.sql(qSql))
      MaterializedViews.create(spark, viewDir,
        "SELECT k, name, oid, fk, amt FROM mvj_l JOIN mvj_r ON k = fk " +
          "WHERE k <= 20")
      val viewToken = viewDir.split("/").last

      val q = spark.sql(qSql)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(viewToken), s"expected view scan, got:\n$plan")
      assert(!plan.contains("Join"), s"expected no join re-execution:\n$plan")
      assert(rowsOf(q) == before)

      // commuted join condition still matches
      val qc = spark.sql("SELECT name FROM mvj_l JOIN mvj_r ON fk = k " +
        "WHERE k >= 5 AND k <= 10")
      assert(qc.queryExecution.optimizedPlan.toString.contains(viewToken))

      // range beyond the view's filter must not rewrite
      val q2 = spark.sql(
        "SELECT name FROM mvj_l JOIN mvj_r ON k = fk WHERE k >= 15 AND k <= 25")
      assert(!q2.queryExecution.optimizedPlan.toString.contains(viewToken))

      // different join condition must not rewrite
      val q3 = spark.sql(
        "SELECT name FROM mvj_l JOIN mvj_r ON k = oid WHERE k >= 5 AND k <= 10")
      assert(!q3.queryExecution.optimizedPlan.toString.contains(viewToken))

      // join-equivalence: a view projecting only `k` serves a query
      // touching `fk` — on inner equi-join rows they are equal.
      // (deregister the covering view first so it cannot serve instead)
      cleanupView(viewDir)
      val viewDir2 = dir + "-mvjk"
      MaterializedViews.create(spark, viewDir2,
        "SELECT k, name, amt FROM mvj_l JOIN mvj_r ON k = fk WHERE k <= 20")
      val tok2 = viewDir2.split("/").last
      val qe = spark.sql("SELECT fk, name FROM mvj_l JOIN mvj_r ON k = fk " +
        "WHERE k >= 3 AND k <= 6")
      assert(qe.queryExecution.optimizedPlan.toString.contains(tok2),
        s"equivalent column should serve:\n${qe.queryExecution.optimizedPlan}")
      assert(rowsOf(qe) == rowsOf(spark.sql(
        "SELECT k AS fk, name FROM mvj_l JOIN mvj_r ON k = fk " +
          "WHERE k >= 3 AND k <= 6")))
      cleanupView(viewDir2)
      cleanupView(viewDir)
    }
  }

  test("materialized view N-way join containment: fact plus two dimensions") {
    withTempTable { dir =>
      val dirF = dir + "-f3"; val dirD2 = dir + "-d2"
      val viewDir = dir + "-mvj3"
      (1 to 40).map(i => (i.toLong, s"n$i")).toDF("k", "name")
        .write.format("graft").save(dir)
      (1 to 5).map(i => (i.toLong, s"reg$i")).toDF("r", "region")
        .write.format("graft").save(dirD2)
      (1 to 400).map(i =>
          (i.toLong, (i % 40 + 1).toLong, (i % 5 + 1).toLong, i * 2L))
        .toDF("oid", "fk", "rk", "amt").write.format("graft").save(dirF)
      spark.read.format("graft").load(dir).createOrReplaceTempView("j3_d1")
      spark.read.format("graft").load(dirD2).createOrReplaceTempView("j3_d2")
      spark.read.format("graft").load(dirF).createOrReplaceTempView("j3_f")
      val qSql = "SELECT name, region, amt FROM j3_f JOIN j3_d1 ON fk = k " +
        "JOIN j3_d2 ON rk = r WHERE k >= 5 AND k <= 12 AND amt > 50"
      val before = rowsOf(spark.sql(qSql))
      MaterializedViews.create(spark, viewDir,
        "SELECT k, name, r, region, oid, fk, rk, amt FROM j3_f " +
          "JOIN j3_d1 ON fk = k JOIN j3_d2 ON rk = r WHERE k <= 20")
      val tok = viewDir.split("/").last

      val q = spark.sql(qSql)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(tok), s"expected view scan, got:\n$plan")
      assert(!plan.contains("Join"), s"expected no join re-execution:\n$plan")
      assert(rowsOf(q) == before)

      // a different join ORDER (commuted tree) still matches the flattened
      // conjunct set
      val qo = spark.sql("SELECT name FROM j3_d1 JOIN j3_f ON k = fk " +
        "JOIN j3_d2 ON r = rk WHERE k >= 5 AND k <= 12")
      assert(qo.queryExecution.optimizedPlan.toString.contains(tok),
        s"commuted tree should serve:\n${qo.queryExecution.optimizedPlan}")

      // a pruning subquery between joins is transparent
      val qs = spark.sql("SELECT name FROM (SELECT fk, rk FROM j3_f JOIN " +
        "j3_d2 ON rk = r) JOIN j3_d1 ON fk = k WHERE k >= 5 AND k <= 12")
      assert(qs.queryExecution.optimizedPlan.toString.contains(tok),
        s"pruning subquery should serve:\n${qs.queryExecution.optimizedPlan}")

      // dropping one join (2-table query over a 3-table view): no rewrite —
      // the view's rows lost fact rows with no dimension match
      val q2 = spark.sql("SELECT name FROM j3_f JOIN j3_d1 ON fk = k " +
        "WHERE k >= 5 AND k <= 12")
      assert(!q2.queryExecution.optimizedPlan.toString.contains(tok))

      // range beyond the view's filter: no rewrite
      val q3 = spark.sql("SELECT name FROM j3_f JOIN j3_d1 ON fk = k " +
        "JOIN j3_d2 ON rk = r WHERE k >= 15 AND k <= 25")
      assert(!q3.queryExecution.optimizedPlan.toString.contains(tok))
      cleanupView(viewDir)
    }
  }

  test("materialized view N-way aggregate-over-join: star cube with 2 dims") {
    withTempTable { dir =>
      val dirF = dir + "-fa3"; val dirD2 = dir + "-da2"
      val viewDir = dir + "-mvaj3"
      (1 to 20).map(i => (i.toLong, s"d${i % 4}")).toDF("k", "dim")
        .write.format("graft").save(dir)
      (1 to 6).map(i => (i.toLong, s"z${i % 2}")).toDF("r", "zone")
        .write.format("graft").save(dirD2)
      (1 to 300).map(i =>
          (i.toLong, (i % 20 + 1).toLong, (i % 6 + 1).toLong, i.toLong))
        .toDF("oid", "fk", "rk", "amt").write.format("graft").save(dirF)
      spark.read.format("graft").load(dir).createOrReplaceTempView("aj3_d1")
      spark.read.format("graft").load(dirD2).createOrReplaceTempView("aj3_d2")
      spark.read.format("graft").load(dirF).createOrReplaceTempView("aj3_f")
      val qSql = "SELECT dim, zone, count(1) AS cnt, sum(amt) AS sa " +
        "FROM aj3_f JOIN aj3_d1 ON fk = k JOIN aj3_d2 ON rk = r " +
        "GROUP BY dim, zone"
      val rollSql = "SELECT zone, count(1) AS cnt, sum(amt) AS sa " +
        "FROM aj3_f JOIN aj3_d1 ON fk = k JOIN aj3_d2 ON rk = r " +
        "WHERE dim = 'd2' GROUP BY zone"
      val before = rowsOf(spark.sql(qSql))
      val beforeRoll = rowsOf(spark.sql(rollSql))
      MaterializedViews.create(spark, viewDir, qSql)
      val tok = viewDir.split("/").last

      // same grouping over the same 3-way join: served from stored groups
      val q = spark.sql(qSql)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(tok), s"expected view scan, got:\n$plan")
      assert(!plan.contains("Join"), s"expected no join re-execution:\n$plan")
      assert(rowsOf(q) == before)

      // roll-up to one dimension with a group-column filter re-aggregates
      val qr = spark.sql(rollSql)
      assert(qr.queryExecution.optimizedPlan.toString.contains(tok))
      assert(rowsOf(qr) == beforeRoll)

      // missing one join: no rewrite
      val qn = spark.sql("SELECT dim, count(1) AS cnt FROM aj3_f " +
        "JOIN aj3_d1 ON fk = k GROUP BY dim")
      assert(!qn.queryExecution.optimizedPlan.toString.contains(tok))
      cleanupView(viewDir)
    }
  }

  test("materialized view 4-way join containment (fact plus three dimensions)") {
    withTempTable { dir =>
      val d2 = dir + "-j4d2"; val d3 = dir + "-j4d3"; val f = dir + "-j4f"
      val viewDir = dir + "-mvj4"
      (1 to 10).map(i => (i.toLong, s"a$i")).toDF("ka", "na")
        .write.format("graft").save(dir)
      (1 to 6).map(i => (i.toLong, s"b$i")).toDF("kb", "nb")
        .write.format("graft").save(d2)
      (1 to 4).map(i => (i.toLong, s"c$i")).toDF("kc", "nc")
        .write.format("graft").save(d3)
      (1 to 200).map(i => (i.toLong, (i % 10 + 1).toLong, (i % 6 + 1).toLong,
          (i % 4 + 1).toLong, i.toLong))
        .toDF("oid", "fa", "fb", "fc", "amt").write.format("graft").save(f)
      Seq(dir -> "j4_a", d2 -> "j4_b", d3 -> "j4_c", f -> "j4_f").foreach {
        case (p, n) => spark.read.format("graft").load(p)
          .createOrReplaceTempView(n)
      }
      val qSql = "SELECT na, nb, nc, amt FROM j4_f JOIN j4_a ON fa = ka " +
        "JOIN j4_b ON fb = kb JOIN j4_c ON fc = kc " +
        "WHERE ka >= 2 AND ka <= 5 AND amt > 20"
      val before = rowsOf(spark.sql(qSql))
      MaterializedViews.create(spark, viewDir,
        "SELECT ka, na, kb, nb, kc, nc, oid, fa, fb, fc, amt FROM j4_f " +
          "JOIN j4_a ON fa = ka JOIN j4_b ON fb = kb JOIN j4_c ON fc = kc " +
          "WHERE ka <= 7")
      val tok = viewDir.split("/").last
      val q = spark.sql(qSql)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(tok), s"expected view scan, got:\n$plan")
      assert(!plan.contains("Join"), s"expected no join re-execution:\n$plan")
      assert(rowsOf(q) == before)
      cleanupView(viewDir)
    }
  }

  test("equal-filter compensation: view filtered on a column it does not project") {
    withTempTable { dir =>
      val viewDir = dir + "-mveq"
      (1 to 100).map(i => (i.toLong, (i % 10).toLong, i * 3L))
        .toDF("id", "g", "v").write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mveq_base")
      val qSql = "SELECT g, v FROM mveq_base WHERE id BETWEEN 20 AND 60 AND g <= 4"
      val before = rowsOf(spark.sql(qSql))
      // the view filters on `id` but does NOT project it: a query repeating
      // the exact same range needs no compensation on `id`, so it serves
      // (the reference's equal-range rule); only `g <= 4` re-applies
      MaterializedViews.create(spark, viewDir,
        "SELECT g, v FROM mveq_base WHERE id BETWEEN 20 AND 60")
      val tok = viewDir.split("/").last
      val q = spark.sql(qSql)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains(tok), s"expected view scan, got:\n$plan")
      assert(rowsOf(q) == before)

      // a NARROWER id range cannot be compensated (id is not in the view
      // output): no rewrite
      val qn = spark.sql("SELECT g, v FROM mveq_base WHERE id BETWEEN 25 AND 40")
      assert(!qn.queryExecution.optimizedPlan.toString.contains(tok))

      // equality inside the view's range needs compensation too: no rewrite
      val qe = spark.sql("SELECT g, v FROM mveq_base WHERE id = 30")
      assert(!qe.queryExecution.optimizedPlan.toString.contains(tok))
      cleanupView(viewDir)
    }
  }

  test("MaterializedViews.drop unregisters and deletes; queries fall back to base") {
    withTempTable { dir =>
      val viewDir = dir + "-mvdrop"
      (1 to 40).map(i => (i.toLong, s"r$i")).toDF("id", "s")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mvd_base")
      MaterializedViews.create(spark, viewDir,
        "SELECT id, s FROM mvd_base WHERE id <= 20")
      val tok = viewDir.split("/").last
      val q1 = spark.sql("SELECT s FROM mvd_base WHERE id <= 5")
      assert(q1.queryExecution.optimizedPlan.toString.contains(tok))
      // drop refuses a path that is not a materialized view (a swapped
      // argument must not delete base-table data)
      val e = intercept[Exception] { MaterializedViews.drop(spark, dir) }
      assert(e.getMessage.contains("not a materialized view"), e.getMessage)
      assert(spark.read.format("graft").load(dir).count() == 40)
      MaterializedViews.drop(spark, viewDir)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(viewDir)))
      val q2 = spark.sql("SELECT s FROM mvd_base WHERE id <= 5")
      assert(!q2.queryExecution.optimizedPlan.toString.contains(tok))
      assert(q2.count() == 5)
    }
  }

  test("DML on a base table is unaffected by a registered all-column view") {
    withTempTable { dir =>
      val viewDir = dir + "-mvd"
      (1 to 20).map(i => (i.toLong, i.toLong)).toDF("id", "v")
        .write.format("graft").save(dir)
      MaterializedViews.create(spark, viewDir, s"SELECT id, v FROM graft.`$dir`")
      // a fresh, unfiltered, all-column view: without the DML guard the
      // containment branch replaces the UPDATE/DELETE target relation with
      // a Project over the view scan during resolution
      spark.sql(s"UPDATE graft.`$dir` SET v = v + 100 WHERE id <= 5")
      spark.sql(s"DELETE FROM graft.`$dir` WHERE id = 20")
      val got = spark.read.format("graft").load(dir)
        .as[(Long, Long)].collect().toMap
      assert(got.size == 19)
      assert(got(1L) == 101L && got(5L) == 105L && got(6L) == 6L)
      assert(!got.contains(20L))
      cleanupView(viewDir)
    }
  }

  /** Drop a test view's registration so later tests in the shared session
    * never consult it (exercises the production unregister path). */
  private def cleanupView(viewDir: String): Unit =
    MaterializedViews.unregister(spark, viewDir)

  test("materialized view rewrites a matching subtree under extra operators") {
    withTempTable { dir =>
      val viewDir = dir + "-mv2"
      Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 15)).toDF("id", "g", "v")
        .write.format("graft").save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("mv2_base")
      val sql = "SELECT g, sum(v) AS sv FROM mv2_base GROUP BY g"
      MaterializedViews.create(spark, viewDir, sql)
      // extra filter ON TOP of the view-shaped subquery still uses the view
      val q = spark.sql(s"SELECT * FROM ($sql) WHERE sv > 25")
      assert(rowsOf(q) == Seq(Seq("a", 30L)))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Aggregate"), s"expected MV scan under filter:\n$plan")
    }
  }

  test("SQL DDL via GraftCatalog: create/insert/select/drop") {
    withTempTable { dir =>
      // catalog plugins resolve lazily from session conf: a fresh session
      // with the conf set before first catalog access picks it up
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gct")
      s2.sql(s"CREATE TABLE gct (id BIGINT, v STRING) USING graft LOCATION '$dir/t'")
      s2.sql("INSERT INTO gct VALUES (1, 'a'), (2, 'b')")
      assert(s2.sql("SELECT * FROM gct").count() == 2)
      s2.sql("INSERT INTO gct VALUES (3, 'c')")
      assert(s2.sql("SELECT * FROM gct WHERE id >= 2").count() == 2)
      // data really lives in the graft table at the given location
      assert(GraftTable.forPath(spark, s"$dir/t").toDF.count() == 3)
      s2.sql("DROP TABLE gct")
      assert(!s2.catalog.tableExists("gct"))
    }
  }
}
