package graft

import org.apache.spark.sql.functions._

import graft.meta.SnapshotManagement
import graft.tables.GraftTable

/** Static rendezvous for the concurrency test's executor-side UDF (local
  * mode: one JVM, so the object is shared with the driver). */
object MergeIntoSuite {
  val committed = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile var stagedFiles: Seq[graft.meta.DataFileInfo] = Nil
  @volatile var stagedPath: String = ""
}

/** SQL `MERGE INTO` on primary-key tables, mapped to one delta upsert. */
class MergeIntoSuite extends GraftFunSuite {
  import spark.implicits._

  private def mkPk(dir: String): Unit =
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "v", "n")
      .write.format("graft")
      .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)

  test("canonical upsert shape: update matched, insert unmatched") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((2L, "B", 200), (4L, "d", 40)).toDF("id", "v", "n")
        .createOrReplaceTempView("src1")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING src1 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
        WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, s.n)""")
      assertSameRows(
        spark.read.format("graft").load(dir).select("id", "v", "n"),
        Seq((1L, "a", 10), (2L, "B", 200), (3L, "c", 30), (4L, "d", 40))
          .toDF("id", "v", "n"))
      // ONE delta commit: no base files rewritten
      val snap = SnapshotManagement.snapshot(SnapshotManagement.normalize(dir))
      assert(snap.version == 1)
      assert(snap.files.exists(!_.isBase), "merge must commit as delta")
    }
  }

  test("clause conditions and partial updates referencing both sides") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((1L, 5), (2L, 100), (9L, 9)).toDF("id", "delta")
        .createOrReplaceTempView("src2")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING src2 s ON t.id = s.id
        WHEN MATCHED AND s.delta < 50 THEN UPDATE SET n = t.n + s.delta
        WHEN NOT MATCHED AND s.id < 100 THEN
          INSERT (id, v, n) VALUES (s.id, 'new', s.delta)""")
      val got = spark.read.format("graft").load(dir)
        .select("id", "v", "n").as[(Long, String, Int)].collect().sortBy(_._1)
      // id=1 updated (+5), id=2 matched but condition false -> untouched,
      // id=9 inserted
      assert(got.toSeq == Seq((1L, "a", 15), (2L, "b", 20), (3L, "c", 30),
        (9L, "new", 9)))
    }
  }

  test("multiple source rows matching one key fail loudly") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((2L, "x"), (2L, "y")).toDF("id", "v").createOrReplaceTempView("src3")
      val e = intercept[Exception] {
        spark.sql(s"""MERGE INTO graft.`$dir` t USING src3 s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.v""")
      }
      assert(e.getMessage.contains("multiple source rows") ||
        e.getCause != null &&
          e.getCause.getMessage.contains("multiple source rows"))
    }
  }

  test("duplicate UNMATCHED source keys fail too (no last-wins inserts)") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((9L, "x"), (9L, "y")).toDF("id", "v").createOrReplaceTempView("srci")
      val e = intercept[Exception] {
        spark.sql(s"""MERGE INTO graft.`$dir` t USING srci s ON t.id = s.id
          WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, 0)""")
      }
      def messages(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
      assert(messages(e).exists(_.contains("multiple source rows")),
        s"got: ${messages(e)}")
    }
  }

  test("extra matches whose clauses do not apply are NOT an error") {
    withTempTable { dir =>
      mkPk(dir)
      // both rows match key 2, but only the 'hit' row's clause applies —
      // SQL's multiple-match rule errors only when >1 row CHANGES the key
      Seq((2L, "hit"), (2L, "miss")).toDF("id", "tag")
        .createOrReplaceTempView("srcm")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcm s ON t.id = s.id
        WHEN MATCHED AND s.tag = 'hit' THEN UPDATE SET v = s.tag""")
      assert(spark.read.format("graft").load(dir)
        .filter(col("id") === 2).select("v").as[String].head() == "hit")
    }
  }

  test("unsupported shapes are rejected with clear messages") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((2L, "x")).toDF("id", "v").createOrReplaceTempView("src4")
      def msgOf(sql: String): String =
        intercept[Exception] { spark.sql(sql) }.getMessage
      assert(msgOf(s"""MERGE INTO graft.`$dir` t USING src4 s
        ON t.id = s.id AND t.n > 5
        WHEN MATCHED THEN UPDATE SET v = s.v""").contains("conjunction"))
      assert(msgOf(s"""MERGE INTO graft.`$dir` t USING src4 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET id = s.id + 1""")
        .contains("primary-key"))
      // non-PK target
      withTempTable { plainDir =>
        Seq((1L, "a")).toDF("id", "v").write.format("graft").save(plainDir)
        assert(msgOf(s"""MERGE INTO graft.`$plainDir` t USING src4 s
          ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v""")
          .contains("primary-key table"))
      }
    }
  }

  test("insert-only merge and update-only merge") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((3L, "zz"), (7L, "new7")).toDF("id", "v")
        .createOrReplaceTempView("src5")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING src5 s ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, 0)""")
      assert(spark.read.format("graft").load(dir).count() == 4)
      assert(spark.read.format("graft").load(dir)
        .filter(col("id") === 3).select("v").as[String].head() == "c")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING src5 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = concat(t.v, '!')""")
      val vs = spark.read.format("graft").load(dir)
        .select("id", "v").as[(Long, String)].collect().toMap
      assert(vs(3L) == "c!" && vs(7L) == "new7!" && vs(1L) == "a")
    }
  }

  test("merge works against the merged (delta) state of the target") {
    withTempTable { dir =>
      mkPk(dir)
      val t = GraftTable.forPath(spark, dir)
      t.upsert(Seq((2L, "b2", 21)).toDF("id", "v", "n")) // delta on top
      Seq((2L, 1)).toDF("id", "delta").createOrReplaceTempView("src6")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING src6 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET n = t.n + s.delta""")
      assert(spark.read.format("graft").load(dir)
        .filter(col("id") === 2).select("v", "n").as[(String, Int)].head() ==
        ("b2", 22))
    }
  }

  test("WHEN MATCHED THEN DELETE tombstones the key in the same commit") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((2L, "kill"), (3L, "keep"), (5L, "e"))
        .toDF("id", "tag").createOrReplaceTempView("srcd")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcd s ON t.id = s.id
        WHEN MATCHED AND s.tag = 'kill' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.tag
        WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.tag, 0)""")
      assertSameRows(
        spark.read.format("graft").load(dir).select("id", "v", "n"),
        Seq((1L, "a", 10), (3L, "keep", 30), (5L, "e", 0))
          .toDF("id", "v", "n"))
      // ONE delta commit carries updates, inserts AND the tombstone
      val snap = SnapshotManagement.snapshot(SnapshotManagement.normalize(dir))
      assert(snap.version == 1, "delete clauses must not add extra commits")
      assert(snap.files.exists(!_.isBase), "merge must commit as delta")
      // the deleted key is re-insertable by a newer version
      GraftTable.forPath(spark, dir).upsert(
        Seq((2L, "back", 2)).toDF("id", "v", "n"))
      assert(spark.read.format("graft").load(dir)
        .filter(col("id") === 2).select("v").as[String].head() == "back")
    }
  }

  test("WHEN NOT MATCHED BY SOURCE clauses see target-only rows") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((2L, "B")).toDF("id", "v").createOrReplaceTempView("srcbs")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcbs s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED BY SOURCE AND t.n < 25 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = concat(t.v, '-stale')""")
      // id=1 (n=10) deleted; id=3 (n=30) marked stale; id=2 updated
      assertSameRows(
        spark.read.format("graft").load(dir).select("id", "v", "n"),
        Seq((2L, "B", 20), (3L, "c-stale", 30)).toDF("id", "v", "n"))
      val snap = SnapshotManagement.snapshot(SnapshotManagement.normalize(dir))
      assert(snap.version == 1)
    }
  }

  test("WITH SCHEMA EVOLUTION adds assignment and star columns") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((2L, "B", 99), (5L, "e", 55)).toDF("id", "v", "extra")
        .createOrReplaceTempView("srcse")
      // explicit new-column assignment on both clause kinds
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION
        INTO graft.`$dir` t USING srcse s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v, extra = s.extra
        WHEN NOT MATCHED THEN
          INSERT (id, v, n, extra) VALUES (s.id, s.v, 0, s.extra)""")
      val got = spark.read.format("graft").load(dir)
        .select("id", "v", "n", "extra")
        .as[(Long, String, Option[Int], Option[Int])].collect().sortBy(_._1)
      assert(got.toSeq == Seq(
        (1L, "a", Some(10), None), (2L, "B", Some(20), Some(99)),
        (3L, "c", Some(30), None), (5L, "e", Some(0), Some(55))))
      // without the flag, a new column is rejected
      val e = intercept[Exception] {
        spark.sql(s"""MERGE INTO graft.`$dir` t USING srcse s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET extra2 = s.extra""")
      }
      assert(e.getMessage.contains("extra2") ||
        e.getCause != null && e.getCause.getMessage.contains("extra2"))
    }
  }

  test("WITH SCHEMA EVOLUTION star actions carry source-only columns") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((3L, "C", 33, "x3"), (6L, "f", 66, "x6"))
        .toDF("id", "v", "n", "tag").createOrReplaceTempView("srcst")
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION
        INTO graft.`$dir` t USING srcst s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val got = spark.read.format("graft").load(dir)
        .select("id", "v", "n", "tag")
        .as[(Long, String, Int, Option[String])].collect().sortBy(_._1)
      assert(got.toSeq == Seq(
        (1L, "a", 10, None), (2L, "b", 20, None),
        (3L, "C", 33, Some("x3")), (6L, "f", 66, Some("x6"))))
    }
  }

  test("evolution + DELETE clauses in one merge: state and change feed agree") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((1L, "up", "x1"), (2L, "", "kill"), (7L, "new", "x7"))
        .toDF("id", "nv", "tag").createOrReplaceTempView("evokill")
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` t
        USING evokill s ON t.id = s.id
        WHEN MATCHED AND s.tag = 'kill' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.nv, tag = s.tag
        WHEN NOT MATCHED THEN
          INSERT (id, v, n, tag) VALUES (s.id, s.nv, 0, s.tag)""")
      assertSameRows(
        spark.read.format("graft").load(dir).select("id", "v", "n", "tag"),
        Seq((1L, "up", 10, Some("x1")), (3L, "c", 30, None),
          (7L, "new", 0, Some("x7"))).toDF("id", "v", "n", "tag"))
      // the ONE evolved+tombstoned commit diffs exactly: update pair for 1,
      // delete pre-image for 2, insert for 7 — nothing for untouched 3
      val feed = graft.tables.ChangeFeed.changes(spark, dir, 1L, 1L)
        .select(col("id"), col(graft.tables.ChangeFeed.CHANGE_TYPE))
        .as[(Long, String)].collect().toSet
      assert(feed == Set((1L, "update_preimage"), (1L, "update_postimage"),
        (2L, "delete"), (7L, "insert")), s"got $feed")
    }
  }

  test("a concurrent upsert landing mid-merge is re-read, not shadowed") {
    withTempTable { dir =>
      mkPk(dir)
      val path = SnapshotManagement.normalize(dir)
      import graft.meta.SnapshotManagement
      // pre-stage delta files for key 3 (uncommitted: invisible to scans)
      val info = SnapshotManagement.snapshot(path).tableInfo
      val staged = graft.write.TransactionalWrite.writeFiles(
        spark, path, info,
        Seq((3L, "concurrent", 333)).toDF("id", "v", "n"), isBase = false)
      // the source's UDF commits them WHILE the merge's join evaluates —
      // inside the merge transaction's conflict window (metadata-only
      // commit; no nested Spark job)
      MergeIntoSuite.committed.set(false)
      MergeIntoSuite.stagedFiles = staged
      MergeIntoSuite.stagedPath = path
      val sneak = udf { (id: Long) =>
        if (MergeIntoSuite.committed.compareAndSet(false, true)) {
          SnapshotManagement.withNewTransaction(MergeIntoSuite.stagedPath) {
            _.commit("delta", None, MergeIntoSuite.stagedFiles, Nil)
          }
        }
        id
      }
      Seq((1L, "x"), (3L, "y")).toDF("id0", "nv")
        .select(sneak(col("id0")).as("id"), col("nv"))
        .createOrReplaceTempView("src_race")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING src_race s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET n = t.n + 1""")
      // the merge restarted on the conflict and re-read key 3's concurrent
      // value: 333 + 1, NOT the stale 30 + 1
      val got = spark.read.format("graft").load(dir)
        .select("id", "n").as[(Long, Int)].collect().toMap
      assert(got(3L) == 334,
        s"merge must re-decide over the concurrent upsert, got n=${got(3L)}")
      assert(got(1L) == 11 && got(2L) == 20)
    }
  }

  test("MERGE works on catalog-registered table names, not just paths") {
    withTempTable { dir =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
      s2.sql("DROP TABLE IF EXISTS gmerge")
      s2.sql(s"CREATE TABLE gmerge (id BIGINT, v STRING) USING graft " +
        s"LOCATION '$dir/t' TBLPROPERTIES " +
        "('hashPartitions'='id', 'hashBucketNum'='2')")
      s2.sql("INSERT INTO gmerge VALUES (1, 'a'), (2, 'b')")
      s2.sql("""CREATE OR REPLACE TEMPORARY VIEW gmsrc AS
        SELECT * FROM VALUES (1L, 'A'), (2L, 'kill'), (3L, 'c') AS t(id, nv)""")
      s2.sql("""MERGE INTO gmerge t USING gmsrc s ON t.id = s.id
        WHEN MATCHED AND s.nv = 'kill' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""")
      assert(rowsOf(s2.sql("SELECT id, v FROM gmerge")) ==
        Seq(Seq(1L, "A"), Seq(3L, "c")))
      s2.sql("DROP TABLE gmerge")
    }
  }

  test("merge executes the source-target join exactly once") {
    withTempTable { dir =>
      mkPk(dir)
      // the accumulator counts source-row evaluations: a second pass over
      // the join (the old duplicate-match count() action) would double it
      val acc = spark.sparkContext.longAccumulator("merge_src_rows")
      val touch = udf { (id: Long) => acc.add(1L); id }
      Seq((1L, "x"), (9L, "new")).toDF("id0", "v")
        .select(touch(col("id0")).as("id"), col("v"))
        .createOrReplaceTempView("src_once")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING src_once s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, 0)""")
      assert(acc.value == 2L,
        s"source rows evaluated ${acc.value} times for 2 rows — " +
          "the merge must run its join in a single pass")
      val vs = spark.read.format("graft").load(dir)
        .select("id", "v").as[(Long, String)].collect().toMap
      assert(vs(1L) == "x" && vs(9L) == "new" && vs(2L) == "b")
    }
  }

  private def mkStructPk(dir: String): Unit =
    Seq((1L, 10, "x", 1.0), (2L, 20, "y", 2.0), (3L, 30, "z", 3.0))
      .toDF("id", "a", "b", "w")
      .select(col("id"),
        struct(col("a"), col("b"),
          struct(col("w").as("inner")).as("deep")).as("props"),
        (col("a") * 10).as("n"))
      .write.format("graft")
      .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)

  test("a column literally named a.b survives MERGE update and delete") {
    withTempTable { dir =>
      // `a.b` here is ONE top-level column whose name contains a dot —
      // every old-value reference in the emit projection must backtick it,
      // or it resolves as field b of column a and the merge fails
      Seq((1L, "x", 10), (2L, "y", 20)).toDF("id", "a.b", "n")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(dir)
      Seq((1L, 100), (3L, 300)).toDF("id", "n")
        .createOrReplaceTempView("srcdot")
      // UPDATE leaves `a.b` unset -> carried-value branch; INSERT supplies it
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcdot s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET n = s.n
        WHEN NOT MATCHED THEN INSERT (id, `a.b`, n) VALUES (s.id, 'z', s.n)""")
      assertSameRows(
        spark.read.format("graft").load(dir).select("id", "`a.b`", "n"),
        Seq((1L, "x", 100), (2L, "y", 20), (3L, "z", 300))
          .toDF("id", "a.b", "n"))
      // DELETE image references the dotted column through the same helper
      Seq(Tuple1(2L)).toDF("id").createOrReplaceTempView("srcdot2")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcdot2 s ON t.id = s.id
        WHEN MATCHED THEN DELETE""")
      assert(spark.read.format("graft").load(dir)
        .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    }
  }

  test("MERGE UPDATE sets a nested struct field, preserving siblings") {
    withTempTable { dir =>
      mkStructPk(dir)
      Seq((2L, 200), (4L, 400)).toDF("id", "newa")
        .createOrReplaceTempView("srcns1")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcns1 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET props.a = s.newa, n = s.newa""")
      val got = spark.read.format("graft").load(dir)
        .select(col("id"), col("props.a"), col("props.b"),
          col("props.deep.inner"), col("n"))
        .as[(Long, Int, String, Double, Int)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 10, "x", 1.0, 100), (2L, 200, "y", 2.0, 200),
        (3L, 30, "z", 3.0, 300)),
        s"nested SET must update props.a only, keep b/deep intact: $got")
    }
  }

  test("MERGE UPDATE sets a two-level nested field") {
    withTempTable { dir =>
      mkStructPk(dir)
      Seq((1L, 9.5)).toDF("id", "wv").createOrReplaceTempView("srcns2")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcns2 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET props.deep.inner = s.wv""")
      val got = spark.read.format("graft").load(dir)
        .select(col("id"), col("props.a"), col("props.b"),
          col("props.deep.inner"))
        .as[(Long, Int, String, Double)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 10, "x", 9.5), (2L, 20, "y", 2.0),
        (3L, 30, "z", 3.0)), s"got $got")
    }
  }

  test("nested SET in NOT MATCHED BY SOURCE clauses works too") {
    withTempTable { dir =>
      mkStructPk(dir)
      Seq((1L, 111)).toDF("id", "newa").createOrReplaceTempView("srcns3")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcns3 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET props.a = s.newa
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET props.b = 'gone'""")
      val got = spark.read.format("graft").load(dir)
        .select(col("id"), col("props.a"), col("props.b"))
        .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 111, "x"), (2L, 20, "gone"), (3L, 30, "gone")),
        s"got $got")
    }
  }

  test("nested INSERT composes the column from a null shell + assigned " +
      "paths") {
    withTempTable { dir =>
      mkStructPk(dir)
      Seq((5L, 50)).toDF("id", "newa").createOrReplaceTempView("srcni")
      // a two-level path too: the null SHELL must be non-null structs all
      // the way down or withField would swallow the deep assignment
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcni s ON t.id = s.id
        WHEN NOT MATCHED THEN
        INSERT (id, props.a, props.deep.inner, n)
        VALUES (s.id, s.newa, 7.5, 500)""")
      val got = spark.read.format("graft").load(dir).filter(col("id") === 5L)
        .select(col("props").isNotNull, col("props.a"),
          col("props.b").isNull, col("props.deep.inner"))
        .as[(Boolean, Int, Boolean, Double)].collect().toSeq
      assert(got == Seq((true, 50, true, 7.5)),
        s"props must be a non-null struct with a=50, b=null, deep.inner=7.5: $got")
    }
  }

  test("nested-field rejections: conflicts, evolution") {
    withTempTable { dir =>
      mkStructPk(dir)
      Seq((5L, 50)).toDF("id", "newa").createOrReplaceTempView("srcns4")
      // whole-column + nested conflict in one clause
      val e2 = intercept[Exception] {
        spark.sql(s"""MERGE INTO graft.`$dir` t USING srcns4 s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET props = t.props, props.a = s.newa""")
      }
      assert(e2.getMessage.toLowerCase.contains("conflict"),
        s"conflicting whole/nested must fail: ${e2.getMessage}")
      // evolution cannot create a nested field
      val e3 = intercept[Exception] {
        spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` t
          USING srcns4 s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET props.brandnew = s.newa""")
      }
      assert(e3.getMessage.contains("ALTER TABLE") ||
        e3.getMessage.contains("No such struct field") ||
        e3.getMessage.toLowerCase.contains("nested"),
        s"nested evolution must fail clearly: ${e3.getMessage}")
    }
  }

  test("evolution: conflicting new-column types across clauses fail; " +
      "compatible ones widen") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((1L, 5), (9L, 9)).toDF("id", "x").createOrReplaceTempView("srcev1")
      val e = intercept[Exception] {
        spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` t
          USING srcev1 s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET extra = s.x
          WHEN NOT MATCHED THEN INSERT (id, v, n, extra)
            VALUES (s.id, 'e', 0, named_struct('z', s.x))""")
      }
      assert(e.getMessage.contains("incompatible types"),
        s"type conflict must fail analysis: ${e.getMessage}")
      // int vs bigint widens to bigint
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$dir` t
        USING srcev1 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET extra = s.x
        WHEN NOT MATCHED THEN INSERT (id, v, n, extra)
          VALUES (s.id, 'e', 0, CAST(s.x AS BIGINT))""")
      val df = spark.read.format("graft").load(dir)
      assert(df.schema("extra").dataType ==
        org.apache.spark.sql.types.LongType, df.schema.treeString)
      val got = df.select("id", "extra").as[(Long, Option[Long])]
        .collect().toMap
      assert(got(1L).contains(5L) && got(9L).contains(9L) && got(2L).isEmpty)
    }
  }

  test("NULL-key source rows get the dedicated NULL-PK error, not the " +
      "multiple-source-rows error") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((Option.empty[Long], "p"), (Option.empty[Long], "q"))
        .toDF("id", "v").createOrReplaceTempView("srcnull")
      val e = intercept[Exception] {
        spark.sql(s"""MERGE INTO graft.`$dir` t USING srcnull s ON t.id = s.id
          WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, 0)""")
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(_.contains("NULL primary-key")),
        s"expected the dedicated NULL-PK error, got: ${msgs(e)}")
      assert(!msgs(e).exists(_.contains("multiple source rows")),
        s"NULL keys must not misreport as duplicates: ${msgs(e)}")
    }
  }

  test("two NULL-key source rows inserting the SAME explicit PK still " +
      "trip the duplicate guard (no silent last-wins)") {
    withTempTable { dir =>
      mkPk(dir)
      Seq((Option.empty[Long], "p"), (Option.empty[Long], "q"))
        .toDF("id", "v").createOrReplaceTempView("srcnull2")
      val e = intercept[Exception] {
        // both unmatched rows supply the SAME literal key 42
        spark.sql(s"""MERGE INTO graft.`$dir` t USING srcnull2 s
          ON t.id = s.id
          WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (42, s.v, 0)""")
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(_.contains("multiple source rows")),
        s"duplicate explicit-PK inserts must fail loudly: ${msgs(e)}")

      // distinct explicit PKs from NULL-key rows are fine
      Seq((Option.empty[Long], 101L, "p"), (Option.empty[Long], 102L, "q"))
        .toDF("id", "newid", "v").createOrReplaceTempView("srcnull3")
      spark.sql(s"""MERGE INTO graft.`$dir` t USING srcnull3 s ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.newid, s.v, 0)""")
      val got = spark.read.format("graft").load(dir)
        .select("id").as[Long].collect().toSet
      assert(got.contains(101L) && got.contains(102L),
        s"distinct explicit-PK inserts from NULL-key rows must land: $got")
    }
  }

  test("two NON-null distinct source keys inserting the SAME explicit PK " +
      "trip the duplicate guard (window keys lead with the emitted PK)") {
    withTempTable { dir =>
      mkPk(dir)
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      // source keys 5 and 6 (non-null, unmatched) both insert literal 42:
      // partitioning the guard by the SOURCE key would count each once
      Seq((5L, "p"), (6L, "q")).toDF("id", "v")
        .createOrReplaceTempView("srcdup_nn")
      val e = intercept[Exception] {
        spark.sql(s"""MERGE INTO graft.`$dir` t USING srcdup_nn s
          ON t.id = s.id
          WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (42, s.v, 0)""")
      }
      assert(msgs(e).exists(_.contains("multiple source rows")),
        s"explicit-PK collision from distinct source keys must fail: ${msgs(e)}")

      // a matched UPDATE of key 1 plus an unmatched INSERT supplying
      // literal 1 is the same final-key collision
      Seq((1L, "upd"), (7L, "ins")).toDF("id", "v")
        .createOrReplaceTempView("srcdup_mix")
      val e2 = intercept[Exception] {
        spark.sql(s"""MERGE INTO graft.`$dir` t USING srcdup_mix s
          ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (1, s.v, 0)""")
      }
      assert(msgs(e2).exists(_.contains("multiple source rows")),
        s"update+insert of one final key must fail: ${msgs(e2)}")

      // table unchanged by the failed merges
      val got = spark.read.format("graft").load(dir)
        .select("id").as[Long].collect().toSet
      assert(got === Set(1L, 2L, 3L), s"failed merges must not commit: $got")
    }
  }
}
