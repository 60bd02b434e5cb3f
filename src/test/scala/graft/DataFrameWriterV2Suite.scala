package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.functions._

/** `df.writeTo(...)` (DataFrameWriterV2) surface ported (behavior, not
  * code) from the reference `star/DataFrameWriterV2Suite.scala:76-460`:
  * append / overwrite-by-expression / create / createOrReplace /
  * partitionedBy, all resolved through the graft catalog. Deviations from
  * the reference are deliberate and noted inline: `bucket(n, col)` creates
  * a primary-key table instead of erroring, and `createOrReplace` on an
  * existing table replaces it (drop + create) instead of erroring.
  */
class DataFrameWriterV2Suite extends GraftFunSuite {

  private lazy val s2: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.spark_catalog", "graft.catalog.GraftCatalog")
    s
  }
  private def catalog: TableCatalog =
    s2.sessionState.catalogManager.currentCatalog.asInstanceOf[TableCatalog]

  private def source: DataFrame = {
    import s2.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "data")
  }
  private def source2: DataFrame = {
    import s2.implicits._
    Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("id", "data")
  }

  private var n = 0
  /** Fresh table name per test, dropped afterwards. */
  private def withTable[T](f: String => T): T = {
    n += 1
    val name = s"w2t$n"
    try f(name)
    finally s2.sql(s"DROP TABLE IF EXISTS $name")
  }

  private def rows(name: String): Seq[Seq[Any]] =
    rowsOf(s2.table(name).select("id", "data"))

  test("append: basic append") {
    withTable { t =>
      s2.sql(s"CREATE TABLE $t (id BIGINT, data STRING) USING graft")
      assert(s2.table(t).count() == 0)
      source.writeTo(t).append()
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
      source2.writeTo(t).append()
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"),
        Seq(4L, "d"), Seq(5L, "e"), Seq(6L, "f")))
    }
  }

  test("append: by name, not position") {
    withTable { t =>
      s2.sql(s"CREATE TABLE $t (id BIGINT, data STRING) USING graft")
      val e = intercept[Exception] {
        source.withColumnRenamed("data", "d").writeTo(t).append()
      }
      assert(e.getMessage.contains("mismatch"), e.getMessage)
      assert(s2.table(t).count() == 0)
    }
  }

  test("append: fails if the table does not exist") {
    val e = intercept[Exception] { source.writeTo("w2_nope").append() }
    assert(e.getMessage.contains("w2_nope"), e.getMessage)
  }

  test("overwrite by expression: true replaces all rows") {
    withTable { t =>
      s2.sql(s"CREATE TABLE $t (id BIGINT, data STRING) USING graft " +
        "PARTITIONED BY (id)")
      source.writeTo(t).append()
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
      source2.writeTo(t).overwrite(lit(true))
      assert(rows(t) == Seq(Seq(4L, "d"), Seq(5L, "e"), Seq(6L, "f")))
    }
  }

  test("overwrite by expression: data outside the predicate is rejected") {
    withTable { t =>
      s2.sql(s"CREATE TABLE $t (id BIGINT, data STRING) USING graft " +
        "PARTITIONED BY (id)")
      source.writeTo(t).append()
      val e = intercept[Exception] {
        source2.writeTo(t).overwrite(col("id") === 3) // ids 4..6 don't match
      }
      assert(e.getMessage.contains("replaceWhere"), e.getMessage)
      // the rejected write left the table untouched
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    }
  }

  test("overwrite by expression: matching partition is replaced") {
    import s2.implicits._
    withTable { t =>
      s2.sql(s"CREATE TABLE $t (id BIGINT, data STRING) USING graft " +
        "PARTITIONED BY (id)")
      source.writeTo(t).append()
      Seq((3L, "C")).toDF("id", "data").writeTo(t).overwrite(col("id") === 3)
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "C")))
    }
  }

  test("overwrite: by name, not position") {
    withTable { t =>
      s2.sql(s"CREATE TABLE $t (id BIGINT, data STRING) USING graft")
      val e = intercept[Exception] {
        source.withColumnRenamed("data", "d").writeTo(t).overwrite(lit(true))
      }
      assert(e.getMessage.contains("mismatch"), e.getMessage)
      assert(s2.table(t).count() == 0)
    }
  }

  test("overwritePartitions (dynamic overwrite) is not supported") {
    withTable { t =>
      s2.sql(s"CREATE TABLE $t (id BIGINT, data STRING) USING graft " +
        "PARTITIONED BY (id)")
      source.writeTo(t).append()
      val e = intercept[Exception] {
        source2.writeTo(t).overwritePartitions()
      }
      assert(e.getMessage.toLowerCase.contains("dynamic overwrite"), e.getMessage)
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    }
  }

  test("create: basic behavior") {
    withTable { t =>
      source.writeTo(t).using("graft").create()
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
      val table = catalog.loadTable(Identifier.of(Array("default"), t))
      assert(table.columns().map(_.name).toSeq == Seq("id", "data"))
      assert(table.partitioning().isEmpty)
    }
  }

  test("create: identity partitioned table") {
    withTable { t =>
      source.writeTo(t).using("graft").partitionedBy(col("id")).create()
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
      val table = catalog.loadTable(Identifier.of(Array("default"), t))
      assert(table.partitioning().map(_.toString).toSeq == Seq("identity(id)"))
    }
  }

  test("create: bucket(n, col) creates a primary-key table") {
    // Deviation: the reference rejects bucket transforms; here bucketing IS
    // the hash-partitioned primary-key layout, so it is supported.
    withTable { t =>
      source.writeTo(t).using("graft")
        .partitionedBy(org.apache.spark.sql.functions.bucket(2, col("id")))
        .create()
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
      // PK table: plain append rejected, upsert semantics apply
      val e = intercept[Exception] { source2.writeTo(t).append() }
      assert(e.getMessage.toLowerCase.contains("append"), e.getMessage)
    }
  }

  test("create: fails if the table already exists") {
    withTable { t =>
      s2.sql(s"CREATE TABLE $t (id BIGINT, data STRING) USING graft")
      val e = intercept[Exception] {
        source.writeTo(t).using("graft").create()
      }
      assert(e.getMessage.contains(t), e.getMessage)
    }
  }

  test("createOrReplace replaces an existing table") {
    // Deviation: the reference errors on replace; drop-and-recreate is the
    // standard Spark catalog fallback and is supported here.
    import s2.implicits._
    withTable { t =>
      source.writeTo(t).using("graft").create()
      Seq((7L, "g", true)).toDF("id", "data", "flag")
        .writeTo(t).using("graft").createOrReplace()
      val df = s2.table(t)
      assert(df.schema.fieldNames.toSeq == Seq("id", "data", "flag"))
      assert(rowsOf(df.select("id", "data", "flag")) == Seq(Seq(7L, "g", true)))
    }
  }

  test("create: partitioned by years/months/days/hours is rejected") {
    withTable { t =>
      for (tr <- Seq(years(col("ts")), months(col("ts")), days(col("ts")),
          hours(col("ts")))) {
        val e = intercept[Exception] {
          source.withColumn("ts", lit("2019-06-01 10:00:00").cast("timestamp"))
            .writeTo(t).using("graft").partitionedBy(tr).create()
        }
        assert(e.getMessage.contains("partitioning"), e.getMessage)
      }
    }
  }

  test("append by path identifier") {
    withTempTable { dir =>
      source.write.format("graft").save(dir)
      source2.writeTo(s"graft.`$dir`").append()
      assert(rowsOf(s2.read.format("graft").load(dir).select("id", "data")) ==
        Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"),
          Seq(4L, "d"), Seq(5L, "e"), Seq(6L, "f")))
    }
  }

  test("create: from an empty dataframe keeps schema and partitioning") {
    withTable { t =>
      source.where("false").writeTo(t).using("graft")
        .partitionedBy(col("id")).create()
      assert(s2.table(t).count() == 0)
      val table = catalog.loadTable(Identifier.of(Array("default"), t))
      assert(table.columns().map(_.name).toSeq.sorted == Seq("data", "id"))
      source.writeTo(t).append()
      assert(rows(t) == Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    }
  }
}
