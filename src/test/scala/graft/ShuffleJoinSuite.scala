package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.GraftTable

/** Port of the reference's shuffle-elision assertion
  * (`manual_execute_suites/ShuffleJoinSuite.scala:1-137`): joins and
  * aggregations keyed on the PK of co-bucketed tables must plan without any
  * ShuffleExchange.
  */
class ShuffleJoinSuite extends AnyFunSuite with BeforeAndAfterAll
    with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = GraftFunSuite.session

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
  }

  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    super.afterAll()
  }

  private def withTempTable[T](f: (String, String) => T): T = {
    val a = java.nio.file.Files.createTempDirectory("graft-sj-a-").toString
    val b = java.nio.file.Files.createTempDirectory("graft-sj-b-").toString
    try f(a, b)
    finally Seq(a, b).foreach(d =>
      graft.write.TransactionalWrite.deleteRecursively(java.nio.file.Paths.get(d)))
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }.size
  }

  test("pk-pk join on co-bucketed tables plans without exchange") {
    import spark.implicits._
    withTempTable { (a, b) =>
      (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "av")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(a)
      (500 to 1500).map(i => (i.toLong, i * 2)).toDF("id", "bv")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(b)
      val da = spark.read.format("graft").load(a)
      val db = spark.read.format("graft").load(b)
      val joined = da.join(db, "id")
      assert(joined.count() == 501)
      assert(shuffles(joined) == 0,
        s"expected shuffle-free join:\n${joined.queryExecution.executedPlan}")
    }
  }

  test("aggregation on pk plans without exchange") {
    import spark.implicits._
    withTempTable { (a, _) =>
      (1 to 1000).map(i => (i.toLong, i % 7)).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(a)
      val df = spark.read.format("graft").load(a)
        .groupBy("id").sum("v")
      assert(df.count() == 1000)
      assert(shuffles(df) == 0,
        s"expected shuffle-free agg:\n${df.queryExecution.executedPlan}")
    }
  }

  test("merge-on-read scan keeps bucket distribution (join after upsert)") {
    import spark.implicits._
    withTempTable { (a, b) =>
      (1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "av")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(a)
      GraftTable.forPath(spark, a)
        .upsert((50 to 120).map(i => (i.toLong, s"A$i")).toDF("id", "av"))
      (1 to 200).map(i => (i.toLong, i)).toDF("id", "bv")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(b)
      val joined = spark.read.format("graft").load(a)
        .join(spark.read.format("graft").load(b), "id")
      assert(joined.count() == 120)
      assert(shuffles(joined) == 0,
        s"expected shuffle-free merge join:\n${joined.queryExecution.executedPlan}")
      // merged values win
      val r = joined.filter($"id" === 60L).select("av").as[String].head()
      assert(r == "A60")
    }
  }

  test("merge-heavy read: 6 delta layers over 40k keys, strings intact") {
    import spark.implicits._
    withTempTable { (a, _) =>
      val n = 40000
      (1 to n).map(i => (i.toLong, s"base$i", i))
        .toDF("id", "s", "v").write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "4").save(a)
      val t = GraftTable.forPath(spark, a)
      // deep stack: every key rewritten five times (auto-compaction off so
      // the k-way merge really sees all six layers)
      spark.conf.set("spark.graft.compaction.auto", "false")
      spark.conf.set("spark.graft.scan.heal.enabled", "false")
      try {
        for (r <- 1 to 5) {
          t.upsert((1 to n).map(i => (i.toLong, s"r$r-$i", i * 10 + r))
            .toDF("id", "s", "v"))
        }
        val df = spark.read.format("graft").load(a)
        val t0 = System.nanoTime()
        val rows = df.count()
        info(f"6-layer merge of $n%d keys: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        assert(rows == n)
        // last-wins values, string buffers not corrupted by reader reuse
        val sample = df.filter($"id".isin(1L, 777L, 40000L))
          .select("id", "s", "v").as[(Long, String, Int)].collect()
          .sortBy(_._1)
        assert(sample.toSeq == Seq(
          (1L, "r5-1", 15), (777L, "r5-777", 7775), (40000L, "r5-40000", 400005)))
      } finally {
        spark.conf.unset("spark.graft.compaction.auto")
        spark.conf.unset("spark.graft.scan.heal.enabled")
      }
    }
  }

  test("intersect/except on pk rewrite to semi/anti join") {
    import spark.implicits._
    withTempTable { (a, b) =>
      (1 to 10).map(i => (i.toLong, i)).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(a)
      (6 to 15).map(i => (i.toLong, i)).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2").save(b)
      val da = spark.read.format("graft").load(a).select("id")
      val db = spark.read.format("graft").load(b).select("id")
      val inter = da.intersect(db)
      assert(inter.collect().map(_.getLong(0)).sorted.toSeq == (6L to 10L))
      val ex = da.except(db)
      assert(ex.collect().map(_.getLong(0)).sorted.toSeq == (1L to 5L))
      val interPlan = inter.queryExecution.optimizedPlan.toString
      assert(interPlan.contains("LeftSemi"), interPlan)
      val exPlan = ex.queryExecution.optimizedPlan.toString
      assert(exPlan.contains("LeftAnti"), exPlan)
    }
  }
}
