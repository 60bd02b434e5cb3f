package graft

import org.apache.spark.sql.functions._

import graft.ops.SnapshotSql
import graft.tables.GraftTable

/** Cross-table snapshot-isolated SQL ([[SnapshotSql]]): one consistent
  * version per graft relation under concurrent writers, exact version
  * reporting, and non-graft relations passing through unpinned. */
class SnapshotSqlSuite extends GraftFunSuite {
  import spark.implicits._

  test("pinned frame == versionAsOf replay at the reported versions; " +
      "commits AFTER the pin are invisible to the pinned frame") {
    withTempTable { a => withTempTable { b =>
      (1L to 50L).map(i => (i, i % 5)).toDF("id", "grp")
        .write.format("graft").save(a)
      (0L to 4L).map(g => (g, s"g$g")).toDF("grp", "name")
        .write.format("graft").save(b)
      spark.read.format("graft").load(a).createOrReplaceTempView("ssa")
      spark.read.format("graft").load(b).createOrReplaceTempView("ssb")
      val q = "SELECT name, count(*) AS cnt FROM ssa JOIN ssb USING (grp) " +
        "GROUP BY name"
      val (df, versions) = SnapshotSql.sqlWithVersions(spark, q)
      assert(versions.size == 2, versions)

      // mutate BOTH tables after the pin: append to a, OVERWRITE b's whole
      // state (its live file set changes completely; the old files stay on
      // disk until vacuum — the pin's contract)
      Seq((99L, 0L)).toDF("id", "grp").write.format("graft")
        .mode("append").save(a)
      (0L to 4L).map(g => (g, "CLOBBERED")).toDF("grp", "name")
        .write.format("graft").mode("overwrite").save(b)
      // the pinned frame still evaluates, against the pinned file lists
      val got = df.collect().map(_.toString).sorted.toSeq

      val (pa, va) = versions.find(_._1 ==
        graft.meta.SnapshotManagement.normalize(a)).get
      spark.read.format("graft").option("versionAsOf", va).load(pa)
        .createOrReplaceTempView("ssa_pin")
      val want = (0L to 4L).map(g => s"[g$g,10]").sorted
      assert(got == want, s"got $got")
      val cnt = spark.sql(
        "SELECT count(*) FROM ssa_pin").as[Long].head()
      assert(cnt == 50, "versionAsOf replay must exclude the post-pin append")
    } }
  }

  test("racing writer: every pinned evaluation is internally consistent " +
      "(self-join of one table sees ONE version on both sides)") {
    withTempTable { dir =>
      (1L to 100L).map(i => (i, 1L)).toDF("id", "v")
        .write.format("graft")
        .option("hashPartitions", "id").option("hashBucketNum", "2")
        .save(dir)
      spark.read.format("graft").load(dir).createOrReplaceTempView("ssr")
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val writer = new Thread(() => {
        val t = GraftTable.forPath(spark, dir)
        var k = 0
        while (!stop.get() && k < 40) {
          try {
            // bump EVERY row's v by rewriting the full table state: any
            // torn read (two versions in one query) breaks the invariant
            t.upsert((1L to 100L).map(i => (i, (k + 2).toLong))
              .toDF("id", "v"))
            k += 1; Thread.sleep(15)
          } catch { case e: Throwable => errs.add(e); stop.set(true) }
        }
      })
      writer.setDaemon(true); writer.start()
      try {
        (1 to 6).foreach { _ =>
          // both sides of the self-join must see the same snapshot: all
          // rows carry one v value, so the cross-version mismatch count
          // is zero iff the pin held
          val torn = SnapshotSql.sql(spark,
            "SELECT count(*) AS n FROM ssr x JOIN ssr y ON x.id = y.id " +
              "AND x.v <> y.v").as[Long].head()
          assert(torn == 0L, s"snapshot-isolated query saw $torn torn rows")
          Thread.sleep(20)
        }
      } finally { stop.set(true); writer.join(20000) }
      assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    }
  }

  test("a user-pinned (versionAsOf) relation is NOT re-pinned to latest") {
    withTempTable { dir =>
      Seq((1L, "old")).toDF("id", "v").write.format("graft").save(dir)
      Seq((2L, "new")).toDF("id", "v").write.format("graft")
        .mode("append").save(dir)
      spark.read.format("graft").option("versionAsOf", 0).load(dir)
        .createOrReplaceTempView("ss_tt")
      val (df, versions) = SnapshotSql.sqlWithVersions(spark,
        "SELECT v FROM ss_tt")
      // time-traveled relations are immutable: no version entry, and the
      // frame must serve v0, not latest
      assert(versions.isEmpty, versions)
      assert(df.as[String].collect().toSeq == Seq("old"))
    }
  }

  test("relations inside subquery expressions are pinned and reported") {
    withTempTable { a => withTempTable { b =>
      (1L to 20L).map(i => (i, i % 4)).toDF("id", "grp")
        .write.format("graft").save(a)
      Seq((0L), (1L)).toDF("grp").write.format("graft").save(b)
      spark.read.format("graft").load(a).createOrReplaceTempView("ss_sub_a")
      spark.read.format("graft").load(b).createOrReplaceTempView("ss_sub_b")
      val (df, versions) = SnapshotSql.sqlWithVersions(spark,
        "SELECT count(*) AS c FROM ss_sub_a " +
          "WHERE grp IN (SELECT grp FROM ss_sub_b)")
      assert(versions.size == 2,
        s"subquery relation must carry a version pin: $versions")
      // mutate the subquery side AFTER the pin; the pinned frame must not
      // see it
      Seq((2L), (3L)).toDF("grp").write.format("graft")
        .mode("append").save(b)
      assert(df.as[Long].head() == 10L,
        "pinned subquery must see only grp in (0,1)")
    } }
  }

  test("non-graft relations pass through; zero graft relations reports " +
      "an empty version map") {
    Seq((1, "a")).toDF("id", "s").createOrReplaceTempView("ss_plain")
    val (df, versions) = SnapshotSql.sqlWithVersions(spark,
      "SELECT count(*) AS c FROM ss_plain")
    assert(versions.isEmpty)
    assert(df.as[Long].head() == 1L)
  }
}
