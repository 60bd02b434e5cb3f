package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** graft.ops.Relational: as-of join, bucketed range join, KMV sketch. */
class RelationalOpsSuite extends GraftFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def trades: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
      (2L, "A", ts("2024-01-01 10:00:30"), 101.0),
      (3L, "B", ts("2024-01-01 10:00:10"), 50.0),
      (4L, "C", ts("2024-01-01 10:00:10"), 7.0) // no quotes for C at all
    ).toDF("trade_id", "sym", "t_ts", "t_px")
  }

  private def quotes: DataFrame = {
    import spark.implicits._
    Seq(
      ("A", ts("2024-01-01 10:00:00"), 99.5),
      ("A", ts("2024-01-01 10:00:05"), 99.9), // tie with trade 1 → inclusive
      ("A", ts("2024-01-01 10:00:20"), 100.5),
      ("B", ts("2024-01-01 10:00:15"), 49.0) // after B's only trade
    ).toDF("q_sym", "q_ts", "q_px")
  }

  test("asOfJoin: backward inclusive, per-key, null when no prior row") {
    val out = Relational.asOfJoin(trades, quotes,
      leftKey = "sym", rightKey = "q_sym", leftTime = "t_ts",
      rightTime = "q_ts", payload = Seq("q_px"), asofTimeAlias = "q_at")
      .select(col("trade_id"), col("q_at"), col("q_px"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.get(2))))
      .toMap
    // trade 1: tie at 10:00:05 is inclusive → 99.9, not 99.5
    assert(out(1L) == (Some("2024-01-01 10:00:05.0"), Some(99.9)))
    // trade 2: latest quote at-or-before 10:00:30 is 10:00:20
    assert(out(2L) == (Some("2024-01-01 10:00:20.0"), Some(100.5)))
    // trade 3: B's only quote is later → no match
    assert(out(3L) == (None, None))
    // trade 4: key with no right rows → no match
    assert(out(4L) == (None, None))
  }

  test("asOfJoin: right rows tying on (key, time) resolve to greatest payload") {
    import spark.implicits._
    val l = Seq(("A", ts("2024-01-01 00:00:10"))).toDF("k", "lt")
    val r = Seq(
      ("A", ts("2024-01-01 00:00:05"), 1.0),
      ("A", ts("2024-01-01 00:00:05"), 3.0),
      ("A", ts("2024-01-01 00:00:05"), 2.0)).toDF("rk", "rt", "v")
    val out = Relational.asOfJoin(l, r, "k", "rk", "lt", "rt", Seq("v"))
    assert(out.select("v").as[Double].collect().toSeq == Seq(3.0))
  }

  test("asOfJoin: null-key and null-time right rows match nothing") {
    import spark.implicits._
    val l = Seq(
      (1L, Option("A"), ts("2024-01-01 00:01:00")),
      (2L, Option.empty[String], ts("2024-01-01 00:01:00")))
      .toDF("id", "k", "lt")
    val r = Seq(
      (Option("A"), Option(ts("2024-01-01 00:00:30")), 5.0),
      // null time: would sort FIRST in the window and leak into every row
      (Option("A"), Option.empty[java.sql.Timestamp], 9.0),
      // null key: SQL equi-join semantics — matches nothing, including
      // the null-key left row
      (Option.empty[String], Option(ts("2024-01-01 00:00:40")), 7.0))
      .toDF("rk", "rt", "v")
    val out = Relational.asOfJoin(l, r, "k", "rk", "lt", "rt", Seq("v"))
      .select("id", "v").collect()
      .map(row => row.getLong(0) -> Option(row.get(1))).toMap
    assert(out == Map(1L -> Some(5.0), 2L -> None))
  }

  test("asOfJoin: reserved internal names and payload collisions rejected") {
    import spark.implicits._
    val l = Seq(("A", ts("2024-01-01 00:01:00"), 1)).toDF("k", "lt", "__at")
    val r = Seq(("A", ts("2024-01-01 00:00:30"), 5.0)).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      Relational.asOfJoin(l, r, "k", "rk", "lt", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("__at"))
    val l2 = Seq(("A", ts("2024-01-01 00:01:00"), 0.0)).toDF("k", "lt", "v")
    val e2 = intercept[IllegalArgumentException] {
      Relational.asOfJoin(l2, r, "k", "rk", "lt", "rt", Seq("v"))
    }
    assert(e2.getMessage.contains("collide"))
  }

  test("asOfJoin: multi-column payload travels as one tuple") {
    import spark.implicits._
    val l = Seq((1L, "A", ts("2024-01-01 00:01:00"))).toDF("id", "k", "lt")
    val r = Seq(
      ("A", ts("2024-01-01 00:00:30"), 5.0, "early"),
      ("A", ts("2024-01-01 00:00:50"), 2.0, "late")).toDF("rk", "rt", "v", "tag")
    val row = Relational.asOfJoin(l, r, "k", "rk", "lt", "rt", Seq("v", "tag"))
      .select("v", "tag").collect().head
    // latest row wins as a unit — v and tag come from the SAME right row
    assert(row.getDouble(0) == 2.0 && row.getString(1) == "late")
  }

  test("asOfJoin: exactly one shuffle") {
    val out = Relational.asOfJoin(trades, quotes,
      "sym", "q_sym", "t_ts", "q_ts", Seq("q_px"))
    val plan = out.queryExecution.executedPlan
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1, plan.toString)
  }

  test("rangeJoin: containment exact at bucket boundaries") {
    import spark.implicits._
    // bucket = 60 s; interval spans 3 buckets; probes sit on the edges
    val iv = Seq((10L, ts("2024-01-01 00:00:30"), ts("2024-01-01 00:02:30")))
      .toDF("iv_id", "s", "e")
    val probes = Seq(
      (1L, ts("2024-01-01 00:00:29")), // just before start → out
      (2L, ts("2024-01-01 00:00:30")), // start inclusive → in
      (3L, ts("2024-01-01 00:01:00")), // interior, different bucket → in
      (4L, ts("2024-01-01 00:02:29")), // last µs-grain instant → in
      (5L, ts("2024-01-01 00:02:30")) // end exclusive → out
    ).toDF("p_id", "p_ts")
    val got = Relational.rangeJoin(probes, "p_ts", iv, "s", "e",
      bucketMicros = 60L * 1000000L)
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 4L))
  }

  test("rangeJoin: overlapping intervals each match; empty interval matches nothing") {
    import spark.implicits._
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      (2L, ts("2024-01-01 00:05:00"), ts("2024-01-01 00:15:00")),
      (3L, ts("2024-01-01 00:07:00"), ts("2024-01-01 00:07:00")) // empty
    ).toDF("iv_id", "s", "e")
    val probes = Seq((100L, ts("2024-01-01 00:07:00"))).toDF("p_id", "p_ts")
    val got = Relational.rangeJoin(probes, "p_ts", iv, "s", "e",
      bucketMicros = 600L * 1000000L)
      .select("iv_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("rangeJoin: equi-join on buckets, no nested-loop plan") {
    import spark.implicits._
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")))
      .toDF("iv_id", "s", "e")
    val probes = Seq((100L, ts("2024-01-01 00:07:00"))).toDF("p_id", "p_ts")
    val plan = Relational.rangeJoin(probes, "p_ts", iv, "s", "e",
      bucketMicros = 600L * 1000000L).queryExecution.executedPlan
    val nested = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nested.isEmpty, plan.toString)
  }

  test("rangeJoin: rejects shared column names") {
    import spark.implicits._
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")))
      .toDF("id", "s", "e")
    val probes = Seq((100L, ts("2024-01-01 00:07:00"))).toDF("id", "p_ts")
    val e = intercept[IllegalArgumentException] {
      Relational.rangeJoin(probes, "p_ts", iv, "s", "e", 600000000L)
    }
    assert(e.getMessage.contains("id"))
  }

  test("sessionize: gap boundary is exclusive, sessions count per key") {
    import spark.implicits._
    val gap = 60L * 1000000L // 1 minute
    val df = Seq(
      ("u1", ts("2024-01-01 00:00:00")),
      ("u1", ts("2024-01-01 00:01:00")), // gap == 60s exactly → SAME session
      ("u1", ts("2024-01-01 00:02:01")), // gap 61s → new session
      ("u2", ts("2024-01-01 00:00:30")) // separate key → its own session 1
    ).toDF("k", "t")
    val got = Relational.sessionize(df, "k", "t", gap)
      .select("k", "t", "session_id")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2))).toSet
    assert(got == Set(
      ("u1", "2024-01-01 00:00:00.0", 1L),
      ("u1", "2024-01-01 00:01:00.0", 1L),
      ("u1", "2024-01-01 00:02:01.0", 2L),
      ("u2", "2024-01-01 00:00:30.0", 1L)))
  }

  test("sessionize: tied timestamps share a session") {
    import spark.implicits._
    val df = Seq(
      (1L, "u", ts("2024-01-01 00:00:00")),
      (2L, "u", ts("2024-01-01 01:00:00")), // new session (gap 1 h > 1 min)
      (3L, "u", ts("2024-01-01 01:00:00")) // tie → same session as 2
    ).toDF("id", "k", "t")
    val bySess = Relational
      .sessionize(df, "k", "t", 60L * 1000000L, tieBreak = Seq("id"))
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    assert(bySess(2L) == bySess(3L))
    assert(bySess(1L) != bySess(2L))
  }

  test("discQuantiles: explicit-rank selection and column naming") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++ Seq(("b", 42L)))
      .toDF("g", "v")
    val out = Relational
      .discQuantiles(df, Seq("g"), "v", Seq(0.5, 0.9, 0.999))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("p50"), r.getAs[Long]("p90"),
          r.getAs[Long]("p99_9"))).toMap
    // ceil(0.5*100)=50, ceil(0.9*100)=90, ceil(0.999*100)=100
    assert(out("a") == ((100L, 50L, 90L, 100L)))
    // single-row group: every quantile is that row
    assert(out("b") == ((1L, 42L, 42L, 42L)))
  }

  test("discQuantiles: exact decimal ranks — no double round-off drift") {
    import spark.implicits._
    // ceil(0.07 * 100) must be 7; the double product is 7.000000000000001
    // and would select the 8th-ranked value
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "v")
    val out = Relational.discQuantiles(df, Seq("g"), "v", Seq(0.07, 0.007))
      .collect().head
    assert(out.getAs[Long]("p7") == 7L)
    // 0.007 names as p0_7 (decimal, not 0.7000000000000001) with rank
    // ceil(0.7) = 1
    assert(out.getAs[Long]("p0_7") == 1L)
  }

  test("discQuantiles: NULL values excluded from ranks and counts") {
    import spark.implicits._
    val df = Seq(("g", Option.empty[Long]), ("g", Some(10L)),
      ("g", Some(20L)), ("g", Some(30L)), ("h", Option.empty[Long]))
      .toDF("g", "v")
    val rows = Relational.discQuantiles(df, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("p50"))).toMap
    // n counts non-nulls only; the median of {10,20,30} is 20 (rank 2),
    // not 10 (which a NULLS-FIRST rank shift would return)
    assert(rows == Map("g" -> ((3L, 20L))))
    // all-null group is absent, SQL-aggregate style
    assert(!rows.contains("h"))
  }

  test("discQuantiles: reserved and colliding names rejected") {
    import spark.implicits._
    val df = Seq(("g", 1L, 2L)).toDF("g", "v", "__qn")
    intercept[IllegalArgumentException] {
      Relational.discQuantiles(df, Seq("g"), "v", Seq(0.5))
    }
    val df2 = Seq(("g", 1L)).toDF("n", "v")
    intercept[IllegalArgumentException] {
      Relational.discQuantiles(df2, Seq("n"), "v", Seq(0.5))
    }
    intercept[IllegalArgumentException] { // 0.5 and 0.50 → both p50
      Relational.discQuantiles(Seq(("g", 1L)).toDF("g", "v"),
        Seq("g"), "v", Seq(0.5, 0.50))
    }
  }

  test("sessionize: string times order temporally; null times are singletons") {
    import spark.implicits._
    // lexicographic order would put 2024-1-10 before 2024-1-2
    val df = Seq(
      (1L, "u", "2024-01-02 00:00:00"),
      (2L, "u", "2024-01-10 00:00:00"),
      (3L, "u", null)
    ).toDF("id", "k", "t")
    val out = Relational
      .sessionize(df, "k", "t", 86400L * 1000000L, tieBreak = Seq("id"))
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    // 8-day gap splits 1 and 2; the null-time row is its own session
    assert(out.values.toSet.size == 3, out.toString)
  }

  test("kmvDistinct: below k the sketch is the exact distinct count") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i % 7)).toDF("grp", "v")
    val row = Relational.kmvDistinct(df, Seq("grp"), "v", k = 64)
      .collect().head
    assert(row.getAs[Long]("n_kept") == 7L)
    assert(row.getAs[Long]("est_distinct") == 7L)
  }

  test("kmvDistinct: estimate lands near truth, deterministically") {
    import spark.implicits._
    val n = 5000
    val df = (1 to n).map(i => ("g", i)).toDF("grp", "v")
    val est1 = Relational.kmvDistinct(df, Seq("grp"), "v", k = 256)
      .collect().head.getAs[Long]("est_distinct")
    val est2 = Relational.kmvDistinct(df.repartition(7), Seq("grp"), "v",
      k = 256).collect().head.getAs[Long]("est_distinct")
    // ±3 standard errors at k=256 is ~19%
    assert(math.abs(est1 - n).toDouble / n < 0.19, s"est=$est1")
    assert(est1 == est2) // partitioning-independent: no RNG anywhere
  }

  test("kmvDistinct: per-group isolation") {
    import spark.implicits._
    val df = ((1 to 50).map(i => ("a", i)) ++ (1 to 3).map(i => ("b", i)))
      .toDF("grp", "v")
    val byGrp = Relational.kmvDistinct(df, Seq("grp"), "v", k = 16)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    assert(byGrp == Map("a" -> 16L, "b" -> 3L))
  }
}
