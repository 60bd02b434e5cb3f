package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingOps

/** Stateful streaming operators (flatMapGroupsWithState): sessionization
  * semantics, watermark-driven close, disorder within the watermark, and
  * equivalence with the batch sessionizer's grouping.
  */
class StreamingOpsSuite extends GraftFunSuite {
  import spark.implicits._

  private def classicSpark =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  // offset all test times away from epoch 0: the stateful operator's
  // late-row filter drops rows at-or-below the watermark, and the INITIAL
  // watermark is 0 — an epoch-0 event would be "late" before any data
  private val Base = 100000L
  private def ts(s: Long): Timestamp = new Timestamp((Base + s) * 1000L)

  private def sessions(name: String): Set[(String, Long, Long, Long)] =
    spark.table(name).collect().map(r => (
      r.getString(0),
      r.getTimestamp(1).getTime / 1000L - Base,
      r.getTimestamp(2).getTime / 1000L - Base,
      r.getLong(3))).toSet

  /** The watermark-advance no-data batch (which fires timeouts) may commit
    * shortly AFTER processAllAvailable returns — poll briefly for the
    * expected stable state instead of asserting the race. */
  private def awaitSessions(
      name: String, expected: Set[(String, Long, Long, Long)]): Unit = {
    val deadline = System.nanoTime() + 30L * 1000000000L
    var got = sessions(name)
    while (got != expected && System.nanoTime() < deadline) {
      Thread.sleep(200)
      got = sessions(name)
    }
    assert(got == expected, s"got $got, expected $expected")
  }

  test("sessions close only when the watermark passes end + gap; " +
      "in-watermark disorder merges; silence closes via timeout") {
    implicit val ctx = classicSpark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val name = "so_sessions_1"
    val q = StreamingOps.sessionize(input.toDF().toDF("key", "t"),
        "key", "t", gapMicros = 60L * 1000000, watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user a: events at 0s, 30s (one session); user b: one event at 10s
      input.addData(("a", ts(0)), ("a", ts(30)), ("b", ts(10)))
      q.processAllAvailable()
      assert(sessions(name).isEmpty,
        "nothing may close before the watermark passes end + gap")

      // out-of-order-but-in-watermark event for a (28s > wm 25s) must
      // merge into the open [0,30] session, not open a new one; the
      // far-future event advances the watermark past everything:
      // wm = 500-5 = 495 > {30,10}+60
      input.addData(("a", ts(28)), ("c", ts(500)))
      q.processAllAvailable()
      awaitSessions(name, Set(("a", 0L, 30L, 3L), ("b", 10L, 10L, 1L)))

      // pure silence for c: its session must close via the event-time
      // TIMEOUT when another key's event advances the watermark
      input.addData(("d", ts(1000)))
      q.processAllAvailable()
      awaitSessions(name,
        Set(("a", 0L, 30L, 3L), ("b", 10L, 10L, 1L), ("c", 500L, 500L, 1L)))
    } finally q.stop()
  }

  test("sub-millisecond gaps honor the micros contract") {
    implicit val ctx = classicSpark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val name = "so_sessions_us"
    def tsMicros(us: Long): Timestamp = {
      val t = new Timestamp(Base * 1000L + us / 1000)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val q = StreamingOps.sessionize(input.toDF().toDF("key", "t"),
        "key", "t", gapMicros = 1000L, watermarkDelay = "1 second")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // events 1500us apart with a 1000us gap: two singleton sessions —
      // millisecond truncation would see them 1000us apart and merge
      input.addData(("k", tsMicros(0)), ("k", tsMicros(1500)))
      input.addData(("zz", ts(100))) // watermark push
      q.processAllAvailable()
      val deadline = System.nanoTime() + 30L * 1000000000L
      def k_sessions() = spark.table(name)
        .filter(org.apache.spark.sql.functions.col("key") === "k")
        .collect().map(_.getLong(3)).toSeq
      var got = k_sessions()
      while (got != Seq(1L, 1L) && System.nanoTime() < deadline) {
        Thread.sleep(200); got = k_sessions()
      }
      assert(got == Seq(1L, 1L),
        s"1500us-apart events with 1000us gap must form 2 sessions: $got")
    } finally q.stop()
  }

  test("gap splitting matches the batch sessionizer on the same events") {
    implicit val ctx = classicSpark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val name = "so_sessions_2"
    val q = StreamingOps.sessionize(input.toDF().toDF("key", "t"),
        "key", "t", gapMicros = 60L * 1000000, watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // u1: 0,30,200 (gap 60s -> sessions [0,30] and [200]); u2: 5,100
      val events = Seq(
        ("u1", ts(0)), ("u1", ts(30)), ("u1", ts(200)),
        ("u2", ts(5)), ("u2", ts(100)))
      input.addData(events: _*)
      input.addData(("zz", ts(10000))) // watermark push
      q.processAllAvailable()

      val expected = {
        import org.apache.spark.sql.functions._
        graft.ops.Relational.sessionize(
            events.toDF("key", "t"), "key", "t", gapMicros = 60L * 1000000)
          .groupBy("key", "session_id")
          .agg((min(unix_seconds(col("t"))) - Base).as("s"),
            (max(unix_seconds(col("t"))) - Base).as("e"),
            count(lit(1)).as("c"))
          .select("key", "s", "e", "c")
          .as[(String, Long, Long, Long)].collect().toSet
      }
      val deadline = System.nanoTime() + 30L * 1000000000L
      var streamed = sessions(name).filterNot(_._1 == "zz")
      while (streamed != expected && System.nanoTime() < deadline) {
        Thread.sleep(200)
        streamed = sessions(name).filterNot(_._1 == "zz")
      }
      assert(streamed == expected, s"streamed $streamed vs batch $expected")
    } finally q.stop()
  }
}
