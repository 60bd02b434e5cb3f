package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Property fuzz for the relational family: the shuffle-safe encodings in
  * `Relational` (as-of = union + carry-forward window, range join = bucket
  * explode + residual, sessionize = lag/sum windows, quantiles = exact rank
  * arithmetic, KMV = md5 order statistics) are each argued equivalent to a
  * straightforward spelling in code comments — this suite ASSERTS it over
  * randomized corpora stuffed with the degenerate shapes those arguments
  * lean on: nulls in keys and times, heavy ties, empty and point
  * intervals, single-row groups, empty sides.
  *
  * References: as-of and range join check against Spark's own naive
  * inequality-join spelling; sessionize / quantiles / KMV check against
  * independent driver-side folds over the same rows (tiny corpora — the
  * reference can afford to be O(n²) and obviously-correct).
  */
class RelationalFuzzSuite extends GraftFunSuite {

  private val TRIALS = 100

  // one master RNG: sequentially-seeded Random instances are correlated
  private val rnd = new scala.util.Random(4242)

  private def optLong(nullFrac: Double, range: Int): Option[Long] =
    if (rnd.nextDouble() < nullFrac) None else Some(rnd.nextInt(range).toLong)

  test(s"asOfJoin == naive inequality join + per-row rank ($TRIALS corpora)") {
    import spark.implicits._
    (1 to TRIALS).foreach { trial =>
      val nl = rnd.nextInt(30) // 0..29 rows: includes empty sides
      val nr = rnd.nextInt(30)
      val keyDom = 1 + rnd.nextInt(4) // tiny domain => hot keys, ties
      val timeDom = 1 + rnd.nextInt(8)
      val leftRows = (0 until nl).map(i =>
        (i.toLong, optLong(0.1, keyDom), optLong(0.1, timeDom)))
      val rightRows = (0 until nr).map(i =>
        (optLong(0.1, keyDom), optLong(0.1, timeDom),
          rnd.nextInt(3).toLong, rnd.nextInt(3).toLong))
      val left = leftRows.toDF("lid", "k", "t")
      val right = rightRows.toDF("rk", "rt", "pv1", "pv2")

      val got = Relational.asOfJoin(left, right, "k", "rk", "t", "rt",
          payload = Seq("pv1", "pv2"))
        .select("lid", "asof_time", "pv1", "pv2")
        .as[(Long, Option[Long], Option[Long], Option[Long])]
        .collect().toSeq.sortBy(_._1)

      // the straightforward spelling: left-outer inequality join, then the
      // greatest (rt, pv1, pv2) tuple per left row
      val j = left.join(right,
        left("k") === right("rk") && right("rt") <= left("t"), "left_outer")
      val w = Window.partitionBy("lid")
        .orderBy(col("rt").desc_nulls_last, col("pv1").desc_nulls_last,
          col("pv2").desc_nulls_last)
      val want = j.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("lid"), col("rt").as("asof_time"), col("pv1"), col("pv2"))
        .as[(Long, Option[Long], Option[Long], Option[Long])]
        .collect().toSeq.sortBy(_._1)
        // unmatched rows keep lid with all-null right side in both spellings
        .map { case (lid, t, a, b) =>
          if (t.isEmpty) (lid, None, None, None) else (lid, t, a, b) }

      assert(got == want,
        s"trial $trial (nl=$nl nr=$nr kd=$keyDom td=$timeDom):\n" +
        s" got  $got\n want $want")
    }
  }

  test(s"rangeJoin == naive inequality join ($TRIALS corpora)") {
    import spark.implicits._
    (1 to TRIALS).foreach { trial =>
      val np = rnd.nextInt(25)
      val ni = rnd.nextInt(15)
      val span = 1 + rnd.nextInt(40) // micros domain
      val bucket = Seq(1L, 3L, 7L, 1000L)(rnd.nextInt(4))
      val probeRows = (0 until np).map(i =>
        (i.toLong, optLong(0.1, span)))
      // intervals include empty (end <= start), point (end = start + 1),
      // null endpoints, and spans wider than several buckets
      val ivRows = (0 until ni).map { i =>
        val s = optLong(0.1, span)
        val e = optLong(0.1, span + 10)
        (100L + i, s, e)
      }
      val probe = probeRows.toDF("pid", "pt_us")
        .withColumn("pt", timestamp_micros(col("pt_us"))).drop("pt_us")
      val iv = ivRows.toDF("iid", "s_us", "e_us")
        .withColumn("ivs", timestamp_micros(col("s_us")))
        .withColumn("ive", timestamp_micros(col("e_us")))
        .drop("s_us", "e_us")

      val got = Relational.rangeJoin(probe, "pt", iv, "ivs", "ive", bucket)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      val want = probe.join(iv,
          col("pt") >= col("ivs") && col("pt") < col("ive"))
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want,
        s"trial $trial (np=$np ni=$ni bucket=$bucket): got $got want $want")
    }
  }

  test(s"sessionize == driver fold over the pinned order ($TRIALS corpora)") {
    import spark.implicits._
    (1 to TRIALS).foreach { trial =>
      val n = rnd.nextInt(40)
      val keyDom = 1 + rnd.nextInt(3)
      val timeDom = 1 + rnd.nextInt(10) // dense => many exact ties
      val gap = 1L + rnd.nextInt(4)
      val rows = (0 until n).map(i =>
        (i.toLong, rnd.nextInt(keyDom).toLong, optLong(0.15, timeDom)))
      val df = rows.toDF("eid", "k", "t_us")
        .withColumn("t", timestamp_micros(col("t_us"))).drop("t_us")

      val got = Relational.sessionize(df, "k", "t", gapMicros = gap,
          tieBreak = Seq("eid"))
        .select("eid", "session_id").as[(Long, Long)].collect().toMap

      // driver fold: per key, events in (time, eid) order with nulls
      // first (Spark's default asc null ordering); a session breaks at the
      // first event, on any null time on either side of the gap, and when
      // the gap exceeds `gap`
      val want = rows.groupBy(_._2).flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._3.isDefined, e._3.getOrElse(0L), e._1))
        var sid = 0L
        var prev: Option[Long] = None
        var first = true
        sorted.map { case (eid, _, t) =>
          val brk = first || t.isEmpty || prev.isEmpty ||
            (t.get - prev.get) > gap
          if (brk) sid += 1
          first = false
          prev = t
          eid -> sid
        }
      }
      assert(got == want,
        s"trial $trial (n=$n kd=$keyDom td=$timeDom gap=$gap): " +
        s"got $got want $want")
    }
  }

  test(s"discQuantiles == driver rank selection ($TRIALS corpora)") {
    import spark.implicits._
    val pPool = Seq(0.01, 0.07, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)
    (1 to TRIALS).foreach { trial =>
      val n = rnd.nextInt(50)
      val keyDom = 1 + rnd.nextInt(3)
      val ps = rnd.shuffle(pPool).take(1 + rnd.nextInt(3)).sorted
      val rows = (0 until n).map(i =>
        (rnd.nextInt(keyDom).toLong, optLong(0.2, 6)))
      val df = rows.toDF("g", "v")
      val out = Relational.discQuantiles(df, Seq("g"), "v", ps)
      val names = out.columns.drop(2) // g, n, p...
      val got = out.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), names.indices.map(i =>
          r.getLong(2 + i)).toSeq)).toMap

      val want = rows.groupBy(_._1).flatMap { case (g, evs) =>
        val vs = evs.flatMap(_._2).sorted
        if (vs.isEmpty) None
        else Some(g -> ((vs.size.toLong, ps.map { p =>
          val rank = (BigDecimal(new java.math.BigDecimal(p.toString)) *
            vs.size).setScale(0, BigDecimal.RoundingMode.CEILING).toInt
          vs(math.max(1, rank) - 1)
        })))
      }
      assert(got == want,
        s"trial $trial (n=$n ps=$ps): got $got want $want")
    }
  }

  test(s"kmvDistinct == driver md5 order statistics ($TRIALS corpora)") {
    import spark.implicits._
    (1 to TRIALS).foreach { trial =>
      val n = rnd.nextInt(60)
      val keyDom = 1 + rnd.nextInt(3)
      val k = 2 + rnd.nextInt(6) // small k => the estimate branch triggers
      val rows = (0 until n).map(i =>
        (rnd.nextInt(keyDom).toLong, rnd.nextInt(25).toLong))
      val df = rows.toDF("g", "v")
      val got = Relational.kmvDistinct(df, Seq("g"), "v", k)
        .select("g", "n_kept", "kth_hash", "est_distinct")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted

      def h(v: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(v.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }
      val want = rows.groupBy(_._1).map { case (g, evs) =>
        val hs = evs.map(e => h(e._2)).distinct.sorted.take(k)
        val kth = hs.max
        val est =
          if (hs.size < k) hs.size.toLong
          else math.floor((k - 1).toDouble * 1152921504606846976.0 /
            kth.toDouble).toLong
        (g, hs.size.toLong, kth, est)
      }.toSeq.sorted
      assert(got == want, s"trial $trial (n=$n k=$k): got $got want $want")
    }
  }
}
