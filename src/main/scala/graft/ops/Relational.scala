package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as built-ins, composed from shuffle-
  * aware primitives so they hold at 100 TB. Three families:
  *
  *  - '''as-of join''' (backward, inclusive): for each left row, the
  *    latest right row with the same key and `rightTime <= leftTime`.
  *    Implemented as union + carry-forward window — ONE hash shuffle on
  *    the key and an in-partition sort, never an inequality join (whose
  *    equi-key hash build degenerates to per-key cross products when keys
  *    are hot) and never a broadcast nested loop.
  *  - '''range join''' (interval containment, no equi key): probe rows
  *    against `[start, end)` intervals. Each interval is exploded onto the
  *    fixed-width time buckets it covers, probes map to their single
  *    bucket, and an equi-join on the bucket plus an exact residual filter
  *    replaces the nested loop. Cost is pairs-that-could-match, not
  *    |probe| × |intervals|.
  *  - '''KMV distinct sketch''': k-minimum-values cardinality estimate
  *    from md5-derived 60-bit hashes. Fully deterministic (no seed, no
  *    RNG), so an external engine replaying the same md5 arithmetic
  *    reproduces the estimate bit-for-bit — the sketch is oracle-able,
  *    unlike HLL whose register layout is engine-private.
  */
object Relational {

  /** Backward as-of join, inclusive on ties.
    *
    * For every `left` row: the payload of the latest `right` row whose
    * `rightKey` equals the row's `leftKey` and whose `rightTime` is
    * `<= leftTime`; `null`s when no such row exists. The result carries
    * every `left` column, the matched time as `asofTimeAlias`, and the
    * requested `payload` columns.
    *
    * Right rows sharing one `(key, time)` resolve to the greatest payload
    * tuple (deterministic last-wins) — an as-of answer must be a function
    * of the data, not of partition iteration order. The tiebreak costs
    * nothing: it is one more sort column in the window ordering, not a
    * pre-aggregation pass.
    *
    * Scale shape: both sides union and shuffle ONCE on the key, and a
    * running `last(_, ignoreNulls)` over `(time, side, payload)` carries
    * each right payload forward to the left rows that follow it. Per-key
    * work is a sort — no per-key cross product, no broadcast requirement
    * on either side. Skewed keys cost one partition's sort, not a
    * quadratic join.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      asofTimeAlias: String = "asof_time"): DataFrame = {
    require(payload.nonEmpty, "asOfJoin needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains(asofTimeAlias),
      s"left side already has a column named $asofTimeAlias")
    val reserved = Seq("__ak", "__at", "__ap", "__aside", "__asof")
    val clash = leftCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"left side uses asOfJoin's reserved column name(s) ${clash.mkString(", ")}")
    val payClash = payload.filter(leftCols.contains)
    require(payClash.isEmpty,
      s"payload column(s) ${payClash.mkString(", ")} collide with left-side " +
      "columns; alias one side first")
    val payStruct = struct(payload.map(right(_)): _*)
    // SQL semantics: a NULL key matches nothing (equi-join three-valued
    // logic) and a NULL time satisfies no `rightTime <= leftTime` — but in
    // the union encoding a null-key right row would share the null key
    // GROUP and a null-time row sorts FIRST (carried into every left row),
    // so both must leave before the union
    val r = right
      .filter(right(rightKey).isNotNull && right(rightTime).isNotNull)
      .select(
        right(rightKey).as("__ak"), right(rightTime).as("__at"),
        payStruct.as("__ap"), lit(0).as("__aside"))
    val l = left
      .withColumn("__ak", left(leftKey))
      .withColumn("__at", left(leftTime))
      .withColumn("__aside", lit(1))
    // right-before-left on equal timestamps makes the bound inclusive;
    // ascending payload last makes the greatest tuple the one last()
    // carries when right rows tie on (key, time)
    val w = Window.partitionBy(col("__ak"))
      .orderBy(col("__at").asc, col("__aside").asc, col("__ap").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = struct(col("__at").as("t"), col("__ap").as("p"))
    r.unionByName(l, allowMissingColumns = true)
      .withColumn("__asof",
        last(when(col("__aside") === 0, carried), ignoreNulls = true).over(w))
      .filter(col("__aside") === 1)
      .select(leftCols.map(col) ++
        (col("__asof").getField("t").as(asofTimeAlias) +:
          payload.map(p =>
            col("__asof").getField("p").getField(p).as(p))): _*)
  }

  /** Interval containment join without an equi key: every `(probe,
    * interval)` pair with `start <= probeTime < end`, inner, carrying all
    * columns of both sides (disambiguate names before calling).
    *
    * `bucketMicros` is the equi-join granule: intervals explode onto the
    * buckets they cover (`floor(start/w) .. floor((end-1µs)/w)`), probes
    * map to exactly one bucket, and the residual containment filter runs
    * after the bucket equi-join. Pick a width near the typical interval
    * length — an interval then lands on ~2 buckets, and join fan-out
    * tracks the true match count instead of |probe| × |intervals|. Both
    * sides shuffle once on the bucket; no nested-loop plan at any size.
    * Empty intervals (`end <= start`) match nothing, as containment
    * dictates.
    */
  def rangeJoin(
      probe: DataFrame,
      probeTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val overlap = probe.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"rangeJoin: rename the shared column(s) ${overlap.mkString(", ")} first")
    def bucketOf(t: Column): Column =
      floor(unix_micros(t.cast("timestamp")) / bucketMicros)
    val iv = intervals
      .filter(col(endCol).cast("timestamp") > col(startCol).cast("timestamp"))
      .withColumn("__rb",
        explode(sequence(bucketOf(col(startCol)),
          bucketOf(timestamp_micros(
            unix_micros(col(endCol).cast("timestamp")) - 1)))))
    val pb = probe.withColumn("__rb", bucketOf(col(probeTime)))
    pb.join(iv, Seq("__rb"))
      .filter(col(probeTime).cast("timestamp") >= col(startCol).cast("timestamp") &&
        col(probeTime).cast("timestamp") < col(endCol).cast("timestamp"))
      .drop("__rb")
  }

  /** Gap-based sessionization: append a per-key session index to every
    * row. A new session starts at a key's first event and whenever the gap
    * from the previous event exceeds `gapMicros`.
    *
    * Timestamp ties: within ONE engine the break flag and the running sum
    * share a single window sort, so tied rows always land in the same
    * session (the first-visited tie takes the break decision against the
    * earlier DISTINCT timestamp; the rest see gap 0 and follow). An
    * engine REPLAYING the formula in two separate sorts (e.g. a SQL
    * oracle's stacked CTEs) can visit ties in different orders between
    * the two levels and split them — pass `tieBreak` (a unique column)
    * to pin one visit order everywhere when cross-engine reproducibility
    * matters.
    *
    * Scale shape: ONE shuffle on the key, an in-partition sort, two
    * running windows. Session analytics then reduce per (key, session) —
    * map-side combinable. Per-key cost is that key's own event count. */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      gapMicros: Long,
      sessionCol: String = "session_id",
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    require(!df.columns.contains(sessionCol),
      s"input already has a column named $sessionCol")
    val t = unix_micros(col(timeCol).cast("timestamp"))
    // order by the SAME casted expression the gap reads — for a castable-
    // but-not-timestamp column (string times) a raw-column sort would be
    // lexicographic while the gaps are temporal
    val w = Window.partitionBy(col(keyCol))
      .orderBy(t.asc +: tieBreak.map(col(_).asc): _*)
    val prev = lag(t, 1).over(w)
    // a NULL time satisfies no gap comparison: such rows become singleton
    // sessions (brk = 1 for them AND for the first real-time row after
    // them, whose prev is the null) instead of silently gluing onto
    // whatever three-valued logic made of `null > gap`
    val brk = when(prev.isNull || t.isNull || t - prev > gapMicros, 1L)
      .otherwise(0L)
    df.withColumn(sessionCol,
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Exact discrete quantiles per group: for each probability `p`, the
    * value at sorted position `ceil(p * n)` (1-based) — the explicit rank
    * formula, NOT `percentile_disc`, because the SQL-standard function
    * leaves the discrete-selection convention to the engine and two
    * engines disagreeing at a boundary row would be undetectable
    * noise; the rank arithmetic is the same everywhere. Tied values make
    * the boundary row's VALUE unambiguous regardless of tie order.
    *
    * Returns `groupCols :+ n :+ p<NN> per requested quantile` (p named by
    * percent, e.g. 0.5 → `p50`; fractional percents get the dot stripped,
    * 0.999 → `p99_9`).
    *
    * Scale shape: one shuffle on the group key + in-partition sort (the
    * cost floor for EXACT quantiles — rank selection needs total order
    * within each group), then a map-side-combinable conditional aggregate.
    * When an approximation is acceptable at 100 TB, Spark's
    * `percentile_approx` avoids the sort — but its sketch is
    * engine-private, so exactness here is also what makes the operator
    * oracle-able. */
  def discQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "quantile probabilities must be in (0, 1]")
    // p as the exact decimal its source text denotes — double arithmetic
    // would pick the wrong row for many p (ceil(0.07 * 100.0) = 8.0: the
    // product is 7.000000000000001) and break both the documented
    // contract and any exact-decimal replay (DuckDB parses 0.07 as
    // DECIMAL). Decimal × bigint stays exact, so ceil is the true rank.
    def pDec(p: Double): java.math.BigDecimal =
      new java.math.BigDecimal(p.toString)
    def pName(p: Double): String =
      "p" + (BigDecimal(pDec(p)) * 100).underlying.stripTrailingZeros
        .toPlainString.replace(".", "_")
    val names = ps.map(pName)
    require(names.distinct == names,
      s"duplicate quantile columns: ${names.mkString(", ")}")
    require(!df.columns.contains("__qrn") && !df.columns.contains("__qn"),
      "input uses discQuantiles' reserved column names __qrn/__qn")
    require(!groupCols.contains("n") && !groupCols.exists(names.contains),
      s"group column collides with an output column (n, ${names.mkString(", ")})")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol))
    // NULL values are excluded, per SQL aggregate convention: unfiltered
    // they would sort FIRST and both occupy low ranks and inflate n; a
    // group with no non-null values is absent from the output
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .withColumn("__qrn", row_number().over(w))
      .withColumn("__qn",
        count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
    val qAggs = ps.map { p =>
      max(when(col("__qrn") ===
        greatest(lit(1L), ceil(lit(pDec(p)) * col("__qn")).cast("long")),
        col(valueCol))).as(pName(p))
    }
    ranked.groupBy(groupCols.map(col): _*)
      .agg(max(col("__qn")).as("n"), qAggs: _*)
  }

  /** K-minimum-values distinct-count sketch, per group.
    *
    * Hash: the first 15 hex digits of `md5(cast(value as string))` read as
    * a base-16 integer — 60 uniform bits, zero configuration, and exactly
    * reproducible by any engine with md5 (the DuckDB oracle rebuilds the
    * identical sketch). Estimate: with the k smallest distinct hashes and
    * `kth` their maximum, `floor((k-1) * 2^60 / kth)`; groups with fewer
    * than k distinct hashes report the exact count (the sketch IS the full
    * distinct set there). Standard error ~ `1/sqrt(k-2)` (Bar-Yossef et
    * al., "Counting distinct elements in a data stream", RANDOM 2002).
    *
    * Returns `groupCols :+ (n_kept, kth_hash, est_distinct)`.
    *
    * Scale shape: `distinct` over `(group, hash)` partial-aggregates
    * map-side, so the shuffle carries at most one row per distinct value —
    * afterwards per-group top-k is a window over data already bounded by
    * the distinct cardinality, never by row count. At 100 TB the wire cost
    * is the distinct set, and a pre-`limit`-per-partition refinement can
    * bound even that if cardinality itself explodes.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__kh"))
    val pow60 = 1152921504606846976.0 // 2^60, exact in a double
    df.select(groupCols.map(col) :+ h.as("__kh"): _*)
      .distinct()
      .withColumn("__krn", row_number().over(w))
      .filter(col("__krn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("__kh")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(pow60) /
            col("kth_hash").cast("double")).cast("long")))
  }
}
