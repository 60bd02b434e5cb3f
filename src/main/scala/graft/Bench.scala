package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: builds the graft tables (untimed warm-up — conversion is
  * a one-time cost, not query latency), then times every declared query and
  * prints one JSON line. A failing query records -1 for its time and is
  * listed in "errors" instead of silently folding into the total.
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and reports
  * the per-query MEDIAN; the total is the sum of medians. A single run is
  * hostage to host contention — one noisy neighbour turned a 29 s suite
  * into 100 s in a past round — and the median of three is robust to one
  * polluted run in either direction. The runs are INTERLEAVED round-robin
  * (pass 1 of every query, then pass 2, ...) rather than back-to-back:
  * three consecutive runs of one query all fit inside a single sustained
  * contention window, so their median is still polluted; spreading a
  * query's runs across the whole suite amortizes any window over many
  * queries' samples instead of concentrating it on one victim. Per-run
  * times go to stderr.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // write MICROS (not legacy INT96) timestamps AND let the parquet
      // filter builder assume micros — pushdown eligibility is derived
      // from the session's assumed output type, not the file
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // spark.sql.files.openCostInBytes deliberately stays at Spark's
      // default: an A/B/C sweep (128K/512K/4M over the 12 split-sensitive
      // queries) showed smaller open costs trade scan-agg wins for equal
      // losses on the one-shuffle queries (more tiny map tasks) at sf0.1
      .config("spark.sql.extensions", "graft.rules.GraftSparkSessionExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val w0 = System.nanoTime()
    Queries.warm(spark, sfDir) // untimed: one-time table conversion
    System.err.println(f"[bench] warm-up took ${(System.nanoTime() - w0) / 1e9}%.1f s")

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // dev loop: SPARK_GRAFT_BENCH_FILTER=q_a,q_b times just those queries
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => filter.forall(_.contains(q._1)))
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)

    def runOnce(name: String, fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame, label: String): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name $label failed: ${e.getMessage}")
          false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name $label: $secs%.2f s")
      // result consumed: drop the run's stabilized pipeline blocks so the
      // block manager stays flat across the whole suite
      graft.llm.Checkpoints.releaseAll()
      if (ok) Some(secs) else None
    }

    // untimed warm-up rep: one discarded pass over every query so JIT
    // compilation, codegen class-loading and page-cache first-touch never
    // land in a timed sample — they inflated median-over-min gaps to 30%
    // in past rounds and made round-over-round comparison chase noise
    for ((name, fn) <- queries) runOnce(name, fn, "warmup")

    for (pass <- 1 to runs; (name, fn) <- queries) {
      runOnce(name, fn, s"pass $pass").foreach(s =>
        samples(name) = samples(name) :+ s)
    }

    // SPARK_GRAFT_BENCH_MODE=warm: AFTER the interleaved passes, run each
    // query's passes BACK-TO-BACK and report that floor alongside — the
    // interleaved min measures "warmest pass amid other work" while this
    // measures steady-state warm capability (JIT + page cache + shuffle
    // dirs all settled on this one query).
    val warmMode = sys.env.get("SPARK_GRAFT_BENCH_MODE").exists(_ == "warm")
    val warmFloor = scala.collection.mutable.Map.empty[String, Double]
    val warmFailed = scala.collection.mutable.ArrayBuffer.empty[String]
    if (warmMode) {
      for ((name, fn) <- queries) {
        val times = (1 to runs).flatMap(i => runOnce(name, fn, s"warm $i"))
        if (times.nonEmpty) warmFloor(name) = times.min
        else warmFailed += name // surfaced: absent-from-warm != failed
      }
    }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val flaky = scala.collection.mutable.ArrayBuffer.empty[String]
    // median ≈ robust-typical under interleaving; MIN ≈ warm capability
    // (the warmest pass of each query) — report both so a partially-warm
    // measurement point doesn't read as a regression vs a fully-warm one.
    val results = queries.map { case (name, _) =>
      val times = samples(name)
      if (times.isEmpty) errors += name
      else if (times.size < runs) flaky += name // some runs failed
      val median =
        if (times.isEmpty) -1.0
        else times.sorted.apply((times.size - 1) / 2)
      val min = if (times.isEmpty) -1.0 else times.min
      System.err.println(f"[bench] $name median: $median%.2f s  min: $min%.2f s")
      (name, median, min)
    }
    val qs = results.map { case (k, med, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, _, min) => "\"" + k + "\":" + min }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, med, _) if med >= 0 => med }.sum
    val totalMin = results.collect { case (_, _, min) if min >= 0 => min }.sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flakyJson = flaky.map("\"" + _ + "\"").mkString("[", ",", "]")
    val totalWarm = warmFloor.values.sum
    val warmJson =
      if (!warmMode) ""
      else {
        val w = warmFloor.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
        val wf = warmFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
        s""","queries_warm":$w,"total_warm":$totalWarm,"warm_failed":$wf"""
      }
    val json = s"""{"metric":"total","value":$total,"unit":"sec","total_min":$totalMin,"queries":$qs,"queries_min":$qsMin$warmJson,"errors":$errJson,"flaky":$flakyJson,"sf":"$sfDir"}"""
    // Full per-query payload goes to the FILE; stdout ends with a COMPACT
    // totals-only line — the driver parses the stdout TAIL, and a 50-query
    // single-line JSON overflows its window (round-6 finding: BENCH json
    // recorded "parsed": null).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] full json written to $outFile")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    val totalWarmField = if (!warmMode) "" else s""","total_warm":$totalWarm"""
    // Per-query medians, 2 decimals: the driver parses only the LAST ~2000
    // chars of stdout (round-6 finding: the full-precision two-map line
    // overflowed that window and parsed as null, round-14 finding: totals-
    // only starves the driver's per-query comparison). 81 names + 2dp
    // values ≈ 1.7 KB — one rounded map fits the window with slack, two
    // don't (3.5 KB). Full precision medians AND mins stay in $outFile.
    val qsShort = results.map { case (k, med, _) =>
      "\"" + k + "\":" + (if (med < 0) "-1" else f"$med%.2f")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_min":$totalMin$totalWarmField,"nqueries":${queries.size},"queries":$qsShort,"errors":$errJson,"sf":"$sfDir","detail":"$outFile"}""")
    spark.stop()
  }
}
