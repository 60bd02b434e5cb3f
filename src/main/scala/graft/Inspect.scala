package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round measurement aid (guide §1): for each named query,
  * writes `.explain("formatted")` to <outDir>/<name>.txt and prints the
  * job/stage/task counts plus wall time of one noop-sink run — the
  * empirical counters that attribute where a small-scale query's time
  * goes (scheduled jobs and exchanges, not data volume, dominate at
  * sf0.1). Not part of the bench contract; plans land in plans/r14/. */
object Inspect {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = args(0)
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // write MICROS (not legacy INT96) timestamps AND let the parquet
      // filter builder assume micros — pushdown eligibility is derived
      // from the session's assumed output type, not the file
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.rules.GraftSparkSessionExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (te.taskInfo != null) taskTimeMs.addAndGet(te.taskInfo.duration)
      }
    })

    Queries.warm(spark, sfDir)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // one discarded pass (JIT/codegen warm), then the counted pass.
      // Construction is timed separately from the final action: eager
      // checkpoints, probe collects and driver cluster loops all run while
      // the DataFrame is being BUILT, and at sf0.1 they are often the
      // dominant share of a query's wall clock.
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.llm.Checkpoints.releaseAll()
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0L)
      val tb = System.nanoTime()
      val df = fn(spark, sfDir)
      val buildSecs = (System.nanoTime() - tb) / 1e9
      Thread.sleep(100)
      val buildJobs = jobs.get; val buildTaskS = taskTimeMs.get / 1000.0
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0L)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      graft.llm.Checkpoints.releaseAll()
      Thread.sleep(100) // let listener events drain
      val nEx = "Exchange".r.findAllIn(plan).length
      println(f"[inspect] $name%-24s build $buildSecs%5.2f s " +
        f"(jobs=$buildJobs%3d taskTime=$buildTaskS%6.2f) action $secs%5.2f s " +
        f"(jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d " +
        f"taskTime=${taskTimeMs.get / 1000.0}%6.2f)  planExchanges=$nEx")
    }
    spark.stop()
  }
}
