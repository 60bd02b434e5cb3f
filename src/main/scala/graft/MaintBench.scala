package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.GraftTable
import graft.write.TransactionalWrite

/** Maintenance-path scaling bench: measures the four "cost ∝ changes"
  * claims — MV incremental fold, CDC apply, table-to-table replication,
  * ANN index sync — with a FIXED change-set size against corpora of
  * different sizes. If the claims hold, the times stay near-flat as the
  * corpus grows 10×; the bench prints one JSON line per (op, sf) so the
  * exponent log10(t_sf1 / t_sf0.1) is directly readable. Every fixture is
  * rebuilt from the sf dir's parquet into scratch graft tables, so runs
  * never touch the query bench's table cache.
  *
  * {{{ runMain graft.MaintBench <sfDir1> <sfDir2> ... }}}
  */
object MaintBench {

  /** Rows in every change window — FIXED across corpus sizes by taking a
    * key slice of constant width (keys are dense from 0 in every sf). */
  val CHANGE_ROWS = 1500

  /** Timed repetitions per op (distinct change windows); the MIN is
    * reported — single shots are hostage to ambient bursts. */
  val REPS = 3

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MaintBench <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.rules.GraftSparkSessionExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    args.foreach { sfDir =>
      val sf = new java.io.File(sfDir).getName
      out += (("mv_fold", sf, mvFold(spark, sfDir)))
      out += (("cdc_apply", sf, cdcApply(spark, sfDir)))
      out += (("replication", sf, replication(spark, sfDir)))
      out += (("ann_sync", sf, annSync(spark, sfDir)))
    }
    val json = out.map { case (op, sf, s) =>
      f"""{"op":"$op","sf":"$sf","sec":$s%.3f}"""
    }.mkString("[", ",", "]")
    println(json)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_MAINT_OUT", "maint_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }

  private def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def report(op: String, sfDir: String, secs: Double): Double = {
    System.err.println(f"[maint] $op @ ${new java.io.File(sfDir).getName}: " +
      f"$secs%.2f s (changes=$CHANGE_ROWS)")
    secs
  }

  private def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet").select(
      col("o_orderkey").cast("long").as("o_orderkey"),
      col("o_custkey").cast("long").as("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("p"))

  /** A constant-width change slice: keys are dense from 0 in the base
    * corpus and GenScale's copies sit 100M apart, so `key < CHANGE_ROWS`
    * selects the SAME 1500 logical keys (all in copy 0) at every corpus
    * size. */
  private def slice(df: DataFrame, key: String): DataFrame =
    df.filter(col(key) < lit(CHANGE_ROWS))

  /** MV incremental fold: count/sum/avg view over a PK orders table; the
    * timed refresh folds one upsert window of CHANGE_ROWS raw images. */
  private def mvFold(spark: SparkSession, sfDir: String): Double = {
    val d = scratch("maint_mv_"); val viewDir = d + "_view"
    val base = orders(spark, sfDir)
    base.write.format("graft")
      .option("hashPartitions", "o_orderkey").option("hashBucketNum", "16")
      .save(d)
    graft.mv.MaterializedViews.create(spark, viewDir,
      s"SELECT o_custkey, count(1) AS cnt, count(p) AS cp, sum(p) AS sp, " +
        s"avg(p) AS ap FROM graft.`$d` GROUP BY o_custkey")
    val t = GraftTable.forPath(spark, d)
    // warm round: JIT + planner caches out of the timed sample
    t.upsert(slice(base, "o_orderkey").withColumn("p", col("p") + 1L))
    val beforeWarm = graft.mv.MaterializedViews.incrementalRefreshes.get()
    require(graft.mv.MaterializedViews.refresh(spark, viewDir))
    require(
      graft.mv.MaterializedViews.incrementalRefreshes.get() == beforeWarm + 1,
      "mv_fold warm refresh must FOLD — fixture shape broke")
    val secs = (0 until REPS).map { i =>
      t.upsert(slice(base, "o_orderkey").withColumn("p", col("p") + (2L + i)))
      val before = graft.mv.MaterializedViews.incrementalRefreshes.get()
      val s0 = time {
        require(graft.mv.MaterializedViews.refresh(spark, viewDir))
      }
      require(
        graft.mv.MaterializedViews.incrementalRefreshes.get() == before + 1,
        "mv_fold must FOLD, not recompute — the measurement is " +
        "meaningless otherwise")
      s0
    }.min
    report("mv_fold", sfDir, secs)
  }

  /** CDC apply: one sequenced batch of CHANGE_ROWS updates + deletes into
    * a PK table of corpus size. */
  private def cdcApply(spark: SparkSession, sfDir: String): Double = {
    val d = scratch("maint_cdc_")
    val base = orders(spark, sfDir)
    base.write.format("graft")
      .option("hashPartitions", "o_orderkey").option("hashBucketNum", "16")
      .save(d)
    val t = GraftTable.forPath(spark, d)
    def batch(seqBase: Long): DataFrame =
      slice(base, "o_orderkey").select(
        col("o_orderkey"), col("o_custkey"), (col("p") + seqBase).as("p"),
        when(col("o_orderkey") % 5 === 0, lit("d")).otherwise(lit("u"))
          .as("op"),
        lit(seqBase).as("seq"))
    t.applyChanges(batch(1L), "op", Seq("seq")) // warm
    val secs = (0 until REPS).map { i =>
      time { t.applyChanges(batch(2L + i), "op", Seq("seq")) }
    }.min
    report("cdc_apply", sfDir, secs)
  }

  /** Replication: clone a replica, start the stream, drain a warm window,
    * then time the drain of one CHANGE_ROWS upsert window. */
  private def replication(spark: SparkSession, sfDir: String): Double = {
    val d = scratch("maint_repl_src_"); val dest = d + "_replica"
    val base = orders(spark, sfDir)
    base.write.format("graft")
      .option("hashPartitions", "o_orderkey").option("hashBucketNum", "16")
      .save(d)
    val t = GraftTable.forPath(spark, d)
    t.cloneTo(dest)
    val ckpt = java.nio.file.Files
      .createTempDirectory("maint_repl_ck_").toString
    // a fast trigger: the DEFAULT 10 s ProcessingTime cadence would time
    // trigger waits, not apply work
    val q = t.replicateTo(dest, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
    try {
      t.upsert(slice(base, "o_orderkey").withColumn("p", col("p") + 1L))
      q.processAllAvailable() // warm: stream startup + first window
      val secs = (0 until REPS).map { i =>
        t.upsert(slice(base, "o_orderkey").withColumn("p", col("p") + (2L + i)))
        time { q.processAllAvailable() }
      }.min
      report("replication", sfDir, secs)
    } finally q.stop()
  }

  /** ANN sync: IVF index over the corpus-sized embeddings table; the timed
    * sync ingests one CHANGE_ROWS vector-upsert window from the feed. */
  private def annSync(spark: SparkSession, sfDir: String): Double = {
    // churn bookkeeping off: at a small corpus the fixed window crosses
    // the rebuild threshold (marking "due" flips later syncs onto the
    // skip-bookkeeping branch) while at a large one it doesn't — the two
    // sizes would time different code paths
    spark.conf.set("spark.graft.ann.index.rebuildChurnFraction", "0")
    val d = scratch("maint_ann_corpus_"); val idx = d + "_ix"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.write.format("graft")
      .option("hashPartitions", "vec_id").option("hashBucketNum", "4")
      .save(d)
    graft.llm.AnnIndex.syncFromTable(spark, idx, d, "vec_id", "embedding",
      nCentroids = 16)
    val t = GraftTable.forPath(spark, d)
    def window(shift: Double): DataFrame =
      slice(emb, "vec_id").withColumn("embedding",
        transform(col("embedding"),
          x => (x.cast("double") + lit(shift)).cast("float")))
    t.upsert(window(0.01)) // warm
    graft.llm.AnnIndex.syncFromTable(spark, idx, d, "vec_id", "embedding",
      nCentroids = 16)
    val secs = (0 until REPS).map { i =>
      t.upsert(window(0.02 + 0.01 * i))
      time {
        graft.llm.AnnIndex.syncFromTable(spark, idx, d, "vec_id",
          "embedding", nCentroids = 16)
      }
    }.min
    report("ann_sync", sfDir, secs)
  }
}
