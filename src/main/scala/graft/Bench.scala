package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: builds the graft tables (untimed warm-up — conversion is
  * a one-time cost, not query latency), then times every declared query and
  * prints one JSON line. A failing query records -1 for its time and is
  * listed in "errors" instead of silently folding into the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.rules.GraftSparkSessionExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val w0 = System.nanoTime()
    Queries.warm(spark, sfDir) // untimed: one-time table conversion
    System.err.println(f"[bench] warm-up took ${(System.nanoTime() - w0) / 1e9}%.1f s")

    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          errors += name; false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name: $secs%.2f s")
      name -> (if (ok) secs else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
