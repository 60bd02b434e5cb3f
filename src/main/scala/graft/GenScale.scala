package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the standing sf1 bench: replicates an existing
  * sf directory `factor`× with remapped keys so join fan-out, similarity
  * structure and tokenization shape are all PRESERVED — the null model for
  * measuring scaling exponents is "N independent copies of the base
  * corpus", not "one corpus with N× hotter keys".
  *
  *  - orders/lineitem/customer/events shift their entity keys by a
  *    100M-per-copy stride (far above every fixture's key arithmetic:
  *    +1e6 merge inserts, +1e7 MV re-keys stay inside a stride; the
  *    +1e12 apply-changes shift stays above all strides);
  *  - documents suffix every token with the copy digit GLUED
  *    ALPHANUMERICALLY (the tokenizer splits on non-alphanumerics, so a
  *    separator would double the token stream and plant pathological hot
  *    tokens — a measured 20-50x artifact in round 13) → within-copy
  *    shingle structure identical, zero cross-copy overlap;
  *  - embeddings add a deterministic per-copy direction perturbation →
  *    within-copy neighborhoods survive, no cross-copy near-dup inflation;
  *  - dimension tables (region/nation/supplier/part) stay 1× — scaling
  *    them would change the star schema's fan-out semantics.
  *
  * Copy 0 is byte-identical to the source, so the scaled corpus is a
  * strict superset. Usage:
  * {{{ runMain graft.GenScale <srcSfDir> <destDir> [factor=10] }}}
  */
object GenScale {

  /** Per-copy key stride. */
  val OFF = 100000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenScale <srcSfDir> <destDir> [factor]")
    val (src, dest) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dest, factor)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dest: String, factor: Int): Unit = {
    val copies = spark.range(factor).select(col("id").as("__c"))

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dest/$t.parquet")
      System.err.println(s"[genscale] $t: " +
        spark.read.parquet(s"$dest/$t.parquet").count() + " rows")
    }
    def shift(c: String): Column = col(c) + col("__c") * OFF

    // dimensions: 1x, unchanged
    Seq("region", "nation", "supplier", "part").foreach(t => write(t, read(t)))

    write("customer", read("customer").crossJoin(copies)
      .withColumn("c_custkey", shift("c_custkey")).drop("__c"))
    write("orders", read("orders").crossJoin(copies)
      .withColumn("o_orderkey", shift("o_orderkey"))
      .withColumn("o_custkey", shift("o_custkey")).drop("__c"))
    write("lineitem", read("lineitem").crossJoin(copies)
      .withColumn("l_orderkey", shift("l_orderkey")).drop("__c"))
    // events also shift TIME by a 31-day stride per copy (the base corpus
    // spans 30 days): interval-containment joins have no equi key — their
    // fan-out is |probes/window| × |windows|, and replicating rows into
    // the SAME time span multiplies temporal density so the true match
    // count grows quadratically in the factor. Disjoint windows keep each
    // copy's range-join output identical to the base corpus's — the same
    // independent-copies null model the key strides give the star schema
    // (first full sf1 run measured q_range_join at 12x before this).
    write("events", read("events").crossJoin(copies)
      .withColumn("event_id", shift("event_id"))
      .withColumn("user_id", shift("user_id"))
      // interval arithmetic, not unix_micros round-trips: the source ts
      // has shipped as TIMESTAMP_NTZ (and nanos variants) — adding a
      // day-time interval shifts ANY timestamp flavor and preserves the
      // column's dtype, so downstream readers normalize it the same way
      // they normalize the base corpus
      .withColumn("ts", col("ts") + make_dt_interval(col("__c") * 31))
      .drop("__c"))

    // documents: glue the copy digit onto every alphanumeric token via a
    // NAMED group — "$1" + digit would parse as a higher group reference
    write("documents", read("documents").crossJoin(copies)
      .withColumn("doc_id", shift("doc_id"))
      .withColumn("text", when(col("__c") === 0, col("text"))
        .otherwise(regexp_replace(col("text"),
          lit("(?<tok>[A-Za-z0-9]+)"),
          concat(lit("$" + "{tok}"), col("__c").cast("string")))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__c"))

    // embeddings: per-copy deterministic direction shift, ~2.5x the mean
    // component magnitude per dimension — enough that cross-copy cosines
    // fall far below near-dup thresholds, while every member of one copy
    // shares the same shift (within-copy neighborhoods survive)
    write("embeddings", read("embeddings").crossJoin(copies)
      .withColumn("vec_id", shift("vec_id"))
      .withColumn("embedding", when(col("__c") === 0, col("embedding"))
        .otherwise(transform(col("embedding"), (x, i) =>
          (x.cast("double") + lit(0.25) *
            sin((i.cast("double") + 1.0) *
              (col("__c").cast("double") * 2.3994 + 0.7))).cast("float"))))
      .drop("__c"))
  }
}
