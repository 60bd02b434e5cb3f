package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF index for exact cosine top-k — the ANN twin of
  * [[MinhashIndex]]: build once, query many times, with the corpus's
  * clustering work materialized into graft tables instead of recomputed
  * per query batch.
  *
  * Layout under `indexPath`:
  *  - `centroids` — (cid, dim, cx): the coarse centroid set as unit
  *    vectors (tiny: nCentroids × dims rows);
  *  - `cellstats` — (cid, cosr, sinr): each cell's angular radius, carried
  *    as (cos r, sin r) so the probe bound never round-trips through
  *    acos/cos;
  *  - `cells` — (cid, nid, uvec): every corpus vector, UNIT-normalized in
  *    double, RANGE-PARTITIONED BY `cid` — the property the whole design
  *    exists for: a query's probed cells translate to a partition-pruned
  *    scan, so at 100 TB a query batch reads only the few cells whose
  *    angular bound can still matter, straight off the manifest.
  *
  * Queries stay EXACT (same angular-bound pruning as [[Ann.ivfTopK]]):
  * pass 1 scores each query's nearest cell exhaustively for a provisional
  * kth-best threshold; pass 2 probes only cells whose bound beats it.
  * Skipped cells provably hold no top-k member. The probed-cell id sets
  * are collected to literals (bounded by nCentroids — metadata-scale by
  * construction) so partition pruning happens at scan PLANNING, not as a
  * runtime join.
  */
object AnnIndex {

  private def centroidsPath(p: String) = s"$p/centroids"
  private def statsPath(p: String) = s"$p/cellstats"
  private def cellsPath(p: String) = s"$p/cells"

  /** Build (or rebuild) the index tables from `corpus`. One pass computes
    * unit rows; centroids refine per `spark.graft.ann.ivf.kmeansIters`
    * (default 1); assignments write range-partitioned by cell. */
  def build(
      spark: SparkSession, indexPath: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16): Unit = {
    val cu = Ann.unitRows(corpus, idCol, vecCol, "nid", "nx")
      .transform(Checkpoints.stabilize)
    val cents = Checkpoints.stabilize(
      Ann.buildCentroids(corpus, idCol, cu, nCentroids))
    val cellAssign = Checkpoints.stabilize(
      Ann.assignCells(cents)(cu, "nid", "nx"))
    val clamp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => greatest(lit(-1.0d), least(lit(1.0d), c))
    val radii = cellAssign.groupBy("cid")
      .agg(clamp(min(col("csim"))).as("cosr"))
      .withColumn("sinr", sqrt(greatest(lit(0.0d),
        lit(1.0d) - col("cosr") * col("cosr"))))
    // reassemble each vector's unit components into an array (sorted by
    // dim; struct sort is lexicographic on (dim, nx), and dim is unique
    // per vector). `.getField` over the struct array extracts the
    // components without a higher-order lambda.
    val unitVec = cu.groupBy("nid")
      .agg(array_sort(collect_list(struct(col("dim"), col("nx")))).as("s"))
      .select(col("nid"), col("s").getField("nx").as("uvec"))
    val cells = cellAssign.select("cid", "nid").join(unitVec, "nid")
      .select(col("cid"), col("nid"), col("uvec"))
    cents.write.format("graft").mode("overwrite").save(centroidsPath(indexPath))
    radii.write.format("graft").mode("overwrite").save(statsPath(indexPath))
    cells.write.format("graft").mode("overwrite")
      .option("rangePartitions", "cid").save(cellsPath(indexPath))
  }

  /** Exact cosine top-k of `queries` against the indexed corpus. Output
    * (qid, rank, nid) — identical to [[Ann.bruteTopK]] over the corpus the
    * index was built from (zero-norm corpus vectors were dropped at build,
    * zero-norm queries return no rows, as everywhere in the ANN family). */
  def topK(
      spark: SparkSession, indexPath: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10): DataFrame = {
    val cents = spark.read.format("graft").load(centroidsPath(indexPath))
    val radii = spark.read.format("graft").load(statsPath(indexPath))
    val qu = Ann.unitRows(queries, queryIdCol, queryVecCol, "qid", "qx")
      .transform(Checkpoints.stabilize)
    val qCell = Checkpoints.stabilize(
      qu.join(broadcast(cents), "dim")
        .groupBy(col("qid"), col("cid"))
        .agg(sum(col("qx") * col("cx")).as("qcs")))

    // partition-pruned exploded rows of the given cells only: the isin
    // literals push into the range-partition filter at scan planning
    def cellRows(cids: Seq[Any]): DataFrame =
      spark.read.format("graft").load(cellsPath(indexPath))
        .filter(col("cid").isin(cids: _*))
        .select(col("cid"), col("nid"),
          posexplode(col("uvec")).as(Seq("dim", "nx")))

    val w1 = Window.partitionBy("qid").orderBy(col("qcs").desc, col("cid").asc)
    val nearest = qCell.withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1).select("qid", "cid")
      .transform(Checkpoints.stabilize)
    val nearCids = nearest.select("cid").distinct().collect().map(_.get(0)).toSeq
    if (nearCids.isEmpty) {
      // no query survived unit-normalization — empty, correctly-shaped out
      return qCell.select(col("qid"), lit(0).as("rank"),
        col("cid").as("nid")).limit(0)
    }
    val firstScored = Checkpoints.stabilize(cellRows(nearCids)
      .join(nearest, Seq("cid"))
      .join(broadcast(qu), Seq("qid", "dim"))
      .groupBy("qid", "nid").agg(sum(col("nx") * col("qx")).as("sim")))
    val wk = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    val thresholds = qCell.select("qid").distinct()
      .join(firstScored.withColumn("rn", row_number().over(wk))
        .groupBy("qid")
        .agg(max(when(col("rn") === k, col("sim"))).as("tk")),
        Seq("qid"), "left_outer")
      .select(col("qid"), coalesce(col("tk"), lit(-2.0d)).as("t"))
    val clamp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => greatest(lit(-1.0d), least(lit(1.0d), c))
    val qcsC = clamp(col("qcs"))
    val sinA = sqrt(greatest(lit(0.0d), lit(1.0d) - qcsC * qcsC))
    val probe = qCell.join(broadcast(radii), "cid")
      .join(broadcast(thresholds), "qid")
      .filter(when(qcsC >= col("cosr"), lit(1.0d))
        .otherwise(qcsC * col("cosr") + sinA * col("sinr")) + lit(1e-9) >=
        col("t"))
      .select("qid", "cid")
      .join(nearest, Seq("qid", "cid"), "left_anti")
      .transform(Checkpoints.stabilize)
    val probeCids = probe.select("cid").distinct().collect().map(_.get(0)).toSeq
    val scored =
      if (probeCids.isEmpty) firstScored
      else firstScored.unionAll(
        cellRows(probeCids)
          .join(probe, Seq("cid"))
          .join(broadcast(qu), Seq("qid", "dim"))
          .groupBy("qid", "nid").agg(sum(col("nx") * col("qx")).as("sim")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }
}
