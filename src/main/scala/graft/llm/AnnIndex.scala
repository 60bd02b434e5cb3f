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

  /** Reassemble each vector's unit components from its exploded rows into
    * an array (sorted by dim; struct sort is lexicographic on (dim, nx)
    * and dim is unique per vector; `.getField` over the struct array
    * extracts the components without a higher-order lambda). */
  private def unitVecArray(cu: DataFrame): DataFrame =
    cu.groupBy("nid")
      .agg(array_sort(collect_list(struct(col("dim"), col("nx")))).as("s"))
      .select(col("nid"), col("s").getField("nx").as("uvec"))

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
    val unitVec = unitVecArray(cu)
    val cells = cellAssign.select("cid", "nid").join(unitVec, "nid")
      .select(col("cid"), col("nid"), col("uvec"))
    cents.write.format("graft").mode("overwrite").save(centroidsPath(indexPath))
    radii.write.format("graft").mode("overwrite").save(statsPath(indexPath))
    // cells: RANGE-partitioned by cid (partition-pruned probes) AND
    // PK-bucketed by nid (per-vector upsert/tombstone for syncFromTable)
    cells.write.format("graft").mode("overwrite")
      .option("rangePartitions", "cid")
      .option("hashPartitions", "nid")
      .option("hashBucketNum", "4")
      .save(cellsPath(indexPath))
  }

  /** Keep the index in lockstep with a graft CORPUS table via its change
    * feed — the ANN twin of [[MinhashIndex.syncFromTable]]. Touched
    * vectors re-assign to their nearest EXISTING centroid; a changed
    * vector's previous row is tombstoned in EVERY cell (cheap: nCentroids
    * marker rows per changed vector — cheaper than reading the index to
    * learn its old cell) before the new assignment lands, all in delta
    * commits. Cell radii only ever GROW here (`cosr = min(stored, new
    * member csims)`): a deleted extreme member leaves the stored radius
    * conservatively large, which keeps the angular bound VALID (exactness
    * never at risk) at the cost of probing a little more until the next
    * full [[build]]. Centroids stay fixed between builds for the same
    * reason. First call (no sidecar) builds from the full table. Returns
    * the corpus version the index now reflects. */
  def syncFromTable(
      spark: SparkSession, indexPath: String,
      corpusPath: String, idCol: String, vecCol: String,
      nCentroids: Int = 16): Long = {
    import graft.meta.SnapshotManagement
    val normCorpus = SnapshotManagement.normalize(corpusPath)
    val normIdx = SnapshotManagement.normalize(indexPath)
    val current = SnapshotManagement.snapshot(normCorpus).version
    val last = SyncSidecar.readValidated(normIdx, SYNC_FILE, normCorpus,
      current)
    val corpusNow = spark.read.format("graft").load(corpusPath)
    if (last < 0) {
      build(spark, indexPath, corpusNow, idCol, vecCol, nCentroids)
    } else if (current > last) {
      val touched = graft.tables.ChangeFeed
        .changes(spark, normCorpus, last + 1, current)
        .select(col(s"`$idCol`")).distinct()
        .transform(Checkpoints.stabilize)
      if (!touched.isEmpty) {
        val cents = spark.read.format("graft")
          .load(centroidsPath(indexPath)).transform(Checkpoints.stabilize)
        val live = corpusNow.join(broadcast(touched), Seq(idCol), "left_semi")
        val cu = Ann.unitRows(live, idCol, vecCol, "nid", "nx")
          .transform(Checkpoints.stabilize)
        val assignNew = Checkpoints.stabilize(
          Ann.assignCells(cents)(cu, "nid", "nx"))
        val unitVec = unitVecArray(cu)
        val newRows = assignNew.select("cid", "nid").join(unitVec, "nid")
          .select(col("cid"), col("nid"), col("uvec"))
        // death warrants: every touched id (changed, deleted, OR zero-norm
        // now) gets a tombstone in every cell except the one its fresh row
        // lands in — the fresh row itself supersedes that cell's old image
        val allCids = cents.select("cid").distinct()
        val tomb = touched.select(col(s"`$idCol`").as("nid"))
          .crossJoin(allCids)
          .join(assignNew.select("nid", "cid"), Seq("nid", "cid"), "left_anti")
          .select(col("cid"), col("nid"),
            lit(true).as(graft.meta.Tombstones.COL))
        val delta = newRows.unionByName(tomb, allowMissingColumns = true)
        // RADII FIRST, cells second: a crash (or concurrent topK) between
        // the two writes must land on the conservative side. An over-grown
        // radius with the old cells only costs extra probes; the reverse
        // order would expose a window where a fresh far-from-centroid
        // member is visible while the bound still claims the old, tighter
        // radius — and the probe would skip its cell, breaking exactness.
        // Grow-only fold of the new members' csims into the stored stats
        // (tiny table — full overwrite is the honest cost).
        val stored = spark.read.format("graft").load(statsPath(indexPath))
        val grown = assignNew.groupBy("cid")
          .agg(greatest(lit(-1.0d), least(lit(1.0d), min(col("csim"))))
            .as("newCosr"))
        // FULL outer: a cell empty at build time (no stored radius) that
        // receives its first member now must enter the stats — an inner or
        // left fold would hide it from the probe's radii join and silently
        // break exactness
        val folded = stored.join(grown, Seq("cid"), "full_outer")
          .select(col("cid"),
            least(coalesce(col("cosr"), col("newCosr")),
              coalesce(col("newCosr"), col("cosr"))).as("cosr"))
          .withColumn("sinr", sqrt(greatest(lit(0.0d),
            lit(1.0d) - col("cosr") * col("cosr"))))
          .transform(Checkpoints.stabilize)
        folded.write.format("graft").mode("overwrite")
          .save(statsPath(indexPath))
        val normCells = SnapshotManagement.normalize(cellsPath(indexPath))
        SnapshotManagement.withRewriteTransaction(normCells) { txn =>
          graft.commands.UpsertCommand.runDeltaIn(
            spark, normCells, delta, Map.empty, txn)
        }
      }
    }
    if (current != last) {
      SyncSidecar.write(normIdx, SYNC_FILE, normCorpus, current)
    }
    current
  }

  private val SYNC_FILE = "_graft_ann_sync.json"

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
    // left join + widest-radius default: a cell somehow missing its stats
    // row must be PROBED (bound 1), never silently skipped — conservative
    // costs a scan, the alternative costs exactness
    val probe = qCell.join(broadcast(radii), Seq("cid"), "left_outer")
      .join(broadcast(thresholds), "qid")
      .filter(when(qcsC >= coalesce(col("cosr"), lit(-1.0d)), lit(1.0d))
        .otherwise(qcsC * coalesce(col("cosr"), lit(-1.0d)) +
          sinA * coalesce(col("sinr"), lit(0.0d))) + lit(1e-9) >=
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
