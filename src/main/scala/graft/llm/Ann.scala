package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - `bruteTopK`: exact baseline — every (query, corpus) cosine, per-query
  *    top-k via window rank. One pass over the corpus, no corpus self-join.
  *  - `lshTopK`: random-hyperplane LSH buckets the corpus once; queries
  *    probe only their own bucket, bounding each query's candidate set to
  *    corpus/2^planes on average.
  *  - `ivfTopK`: IVF-style — a deterministic coarse-centroid set partitions
  *    the corpus into cells; queries probe only their own cell.
  *
  * All cosine math is expressed RELATIONALLY: vectors are unit-normalized
  * once, dimensions exploded to (id, dim, x/|v|) rows, and each pairwise
  * cosine is a codegen'd `sum(ax * bx)` hash-aggregate over an equi-join on
  * `dim`. Higher-order-function lambdas (`aggregate`/`zip_with`) evaluate
  * interpreted per candidate pair and are deliberately absent from every
  * per-pair path — at scale the candidate count is where the time goes.
  * (Same pattern as `Dedup.embeddingNearDuplicates`.)
  */
object Ann {

  /** Deterministic pseudo-random hyperplane component: murmur3(plane, dim)
    * scaled to [-0.5, 0.5). `dim1` is the 1-based dimension index. */
  private def planeComponent(plane: Int, dim1: Column): Column =
    (pmod(hash(lit(plane), dim1), lit(1000)).cast("double") / 1000.0d) - 0.5d

  /** Exploded (id, dim, x) rows of a vector column, in double. */
  private def explodedRows(
      df: DataFrame, idCol: String, vecCol: String, idAs: String): DataFrame =
    df.select(col(idCol).as(idAs),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))

  /** Unit-normalized exploded rows (idAs, dim, xAs [, bucket]) — one
    * grouped pass computes the norm (and, when `numPlanes > 0`, the
    * hyperplane sign-sums) as plain aggregates, then a self-join scales each
    * component. No array lambdas anywhere. */
  private def unitRows(
      df: DataFrame, idCol: String, vecCol: String,
      idAs: String, xAs: String, numPlanes: Int = 0): DataFrame = {
    val expl = explodedRows(df, idCol, vecCol, idAs)
    val planeAggs = (0 until numPlanes).map { p =>
      sum(col("x") * planeComponent(p, col("dim") + 1)).as(s"d$p")
    }
    val per = expl.groupBy(idAs)
      .agg(sum(col("x") * col("x")).as("norm2"), planeAggs: _*)
    val keyedCols = col(idAs) +: sqrt(col("norm2")).as("n") +:
      (if (numPlanes > 0)
        Seq((0 until numPlanes).map(p =>
          when(col(s"d$p") >= 0, lit(1 << p)).otherwise(lit(0)): Column)
          .reduce(_ + _).as("bucket"))
      else Nil)
    val keyed = per.select(keyedCols: _*)
    // zero-norm guard: nullified norm -> null components -> null sim, which
    // ranks last under `desc` (ANSI mode would otherwise throw DIVIDE_BY_ZERO)
    val safeN = when(col("n") =!= 0.0d, col("n"))
    val outCols = Seq(col(idAs), col("dim"), (col("x") / safeN).as(xAs)) ++
      (if (numPlanes > 0) Seq(col("bucket")) else Nil)
    expl.join(keyed, idAs).select(outCols: _*)
  }

  /** Per-query top-k of `scored(qid, nid, sim)`; ties break by id. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }

  /** Exact cosine top-k for each query vector. Output:
    * (query_id, rank, neighbor_id) — integers only; ties broken by id. */
  def bruteTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10): DataFrame = {
    val cu = unitRows(corpus, idCol, vecCol, "nid", "nx")
    val qu = unitRows(queries, queryIdCol, queryVecCol, "qid", "qx")
    val scored = cu.join(broadcast(qu), "dim")
      .groupBy("qid", "nid").agg(sum(col("nx") * col("qx")).as("sim"))
    topK(scored, k)
  }

  /** Bucketed ANN: per-query top-k among corpus vectors in the same
    * random-hyperplane bucket. Same output shape as `bruteTopK`. */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10, numPlanes: Int = 4, dims: Int = 64): DataFrame = {
    val cu = unitRows(corpus, idCol, vecCol, "nid", "nx", numPlanes)
    val qu = unitRows(queries, queryIdCol, queryVecCol, "qid", "qx", numPlanes)
    val scored = cu.join(broadcast(qu), Seq("bucket", "dim"))
      .groupBy("qid", "nid").agg(sum(col("nx") * col("qx")).as("sim"))
    topK(scored, k)
  }

  /** IVF-style ANN: a deterministic sample of the corpus seeds the coarse
    * centroids, optionally refined by Lloyd (k-means) iterations — set
    * `spark.graft.ann.ivf.kmeansIters` (default 1; 0 restores plain
    * first-N seeding). Every vector is assigned to its nearest centroid by
    * cosine; queries probe only their own cell. The inverted-file structure
    * bounds each query's candidate set to ~corpus/nCentroids. Same output
    * shape as `bruteTopK`.
    *
    * The Lloyd step is PURE relational algebra over the already-exploded
    * unit rows: assign (broadcast join + hash-agg + window) → per-(cell,
    * dim) mean → re-normalize to unit length. Each iteration is one extra
    * pass over the exploded corpus — no per-vector lambdas, no driver-side
    * math, so it scales exactly like the assignment it improves.
    */
  def ivfTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10, nCentroids: Int = 16): DataFrame = {
    // corpus unit rows feed three consumers (centroid set, assignment,
    // scoring) — an eager localCheckpoint runs the explode+norm pipeline
    // once, truncates lineage (small downstream plans), and leaves no
    // CacheManager entry to tax later queries' planning
    val cu = unitRows(corpus, idCol, vecCol, "nid", "nx").transform(Checkpoints.stabilize)
    val qu = unitRows(queries, queryIdCol, queryVecCol, "qid", "qx")
    // nearest centroid by cosine (both sides unit: sum of products IS the
    // cosine); deterministic tie-break on centroid id
    def assign(cents: DataFrame)(unit: DataFrame, id: String, x: String): DataFrame = {
      val w = Window.partitionBy(id).orderBy(col("csim").desc, col("cid").asc)
      unit.join(broadcast(cents), "dim")
        .groupBy(col(id), col("cid"))
        .agg(sum(col(x) * col("cx")).as("csim"))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") === 1)
        .select(col(id), col("cid"))
    }
    // seed centroids: deterministic sample (first nCentroids by id —
    // embeddings carry no id-order structure)
    val centIds = corpus.select(col(idCol).as("cid")).orderBy("cid")
      .limit(nCentroids)
    val seed = cu.join(broadcast(centIds), col("nid") === col("cid"))
      .select(col("cid"), col("dim"), col("nx").as("cx"))
    // Lloyd refinement: mean of each cell's members per dimension,
    // re-normalized to the unit sphere (spherical k-means step). Empty
    // cells simply drop out — their members reassign to surviving cells.
    val iters = corpus.sparkSession.conf
      .getOption("spark.graft.ann.ivf.kmeansIters").map(_.toInt).getOrElse(1)
    val centUnit = (0 until iters).foldLeft(seed) { (cents, _) =>
      val members = cu.join(assign(cents)(cu, "nid", "nx"), "nid")
      val means = members.groupBy(col("cid"), col("dim"))
        .agg(avg(col("nx")).as("mx"))
      val norms = means.groupBy("cid")
        .agg(sqrt(sum(col("mx") * col("mx"))).as("cn"))
      means.join(norms, "cid")
        .select(col("cid"), col("dim"),
          (col("mx") / when(col("cn") =!= 0.0d, col("cn"))).as("cx"))
    }
    // the final centroid plan feeds two broadcast assigns (corpus, queries);
    // with refinement iterations in its lineage, run it once
    val cents =
      if (iters > 0) Checkpoints.stabilize(centUnit) else centUnit
    val cellCorpus = cu.join(assign(cents)(cu, "nid", "nx"), "nid")
    val cellQueries = qu.join(assign(cents)(qu, "qid", "qx"), "qid")
    val scored = cellCorpus.join(broadcast(cellQueries), Seq("cid", "dim"))
      .groupBy("qid", "nid").agg(sum(col("nx") * col("qx")).as("sim"))
    topK(scored, k)
  }
}
