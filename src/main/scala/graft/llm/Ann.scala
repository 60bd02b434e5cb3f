package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - `bruteTopK`: exact baseline — broadcast the (small) query set against
  *    the corpus, cosine via `zip_with`/`aggregate` (codegen'd higher-order
  *    functions, all math in double), per-query top-k via window rank.
  *    One pass over the corpus, no corpus self-join.
  *  - `lshTopK`: the scale path — random-hyperplane LSH buckets the corpus
  *    once (signs of dot products against `planes` deterministic
  *    pseudo-random hyperplanes); queries probe only their own bucket.
  *    At 100 TB the bucketing bounds each query's candidate set to
  *    corpus/2^planes on average; an IVF refinement would k-means the
  *    centroids instead, same plumbing.
  */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine top-k for each query vector. Output:
    * (query_id, rank, neighbor_id) — integers only; ties broken by id. */
  def bruteTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    val q = queries.select(col(queryIdCol).as("qid"), asDouble(col(queryVecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid") || lit(true))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }

  /** Deterministic pseudo-random hyperplane component: murmur3(plane, dim)
    * scaled to [-0.5, 0.5). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(hash(lit(plane), dim), lit(1000)).cast("double") / 1000.0d) - 0.5d

  /** `vec` must already be a materialized `array<double>` column. */
  def lshBucket(vec: Column, numPlanes: Int, dims: Int): Column = {
    val v = vec
    (0 until numPlanes).map { p =>
      val d = aggregate(sequence(lit(1), lit(dims)), lit(0.0d),
        (acc, i) => acc + element_at(v, i) * planeComponent(p, i))
      when(d >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** IVF-style ANN: a deterministic sample of the corpus acts as coarse
    * centroids (a k-means pass would refine them — same plumbing); every
    * vector is assigned to its nearest centroid by cosine, queries probe
    * only their own cell. The inverted-file structure bounds each query's
    * candidate set to ~corpus/nCentroids. Same output shape as `bruteTopK`.
    */
  def ivfTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10, nCentroids: Int = 16): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    // coarse centroids: deterministic sample (first nCentroids by id —
    // embeddings carry no id-order structure; k-means would refine)
    val centroids = c.orderBy("nid").limit(nCentroids)
      .select(col("nid").as("cid"), col("nv").as("cv"))
    def assign(df: DataFrame, id: String, v: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(id).orderBy(col("csim").desc, col("cid").asc)
      df.join(broadcast(centroids), lit(true))
        .withColumn("csim", cosine(col(v), col("cv")))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") === 1)
        .select(col(id), col(v), col("cid"))
    }
    val cellCorpus = assign(c, "nid", "nv")
    val q = queries.select(col(queryIdCol).as("qid"), asDouble(col(queryVecCol)).as("qv"))
    val cellQueries = assign(q, "qid", "qv")
    val scored = cellCorpus.join(broadcast(cellQueries), "cid")
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }

  /** Bucketed ANN: per-query top-k among corpus vectors in the same
    * random-hyperplane bucket. Same output shape as `bruteTopK`. */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10, numPlanes: Int = 4, dims: Int = 64): DataFrame = {
    // stage the double-cast vector first: lshBucket's per-element lambda
    // would otherwise re-cast the whole array per element (interpreted HOF)
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
      .select(col("nid"), col("nv"), lshBucket(col("nv"), numPlanes, dims).as("bucket"))
    val q = queries.select(col(queryIdCol).as("qid"), asDouble(col(queryVecCol)).as("qv"))
      .select(col("qid"), col("qv"), lshBucket(col("qv"), numPlanes, dims).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }
}
