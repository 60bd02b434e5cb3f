package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora.
  *
  * Scale design: every method is banded/bucketed — candidate pairs are only
  * generated WITHIN a join key (content hash, shared shingle, LSH band, or
  * SimHash band), never via an all-pairs cross join. At 100 TB the hot
  * shingles/bands are the skew risk; `maxKeyFreq` drops join keys whose
  * document frequency exceeds a cutoff (a standard prefix-filter trick) so
  * no single key explodes a partition.
  */
object Dedup {

  /** Exact duplicate groups by content hash (hash-groupBy, one shuffle of
    * (hash, id) pairs only — never the text). */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Word k-gram shingles (1-based positions, distinct). NOTE: evaluating
    * this over a raw text column re-runs tokenization inside the lambda
    * (higher-order functions evaluate interpreted); prefer `shingleSets`,
    * which stages tokens as a materialized column first. */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesFromTokens(TextAnalysis.tokens(text), k)

  def shinglesFromTokens(toks: Column, k: Int): Column = {
    val n = size(toks)
    when(n >= k, array_distinct(transform(
      sequence(lit(1), n - (k - 1)),
      i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** (doc_id, sh) with tokens and shingles each materialized exactly once
    * per row — the staged form every minhash/jaccard operator builds on. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), shinglesFromTokens(col("__toks"), k).as("sh"))

  /** Exact n-gram-Jaccard near-duplicate pairs via an inverted shingle
    * index: explode distinct shingles, self-join on shingle, count shared
    * shingles per pair. Returns integer columns only:
    * (a_id, b_id, inter, a_size, b_size) for pairs with >= minInter shared
    * shingles. Jaccard = inter / (a_size + b_size - inter).
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minInter: Int = 3, maxKeyFreq: Int = 1000): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, k)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    // skew guard: drop shingles shared by too many documents
    val filtered = sh.withColumn("freq",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("s")))
      .filter(col("freq") <= maxKeyFreq).drop("freq")
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = filtered.as("a").join(filtered.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") >= minInter)
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sz", "a_size"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sz", "b_size"), "b_id")
      .select("a_id", "b_id", "inter", "a_size", "b_size")
  }

  /** MinHash signature over a MATERIALIZED shingle-array column: k
    * independent hash functions (murmur3 salted by the function index),
    * each taking the min over the document's shingles. */
  def minhashSignatureFromShingles(sh: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => coalesce(array_min(transform(sh, s => hash(s, i))), lit(0)))

  /** Banded-LSH candidate pairs over MinHash signatures:
    * band key = hash(bandIdx, signature slice); documents sharing any band
    * key become candidates (pairs only WITHIN a band bucket — never O(n^2)).
    * Classic s-curve tuning: bands * rows == numHashes.
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val sig = shingleSets(df, idCol, textCol, shingleK)
      .select(col("doc_id"),
        minhashSignatureFromShingles(col("sh"), numHashes).as("sig"))
    val banded = sig.select(col("doc_id"), explode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), hash(slice(col("sig"), b * rows + 1, lit(rows)), b)
          .as("key")))).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs, verified with exact shingle Jaccard on the
    * candidate set only. `minJaccardPct` is an integer percentage to keep
    * the operator's output engine-exact (no float thresholds). */
  def minhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, minJaccardPct: Int = 50): DataFrame = {
    val cands = minhashCandidatePairs(df, idCol, textCol, numHashes, bands)
    val sh = shingleSets(df, idCol, textCol)
    cands.join(sh.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sh", "a_sh"), "a_id")
      .join(sh.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sh", "b_sh"), "b_id")
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("uni", size(col("a_sh")) + size(col("b_sh")) - col("inter"))
      .filter(col("inter") * 100 >= col("uni") * minJaccardPct)
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"))
  }
}
