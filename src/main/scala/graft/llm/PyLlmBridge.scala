package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Py4J-friendly entry points for the LLM-pipeline operators (same
  * bridge discipline as [[graft.tables.PyBridge]]: exact reflected
  * arities, Java collections, no logic of its own — every call lands on
  * the Scala operator). */
object PyLlmBridge {

  def exactDuplicateGroups(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Dedup.exactDuplicateGroups(df, idCol, textCol)

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, minInter: Int): DataFrame =
    Dedup.ngramJaccardPairs(df, idCol, textCol, k, minInter)

  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      minJaccardPct: Int): DataFrame =
    Dedup.minhashNearDuplicates(df, idCol, textCol,
      minJaccardPct = minJaccardPct)

  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int): DataFrame =
    Dedup.duplicateSpans(df, idCol, textCol, k, minDocs)

  def scrubSpans(df: DataFrame, spans: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Dedup.scrubSpans(df, spans, idCol, textCol)

  def duplicateClusters(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame =
    Dedup.duplicateClusters(pairs, aCol, bCol)

  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Dedup.contamination(train, eval, idCol, textCol)

  def semanticClusters(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame =
    Dedup.semanticClusters(df, idCol, vecCol, k)

  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      k: Int, minCosine: Double, maxClusterSize: Int): DataFrame =
    Dedup.semanticNearDupPairs(df, idCol, vecCol, k, minCosine,
      maxClusterSize = maxClusterSize)

  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, numPlanes: Int, maxBucketSize: Int): DataFrame =
    Dedup.embeddingNearDuplicates(df, idCol, vecCol, minCosine, numPlanes,
      maxBucketSize = maxBucketSize)

  /** Split telemetry of the most recent capped pair-producer plan (ops:
    * "embedding", "semantic") as a py4j-friendly map; null before the
    * first call. */
  def lastSplitReport(op: String): java.util.Map[String, Any] =
    Dedup.lastSplitReport(op).map { r =>
      val m = new java.util.HashMap[String, Any]()
      m.put("op", r.op); m.put("cap", r.cap)
      m.put("groupsSplit", r.groupsSplit)
      m.put("docsInSplitGroups", r.docsInSplitGroups)
      m.put("largestGroup", r.largestGroup)
      m.put("maxPlanes", r.maxPlanes)
      m
    }.orNull

  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame =
    TextAnalysis.langId(df, textCol, idCol)

  def qualityStats(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    TextAnalysis.qualityStats(df, textCol, idCol)

  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextAnalysis.piiScrub(df, idCol, textCol)

  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkChars: Int, strideChars: Int): DataFrame =
    TextAnalysis.chunkDocuments(df, idCol, textCol, chunkChars, strideChars)

  def bruteTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame =
    Ann.bruteTopK(corpus, idCol, vecCol, queries, queryIdCol, queryVecCol, k)

  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame =
    Ann.ivfTopK(corpus, idCol, vecCol, queries, queryIdCol, queryVecCol, k)

  def annIndexBuild(spark: SparkSession, indexPath: String, corpus: DataFrame,
      idCol: String, vecCol: String, nCentroids: Int): Unit =
    AnnIndex.build(spark, indexPath, corpus, idCol, vecCol, nCentroids)

  def annIndexTopK(spark: SparkSession, indexPath: String, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, k: Int): DataFrame =
    AnnIndex.topK(spark, indexPath, queries, queryIdCol, queryVecCol, k)

  def annIndexSync(spark: SparkSession, indexPath: String,
      corpusPath: String, idCol: String, vecCol: String): Long =
    AnnIndex.syncFromTable(spark, indexPath, corpusPath, idCol, vecCol)

  def annRebuildDue(indexPath: String): Boolean =
    AnnIndex.rebuildDue(indexPath)

  def annRebuildIfDue(spark: SparkSession, indexPath: String,
      corpusPath: String, idCol: String, vecCol: String,
      nCentroids: Int, hashBucketNum: Int, force: Boolean): Boolean =
    AnnIndex.rebuildIfDue(spark, indexPath, corpusPath, idCol, vecCol,
      nCentroids, hashBucketNum, force = force)

  def minhashIndexSync(spark: SparkSession, indexPath: String,
      docsPath: String, idCol: String, textCol: String): Long =
    MinhashIndex.syncFromTable(spark, indexPath, docsPath, idCol, textCol)

  def minhashIncrementalPairs(spark: SparkSession, indexPath: String,
      corpus: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String, minJaccardPct: Int): DataFrame =
    MinhashIndex.incrementalPairs(spark, indexPath, corpus, newDocs,
      idCol, textCol, minJaccardPct = minJaccardPct)
}
