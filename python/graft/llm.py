"""Python binding for the LLM-pipeline operators (``graft.llm``).

Thin py4j wrappers over the JVM-side ``graft.llm.PyLlmBridge``; every
function takes/returns PySpark DataFrames and runs the same distributed
plan the Scala API builds::

    from graft.llm import Dedup, TextAnalysis, Ann

    Dedup.exactDuplicateGroups(docs, "doc_id", "text")
    spans = Dedup.duplicateSpans(docs, "doc_id", "text", k=8)
    Dedup.scrubSpans(docs, spans, "doc_id", "text")
    TextAnalysis.langId(docs, "text", "doc_id")
    Ann.bruteTopK(corpus, "id", "vec", queries, "id", "vec", k=10)
"""

from pyspark.sql import DataFrame


def _bridge(df):
    return df.sparkSession._sc._jvm.graft.llm.PyLlmBridge


def _wrap(jdf, df):
    return DataFrame(jdf, df.sparkSession)


class Dedup(object):
    """Deduplication operators (exact, fuzzy, span-level, semantic)."""

    @staticmethod
    def exactDuplicateGroups(df, idCol, textCol):
        """(content_hash, keep_id, dup_cnt) per distinct text."""
        return _wrap(_bridge(df).exactDuplicateGroups(df._jdf, idCol,
                                                      textCol), df)

    @staticmethod
    def ngramJaccardPairs(df, idCol, textCol, k=3, minInter=3):
        """Exact n-gram-overlap pairs via an inverted shingle index."""
        return _wrap(_bridge(df).ngramJaccardPairs(df._jdf, idCol, textCol,
                                                   int(k), int(minInter)), df)

    @staticmethod
    def minhashNearDuplicates(df, idCol, textCol, minJaccardPct=50):
        """Banded MinHash-LSH candidates, exact-Jaccard verified."""
        return _wrap(_bridge(df).minhashNearDuplicates(
            df._jdf, idCol, textCol, int(minJaccardPct)), df)

    @staticmethod
    def duplicateSpans(df, idCol, textCol, k=8, minDocs=2):
        """Maximal word spans whose k-grams repeat across documents
        (substring-level dedup); 0-based inclusive word indices."""
        return _wrap(_bridge(df).duplicateSpans(df._jdf, idCol, textCol,
                                                int(k), int(minDocs)), df)

    @staticmethod
    def scrubSpans(df, spans, idCol, textCol):
        """Rebuild text with the given spans' words removed."""
        return _wrap(_bridge(df).scrubSpans(df._jdf, spans._jdf, idCol,
                                            textCol), df)

    @staticmethod
    def duplicateClusters(pairs, aCol, bCol):
        """(doc_id, cluster_id) connected components over a pair list."""
        return _wrap(_bridge(pairs).duplicateClusters(pairs._jdf, aCol,
                                                      bCol), pairs)

    @staticmethod
    def contamination(train, evalDf, idCol, textCol):
        """Train-vs-eval shingle overlap (benchmark contamination)."""
        return _wrap(_bridge(train).contamination(train._jdf, evalDf._jdf,
                                                  idCol, textCol), train)

    @staticmethod
    def semanticNearDupPairs(df, idCol, vecCol, k, minCosine=0.95,
                             maxClusterSize=0):
        """SemDeDup-style near-dup pairs: exact cosine WITHIN k-means
        clusters; clusters above ``maxClusterSize`` (0 = conf default
        250) are residual-LSH subdivided so a skewed cluster can never
        go quadratic in the corpus."""
        return _wrap(_bridge(df).semanticNearDupPairs(
            df._jdf, idCol, vecCol, int(k), float(minCosine),
            int(maxClusterSize)), df)

    @staticmethod
    def embeddingNearDuplicates(df, idCol, vecCol, minCosine=0.95,
                                numPlanes=4, maxBucketSize=0):
        """Hyperplane-LSH near-dup pairs with exact cosine within
        buckets; buckets above ``maxBucketSize`` (0 = conf default 250)
        subdivide around their mean direction."""
        return _wrap(_bridge(df).embeddingNearDuplicates(
            df._jdf, idCol, vecCol, float(minCosine), int(numPlanes),
            int(maxBucketSize)), df)

    @staticmethod
    def semanticClusters(df, idCol, vecCol, k):
        """Spherical k-means cluster assignment over an embedding column."""
        return _wrap(_bridge(df).semanticClusters(df._jdf, idCol, vecCol,
                                                  int(k)), df)

    @staticmethod
    def lastSplitReport(spark, op):
        """Split telemetry of the most recent capped pair-producer plan in
        this JVM (op: ``"embedding"`` or ``"semantic"``): dict with
        groupsSplit / docsInSplitGroups / largestGroup / maxPlanes / cap,
        or None before the first call. ``groupsSplit == 0`` means the
        output was bit-identical to the uncapped spelling."""
        jmap = spark._sc._jvm.graft.llm.PyLlmBridge.lastSplitReport(op)
        return None if jmap is None else dict(jmap)


class TextAnalysis(object):
    """Text statistics, language ID, PII scrubbing, chunking."""

    @staticmethod
    def langId(df, textCol, idCol):
        return _wrap(_bridge(df).langId(df._jdf, textCol, idCol), df)

    @staticmethod
    def qualityStats(df, textCol, idCol):
        return _wrap(_bridge(df).qualityStats(df._jdf, textCol, idCol), df)

    @staticmethod
    def piiScrub(df, idCol, textCol):
        return _wrap(_bridge(df).piiScrub(df._jdf, idCol, textCol), df)

    @staticmethod
    def chunkDocuments(df, idCol, textCol, chunkChars=2000, strideChars=1500):
        return _wrap(_bridge(df).chunkDocuments(
            df._jdf, idCol, textCol, int(chunkChars), int(strideChars)), df)


class Ann(object):
    """Nearest-neighbor search over embedding columns."""

    @staticmethod
    def bruteTopK(corpus, idCol, vecCol, queries, queryIdCol, queryVecCol,
                  k=10):
        return _wrap(_bridge(corpus).bruteTopK(
            corpus._jdf, idCol, vecCol, queries._jdf, queryIdCol,
            queryVecCol, int(k)), corpus)

    @staticmethod
    def ivfTopK(corpus, idCol, vecCol, queries, queryIdCol, queryVecCol,
                k=10):
        return _wrap(_bridge(corpus).ivfTopK(
            corpus._jdf, idCol, vecCol, queries._jdf, queryIdCol,
            queryVecCol, int(k)), corpus)

    @staticmethod
    def indexBuild(spark, indexPath, corpus, idCol, vecCol, nCentroids=16):
        spark._sc._jvm.graft.llm.PyLlmBridge.annIndexBuild(
            spark._jsparkSession, indexPath, corpus._jdf, idCol, vecCol,
            int(nCentroids))

    @staticmethod
    def indexTopK(spark, indexPath, queries, queryIdCol, queryVecCol, k=10):
        jdf = spark._sc._jvm.graft.llm.PyLlmBridge.annIndexTopK(
            spark._jsparkSession, indexPath, queries._jdf, queryIdCol,
            queryVecCol, int(k))
        return DataFrame(jdf, spark)

    @staticmethod
    def indexSync(spark, indexPath, corpusPath, idCol, vecCol):
        """Follow a graft corpus table's change feed; returns the synced
        version."""
        return spark._sc._jvm.graft.llm.PyLlmBridge.annIndexSync(
            spark._jsparkSession, indexPath, corpusPath, idCol, vecCol)

    @staticmethod
    def rebuildDue(spark, indexPath):
        """Whether a deferred churn-triggered rebuild is pending."""
        return spark._sc._jvm.graft.llm.PyLlmBridge.annRebuildDue(indexPath)

    @staticmethod
    def rebuildIfDue(spark, indexPath, corpusPath, idCol, vecCol,
                     nCentroids=16, hashBucketNum=4, *, force=False):
        """Pay a deferred churn rebuild off the sync path: build a fresh
        generation and atomically swap. Pass the index's original
        ``hashBucketNum`` — the rebuild re-buckets to this value.
        Returns True iff a rebuild ran."""
        return spark._sc._jvm.graft.llm.PyLlmBridge.annRebuildIfDue(
            spark._jsparkSession, indexPath, corpusPath, idCol, vecCol,
            int(nCentroids), int(hashBucketNum), bool(force))


class MinhashIndex(object):
    """Persistent MinHash-LSH index for incremental dedup."""

    @staticmethod
    def syncFromTable(spark, indexPath, docsPath, idCol, textCol):
        return spark._sc._jvm.graft.llm.PyLlmBridge.minhashIndexSync(
            spark._jsparkSession, indexPath, docsPath, idCol, textCol)

    @staticmethod
    def incrementalPairs(spark, indexPath, corpus, newDocs, idCol, textCol,
                         minJaccardPct=50):
        jdf = spark._sc._jvm.graft.llm.PyLlmBridge.minhashIncrementalPairs(
            spark._jsparkSession, indexPath, corpus._jdf, newDocs._jdf,
            idCol, textCol, int(minJaccardPct))
        return DataFrame(jdf, spark)
