#!/usr/bin/env python3
"""Smoke test for the graft Python binding (reference ``python/run-tests.py``).

Needs pyspark and the compiled graft classes::

    sbt compile
    python3 python/run-tests.py
"""

import os
import shutil
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "python"))

CLASSES = os.path.join(ROOT, "target", "scala-2.13", "classes")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def check(name, ok):
    print("%s %s" % ("PASS" if ok else "FAIL", name))
    if not ok:
        sys.exit(1)


def main():
    extra = CLASSES
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.driver.extraClassPath", extra)
             .config("spark.executor.extraClassPath", extra)
             .config("spark.sql.extensions",
                     "graft.rules.GraftSparkSessionExtension")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="graft-py-")
    path = os.path.join(tmp, "t")
    try:
        from graft.tables import GraftTable

        (spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id long, v long")
         .write.format("graft")
         .option("hashPartitions", "id").option("hashBucketNum", "2")
         .save(path))
        check("isGraftTable", GraftTable.isGraftTable(spark, path))

        t = GraftTable.forPath(spark, path)
        check("toDF", t.toDF().count() == 3)

        t.upsert(spark.createDataFrame([(2, 200), (4, 40)], "id long, v long"))
        got = {r["id"]: r["v"] for r in t.toDF().collect()}
        check("upsert", got == {1: 10, 2: 200, 3: 30, 4: 40})

        rpath = os.path.join(tmp, "r")
        (spark.createDataFrame([(1, 1, 1), (1, 2, 2), (2, 3, 3)],
                               "dt int, id long, v long")
         .write.format("graft").partitionBy("dt")
         .option("hashPartitions", "id").option("hashBucketNum", "2")
         .save(rpath))
        rt = GraftTable.forPath(spark, rpath)
        rt.upsert(spark.createDataFrame([(1, 2, 22)], "dt int, id long, v long"),
                  mode="merge", condition="dt = 1")
        got = {r["id"]: r["v"] for r in rt.toDF().collect()}
        check("conditional upsert", got == {1: 1, 2: 22, 3: 3})

        ts_rows = (spark.read.format("graft")
                   .option("versionAsOf", "0").load(path).count())
        check("versionAsOf read option", ts_rows == 3)

        check("alias", t.alias("a").select("a.id").count() == 4)

        t.update(condition="id = 1", set={"v": "v + 5"})
        t.update(condition=F.col("id") == 3, set={"v": F.lit(0)})
        got = {r["id"]: r["v"] for r in t.toDF().collect()}
        check("update", got[1] == 15 and got[3] == 0)

        t.delete("v = 0")
        check("delete", t.toDF().count() == 3)

        t.compaction()
        check("compaction", t.toDF().count() == 3)

        v_rb = t.rebucket(4)
        check("rebucket", v_rb > 0 and t.toDF().count() == 3)

        check("cleanup dryRun", t.cleanup(dryRun=True) == [])

        cpath = os.path.join(tmp, "c")
        t.cloneTo(cpath)  # rebucket/compaction left a clean snapshot
        ct = GraftTable.forPath(spark, cpath)
        ct.upsert(spark.createDataFrame([(9, 9)], "id long, v long"))
        check("cloneTo", ct.toDF().count() == 4 and t.toDF().count() == 3)

        import time
        cut = int(time.time() * 1000)
        time.sleep(0.01)  # the upsert's commit must stamp strictly after
        t.upsert(spark.createDataFrame([(8, 8)], "id long, v long"))
        tpath = os.path.join(tmp, "cts")
        t.cloneToAtTimestamp(tpath, str(cut))  # pre-upsert state
        check("cloneToAtTimestamp",
              GraftTable.forPath(spark, tpath).toDF().count() == 3
              and t.toDF().count() == 4)

        dpath = os.path.join(tmp, "cdeep")
        t.cloneDeep(dpath)
        # localized: the deep clone materialized parquet under its own root
        local_parquet = any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(dpath) for f in fs)
        check("cloneDeep",
              GraftTable.forPath(spark, dpath).toDF().count()
              == t.toDF().count() and local_parquet)
        # deep clone is fully compacted -> manifest export is legal
        check("generateManifest",
              GraftTable.forPath(spark, dpath).generateManifest() >= 1)

        rpath = os.path.join(tmp, "replica")
        rck = os.path.join(tmp, "replica_ck")
        t.cloneTo(rpath)
        # behind-probe BEFORE the stream starts: with a running
        # 10-second-trigger stream the batch could already have applied
        t.upsert(spark.createDataFrame([(41, 41)], "id long, v long"))
        st_behind = t.replicationStatus(rpath)
        rq = t.replicateTo(rpath, rck)
        try:
            rq.processAllAvailable()
            check("replicateTo",
                  GraftTable.forPath(spark, rpath).toDF().count()
                  == t.toDF().count())
            st = t.replicationStatus(rpath)
            check("replicationStatus",
                  st_behind["pendingVersions"] >= 1
                  and st["inSync"] and st["pendingVersions"] == 0
                  and st["appliedVersion"] == st["sourceVersion"])
        finally:
            rq.stop()
        t.delete("id = 41")  # restore the shared fixture's row count

        t.toDF().createOrReplaceTempView("pyt")
        snap_df = GraftTable.snapshotSql(
            spark, "SELECT count(*) AS c FROM pyt")
        check("snapshotSql", snap_df.collect()[0]["c"] == t.toDF().count())

        apath = os.path.join(tmp, "capply")
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string") \
            .write.format("graft").option("hashPartitions", "id") \
            .option("hashBucketNum", "2").save(apath)
        at = GraftTable.forPath(spark, apath)
        at.applyChanges(
            spark.createDataFrame(
                [(1, "a1", "u", 1), (1, "a2", "u", 2), (2, None, "d", 1)],
                "id long, v string, op string, seq long"),
            "op", ["seq"])
        arows = {r["id"]: r["v"] for r in at.toDF().collect()}
        check("applyChanges", arows == {1: "a2"})

        from graft.llm import Dedup, TextAnalysis, Ann
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today"),
             (2, "the quick brown fox jumps over the lazy dog tonight"),
             (3, "completely different words in this one entirely")],
            "doc_id long, text string")
        dups = Dedup.exactDuplicateGroups(docs, "doc_id", "text")
        check("llm exactDuplicateGroups", dups.count() == 3)
        spans = Dedup.duplicateSpans(docs, "doc_id", "text", k=5)
        span_docs = {r["doc_id"] for r in spans.collect()}
        check("llm duplicateSpans", span_docs == {1, 2})
        scrubbed = {r["doc_id"]: r["removed_words"]
                    for r in Dedup.scrubSpans(docs, spans, "doc_id",
                                              "text").collect()}
        check("llm scrubSpans", scrubbed[3] == 0 and scrubbed[1] > 0)
        langs = TextAnalysis.langId(docs, "text", "doc_id")
        check("llm langId", langs.count() == 3)
        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1])],
            "id long, vec array<float>")
        nn = Ann.bruteTopK(vecs, "id", "vec", vecs, "id", "vec", k=1)
        top = {r["qid"]: r["nid"] for r in nn.collect()}
        check("llm bruteTopK", top == {1: 1, 2: 2, 3: 3})
        emb_pairs = {(r["a_id"], r["b_id"])
                     for r in Dedup.embeddingNearDuplicates(
                         vecs, "id", "vec", minCosine=0.9,
                         numPlanes=1).collect()}
        check("llm embeddingNearDuplicates", emb_pairs == {(1, 3)})
        sem_pairs = {(r["a_id"], r["b_id"])
                     for r in Dedup.semanticNearDupPairs(
                         vecs, "id", "vec", k=2,
                         minCosine=0.9).collect()}
        check("llm semanticNearDupPairs", sem_pairs == {(1, 3)})
        rep = Dedup.lastSplitReport(spark, "semantic")
        check("llm lastSplitReport",
              rep is not None and rep["groupsSplit"] == 0)

        check("history", t.history().count() >= 4)

        drows = t.detail().collect()
        check("detail", len(drows) == 1 and drows[0]["numFiles"] > 0)
        check("partitions", t.partitions().count() >= 1)

        ch = t.changes(0)
        check("changes feed", ch.count() > 0 and
              "_change_type" in ch.columns and "_commit_version" in ch.columns)

        before = t.toDF().count()
        t.restore(0)
        restored_ok = t.toDF().count() in (3, 4)  # version-0 row count
        t.restore(t.history().count() - 2)  # rewind the rewind
        check("restore round-trip", restored_ok and t.toDF().count() == before)

        zpath = os.path.join(tmp, "ztab")
        (spark.createDataFrame([(i, i * 2) for i in range(100)], "a long, b long")
         .write.format("graft").save(zpath))
        zt = GraftTable.forPath(spark, zpath)
        zt.zOrder(["a", "b"])
        check("zOrder", zt.toDF().count() == 100)

        spark.read.format("graft").load(path).createOrReplaceTempView("pyfn")
        check("forName", GraftTable.forName(spark, "pyfn").toDF().count() == 4)

        t.dropTable()
        check("dropTable", not GraftTable.isGraftTable(spark, path))
        print("ALL PASS")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
