package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Ann, Dedup, Multimodal, SimHash, TextAnalysis}

/** The correctness/benchmark query surface. Each entry reads graft-format
  * tables built by `GraftData` (exercising the engine's own write + scan
  * paths) and has, where SQL-expressible, a DuckDB oracle over the ORIGINAL
  * parquet tables in `oracles` — the driver hash-compares the two.
  *
  * Cross-engine determinism rules used throughout:
  *  - aggregates over floats are computed as integer cents
  *    (`CAST(ROUND(x*100) AS BIGINT)`) — exact and associative in both
  *    engines, immune to summation order;
  *  - counts/lengths cast to the same integer width on both sides;
  *  - ties in rankings broken by a unique key.
  */
object Queries {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    // ---- table format: write/read/prune + TPC-H-style relational ----
    "q_write_read_prune" -> ((s, sf) =>
      GraftData.lineitemRange(s, sf)
        .filter(col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    "q1_agg" -> ((s, sf) =>
      GraftData.lineitemRange(s, sf)
        .filter(expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("sum_disc_cents"),
          count(lit(1)).as("cnt"))),

    "q_pk_join" -> ((s, sf) =>
      GraftData.ordersPk(s, sf)
        .join(GraftData.lineitemBucket(s, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("l_extendedprice"))).as("revenue_cents"))),

    // star join with a selectively-filtered dim: the completed broadcast
    // side reaches the PK fact scan as a runtime IN filter
    // (SupportsRuntimeV2Filtering) — matching buckets only, planned at
    // execution time with zero user hints
    "q_dpp_join" -> ((s, sf) =>
      GraftData.ordersPk(s, sf)
        .join(GraftData.parquet(s, sf, "lineitem")
          .filter(col("l_quantity") === 50 && col("l_returnflag") === "R" &&
            col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1997-02-01"))
          .select(col("l_orderkey"), col("l_extendedprice")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          cents(col("l_extendedprice")).as("price_cents"))),

    // TPC-H Q3 shape (shipping priority): selective dim filter, two
    // PK-aligned joins (orders⋈lineitem is shuffle-free on the orderkey
    // buckets), top-10 by exact cents revenue with full tie-breaks
    "q_tpch_q3" -> ((s, sf) =>
      GraftData.customerPk(s, sf)
        .filter(col("c_mktsegment") === "BUILDING")
        .join(GraftData.ordersPk(s, sf)
          .filter(col("o_orderdate") < lit("1997-01-01")),
          col("c_custkey") === col("o_custkey"))
        .join(GraftData.lineitemBucket(s, sf)
          .filter(col("l_shipdate") > lit("1997-01-01")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderdate"),
          col("l_orderkey"))
        .limit(10)),

    // TPC-H Q5 shape (local-supplier volume): 6-way star, the four small
    // dims broadcast (AQE), the fact side never shuffles more than once
    "q_tpch_q5" -> ((s, sf) =>
      GraftData.customerPk(s, sf)
        .join(GraftData.ordersPk(s, sf)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01")),
          col("c_custkey") === col("o_custkey"))
        .join(GraftData.lineitemBucket(s, sf),
          col("o_orderkey") === col("l_orderkey"))
        .join(GraftData.supplierPlain(s, sf),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(GraftData.nationPlain(s, sf),
          col("s_nationkey") === col("n_nationkey"))
        .join(GraftData.regionPlain(s, sf),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"))),

    "q_cust_join" -> ((s, sf) =>
      GraftData.customerPk(s, sf)
        .join(GraftData.ordersByCust(s, sf),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("o_totalprice"))).as("total_cents"))),

    "q_join_semi" -> ((s, sf) =>
      GraftData.customerPk(s, sf)
        .join(GraftData.ordersByCust(s, sf),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),

    "q_join_anti" -> ((s, sf) =>
      GraftData.customerPk(s, sf)
        .join(GraftData.ordersByCust(s, sf),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    "q_join_full" -> ((s, sf) =>
      GraftData.nationPlain(s, sf)
        .join(GraftData.customerPk(s, sf),
          col("n_nationkey") === col("c_nationkey"), "full_outer")
        .select(col("n_nationkey"), col("n_name"), col("c_custkey"))),

    "q_pushdown_filters" -> ((s, sf) =>
      GraftData.partPlain(s, sf)
        .filter(expr("(p_size > 10 AND p_size <= 40 AND p_type LIKE 'STANDARD%')" +
          " OR p_brand IN ('Brand#12','Brand#23')"))
        .select(col("p_partkey"), col("p_size"), col("p_brand"), col("p_type"))),

    "q_expr_surface" -> ((s, sf) =>
      GraftData.ordersPk(s, sf).select(
        col("o_orderkey"),
        coalesce(expr("nullif(o_orderstatus, 'O')"), lit("OPEN")).as("st"),
        floor(col("o_totalprice")).cast("long").as("total_floor"),
        when(col("o_totalprice") > 150000, "big").otherwise("small").as("size_class"))),

    "q_scalar_string" -> ((s, sf) =>
      GraftData.partPlain(s, sf).select(
        col("p_partkey"),
        length(col("p_name")).cast("int").as("name_len"),
        upper(col("p_brand")).as("brand_up"),
        substring(col("p_type"), 1, 5).as("type5"),
        md5(col("p_name")).as("name_md5"))),

    "q_datetime" -> ((s, sf) =>
      GraftData.ordersPk(s, sf).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("yr"),
        month(col("o_orderdate")).cast("int").as("mo"),
        dayofmonth(col("o_orderdate")).cast("int").as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))),

    "q_window_topk" -> ((s, sf) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      GraftData.ordersByCust(s, sf)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"))
    }),

    "q_events_minutely" -> ((s, sf) =>
      GraftData.eventsPlain(s, sf)
        .groupBy(col("event_type"),
          date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm")
            .as("minute_str"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("value_cents"))),

    // ---- as-of join / range join / KMV sketch (graft.ops.Relational) ----

    // backward as-of join: for each purchase, the user's latest click
    // at-or-before it — union + carry-forward window, ONE shuffle on the
    // user key (never an inequality join); the oracle spells the same
    // semantics as an honest inequality join + row_number
    "q_asof_join" -> ((s, sf) => {
      val ev = GraftData.eventsPlain(s, sf)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          cents(col("value")).as("click_cents"))
      graft.ops.Relational.asOfJoin(purchases, clicks,
          leftKey = "user_id", rightKey = "c_user",
          leftTime = "ts", rightTime = "c_ts",
          payload = Seq("click_cents"), asofTimeAlias = "click_ts")
        .select(col("event_id"),
          unix_micros(col("click_ts")).as("click_ts_us"), col("click_cents"))
    }),

    // interval containment with NO equi key: per 10-minute error window,
    // the non-error events inside it — intervals explode onto fixed time
    // buckets and equi-join there (cost ∝ true matches), never a
    // nested-loop; the oracle runs the plain inequality join
    "q_range_join" -> ((s, sf) => {
      val ev = GraftData.eventsPlain(s, sf)
      val windows = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("window_id"), col("ts").as("w_start"),
          timestamp_micros(unix_micros(col("ts")) + 600L * 1000000L)
            .as("w_end"))
      val probes = ev.filter(col("event_type") =!= "error")
        .select(col("ts").as("p_ts"), cents(col("value")).as("p_cents"))
      graft.ops.Relational.rangeJoin(probes, "p_ts", windows,
          "w_start", "w_end", bucketMicros = 600L * 1000000L)
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("p_cents")).as("sum_cents"))
    }),

    // KMV distinct sketch: md5-derived 60-bit hashes make the k-minimum-
    // values estimate fully deterministic, so DuckDB rebuilds the SAME
    // sketch bit-for-bit — an oracle-able cardinality sketch (HLL isn't)
    "q_kmv_distinct" -> ((s, sf) =>
      graft.ops.Relational.kmvDistinct(GraftData.eventsPlain(s, sf),
        Seq("event_type"), "user_id", k = 64)),

    // gap-based sessionization (1-day gap): one shuffle on the user key,
    // session analytics reduce per (user, session); event_id tiebreak pins
    // the visit order so the oracle's stacked-CTE replay can't split ties
    "q_sessionize" -> ((s, sf) =>
      graft.ops.Relational.sessionize(GraftData.eventsPlain(s, sf),
          "user_id", "ts", gapMicros = 86400L * 1000000L,
          tieBreak = Seq("event_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"),
          count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("cents"))),

    // exact discrete quantiles by explicit rank arithmetic (value at
    // ceil(p*n), 1-based) — percentile_disc's discrete-selection
    // convention is engine-defined, the rank formula is not
    "q_quantiles" -> ((s, sf) =>
      graft.ops.Relational.discQuantiles(
        GraftData.eventsPlain(s, sf)
          .select(col("event_type"), cents(col("value")).as("cents")),
        Seq("event_type"), "cents", Seq(0.5, 0.9, 0.99))),

    "q_math_funcs" -> ((s, sf) =>
      GraftData.partPlain(s, sf).select(
        col("p_partkey"),
        abs(col("p_retailprice") - 1000.0d).as("abs_diff"),
        ceil(col("p_retailprice")).cast("long").as("price_ceil"),
        floor(col("p_retailprice")).cast("long").as("price_floor"),
        sqrt(col("p_retailprice")).as("price_sqrt"),
        pmod(col("p_partkey"), lit(7L)).as("key_mod"),
        greatest(col("p_size"), lit(25)).cast("int").as("size_hi"),
        least(col("p_size"), lit(25)).cast("int").as("size_lo"))),

    "q_array_funcs" -> ((s, sf) =>
      GraftData.embeddingsPlain(s, sf).select(
        col("vec_id"),
        size(col("embedding")).cast("int").as("dim_cnt"),
        element_at(col("embedding"), 1).as("first_val"),
        element_at(col("embedding"), -1).as("last_val"),
        col("label"))),

    "q_rollup" -> ((s, sf) =>
      GraftData.lineitemRange(s, sf)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("l_quantity"))).as("qty_cents"))),

    "q_json_extract" -> ((s, sf) =>
      GraftData.eventsPlain(s, sf).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))),

    "q_crypto" -> ((s, sf) =>
      GraftData.partPlain(s, sf).select(
        col("p_partkey"),
        md5(col("p_name")).as("name_md5"),
        sha2(col("p_name"), 256).as("name_sha256"))),

    // ---- merge-on-read DML state ----
    "q_upsert_lastwins" -> ((s, sf) =>
      GraftData.ordersUpserted(s, sf).select(
        col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"),
        col("o_orderstatus"))),

    "q_compaction_stable" -> ((s, sf) =>
      GraftData.ordersCompacted(s, sf).select(
        col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"),
        col("o_orderstatus"))),

    // rebucket (16 -> 8 buckets) must preserve the merged state exactly:
    // upsert history + tombstone delete resolve through the layout rewrite
    "q_rebucket_stable" -> ((s, sf) =>
      GraftData.ordersRebucketed(s, sf).select(
        col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"),
        col("o_orderstatus"))),

    // SHOW PARTITIONS row counts from the MANIFEST (footer stats, zero
    // data I/O); the oracle computes them honestly from the raw parquet
    "q_partitions_meta" -> ((s, sf) =>
      graft.tables.GraftTable
        .forPath(s, GraftData.documentsRangeDir(s, sf)).partitions()
        .select(col("partition"), col("approxRows").as("n_rows"))),

    "q_merge_op_sum" -> ((s, sf) =>
      s.read.format("graft").option("mergeOperators", "cnt:sum")
        .load(GraftData.custCountsDir(s, sf))
        .select(col("o_custkey"), col("cnt"))),

    "q_update" -> ((s, sf) =>
      GraftData.customerUpdated(s, sf).select(
        col("c_custkey"), cents(col("c_acctbal")).as("acct_cents"),
        col("c_mktsegment"))),

    "q_delete" -> ((s, sf) =>
      GraftData.customerDeleted(s, sf).select(
        col("c_custkey"), col("c_name"), cents(col("c_acctbal")).as("acct_cents"))),

    "q_merge_into" -> ((s, sf) =>
      GraftData.customerMerged(s, sf).select(
        col("c_custkey"), cents(col("c_acctbal")).as("acct_cents"))),

    "q_merge_delete" -> ((s, sf) =>
      GraftData.customerMergeDeleted(s, sf).select(
        col("c_custkey"), cents(col("c_acctbal")).as("acct_cents"))),

    "q_dv_delete" -> ((s, sf) =>
      GraftData.documentsDvDeleted(s, sf).select(
        col("doc_id"), length(col("text")).cast("long").as("text_len"))),

    "q_sql_update" -> ((s, sf) =>
      GraftData.customerSqlUpdated(s, sf).select(
        col("c_custkey"), cents(col("c_acctbal")).as("acct_cents"),
        col("c_mktsegment"))),

    "q_mv_contained" -> ((s, sf) =>
      GraftData.ordersMvBase(s, sf)
        .filter(col("o_orderkey") >= 50 && col("o_orderkey") <= 2500)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("total_cents"))),

    "q_mv_agg" -> ((s, sf) =>
      GraftData.ordersMvAgg(s, sf)
        .filter(col("o_custkey") >= 100 && col("o_custkey") <= 2000)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))
        .select(col("o_custkey"), col("cnt"),
          cents(col("total")).as("total_cents"))),

    "q_mv_rollup" -> ((s, sf) =>
      GraftData.ordersMvAgg(s, sf)
        .filter(col("o_custkey") >= 100 && col("o_custkey") <= 2000)
        .groupBy()
        .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))
        .select(col("cnt"), cents(col("total")).as("total_cents"))),

    "q_mv_join" -> ((s, sf) => {
      val (c, o) = GraftData.custOrdersMvJoin(s, sf)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .filter(col("c_custkey") >= 10 && col("c_custkey") <= 500 &&
          col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          cents(col("o_totalprice")).as("total_cents"))
    }),

    // round-11 incremental-refresh folds, gated end-to-end: the fixtures
    // THROW unless the refresh takes the fold path (counter-asserted), and
    // the oracle recomputes the aggregate from the replayed final state —
    // so a wrong fold fails the hash and a silent recompute fails the build
    "q_mv_inc_fold" -> ((s, sf) =>
      GraftData.ordersMvIncFold(s, sf)
        .select(col("o_custkey"), col("cnt"), col("cp"), col("sp"),
          col("ap"), col("mnp"), col("mxp"), col("dp"),
          col("cpe"), col("spe"))),

    "q_mv_inc_join" -> ((s, sf) =>
      GraftData.ordersMvIncJoin(s, sf)
        .select(col("c_mktsegment"), col("cnt"), col("cp"), col("sp"))),

    // SHALLOW CLONE + divergent DML, fully oracled: the clone reads
    // through zero-copy external refs, the upsert/delete land clone-side
    // only (the fixture asserts source isolation), and the oracle replays
    // the same mutations over the base parquet
    "q_clone_dml" -> ((s, sf) =>
      GraftData.customerCloneDml(s, sf)
        .select(col("c_custkey"), col("c_mktsegment"), col("bal_cents"))),

    // CDC APPLY: one batch, multiple changes per key — winner-per-key by
    // sequence, deletes win ties; oracle replays the final state in SQL
    "q_apply_changes" -> ((s, sf) =>
      GraftData.customerApplyChanges(s, sf)
        .select(col("c_custkey"), col("c_mktsegment"), col("bal_cents"))),

    "q_mv_join3" -> ((s, sf) => {
      val (c, o, n) = GraftData.custOrdersNationMvJoin(s, sf)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .filter(col("c_custkey") >= 10 && col("c_custkey") <= 800 &&
          col("n_regionkey") <= 3)
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))
    }),

    // ---- LLM data-pipeline operators ----
    "q_schema_evolution" -> ((s, sf) =>
      GraftData.customerEvolved(s, sf).select(
        col("c_custkey"), col("c_name"), cents(col("c_acctbal")).as("acct_cents"))),

    "q_dedup_exact" -> ((s, sf) =>
      Dedup.exactDuplicateGroups(GraftData.documentsRange(s, sf), "doc_id", "text")),

    "q_ngram_jaccard" -> ((s, sf) =>
      Dedup.ngramJaccardPairs(GraftData.documentsRange(s, sf), "doc_id", "text",
        k = 3, minInter = 3)),

    // substring-level exact dedup: maximal word spans whose 8-grams occur
    // in >= 2 distinct documents (Lee et al. 2022 span-granular dedup)
    "q_dup_spans" -> ((s, sf) =>
      Dedup.duplicateSpans(GraftData.documentsRange(s, sf), "doc_id", "text",
        k = 8, minDocs = 2)),

    "q_lang_id" -> ((s, sf) =>
      TextAnalysis.langId(GraftData.documentsRange(s, sf), "text", "doc_id")),

    "q_curate" -> ((s, sf) =>
      graft.llm.Curation.curate(GraftData.documentsRange(s, sf),
        "doc_id", "text", minWords = 10, maxNonAscii = 0, minEnStopwords = 1)),

    "q_token_stats" -> ((s, sf) =>
      TextAnalysis.qualityStats(GraftData.documentsRange(s, sf), "text", "doc_id")),

    // deterministic token-budget domain mixing: fill each source's budget
    // in md5 order, crossing document included, other sources dropped
    "q_token_mix" -> ((s, sf) =>
      graft.llm.Curation.tokenBudgetMix(GraftData.documentsRange(s, sf),
        "doc_id", "source", "n_chars",
        Map("src0" -> 3000L, "src1" -> 5000L, "src7" -> 2000L))
        .select(col("doc_id"), col("source"), col("n_chars"))),

    "q_distinct_ratio" -> ((s, sf) =>
      TextAnalysis.repetitionStats(GraftData.documentsRange(s, sf), "doc_id", "text")),

    "q_pack_sequences" -> ((s, sf) =>
      TextAnalysis.packSequences(GraftData.documentsRange(s, sf), "doc_id", "text",
        maxTokens = 2048, numShards = 8)),

    "q_tfidf_topk" -> ((s, sf) =>
      TextAnalysis.tfidfTopK(GraftData.documentsRange(s, sf), "doc_id", "text",
        k = 5)),

    "q_chunk_docs" -> ((s, sf) =>
      TextAnalysis.chunkDocuments(GraftData.documentsRange(s, sf),
        "doc_id", "text", chunkChars = 400, strideChars = 300)),

    "q_heavy_hitters" -> ((s, sf) =>
      TextAnalysis.heavyHitters(GraftData.documentsRange(s, sf),
        "doc_id", "text", k = 20)),

    "q_split_assign" -> ((s, sf) =>
      graft.llm.Curation.assignSplit(GraftData.documentsRange(s, sf),
        "doc_id", trainBps = 9000, valBps = 500)
        .select(col("doc_id"), col("split_bucket"), col("split"))),

    "q_dedup_clusters" -> ((s, sf) =>
      Dedup.duplicateClusters(
        Dedup.ngramJaccardPairs(GraftData.documentsRange(s, sf), "doc_id", "text",
          k = 3, minInter = 3),
        "a_id", "b_id")),

    "q_pii_scrub" -> ((s, sf) => {
      // the synthetic corpus carries no PII — plant deterministic
      // doc_id-derived emails/IPs/SSNs (and phones on every third doc) so
      // the scrub patterns genuinely fire and the oracle checks them
      val planted = GraftData.documentsRange(s, sf).select(col("doc_id"),
        concat(col("text"), lit(" reach user"),
          col("doc_id").cast("string"), lit("@ex.org or 10.0."),
          (col("doc_id") % 200).cast("string"), lit(".7 ssn 123-45-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          when(col("doc_id") % 3 === 0, lit(" call +1-555-123-4567"))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.piiScrub(planted, "doc_id", "text")
    }),

    "q_contamination" -> ((s, sf) => {
      val docs = GraftData.documentsRange(s, sf)
      Dedup.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", k = 5, minOverlap = 1)
    }),

    "q_sample_mix" -> ((s, sf) =>
      graft.llm.Curation.stratifiedSample(
        GraftData.documentsRange(s, sf), "doc_id", "lang",
        Map("en" -> 2500, "de" -> 7500, "zh" -> 0))
        .select(col("doc_id"), col("lang"), col("source"))),

    "q_multimodal_meta" -> ((s, sf) =>
      Multimodal.payloadMetadata(
        Multimodal.asPayload(GraftData.documentsRange(s, sf), "doc_id", "text"))
        .select(col("doc_id"), col("byte_len"), col("payload_md5"))),

    // PK point lookup: bucket pruning plans exactly one bucket's files
    // (pmod(murmur3(key), bucketNum) — StatsSkippingSuite asserts the
    // planned-file count); the oracle scans honestly
    "q_pk_point" -> ((s, sf) =>
      GraftData.ordersPk(s, sf)
        .filter(col("o_orderkey").isin(1L, 7L, 32L, 4000L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // metadata-only aggregates: the whole answer comes from manifest
    // footer stats (zero tasks — StatsSkippingSuite asserts the plan);
    // the oracle recomputes it the honest way in DuckDB
    "q_metadata_agg" -> ((s, sf) =>
      GraftData.partPlain(s, sf).groupBy().agg(
        count(lit(1)).as("cnt"),
        min(col("p_partkey")).as("min_pk"),
        max(col("p_partkey")).as("max_pk"),
        count(col("p_type")).as("cnt_type"),
        max(col("p_type")).as("max_type"))),

    // multi-dimensional skipping layout: same rows as a plain filter, but
    // over the Z-ORDER-clustered copy whose files prune on both columns
    "q_zorder_prune" -> ((s, sf) =>
      GraftData.ordersZOrdered(s, sf)
        .filter(col("o_custkey").between(100, 500) &&
          col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1996-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // ---- every query below carries a DuckDB oracle: deterministic
    //      construction (q_changes_feed), integer-only ranking (ANN),
    //      md5-derived hashes DuckDB reproduces bit-for-bit (fingerprints,
    //      SimHash, LSH planes), exact-verified sketch output whose oracle
    //      is the ground truth itself (minhash), and bound-pruned EXACT
    //      IVF (shares the brute-force oracle) ----
    "q_changes_feed" -> ((s, sf) => {
      val dir = GraftData.ordersChangeLogDir(s, sf)
      graft.tables.ChangeFeed.changes(s, dir, 0)
        .select(col("o_orderkey"),
          col(graft.tables.ChangeFeed.CHANGE_TYPE),
          col(graft.tables.ChangeFeed.COMMIT_VERSION))
    }),

    "q_dedup_minhash" -> ((s, sf) =>
      Dedup.minhashNearDuplicates(GraftData.documentsRange(s, sf),
        "doc_id", "text", minJaccardPct = 40)),

    // Incremental dedup: the corpus two-thirds is pre-indexed in a graft
    // PK signature table (one-time, untimed ensure); the query ingests the
    // remaining third against the STORED index — signatures compute for
    // the new batch only, the corpus is never re-minhashed.
    "q_dedup_incremental" -> ((s, sf) => {
      val docs = GraftData.documentsRange(s, sf)
      graft.llm.MinhashIndex.incrementalPairs(s,
        GraftData.minhashIndexPartial(s, sf), docs,
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text",
        minJaccardPct = 40)
    }),

    "q_simhash" -> ((s, sf) =>
      SimHash.nearDuplicates(GraftData.documentsRange(s, sf), "doc_id", "text",
        maxHamming = 3)),

    "q_ann_brute" -> ((s, sf) => {
      val emb = GraftData.embeddingsPlain(s, sf)
      Ann.bruteTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    }),

    "q_ann_ivf" -> ((s, sf) => {
      val emb = GraftData.embeddingsPlain(s, sf)
      Ann.ivfTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    }),

    // ANN against the PERSISTED IVF index (built once, untimed): the query
    // reads centroids + only the partition-pruned probed cells — never the
    // whole corpus — and is still exact (same angular bound as q_ann_ivf).
    "q_ann_index" -> ((s, sf) => {
      val emb = GraftData.embeddingsPlain(s, sf)
      graft.llm.AnnIndex.topK(s, GraftData.annIndexDir(s, sf),
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    }),

    "q_ann_lsh" -> ((s, sf) => {
      val emb = GraftData.embeddingsPlain(s, sf)
      Ann.lshTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    }),

    "q_doc_fingerprint" -> ((s, sf) =>
      graft.llm.TextAnalysis.rollingFingerprint(
        GraftData.documentsRange(s, sf), "doc_id", "text")),

    "q_embed_neardup" -> ((s, sf) =>
      Dedup.embeddingNearDuplicates(GraftData.embeddingsPlain(s, sf),
        "vec_id", "embedding", minCosine = 0.1, numPlanes = 4)
        .select(col("a_id"), col("b_id"))),

    // SemDeDup-style semantic clustering + within-cluster near-dup pairs.
    // iters = 0 pins the deterministic first-k-by-id seeding so DuckDB can
    // replay the assignment; Lloyd refinement is suite-verified against a
    // naive driver implementation (engine-specific fp accumulation order
    // makes refined centroids oracle-hostile).
    "q_semantic_clusters" -> ((s, sf) =>
      Dedup.semanticClusters(GraftData.embeddingsPlain(s, sf),
        "vec_id", "embedding", k = 16, iters = 0)
        .select(col("vec_id"), col("cluster_id"))),

    "q_semantic_neardup" -> ((s, sf) =>
      Dedup.semanticNearDupPairs(GraftData.embeddingsPlain(s, sf),
        "vec_id", "embedding", k = 16, minCosine = 0.1, iters = 0)
        .select(col("a_id"), col("b_id"))),

    "q_multimodal_decode" -> ((s, sf) =>
      Multimodal.decodeTable(
        Multimodal.asPayload(GraftData.documentsRange(s, sf), "doc_id", "text"))
        .select(col("doc_id"), col("byte_len"),
          col("image.width").as("width"), col("image.height").as("height"),
          size(col("frames")).as("frame_cnt")))
  )

  /** DuckDB equivalents over the raw parquet tables. */
  val oracles: Map[String, String] = Map(
    "q_pk_point" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
       "WHERE o_orderkey IN (1, 7, 32, 4000)"),

    "q_metadata_agg" ->
      ("SELECT count(*) AS cnt, min(p_partkey) AS min_pk, " +
       "max(p_partkey) AS max_pk, count(p_type) AS cnt_type, " +
       "max(p_type) AS max_type FROM part"),

    "q_zorder_prune" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
       "WHERE o_custkey BETWEEN 100 AND 500 " +
       "AND o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'"),

    "q_write_read_prune" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_returnflag = 'A'",

    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
       "CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents, " +
       "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents, " +
       "CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents, " +
       "CAST(COUNT(*) AS BIGINT) AS cnt " +
       "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
       "GROUP BY l_returnflag, l_linestatus"),

    "q_pk_join" ->
      ("SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt, " +
       "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents " +
       "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority"),

    "q_dpp_join" ->
      ("SELECT o_orderkey, o_orderpriority, " +
       "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_cents " +
       "FROM orders JOIN (SELECT l_orderkey, l_extendedprice FROM lineitem " +
       "WHERE l_quantity = 50 AND l_returnflag = 'R' " +
       "AND l_shipdate >= '1997-01-01' AND l_shipdate < '1997-02-01') l " +
       "ON o_orderkey = l_orderkey"),

    "q_tpch_q3" ->
      ("SELECT l_orderkey, o_orderdate, o_orderpriority, " +
       "CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON o_orderkey = l_orderkey " +
       "WHERE c_mktsegment = 'BUILDING' " +
       "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
       "AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00' " +
       "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
       "ORDER BY revenue_cents DESC, o_orderdate, l_orderkey LIMIT 10"),

    "q_tpch_q5" ->
      ("SELECT n_name, " +
       "CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON o_orderkey = l_orderkey " +
       "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "WHERE r_name = 'ASIA' " +
       "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
       "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' " +
       "GROUP BY n_name"),

    "q_cust_join" ->
      ("SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt, " +
       "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents " +
       "FROM customer JOIN orders ON c_custkey = o_custkey GROUP BY c_mktsegment"),

    "q_join_semi" ->
      ("SELECT c_custkey, c_name FROM customer " +
       "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),

    "q_join_anti" ->
      ("SELECT c_custkey, c_name FROM customer " +
       "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),

    "q_join_full" ->
      ("SELECT n_nationkey, n_name, c_custkey FROM nation " +
       "FULL OUTER JOIN customer ON c_nationkey = n_nationkey"),

    "q_pushdown_filters" ->
      ("SELECT p_partkey, p_size, p_brand, p_type FROM part " +
       "WHERE (p_size > 10 AND p_size <= 40 AND p_type LIKE 'STANDARD%') " +
       "OR p_brand IN ('Brand#12','Brand#23')"),

    "q_expr_surface" ->
      ("SELECT o_orderkey, COALESCE(NULLIF(o_orderstatus,'O'),'OPEN') AS st, " +
       "CAST(FLOOR(o_totalprice) AS BIGINT) AS total_floor, " +
       "CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS size_class " +
       "FROM orders"),

    "q_scalar_string" ->
      ("SELECT p_partkey, CAST(LENGTH(p_name) AS INTEGER) AS name_len, " +
       "UPPER(p_brand) AS brand_up, SUBSTR(p_type,1,5) AS type5, " +
       "MD5(p_name) AS name_md5 FROM part"),

    "q_datetime" ->
      ("SELECT o_orderkey, CAST(YEAR(o_orderdate) AS INTEGER) AS yr, " +
       "CAST(MONTH(o_orderdate) AS INTEGER) AS mo, " +
       "CAST(DAY(o_orderdate) AS INTEGER) AS dom, " +
       "STRFTIME(o_orderdate, '%Y-%m') AS ym FROM orders"),

    "q_window_topk" ->
      ("SELECT o_custkey, CAST(rnk AS INTEGER) AS rnk, o_orderkey FROM (" +
       "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey " +
       "ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders) WHERE rnk <= 3"),

    "q_events_minutely" ->
      ("SELECT event_type, STRFTIME(DATE_TRUNC('minute', ts), '%Y-%m-%d %H:%M') AS minute_str, " +
       "CAST(COUNT(*) AS BIGINT) AS cnt, " +
       "CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents " +
       "FROM events GROUP BY 1, 2"),

    // as-of via honest inequality join + row_number — same backward-
    // inclusive semantics the union+window operator computes; clicks
    // collapse to the greatest cents per (user, ts) exactly like the
    // operator's deterministic tiebreak
    "q_asof_join" ->
      ("WITH cl AS (SELECT user_id, ts, " +
       "MAX(CAST(ROUND(value*100) AS BIGINT)) AS click_cents " +
       "FROM events WHERE event_type = 'click' GROUP BY 1, 2), " +
       "pur AS (SELECT event_id, user_id, ts FROM events " +
       "WHERE event_type = 'purchase'), " +
       "best AS (SELECT event_id, c_ts, click_cents FROM (" +
       "SELECT p.event_id, c.ts AS c_ts, c.click_cents, " +
       "ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC) rn " +
       "FROM pur p JOIN cl c ON c.user_id = p.user_id AND c.ts <= p.ts) " +
       "WHERE rn = 1) " +
       "SELECT p.event_id, EPOCH_US(b.c_ts) AS click_ts_us, b.click_cents " +
       "FROM pur p LEFT JOIN best b USING (event_id)"),

    "q_range_join" ->
      ("WITH w AS (SELECT event_id AS window_id, ts AS w_start, " +
       "ts + INTERVAL 10 MINUTE AS w_end FROM events " +
       "WHERE event_type = 'error'), " +
       "p AS (SELECT ts, CAST(ROUND(value*100) AS BIGINT) AS cents " +
       "FROM events WHERE event_type <> 'error') " +
       "SELECT w.window_id, CAST(COUNT(*) AS BIGINT) AS n_events, " +
       "CAST(SUM(p.cents) AS BIGINT) AS sum_cents " +
       "FROM w JOIN p ON p.ts >= w.w_start AND p.ts < w.w_end GROUP BY 1"),

    // the same 60-bit md5 hash arithmetic as Relational.kmvDistinct:
    // 63.0 * 2^60 is exact in a double and x/y is correctly rounded in
    // both engines, so FLOOR agrees bit-for-bit; FLOOR (not bare CAST)
    // because DuckDB's double→BIGINT cast rounds while Spark's truncates
    "q_kmv_distinct" ->
      ("WITH h AS (SELECT DISTINCT event_type, " +
       "CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) " +
       "AS BIGINT) AS kh FROM events), " +
       "r AS (SELECT event_type, kh, " +
       "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY kh) rn FROM h) " +
       "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept, " +
       "MAX(kh) AS kth_hash, " +
       "CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS BIGINT) " +
       "ELSE CAST(FLOOR(63.0 * 1152921504606846976.0 / " +
       "CAST(MAX(kh) AS DOUBLE)) AS BIGINT) END AS est_distinct " +
       "FROM r WHERE rn <= 64 GROUP BY 1"),

    // both window levels order by (ts, event_id) — without the tiebreak
    // the two sorts could visit equal timestamps in different orders and
    // split a tie across sessions
    "q_sessionize" ->
      ("WITH o AS (SELECT user_id, ts, event_id, " +
       "CAST(ROUND(value*100) AS BIGINT) AS cents, " +
       "CASE WHEN LAG(ts) OVER w IS NULL " +
       "OR ts - LAG(ts) OVER w > INTERVAL 1 DAY THEN 1 ELSE 0 END AS brk " +
       "FROM events " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
       "s AS (SELECT user_id, ts, cents, " +
       "SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS UNBOUNDED PRECEDING) AS session_id FROM o) " +
       "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, " +
       "EPOCH_US(MIN(ts)) AS start_us, EPOCH_US(MAX(ts)) AS end_us, " +
       "CAST(COUNT(*) AS BIGINT) AS n_events, " +
       "CAST(SUM(cents) AS BIGINT) AS cents FROM s GROUP BY 1, 2"),

    "q_quantiles" ->
      ("WITH r AS (SELECT event_type, cents, " +
       "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn, " +
       "COUNT(*) OVER (PARTITION BY event_type) AS n FROM " +
       "(SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS cents " +
       "FROM events)) " +
       "SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, " +
       "MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT)) " +
       "THEN cents END) AS p50, " +
       "MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.9 * n) AS BIGINT)) " +
       "THEN cents END) AS p90, " +
       "MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.99 * n) AS BIGINT)) " +
       "THEN cents END) AS p99 FROM r GROUP BY 1"),

    // abs/ceil/floor/sqrt/mod are IEEE-exact in both engines (no libm
    // transcendentals, whose last-ulp behavior differs across builds)
    "q_math_funcs" ->
      ("SELECT p_partkey, ABS(p_retailprice - 1000.0) AS abs_diff, " +
       "CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil, " +
       "CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor, " +
       "SQRT(p_retailprice) AS price_sqrt, " +
       "p_partkey % 7 AS key_mod, " +
       "CAST(GREATEST(p_size, 25) AS INTEGER) AS size_hi, " +
       "CAST(LEAST(p_size, 25) AS INTEGER) AS size_lo FROM part"),

    "q_array_funcs" ->
      ("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim_cnt, " +
       "embedding[1] AS first_val, embedding[-1] AS last_val, label " +
       "FROM embeddings"),

    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt, " +
       "CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents " +
       "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"),

    "q_json_extract" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val " +
       "FROM events"),

    "q_crypto" ->
      ("SELECT p_partkey, MD5(p_name) AS name_md5, SHA256(p_name) AS name_sha256 " +
       "FROM part"),

    "q_upsert_lastwins" ->
      ("SELECT o_orderkey, CAST(ROUND((CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice*3 " +
       "WHEN o_orderkey % 3 = 0 THEN o_totalprice*2 ELSE o_totalprice END)*100) AS BIGINT) AS total_cents, " +
       "CASE WHEN o_orderkey % 3 = 0 THEN 'U1' ELSE o_orderstatus END AS o_orderstatus " +
       "FROM orders"),

    // rebucket preserves the merged state: same reconstruction as
    // q_upsert_lastwins minus the tombstone-deleted keys
    "q_rebucket_stable" ->
      ("SELECT o_orderkey, CAST(ROUND((CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice*3 " +
       "WHEN o_orderkey % 3 = 0 THEN o_totalprice*2 ELSE o_totalprice END)*100) AS BIGINT) AS total_cents, " +
       "CASE WHEN o_orderkey % 3 = 0 THEN 'U1' ELSE o_orderstatus END AS o_orderstatus " +
       "FROM orders WHERE o_orderkey % 777 != 0"),

    // the engine answers from manifest footer stats (zero data I/O);
    // DuckDB computes the same partition row counts honestly
    "q_partitions_meta" ->
      ("SELECT concat('lang=', lang) AS partition, " +
       "CAST(count(*) AS BIGINT) AS n_rows FROM documents GROUP BY lang"),

    "q_compaction_stable" ->
      ("SELECT o_orderkey, CAST(ROUND((CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice*3 " +
       "WHEN o_orderkey % 3 = 0 THEN o_totalprice*2 ELSE o_totalprice END)*100) AS BIGINT) AS total_cents, " +
       "CASE WHEN o_orderkey % 3 = 0 THEN 'U1' ELSE o_orderstatus END AS o_orderstatus " +
       "FROM orders"),

    "q_merge_op_sum" ->
      "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY o_custkey",

    "q_update" ->
      ("SELECT c_custkey, CAST(ROUND((CASE WHEN c_mktsegment = 'BUILDING' " +
       "THEN c_acctbal + 100.0 ELSE c_acctbal END)*100) AS BIGINT) AS acct_cents, " +
       "c_mktsegment FROM customer"),

    "q_delete" ->
      ("SELECT c_custkey, c_name, CAST(ROUND(c_acctbal*100) AS BIGINT) AS acct_cents " +
       "FROM customer WHERE NOT (c_acctbal < 0)"),

    "q_dv_delete" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len FROM documents " +
       "WHERE NOT (doc_id % 37 = 5) AND NOT (length(text) % 101 = 7)"),

    "q_merge_into" ->
      ("SELECT c_custkey, CAST(ROUND((c_acctbal + CASE WHEN c_custkey % 7 = 0 " +
       "THEN 500.0 ELSE 0.0 END)*100) AS BIGINT) AS acct_cents FROM customer " +
       "UNION ALL SELECT c_custkey + 1000000, CAST(ROUND(c_acctbal*100) AS BIGINT) " +
       "AS acct_cents FROM customer WHERE c_custkey % 91 = 0"),

    // matched %10 deleted; surviving %5 updated (+250); %11 re-inserted
    // shifted; non-source deep-negative rows deleted by the BY SOURCE clause
    "q_merge_delete" ->
      ("SELECT c_custkey, CAST(ROUND((c_acctbal + CASE WHEN c_custkey % 5 = 0 " +
       "THEN 250.0 ELSE 0.0 END)*100) AS BIGINT) AS acct_cents FROM customer " +
       "WHERE NOT (c_custkey % 10 = 0) " +
       "AND NOT (c_custkey % 5 <> 0 AND c_acctbal < -900.0) " +
       "UNION ALL SELECT c_custkey + 2000000, CAST(ROUND(c_acctbal*100) AS BIGINT) " +
       "AS acct_cents FROM customer WHERE c_custkey % 11 = 0"),

    "q_curate" ->
      ("WITH k AS (SELECT doc_id, text, row_number() OVER " +
       "(PARTITION BY md5(text) ORDER BY doc_id) rn FROM documents) " +
       "SELECT doc_id FROM k WHERE rn = 1 " +
       "AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 10 " +
       "AND length(regexp_replace(text, '[ -~\\s]', '', 'g')) = 0 " +
       "AND len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), " +
       "x -> list_contains(['the','of','and','is','to'], x))) >= 1"),

    // same md5-derived order (bucket, hash, id) the operator's two-phase
    // spelling walks; the single running-total window is the equivalent
    // naive form — the crossing document passes `cum - w < budget`
    "q_token_mix" ->
      ("WITH t AS (SELECT doc_id, source, n_chars, " +
       "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) " +
       "AS BIGINT) AS h FROM documents " +
       "WHERE source IN ('src0', 'src1', 'src7') AND n_chars IS NOT NULL), " +
       "b AS (SELECT *, h % 10000 AS bk, CASE source WHEN 'src0' THEN 3000 " +
       "WHEN 'src1' THEN 5000 ELSE 2000 END AS bud FROM t), " +
       "c AS (SELECT *, sum(n_chars) OVER (PARTITION BY source " +
       "ORDER BY bk, h, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM b) " +
       "SELECT doc_id, source, n_chars FROM c WHERE cum - n_chars < bud"),

    "q_sql_update" ->
      ("SELECT c_custkey, CAST(ROUND((CASE WHEN c_mktsegment = 'MACHINERY' " +
       "THEN c_acctbal * 2.0 ELSE c_acctbal END)*100) AS BIGINT) AS acct_cents, " +
       "c_mktsegment FROM customer"),

    "q_mv_contained" ->
      ("SELECT o_orderkey, o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) " +
       "AS total_cents FROM orders WHERE o_orderkey >= 50 AND o_orderkey <= 2500"),

    "q_mv_agg" ->
      ("SELECT o_custkey, count(1) AS cnt, " +
       "CAST(ROUND(sum(o_totalprice)*100) AS BIGINT) AS total_cents " +
       "FROM orders WHERE o_custkey >= 100 AND o_custkey <= 2000 " +
       "GROUP BY o_custkey"),

    "q_mv_rollup" ->
      ("SELECT count(1) AS cnt, " +
       "CAST(ROUND(sum(o_totalprice)*100) AS BIGINT) AS total_cents " +
       "FROM orders WHERE o_custkey >= 100 AND o_custkey <= 2000"),

    "q_mv_join" ->
      ("SELECT c_custkey, c_name, o_orderkey, " +
       "CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "WHERE c_custkey >= 10 AND c_custkey <= 500 " +
       "AND c_mktsegment = 'BUILDING'"),

    "q_mv_inc_fold" ->
      ("WITH base AS (SELECT o_orderkey, o_custkey, " +
       "CAST(ROUND(o_totalprice*100) AS BIGINT) AS p FROM orders), " +
       "final AS (" +
       "SELECT o_custkey, CASE WHEN o_orderkey % 7 = 0 THEN p + 10000 " +
       "ELSE p END AS p FROM base WHERE o_orderkey % 55 <> 0 " +
       "UNION ALL " +
       "SELECT o_custkey, p FROM base WHERE o_orderkey % 13 = 0) " +
       "SELECT o_custkey, count(1) AS cnt, count(p) AS cp, " +
       "CAST(sum(p) AS BIGINT) AS sp, avg(p) AS ap, " +
       "min(p) AS mnp, max(p) AS mxp, count(DISTINCT p) AS dp, " +
       "count(p) FILTER (WHERE p % 2 = 0) AS cpe, " +
       "CAST(sum(p) FILTER (WHERE p % 2 = 0) AS BIGINT) AS spe " +
       "FROM final GROUP BY o_custkey"),

    "q_mv_inc_join" ->
      ("WITH base AS (SELECT o_orderkey, o_custkey, " +
       "CAST(ROUND(o_totalprice*100) AS BIGINT) AS p FROM orders), " +
       "f AS (" +
       "SELECT o_custkey, CASE WHEN o_orderkey % 7 = 0 THEN p + 10000 " +
       "ELSE p END AS p FROM base " +
       "UNION ALL " +
       "SELECT o_custkey, p FROM base WHERE o_orderkey % 13 = 0), " +
       "c AS (SELECT c_custkey, CASE WHEN c_custkey % 9 = 0 THEN 'SEG9' " +
       "ELSE c_mktsegment END AS c_mktsegment FROM customer) " +
       "SELECT c_mktsegment, count(1) AS cnt, count(p) AS cp, " +
       "CAST(sum(p) AS BIGINT) AS sp FROM f JOIN c " +
       "ON o_custkey = c_custkey GROUP BY c_mktsegment"),

    "q_clone_dml" ->
      ("SELECT c_custkey, c_mktsegment, " +
       "CASE WHEN c_custkey % 6 = 0 " +
       "THEN CAST(ROUND(c_acctbal*100) AS BIGINT) + 500 " +
       "ELSE CAST(ROUND(c_acctbal*100) AS BIGINT) END AS bal_cents " +
       "FROM customer WHERE c_custkey % 17 <> 0"),

    // replay of the CDC batch's final state: %7 keys deleted (incl. the
    // %35 seq-2 tie the delete must win), %5 survivors carry the seq-2
    // +300 image, %11 keys re-inserted under shifted ids
    "q_apply_changes" ->
      ("WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS k, " +
       "c_mktsegment AS seg, CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal " +
       "FROM customer) " +
       "SELECT k AS c_custkey, seg AS c_mktsegment, " +
       "CASE WHEN k % 5 = 0 THEN bal + 300 ELSE bal END AS bal_cents " +
       "FROM base WHERE k % 7 <> 0 " +
       "UNION ALL " +
       "SELECT k + 1000000000000, seg, bal FROM base WHERE k % 11 = 0"),

    "q_mv_join3" ->
      ("SELECT c_custkey, c_name, n_name, o_orderkey, " +
       "CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN nation ON c_nationkey = n_nationkey " +
       "WHERE c_custkey >= 10 AND c_custkey <= 800 AND n_regionkey <= 3"),

    "q_schema_evolution" ->
      ("SELECT c_custkey, c_name, CASE WHEN c_custkey % 2 = 1 " +
       "THEN CAST(ROUND(c_acctbal*100) AS BIGINT) ELSE NULL END AS acct_cents " +
       "FROM customer"),

    "q_dedup_exact" ->
      ("SELECT MD5(text) AS content_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id, " +
       "CAST(COUNT(*) AS BIGINT) AS dup_cnt FROM documents GROUP BY MD5(text)"),

    "q_ngram_jaccard" ->
      ("WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents), " +
       "sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 " +
       "THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) " +
       "ELSE [] END) AS s FROM tok)), " +
       "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) sz FROM sh GROUP BY 1), " +
       "pairs AS (SELECT a.doc_id a_id, b.doc_id b_id, CAST(count(*) AS BIGINT) inter " +
       "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2) " +
       "SELECT p.a_id, p.b_id, p.inter, sa.sz AS a_size, sb.sz AS b_size FROM pairs p " +
       "JOIN sizes sa ON sa.doc_id = p.a_id JOIN sizes sb ON sb.doc_id = p.b_id " +
       "WHERE p.inter >= 3"),

    // span dedup: gram identity is the raw 8-gram string here vs the
    // 128-bit hash Spark-side — identical output barring a 2^-128 collision
    "q_dup_spans" ->
      ("WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents), " +
       "pos AS (SELECT doc_id, i - 1 AS p, array_to_string(toks[i:i+7], ' ') AS g " +
       "FROM t, UNNEST(CASE WHEN len(toks) >= 8 THEN range(1, len(toks) - 6) ELSE [] END) AS u(i)), " +
       "dup AS (SELECT g FROM pos GROUP BY g HAVING count(DISTINCT doc_id) >= 2), " +
       "hits AS (SELECT doc_id, p FROM pos WHERE g IN (SELECT g FROM dup)), " +
       "fl AS (SELECT doc_id, p, CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL " +
       "OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8 THEN 1 ELSE 0 END AS ni FROM hits), " +
       "isl AS (SELECT doc_id, p, sum(ni) OVER (PARTITION BY doc_id ORDER BY p) AS island FROM fl) " +
       "SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start, " +
       "CAST(max(p) + 7 AS BIGINT) AS span_end, " +
       "CAST(max(p) + 7 - min(p) + 1 AS BIGINT) AS span_words " +
       "FROM isl GROUP BY doc_id, island"),

    "q_lang_id" ->
      ("WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks, " +
       "CAST(length(regexp_replace(text, '[ -~\\s]', '', 'g')) AS INTEGER) non_ascii, " +
       "CAST(length(text) AS INTEGER) char_len FROM documents), " +
       "s AS (SELECT doc_id, non_ascii, char_len, " +
       "CAST(len(list_filter(toks, x -> list_contains(['der','und','das','die','ist'], x))) AS INTEGER) score_de, " +
       "CAST(len(list_filter(toks, x -> list_contains(['the','of','and','is','to'], x))) AS INTEGER) score_en, " +
       "CAST(len(list_filter(toks, x -> list_contains(['que','los','una','con','para'], x))) AS INTEGER) score_es, " +
       "CAST(len(list_filter(toks, x -> list_contains(['les','des','une','avec','pour'], x))) AS INTEGER) score_fr " +
       "FROM t), " +
       "b AS (SELECT doc_id, non_ascii, char_len, " +
       "score_de, score_en, score_es, score_fr, " +
       "CASE WHEN score_en > score_de THEN 'en' ELSE 'de' END AS l1, " +
       "CASE WHEN score_en > score_de THEN score_en ELSE score_de END AS s1 FROM s), " +
       "c AS (SELECT *, CASE WHEN score_es > s1 THEN 'es' ELSE l1 END AS l2, " +
       "CASE WHEN score_es > s1 THEN score_es ELSE s1 END AS s2 FROM b) " +
       // zh on DOMINANCE (majority non-ASCII chars), not mere presence
       "SELECT doc_id, CASE WHEN non_ascii * 2 > char_len THEN 'zh' " +
       "WHEN score_fr > s2 THEN 'fr' ELSE l2 END AS lang_guess, " +
       "CASE WHEN score_fr > s2 THEN score_fr ELSE s2 END AS lang_score FROM c"),

    // Same planted-PII construction as the Spark side; patterns are
    // dialect-portable (plain character classes + \b), counts run on the
    // ORIGINAL text and replacements chain in declaration order.
    "q_pii_scrub" ->
      ("WITH planted AS (SELECT doc_id, text || ' reach user' || " +
       "CAST(doc_id AS VARCHAR) || '@ex.org or 10.0.' || " +
       "CAST(doc_id % 200 AS VARCHAR) || '.7 ssn 123-45-' || " +
       "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
       "CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-123-4567' ELSE '' END " +
       "AS text FROM documents), " +
       // sequential audit (mirrors piiScrub): each category counts on the
       // text as it stands AFTER the previous categories scrubbed
       "s1 AS (SELECT doc_id, CAST(len(regexp_extract_all(text, " +
       "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS email_cnt, " +
       "regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', " +
       "'<EMAIL>', 'g') AS text FROM planted), " +
       "s2 AS (SELECT doc_id, email_cnt, CAST(len(regexp_extract_all(text, " +
       "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INTEGER) AS ipv4_cnt, " +
       "regexp_replace(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', " +
       "'<IP>', 'g') AS text FROM s1), " +
       "s3 AS (SELECT doc_id, email_cnt, ipv4_cnt, CAST(len(regexp_extract_all(text, " +
       "'\\+?\\d{1,3}[-. ]\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}')) AS INTEGER) AS phone_cnt, " +
       "regexp_replace(text, '\\+?\\d{1,3}[-. ]\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}', " +
       "'<PHONE>', 'g') AS text FROM s2), " +
       "s4 AS (SELECT doc_id, email_cnt, ipv4_cnt, phone_cnt, " +
       "CAST(len(regexp_extract_all(text, " +
       "'\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS INTEGER) AS ssn_cnt, " +
       "regexp_replace(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') " +
       "AS text FROM s3) " +
       "SELECT doc_id, text AS scrubbed_text, email_cnt, ipv4_cnt, " +
       "phone_cnt, ssn_cnt FROM s4"),

    "q_token_stats" ->
      ("SELECT doc_id, CAST(length(text) AS INTEGER) AS char_len, " +
       "CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS word_cnt, " +
       "CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS token_cnt, " +
       "CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS INTEGER) AS upper_cnt, " +
       "CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INTEGER) AS punct_cnt, " +
       "CAST(length(regexp_replace(text, '[ -~\\s]', '', 'g')) AS INTEGER) AS non_ascii_cnt, " +
       "CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), " +
       "x -> list_contains(['the','of','and','is','to'], x))) AS INTEGER) AS en_stopword_cnt " +
       "FROM documents"),

    "q_pack_sequences" ->
      // shard = md5-derived hash mod 8, matching TextAnalysis.packSequences
      ("WITH t AS (SELECT doc_id, " +
       "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) " +
       "AS BIGINT) % 8 AS shard, " +
       "CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) n_tokens " +
       "FROM documents) " +
       // DuckDB SUM(BIGINT) yields HUGEINT; cast back so the dumped column
       // type matches Spark's long
       "SELECT doc_id, shard, n_tokens, " +
       "CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset, " +
       "CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS seq_id " +
       "FROM t"),

    // Transitive closure over the SAME pair list q_ngram_jaccard verifies;
    // min reachable id == the min-label fixpoint the engine iterates to.
    "q_dedup_clusters" ->
      ("WITH RECURSIVE tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents), " +
       "sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 " +
       "THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) " +
       "ELSE [] END) AS s FROM tok)), " +
       "pairs AS (SELECT a.doc_id a_id, b.doc_id b_id FROM sh a JOIN sh b " +
       "ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2 HAVING count(*) >= 3), " +
       "e AS (SELECT a_id s, b_id d FROM pairs UNION ALL SELECT b_id, a_id FROM pairs), " +
       "reach(id, r) AS (SELECT DISTINCT s, s FROM e " +
       "UNION SELECT e.s, reach.r FROM e JOIN reach ON reach.id = e.d) " +
       "SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id"),

    "q_contamination" ->
      ("WITH docs AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') toks FROM documents), " +
       "sh AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+4], ' ') " +
       "for i in range(1, len(toks)-3)]) grams FROM docs WHERE len(toks) >= 5), " +
       "ex AS (SELECT doc_id, unnest(grams) s FROM sh), " +
       "ev AS (SELECT doc_id eval_id, s FROM ex WHERE doc_id % 50 = 0), " +
       "tr AS (SELECT * FROM ex WHERE doc_id % 50 != 0) " +
       "SELECT tr.doc_id AS train_id, ev.eval_id, CAST(count(*) AS BIGINT) AS overlap " +
       "FROM tr JOIN ev ON tr.s = ev.s GROUP BY 1, 2 HAVING count(*) >= 1"),

    // Raw-idf tf-idf (score = tf/doc_freq): small-integer IEEE division is
    // bit-exact on both engines, so the rank order (and its term-asc tie
    // break) reproduces exactly — a log-damped idf would hang the oracle
    // on libm rounding. Output stays integer/string.
    "q_tfidf_topk" ->
      ("WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), " +
       "'[a-z0-9]+')) AS term FROM documents), " +
       "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) tf " +
       "FROM toks GROUP BY 1, 2), " +
       "dfreq AS (SELECT term, CAST(count(*) AS BIGINT) doc_freq " +
       "FROM tf GROUP BY 1), " +
       "ranked AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq, " +
       "CAST(row_number() OVER (PARTITION BY tf.doc_id " +
       "ORDER BY tf.tf * 1.0 / dfreq.doc_freq DESC, tf.term ASC) AS INTEGER) " +
       "AS rank FROM tf JOIN dfreq USING (term)) " +
       "SELECT doc_id, rank, term, tf, doc_freq FROM ranked WHERE rank <= 5"),

    // Chunk count via exact INTEGER ceil-division ((n-400+299)//300 + 1)
    // so the row set reproduces bit-for-bit; both engines' length/substr
    // are character-based (zh docs included).
    "q_chunk_docs" ->
      ("WITH d AS (SELECT doc_id, text, COALESCE(length(text), 0) AS n " +
       "FROM documents), " +
       "c AS (SELECT doc_id, text, unnest(range(0, CASE WHEN n <= 400 THEN 1 " +
       "ELSE (n - 400 + 299) // 300 + 1 END)) AS chunk_idx FROM d) " +
       "SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, " +
       "substr(text, CAST(chunk_idx * 300 + 1 AS INTEGER), 400) AS chunk_text, " +
       "CAST(length(substr(text, CAST(chunk_idx * 300 + 1 AS INTEGER), 400)) " +
       "AS INTEGER) AS chunk_len FROM c"),

    // Exact top-20 terms; count DESC + term ASC makes the cut line
    // deterministic. DuckDB SUM(BIGINT) is HUGEINT — cast back to match
    // Spark's long.
    "q_heavy_hitters" ->
      ("WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), " +
       "'[a-z0-9]+')) AS term FROM documents), " +
       "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) tf " +
       "FROM toks GROUP BY 1, 2) " +
       "SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt, " +
       "CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY term " +
       "ORDER BY cnt DESC, term ASC LIMIT 20"),

    // Same md5-bucket selector as q_sample_mix, folded through cumulative
    // 90/5/5 thresholds.
    "q_split_assign" ->
      ("SELECT doc_id, CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), " +
       "1, 8)) AS BIGINT) % 10000 AS split_bucket, " +
       "CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) " +
       "AS BIGINT) % 10000 < 9000 THEN 'train' " +
       "WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) " +
       "AS BIGINT) % 10000 < 9500 THEN 'val' ELSE 'test' END AS split " +
       "FROM documents"),

    "q_distinct_ratio" ->
      ("SELECT doc_id, " +
       "CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS word_cnt, " +
       "CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS INTEGER) AS distinct_cnt " +
       "FROM documents"),

    // Same md5-bucket selector on both engines: Spark
    // conv(substr(md5,1,8),16,10) == DuckDB CAST('0x'||substr(md5,1,8) AS BIGINT).
    "q_sample_mix" ->
      ("SELECT doc_id, lang, source FROM documents WHERE " +
       "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < " +
       "CASE lang WHEN 'en' THEN 2500 WHEN 'de' THEN 7500 WHEN 'zh' THEN 0 " +
       "ELSE 10000 END"),

    // DuckDB md5 takes VARCHAR and hashes its UTF-8 bytes — identical to
    // Spark's md5 over the encode(text,'UTF-8') binary payload.
    "q_multimodal_meta" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, " +
       "MD5(text) AS payload_md5 FROM documents"),

    // The change feed over the deterministic orders change log (create all
    // -> upsert %100 with zeroed price -> delete %777): insert/upsert rows
    // are the written batches, delete rows the matching keys. Only
    // engine-neutral columns (key, type, version) are projected.
    "q_changes_feed" ->
      ("SELECT o_orderkey, 'insert' AS _change_type, " +
       "CAST(0 AS BIGINT) AS _commit_version FROM orders " +
       "UNION ALL SELECT o_orderkey, 'upsert', CAST(1 AS BIGINT) " +
       "FROM orders WHERE o_orderkey % 100 = 0 " +
       "UNION ALL SELECT o_orderkey, 'delete', CAST(2 AS BIGINT) " +
       "FROM orders WHERE o_orderkey % 777 = 0"),

    // The emitted pairs are EXACT-verified (LSH is only the candidate
    // generator; inter/uni are true shingle counts), so the oracle is the
    // ground truth itself: every word-3-gram pair at >= 40% Jaccard.
    // Equality asserts banding recall 1, which holds with huge margin: the
    // corpus' true duplicate pairs all sit at j >= 0.88, where the 16x4
    // band s-curve misses with probability ~1e-7 (no pair exists anywhere
    // near the 40% boundary in this generator's output).
    "q_dedup_minhash" ->
      ("WITH toks AS (SELECT doc_id, " +
       "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), " +
       "sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s " +
       "FROM toks, LATERAL unnest(generate_series(1, len(t)-2)) AS u(i) " +
       "WHERE len(t) >= 3), " +
       "cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
       "ix AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ix " +
       "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2) " +
       "SELECT a_id, b_id, ix AS inter, (ca.n + cb.n - ix) AS uni " +
       "FROM ix JOIN cnt ca ON ca.doc_id = a_id " +
       "JOIN cnt cb ON cb.doc_id = b_id " +
       "WHERE ix * 100 >= 40 * (ca.n + cb.n - ix)"),

    // Ground-truth Jaccard restricted to pairs touching the "new batch"
    // (doc_id % 3 = 0): exactly what the incremental ingest must emit —
    // banding is per-document, so incremental == batch, and the verify is
    // the same exact-Jaccard code path q_dedup_minhash proves.
    "q_dedup_incremental" ->
      ("WITH toks AS (SELECT doc_id, " +
       "regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents), " +
       "sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s " +
       "FROM toks, LATERAL unnest(generate_series(1, len(t)-2)) AS u(i) " +
       "WHERE len(t) >= 3), " +
       "cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), " +
       "ix AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ix " +
       "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1,2) " +
       "SELECT a_id, b_id, ix AS inter, (ca.n + cb.n - ix) AS uni " +
       "FROM ix JOIN cnt ca ON ca.doc_id = a_id " +
       "JOIN cnt cb ON cb.doc_id = b_id " +
       "WHERE ix * 100 >= 40 * (ca.n + cb.n - ix) " +
       "AND (a_id % 3 = 0 OR b_id % 3 = 0)"),

    // Exact cosine top-k: output is INTEGER-only (qid, rank, nid) with ties
    // broken by nid, so the two engines' last-ulp float differences cannot
    // surface unless two distinct vectors score within ~1e-15 of each
    // other at the k boundary.
    "q_ann_brute" ->
      ("WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
       "FROM embeddings WHERE vec_id < 5), " +
       "c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) " +
       "SELECT qid, CAST(rnk AS INTEGER) AS rank, nid FROM (" +
       "SELECT q.vec_id AS qid, c.vec_id AS nid, " +
       "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
       "(list_dot_product(q.e, c.e) / NULLIF(sqrt(list_dot_product(q.e, q.e)) " +
       "* sqrt(list_dot_product(c.e, c.e)), 0)) DESC NULLS LAST, " +
       "c.vec_id ASC) AS rnk FROM q CROSS JOIN c) s WHERE rnk <= 10"),

    // The persisted-IVF query is EXACT (angular-bound pruning), so it
    // shares the brute-force ground truth.
    "q_ann_index" ->
      ("WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
       "FROM embeddings WHERE vec_id < 5), " +
       "c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) " +
       "SELECT qid, CAST(rnk AS INTEGER) AS rank, nid FROM (" +
       "SELECT q.vec_id AS qid, c.vec_id AS nid, " +
       "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
       "(list_dot_product(q.e, c.e) / NULLIF(sqrt(list_dot_product(q.e, q.e)) " +
       "* sqrt(list_dot_product(c.e, c.e)), 0)) DESC NULLS LAST, " +
       "c.vec_id ASC) AS rnk FROM q CROSS JOIN c) s WHERE rnk <= 10"),

    // Full SimHash replication: 60-bit md5 token hashes make the
    // fingerprints engine-portable, and banding recall is pigeonhole-
    // guaranteed (hamming <= 3 pairs always share one of 4 bands), so the
    // banded Spark pair set EQUALS this exhaustive all-pairs hamming scan.
    // Integer-only math — no float divergence possible.
    "q_simhash" ->
      ("WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), " +
       "'[a-z0-9]+')) AS tok FROM documents), " +
       "h AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) " +
       "AS BIGINT) AS h FROM t), " +
       "bits AS (SELECT doc_id, bb.b, " +
       "sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v " +
       "FROM h, (SELECT unnest(range(0, 64)) AS b) bb GROUP BY 1, 2), " +
       "fp AS (SELECT doc_id, sum(CASE WHEN v >= 0 " +
       "THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sh FROM bits GROUP BY 1) " +
       "SELECT a.doc_id AS a_id, b2.doc_id AS b_id, " +
       "CAST(bit_count(xor(a.sh, b2.sh)) AS INTEGER) AS hamming " +
       "FROM fp a JOIN fp b2 ON a.doc_id < b2.doc_id " +
       "WHERE bit_count(xor(a.sh, b2.sh)) <= 3"),

    // Full LSH replication: the hyperplanes are md5-derived constants
    // (Ann.planeConst), so DuckDB rebuilds the same 4x64 plane matrix,
    // buckets every vector by the same sign bits, and ranks the same
    // bucket-mates by exact cosine. Integer-only output as in q_ann_brute.
    "q_ann_lsh" ->
      ("WITH pc AS (SELECT p, list(w ORDER BY d) AS wl FROM (" +
       "SELECT pp.p, dd.d, (CAST(concat('0x', substr(md5(" +
       "concat(pp.p, ':', dd.d)), 1, 8)) AS UBIGINT) % 1000) / 1000.0 - 0.5 AS w " +
       "FROM (SELECT unnest(range(0, 4)) AS p) pp, " +
       "(SELECT unnest(range(1, 65)) AS d) dd) s GROUP BY p), " +
       "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
       "bk AS (SELECT vec_id, sum(CASE WHEN list_dot_product(e, wl) >= 0 " +
       "THEN CAST(1 << p AS BIGINT) ELSE 0 END) AS bucket " +
       "FROM v CROSS JOIN pc GROUP BY vec_id), " +
       "vb AS (SELECT v.vec_id, v.e, bk.bucket FROM v JOIN bk USING (vec_id)), " +
       "q AS (SELECT * FROM vb WHERE vec_id < 5) " +
       "SELECT qid, CAST(rnk AS INTEGER) AS rank, nid FROM (" +
       "SELECT q.vec_id AS qid, c.vec_id AS nid, " +
       "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
       "(list_dot_product(q.e, c.e) / NULLIF(sqrt(list_dot_product(q.e, q.e)) " +
       "* sqrt(list_dot_product(c.e, c.e)), 0)) DESC NULLS LAST, " +
       "c.vec_id ASC) AS rnk FROM q JOIN vb c ON q.bucket = c.bucket) s " +
       "WHERE rnk <= 10"),

    // Same md5 plane matrix as q_ann_lsh; pairs share a bucket and pass
    // the EXACT cosine threshold — both sides fully reproducible.
    "q_embed_neardup" ->
      ("WITH pc AS (SELECT p, list(w ORDER BY d) AS wl FROM (" +
       "SELECT pp.p, dd.d, (CAST(concat('0x', substr(md5(" +
       "concat(pp.p, ':', dd.d)), 1, 8)) AS UBIGINT) % 1000) / 1000.0 - 0.5 AS w " +
       "FROM (SELECT unnest(range(0, 4)) AS p) pp, " +
       "(SELECT unnest(range(1, 65)) AS d) dd) s GROUP BY p), " +
       "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
       "bk AS (SELECT vec_id, sum(CASE WHEN list_dot_product(e, wl) >= 0 " +
       "THEN CAST(1 << p AS BIGINT) ELSE 0 END) AS bucket " +
       "FROM v CROSS JOIN pc GROUP BY vec_id), " +
       "vb AS (SELECT v.vec_id, v.e, bk.bucket FROM v JOIN bk USING (vec_id)) " +
       "SELECT a.vec_id AS a_id, b.vec_id AS b_id " +
       "FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id " +
       "WHERE (list_dot_product(a.e, b.e) / NULLIF(sqrt(list_dot_product(a.e, a.e)) " +
       "* sqrt(list_dot_product(b.e, b.e)), 0)) >= 0.1"),

    // k-means at iters=0 IS deterministic: centroids are the k lowest ids'
    // vectors, assignment the max-cosine centroid (ties by centroid id),
    // zero-norm vectors excluded — all replayable in portable SQL.
    "q_semantic_clusters" ->
      ("WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
       "FROM embeddings), " +
       "nv AS (SELECT vec_id, e FROM v " +
       "WHERE sqrt(list_dot_product(e, e)) > 0), " +
       "seed AS (SELECT vec_id FROM v ORDER BY vec_id LIMIT 16), " +
       "c AS (SELECT nv.vec_id AS cid, nv.e AS ce FROM nv " +
       "JOIN seed ON nv.vec_id = seed.vec_id), " +
       "s AS (SELECT nv.vec_id, c.cid, list_dot_product(nv.e, c.ce) / " +
       "(sqrt(list_dot_product(nv.e, nv.e)) * " +
       "sqrt(list_dot_product(c.ce, c.ce))) AS csim FROM nv CROSS JOIN c) " +
       "SELECT vec_id, cid AS cluster_id FROM (SELECT vec_id, cid, " +
       "row_number() OVER (PARTITION BY vec_id " +
       "ORDER BY csim DESC, cid ASC) AS rn FROM s) t WHERE rn = 1"),

    "q_semantic_neardup" ->
      ("WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
       "FROM embeddings), " +
       "nv AS (SELECT vec_id, e FROM v " +
       "WHERE sqrt(list_dot_product(e, e)) > 0), " +
       "seed AS (SELECT vec_id FROM v ORDER BY vec_id LIMIT 16), " +
       "c AS (SELECT nv.vec_id AS cid, nv.e AS ce FROM nv " +
       "JOIN seed ON nv.vec_id = seed.vec_id), " +
       "s AS (SELECT nv.vec_id, c.cid, list_dot_product(nv.e, c.ce) / " +
       "(sqrt(list_dot_product(nv.e, nv.e)) * " +
       "sqrt(list_dot_product(c.ce, c.ce))) AS csim FROM nv CROSS JOIN c), " +
       "asg AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
       "row_number() OVER (PARTITION BY vec_id " +
       "ORDER BY csim DESC, cid ASC) AS rn FROM s) t WHERE rn = 1) " +
       "SELECT a.vec_id AS a_id, b.vec_id AS b_id " +
       "FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id " +
       "JOIN nv na ON na.vec_id = a.vec_id " +
       "JOIN nv nb ON nb.vec_id = b.vec_id " +
       "WHERE (list_dot_product(na.e, nb.e) / " +
       "(sqrt(list_dot_product(na.e, na.e)) * " +
       "sqrt(list_dot_product(nb.e, nb.e)))) >= 0.1"),

    // IVF with angular-bound cell pruning is EXACT (skipped cells provably
    // hold no top-k member), so its oracle is the same brute-force top-k.
    "q_ann_ivf" ->
      ("WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
       "FROM embeddings WHERE vec_id < 5), " +
       "c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) " +
       "SELECT qid, CAST(rnk AS INTEGER) AS rank, nid FROM (" +
       "SELECT q.vec_id AS qid, c.vec_id AS nid, " +
       "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
       "(list_dot_product(q.e, c.e) / NULLIF(sqrt(list_dot_product(q.e, q.e)) " +
       "* sqrt(list_dot_product(c.e, c.e)), 0)) DESC NULLS LAST, " +
       "c.vec_id ASC) AS rnk FROM q CROSS JOIN c) s WHERE rnk <= 10"),

    // Rolling fingerprint, re-derived in portable SQL: same 60-bit
    // md5-token hash, rotl in HUGEINT space (low 64 bits kept, re-signed),
    // XOR-folded. `h >> 64` = 0 in DuckDB vs Java's mod-64 `h >>> 64` = h,
    // but at r=0 both reduce to h (h|0 here, h|h there), so the or-form
    // rotation agrees at every r. NULL text → no unnest rows → NULL via
    // the is_null flag; zero-token text → COALESCE to the fold seed 0.
    "q_doc_fingerprint" ->
      ("WITH t AS (SELECT doc_id, text IS NULL AS is_null, " +
       "regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents), " +
       "e AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS tok, " +
       "unnest(generate_series(0, len(toks)-1)) AS pos FROM t), " +
       "rot AS (SELECT doc_id, " +
       "CAST(CASE WHEN m >= CAST('9223372036854775808' AS HUGEINT) " +
       "THEN m - CAST('18446744073709551616' AS HUGEINT) ELSE m END AS BIGINT) AS contrib " +
       "FROM (SELECT doc_id, ((CAST(h AS HUGEINT) << r) | CAST(h >> (64 - r) AS HUGEINT)) " +
       "% CAST('18446744073709551616' AS HUGEINT) AS m " +
       "FROM (SELECT doc_id, " +
       "CAST(concat('0x', substr(md5(tok),1,15)) AS BIGINT) AS h, " +
       "CAST((5 * (n - 1 - pos)) % 64 AS INTEGER) AS r FROM e) s1) s2), " +
       "agg AS (SELECT doc_id, bit_xor(contrib) AS fp FROM rot GROUP BY doc_id) " +
       "SELECT t.doc_id, CASE WHEN t.is_null THEN NULL ELSE COALESCE(agg.fp, 0) END " +
       "AS fingerprint FROM t LEFT JOIN agg USING (doc_id)"),

    // Fake decode dimensions = md5's first 24 bits (engine-portable stub);
    // frame sampling always yields 4 slices.
    "q_multimodal_decode" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, " +
       "CAST(CAST(concat('0x', substr(md5(text), 1, 6)) AS BIGINT) % 1920 + 1 " +
       "AS INTEGER) AS width, " +
       "CAST((CAST(concat('0x', substr(md5(text), 1, 6)) AS BIGINT) * 31) % 1080 " +
       "+ 1 AS INTEGER) AS height, " +
       "CAST(4 AS INTEGER) AS frame_cnt FROM documents")
  )

  def warm(spark: SparkSession, sfDir: String): Unit = GraftData.warmAll(spark, sfDir)
}
