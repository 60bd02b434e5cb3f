package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed "training-data pipeline" shape:
  * quality and language gates, then exact dedup, yielding the kept document
  * ids.
  *
  * Scale design: the gates run FIRST, at scan speed, as single
  * `regexp_count` passes over each document (see [[TextAnalysis]]) — rows
  * they eliminate never reach a shuffle. Exact duplicates share their text
  * byte-for-byte, so every copy passes or fails the gates identically and
  * gating commutes with exact dedup. The dedup itself is a
  * `groupBy(md5(text)).agg(min(id))`: after the map-side partial aggregate
  * the only thing shuffled is one (hash, id) pair per distinct surviving
  * document per partition — the text column never crosses an exchange. At
  * 100 TB the pipeline is one scan plus a hash-aggregate over 48-byte rows.
  */
object Curation {

  /** Documents that survive curation:
    *  - at least `minWords` alphanumeric tokens,
    *  - ASCII-only (`maxNonAscii` non-ASCII code points allowed),
    *  - at least `minEnStopwords` English stopword tokens (a cheap
    *    "is this prose in the target language" gate),
    *  - first document per exact content hash (lowest id wins).
    * Returns the id column only — deterministic and oracle-checkable.
    */
  def curate(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 10, maxNonAscii: Int = 0,
      minEnStopwords: Int = 1): DataFrame = {
    df.filter(regexp_count(lower(col(textCol)), lit("[a-z0-9]+")) >= minWords)
      .filter(regexp_count(col(textCol), lit("[^ -~\\s]")) <= maxNonAscii)
      .filter(TextAnalysis.stopwordHits(col(textCol),
        TextAnalysis.LANG_STOPWORDS("en")) >= minEnStopwords)
      .groupBy(md5(col(textCol)))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
  }

  /** Deterministic stratified sampling for data mixing: keep a row iff
    * `md5(id) mod 10000 < rates(stratum)` (rates in basis points, 10000 =
    * keep all; strata absent from `rates` fall back to `defaultBps`).
    *
    * Down-weighting over-represented sources/languages is the standard last
    * step of a training-data mix. Hash-based selection makes the sample a
    * pure per-row FILTER — deterministic across runs, engines, partitioning
    * and cluster size (no RNG seed plumbing, no `sample()`
    * partition-dependence), so a mix is reproducible from its rate table
    * alone. At 100 TB it runs at scan speed and pushes nothing to a
    * shuffle; the hash also guarantees consistent per-ID decisions when the
    * same corpus is re-mixed with different rates (nested samples: a 10%
    * mix is a subset of the 25% mix).
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultBps: Int = 10000): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("bigint"),
      lit(10000L))
    val rate = rates.foldLeft(lit(defaultBps).cast("bigint")) {
      case (acc, (stratum, bps)) =>
        when(col(stratumCol) === stratum, lit(bps.toLong)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Deterministic train/validation/test split assignment: each row lands
    * in a split by `md5(id) mod 10000` against cumulative basis-point
    * thresholds (default 90/5/5). The same hash-selection argument as
    * [[stratifiedSample]]: a pure per-row projection — reproducible across
    * runs, engines, partitioning and cluster growth, with no RNG state —
    * and STABLE under corpus evolution: a document keeps its split when
    * others are added or removed, so eval sets never silently absorb
    * training data. Emits the bucket too, so audits can re-derive the
    * assignment. At 100 TB this is a scan-speed map with no shuffle. */
  def assignSplit(
      df: DataFrame, idCol: String,
      trainBps: Int = 9000, valBps: Int = 500): DataFrame = {
    require(trainBps >= 0 && valBps >= 0 && trainBps + valBps <= 10000,
      s"assignSplit: train/val basis points must fit in 10000 " +
        s"(got train=$trainBps val=$valBps)")
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("bigint"),
      lit(10000L))
    df.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(col("split_bucket") < trainBps, lit("train"))
          .when(col("split_bucket") < trainBps + valBps, lit("val"))
          .otherwise(lit("test")))
  }

  /** Deterministic token-budget domain mixing — the "mix N tokens of code
    * with M tokens of web" pretraining step. Per domain, documents are
    * taken in `(md5-bucket, md5-hash, id)` order until the domain's budget
    * is reached; the crossing document is INCLUDED, so every non-empty
    * budget yields at least one document and the mix reaches its budget
    * (over by at most one document's weight). The order is the same
    * engine-portable hash [[stratifiedSample]] selects with —
    * reproducible across runs, engines and partitioning, and stable under
    * corpus growth (a new document displaces only documents hashed after
    * it). Domains absent from `budgets`, and rows with NULL weight, drop.
    *
    * Scale: a naive running-total window would sort EVERY domain's
    * documents through one reducer — a web-scale domain is most of the
    * corpus. Instead: (1) one distributed aggregate of per-(domain,
    * bucket) weight sums over the md5 bucket space; (2) a driver cumsum
    * over ≤ 10000 × |budgeted domains| rows finds each domain's CROSSING
    * bucket and the weight spent before it; (3) whole buckets before the
    * crossing one are kept by a scan-speed filter, and only the crossing
    * bucket's rows — ~1/10000 of the domain — pay a fine-ordered window.
    */
  def tokenBudgetMix(
      df: DataFrame, idCol: String, domainCol: String, weightCol: String,
      budgets: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.nonEmpty, "tokenBudgetMix: budgets must be non-empty")
    // the driver cumsum and the budget comparison are Long arithmetic: a
    // fractional weight column would make sum() return double/decimal and
    // the getLong below would throw an opaque ClassCastException mid-job.
    // Token counts are integral by nature — require it up front.
    df.schema.find(f =>
        df.sparkSession.sessionState.conf.resolver(f.name, weightCol))
      .map(_.dataType).foreach {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => ()
        case dt => throw new IllegalArgumentException(
          s"tokenBudgetMix: weight column '$weightCol' must be integral " +
          s"(token counts), found ${dt.simpleString} — cast it to bigint " +
          "before calling")
      }
    val hash = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("bigint")
    val bucket = pmod(hash, lit(10000L))
    val spark = df.sparkSession
    val inScope = df
      .filter(col(domainCol).isin(budgets.keys.toSeq: _*) &&
        col(weightCol).isNotNull)
      .withColumn("__h", hash).withColumn("__bk", bucket)
    // (1) distributed per-(domain, bucket) sums; (2) tiny driver cumsum
    val perBucket = inScope.groupBy(col(domainCol).as("__dom"), col("__bk"))
      .agg(sum(col(weightCol)).cast("long").as("__w"))
      .collect()
    val byDom = perBucket.groupBy(_.getString(0))
    // per domain: (crossing bucket, weight spent before it); a domain whose
    // total is inside the budget keeps everything (crossing = +inf)
    val cuts: Map[String, (Long, Long)] = byDom.map { case (dom, rows) =>
      val budget = budgets(dom)
      val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      var cum = 0L
      var cut = (Long.MaxValue, 0L)
      val it = sorted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (bk, w) = it.next()
        if (cum + w >= budget) { cut = (bk, cum); found = true }
        else cum += w
      }
      dom -> cut
    }
    val cutBk = cuts.foldLeft(lit(Long.MaxValue)) { case (acc, (dom, (bk, _))) =>
      when(col(domainCol) === dom, lit(bk)).otherwise(acc)
    }
    val spent = cuts.foldLeft(lit(0L)) { case (acc, (dom, (_, sp))) =>
      when(col(domainCol) === dom, lit(sp)).otherwise(acc)
    }
    val budgetC = budgets.foldLeft(lit(0L)) { case (acc, (dom, b)) =>
      when(col(domainCol) === dom, lit(b)).otherwise(acc)
    }
    // (3) whole buckets below the cut keep at scan speed; the crossing
    // bucket alone pays the fine-ordered running total
    val below = inScope.filter(col("__bk") < cutBk)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val crossing = inScope.filter(col("__bk") === cutBk)
      .withColumn("__cum", sum(col(weightCol)).over(w) + spent)
      .filter(col("__cum") - col(weightCol) < budgetC)
      .drop("__cum")
    below.unionByName(crossing).drop("__h", "__bk")
  }
}
