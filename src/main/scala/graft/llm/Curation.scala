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
}
