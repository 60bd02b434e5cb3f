package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash fingerprinting + banded near-dup candidate search.
  *
  * Fingerprints are computed as ONE hash-aggregate over exploded tokens:
  * per bit b, the vote is `sum(+1/-1)` of the token hash's bit b; the
  * fingerprint packs the 64 vote signs. Everything stays in whole-stage
  * codegen (no lambdas); the only shuffle carries (doc_id, token-hash)
  * pairs. Candidates come from 16-bit band buckets (pigeonhole: hamming
  * distance <= 3 guarantees one identical band), never an all-pairs scan.
  */
object SimHash {

  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // 60-bit md5 token hash (same family as TextAnalysis.rollingFingerprint):
    // engine-portable, so fingerprints computed by any md5-capable system —
    // the DuckDB oracle included — agree bit-for-bit. Bits 60-63 never vote
    // positive and pack as 0.
    val toks = Parallelism.fanOut(df, idCol)
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b")
    }
    val packed: Column = (0 until 64).map { b =>
      when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** Candidate pairs within `maxHamming` bit flips, with exact hamming
    * distance attached (bit_count of xor).
    *
    * The 64 fingerprint bits are partitioned into `maxHamming + 1` bands,
    * so by pigeonhole ANY pair within the advertised distance shares at
    * least one untouched band and is guaranteed to surface as a candidate
    * — band count derives from the threshold rather than silently capping
    * recall. Wider thresholds mean narrower band keys and more candidate
    * pairs: the honest cost of the guarantee.
    */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    // eager localCheckpoint: the banded self-join below consumes the
    // fingerprint pipeline twice; checkpointing runs it once and keeps the
    // downstream plan small (and leaves no CacheManager entry)
    val fp = Checkpoints.stabilize(fingerprints(df, idCol, textCol))
    nearDuplicatesFromFingerprints(fp, maxHamming)
  }

  /** Banded candidate join over a precomputed (doc_id, simhash) frame. */
  def nearDuplicatesFromFingerprints(
      fp: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming")
    val bands = maxHamming + 1
    val base = 64 / bands
    val extra = 64 % bands // the first `extra` bands are one bit wider
    val widths = (0 until bands).map(b => if (b < extra) base + 1 else base)
    val starts = widths.scanLeft(0)(_ + _)
    val bandCols = (0 until bands).map { b =>
      val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1
      struct(lit(b).as("band"),
        shiftright(col("simhash"), starts(b)).bitwiseAND(lit(mask)).as("key"))
    }
    val banded = fp
      .select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
