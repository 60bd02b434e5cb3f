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
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
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

  /** Candidate pairs whose fingerprints share at least one of four 16-bit
    * bands, with exact hamming distance attached (bit_count of xor). */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    // eager localCheckpoint: the banded self-join below consumes the
    // fingerprint pipeline twice; checkpointing runs it once and keeps the
    // downstream plan small (and leaves no CacheManager entry)
    val fp = fingerprints(df, idCol, textCol).localCheckpoint()
    val banded = fp.select(col("doc_id"), col("simhash"), explode(array(
      (0 until 4).map(b => struct(
        lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*))
      .as("bk"))
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
