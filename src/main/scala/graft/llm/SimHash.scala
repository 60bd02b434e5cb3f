package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash fingerprinting + banded near-dup candidate search.
  * Pure built-in expressions (codegen'd), no UDFs; candidates come from
  * 16-bit band buckets (pigeonhole: hamming distance <= 3 guarantees at
  * least one identical band), never an all-pairs scan.
  */
object SimHash {

  /** Per-bit majority vote over the tokens' murmur3 hashes, packed into a
    * 64-bit fingerprint. `toks` should be a MATERIALIZED token-array column
    * (HOF lambdas evaluate interpreted — an inline tokenizer would re-run
    * 64 times per row). */
  def simhash64FromTokens(toks: Column): Column = {
    val n = size(toks)
    // votes(b) = #tokens with bit b set; bit set in fingerprint iff 2*votes >= n
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => acc.bitwiseOR(
        when(
          size(filter(toks, t => call_function("shiftright",
            hash(t).cast("long"), b).bitwiseAND(lit(1L)) === 1L)) * 2 >= n,
          call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))))
  }

  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), simhash64FromTokens(col("__toks")).as("simhash"))

  /** Candidate pairs whose fingerprints share at least one of four 16-bit
    * bands, with exact hamming distance attached (bit_count of xor). */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val fp = fingerprints(df, idCol, textCol)
    val banded = fp.select(col("doc_id"), col("simhash"), explode(
      transform(sequence(lit(0), lit(3)), b => struct(
        b.as("band"),
        call_function("shiftright", col("simhash"), b * 16)
          .bitwiseAND(lit(0xFFFFL)).as("key"))))
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
