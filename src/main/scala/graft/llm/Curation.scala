package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed "training-data pipeline" shape:
  * exact dedup, then quality and language gates, yielding the kept document
  * ids. Every stage is a codegen'd narrow transform except the dedup window
  * (one shuffle on md5(text)); at 100 TB the shuffle moves (hash, id) pairs
  * plus the text once, and the gates run at scan speed via single
  * `regexp_count` passes (see [[TextAnalysis]]).
  */
object Curation {

  /** Documents that survive curation:
    *  - first document per exact content hash (lowest id wins),
    *  - at least `minWords` alphanumeric tokens,
    *  - ASCII-only (`maxNonAscii` non-ASCII code points allowed),
    *  - at least `minEnStopwords` English stopword tokens (a cheap
    *    "is this prose in the target language" gate).
    * Returns the id column only — deterministic and oracle-checkable.
    */
  def curate(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 10, maxNonAscii: Int = 0,
      minEnStopwords: Int = 1): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .filter(regexp_count(lower(col(textCol)), lit("[a-z0-9]+")) >= minWords)
      .filter(regexp_count(col(textCol), lit("[^ -~\\s]")) <= maxNonAscii)
      .filter(TextAnalysis.stopwordHits(col(textCol),
        TextAnalysis.LANG_STOPWORDS("en")) >= minEnStopwords)
      .select(col(idCol))
  }
}
