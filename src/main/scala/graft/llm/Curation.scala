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
}
