package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * extraction, quality statistics, and n-gram-heuristic language ID. All are
  * pure narrow transformations over codegen'd built-ins — no UDFs, no
  * shuffles — so they stream at full scan speed on any cluster size.
  */
object TextAnalysis {

  /** Lower-cased alphanumeric tokens. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** BPE-ish subword count: alphanumeric runs plus punctuation marks each
    * count as a token. Counted with `regexp_count` — one regex pass, no
    * intermediate token array to materialize. */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")).cast("int")

  /** Per-document quality statistics (length / punctuation / stopword
    * ratios as exact integer counts; ratios derive downstream). Every stat
    * is a single `regexp_count` pass: counting matches directly avoids both
    * materializing token arrays (`size(regexp_extract_all(...))`) and
    * rewriting the string (`length(regexp_replace(...))`) — at 100 TB these
    * intermediate copies are the dominant cost of the scan. */
  def qualityStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).cast("int").as("char_len"),
      regexp_count(lower(t), lit("[a-z0-9]+")).cast("int").as("word_cnt"),
      tokenCount(t).as("token_cnt"),
      regexp_count(t, lit("[A-Z]")).cast("int").as("upper_cnt"),
      regexp_count(t, lit("[.,;:!?]")).cast("int").as("punct_cnt"),
      regexp_count(t, lit("[^ -~\\s]")).cast("int").as("non_ascii_cnt"),
      stopwordHits(t, LANG_STOPWORDS("en")).as("en_stopword_cnt"))
  }

  /** Order-sensitive document fingerprint: rotate-xor rolling hash over the
    * token stream (`rotl5(acc) ^ h(token)`), so permuted documents
    * fingerprint differently while identical ones collide. The per-token
    * hash is the first 60 bits of the token's md5 — engine-portable (any
    * SQL engine with `md5` + hex parsing reproduces it bit-for-bit, unlike
    * murmur3's seed/tail variants), which is what lets the DuckDB oracle
    * gate verify this query end-to-end.
    *
    * The fold is XOR-linear (`rotl` distributes over `^`), so it unrolls to
    * `XOR_i rotl(h(t_i), 5*(n-1-i) mod 64)` — an order-independent aggregate
    * of order-DEPENDENT per-token contributions. That form is fully
    * relational: posexplode + codegen'd bitwise ops + `bit_xor` aggregate,
    * with map-side partial aggregation collapsing each doc to one row per
    * partition before the (doc_id, partial) shuffle. The previous
    * `functions.aggregate` HOF computed the identical values but evaluated
    * interpreted per row — the last lambda in any scan path. Pure bitwise
    * ops — wraparound-free under ANSI mode. */
  def rollingFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // rotate-by-zero works through the or-form because long shifts take the
    // amount mod 64 (codegen'd as Java `<<`/`>>>`): h<<0 | h>>>64 == h
    val r = pmod(lit(5) * (col("__n") - 1 - col("pos")), lit(64))
    // 60-bit token hash (15 hex chars of md5): positive, so `>>` == `>>>`
    // on every engine; codegen'd md5 is CSE'd across the two shift operands
    val h = conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val rotated = call_function("shiftleft", h, r)
      .bitwiseOR(call_function("shiftrightunsigned", h, lit(64) - r))
    // posexplode_outer + null guard: zero-token docs must fingerprint to
    // the fold's seed (0), not vanish from the output — while NULL text
    // must stay NULL (like the original fold over a null array), which the
    // carried `__n` distinguishes: size(null) is NULL, size(array()) is 0
    Parallelism.fanOut(df, idCol)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("__n"),
        posexplode_outer(col("__toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("__n"),
        when(col("tok").isNull, lit(0L)).otherwise(rotated).as("contrib"))
      .groupBy("doc_id")
      .agg(bit_xor(col("contrib")).as("__fp"), max(col("__n")).as("__nn"))
      .select(col("doc_id"),
        when(col("__nn").isNull, lit(null).cast("long"))
          .otherwise(col("__fp")).as("fingerprint"))
  }

  val LANG_STOPWORDS: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "is", "to"),
    "de" -> Seq("der", "und", "das", "die", "ist"),
    "es" -> Seq("que", "los", "una", "con", "para"),
    "fr" -> Seq("les", "des", "une", "avec", "pour"))

  /** Number of tokens equal to one of `words`: counted as one anchored
    * alternation regex pass (`(?<![a-z0-9])(w1|w2|...)(?![a-z0-9])` — the
    * lookarounds enforce the same token boundaries `tokens` produces), so
    * there is no token-array materialization and no interpreted `filter`
    * higher-order-function lambda in the scan. */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val pattern = words.mkString("(?<![a-z0-9])(", "|", ")(?![a-z0-9])")
    regexp_count(lower(text), lit(pattern)).cast("int")
  }

  /** n-gram-heuristic language ID: per-language stopword hit counts with a
    * deterministic arg-max (count desc, language asc). Documents DOMINATED
    * by non-ASCII text (more than half the characters) classify as "zh" —
    * dominance, not mere presence: one accented é or a curly quote in
    * otherwise-Latin text must not override the stopword evidence. */
  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val langs = LANG_STOPWORDS.keys.toSeq.sorted
    val withScores = df.select(
      col(idCol) +:
      regexp_count(t, lit("[^ -~\\s]")).cast("int").as("non_ascii") +:
      length(t).cast("int").as("__char_len") +:
      langs.map(l => stopwordHits(t, LANG_STOPWORDS(l)).as(s"score_$l")): _*)
    // deterministic arg-max: fold over languages in sorted order, keeping
    // the strictly-greater score, so ties resolve to the earlier language
    val best = langs.tail.foldLeft((lit(langs.head), col(s"score_${langs.head}"))) {
      case ((bestLang, bestScore), l) =>
        val s = col(s"score_$l")
        (when(s > bestScore, lit(l)).otherwise(bestLang),
         when(s > bestScore, s).otherwise(bestScore))
    }
    withScores.select(
      col(idCol),
      when(col("non_ascii") * 2 > col("__char_len"), lit("zh")) // CJK-dominant
        .otherwise(best._1).as("lang_guess"),
      best._2.as("lang_score"))
  }

  /** Repetition signal (Gopher-style quality gate): total vs distinct token
    * counts per document. Heavily templated / repeated text shows a low
    * distinct ratio; the ratio itself derives downstream (exact integer
    * counts keep the operator oracle-checkable). `array_distinct` over the
    * extracted token array is a narrow codegen'd collection op — per-row
    * work only, no explode, no shuffle, streams at scan speed. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col(idCol),
      size(toks).as("word_cnt"),
      size(array_distinct(toks)).as("distinct_cnt"))
  }

  /** Sequence packing (GPT-style concat-then-chunk): assign each document
    * a (shard, seq_id, offset) so that concatenating a shard's documents in
    * id order and slicing every `maxTokens` tokens yields the training
    * sequences. `offset` is the document's first token position inside its
    * shard's stream; `seq_id = offset div maxTokens` — documents spanning a
    * boundary continue into the next sequence, exactly like the standard
    * pretraining data loader.
    *
    * Scale: packing is per-SHARD (an md5-derived hash of the id mod
    * numShards, the way real pipelines pack per data-loader worker), so
    * the cumulative sum windows over shard partitions — each holds
    * corpus/numShards documents — and never a global single-partition
    * ordering. One shuffle on shard. A real HASH (not `id mod n`)
    * matters twice: ids sharing a common factor with numShards (zeroed
    * low bits, every-Nth sampling) would otherwise all land in one shard
    * and rebuild exactly the global window this sharding avoids, and
    * non-numeric ids would cast to null. md5 (not murmur) keeps the
    * shard assignment engine-portable for the oracle gate. */
  def packSequences(
      df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int = 2048, numShards: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val shard = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long"),
      lit(numShards.toLong))
    df.select(col(idCol), shard.as("shard"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tokens"), col("offset"),
        (col("offset") / maxTokens).cast("long").as("seq_id"))
  }

  /** TF-IDF top-`k` distinctive terms per document: for every document the
    * `k` terms with the highest `tf / doc_freq` score (term frequency ×
    * inverse document frequency, RAW-idf variant). Raw `1/df` instead of
    * the log-damped `ln(N/df)` is a deliberate choice: small-integer IEEE
    * division is bit-exact on every engine, while `ln` is libm-dependent —
    * a near-tie could order differently across engines and break the
    * cross-engine oracle. Ties break by term, ascending. Output is
    * integer/string only: (doc_id, rank, term, tf, doc_freq).
    *
    * Scale: ONE (doc_id, term) shuffle builds per-doc term counts
    * (map-side partial aggregation collapses repeated terms before the
    * exchange); document frequencies aggregate from that frame — vocab-
    * sized, so AQE broadcasts it back onto the join; the top-k window
    * partitions by document, never global. */
  def tfidfTopK(
      df: DataFrame, idCol: String, textCol: String, k: Int = 5): DataFrame = {
    // byte-gated floor (guide §2.5): the flat fanOut was measured harmful
    // here at small scale, but the token explode + partial aggregate is
    // split-bound once each split carries enough text
    val toks = Parallelism.fanOutBytes(df, idCol)
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
    // stabilized: document frequencies AND the scoring join both read the
    // term-count frame — one tokenize+aggregate pass, not two. LAZY: the
    // doc-frequency broadcast build is the first consumer and doubles as
    // the materialization job
    val tf = Checkpoints.stabilize(
      toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
      eager = false)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy((col("tf") / col("doc_freq")).desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("doc_freq"))
  }

  /** PII patterns scrubbed by [[piiScrub]], applied in this order. Kept to
    * simple character-class regexes that mean the same thing in Java and
    * RE2 dialects. */
  val PII_PATTERNS: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+?\\d{1,3}[-. ]\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}", "<PHONE>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"))

  /** Overlapping fixed-size character chunks per document — the standard
    * pre-embedding / context-window split (chunk `chunkChars` wide, stride
    * `strideChars`, so consecutive chunks overlap by `chunkChars -
    * strideChars`). Every document yields at least one chunk (short and
    * empty docs keep a representative row); the last chunk may be shorter
    * than `chunkChars`.
    *
    * Scale: a pure narrow `posexplode` over a `sequence` of chunk indices —
    * no shuffle, no UDF, output rows ∝ total text volume / stride. The
    * chunk count comes from INTEGER arithmetic (`ceil((n - chunk) /
    * stride) + 1` spelled as an exact integer division) so the row set is
    * bit-reproducible on any engine — fp `ceil` near an exact multiple
    * could differ by one chunk between engines. */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkChars: Int = 400, strideChars: Int = 300): DataFrame = {
    require(chunkChars > 0 && strideChars > 0 && strideChars <= chunkChars,
      s"chunkDocuments: need 0 < strideChars <= chunkChars " +
        s"(got chunk=$chunkChars stride=$strideChars)")
    // NULL text counts as empty: without the coalesce, length(NULL) makes
    // numChunks NULL and posexplode(NULL) emits ZERO rows — the document
    // would silently vanish instead of keeping its representative chunk
    val n = coalesce(length(col(textCol)), lit(0)).cast("long")
    // exact integer ceil-div (IntegralDivide, not fp `/` + floor): extra
    // strides needed past the first chunk
    val extra = call_function("div",
      (n - chunkChars) + (strideChars - 1), lit(strideChars.toLong))
      .cast("long")
    val numChunks = when(n <= chunkChars, lit(1L)).otherwise(extra + 1L)
    df.select(col(idCol), col(textCol),
        posexplode(sequence(lit(0L), numChunks - 1L)))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col(textCol).substr(
          (col("pos") * strideChars + 1L).cast("int"), lit(chunkChars))
          .as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
  }

  /** Exact corpus-level heavy hitters: the `k` most frequent tokens with
    * deterministic (count DESC, term ASC) ordering, plus each term's
    * document frequency. The "what does my corpus look like" profiler and
    * the vocabulary seed for tokenizer training.
    *
    * Scale: per-document tokenize is narrow; the (term) aggregate gets
    * map-side partial aggregation so the exchange carries one row per
    * distinct term per task, not one per token occurrence; the final top-k
    * is a `TakeOrderedAndProject` over the vocab-sized aggregate — never a
    * global sort of the corpus. Exactness is affordable because the
    * shuffled key space is the VOCABULARY (millions), independent of corpus
    * size; a Space-Saving sketch would only save the vocab-sized exchange
    * while giving up the oracle. */
  def heavyHitters(
      df: DataFrame, idCol: String, textCol: String, k: Int = 20): DataFrame = {
    // byte-gated floor — same trade as [[tfidfTopK]]'s
    val perDoc = Parallelism.fanOutBytes(df, idCol)
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    perDoc.groupBy("term")
      .agg(sum("tf").as("cnt"), count(lit(1)).as("doc_freq"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
      .select(col("term"), col("cnt"), col("doc_freq"))
  }

  /** PII scrubbing for training corpora: redact emails, IPv4 addresses,
    * phone numbers and SSN-shaped ids, returning the scrubbed text plus a
    * per-category redaction count (audit trail for the pipeline). A chain
    * of `regexp_count` + `regexp_replace` — narrow, codegen'd, no UDF; at
    * 100 TB this is a pure map over the scan like every other text stage.
    * Order matters: longer patterns run before sub-patterns they contain
    * (phone before SSN would double-fire; SSN runs last of the digit
    * family on the already-scrubbed text). */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // each category counts on the text AS IT STANDS when its scrub runs
    // (post the previous replacements), so the audit counts exactly the
    // redactions that actually happened — counting every pattern on the
    // ORIGINAL text would over-report when patterns nest (an IP-shaped
    // substring inside an email is scrubbed once, as the email)
    val (scrubbed, counts) = PII_PATTERNS
      .foldLeft((col(textCol), Seq.empty[Column])) {
        case ((c, acc), (name, pattern, token)) =>
          (regexp_replace(c, lit(pattern), lit(token)),
           acc :+ regexp_count(c, lit(pattern)).cast("int").as(s"${name}_cnt"))
      }
    df.select(col(idCol) +: scrubbed.as("scrubbed_text") +: counts: _*)
  }
}
