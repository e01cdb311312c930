package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level text analysis (north-star extension): language-ID,
  * quality scoring, token counting, fingerprinting — all single-pass
  * projections over the documents table (no shuffle at any scale). */
object TextAnalysis {

  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("pred_lang", TextFunctions.langId(col(textCol)))

  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("__q", TextFunctions.qualityMetrics(col(textCol)))
      .select(col("*"), col("__q.*")).drop("__q")

  def withTokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens", size(TextFunctions.tokens(col(textCol))).cast("long"))
      // BPE-ish subword estimate: words + punctuation clusters + digit runs
      // counted separately (a cheap, deterministic proxy for tokenizer load)
      .withColumn("n_subtokens",
        size(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]{1,8}|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long"))

  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))

  /** Top-k most frequent terms per group (vocabulary reporting / frequent
    * items). Two map-side-combinable aggregations reduce the corpus to
    * per-(group, term) counts; the final row_number window then runs over
    * vocabulary-sized data, not the corpus. Groups are few (languages,
    * sources), so the window's per-group partition is the whole vocabulary
    * of that group — if a group's vocabulary ever outgrew one task, the
    * two-phase top-k pattern from [[Similarity]] (partial k per physical
    * partition, final k over survivors) drops in with the same contract.
    * Deterministic: ties break on the term itself. */
  def topTerms(docs: DataFrame, groupCol: String = "lang", k: Int = 10,
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(groupCol, "term").agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("rk", row_number()
        .over(Window.partitionBy(col(groupCol)).orderBy(col("cnt").desc, col("term")))
        .cast("long"))
      .where(col("rk") <= k)
  }
}
