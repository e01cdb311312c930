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
}
