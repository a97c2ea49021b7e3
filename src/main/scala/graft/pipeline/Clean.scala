package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline — the flow every corpus
  * actually runs, assembled from the gated pieces:
  *
  *   1. redact PII-ish spans (emails/URLs -> placeholder tokens);
  *   2. quality-filter on cheap signals (token count, stopword ratio,
  *      repetition) — pure codegen'd predicates, no oracle;
  *   3. exact-dedup on the normalized fingerprint (min-id survivor);
  *   4. assign deterministic train/val/test splits.
  *
  * Every stage is a narrow/partial transformation except the dedup's one
  * hash aggregation — the whole pipeline is one scan + one shuffle at any
  * scale, and every stage is individually hash-gated against SQL.
  */
object Clean {

  final case class QualityThresholds(minTokens: Int = 30,
      minStopwordRatio: Double = 0.03, maxTokenRatio: Double = 0.15)

  /** The quality predicate over a (redacted) text column. */
  def qualityFilter(c: Column, t: QualityThresholds): Column =
    TextAnalysis.tokenCount(c) >= t.minTokens &&
      TextAnalysis.stopwordRatio(c) >= t.minStopwordRatio &&
      TextAnalysis.maxTokenRatio(c) <= t.maxTokenRatio

  /** Redact -> filter -> dedup -> split. Returns the surviving rows with
    * `clean` (redacted text) and `split` columns added.
    */
  def standardPipeline(df: DataFrame, idCol: String, textCol: String,
      thresholds: QualityThresholds = QualityThresholds(),
      salt: String = "graft"): DataFrame = {
    val redacted = df.withColumn("clean", TextAnalysis.redact(col(textCol)))
    val kept = redacted.filter(qualityFilter(col("clean"), thresholds))
    val deduped = Dedup.exactDedup(kept, idCol,
      TextAnalysis.fingerprint(col("clean")))
    Sampling.withSplit(deduped, idCol, salt = salt)
  }
}
