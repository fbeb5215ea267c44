package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Dolma-style attribute sidecar (Soldaini et al. 2024, "Dolma: an Open
  * Corpus..."): run every tagger family ONCE over the corpus and
  * materialize per-document attribute columns — the document text is
  * never mutated, and filtering becomes a declarative POLICY over
  * attributes that can be re-evaluated, ablated, or audited without
  * re-running a single tagger. At 100 TB this is the difference between
  * "change a threshold → one cheap scan of the (narrow) attribute
  * sidecar" and "change a threshold → re-tokenize the corpus".
  *
  * Scale shape: the heuristic taggers (quality, language-ID) are pure
  * per-row projections; the two non-local taggers each shuffle short
  * keys only — Gopher's repetition ratio pre-aggregates (doc_id, word)
  * counts map-side, and the exact-dup tagger ships one 32-byte content
  * hash per doc through a min-aggregate + equi-join (the
  * [[Dedup.exact]] shape), never the text.
  *
  * Reference behavior anchor: the reference app applies its validation
  * chain in-line and discards the evidence (file_utils.py validate →
  * ingest); the sidecar re-expresses that chain as data, which is what
  * makes decisions auditable downstream.
  */
object Attributes {

  /** Tag `docs` (doc_id, text, lang) with the standard attribute set:
    * Gopher rule booleans, the composite quality score, predicted
    * language + claimed-language agreement, and an exact-duplicate flag
    * (first doc_id per content hash survives).
    */
  def tag(
      docs: DataFrame,
      minTokens: Int = 30,
      maxTokens: Int = 100000,
      minMeanLen: Double = 4.0,
      maxMeanLen: Double = 10.0,
      maxRepetition: Double = 0.125,
      minDistinctStopwords: Int = 2): DataFrame = {
    val gopher = TextAnalysis.gopherRules(docs, minTokens, maxTokens,
      minMeanLen, maxMeanLen, maxRepetition, minDistinctStopwords)
      .withColumnRenamed("keep", "gopher_keep")
    val hashed = docs.select(
      col("doc_id"), col("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.detectLanguageCol(col("text")).as("lang_pred"),
      sha2(coalesce(col("text"), lit("")), 256).as("_content_h"))
    val firsts = hashed.groupBy("_content_h")
      .agg(min(col("doc_id")).as("_first_doc"))
    hashed.join(firsts, Seq("_content_h"))
      .withColumn("is_exact_dup", col("doc_id") =!= col("_first_doc"))
      .drop("_content_h", "_first_doc")
      .join(gopher, Seq("doc_id"))
      .withColumn("lang_match", col("lang_pred") === col("lang"))
  }

  /** Evaluate an ordered policy over a tagged frame: each rule is
    * (name, pass-condition); `first_failed` names the FIRST rule (in
    * declaration order) the document fails — 'none' if it passes all —
    * and `keep` is that test. Pure projection; policy changes never
    * touch the taggers.
    */
  def decide(attrs: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "decide needs at least one rule")
    val firstFailed = coalesce(
      rules.map { case (name, pass) => when(!pass, lit(name)) } :+ lit("none"): _*)
    attrs
      .withColumn("first_failed", firstFailed)
      .withColumn("keep", col("first_failed") === "none")
  }
}
