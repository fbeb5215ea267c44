package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Vector retrieval (SURVEY.md T-4/J-2/S-4, T-7): exact k-NN join of a
  * (small) query set against a (large) corpus of embeddings, plus the
  * stuff-documents context fold.
  *
  * Reference: chroma_utils.py:237-263 (similarity_search, k=2 via
  * config.py:34) and langchain_utils.py:240-243 (stuff documents chain).
  *
  * Plan shape: broadcast the query side across the corpus — a broadcast
  * nested-loop join with a codegen-able scorer, then a per-query top-k rank
  * window. The corpus is never shuffled; the window's partition key is the
  * query id, so the only shuffle moves `|queries| * |corpus|`-reduced score
  * rows (corpus partitions compute scores locally). At 100 TB this is the
  * canonical brute-force path; the LSH/IVF variants in [[Ann]] cut the
  * scored candidate set first.
  */
object Retrieval {

  /** Exact top-k by cosine similarity. `queries(query_id, q_embedding)`,
    * `corpus(vec_id, embedding)`. Ties broken by vec_id for determinism.
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("sim",
        graft.expressions.VectorExpressions.cosineSim(col("q_embedding"), col("embedding")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "sim")
  }

  /** Metadata-prefiltered k-NN (P-9, chroma_utils.py:250-257): the filter
    * runs below the top-k so pruning happens before any scoring.
    */
  def knnJoinFiltered(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame =
    knnJoin(queries, corpus.filter(predicate), k)

  /** T-7: stuff-documents fold — concatenate retrieved chunk texts per query
    * in rank order into one `{context}` string (langchain_utils.py:240-243).
    * Input needs (query_id, rank, text).
    */
  def stuffContext(retrieved: DataFrame, sep: String = "\n\n"): DataFrame =
    retrieved
      .groupBy("query_id")
      .agg(concat_ws(sep,
        transform(
          array_sort(collect_list(struct(col("rank"), col("text")))),
          s => s.getField("text"))).as("context"))

  /** T-10: defensive LLM-response parse, mirroring the reference ladder
    * (langchain_utils.py:105-206) step for step:
    *  1. trim; strip known LLM prefixes (anchored, case-insensitive, :126-139);
    *  2. strip leading ```json / ``` and trailing ``` fences (:141-147);
    *  3. extract first `{` .. last `}` (:149-155);
    *  4. parse `{answer, emotion}`; invalid JSON or missing answer → fall
    *     back to the extracted substring (or the defenced text when no
    *     braces were found), emotion neutral (:160-162, :191-206);
    *  5. clean brace artifacts out of the answer (:167-175);
    *  6. lower+trim emotion, closed-domain validate → neutral (:177-182,
    *     = P-10);
    *  7. empty input → the apology string (:196-199).
    */
  def parseLlmResponse(raw: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val prefixes = Seq(
      "Here's the answer:", "Here's my response:", "Sure, here you go:",
      "The answer is:", "Answer:", "\\{answer:", "answer:\\}", "emotion:")
    val prefixStripped = prefixes.foldLeft(trim(raw)) { (c, p) =>
      trim(regexp_replace(c, "(?i)^" + p, ""))
    }
    val defenced = trim(regexp_replace(
      trim(regexp_replace(trim(regexp_replace(prefixStripped, "^```json", "")), "^```", "")),
      "```$", ""))
    val jsonBody = regexp_extract(defenced, "(?s)(\\{.*\\})", 1)
    val fallbackText = when(length(jsonBody) > 0, jsonBody).otherwise(defenced)
    val parsed = from_json(jsonBody,
      org.apache.spark.sql.types.StructType.fromDDL("answer STRING, emotion STRING"))

    val rawAnswer = trim(parsed.getField("answer"))
    val cleanedAnswer =
      when(rawAnswer.startsWith("{") || rawAnswer.endsWith("}"),
        trim(translate(rawAnswer, "{}", ""))).otherwise(rawAnswer)
    val apology = lit("I apologize, I encountered an error generating a response.")
    val answer =
      when(parsed.getField("answer").isNotNull, cleanedAnswer)
        .when(length(fallbackText) > 0, fallbackText)
        .otherwise(apology)

    val validEmotions = Seq("happy", "explaining", "thinking", "encouraging", "neutral")
    val emotionRaw = lower(trim(parsed.getField("emotion")))
    val emotion = when(parsed.getField("answer").isNull, "neutral")
      .when(emotionRaw.isin(validEmotions: _*), emotionRaw)
      .otherwise("neutral")
    struct(answer.as("answer"), emotion.as("emotion"))
  }
}
