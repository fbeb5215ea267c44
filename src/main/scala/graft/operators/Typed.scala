package graft.operators

import org.apache.spark.sql.Dataset
import graft.functions.{HashEmbedder, TextSplit}
import graft.model._

/** Typed `Dataset[T]` variants of the core pipeline stages — the
  * case-class-encoded API surface (SURVEY.md §1.4/§2.10 "flatMap on
  * Dataset[Doc]"). Semantics identical to the DataFrame forms; use these
  * when compile-time row types matter more than dynamic schemas.
  */
object Typed {

  /** T-1/T-2/T-3 in one typed pass: split, enrich, embed. */
  def splitAndEmbed(
      docs: Dataset[Doc],
      chunkSize: Int = TextSplit.DefaultChunkSize,
      overlap: Int = TextSplit.DefaultChunkOverlap): Dataset[Chunk] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      val chunks = TextSplit.splitText(Option(d.text).getOrElse(""), chunkSize, overlap)
      chunks.zipWithIndex.map { case (text, i) =>
        Chunk(s"${d.doc_id}_$i", d.doc_id, i, chunks.length, d.source, text,
          HashEmbedder.embed(text))
      }
    }
  }

  /** T-12 typed: one log row → human then ai message. */
  def toMessages(logs: Dataset[LogRow]): Dataset[Message] = {
    import logs.sparkSession.implicits._
    logs.flatMap { r =>
      Seq(
        Message(r.user_id, r.event_id, "human", r.event_type),
        Message(r.user_id, r.event_id, "ai", r.props))
    }
  }

  /** A-4 typed: per-session stats via reduceGroups (associative merge —
    * no group materialization, scales like a partial aggregate).
    */
  def sessionStats(logs: Dataset[LogRow]): Dataset[SessionStats] = {
    import logs.sparkSession.implicits._
    logs
      .map(r => SessionStats(r.user_id, 1L, r.ts, r.ts))
      .groupByKey(_.user_id)
      .reduceGroups { (a, b) =>
        SessionStats(a.user_id, a.message_count + b.message_count,
          if (a.first_at.before(b.first_at)) a.first_at else b.first_at,
          if (a.last_at.after(b.last_at)) a.last_at else b.last_at)
      }
      .map(_._2)
  }
}
