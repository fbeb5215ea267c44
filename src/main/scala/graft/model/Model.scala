package graft.model

import java.sql.Timestamp

/** Typed row models (SURVEY.md §1) for the `Dataset[T]` API surface.
  * The DataFrame operators remain the primary engine path (dynamic schema,
  * full Catalyst optimization); these encoders are for callers who want
  * compile-time field checks on the §1 entities.
  */
case class LogRow(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

/** §1.4: one chat-log row unnested into role/content messages. */
case class Message(user_id: Long, event_id: Long, role: String, content: String)

/** §1.3: the vector-store chunk record. */
case class Chunk(
    chunk_id: String,
    file_id: Long,
    chunk_index: Int,
    total_chunks: Int,
    source_file: String,
    chunk_text: String,
    embedding: Array[Float])

/** §1.2-ish: document row as generated in the testdata fixtures. */
case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

case class SessionStats(
    user_id: Long,
    message_count: Long,
    first_at: Timestamp,
    last_at: Timestamp)
