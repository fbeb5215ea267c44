package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextSplit

/** SQL-facing form of the recursive character splitter (SURVEY.md T-1,
  * §2.10): a custom Catalyst `Generator`, so chunking composes in SQL as
  *
  * {{{
  *   SELECT doc_id, c.chunk_index, c.chunk_text
  *   FROM documents
  *   LATERAL VIEW split_chunks(text, 100, 20) c AS chunk_index, chunk_text
  * }}}
  *
  * One input row fans out to one row per chunk with its index — the same
  * 1→N shape as `posexplode(splitUdf(text))` but without materializing the
  * intermediate array (each chunk row is emitted lazily), which matters
  * when a 10 MB document becomes hundreds of chunks at 100 TB scale.
  * Registered as `split_chunks` by [[graft.GraftExtensions]].
  */
case class SplitChunks(child: Expression, chunkSize: Int, chunkOverlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val chunks = TextSplit.splitText(
        v.asInstanceOf[UTF8String].toString, chunkSize, chunkOverlap)
      chunks.iterator.zipWithIndex.map { case (c, i) =>
        InternalRow(i, UTF8String.fromString(c))
      }
    }
  }

  override def prettyName: String = "split_chunks"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SplitChunks {
  /** Validated builder for SQL registration:
    * split_chunks(text[, size[, overlap]]) — size/overlap must be
    * foldable non-null integers (clean AnalysisException otherwise,
    * same discipline as [[CharShingles.fromArgs]]).
    */
  def fromArgs(exprs: Seq[Expression]): SplitChunks = {
    SqlArgs.arity("split_chunks", exprs, 1, 3)
    SplitChunks(exprs.head,
      SqlArgs.foldableInt("split_chunks", exprs, 1, TextSplit.DefaultChunkSize),
      SqlArgs.foldableInt("split_chunks", exprs, 2, TextSplit.DefaultChunkOverlap))
  }
}
