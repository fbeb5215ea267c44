package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Recursive character text splitter (SURVEY.md T-1).
  *
  * Re-implements, as a pure Scala function, the chunking contract the
  * reference configures at chroma_utils.py:16-21 (chunk_size=1000,
  * chunk_overlap=200, separator preference `["\n\n", "\n", " ", ""]`):
  * greedily split on the coarsest separator present, recursively re-split
  * oversized pieces with the remaining separators, then merge adjacent
  * pieces into chunks of at most `chunkSize` characters with an
  * `chunkOverlap`-character carry-over between consecutive chunks.
  *
  * Pure `String => Vector[String]`, distributed via `flatMap`/UDF +
  * `posexplode` — the splitter itself has no Spark dependency so it can be
  * unit/property tested without a session.
  */
object TextSplit {

  val DefaultChunkSize    = 1000
  val DefaultChunkOverlap = 200
  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")

  /** Split `text` into chunks of at most `chunkSize` chars (unless a single
    * unsplittable token exceeds it at the "" level, which cannot happen since
    * "" splits per-character), with up to `chunkOverlap` chars of overlap.
    */
  def splitText(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      chunkOverlap: Int = DefaultChunkOverlap,
      separators: List[String] = DefaultSeparators): Vector[String] = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(chunkOverlap < chunkSize, "overlap must be smaller than chunkSize")
    if (text.isEmpty) Vector.empty
    else recursiveSplit(text, separators, chunkSize, chunkOverlap).filter(_.nonEmpty)
  }

  private def recursiveSplit(
      text: String,
      separators: List[String],
      chunkSize: Int,
      chunkOverlap: Int): Vector[String] = {
    // First separator that actually occurs in the text; "" always matches.
    val sepIdx = separators.indexWhere(s => s.isEmpty || text.contains(s)) match {
      case -1 => separators.length - 1
      case i  => i
    }
    val sep = if (separators.isEmpty) "" else separators(sepIdx)
    val remaining = if (separators.isEmpty) Nil else separators.drop(sepIdx + 1)

    val pieces: Vector[String] =
      if (sep.isEmpty) slidingChunks(text, chunkSize, chunkOverlap)
      else text.split(java.util.regex.Pattern.quote(sep), -1).toVector.filter(_.nonEmpty)

    val out = ArrayBuffer.empty[String]
    val good = ArrayBuffer.empty[String] // pieces small enough to merge
    for (piece <- pieces) {
      if (piece.length < chunkSize) good += piece
      else {
        if (good.nonEmpty) { out ++= merge(good.toVector, sep, chunkSize, chunkOverlap); good.clear() }
        if (remaining.isEmpty) out += piece
        else out ++= recursiveSplit(piece, remaining, chunkSize, chunkOverlap)
      }
    }
    if (good.nonEmpty) out ++= merge(good.toVector, sep, chunkSize, chunkOverlap)
    out.toVector
  }

  /** Hard character split for unsplittable runs — WITH the overlap
    * carry-over the chunking contract promises (grouped() would produce
    * zero-overlap windows): windows of `chunkSize` advancing by
    * `chunkSize - overlap`, dropping a trailing window that would sit
    * entirely inside the previous chunk's overlap region.
    */
  private def slidingChunks(text: String, chunkSize: Int, overlap: Int): Vector[String] = {
    if (text.length <= chunkSize) Vector(text)
    else {
      val stride = chunkSize - overlap
      (0 until text.length by stride)
        .filter(start => start == 0 || start < text.length - overlap)
        .map(start => text.substring(start, math.min(start + chunkSize, text.length)))
        .toVector
    }
  }

  /** Greedy merge of small pieces into chunks <= chunkSize, joined with the
    * separator they were split on, carrying up to `chunkOverlap` trailing
    * characters of one chunk into the start of the next.
    */
  private def merge(
      pieces: Vector[String],
      sep: String,
      chunkSize: Int,
      chunkOverlap: Int): Vector[String] = {
    val sepLen = sep.length
    val docs = ArrayBuffer.empty[String]
    var current = Vector.empty[String]
    var total = 0

    def joined: String = current.mkString(sep).trim

    for (piece <- pieces) {
      val extra = piece.length + (if (current.nonEmpty) sepLen else 0)
      if (total + extra > chunkSize && current.nonEmpty) {
        val d = joined
        if (d.nonEmpty) docs += d
        // Pop from the front until within overlap budget and the next piece fits.
        while (current.nonEmpty &&
               (total > chunkOverlap ||
                (total + piece.length + sepLen > chunkSize && total > 0))) {
          total -= current.head.length + (if (current.length > 1) sepLen else 0)
          current = current.tail
        }
      }
      current = current :+ piece
      total += piece.length + (if (current.length > 1) sepLen else 0)
    }
    val last = joined
    if (last.nonEmpty) docs += last
    docs.toVector
  }
}
