package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-document scan + per-format loader dispatch (SURVEY.md O-1..O-4).
  *
  * The reference loads PDF/DOCX/HTML files through per-format LangChain
  * loaders chosen by lowercased extension (chroma_utils.py:60-71). Here the
  * scan is Spark's `binaryFile` source (distributed, predicate-pushes on
  * path/length/modificationTime) and dispatch is a column expression; text
  * extraction is a per-format function applied to the content bytes.
  *
  * PDF and DOCX binary decoding needs parser libraries that are not on
  * this classpath, so those extractors are deterministic STUBS that
  * surface the container bytes' printable runs — the Spark-side plumbing
  * (scan, dispatch, UDF signature, schema) is real and tested; swap
  * `extractPdf`/`extractDocx` for pdfbox/poi calls in production. The HTML
  * path is a real tag-strip.
  */
object DocLoader {

  /** O-1/O-2/O-3 scan: one row per file with content bytes + metadata. */
  def scanBinary(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"), col("modificationTime"), col("content"))

  /** O-4: extension → format tag; unsupported extensions get "unsupported"
    * (the reference raises, chroma_utils.py:70-71 — kept as a filterable
    * tag so one bad file cannot fail a 100 TB batch).
    */
  def formatOf(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(lower(path).endsWith(".pdf"), "pdf")
      .when(lower(path).endsWith(".docx"), "docx")
      .when(lower(path).endsWith(".html"), "html")
      .otherwise("unsupported")

  /** Real HTML extraction: strip script/style blocks, tags, collapse space. */
  def extractHtml(bytes: Array[Byte]): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    s.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
      .replaceAll("(?s)<!--.*?-->", " ")
      .replaceAll("(?s)<[^>]+>", " ")
      .replaceAll("&nbsp;", " ")
      .replaceAll("&lt;", "<").replaceAll("&gt;", ">")
      .replaceAll("&amp;", "&") // decode &amp; LAST or "&amp;lt;" double-unescapes
      .replaceAll("\\s+", " ").trim
  }

  /** STUB: real impl = pdfbox PDFTextStripper per page. Deterministic
    * printable-run extraction so pipelines downstream are exercisable.
    */
  def extractPdf(bytes: Array[Byte]): String = printableRuns(bytes)

  /** STUB: real impl = poi XWPFDocument paragraphs. */
  def extractDocx(bytes: Array[Byte]): String = printableRuns(bytes)

  private def printableRuns(bytes: Array[Byte]): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    s.split("[^\\x20-\\x7E]+").filter(_.length >= 4).mkString(" ").trim
  }

  private val extractUdf = udf { (fmt: String, bytes: Array[Byte]) =>
    if (bytes == null) null
    else fmt match {
      case "pdf"  => extractPdf(bytes)
      case "docx" => extractDocx(bytes)
      case "html" => extractHtml(bytes)
      case _      => null
    }
  }

  /** Full load: scan → dispatch → extract → (doc path, format, text).
    * Unsupported formats yield null text (filter or fail upstream).
    */
  def loadDocuments(spark: SparkSession, dir: String): DataFrame =
    scanBinary(spark, dir)
      .withColumn("format", formatOf(col("path")))
      .withColumn("text", extractUdf(col("format"), col("content")))
      .select("path", "format", "length", "text")
}
