package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashEmbedder, TextSplit}

/** Document ingest pipeline (reference: POST /upload-doc, main.py:305-427):
  * validate → sanitize → hash → dedup-gate → split → enrich → embed.
  *
  * One declarative lineage; each stage is a pure column expression or a
  * flatMap, so Catalyst prunes/pushes through all of it and the write is
  * atomic (the reference's cross-store rollback, main.py:400-405,
  * disappears).
  */
object Ingest {

  val AllowedExtensions: Seq[String] = Seq(".pdf", ".docx", ".html") // config.py:27
  val MaxFileBytes: Long = 10L * 1024 * 1024 // config.py:26
  val MaxQueryLen = 2000 // config.py:44

  /** P-1: case-insensitive extension allow-list (file_utils.py:59-71). */
  def validExtension(filename: Column): Column =
    lower(regexp_extract(filename, "(\\.[^.]+)$", 1)).isin(AllowedExtensions: _*)

  /** P-2: size cap (file_utils.py:123-135). */
  def validSize(sizeBytes: Column): Column = sizeBytes <= lit(MaxFileBytes)

  /** P-4: filename sanitize (file_utils.py:30-57): strip directories, map
    * disallowed chars to `_`, guard leading dot / empty.
    */
  def sanitizeFilename(name: Column): Column = {
    val base = element_at(split(name, "/"), -1)
    val cleaned = regexp_replace(base, "[^A-Za-z0-9._-]", "_")
    when(length(trim(cleaned)) === 0 || trim(cleaned) === ".", lit("unnamed_file"))
      .when(cleaned.startsWith("."), concat(lit("file_"), substring(cleaned, 2, 1000000)))
      .otherwise(cleaned)
  }

  /** P-5/P-6: query guards (models.py:25-48). */
  def validQuery(q: Column): Column =
    (length(q) <= MaxQueryLen) && (trim(q) =!= "")

  /** P-7: session-id charset (models.py:50-61). `\A..\z` anchors, not
    * `^..$` — Java's `$` matches before a trailing newline, which would
    * accept malformed ids and diverge from full-match oracle semantics.
    */
  def validSessionId(s: Column): Column = s.rlike("\\A[A-Za-z0-9-]+\\z")

  /** P-3: magic-number MIME sniff over leading bytes; fail-open (NULL/unknown
    * header → accepted), mirroring file_utils.py:115-121.
    */
  def mimeMatches(content: Column, ext: Column): Column = {
    val header = substring(content.cast("string"), 1, 8)
    val sniffed = when(header.startsWith("%PDF"), lit(".pdf"))
      .when(header.startsWith("PK"), lit(".docx"))
      .when(lower(header).startsWith("<"), lit(".html"))
      .otherwise(lit(null).cast("string"))
    coalesce(sniffed === lower(ext), lit(true))
  }

  /** T-5: content identity for dedup — sha2-256 hex (file_utils.py:9-28). */
  def contentHash(text: Column): Column = sha2(text, 256)

  /** O-8/J-3: dedup gate — incoming rows whose content hash is absent from
    * the catalog (UNIQUE(file_hash) as a left-anti join,
    * db_utils.py:221-225). Broadcast-friendly when the catalog side is
    * small; at scale both sides hash-partition on the hash key.
    */
  def dedupGate(incoming: DataFrame, catalog: DataFrame, hashCol: String): DataFrame =
    incoming.join(catalog.select(hashCol).distinct(), Seq(hashCol), "left_anti")

  /** T-1/T-2: split documents into chunks and enrich with chunk metadata
    * (chroma_utils.py:82-89, 119-125). `docs` must have (doc_id, text,
    * source); emits the SURVEY §1.3 chunk schema minus embedding.
    *
    * Page granularity (SURVEY §1.3, PyPDFLoader's page metadata): when
    * `docs` carries a `page` column (one row per page, e.g. from
    * [[graft.sources.DocLoader.loadDocumentPages]]), each page splits
    * independently — `chunk_index`/`total_chunks` are per page and
    * `chunk_id` gains a page segment so ids stay unique within the file.
    * Pageless inputs get `page = 1` with ids unchanged.
    */
  def splitIntoChunks(
      docs: DataFrame,
      chunkSize: Int = TextSplit.DefaultChunkSize,
      overlap: Int = TextSplit.DefaultChunkOverlap): DataFrame = {
    val splitUdf = udf((s: String) =>
      if (s == null) Array.empty[String] else TextSplit.splitText(s, chunkSize, overlap).toArray)
    val paged = docs.columns.contains("page")
    val base = if (paged) docs else docs.withColumn("page", lit(1))
    base
      .withColumn("chunks", splitUdf(col("text")))
      .withColumn("total_chunks", size(col("chunks")))
      .select(
        col("doc_id").as("file_id"),
        col("source").as("source_file"),
        col("page"),
        col("total_chunks"),
        posexplode(col("chunks")).as(Seq("chunk_index", "chunk_text")))
      .withColumn("chunk_id",
        if (paged) concat(col("file_id"), lit("_p"), col("page"), lit("_"), col("chunk_index"))
        else concat(col("file_id"), lit("_"), col("chunk_index")))
  }

  /** SQL-expressible strided chunker: fixed `chunkSize` windows advancing
    * by `chunkSize - overlap`. The closed-form cousin of the recursive
    * splitter ([[splitIntoChunks]]): same chunk schema, but pure column
    * arithmetic (`sequence` + `transform` + `posexplode`, whole-stage
    * codegen, no UDF) and exactly reproducible in ANSI SQL — pipelines
    * built on it stay oracle-checkable end-to-end.
    */
  def chunkStrided(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "overlap must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    val len = length(col("text"))
    val n = when(len <= 0 || len.isNull, lit(0))
      .when(len <= chunkSize, lit(1))
      .otherwise(floor((len - chunkSize + stride - 1).cast("double") / stride).cast("int") + 1)
    val chunks = when(n <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), n - 1),
        i => col("text").substr(i * stride + 1, lit(chunkSize))))
    val paged = docs.columns.contains("page")
    val base = if (paged) docs else docs.withColumn("page", lit(1))
    base
      .withColumn("total_chunks", n)
      .select(
        col("doc_id").as("file_id"),
        col("source").as("source_file"),
        col("page"),
        col("total_chunks"),
        posexplode(chunks).as(Seq("chunk_index", "chunk_text")))
      .withColumn("chunk_id",
        if (paged) concat(col("file_id"), lit("_p"), col("page"), lit("_"), col("chunk_index"))
        else concat(col("file_id"), lit("_"), col("chunk_index")))
  }

  /** Open-schema chunk metadata (SURVEY §1.3 variant): Chroma metadata is
    * a free-form dict filtered by arbitrary keys (chroma_utils.py:119-125;
    * where={...} at :161,253). The engine's fixed chunk struct covers the
    * reference's own producers, which all write the same keys — this
    * MapType(String,String) variant is for loader-specific keys beyond
    * that set (a PDF producer string, an OCR confidence, ...), which
    * downstream filters address with `element_at` and no schema
    * migration. Extras whose value is NULL on a row are ABSENT from that
    * row's map (dict semantics: a loader that doesn't know a key doesn't
    * write it), so `element_at` on a missing key is NULL and filters fail
    * closed — exactly Chroma's where={key: v} behavior on documents
    * lacking the key.
    */
  def openMetadata(chunks: DataFrame, extras: (String, Column)*): DataFrame = {
    // Fail at call time, not at runtime inside the pipeline: an extras
    // key colliding with a base key would hit map_concat's default
    // mapKeyDedupPolicy=EXCEPTION mid-job. Callers overriding source/page
    // should project those columns instead.
    val clash = extras.map(_._1).toSet.intersect(Set("source", "page"))
    require(clash.isEmpty,
      s"extras may not shadow base metadata keys: ${clash.mkString(", ")}")
    val base = map(
      lit("source"), col("source_file"),
      lit("page"), col("page").cast("string"))
    val full =
      if (extras.isEmpty) base
      else map_concat(base,
        map(extras.flatMap { case (k, v) => Seq(lit(k), v.cast("string")) }: _*))
    chunks.withColumn("metadata", map_filter(full, (_, v) => v.isNotNull))
  }

  /** T-3: attach an embedding column to chunk rows. */
  def embedChunks(chunks: DataFrame, textCol: String = "chunk_text"): DataFrame =
    chunks.withColumn("embedding", HashEmbedder.embedCol(col(textCol)))

  /** Full ingest: validate+hash+dedup+split+embed over a raw documents table
    * with (doc_id, text, source, n_chars). Chunking parameters default to
    * the reference's config (1000/200, config.py:32-33) but are exposed so
    * short-document corpora can exercise real splitting.
    */
  def ingest(
      docs: DataFrame,
      catalog: DataFrame,
      chunkSize: Int = TextSplit.DefaultChunkSize,
      overlap: Int = TextSplit.DefaultChunkOverlap): DataFrame = {
    val validated = docs
      .withColumn("file_hash", contentHash(col("text")))
      .filter(validSize(col("n_chars")))
    val fresh = dedupGate(validated, catalog, "file_hash")
    embedChunks(splitIntoChunks(fresh, chunkSize, overlap))
  }
}
