package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded "frame"/feature record produced by the stub decoder. */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    n_frames: Int,
    mean_byte: Double,
    byte_histogram: Array[Long])

/** Multimodal-column plumbing (north-star extension): media payloads as
  * opaque `binary` columns with typed metadata, and a batch
  * decode/feature-extract pass over them.
  *
  * No image/audio codecs exist in this container, so the *decode* step
  * is a clearly-marked deterministic STUB (byte statistics stand in for
  * pixels/samples); everything around it — the binary+struct schema, the
  * partition-parallel `mapPartitions` batch shape, the explode-to-frames
  * layout — is the real Spark plumbing a codec UDF would drop into.
  *
  * Payloads are synthesized from `documents.text` (utf-8 bytes) so the
  * pipeline is reproducible against the driver's tables; at production
  * scale the payload column comes from the lake and everything below is
  * unchanged.
  */
object Multimodal {

  val FrameStride = 256

  /** The media table: binary payload + struct metadata. This is the
    * storage schema: payload stays opaque, metadata is columnar and
    * prunable (a reader that needs only `meta.n_bytes` never touches
    * payload bytes).
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col("source").as("origin")).as("meta"))

  /** Metadata-only scan — must not read payload bytes (column pruning
    * through the struct). Oracle-checked.
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.media_type").as("media_type"),
      col("meta.origin").as("origin"))

  /** Batch decode/feature-extract via typed mapPartitions: one decoder
    * instantiation per partition (the real-codec pattern — open the
    * decoder once, stream records through it).
    */
  def decodeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir)
      .select(col("doc_id"), col("payload"), col("meta.media_type").as("media_type"))
      .as[(Long, Array[Byte], String)]
    val decoded: Dataset[MediaFeatures] = media.mapPartitions { it =>
      // STUB DECODER: a real implementation opens the image/audio codec
      // here (per partition) and replaces the byte statistics below with
      // pixel/sample features. Deterministic byte stats keep the
      // pipeline testable without codecs in the container.
      it.map { case (id, payload, mtype) =>
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < payload.length) {
          val b = payload(i) & 0xff
          hist(b >> 4) += 1
          sum += b
          i += 1
        }
        MediaFeatures(
          doc_id = id,
          media_type = mtype,
          n_bytes = payload.length.toLong,
          n_frames = (payload.length + FrameStride - 1) / FrameStride,
          // exact 4dp truncation via integer math — bit-reproducible in
          // any engine (no float accumulation, no rounding-mode delta)
          mean_byte = if (payload.length == 0) 0.0
            else (sum * 10000 / payload.length).toDouble / 10000,
          byte_histogram = hist)
      }
    }
    decoded.toDF()
  }

  /** Driver-facing projection of [[decodeFeatures]]: the histogram array
    * serialized to CSV so every column is a hashable scalar (the
    * correctness harness canonicalizes rows by sorting — array cells
    * aren't comparable there).
    */
  def decodeFeaturesFlat(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(spark, sfDir).withColumn(
      "byte_histogram",
      concat_ws(",", col("byte_histogram").cast("array<string>")))

  /** Frame sampling: one row per FrameStride-byte "frame" with its
    * leading byte — the explode layout a video frame-sampler produces
    * (frame index + decoded frame payload).
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), ((col("n_bytes") - 1) / FrameStride).cast("int"))))
      .select(
        col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * FrameStride).cast("long").as("byte_offset"),
        // STUB frame content: first byte of the frame window
        ascii(col("payload").cast("string")
          .substr(col("frame_idx") * FrameStride + 1, lit(1))).cast("long").as("head_byte"))

  val ResizeStride = 4

  /** Resize/downsample stub: nearest-neighbor stride sampling of the
    * payload (every `ResizeStride`-th byte) — the 1-D stand-in for an
    * image thumbnailer. Emits the resampled payload's digest + sizes,
    * never the bytes, so the result stays compact and hashable; a real
    * codec drops into the same per-row transform.
    */
  def resize(spark: SparkSession, sfDir: String): DataFrame =
    // empty payloads are skipped on both engines: Spark's sequence(1, 0)
    // throws where DuckDB's range(1, 1) yields an empty list
    Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 1).selectExpr(
      "doc_id",
      "CAST(length(text) AS BIGINT) AS orig_bytes",
      s"CAST(size(sequence(1, length(text), $ResizeStride)) AS BIGINT) AS thumb_bytes",
      s"""md5(concat_ws('', transform(sequence(1, length(text), $ResizeStride),
         |  i -> substr(text, i, 1)))) AS thumb_hash""".stripMargin)

  /** Cross-modal join: documents ⋈ embeddings on id — the link step of
    * any multimodal pipeline (text row ↔ its vector). Grouped stats are
    * integer-only (count, char sum) so parallel aggregation order can't
    * shift anything.
    */
  def docEmbedJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir),
        col("doc_id") === col("vec_id"))
      .groupBy(col("label"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_resize" -> (resize(_, _)),
    "mm_doc_embed_join" -> (docEmbedJoin(_, _)),
    "mm_media_meta" -> (mediaMeta(_, _)),
    "mm_decode_features" -> (decodeFeaturesFlat(_, _)),
    "mm_frame_sample" -> (frameSample(_, _)))

  /** All three are oracle-checked. The decode stub's byte statistics are
    * SQL-expressible because the synthesized payload is utf-8 of ASCII
    * text, so char positions equal byte offsets and `ascii(substr(...))`
    * equals the raw byte value.
    */
  val oracles: Map[String, String] = Map(
    "mm_doc_embed_join" ->
      """SELECT label, lang, count(*) AS n_docs,
        | CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY label, lang""".stripMargin,
    "mm_resize" ->
      s"""SELECT doc_id,
         | CAST(length(text) AS BIGINT) AS orig_bytes,
         | CAST(len(range(1, length(text) + 1, $ResizeStride)) AS BIGINT) AS thumb_bytes,
         | md5(array_to_string(list_transform(range(1, length(text) + 1, $ResizeStride),
         |   i -> substr(text, i, 1)), '')) AS thumb_hash
         |FROM documents WHERE length(text) >= 1""".stripMargin,
    "mm_decode_features" ->
      s"""WITH bytes AS (
         |  SELECT doc_id, ascii(substr(text, i + 1, 1)) AS code
         |  FROM (SELECT doc_id, text,
         |          unnest(range(octet_length(encode(text)))) AS i
         |        FROM documents)
         |), stats AS (
         |  SELECT doc_id, count(*) AS n, sum(code) AS s
         |  FROM bytes GROUP BY doc_id
         |), hist AS (
         |  SELECT d.doc_id,
         |    string_agg(CAST(coalesce(c.cnt, 0) AS VARCHAR), ',' ORDER BY b.bucket)
         |      AS byte_histogram
         |  FROM documents d
         |  CROSS JOIN (SELECT unnest(range(16)) AS bucket) b
         |  LEFT JOIN (SELECT doc_id, code // 16 AS bucket, count(*) AS cnt
         |             FROM bytes GROUP BY 1, 2) c
         |    ON c.doc_id = d.doc_id AND c.bucket = b.bucket
         |  GROUP BY d.doc_id
         |)
         |SELECT d.doc_id,
         |  CASE WHEN d.doc_id % 3 = 0 THEN 'image'
         |       WHEN d.doc_id % 3 = 1 THEN 'audio'
         |       ELSE 'video' END AS media_type,
         |  octet_length(encode(d.text)) AS n_bytes,
         |  CAST((octet_length(encode(d.text)) + ${FrameStride - 1}) // $FrameStride AS INT) AS n_frames,
         |  CASE WHEN coalesce(st.n, 0) = 0 THEN 0.0
         |       ELSE CAST((st.s * 10000) // st.n AS DOUBLE) / 10000 END AS mean_byte,
         |  h.byte_histogram
         |FROM documents d
         |LEFT JOIN stats st ON st.doc_id = d.doc_id
         |JOIN hist h ON h.doc_id = d.doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""SELECT doc_id,
         | CAST(frame_idx AS BIGINT) AS frame_idx,
         | CAST(frame_idx * $FrameStride AS BIGINT) AS byte_offset,
         | CAST(ascii(substr(text, frame_idx * $FrameStride + 1, 1)) AS BIGINT) AS head_byte
         |FROM (
         |  SELECT doc_id, text,
         |    unnest(range((octet_length(encode(text)) + ${FrameStride - 1}) // $FrameStride)) AS frame_idx
         |  FROM documents) t""".stripMargin,
    "mm_media_meta" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS n_bytes,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio'
        |      ELSE 'video' END AS media_type,
        | source AS origin
        |FROM documents""".stripMargin)
}
