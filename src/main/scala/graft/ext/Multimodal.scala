package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.QueryDef.{sql => q}

/** Multimodal column plumbing: media as opaque `binary` columns plus typed
  * metadata, with decode/feature-extraction as a per-partition batch stage.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC FAKE (clearly marked below) — but everything Spark-side is
  * real and tested: the schema, the binary column handling, the partition
  * batching shape (`mapPartitions` over a typed Dataset — the JVM analog of
  * `mapInPandas` batch UDFs), and the downstream feature columns.
  *
  * Scale notes: media bytes never enter a shuffle — metadata extraction is
  * row-local, and the decode stage is a narrow transformation; only the small
  * feature vectors flow onward. Frame sampling multiplies rows, not bytes.
  */
object Multimodal {

  /** One media object: payload + typed metadata. */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features (what a real decoder would emit per media object). */
  final case class MediaFeatures(doc_id: Long, kind: String, byte_len: Long,
                                 checksum: Long, width: Int, height: Int, n_frames: Int)

  /** Build a media table from `documents`: payload = utf8 bytes of the text
    * (a stand-in corpus of binary blobs), kind round-robins image/audio/video. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("payload"))

  /** STUB DECODER — deterministic fake standing in for image/audio decode.
    * A real deployment swaps this body for the codec call; the signature and
    * the partition-batch driver below are the production shape. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val len = r.payload.length.toLong
    var checksum = 0L
    var i = 0
    while (i < r.payload.length) { checksum = (checksum * 131 + (r.payload(i) & 0xff)) & 0xffffffffL; i += 1 }
    MediaFeatures(r.doc_id, r.kind, len, checksum,
      width = (len % 640).toInt + 1, height = (len % 480).toInt + 1,
      n_frames = (len / 100).toInt + 1)
  }

  /** Partition-batched decode: one iterator pass per partition (codec init
    * amortized across the batch — the point of mapInPandas-style batching). */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it => it.map(decodeStub) }
  }

  /** Oracle-checked half: binary metadata that SQL can reproduce
    * (byte length + derived dims); proves the binary column plumbing. */
  val qMultimodalMeta: QueryDef = q("q_multimodal_meta")(
    """SELECT doc_id,
      |       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
      |       CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INTEGER) AS width,
      |       CAST(octet_length(CAST(text AS BLOB)) % 480 + 1 AS INTEGER) AS height,
      |       CAST(octet_length(CAST(text AS BLOB)) // 100 + 1 AS INTEGER) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    mediaTable(Tables.documents(s, d))
      .select(col("doc_id"), col("kind"),
        length(col("payload")).cast(LongType).as("byte_len"),
        (length(col("payload")) % 640 + 1).cast(IntegerType).as("width"),
        (length(col("payload")) % 480 + 1).cast(IntegerType).as("height"),
        floor(length(col("payload")) / 100).cast(IntegerType).plus(1).cast(IntegerType).as("n_frames"))
      .orderBy("doc_id")
  }

  /** Stub-decoded features via the typed mapPartitions path. Fully
    * oracle-checked: the 131-rolling checksum over the payload bytes IS
    * SQL-expressible — DuckDB folds the blob's bytes (hex + nibble lookup →
    * byte list, `list_reduce` for the rolling product; `% 2^32` twins the
    * `& 0xffffffff` since the accumulator never goes negative). */
  val qMultimodalDecode: QueryDef = q("q_multimodal_decode")(
    """WITH b AS (SELECT doc_id,
      |                  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |                  hex(encode(text)) AS h,
      |                  CAST(octet_length(encode(text)) AS BIGINT) AS len
      |           FROM documents)
      |SELECT doc_id, kind, len AS byte_len,
      |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |              list_transform(range(0, len), i ->
      |                CAST((strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS BIGINT), 1)) - 1) * 16
      |                   + (strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS BIGINT), 1)) - 1) AS BIGINT))),
      |            (acc, byt) -> (acc * 131 + byt) % 4294967296) AS BIGINT) AS checksum,
      |       CAST(len % 640 + 1 AS INTEGER) AS width,
      |       CAST(len % 480 + 1 AS INTEGER) AS height,
      |       CAST(len // 100 + 1 AS INTEGER) AS n_frames
      |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
    decodeAll(s, mediaTable(Tables.documents(s, d))).toDF().orderBy("doc_id")
  }

  /** Frame sampling: one output row per sampled frame offset — row expansion
    * without byte duplication (offsets only). */
  val qFrameSample: QueryDef = q("q_frame_sample")(
    """SELECT doc_id, CAST(u.f AS INTEGER) AS frame_offset
      |FROM documents, UNNEST(range(0, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT), 100)) AS u(f)
      |ORDER BY doc_id, frame_offset""".stripMargin) { (s, d) =>
    mediaTable(Tables.documents(s, d))
      .select(col("doc_id"),
        explode(sequence(lit(0), length(col("payload")) - 1, lit(100))).as("frame_offset"))
      .select(col("doc_id"), col("frame_offset").cast(IntegerType))
      .orderBy("doc_id", "frame_offset")
  }

  val defs: Seq[QueryDef] = Seq(qMultimodalMeta, qMultimodalDecode, qFrameSample)
}
