package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Q, Tables}

/** Multimodal-column plumbing (SURVEY.md §2.D): media payloads travel as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * runs batched per partition. The decode step itself is a STUB — this
  * container has no image/audio codecs — but everything Spark-side
  * (schema, typed Dataset boundary, partition batching, feature
  * signature) is real and tested; a real decoder drops into
  * [[decodeStub]] without touching the plan.
  *
  * The fixtures have no binary table, so document text bytes stand in as
  * the payload (cast string→binary), exactly as an image-bytes column
  * would arrive from parquet.
  */
object Multimodal {

  /** Typed row for the feature-extraction stage. `thumb` is the resize
    * stub's fixed-width output; `n_frames` the frame-sample count. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      mean_byte: Double,
      head_bytes: Array[Byte],
      histo16: Array[Long],
      thumb: Array[Byte],
      n_frames: Int)

  /** Container-format sniffing by magic bytes — NOT a stub: format
    * detection needs no codec, just the header, so this is the real
    * production operator (route payloads to the right decoder, reject
    * mislabeled media before wasting decode CPU). Pure built-in column
    * expressions (substring + hex + when-chain), codegen-friendly, no
    * UDF. Covers the containers a crawl actually yields; anything else
    * is "unknown", null is "empty". */
  def sniffMedia(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = hex(substring(payload, 1, 12)) // first 12 bytes as uppercase hex
    when(payload.isNull, "empty")
      .when(h.startsWith("89504E47"), "png")
      .when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("47494638"), "gif")
      .when(h.startsWith("25504446"), "pdf")
      // RIFF....WAVE — chunk id at offset 0, format tag at offset 8
      .when(h.startsWith("52494646") &&
        substring(h, 17, 8) === lit("57415645"), "wav")
      .when(h.startsWith("1A45DFA3"), "webm")
      .when(h.startsWith("4F676753"), "ogg")
      // MP4-family: "ftyp" brand at byte offset 4
      .when(substring(h, 9, 8) === lit("66747970"), "mp4")
      .otherwise("unknown")
  }

  /** STUB resize: a real implementation decodes + bilinear-resamples;
    * the stub keeps the contract (arbitrary bytes in, fixed-width bytes
    * out) by striding the payload down to `width` bytes. */
  def resizeStub(payload: Array[Byte], width: Int = 16): Array[Byte] = {
    if (payload.isEmpty) new Array[Byte](width)
    else Array.tabulate(width)(i => payload((i.toLong * payload.length / width).toInt))
  }

  /** STUB frame sampler: a real implementation seeks container keyframes;
    * the stub chunks the payload into fixed-size pseudo-frames and
    * reports how many a stride-`stride` sample would visit. */
  def frameSampleStub(payload: Array[Byte], frameSize: Int = 64,
      stride: Int = 4): Int = {
    val frames = (payload.length + frameSize - 1) / frameSize
    (frames + stride - 1) / stride
  }

  /** STUB decoder: deterministic per-payload "features" (byte stats +
    * 16-bin histogram + 4-byte frame sample). A real implementation
    * would decode the media container here; the signature — bytes in,
    * fixed-width features out, no per-row session state — is the
    * contract a distributed decode needs. */
  def decodeStub(docId: Long, payloadOrNull: Array[Byte]): MediaFeatures = {
    // null payloads (null source column) decode as EMPTY media (zeros),
    // which keeps the task alive; note this differs from q33's null-safe
    // built-ins, which would yield NULL metadata for the same row
    val payload =
      if (payloadOrNull == null) Array.emptyByteArray else payloadOrNull
    val histo = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      histo(b >> 4) += 1
      sum += b
      i += 1
    }
    MediaFeatures(
      docId,
      payload.length,
      if (payload.length == 0) 0.0 else sum.toDouble / payload.length,
      payload.take(4),
      histo,
      resizeStub(payload),
      frameSampleStub(payload))
  }

  /** q33 — metadata pass over the binary column: pure built-in
    * expressions, oracle-checked (byte length + content hash). */
  val q33: Q = Q(
    "q33_multimodal_meta",
    run = { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"))
    },
    oracle = Some("""
      SELECT doc_id,
        CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        md5(text) AS payload_md5
      FROM documents"""))

  /** q34 — feature extraction through the typed partition-batched path
    * (the `mapPartitions` seam where a real decoder plugs in). Output is
    * flattened to SQL types so downstream relational ops compose. */
  val q34: Q = Q(
    "q34_multimodal_features",
    run = { (spark, dir) =>
      import spark.implicits._
      val payloads = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[(Long, Array[Byte])]
      payloads
        .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
        .select(col("doc_id"), col("n_bytes"), col("mean_byte"),
          hex(col("head_bytes")).as("head_hex"),
          // rendered as a scalar, not array<long>: the driver gate's
          // pandas canonicalizer sorts every output column, and numpy
          // arrays are unhashable/unsortable there
          concat_ws(",", col("histo16")).as("histo16_csv"),
          hex(col("thumb")).as("thumb_hex"),
          col("n_frames"))
    },
    oracle = None)

  val all: Seq[Q] = Seq(q33, q34)
}
