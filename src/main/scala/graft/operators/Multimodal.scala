package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video travel as
  * opaque `BINARY` payloads with typed metadata; decode / feature-extract /
  * resize / frame-sample run per partition over iterator batches — the
  * Scala analog of a vectorized (Arrow-batched) UDF, and the reference's
  * block apply (`seqBlockApply`, /root/reference/R/Methods.R:690-769).
  *
  * The actual codec is STUBBED with a deterministic fake (this container
  * has no image/audio libraries): every derived value is a pure function of
  * the payload bytes, so tests — and the DuckDB oracle in
  * [[graft.queries.MultimodalQ]] — can verify the full pipeline shape
  * (schema, batching, partitioning) with exact expected values. Swapping
  * `decodeStub` for a real codec changes no plumbing.
  */
object Multimodal {

  /** One media row: payload + envelope metadata. */
  final case class MediaRow(doc_id: Long, media_type: String,
      payload: Array[Byte])

  /** Decoded/feature-extracted record (fake codec output). */
  final case class MediaFeature(doc_id: Long, media_type: String,
      n_bytes: Int, width: Int, height: Int, n_frames: Int,
      brightness: Double)

  /** The deterministic stand-in for a real decoder: "dimensions" from the
    * byte length, "brightness" = mean byte value. A real implementation
    * would decode `payload` here — signature and batch shape unchanged. */
  def decodeStub(r: MediaRow): MediaFeature = {
    val n = r.payload.length
    var s = 0L
    var i = 0
    while (i < n) { s += r.payload(i) & 0xff; i += 1 }
    MediaFeature(r.doc_id, r.media_type, n,
      width = n % 640 + 16, height = (n * 7) % 480 + 16,
      n_frames = n % 8 + 1,
      brightness = if (n > 0) s.toDouble / n else 0.0)
  }

  /** Media table synthesized from `documents` (no binary fixtures ship with
    * the testdata): payload = utf-8 bytes of the text, media_type cycles
    * through image/audio/video. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Partition-batched decode: one iterator pass per partition (the
    * mapInPandas/Arrow-batch shape in Scala terms). Narrow — no shuffle. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Uniform frame sampling over video rows: each video explodes into
    * `nFrames` (slot, timestamp, frame number) rows — the fan-out shape
    * a frame-extraction stage consumes (the decode itself is the
    * documented sandbox stub). Expects `duration_ms` and `fps` columns
    * (typed metadata travels WITH the binary column, so sampling plans
    * never touch the payload bytes); all arithmetic is integer division
    * — exactly replayable by any engine. Narrow explode, no shuffle. */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("duration_ms"), col("fps"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_slot"))
      .withColumn("frame_slot", col("frame_slot").cast("long"))
      .withColumn("ts_ms", expr(s"(frame_slot * duration_ms) div $nFrames"))
      .withColumn("frame_no", expr("(ts_ms * fps) div 1000"))

  /** Binary near-duplicate candidates WITHOUT decoding — the media
    * analog of MinHash banding: the payload splits into `blockLen`-byte
    * aligned content blocks, each md5-hashed, and two payloads pair iff
    * they share any (block index, hash) — catching re-uploads that
    * differ only past some offset (truncated tail, appended metadata).
    * Returns (doc_a, doc_b, shared_blocks, sim) with
    * sim = shared / max(block counts) — 1.0 ⇒ byte-identical.
    * One shuffle on the (index, hash) key; at pathological skew (a
    * corpus-wide shared prefix) the same per-bucket cap as the text
    * LSH join applies — not needed for content-addressed blocks, whose
    * buckets are near-dup groups by construction. */
  def blockNearDup(media: DataFrame, blockLen: Int = 64): DataFrame = {
    val n = media.select(col("doc_id"), col("payload"))
      .withColumn("__nb",
        ceil(length(col("payload")).cast("double") / blockLen)
          .cast("long"))
      .filter(col("__nb") > 0)
    val chunks = n
      .select(col("doc_id"), col("__nb"), col("payload"),
        explode(sequence(lit(0L), col("__nb") - 1)).as("__i"))
      .select(col("doc_id"), col("__nb"), col("__i"),
        md5(expr(s"substring(payload, __i * $blockLen + 1, $blockLen)"))
          .as("__h"))
    chunks.as("a").join(chunks.as("b"),
        col("a.__i") === col("b.__i") && col("a.__h") === col("b.__h") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_blocks"),
        max(col("a.__nb")).as("__na"), max(col("b.__nb")).as("__nb2"))
      .select(col("doc_a"), col("doc_b"), col("shared_blocks"),
        (col("shared_blocks").cast("double") /
          greatest(col("__na"), col("__nb2"))).as("sim"))
  }
}
