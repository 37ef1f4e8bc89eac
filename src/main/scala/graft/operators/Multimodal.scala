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
}
