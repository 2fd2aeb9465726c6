package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.12): image/audio/video as
  * opaque BINARY columns with typed metadata, processed per-partition
  * in batch shape — the Scala analogue of a Pandas-UDF `mapInPandas`
  * stage (typed `Dataset.mapPartitions`: one iterator per partition,
  * so per-batch setup like codec init happens once per partition, not
  * per row).
  *
  * The DECODE STEP IS A STUB: this container ships no image/audio
  * codecs, so [[Multimodal.decodeStub]] substitutes a deterministic
  * fake (16-bin byte histogram). Everything around it — the schema,
  * the partition-batched execution, frame sampling, resize, feature
  * extraction signatures — is the real Spark-side plumbing a
  * production pipeline would keep while swapping the stub for a codec.
  */
object Multimodal {

  /** Opaque payload + typed metadata — the layout a 100 TB multimodal
    * lakehouse table would use (payload pruned unless selected). */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           histogram: Array[Long], frames_sampled: Int,
                           checksum: Long)

  /** STUB — stands in for a codec decode (e.g. JPEG → pixel array).
    * Deterministic: 16-bin histogram over payload bytes. */
  def decodeStub(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1L; i += 1 }
    hist
  }

  /** Frame sampling: treat the payload as fixed-size frames, keep every
    * `stride`-th — the shape of video keyframe extraction. */
  def sampleFrames(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
    payload.grouped(frameSize).zipWithIndex
      .collect { case (f, i) if i % stride == 0 => f }.toSeq

  /** Resize: downsample a histogram 16 → `bins` (the stand-in for
    * image resize: aggregate fixed input cells into output cells). */
  def resize(hist: Array[Long], bins: Int): Array[Long] = {
    val out = new Array[Long](bins)
    val ratio = hist.length / bins
    var i = 0
    while (i < hist.length) { out(i / ratio) += hist(i); i += 1 }
    out
  }

  /** The mapInPandas-analogue stage: per-partition batched feature
    * extraction over the opaque payload column. */
  def extractFeatures(media: Dataset[MediaRow], frameSize: Int = 64,
                      stride: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition (per-batch) setup happens here, once — in a real
      // pipeline this is codec/context initialization
      rows.map { r =>
        val frames = sampleFrames(r.payload, frameSize, stride)
        val hist = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, hist,
                      frames.length,
                      java.util.Arrays.hashCode(r.payload).toLong)
      }
    }
  }

  /** Demo source: wraps documents as fake media rows (text bytes as
    * payload) so the plumbing is drivable against the testdata. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
              col("text").cast("binary").as("payload"),
              lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))
      .as[MediaRow]
  }
}
