package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2): media as opaque BINARY
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side machinery is real — schema, partition batching,
  * struct metadata, and a typed mapPartitions stage (the Scala analogue
  * of a Pandas-UDF `mapInPandas` batch loop). The codec itself is a
  * clearly-marked deterministic STUB (this container has no image/audio
  * libraries): "decode" derives a fake feature vector from the bytes.
  * Swapping `stubDecode` for a real JNI/library call changes nothing
  * about the distributed plan.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            width: Int, height: Int)
  final case class Decoded(doc_id: Long, n_bytes: Int,
                           mean_byte: Double, feature: Array[Double])

  /** STUB codec: real decoders (JPEG/PNG/audio frames) plug in here. */
  def stubDecode(payload: Array[Byte]): (Double, Array[Double]) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xFF; i += 1 }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    // fake 4-dim "embedding": byte histogram quarters
    val feat = new Array[Double](4)
    i = 0
    while (i < payload.length) {
      feat((payload(i) & 0xFF) / 64) += 1.0; i += 1
    }
    (mean, feat)
  }

  /** Build a media table: text bytes stand in for image payloads, with
    * metadata struct carried alongside (as a real pipeline would carry
    * EXIF/container info). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.load(s, dir, "documents")).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("n_chars").cast("int").as("width"),
      lit(1).cast("int").as("height"))

  /** Batch decode via typed mapPartitions — one codec init per
    * partition (the expensive part with real codecs), then a streaming
    * loop over the rows, exactly the mapInPandas batch shape. */
  def decodeAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow]
      .mapPartitions { rows =>
        // real pipeline: init codec/library context here, once
        rows.map { r =>
          val (mean, feat) = stubDecode(r.payload)
          Decoded(r.doc_id, r.payload.length, mean, feat)
        }
      }
      .toDF()
  }

  def mmPipeline(s: SparkSession, dir: String): DataFrame =
    decodeAll(s, dir)
      .select(col("doc_id"), col("n_bytes"),
        col("mean_byte"), col("feature")(0).as("f0"), col("feature")(3).as("f3"))
      .orderBy("doc_id")

  // n_bytes is byte length of UTF-8 text (ASCII here → equals n_chars);
  // mean_byte / histogram are reproducible in SQL via ord(); keep the
  // oracle to the structural columns, the codec output is spec-tested.
  val mmPipelineSql: String = """
    SELECT doc_id,
      CAST(strlen(text) AS INTEGER) AS n_bytes
    FROM documents ORDER BY doc_id"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("mm_pipeline", mmPipeline, None))
}
