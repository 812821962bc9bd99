package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * columns with typed metadata, decoded/featurized inside executors.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic fake — but the Spark-side plumbing is
  * real: binary columns, per-partition batch processing with no
  * driver materialization, a typed output schema, and metadata that
  * flows through ordinary columnar ops. Swapping the stub for a real
  * codec (JNI/javax.imageio) changes one function body, not the plan.
  */
object Multimodal {

  /** Typed feature row a real decoder would emit per media blob. */
  case class MediaFeature(doc_id: Long, width: Int, height: Int,
                          n_bytes: Int, mean_byte: Double)

  /** Documents re-cast as a media table: (doc_id, content binary,
    * media_type). On a real pipeline this is the schema images/audio
    * arrive in (bytes + mime + source metadata). */
  def asMediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast(BinaryType).as("content"),
        lit("text/plain").as("media_type"))

  /** STUB decoder (no codec libs in this container): deterministic fake
    * "decode" deriving dimensions and a mean-intensity from the raw
    * bytes. Runs via `mapPartitions` — the executor-side batch shape a
    * real decoder needs (amortize codec init per partition, stream rows,
    * never collect). */
  def decodeStub(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // A real implementation would initialize the codec once here.
        it.map { case (id, bytes) =>
          // ??? real image/audio decode goes here; deterministic fake:
          val n = bytes.length
          MediaFeature(id, n % 640, (n * 7) % 480, n,
            if (n == 0) 0.0 else bytes.map(_ & 0xff).sum.toDouble / n)
        }
      }
  }

  /** Oracle-checkable metadata query over the binary content: byte
    * length, content hash, and the stub-decoder dimensions expressed as
    * native columnar functions (codegen'd, pruned to the two columns
    * read).
    */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    asMediaTable(spark, sfDir)
      .select(col("doc_id"),
        length(col("content")).as("n_bytes"),
        sha2(col("content"), 256).as("sha256_hex"),
        (length(col("content")) % 640).as("fake_width"),
        ((length(col("content")) * 7) % 480).as("fake_height"),
        (length(col("content")) % 16 + 1).as("fake_frames"))
      .orderBy("doc_id")
}
