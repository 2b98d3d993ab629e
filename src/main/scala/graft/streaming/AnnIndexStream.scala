package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.similarity.{Ann, Pq}

/** Incremental ANN index maintenance — the streaming half of the
  * packed-index serving shape ([[graft.similarity.Pq.ivfAdcTopKPacked]]).
  *
  * The 100 TB ingest contract: the codebook and coarse centroids are
  * TRAINED ONCE on a bootstrap corpus and then FROZEN (standard PQ
  * serving practice — retraining would re-encode the world); every
  * arriving embedding batch is encoded with the frozen codebook (a
  * narrow broadcast-join map, no shuffle of anything corpus-sized),
  * assigned to its nearest frozen coarse list, packed to one
  * `(vec_id, list, codevec)` row, and appended to the index — which is
  * exactly the layout [[graft.similarity.Pq.ivfAdcTopKPacked]] serves
  * from with zero per-query encode work.
  *
  * Idempotence is the SegmentDedupStream contract: each micro-batch
  * INSERT OVERWRITEs its own `batch=<id>` directory, so a crash-replayed
  * batch rewrites byte-identical output instead of duplicating rows.
  * Because the codebook is frozen, encoding is deterministic per vector
  * and the streamed index is row-identical to a batch rebuild over the
  * same vectors — `AnnIndexStreamSpec` asserts both properties.
  */
object AnnIndexStream {

  /** Minimal arriving-embedding schema (extra columns are ignored). */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Encode + assign + pack one batch of vectors against the frozen
    * codebook and coarse centroids — shared by the stream below and the
    * spec's batch-rebuild reference.
    */
  def packBatch(
      batch: DataFrame,
      cents: DataFrame,
      listCents: DataFrame,
      listCol: String,
      dim: Int,
      m: Int): DataFrame = {
    val assigned = Ann
      .assign(batch, listCents, "vec_id", "embedding", listCol)
      .select(col("vec_id"), col(listCol))
    Pq.packCodes(Pq.encode(batch, cents, "vec_id", "embedding", dim, m), "vec_id")
      .join(assigned, Seq("vec_id"))
      .select(col("vec_id"), col(listCol), col("codevec"))
  }

  /** Start the index-maintenance stream over a parquet drop directory.
    * `indexDir` accumulates one `batch=<id>` directory per micro-batch;
    * read the whole index with `spark.read.parquet(indexDir)`.
    */
  def run(
      spark: SparkSession,
      dropDir: String,
      indexDir: String,
      checkpoint: String,
      cents: DataFrame,
      listCents: DataFrame,
      listCol: String,
      dim: Int,
      m: Int,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .schema(embSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dropDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        packBatch(batch, cents, listCents, listCol, dim, m)
          .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
