package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.functions.Similarity

/** ONLINE ANN SERVING — the streaming face of the index lifecycle: query
  * vectors arrive as a stream and are served against a BUILT (artifact-
  * cached) IVF-PQ index via `foreachBatch`, each micro-batch running the
  * IDENTICAL batch serving plan (broadcast probes + broadcast ADC tables
  * against the unshuffled cached index — zero training jobs, zero
  * index scans beyond cache). Per-query independence makes the union of
  * micro-batch results equal batch serving over the same query set row
  * for row — StreamingSpec pins stream ≡ batch across multi-batch input.
  *
  * At scale this is the retrieval serving tier: the index artifacts are
  * built offline ([[Similarity.buildIvfPqIndex]]) or loaded
  * ([[Similarity.loadIvfPqIndex]]), stay resident across micro-batches,
  * and each trigger pays only |batch|·(probes + ADC) work. The demo sink
  * appends parquet per micro-batch; foreachBatch is at-least-once under
  * retries, so a production sink should write epoch-keyed paths or an
  * idempotent upsert (the pattern `EventStreams`' PNG sink demonstrates).
  */
object AnnServing {

  private val querySchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Serve a file-source stream of query vectors under `queryDir` against
    * `index`, appending `(q_id, rank, c_id, cos)` parquet to `outDir`.
    * `maxFilesPerTrigger = 1` makes each staged file its own micro-batch
    * (the spec uses this to prove multi-batch composition). */
  def startServingStream(spark: SparkSession, queryDir: String,
      index: Similarity.IvfPqIndex, k: Int, nProbe: Int, outDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .schema(querySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(queryDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.ivfPqTopKIndexed(batch, index, k, nProbe)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
}
