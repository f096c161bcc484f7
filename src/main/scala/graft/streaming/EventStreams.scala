package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured-Streaming surface — the reference's unimplemented roadmap item
  * (Pub/Sub streaming, `/root/reference/README.md:246`; SURVEY.md §2.J)
  * realized on Spark: watermarked tumbling windows and session windows over
  * the events table, plus the batch-equivalent transforms (used by the
  * oracle-checked queries so batch and stream share one definition).
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour window counts per event type — batch/stream shared. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))

  /** Session windows (30-minute gap) per user — Spark's native
    * session_window (state cleaned by the watermark in streaming mode). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Custom keyed state via `flatMapGroupsWithState` — the shape the
    * reference's roadmap streaming would need for cross-event logic:
    * per-user running totals with an anomaly flag when a value exceeds
    * `factor`× the user's running mean. State is one (count, sum) pair per
    * user; in streaming mode a GroupStateTimeout would expire idle users.
    * Works identically over a bounded Dataset (tested) and a stream.
    */
  def runningAnomalies(spark: SparkSession, events: DataFrame, factor: Double = 3.0): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val typed = events.select(col("user_id"), col("event_id"), col("value"))
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double, Double, Boolean)](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) { case (userId, rows, state) =>
        var (n, sum) = state.getOption.getOrElse((0L, 0.0))
        // deterministic order within the group so the running mean is stable.
        // STRICT map: a lazy iterator would defer the n/sum mutations past
        // the state.update below, persisting stale state.
        val out = rows.toSeq.sortBy(_._2).map { case (_, eventId, v) =>
          val mean = if (n == 0) v else sum / n
          val anomalous = n > 0 && v > factor * mean
          n += 1; sum += v
          (userId, eventId, v, mean, anomalous)
        }
        state.update((n, sum))
        out.iterator
      }
      .toDF("user_id", "event_id", "value", "running_mean", "anomalous")
  }

  /** Run [[tumblingCounts]] as a real streaming query over a parquet file
    * source with a 10-minute watermark, into an in-memory sink. Returns the
    * started query; callers `processAllAvailable()` then read table `name`.
    * (File source replays the batch data as a stream — the standard local
    * harness for streaming semantics.)
    */
  def startTumblingStream(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    // The raw events.parquet carries TIMESTAMP(NANOS); streaming reuses the
    // same nanosAsLong read path as Tables.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(StructType(eventSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = LongType) else f)))
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    tumblingCounts(raw.withWatermark("ts", "10 minutes"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
  }
}
