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

  // All value sums below aggregate in DECIMAL(18,6): decimal addition is
  // exact and associative, so the merged total is bit-identical whatever
  // order partitions (or micro-batches) combine in — a raw double Σ can
  // flip its 6th decimal with partition order and break the driver gate.

  /** Tumbling 1-hour window counts per event type — batch/stream shared. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6).as("sum_value"))

  /** Sliding 1-hour windows every 30 minutes per event type — the third
    * window kind beside tumbling (w1) and session (w2). Each event lands
    * in length/slide = 2 overlapping windows; Spark's `window(ts, len,
    * slide)` expands them at the scan (a 2× Generate, map-side), then the
    * aggregation partial-combines as usual — no self-join of the stream
    * against a window table. Batch/stream shared definition.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").getField("start").as("w_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6).as("sum_value"))

  /** STREAM–STATIC JOIN: enrich the event stream with a static dimension
    * (nation, keyed on `user_id mod 25`) and aggregate per nation name —
    * the lookup-table enrichment every production stream runs. In
    * streaming mode Spark re-reads/broadcasts the static side per
    * micro-batch with NO join state (unlike stream-stream w4); the batch
    * form is the same definition, so the oracle gates both.
    */
  def typeCountsByNation(events: DataFrame, nation: DataFrame): DataFrame =
    events
      .withColumn("__nkey", pmod(col("user_id"), lit(25L)))
      .join(nation.select(col("n_nationkey").as("__nkey"), col("n_name")), "__nkey")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6).as("sum_value"))

  /** Session windows (30-minute gap) per user — Spark's native
    * session_window (state cleaned by the watermark in streaming mode). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6).as("sum_value"))
      .select(col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming EXACT-DEDUP (at-least-once ingest repair): duplicate
    * deliveries are dropped on `event_id` before a per-type aggregation.
    * Batch/stream shared definition; the aggregates are chosen to be
    * ORDER-INDEPENDENT AND EXACT (counts, distinct counts, min/max) so the
    * result is bit-stable whichever duplicate copy survives and in
    * whatever order partitions merge.
    *
    * `withinWatermark = true` uses `dropDuplicatesWithinWatermark` — the
    * form a 24/7 stream needs: dedup state is EVICTED once the watermark
    * passes an event's timestamp, so state size is bounded by the
    * redelivery horizon instead of growing with every event ever seen
    * (plain `dropDuplicates` state is unbounded on a stream). On batch
    * input both forms are plain exact dedup.
    */
  def dedupedTypeCounts(events: DataFrame, withinWatermark: Boolean = false): DataFrame = {
    val deduped =
      if (withinWatermark) events.dropDuplicatesWithinWatermark("event_id")
      else events.dropDuplicates("event_id")
    deduped.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        // count_distinct doesn't stream; min/max are exact, order-free,
        // and any failed dedup shows up in n
        max(col("event_id")).as("max_event_id"),
        round(min(col("value")), 6).as("min_value"),
        round(max(col("value")), 6).as("max_value"))
  }

  /** File-source event stream with `ts` normalized to TimestampType, same
    * contract as [[graft.sources.Tables.events]]. The streaming source needs
    * an explicit schema, so peek at one parquet footer (a batch read plans
    * nothing) to learn which generation of the events layout is on disk:
    * TIMESTAMP(NANOS) → read as long, integer-truncate to µs;
    * TIMESTAMP(MICROS) untagged → TIMESTAMP_NTZ, cast (UTC session tz). */
  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = spark.read.parquet(dir).schema("ts").dataType
    val readType = if (onDisk.typeName == "long") LongType else onDisk
    val raw = spark.readStream
      .schema(StructType(eventSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = readType) else f)))
      .parquet(dir)
    readType.typeName match {
      case "long"          => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _               => raw
    }
  }

  /** Run [[dedupedTypeCounts]] as a real streaming query (file source →
    * watermark → within-watermark dedup → aggregation → memory sink).
    * Callers `processAllAvailable()` then read table `name`. */
  def startDedupStream(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val raw = eventStream(spark, dir)
    dedupedTypeCounts(raw.withWatermark("ts", "10 minutes"), withinWatermark = true)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
  }

  /** STREAM-STREAM INTERVAL JOIN (click→view attribution): each click
    * pairs with the same user's views in the preceding `horizon`
    * (inclusive both ends). Batch/stream shared definition — in batch it
    * plans as a keyed join plus a time filter; on two watermarked streams
    * the event-time range condition is exactly what Spark needs to bound
    * and evict both sides' join state, so state size is O(horizon's worth
    * of events), not the stream history. */
  def clickViewAttribution(clicks: DataFrame, views: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    clicks.alias("c").join(views.alias("v"),
        col("c.user_id") === col("v.user_id") &&
          col("v.ts") >= col("c.ts") - expr(s"INTERVAL $horizon") &&
          col("v.ts") <= col("c.ts"))
      .select(col("c.event_id").as("click_id"), col("c.user_id").as("user_id"),
        col("v.event_id").as("view_id"), round(col("v.value"), 6).as("view_value"))

  /** Run [[clickViewAttribution]] as a real two-stream join (both sides
    * watermarked file streams, append sink). */
  def startAttributionStream(spark: SparkSession, dir: String, name: String,
      horizon: String = "10 minutes"): StreamingQuery = {
    def side(eventType: String) = eventStream(spark, dir)
      .filter(col("event_type") === eventType)
      .withWatermark("ts", "30 minutes")
    clickViewAttribution(side("click"), side("view"), horizon)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
  }

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
    val raw = eventStream(spark, dir)
    tumblingCounts(raw.withWatermark("ts", "10 minutes"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
  }

  /** [[typeCountsByNation]] as a real file-source stream joined to the
    * static nation table (memory sink, complete mode). */
  def startStreamStaticJoin(spark: SparkSession, dir: String, nation: DataFrame,
      name: String): StreamingQuery = {
    val raw = eventStream(spark, dir)
    typeCountsByNation(raw.withWatermark("ts", "10 minutes"), nation)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
  }

  /** [[slidingCounts]] as a real file-source stream (memory sink). */
  def startSlidingStream(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val raw = eventStream(spark, dir)
    slidingCounts(raw.withWatermark("ts", "10 minutes"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
  }
}
