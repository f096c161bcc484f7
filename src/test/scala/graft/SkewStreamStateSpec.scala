package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables
import graft.streaming.EventStreams

/** Skew utilities and custom streaming state. */
class SkewStreamStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join on skewed data") {
    // hot key: 90% of big rows share key 1
    val big = (1 to 1000).map(i => (if (i % 10 == 0) i % 7 else 1L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (6L, "c")).toDF("k", "label")
    val plain = big.join(small, "k").select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", 8).select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("saltedSum spreads a hot key with CONSTANT values across >1 salt") {
    // counting rows with value = lit(1) is the common case: a content-only
    // salt hash(k, v) collapses to ONE salt and silently re-concentrates
    // the hot key. The partition-id mix must keep it spread.
    val hot = spark.range(1000).repartition(8)
      .select(lit(1L).as("k"), lit(1.0).as("v"))
    val nSalts = hot
      .select(Skew.spreadSalt(Seq(col("k"), col("v")), 16).as("s"))
      .distinct().count()
    assert(nSalts > 1, s"constant-value hot key collapsed to $nSalts salt(s)")
    // and the result is still exact
    val r = Skew.saltedSum(hot, col("k"), col("v"), 16).collect()
    assert(r.length == 1 && r.head.getDouble(1) == 1000.0 && r.head.getLong(2) == 1000L)
  }

  test("saltedJoin tolerates MapType columns on the big side (excluded from the salt)") {
    val big = (1 to 100).map(i => (1L, i.toLong)).toDF("k", "payload")
      .withColumn("tags", map(lit("a"), col("payload")))
    val small = Seq((1L, "hot")).toDF("k", "label")
    val plain = big.join(small, "k").select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", 4).select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    assert(salted == plain && salted.size == 100)
  }

  test("saltedSum equals plain aggregation") {
    val df = (1 to 500).map(i => (i % 3, i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("sum"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(df, col("k"), col("v"), 4)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("flatMapGroupsWithState running anomalies: per-user mean, ordered, flagged") {
    val events = Seq(
      (1L, 1L, 10.0), (1L, 2L, 12.0), (1L, 3L, 100.0), (1L, 4L, 11.0),
      (2L, 5L, 5.0), (2L, 6L, 6.0))
      .toDF("user_id", "event_id", "value")
    val out = EventStreams.runningAnomalies(spark, events, factor = 3.0)
      .orderBy("event_id").collect()
    // event 3: mean so far (10+12)/2 = 11 → 100 > 33 → anomalous
    val flagged = out.filter(_.getAs[Boolean]("anomalous")).map(_.getAs[Long]("event_id"))
    assert(flagged.toSeq == Seq(3L))
    // first event per user can never be anomalous
    assert(!out.head.getAs[Boolean]("anomalous"))
    // running means are exact
    val e4 = out.find(_.getAs[Long]("event_id") == 4L).get
    assert(math.abs(e4.getAs[Double]("running_mean") - (10 + 12 + 100) / 3.0) < 1e-9)
  }

  test("runningAnomalies runs as a REAL stream (flatMapGroupsWithState, append mode)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("anomaly_stream")
    // two micro-batch files so state genuinely carries across batches
    Seq((1L, 1L, 10.0), (1L, 2L, 12.0)).toDF("user_id", "event_id", "value")
      .coalesce(1).write.parquet(dir.resolve("b0").toString)
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_id", LongType), StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*/")
    val q = EventStreams.runningAnomalies(spark, stream, factor = 3.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("anomaly_stream_t").start()
    try {
      q.processAllAvailable()
      // second batch arrives AFTER the first is fully processed
      Seq((1L, 3L, 100.0)).toDF("user_id", "event_id", "value")
        .coalesce(1).write.parquet(dir.resolve("b1").toString)
      q.processAllAvailable()
      val out = spark.table("anomaly_stream_t").orderBy("event_id").collect()
      assert(out.length == 3)
      // event 3 judged against STATE from batch 1: mean 11 → 100 > 33 → anomalous
      assert(out.map(_.getAs[Boolean]("anomalous")).toSeq == Seq(false, false, true))
      assert(math.abs(out.last.getAs[Double]("running_mean") - 11.0) < 1e-9)
    } finally q.stop()
  }

  test("runningAnomalies over the events fixture is deterministic across runs") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val a = EventStreams.runningAnomalies(spark, ev).filter(col("anomalous")).count()
    val b = EventStreams.runningAnomalies(spark, ev).filter(col("anomalous")).count()
    assert(a == b)
  }
}
