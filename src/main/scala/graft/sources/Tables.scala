package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's source surface: the Beam pipeline's file-match
  * scan (`/root/reference/dataflow_pipeline.py:130-131`) becomes
  * `spark.read`; the GCS listing connector (`/root/reference/gcp_utils.py:21-26`)
  * is re-expressed as a filtered/limited scan in
  * [[graft.operators.Relational.listingSuffixLimit]].
  *
  * Design notes for 100 TB: every loader returns a plain scan so Catalyst
  * can push filters/column pruning into the parquet reader; nothing is
  * cached or collected here.
  */
object Tables {

  /** Read one named table under an sf directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` normalized to Spark's session-timezone TimestampType
    * whatever the generator wrote:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]), so read nanos as long and truncate to
    *    microseconds with integer division (a double division would lose
    *    precision at ~1.7e18 nanos). DuckDB's `CAST(ts AS TIMESTAMP)`
    *    truncates ns→µs the same way, so oracle comparisons stay exact.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ; cast to TimestampType — with the engine-wide
    *    `spark.sql.session.timeZone=UTC` the wall-clock values are
    *    unchanged and match DuckDB's naive TIMESTAMP read bit-for-bit.
    * Downstream code (windows, watermarks, `Row.getTimestamp`) then sees
    * one type regardless of generator version.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType.typeName match {
      case "long"          => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _               => raw
    }
  }
}
