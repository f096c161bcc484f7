package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout controls for the 100 TB path (SURVEY §4, task brief:
  * "bucketing for co-located joins").
  *
  *  - [[writePartitioned]]: B2 with hive-style partition directories —
  *    queries filtering on the partition column prune whole directories
  *    (PartitionFilters in the scan, zero I/O for pruned values).
  *  - [[writeBucketed]]: persistent hash-bucketed tables; two tables
  *    bucketed the same way join WITHOUT any Exchange — the shuffle is
  *    paid once at write time, then every subsequent join is co-located.
  *    BucketingSpec asserts the Exchange-free plan.
  */
object Bucketing {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket column — shuffle-free. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(left).join(spark.table(right), col(leftKey) === col(rightKey))
  }
}
