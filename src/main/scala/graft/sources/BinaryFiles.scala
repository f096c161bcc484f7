package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A1/A4/A5 — binary-file scan surface.
  *
  * The reference's `MatchFiles(glob) | ReadMatches()` pair
  * (`/root/reference/dataflow_pipeline.py:130-131`) and its GCS listing
  * connector (`/root/reference/gcp_utils.py:21-26`) both become Spark's
  * built-in `binaryFile` source: a distributed scan producing
  * `(path, modificationTime, length, content)`, one task per file group,
  * with pushed-down path filters. No driver-side listing loop — at 100 TB
  * the file index is computed in parallel and predicates on `path` prune
  * before content is read.
  */
object BinaryFiles {

  /** Distributed glob match + read (A1). */
  def binaryFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** A5 — listing with case-insensitive suffix filter and limit
    * (`gcp_utils.py:25-26`), sorted on path for determinism (the reference
    * inherits storage order — SURVEY.md §7.3). `pathGlobFilter` pushes the
    * suffix predicate into the file index so non-matching files are never
    * opened. */
  def listing(spark: SparkSession, dir: String, suffix: String, limit: Int): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*$suffix")
      .load(dir)
      .select(col("path"), col("length"))
      .orderBy(col("path"))
      .limit(limit)
}
