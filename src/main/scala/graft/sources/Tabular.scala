package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Delimited-text (CSV) and ORC table exchange — the interchange formats a
  * pipeline meets at its EDGES (vendor drops, export feeds, legacy lakes),
  * complementing the parquet-native core in [[Tables]].
  *
  * Scale rules baked in rather than left to callers:
  *
  *   - '''Explicit schema, never inference.''' Schema inference is a full
  *     extra pass over the data before the real job starts — at 100 TB
  *     that is a second 100 TB scan, and a sampled inference can still
  *     mis-type a column that is clean in the sample and dirty later.
  *     [[readCsv]] therefore REQUIRES a `StructType`.
  *   - '''Quarantine, never fail the job.''' A million-file feed will
  *     contain malformed rows; `mode=FAILFAST` turns one bad vendor line
  *     into a dead 1000-executor job, and `DROPMALFORMED` silently loses
  *     data. PERMISSIVE + a corrupt-record column keeps the job alive AND
  *     the evidence queryable (count it, sample it, route it to a
  *     dead-letter sink).
  *   - '''Splittable layout.''' Uncompressed / bzip2 single-line CSV splits
  *     on block boundaries so every executor reads a slice; `multiLine`
  *     (quoted embedded newlines) forces whole-file tasks — refuse it here
  *     and pre-normalize such feeds instead.
  *
  * CSV semantics follow RFC 4180: fields containing the delimiter, quote,
  * or newline are quoted; quotes escape by doubling. Timestamps serialize
  * as ISO-8601 instants in the session zone (graft pins UTC) so a
  * write → read roundtrip is value-exact.
  */
object Tabular {

  /** The quarantine column name — kept out of the way of real columns. */
  val CorruptCol = "_graft_corrupt"

  /** Write `df` as RFC-4180 CSV with a header line. One file per task —
    * writer parallelism IS the partition count, same as parquet. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").option("escape", "\"").csv(path)

  /** Read a CSV directory against an explicit schema, quarantining rows
    * that fail to parse (wrong arity, untypeable field) into
    * [[CorruptCol]] instead of failing the job or dropping them.
    *
    * Returns the full frame: clean rows have `CorruptCol IS NULL`,
    * quarantined rows carry the raw line there (typed columns null).
    * Filter/route downstream — both halves stay one scan.
    *
    * Two sharp edges, both consequences of column pruning reaching the
    * CSV parser (the same pruning that makes the scan fast):
    *
    *   1. [UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]: a query
    *      whose pruned scan references ONLY the quarantine column is
    *      refused — always read at least one data column alongside it.
    *   2. Quarantine is judged against the columns the scan PARSES. A row
    *      whose only bad field is pruned away parses clean in that query —
    *      so a quarantine AUDIT must select the full width. The natural
    *      dead-letter shape does both for free:
    *      `groupBy(when(corrupt.isNotNull, lit("__BAD__")).otherwise(key))
    *      .agg(...)` over the real columns — one scan, one shuffle, the
    *      quarantine count is just another group.
    */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema may not already contain $CorruptCol")
    s.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", "true")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
  }

  /** Write `df` as ORC, optionally hash-partitioned by columns — the same
    * directory-partitioned layout parquet sinks use, so partition pruning
    * works identically (`PartitionFilters` in the scan). */
  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Read an ORC directory. Vectorized, predicate-pushdown-capable —
    * second-class only to parquet in this engine because the testdata and
    * reference corpus are parquet. */
  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)
}
