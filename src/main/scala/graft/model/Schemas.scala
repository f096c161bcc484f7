package graft.model

import org.apache.spark.sql.types._

/** The reference's one declared schema and its Spark mapping.
  *
  * Reference: `/root/reference/bq_schema.json:1-19`, loaded and converted to
  * a Beam `TableSchema` at `/root/reference/dataflow_pipeline.py:49-57`.
  * Our equivalent converts the same JSON into a Spark [[StructType]]
  * (SURVEY.md §1.2, operator A8).
  */
object Schemas {

  /** BigQuery type name → Spark type (SURVEY.md §1.2 table). */
  def bqTypeToSpark(t: String): DataType = t.toUpperCase match {
    case "STRING"              => StringType
    case "INT64" | "INTEGER"   => LongType
    case "FLOAT" | "FLOAT64"   => DoubleType
    case "BOOL" | "BOOLEAN"    => BooleanType
    case "TIMESTAMP"           => TimestampType
    case "DATE"                => DateType
    case "BYTES"               => BinaryType
    case "NUMERIC"             => DecimalType(38, 9)
    case other => throw new IllegalArgumentException(s"unsupported BQ type: $other")
  }

  /** Minimal JSON parser for the bq_schema.json shape:
    * `{"fields":[{"name":..,"type":..,"mode":..}, ...]}`.
    * Equivalent of `_table_schema_from_json`
    * (`/root/reference/dataflow_pipeline.py:49-57`) with REQUIRED → not null.
    * Deliberately dependency-free (no JSON lib in the sandbox beyond Spark's
    * internals); handles the flat field objects the reference uses.
    */
  def bqJsonToStructType(json: String): StructType = {
    // "mode" is optional in BQ schema JSON (absent → NULLABLE)
    val fieldRe =
      """\{\s*"name"\s*:\s*"([^"]+)"\s*,\s*"type"\s*:\s*"([^"]+)"\s*(?:,\s*"mode"\s*:\s*"([^"]+)"\s*)?\}""".r
    val fields = fieldRe.findAllMatchIn(json).map { m =>
      val mode = Option(m.group(3)).map(_.toUpperCase).getOrElse("NULLABLE")
      StructField(m.group(1), bqTypeToSpark(m.group(2)), nullable = mode != "REQUIRED")
    }.toArray
    require(fields.nonEmpty, "no fields parsed from BQ schema JSON")
    StructType(fields)
  }

  /** The slice-record table produced per processed image
    * (`/root/reference/dataflow_pipeline.py:93-110`; FIXTURES.md §2).
    */
  val sliceRecordSchema: StructType = StructType(Seq(
    StructField("file_name", StringType, nullable = false),
    StructField("gcs_uri_raw", StringType, nullable = false),
    StructField("gcs_uri_processed", StringType, nullable = false),
    StructField("patient_id_hash", StringType),
    StructField("study_uid", StringType),
    StructField("series_uid", StringType),
    StructField("sop_instance_uid", StringType),
    StructField("modality", StringType),
    StructField("rows", LongType),
    StructField("cols", LongType),
    StructField("mean_intensity", DoubleType),
    StructField("std_intensity", DoubleType),
    StructField("window_center", DoubleType),
    StructField("window_width", DoubleType),
    StructField("processed_at", TimestampType, nullable = false)
  ))
}

/** Typed row for the slice-record table (Dataset[SliceRecord] where
  * compile-time field checks help; DataFrame elsewhere).
  */
case class SliceRecord(
    file_name: String,
    gcs_uri_raw: String,
    gcs_uri_processed: String,
    patient_id_hash: Option[String],
    study_uid: Option[String],
    series_uid: Option[String],
    sop_instance_uid: Option[String],
    modality: Option[String],
    rows: Option[Long],
    cols: Option[Long],
    mean_intensity: Option[Double],
    std_intensity: Option[Double],
    window_center: Option[Double],
    window_width: Option[Double],
    processed_at: java.sql.Timestamp)
