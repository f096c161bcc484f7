package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SlicePipeline
import graft.model.Schemas

/** M3 pipeline parity: the Beam DoFn chain as one narrow Spark stage
  * (`/root/reference/dataflow_pipeline.py:60-141`). */
class SlicePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pipeline emits one record per input image (stub never drops)") {
    assert(SlicePipeline.run(spark, 50).count() == 50L)
  }

  test("NULL paths: every 11th image lacks PatientID → NULL hash; every 7th lacks window tags") {
    val df = SlicePipeline.run(spark, 100).toDF()
    assert(df.filter(col("patient_id_hash").isNull).count() == 10L) // ids 0,11,...,99
    // id % 7 == 0 → no window tags → min-max fallback → window_center NULL
    assert(df.filter(col("window_center").isNull).count() == 15L) // ids 0,7,...,98
  }

  test("MultiValue window tags use the FIRST element (dataflow_pipeline.py:25-26)") {
    // id 26: 26%13==0, 26%7!=0 → MultiValue "[1026, 1036]" → wc=1026
    val r = SlicePipeline.run(spark, 30).toDF()
      .filter(col("file_name") === "img_000026.dcm").head()
    assert(r.getAs[Double]("window_center") == 1000.0 + 26 % 500)
  }

  test("intensity stats are uint8-ranged; std is population (ddof=0)") {
    val rows = SlicePipeline.run(spark, 20).toDF()
      .select("mean_intensity", "std_intensity").collect()
    rows.foreach { r =>
      val m = r.getDouble(0); val s = r.getDouble(1)
      assert(m >= 0 && m <= 255 && s >= 0 && s <= 128)
    }
  }

  test("derived URI: prefix/stem.png with extension stripped") {
    val r = SlicePipeline.run(spark, 1).head()
    assert(r.gcs_uri_processed == "out/processed/img_000000.png")
    assert(r.file_name == "img_000000.dcm")
  }

  test("A8 schema load: bq_schema JSON shape → StructType with modes") {
    val json =
      """{"fields": [
        |  {"name": "file_name", "type": "STRING", "mode": "REQUIRED"},
        |  {"name": "rows", "type": "INT64", "mode": "NULLABLE"},
        |  {"name": "mean_intensity", "type": "FLOAT"},
        |  {"name": "processed_at", "type": "TIMESTAMP", "mode": "REQUIRED"}]}""".stripMargin
    val st = Schemas.bqJsonToStructType(json)
    assert(st.fields.map(_.name).toSeq == Seq("file_name", "rows", "mean_intensity", "processed_at"))
    assert(!st("file_name").nullable && st("rows").nullable)
    assert(st("mean_intensity").dataType.typeName == "double")
    assert(st("processed_at").dataType.typeName == "timestamp")
  }

  test("analytic view: avg intensity per study, top-k ordered") {
    val agg = SlicePipeline.avgIntensityByStudy(SlicePipeline.run(spark, 60).toDF(), 5)
    val rows = agg.collect()
    assert(rows.length == 5)
    val avgs = rows.map(_.getAs[Double]("avg_intensity"))
    assert(avgs.sameElements(avgs.sortBy(-_.asInstanceOf[Double])))
  }
}
