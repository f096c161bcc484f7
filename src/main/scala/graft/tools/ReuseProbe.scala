package graft
import org.apache.spark.sql.SparkSession
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("q11_important_parts", "q15_top_supplier")) {
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"$n reusedExchange=${plan.contains("ReusedExchange") || plan.contains("StageReuse") || plan.contains("ReusedQueryStage")}")
    }
    spark.stop()
  }
}
