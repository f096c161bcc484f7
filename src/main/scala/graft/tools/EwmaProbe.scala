package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EwmaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      graft.plans.GraftFunctions.register(spark)
      graft.operators.Relational.ewmaRecent(
        graft.sources.Tables.events(spark, "/root/testdata/sf0.001"),
        col("user_id"), col("ts"), col("event_id"), col("value"), 64).show(3)
    } catch { case e: Throwable =>
      var t = e; while (t != null) { println("CAUSE: " + t); t = if (t.getCause ne t) t.getCause else null }
    }
    spark.stop()
  }
}
