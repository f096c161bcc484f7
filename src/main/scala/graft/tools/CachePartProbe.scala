package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: does a self-join of a CACHED hash-repartitioned frame reuse the
  * cached partitioning (zero exchanges), and does
  * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` change the
  * answer on this Spark build? Decides whether the keyed-cache strategy
  * (bandedHashPairs, the ADC lists⋈pivot join) actually removes the
  * self-join exchanges at serve time or only centralizes the explode. */
object CachePartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("default canChangeCachedPlanOutputPartitioning = " +
      spark.conf.getOption(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"))
    Seq("true", "false").foreach { v =>
      spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", v)
      spark.sharedState.cacheManager.clearCache()
      val base = spark.range(100000)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
        .repartition(8, col("k"))
        .sortWithinPartitions(col("k"))
        .persist()
      base.count()
      val j = base.select(col("k"), col("v").as("v1"))
        .join(base.select(col("k"), col("v").as("v2")), Seq("k"))
        .filter(col("v1") =!= col("v2"))
      j.write.format("noop").mode("overwrite").save()
      val plan = j.queryExecution.executedPlan.toString
      val nEx = "(?<!Reused)(?<!Broadcast)Exchange".r.findAllIn(plan).length
      val nSort = raw"\bSort\b".r.findAllIn(plan).length
      println(s"conf=$v  shuffleExchanges=$nEx sorts=$nSort")
      if (args.contains("-v")) println(plan)
      base.unpersist(true)
    }
    spark.stop()
  }
}
