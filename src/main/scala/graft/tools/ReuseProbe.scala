package graft

import org.apache.spark.sql.SparkSession

/** Runtime stage-reuse probe: AQE's ReusedExchange / reused query stages
  * only appear in the EXECUTED adaptive plan, never in static explain —
  * this main collects each named query at sf0.01 and reports whether its
  * self-referential branches (rollup re-aggregations, scalar thresholds)
  * actually shared a shuffle stage, i.e. whether the fact was scanned
  * once. Diagnosis that led to q15's persistTracked: its shape does NOT
  * reuse on its own, while q11's does.
  *
  * Usage: `runMain graft.ReuseProbe [queryName ...]` (default q11, q15).
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q11_important_parts", "q15_top_supplier")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
      val cached = plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage")
      println(s"$n reusedExchange=$reused cachedRollup=$cached")
      GraftCaches.unpersistAll()
    }
    spark.stop()
  }
}
