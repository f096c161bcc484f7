package graft.tools

import org.apache.spark.sql.SparkSession

/** WARM plan auditor — the serving-shape complement of [[graft.Explain]]:
  * runs each named query once through the noop sink (filling the tracked
  * caches the operator registers), then explains a FRESH construction of
  * the same query. CacheManager substitutes the registered caches by
  * canonical-plan match, so the printed plan is the one the bench's timed
  * samples actually execute — cached operators appear as
  * InMemoryTableScans instead of fully inlined (and, cold, combinatorially
  * duplicated) build subtrees. The cold Explain remains the right tool for
  * scan hygiene (PushedFilters/ReadSchema of the base tables).
  *
  * Usage: `runMain graft.tools.WarmExplain <sfDir> <query> [query ...]`.
  */
object WarmExplain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.tools.WarmExplain <sfDir> <query> [query ...]")
      sys.exit(2)
    }
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        // fresh construction: tracked caches from the run above are still
        // registered, so this plan shows the warm serving shape
        graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      } catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      // per-query hygiene like Bench — later queries must not read this
      // query's caches
      graft.GraftCaches.unpersistAll(blocking = true)
    }
    graft.GraftCaches.releaseArtifacts(blocking = true)
    spark.stop()
  }
}
