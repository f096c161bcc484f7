package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Fixed-query-set ANN scaling: the gate's query set (vec_id % 50 == 0)
  * grows with the corpus, so the gate's sf1/sf0.1 ratio conflates 10x
  * more queries with 10x more corpus. Production serves a FIXED query
  * stream against a growing corpus — this probe pins |Q| to the sf0.1
  * query set (vec_id < 10^7 excludes the scaled copies) and times
  * IVF-PQ serving at both scales. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/target/testdata-sf1")) {
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val queries = emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 10000000L)
      val index = graft.functions.Similarity.buildIvfPqIndex(emb,
        nCentroids = 16, coarseIters = 1, m = 16, ksub = 32, pqIters = 1)
      def serve(): Double = {
        val t0 = System.nanoTime()
        graft.functions.Similarity.ivfPqTopKIndexed(queries, index, 5, nProbe = 4)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.GraftCaches.unpersistAll(blocking = true)
        dt
      }
      val t = math.min(serve(), serve())
      println(f"PROBE $dir fixed-|Q| ivfpq serving ${t}%.2f s")
      graft.GraftCaches.releaseArtifacts(blocking = true)
    }
    spark.stop()
  }
}
