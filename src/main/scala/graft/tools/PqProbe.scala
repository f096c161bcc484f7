package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Scratch stage-cost probe for the PQ pipeline (dev-only). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    t("full pqTopK (run 1)")(
      Similarity.pqTopK(queries, emb, 5, m = 8, ksub = 16, lloydIters = 1)
        .write.format("noop").mode("overwrite").save())
    graft.GraftCaches.unpersistAll()
    t("full pqTopK (run 2)")(
      Similarity.pqTopK(queries, emb, 5, m = 8, ksub = 16, lloydIters = 1)
        .write.format("noop").mode("overwrite").save())
    graft.GraftCaches.unpersistAll()
    t("lloydIters=0")(
      Similarity.pqTopK(queries, emb, 5, m = 8, ksub = 16, lloydIters = 0)
        .write.format("noop").mode("overwrite").save())
    graft.GraftCaches.unpersistAll()
    t("ivf reference")(
      Similarity.ivfTopK(queries, emb, 5, nCentroids = 16, nProbe = 4, lloydIters = 1)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
