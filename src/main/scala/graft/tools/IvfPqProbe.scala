package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: ADC approximation error of ivfPqTopK vs exact cosine on the
  * probed candidates, at the gate's parameters. */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    for ((m, ksub, iters) <- Seq((16, 32, 2), (32, 32, 2), (32, 64, 2))) {
      val adc = graft.functions.Similarity.ivfPqTopK(queries, emb, 500,
        nCentroids = 16, nProbe = 4, coarseIters = 1, m = m, ksub = ksub, pqIters = iters)
      val exact = graft.functions.Similarity.cosineTopK(queries, emb, 500)
        .select(col("q_id"), col("c_id"), col("cos").as("cos_true"))
      val err = adc.join(exact, Seq("q_id", "c_id"))
        .select(abs(col("cos") - col("cos_true")).as("e"))
        .agg(avg("e").as("avg_e"), max("e").as("max_e")).head()
      if (err.isNullAt(0))
        println(s"PROBE m=$m ksub=$ksub iters=$iters no overlapping pairs")
      else
        println(f"PROBE m=$m ksub=$ksub iters=$iters avg_err=${err.getDouble(0)}%.4f max_err=${err.getDouble(1)}%.4f")
      graft.GraftCaches.unpersistAll()
    }
    spark.stop()
  }
}
