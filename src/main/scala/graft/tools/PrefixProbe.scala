package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: stage-size profile of prefixFilterJoin at a given SF. */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val sh = graft.functions.Dedup.docShingles(docs, col("doc_id"), col("text"))
    println(s"PROBE shingle_rows=${sh.count()} t=${(System.nanoTime()-t0)/1e9}")
    val r = graft.functions.Dedup.prefixFilterJoin(docs, col("doc_id"), col("text"), 0.8)
    val t1 = System.nanoTime()
    println(s"PROBE final_pairs=${r.count()} t=${(System.nanoTime()-t1)/1e9}")
    graft.GraftCaches.unpersistAll()
    spark.stop()
  }
}
