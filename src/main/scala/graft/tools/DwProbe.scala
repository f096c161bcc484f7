package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Scratch stage-cost probe for duplicatedWindowStats (dev-only). */
object DwProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    t("warm")(docs.count())
    val norm = docs.select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("n"))
    t("normalize+len")(norm.select(sum(length(col("n")))).collect())
    val wh = norm.select(col("doc_id"),
      explode(call_function("graft_window_hashes", col("n"), lit(40))).as("wh"))
    t("hashes exploded count")(wh.count())
    t("per-doc-window agg")(wh.groupBy(col("doc_id"), col("wh")).agg(count(lit(1)))
      .write.format("noop").mode("overwrite").save())
    t("full dup_windows (run1)")(
      Dedup.duplicatedWindowStats(docs, col("doc_id"), col("text"), 40, 2)
        .write.format("noop").mode("overwrite").save())
    graft.GraftCaches.unpersistAll()
    t("full dup_windows (run2)")(
      Dedup.duplicatedWindowStats(docs, col("doc_id"), col("text"), 40, 2)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
