package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.sources.Tables

/** Scratch stage-cost probe for the surprisal pipelines (dev-only). */
object SurProbe {
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
    val docs = Tables.documents(spark, sfDir)
    t("warm scan")(docs.count())
    t("tokenize only")(docs.select(TextAnalysis.terms(col("text")).as("t"))
      .select(sum(size(col("t")))).collect())
    val bg = docs.select(col("doc_id"), TextAnalysis.terms(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    t("bigram positions count")(bg.count())
    val bf = bg.repartition(col("w1"), col("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
    t("bf agg")(bf.write.format("noop").mode("overwrite").save())
    t("full bigramSurprisal")(
      TextAnalysis.bigramSurprisal(docs, col("doc_id"), col("text"))
        .write.format("noop").mode("overwrite").save())
    graft.GraftCaches.unpersistAll()
    t("full unigramSurprisal")(
      TextAnalysis.unigramSurprisal(docs, col("doc_id"), col("text"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
