package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Dedup
import graft.sources.Tables

/** Scratch stage-cost probe for the minhash pipeline (dev-only). */
object Probe {
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
    def pairs(bands: Int) = t(s"full pipeline bands=$bands") {
      val p = Dedup.minHashDedupPairs(docs, col("doc_id"), col("text"),
        numHashes = 32, bands = bands, threshold = 0.5, shingleK = 3)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[probe] bands=$bands pairs: ${p.size}")
      p
    }
    val p16 = pairs(16)
    spark.catalog.clearCache()
    val p8 = pairs(8)
    println(s"[probe] only-in-16: ${(p16 -- p8).size} ${(p16 -- p8).take(10)}")
    println(s"[probe] only-in-8: ${(p8 -- p16).size}")
    spark.stop()
  }
}
