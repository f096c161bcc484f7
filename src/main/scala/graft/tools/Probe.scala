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
    // pair sets stay DISTRIBUTED: pointed at a large corpus, collecting
    // every pair to the driver would OOM — diffs run as except()+count()
    // with a bounded sample of examples
    def pairs(bands: Int) = t(s"full pipeline bands=$bands") {
      val p = Dedup.minHashDedupPairs(docs, col("doc_id"), col("text"),
        numHashes = 32, bands = bands, threshold = 0.5, shingleK = 3)
        .select("id1", "id2").localCheckpoint()
      println(s"[probe] bands=$bands pairs: ${p.count()}")
      p
    }
    val p16 = pairs(16)
    spark.catalog.clearCache()
    val p8 = pairs(8)
    val only16 = p16.except(p8).localCheckpoint()
    println(s"[probe] only-in-16: ${only16.count()} " +
      only16.limit(10).collect().map(r => (r.getLong(0), r.getLong(1))).mkString(" "))
    println(s"[probe] only-in-8: ${p8.except(p16).count()}")
    spark.stop()
  }
}
