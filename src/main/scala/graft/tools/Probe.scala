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
    val sh = t("shingles build+persist") {
      val s = Dedup.docShingles(docs, col("doc_id"), col("text"), 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] shingle rows: ${s.count()}")
      s
    }
    val sig = t("signatures") {
      val s = Dedup.minHashSignatures(sh, 32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] sig rows: ${s.count()}")
      s
    }
    val cand = t("candidates") {
      val c = Dedup.lshCandidates(Dedup.lshBands(sig, 16, 2))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] candidate pairs: ${c.count()}")
      c
    }
    t("verifyJaccard") {
      println(s"[probe] verified: ${Dedup.verifyJaccard(cand, sh).filter(col("jaccard") >= 0.5).count()}")
    }
    spark.stop()
  }
}
