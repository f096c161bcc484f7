package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: stage-size + warm per-stage timing profile of prefixFilterJoin
  * at a given SF. Each stage is timed on its second run (first run absorbs
  * JVM/codegen warm-up, which at sf0.1 is bigger than any stage itself).
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def timed2(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val n = mk.count(); val t0 = System.nanoTime(); val _ = mk.count()
      println(f"PROBE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    timed2("shingles") {
      graft.functions.Dedup.docShingles(docs, col("doc_id"), col("text"))
    }
    // NOTE: no unpersistAll inside the block — releasing the tracked
    // shingle/doc-set caches before the counts would time a
    // recompute-heavy plan the real (persisted) query never executes
    timed2("full_prefix_join") {
      graft.functions.Dedup.prefixFilterJoin(docs, col("doc_id"), col("text"), 0.8)
    }
    graft.GraftCaches.unpersistAll()
    spark.stop()
  }
}
