package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Scratch stage-cost probe for the minhash pipeline (dev-only). */
object Probe {
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
    // stage-by-stage costs of the production pipeline
    val staged = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(TextAnalysis.normalizeText(col("text")), " ").as("__toks"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("__sh"))
      .persist()
    t("stage shingle-arrays (cache fill)")(staged.count())
    val sigArr = staged.select(col("doc_id"),
      expr("graft_minhash_sig(__sh, 32)").as("__sig")).persist()
    t("stage signatures")(sigArr.count())
    val sig = sigArr.select(col("doc_id") +:
      (0 until 32).map(i => col("__sig")(i).as(s"h$i")): _*)
    val cand = Dedup.lshCandidates(Dedup.lshBands(sig, 16, 2)).persist()
    t("stage candidates")(cand.count())
    val sh = staged.select(col("doc_id"), explode(col("__sh")).as("shingle"))
    t("stage verify")(
      Dedup.verifyJaccard(cand, sh, minJaccard = 0.5)
        .filter(col("jaccard") >= 0.5).count())
    spark.catalog.clearCache()
    t("full pipeline")(
      Dedup.minHashDedupPairs(docs, col("doc_id"), col("text"),
        numHashes = 32, bands = 16, threshold = 0.5, shingleK = 3).count())
    spark.stop()
  }
}
