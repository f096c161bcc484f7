package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** FIRE-DAY COST, COLD vs WARM: the same drifted index (auto-geometry
  * base over the odd half, even half appended — nc must grow past the
  * 1.3 factor) rebuilt through [[Similarity.ivfPqRebuildIfStale]] (full
  * retrain + corpus-wide re-assign/re-code) and through
  * [[Similarity.ivfPqRebuildWarmStart]] (surviving lists untouched;
  * only the split hottest lists re-assign/re-code). Both timed min-of-2
  * on the SAME grown index, and both rebuilt indexes measured for
  * recall@5 against the exact brute-force ranking on a fixed query set
  * — the cost cut must carry its recall operating point. One JSON line
  * per input dir. */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/testdata-sf1")
    for (dir <- dirs) {
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val (base, _) = Similarity.ivfPqAutoIndexFor(
        emb.filter(col("vec_id") % 2 === 1))
      val grown = Similarity.ivfPqIndexAppend(base,
        emb.filter(col("vec_id") % 2 === 0))
      val queries = emb.filter(col("vec_id") % 50 === 0 &&
        col("vec_id") < 10000000L)
      val exact = Similarity.cosineTopK(queries, emb, 5)
        .select(col("q_id"), col("c_id")).cache()
      val nQ = queries.count()
      exact.count()
      def recallOf(ix: Similarity.IvfPqIndex, np: Int): Long = {
        val hits = Similarity.ivfPqTopKIndexed(queries, ix, 5, np)
          .select(col("q_id"), col("c_id"))
          .join(exact, Seq("q_id", "c_id"), "left_semi").count()
        hits * 1000 / (5 * nQ)
      }
      def timed(run: () => (Similarity.IvfPqIndex, Int)): (Double, Similarity.IvfPqIndex, Int) = {
        var best = Double.MaxValue
        var kept: (Similarity.IvfPqIndex, Int) = null
        for (_ <- 1 to 2) {
          val t0 = System.nanoTime()
          val r = run()
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt < best) {
            if (kept != null) Similarity.releaseIndexData(kept._1)
            best = dt; kept = r
          } else Similarity.releaseIndexData(r._1)
          graft.GraftCaches.unpersistAll(blocking = true)
        }
        (best, kept._1, kept._2)
      }
      val (coldS, coldIx, coldNp) = timed { () =>
        val (ix, np, fired) = Similarity.ivfPqRebuildIfStale(grown)
        require(fired, s"cold policy must fire at $dir")
        (ix, np)
      }
      val (warmS, warmIx, warmNp) = timed { () =>
        val (ix, np, fired, warm) = Similarity.ivfPqRebuildWarmStart(grown)
        require(fired && warm, s"warm path must run at $dir")
        (ix, np)
      }
      val coldRecall = recallOf(coldIx, coldNp)
      val warmRecall = recallOf(warmIx, warmNp)
      val nc = warmIx.centroids.count()
      println(s"""{"dir":"$dir","n":${emb.count()},"nc_after":$nc,""" +
        s""""cold_fire_sec":${math.round(coldS * 1000) / 1000.0},""" +
        s""""warm_fire_sec":${math.round(warmS * 1000) / 1000.0},""" +
        s""""cut":${math.round(coldS / warmS * 100) / 100.0},""" +
        s""""cold_recall_permille":$coldRecall,""" +
        s""""warm_recall_permille":$warmRecall,"n_queries":$nQ}""")
      Similarity.releaseIndexData(coldIx)
      Similarity.releaseIndexData(warmIx)
      graft.GraftCaches.releaseArtifacts(blocking = true)
    }
    spark.stop()
  }
}
