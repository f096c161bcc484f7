package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Diagnoses the ×10 fixed-|Q| anomaly recorded in BENCH_NOTES_r11.md:
  * the fixedq ANN twins run ~2.5× SLOWER on the ×10 dataset than on ×30
  * (reproducible, tight min/max). Hypothesis: at the ×10 frame sizes the
  * post-probe ADC aggregation sits in the regime where AQE's partition
  * coalescing folds the shuffle into too few partitions for the
  * (CPU-heavy, byte-light) integer ADC work — size-based coalescing
  * under-parallelizes compute-bound integer columns. This probe serves
  * the SAME query (auto-geometry top-k, |Q| = `vec_id < 2000`) twice in
  * one session with `spark.sql.adaptive.coalescePartitions.enabled`
  * toggled, min-of-2 each, and prints one JSON line. A large on/off gap
  * confirms the mechanism; parity refutes it. */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/repo/target/testdata-sf1", "/root/repo/target/testdata-sf3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    for (dir <- dirs) {
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val q = emb.filter(col("vec_id") < 2000)
      def serve(): Unit =
        Similarity.ivfPqTopKAuto(q, emb, 5)
          .write.format("noop").mode("overwrite").save()
      serve() // untimed: builds the memoized auto index + warms codegen
      def timed(coalesce: Boolean): Double = {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
          coalesce.toString)
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          serve()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      // coalesce-on first (the default Bench regime), then off
      val on = timed(coalesce = true)
      val off = timed(coalesce = false)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      println(s"""{"dir":"$dir","n":${emb.count()},""" +
        s""""coalesce_on_sec":${math.round(on * 1000) / 1000.0},""" +
        s""""coalesce_off_sec":${math.round(off * 1000) / 1000.0},""" +
        s""""ratio":${math.round(on / off * 100) / 100.0}}""")
      graft.GraftCaches.releaseArtifacts(blocking = true)
      graft.GraftCaches.unpersistAll(blocking = true)
    }
    spark.stop()
  }
}
