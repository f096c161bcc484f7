package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object WinSweep {
  def globalWindows(p: SparkPlan): Seq[WindowExec] = {
    val here = p match { case w: WindowExec if w.partitionSpec.isEmpty => Seq(w); case _ => Nil }
    val kids = p match { case a: AdaptiveSparkPlanExec => Seq(a.initialPlan); case o => o.children }
    here ++ kids.flatMap(globalWindows) ++ p.subqueries.flatMap(globalWindows)
  }
  def allWindows(p: SparkPlan): Seq[WindowExec] = {
    val here = p match { case w: WindowExec => Seq(w); case _ => Nil }
    val kids = p match { case a: AdaptiveSparkPlanExec => Seq(a.initialPlan); case o => o.children }
    here ++ kids.flatMap(allWindows) ++ p.subqueries.flatMap(allWindows)
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        val g = globalWindows(plan); val a = allWindows(plan)
        if (a.nonEmpty) println(s"WIN $name total=${a.length} global=${g.length}")
      } catch { case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}") }
      graft.GraftCaches.unpersistAll()
    }
    graft.GraftCaches.releaseArtifacts()
    spark.stop()
  }
}
