package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Physical layout: partition pruning and shuffle-free bucketed joins. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitioned append: partition filter prunes directories (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("part_append").toString + "/t"
    Bucketing.writePartitioned(
      Tables.lineitem(spark, "/root/testdata/sf0.001"), dir, Seq("l_returnflag"))
    val q = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"), plan.take(500))
    // pruned read returns only the selected partition
    assert(q.select("l_returnflag").distinct().collect().map(_.getString(0)).toSeq == Seq("A"))
  }

  test("same-bucketed tables join with NO Exchange (co-located, shuffle paid at write)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, "/root/testdata/sf0.001")
          .select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.orders(spark, "/root/testdata/sf0.001")
          .select("o_orderkey", "o_totalprice"), "ord_b", "o_orderkey", 4)
      val joined = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n${plan.take(800)}")
      // and it is still correct
      val expected = Tables.lineitem(spark, "/root/testdata/sf0.001")
        .join(Tables.orders(spark, "/root/testdata/sf0.001"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
