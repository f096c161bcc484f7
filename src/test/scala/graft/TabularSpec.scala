package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tabular

/** CSV/ORC interchange semantics: RFC-4180 escaping survives a roundtrip,
  * malformed vendor lines quarantine instead of failing or vanishing, and
  * ORC preserves values and partition layout. */
class TabularSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("CSV roundtrip: delimiters, quotes, and newline-free unicode survive") {
    val rows = Seq(
      (1L, "plain", 1.5),
      (2L, "comma, inside", -2.25),
      (3L, "a \"quoted\" word", 0.0),
      (4L, "naïve café — unicode", 1e-3))
    val df = rows.toDF("id", "s", "v")
    val dir = tmp("graft_csvspec_") + "/t"
    Tabular.writeCsv(df, dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val back = Tabular.readCsv(spark, dir, schema)
    // a data column must ride along: Spark refuses corrupt-column-only scans
    assert(back.filter(col(Tabular.CorruptCol).isNotNull)
      .select(col("id"), col(Tabular.CorruptCol)).collect().isEmpty)
    val got = back.select(col("id"), col("s"), col("v"))
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
    assert(got == rows.sortBy(_._1))
  }

  test("CSV quarantine: untypeable fields route to the corrupt column, clean rows parse") {
    val dir = tmp("graft_csvbad_") + "/t"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "feed.csv"),
      ("id,s,v\n" +
       "1,ok,2.5\n" +
       "oops,bad-key,3.5\n" +
       "2,ok2,not-a-number\n" +
       "3,ok3,4.5\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val back = Tabular.readCsv(spark, dir, schema)
    // Quarantine is judged against the columns the scan PARSES: select the
    // full width, or a pruned scan skips the failing field's conversion and
    // the row sails through clean (see the Tabular scaladoc).
    val rows = back.select(col("id"), col("s"), col("v"), col(Tabular.CorruptCol))
      .collect()
    val clean = rows.filter(_.isNullAt(3))
    val bad = rows.filter(!_.isNullAt(3))
    assert(clean.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // the quarantined rows carry their raw lines — routable to dead-letter
    assert(bad.map(_.getString(3)).toSet ==
      Set("oops,bad-key,3.5", "2,ok2,not-a-number"))
  }

  test("readCsv refuses a schema that collides with the corrupt column") {
    val schema = StructType(Seq(StructField(Tabular.CorruptCol, StringType)))
    intercept[IllegalArgumentException] {
      Tabular.readCsv(spark, "/nonexistent", schema)
    }
  }

  test("ORC partitioned write: values exact, one directory per partition value") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v")
    val dir = tmp("graft_orcspec_") + "/t"
    Tabular.writeOrc(df, dir, partitionBy = Seq("k"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("k=a", "k=b"))
    val back = Tabular.readOrc(spark, dir)
    assert(back.filter(col("k") === "a").select(sum(col("v"))).as[Double].head() == 40.0)
    assert(back.count() == 3)
  }
}
