package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.functions.TextAnalysis

/** Closed-form gates for the sessionization, bucketed point-in-interval
  * join, TF-IDF, and unigram-surprisal operators (the driver-side queries
  * gate them against DuckDB at sf0.01; these pin the semantics on
  * hand-checkable fixtures, including the edges the big tables don't hit:
  * exact boundary timestamps, intervals spanning several buckets,
  * overlapping intervals, equal-timestamp ties).
  */
class SessionRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: gap boundary splits, ties share a session, per-key restart") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 00:10:00"), "b"), // 10 min — same session
      (1L, ts("2024-01-01 00:40:00"), "c"), // 30 min exactly — NOT > gap, same
      (1L, ts("2024-01-01 01:40:01"), "d"), // 1h1s — new session
      (1L, ts("2024-01-01 01:40:01"), "e"), // tie ts — same session as d
      (2L, ts("2024-01-01 00:00:00"), "f")  // new key restarts at 1
    ).toDF("user_id", "ts", "tag")
    val got = Relational.sessionize(ev, col("user_id"), col("ts"), gapSeconds = 1800L)
      .select(col("tag"), col("session_idx")).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 2L, "f" -> 1L))
  }

  test("pointInIntervalJoin matches the naive theta-join, no duplicate pairs") {
    // intervals: overlapping, multi-bucket (width 1h vs 5h span), adjacent
    val iv = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 05:00:00")),
      (11L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")), // nested in 10
      (12L, ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00"))  // shares boundary with 10
    ).toDF("iv_id", "s", "e")
    val pts = Seq(
      (1L, ts("2023-12-31 23:59:59")), // before everything
      (2L, ts("2024-01-01 00:00:00")), // inclusive start
      (3L, ts("2024-01-01 03:30:00")), // inside 10 and 11
      (4L, ts("2024-01-01 05:00:00")), // boundary of 10 AND start of 12
      (5L, ts("2024-01-01 07:00:00"))  // after everything
    ).toDF("pt_id", "p")
    val got = Relational.pointInIntervalJoin(pts, "p", iv, "s", "e",
        bucketWidthUs = 3600L * 1000000L)
      .select(col("pt_id"), col("iv_id")).as[(Long, Long)].collect().sorted
    val want = pts.join(iv, col("p") >= col("s") && col("p") <= col("e"))
      .select(col("pt_id"), col("iv_id")).as[(Long, Long)].collect().sorted
    assert(got.sameElements(want))
    assert(got.toSeq == Seq((2L, 10L), (3L, 10L), (3L, 11L), (4L, 10L), (4L, 12L)))
  }

  test("tfidfTopTerms: integer rank order, hand-checked tf/df, k bound") {
    graft.plans.GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "cat cat dog fish"),   // tf: cat 2, dog 1, fish 1
      (2L, "dog dog dog"),
      (3L, "cat bird"),
      (4L, "")                     // empty: no rows, still counts toward N
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, col("doc_id"), col("text"), k = 2)
      .orderBy(col("doc_id"), col("rank"))
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df_docs"))
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    // doc1: cat(tf2) first; tie tf=1 between dog(df2)/fish(df1) → fish (df asc)
    assert(out == Seq(
      (1L, 1L, "cat", 2L, 2L), (1L, 2L, "fish", 1L, 1L),
      (2L, 1L, "dog", 3L, 2L),
      (3L, 1L, "bird", 1L, 1L), (3L, 2L, "cat", 1L, 2L)))
    // tfidf value: cat in doc1 = 2 * ln(4/2)
    val tfidf = TextAnalysis.tfidfTopTerms(docs, col("doc_id"), col("text"), k = 2)
      .filter(col("doc_id") === 1 && col("term") === "cat")
      .select(col("tfidf")).as[Double].head()
    assert(math.abs(tfidf - math.rint(2.0 * math.log(2.0) * 1e6) / 1e6) < 1e-9)
  }

  test("withGlobalRank/globalNtile agree with Spark's own window forms") {
    // the distributed two-phase rank must be indistinguishable from
    // row_number()/ntile() over a single-partition window (which is what
    // it replaces at scale); 23 rows across 10 buckets exercises the
    // uneven first-r-buckets sizing, dup values exercise the tie-break
    val df = Seq.tabulate(23)(i => ((i * 7) % 13, i.toLong)).toDF("v", "id")
    val sort = Seq(col("v").desc, col("id"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(sort: _*)
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("bucket", ntile(10).over(w).cast("long"))
      .select(col("id"), col("rank"), col("bucket"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val viaOps = Relational.globalNtile(df, sort, 10)
      .join(Relational.withGlobalRank(df, sort), Seq("id", "v"))
      .select(col("id"), col("rank"), col("bucket"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(viaOps == viaWindow)
  }

  test("globalNtile: fewer rows than buckets → one row per bucket") {
    val df = Seq(5L, 3L, 9L).toDF("v")
    val got = Relational.globalNtile(df, Seq(col("v")), 10)
      .select(col("v"), col("bucket")).as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 1L), (5L, 2L), (9L, 3L)))
  }

  test("stratifiedSample: deterministic membership, per-stratum rates, default") {
    graft.plans.GraftFunctions.register(spark)
    val docs = spark.range(2000)
      .select(col("id").as("doc_id"),
        when(col("id") % 3 === 0, "en").when(col("id") % 3 === 1, "de")
          .otherwise("fr").as("lang"))
    def run() = TextAnalysis.stratifiedSample(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.5, "de" -> 0.2), default = 0.0)
    val a = run().select(col("doc_id")).as[Long].collect().sorted.toSeq
    val b = run().select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(a == b, "same rows must be kept on every run")
    val byLang = run().groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    assert(!byLang.contains("fr"), "default 0.0 must drop the unlisted stratum")
    assert(math.abs(byLang("en") / 667.0 - 0.5) < 0.1, s"en rate ${byLang("en")}/667")
    assert(math.abs(byLang("de") / 667.0 - 0.2) < 0.1, s"de rate ${byLang("de")}/667")
  }

  test("unigramSurprisal: closed-form mean NLL on a two-term corpus") {
    // corpus: a a a b → p(a)=3/4, p(b)=1/4
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_terms"), col("avg_nll"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 3L), (2L, 1L)))
    assert(math.abs(got(0)._3 - math.rint(math.log(4.0 / 3.0) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got(1)._3 - 1.386294) < 1e-9) // rounded ln 4
  }
}
