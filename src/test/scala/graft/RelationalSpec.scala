package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** D1/D4/D5/D6/C1/E3/E5/H1 column-expression semantics
  * (reference: `/root/reference/dataflow_pipeline.py`, `app.py`). */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("D1 windowing: clip, scale, truncate (wc=100, ww=80)") {
    val df = Seq(50.0, 60.0, 100.0, 140.0, 200.0).toDF("v")
      .select(Relational.windowIntensity(col("v"), lit(100.0), lit(80.0)).as("w"))
    // low=60, high=140: 50→0 (clipped), 60→0, 100→floor(127.5)=127, 140→255, 200→255
    assert(df.as[Long].collect().toSeq == Seq(0L, 0L, 127L, 255L, 255L))
  }

  test("D5 min-max normalize: constant group guarded by epsilon (no div-by-zero)") {
    val df = Seq(("a", 7.0), ("a", 7.0), ("b", 0.0), ("b", 255.0)).toDF("g", "v")
      .select(col("g"), Relational.minMaxNormalize(col("v"), col("g")).as("n"))
    val m = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    // constant group → (v-min)=0 → 0; b spans 0..255 → 0 and 255
    assert(m == Seq(("a", 0L), ("a", 0L), ("b", 0L), ("b", 255L)))
  }

  test("D6 patient hash: sha256 prefix, '' and NULL → NULL") {
    val df = Seq(Some("abc"), Some(""), None).toDF("pid")
      .select(Relational.patientIdHash(col("pid")).as("h"))
    val out = df.collect().map(r => Option(r.getString(0)))
    // sha256("abc") = ba7816bf8f01cfea414140de5dae2223...
    assert(out(0).contains("ba7816bf8f01cfea"))
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  test("C1 nullifEmpty coerces '' to NULL and keeps values") {
    val df = Seq("x", "").toDF("s").select(Relational.nullifEmpty(col("s")).as("s"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq == Seq(Some("x"), None))
  }

  test("D9 derived URI strips extension and trailing prefix slashes") {
    val df = Seq("scan.v2.dcm").toDF("f")
      .select(Relational.derivedUri("out/processed//", col("f")).as("u"))
    assert(df.as[String].head() == "out/processed/scan.v2.png")
  }

  test("D4 grayscale: OpenCV weights, rounded") {
    val df = Seq((100, 100, 100), (255, 0, 0)).toDF("r", "g", "b")
      .select(Relational.grayscale(col("r"), col("g"), col("b")).as("gy"))
    assert(df.as[Long].collect().toSeq == Seq(100L, 76L)) // 255*0.299=76.245→76
  }

  test("E3 histogram: numpy closed last bin") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val h = Relational.histogramAuto(df, col("v"), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // width 10: bins 0..8 get 10 each, last bin [90,100] closed gets 11
    assert(h(0L) == 10L && h(9L) == 11L && h.values.sum == 101L)
  }

  test("E5 argmax: row-major first-occurrence tie-break") {
    val df = Seq((0, 5, 9), (1, 1, 9), (1, 0, 9)).toDF("y", "x", "v")
    val r = Relational.argmaxPixel(df, col("v"), col("y"), col("x")).head()
    assert((r.getInt(0), r.getInt(1)) == (0, 5))
  }

  test("D13 binarize255 and D10 overlay saturate") {
    val df = Seq((250L, true), (10L, false)).toDF("v", "m")
      .select(Relational.overlayChannel(col("v"), col("m"), 255.0, 0.5).as("o"),
        Relational.binarize255(col("v")).as("b"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 255L) // 250+127.5 saturates
    assert(rows(1).getLong(0) == 10L)  // out-of-mask unchanged
    assert(rows(0).getLong(1) == 255L && rows(1).getLong(1) == 255L)
  }

  test("asofJoin: latest earlier right row per key; equal ts matches; no-match is null") {
    val left = Seq(
      (1L, 100L, 10L), // after right rows at 5 and 10 → matches ts=10 (equal ts counts)
      (1L, 101L, 7L),  // between 5 and 10 → matches ts=5
      (1L, 102L, 3L),  // before every right row → null
      (2L, 103L, 50L)) // key with no right rows at all → null
      .toDF("user_id", "event_id", "ts")
    val right = Seq((1L, 900L, 5L, 0.5), (1L, 901L, 10L, 0.9))
      .toDF("user_id", "r_id", "ts", "score")
    val got = Relational.asofJoin(left, right, "user_id", "ts")
      .select(col("event_id"),
        col("asof.r_id").as("r_id"), col("asof.score").as("score"))
      .orderBy(col("event_id"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq(
      (100L, Some(901L), Some(0.9)),
      (101L, Some(900L), Some(0.5)),
      (102L, None, None),
      (103L, None, None)))
  }

  test("asofJoin: NULL keys never match (SQL join equality), left nulls survive") {
    val left = Seq(
      (Some(1L), 100L, 10L),      // normal match
      (None: Option[Long], 101L, 10L)) // null key → must NOT take the null-keyed right row
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (Some(1L), 900L, 5L),
      (None: Option[Long], 901L, 5L)) // null-keyed right row: matchable by nothing
      .toDF("user_id", "r_id", "ts")
    val got = Relational.asofJoin(left, right, "user_id", "ts")
      .select(col("event_id"), col("asof.r_id").as("r_id"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got.toSeq == Seq((100L, Some(900L)), (101L, None)),
      s"null keys must never match: ${got.toSeq}")
  }

  test("sessionPaths: trigrams within sessions only; gaps split sequences") {
    // u1: A,B,C,D at 0/60/120/180s (one session) → A>B>C, B>C>D.
    // u2: A,B then a 10h gap, then C,D,E → only C>D>E (gap splits).
    val ev = Seq(
      (1L, 1L, "A", 0L), (1L, 2L, "B", 60L), (1L, 3L, "C", 120L), (1L, 4L, "D", 180L),
      (2L, 5L, "A", 0L), (2L, 6L, "B", 60L),
      (2L, 7L, "C", 36060L), (2L, 8L, "D", 36120L), (2L, 9L, "E", 36180L))
      .toDF("user_id", "event_id", "event_type", "s")
      .withColumn("ts", timestamp_seconds(col("s")))
    val r = Relational.sessionPaths(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), gapSeconds = 21600L, n = 3, k = 20)
      .collect().map(x => (x.getAs[String]("path"), x.getAs[Long]("n_occurrences")))
    assert(r.toSeq == Seq(("A>B>C", 1L), ("B>C>D", 1L), ("C>D>E", 1L)), r.toSeq)
  }

  test("ewmaRecent: oldest-first halving fold; k bounds the window to the newest") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      // user 1: values 1, 2, 4 in time order
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 10L, 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 11L, 2.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 12L, 4.0),
      // user 2: single event -> ewma = value
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 20L, 7.5)
    ).toDF("user_id", "ts", "event_id", "value")
    // full history: s = ((1 + 2)/2 + 4)/2 = 2.75
    val full = operators.Relational.ewmaRecent(df, col("user_id"), col("ts"),
      col("event_id"), col("value"), k = 64).orderBy("user_id").collect()
    assert(full.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 3L, 2.75), (2L, 1L, 7.5)))
    // k = 2 keeps only the newest two: s = (4 + 2)/2 = 3.0
    val k2 = operators.Relational.ewmaRecent(df, col("user_id"), col("ts"),
      col("event_id"), col("value"), k = 2).orderBy("user_id").collect()
    assert(k2.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2L, 3.0), (2L, 1L, 7.5)))
  }

  test("funnelCounts: strict in-order progression, same-ts excluded") {
    // u1 completes the funnel in order; u2's purchase precedes its click
    // (view@2 → click@3 → no purchase after 3); u3's click is SIMULTANEOUS
    // with its view (strict > excludes it); u4 never views.
    val ev = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (2L, "purchase", 1L), (2L, "view", 2L), (2L, "click", 3L),
      (3L, "view", 1L), (3L, "click", 1L),
      (4L, "click", 5L), (4L, "purchase", 6L))
      .toDF("user_id", "event_type", "s")
      .withColumn("ts", timestamp_seconds(col("s")))
    val r = Relational.funnelCounts(ev, col("user_id"), col("event_type"),
        col("ts"), Seq("view", "click", "purchase"))
      .collect().map(x => (x.getAs[Int]("stage_idx"), x.getAs[String]("stage"),
        x.getAs[Long]("n_users")))
    assert(r.toSeq == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)), r.toSeq)
  }
}
