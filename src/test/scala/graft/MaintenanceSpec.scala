package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Maintenance

/** CDC merge semantics and Morton z-value bit algebra. */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mergeCdc: delete removes, upsert replaces, insert adds, untouched survive") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val batch = Seq(
      (2L, "b2", 25.0, "u"), // update: full replacement row
      (3L, "c", 30.0, "d"),  // delete: payload ignored
      (9L, "z", 90.0, "u"))  // insert: unmatched upsert
      .toDF("k", "s", "v", "__op")
    val out = Maintenance.mergeCdc(target, batch, Seq("k"))
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (9L, "z", 90.0)))
  }

  test("mergeCdc refuses a source missing target payload columns") {
    val target = Seq((1L, "a")).toDF("k", "s")
    val batch = Seq((1L, "u")).toDF("k", "__op")
    val e = intercept[IllegalArgumentException] {
      Maintenance.mergeCdc(target, batch, Seq("k"))
    }
    assert(e.getMessage.contains("s"))
  }

  test("scd2Apply: closes open versions, chains batch versions, leaves the rest") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val hist = Seq(
      // key 1: one closed + one open version already
      (1L, 10.0, ts("2019-01-01"), Option(ts("2020-01-01"))),
      (1L, 11.0, ts("2020-01-01"), None),
      // key 2: open, untouched by the batch
      (2L, 20.0, ts("2020-01-01"), None))
      .toDF("k", "v", "valid_from", "valid_to")
    val batch = Seq(
      (1L, 12.0, ts("2021-01-01")), // two changes for key 1 in ONE batch
      (1L, 13.0, ts("2022-01-01")),
      (3L, 30.0, ts("2021-06-01"))) // brand-new key
      .toDF("k", "v", "eff")
    val out = Maintenance.scd2Apply(hist, batch, Seq("k"), "eff")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getTimestamp(2).toString.take(10),
        Option(r.getTimestamp(3)).map(_.toString.take(10))))
      .toSeq.sortBy(t => (t._1, t._3))
    assert(out == Seq(
      (1L, 10.0, "2019-01-01", Some("2020-01-01")), // already closed: kept
      (1L, 11.0, "2020-01-01", Some("2021-01-01")), // open: closed at first change
      (1L, 12.0, "2021-01-01", Some("2022-01-01")), // chained within batch
      (1L, 13.0, "2022-01-01", None),               // new current
      (2L, 20.0, "2020-01-01", None),               // untouched key: still open
      (3L, 30.0, "2021-06-01", None)))              // new key: one open version
  }

  test("scd2Apply refuses changes missing history payload columns") {
    val hist = Seq((1L, 1.0, new java.sql.Timestamp(0), None: Option[java.sql.Timestamp]))
      .toDF("k", "v", "valid_from", "valid_to")
    val batch = Seq((1L, new java.sql.Timestamp(1))).toDF("k", "eff")
    val e = intercept[IllegalArgumentException] {
      Maintenance.scd2Apply(hist, batch, Seq("k"), "eff")
    }
    assert(e.getMessage.contains("v"))
  }

  test("zValue interleaves bits exactly (vs a loop reference), zBucket takes top bits") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((3L, 5L), (0L, 0L), (1023L, 0L), (0L, 1023L),
      (682L, 341L), (1023L, 1023L), (511L, 512L))
    val df = cases.toDF("x", "y")
      .select(Maintenance.zValue(col("x"), col("y"), 10).as("z"))
    val got = df.as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => ref(x, y, 10) })
    // hand-checked small case: x=3 (b011), y=5 (b101) → z = b100111 = 39
    assert(ref(3, 5, 3) == 39L)
    val zb = Seq((1023L, 1023L)).toDF("x", "y")
      .select(Maintenance.zBucket(
        Maintenance.zValue(col("x"), col("y"), 10), 10, 6).as("b"))
      .as[Long].head()
    assert(zb == 63L, "the max z-value must land in the last of 64 buckets")
  }

  test("zValue locality: points in the same 2^k-aligned tile share z-prefix buckets") {
    // every point of an aligned 128x128 tile must fall in ONE of 64 buckets
    // (tile = 7 free low bits per axis = 14 free z bits = exactly the
    // bucket granularity of zBucket(z, 10, 6))
    val pts = for (dx <- 0 until 128 by 31; dy <- 0 until 128 by 37)
      yield (256L + dx, 640L + dy)
    val n = pts.toDF("x", "y")
      .select(Maintenance.zBucket(
        Maintenance.zValue(col("x"), col("y"), 10), 10, 6).as("b"))
      .distinct().count()
    assert(n == 1L)
  }

  test("incrementalJoinDelta: base join + delta ≡ full recompute, disjointly") {
    // keys chosen so every term fires: k=1 old⋈old only, k=2 ΔA⋈B₀,
    // k=3 A₀⋈ΔB, k=4 ΔA⋈ΔB, k=5 delta-only on one side (no partner: drops)
    val aOld = Seq((1L, "a1"), (3L, "a3")).toDF("k", "av")
    val aNew = Seq((2L, "a2"), (4L, "a4"), (5L, "a5")).toDF("k", "av")
    val bOld = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    val bNew = Seq((3L, "b3"), (4L, "b4")).toDF("k", "bv")
    val maintained = aOld.join(bOld, Seq("k"))
      .unionByName(Maintenance.incrementalJoinDelta(aOld, aNew, bOld, bNew, Seq("k")))
      .as[(Long, String, String)].collect().toSeq.sorted
    val full = aOld.unionByName(aNew).join(bOld.unionByName(bNew), Seq("k"))
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(maintained === full)
    assert(maintained.map(_._1) === maintained.map(_._1).distinct,
      "terms must be disjoint — a dup row means double counting on refresh")
  }

  test("incrementalJoinDelta: fan-out keys multiply correctly across terms") {
    // 2 old + 1 delta A-rows against 1 old + 1 delta B-rows on one key:
    // full join has 3x2=6 pairs; base join has 2x1=2; delta must add 4
    val aOld = Seq((7L, "a1"), (7L, "a2")).toDF("k", "av")
    val aNew = Seq((7L, "a3")).toDF("k", "av")
    val bOld = Seq((7L, "b1")).toDF("k", "bv")
    val bNew = Seq((7L, "b2")).toDF("k", "bv")
    val delta = Maintenance.incrementalJoinDelta(aOld, aNew, bOld, bNew, Seq("k"))
    assert(delta.count() === 4L)
  }

  test("segmentChecksums: equal tables agree everywhere; one edit damages one segment") {
    graft.plans.GraftFunctions.register(spark)
    def sig(df: org.apache.spark.sql.DataFrame) = df.select(col("k"),
      call_function("graft_rolling_hash",
        md5(concat_ws("|", col("k").cast("string"), col("v")).cast("binary"))).as("s"))
    val base = (0L until 200L).map(i => (i, s"val$i")).toDF("k", "v")
    val same = Maintenance.segmentChecksums(sig(base), col("k"), col("s"), 8).as("a")
      .join(Maintenance.segmentChecksums(sig(base), col("k"), col("s"), 8).as("b"),
        Seq("bucket"))
      .filter(col("a.n_rows") =!= col("b.n_rows")
        || col("a.xor_sig") =!= col("b.xor_sig")
        || col("a.add_sig") =!= col("b.add_sig"))
    assert(same.count() === 0L)
    val edited = base.withColumn("v",
      when(col("k") === 42L, lit("tampered")).otherwise(col("v")))
    val damaged = Maintenance.segmentChecksums(sig(base), col("k"), col("s"), 8).as("a")
      .join(Maintenance.segmentChecksums(sig(edited), col("k"), col("s"), 8).as("b"),
        Seq("bucket"))
      .filter(col("a.xor_sig") =!= col("b.xor_sig")
        || col("a.add_sig") =!= col("b.add_sig"))
    assert(damaged.count() === 1L,
      "exactly the edited row's segment must flag — that's the re-transfer set")
  }

  test("segmentChecksums: a row inserted twice beats XOR cancellation via count+sum") {
    graft.plans.GraftFunctions.register(spark)
    def sig(df: org.apache.spark.sql.DataFrame) = df.select(col("k"),
      call_function("graft_rolling_hash",
        md5(concat_ws("|", col("k").cast("string"), col("v")).cast("binary"))).as("s"))
    val base = (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v")
    val dupRow = base.filter(col("k") === 7L)
    val withDups = base.unionByName(dupRow).unionByName(dupRow)
    val joined = Maintenance.segmentChecksums(sig(base), col("k"), col("s"), 4).as("a")
      .join(Maintenance.segmentChecksums(sig(withDups), col("k"), col("s"), 4).as("b"),
        Seq("bucket"))
    // the XOR of two extra identical rows cancels to the same signature…
    assert(joined.filter(col("a.xor_sig") =!= col("b.xor_sig")).count() === 0L)
    // …but the count and additive checksum both catch it
    assert(joined.filter(col("a.n_rows") =!= col("b.n_rows")).count() === 1L)
    assert(joined.filter(col("a.add_sig") =!= col("b.add_sig")).count() === 1L)
  }
}
