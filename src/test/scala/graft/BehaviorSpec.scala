package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dedup
import graft.operators.{Behavior, Linkage}

/** Hand-computed contracts for the behavioral-analytics operators, the
  * prefix-filtering similarity join (including the exact-threshold
  * boundary the float formulation would lose), and blocked fuzzy linkage.
  */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("markovTransitions: per-user successor counts and integer micro-probabilities") {
    // user 1: a->b->a->c   user 2: b->a   (ties impossible: distinct ts)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "a"),
      (1L, ts("2024-01-01 00:03:00"), 4L, "c"),
      (2L, ts("2024-01-01 00:00:30"), 5L, "b"),
      (2L, ts("2024-01-01 00:01:30"), 6L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.markovTransitions(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .orderBy(col("event_type"), col("next_type"))
      .as[(String, String, Long, Long)].collect().toSeq
    // transitions: a->b (u1), b->a (u1, u2), a->c (u1)
    assert(got === Seq(
      ("a", "b", 1L, 500000L),
      ("a", "c", 1L, 500000L),
      ("b", "a", 2L, 1000000L)))
  }

  test("markovTransitions: same-timestamp ties resolved by the tie column") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.markovTransitions(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", "b", 1L, 1000000L)))
  }

  test("rollingActiveUsers: DAU, trailing WAU, stickiness on a crafted week") {
    // day 1: users {1,2}; day 3: {2}; day 9: {3} (outside day 3's window)
    val ev = Seq(
      (1L, ts("2024-01-01 05:00:00")), (2L, ts("2024-01-01 06:00:00")),
      (2L, ts("2024-01-01 07:00:00")), // same user+day dedups
      (2L, ts("2024-01-03 05:00:00")),
      (3L, ts("2024-01-09 05:00:00"))
    ).toDF("user_id", "ts")
    val got = Behavior.rollingActiveUsers(ev, col("user_id"), col("ts"), 7)
      .orderBy(col("day"))
      .select(date_format(col("day"), "yyyy-MM-dd"), col("dau"), col("wau"),
        col("stickiness_micro"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 2L, 2L, 1000000L),
      // window Dec 28..Jan 3 holds users {1,2} from day 1 plus {2} -> wau 2
      ("2024-01-03", 1L, 2L, 500000L),
      // Jan 3 is 6 days before Jan 9 -> user 2 in window with user 3
      ("2024-01-09", 1L, 2L, 500000L)))
  }

  test("coOccurrencePairs: per-user distinct pairing with side totals") {
    val ev = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"), // dup (1,a) must not double-count
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "b")
    ).toDF("user_id", "event_type")
    val got = Behavior.coOccurrencePairs(ev, col("user_id"), col("event_type"), 10)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", "b", 2L, 2L, 3L),   // users 1,2; a:{1,2} b:{1,2,3}
      ("a", "c", 1L, 2L, 1L),
      ("b", "c", 1L, 3L, 1L)))
  }

  test("robustAnomalyProfile: exact median/MAD and the robust outlier count") {
    val ev = Seq(("t", 1.0), ("t", 2.0), ("t", 3.0), ("t", 100.0))
      .toDF("event_type", "value")
    val got = Behavior.robustAnomalyProfile(ev, col("event_type"), col("value"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // median 2.5; deviations [1.5,0.5,0.5,97.5] -> MAD 1.0;
    // cutoff 3.5*1.4826*1.0 = 5.1891 -> only 100.0 flagged
    assert(got === Seq(("t", 4L, 1L, 2500000L, 1000000L)))
  }

  test("robustAnomalyProfile: a mean/stddev z-score would mask what MAD flags") {
    // one extreme value inflates stddev enough that |x-mean| < 3*sd for
    // every point — a single outlier among n points has z ≤ (n−1)/√n ≈ √n,
    // so at n=9 the classical test CANNOT reach 3σ no matter how extreme
    // the outlier. The robust profile still flags it.
    val vals = Seq.fill(8)(10.0) :+ 1000.0
    val ev = vals.map(("t", _)).toDF("event_type", "value")
    val stats = ev.agg(avg("value"), stddev_pop("value")).as[(Double, Double)].head()
    val maskedByZ = vals.count(v => math.abs(v - stats._1) > 3 * stats._2) == 0
    assert(maskedByZ, "fixture must defeat the classical z-score")
    val got = Behavior.robustAnomalyProfile(ev, col("event_type"), col("value"))
      .as[(String, Long, Long, Long, Long)].head()
    assert(got._3 === 1L, "MAD profile must flag the extreme value")
  }

  test("prefixFilterJoin: equals the dense brute-force pair set (lossless pruning)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),      // near-dup of 1
      (3L, "alpha beta gamma delta epsilon zeta"),     // exact dup of 1
      (4L, "one two three four five six seven"),
      (5L, "totally different words here entirely now")
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJoin(docs, col("doc_id"), col("text"), 0.5, 3)
      .select(col("id1"), col("id2"), col("jaccard_micro"))
      .orderBy(col("id1"), col("id2"))
      .as[(Long, Long, Long)].collect().toSeq
    // brute force: all pairs, exact integer predicate
    val sh = Dedup.docShingles(docs, col("doc_id"), col("text"), 3)
    val ids = docs.select(col("doc_id"))
    val dense = ids.select(col("doc_id").as("id1"))
      .join(ids.select(col("doc_id").as("id2")), col("id1") < col("id2"))
    val expect = Dedup.verifyJaccard(dense, sh)
      .filter(col("inter") * 1000000L >= lit(500000L) * (col("sz1") + col("sz2") - col("inter")))
      .select(col("id1"), col("id2"),
        ((col("inter") * 1000000L - pmod(col("inter") * 1000000L,
            col("sz1") + col("sz2") - col("inter")))
          / (col("sz1") + col("sz2") - col("inter"))).cast("long"))
      .orderBy(col("id1"), col("id2"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(expect.nonEmpty && got === expect)
    assert(got.exists(_._3 == 1000000L), "exact dup pair must score 1.0")
  }

  test("prefixFilterJoin: lossless on seeded random corpora across thresholds") {
    // Randomized sweep of the lossless-pruning property: seeded corpora
    // of overlapping word sets (so near-threshold pairs actually occur),
    // three thresholds including awkward ones (1/3 is inexpressible in
    // binary; .5 and .85 hit ceil boundaries). Every corpus × threshold
    // must reproduce the dense brute-force pair set EXACTLY — missing
    // pair = pruning bug, extra pair = verification bug.
    val rng = new scala.util.Random(20260814L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    for (trial <- 1 to 3; threshold <- Seq(1.0 / 3, 0.5, 0.85)) {
      val docs = (1L to 12L).map { id =>
        val n = 3 + rng.nextInt(6)
        (id, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).distinct.mkString(" "))
      }.toDF("doc_id", "text")
      val got = Dedup.prefixFilterJoin(docs, col("doc_id"), col("text"), threshold, 1)
        .select(col("id1"), col("id2"), col("jaccard_micro"))
        .orderBy(col("id1"), col("id2"))
        .as[(Long, Long, Long)].collect().toSeq
      val tMicro = math.round(threshold * 1e6)
      val sh = Dedup.docShingles(docs, col("doc_id"), col("text"), 1)
      val ids = docs.select(col("doc_id"))
      val dense = ids.select(col("doc_id").as("id1"))
        .join(ids.select(col("doc_id").as("id2")), col("id1") < col("id2"))
      val expect = Dedup.verifyJaccard(dense, sh)
        .filter(col("inter") * 1000000L >= lit(tMicro) * (col("sz1") + col("sz2") - col("inter")))
        .select(col("id1"), col("id2"),
          ((col("inter") * 1000000L - pmod(col("inter") * 1000000L,
              col("sz1") + col("sz2") - col("inter")))
            / (col("sz1") + col("sz2") - col("inter"))).cast("long"))
        .orderBy(col("id1"), col("id2"))
        .as[(Long, Long, Long)].collect().toSeq
      assert(got === expect,
        s"trial $trial t=$threshold: prefix join diverged from brute force — " +
          s"missing ${expect.diff(got)}, extra ${got.diff(expect)}")
      GraftCaches.unpersistAll()
    }
  }

  test("prefixFilterJoin: keeps a pair at EXACTLY the threshold (float ceil would drop it)") {
    // 1-shingles: A={a,b,c,d} (sz 4), B={a,b,c,d,e} (sz 5): J = 4/5 = 0.8.
    // With t=0.8 the exact prefix for B keeps 5-4+1=2 shingles; the
    // double-arithmetic form ceil(0.8*5)=ceil(4.0000000000000004)=5 keeps
    // only 1 — and B's rarest shingle 'e' is not in A, so the buggy
    // prefix misses the pair entirely.
    val docs = Seq((1L, "a b c d"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJoin(docs, col("doc_id"), col("text"), 0.8, 1)
      .select(col("id1"), col("id2"), col("inter"), col("jaccard_micro"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 4L, 800000L)))
  }

  test("blockedNameMatches: per-block audit counts; singleton blocks surface") {
    val recs = Seq(
      (1L, "red ring"), (2L, "hot ring"), (3L, "red ring"),
      (4L, "small widget")
    ).toDF("id", "name")
    val got = Linkage.blockedNameMatches(recs, col("id"), col("name"),
        "(\\S+)$", maxDist = 3)
      .orderBy(col("block_key"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // ring block: 3 records, 3 pairs; lev(red,hot)=3 twice -> 3 matches
    // (incl. the exact dup), 1 exact; widget: singleton, zero pairs
    assert(got === Seq(
      ("ring", 3L, 3L, 3L, 1L),
      ("widget", 1L, 0L, 0L, 0L)))
  }

  test("matchPairs: distance is over the full name, blocking only prunes") {
    val recs = Seq((1L, "aa zz"), (2L, "bb zz")).toDF("id", "name")
    val got = Linkage.matchPairs(recs, col("id"), col("name"), "(\\S+)$")
      .select(col("distance")).as[Int].collect().toSeq
    assert(got === Seq(2))
  }

  test("blockedNameMatches: distinct-name rewrite equals record-level pairing") {
    // heavy duplication + multi-block + singleton: the shapes the rewrite
    // must weight correctly (n·m cross pairs, C(n,2) same-name pairs)
    val recs = (1L to 5L).map((_, "red ring")) ++
      (6L to 8L).map((_, "hot ring")) ++
      Seq((9L, "blue spanner ring"), (10L, "small widget"))
    val df = recs.toDF("id", "name")
    val got = Linkage.blockedNameMatches(df, col("id"), col("name"),
        "(\\S+)$", maxDist = 3)
      .orderBy(col("block_key"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // record-level recount from matchPairs — the semantics being preserved
    val pairs = Linkage.matchPairs(df, col("id"), col("name"), "(\\S+)$")
    val expect = df
      .select(regexp_extract(col("name"), "(\\S+)$", 1).as("block_key"))
      .groupBy("block_key").agg(count(lit(1)).as("n_records"))
      .join(pairs.groupBy(col("block_key"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("distance") <= 3, 1L).otherwise(0L)).as("n_matches"),
          sum(when(col("distance") === 0, 1L).otherwise(0L)).as("n_exact")),
        Seq("block_key"), "left")
      .na.fill(0L, Seq("n_pairs", "n_matches", "n_exact"))
      .orderBy(col("block_key"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // and the ring block's numbers are what hand-counting gives:
    // 9 records, C(9,2)=36 pairs, same-name C(5,2)+C(3,2)=13 exact,
    // cross red/hot 5*3=15 at lev 3 -> 13+15=28 matches
    assert(got.head === (("ring", 9L, 36L, 28L, 13L)))
  }
}
