package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Similarity, TextAnalysis}

/** Repetition signals, benchmark decontamination, bigram surprisal, and
  * embedding dimension statistics (north-star corpus operators). */
class TextSignalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionSignals: hand-computed fractions, deterministic tie-breaks") {
    val docs = Seq(
      (1L, "a a a b"),       // top word a (3/4), bigrams: "a a"x2, "a b"x1
      (2L, "x y"),           // all distinct, tie on bigram count -> none to break
      (3L, "solo"),          // single token: no bigram -> '' / 0.0
      (4L, "t t")            // top bigram "t t": chars 2*1 / term_chars 2 = 1.0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(r.length == 4)
    val d1 = r(0)
    assert(d1.getAs[Long]("n_terms") == 4)
    assert(d1.getAs[Long]("dup_word_frac_e6") == 500000L) // 1 - 2/4
    assert(d1.getAs[String]("top_word") == "a")
    assert(d1.getAs[Long]("top_word_frac_e6") == 750000L)
    assert(d1.getAs[String]("top_bigram") == "a a")
    // 2 occurrences * 2 chars / 4 total term chars
    assert(d1.getAs[Long]("top_bigram_char_frac_e6") == 1000000L)
    val d2 = r(1)
    assert(d2.getAs[Long]("dup_word_frac_e6") == 0L)
    assert(d2.getAs[String]("top_word") == "x") // count tie -> lexicographic min
    val d3 = r(2)
    assert(d3.getAs[String]("top_bigram") == "" &&
      d3.getAs[Long]("top_bigram_char_frac_e6") == 0L)
    val d4 = r(3)
    assert(d4.getAs[Long]("top_bigram_char_frac_e6") == 1000000L)
  }

  test("repetitionSignals: empty docs emit no row; partitioning-invariant") {
    val docs = Seq((1L, ""), (2L, "  "), (3L, "w w w")).toDF("doc_id", "text")
    val r1 = TextAnalysis.repetitionSignals(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(r1.map(_.getLong(0)).toSeq == Seq(3L))
    val r7 = TextAnalysis.repetitionSignals(docs.repartition(7), col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(r1.map(_.toString).toSeq == r7.map(_.toString).toSeq)
  }

  test("decontaminationHits: only overlapping train docs, distinct shingles count once") {
    val eight = "q w e r t y u i"
    val docs = Seq(
      (0L, s"$eight tail tail"),                // bench
      (1L, s"head $eight"),                     // train: 1 distinct hit
      (2L, s"$eight mid $eight"),               // train: same shingle twice -> 1 hit
      (3L, "nothing shared here at all in this document"), // train: clean
      (4L, "short doc")                         // under n tokens: ignored
    ).toDF("doc_id", "text")
    val r = TextAnalysis.decontaminationHits(docs, col("doc_id"), col("text"),
        isBench = col("doc_id") === 0, n = 8)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("bloomDecontaminationHits: sketch-independent — equals the exact form on real data") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val isBench = col("doc_id") % 3 === 0
    val exact = TextAnalysis.decontaminationHits(docs, col("doc_id"), col("text"),
      isBench, n = 8).orderBy("doc_id").collect().toSeq
    // a sloppy 30% fpp floods the candidate set with false positives; the
    // confirm join must still strip every one of them
    for (fpp <- Seq(0.3, 0.01)) {
      val bloom = TextAnalysis.bloomDecontaminationHits(docs, col("doc_id"),
        col("text"), isBench, n = 8, fpp = fpp).orderBy("doc_id").collect().toSeq
      assert(bloom == exact, s"fpp=$fpp diverged from the exact containment join")
    }
    assert(exact.nonEmpty, "gate has no positives — split choice is vacuous")
    GraftCaches.unpersistAll()
  }

  test("bigramSurprisal: hand-computed conditional model, short docs dropped") {
    // corpus bigrams: "a b"x2, "a c"x1 -> c1(a)=3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramSurprisal(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(r.length == 3) // doc 4 has no bigrams
    // expected micro-nats: the engine's exact integer pipeline — quantize
    // each ln to nano-nats, then round-half-up the mean to micro-nats
    def e6(nll: Double, n: Long): Long = {
      val nllE9 = math.round(nll * 1e9) * n
      (2 * nllE9 + 1000 * n) / (2000 * n)
    }
    val nll12 = e6(math.log(3.0 / 2.0), 1L)
    val nll3 = e6(math.log(3.0), 1L)
    assert(r(0).getAs[Long]("avg_nll_e6") == nll12)
    assert(r(1).getAs[Long]("avg_nll_e6") == nll12)
    assert(r(2).getAs[Long]("avg_nll_e6") == nll3)
    assert(r.forall(_.getAs[Long]("n_bigrams") == 1L))
  }

  test("chunkTokens: window starts/lengths, short tail, hash pins text") {
    val docs = Seq((1L, "a b c d e f"), (2L, "solo"), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val r = TextAnalysis.chunkTokens(docs, col("doc_id"), col("text"),
        chunkLen = 4, stride = 2)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1 (6 tokens): starts 0,2,4; doc 2: one 1-token chunk; 3/4: empty
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("chunk_idx"),
        x.getAs[Long]("chunk_start"), x.getAs[Long]("n_chunk_tokens"),
        x.getAs[String]("chunk_text"))).toSeq == Seq(
      (1L, 0L, 0L, 4L, "a b c d"),
      (1L, 1L, 2L, 4L, "c d e f"),
      (1L, 2L, 4L, 2L, "e f"),
      (2L, 0L, 0L, 1L, "solo")))
    // chunk_hash must equal the portable HoF fold of the emitted text
    val hashed = TextAnalysis.chunkTokens(docs, col("doc_id"), col("text"), 4, 2)
      .withColumn("__hof",
        TextAnalysis.rollingHashHofFromNormalized(col("chunk_text")))
    assert(hashed.filter(col("chunk_hash") =!= col("__hof")).isEmpty)
  }

  test("chunkTokens: stride == chunkLen partitions tokens without overlap") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.chunkTokens(docs, col("doc_id"), col("text"),
        chunkLen = 4, stride = 4)
      .orderBy("chunk_idx").collect()
    assert(r.map(_.getAs[Long]("n_chunk_tokens")).sum == 10L)
    assert(r.map(_.getAs[String]("chunk_text")).mkString(" ") ==
      (1 to 10).map(i => s"t$i").mkString(" "))
  }

  test("debounce: keeps firsts and post-gap rows, key-scoped, tie-safe") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, 10L, "a", ts(0)),    // first for (10,a): keep
      (2L, 10L, "a", ts(30)),   // 30s later: drop at 60s gap
      (3L, 10L, "a", ts(100)),  // 70s after previous ROW (not previous kept): keep
      (4L, 10L, "b", ts(31)),   // different type: its own first: keep
      (5L, 11L, "a", ts(32))    // different user: keep
    ).toDF("event_id", "user_id", "event_type", "ts")
    val kept = graft.operators.Relational.debounce(ev,
        keys = Seq(col("user_id"), col("event_type")),
        ts = col("ts"), tie = col("event_id"), minGapSeconds = 60L)
      .select("event_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("scalarQuantError: exact range endpoints quantize losslessly, constant dim is zero-error") {
    val emb = Seq(
      (1L, Seq(0.0f, 7.0f)),
      (2L, Seq(255.0f, 7.0f)),
      (3L, Seq(51.0f, 7.0f))).toDF("vec_id", "embedding")
    val r = Similarity.scalarQuantError(emb, col("embedding")).orderBy("dim").collect()
    // dim 1: range [0,255] -> codes 0/255/51 reconstruct exactly
    assert(r(0).getAs[Double]("dim_min") == 0.0 && r(0).getAs[Double]("dim_max") == 255.0)
    assert(r(0).getAs[Double]("avg_abs_err") == 0.0 && r(0).getAs[Double]("max_abs_err") == 0.0)
    // dim 2: constant -> guarded, zero error (never 0/0)
    assert(r(1).getAs[Double]("avg_abs_err") == 0.0 && r(1).getAs[Double]("max_abs_err") == 0.0)
  }

  test("packSequences: greedy next-fit per shard, oversize doc isolated, partitioning-invariant") {
    // one shard (ids all even, shards=2 -> shard 0): budget 100
    val docs = Seq(
      (0L, 60L),   // bin 1 (fill 60)
      (2L, 50L),   // 60+50 > 100 -> bin 2 (fill 50)
      (4L, 40L),   // 90 -> bin 2
      (6L, 300L),  // oversize -> bin 3 alone
      (8L, 10L),   // 300+10 > 100 -> bin 4
      (3L, 70L)    // shard 1 resets: bin 1
    ).toDF("doc_id", "n")
    val r = graft.functions.TextAnalysis.packSequences(docs, col("doc_id"), col("n"),
        maxLen = 100, shards = 2)
      .select("doc_id", "shard", "seq_idx").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(r == Seq((0L, 0L, 1L), (2L, 0L, 2L), (3L, 1L, 1L), (4L, 0L, 2L),
      (6L, 0L, 3L), (8L, 0L, 4L)))
    val r7 = graft.functions.TextAnalysis.packSequences(docs.repartition(7), col("doc_id"),
        col("n"), maxLen = 100, shards = 2)
      .select("doc_id", "shard", "seq_idx").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(r7 == r)
  }

  test("unigramDrift: hand-computed smoothed KL contributions over the union vocab") {
    // A = {a, a, b}, B = {a, c}; vocab = {a,b,c}, nA=3, nB=2
    val docs = Seq((0L, "a a b"), (1L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramDrift(docs, col("text"), inA = col("doc_id") % 2 === 0)
      .orderBy("term").collect()
    assert(r.length == 3)
    def kl(ca: Long, cb: Long): Double = {
      val pa = (ca + 1.0) / 6.0; val pb = (cb + 1.0) / 5.0
      BigDecimal(pa * math.log(pa / pb))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val a = r(0)
    assert(a.getAs[String]("term") == "a" && a.getAs[Long]("c_a") == 2 && a.getAs[Long]("c_b") == 1)
    assert(a.getAs[Double]("kl_term_ab") == kl(2, 1))
    val b = r(1) // absent from B: smoothing keeps it finite
    assert(b.getAs[Long]("c_b") == 0 && b.getAs[Double]("kl_term_ab") == kl(1, 0))
    val c = r(2)
    assert(c.getAs[Long]("c_a") == 0 && c.getAs[Double]("kl_term_ab") == kl(0, 1))
  }

  test("gapFillDaily: dense grid, zero-filled counts, forward-filled sums") {
    import java.sql.Timestamp
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val ev = Seq(
      (1L, ts(1, 5), 2.0), (1L, ts(1, 9), 3.0), // day 1: n=2, sum 5
      (1L, ts(4, 1), 7.0),                      // days 2-3 silent, day 4: sum 7
      (2L, ts(2, 0), 1.0)                       // key 2: single day
    ).toDF("user_id", "ts", "value")
    val r = graft.operators.Relational.gapFillDaily(ev, col("user_id"), col("ts"), col("value"))
      .orderBy("key", "bucket")
      .select("key", "n_events", "filled_sum").as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      (1L, 2L, 5.0), (1L, 0L, 5.0), (1L, 0L, 5.0), (1L, 1L, 7.0),
      (2L, 1L, 1.0)))
  }

  test("pageRank: path-graph ordering, total mass conserved, partitioning-invariant") {
    // path 1-2-3: middle node collects from both ends
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val r = graft.functions.Dedup.pageRank(edges, iterations = 5)
      .orderBy("doc_id").collect()
    val ranks = r.map(_.getAs[Double]("rank"))
    assert(r.length == 3)
    assert(ranks(1) > ranks(0) && ranks(1) > ranks(2), "middle of the path must rank highest")
    assert(math.abs(ranks.sum - 1.0) < 1e-6, s"rank mass drifted: ${ranks.sum}")
    assert(math.abs(ranks(0) - ranks(2)) < 1e-12, "symmetric ends must tie")
    val r7 = graft.functions.Dedup.pageRank(edges.repartition(5), iterations = 5)
      .orderBy("doc_id").collect().map(_.getAs[Double]("rank"))
    assert(r7.toSeq == ranks.toSeq)
  }

  test("moving average over a gap-filled series: frame covers exactly the last 7 buckets") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // one event per day with value = day index; gaps absent
    val ev = (1 to 10).map(d => (1L, ts(d), d.toDouble)).toDF("user_id", "ts", "value")
    val daily = graft.operators.Relational.gapFillDaily(ev, col("user_id"), col("ts"), col("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bucket")).rowsBetween(-6, 0)
    val ma = daily.select(col("bucket"), round(avg(col("filled_sum")).over(w), 6).as("ma7"))
      .orderBy("bucket").select("ma7").as[Double].collect()
    assert(ma(0) == 1.0)            // first day: itself
    assert(ma(6) == 4.0)            // days 1..7 -> mean 4
    assert(ma(9) == 7.0)            // days 4..10 -> mean 7 (frame slid)
  }

  test("embedding covariance: diagonal is the variance, matrix upper-triangular") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 2.0f)), (3L, Seq(5.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val r = SparkEntry.queries("emb_covariance")(spark, "/root/testdata/sf0.001")
    assert(r.columns.toSeq == Seq("i", "j", "n_vecs", "cov", "corr"))
    // hand case through the same shape on a local frame
    val e = emb.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("d0", "x")))
      .select(col("vec_id"), (col("d0") + 1).as("i"), col("x"))
    val e2 = e.select(col("vec_id"), col("i").as("j"), col("x").as("y"))
    val m = e.join(e2, "vec_id").filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(round(covar_pop(col("x"), col("y")), 9).as("cov"))
      .orderBy("i", "j").collect()
    val byPair = m.map(r0 => ((r0.getInt(0), r0.getInt(1)), r0.getDouble(2))).toMap
    assert(math.abs(byPair((1, 1)) - 8.0 / 3.0) < 1e-9) // var of {1,3,5} = 8/3
    assert(byPair((2, 2)) == 0.0)                      // constant dim
    assert(byPair((1, 2)) == 0.0)                      // cov with a constant
    assert(m.forall(r0 => r0.getInt(0) <= r0.getInt(1)))
  }

  test("gram covariance: one-pass matrix equals the pair-join form, " +
      "zero-variance corr is null, partitioning-invariant") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f, -1.5f)), (2L, Seq(3.0f, 2.0f, 0.5f)),
      (3L, Seq(5.0f, 2.0f, 4.25f)), (4L, Seq(-2.0f, 2.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val gram = Similarity.covarianceMatrixGram(emb, col("embedding"))
      .orderBy("i", "j").collect()
    // pair-join reference (the emb_covariance shape) on the same frame
    val e = emb.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("d0", "x")))
      .select(col("vec_id"), (col("d0") + 1).as("i"), col("x"))
    val e2 = e.select(col("vec_id"), col("i").as("j"), col("x").as("y"))
    val ref = e.join(e2, "vec_id").filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_vecs"),
        round(covar_pop(col("x"), col("y")), 9).as("cov"),
        // corr() divides by zero on the constant dim under ANSI - guard
        round(when(stddev_pop(col("x")) * stddev_pop(col("y")) === 0.0, lit(null))
          .otherwise(covar_pop(col("x"), col("y"))
            / (stddev_pop(col("x")) * stddev_pop(col("y")))), 6).as("corr"))
      .orderBy("i", "j").collect()
    assert(gram.length == 6 && ref.length == 6) // upper triangle of d=3
    gram.zip(ref).foreach { case (g, r) =>
      assert(g.getInt(0) == r.getInt(0) && g.getInt(1) == r.getInt(1))
      assert(g.getLong(2) == r.getLong(2))
      assert(math.abs(g.getDouble(3) - r.getDouble(3)) < 1e-9)
      // dim 2 is constant: corr undefined -> gram NULL, Spark corr() NaN
      if (r.isNullAt(4) || r.getDouble(4).isNaN) assert(g.isNullAt(4))
      else assert(math.abs(g.getDouble(4) - r.getDouble(4)) < 1e-6)
    }
    // merge order must not change a single emitted value
    val repart = Similarity.covarianceMatrixGram(emb.repartition(7), col("embedding"))
      .orderBy("i", "j").collect()
    assert(repart.map(_.toString).toSeq == gram.map(_.toString).toSeq)
    // empty input -> empty matrix, no crash
    assert(Similarity.covarianceMatrixGram(
      emb.filter(col("vec_id") < 0), col("embedding")).count() == 0)
  }

  test("c4Filters: each rule fires on its own pathology; clean prose keeps") {
    val docs = Seq(
      (1L, "This is a clean, natural-language sentence with plenty of words."),
      (2L, "too short."),                                // < 5 words
      (3L, "this sentence simply never terminates properly"), // no terminal punct
      (4L, "Lorem ipsum dolor sit amet, consectetur adipiscing elit."),
      (5L, "A sentence with {template} braces in it, sadly."),
      (6L, "aaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbb cccccccccccccccc dddddddddddddddd eeeeeeeeeeeeeeee."),
      (7L, "It ends inside a quote, which still counts as terminal: \"done.\""))
      .toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.c4Filters(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    //            (id, short, nopunct, lorem, curly, longwords, keep)
    assert(got.toSeq == Seq(
      (1L, false, false, false, false, false, true),
      (2L, true,  false, false, false, false, false),
      (3L, false, true,  false, false, false, false),
      (4L, false, false, true,  false, false, false),
      (5L, false, false, false, true,  false, false),
      (6L, false, false, false, false, true,  false),
      (7L, false, false, false, false, false, true)), s"got ${got.toSeq}")
  }

  test("redactPii: email/phone/IP replaced in order; counts match; clean text untouched") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org or call 415-555-0123 from 10.0.0.1"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val (em, ph, ip) = TextAnalysis.piiCounts(col("text"))
    val got = docs.select(col("doc_id"), TextAnalysis.redactPii(col("text")).as("red"),
        em.as("e"), ph.as("p"), ip.as("i"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got(0) == ((1L, "mail me at <EMAIL> or call <PHONE> from <IP>", 1L, 1L, 1L)),
      s"got ${got(0)}")
    assert(got(1) == ((2L, "no pii here at all", 0L, 0L, 0L)))
  }

  test("bm25TopDocs: hand-computed scores on a 3-doc corpus, rarer term outweighs") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "data data data query"), // tf(data)=3, tf(query)=1, dl=4
      (2L, "data join"),            // tf(data)=1, tf(join)=1,  dl=2
      (3L, "other words entirely")) // dl=3, no query terms
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopDocs(docs, col("doc_id"), col("text"),
      Seq("data", "query", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def idf(n: Long, dft: Long): Double = math.log((n - dft + 0.5) / (dft + 0.5) + 1.0)
    def contrib(n: Long, dft: Long, tf: Long, dl: Long, avgdl: Double): Long =
      math.round(idf(n, dft) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6)
    val avgdl = 3.0 // (4 + 2 + 3) / 3
    assert(got(1L) == contrib(3, 2, 3, 4, avgdl) + contrib(3, 1, 1, 4, avgdl))
    assert(got(2L) == contrib(3, 2, 1, 2, avgdl) + contrib(3, 1, 1, 2, avgdl))
    assert(!got.contains(3L), "doc without query terms must not score")
    // the rare term ('query'/'join', df=1) must contribute more than the
    // common one ('data', df=2) at equal tf/dl
    assert(idf(3, 1) > idf(3, 2))
  }

  test("dimStats: exact stats per 1-based dimension") {
    val emb = Seq(
      (1L, Seq(1.0f, 10.0f)),
      (2L, Seq(3.0f, 30.0f))).toDF("vec_id", "embedding")
    val r = Similarity.dimStats(emb, col("embedding")).orderBy("dim").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Int]("dim") == 1 && r(0).getAs[Long]("n_vecs") == 2)
    assert(r(0).getAs[Double]("mean_val") == 2.0)
    assert(r(0).getAs[Double]("std_val") == 1.0) // stddev_pop of {1,3}
    assert(r(0).getAs[Double]("min_val") == 1.0 && r(0).getAs[Double]("max_val") == 3.0)
    assert(r(1).getAs[Double]("mean_val") == 20.0 && r(1).getAs[Double]("std_val") == 10.0)
  }

  test("zipfFit: quantized OLS matches the hand-replicated two-point fit") {
    // Corpus: 'aa' x8, 'bb' x2 → rank 1 count 8, rank 2 count 2.
    val docs = Seq((1L, "aa aa aa aa aa aa aa aa bb bb")).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(docs, col("text"), topN = 10).collect()(0)
    assert(r.getAs[Long]("n_terms") == 2)
    // Replicate the integer quantization + IEEE closed form exactly.
    val pts = Seq((1L, 8L), (2L, 2L)).map { case (rank, cnt) =>
      (math.round(math.log(rank.toDouble) * 1e6), math.round(math.log(cnt.toDouble) * 1e6))
    }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n * sxx.toDouble - sx.toDouble * sx.toDouble)
    assert(r.getAs[Long]("sx") == sx && r.getAs[Long]("sy") == sy)
    assert(r.getAs[Double]("zipf_slope") ==
      BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // Two points, counts 8 vs 2 over ranks 1 vs 2: slope = ln(2/8)/ln(2) = -2.
    assert(math.abs(r.getAs[Double]("zipf_slope") - -2.0) < 1e-4)
  }

  test("mixtureWeights: sqrt-proportional with exact micro-unit normalization") {
    val docs = Seq(
      (1L, "srcA", Seq.fill(16)("t").mkString(" ")),  // 16 tokens → sqrt 4
      (2L, "srcB", Seq.fill(4)("t").mkString(" ")))   // 4 tokens  → sqrt 2
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.mixtureWeights(docs, col("source"), col("text"))
      .orderBy("source").collect()
    assert(r.map(_.getAs[Long]("total_tokens")).toSeq == Seq(16L, 4L))
    assert(r.map(_.getAs[Long]("w_micro")).toSeq == Seq(4000000L, 2000000L))
    assert(r(0).getAs[Double]("mix_weight") == 0.666667) // 4/6 rounded
    assert(r(1).getAs[Double]("mix_weight") == 0.333333)
    // Weights over the emitted micro-units renormalize to exactly 1.
    assert(r.map(_.getAs[Long]("w_micro")).sum == 6000000L)
  }

  test("readability: Flesch from hand counts; empty doc scores 0") {
    val docs = Seq((1L, "Hello world. This is fun!"), (2L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val d1 = r(0)
    // words {hello,world,this,is,fun}=5; marks {., !}=2; vowel groups:
    // hello(e,o) world(o) this(i) is(i) fun(u) = 6
    assert(d1.getAs[Long]("n_words") == 5 && d1.getAs[Long]("n_sentence_marks") == 2 &&
      d1.getAs[Long]("n_vowel_groups") == 6)
    val expected = BigDecimal(206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (6.0 / 5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d1.getAs[Double]("flesch") == expected)
    assert(r(1).getAs[Long]("n_words") == 0 && r(1).getAs[Double]("flesch") == 0.0)
  }

  test("charEntropy: uniform two-char doc = ln 2; constant and empty docs = 0") {
    val docs = Seq((1L, "aabb"), (2L, "aaaa"), (3L, ""), (4L, "a1!A")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val ln2 = BigDecimal(-(0.5 * math.log(0.5)) + -(0.5 * math.log(0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getAs[Long]("n_chars") == 4 && r(0).getAs[Long]("n_distinct") == 2)
    assert(r(0).getAs[Double]("char_entropy") == ln2)
    assert(r(1).getAs[Double]("char_entropy") == 0.0) // single symbol: -1·ln 1
    assert(r(2).getAs[Long]("n_chars") == 0 && r(2).getAs[Double]("char_entropy") == 0.0)
    // case folds, punctuation drops: "a1!A" → chars {a,1,a} → 2 distinct of 3
    assert(r(3).getAs[Long]("n_chars") == 3 && r(3).getAs[Long]("n_distinct") == 2)
  }

  test("langEntropy: vote distribution entropy, hand-computed; degenerate docs zero") {
    val docs = Seq(
      (1L, "the the of la la"),  // en=3 (the,the,of), es=2 (la,la), fr=2 (la,la)
      (2L, ""),                  // no votes at all
      (3L, "the and of"))        // purely en → H = 0
      .toDF("doc_id", "text")
    val r = TextAnalysis.langEntropy(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val d1 = r(0)
    assert(d1.getAs[Long]("n_votes") == 7 && d1.getAs[Long]("n_langs") == 3)
    val expected = {
      val ps = Seq(3.0 / 7, 2.0 / 7, 2.0 / 7)
      val h = ps.map(p => -p * math.log(p)).sum
      BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(d1.getAs[Double]("lang_entropy") == expected)
    assert(d1.getAs[Double]("dominant_frac") ==
      BigDecimal(3.0 / 7).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(1).getAs[Long]("n_votes") == 0 &&
      r(1).getAs[Double]("lang_entropy") == 0.0 &&
      r(1).getAs[Double]("dominant_frac") == 0.0)
    assert(r(2).getAs[Long]("n_langs") == 1 &&
      r(2).getAs[Double]("lang_entropy") == 0.0 &&
      r(2).getAs[Double]("dominant_frac") == 1.0)
  }

  test("hashedLinearScore: fold == per-token integer weights; empty doc scores 0") {
    graft.plans.GraftFunctions.register(spark)
    val M = TextAnalysis.RollingHashModulus
    def wq(tok: String): Long = {
      val h = tok.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % M)
      (h % 4096L) * 2654435761L % 1000003L - 501001L
    }
    val docs = Seq((1L, "ab cd ab"), (2L, ""), (3L, "!!!")).toDF("doc_id", "text")
    val r = TextAnalysis.hashedLinearScore(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val expect1 = wq("ab") * 2 + wq("cd")
    assert(r(0).getAs[Long]("sum_wq") == expect1 && r(0).getAs[Long]("n_toks") == 3)
    assert(r(0).getAs[Double]("score") ==
      BigDecimal(expect1.toDouble / (1000003.0 * 3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // Empty / no-alpha docs: zero tokens, score 0, never kept.
    for (i <- 1 to 2) {
      assert(r(i).getAs[Long]("n_toks") == 0 && r(i).getAs[Long]("sum_wq") == 0L)
      assert(r(i).getAs[Double]("score") == 0.0 && !r(i).getAs[Boolean]("keep"))
    }
  }

  test("vocabCoverage: top-N cut is deterministic; OOV counted; empty doc survives") {
    // corpus counts: aa=3, bb=2, cc=1, dd=1 — vocabSize=3 cuts at count 1
    // where cc beats dd on the term tiebreak; dd is the one OOV token.
    val docs = Seq(
      (1L, "aa bb aa"), (2L, "aa bb cc"), (3L, "dd"), (4L, ""))
      .toDF("doc_id", "text")
    val r = TextAnalysis.vocabCoverage(docs, col("doc_id"), col("text"), 3)
      .orderBy("doc_id").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_tokens"),
        x.getAs[Long]("n_oov"), x.getAs[Long]("oov_permille")))
    assert(r.toSeq == Seq(
      (1L, 3L, 0L, 0L), (2L, 3L, 0L, 0L),
      (3L, 1L, 1L, 1000L), (4L, 0L, 0L, 0L)), r.toSeq)
  }
}
