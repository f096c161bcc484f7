package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BlockedExact, Dedup, Similarity, TopK}

/** The blocked exact-cosine kernel (graft.functions.BlockedExact) must be
  * BIT-IDENTICAL to the join + `graft_cosine` expression path it replaces
  * for integral-id frames — same doubles, same ranking, same rounding.
  * Every test compares full collected row sets (cos compared as exact
  * Double values, not with tolerance).
  */
class BlockedExactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embeddings: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** The legacy join-scored exact top-k (the path non-integral ids still
    * take), reconstructed here as the reference oracle. */
  private def joinTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("qv"))
    val c = corpus.select(col("vec_id").as("c_id"),
      col("embedding").cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        Similarity.cosineFast(col("qv"), col("cv")).as("cos"))
    TopK.rankTopK(scored, k, candidateIds = Some(c.select(col("c_id"))))
  }

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select(col("q_id").cast("long"), col("rank").cast("long"),
        col("c_id").cast("long"), col("cos"))
      .as[(Long, Long, Long, Double)].collect().toSet

  test("cosineTopK blocked path equals the join path bit-for-bit on real embeddings") {
    val emb = embeddings
    val queries = emb.filter(col("vec_id") % 8 === 0)
    val blocked = rows(Similarity.cosineTopK(queries, emb, 5))
    val joined = rows(joinTopK(queries, emb, 5))
    assert(blocked == joined)
    assert(blocked.nonEmpty)
  }

  test("multi-block query splitting (maxQueriesPerPass=3) changes nothing") {
    val emb = embeddings
    val q = emb.filter(col("vec_id") % 8 === 0)
      .select(col("vec_id").cast("long").as("q_id"),
        col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id").cast("long").as("c_id"),
      col("embedding").cast("array<double>").as("cv"))
    val one = rows(TopK.rankTopK(
      BlockedExact.topKPartials(q, c, 5, maxQueriesPerPass = Int.MaxValue), 5))
    val many = rows(TopK.rankTopK(
      BlockedExact.topKPartials(q, c, 5, maxQueriesPerPass = 3), 5))
    assert(one == many && one.nonEmpty)
  }

  test("ties break id-asc and zero vectors score 0, exactly like the expression") {
    // duplicate vectors force exact cos ties; a zero vector forces the
    // denom==0 guard; vec 9 is a zero-vector QUERY (all its cosines 0 —
    // the whole ranking is one big tie broken purely by id)
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(2.0f, 0.0f, 0.0f)),  // cos=1 vs 0 — ties with 2
      (2L, Seq(3.0f, 0.0f, 0.0f)),  // cos=1 vs 0 — ties with 1
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 0.0f)),  // zero vector: cos 0 everywhere
      (9L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id").isin(0L, 9L))
    val blocked = rows(Similarity.cosineTopK(queries, vecs, 4))
    val joined = rows(joinTopK(queries, vecs, 4))
    assert(blocked == joined)
    // and the tie order is visible: query 0's rank-1/2 are ids 1 then 2
    val q0 = Similarity.cosineTopK(queries, vecs, 4)
      .filter(col("q_id") === 0L).orderBy("rank")
      .select("c_id").as[Long].collect().toSeq
    assert(q0.take(2) == Seq(1L, 2L))
  }

  test("ragged vector lengths: tail elements count toward norms, like the expression") {
    val vecs = Seq(
      (0L, Seq(1.0f, 2.0f)),
      (1L, Seq(1.0f, 2.0f, 5.0f)),  // longer: tail 5.0 inflates only its norm
      (2L, Seq(1.0f)),
      (3L, Seq(0.5f, 1.0f)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") === 0L)
    assert(rows(Similarity.cosineTopK(queries, vecs, 3)) ==
      rows(joinTopK(queries, vecs, 3)))
  }

  test("hardNegatives blocked path equals the join path (label predicate in-kernel)") {
    val emb = embeddings
    val queries = emb.filter(col("vec_id") % 8 === 0)
    // join-path reference, reconstructed
    graft.plans.GraftFunctions.register(spark)
    val q = queries.select(col("vec_id").as("q_id"), col("label").as("q_label"),
      col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id").as("c_id"), col("label").as("c_label"),
      col("embedding").cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q),
        col("q_id") =!= col("c_id") && col("q_label") =!= col("c_label"))
      .select(col("q_id"), col("c_id"), col("c_label"),
        Similarity.cosineFast(col("qv"), col("cv")).as("cos"))
    val ref = graft.plans.TopKPerKey.topKPerKey(scored,
        keyCols = Seq("q_id"), orderBy = Seq(("cos", false), ("c_id", true)), k = 5)
      .select(col("q_id").cast("long"), col("rank").cast("long"),
        col("c_id").cast("long"), col("c_label").cast("long"),
        round(col("cos"), 6).as("cos"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val got = Similarity.hardNegatives(queries, emb, 5)
      .select(col("q_id").cast("long"), col("rank").cast("long"),
        col("c_id").cast("long"), col("c_label").cast("long"), col("cos"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == ref && got.nonEmpty)
    // schema preserved: c_label keeps the corpus label type
    assert(Similarity.hardNegatives(queries, emb, 5).schema("c_label").dataType ==
      emb.schema("label").dataType)
  }

  test("cosineRange blocked path equals the join path, threshold on the raw cosine") {
    val emb = embeddings
    val queries = emb.filter(col("vec_id") % 8 === 0)
    graft.plans.GraftFunctions.register(spark)
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id").as("c_id"),
      col("embedding").cast("array<double>").as("cv"))
    val ref = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        Similarity.cosineFast(col("qv"), col("cv")).as("cos"))
      .filter(col("cos") >= lit(0.25))
      .select(col("q_id").cast("long"), col("c_id").cast("long"),
        round(col("cos"), 6).as("cos"))
      .as[(Long, Long, Double)].collect().toSet
    val got = Similarity.cosineRange(queries, emb, minCos = 0.25)
      .select(col("q_id").cast("long"), col("c_id").cast("long"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == ref && got.nonEmpty)
  }

  test("embeddingNearDups kernel path equals the bucketed self-join bit-for-bit") {
    val emb = embeddings
    val got = Dedup.embeddingNearDups(emb, col("vec_id"), col("embedding"),
        nPlanes = 4, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    // join-path reference, reconstructed
    graft.plans.GraftFunctions.register(spark)
    val keyed = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", Similarity.hyperplaneBucket(col("v"), 4))
    val a = keyed.select(col("bucket"), col("vec_id").as("id1"), col("v").as("v1"))
    val b = keyed.select(col("bucket"), col("vec_id").as("id2"), col("v").as("v2"))
    val ref = a.join(b, Seq("bucket")).filter(col("id1") < col("id2"))
      .withColumn("cosine", Similarity.cosineFast(col("v1"), col("v2")))
      .filter(col("cosine") >= 0.3)
      .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == ref && got.nonEmpty)
  }

  test("incrementalEmbeddingNearDups kernel path equals the bucket equi-join bit-for-bit") {
    val emb = embeddings
    val standing = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val ix = Dedup.buildEmbIndex(standing, col("vec_id"), col("embedding"), nPlanes = 4)
    val got = Dedup.incrementalEmbeddingNearDups(ix, batch,
        col("vec_id"), col("embedding"), threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    // join-path reference, reconstructed over the identical staged frames
    graft.plans.GraftFunctions.register(spark)
    val b = batch.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", Similarity.hyperplaneBucket(col("v"), 4))
    val all = ix.vecs.select(col("bucket"), col("vec_id"), col("v")).unionByName(
      b.select(col("bucket"), col("vec_id"), col("v")))
    val ref = all.join(b.select(col("bucket"), col("vec_id").as("vid2"),
        col("v").as("v2")), Seq("bucket"))
      .filter(col("vec_id") =!= col("vid2"))
      .select(least(col("vec_id"), col("vid2")).as("id1"),
        greatest(col("vec_id"), col("vid2")).as("id2"),
        Similarity.cosineFast(col("v"), col("v2")).as("cosine"))
      .filter(col("cosine") >= 0.3)
      .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
      .distinct()
      .as[(Long, Long, Double)].collect().toSet
    assert(got == ref && got.nonEmpty)
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  test("quarantined hot-cell kernel equals the plain within-bucket pair set") {
    // maxBucket=1 quarantines EVERY bucket, so the whole result flows
    // through the cell kernel; losslessness says it must still equal the
    // plain near-dup set bit-for-bit
    val emb = embeddings
    val ix = Dedup.buildEmbIndex(emb, col("vec_id"), col("embedding"), nPlanes = 4)
    val quar = Dedup.embeddingNearDupsQuarantined(ix, threshold = 0.3, maxBucket = 1L)
      .as[(Long, Long, Double)].collect().toSet
    val plain = Dedup.embeddingNearDups(emb, col("vec_id"), col("embedding"),
        nPlanes = 4, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(quar == plain && quar.nonEmpty)
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  test("ivfTopKIndexed probed kernel equals the probes-join path bit-for-bit") {
    val emb = embeddings
    val queries = emb.filter(col("vec_id") % 8 === 0)
    val ix = Similarity.ivfIndexFor(emb, nCentroids = 4, lloydIters = 1)
    val got = rows(Similarity.ivfTopKIndexed(queries, ix, 3, nProbe = 2))
    // join-path reference, reconstructed over the same built index
    graft.plans.GraftFunctions.register(spark)
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("qv"))
    val probes = Similarity.probeCentroidsForTest(q, ix.centroids, 2)
    val scored = probes.join(ix.inverted, Seq("cent_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        Similarity.cosineFast(col("qv"), col("cv")).as("cos"))
    val ref = rows(TopK.rankTopK(scored, 3,
      candidateIds = Some(ix.corpus.select(col("c_id")))))
    assert(got == ref && got.nonEmpty)
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  test("ivfRangeIndexed probed kernel stays lossless at full probe (≡ exact range)") {
    val emb = embeddings
    val queries = emb.filter(col("vec_id") % 8 === 0)
    val ix = Similarity.ivfIndexFor(emb, nCentroids = 4, lloydIters = 1)
    val got = Similarity.ivfRangeIndexed(queries, ix, minCos = 0.25, nProbe = 4)
      .select(col("q_id").cast("long"), col("c_id").cast("long"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    val exact = Similarity.cosineRange(queries, emb, minCos = 0.25)
      .select(col("q_id").cast("long"), col("c_id").cast("long"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == exact && got.nonEmpty)
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  test("pqTopKIndexed ADC kernel equals the pivoted-projection join bit-for-bit") {
    val emb = embeddings
    val queries = emb.filter(col("vec_id") % 8 === 0)
    // same oracle trick as SimilaritySpec's PQ degeneracy pin: with
    // lloydIters=0 and huge ksub every vector is its own codeword, so
    // BOTH paths must also equal exact search — but here we compare the
    // two ADC paths against each other at a real compressed geometry
    val ix = Similarity.pqIndexFor(emb, m = 4, ksub = 8, lloydIters = 1)
    val got = rows(Similarity.pqTopKIndexed(queries, ix, 5))
    val ref = rows(Similarity.pqTopKIndexedJoinPathForTest(queries, ix, 5))
    assert(got == ref && got.nonEmpty)
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  test("size fallback: a query matrix past the driver budget serves the join path, same rows") {
    // the fallback must be SIZE-triggered, not only type-triggered: with a
    // 1-double budget the integral-id frame must route to the join path
    // (no kernel MapPartitions in the plan) and return the identical rows
    val emb = embeddings
    val queries = emb.filter(col("vec_id") % 8 === 0)
    val kernelRows = rows(Similarity.cosineTopK(queries, emb, 5))
    spark.conf.set("graft.kernel.maxQueryDoubles", "1")
    try {
      val fb = Similarity.cosineTopK(queries, emb, 5)
      assert(!fb.queryExecution.executedPlan.toString.contains("MapPartitions"),
        "a query side past the budget must fall back to the join path")
      assert(rows(fb) == kernelRows && kernelRows.nonEmpty)
    } finally spark.conf.set("graft.kernel.maxQueryDoubles",
      BlockedExact.DefaultMaxQueryDoubles.toString)
  }

  test("small-corpus cutover: below minCorpusRows the join path serves, same rows") {
    // production default: a corpus too small for the kernel's fixed
    // overhead to pay for itself serves through the join path (the test
    // session pins the cutover to 0 so the other suites audit the kernel)
    val emb = embeddings
    val queries = emb.filter(col("vec_id") % 8 === 0)
    val kernelRows = rows(Similarity.cosineTopK(queries, emb, 5))
    spark.conf.set("graft.kernel.minCorpusRows", "1000000")
    try {
      val fb = Similarity.cosineTopK(queries, emb, 5)
      assert(!fb.queryExecution.executedPlan.toString.contains("MapPartitions"),
        "a small corpus must serve through the join path")
      assert(rows(fb) == kernelRows && kernelRows.nonEmpty)
    } finally spark.conf.set("graft.kernel.minCorpusRows", "0")
  }

  test("cosineTopKNative kernel scoring equals the join-scored plan-node path bit-for-bit") {
    val emb = embeddings
    val queries = emb.filter(col("vec_id") % 8 === 0)
    def native() = Similarity.cosineTopKNative(queries, emb, 5)
      .select(col("q_id").cast("long"), col("rank").cast("long"),
        col("c_id").cast("long"), col("cos"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val kernel = native()
    assert(Similarity.cosineTopKNative(queries, emb, 5)
      .queryExecution.executedPlan.toString.contains("MapPartitions"))
    spark.conf.set("graft.kernel.minCorpusRows", "1000000") // force join path
    try {
      val joined = native()
      assert(kernel == joined && kernel.nonEmpty)
    } finally spark.conf.set("graft.kernel.minCorpusRows", "0")
  }

  test("embeddingNearDupsAuto resolves to the fixed-plane result at gate scale") {
    // the gate-scale corpus (500 vectors) derives autoPlanes(500) = 4 —
    // exactly the committed fixture geometry, so the auto batch form and
    // the pinned form are the same query here (DedupTextSpec pins the
    // autoPlanes derivation itself)
    assert(Dedup.autoPlanes(500L) == 4)
    val emb = embeddings
    val auto = Dedup.embeddingNearDupsAuto(emb, col("vec_id"), col("embedding"),
        threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val fixed = Dedup.embeddingNearDups(emb, col("vec_id"), col("embedding"),
        nPlanes = 4, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == fixed && auto.nonEmpty)
  }

  test("bucketedSelfPairs never emits a self-pair for duplicate ids in one bucket") {
    // two rows sharing vec_id 7 with identical vectors land in one bucket;
    // the join path's strict id1 < id2 drops the (7,7) pair — the kernel
    // must too (ADVICE r11). The (7, 8) near-identical pair must survive.
    val vecs = Seq(
      (7L, Seq(1.0f, 0.5f, 0.25f)),
      (7L, Seq(1.0f, 0.5f, 0.25f)),
      (8L, Seq(1.0f, 0.5f, 0.26f)))
      .toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDups(vecs, col("vec_id"), col("embedding"),
        nPlanes = 2, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(!got.exists(p => p._1 == p._2), s"self-pair leaked: $got")
    assert(got.map(p => (p._1, p._2)) == Set((7L, 8L)))
  }

  test("empty query set yields an empty, well-typed frame") {
    val emb = embeddings
    val queries = emb.filter(col("vec_id") < 0)
    val out = Similarity.cosineTopK(queries, emb, 5)
    assert(out.columns.toSeq == Seq("q_id", "rank", "c_id", "cos"))
    assert(out.isEmpty)
  }
}
