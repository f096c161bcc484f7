package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal
import graft.kernels.Png

/** The multimodal column family past the stub decoder: real PNG payloads
  * through the real decode seam (extractFeatures), perceptual hashing, and
  * the banded image near-dup pipeline.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A deterministic gradient test image. */
  private def gradient(side: Int): Array[Int] = {
    val px = new Array[Int](side * side)
    var i = 0
    while (i < px.length) { px(i) = (i * 7) % 256; i += 1 }
    px
  }

  test("extractFeatures decodes REAL PNG image payloads (true w/h/mean), stubs the rest") {
    val px = gradient(16)
    val bytes = Png.encodeGray(px, 16, 16).get
    val media = Seq(
      (1L, "image", bytes),                      // real PNG → real decode
      (2L, "image", "not a png".getBytes("UTF-8")), // undecodable → stub
      (3L, "audio", bytes))                      // non-image kind → stub
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.extractFeatures(media)
      .orderBy(col("media_id"))
      .select(col("media_id"), col("width"), col("height"), col("mean_px"))
      .as[(Long, Int, Int, Double)].collect()
    assert(rows(0) == ((1L, 16, 16, px.map(_.toLong).sum.toDouble / px.length)))
    // stub rows carry the deterministic fake, not real dimensions
    val (w2, h2, m2) = Multimodal.stubDecodeImage("not a png".getBytes("UTF-8"))
    assert(rows(1) == ((2L, w2, h2, m2)))
    val (w3, h3, m3) = Multimodal.stubDecodeImage(bytes)
    assert(rows(2) == ((3L, w3, h3, m3)))
  }

  test("aHash is stable under re-encode and within small Hamming of a noised copy") {
    val px = gradient(32)
    val h1 = Multimodal.aHash64(px, 32, 32)
    // re-encode → decode must reproduce the hash exactly (lossless PNG)
    val rt = Png.decodeGray(Png.encodeGray(px, 32, 32).get).get
    assert(Multimodal.aHash64(rt._1, rt._2, rt._3) == h1)
    // a lightly-noised copy stays within a small Hamming distance
    val noisy = px.clone()
    var i = 0
    while (i < noisy.length) {
      if (i % 17 == 0) noisy(i) = (noisy(i) + 40) % 256
      i += 1
    }
    val h2 = Multimodal.aHash64(noisy, 32, 32)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 8)
    // dHash: same invariances
    assert(Multimodal.dHash64(rt._1, rt._2, rt._3) == Multimodal.dHash64(px, 32, 32))
  }

  test("perceptualHashes drops undecodable payloads (C3 drop-on-failure)") {
    val good = Png.encodeGray(gradient(16), 16, 16).get
    val media = Seq((1L, good), (2L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    val out = Multimodal.perceptualHashes(media).select(col("media_id"))
      .as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("phashNearDups finds exactly the synthetic near-dup groups, no cross-group pairs") {
    val ids = spark.range(0, 64).select(col("id").as("doc_id"))
    val media = Multimodal.syntheticPngMedia(ids)
    val pairs = Multimodal.phashNearDups(media, maxHamming = 6)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    // groups of 8 consecutive ids share a base pattern; every emitted pair
    // must be within one group, canonical id1 < id2, hamming ≤ 6
    pairs.foreach { case (id1, id2, hamming) =>
      assert(id1 < id2 && id1 / 8 == id2 / 8 && hamming <= 6,
        s"bad pair ($id1, $id2, $hamming)")
    }
    // the clean base member (m=0) pairs with most of its group
    assert(pairs.count(p => p._1 == 0L) >= 4)
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  /** Deterministic noisy base image: mid-gray with hash-derived texture. */
  private def noisyBase(side: Int): Array[Int] = {
    val px = new Array[Int](side * side)
    var i = 0
    while (i < px.length) {
      var z = i * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
      z = (z ^ (z >>> 29)) * 0xBF58476D1CE4E5B9L
      px(i) = 100 + math.floorMod(z >>> 33, 40L).toInt
      i += 1
    }
    px
  }

  test("dual banding recall: a brightness-gradient copy keeps dHash, loses aHash — only the dual tier finds it") {
    val side = 32
    val base = noisyBase(side)
    // vertical brightness gradient (re-light / vignette shape): +4 per
    // row. Every within-row neighbour comparison is untouched (dHash
    // bits survive verbatim — no clipping: max 139 + 124 = 263? keep
    // rows scaled so max stays < 256: +3 per row → 139 + 93 = 232)
    val shifted = Array.tabulate(side * side)(i => base(i) + 3 * (i / side))
    val hA1 = Multimodal.aHash64(base, side, side)
    val hA2 = Multimodal.aHash64(shifted, side, side)
    val hD1 = Multimodal.dHash64(base, side, side)
    val hD2 = Multimodal.dHash64(shifted, side, side)
    // the planted property: the gradient moves cells against the global
    // mean (top rows sink, bottom rows rise) so aHash diverges past the
    // threshold, while neighbour-order dHash is untouched
    assert(java.lang.Long.bitCount(hA1 ^ hA2) > 6,
      s"gradient fixture too weak: aHash hamming ${java.lang.Long.bitCount(hA1 ^ hA2)}")
    assert(java.lang.Long.bitCount(hD1 ^ hD2) <= 2)
    val media = Seq(
      (1L, Png.encodeGray(base, side, side).get),
      (2L, Png.encodeGray(shifted, side, side).get))
      .toDF("media_id", "payload")
    // aHash-only banding misses the pair outright (hamming_a > threshold)
    val aOnly = graft.functions.Dedup.bandedHashPairs(
        Multimodal.perceptualHashes(media)
          .select(col("media_id").as("doc_id"), col("ahash")),
        Seq("ahash"), maxHamming = 6, maxBucket = None)
      .count()
    assert(aOnly == 0L)
    // the dual tier recovers it through the dHash bands at min-Hamming
    val dual = Multimodal.phashNearDups(media, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(dual == Set((1L, 2L, java.lang.Long.bitCount(hD1 ^ hD2))))
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  test("phash quarantine: clone-heavy corpus — quarantined ≡ plain at every bound") {
    // 10 byte-identical payloads (ONE hash tuple → a hot bucket in all 8
    // bands) + one near-dup group from the synthetic corpus
    val clonePx = noisyBase(32)
    val cloneBytes = Png.encodeGray(clonePx, 32, 32).get
    val clones = (100L to 109L).map(i => (i, cloneBytes))
    val group = Multimodal.syntheticPngMedia(
        spark.range(0, 8).select(col("id").as("doc_id")))
      .as[(Long, Array[Byte])].collect().toSeq
    val media = (clones ++ group).toDF("media_id", "payload")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    val plain = pairSet(Multimodal.phashNearDups(media, maxHamming = 6))
    // all 45 clone pairs at hamming 0
    assert((100L to 109L).combinations(2).forall(p =>
      plain.contains((p(0), p(1), 0))))
    for (bound <- Seq(4L, 1L))
      assert(pairSet(Multimodal.phashNearDupsQuarantined(media, 6, bound)) == plain,
        s"phash quarantine(bound=$bound) diverged from the plain run")
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  /** Encode a grayscale pixel array through the JDK's own writers — the
    * mixed-format corpus shape (JPEG dominates real crawls; the PNG-only
    * fixtures never exercised the sniff's other arms end-to-end). */
  private def encodeAs(px: Array[Int], side: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(side, side,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < px.length) {
      val v = px(i)
      img.getRaster.setSample(i % side, i / side, 0, v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** 8×8-pixel constant blocks — the shape a real photo's low-frequency
    * content takes after JPEG's 8×8 DCT: block-constant regions encode to
    * a DC coefficient and survive the lossy round-trip, so the perceptual
    * hashes (whose 8×8 grid cells sit inside one block each at side 32)
    * stay within the near-dup threshold. High-frequency noise fixtures
    * are the JPEG worst case and do not model a photo. */
  private def blocky(side: Int): Array[Int] = {
    val px = new Array[Int](side * side)
    var i = 0
    while (i < px.length) {
      val b = (i / side / 8) * 131L + (i % side / 8) * 31L
      var z = b * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
      z = (z ^ (z >>> 29)) * 0xBF58476D1CE4E5B9L
      px(i) = 60 + math.floorMod(z >>> 33, 140L).toInt
      i += 1
    }
    px
  }

  test("mixed formats: JPEG/GIF/BMP payloads decode through the same seam; JPEG re-encode near-dups its PNG twin") {
    val side = 32
    val px = blocky(side)
    val payloads = Seq(
      1L -> Png.encodeGray(px, side, side).get,
      2L -> encodeAs(px, side, "jpg"),
      3L -> encodeAs(px, side, "gif"),
      4L -> encodeAs(px, side, "bmp"))
    // every payload passes the magic-byte sniff
    payloads.foreach { case (id, b) =>
      assert(Multimodal.looksLikeImage(b), s"sniff failed for media $id")
    }
    val media = payloads.toDF("media_id", "payload")
    val feats = Multimodal.extractFeatures(
        media.withColumn("kind", lit("image")))
      .select(col("media_id"), col("width"), col("height"))
      .as[(Long, Int, Int)].collect().toSet
    // real decode on every format: true dimensions, not the stub's fake
    assert(feats == (1L to 4L).map(id => (id, side, side)).toSet)
    val hashes = Multimodal.perceptualHashes(media)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(hashes.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // GIF/BMP are lossless for 8-bit gray: hashes equal the PNG's exactly
    assert(hashes(2)._2 == hashes(0)._2 && hashes(2)._3 == hashes(0)._3)
    assert(hashes(3)._2 == hashes(0)._2 && hashes(3)._3 == hashes(0)._3)
    // JPEG is lossy but perceptually identical — the near-dup tier must
    // pair it with its PNG twin (this is the pipeline's whole point)
    val pairs = Multimodal.phashNearDups(media, maxHamming = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"JPEG twin not paired: $pairs")
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  test("video container walker: split recovers the concatenated frames bit-for-bit") {
    val frames = 3
    val vids = Multimodal.syntheticVideoMedia(
      spark.range(0, 6).select(col("id").as("doc_id")), frames = frames)
    val split = Multimodal.splitPngFrames(vids)
    assert(split.count() == 6L * frames, "one row per assembled frame")
    // each recovered slice is byte-identical to the pseudo-id PNG it was
    // assembled from — the walker neither over- nor under-splits here,
    // and frame_id arithmetic round-trips (media_id·64 + frame_idx)
    val source = Multimodal.syntheticPngMedia(
      spark.range(0, 6L * frames).select(col("id").as("doc_id")))
      .select((expr("media_id DIV 3") * 64 + col("media_id") % 3).as("frame_id"),
        col("payload").as("src"))
    val mismatches = Multimodal.splitPngFrames(vids)
      .join(source, Seq("frame_id"), "full")
      .filter(col("payload").isNull || col("src").isNull ||
        col("payload") =!= col("src"))
      .count()
    assert(mismatches == 0, s"$mismatches frame slices differ from source PNGs")
    // and the frame near-dup tier pairs a video's re-cut twin: video 1's
    // frames carry pseudo-ids 3..5 — same group-of-8 base pattern as
    // video 0's 0..2, so cross-video frame pairs must surface
    val framePairs = Multimodal.phashNearDups(
        Multimodal.splitPngFrames(vids)
          .select(col("frame_id").as("media_id"), col("payload")),
        maxHamming = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(framePairs.exists { case (a, b) => a / 64 != b / 64 },
      s"no cross-video frame near-dup found: $framePairs")
    graft.GraftCaches.unpersistAll(blocking = true)
  }

  test("catalog-served frame audit ≡ cold payload run; frame-stream plan is stable") {
    val vids = Multimodal.syntheticVideoFor(
      spark.range(0, 8).select(col("id").as("doc_id")))
    // splitPngFramesFor returns ONE plan object per (media plan, cap):
    // mapPartitions closures are fresh per call, so without the memo two
    // constructions never canonicalize equal and every downstream
    // semantic-hash memo (the standing catalog) silently misses
    val f1 = Multimodal.splitPngFramesFor(vids)
    val f2 = Multimodal.splitPngFramesFor(vids)
    assert(f1 eq f2, "frame-stream plan must be identity-stable per media plan")
    val frames = f1.select(col("frame_id").as("media_id"), col("payload"))
    // the catalog-served audit must equal the cold payload run exactly
    // (catalog rows ARE the hash pass's output) — the closed-form oracle
    // mm_frame_pairs_catalog rides
    val cold = Multimodal.phashNearDups(frames, maxHamming = 6)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    val served = Multimodal.phashNearDupsIndexed(
        Multimodal.phashIndexFor(frames), maxHamming = 6)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(served == cold,
      s"catalog-served pair set diverges: ${(served diff cold) ++ (cold diff served)}")
    graft.GraftCaches.unpersistAll(blocking = true)
  }
}
