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
}
