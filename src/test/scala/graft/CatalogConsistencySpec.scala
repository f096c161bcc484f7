package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-catalog referential integrity (the catalog_consistency_report
  * gate at a different SF than the driver's): the three standing
  * structures — dedup catalog (seen), embedding catalog (seen), ANN index
  * (accepted) — must satisfy the membership invariants BY CONSTRUCTION of
  * the composed ingest, and the report's violation rows must count zero.
  * The gate's oracle pins the sf0.01 values; this spec proves the
  * invariants are structural (they hold at sf0.001 too, where every
  * count differs) and that the arithmetic identity
  * served = seen_embeddings − dropped holds within the report itself.
  */
class CatalogConsistencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("catalog_consistency_report: zero violations, consistent counts at sf0.001") {
    val rows = SparkEntry.queries("catalog_consistency_report")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("seen_docs", "seen_embeddings",
      "served_vectors", "dropped_by_policy", "ann_not_in_emb",
      "emb_not_in_dedup", "dropped_still_served"))
    assert(rows("ann_not_in_emb") == 0L,
      "a served vector must have been seen by the embedding catalog")
    assert(rows("emb_not_in_dedup") == 0L,
      "an embedding-catalog member must have a dedup-catalog doc")
    assert(rows("dropped_still_served") == 0L,
      "a policy-dropped doc must not be servable from the ANN index")
    assert(rows("served_vectors") ==
      rows("seen_embeddings") - rows("dropped_by_policy"),
      "accepted = seen − dropped must hold inside one report")
    assert(rows("seen_docs") > 0L && rows("dropped_by_policy") > 0L,
      "the sf0.001 corpus must actually exercise the drop policy " +
        "(a zero drop count would make the leak invariants vacuous)")
    GraftCaches.unpersistAll()
    GraftCaches.releaseArtifacts(blocking = true)
  }
}
