package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

/** The library cache contract: internal persists register with
  * [[GraftCaches]], `unpersistAll` releases them, and caches the USER
  * created are never touched (the property `catalog.clearCache()` lacks).
  */
class GraftCachesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pipeline persists register; unpersistAll releases them, not user caches") {
    GraftCaches.unpersistAll() // isolate from earlier suites
    val userCache = Seq((1L, "user data")).toDF("id", "t").persist(StorageLevel.MEMORY_AND_DISK)
    userCache.count()

    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content here")).toDF("doc_id", "text")
    val before = GraftCaches.registeredCount()
    val top = TextAnalysis.tfidfTopTerms(docs, col("doc_id"), col("text"), 2)
    assert(top.count() > 0)
    assert(GraftCaches.registeredCount() > before,
      "tfidfTopTerms must register its internal persist")

    GraftCaches.unpersistAll()
    assert(GraftCaches.registeredCount() == 0)
    assert(userCache.storageLevel != StorageLevel.NONE,
      "unpersistAll must not evict caches the user created")
    userCache.unpersist(blocking = false)
  }

  test("persistedArtifactFresh: independent cache entry that survives the working tier and recomputes after release") {
    // the delta-append contract: the SAME batch frame is working-persisted
    // by the incremental-pairs pass, then becomes a standing-generation
    // member — the member must get its OWN cache entry (a same-plan
    // re-persist is a CacheManager no-op that dies with the working tier)
    // and must keep lineage (a lost block recomputes; a localCheckpoint
    // would fail unrecoverably)
    val working = GraftCaches.persisted(
      spark.range(0, 100).toDF("x").select(col("x"), (col("x") * 7).as("y")))
    working.count()
    val member = GraftCaches.persistedArtifactFresh(working)
    member.count()
    def cached = member.storageLevel != StorageLevel.NONE
    assert(cached,
      "the fresh-plan artifact persist must create its own cache entry")
    GraftCaches.unpersistAll(blocking = true) // working tier dies
    assert(cached,
      "the artifact entry must survive the working tier's unpersist")
    assert(member.count() == 100L)
    // lineage retained: after the artifact itself releases, the frame
    // still recomputes from source (the checkpoint path could not)
    GraftCaches.releaseArtifacts(blocking = true)
    assert(member.count() == 100L)
  }

  test("GenChain releases every collected frame as one unit") {
    val a = GraftCaches.persistedArtifact(spark.range(0, 10).toDF("a"))
    val b = GraftCaches.persistedArtifact(spark.range(10, 20).toDF("b"))
    a.count(); b.count()
    assert(a.storageLevel != StorageLevel.NONE && b.storageLevel != StorageLevel.NONE)
    GraftCaches.GenChain(Seq(a, b)).release(blocking = true)
    assert(a.storageLevel == StorageLevel.NONE && b.storageLevel == StorageLevel.NONE)
    GraftCaches.releaseArtifacts(blocking = true) // registry entries are stale now; idempotent
  }

  test("persisted() caches at the requested level and survives re-registration") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    GraftCaches.persisted(df)
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    GraftCaches.unpersistAll()
    assert(df.storageLevel == StorageLevel.NONE)
    // re-persist after release — the weak registry must accept it again
    GraftCaches.persisted(df, StorageLevel.MEMORY_ONLY)
    assert(df.storageLevel == StorageLevel.MEMORY_ONLY)
    GraftCaches.unpersistAll()
  }
}
