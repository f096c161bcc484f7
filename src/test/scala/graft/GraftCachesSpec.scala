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
