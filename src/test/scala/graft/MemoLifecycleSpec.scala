package graft

/** Lifecycle contract of the session-scoped trained-artifact memos
  * (ADVICE r9): entries are evicted when their owning session's
  * application ends, and eviction is scoped to that session — a second
  * session's artifacts survive. The eviction body is exercised directly
  * ([[graft.operators.SessionMemos.evict]] is what the
  * onApplicationEnd listener calls) because stopping the shared test
  * SparkContext would kill every other suite in the JVM.
  */
class MemoLifecycleSpec extends SparkSpec {

  test("SessionMemos.evict drops only the stopped session's entries") {
    val map = new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, String), String]()
    val other = spark.newSession()
    graft.operators.SessionMemos.arm(spark, map)
    graft.operators.SessionMemos.arm(other, map) // idempotent per session
    graft.operators.SessionMemos.arm(other, map)
    map.put((spark, "a"), "mine")
    map.put((other, "a"), "theirs")
    map.put((other, "b"), "theirs too")
    graft.operators.SessionMemos.evict(other)
    assert(map.size() == 1, s"expected only the surviving session's entry, got ${map.size()}")
    assert(map.get((spark, "a")) == "mine")
    assert(map.get((other, "a")) == null)
  }

  test("evict deletes the evicted session's artifact temp dirs, not others' (ADVICE r11)") {
    val other = spark.newSession()
    val mine = java.nio.file.Paths.get(
      graft.operators.SessionMemos.tempDir(spark, "graft-lifecycle-mine"))
    val theirs = java.nio.file.Paths.get(
      graft.operators.SessionMemos.tempDir(other, "graft-lifecycle-theirs"))
    java.nio.file.Files.write(mine.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(theirs.resolve("part-0.parquet"), Array[Byte](4, 5))
    graft.operators.SessionMemos.evict(other)
    assert(java.nio.file.Files.exists(mine), "surviving session's artifact dir was deleted")
    assert(!java.nio.file.Files.exists(theirs), "evicted session's artifact dir leaked")
    graft.operators.SessionMemos.evict(spark)
    assert(!java.nio.file.Files.exists(mine))
  }

  test("a trained-artifact memo repopulates after eviction with identical results") {
    // the real path: k-means centroids are memoized per (session, sfDir);
    // evicting and re-running must retrain to bit-identical assignments
    import spark.implicits._
    val before = graft.operators.Similarity.kmeans(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.operators.SessionMemos.evict(spark)
    val after = graft.operators.Similarity.kmeans(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(before == after, "post-eviction retrain diverged from the memoized run")
  }
}
