package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Lifecycle registry for the session-scoped trained-artifact memos
  * (`Similarity.centroidMemo`, `Dedup.clusterMemo`, `Curation.lmMemo`,
  * `TextAnalysis.weightsMemo`, `Similarity.vectorsMemo`, the stored-index
  * path memos) — the VERDICT-r8-ask-#8 sharing pattern, hardened per
  * ADVICE r9: entries used to live for the JVM lifetime even after their
  * session stopped, pinning checkpoint blocks and (in a pathological
  * reuse of the JVM) serving a dead session's frames.
  *
  * Every memo key is a Product whose FIRST element is the owning
  * SparkSession. [[arm]] registers the memo map and installs (once per
  * session) an `onApplicationEnd` listener that drops the session's keys
  * when its SparkContext stops. In local mode several `newSession()`
  * clones may share one context — each armed session is evicted when
  * that shared context ends, at which point all of them are unusable
  * anyway.
  *
  * SHARED ASSUMPTION, stated once for every memo that keys on
  * (session, sfDir): data under an sfDir is NOT rewritten within a
  * session. The memos cache deterministic artifacts of the files as they
  * were first read; a pipeline that regenerates its inputs mid-session
  * must use a fresh session (exactly as it must for Spark's own
  * file-listing and parquet-footer caches). The driver's Verify/Bench
  * harnesses create one session per run, so the assumption holds there
  * by construction.
  */
private[graft] object SessionMemos {
  private val maps =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.concurrent.ConcurrentHashMap[_ <: Product, _]]()
  private val armedSessions =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()
  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[java.nio.file.Path, SparkSession]()

  /** Create a temp directory owned by `spark` for a memoized on-disk
    * artifact (cube / index / fixture parquet). The tree is deleted by the
    * same end-of-application eviction that drops the memo entry pointing
    * at it (ADVICE r11: the builders used to leak their directories, so
    * repeated sessions — bench, the two-factor scale curve — accumulated
    * orphaned parquet under /tmp). One shared lifecycle helper so every
    * artifact family ages out identically. */
  def tempDir(spark: SparkSession, prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.put(p, spark)
    p.toString
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach { f =>
        try Files.deleteIfExists(f) catch { case _: java.io.IOException => () }
      } finally walk.close()
    }
  }

  /** Register `map` for end-of-session eviction and arm the listener on
    * `spark`'s context (idempotent per session). Call before every
    * `computeIfAbsent` on a session-keyed memo. */
  def arm(spark: SparkSession, map: java.util.concurrent.ConcurrentHashMap[_ <: Product, _]): Unit = {
    maps.add(map)
    if (armedSessions.add(spark))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          evict(spark)
          armedSessions.remove(spark)
        }
      })
  }

  /** Drop every registered memo entry owned by `spark`. Invoked by the
    * end-of-application listener; package-visible so MemoLifecycleSpec
    * can exercise the eviction without stopping the shared test session. */
  def evict(spark: SparkSession): Unit = {
    maps.forEach { m =>
      m.keySet.removeIf(k => k.productElement(0).asInstanceOf[AnyRef] eq spark)
    }
    val it = dirs.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue eq spark) { it.remove(); deleteTree(e.getKey) }
    }
  }
}
