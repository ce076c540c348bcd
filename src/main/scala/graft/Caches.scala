package graft

import org.apache.spark.sql.DataFrame

/** One switch for every session-grain memo in the library.
  *
  * The operator families memoize shared deterministic artifacts per
  * (SparkContext, corpus fingerprint): the dedup member-pair frame,
  * the quality-LR trained model, the k-means quantizer and PQ
  * codebooks, the ANN kNN graph, the two graph edge frames, and the
  * skew census. Each memo
  * is bounded, keyed so corpus rewrites and new contexts always MISS
  * (dir + sorted input files + hyperparams + applicationId), and
  * individually clearable next to its family.
  *
  * Storage semantics. The frame-valued memos (member pairs, kNN
  * graph, session frames, graph edges) are localCheckpoint-backed,
  * so their bytes live in executor block storage with NO lineage.
  * The explicit clear functions unpersist those blocks eagerly
  * (blocking), so `clearAll()` returns the executor storage at the
  * call point — the long-lived-service hook, meant for BETWEEN
  * tenants / after a corpus swap, when the caller asserts no
  * consumer still holds one of the frames (an unpersisted
  * checkpointed frame cannot recompute). Overflow eviction at each
  * cache's bound, by contrast, only drops the driver references and
  * lets the ContextCleaner reclaim blocks after GC — in-flight
  * consumers of an evicted frame keep working.
  *
  * Executor loss. A lost executor takes its checkpoint blocks with
  * it, and a no-lineage frame then fails PERMANENTLY on read — and
  * keeps being served from the memo until something drops it. A
  * service that survives executor churn should call `clearAll()`
  * (or the owning family's clear) from its executor-loss handling
  * so the next call rebuilds. Irrelevant in local mode, where
  * executor death is JVM death. */
object Caches {
  def clearAll(): Unit = {
    operators.Dedup.clearMemberPairCache()
    operators.TextAnalysis.clearQualityLrCache()
    operators.Similarity.clearKmeansCache()
    operators.Similarity.clearKnnGraphCache()
    operators.Similarity.clearPqBooksCache()
    operators.Graph.clearEdgeCache()
    operators.Sessionize.clearSessionCache()
    operators.Skew.clearCensusCache()
  }

  /** Eagerly free a localCheckpointed frame's executor blocks. A
    * checkpointed Dataset's plan is a `LogicalRDD` over the persisted
    * internal RDD; `df.unpersist` only consults the CacheManager and
    * never sees it, so the clear functions walk the analyzed plan and
    * unpersist the RDD directly (blocking — the point is that storage
    * is back when the call returns). Safe on non-checkpointed frames:
    * no LogicalRDD, no-op. */
  private[graft] def unpersistCheckpointed(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true)
      case _ => ()
    }

  /** The explicit-clear body shared by the frame-valued memo caches:
    * unpersist every cached frame's checkpoint blocks (blocking),
    * then drop the references. Overflow eviction inside the memos
    * deliberately does NOT route here — see the eviction comments at
    * each cache. */
  private[graft] def drainFrameCache(
      cache: java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]): Unit = {
    val it = cache.values().iterator()
    while (it.hasNext) unpersistCheckpointed(it.next())
    cache.clear()
  }
}
