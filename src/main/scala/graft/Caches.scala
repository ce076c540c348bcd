package graft

/** One switch for every session-grain memo in the library.
  *
  * The operator families memoize shared deterministic artifacts per
  * (SparkContext, corpus fingerprint): the dedup member-pair frame,
  * the quality-LR trained model, the k-means quantizer and PQ
  * codebooks, the ANN kNN graph, the two graph edge frames, and the
  * skew census. Each memo
  * is bounded, keyed so corpus rewrites and new contexts always MISS
  * (dir + sorted input files + hyperparams + applicationId), and
  * individually clearable next to its family. This aggregate clear
  * exists for the long-lived-service case — a process cycling many
  * corpora that wants the checkpointed executor storage back at a
  * deterministic point (between tenants, after a corpus swap) rather
  * than at each cache's overflow eviction. */
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
}
