package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook registering every graft native
  * function (cosine_sim, minhash_sig, simhash64, trigram_hashes,
  * hyperplane_bands, sorted_intersect_count, codepoint_hist16) at
  * session build — the idiomatic packaging for external engines:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *
  * or programmatically via `GraftSession.builder` (which sets the
  * conf). Extension-injected functions survive `newSession()` (each
  * session state rebuild re-applies the extensions), where manual
  * FunctionRegistry writes would not. The operators' internal
  * `ensureRegistered` calls remain as an idempotent fallback for
  * sessions built without the extension. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
