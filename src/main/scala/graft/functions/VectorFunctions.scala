package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * higher-order functions (zip_with/aggregate) so everything stays in
  * Tungsten rows — no UDF (de)serialization on the 100 TB path.
  * Floats are widened to double before arithmetic.
  */
object VectorFunctions {

  def dot(u: Column, v: Column): Column =
    aggregate(zip_with(u, v, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(u: Column): Column = sqrt(dot(u, u))

  def cosine(u: Column, v: Column): Column =
    dot(u, v) / (norm(u) * norm(v))

  /** Cosine with pre-computed norms (avoids recomputing the candidate
    * norm per pair in a top-k join). */
  def cosinePrenormed(dotUV: Column, normU: Column, normV: Column): Column =
    dotUV / (normU * normV)
}
