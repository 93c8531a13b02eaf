package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity building blocks over ARRAY<FLOAT> embedding columns.
  * Pure higher-order-function expressions (codegen'd, no UDFs) — the
  * arithmetic is done in DOUBLE and matches the DuckDB oracle's
  * list_cosine_similarity to within an ulp (outputs are round()ed). */
object SimilarityOps {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 decimals — rounding BEFORE any
    * ranking/thresholding is the cross-engine determinism contract
    * (last-ulp differences between libm and JDK math must not flip
    * comparisons). */
  def cosine6(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Same arithmetic as cosine6 through the fused native Catalyst
    * expression (graft.functions.CosineSimilarity): one codegen'd loop,
    * no intermediate arrays — the hot-path form for O(n²) candidate
    * joins. Bit-identical to cosine6 (FunctionsSpec proves it), so
    * queries can swap freely without touching their oracles. */
  def cosineNative6(spark: org.apache.spark.sql.SparkSession,
                    a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    round(call_function("graft_cosine", a, b), 6)
  }
}
