package graft

import graft.ops.{SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Broadcast all-pairs kernels must be bit-identical to the declarative
  * self-join forms they replace (same doubles, same rounding, same
  * integers) — the queries swapped implementations without touching
  * their DuckDB oracles. */
class SimilarityKernelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("allPairsCosineLocal + exact rounded predicate == declarative BNLJ self-join") {
    val v = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val declarative = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        SimilarityOps.cosineNative6(spark,
          col("a.embedding"), col("b.embedding")).as("cosine"))
      .filter(col("cosine") >= 0.45)
      .orderBy("id1", "id2").collect().toSeq
    val kernel = SimilarityOps.allPairsCosineLocal(v, "vec_id", "embedding", 0.45 - 1e-5)
      .select(col("id1"), col("id2"), round(col("raw_cos"), 6).as("cosine"))
      .filter(col("cosine") >= 0.45)
      .orderBy("id1", "id2").collect().toSeq
    assert(kernel.nonEmpty)
    assert(kernel === declarative)
  }

  test("allPairsLevenshteinLocal == declarative levenshtein self-join") {
    val s = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_name"))
    val declarative = s.as("a").join(s.as("b"), col("a.s_suppkey") < col("b.s_suppkey"))
      .select(col("a.s_suppkey").as("id1"), col("b.s_suppkey").as("id2"),
        levenshtein(col("a.s_name"), col("b.s_name")).as("dist"))
      .filter(col("dist") <= 3)
      .orderBy("id1", "id2").collect().toSeq
    val kernel = TextOps.allPairsLevenshteinLocal(s, "s_suppkey", "s_name", 3)
      .orderBy("id1", "id2").collect().toSeq
    assert(kernel.nonEmpty)
    assert(kernel === declarative)
  }
}
