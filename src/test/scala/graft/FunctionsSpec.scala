package graft

import graft.functions.GraftFunctions
import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** Native Catalyst expression contract: bit-identical to the composed
  * higher-order-function form, SQL-registered, and inside whole-stage
  * codegen (no eval fallback on the hot path). */
class FunctionsSpec extends SparkSpec {

  private lazy val v = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("embedding"))

  test("graft_cosine is bit-identical to the HOF composition on all pairs of first 40") {
    val pairs = v.filter(col("vec_id") < 40).as("a")
      .join(v.filter(col("vec_id") < 40).as("b"), col("a.vec_id") < col("b.vec_id"))
    val diff = pairs.select(
        SimilarityOps.cosine6(col("a.embedding"), col("b.embedding")).as("hof"),
        SimilarityOps.cosineNative6(spark, col("a.embedding"), col("b.embedding")).as("nat"))
      .filter(col("hof") =!= col("nat"))
      .count()
    assert(diff === 0)
  }

  test("registered for SQL: usable from spark.sql text") {
    GraftFunctions.register(spark)
    v.limit(5).createOrReplaceTempView("fs_vecs")
    val self = spark.sql(
      "SELECT vec_id, round(graft_cosine(embedding, embedding), 6) AS c FROM fs_vecs")
      .collect().map(_.getDouble(1))
    assert(self.forall(_ === 1.0)) // unit vectors: self-cosine = 1
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    val df = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(SimilarityOps.cosineNative6(spark,
        col("a.embedding"), col("b.embedding")).as("c"))
    assert(df.collect().length > 0)
    // the generated whole-stage source must contain the fused loop from
    // doGenCode (a CodegenFallback would instead call nullSafeEval
    // reflectively and none of this code would exist)
    import org.apache.spark.sql.execution.debug._
    val gen = codegenString(df.queryExecution.executedPlan)
    assert(gen.contains("Math.sqrt("))
    assert(gen.contains(".numElements()"))
    assert(!gen.contains("CodegenFallback"))
  }
}
