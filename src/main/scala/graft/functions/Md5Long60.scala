package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's portable 60-bit md5 hash
  * (high 60 bits of md5 = the first 15 hex digits as an integer),
  * BIT-IDENTICAL to the composed form it replaces —
  * `conv(substring(md5(x), 1, 15), 16, 10) cast long` — and to the
  * DuckDB dual `('0x' || substr(md5(x),1,15))::BIGINT`.
  *
  * Why: the composed form pays, PER VALUE, an md5 (commons-codec
  * allocates a fresh MessageDigest inside Spark's Md5 expression), a
  * 32-char hex string, a substring, and a hex→Decimal→long Conv — on
  * token-exploded relations (text_dsir_weights, q_model_lift,
  * q_sample_hash) that chain dominates the profile. This expression
  * digests the UTF-8 bytes directly into a long with a THREAD-LOCAL
  * reusable MessageDigest: no hex string, no Decimal, no per-call
  * getInstance. FunctionsSpec pins the bit-equality against the
  * composed form; PropertiesSpec already pins the JVM-kernel twin
  * (TextOps.md5Long60) against the same family.
  *
  * Registered for SQL as `graft_md5_60` via GraftFunctions.register;
  * TextOps.md5Long routes through it, so every declarative call site
  * upgraded at once with oracles unchanged. */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true // null in → null out
  override def prettyName: String = "graft_md5_60"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    Md5Long60.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Long60 {
  // one digest per thread, reused: MessageDigest.getInstance does a
  // provider lookup + allocation per call — measurable when hashing
  // every token of a corpus
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** High 60 bits of md5(utf8 bytes) — callable from generated code. */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h >>> 4
  }
}
