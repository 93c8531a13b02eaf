package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: Jaccard similarity of two SORTED
  * ARRAY<BIGINT> multisets (the shingle-hash arrays
  * TextOps.shingleArraysLocal produces) — the SQL-surface twin of the
  * engine's `interCount` kernel.
  *
  * Semantics: proper multiset Jaccard — intersection counts
  * Σ min(cA, cB) per equal value, jaccard = inter / (|A| + |B| − inter),
  * always in [0, 1]. On DISTINCT-element arrays (which
  * shingleArraysLocal always produces — shingleSet is a set) this is
  * bit-identical to the inverted-index join + groupBy count the dedup
  * oracles run; run-product counting would instead leave the [0,1]
  * range on duplicate elements (2·2 / (2+2−4) = ∞). NULL if either side
  * is NULL or contains a NULL element; both inputs MUST be sorted
  * ascending (as shingleArraysLocal emits) — unsorted input gives an
  * undefined result, it is not detected.
  *
  * One fused codegen'd merge loop, no intermediate arrays — the reason
  * this is a custom Expression and not
  * `size(array_intersect(a,b)) / size(array_union(a,b))` (which
  * allocates both arrays per row and has SET semantics, not the join's
  * multiset product semantics).
  *
  * Registered for SQL as `graft_jaccard` via GraftFunctions.register /
  * GraftExtensions. */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"
  override def nullable: Boolean = true

  private lazy val elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    if (n == 0 && m == 0) return null // empty ∪ empty: 0/0 undefined
    if (elementsNullable) {
      var i = 0
      while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
      i = 0
      while (i < m) { if (y.isNullAt(i)) return null; i += 1 }
    }
    var i = 0; var j = 0; var inter = 0L
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) {
        var ca = 0L; var cb = 0L
        while (i < n && x.getLong(i) == xi) { ca += 1; i += 1 }
        while (j < m && y.getLong(j) == xi) { cb += 1; j += 1 }
        inter += math.min(ca, cb)
      } else if (xi < yj) i += 1
      else j += 1
    }
    inter.toDouble / (n.toLong + m - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val inter = ctx.freshName("inter")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val ca = ctx.freshName("ca")
      val cb = ctx.freshName("cb")
      val nullScan =
        if (elementsNullable)
          s"""
             |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
             |  if ($a.isNullAt($i)) ${ev.isNull} = true;
             |}
             |for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
             |  if ($b.isNullAt($j)) ${ev.isNull} = true;
             |}
           """.stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |if ($n == 0 && $m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    long $inter = 0L;
         |    int $i = 0, $j = 0;
         |    while ($i < $n && $j < $m) {
         |      long $xi = $a.getLong($i);
         |      long $yj = $b.getLong($j);
         |      if ($xi == $yj) {
         |        long $ca = 0L, $cb = 0L;
         |        while ($i < $n && $a.getLong($i) == $xi) { $ca++; $i++; }
         |        while ($j < $m && $b.getLong($j) == $xi) { $cb++; $j++; }
         |        $inter += java.lang.Math.min($ca, $cb);
         |      } else if ($xi < $yj) { $i++; } else { $j++; }
         |    }
         |    ${ev.value} = ((double) $inter) / ((long) $n + (long) $m - $inter);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
