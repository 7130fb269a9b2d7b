package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** |A ∩ B| for two SORTED long-array columns, as a native codegen'd
  * Catalyst expression: a two-pointer merge — O(|A| + |B|) primitive reads,
  * no boxing, no per-row hash set. Replaces
  * `size(array_intersect(a, b))`, whose generic path boxes every element
  * into an `OpenHashSet[Any]` per row; on the near-dup verify stage
  * (hundreds of thousands of pairs × ~300-element sets) the merge is the
  * difference between the intersect dominating the query and vanishing
  * into the join's codegen stage.
  *
  * Both inputs MUST be ascending-sorted and duplicate-free (the caller
  * builds them with `sort_array(collect_set(...))`); the merge silently
  * undercounts otherwise.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.ArrayType
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_long_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = x.numElements()
    val yn = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < xn && j < yn) {
      val u = x.getLong(i)
      val v = y.getLong(j)
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |int $i = 0;
         |int $j = 0;
         |final int ${i}n = $a.numElements();
         |final int ${j}n = $b.numElements();
         |${ev.value} = 0L;
         |while ($i < ${i}n && $j < ${j}n) {
         |  final long $u = $a.getLong($i);
         |  final long $v = $b.getLong($j);
         |  if ($u == $v) { ${ev.value}++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}
