package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Codegen'd merge-intersection over SORTED DISTINCT long-array columns
 * (the shape `sort_array(collect_list(...))` of unique ids produces —
 * the k-clique candidate sets).
 *
 * Why not `array_intersect`: Spark's ArrayIntersect builds a hash set
 * per ROW. On the clique-extension stage that is rows × |array| boxed
 * inserts — measured 200+ seconds of pure allocation/GC for 15M rows ×
 * 150-element out-lists at sf0.1, with the shuffle idle. The sorted
 * merge below is two primitive cursors in whole-stage codegen: zero
 * allocation for the count form, one exact-sized array for the
 * intersect form.
 */
abstract class SortedMergeBase extends BinaryExpression {
  protected def mergeCount(x: ArrayData, y: ArrayData): Int = {
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val a = x.getLong(i); val b = y.getLong(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }
}

/** Count of common elements: |a ∩ b| as Long. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends SortedMergeBase {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    mergeCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]).toLong

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  long $va = $a.getLong($i); long $vb = $b.getLong($j);
         |  if ($va == $vb) { $c++; $i++; $j++; }
         |  else if ($va < $vb) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** The intersection itself (sorted), as an exact-sized long array. */
case class SortedIntersect(left: Expression, right: Expression)
    extends SortedMergeBase {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val out = new Array[Long](mergeCount(x, y))
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { out(k) = u; k += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val k = ctx.freshName("k"); val buf = ctx.freshName("buf")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |long[] $buf = new long[$n < $m ? $n : $m];
         |int $i = 0; int $j = 0; int $k = 0;
         |while ($i < $n && $j < $m) {
         |  long $va = $a.getLong($i); long $vb = $b.getLong($j);
         |  if ($va == $vb) { $buf[$k++] = $va; $i++; $j++; }
         |  else if ($va < $vb) { $i++; } else { $j++; }
         |}
         |long[] $out = new long[$k];
         |System.arraycopy($buf, 0, $out, 0, $k);
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedArrays {
  import org.apache.spark.sql.GraftColumnBridge

  /** |a ∩ b| over sorted distinct long arrays, as a Column. */
  def intersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** a ∩ b (sorted) over sorted distinct long arrays, as a Column. */
  def intersect(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersect(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
