package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.GraftShim.{column => toCol, expression => toExpr}

/** Native vector ops for the similarity operators.
  *
  * Spark's `aggregate`/`zip_with` higher-order functions interpret their
  * lambda per element (no codegen), costing ~10 µs per 64-dim dot product —
  * ruinous inside an all-pairs join. This is the case SURVEY.md §7.3 calls
  * out for a custom Catalyst `Expression`: a tight primitive loop with real
  * codegen, ~100× faster, bit-identical summation order (left-to-right), so
  * DuckDB oracle parity is preserved.
  */
object VectorFunctions {

  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** dot over two array<double> columns. */
  def vec_dot(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))

  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))
}
