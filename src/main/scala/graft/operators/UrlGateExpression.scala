package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared shape of the broadcast URL-gate predicates
  * ([[Robots.RobotsAllowed]], [[UrlFilter.UrlAllowed]]): a narrow
  * codegen'd Boolean over the url column ONLY, so the corpus row never
  * crosses a serialization boundary (a typed `Row` filter would
  * deserialize every column — html payload included — per row and break
  * whole-stage codegen on the exact stage that exists to be narrow). The
  * concrete case class carries a broadcast handle (serializes as a small
  * reference; executors read the compiled structure from the block
  * manager once per JVM) and implements [[allowedUrl]]. Never null: a
  * null url is admitted (nothing to gate on — the permissive default both
  * gates document). One codegen template serves both so a fix to the
  * null/cast/isNull contract lands everywhere at once. */
abstract class UrlGateExpression extends UnaryExpression {

  /** The per-url verdict; `u` may be null (→ admit). */
  def allowedUrl(u: UTF8String): Boolean

  final override def dataType: DataType = BooleanType
  final override def nullable: Boolean = false

  final override def eval(input: InternalRow): Any =
    allowedUrl(child.eval(input).asInstanceOf[UTF8String])

  final override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the concrete gate, cast to the (top-level) base class —
    // generated Java only needs allowedUrl's signature
    val ref = ctx.addReferenceObj(prettyName, this, classOf[UrlGateExpression].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |final boolean ${ev.value} =
        |  $ref.allowedUrl(${c.isNull} ? null : ${c.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }
}
