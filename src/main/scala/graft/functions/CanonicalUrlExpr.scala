package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static shim for [[CanonicalUrl]]'s codegen call site — the
  * normalization logic itself lives (and is unit-tested) at
  * [[graft.operators.Robots.canonicalUrl]]. */
object CanonicalUrlOps {
  def apply(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.operators.Robots.canonicalUrl(s.toString))
}

/** `canonical_url(string)` → string: RFC 3986 §6 URL normalization
  * (see [[graft.operators.Robots.canonicalUrl]] for the exact steps).
  * A native expression, not a UDF (VERDICT r17 #7): the canonical form
  * sits on the highest-row-count projection a real crawl runs — the
  * frontier/diff key of every capture — and a Scala UDF there would
  * break the scan's whole-stage-codegen span and box every row; this
  * stays inside codegen like the repo's other hot scalar expressions
  * (HyperplaneBucket, DotProduct, RandomProjectFp). */
case class CanonicalUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"canonical_url needs string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CanonicalUrlOps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CanonicalUrlOps$$.MODULE$$.apply($c);")

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
  override def prettyName: String = "canonical_url"
}
