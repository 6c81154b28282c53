package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codepoint-polynomial bucket hash — `acc = (acc·31 + cp) mod B` over
  * the string's Unicode code points — as a native codegen'd expression.
  *
  * This is EXACTLY the arithmetic of `Dsir.arithBucket`'s higher-order
  * fold (and of the DuckDB `list_reduce(... unicode(x) ...)` oracle
  * replay), but the HOF form is CodegenFallback: per-gram interpreted
  * per-CHAR boxing made the oracle-path DSIR queries ~6× slower than
  * their plan shape warrants. One native loop per string keeps the
  * whole projection inside whole-stage codegen while remaining
  * SQL-replayable — unlike xxhash64, this hash any engine can compute.
  *
  * Codepoint contract: iteration is by Unicode code point (matching
  * DuckDB's `string_split('') → unicode(x)`), not UTF-16 units; the
  * fold reference differs on supplementary-plane characters (Spark's
  * `split("")` yields UTF-16 units) — parity with the fold is pinned on
  * BMP input, the DuckDB contract is the codepoint one. */
case class PolyBucket(child: Expression, numBuckets: Int) extends UnaryExpression {
  require(numBuckets >= 2 && numBuckets <= (1 << 24),
    s"numBuckets must be in [2, 2^24] (acc*31+cp must stay exact in a long), got $numBuckets")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_bucket needs string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % numBuckets
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % $numBuckets;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyBucket =
    copy(child = newChild)
  override def prettyName: String = "poly_bucket"
}
