package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash (h = h*31 + byte, FNV-style offset) as a
  * native Catalyst expression with codegen — the fingerprinting primitive
  * for exact dedup keys. A custom `Expression` (not a UDF) so it stays
  * inside whole-stage codegen: no boxing, no SerDe, runs at scan speed.
  *
  * Deterministic across JVMs/partitions (pure byte math), unlike
  * `Object.hashCode`-derived schemes.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash needs string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = RollingHash.Offset
    var i = 0
    while (i < bytes.length) { h = h * RollingHash.Prime + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long ${ev.value}_h = ${RollingHash.Offset}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}_h = ${ev.value}_h * ${RollingHash.Prime}L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = ${ev.value}_h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash = copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  val Offset: Long = 0xcbf29ce484222325L
  val Prime: Long = 31L
}
