package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for curation pipelines. The same visible
  * string can arrive byte-different (composed `é` vs `e`+U+0301): raw
  * fingerprints, n-gram hashes, and dedup keys all split on that unless
  * the corpus is canonicalized first. Spark ships no normalizer
  * builtin, so this is a native expression (java.text.Normalizer inside
  * codegen — no UDF).
  *
  * Modes (oracle parity: DuckDB `nfc_normalize` / `strip_accents`, both
  * utf8proc-backed, verified bit-equal on the pinned fixture):
  *  - `nfc`  — canonical composition (the storage canonical form);
  *  - `nfd`  — canonical decomposition;
  *  - `strip_accents` — NFD then drop combining marks (`\p{Mn}`):
  *    café→cafe, Å→A; pass-through for non-decomposable letters (ø, ß)
  *    exactly like DuckDB.
  */
object NormalizeOps {
  private val Mn = java.util.regex.Pattern.compile("\\p{Mn}")

  def apply(s: UTF8String, mode: Int): UTF8String = {
    val in = s.toString
    val out = mode match {
      case 0 => java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC)
      case 1 => java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFD)
      case _ => Mn.matcher(
        java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFD)).replaceAll("")
    }
    UTF8String.fromString(out)
  }

  def modeOf(name: String): Int = name match {
    case "nfc" => 0
    case "nfd" => 1
    case "strip_accents" => 2
    case other => throw new IllegalArgumentException(
      s"normalize_text mode must be nfc|nfd|strip_accents, got $other")
  }
}

/** `normalize_text(string, mode)` → string (see [[NormalizeOps]]). */
case class NormalizeText(child: Expression, mode: String) extends UnaryExpression {
  private val modeId = NormalizeOps.modeOf(mode)
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"normalize_text needs string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeOps(input.asInstanceOf[UTF8String], modeId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeOps$$.MODULE$$.apply($c, $modeId);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
  override def prettyName: String = "normalize_text"
}
