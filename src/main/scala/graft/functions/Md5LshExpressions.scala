package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the REPLAYABLE (md5) MinHash-LSH path (r19
  * optimization round). The composed
  * [[graft.operators.Dedup.replayableMinhashPairs]] plan computed
  *
  *   _sh  = array_distinct(transform(sequence…, i → concat_ws(slice…)))
  *   band = array(array_min(transform(_sh, s → md5(concat("i:", s)))) …)
  *
  * — two layers of higher-order lambdas, which are CodegenFallback: ONE
  * in a projection drops the whole projection to interpreted eval, and
  * each md5 call paid a concat allocation + hex-string materialization
  * per (band, shingle). These expressions produce bit-identical values
  * (same md5 inputs, same lexicographic mins — hex strings order like
  * their digests; Md5LshExpressionsSpec pins parity against the
  * composed forms) in one codegen'd pass, hex-encoding only the
  * numHashes winning digests per row.
  *
  * The md5 hash family itself is untouchable here BY CONTRACT: the
  * oracle replays every bucket (`DuckDB md5 == Spark md5`), so the
  * optimization is evaluation cost only — same hashes, same buckets,
  * same pairs.
  */
object Md5LshOps {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((digest(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** unsigned lexicographic 16-byte digest compare — the same order as
    * comparing the lowercase-hex strings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Distinct word n-grams (first-occurrence order) of a SINGLE-SPACE
    * normalized string — `array_distinct(shingles(text, n))` exactly,
    * including the degenerate splits: an EMPTY string splits to one
    * empty token (Spark `split(…, " ")` keeps it), so n = 1 yields the
    * [""] singleton there, and fewer than n tokens yield the empty
    * array. Shingles are zero-copy views into the text's bytes
    * (contiguous spans — the string IS single-space separated). */
  def distinctShingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    if (nb == 0) {
      return if (n == 1) new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
      else new GenericArrayData(Array.empty[Any])
    }
    // token starts: normalized text has single spaces, no edge spaces
    var tokens = 1
    var i = 0
    while (i < nb) { if (bytes(i) == ' '.toByte) tokens += 1; i += 1 }
    val starts = new Array[Int](tokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nb) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokens) = nb + 1 // sentinel: starts(k)-1 = one past token k-1
    val windows = tokens - n + 1
    if (windows <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](windows * 2)
    i = 0
    while (i < windows) {
      val from = starts(i)
      val len = starts(i + n) - 1 - from
      seen.add(UTF8String.fromBytes(bytes, from, len))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Per-band minimum md5 over prefixed shingles:
    * out(i) = min over non-null elements s of md5hex(i + ":" + s) —
    * `array_min(transform(sh, s → md5(concat(lit("i:"), s))))` for each
    * band, one digest-compare pass, hex only for the winners. An empty
    * (or all-null) input yields null per band, like array_min(empty). */
  def md5BandMins(sh: ArrayData, numHashes: Int): ArrayData = {
    val md = md5Local.get()
    val prefixes = Array.tabulate(numHashes)(i => (i.toString + ":")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mins = new Array[Array[Byte]](numHashes)
    val n = sh.numElements()
    var e = 0
    while (e < n) {
      if (!sh.isNullAt(e)) {
        val sb = sh.getUTF8String(e).getBytes
        var i = 0
        while (i < numHashes) {
          md.reset()
          md.update(prefixes(i))
          md.update(sb)
          val d = md.digest()
          if (mins(i) == null || less(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      e += 1
    }
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = if (mins(i) == null) null else hex(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** |a ∩ b| as SETS — equals `size(array_intersect(a, b))` when both
    * inputs are already distinct (they are: [[distinctShingles]] output).
    * The composed intersect+union built two result arrays per pair just
    * to take their sizes. */
  def setOverlap(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    val (small, big) = if (na <= nb) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var i = 0
    val ns = small.numElements()
    while (i < ns) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var c = 0
    i = 0
    val nbg = big.numElements()
    while (i < nbg) {
      if (!big.isNullAt(i) && set.remove(big.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/** `distinct_shingles(normalizedText, n)` → `array<string>`. */
case class DistinctShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"distinct_shingles needs n >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_shingles needs string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Md5LshOps.distinctShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5LshOps$$.MODULE$$.distinctShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
  override def prettyName: String = "distinct_shingles"
}

/** `md5_band_mins(array<string>, numHashes)` → `array<string>` of length
  * numHashes. */
case class Md5BandMins(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_band_mins needs array<string> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Md5LshOps.md5BandMins(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5LshOps$$.MODULE$$.md5BandMins($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Md5BandMins =
    copy(child = newChild)
  override def prettyName: String = "md5_band_mins"
}

/** `set_overlap(array<string>, array<string>)` → `int`: set-intersection
  * cardinality of two DISTINCT arrays. */
case class SetOverlap(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"set_overlap needs two array<string> inputs, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    Md5LshOps.setOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Md5LshOps$$.MODULE$$.setOverlap($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SetOverlap =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "set_overlap"
}
