package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass within-document repetition statistics — the Gopher-style
  * repetition filters (duplicate-line fraction, most-frequent-n-gram
  * coverage, duplicated-n-gram coverage) used to drop boilerplate and
  * degenerate documents from a pretraining corpus.
  *
  * Same design rationale as [[TextProfileOps]]: these signals need the
  * line list, the word list, and several n-gram count maps per document;
  * composing them from `split`/`explode`/higher-order functions would
  * either shuffle the corpus (explode) or fall out of whole-stage codegen
  * (HOF lambdas are `CodegenFallback`). This expression computes every
  * statistic in one generated-code call per row; downstream fraction
  * arithmetic is plain codegen'd math over struct fields. At 100 TB the
  * repetition filter is a first-pass full-corpus operator — it must run at
  * scan speed, per-partition, with nothing shuffled.
  *
  * Exact semantics (replicated by the DuckDB oracle of `q_repetition`):
  *  - a LINE is a maximal non-empty run between `\n` separators
  *    (split on `\n`, drop empty pieces);
  *  - a WORD is a maximal run of non-whitespace (regex `\s`) chars;
  *  - lengths are codepoint counts;
  *  - `dup_lines` / `dup_line_chars` count occurrences BEYOND THE FIRST
  *    of each repeated line value (and their chars);
  *  - for each n in `topNs`: `top_chars[i]` = (occurrences of the most
  *    frequent word n-gram) × (sum of its words' lengths, separators
  *    excluded), or 0 when no n-gram occurs twice — a top n-gram seen
  *    once is document content, not repetition, and would otherwise
  *    dominate the fraction on short documents; frequency ties break to
  *    the smallest n-gram by UTF-8 byte order (what DuckDB `ORDER BY`
  *    does on strings);
  *  - for each n in `dupNs`: `dup_chars[i]` = total length of words at
  *    positions covered by at least one n-gram occurring ≥ 2 times
  *    (positions are counted once — union coverage, not per-n-gram).
  */
object RepetitionOps {

  val schema: StructType = StructType(Seq(
    StructField("chars", LongType, nullable = false),
    StructField("lines", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_lines", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("words", LongType, nullable = false),
    StructField("word_chars", LongType, nullable = false),
    StructField("top_chars", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("dup_chars", ArrayType(LongType, containsNull = false), nullable = false)))

  @inline private def isRegexWs(cp: Int): Boolean = // Java regex \s
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def utf8Lt(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  /** Invoked from generated code (and interpreted eval). */
  def profile(input: UTF8String, topNs: Array[Int], dupNs: Array[Int]): InternalRow = {
    val s = input.toString
    val chars = s.codePointCount(0, s.length).toLong

    // ---- line pass ----
    val lineCounts = new java.util.HashMap[String, Int]
    var lines = 0L; var lineChars = 0L
    var start = 0
    var idx = 0
    while (idx <= s.length) {
      if (idx == s.length || s.charAt(idx) == '\n') {
        if (idx > start) {
          val ln = s.substring(start, idx)
          lines += 1
          lineChars += ln.codePointCount(0, ln.length)
          lineCounts.merge(ln, 1, Integer.sum)
        }
        start = idx + 1
      }
      idx += 1
    }
    var dupLines = 0L; var dupLineChars = 0L
    val lit = lineCounts.entrySet().iterator()
    while (lit.hasNext) {
      val e = lit.next()
      if (e.getValue > 1) {
        dupLines += e.getValue - 1
        dupLineChars += (e.getValue - 1).toLong *
          e.getKey.codePointCount(0, e.getKey.length)
      }
    }

    // ---- word pass ----
    val words = new scala.collection.mutable.ArrayBuffer[String]
    var wordChars = 0L
    var i = 0; var wStart = -1
    while (i <= s.length) {
      val cp = if (i < s.length) s.codePointAt(i) else ' '
      if (i < s.length && !isRegexWs(cp)) { if (wStart < 0) wStart = i }
      else if (wStart >= 0) {
        words += s.substring(wStart, i); wStart = -1
      }
      i += (if (i < s.length) Character.charCount(cp) else 1)
    }
    val m = words.length
    val wordLens = new Array[Long](m)
    var w = 0
    while (w < m) {
      wordLens(w) = words(w).codePointCount(0, words(w).length)
      wordChars += wordLens(w)
      w += 1
    }

    def ngramKeys(n: Int): Array[String] = {
      val cnt = m - n + 1
      if (cnt <= 0) return Array.empty
      val out = new Array[String](cnt)
      var i = 0
      while (i < cnt) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(words(i + j)); j += 1 }
        out(i) = sb.toString
        i += 1
      }
      out
    }

    // ---- top n-gram coverage ----
    val topChars = new Array[Long](topNs.length)
    var t = 0
    while (t < topNs.length) {
      val n = topNs(t)
      val keys = ngramKeys(n)
      if (keys.nonEmpty) {
        val counts = new java.util.HashMap[String, Int](keys.length * 2)
        keys.foreach(k => counts.merge(k, 1, Integer.sum))
        var bestKey: String = null; var bestCnt = 0
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > bestCnt ||
              (e.getValue == bestCnt && utf8Lt(e.getKey, bestKey))) {
            bestCnt = e.getValue; bestKey = e.getKey
          }
        }
        // glen = word chars only (the single-space separators are an
        // artifact of the join, not document content)
        val glen = bestKey.codePointCount(0, bestKey.length).toLong - (n - 1)
        if (bestCnt >= 2) topChars(t) = bestCnt.toLong * glen
      }
      t += 1
    }

    // ---- duplicated n-gram union coverage ----
    val dupChars = new Array[Long](dupNs.length)
    var d = 0
    while (d < dupNs.length) {
      val n = dupNs(d)
      val keys = ngramKeys(n)
      if (keys.nonEmpty) {
        val counts = new java.util.HashMap[String, Int](keys.length * 2)
        keys.foreach(k => counts.merge(k, 1, Integer.sum))
        val covered = new Array[Boolean](m)
        var i = 0
        while (i < keys.length) {
          if (counts.get(keys(i)) > 1) {
            var j = i
            while (j < i + n) { covered(j) = true; j += 1 }
          }
          i += 1
        }
        var sum = 0L; var p = 0
        while (p < m) { if (covered(p)) sum += wordLens(p); p += 1 }
        dupChars(d) = sum
      }
      d += 1
    }

    new GenericInternalRow(Array[Any](chars, lines, lineChars, dupLines, dupLineChars,
      m.toLong, wordChars, new GenericArrayData(topChars), new GenericArrayData(dupChars)))
  }
}

/** `repetition_profile(string)` → struct (see [[RepetitionOps.schema]]).
  * `topNs`/`dupNs` become plan constants referenced from generated code. */
case class RepetitionProfile(child: Expression, topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression {
  override def dataType: DataType = RepetitionOps.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"repetition_profile needs string input, got $other")
  }

  @transient private lazy val topArr: Array[Int] = topNs.toArray
  @transient private lazy val dupArr: Array[Int] = dupNs.toArray

  override def nullSafeEval(input: Any): Any =
    RepetitionOps.profile(input.asInstanceOf[UTF8String], topArr, dupArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val topRef = ctx.addReferenceObj("topNs", topArr, "int[]")
    val dupRef = ctx.addReferenceObj("dupNs", dupArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionOps$$.MODULE$$.profile($c, $topRef, $dupRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionProfile =
    copy(child = newChild)
  override def prettyName: String = "repetition_profile"
}
