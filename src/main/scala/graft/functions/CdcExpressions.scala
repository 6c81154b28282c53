package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass content-defined-chunking expressions (r19
  * optimization round, guide §2.4/§4): the composed
  * [[graft.operators.Dedup.contentDefinedChunks]] plan was
  *
  *   posexplode(split(text)) → md5 per word → WINDOW(sum over doc) →
  *   groupBy(doc, chunk) collect_list + array_sort → array_join
  *
  * i.e. TWO full shuffles of every word of the corpus (the window's
  * hash-partition+sort by (doc, pos), then the groupBy's re-shuffle of
  * the same bytes) for a computation that is row-local by construction —
  * a document's chunking depends on nothing outside the document. These
  * expressions compute the identical chunk rows inside whole-stage
  * codegen with ZERO exchanges; measured on the bench they removed both
  * corpus-text shuffles from every CDC consumer (q_content_chunks,
  * q_chunk_containment, q_chunk_share, q_chunk_incr, chunkIndex and the
  * tick fixtures built on it).
  *
  * Bit-compatibility contract (spec-pinned in CdcExpressionsSpec):
  *  - words = the non-empty `\s+`-separated tokens of the RAW text, in
  *    order — exactly `posexplode(split(trim(text), "\\s+"))` minus the
  *    empty tokens (Java `\s` = the six ASCII whitespace chars; they
  *    never occur inside a UTF-8 multibyte sequence, so the byte scan is
  *    exact).
  *  - a word opens a NEW chunk after it when the first hex nibble of its
  *    md5 is < `boundaryHex` — same digests, same cut as the
  *    `substring(md5(_w), 1, 1) < toHexString(boundaryHex)` comparison
  *    (hex chars order like their nibble values).
  *  - chunk_text = the chunk's words joined by a single space;
  *    chunk_md5 = lowercase hex md5 of chunk_text's UTF-8 bytes — the
  *    built-in `md5()` of the same string.
  */
object CdcOps {

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

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** (starts, ends) byte ranges of the non-empty whitespace-separated
    * words of `bytes`. */
  private def wordSpans(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val nb = bytes.length
    var n = 0
    var i = 0
    var in = false
    while (i < nb) {
      val ws = isWs(bytes(i))
      if (!ws && !in) { n += 1; in = true }
      else if (ws) in = false
      i += 1
    }
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    i = 0; in = false
    var w = 0
    while (i < nb) {
      val ws = isWs(bytes(i))
      if (!ws && !in) { starts(w) = i; in = true }
      else if (ws && in) { ends(w) = i; w += 1; in = false }
      i += 1
    }
    if (in) { ends(w) = nb; w += 1 }
    (starts, ends, n)
  }

  /** Per-word boundary flags: true when md5(word) opens below the cut. */
  private def boundaries(bytes: Array[Byte], starts: Array[Int],
                         ends: Array[Int], n: Int, boundaryHex: Int): Array[Boolean] = {
    val md = md5Local.get()
    val out = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, starts(i), ends(i) - starts(i))
      val d = md.digest()
      out(i) = ((d(0) >> 4) & 0xf) < boundaryHex
      i += 1
    }
    out
  }

  /** Chunk word ranges: chunk c = words [from(c), until(c)). A boundary
    * word is the LAST word of its chunk (the cut is after it). */
  private def chunkRanges(b: Array[Boolean], n: Int): (Array[Int], Array[Int], Int) = {
    if (n == 0) return (Array.emptyIntArray, Array.emptyIntArray, 0)
    var chunks = 1
    var i = 0
    while (i < n - 1) { if (b(i)) chunks += 1; i += 1 }
    val from = new Array[Int](chunks)
    val until = new Array[Int](chunks)
    from(0) = 0
    var c = 0
    i = 0
    while (i < n - 1) {
      if (b(i)) { until(c) = i + 1; c += 1; from(c) = i + 1 }
      i += 1
    }
    until(c) = n
    (from, until, chunks)
  }

  /** chunk_text bytes (words joined by single spaces) for words
    * [from, until). */
  private def chunkBytes(bytes: Array[Byte], starts: Array[Int], ends: Array[Int],
                         from: Int, until: Int): Array[Byte] = {
    var len = until - from - 1 // single-space gaps
    var i = from
    while (i < until) { len += ends(i) - starts(i); i += 1 }
    val out = new Array[Byte](len)
    var pos = 0
    i = from
    while (i < until) {
      if (i > from) { out(pos) = ' '; pos += 1 }
      val wl = ends(i) - starts(i)
      System.arraycopy(bytes, starts(i), out, pos, wl)
      pos += wl
      i += 1
    }
    out
  }

  /** array<struct<chunk_idx, chunk_text, n_words, chunk_md5>> — one
    * struct per chunk, in document order. Empty/whitespace-only text →
    * empty array (explode yields no rows, like the composed form). */
  def cdcChunks(s: UTF8String, boundaryHex: Int): ArrayData = {
    val bytes = s.getBytes
    val (starts, ends, n) = wordSpans(bytes)
    val b = boundaries(bytes, starts, ends, n, boundaryHex)
    val (from, until, chunks) = chunkRanges(b, n)
    val md = md5Local.get()
    val rows = new Array[Any](chunks)
    var c = 0
    while (c < chunks) {
      val cb = chunkBytes(bytes, starts, ends, from(c), until(c))
      md.reset()
      md.update(cb)
      rows(c) = InternalRow(c.toLong, UTF8String.fromBytes(cb),
        (until(c) - from(c)).toLong, hex(md.digest()))
      c += 1
    }
    new GenericArrayData(rows)
  }

  /** array<struct<chunk_md5, mass, doc_words>> — the per-(doc, digest)
    * chunk-mass rows of [[graft.operators.Dedup.chunkIndex]], computed
    * row-locally: mass = Σ n_words over the doc's chunks sharing the
    * digest (first-occurrence order), doc_words = Σ over all chunks =
    * the doc's word count. Replaces a groupBy(doc, digest) + doc-totals
    * join — two more shuffles that were corpus-keyed. */
  def cdcChunkMass(s: UTF8String, boundaryHex: Int): ArrayData = {
    val bytes = s.getBytes
    val (starts, ends, n) = wordSpans(bytes)
    val b = boundaries(bytes, starts, ends, n, boundaryHex)
    val (from, until, chunks) = chunkRanges(b, n)
    val md = md5Local.get()
    val order = new java.util.ArrayList[UTF8String](chunks)
    val mass = new java.util.HashMap[UTF8String, java.lang.Long](chunks * 2)
    var c = 0
    while (c < chunks) {
      val cb = chunkBytes(bytes, starts, ends, from(c), until(c))
      md.reset()
      md.update(cb)
      val key = hex(md.digest())
      val words = (until(c) - from(c)).toLong
      val prev = mass.get(key)
      if (prev != null) mass.put(key, prev + words)
      else { mass.put(key, words); order.add(key) }
      c += 1
    }
    val docWords = n.toLong
    val rows = new Array[Any](order.size)
    var i = 0
    while (i < order.size) {
      val k = order.get(i)
      rows(i) = InternalRow(k, mass.get(k), docWords)
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** `cdc_chunks(text, boundaryHex)` → array<struct<chunk_idx:long,
  * chunk_text:string, n_words:long, chunk_md5:string>>. */
case class CdcChunksExpr(child: Expression, boundaryHex: Int) extends UnaryExpression {
  require(boundaryHex >= 1 && boundaryHex <= 15,
    s"boundaryHex must be in [1, 15], got $boundaryHex")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks needs string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CdcOps.cdcChunks(input.asInstanceOf[UTF8String], boundaryHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcOps$$.MODULE$$.cdcChunks($c, $boundaryHex);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}

/** `cdc_chunk_mass(text, boundaryHex)` → array<struct<chunk_md5:string,
  * mass:long, doc_words:long>>. */
case class CdcChunkMassExpr(child: Expression, boundaryHex: Int) extends UnaryExpression {
  require(boundaryHex >= 1 && boundaryHex <= 15,
    s"boundaryHex must be in [1, 15], got $boundaryHex")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_md5", StringType, nullable = false),
    StructField("mass", LongType, nullable = false),
    StructField("doc_words", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_mass needs string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CdcOps.cdcChunkMass(input.asInstanceOf[UTF8String], boundaryHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcOps$$.MODULE$$.cdcChunkMass($c, $boundaryHex);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkMassExpr =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunk_mass"
}
