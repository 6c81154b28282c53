package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `sortable_bits_to_double(long)` — inverse of
  * [[BottomKAgg.sortableBits]], so a query can decode a double priority
  * that rode the long heap (e.g. a negated similarity score) without a
  * second scan. */
case class SortableBitsToDouble(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"needs long input, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    BottomKAgg.unsortableBits(input.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BottomKAgg$$.MODULE$$.unsortableBits($c);")
  override protected def withNewChildInternal(newChild: Expression): SortableBitsToDouble =
    copy(child = newChild)
  override def prettyName: String = "sortable_bits_to_double"
}

/** Mergeable bottom-k aggregate: keeps the `k` payloads with the
  * smallest `(priority, payload)` per group, as a bounded binary heap.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY p) <= k` SORTS every group in full — a 10⁹-row group costs
  * n·log n and one task. Bottom-k is MERGEABLE (bottom-k of a union =
  * bottom-k of the merged bottom-ks), so this runs as partial
  * aggregation: every map task reduces its slice to ≤ k pairs before the
  * shuffle, the exchange carries k·tasks rows, and no group is ever
  * materialized, let alone sorted. Same result, heap cost n·log k, full
  * parallelism.
  *
  * With `priority = hash(id)` this is a deterministic uniform group
  * sample (the bottom-k-by-hash sketch); with a real column it's
  * per-group top-k/bottom-k. Ties break by payload — bit-stable across
  * partitionings and engines.
  */
case class BottomKAgg(priority: Expression, payload: Expression, k: Int,
                      withPriorities: Boolean = false,
                      distinct: Boolean = false,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKAgg.Heap] {
  require(k >= 1, s"bottom_k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(priority, payload)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (withPriorities)
      ArrayType(StructType(Seq(
        StructField("p", LongType, nullable = false),
        StructField("v", LongType, nullable = false))), containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (priority.dataType, payload.dataType) match {
      case (LongType, LongType) | (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bottom_k needs (long|double priority, long payload), got $other")
    }

  @transient private lazy val doublePriority = priority.dataType == DoubleType

  override def createAggregationBuffer(): BottomKAgg.Heap = new BottomKAgg.Heap(k, distinct)

  override def update(buf: BottomKAgg.Heap, input: InternalRow): BottomKAgg.Heap = {
    val p = priority.eval(input)
    val v = payload.eval(input)
    if (p != null && v != null) {
      if (doublePriority) {
        val d = p.asInstanceOf[Double]
        // NaN is EXCLUDED outright (not just sorted last): an under-full
        // heap admits anything it is offered, so sorting alone would let
        // NaN into small groups — divergent from the documented contract
        if (!java.lang.Double.isNaN(d)) buf.offer(BottomKAgg.sortableBits(d), v.asInstanceOf[Long])
      } else buf.offer(p.asInstanceOf[Long], v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BottomKAgg.Heap, other: BottomKAgg.Heap): BottomKAgg.Heap = {
    other.foreach((p, v) => buf.offer(p, v))
    buf
  }

  override def eval(buf: BottomKAgg.Heap): Any =
    if (withPriorities)
      new GenericArrayData(buf.sortedPairs.map { case (p, v) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](p, v)): Any
      })
    else new GenericArrayData(buf.sortedPayloads)

  override def serialize(buf: BottomKAgg.Heap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): BottomKAgg.Heap =
    BottomKAgg.Heap.fromBytes(bytes, k, distinct)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(priority = newChildren(0), payload = newChildren(1))
  override def prettyName: String = "bottom_k"
}

object BottomKAgg {

  /** Order-preserving double→long map (the classic sortable-bits
    * transform), so a DOUBLE priority (a similarity score, a loss)
    * rides the same long heap. −0.0 folds to 0.0 first — SQL ORDER BY
    * treats them equal, and an oracle replaying the ordering must not
    * see a divergence the engine invented. NaN never reaches the heap —
    * [[BottomKAgg.update]] drops it like a null. */
  @inline def sortableBits(d: Double): Long = {
    val x = d + 0.0 // fold -0.0
    val bits = java.lang.Double.doubleToLongBits(x)
    // Lucene's doubleToSortableLong: negatives flip their lower 63 bits
    // (order within negatives reverses, sign bit keeps them below all
    // positives). An involution — the inverse is the same map.
    if (bits < 0) bits ^ Long.MaxValue else bits
  }

  /** Inverse of [[sortableBits]] (same involution, decoded). */
  @inline def unsortableBits(l: Long): Double =
    java.lang.Double.longBitsToDouble(if (l < 0) l ^ Long.MaxValue else l)

  /** Bounded max-heap over (priority, payload) pairs: the ROOT is the
    * LARGEST pair, so a full heap admits a new pair by evicting the
    * root iff the newcomer is smaller. Flat long arrays, no boxing.
    *
    * `distinct = true` makes the heap keep each (priority, payload)
    * pair at most once (an O(k) membership scan per offer — k is small
    * by the aggregate's nature): bottom-k DISTINCT is still mergeable,
    * and it lets callers that used to pre-`distinct()` their input drop
    * that exchange (r20, q_cooccur). */
  final class Heap(k: Int, distinct: Boolean = false) {
    private val ps = new Array[Long](k)
    private val vs = new Array[Long](k)
    private var n = 0

    @inline private def gt(p1: Long, v1: Long, p2: Long, v2: Long): Boolean =
      p1 > p2 || (p1 == p2 && v1 > v2)

    @inline private def contains(p: Long, v: Long): Boolean = {
      var i = 0
      while (i < n) { if (ps(i) == p && vs(i) == v) return true; i += 1 }
      false
    }

    def offer(p: Long, v: Long): Unit = {
      if (distinct && contains(p, v)) return
      if (n < k) {
        ps(n) = p; vs(n) = v; n += 1
        var i = n - 1 // sift up
        while (i > 0 && gt(ps(i), vs(i), ps((i - 1) / 2), vs((i - 1) / 2))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (gt(ps(0), vs(0), p, v)) {
        ps(0) = p; vs(0) = v
        var i = 0 // sift down
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < n && gt(ps(l), vs(l), ps(m), vs(m))) m = l
          if (r < n && gt(ps(r), vs(r), ps(m), vs(m))) m = r
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
    }

    @inline private def swap(i: Int, j: Int): Unit = {
      val tp = ps(i); ps(i) = ps(j); ps(j) = tp
      val tv = vs(i); vs(i) = vs(j); vs(j) = tv
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ps(i), vs(i)); i += 1 }
    }

    /** Payloads ascending by (priority, payload). */
    def sortedPayloads: Array[Long] = sortedIdx.map(vs).toArray

    /** (priority, payload) pairs ascending. */
    def sortedPairs: Array[(Long, Long)] = sortedIdx.map(i => (ps(i), vs(i))).toArray

    private def sortedIdx: Array[Int] = (0 until n).sortWith { (a, b) =>
      ps(a) < ps(b) || (ps(a) == ps(b) && vs(a) < vs(b))
    }.toArray

    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putLong(ps(i)); bb.putLong(vs(i)); i += 1 }
      bb.array()
    }
  }

  object Heap {
    def fromBytes(bytes: Array[Byte], k: Int, distinct: Boolean = false): Heap = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val h = new Heap(k, distinct)
      var i = 0
      while (i < n) { h.offer(bb.getLong, bb.getLong); i += 1 }
      h
    }
  }
}
