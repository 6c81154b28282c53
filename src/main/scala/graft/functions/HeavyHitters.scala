package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch: the approximate top-`k` items of a
  * group in ONE pass with k-bounded memory — `groupBy(item).count`
  * needs a shuffle carrying every DISTINCT item (billions of tokens at
  * 100 TB); this carries k counters per map task.
  *
  * Classic SpaceSaving guarantees, which the spec property-tests:
  *  - `est(x) >= true(x)` for every tracked item (never undercounts);
  *  - `est(x) - err(x) <= true(x)` (the error field bounds the
  *    overcount);
  *  - any item with true frequency > N/k is guaranteed tracked.
  * Merging two summaries sums matching counters and weighted-inserts
  * the rest — the standard mergeable form, so partial aggregation is
  * exact w.r.t. those bounds.
  *
  * Output: `array<struct<item string, est long, err long>>`, descending
  * by (est, item) — err = 0 means the count is EXACT (the item was
  * tracked from its first occurrence).
  */
case class HeavyHittersAgg(item: Expression, k: Int,
                           override val mutableAggBufferOffset: Int = 0,
                           override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HeavyHittersAgg.Summary] {
  require(k >= 1, s"heavy_hitters needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = item.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"heavy_hitters needs a string item, got $other")
  }

  override def createAggregationBuffer(): HeavyHittersAgg.Summary =
    new HeavyHittersAgg.Summary(k)

  override def update(buf: HeavyHittersAgg.Summary, input: InternalRow): HeavyHittersAgg.Summary = {
    val v = item.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: HeavyHittersAgg.Summary, other: HeavyHittersAgg.Summary): HeavyHittersAgg.Summary = {
    other.foreach((s, c, e) => buf.offer(s, c, e))
    buf
  }

  override def eval(buf: HeavyHittersAgg.Summary): Any =
    new GenericArrayData(buf.sorted.map { case (s, c, e) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), c, e)): Any
    })

  override def serialize(buf: HeavyHittersAgg.Summary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): HeavyHittersAgg.Summary =
    HeavyHittersAgg.Summary.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(item = newChildren(0))
  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {

  /** k-counter SpaceSaving summary. (est, err) per tracked item; a full
    * summary admits a new item by evicting the min-est entry m and
    * crediting the newcomer with m's whole estimate as error:
    * (m.est + weight, m.est + carriedErr). */
  final class Summary(k: Int) {
    private val counts = new java.util.HashMap[String, Array[Long]](k * 2)

    def offer(item: String, weight: Long, err: Long): Unit = {
      val cur = counts.get(item)
      if (cur != null) { cur(0) += weight; cur(1) += err }
      else if (counts.size < k) counts.put(item, Array(weight, err))
      else {
        // evict the min-estimate entry (tie → lexicographically largest
        // key leaves, keeping eviction deterministic)
        var minKey: String = null; var minEst = Long.MaxValue
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val est = e.getValue()(0)
          if (est < minEst || (est == minEst && e.getKey > minKey)) {
            minEst = est; minKey = e.getKey
          }
        }
        counts.remove(minKey)
        counts.put(item, Array(minEst + weight, minEst + err))
      }
    }

    def foreach(f: (String, Long, Long) => Unit): Unit = {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        f(e.getKey, e.getValue()(0), e.getValue()(1))
      }
    }

    /** Entries descending by (est, item asc on ties). */
    def sorted: Array[(String, Long, Long)] = {
      val arr = new Array[(String, Long, Long)](counts.size)
      var i = 0
      foreach { (s, c, e) => arr(i) = (s, c, e); i += 1 }
      arr.sortBy { case (s, c, _) => (-c, s) }
    }

    def toBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(counts.size)
      foreach { (s, c, e) =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
      }
      out.flush(); bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte], k: Int): Summary = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val s = new Summary(k)
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b)
        s.offer(new String(b, java.nio.charset.StandardCharsets.UTF_8),
          in.readLong(), in.readLong())
        i += 1
      }
      s
    }
  }
}
