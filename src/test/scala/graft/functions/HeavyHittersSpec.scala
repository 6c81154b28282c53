package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class HeavyHittersSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("item", StringType)))

  private def agg(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val a = HeavyHittersAgg(ColumnBridge.expression(col("item")), k)
    df.groupBy("g").agg(ColumnBridge.column(a.toAggregateExpression()).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.item").as("item"), col("e.est").as("est"), col("e.err").as("err"))
  }

  test("exact when distinct items fit the summary (err = 0, counts exact)") {
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val d = df(schema, rows.map(Row("g1", _))).repartition(4)
    val out = agg(d, k = 8).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map("a" -> (5L, 0L), "b" -> (3L, 0L), "c" -> (2L, 0L)))
  }

  test("SpaceSaving bounds hold on a skewed multi-partition stream") {
    val rnd = new scala.util.Random(13)
    // zipf-ish: heavy items h0..h4 dominate, long tail of rare items
    val stream = (1 to 4000).map { _ =>
      if (rnd.nextDouble() < 0.6) s"h${rnd.nextInt(5)}" else s"t${rnd.nextInt(400)}"
    }
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val k = 32
    val d = df(schema, stream.map(Row("g1", _))).repartition(8)
    val out = agg(d, k).collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    out.foreach { case (item, est, err) =>
      val t = trueCounts.getOrElse(item, 0L)
      assert(est >= t, s"$item overcount guarantee: est=$est true=$t")
      assert(est - err <= t, s"$item error bound: est=$est err=$err true=$t")
    }
    // every item above the N/k guarantee line is tracked
    val tracked = out.map(_._1).toSet
    trueCounts.filter(_._2 > n / k).keys.foreach { hot =>
      assert(tracked(hot), s"guaranteed heavy item $hot missing")
    }
  }

  test("summary serde round-trips; merge sums matching counters") {
    val s = new HeavyHittersAgg.Summary(3)
    Seq("a", "a", "b", "c", "c", "c").foreach(s.offer(_, 1, 0))
    val back = HeavyHittersAgg.Summary.fromBytes(s.toBytes, 3)
    assert(back.sorted.toSeq == s.sorted.toSeq)
    val other = new HeavyHittersAgg.Summary(3)
    Seq("a", "b", "b").foreach(other.offer(_, 1, 0))
    other.foreach((i, c, e) => s.offer(i, c, e))
    val merged = s.sorted.map(t => t._1 -> t._2).toMap
    assert(merged("a") == 3 && merged("b") == 3 && merged("c") == 3)
  }

  test("vocabularySketch finds the same head tokens as the exact vocabulary") {
    val docs = graft.sources.ParquetConnector.readTable(
      spark, "/root/testdata/sf0.001/documents.parquet")
    val exact = TextFunctions.vocabulary(docs, "text", topK = 10)
      .collect().map(_.getString(0)).toSet
    val sketch = TextFunctions.vocabularySketch(docs, "text", topK = 200)
      .orderBy(desc("est")).limit(10).collect().map(_.getString(0)).toSet
    // a 20x-oversized summary must recover the exact top-10 head
    assert(exact.subsetOf(sketch ++ exact.take(0) ++ sketch), s"exact=$exact sketch=$sketch")
    assert((exact intersect sketch).size >= 8, s"head overlap too low: $exact vs $sketch")
  }

  /** The pre-heap reference algorithm: O(k) linear min-scan eviction
    * with the identical deterministic rule (min est; tie → lexically
    * largest key evicted). The heap-based Summary must be
    * indistinguishable from this. */
  private final class LinearScanSummary(k: Int) {
    private val counts = new java.util.HashMap[String, Array[Long]](k * 2)
    def offer(item: String, weight: Long, err: Long): Unit = {
      val cur = counts.get(item)
      if (cur != null) { cur(0) += weight; cur(1) += err }
      else if (counts.size < k) counts.put(item, Array(weight, err))
      else {
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
    def sorted: Seq[(String, Long, Long)] = {
      val b = Seq.newBuilder[(String, Long, Long)]
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        b += ((e.getKey, e.getValue()(0), e.getValue()(1)))
      }
      b.result().sortBy { case (s, c, _) => (-c, s) }
    }
  }

  test("heap eviction is item-for-item identical to the linear-scan reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val k = 1 + rnd.nextInt(16)
      val heap = new HeavyHittersAgg.Summary(k)
      val ref = new LinearScanSummary(k)
      (0 until 2000).foreach { _ =>
        // skewed + weighted offers, including merge-style carried error
        val item = if (rnd.nextDouble() < 0.5) s"h${rnd.nextInt(4)}" else s"t${rnd.nextInt(60)}"
        val w = 1L + rnd.nextInt(3)
        val e = if (rnd.nextDouble() < 0.2) rnd.nextInt(2).toLong else 0L
        heap.offer(item, w, e); ref.offer(item, w, e)
      }
      assert(heap.sorted.toSeq == ref.sorted,
        s"trial $trial (k=$k) diverged from reference eviction")
    }
  }

  test("saturated eviction stays sub-linear in k (heap beats linear scan)") {
    // sized so the linear baseline does ~4*10^7 ops (tens of ms), not
    // ~10^9 (seconds) — the sub-linear margin is still ~100x, far above
    // any CI jitter, and the differential test above is the merge gate
    val k = 2000
    val n = 20000
    // all-distinct stream: every offer past the first k is an eviction
    val items = Array.tabulate(n)(i => s"item_$i")
    def time(f: => Unit): Long = { val t0 = System.nanoTime(); f; System.nanoTime() - t0 }
    val heapNs = time { val s = new HeavyHittersAgg.Summary(k); items.foreach(s.offer(_, 1, 0)) }
    val linNs = time { val s = new LinearScanSummary(k); items.foreach(s.offer(_, 1, 0)) }
    info(f"k=$k n=$n heap=${heapNs / 1e6}%.1fms linear=${linNs / 1e6}%.1fms (${linNs.toDouble / heapNs}%.0fx)")
    assert(heapNs < linNs, s"heap eviction ($heapNs ns) should beat O(k) scan ($linNs ns)")
  }

  test("heavy_hitters SQL form resolves") {
    GraftFunctions.register(spark)
    df(schema, Seq(Row("g1", "x"), Row("g1", "x"), Row("g1", "y")))
      .createOrReplaceTempView("hh_docs")
    val out = spark.sql(
      "SELECT g, heavy_hitters(item, 4) AS hh FROM hh_docs GROUP BY g").head()
    val items = out.getSeq[Row](1).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(items == Map("x" -> 2L, "y" -> 1L))
  }
}
