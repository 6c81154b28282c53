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
