package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class BottomKSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("id", LongType)))

  test("bottom-k agg == window row_number reference on random groups (partial+merge paths)") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 2000).map(_ => Row(s"g${rnd.nextInt(7)}", rnd.nextInt(100000).toLong))
    // repartition wide so every group spans many partitions — partial
    // heaps MUST merge correctly or this diverges
    val d = df(schema, rows).repartition(16)
    val got = graft.operators.Curation.sampleGroups(d, Seq("g"), "id", k = 5)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val p = (col("id") * lit(2654435761L)) % lit(4294967296L)
    val ref = d.withColumn("_p", p)
      .withColumn("_rn", row_number().over(Window.partitionBy("g").orderBy(col("_p"), col("id"))))
      .filter(col("_rn") <= 5)
      .groupBy("g").agg(sort_array(collect_list(struct(col("_p"), col("id")))).as("_s"))
      .select(col("g"), col("_s.id").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == ref)
  }

  test("duplicate ids and k larger than the group") {
    val d = df(schema, Seq(Row("a", 7L), Row("a", 7L), Row("a", 1L), Row("b", 2L)))
    val got = graft.operators.Curation.sampleGroups(d, Seq("g"), "id", k = 10)
      .orderBy("g").collect().map(_.getSeq[Long](1).toSeq).toSeq
    // all rows kept (k > n), duplicates preserved, ascending by (p, id)
    assert(got.map(_.sorted) == Seq(Seq(1L, 7L, 7L), Seq(2L)))
  }

  test("sortableBits is an order-preserving involution across signs") {
    val rnd = new scala.util.Random(5)
    val xs = Seq(-1e300, -2.5, -1.0, -1e-300, -0.0, 0.0, 1e-300, 0.5, 1.0, 42.0, 1e300) ++
      Seq.fill(200)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(20) - 10))
    val sorted = xs.sorted
    val mapped = sorted.map(BottomKAgg.sortableBits)
    assert(mapped == mapped.sorted, "must preserve order")
    sorted.foreach { x =>
      assert(BottomKAgg.unsortableBits(BottomKAgg.sortableBits(x)) == (x + 0.0), x.toString)
    }
  }

  test("heap serde round-trips") {
    val h = new BottomKAgg.Heap(3)
    Seq((5L, 50L), (1L, 10L), (9L, 90L), (2L, 20L), (9L, 91L)).foreach { case (p, v) => h.offer(p, v) }
    val back = BottomKAgg.Heap.fromBytes(h.toBytes, 3)
    assert(back.sortedPayloads.toSeq == Seq(10L, 20L, 50L))
  }

  test("topKBy == window reference, both directions, on random doubles") {
    val rnd = new scala.util.Random(9)
    val schema2 = StructType(Seq(StructField("g", StringType),
      StructField("id", LongType), StructField("s", DoubleType)))
    val rows = (1L to 500L).map(i => Row(s"g${i % 4}", i, rnd.nextGaussian()))
    val d = df(schema2, rows).repartition(8)
    for (asc <- Seq(true, false)) {
      val got = graft.operators.Curation.topKBy(d, Seq("g"), "s", "id", k = 7, ascending = asc)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val w = Window.partitionBy("g")
        .orderBy(if (asc) col("s").asc else col("s").desc, col("id").asc)
      val ref = d.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 7)
        .select(col("g"), (col("_rn") - 1).cast("int").as("rank"), col("id"), col("s"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == ref, s"ascending=$asc")
    }
  }

  test("bottom_k SQL form matches the operator") {
    GraftFunctions.register(spark)
    df(schema, (1L to 50L).map(i => Row(s"g${i % 3}", i)))
      .createOrReplaceTempView("bk_docs")
    val viaSql = spark.sql(
      """SELECT g, bottom_k((id * 2654435761) % 4294967296, id, 4) AS sample_ids
        |FROM bk_docs GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(_.getSeq[Long](1).toSeq).toSeq
    val viaOp = graft.operators.Curation.sampleGroups(
      spark.table("bk_docs"), Seq("g"), "id", 4)
      .orderBy("g").collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(viaSql == viaOp)
  }

  test("partial aggregation: the exchange carries k-sized heaps, not groups") {
    val d = df(schema, (1L to 100L).map(i => Row(s"g${i % 2}", i)))
    val plan = graft.operators.Curation.sampleGroups(d, Seq("g"), "id", 3)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial+final ObjectHashAggregate:\n" + plan)
  }
}
