package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class EvaluationSpec extends SparkSpec {

  private val rankSchema = StructType(Seq(
    StructField("q", StringType), StructField("item", LongType),
    StructField("score", DoubleType), StructField("rel", BooleanType)))

  test("rankedEval: DCG/IDCG from gain literals, MRR, precision/recall at k") {
    val g = Evaluation.ndcgGains(3)
    val d = df(rankSchema, Seq(
      // query A ranked by score desc: items 1(rel),2,3(rel),4 — rank 4 is out of k=3
      Row("A", 1L, 9.0, true), Row("A", 2L, 8.0, false),
      Row("A", 3L, 7.0, true), Row("A", 4L, 6.0, true),
      // query B: nothing relevant
      Row("B", 1L, 5.0, false), Row("B", 2L, 4.0, false)))
    val out = Evaluation.rankedEval(d, "q", "item", "score", "rel", k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(1) == 4L && a.getLong(2) == 3L, "n=4, n_rel=3")
    assert(a.getLong(3) == 2L, "hits within k=3: ranks 1 and 3")
    assert(a.getLong(4) == 1L && a.getLong(5) == 1000000000000L, "first rel at rank 1")
    assert(a.getLong(6) == g(0) + g(2), s"dcg = gain(1)+gain(3), got ${a.getLong(6)}")
    // n_rel=3 >= k: ideal is all three top slots
    assert(a.getLong(7) == g.sum, "idcg = prefix(3)")
    assert(a.getDouble(8) == (g(0) + g(2)).toDouble / g.sum.toDouble)
    assert(a.getDouble(9) == 2.0 / 3.0 && a.getDouble(10) == 2.0 / 3.0)
    val b = out("B")
    assert(b.isNullAt(4) && b.isNullAt(5) && b.isNullAt(7) && b.isNullAt(8) &&
      b.isNullAt(10), "no relevant item: rank/rr/idcg/ndcg/recall all NULL")
    assert(b.getLong(6) == 0L && b.getDouble(9) == 0.0, "dcg 0, precision 0")
  }

  test("rankedEval: score ties break by item ASC; n_rel < k shortens the ideal") {
    val g = Evaluation.ndcgGains(3)
    val d = df(rankSchema, Seq(
      // both score 5: item 7 ranks before item 9, so the relevant 9 is rank 2
      Row("Q", 9L, 5.0, true), Row("Q", 7L, 5.0, false), Row("Q", 8L, 1.0, false)))
    val r = Evaluation.rankedEval(d, "q", "item", "score", "rel", k = 3).collect().head
    assert(r.getLong(4) == 2L, s"tie-broken rank, got ${r.getLong(4)}")
    assert(r.getLong(5) == 500000000000L, "rr = 1e12 DIV 2")
    assert(r.getLong(6) == g(1) && r.getLong(7) == g(0),
      "dcg = gain(2); ideal for a single relevant item = gain(1)")
    intercept[IllegalArgumentException](
      Evaluation.rankedEval(d, "q", "item", "score", "rel", k = 0))
  }

  private val aucSchema = StructType(Seq(
    StructField("g", StringType), StructField("s", DoubleType),
    StructField("y", BooleanType)))

  test("rocAuc: rank-sum with ties counted half") {
    val d = df(aucSchema, Seq(
      Row("x", 3.0, true), Row("x", 2.0, true),   // positives
      Row("x", 1.0, false), Row("x", 2.0, false)))// negatives, one tied at 2.0
    val r = Evaluation.rocAuc(d, "g", "s", "y").collect().head
    // pos 3.0 beats both negs (2 wins); pos 2.0 beats 1.0, ties 2.0 (1 + ½)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 7L, s"auc_num2 = 2·(2+1.5), got ${r.getLong(3)}")
    assert(r.getDouble(4) == 7.0 / 8.0)
  }

  test("rocAuc: perfect separation = 1, reversed = 0, one-class group NULL") {
    val d = df(aucSchema, Seq(
      Row("sep", 5.0, true), Row("sep", 1.0, false),
      Row("rev", 1.0, true), Row("rev", 5.0, false),
      Row("mono", 2.0, true), Row("mono", 3.0, true)))
    val out = Evaluation.rocAuc(d, "g", "s", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("sep").getDouble(4) == 1.0)
    assert(out("rev").getDouble(4) == 0.0)
    assert(out("mono").isNullAt(4), "no negatives: AUC undefined")
  }

  private val clsSchema = StructType(Seq(
    StructField("t", StringType), StructField("p", StringType)))

  test("classifierEval: per-class P/R/F1 incl. pred-only and truth-only classes") {
    val d = df(clsSchema, Seq(
      Row("a", "a"), Row("a", "b"), Row("b", "b"), Row("c", "d")))
    val out = Evaluation.classifierEval(d, "t", "p")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c", "d"), "label set = truth ∪ pred")
    val a = out("a") // truth 2, pred 1, tp 1
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == (2L, 1L, 1L))
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 0.5)
    assert(a.getDouble(6) == 2.0 * 1.0 * 0.5 / 1.5, "f1 = 2pr/(p+r)")
    val b = out("b") // truth 1, pred 2, tp 1
    assert(b.getDouble(4) == 0.5 && b.getDouble(5) == 1.0)
    val c = out("c") // never predicted: precision undefined, recall 0, f1 NULL
    assert(c.getLong(2) == 0L && c.isNullAt(4) && c.getDouble(5) == 0.0 && c.isNullAt(6))
    val dd = out("d") // pred-only: recall undefined
    assert(dd.getLong(1) == 0L && dd.getDouble(4) == 0.0 && dd.isNullAt(5) && dd.isNullAt(6))
  }

  private val calSchema = StructType(Seq(
    StructField("g", StringType), StructField("prob", DoubleType),
    StructField("y", BooleanType)))

  test("calibrationBins: exact counts, fixed-point gap, edge binning") {
    val d = df(calSchema, Seq(
      Row("m", 0.05, false), Row("m", 0.05, true),  // bin 0
      Row("m", 0.95, true), Row("m", 1.0, true),    // bin 9 (1.0 clamps down)
      Row("m", -0.2, false)))                        // below range: its own bin
    val out = Evaluation.calibrationBins(d, "g", "prob", "y", bins = 10)
      .collect().map(r => r.getLong(1) -> r).toMap
    val b0 = out(0L)
    assert(b0.getLong(2) == 2L && b0.getLong(3) == 1L)
    assert(b0.getLong(4) == 100000000L, "conf_fp = 2·⌊0.05e9⌋")
    assert(b0.getLong(5) == 900000000L, "gap = |1e8 − 1·1e9|")
    assert(b0.getDouble(6) == 0.05 && b0.getDouble(7) == 0.5)
    val b9 = out(9L)
    assert(b9.getLong(2) == 2L && b9.getLong(3) == 2L, "prob 1.0 joins bin 9")
    assert(out(-2L).getLong(2) == 1L, "negative prob surfaces, not folded into 0")
    intercept[IllegalArgumentException](
      Evaluation.calibrationBins(d, "g", "prob", "y", bins = 1))
  }
}
