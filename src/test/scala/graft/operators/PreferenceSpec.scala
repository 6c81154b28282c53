package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class PreferenceSpec extends SparkSpec {

  private val pairSchema = StructType(Seq(
    StructField("w", StringType), StructField("l", StringType)))

  test("bradleyTerry: win-rate order, exact bookkeeping, deterministic rerun") {
    val d = df(pairSchema,
      Seq.fill(3)(Row("A", "B")) ++ Seq(Row("B", "A")) ++
        Seq.fill(2)(Row("B", "C")) ++ Seq.fill(4)(Row("A", "C")))
    val out = Preference.bradleyTerry(d, "w", "l")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(out("A")._1 == 7L && out("B")._1 == 3L && out("C")._1 == 0L, "wins")
    assert(out("A")._2 == 8L && out("B")._2 == 6L && out("C")._2 == 6L, "comparisons")
    assert(out("A")._4 == 1 && out("B")._4 == 2 && out("C")._4 == 3, "rank order")
    assert(out("A")._3 > out("B")._3 && out("B")._3 > out("C")._3)
    assert(out("C")._3 == 0L, "never-winning item converges to 0")
    val again = Preference.bradleyTerry(d, "w", "l")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out.map { case (k, v) => k -> v._3 } == again, "bit-identical rerun")
  }

  test("bradleyTerry: symmetric record gives equal strengths; guards fire") {
    val d = df(pairSchema, Seq(Row("X", "Y"), Row("Y", "X")))
    val out = Preference.bradleyTerry(d, "w", "l")
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getInt(4))).toMap
    assert(out("X")._1 == out("Y")._1, "1:1 head-to-head = equal strength")
    assert(out("X")._2 == 1 && out("Y")._2 == 2, "tie ranks break by item asc")
    intercept[IllegalArgumentException](
      Preference.bradleyTerry(df(pairSchema, Seq.empty), "w", "l"))
    intercept[IllegalArgumentException](
      Preference.bradleyTerry(d, "w", "l", iterations = 0))
    intercept[IllegalArgumentException](
      Preference.bradleyTerry(d, "w", "l", maxItems = 1))
  }

  test("bradleyTerry: strengths renormalize to the fixed-point scale") {
    val d = df(pairSchema, Seq(Row("A", "B"), Row("B", "C"), Row("C", "A")))
    val s = Preference.bradleyTerry(d, "w", "l").collect().map(_.getLong(3))
    val tot = s.sum
    // each s_i = ⌊raw_i·S/Σraw⌋: total within m ulps of S
    assert(tot <= 1000000000000L && tot > 1000000000000L - 3,
      s"normalized total, got $tot")
  }

  private val respSchema = StructType(Seq(
    StructField("prompt", StringType), StructField("id", LongType),
    StructField("score", DoubleType)))

  test("preferencePairs: best-vs-worst with margin gate and pinned ties") {
    val d = df(respSchema, Seq(
      Row("p1", 10L, 1.0), Row("p1", 11L, 9.0), Row("p1", 12L, 5.0),
      // p2: two rows at the max score — chosen must be the LOWER id (21)
      Row("p2", 20L, 2.0), Row("p2", 21L, 8.0), Row("p2", 22L, 8.0),
      // p3: margin 1 < minMargin → dropped
      Row("p3", 30L, 5.0), Row("p3", 31L, 6.0),
      // p4: single row → dropped
      Row("p4", 40L, 9.0)))
    val out = Preference.preferencePairs(d, "prompt", "id", "score", minMargin = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.keySet == Set("p1", "p2"))
    assert(out("p1") == (11L, 10L, 9.0, 1.0, 8.0))
    assert(out("p2") == (21L, 20L, 8.0, 2.0, 6.0), "max-score tie → lowest id chosen")
  }

  test("preferencePairs: all-tie group never pairs an id with itself; nulls skipped") {
    val d = df(respSchema, Seq(
      Row("t", 1L, 4.0), Row("t", 2L, 4.0),
      Row("n", 5L, null), Row("n", 6L, 3.0), Row("n", 7L, 1.0)))
    val out = Preference.preferencePairs(d, "prompt", "id", "score")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "t" at margin 0: chosen id 1 (max tie → low id), rejected id 1 too → dropped
    assert(out.keySet == Set("n"), s"got ${out.keySet}")
    assert(out("n") == (6L, 7L), "null-scored row ignored")
  }

  private val ipsSchema = StructType(Seq(
    StructField("g", StringType), StructField("prop_fp", LongType),
    StructField("target_fp", LongType), StructField("reward_fp", LongType)))

  test("ipsEstimate: exact integer sums against a local reference") {
    val rows = Seq(
      Row("a", 500000L, 1000000L, 2000000L),  // w = 2e6, w*r = 4e12
      Row("a", 250000L, 500000L, 1000000L),   // w = 2e6, w*r = 2e12
      Row("b", 1000000L, 100000L, 3000000L))  // w = 1e5, w*r = 3e11
    val out = Preference.ipsEstimate(df(ipsSchema, rows), "g",
        "prop_fp", "target_fp", "reward_fp")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") == 2L)
    assert(a.getAs[java.math.BigDecimal]("sum_w_fp").longValueExact == 4000000L)
    assert(a.getAs[java.math.BigDecimal]("sum_wr_fp").longValueExact == 6000000000000L)
    assert(a.getAs[Double]("ips") == 6e12 / (2.0 * 1e6 * 1e6))
    assert(a.getAs[Double]("snips") == 6e12 / (4e6 * 1e6))
    assert(out("b").getAs[java.math.BigDecimal]("sum_wr_fp").longValueExact == 300000000000L)
  }

  test("ipsEstimate: weights clip and zero/negative propensities are rejected") {
    val rows = Seq(
      Row("a", 1L, 1000000L, 1000000L),       // raw w = 1e12 -> clipped to 2e7
      Row("a", 0L, 1000000L, 1000000L),       // prop 0 -> dropped
      Row("a", -5L, 1000000L, 1000000L),      // negative -> dropped
      Row("a", 1000000L, 1000000L, null))     // null reward -> dropped
    val out = Preference.ipsEstimate(df(ipsSchema, rows), "g",
        "prop_fp", "target_fp", "reward_fp").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n") == 1L)
    assert(out(0).getAs[java.math.BigDecimal]("sum_w_fp").longValueExact == 20000000L)
  }
}
