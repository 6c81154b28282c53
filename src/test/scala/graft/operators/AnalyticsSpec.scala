package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AnalyticsSpec extends SparkSpec {

  private val orderSchema = StructType(Seq(
    StructField("cust", LongType), StructField("d", TimestampType),
    StructField("amt", DoubleType)))

  private def ts(day: Int) = // 2024-01-<day>
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("rfm: rollup metrics, quintile buckets by strict comparison, segment digits") {
    // 5 customers with strictly increasing frequency/monetary and
    // decreasing recency: every quintile boundary separates them
    val rows = (1 to 5).flatMap { c =>
      (1 to c).map(i => Row(c.toLong, ts(c * 5), c * 100.0 + i))
    }
    val out = Analytics.rfm(df(orderSchema, rows), "cust", "d", "amt",
        asOfDate = "2024-02-01", exact = true)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getString(7))).toMap
    // cust 5: most recent (recency 7 days), most orders (5), most revenue
    assert(out(5L) == (7L, 5L, 1, 5, 5, "155"), s"got ${out(5L)}")
    // cust 1: least recent (27 days), single order, least revenue
    assert(out(1L) == (27L, 1L, 5, 1, 1, "511"))
    // middle customer sits mid-bucket on every axis
    assert(out(3L) == (17L, 3L, 3, 3, 3, "333"))
  }

  test("rfm: sketch mode in its exact regime equals exact mode") {
    val rows = (1 to 40).map(i => Row((i % 8).toLong, ts(i % 28 + 1), i * 3.0))
    val d = df(orderSchema, rows)
    val ex = Analytics.rfm(d, "cust", "d", "amt", "2024-03-01", exact = true)
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    val ap = Analytics.rfm(d, "cust", "d", "amt", "2024-03-01", exact = false)
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(ex == ap)
  }

  private val eventSchema = StructType(Seq(
    StructField("uid", LongType), StructField("ts", TimestampType),
    StructField("et", StringType)))

  test("funnelSteps: strictly-ordered completion, earliest-completion semantics") {
    val d = df(eventSchema, Seq(
      // u1 completes the whole funnel in order
      Row(1L, ts(1), "view"), Row(1L, ts(2), "click"), Row(1L, ts(3), "buy"),
      // u2 clicks BEFORE viewing: click doesn't count, funnel stops at view
      Row(2L, ts(5), "click"), Row(2L, ts(6), "view"),
      // u3 views then clicks twice; earliest qualifying click wins, no buy
      Row(3L, ts(1), "view"), Row(3L, ts(4), "click"), Row(3L, ts(8), "click"),
      // u4 never views
      Row(4L, ts(2), "click"), Row(4L, ts(3), "buy")))
    val out = Analytics.funnelSteps(d, "uid", "ts", "et", Seq("view", "click", "buy"))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "view", 3L), (2, "click", 2L), (3, "buy", 1L)), s"got $out")
  }

  test("funnelSteps: same-timestamp events do NOT advance (strict >); bad args rejected") {
    val d = df(eventSchema, Seq(
      Row(1L, ts(1), "view"), Row(1L, ts(1), "click")))
    val out = Analytics.funnelSteps(d, "uid", "ts", "et", Seq("view", "click"))
      .orderBy("step_idx").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(1L, 0L), "simultaneous click is not 'after' the view")
    intercept[IllegalArgumentException](
      Analytics.funnelSteps(d, "uid", "ts", "et", Seq.empty))
    intercept[IllegalArgumentException](
      Analytics.funnelSteps(d, "uid", "ts", "et", Seq("view", "view")))
  }

  private val evSchema = StructType(Seq(
    StructField("uid", LongType), StructField("eid", LongType),
    StructField("ts", TimestampType), StructField("et", StringType)))

  test("cohortRetention: cohorts by first week, offsets, fixed-point share") {
    // epoch weeks: 2024-01-01 is day 19723 -> week 2817 (19723 DIV 7)
    val rows = Seq(
      Row(1L, 1L, ts(1), "a"), Row(1L, 2L, ts(10), "b"), // u1: wk W, W+1
      Row(2L, 3L, ts(2), "a"),                           // u2: wk W only
      Row(3L, 4L, ts(9), "a"), Row(3L, 5L, ts(16), "b")) // u3: wk W+1, W+2
    val out = Analytics.cohortRetention(df(evSchema, rows), "uid", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val w0 = out.keys.map(_._1).min
    // cohort w0 = {u1, u2}: offset 0 -> 2 users, offset 1 -> u1 only
    assert(out((w0, 0L)) == (2L, 2L, 100000000L))
    assert(out((w0, 1L)) == (1L, 2L, 50000000L))
    // cohort w0+1 = {u3}: retained into its offset 1
    assert(out((w0 + 1, 0L)) == (1L, 1L, 100000000L))
    assert(out((w0 + 1, 1L)) == (1L, 1L, 100000000L))
    assert(out.size == 4)
  }

  test("transitionMatrix: consecutive pairs per user, id tiebreak, P(to|from)") {
    val rows = Seq( // u1: a->b->a ; u2 (same ts burst, id order): a->b
      Row(1L, 1L, ts(1), "a"), Row(1L, 2L, ts(2), "b"), Row(1L, 3L, ts(3), "a"),
      Row(2L, 10L, ts(5), "a"), Row(2L, 11L, ts(5), "b"))
    val out = Analytics.transitionMatrix(df(evSchema, rows), "uid", "ts", "eid", "et")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // from a: 2x a->b; from b: 1x b->a
    assert(out(("a", "b")) == (2L, 2L, 100000000L))
    assert(out(("b", "a")) == (1L, 1L, 100000000L))
    assert(out.size == 2, s"last events emit nothing: $out")
  }

  private val basketSchema = StructType(Seq(
    StructField("txn", LongType), StructField("item", LongType)))

  test("cooccurrence: pair counts, fixed-point support/confidence/lift") {
    // 4 txns: {1,2} x3, {1,3} x1 -> pair (1,2) n=3, (1,3) n=1 (cut by minPairs)
    val rows = Seq(
      Row(10L, 1L), Row(10L, 2L),
      Row(11L, 1L), Row(11L, 2L),
      Row(12L, 1L), Row(12L, 2L),
      Row(13L, 1L), Row(13L, 3L))
    val out = Analytics.cooccurrence(df(basketSchema, rows), "txn", "item",
      minPairs = 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("item_a") == 1L && r.getAs[Long]("item_b") == 2L)
    assert(r.getAs[Long]("pair_n") == 3L)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_txn") == 4L)
    assert(r.getAs[Long]("support_fp") == 75000000L)  // 3e8/4
    assert(r.getAs[Long]("conf_ab_fp") == 75000000L)  // 3e8/4
    assert(r.getAs[Long]("conf_ba_fp") == 100000000L) // 3e8/3
    assert(r.getAs[Long]("lift_x10000") == 10000L)    // 3*4e4/(4*3): independent
  }

  test("cooccurrence: duplicate rows collapse; the per-txn cap keeps lowest item ids") {
    val rows = Seq( // txn 1 has items 1..5 (item 5 twice); cap=3 keeps {1,2,3}
      Row(1L, 5L), Row(1L, 5L), Row(1L, 4L), Row(1L, 3L), Row(1L, 2L), Row(1L, 1L),
      Row(2L, 1L), Row(2L, 2L), Row(2L, 3L))
    val out = Analytics.cooccurrence(df(basketSchema, rows), "txn", "item",
      minPairs = 2L, maxItemsPerTxn = 3).collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"),
        r.getAs[Long]("pair_n"))).toSet
    // only pairs within {1,2,3} survive, each co-occurring twice
    assert(out == Set((1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 2L)), s"got $out")
  }

  test("cooccurrence: bad args rejected") {
    val d = df(basketSchema, Seq(Row(1L, 1L)))
    intercept[IllegalArgumentException](
      Analytics.cooccurrence(d, "txn", "item", minPairs = 0L))
    intercept[IllegalArgumentException](
      Analytics.cooccurrence(d, "txn", "item", maxItemsPerTxn = 1))
  }

  private val abSchema = StructType(Seq(
    StructField("exp", StringType), StructField("variant", StringType),
    StructField("conv", BooleanType)))

  test("abTest: hand-computed z and CI; two-arm contract enforced") {
    // control: 2/4 convert; treatment: 3/4 convert
    val rows = Seq(
      Row("e1", "a_ctl", true), Row("e1", "a_ctl", true),
      Row("e1", "a_ctl", false), Row("e1", "a_ctl", false),
      Row("e1", "b_trt", true), Row("e1", "b_trt", true),
      Row("e1", "b_trt", true), Row("e1", "b_trt", false))
    val r = Analytics.abTest(df(abSchema, rows), "exp", "variant", "conv").head()
    assert(r.getString(1) == "a_ctl" && r.getString(2) == "b_trt")
    assert(r.getLong(3) == 4L && r.getLong(4) == 2L &&
      r.getLong(5) == 4L && r.getLong(6) == 3L)
    val (pa, pb, pp) = (0.5, 0.75, 5.0 / 8.0)
    assert(math.abs(r.getDouble(7) - 0.25) < 1e-12) // lift
    val z = (pb - pa) / math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(r.getDouble(8) - z) < 1e-12)
    val se = math.sqrt(pa * (1 - pa) / 4 + pb * (1 - pb) / 4)
    assert(math.abs(r.getDouble(9) - (0.25 - 1.96 * se)) < 1e-12)
    assert(math.abs(r.getDouble(10) - (0.25 + 1.96 * se)) < 1e-12)
    // degenerate pooled rate → null z, real CI
    val allConv = Seq(Row("e2", "a", true), Row("e2", "b", true))
    assert(Analytics.abTest(df(abSchema, allConv), "exp", "variant", "conv")
      .head().isNullAt(8))
    // three arms fail loudly
    val multi = rows :+ Row("e1", "c_x", true)
    val ex = intercept[IllegalArgumentException](
      Analytics.abTest(df(abSchema, multi), "exp", "variant", "conv"))
    assert(ex.getMessage.contains("exactly two variants"))
  }

  test("bootstrapMeanCI: band brackets the mean, seeded-deterministic, width shrinks with n") {
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    def data(n: Int) = df(sch, (0 until n).map(i =>
      Row(i.toLong, 10.0 + (i % 7).toDouble)))
    val r = Analytics.bootstrapMeanCI(data(200), "v", "id", replicas = 50,
      seed = 42L).head()
    val (n, b, mean, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(n == 200L && b == 50L)
    assert(lo <= mean && mean <= hi && lo < hi, s"band [$lo, $hi] vs mean $mean")
    // the band is a real interval around the true mean 13 (fp 1.3e7)
    assert(math.abs(mean - 13000000L) < 200000L)
    // deterministic under the seed; a different seed moves the band
    val again = Analytics.bootstrapMeanCI(data(200), "v", "id", 50, 42L).head()
    assert(again.getLong(3) == lo && again.getLong(4) == hi)
    val other = Analytics.bootstrapMeanCI(data(200), "v", "id", 50, 43L).head()
    assert((other.getLong(3), other.getLong(4)) != ((lo, hi)))
    // 8x the data → a visibly narrower interval (sqrt-n behavior)
    val big = Analytics.bootstrapMeanCI(data(1600), "v", "id", 50, 42L).head()
    assert(big.getLong(4) - big.getLong(3) < (hi - lo), "CI must shrink with n")
    intercept[IllegalArgumentException](
      Analytics.bootstrapMeanCI(data(10), "v", "id", replicas = 2))
  }

  private val wtSchema = StructType(Seq(
    StructField("exp", StringType), StructField("variant", StringType),
    StructField("v", DoubleType)))

  test("welchT: hand-computed t and Welch-Satterthwaite df; degenerate arms null-safe") {
    // control [1,2,3]: mean 2 var 1; treatment [2,4,6]: mean 4 var 4
    val rows = Seq(1.0, 2.0, 3.0).map(Row("e1", "a_ctl", _)) ++
      Seq(2.0, 4.0, 6.0).map(Row("e1", "b_trt", _))
    val r = Analytics.welchT(df(wtSchema, rows), "exp", "variant", "v").head()
    assert(r.getLong(3) == 3L && r.getLong(5) == 3L)
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-9 && math.abs(r.getDouble(6) - 4.0) < 1e-9)
    assert(math.abs(r.getDouble(7) - 2.0) < 1e-9) // diff
    val seSq = 1.0 / 3 + 4.0 / 3
    assert(math.abs(r.getDouble(8) - 2.0 / math.sqrt(seSq)) < 1e-9)
    val dfW = seSq * seSq / ((1.0 / 3) * (1.0 / 3) / 2 + (4.0 / 3) * (4.0 / 3) / 2)
    assert(math.abs(r.getDouble(9) - dfW) < 1e-9) // 50/17
    // single-observation arm → null variance → null t and df
    val tiny = Seq(Row("e2", "a", 1.0), Row("e2", "b", 2.0), Row("e2", "b", 3.0))
    val r2 = Analytics.welchT(df(wtSchema, tiny), "exp", "variant", "v").head()
    assert(r2.isNullAt(8) && r2.isNullAt(9))
    assert(math.abs(r2.getDouble(7) - 1.5) < 1e-9, "diff still reported")
    intercept[IllegalArgumentException](
      Analytics.welchT(df(wtSchema, rows :+ Row("e1", "c", 1.0)), "exp", "variant", "v"))
  }

  private val olsSchema = StructType(Seq(
    StructField("g", StringType), StructField("x", DoubleType),
    StructField("y", DoubleType)))

  test("groupedOls: exact line recovered; noise lowers r2; constant x is null-safe") {
    val exact = (1 to 5).map(i => Row("a", i.toDouble, 2.0 * i + 3.0))
    val noisy = Seq(Row("b", 1.0, 5.1), Row("b", 2.0, 6.9), Row("b", 3.0, 9.2),
      Row("b", 4.0, 10.8))
    val const = Seq(Row("c", 7.0, 1.0), Row("c", 7.0, 2.0))
    val out = Analytics.groupedOls(df(olsSchema, exact ++ noisy ++ const),
      "g", "x", "y").collect().map(r => r.getString(0) -> r).toMap
    // y = 2x + 3 exactly: fixed-point moments reproduce it to the quantum
    assert(out.values.forall(r => r.getString(0) == "c" || !r.isNullAt(2)),
      s"rows: ${out.values.mkString(" | ")}")
    assert(math.abs(out("a").getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(out("a").getDouble(3) - 3.0) < 1e-9)
    assert(math.abs(out("a").getDouble(4) - 1.0) < 1e-12)
    // noisy line: slope near 2, r2 high but < 1
    val b = out("b")
    assert(math.abs(b.getDouble(2) - 1.94) < 0.1)
    assert(b.getDouble(4) > 0.98 && b.getDouble(4) < 1.0)
    // degenerate group: den = 0 -> nulls, never a divide-by-zero
    assert(out("c").isNullAt(2) && out("c").isNullAt(3) && out("c").isNullAt(4))
    assert(out("c").getLong(1) == 2L)
    // partitioning-invariance: the sums are exact integers
    val shuffled = Analytics.groupedOls(
      df(olsSchema, scala.util.Random.shuffle(exact ++ noisy ++ const)).repartition(7),
      "g", "x", "y").collect().filterNot(_.isNullAt(2))
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(shuffled("a") == out("a").getDouble(2))
    intercept[IllegalArgumentException](
      Analytics.groupedOls(df(olsSchema, exact), "g", "x", "y", scale = 12))
  }

  private val kmSchema = StructType(Seq(
    StructField("g", StringType), StructField("dur", LongType),
    StructField("e", BooleanType)))

  test("kaplanMeier: hand-checked risk sets and survival; censoring shrinks risk only") {
    val d = df(kmSchema, Seq(
      Row("g", 1L, true), Row("g", 1L, false),   // t=1: 1 event, 1 censored
      Row("g", 2L, true), Row("g", 3L, false)))  // t=2 event; t=3 censored
    val out = Analytics.kaplanMeier(d, "g", "dur", "e")
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(1L).getLong(4) == 4L && out(2L).getLong(4) == 2L &&
      out(3L).getLong(4) == 1L, "risk sets 4 / 2 / 1")
    assert(out(1L).getDouble(5) == 0.75, "S(1) = 1 - 1/4")
    assert(out(2L).getDouble(5) == 0.375, "S(2) = 0.75 * (1 - 1/2)")
    assert(out(3L).getDouble(5) == 0.375, "censoring-only times leave S unchanged")
  }

  test("kaplanMeier: whole risk set eventing pins survival to exactly 0") {
    val d = df(kmSchema, Seq(Row("h", 1L, true), Row("h", 1L, true)))
    val r = Analytics.kaplanMeier(d, "g", "dur", "e").head()
    assert(r.getLong(2) == 2L && r.getLong(4) == 2L && r.getDouble(5) == 0.0)
  }

  private val attSchema = StructType(Seq(
    StructField("uid", LongType), StructField("ts", TimestampType),
    StructField("et", StringType)))

  test("positionAttribution: U-shaped credits, paths reset per conversion, direct bucket") {
    val d = df(attSchema, Seq(
      // u1: click, view -> purchase; trailing click never converts
      Row(1L, ts(1), "click"), Row(1L, ts(2), "view"),
      Row(1L, ts(3), "purchase"), Row(1L, ts(4), "click"),
      // u2: a DIRECT purchase, then click, click, view -> purchase (k=3)
      Row(2L, ts(1), "purchase"), Row(2L, ts(2), "click"),
      Row(2L, ts(3), "click"), Row(2L, ts(4), "view"),
      Row(2L, ts(5), "purchase"),
      // u3: k=4 path — click, view, signup, error -> purchase
      Row(3L, ts(1), "click"), Row(3L, ts(2), "view"),
      Row(3L, ts(3), "signup"), Row(3L, ts(4), "error"),
      Row(3L, ts(5), "purchase")))
    val out = Analytics.positionAttribution(d, "uid", "ts", "et", "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // click: u1 k=2 first (500000) + u2 k=3 first (400000) + middle
    // (200000) + u3 k=4 first (400000)
    assert(out("click") == ((4L, 3L, 1500000L)), s"got ${out("click")}")
    // view: u1 k=2 last (500000) + u2 k=3 last (400000) + u3 middle (100000)
    assert(out("view") == ((3L, 3L, 1000000L)))
    assert(out("signup") == ((1L, 1L, 100000L)), "k=4 middles split 200000 div 2")
    assert(out("error") == ((1L, 1L, 400000L)), "k=4 last touch")
    assert(out("_direct") == ((1L, 1L, 1000000L)), "conversion with no path self-attributes")
    assert(!out.contains("purchase"), "conversions are not touches")
  }

  test("positionAttribution: no conversions at all -> empty; single touch takes 100%") {
    val none = df(attSchema, Seq(Row(1L, ts(1), "click")))
    assert(Analytics.positionAttribution(none, "uid", "ts", "et", "purchase").count() == 0L)
    val one = df(attSchema, Seq(Row(1L, ts(1), "view"), Row(1L, ts(2), "purchase")))
    val r = Analytics.positionAttribution(one, "uid", "ts", "et", "purchase").head()
    assert(r.getString(0) == "view" && r.getLong(3) == 1000000L)
  }

  private val bhSchema = StructType(Seq(
    StructField("k", LongType), StructField("p", DoubleType)))

  private def bh(ps: Seq[(Long, java.lang.Double)], an: Long, ad: Long) =
    Analytics.bhCorrect(df(bhSchema, ps.map { case (k, p) => Row(k, p) }),
        "k", "p", an, ad)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("wilcoxonSignedRank: textbook signed ranks; zero diffs drop") {
    val sch = StructType(Seq(StructField("g", StringType),
      StructField("x", DoubleType), StructField("y", DoubleType)))
    // diffs +1 +2 -3 +4: |d| ranks 1..4, W+ = 1+2+4 = 7 -> 2W+ = 14;
    // z = (14 - 10)/sqrt(4*5*9/6) = 4/sqrt(30). The (7,7) pair is a
    // zero difference and must not count toward n.
    val rows = Seq((2.0, 1.0), (5.0, 3.0), (1.0, 4.0), (9.0, 5.0), (7.0, 7.0))
      .map { case (x, y) => Row("g", x, y) }
    val r = Analytics.wilcoxonSignedRank(df(sch, rows), "g", "x", "y").head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 14L, r.toString)
    assert(math.abs(r.getDouble(3) - 4.0 / math.sqrt(30.0)) < 1e-12)
    // tied |d|: +1 -1 +2 -> ranks (1.5, 1.5, 3), 2W+ = 3 + 6 = 9,
    // ties = 2^3-2 = 6, var2W = 3*4*7/6 - 0.5 = 13.5, z = (9-6)/sqrt(13.5)
    val tied = Seq((2.0, 1.0), (1.0, 2.0), (5.0, 3.0))
      .map { case (x, y) => Row("t", x, y) }
    val t = Analytics.wilcoxonSignedRank(df(sch, tied), "g", "x", "y").head()
    assert(t.getLong(2) == 9L, t.toString)
    assert(math.abs(t.getDouble(3) - 3.0 / math.sqrt(13.5)) < 1e-12)
  }

  test("anovaF: hand-computed SSB/SSW/F; degenerate arms null") {
    val sch = StructType(Seq(StructField("e", StringType),
      StructField("v", StringType), StructField("x", DoubleType)))
    // arms a = {1,2}, b = {3,4}: SSB = 29 - 25 = 4, SSW = 0.5 + 0.5 = 1,
    // F = (4/1)/(1/2) = 8
    val rows = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .map { case (v, x) => Row("g", v, x) } ++
      Seq(Row("one", "a", 1.0), Row("one", "a", 2.0)) ++ // single arm
      Seq(Row("tied", "a", 5.0), Row("tied", "a", 5.0),
        Row("tied", "b", 7.0), Row("tied", "b", 7.0)) // zero within-variance
    val out = Analytics.anovaF(df(sch, rows), "e", "v", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getLong(1) == 2L && g.getLong(2) == 4L)
    assert(math.abs(g.getDouble(3) - 4.0) < 1e-5 && math.abs(g.getDouble(4) - 1.0) < 1e-5)
    assert(math.abs(g.getDouble(5) - 8.0) < 1e-4, g.toString)
    assert(out("one").isNullAt(5), "k = 1: no between-arm question")
    assert(out("tied").isNullAt(5), "zero within-variance: F undefined")
  }

  private def holm(ps: Seq[(Long, java.lang.Double)], an: Long, ad: Long) =
    Analytics.holmCorrect(df(bhSchema, ps.map { case (k, p) => Row(k, p) }),
        "k", "p", an, ad)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("holmCorrect: textbook step-down stops at the first failing rank") {
    // sorted: .01 .015 .04 .20 vs alpha/(m-j+1) = .0125 .0167 .025 .05
    // -> ranks 1,2 pass, rank 3 fails (.04 > .025): reject exactly 2
    val out = holm(Seq(1L -> 0.04, 2L -> 0.01, 3L -> 0.20, 4L -> 0.015)
      .map { case (k, p) => (k, Double.box(p)) }, 5, 100)
    assert(out(2L)._3 && out(4L)._3, out.toString)
    assert(!out(1L)._3 && !out(3L)._3, out.toString)
    // all-pass: everything rejects (k = m, not first-failure-minus-one)
    val all = holm(Seq(1L -> 0.001, 2L -> 0.002)
      .map { case (k, p) => (k, Double.box(p)) }, 5, 100)
    assert(all.values.forall(_._3))
  }

  test("holmCorrect rejections are a subset of bhCorrect's at the same alpha") {
    val ps = (1L to 40L).map(k =>
      (k, Double.box(((k * 2654435761L) % 1000L) / 1000.0)))
    val h = holm(ps, 10, 100)
    val b = bh(ps, 10, 100)
    val hr = h.filter(_._2._3).keySet
    val br = b.filter(_._2._3).keySet
    assert(hr.subsetOf(br), s"Holm (FWER) must reject no more than BH: $hr vs $br")
  }

  test("bhCorrect: textbook boundary at alpha=0.1 rejects exactly the 4 smallest") {
    // sorted: .005 .01 .03 .04 .20 .50 vs k*alpha/m = .0167 .0333 .05 .0667...
    val out = bh(Seq(1L -> 0.01, 2L -> 0.04, 3L -> 0.03, 4L -> 0.005,
      5L -> 0.20, 6L -> 0.50).map { case (k, p) => (k, Double.box(p)) }, 10, 100)
    assert(out.values.forall(_._2 == 6L))
    assert(out(4L) == ((1L, 6L, true)) && out(1L) == ((2L, 6L, true)))
    assert(out(3L) == ((3L, 6L, true)) && out(2L) == ((4L, 6L, true)))
    assert(!out(5L)._3 && !out(6L)._3)
  }

  test("bhCorrect: the max-k rule rescues intermediate failures") {
    // .01 .13 .14 .20 at alpha=.25: k=2,3 fail their own thresholds but
    // k=4 passes (.20 <= .25) -> ALL four reject (the defining BH quirk)
    val out = bh(Seq(1L -> 0.01, 2L -> 0.13, 3L -> 0.14, 4L -> 0.20)
      .map { case (k, p) => (k, Double.box(p)) }, 25, 100)
    assert(out.values.forall(_._3), s"got $out")
  }

  test("bhCorrect: dominated by per-test alpha, dominates Bonferroni (random p)") {
    val rnd = new scala.util.Random(71)
    val ps = (1L to 200L).map(k => (k, Double.box(rnd.nextDouble())))
    val out = bh(ps, 5, 100)
    val m = ps.size
    ps.foreach { case (k, p) =>
      val rejected = out(k)._3
      if (p <= 0.05 / m) assert(rejected, s"Bonferroni-significant p=$p must reject")
      if (p > 0.05) assert(!rejected, s"p=$p above alpha can never reject")
    }
  }

  test("powerAnalysis: hand-computed MDE from exact moments; degenerate arms null") {
    val sch = StructType(Seq(StructField("e", StringType),
      StructField("v", StringType), StructField("x", DoubleType)))
    // a: [1,2,3] -> var 1; b: [2,4] -> var 2; se² = 1/3 + 1 = 4/3
    val d = df(sch, Seq(Row("g", "a", 1.0), Row("g", "a", 2.0), Row("g", "a", 3.0),
      Row("g", "b", 2.0), Row("g", "b", 4.0)))
    val r = Analytics.powerAnalysis(d, "e", "v", "x").head()
    assert(r.getLong(3) == 3L && r.getLong(4) == 2L)
    assert(math.abs(r.getDouble(5) - math.sqrt(1.5)) < 1e-12)
    val mde = (1.959963984540054 + 0.8416212335729143) * math.sqrt(4.0 / 3.0)
    assert(math.abs(r.getDouble(6) - mde) < 1e-12)
    assert(math.abs(r.getDouble(7) - mde / 2.0) < 1e-12, "relative to arm a's mean 2")
    // single-observation arm: no variance, no MDE
    val deg = df(sch, Seq(Row("g", "a", 1.0), Row("g", "b", 2.0), Row("g", "b", 3.0)))
    assert(Analytics.powerAnalysis(deg, "e", "v", "x").head().isNullAt(6))
  }

  private val ksSchema = StructType(Seq(
    StructField("g", StringType), StructField("s", StringType),
    StructField("v", DoubleType)))

  test("ksTest: hand-computed D on a tied sample; missing-side group nulls; drift flag") {
    // A = {1,2,3}, B = {2,3,4}: pooled distinct 1,2,3,4 with
    // cumA = 1,2,3,3 / cumB = 0,1,2,3 -> max|cumA·3 − cumB·3| = 3,
    // D = 3/9 = 1/3 (scipy's ks_2samp agrees)
    val rows = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 2.0, "b" -> 3.0, "b" -> 4.0).map { case (s, v) => Row("g", s, v) } ++
      Seq(Row("solo", "a", 1.0))
    val out = Analytics.ksTest(df(ksSchema, rows), "g", "s", "v", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getLong(1) == 3L && g.getLong(2) == 3L)
    assert(math.abs(g.getDouble(3) - 1.0 / 3.0) < 1e-15)
    // c(0.05)·sqrt(6/9) ≈ 1.3581·0.8165 ≈ 1.109 > 1/3 -> no drift
    assert(!g.getBoolean(5))
    assert(out("solo").isNullAt(3) && out("solo").isNullAt(5))
    // a two-point mass shift IS drift: A all 0, B all 1, n = 60 each ->
    // D = 1, threshold ≈ 1.3581·sqrt(120/3600) ≈ 0.248
    val shifted = (1 to 60).flatMap(i => Seq(Row("h", "a", 0.0), Row("h", "b", 1.0)))
    val h = Analytics.ksTest(df(ksSchema, shifted), "g", "s", "v", "a", "b").head()
    assert(h.getDouble(3) == 1.0 && h.getBoolean(5))
  }

  test("cuped: perfectly-predictive covariate collapses both arms to the pooled mean") {
    val sch = StructType(Seq(StructField("e", StringType), StructField("v", StringType),
      StructField("y", DoubleType), StructField("x", DoubleType)))
    // y == x: theta = 1, rho2 = 1, mean_adj(arm) = ybar_v - (xbar_v - xbar)
    // -> both arms land exactly on the pooled mean 2.5
    val rows = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .map { case (v, y) => Row("g", v, y, y) }
    val out = Analytics.cuped(df(sch, rows), "e", "v", "y", "x")
      .collect().map(r => r.getString(1) -> r).toMap
    assert(math.abs(out("a").getDouble(5) - 1.0) < 1e-12, "theta")
    assert(math.abs(out("a").getDouble(6) - 1.0) < 1e-12, "rho2")
    assert(math.abs(out("a").getDouble(4) - 2.5) < 1e-9, out("a").toString)
    assert(math.abs(out("b").getDouble(4) - 2.5) < 1e-9, out("b").toString)
    assert(math.abs(out("a").getDouble(3) - 1.5) < 1e-9, "raw mean unchanged")
    // constant covariate: CUPED undefined -> null theta/adjusted
    val const = Seq(("a", 1.0), ("b", 2.0)).map { case (v, y) => Row("g", v, y, 7.0) }
    val d = Analytics.cuped(df(sch, const), "e", "v", "y", "x").head()
    assert(d.isNullAt(4) && d.isNullAt(5))
  }

  test("experimentReport: CUPED -> Welch -> erfc p -> Holm chain gates a " +
    "planted effect, clears a null one, null-safes a degenerate arm") {
    val sch = StructType(Seq(StructField("e", StringType), StructField("v", StringType),
      StructField("y", DoubleType), StructField("x", DoubleType)))
    // unit i: pre-period covariate b = i%5, jitter j = (i%3)/10 so the
    // CUPED adjustment shrinks variance without erasing the contrast
    def arm(e: String, delta: Double): Seq[Row] = (0 until 50).map { i =>
      val b = (i % 5).toDouble; val j = (i % 3) * 0.1
      val treat = i % 2 == 1
      Row(e, if (treat) "treatment" else "control",
        b + j + (if (treat) delta else 0.0), b)
    }
    val degen = (0 until 4).map(i =>
      Row("degen", if (i % 2 == 1) "treatment" else "control", 3.0, 7.0))
    val out = Analytics.experimentReport(
        df(sch, arm("shift", 5.0) ++ arm("nil", 0.0) ++ degen),
        "e", "v", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    val shift = out("shift"); val nil = out("nil"); val dg = out("degen")
    // the planted +5 effect survives adjustment and the FWER gate
    assert(shift.getBoolean(14), shift.toString)
    assert(math.abs(shift.getDouble(7) - 5.0) < 0.2, s"diff_adj: $shift")
    // theta recovers the unit covariate slope ~1; pooled rho2 is diluted
    // by the treatment-delta variance the covariate can't explain
    assert(math.abs(shift.getDouble(8) - 1.0) < 0.01, s"theta: $shift")
    assert(shift.getDouble(9) > 0.1, s"rho2: $shift")
    // identical arms: p ~ 1, cleared
    assert(!nil.getBoolean(14), nil.toString)
    assert(nil.getDouble(11) > 0.5, s"p: $nil")
    // zero-variance arms: t/p/gate all null, never a division by zero
    assert(dg.isNullAt(10) && dg.isNullAt(11) && dg.isNullAt(12) && dg.isNullAt(14),
      dg.toString)
    // the family size counts only gated (non-null-p) experiments
    assert(shift.getLong(13) == 2L && nil.getLong(13) == 2L)
  }

  test("ratioMetricCI: y == x gives ratio 1 with zero variance; n = 1 nulls the SE") {
    val sch = StructType(Seq(StructField("g", StringType),
      StructField("y", DoubleType), StructField("x", DoubleType)))
    val rows = Seq(1.0, 2.0, 3.0).map(v => Row("g", v, v)) ++ Seq(Row("solo", 5.0, 2.0))
    val out = Analytics.ratioMetricCI(df(sch, rows), "g", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getLong(1) == 3L && g.getDouble(2) == 1.0)
    // vy = vx = cxy -> varR = (v - 2v + v)/(n xbar^2) = 0 exactly
    assert(g.getDouble(3) == 0.0 && g.getDouble(4) == 1.0 && g.getDouble(5) == 1.0, g.toString)
    assert(out("solo").getDouble(2) == 2.5 && out("solo").isNullAt(3))
  }

  test("spearman: perfect monotone, reversed, and tie-averaged hand case") {
    val sch = StructType(Seq(StructField("g", StringType),
      StructField("x", DoubleType), StructField("y", DoubleType)))
    val rows =
      Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).map { case (x, y) => Row("up", x, y) } ++
      Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).map { case (x, y) => Row("down", x, y) } ++
      // ties: x = [1,1,2] ranks [1.5,1.5,3], y = [1,2,3] ranks [1,2,3]
      // -> rho = 4.5/sqrt(4.5)/sqrt(6) = sqrt(0.75)
      Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)).map { case (x, y) => Row("tied", x, y) } ++
      Seq((7.0, 1.0), (7.0, 2.0)).map { case (x, y) => Row("const", x, y) }
    val out = Analytics.spearman(df(sch, rows), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    // num/sqrt/sqrt is the PINNED sequence (engine-replayable), which
    // rounds 12/sqrt(12)/sqrt(12) to 1 + 1ulp — tolerance, not equality
    assert(math.abs(out("up").getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(out("down").getDouble(2) + 1.0) < 1e-12)
    assert(math.abs(out("tied").getDouble(2) -
      4.5 / math.sqrt(4.5) / math.sqrt(6.0)) < 1e-12, out("tied").toString)
    assert(out("const").isNullAt(2), "constant axis must null rho")
  }

  test("cliffsDelta: hand-counted concordant/discordant pairs") {
    // A = {1,2,3}, B = {2,3,4}: a>b pairs = 1 (3>2), a<b pairs = 6
    // -> delta = (1-6)/9 = -5/9
    val rows = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 2.0, "b" -> 3.0, "b" -> 4.0).map { case (s, v) => Row("g", s, v) } ++
      Seq(Row("solo", "a", 1.0))
    val out = Analytics.cliffsDelta(df(ksSchema, rows), "g", "s", "v", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getLong(3) == 1L && g.getLong(4) == 6L, g.toString)
    assert(math.abs(g.getDouble(5) - (-5.0 / 9.0)) < 1e-15)
    assert(out("solo").isNullAt(5), "missing side must null delta")
  }

  test("cramersV: perfect association is 1; independence is ~0; unobserved cells counted") {
    val sch = StructType(Seq(StructField("a", StringType), StructField("b", StringType)))
    val perfect = (1 to 10).flatMap(_ => Seq(Row("x", "0"), Row("y", "1")))
    val p = Analytics.cramersV(df(sch, perfect), "a", "b").head()
    assert(p.getLong(0) == 20L && p.getLong(1) == 2L && p.getLong(2) == 2L)
    // chi2 = N = 20 exactly: observed terms 2x5e9, unobserved 20e9-10e9
    assert(p.getLong(3) == 20000000000L, p.toString)
    assert(math.abs(p.getDouble(4) - 1.0) < 1e-9)
    val indep = (1 to 5).flatMap(_ =>
      Seq(Row("x", "0"), Row("x", "1"), Row("y", "0"), Row("y", "1")))
    val i = Analytics.cramersV(df(sch, indep), "a", "b").head()
    assert(i.getLong(3) == 0L && math.abs(i.getDouble(4)) < 1e-9, i.toString)
    // single-category: null v
    val deg = Analytics.cramersV(df(sch, Seq(Row("x", "0"), Row("x", "1"))), "a", "b").head()
    assert(deg.isNullAt(4))
  }

  test("ksTestFromCounts over persisted histograms == ksTest over raw rows") {
    val rows = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 2.0, "b" -> 3.0, "b" -> 4.0).map { case (s, v) => Row("g", s, v) } ++
      (1 to 60).flatMap(_ => Seq(Row("h", "a", 0.0), Row("h", "b", 1.0)))
    val raw = df(ksSchema, rows)
    val expect = Analytics.ksTest(raw, "g", "s", "v", "a", "b").collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    // the artifact path: one persisted histogram per side, zero raw rescans
    val ha = Analytics.quantizedHistogram(raw.filter(col("s") === "a"), "g", "v")
      .select(col("g"), col("value_q"), col("c").as("c_a"), lit(0L).as("c_b"))
    val hb = Analytics.quantizedHistogram(raw.filter(col("s") === "b"), "g", "v")
      .select(col("g"), col("value_q"), lit(0L).as("c_a"), col("c").as("c_b"))
    val counts = ha.unionAll(hb).groupBy("g", "value_q")
      .agg(sum("c_a").as("c_a"), sum("c_b").as("c_b"))
    val got = Analytics.ksTestFromCounts(counts, "g").collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(got == expect, s"$got vs $expect")
  }

  test("snapshotKs: one KS verdict per feature column") {
    val sch = StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))
    val a = df(sch, (1 to 40).map(i => Row(i.toDouble, 1.0)))
    val b = df(sch, (1 to 40).map(i => Row(i.toDouble, 2.0))) // x identical, y shifted
    val out = Analytics.snapshotKs(a, b, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(5))).toMap
    assert(out("x") == (0.0, false), s"identical marginal must not drift: $out")
    assert(out("y") == (1.0, true), s"point-mass shift must drift: $out")
  }

  test("mannWhitneyU: hand-computed tie-corrected U and z") {
    // A = {1,2,3}, B = {2,3,4}: pooled ranks 1, (2.5,2.5), (4.5,4.5), 6
    // R_A = 1+2.5+4.5 = 8 -> U_A = 8−6 = 2 (u2_a = 4); ties T = 12,
    // var = (9/12)·(7 − 12/30) = 4.95, z = (2−4.5)/√4.95 = −1.123666…
    val rows = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 2.0, "b" -> 3.0, "b" -> 4.0).map { case (s, v) => Row("g", s, v) }
    val r = Analytics.mannWhitneyU(df(ksSchema, rows), "g", "s", "v", "a", "b").head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 4L, s"u2_a: $r")
    assert(math.abs(r.getDouble(4) - (-2.5 / math.sqrt(4.95))) < 1e-12)
    // all-tied group: zero variance -> null z, u2 still exact
    val tied = Seq(Row("t", "a", 7.0), Row("t", "a", 7.0), Row("t", "b", 7.0))
    val t = Analytics.mannWhitneyU(df(ksSchema, tied), "g", "s", "v", "a", "b").head()
    // R2_A = 2·(0+3+1) = 8 -> 2·R_A = 8, u2 = 8 − 2·3 = 2 (avg-rank 2 each)
    assert(t.getLong(3) == 2L && t.isNullAt(4))
  }

  test("bhCorrect: tiny alpha denominators stay exact (Long would wrap and reject everything)") {
    // alpha = 5/1e12: _pfp·m·alphaDen ≈ 5e21 exceeds Long.MaxValue; the
    // DECIMAL(38,0) comparison keeps the boundary exact — nothing near
    // p=0.5 can reject at alpha=5e-12
    val out = bh((1L to 10L).map(k => (k, Double.box(0.4 + k * 0.01))),
      5L, 1000000000000L)
    assert(out.values.forall(!_._3), s"got $out")
  }

  test("bhCorrect: null p-values drop out of m; guards fire") {
    val out = bh(Seq((1L, Double.box(0.01)), (2L, null),
      (3L, Double.box(0.5))), 10, 100)
    assert(out.size == 2 && out.values.forall(_._2 == 2L))
    intercept[IllegalArgumentException](bh(Seq((1L, Double.box(0.5))), 0, 100))
  }

  private val xySchema = StructType(Seq(StructField("g", StringType),
    StructField("x", DoubleType), StructField("y", DoubleType)))

  test("kendallTau: textbook no-tie example; x-ties and y-ties feed n1/n2 not C/D") {
    // no ties: x 1..5 vs y (1,2,3,5,4) — exactly one discordant pair
    val noTies = (1 to 5).map(i => Row("a", i.toDouble,
      Seq(1.0, 2.0, 3.0, 5.0, 4.0)(i - 1)))
    // ties: x (1,1,2,3) vs y (1,2,2,3) — one x-tie pair, one y-tie pair,
    // C=4, D=0, tau-b = 4/sqrt(5*5) = 0.8
    val ties = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (3.0, 3.0))
      .map { case (x, y) => Row("b", x, y) }
    val out = Analytics.kendallTau(df(xySchema, noTies ++ ties), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("a")._1 == 5L && out("a")._2 == 9L && out("a")._3 == 1L &&
      math.abs(out("a")._4 - 0.8) < 1e-12, s"got ${out("a")}")
    assert(out("b")._1 == 4L && out("b")._2 == 4L && out("b")._3 == 0L &&
      math.abs(out("b")._4 - 0.8) < 1e-12, s"got ${out("b")}")
  }

  test("kendallTau: constant margin yields null tau; quantization buckets near values") {
    val const = (1 to 4).map(i => Row("c", 1.0, i.toDouble))
    val r = Analytics.kendallTau(df(xySchema, const), "g", "x", "y")
      .collect().head
    assert(r.getLong(1) == 4L && r.isNullAt(4))
    // scale 0 buckets 1.2 and 1.9 together: all four rows one cell
    val q = Analytics.kendallTau(df(xySchema, Seq(
        Row("d", 1.2, 3.4), Row("d", 1.9, 3.9), Row("d", 1.5, 3.1),
        Row("d", 1.0, 3.0))), "g", "x", "y", scale = 0).collect().head
    assert(q.getLong(2) == 0L && q.getLong(3) == 0L && q.isNullAt(4))
  }

  private val pairSchema = StructType(Seq(StructField("g", StringType),
    StructField("i", LongType), StructField("d", LongType)))

  test("permutationTestPaired: one-sided fixture gets a small add-one p; zero diffs p=1") {
    // 12 pairs all shifted +1e6: only near-unanimous sign patterns reach
    // |T_obs|, so p stays well under any sane alpha but never 0
    val shifted = (1L to 12L).map(i => Row("up", i, 1000000L))
    val zeros = (1L to 8L).map(i => Row("nil", i, 0L))
    val out = Analytics.permutationTestPaired(
        df(pairSchema, shifted ++ zeros), "g", "i", "d", reps = 199)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (nUp, tUp, extUp, pUp) = out("up")
    assert(nUp == 12L && tUp == 12000000L && extUp >= 1L && pUp < 0.1,
      s"got ${out("up")}")
    assert(pUp == extUp.toDouble / 200.0)
    // all-zero differences: every replicate ties T_obs=0 -> p = 1
    assert(out("nil") == (8L, 0L, 200L, 1.0), s"got ${out("nil")}")
    // replayable: a second run is bit-identical (hash signs, no RNG)
    val again = Analytics.permutationTestPaired(
        df(pairSchema, shifted ++ zeros), "g", "i", "d", reps = 199)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(again("up") == pUp)
    intercept[IllegalArgumentException](Analytics.permutationTestPaired(
      df(pairSchema, zeros), "g", "i", "d", reps = 5))
  }

  private val survSchema = StructType(Seq(StructField("g", StringType),
    StructField("arm", StringType), StructField("t", LongType),
    StructField("e", BooleanType)))

  test("logRank: hand-worked hypergeometric terms; degenerate strata go null") {
    // A: events at 1,2 + censor at 3; B: events at 1,4 + censor at 5
    val rows = Seq(
      Row("s", "a", 1L, true), Row("s", "a", 2L, true), Row("s", "a", 3L, false),
      Row("s", "b", 1L, true), Row("s", "b", 4L, true), Row("s", "b", 5L, false),
      // single-arm stratum: every V term has n_b = 0 -> chi2/z null
      Row("solo", "a", 1L, true), Row("solo", "a", 2L, true))
    val out = Analytics.logRank(df(survSchema, rows), "g", "arm", "t", "e",
        "a", "b").collect().map(r => r.getString(0) -> r).toMap
    val s = out("s")
    assert((s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4)) ==
      ((3L, 3L, 2L, 2L)))
    // t=1: u = (1*6-2*3)/6 = 0, v = 2*4/5*3/6*3/6
    // t=2: u = (1*4-1*2)/4,   v = 1*3/3*2/4*2/4
    // t=4: u = (0*2-1*0)/2 = 0, v = 1*1/1*0/2*2/2 = 0
    val v1 = 2.0 * 4.0 / 5.0 * 3.0 / 6.0 * 3.0 / 6.0
    val v2 = 1.0 * 3.0 / 3.0 * 2.0 / 4.0 * 2.0 / 4.0
    val expU = 0.0 + 0.0 + (1.0 * 4 - 1.0 * 2) / 4.0 + 0.0
    val expV = 0.0 + v1 + v2 + 0.0
    assert(s.getDouble(5) == expU && s.getDouble(6) == expV, s.toString)
    assert(s.getDouble(7) == expU * expU / expV)
    assert(s.getDouble(8) == expU / math.sqrt(expV))
    val solo = out("solo")
    assert(solo.getLong(2) == 0L && solo.isNullAt(7) && solo.isNullAt(8),
      solo.toString)
  }

  private val psiSchema = StructType(Seq(StructField("v", DoubleType),
    StructField("w", DoubleType)))

  test("psiDrift: identical sides score exactly zero; a full shift trips the gate") {
    val ref = (1 to 100).map(i => Row(i.toDouble, i.toDouble))
    // same distribution on v -> every bin count matches -> every
    // (p-q)ln(p/q) term is exactly 0; w shifts wholesale into the top
    // bin -> PSI far past the 0.2 industry threshold
    val cur = (1 to 100).map(i => Row(i.toDouble, i.toDouble + 1000.0))
    val out = Analytics.psiDrift(df(psiSchema, ref), df(psiSchema, cur),
        Seq("v", "w"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    assert(out("v") == (100L, 100L, 0L, false), s"got ${out("v")}")
    val (nw, mw, psiW, driftedW) = out("w")
    assert(nw == 100L && mw == 100L && psiW > 200000000000L && driftedW,
      s"got ${out("w")}")
    // a feature with no reference data drops (the reference defines the
    // binning); nulls are ignored, not binned
    val refNullW = (1 to 50).map(i => Row(i.toDouble, null))
    val o2 = Analytics.psiDrift(df(psiSchema, refNullW), df(psiSchema, cur),
      Seq("v", "w")).collect().map(_.getString(0)).toSet
    assert(o2 == Set("v"))
    intercept[IllegalArgumentException](Analytics.psiDrift(
      df(psiSchema, ref), df(psiSchema, cur), Seq.empty))
  }
}
