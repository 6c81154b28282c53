package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TimeSeriesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("uid", LongType), StructField("ts", TimestampType),
    StructField("v", DoubleType)))

  private def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("gapFill: missing buckets emitted with n_events=0, value forward-filled") {
    val d = df(schema, Seq(
      Row(1L, t(3600), 10.0),
      Row(1L, t(3700), 2.5),   // same bucket as above
      Row(1L, t(3600 * 4), 7.0), // buckets 2h,3h are gaps
      Row(2L, t(0), 1.0)))       // single-bucket entity
    val out = TimeSeries.gapFill(d, "uid", "ts", "v", stepSeconds = 3600)
      .orderBy("uid", "bucket").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(1)).toSeq == Seq(3600L, 7200L, 10800L, 14400L),
      "grid spans first..last observed bucket")
    assert(u1.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(u1(0).getDouble(3) == 12.5 && u1(0).getDouble(4) == 12.5)
    assert(u1(1).isNullAt(3) && u1(1).getDouble(4) == 12.5, "gap carries last value")
    assert(u1(2).isNullAt(3) && u1(2).getDouble(4) == 12.5)
    assert(u1(3).getDouble(3) == 7.0 && u1(3).getDouble(4) == 7.0, "fresh value replaces carry")
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getLong(1) == 0L && u2(0).getLong(2) == 1L)
  }

  test("gapFill: entities never extrapolate into each other's span") {
    val d = df(schema, Seq(
      Row(1L, t(0), 1.0), Row(1L, t(7200), 1.0),
      Row(2L, t(36000), 5.0)))
    val out = TimeSeries.gapFill(d, "uid", "ts", "v", 3600)
    assert(out.filter(col("uid") === 2L).count() == 1,
      "entity 2's grid is its own single bucket, not entity 1's span")
    assert(out.count() == 4)
  }

  test("gapFill: runaway span fails loudly at maxBucketsPerEntity") {
    val d = df(schema, Seq(Row(1L, t(0), 1.0), Row(1L, t(3600 * 100), 1.0)))
    val e = intercept[Exception] {
      TimeSeries.gapFill(d, "uid", "ts", "v", 3600, maxBucketsPerEntity = 10).collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException](TimeSeries.gapFill(d, "uid", "ts", "v", 0))
  }

  private val seqSchema = StructType(Seq(
    StructField("uid", LongType), StructField("ord", LongType),
    StructField("v", DoubleType)))

  test("ewma: literal recursion per entity, state resets at entity boundary") {
    val rows = Seq( // uid 1: 10, 20, 30; uid 2: 100 (fresh state)
      Row(1L, 1L, 10.0), Row(1L, 2L, 20.0), Row(1L, 3L, 30.0),
      Row(2L, 1L, 100.0))
    val out = TimeSeries.ewma(df(seqSchema, rows), "uid", "ord", "v", alpha = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // exact IEEE recursion, computed the same way here
    val y1 = 10.0
    val y2 = 0.25 * 20.0 + 0.75 * y1
    val y3 = 0.25 * 30.0 + 0.75 * y2
    assert(out((1L, 1L)) == y1 && out((1L, 2L)) == y2 && out((1L, 3L)) == y3)
    assert(out((2L, 1L)) == 100.0, "entity boundary must reset the fold")
    // result is partitioning-invariant (the fold re-sorts per entity)
    val shuffled = TimeSeries.ewma(df(seqSchema, scala.util.Random.shuffle(rows))
        .repartition(7), "uid", "ord", "v", alpha = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(shuffled == out)
    intercept[IllegalArgumentException](
      TimeSeries.ewma(df(seqSchema, rows), "uid", "ord", "v", alpha = 0.0))
  }

  test("holt: level+trend recursion tracks a linear drift EWMA would lag") {
    // perfectly linear series 10, 20, 30, ... — Holt's forecast converges
    // onto the true next value; EWMA lags below it forever
    val rows = (1L to 12L).map(i => Row(1L, i, 10.0 * i))
    val out = TimeSeries.holt(df(seqSchema, rows), "uid", "ord", "v",
        alpha = 0.5, gamma = 0.25)
      .collect().map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // replay the recursion exactly
    var l = 10.0; var b = 0.0
    for (t <- 2L to 12L) {
      val lN = 0.5 * (10.0 * t) + 0.5 * (l + b)
      b = 0.25 * (lN - l) + 0.75 * b
      l = lN
      assert(out(t) == ((l, b, l + b)), s"t=$t")
    }
    // trend has locked on by t=12: forecast within ~2% of the true next value
    assert(math.abs(out(12L)._3 - 130.0) < 3.0)
    // entity boundary resets (fresh series starts at its own x0)
    val two = rows :+ Row(2L, 1L, 7.0)
    val o2 = TimeSeries.holt(df(seqSchema, two), "uid", "ord", "v", 0.5, 0.25)
      .filter(col("uid") === 2L).head()
    assert(o2.getDouble(3) == 7.0 && o2.getDouble(4) == 0.0)
    intercept[IllegalArgumentException](
      TimeSeries.holt(df(seqSchema, rows), "uid", "ord", "v", 0.5, 1.5))
  }

  private val ohlcSchema = StructType(Seq(
    StructField("uid", LongType), StructField("ts", TimestampType),
    StructField("v", DoubleType), StructField("id", LongType)))

  test("downsample: OHLC candles with deterministic tie-break and exact sum") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      Row(1L, t("2024-01-01 00:00:05"), 3.0, 10L),
      Row(1L, t("2024-01-01 00:00:05"), 9.0, 11L), // same ts: id breaks tie
      Row(1L, t("2024-01-01 00:09:59"), 1.0, 12L),
      Row(1L, t("2024-01-01 00:10:00"), 7.0, 13L), // next 600s bucket
      Row(2L, t("2024-01-01 00:00:01"), 5.5, 14L))
    val out = TimeSeries.downsample(df(ohlcSchema, rows), "uid", "ts", "v", "id", 600L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getLong(7))).toMap
    // bucket 0 of uid 1: open = id-10 row (3.0), close = latest ts (1.0)
    val b0 = out((1L, 1704067200L))
    assert(b0 == ((3.0, 9.0, 1.0, 1.0, 3L, 1300L)), s"got $b0")
    assert(out((1L, 1704067800L)) == ((7.0, 7.0, 7.0, 7.0, 1L, 700L)))
    assert(out((2L, 1704067200L)) == ((5.5, 5.5, 5.5, 5.5, 1L, 550L)))
    // partitioning-invariant (mergeable aggregates + exact sum)
    val shuffled = TimeSeries.downsample(
      df(ohlcSchema, scala.util.Random.shuffle(rows)).repartition(5),
      "uid", "ts", "v", "id", 600L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(shuffled.view.mapValues(identity).toMap ==
      out.view.mapValues(_._1).toMap)
    intercept[IllegalArgumentException](
      TimeSeries.downsample(df(ohlcSchema, rows), "uid", "ts", "v", "id", 0L))
  }

  test("seasonalBaseline: per-slot trailing mean, cross-slot isolation, cold start") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val sch = StructType(Seq(
      StructField("uid", LongType), StructField("ts", TimestampType),
      StructField("id", LongType), StructField("v", DoubleType)))
    // same hour-of-week slot across 4 weeks: 10, 10, 10, then a 3x spike;
    // one off-slot event in between must not pollute the baseline
    val rows = Seq(
      Row(1L, t("2024-01-01 09:30:00"), 1L, 10.0),
      Row(1L, t("2024-01-08 09:30:00"), 2L, 10.0),
      Row(1L, t("2024-01-10 14:00:00"), 3L, 999.0), // different slot
      Row(1L, t("2024-01-15 09:30:00"), 4L, 10.0),
      Row(1L, t("2024-01-22 09:30:00"), 5L, 30.0))  // 3x the slot baseline
    val out = TimeSeries.seasonalBaseline(df(sch, rows), "uid", "ts", "id", "v",
        k = 4, relPermille = 500L)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(5), if (r.isNullAt(6)) -1L else r.getLong(6), r.getInt(7))).toMap
    assert(out(1L) == ((0L, -1L, 0)), "cold start: no history, null baseline, no flag")
    assert(out(2L) == ((1L, 10000000L, 0)))
    assert(out(4L) == ((2L, 10000000L, 0)))
    // spike: baseline 10, |30-10|*1000 > 500*10 → anomaly
    assert(out(5L) == ((3L, 10000000L, 1)), s"got ${out(5L)}")
    // the off-slot 999 never entered any 09:30 baseline
    assert(out(3L)._1 == 0L, "different slot has its own empty history")
    intercept[IllegalArgumentException](
      TimeSeries.seasonalBaseline(df(sch, rows), "uid", "ts", "id", "v", k = 0))
  }

  private val ivSchema = StructType(Seq(
    StructField("uid", LongType), StructField("s", LongType),
    StructField("e", LongType)))

  test("coalesceIntervals: overlap and touch merge, gaps split, per-entity isolation") {
    val rows = Seq(
      Row(1L, 0L, 10L), Row(1L, 5L, 20L),   // overlap -> one island
      Row(1L, 20L, 30L),                     // touching -> still merged
      Row(1L, 40L, 50L),                     // gap -> new island
      Row(1L, 42L, 44L),                     // contained -> absorbed
      Row(2L, 0L, 5L))                       // other entity untouched
    val out = TimeSeries.coalesceIntervals(df(ivSchema, rows), "uid", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, 1L)) == ((0L, 30L, 3L)))
    assert(out((1L, 2L)) == ((40L, 50L, 2L)))
    assert(out((2L, 1L)) == ((0L, 5L, 1L)))
    assert(out.size == 3)
    // result is input-partitioning-invariant
    val shuffled = TimeSeries.coalesceIntervals(
      df(ivSchema, scala.util.Random.shuffle(rows)).repartition(5), "uid", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(shuffled == out)
    // inverted span fails loudly, never silently drops
    val bad = df(ivSchema, Seq(Row(1L, 10L, 5L)))
    val ex = intercept[Exception](
      TimeSeries.coalesceIntervals(bad, "uid", "s", "e").collect())
    assert(ex.getMessage != null)
  }

  test("cusum: fixed-point drift statistic, clamp at zero, alarms past threshold") {
    // target 10, slack 0: values at target keep s = 0; a +5 drift
    // accumulates 5e6/step and alarms once past h = 12
    val rows = (1L to 3L).map(i => Row(1L, i, 10.0)) ++
      (4L to 7L).map(i => Row(1L, i, 15.0)) ++
      Seq(Row(1L, 8L, 2.0)) // big dip drags s back down (clamped at 0)
    val out = TimeSeries.cusum(df(seqSchema, rows), "uid", "ord", "v",
        target = 10.0, slack = 0.0, threshold = 12.0)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getInt(4))).toMap
    assert(out(3L) == (0L, 0))            // on-target: s stays 0
    assert(out(4L) == (5000000L, 0))      // drift starts
    assert(out(6L) == (15000000L, 1))     // crosses h = 12e6 -> alarm
    assert(out(7L) == (20000000L, 1))
    assert(out(8L) == (12000000L, 0))     // 20 + 2 - 10 = 12, NOT > 12
    intercept[IllegalArgumentException](
      TimeSeries.cusum(df(seqSchema, rows), "uid", "ord", "v", 10.0, -1.0, 12.0))
  }

  private val mkSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("e", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType)))

  test("mannKendall: monotone series maxes S with positive Z; ties correct the variance") {
    // strictly increasing over 10 buckets: S = 45, var_num = 10·9·25,
    // Z = 44/sqrt(2250/18)
    val up = (1L to 10L).map(i => Row("up", i, i * 3L))
    // constant series: S = 0, the tie term cancels var_num -> Z null
    val flat = (1L to 10L).map(i => Row("flat", i, 7L))
    // strictly decreasing: mirrored S
    val down = (1L to 6L).map(i => Row("down", i, 100L - i))
    val out = TimeSeries.mannKendall(df(mkSchema, up ++ flat ++ down),
        "e", "t", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else Double.box(r.getDouble(4)))).toMap
    val (nU, sU, vU, zU) = out("up")
    assert(nU == 10L && sU == 45L && vU == 2250L)
    assert(math.abs(zU - 44.0 / math.sqrt(125.0)) < 1e-12, s"z=$zU")
    assert(out("flat")._2 == 0L && out("flat")._3 == 0L && out("flat")._4 == null)
    assert(out("down")._2 == -15L && out("down")._4.doubleValue < 0.0)
    // partial ties: (1,1,2,3) over 4 buckets — S counts only strict
    // pairs, the t=2 tie subtracts 2·1·9 from 4·3·13
    val tied = Seq(Row("tied", 1L, 1L), Row("tied", 2L, 1L),
      Row("tied", 3L, 2L), Row("tied", 4L, 3L))
    val t = TimeSeries.mannKendall(df(mkSchema, tied), "e", "t", "x")
      .collect().head
    assert(t.getLong(2) == 5L && t.getLong(3) == 4L * 3L * 13L - 2L * 1L * 9L)
  }

  test("mannKendall: duplicate (entity, order) buckets fail loudly, not silently bias S") {
    // two rows at t=2 would be counted in n but dropped from S by the
    // strict _tb > _ta pair join — the bucket contract is enforced
    val dup = Seq(Row("d", 1L, 1L), Row("d", 2L, 5L), Row("d", 2L, 6L),
      Row("d", 3L, 9L))
    val ex = intercept[Exception] {
      TimeSeries.mannKendall(df(mkSchema, dup), "e", "t", "x").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("duplicate (entity, order) bucket")), ex)
    // clean input through the same guard is untouched
    val ok = TimeSeries.mannKendall(
      df(mkSchema, (1L to 5L).map(i => Row("ok", i, i))), "e", "t", "x").collect().head
    assert(ok.getLong(1) == 5L && ok.getLong(2) == 10L)
  }
}
