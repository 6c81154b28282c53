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
}
