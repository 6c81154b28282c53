package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TemporalJoinSpec extends SparkSpec {

  private val leftSchema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("t", TimestampType)))
  private val rightSchema = StructType(Seq(
    StructField("k", StringType), StructField("rt", TimestampType),
    StructField("v", DoubleType)))

  private def leftDf = df(leftSchema, Seq(
    Row(1L, "a", ts("2024-01-01 10:00:00")),
    Row(2L, "a", ts("2024-01-01 12:00:00")),
    Row(3L, "a", ts("2024-01-01 09:00:00")), // before any right row
    Row(4L, "b", ts("2024-01-01 10:30:00")),
    Row(5L, "c", ts("2024-01-01 10:30:00")))) // key with no right rows

  private def rightDf = df(rightSchema, Seq(
    Row("a", ts("2024-01-01 09:30:00"), 1.0),
    Row("a", ts("2024-01-01 12:00:00"), 2.0), // equal ts: inclusive match
    Row("b", ts("2024-01-01 10:30:00"), 3.0),
    Row("b", ts("2024-01-01 11:00:00"), 4.0))) // after left row 4

  test("asof attaches latest at-or-before right row per key, left-outer") {
    val out = TemporalJoin.asof(leftDf, rightDf, Seq("k"), "t", "rt")
      .orderBy(col("id")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val byId = out.map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("v"))).toMap
    assert(byId(1L).contains(1.0))       // 10:00 → 09:30 row
    assert(byId(2L).contains(2.0))       // equal timestamp matches (inclusive)
    assert(byId(3L).isEmpty)             // nothing at-or-before
    assert(byId(4L).contains(3.0))       // equal ts on key b; 11:00 row ignored
    assert(byId(5L).isEmpty)             // key never seen on the right
    // carried right timestamp rides along under its own name
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getAs[java.sql.Timestamp]("rt") == ts("2024-01-01 12:00:00"))
  }

  test("asof keeps every left column and row count") {
    val out = TemporalJoin.asof(leftDf, rightDf, Seq("k"), "t", "rt")
    assert(out.columns.toSeq == Seq("id", "k", "t", "rt", "v"))
    assert(out.count() == leftDf.count())
  }

  test("asof rejects column collisions between the sides") {
    val bad = rightDf.withColumnRenamed("rt", "t")
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.asof(leftDf, bad, Seq("k"), "t", "t")
    }
    assert(e.getMessage.contains("collision"))
  }

  private val pointSchema = StructType(Seq(
    StructField("pid", LongType), StructField("pt", TimestampType)))
  private val ivSchema = StructType(Seq(
    StructField("iv", StringType), StructField("s", TimestampType),
    StructField("e", TimestampType)))

  test("pointInInterval: containment, end-exclusive, overlapping intervals") {
    val points = df(pointSchema, Seq(
      Row(1L, ts("2024-01-01 10:00:00")),
      Row(2L, ts("2024-01-01 12:00:00")),  // exactly at iv1 end: excluded
      Row(3L, ts("2024-01-01 11:30:00")),  // inside both overlapping windows
      Row(4L, ts("2024-01-02 00:00:00")))) // outside everything
    val ivs = df(ivSchema, Seq(
      Row("iv1", ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00")),
      Row("iv2", ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00"))))
    val out = TemporalJoin.pointInInterval(points, ivs, "pt", "s", "e", bucketSeconds = 600)
      .select(col("pid"), col("iv")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "iv1"), (2L, "iv2"), (3L, "iv1"), (3L, "iv2")))
  }

  test("pointInInterval agrees with the naive theta join across bucket widths") {
    val points = df(pointSchema, (1L to 200L).map(i =>
      Row(i, ts(f"2024-01-${(i % 27 + 1)}%02d ${(i % 24)}%02d:${(i % 60)}%02d:00"))))
    val ivs = df(ivSchema, (1L to 20L).map(i =>
      Row(s"iv$i", ts(f"2024-01-${(i % 25 + 1)}%02d 00:00:00"),
        ts(f"2024-01-${(i % 25 + 3)}%02d 00:00:00"))))
    val naive = points.join(ivs, col("pt") >= col("s") && col("pt") < col("e"))
      .select(col("pid"), col("iv")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (width <- Seq(3600L, 86400L, 7L * 86400)) {
      val fast = TemporalJoin.pointInInterval(points, ivs, "pt", "s", "e", width)
        .select(col("pid"), col("iv")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(fast == naive, s"bucket width $width")
    }
  }

  private val ovLSchema = StructType(Seq(
    StructField("k", StringType), StructField("la", StringType),
    StructField("ls", TimestampType), StructField("le", TimestampType)))
  private val ovRSchema = StructType(Seq(
    StructField("k", StringType), StructField("rb", StringType),
    StructField("rs", TimestampType), StructField("re", TimestampType)))

  private def ovLeft = df(ovLSchema, Seq(
    Row("u", "A1", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
    Row("u", "A2", ts("2024-01-01 14:00:00"), ts("2024-01-01 15:00:00")),
    Row("v", "A3", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))))
  private def ovRight = df(ovRSchema, Seq(
    Row("u", "B1", ts("2024-01-01 11:00:00"), ts("2024-01-01 13:00:00")), // overlaps A1
    Row("u", "B2", ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")), // abuts A1: half-open, no
    Row("u", "B3", ts("2024-01-01 09:00:00"), ts("2024-01-01 16:00:00")), // covers A1 and A2
    Row("w", "B4", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))) // key mismatch with A1

  test("intervalOverlap: half-open semantics, containment, key isolation") {
    val out = TemporalJoin.intervalOverlap(ovLeft, ovRight, Seq("k"),
        "ls", "le", "rs", "re", bucketSeconds = 1800)
      .select(col("la"), col("rb")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSet == Set(("A1", "B1"), ("A1", "B3"), ("A2", "B3")))
    assert(out.length == 3, "each pair exactly once — max-start-bucket dedup, no distinct")
  }

  test("intervalOverlap: pair set invariant to bucket width; each pair emitted once") {
    for (width <- Seq(60L, 600L, 3600L, 86400L)) {
      val out = TemporalJoin.intervalOverlap(ovLeft, ovRight, Seq("k"),
          "ls", "le", "rs", "re", bucketSeconds = width)
        .select(col("la"), col("rb")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(out.toSet == Set(("A1", "B1"), ("A1", "B3"), ("A2", "B3")),
        s"bucket width $width")
      assert(out.length == 3, s"duplicate pairs at bucket width $width")
    }
  }

  test("intervalOverlap: runaway interval fails loudly in-plan") {
    val ex = intercept[Exception] {
      TemporalJoin.intervalOverlap(ovLeft, ovRight, Seq("k"),
        "ls", "le", "rs", "re", bucketSeconds = 1,
        maxBucketsPerInterval = 100).count()
    }
    assert(ex.getMessage.contains("widen bucketSeconds") ||
      ex.getCause != null && ex.getCause.getMessage.contains("widen bucketSeconds"))
  }
}
