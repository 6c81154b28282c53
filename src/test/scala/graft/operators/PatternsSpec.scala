package graft.operators

import graft.SparkSpec
import graft.sources.ParquetConnector
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Composite pattern parity (`patterns/mysql_patterns.rb`; reference spec
  * `spec/integration/mysql_patterns_spec.rb`). */
class PatternsSpec extends SparkSpec {

  private def fresh() = new ParquetConnector(spark, tmpDir("graft_pat_"))

  test("pipe: full-refresh copy, returns rows moved (P1)") {
    val src = fresh(); val dst = fresh()
    src.write(usersDf, "users")
    dst.write(usersDf.limit(1), "users") // stale prior content replaced
    assert(Patterns.pipe(src, "users", dst, "users") == 5)
    assert(dst.count("users") == 5)
  }

  test("incrementalPipe: dst catches up to fresh rows (mysql_patterns_spec.rb:38-44)") {
    val src = fresh(); val dst = fresh()
    src.write(usersDf, "users")
    dst.write(usersDf.filter(col("id") <= 2), "users")
    Patterns.incrementalPipe(src, "users", dst, "users", matcher = "updated_at", primaryKey = "id")
    assert(dst.read("users").orderBy("id").collect().map(_.getAs[Long]("id")).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("incrementalPipe: lazy-creates a missing destination and full-loads it") {
    val src = fresh(); val dst = fresh()
    src.write(usersDf, "users")
    assert(Patterns.incrementalPipe(src, "users", dst, "users",
      matcher = "updated_at", primaryKey = "id") == 5)
  }

  test("incrementalPipe is idempotent: a second run moves nothing and changes nothing") {
    val src = fresh(); val dst = fresh()
    src.write(usersDf, "users")
    Patterns.incrementalPipe(src, "users", dst, "users", matcher = "updated_at", primaryKey = "id")
    val before = dst.read("users").orderBy("id").collect().toSeq
    Patterns.incrementalPipe(src, "users", dst, "users", matcher = "updated_at", primaryKey = "id")
    assert(dst.read("users").orderBy("id").collect().toSeq == before)
  }

  test("canIncrementalPipe: requires both tables, matcher both sides, equal column sets (P7)") {
    val src = fresh(); val dst = fresh()
    src.write(usersDf, "users")
    assert(!Patterns.canIncrementalPipe(src, "users", dst, "users", "updated_at"))
    dst.write(usersDf, "users")
    assert(Patterns.canIncrementalPipe(src, "users", dst, "users", "updated_at"))
    assert(!Patterns.canIncrementalPipe(src, "users", dst, "users", "no_such_col"))
    dst.write(usersDf.withColumn("extra", lit(1)), "users2")
    assert(!Patterns.canIncrementalPipe(src, "users", dst, "users2", "updated_at"))
  }

  test("optimisticPipe: falls back to full pipe when the guard fails (P3)") {
    val src = fresh(); val dst = fresh()
    src.write(usersDf, "users")
    // dst missing -> guard fails -> full pipe
    assert(Patterns.optimisticPipe(src, "users", dst, "users",
      matcher = "updated_at", primaryKey = "id") == 5)
  }

  test("optimisticImport: incremental when possible, full otherwise (P6)") {
    val src = fresh(); val dst = fresh()
    src.write(usersDf, "users")
    assert(Patterns.optimisticImport(src, "users", dst, "users",
      matcher = "updated_at", primaryKey = "id") == 5)
    // now incremental path: stale dst
    val dst2 = fresh()
    dst2.write(usersDf.filter(col("id") <= 3), "users")
    assert(Patterns.optimisticImport(src, "users", dst2, "users",
      matcher = "updated_at", primaryKey = "id") == 5)
  }

  test("writeHighWaterMark: timestamp matcher stub row (P9, mysql_patterns.rb:190-217)") {
    val c = fresh()
    c.write(usersDf, "users")
    val hwm = ts("2024-06-01 00:00:00")
    Patterns.writeHighWaterMark(c, "users", "updated_at", hwm)
    assert(c.count("users") == 6)
    assert(c.maxTimestamp("users", "updated_at") == hwm)
    // stub values type-exact: id long 0, strings "0"
    val stub = c.read("users").filter(col("updated_at") === hwm).head()
    assert(stub.getAs[Long]("id") == 0L)
    assert(stub.getAs[String]("email") == "0")
  }

  test("writeHighWaterMark: DateType and StringType matcher columns coerce (ADVICE r2)") {
    val c = fresh()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("d", DateType),
      StructField("s", StringType)))
    c.write(df(schema, Seq(Row(1L, java.sql.Date.valueOf("2024-01-01"), "x"))), "t")
    val hwm = ts("2024-06-01 00:00:00")
    Patterns.writeHighWaterMark(c, "t", "d", hwm)   // date matcher
    Patterns.writeHighWaterMark(c, "t", "s", hwm)   // string matcher
    assert(c.count("t") == 3)
    val dates = c.read("t").select("d").collect().map(r => Option(r.getDate(0)))
    assert(dates.flatten.contains(java.sql.Date.valueOf("2024-06-01")))
  }

  test("incrementalAggregate: ticks merge partials; old source rows never re-read") {
    val src = new graft.sources.ParquetConnector(spark, tmpDir("graft_iasrc_"))
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_iadst_"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("updated_at",
        org.apache.spark.sql.types.TimestampType)))
    val aggs = Seq(("count", "*", "n"), ("sum", "v", "sv"), ("min", "v", "mnv"), ("max", "v", "mxv"))
    src.write(df(schema, Seq(
      Row("a", 1L, ts("2024-01-01 10:00:00")), Row("a", 5L, ts("2024-01-01 11:00:00")),
      Row("b", 7L, ts("2024-01-01 12:00:00")))), "ev")
    Patterns.incrementalAggregate(src, "ev", dst, "ev_agg", Seq("k"), aggs)
    // REPLACE the source with only the delta — if the tick re-read old
    // source rows the old contributions would vanish from the result
    src.write(df(schema, Seq(
      Row("a", 100L, ts("2024-01-02 10:00:00")),   // existing group
      Row("c", 9L, ts("2024-01-02 11:00:00")))), "ev") // brand-new group
    Patterns.incrementalAggregate(src, "ev", dst, "ev_agg", Seq("k"), aggs)
    val got = dst.read("ev_agg").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 3L, 106L, 1L, 100L), ("b", 1L, 7L, 7L, 7L), ("c", 1L, 9L, 9L, 9L)))
    // idempotent: nothing past the watermark → no change
    Patterns.incrementalAggregate(src, "ev", dst, "ev_agg", Seq("k"), aggs)
    assert(dst.read("ev_agg").count() == 3)
  }

  test("incrementalAggregate: composite group keys via synthetic _gkey") {
    val src = new graft.sources.ParquetConnector(spark, tmpDir("graft_iasrc_"))
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_iadst_"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k1", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("k2", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("updated_at",
        org.apache.spark.sql.types.TimestampType)))
    // ("ab","c") vs ("a","bc"): the separator must keep these distinct
    src.write(df(schema, Seq(
      Row("ab", "c", 1L, ts("2024-01-01 10:00:00")),
      Row("a", "bc", 2L, ts("2024-01-01 10:00:00")))), "ev")
    Patterns.incrementalAggregate(src, "ev", dst, "agg2", Seq("k1", "k2"),
      Seq(("sum", "v", "sv")))
    src.write(df(schema, Seq(Row("ab", "c", 10L, ts("2024-01-02 10:00:00")))), "ev")
    Patterns.incrementalAggregate(src, "ev", dst, "agg2", Seq("k1", "k2"),
      Seq(("sum", "v", "sv")))
    val got = dst.read("agg2").orderBy("k1", "k2").collect()
      .map(r => (r.getAs[String]("k1"), r.getAs[String]("k2"), r.getAs[Long]("sv")))
    assert(got.toSeq == Seq(("a", "bc", 2L), ("ab", "c", 11L)))
    assert(dst.read("agg2").count() == 2)
  }

  test("scdType2: versions chain, current rows close on update, history never re-read") {
    val src = new graft.sources.ParquetConnector(spark, tmpDir("graft_scds_"))
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_scdd_"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("updated_at",
        org.apache.spark.sql.types.TimestampType)))
    src.write(df(schema, Seq(
      Row(1L, "a1", ts("2024-01-01 10:00:00")), Row(1L, "a2", ts("2024-01-02 10:00:00")),
      Row(2L, "b1", ts("2024-01-01 12:00:00")))), "chg")
    Patterns.scdType2(src, "chg", dst, "dim", "k", "updated_at")
    // REPLACE src with only the new changes — old history must come from dst
    src.write(df(schema, Seq(
      Row(1L, "a3", ts("2024-01-03 10:00:00")),   // closes (1, a2)
      Row(3L, "c1", ts("2024-01-03 11:00:00")))), "chg") // brand-new key
    Patterns.scdType2(src, "chg", dst, "dim", "k", "updated_at")
    val got = dst.read("dim").orderBy("k", "updated_at").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.toString).orNull))
    assert(got.toSeq == Seq(
      (1L, "a1", "2024-01-02 10:00:00.0"),
      (1L, "a2", "2024-01-03 10:00:00.0"),   // closed by the tick
      (1L, "a3", null),
      (2L, "b1", null),
      (3L, "c1", null)))
    // idempotent: tick with nothing fresh changes nothing
    Patterns.scdType2(src, "chg", dst, "dim", "k", "updated_at")
    assert(dst.read("dim").count() == 5)
  }

  test("scdType2: per-key watermark keeps an update older than ANOTHER key's current version") {
    val src = new graft.sources.ParquetConnector(spark, tmpDir("graft_scds_"))
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_scdd_"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("updated_at",
        org.apache.spark.sql.types.TimestampType)))
    src.write(df(schema, Seq(
      Row(1L, "a1", ts("2024-01-01 08:00:00")),
      Row(2L, "b1", ts("2024-01-05 08:00:00")))), "chg") // key 2 far ahead
    Patterns.scdType2(src, "chg", dst, "dim", "k", "updated_at")
    // key 1's update is strictly increasing FOR KEY 1 but earlier than
    // key 2's current version — a global max(matcher) filter drops it
    src.write(df(schema, Seq(Row(1L, "a2", ts("2024-01-02 08:00:00")))), "chg")
    Patterns.scdType2(src, "chg", dst, "dim", "k", "updated_at")
    val got = dst.read("dim").orderBy("k", "updated_at").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.toString).orNull))
    assert(got.toSeq == Seq(
      (1L, "a1", "2024-01-02 08:00:00.0"),
      (1L, "a2", null),
      (2L, "b1", null)), s"interleaved-key update lost: ${got.toSeq}")
  }

  test("incrementalAggregate rejects non-mergeable aggregate functions") {
    val src = new graft.sources.ParquetConnector(spark, tmpDir("graft_iasrc_"))
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_iadst_"))
    intercept[IllegalArgumentException] {
      Patterns.incrementalAggregate(src, "ev", dst, "agg", Seq("k"),
        Seq(("avg", "v", "a")))
    }
  }

  test("canIncrementalImport: src+dst must exist and carry the matcher (P8)") {
    val src = fresh(); val dst = fresh()
    src.write(usersDf, "users")
    assert(!Patterns.canIncrementalImport(src, "users", dst, "users", "updated_at"))
    dst.write(usersDf.limit(1), "users")
    assert(Patterns.canIncrementalImport(src, "users", dst, "users", "updated_at"))
    assert(!Patterns.canIncrementalImport(src, "users", dst, "users", "nope"))
  }

  test("backfill: windows the range, records progress, resumes mid-run") {
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_backfill_"))
    val seen = scala.collection.mutable.Buffer[(String, String)]()
    def window(lo: java.sql.Timestamp, hi: java.sql.Timestamp): Unit = {
      seen += ((lo.toString, hi.toString))
      // a sparse window writes one row at its LOW edge (rows lag hi)
      dst.write(df(usersSchema, Seq(usersRows.head match { case r =>
        org.apache.spark.sql.Row(seen.size.toLong, r.getString(1), r.getString(2),
          r.getString(3), r.getTimestamp(4), lo)
      })), "events_bf", org.apache.spark.sql.SaveMode.Append)
    }
    val start = ts("2024-01-01 00:00:00"); val end = ts("2024-01-01 06:00:00")
    // live tail data NEWER than the backfill range must not suppress it:
    // progress lives in a dedicated marker, not the table's own max
    dst.write(df(usersSchema, Seq(org.apache.spark.sql.Row(999L, "t", "t", "t",
      ts("2025-06-01 00:00:00"), ts("2025-06-01 00:00:00")))), "events_bf")
    // first run processes 3 of 6 hours, then "crashes"
    val n1 = Patterns.backfill(dst, "events_bf", "updated_at",
      start, ts("2024-01-01 03:00:00"), stepMinutes = 60)(window)
    assert(n1 == 3 && seen.size == 3)
    // resumed run with the FULL range only executes the remaining 3
    val n2 = Patterns.backfill(dst, "events_bf", "updated_at",
      start, end, stepMinutes = 60)(window)
    assert(n2 == 3, s"resume must skip finished windows, ran $n2")
    assert(seen.size == 6 && seen.map(_._1).distinct.size == 6)
    // fully-done range is a no-op
    assert(Patterns.backfill(dst, "events_bf", "updated_at",
      start, end, stepMinutes = 60)(window) == 0)
  }
}
