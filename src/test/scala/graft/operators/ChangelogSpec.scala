package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** CDC log compaction: last-writer-wins per key, delete tombstones,
  * same-ts tie determinism, partitioning invariance. */
class ChangelogSpec extends SparkSpec {

  private val sch = StructType(Seq(
    StructField("pk", LongType), StructField("ts", TimestampType),
    StructField("seq", LongType), StructField("op", StringType),
    StructField("v", DoubleType)))

  test("compact: last writer wins, deletes tombstone, later upsert resurrects") {
    val rows = Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, "upsert", 1.0),
      Row(1L, ts("2024-01-01 11:00:00"), 2L, "upsert", 2.0), // wins
      Row(2L, ts("2024-01-01 10:00:00"), 3L, "upsert", 3.0),
      Row(2L, ts("2024-01-01 11:00:00"), 4L, "delete", 0.0), // tombstoned
      Row(3L, ts("2024-01-01 10:00:00"), 5L, "delete", 0.0),
      Row(3L, ts("2024-01-01 11:00:00"), 6L, "upsert", 6.0)) // resurrected
    val out = Changelog.compact(df(sch, rows), "pk", "ts", "seq", "op", "delete",
      Seq("v")).collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getTimestamp(2))).toMap
    assert(out == Map(
      1L -> ((2.0, ts("2024-01-01 11:00:00"))),
      3L -> ((6.0, ts("2024-01-01 11:00:00")))), s"got $out")
  }

  test("compact: same-ts changes resolve by the tie column; partitioning-invariant") {
    val rows = Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, "upsert", 1.0),
      Row(1L, ts("2024-01-01 10:00:00"), 2L, "upsert", 2.0)) // higher seq wins
    def run(parts: Int) = Changelog.compact(
      df(sch, scala.util.Random.shuffle(rows)).repartition(parts),
      "pk", "ts", "seq", "op", "delete", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(run(1) == Set((1L, 2.0)))
    assert(run(7) == run(1))
    intercept[IllegalArgumentException](
      Changelog.compact(df(sch, rows), "pk", "ts", "seq", "op", "delete", Seq.empty))
  }

  private val snapSchema = StructType(Seq(
    StructField("pk", LongType), StructField("a", StringType),
    StructField("b", DoubleType)))

  test("snapshotDiff: added/removed/changed classification; unchanged absent; NULL-safe") {
    val old = df(snapSchema, Seq(
      Row(1L, "x", 1.0),   // unchanged
      Row(2L, "y", 2.0),   // changed payload
      Row(3L, "z", 3.0),   // removed
      Row(4L, null, 4.0),  // NULL -> value transition: changed
      Row(5L, null, 5.0))) // NULL -> NULL: unchanged
    val neu = df(snapSchema, Seq(
      Row(1L, "x", 1.0),
      Row(2L, "y", 2.5),
      Row(4L, "w", 4.0),
      Row(5L, null, 5.0),
      Row(6L, "new", 6.0))) // added
    val out = Changelog.snapshotDiff(old, neu, "pk", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "changed", 6L -> "added"))
    val row2 = Changelog.snapshotDiff(old, neu, "pk", Seq("a", "b"))
      .collect().find(_.getLong(0) == 2L).get
    assert(row2.getDouble(row2.fieldIndex("old_b")) == 2.0 &&
      row2.getDouble(row2.fieldIndex("new_b")) == 2.5)
    val row3 = Changelog.snapshotDiff(old, neu, "pk", Seq("a", "b"))
      .collect().find(_.getLong(0) == 3L).get
    assert(row3.isNullAt(row3.fieldIndex("new_a")) && row3.isNullAt(row3.fieldIndex("new_b")),
      "absent side's payload is NULL")
    intercept[IllegalArgumentException](
      Changelog.snapshotDiff(old, neu, "pk", Seq.empty))
  }

  test("snapshotDiff: identical snapshots diff to empty") {
    val old = df(snapSchema, Seq(Row(1L, "x", 1.0), Row(2L, null, 2.0)))
    assert(Changelog.snapshotDiff(old, old, "pk", Seq("a", "b")).count() == 0L)
  }
}
