package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DiagnosticsSpec extends SparkSpec {

  private val kv = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("keySkewProfile: counts, ordering, fixed-point share and skew ratio") {
    // key 7 is hot (6 rows), keys 1..4 get 1 row each -> total 10, 5 keys
    val rows = (1 to 6).map(i => Row(7L, s"h$i")) ++
      (1L to 4L).map(k => Row(k, "x"))
    val out = Diagnostics.keySkewProfile(df(kv, rows), Seq("k"), topN = 3)
      .collect()
    assert(out.length == 3)
    val top = out.head
    assert(top.getAs[Int]("rank") == 1 && top.getAs[Long]("k") == 7L)
    assert(top.getAs[Long]("cnt") == 6L)
    // 6 * 1e8 / 10 = 60_000_000, truncating long division
    assert(top.getAs[Long]("share_fp") == 60000000L)
    assert(top.getAs[Long]("total_rows") == 10L && top.getAs[Long]("n_keys") == 5L)
    assert(top.getAs[Long]("max_cnt") == 6L)
    // max * n_keys * 1e4 / total = 6*5*10000/10 = 30000 (3x uniform)
    assert(top.getAs[Long]("skew_x10000") == 30000L)
    // ties on cnt=1 break by ascending key: ranks 2,3 are keys 1,2
    assert(out(1).getAs[Long]("k") == 1L && out(2).getAs[Long]("k") == 2L)
    assert(out(1).getAs[Int]("rank") == 2 && out(2).getAs[Int]("rank") == 3)
  }

  test("keySkewProfile: uniform keys report skew_x10000 = 10000") {
    val rows = (1L to 4L).flatMap(k => (1 to 3).map(i => Row(k, s"$i")))
    val out = Diagnostics.keySkewProfile(df(kv, rows), Seq("k"), topN = 10)
      .collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("skew_x10000") == 10000L))
    assert(out.forall(_.getAs[Long]("cnt") == 3L))
  }

  test("keySkewProfile: empty input is rejected, topN bounds output") {
    intercept[IllegalArgumentException] {
      Diagnostics.keySkewProfile(df(kv, Seq.empty), Seq("k"))
    }
    val rows = (1L to 9L).map(k => Row(k, "x"))
    assert(Diagnostics.keySkewProfile(df(kv, rows), Seq("k"), topN = 4).count() == 4)
  }

  private val qi = StructType(Seq(
    StructField("zip", StringType), StructField("seg", StringType),
    StructField("id", LongType)))

  test("kAnonymity: class sizes and the at-risk flag, NULL is a QI value") {
    val rows = Seq(
      Row("94110", "A", 1L), Row("94110", "A", 2L), Row("94110", "A", 3L),
      Row("94110", "B", 4L), // unique -> at risk
      Row(null, "B", 5L), Row(null, "B", 6L)) // NULL zip groups together
    val out = Diagnostics.kAnonymity(df(qi, rows), Seq("zip", "seg"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("group_n"), r.getAs[Int]("at_risk"))).toMap
    assert(out(("94110", "A")) == (3L, 0))
    assert(out(("94110", "B")) == (1L, 1))
    assert(out((null, "B")) == (2L, 1)) // 2 < k: still risky
    assert(out.size == 3)
  }

  test("kAnonymity: k must be at least 2") {
    intercept[IllegalArgumentException] {
      Diagnostics.kAnonymity(df(qi, Seq(Row("z", "s", 1L))), Seq("zip"), k = 1)
    }
  }

  test("joinSizeAudit: exact inner-join size, fan-out, unmatched keys, NULL keys never match") {
    val l = df(kv, Seq(Row(1L, "a"), Row(1L, "b"), Row(2L, "c"), Row(3L, "d"),
      Row(null, "e")))
    val r = df(kv, Seq(Row(1L, "x"), Row(1L, "y"), Row(1L, "z"), Row(2L, "w"),
      Row(9L, "v"), Row(null, "u")))
    val out = Diagnostics.joinSizeAudit(l, Seq("k"), r, Seq("k")).head()
    assert(out.getAs[Long]("left_rows") == 5L && out.getAs[Long]("right_rows") == 6L)
    assert(out.getAs[Long]("left_keys") == 4L)  // 1, 2, 3, NULL
    assert(out.getAs[Long]("right_keys") == 4L) // 1, 2, 9, NULL
    assert(out.getAs[Long]("matched_keys") == 2L)
    assert(out.getAs[Long]("left_only_keys") == 2L)  // 3 and NULL
    assert(out.getAs[Long]("right_only_keys") == 2L) // 9 and NULL
    // est = 2*3 (key 1) + 1*1 (key 2) = 7; the actual join agrees
    assert(out.getDecimal(7).longValueExact() == 7L)
    assert(l.join(r, Seq("k")).count() == 7L)
    assert(out.getDecimal(8).longValueExact() == 6L) // key 1 fan-out
    intercept[IllegalArgumentException](
      Diagnostics.joinSizeAudit(l, Seq.empty, r, Seq.empty))
  }

  test("dpNoisyCounts: matches the scalar inverse-CDF reference, clamps at 0, seeded") {
    val rows = (1 to 40).map(i => Row(s"g${i % 4}", "x", i.toLong))
    val d = df(qi, rows).withColumnRenamed("zip", "g")
    def reference(group: String, n: Long, eps: Double, seed: Long): Long = {
      val h = group.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 16777216L)
      val r = java.lang.Math.floorMod((h + seed) * 1103515245L + 12345L, 2147483648L)
      val u = (r + 0.5) / 2147483648.0
      val lap = if (u < 0.5) (1.0 / eps) * math.log(2.0 * u)
                else -(1.0 / eps) * math.log(2.0 * (1.0 - u))
      math.max(n + math.floor(lap + 0.5).toLong, 0L)
    }
    val out = Diagnostics.dpNoisyCounts(d, "g", epsilon = 1.0, seed = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (g <- Seq("g0", "g1", "g2", "g3"))
      assert(out(g) == reference(g, 10L, 1.0, 7L), s"group $g: got ${out(g)}")
    // determinism: same seed -> same release; noise is not identically 0 across seeds
    val again = Diagnostics.dpNoisyCounts(d, "g", 1.0, 7L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == out)
    val shifted = (0L to 30L).map(s => Diagnostics.dpNoisyCounts(
      d.limit(40), "g", 0.3, s).collect().map(_.getLong(1)).toSeq)
    assert(shifted.distinct.length > 1, "different seeds must move the noise")
    // clamp: tiny groups with strong noise never go negative
    val tiny = df(qi, Seq(Row("only", "x", 1L))).withColumnRenamed("zip", "g")
    (0L to 50L).foreach { s =>
      val v = Diagnostics.dpNoisyCounts(tiny, "g", 0.05, s).head().getLong(1)
      assert(v >= 0L, s"seed $s produced negative release $v")
    }
    intercept[IllegalArgumentException](Diagnostics.dpNoisyCounts(d, "g", 0.0, 1L))
    intercept[IllegalArgumentException](Diagnostics.dpNoisyCounts(d, "g", 1.0, -1L))
  }
}
