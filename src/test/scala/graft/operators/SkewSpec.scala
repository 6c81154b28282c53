package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Salted-join equivalence: for every supported join type the salted
  * plan must return exactly the plain join's multiset of rows. */
class SkewSpec extends SparkSpec {

  private val leftSchema = StructType(Seq(
    StructField("k", LongType), StructField("lv", LongType)))
  private val rightSchema = StructType(Seq(
    StructField("k", LongType), StructField("rv", StringType)))

  // skewed probe side: key 1 carries 500 of 560 rows; keys 7/8 unmatched
  private def probe = df(leftSchema,
    (1L to 500L).map(i => Row(1L, i)) ++
      (1L to 20L).flatMap(i => Seq(Row(2L, i), Row(3L, i))) ++
      (1L to 20L).map(i => Row(7L, i)) :+ Row(8L, 0L))
  // build side with duplicate keys (1 appears twice) and an unmatched key 9
  private def build = df(rightSchema,
    Seq(Row(1L, "a"), Row(1L, "b"), Row(2L, "c"), Row(3L, "d"), Row(9L, "z")))

  private def sortedRows(d: org.apache.spark.sql.DataFrame): Seq[String] =
    d.collect().map(_.mkString("|")).toSeq.sorted

  test("salted inner join equals the plain join (duplicate build keys included)") {
    val plain = probe.join(build, Seq("k"))
    val salted = Skew.saltedJoin(probe, build, Seq("k"), buckets = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("salted left_outer keeps unmatched probe rows exactly once") {
    val plain = probe.join(build, Seq("k"), "left_outer")
    val salted = Skew.saltedJoin(probe, build, Seq("k"), buckets = 4, joinType = "left_outer")
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("salted left_semi and left_anti equal the plain forms") {
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = probe.join(build, Seq("k"), jt)
      val salted = Skew.saltedJoin(probe, build, Seq("k"), buckets = 4, joinType = jt)
      assert(sortedRows(salted) == sortedRows(plain), s"join type $jt diverged")
    }
  }

  test("right/full joins are rejected; buckets must be >= 2") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, Seq("k"), 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, Seq("k"), 4, "full_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, Seq("k"), 1)
    }
  }

  test("the hot key's rows actually spread across salt buckets, deterministically") {
    // pin the mechanism, not just the result: the salted probe must place
    // key 1's 500 rows (distinct payloads) in >1 bucket, and the content
    // hash must assign the same buckets on re-evaluation (retry safety)
    def salted = probe.withColumn("_s",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(8L)).cast("int"))
    val a = salted.filter(col("k") === 1).select("lv", "_s").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.values.toSet.size > 1, "hot key stayed in one salt bucket")
    val b = salted.filter(col("k") === 1).select("lv", "_s").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "salt must be deterministic per row content")
  }
}
