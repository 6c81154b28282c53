package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ProfileSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType),
    StructField("d", DoubleType), StructField("t", TimestampType)))

  private def data = df(schema, Seq(
    Row(1L, "b", 1.5, new java.sql.Timestamp(1000L)),
    Row(2L, "a", null, new java.sql.Timestamp(2000L)),
    Row(3L, "a", 2.5, null),
    Row(null, null, 9.0, new java.sql.Timestamp(500L))))

  test("profileColumns (exact): counts, nulls, NDV, min/max as strings, any type") {
    val out = Profile.profileColumns(data, Seq("id", "s", "d", "t"), exactNdv = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("id") == (4L, 1L, 3L, "1", "3"))
    assert(out("s") == (4L, 1L, 2L, "a", "b"))
    assert(out("d") == (4L, 1L, 3L, "1.5", "9.0"))
    val (tn, tnull, tndv, tmin, _) = out("t")
    assert((tn, tnull, tndv) == (4L, 1L, 3L) && tmin.startsWith("1970-01-01"))
  }

  test("profileColumns: approx mode agrees with exact on small cardinalities") {
    val out = Profile.profileColumns(data, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL++ at default rsd is exact for tiny NDV
    assert(out("id") == 3L && out("s") == 2L)
  }

  test("profileColumns: one scan — a single aggregate node, no join or union of scans") {
    val plan = Profile.profileColumns(data, Seq("id", "s", "d"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"),
      s"profile must be one aggregation pass, not per-column scans:\n$plan")
    intercept[IllegalArgumentException](Profile.profileColumns(data, Seq.empty))
    intercept[IllegalArgumentException](Profile.profileColumns(data, Seq("nope")))
  }
}
