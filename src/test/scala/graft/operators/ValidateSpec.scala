package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("qty", LongType),
    StructField("name", StringType)))

  private def d = df(schema, Seq(
    Row(1L, 10L, "a"), Row(2L, -5L, "b"), Row(2L, 3L, null),
    Row(4L, 200L, "d"), Row(5L, 7L, "e")))

  test("check: all rules in one pass with hand-computed violation counts") {
    val report = Validate.check(d, Seq(
      Validate.Predicate("qty_in_range", col("qty").between(0, 100)),
      Validate.NotNull("name_not_null", "name"),
      Validate.Unique("id_unique", "id"),
      Validate.Predicate("id_positive", col("id") > 0)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(report("qty_in_range") == ((2L, 5L, false)))  // -5 and 200
    assert(report("name_not_null") == ((1L, 5L, false)))
    assert(report("id_unique") == ((1L, 5L, false)))     // id=2 twice
    assert(report("id_positive") == ((0L, 5L, true)))
  }

  test("null predicate results count as violations") {
    val report = Validate.check(d, Seq(
      // name = 'a' is null for the null row → violation, not a skip
      Validate.Predicate("name_is_a", col("name") === "a")))
      .collect()
    assert(report.head.getLong(1) == 4L)
  }

  test("assertValid: passes on clean rules, throws with rule names on dirty") {
    Validate.assertValid(d, Seq(Validate.Predicate("id_positive", col("id") > 0)))
    val e = intercept[IllegalStateException] {
      Validate.assertValid(d, Seq(
        Validate.NotNull("name_not_null", "name"),
        Validate.Unique("id_unique", "id")))
    }
    assert(e.getMessage.contains("name_not_null=1") && e.getMessage.contains("id_unique=1"))
  }

  test("duplicate or malformed rule names are rejected") {
    intercept[IllegalArgumentException] {
      Validate.check(d, Seq(Validate.NotNull("x", "name"), Validate.NotNull("x", "id")))
    }
    intercept[IllegalArgumentException] {
      Validate.check(d, Seq(Validate.NotNull("bad name!", "name")))
    }
  }

  test("empty input: zero violations, everything passes") {
    val empty = df(schema, Seq.empty)
    val rows = Validate.check(empty, Seq(
      Validate.Predicate("qty_in_range", col("qty").between(0, 100)),
      Validate.Unique("id_unique", "id"))).collect()
    assert(rows.forall(r => r.getLong(1) == 0L && r.getBoolean(3)))
  }
}
