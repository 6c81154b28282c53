package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class PrivacySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("age_band", StringType), StructField("zip", StringType),
    StructField("disease", StringType)))

  private def rows = Seq(
    // group (30s, 111): 3 rows, 2 distinct diseases
    Row("30s", "111", "flu"), Row("30s", "111", "flu"), Row("30s", "111", "cold"),
    // group (40s, 222): 1 row — k-violation at k=2
    Row("40s", "222", "flu"),
    // group (50s, 333): 2 rows, 1 disease — l-violation at l=2
    Row("50s", "333", "cold"), Row("50s", "333", "cold"),
    // null quasi value is a group of its own
    Row(null, "111", "flu"), Row(null, "111", "cold"))

  test("kAnonymityAudit: exact n and l per group, both violation flags, null groups") {
    val out = Privacy.kAnonymityAudit(df(schema, rows),
        Seq("age_band", "zip"), "disease", k = 2, l = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val g1 = out(("30s", "111"))
    assert(g1.getLong(2) == 3L && g1.getLong(3) == 2L)
    assert(!g1.getBoolean(4) && !g1.getBoolean(5))
    val g2 = out(("40s", "222"))
    assert(g2.getLong(2) == 1L && g2.getBoolean(4), "singleton group k-violates")
    assert(g2.getBoolean(5), "one row has one distinct value: l-violates too")
    val g3 = out(("50s", "333"))
    assert(!g3.getBoolean(4) && g3.getBoolean(5),
      "k ok but everyone shares the secret: l-violation")
    val gn = out((null, "111"))
    assert(gn.getLong(2) == 2L && gn.getLong(3) == 2L, "null quasi groups together")
  }

  test("suppress: violating groups leave entirely; passing groups keep every row") {
    val kept = Privacy.suppress(df(schema, rows),
        Seq("age_band", "zip"), "disease", k = 2, l = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(kept.count(_ == ("30s", "111")) == 3)
    assert(kept.count(_ == (null, "111")) == 2, "null-safe join keeps the null group")
    assert(!kept.exists(_ == ("40s", "222")) && !kept.exists(_ == ("50s", "333")))
  }

  test("suppress at k=1,l=1 is the identity; guards reject bad thresholds") {
    assert(Privacy.suppress(df(schema, rows),
      Seq("age_band", "zip"), "disease", k = 1, l = 1).count() == rows.length)
    intercept[IllegalArgumentException](
      Privacy.kAnonymityAudit(df(schema, rows), Seq.empty, "disease", k = 2))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityAudit(df(schema, rows), Seq("zip"), "disease", k = 0))
  }

  private val pseuSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("phone", StringType), StructField("code", IntegerType)))

  test("pseudonymize: salted md5 tokens — deterministic, joinable, null-safe") {
    val rows = Seq(
      Row(1L, "alice", "555-0100", 42),
      Row(2L, "alice", null, 42),     // same name -> same token; null stays
      Row(3L, "bob", "555-0100", 7))  // same phone as row 1 -> same token
    val out = Privacy.pseudonymize(df(pseuSchema, rows),
        Seq("name", "phone", "code"), salt = "s3cret")
      .collect().map(r => r.getLong(0) -> r).toMap
    // expected token from the JDK digest — the cross-engine ground truth
    def tok(v: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"s3cret:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out(1L).getString(1) == tok("alice"))
    assert(out(2L).getString(1) == tok("alice"), "same value, same token")
    assert(out(2L).isNullAt(2), "null identifier stays null")
    assert(out(1L).getString(2) == out(3L).getString(2), "joinability preserved")
    assert(out(1L).getString(3) == tok("42"), "non-string columns tokenize via string form")
    intercept[IllegalArgumentException](
      Privacy.pseudonymize(df(pseuSchema, rows), Seq("name"), salt = ""))
    intercept[IllegalArgumentException](
      Privacy.pseudonymize(df(pseuSchema, rows), Nil, salt = "x"))
  }

  private val tSchema = StructType(Seq(
    StructField("g", StringType), StructField("v", LongType)))

  test("tClosenessAudit: hand-computed ordered EMD; strict boundary; null group; m=1") {
    // global over v in {1,2,3}: C = (2,2,2), N = 6, m = 3
    // group a = [1,1,2]: p = (2/3,1/3,0) vs q = (1/3,1/3,1/3)
    //   -> cum diffs 1/3, 1/3, 0 -> EMD = (2/3)/(m-1) = 1/3; b symmetric
    val rows = Seq(Row("a", 1L), Row("a", 1L), Row("a", 2L),
      Row("b", 2L), Row("b", 3L), Row("b", 3L))
    def audit(tn: Long, td: Long) =
      Privacy.tClosenessAudit(df(tSchema, rows), Seq("g"), "v", tn, td)
        .collect().map(r => r.getString(0) -> r).toMap
    val at13 = audit(1, 3)
    assert(at13("a").getLong(1) == 3L)
    assert(math.abs(at13("a").getDouble(2) - 1.0 / 3.0) < 1e-15)
    assert(math.abs(at13("b").getDouble(2) - 1.0 / 3.0) < 1e-15)
    // the bound is <= t: EMD exactly at t must NOT violate...
    assert(!at13("a").getBoolean(3) && !at13("b").getBoolean(3))
    // ...and any tighter t must (integer comparison, no double slack)
    val tight = audit(33333, 100000)
    assert(tight("a").getBoolean(3) && tight("b").getBoolean(3))
    // null quasi values audit as their own group
    val withNull = Privacy.tClosenessAudit(
      df(tSchema, rows ++ Seq(Row(null, 1L), Row(null, 1L))), Seq("g"), "v", 1, 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(withNull(null).getLong(1) == 2L)
    assert(withNull(null).getDouble(2) > 0.0, "an all-1s group diverges from the global mix")
    // single global sensitive value: every group matches exactly
    val m1 = Privacy.tClosenessAudit(
      df(tSchema, Seq(Row("a", 7L), Row("b", 7L))), Seq("g"), "v", 0, 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m1("a").getDouble(2) == 0.0 && !m1("a").getBoolean(3))
    intercept[IllegalArgumentException](
      Privacy.tClosenessAudit(df(tSchema, rows), Seq("g"), "v", 2, 1))
  }
}
