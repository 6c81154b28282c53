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

  test("canIncrementalImport: src+dst must exist and carry the matcher (P8)") {
    val src = fresh(); val dst = fresh()
    src.write(usersDf, "users")
    assert(!Patterns.canIncrementalImport(src, "users", dst, "users", "updated_at"))
    dst.write(usersDf.limit(1), "users")
    assert(Patterns.canIncrementalImport(src, "users", dst, "users", "updated_at"))
    assert(!Patterns.canIncrementalImport(src, "users", dst, "users", "nope"))
  }
}
