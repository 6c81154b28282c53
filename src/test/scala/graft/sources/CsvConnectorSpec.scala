package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** CSV transport parity (`transports/csv.rb`; reference spec
  * `spec/integration/csv_spec.rb` — 5-vendor seed, auto-typing). */
class CsvConnectorSpec extends SparkSpec {

  private def fresh() = new CsvConnector(spark, tmpDir("graft_csv_"))

  private val vendorSchema = StructType(Seq(
    StructField("vendor_id", IntegerType),
    StructField("name", StringType),
    StructField("rating", DoubleType)))

  private def vendors = df(vendorSchema, Seq(
    Row(1, "Acme", 4.5), Row(2, "Blue Ox", 3.8), Row(3, "Carver", 4.9),
    Row(4, "Dyno", 2.2), Row(5, "Edge", 4.0)))

  test("read auto-types columns (converters: :all / inferSchema, csv_spec.rb:22-23)") {
    val c = fresh()
    c.write(vendors, "vendors")
    val out = c.read("vendors")
    assert(out.schema("vendor_id").dataType == IntegerType)
    assert(out.schema("rating").dataType == DoubleType)
    assert(out.schema("name").dataType == StringType)
    assert(out.count() == 5)
  }

  test("append merges rows; truncate empties (csv.rb:31-51)") {
    val c = fresh()
    c.write(vendors, "vendors")
    c.write(df(vendorSchema, Seq(Row(6, "Flux", 1.1))), "vendors", SaveMode.Append)
    assert(c.read("vendors").count() == 6)
    c.truncate("vendors")
    assert(c.exists("vendors") && c.read("vendors").count() == 0)
  }

  test("tables/drop/rename catalog ops") {
    val c = fresh()
    c.write(vendors, "a")
    c.write(vendors, "b")
    assert(c.tables == Seq("a", "b"))
    c.rename("a", "c")
    assert(c.tables == Seq("b", "c"))
    c.drop("b")
    assert(c.tables == Seq("c"))
  }

  test("failed overwrite leaves prior table intact (atomic publish)") {
    val c = fresh()
    c.write(vendors, "vendors")
    val bad = vendors.withColumn("boom",
      udf((_: Int) => { throw new RuntimeException("injected"); 0 }).apply(col("vendor_id")))
    intercept[Exception] { c.write(bad, "vendors") }
    assert(c.read("vendors").count() == 5)
  }
}
