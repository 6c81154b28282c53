package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Cross-store copies preserve values and types — the reference's
  * multi-transport integration suite
  * (`spec/integration/multi_transport_spec.rb:43-70`). */
class MultiTransportSpec extends SparkSpec {

  test("csv -> parquet -> jsondoc copy preserves rows and values") {
    val csv = new CsvConnector(spark, tmpDir("graft_mt_csv_"))
    val pq = new ParquetConnector(spark, tmpDir("graft_mt_pq_"))
    val js = new JsonDocConnector(spark, tmpDir("graft_mt_js_"))

    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val data = df(schema, Seq(Row(1, "a", 1.5), Row(2, "b", 2.5), Row(3, "c", 3.5)))

    csv.write(data, "t")
    graft.operators.Patterns.pipe(csv, "t", pq, "t")
    graft.operators.Patterns.pipe(pq, "t", js, "t")

    val out = js.read("t").orderBy("id").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("name")).toSeq == Seq("a", "b", "c"))
    assert(out.map(_.getAs[Double]("score")).toSeq == Seq(1.5, 2.5, 3.5))
  }

  test("min/max agree across stores after copy (multi_transport_spec.rb:43-46)") {
    val pq = new ParquetConnector(spark, tmpDir("graft_mt2_pq_"))
    val js = new JsonDocConnector(spark, tmpDir("graft_mt2_js_"))
    pq.write(usersDf, "users")
    graft.operators.Patterns.importTable(pq, "users", js, "users")
    val a = pq.read("users").agg(min("id"), max("id")).head()
    val b = js.read("users").agg(min("id"), max("id")).head()
    assert(a == b)
  }

  test("incremental import across stores: only fresh rows upserted (P5)") {
    val src = new ParquetConnector(spark, tmpDir("graft_mt3_src_"))
    val dst = new ParquetConnector(spark, tmpDir("graft_mt3_dst_"))
    src.write(usersDf, "users")
    dst.write(usersDf.filter(col("id") <= 3), "users")
    val moved = graft.operators.Patterns.incrementalImport(
      src, "users", dst, "users", matcher = "updated_at", primaryKey = "id")
    assert(moved == 5)
    assert(dst.read("users").orderBy("id").collect().map(_.getAs[Long]("id")).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }
}
