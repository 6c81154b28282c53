package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** JSONL transport — the CSV sibling for the LLM-corpus interchange
  * format: infer/pinned-schema read, truncate/append semantics, schema
  * evolution, atomic rename, nested objects. */
class JsonlConnectorSpec extends SparkSpec {

  private def fresh() = new JsonlConnector(spark, tmpDir("graft_jsonl_"))

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def docs = df(docSchema, Seq(
    Row(1L, "alpha beta", "en"), Row(2L, "gamma delta", "en"),
    Row(3L, "epsilon", "de")))

  test("round trip preserves rows; inference types longs and strings") {
    val c = fresh()
    c.write(docs, "docs")
    val out = c.read("docs")
    assert(out.schema("doc_id").dataType == LongType)
    assert(out.schema("text").dataType == StringType)
    assert(out.count() == 3)
    assert(out.orderBy("doc_id").collect().map(_.getAs[String]("text")).toSeq ==
      Seq("alpha beta", "gamma delta", "epsilon"))
  }

  test("pinned schema skips inference and casts as declared") {
    val dir = tmpDir("graft_jsonl_pin_")
    val pinned = new JsonlConnector(spark, dir,
      schemaFor = { case "docs" => Some(docSchema); case _ => None })
    pinned.write(docs, "docs")
    assert(pinned.read("docs").schema == docSchema)
  }

  test("append merges rows and evolves schema through the lattice") {
    val c = fresh()
    c.write(docs, "docs")
    val extended = StructType(docSchema.fields :+ StructField("score", DoubleType))
    c.write(df(extended, Seq(Row(4L, "zeta", "en", 0.5))), "docs", SaveMode.Append)
    val out = c.read("docs")
    assert(out.count() == 4)
    assert(out.columns.contains("score"))
    // pre-evolution rows carry null in the new column
    assert(out.filter(col("doc_id") === 1L).head().isNullAt(out.columns.indexOf("score")))
  }

  test("truncate empties but keeps the table; drop/rename/tables behave") {
    val c = fresh()
    c.write(docs, "a")
    c.truncate("a")
    assert(c.exists("a") && c.read("a").count() == 0)
    c.write(docs, "b")
    c.rename("b", "c")
    assert(!c.exists("b") && c.read("c").count() == 3)
    assert(c.tables.toSet == Set("a", "c"))
    c.drop("a")
    assert(c.tables == Seq("c"))
  }

  test("nested JSON objects survive the round trip") {
    val nested = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("source", StringType), StructField("tokens", LongType))))))
    val c = fresh()
    c.write(df(nested, Seq(Row(1L, Row("wiki", 42L)), Row(2L, Row("web", 7L)))), "n")
    val out = c.read("n").orderBy("id").collect()
    assert(out(0).getStruct(1).getString(0) == "wiki")
    assert(out(1).getStruct(1).getLong(1) == 7L)
  }
}
