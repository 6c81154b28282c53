package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Document-store (ES-analog) parity (`transports/elasticsearch.rb`;
  * reference spec `spec/integration/elasticsearch_spec.rb` — 5-doc seed,
  * term/sort/paging DSL, upsert by `_id`). */
class JsonDocConnectorSpec extends SparkSpec {

  private def fresh() = new JsonDocConnector(spark, tmpDir("graft_json_"))

  private val docSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("status", StringType),
    StructField("rank", LongType)))

  private def docs = df(docSchema, Seq(
    Row(1L, "alpha", "active", 5L), Row(2L, "beta", "inactive", 3L),
    Row(3L, "gamma", "active", 9L), Row(4L, "delta", "active", 1L),
    Row(5L, "epsilon", "inactive", 7L)))

  test("match_all returns every doc (S8)") {
    val c = fresh()
    c.write(docs, "idx")
    assert(c.search("idx", JsonDocConnector.matchAll).count() == 5)
  }

  test("term query filters on equality (elasticsearch_spec.rb:74)") {
    val c = fresh()
    c.write(docs, "idx")
    val out = c.search("idx", JsonDocConnector.Query(term = Some("status" -> "active")))
    assert(out.count() == 3)
    assert(out.select("name").collect().map(_.getString(0)).toSet == Set("alpha", "gamma", "delta"))
  }

  test("sort + from/size paging (multi_transport_spec.rb:31)") {
    val c = fresh()
    c.write(docs, "idx")
    val page = c.search("idx",
      JsonDocConnector.Query(sort = Some("rank" -> true), from = 1, size = 2))
      .collect().map(_.getAs[Long]("rank")).toSeq
    assert(page == Seq(3L, 5L)) // ranks asc = 1,3,5,7,9 -> skip 1, take 2
  }

  test("upsert by pk: last writer wins, new docs insert (S9, elasticsearch.rb:44-59)") {
    val c = fresh()
    c.write(docs, "idx")
    val updates = df(docSchema, Seq(
      Row(3L, "gamma-v2", "archived", 10L),
      Row(6L, "zeta", "active", 2L)))
    c.upsert(updates, "idx", "id")
    val out = c.read("idx")
    assert(out.count() == 6)
    assert(out.filter(col("id") === 3).head().getAs[String]("name") == "gamma-v2")
  }

  test("deleteIndex drops the index (S10)") {
    val c = fresh()
    c.write(docs, "idx")
    c.deleteIndex("idx")
    assert(!c.exists("idx"))
  }
}
