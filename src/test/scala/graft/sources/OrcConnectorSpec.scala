package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec
import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** ORC transport — the ParquetConnector sibling: catalog ops, atomic
  * publish, additive append, schema evolution, and the physical-plan
  * evidence the 100 TB design depends on (pushdown + pruning reach the
  * native ORC scan). */
class OrcConnectorSpec extends SparkSpec {

  private def fresh() = new OrcConnector(spark, tmpDir("graft_orc_"))

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def rows = df(schema, Seq(
    Row(1L, "a", 0.5), Row(2L, "b", 1.5), Row(3L, "c", 2.5)))

  test("round trip preserves rows and types; tables/exists/drop/rename") {
    val c = fresh()
    c.write(rows, "t")
    assert(c.read("t").schema == schema)
    assert(c.read("t").orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(c.tables == Seq("t"))
    c.rename("t", "u")
    assert(c.tables == Seq("u") && !c.exists("t"))
    c.truncate("u")
    assert(c.exists("u") && c.count("u") == 0)
    c.drop("u")
    assert(c.tables.isEmpty)
  }

  test("append without schema change is file-additive: existing files untouched") {
    val c = fresh()
    c.write(rows, "t")
    val dir = Paths.get(c.read("t").inputFiles.head.stripPrefix("file:")).getParent
    val before = Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".orc")).toSet
    c.write(rows.limit(2), "t", SaveMode.Append)
    val after = Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".orc")).toSet
    assert(before.subsetOf(after), "additive append must not rewrite existing files")
    assert(after.size > before.size)
    assert(c.count("t") == 5)
  }

  test("append with a new column evolves the schema (union rewrite path)") {
    val c = fresh()
    c.write(rows, "t")
    val ext = StructType(schema.fields :+ StructField("tag", StringType))
    c.write(df(ext, Seq(Row(4L, "d", 3.5, "x"))), "t", SaveMode.Append)
    val out = c.read("t")
    assert(out.count() == 4 && out.columns.contains("tag"))
    assert(out.filter(col("id") === 1L).head().isNullAt(out.columns.indexOf("tag")))
  }

  private def scansIn(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scansIn(a.executedPlan)
    }.flatten

  test("predicate pushdown and column pruning reach the native ORC scan") {
    val c = fresh()
    c.write(rows, "t")
    val q = c.read("t").filter(col("id") > 1L).select("id", "name")
    val scan = scansIn(q.queryExecution.executedPlan).head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(id,1)"),
      scan.metadata("PushedFilters"))
    val readSchema = scan.metadata("ReadSchema")
    assert(readSchema.contains("id") && readSchema.contains("name") &&
      !readSchema.contains("score"), s"score must be pruned: $readSchema")
  }

  test("registry builds an orc connector from config") {
    val dir = tmpDir("graft_orc_reg_")
    val c = graft.plans.ConnectionConfig.build(spark, "orc", Map("dir" -> dir))
    assert(c.isInstanceOf[OrcConnector])
    c.write(rows, "t")
    assert(c.count("t") == 3)
  }
}
