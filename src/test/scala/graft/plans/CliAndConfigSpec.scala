package graft.plans

import graft.{Main, SparkSpec}
import graft.sources.{Connector, ParquetConnector}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** A real PlanSpec on the classpath, loadable by name — the compiled
  * analog of the reference's plan.rb (`bin/forklift:41-55`). */
object TestCliPlan extends Main.PlanSpec {
  var ran: List[String] = Nil
  override def build(plan: Plan): Unit = {
    plan.step("extract") { ran = ran :+ "extract" }
    plan.step("load") { ran = ran :+ "load" }
  }
}

/** A user connector factory loadable from a `class:` config line (O11). */
object SpecUserConnectorFactory extends graft.sources.ConnectorFactory {
  var lastCfg: Map[String, String] = Map.empty
  override def build(spark: SparkSession, cfg: Map[String, String]): Connector = {
    lastCfg = cfg
    new ParquetConnector(spark, cfg("dir"))
  }
}

/** A loadable Transformation (T2 class-name dispatch target). */
object SpecUserTransformation extends Transformation {
  var calls: Int = 0
  override def apply(spark: SparkSession, conn: Connector, args: Map[String, Any]): Unit = {
    calls += 1
    require(args.get("table").contains("users"))
  }
}

class CliAndConfigSpec extends SparkSpec {

  test("config parse: flat yaml subset, comments, env substitution (O2)") {
    val cfg = ConnectionConfig.parse(
      """# warehouse
        |dir: /data/wh   # inline comment
        |url: "jdbc:x://${GRAFT_TEST_HOST}/db"
        |num_partitions: 4
        |""".stripMargin, env = Map("GRAFT_TEST_HOST" -> "h1"))
    assert(cfg == Map("dir" -> "/data/wh", "url" -> "jdbc:x://h1/db", "num_partitions" -> "4"))
  }

  test("connectAll scans config/connections/<type>/<name>.yml and registers (plan.rb:24-44)") {
    val root = tmpDir("graft_cfg_")
    val whDir = tmpDir("graft_cfg_wh_")
    Files.createDirectories(Paths.get(root, "connections/parquet"))
    Files.writeString(Paths.get(root, "connections/parquet/warehouse.yml"), s"dir: $whDir\n")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_")))
    ConnectionConfig.connectAll(plan, root)
    assert(plan.connectionFor("warehouse").isInstanceOf[ParquetConnector])
  }

  test("connectAll: a broken connection config is logged, not fatal (plan.rb:37-42)") {
    val root = tmpDir("graft_cfg_bad_")
    Files.createDirectories(Paths.get(root, "connections/jdbc"))
    Files.writeString(Paths.get(root, "connections/jdbc/broken.yml"), "nope: x\n")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_")))
    ConnectionConfig.connectAll(plan, root) // must not throw
    assert(plan.logger.messages.exists(_.contains("broken")))
  }

  test("config-driven USER connector: `class:` names a ConnectorFactory (O11, forklift.rb:15-16)") {
    val root = tmpDir("graft_cfg_user_")
    val store = tmpDir("graft_cfg_store_")
    Files.createDirectories(Paths.get(root, "connections/custom"))
    Files.writeString(Paths.get(root, "connections/custom/mystore.yml"),
      s"""class: graft.plans.SpecUserConnectorFactory
         |dir: $store
         |region: eu
         |""".stripMargin)
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_")))
    ConnectionConfig.connectAll(plan, root)
    assert(plan.connectionFor("mystore").isInstanceOf[ParquetConnector])
    // remaining config keys (minus class:) reach the factory
    assert(SpecUserConnectorFactory.lastCfg == Map("dir" -> store, "region" -> "eu"))
  }

  test("ConnectionConfig.build constructs every connector type") {
    val d = tmpDir("graft_build_")
    assert(ConnectionConfig.build(spark, "parquet", Map("dir" -> d)).isInstanceOf[ParquetConnector])
    assert(ConnectionConfig.build(spark, "csv", Map("dir" -> d)).isInstanceOf[graft.sources.CsvConnector])
    assert(ConnectionConfig.build(spark, "jsonl", Map("dir" -> d)).isInstanceOf[graft.sources.JsonlConnector])
    assert(ConnectionConfig.build(spark, "jsondoc", Map("dir" -> d)).isInstanceOf[graft.sources.JsonDocConnector])
    assert(ConnectionConfig.build(spark, "parquet_partitioned", Map("dir" -> d))
      .isInstanceOf[graft.sources.PartitionedParquetConnector])
    assert(ConnectionConfig.build(spark, "jdbc",
      Map("url" -> "jdbc:derby:memory:graft_cfg;create=true"))
      .isInstanceOf[graft.sources.JdbcConnector])
    intercept[IllegalArgumentException] { ConnectionConfig.build(spark, "webscale", Map.empty) }
  }

  test("plan spec loads by class name and steps run / filter by selection (O5)") {
    TestCliPlan.ran = Nil
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_")))
    Main.loadSpec("graft.plans.TestCliPlan").build(plan)
    plan.run(Seq("load"))
    assert(TestCliPlan.ran == List("load"))
  }

  test("--generate scaffolds the project template (O10, bin/forklift:12-32)") {
    val dir = tmpDir("graft_gen_")
    Main.generate(dir)
    assert(Files.exists(Paths.get(dir, "config/connections/parquet/warehouse.yml")))
    assert(Files.exists(Paths.get(dir, "transformations/cleanup.sql")))
    assert(Files.exists(Paths.get(dir, "plans/ExamplePlan.scala")))
    // generate is idempotent — re-run must not clobber user edits
    Files.writeString(Paths.get(dir, "transformations/cleanup.sql"), "edited")
    Main.generate(dir)
    assert(Files.readString(Paths.get(dir, "transformations/cleanup.sql")) == "edited")
  }

  test("transformation dispatch: class-name derivation + invocation (T2, base/utils.rb:12-19)") {
    assert(Transformations.classNameFor("email_suffix.scala") == "EmailSuffix")
    assert(Transformations.classNameFor("transformations/spec_user_transformation.scala")
      == "SpecUserTransformation")
    val conn = new ParquetConnector(spark, tmpDir("graft_tx_"))
    SpecUserTransformation.calls = 0
    Transformations.execBang(spark, conn, "graft.plans.SpecUserTransformation",
      Map("table" -> "users"))
    assert(SpecUserTransformation.calls == 1)
  }

  test("transformation exec swallows and logs; execBang raises (T1)") {
    val conn = new ParquetConnector(spark, tmpDir("graft_tx2_"))
    val logger = new PlanLogger(false)
    intercept[Exception] {
      Transformations.execBang(spark, conn, "graft.plans.NoSuchClass", Map.empty, logger)
    }
    Transformations.exec(spark, conn, "graft.plans.NoSuchClass", Map.empty, logger)
    assert(logger.messages.exists(_.contains("failed")))
  }

  test("reporter renders {{var}} templates and delivers with log attachment (O9)") {
    val out = tmpDir("graft_report_")
    val logger = new PlanLogger(false)
    logger.info("step one ok")
    val body = Reporter.render("moved {{rows}} rows into {{table}}",
      Map("rows" -> 42, "table" -> "users"))
    assert(body == "moved 42 rows into users")
    Reporter.send(new Reporter.FileSink(out), "nightly run", "done: {{rows}}",
      Map("rows" -> 7), Some(logger))
    val files = Files.list(Paths.get(out)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .map(_.getFileName.toString).toSeq
    assert(names.exists(_.endsWith(".txt")) && names.exists(_.endsWith(".log")))
  }
}
