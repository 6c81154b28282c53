package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.plans.{ConnectionConfig, Plan, PlanConfig}

/** O5/O10 CLI launcher — the `bin/forklift` analog:
  *
  *   graft --generate <dir>                  scaffold a project
  *   graft run <planClass> [--config dir] [--pid-dir dir] [step ...]
  *
  * `--generate` lays out the project template (`bin/forklift:12-32`);
  * `run` loads the plan (a [[PlanSpec]] implementation on the classpath —
  * the compiled analog of `require plan.rb`, `bin/forklift:41-55`),
  * builds the connector registry from the config dir, registers steps,
  * and runs all or only the ARGV-named subset (`plan.rb:96-117`). */
object Main {

  /** The user-authored plan: the reference's plan.rb is a Ruby script
    * registering steps against a live plan object; here it is a class
    * (or Scala object) implementing this trait, named on the CLI. */
  trait PlanSpec { def build(plan: Plan): Unit }

  def main(args: Array[String]): Unit = args.toList match {
    case "--generate" :: dir :: Nil => generate(dir)
    case "run" :: rest => run(rest)
    case _ =>
      System.err.println(
        """usage: graft --generate <dir>
          |       graft run <planClass> [--config <dir>] [--pid-dir <dir>] [step ...]""".stripMargin)
      sys.exit(1)
  }

  private def run(rest: List[String]): Unit = {
    var planClass: Option[String] = None
    var configDir = "config"
    var pidDir: Option[String] = None
    val steps = scala.collection.mutable.ArrayBuffer[String]()
    var i = rest
    while (i.nonEmpty) i = i match {
      case "--config" :: v :: t => configDir = v; t
      case "--pid-dir" :: v :: t => pidDir = Some(v); t
      case v :: t =>
        if (planClass.isEmpty) planClass = Some(v) else steps += v
        t
      case Nil => Nil
    }
    val cls = planClass.getOrElse { System.err.println("missing plan class"); sys.exit(1) }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-$cls")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val cfg = pidDir.fold(PlanConfig())(d => PlanConfig(pidDir = d))
      val plan = new Plan(spark, cfg)
      ConnectionConfig.connectAll(plan, configDir)
      loadSpec(cls).build(plan)
      plan.run(steps.toSeq)
    } finally spark.stop()
  }

  def loadSpec(className: String): PlanSpec =
    Reflect.instantiate[PlanSpec](className)

  /** `--generate`: project scaffold (`bin/forklift:12-32`). */
  def generate(dir: String): Unit = {
    Seq("config/connections/parquet", "transformations", "plans", "log").foreach { d =>
      Files.createDirectories(Paths.get(dir, d))
    }
    write(s"$dir/config/connections/parquet/warehouse.yml",
      """# graft connection config — flat key: value, ${VAR} env substitution
        |dir: ./data/warehouse
        |""".stripMargin)
    write(s"$dir/transformations/cleanup.sql",
      """-- statements run in order; DELIMITER redefinition supported
        |-- UPDATE-style transforms are expressed as CREATE OR REPLACE views
        |SELECT 1;
        |""".stripMargin)
    write(s"$dir/plans/ExamplePlan.scala",
      """import graft.Main.PlanSpec
        |import graft.plans.Plan
        |import graft.operators.Patterns
        |
        |/** Compile onto the classpath, then: graft run ExamplePlan */
        |object ExamplePlan extends PlanSpec {
        |  override def build(plan: Plan): Unit = {
        |    plan.step("sync") {
        |      val wh = plan.connectionFor("warehouse")
        |      Patterns.optimisticPipe(wh, "events_raw", wh, "events")
        |    }
        |  }
        |}
        |""".stripMargin)
    println(s"generated graft project at $dir")
  }

  private def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Files.writeString(p, content)
  }
}
