package graft.plans

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession
import graft.sources._
import scala.jdk.CollectionConverters._

/** O2 config-driven connector registry — the Spark re-expression of the
  * reference's `connect!` (taskrabbit/forklift `lib/forklift/plan.rb:24-44`):
  * scan `config/connections/<type>/<name>.yml`, render, construct the
  * transport named by the directory, register under the file name.
  *
  * The reference ERB-renders configs (`base/utils.rb:8-10`) so secrets
  * come from the environment; the analog here is `${VAR}` environment
  * substitution. The YAML subset is flat `key: value` lines (exactly the
  * shape the reference's connection files use) — no external parser
  * needed, nothing clever accepted.
  *
  * Construction is an explicit match on the type name, not eval — same
  * extension point (drop a new type into [[build]]), none of the
  * arbitrary-code-execution surface. */
object ConnectionConfig {

  /** Parse a flat `key: value` config file with `${VAR}` env substitution
    * and `#` comments. */
  def parse(text: String, env: Map[String, String] = sys.env): Map[String, String] =
    text.split("\n").toSeq
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        val k = l.substring(0, i).trim
        val v0 = l.substring(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
        val v = "\\$\\{([A-Za-z0-9_]+)\\}".r.replaceAllIn(v0,
          m => java.util.regex.Matcher.quoteReplacement(env.getOrElse(m.group(1), "")))
        k -> v
      }.toMap

  /** Construct a connector from (type, config). A `class:` key names a
    * user [[graft.sources.ConnectorFactory]] (object or zero-arg class) —
    * the reference's auto-required user transports (`lib/forklift.rb:15-16`,
    * README "Creating your own transport") as explicit reflection: the
    * config file itself declares the implementation, the directory name
    * is just the registry grouping. */
  def build(spark: SparkSession, kind: String, cfg: Map[String, String]): Connector =
    cfg.get("class") match {
      case Some(cn) =>
        graft.Reflect.instantiate[ConnectorFactory](cn).build(spark, cfg - "class")
      case None => buildBuiltin(spark, kind, cfg)
    }

  private def buildBuiltin(spark: SparkSession, kind: String, cfg: Map[String, String]): Connector = kind match {
    case "parquet" => new ParquetConnector(spark, cfg("dir"))
    case "parquet_partitioned" =>
      new PartitionedParquetConnector(spark, cfg("dir"), cfg.getOrElse("matcher", "updated_at"),
        // `bloom_index_min_bytes` is the r4 name of the knob, kept as a
        // fallback so existing connection files keep working
        pkIndexMinBytes = cfg.get("pk_index_min_bytes")
          .orElse(cfg.get("bloom_index_min_bytes")).getOrElse((1L << 30).toString).toLong)
    case "csv" => new CsvConnector(spark, cfg("dir"))
    case "orc" => new OrcConnector(spark, cfg("dir"))
    case "jsonl" => new JsonlConnector(spark, cfg("dir"))
    case "jsondoc" => new JsonDocConnector(spark, cfg("dir"))
    case "jdbc" => new JdbcConnector(spark, cfg("url"),
      options = cfg -- Seq("url", "partition_column", "num_partitions", "batch_size"),
      partitionColumn = cfg.get("partition_column"),
      numPartitions = cfg.getOrElse("num_partitions", "8").toInt,
      batchSize = cfg.getOrElse("batch_size", "1000").toInt)
    case other => throw new IllegalArgumentException(s"unknown connection type: $other")
  }

  /** Scan `<configDir>/connections/<type>/<name>.yml` and register every
    * connector on the plan (`plan.rb:24-44`). A failing connection is
    * logged and skipped — the reference defers the failure to the step
    * that uses it (`plan.rb:37-42`). */
  def connectAll(plan: Plan, configDir: String): Plan = {
    val root = Paths.get(configDir, "connections")
    if (!Files.isDirectory(root)) return plan
    Files.list(root).iterator().asScala.filter(Files.isDirectory(_)).toSeq.sortBy(_.toString)
      .foreach { typeDir =>
        val kind = typeDir.getFileName.toString
        Files.list(typeDir).iterator().asScala
          .filter(p => p.toString.endsWith(".yml") || p.toString.endsWith(".yaml"))
          .toSeq.sortBy(_.toString)
          .foreach { f =>
            val name = f.getFileName.toString.replaceAll("\\.ya?ml$", "")
            try plan.connection(name, build(plan.spark, kind, parse(Files.readString(f))))
            catch { case e: Exception =>
              plan.logger.fatal(s"connection $name ($kind) failed to build: ${e.getMessage}")
            }
          }
      }
    plan
  }
}
