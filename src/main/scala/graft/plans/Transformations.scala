package graft.plans

import org.apache.spark.sql.SparkSession
import graft.sources.Connector

/** T2 user-transformation dispatch — the `exec_ruby` analog
  * (taskrabbit/forklift `base/connection.rb:43-58` + class-name
  * derivation `base/utils.rb:12-19`): `.sql` files run through the
  * statement splitter; anything else is treated as a class name (or a
  * `.scala` file whose basename CamelCases to a class on the classpath,
  * the reference's file→class convention) that implements
  * [[Transformation]] and is invoked with (session, connector, args). */
object Transformations {

  /** `email_suffix.scala` → `EmailSuffix` (utils.rb:12-19). */
  def classNameFor(file: String): String = {
    val base = file.split("[/\\\\]").last.replaceAll("\\.[A-Za-z]+$", "")
    base.split("[_\\-]").filter(_.nonEmpty).map(s => s.head.toUpper + s.tail).mkString
  }

  /** Instantiate a [[Transformation]] by fully-qualified class name
    * (Scala object or zero-arg class). */
  def load(className: String): Transformation =
    graft.Reflect.instantiate[Transformation](className)

  /** `exec!`: dispatch by extension — `.sql` → script runner, otherwise a
    * transformation class; errors raise. */
  def execBang(spark: SparkSession, conn: Connector, spec: String,
               args: Map[String, Any] = Map.empty, logger: PlanLogger = new PlanLogger(false)): Unit =
    if (spec.endsWith(".sql"))
      SqlScript.execFile(spark, spec, raiseOnError = true, logger)
    else {
      val name = if (spec.contains(".") && !spec.endsWith(".scala")) spec else classNameFor(spec)
      load(name)(spark, conn, args)
    }

  /** `exec`: like [[execBang]] but errors are logged and swallowed
    * (`base/connection.rb:35-41`). */
  def exec(spark: SparkSession, conn: Connector, spec: String,
           args: Map[String, Any] = Map.empty, logger: PlanLogger = new PlanLogger(false)): Unit =
    try execBang(spark, conn, spec, args, logger)
    catch { case e: Exception => logger.fatal(s"transformation $spec failed: ${e.getMessage}") }
}
