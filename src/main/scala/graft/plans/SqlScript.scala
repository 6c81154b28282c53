package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** T1+T3 transformation execution — Spark re-expression of the reference's
  * transformation dispatch (taskrabbit/forklift `lib/forklift/base/
  * connection.rb:35-58`) and SQL script runner (`transports/mysql.rb:
  * 234-249`): a `;`-splitter with `DELIMITER` redefinition support, each
  * statement executed in order ("SQL transformations are done exactly as
  * they are written", reference README).
  *
  * Spark SQL executes one statement per call, so the splitter is the same
  * load-bearing piece it is in the reference.
  */
object SqlScript {

  /** Split a SQL script on the active delimiter, honoring `DELIMITER x`
    * redefinitions (`mysql.rb:236-247`). Comment/string awareness is
    * intentionally at reference parity: line-level `DELIMITER` only. */
  def split(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var delimiter = ";"
    var buf = new StringBuilder
    script.split("\n", -1).foreach { line =>
      val t = line.trim
      if (t.toUpperCase.startsWith("DELIMITER ")) {
        if (buf.toString.trim.nonEmpty) { out += buf.toString.trim; buf = new StringBuilder }
        delimiter = t.substring("DELIMITER ".length).trim
      } else {
        var rest = line
        var idx = rest.indexOf(delimiter)
        while (idx >= 0) {
          buf.append(rest.substring(0, idx))
          if (buf.toString.trim.nonEmpty) out += buf.toString.trim
          buf = new StringBuilder
          rest = rest.substring(idx + delimiter.length)
          idx = rest.indexOf(delimiter)
        }
        buf.append(rest).append("\n")
      }
    }
    if (buf.toString.trim.nonEmpty) out += buf.toString.trim
    out.result()
  }

  /** `exec!`: run every statement, raise on failure. Returns the result of
    * the last statement (Spark SQL returns a DataFrame per statement). */
  def execBang(spark: SparkSession, script: String): Option[DataFrame] = {
    var last: Option[DataFrame] = None
    split(script).foreach { stmt => last = Some(spark.sql(stmt)) }
    last
  }

  /** `exec`: like execBang but errors are logged-and-swallowed
    * (`base/connection.rb:35-41`). */
  def exec(spark: SparkSession, script: String, logger: PlanLogger): Option[DataFrame] =
    try execBang(spark, script)
    catch { case e: Exception => logger.fatal(s"transformation failed: ${e.getMessage}"); None }

  /** Run a `.sql` file through [[exec]]/[[execBang]] — extension dispatch
    * parity (`base/connection.rb:43-51`). Scala [[Transformation]] objects
    * are the `exec_ruby` analog. */
  def execFile(spark: SparkSession, path: String, raiseOnError: Boolean, logger: PlanLogger): Option[DataFrame] = {
    val script = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    if (raiseOnError) execBang(spark, script) else exec(spark, script, logger)
  }
}

/** T2 user-code transformation — the `exec_ruby` analog
  * (`base/connection.rb:53-58`): arbitrary user logic invoked with the
  * session, a connector, and args. Implementations use DataFrame ops (the
  * reference's examples do driver-side Ruby; ours stay distributed). */
trait Transformation {
  def apply(spark: SparkSession, conn: graft.sources.Connector, args: Map[String, Any]): Unit
}
