package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round evidence dump: writes `.explain("formatted")` for
  * the named queries (or every declared query) to `<outDir>/<name>_<tag>.txt`
  * so plan claims in OPTIMIZATION_r{N}.md are checkable without running
  * Spark. Usage:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <tag> [queryName...]"
  *
  * The dump is side-effect-light: queries that build temp workspaces as
  * part of their plan (tick-shaped entries) still run their setup when
  * the plan is forced — the explain is taken on the FINAL DataFrame, the
  * same object the bench times, so the committed plan is the timed plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.PlanDump <sfDir> <outDir> <tag> [queryName...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir, tag) = args.take(3)
    val only = args.drop(3).toSet
    val unknown = only -- SparkEntry.queries.keySet
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // a failed dump must fail the RUN (ADVICE r19): a broken evidence
    // pass that exits 0 can silently commit an empty/stale plans dir
    var nFailed = 0
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
          System.err.println(s"[plandump] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          nFailed += 1
        }
      }
    spark.stop()
    if (nFailed > 0) {
      System.err.println(s"[plandump] $nFailed queries failed to dump")
      sys.exit(1)
    }
  }
}
