package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scale audit of a query's PHYSICAL plan, as a library feature — the
  * checks this engine's own plan-evidence suite runs (filters pushed to
  * the scan, columns pruned, exchanges counted, projections inside
  * whole-stage codegen), packaged so a user can assert them on THEIR
  * pipelines before shipping to a large cluster:
  *
  * {{{
  *   val r = PlanReport.of(df)
  *   assert(r.exchanges <= 2 && r.interpretedProjections.isEmpty)
  *   plan.logger.info(PlanReport.render(df))
  * }}}
  *
  * Everything reads the executed plan Spark already built — no
  * execution is triggered.
  */
object PlanReport {

  /** One file scan's scale-relevant facts. */
  case class ScanInfo(table: String, pushedFilters: String, readSchema: String,
                      partitionFilters: String)

  case class Report(scans: Seq[ScanInfo], exchanges: Int, codegenSpans: Int,
                    joins: Seq[String], interpretedProjections: Seq[String]) {
    /** True when every projection runs inside whole-stage codegen. */
    def fullyCodegen: Boolean = interpretedProjections.isEmpty
  }

  private def descend(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
      // AQE materializes stages behind LEAF wrappers — without descending
      // into them, a post-execution audit would report an empty plan and
      // pass its assertions vacuously
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: descend(q.plan)
      // ReusedExchangeExec POINTS AT an exchange that already appears
      // elsewhere in the tree — descending into it would double-count
      // exchanges and duplicate scan entries
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r)
      case other => Seq(other)
    }.flatten

  /** Projections actually COMPILED INTO a codegen stage: traversal stops
    * at `InputAdapter` — its subtree feeds the stage through the row
    * interface and is NOT part of the generated function, so an
    * interpreted projection hiding under one must not count as
    * codegen'd. */
  private def compiledProjects(p: SparkPlan): Seq[ProjectExec] = p match {
    case _: org.apache.spark.sql.execution.InputAdapter => Seq.empty
    case pr: ProjectExec => pr +: pr.children.flatMap(compiledProjects)
    case other => other.children.flatMap(compiledProjects)
  }

  def of(df: DataFrame): Report = {
    val nodes = descend(df.queryExecution.executedPlan)
    val scans = nodes.collect { case f: FileSourceScanExec =>
      ScanInfo(
        table = f.tableIdentifier.map(_.toString)
          .getOrElse(f.relation.location.rootPaths.headOption.fold("?")(_.getName)),
        pushedFilters = f.metadata.getOrElse("PushedFilters", "[]"),
        readSchema = f.metadata.getOrElse("ReadSchema", ""),
        partitionFilters = f.metadata.getOrElse("PartitionFilters", "[]"))
    }
    // ReusedExchangeExec's nodeName is "ReusedExchange" — it REFERENCES
    // an exchange counted elsewhere in the tree, so counting it would
    // inflate the shuffle count by one per reuse site
    val exchanges = nodes.count(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
    val codegen = nodes.collect { case w: WholeStageCodegenExec => w }
    val codegenProjects = codegen.flatMap(w => compiledProjects(w.child))
    val allProjects = nodes.collect { case p: ProjectExec => p }
    val interpreted = allProjects.filterNot(p => codegenProjects.exists(_ eq p))
      .map(_.projectList.map(_.sql).mkString(", ").take(120))
    val joins = nodes.filter(_.nodeName.contains("Join")).map(_.nodeName).distinct
    Report(scans, exchanges, codegen.size, joins, interpreted)
  }

  /** Human-readable one-screen audit. */
  def render(df: DataFrame): String = {
    val r = of(df)
    val sb = new StringBuilder("plan audit\n")
    r.scans.foreach { s =>
      sb ++= s"  scan ${s.table}\n"
      sb ++= s"    pushed:    ${s.pushedFilters}\n"
      sb ++= s"    partition: ${s.partitionFilters}\n"
      sb ++= s"    columns:   ${s.readSchema}\n"
    }
    sb ++= s"  exchanges: ${r.exchanges}   codegen spans: ${r.codegenSpans}\n"
    if (r.joins.nonEmpty) sb ++= s"  joins: ${r.joins.mkString(", ")}\n"
    if (r.interpretedProjections.nonEmpty) {
      sb ++= "  WARNING interpreted (non-codegen) projections:\n"
      r.interpretedProjections.foreach(p => sb ++= s"    $p\n")
    }
    sb.result()
  }
}
