package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlanReportSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("reports pushed filters, pruned columns, exchanges, and broadcast join") {
    val li = graft.sources.ParquetConnector.readTable(spark, s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") > 1000)
    val nation = graft.sources.ParquetConnector.readTable(spark, s"$sf/nation.parquet")
    val df = li.join(broadcast(nation), li("l_suppkey") % 25 === nation("n_nationkey"))
      .groupBy(col("n_name")).agg(sum(col("l_quantity")).as("q"))
    val r = PlanReport.of(df)
    assert(r.scans.exists(_.pushedFilters.contains("GreaterThan(l_orderkey,1000)")), r.scans)
    assert(r.scans.exists(s => s.readSchema.contains("l_quantity") &&
      !s.readSchema.contains("l_comment")), "columns must prune")
    assert(r.joins.exists(_.contains("BroadcastHashJoin")), r.joins)
    assert(r.exchanges >= 1)
    val text = PlanReport.render(df)
    assert(text.contains("pushed:") && text.contains("exchanges:"))
  }

  test("post-execution AQE plan still audits: query stages are descended") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val li = graft.sources.ParquetConnector.readTable(spark, s"$sf/lineitem.parquet")
        .filter(col("l_orderkey") > 10)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      li.collect() // materialize AQE stages
      val r = PlanReport.of(li)
      assert(r.scans.nonEmpty, "scans must be visible through QueryStageExec")
      assert(r.scans.exists(_.pushedFilters.contains("GreaterThan(l_orderkey,10)")), r.scans)
      assert(r.exchanges >= 1, "the aggregate exchange must be counted post-AQE")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("ReusedExchange sites do not inflate the exchange count") {
    val agg = graft.sources.ParquetConnector.readTable(spark, s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    // self-join of the same aggregate: exchange reuse replaces the second
    // identical shuffle with a ReusedExchange pointer
    val both = agg.as("a").join(agg.as("b"), "l_returnflag")
    val plan = both.queryExecution.executedPlan
    val reused = plan.collect {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r }
    assert(reused.nonEmpty, s"plan shape precondition: expected a ReusedExchange\n$plan")
    val real = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    val r = PlanReport.of(both)
    assert(r.exchanges == real.size,
      s"exchanges=${r.exchanges} must count only the ${real.size} real exchange(s), " +
        s"not the ${reused.size} reuse pointer(s)")
  }

  test("flags interpreted projections (HOF lambda) and clean codegen plans") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val clean = docs.select(graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
    assert(PlanReport.of(clean).fullyCodegen,
      PlanReport.of(clean).interpretedProjections.mkString("; "))
    // a higher-order-function lambda is CodegenFallback -> interpreted
    val hof = docs.select(filter(split(col("text"), " "), x => length(x) > 3).as("toks"))
    assert(!PlanReport.of(hof).fullyCodegen, PlanReport.render(hof))
  }

  test("no execution is triggered by the audit") {
    // a query whose execution would throw (division guard removed) still audits
    // ANSI division by a derived zero throws per-row AT EXECUTION (a
    // constant 1/0 would already throw in the analyzer)
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select((col("doc_id") / (col("doc_id") - col("doc_id"))).as("boom"))
    PlanReport.of(docs) // must not raise
    intercept[Exception] { docs.head() } // sanity: executing it DOES throw
  }
}
