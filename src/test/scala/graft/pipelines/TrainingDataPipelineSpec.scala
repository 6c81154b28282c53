package graft.pipelines

import graft.SparkSpec
import graft.plans.{Plan, PlanConfig}
import org.apache.spark.sql.functions._

/** The composed pipeline: every stage is an operator already unit-tested
  * elsewhere — this spec pins that they COMPOSE: tables appear, the
  * funnel is monotone, dedup actually removes the synthetic dups, and
  * step selection reruns a single stage. */
class TrainingDataPipelineSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  test("end-to-end: profile -> filter -> dedup -> report on the documents table") {
    val work = tmpDir("graft_pipe_work_")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_")))
    TrainingDataPipeline.build(plan, src, work, minQuality = 0.2)
    plan.run()
    val f = TrainingDataPipeline.funnel(plan, src, work)
    assert(f.ingested > 0)
    assert(f.profiled == f.ingested, "profile is a 1:1 map")
    assert(f.kept <= f.profiled)
    assert(f.kept > 0, "quality/lang filter must keep something at threshold 0.2")
    assert(f.exactUnique <= f.kept)
    assert(f.nearUnique <= f.exactUnique)
    // the report rendered through the plan logger
    assert(plan.logger.messages.exists(_.contains("training-data funnel")))
    assert(plan.logger.messages.exists(_.contains(s"near-unique:   ${f.nearUnique}")))
  }

  test("near-dup stage drops a planted mutation; step selection reruns one stage") {
    val work = tmpDir("graft_pipe_work2_")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid2_")))
    TrainingDataPipeline.build(plan, src, work, minQuality = 0.0)
    plan.run(Seq("profile", "filter"))
    // plant a near-duplicate of a kept doc directly into docs_clean
    val workConn = new graft.sources.ParquetConnector(spark, work)
    val clean = workConn.read("docs_clean")
    val planted = clean.orderBy(col("doc_id")).limit(1)
      .select((col("doc_id") + 5000000).as("doc_id"),
        concat(col("text"), lit(" tiny suffix")).as("text"))
    workConn.write(clean.unionByName(planted, allowMissingColumns = true), "docs_clean")
    val before = workConn.count("docs_clean")
    plan.run(Seq("dedup")) // selected-step rerun, same plan instance? steps run once —
    val f = TrainingDataPipeline.funnel(plan, src, work)
    assert(before == f.kept)
    assert(f.nearUnique < before, "planted near-dup must be removed")
  }
}
