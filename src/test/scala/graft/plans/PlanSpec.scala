package graft.plans

import graft.SparkSpec

/** Orchestration parity: steps/selection/error handlers
  * (`plan.rb:54-141`; reference unit specs `spec/unit/misc/step_spec.rb`,
  * `error_spec.rb`). */
class PlanSpec extends SparkSpec {

  private def freshPlan(): Plan =
    new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_")))

  test("plan.eachBatch batches at the configured batch_size (plan.rb:148)") {
    val p = new Plan(spark, PlanConfig(batchSize = 3, pidDir = tmpDir("graft_pid_")))
    val sizes = scala.collection.mutable.ArrayBuffer[Int]()
    p.eachBatch(usersDf.limit(5).unionByName(usersDf.limit(2)))(b => sizes += b.size)
    assert(sizes.toSeq == Seq(3, 3, 1))
  }

  test("steps run in registration order") {
    val p = freshPlan()
    val order = scala.collection.mutable.ArrayBuffer[String]()
    p.step("a") { order += "a" }
    p.step("b") { order += "b" }
    p.step("c") { order += "c" }
    p.run()
    assert(order.toSeq == Seq("a", "b", "c"))
  }

  test("duplicate step names raise (plan.rb:60-62)") {
    val p = freshPlan()
    p.step("a") { () }
    intercept[IllegalArgumentException] { p.step("a") { () } }
  }

  test("selection runs only named steps; unknown step name raises (plan.rb:96-117)") {
    val p = freshPlan()
    val order = scala.collection.mutable.ArrayBuffer[String]()
    p.step("a") { order += "a" }
    p.step("b") { order += "b" }
    p.run(Seq("b"))
    assert(order.toSeq == Seq("b"))
    intercept[IllegalArgumentException] { freshPlan().run(Seq("nope")) }
  }

  test("default error handler re-raises (plan.rb:54-56)") {
    val p = freshPlan()
    p.step("boom") { throw new RuntimeException("bad") }
    val e = intercept[RuntimeException] { p.run() }
    assert(e.getMessage == "bad")
  }

  test("custom error handler rescues the step and later steps still run") {
    val p = freshPlan()
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    p.step("boom", onError = (name, e) => seen += s"$name:${e.getMessage}") {
      throw new RuntimeException("bad")
    }
    p.step("after") { seen += "after" }
    p.run()
    assert(seen.toSeq == Seq("boom:bad", "after"))
  }

  test("connector registry: register and resolve by name (connect! analog)") {
    val p = freshPlan()
    val c = new graft.sources.ParquetConnector(spark, tmpDir("graft_conn_"))
    p.connection("warehouse", c)
    assert(p.connectionFor("warehouse") eq c)
  }

  test("logger buffers messages for reporting (base/logger.rb)") {
    val lg = new PlanLogger(false)
    lg.info("hello")
    lg.emphatically("big")
    lg.debug("hidden") // debug disabled
    assert(lg.messages.toSeq == Seq("hello", "*** big ***"))
  }
}
