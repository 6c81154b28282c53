package graft.plans

import org.apache.spark.sql.SparkSession
import graft.sources.Connector

/** Plan/step orchestration — Spark re-expression of
  * taskrabbit/forklift `lib/forklift/plan.rb`.
  *
  * A plan is a named sequence of steps (closures) with per-step error
  * handlers, run-all or selected-by-name, guarded by a pid lock
  * (`plan.rb:119-141` `do!`; `:58-68` `step`; `:96-117` `activate_steps`).
  */
class Plan(val spark: SparkSession, val config: PlanConfig = PlanConfig()) {
  private case class StepDef(name: String, handler: (String, Throwable) => Unit, body: () => Unit)
  private val steps = scala.collection.mutable.LinkedHashMap[String, StepDef]()
  private val connectors = scala.collection.mutable.LinkedHashMap[String, Connector]()
  private val ran = scala.collection.mutable.Set[String]()
  val logger = new PlanLogger(config.logDebug)

  /** default error handler re-raises (`plan.rb:54-56`). */
  private val defaultHandler: (String, Throwable) => Unit = (_, e) => throw e

  /** Register a connector by name — the YAML-dir `connect!` analog
    * (`plan.rb:24-44`), explicit rather than eval-reflective. */
  def connection(name: String, c: Connector): Plan = { connectors(name) = c; this }
  def connectionFor(name: String): Connector = connectors(name)

  /** Batch-callback loop at the plan's configured `batch_size` — the
    * reference threads `config[:batch_size]` into every transport's read
    * loop (`plan.rb:148`); here the connectors are lazy DataFrames, so
    * the plan-level batch size applies at the one place batches exist. */
  def eachBatch(df: org.apache.spark.sql.DataFrame)(f: Seq[org.apache.spark.sql.Row] => Unit): Unit =
    Connector.eachBatch(df, config.batchSize)(f)

  /** O3 `step` (`plan.rb:58-68`): register a named block with an optional
    * error handler. Duplicate names raise, as in the reference (`:60-62`). */
  def step(name: String, onError: (String, Throwable) => Unit = defaultHandler)(body: => Unit): Plan = {
    require(!steps.contains(name), s"duplicate step name: $name")
    steps(name) = StepDef(name, onError, () => body)
    this
  }

  /** O4 `do_step!` (`plan.rb:70-90`): skip-if-ran; rescue → handler. */
  private def doStep(s: StepDef): Unit = {
    if (ran.contains(s.name)) return
    logger.emphatically(s"running step ${s.name}")
    // label every job the step submits so a profiling run's UI/event
    // timeline maps back to plan steps (optimization guide §1.5), and
    // log the wall time so per-step cost is readable straight from the
    // plan log — observability only, no behavioral change. The PREVIOUS
    // description is restored (not nulled) so a step body that triggers
    // a dependent doStep does not strip the outer step's label from its
    // remaining jobs (ADVICE r19).
    val prevDesc = spark.sparkContext.getLocalProperty("spark.job.description")
    spark.sparkContext.setJobDescription(s"step ${s.name}")
    val t0 = System.nanoTime()
    try { s.body(); ran += s.name }
    catch { case e: Throwable => s.handler(s.name, e) }
    finally {
      spark.sparkContext.setJobDescription(prevDesc)
      logger.info(f"step ${s.name} took ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
  }

  /** O5+O6 `activate_steps` + `do!` (`plan.rb:96-141`): pid lock →
    * run all steps, or only the named subset (unknown name → error). */
  def run(selected: Seq[String] = Seq.empty): Unit = {
    val unknown = selected.filterNot(steps.contains)
    require(unknown.isEmpty, s"unknown step(s): ${unknown.mkString(", ")}")
    val active = if (selected.isEmpty) steps.values.toSeq
                 else steps.values.filter(s => selected.contains(s.name)).toSeq
    PidLock.withLock(config.pidDir) {
      logger.emphatically("plan start")
      active.foreach(doStep)
      logger.emphatically("plan complete")
    }
  }
}

/** O1 config defaults (`plan.rb:145-155`): `batch_size: 1000`,
  * `char_bytecode_max: 65535`. batchSize feeds `Connector.eachBatch` and
  * JDBC fetch sizing; charBytecodeMax feeds the UTF-8 sanitizer. */
case class PlanConfig(
  batchSize: Int = 1000,
  charBytecodeMax: Int = 65535,
  pidDir: String = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_pid",
  logDebug: Boolean = false)

/** O8 logger (`base/logger.rb:15-46`): stdout echo + in-memory buffer
  * (the reference attaches the buffer to report emails). */
class PlanLogger(debugEnabled: Boolean) {
  val messages = scala.collection.mutable.ArrayBuffer[String]()
  private def log(s: String): Unit = { messages += s; println(s"[graft] $s") }
  def debug(s: String): Unit = if (debugEnabled) log(s)
  def info(s: String): Unit = log(s)
  def emphatically(s: String): Unit = log("*** " + s + " ***")
  def fatal(s: String): Unit = log("FATAL " + s)
}
