package graft.pipelines

import graft.SparkSpec
import graft.plans.{Plan, PlanConfig}
import org.apache.spark.sql.functions._

/** The flagship release journey END-TO-END (VERDICT r14 #5): funnel →
  * candidate → snapshot_diff → gate → promote → stream re-baseline,
  * run three times over one workDir — a clean release that promotes, a
  * regressed extraction the gate REFUSES (live release and stream
  * baseline untouched), and a report-only run that promotes with the
  * drift on record. The always-on ksDriftStream leg ticks the refused
  * candidate against the accepted baseline and flags it. */
class ReleasePipelineSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  test("release 1 promotes; a regressed release 2 is refused with the live " +
    "baseline untouched; ksDriftStream flags the refused candidate; " +
    "report-only release 3 promotes with drift on record") {
    val work = tmpDir("graft_release_work_")
    val workConn = new graft.sources.ParquetConnector(spark, work)

    // ---- release 1: the clean corpus. First run self-diffs -> quiet
    // gate -> promoted, and the stream baseline is persisted.
    val plan1 = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_release_pid1_")))
    ReleasePipeline.build(plan1, src, work, minQuality = 0.2,
      histValueCol = "n_chars")
    plan1.run()
    val gate1 = workConn.read("release_gate").head()
    assert(gate1.getBoolean(0) && gate1.getLong(1) == 0L, gate1.toString)
    assert(Seq("release_current", "release_previous", "release_hist")
      .forall(workConn.tables.contains))
    val hist1 = workConn.read("release_hist").collect().toSet
    val live1 = workConn.count("release_current")
    assert(live1 > 0)

    // ---- release 2: a REGRESSED extraction (truncated documents). The
    // gate writes its verdict, refuses promotion, and both the live
    // release and the stream baseline stay untouched.
    val src2 = tmpDir("graft_release_src2_")
    new graft.sources.ParquetConnector(spark, src2).write(
      new graft.sources.ParquetConnector(spark, src).read("documents")
        .withColumn("text", substring(col("text"), 1, 80))
        .withColumn("n_chars", length(col("text")).cast("long")), "documents")
    val plan2 = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_release_pid2_")))
    ReleasePipeline.build(plan2, src2, work, minQuality = 0.2,
      histValueCol = "n_chars")
    intercept[ReleasePipeline.DriftGateException](plan2.run())
    val gate2 = workConn.read("release_gate").head()
    assert(!gate2.getBoolean(0) && gate2.getLong(1) > 0L, gate2.toString)
    assert(gate2.getString(2).contains("n_chars"), gate2.toString)
    assert(workConn.read("release_hist").collect().toSet == hist1,
      "a refused candidate must not replace the stream baseline")
    assert(workConn.count("release_current") == live1,
      "a refused candidate must not replace the live release")
    assert(workConn.tables.contains("release_candidate"),
      "the refused candidate stays on disk for forensics")
    // the gate unions the KS and PSI verdicts per feature
    val flagged = (workConn.read("drift_ks").filter(col("drifted"))
        .select("feature").collect().map(_.getString(0)) ++
      workConn.read("drift_psi").filter(col("drifted"))
        .select("feature").collect().map(_.getString(0))).distinct
    assert(flagged.length == gate2.getLong(1), s"$flagged vs $gate2")

    // ---- the always-on leg: ksDriftStream ticks the refused
    // candidate's profile against the ACCEPTED baseline.
    val streamSrc = tmpDir("graft_release_stream_")
    workConn.read("release_candidate")
      .select(col("lang_pred"), col("n_chars"))
      .write.mode("overwrite").parquet(streamSrc)
    val schema = spark.read.parquet(streamSrc).schema
    graft.streaming.IncrementalStream.ksDriftStream(
      spark.readStream.schema(schema).parquet(streamSrc),
      workConn, "stream_drift", "release_hist", "lang_pred", "n_chars",
      checkpoint = tmpDir("graft_release_ck_"))
    val verdicts = workConn.read("stream_drift").collect()
    assert(verdicts.nonEmpty, "the tick must land per-group verdicts")
    assert(verdicts.exists(_.getBoolean(5)),
      s"truncated docs must drift at least one language: ${verdicts.mkString(";")}")

    // ---- release 3, report-only: the journey completes, the verdict
    // records the drift, and the ACCEPTED release re-baselines.
    val plan3 = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_release_pid3_")))
    ReleasePipeline.build(plan3, src2, work, minQuality = 0.2,
      histValueCol = "n_chars", failOnDrift = false)
    plan3.run()
    val gate3 = workConn.read("release_gate").head()
    assert(!gate3.getBoolean(0) && gate3.getLong(1) > 0L, gate3.toString)
    assert(workConn.read("release_hist").collect().toSet != hist1,
      "an accepted release re-baselines the stream")
  }
}
