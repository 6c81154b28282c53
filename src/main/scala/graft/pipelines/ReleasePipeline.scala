package graft.pipelines

import org.apache.spark.sql.functions._
import graft.plans.Plan
import graft.sources.ParquetConnector

/** The FLAGSHIP release journey (VERDICT r14 #5) — the full loop a
  * corpus team runs every release, wired end-to-end so the drift gate
  * is exercised as a journey, not just unit-green:
  *
  *   curation funnel ([[TrainingDataPipeline.build]]) →
  *   `publish_candidate` (write `docs_mixed` as `release_candidate` —
  *   never directly as the live release) →
  *   `snapshot_diff` ([[TrainingDataPipeline.snapshotDiff]]: KS
  *   marginals + unigram JS between the LIVE release and the
  *   candidate) →
  *   `release_gate` (write the `release_gate` verdict row; when
  *   `failOnDrift`, REFUSE a drifted candidate — the plan stops, the
  *   live release and the stream baseline stay untouched, and the
  *   candidate stays on disk for forensics) →
  *   `promote_release` (archive the live release as
  *   `release_previous`, atomic-rename the candidate live) →
  *   `baseline_hist` (persist the per-group quantized histogram of the
  *   PROMOTED release — the reference artifact
  *   [[graft.streaming.IncrementalStream.ksDriftStream]] tests every
  *   arriving micro-batch against, so the batch gate and the always-on
  *   stream share one baseline).
  *
  * The FIRST release has nothing to diff against, so
  * `publish_candidate` seeds the live release with the candidate
  * itself — the self-diff is all-quiet and the gate passes trivially;
  * every later run diffs candidate N against live N−1 for real. All
  * gate inputs are NDV/vocab-bounded tables (the snapshotDiff
  * contract), so the gate costs two linear release scans at any corpus
  * size.
  *
  * Run repeatedly over the SAME `workDir` (one plan instance per run —
  * [[Plan]] steps are run-once): each run re-curates from `srcDir`,
  * re-candidates, and re-gates. `Cli` wires it for `graft run`. */
object ReleasePipeline {

  /** Thrown by the `release_gate` step when `failOnDrift` and a KS
    * marginal drifted — the loud refusal that blocks promotion. */
  final class DriftGateException(msg: String) extends RuntimeException(msg)

  def build(plan: Plan, srcDir: String, workDir: String,
            minQuality: Double = 0.3,
            langs: Seq[String] = Seq("en", "de", "fr", "es"),
            featureCols: Seq[String] = Seq("n_chars", "n_tokens"),
            histGroupCol: String = "lang_pred",
            histValueCol: String = "quality",
            failOnDrift: Boolean = true): Plan = {
    TrainingDataPipeline.build(plan, srcDir, workDir,
      minQuality = minQuality, langs = langs)
    val work = new ParquetConnector(plan.spark, workDir)

    plan.step("publish_candidate") {
      work.write(work.read("docs_mixed")
        .withColumn("n_chars", length(col("text")).cast("long")),
        "release_candidate")
      // first release: nothing live yet — seed the live slot so the
      // diff below is a quiet self-diff and the gate passes trivially
      if (!work.tables.contains("release_current"))
        work.write(work.read("release_candidate"), "release_current")
    }

    TrainingDataPipeline.snapshotDiff(plan, work,
      "release_current", "release_candidate", featureCols = featureCols)

    plan.step("release_gate") {
      // a feature trips the gate if EITHER shape test flags it: KS
      // (max ECDF gap) or PSI (decile-mass reshaping KS can understate)
      val ksDrifted = work.read("drift_ks").filter(col("drifted"))
        .select(col("feature")).collect().map(_.getString(0)).toSeq
      val psiDrifted = work.read("drift_psi").filter(col("drifted"))
        .select(col("feature")).collect().map(_.getString(0)).toSeq
      val drifted = (ksDrifted ++ psiDrifted).distinct.sorted
      val jsTotal = work.read("drift_js").agg(max(col("js_total_fp"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      val psiMax = work.read("drift_psi").agg(max(col("psi_fp"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      val spark = plan.spark
      import spark.implicits._
      work.write(Seq((drifted.isEmpty, drifted.size.toLong,
          drifted.mkString(","), jsTotal, psiMax))
        .toDF("gate_pass", "n_drifted", "drifted_features", "js_total_fp",
          "psi_max_fp"),
        "release_gate")
      if (drifted.nonEmpty) {
        plan.logger.fatal(
          s"release gate: ${drifted.size} drifted marginal(s): ${drifted.mkString(", ")}")
        if (failOnDrift) throw new DriftGateException(
          s"release refused: drifted marginals ${drifted.mkString(", ")}")
      } else plan.logger.info("release gate: no drifted marginals")
    }

    plan.step("promote_release") {
      // only reached when the gate let the candidate through: archive
      // the live release, atomic-rename the candidate live
      if (work.tables.contains("release_previous")) work.drop("release_previous")
      work.rename("release_current", "release_previous")
      work.rename("release_candidate", "release_current")
    }

    plan.step("baseline_hist") {
      // the streaming KS gate's persisted reference: per-group quantized
      // value histogram of the PROMOTED release (NDV-bounded rows).
      // ksDriftStream re-reads it each tick, so promoting a release
      // re-baselines the stream without restarting it. A REFUSED
      // candidate never reaches this step — the stream keeps trusting
      // the last accepted baseline.
      work.write(graft.operators.Analytics.quantizedHistogram(
        work.read("release_current"), histGroupCol, histValueCol), "release_hist")
    }
    plan
  }

  /** CLI entry — `graft run graft.pipelines.ReleasePipeline$Cli` with
    * `GRAFT_SRC_DIR` / `GRAFT_WORK_DIR` from the environment, the
    * [[TrainingDataPipeline.Cli]] convention. */
  class Cli extends graft.Main.PlanSpec {
    override def build(plan: Plan): Unit = {
      ReleasePipeline.build(plan,
        sys.env.getOrElse("GRAFT_SRC_DIR", "/root/testdata/sf0.001"),
        sys.env.getOrElse("GRAFT_WORK_DIR",
          java.nio.file.Files.createTempDirectory("graft_release_").toString))
      ()
    }
  }
}
