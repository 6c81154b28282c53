package graft.pipelines

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.plans.{Plan, Reporter}
import graft.sources.ParquetConnector

/** End-to-end training-data curation pipeline, composed entirely from
  * graft's own operators — the "full user journey" a reference user
  * migrating to Spark would run, expressed as a standard [[Plan]] so the
  * CLI / step selection / pid lock / reporting all apply:
  *
  *   ingest → profile (quality + langid + token stats) → filter →
  *   dedup (exact, then MinHash near-dup) → report
  *
  * Every stage writes a parquet table into `work`, so each is
  * independently inspectable and the plan is resumable per step. At
  * 100 TB each stage is a linear scan plus the dedup shuffles — no
  * driver-side data movement anywhere; the report aggregates only
  * per-stage row counts.
  */
object TrainingDataPipeline {

  /** Per-stage row counts, exposed for the report step and tests. */
  case class Funnel(ingested: Long, profiled: Long, kept: Long,
                    exactUnique: Long, nearUnique: Long)

  /** Wire the pipeline steps onto `plan`. `src` must contain
    * `documents.parquet`; outputs land in `work`. */
  def build(plan: Plan, srcDir: String, workDir: String,
            minQuality: Double = 0.3, langs: Seq[String] = Seq("en", "de", "fr", "es"),
            minhashThreshold: Double = 0.7): Plan = {
    val spark = plan.spark
    val src = new ParquetConnector(spark, srcDir)
    val work = new ParquetConnector(spark, workDir)
    plan.connection("source", src).connection("work", work)

    plan.step("profile") {
      // one native-profile pass per doc: quality + language + token cost
      val docs = src.read("documents")
      work.write(docs.select(col("doc_id"), col("text"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.langId(col("text")).as("lang_pred"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.subwordCount(col("text")).as("n_subwords")), "doc_profile")
    }

    plan.step("filter") {
      work.write(work.read("doc_profile")
        .filter(col("quality") >= minQuality && col("lang_pred").isin(langs: _*)),
        "docs_clean")
    }

    plan.step("dedup") {
      val clean = work.read("docs_clean")
      val exact = Dedup.exact(clean, "text", "doc_id")
      work.write(exact, "docs_exact_unique")
      // transitively-correct near-dedup (r6): candidate pairs → connected
      // components → one doc per duplicate cluster. The greedy
      // drop-every-id_b policy ([[Dedup.minhashDedup]]) over-KEEPS when a
      // cluster's smaller member pairs only through a larger one
      // (e.g. pairs (1,3),(2,3) keep both 1 and 2).
      val base = work.read("docs_exact_unique")
      val pairs = Dedup.minhashCandidates(base, "text", "doc_id",
        threshold = minhashThreshold)
      work.write(Dedup.clusterDedup(base, "doc_id", pairs), "docs_unique")
    }

    plan.step("report") {
      val f = funnel(plan, srcDir, workDir)
      val body = Reporter.render(
        """training-data funnel
          |  ingested:      {{ingested}}
          |  profiled:      {{profiled}}
          |  quality+lang:  {{kept}}
          |  exact-unique:  {{exact}}
          |  near-unique:   {{near}}""".stripMargin,
        Map("ingested" -> f.ingested.toString, "profiled" -> f.profiled.toString,
          "kept" -> f.kept.toString, "exact" -> f.exactUnique.toString,
          "near" -> f.nearUnique.toString))
      body.split("\n").foreach(plan.logger.info)
    }
    plan
  }

  /** CLI entry point — `graft run graft.pipelines.TrainingDataPipeline$Cli
    * [steps…]` with source/work dirs from the environment:
    * `GRAFT_SRC_DIR` (default sf0.001 testdata) and `GRAFT_WORK_DIR`. */
  class Cli extends graft.Main.PlanSpec {
    override def build(plan: Plan): Unit = {
      TrainingDataPipeline.build(plan,
        sys.env.getOrElse("GRAFT_SRC_DIR", "/root/testdata/sf0.001"),
        sys.env.getOrElse("GRAFT_WORK_DIR",
          java.nio.file.Files.createTempDirectory("graft_training_").toString))
      ()
    }
  }

  /** Stage counts (cheap: parquet count() uses footer row counts). */
  def funnel(plan: Plan, srcDir: String, workDir: String): Funnel = {
    val src = new ParquetConnector(plan.spark, srcDir)
    val work = new ParquetConnector(plan.spark, workDir)
    Funnel(
      ingested = src.count("documents"),
      profiled = work.count("doc_profile"),
      kept = work.count("docs_clean"),
      exactUnique = work.count("docs_exact_unique"),
      nearUnique = work.count("docs_unique"))
  }
}
