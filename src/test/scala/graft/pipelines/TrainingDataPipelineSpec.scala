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

  test("end-to-end: profile -> filter -> scrub -> dedup -> mix -> split -> pack -> report") {
    val work = tmpDir("graft_pipe_work_")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_")))
    TrainingDataPipeline.build(plan, src, work, minQuality = 0.2)
    plan.run()
    val f = TrainingDataPipeline.funnel(plan, src, work)
    assert(f.ingested > 0)
    assert(f.profiled == f.ingested, "profile is a 1:1 map")
    assert(f.kept <= f.profiled)
    assert(f.kept > 0, "quality/lang filter must keep something at threshold 0.2")
    assert(f.scrubbed <= f.kept)
    assert(f.scrubbed > 0, "repetition filter must keep normal prose")
    assert(f.exactUnique <= f.scrubbed)
    assert(f.nearUnique <= f.exactUnique)
    assert(f.finalKept == f.nearUnique, "no benchmark -> final == near-unique")
    assert(f.mixed > 0 && f.mixed <= f.finalKept, "mix keeps a non-empty subset")
    // the split stage covers every MIXED survivor, train dominating
    val workConn = new graft.sources.ParquetConnector(spark, work)
    val bySplit = workConn.read("docs_split").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == f.mixed)
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    // the pack stage chunks every split doc (>= one chunk per non-blank
    // doc) and bins carry dense ids per (split, lang)
    assert(f.packedChunks >= f.mixed, "each doc yields at least one chunk")
    val packed = workConn.read("docs_packed")
    assert(packed.columns.contains("bin") && packed.columns.contains("chunk_text"))
    assert(packed.filter(col("bin") < 0).count() == 0)
    // the report rendered through the plan logger
    assert(plan.logger.messages.exists(_.contains("training-data funnel")))
    assert(plan.logger.messages.exists(_.contains(s"near-unique:   ${f.nearUnique}")))
    assert(plan.logger.messages.exists(_.contains(s"packed chunks: ${f.packedChunks}")))
  }

  test("bpe tokenizer: vocab trains and persists; pack accounts in trained subwords") {
    val work = tmpDir("graft_pipe_bpe_")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_")))
    TrainingDataPipeline.build(plan, src, work, minQuality = 0.2,
      chunkTokens = 16, chunkOverlap = 0, packBudget = 32L,
      tokenizer = "bpe", bpeMerges = 6)
    plan.run()
    val workConn = new graft.sources.ParquetConnector(spark, work)
    // both halves of the model persisted as inspectable work tables
    val merges = workConn.read("bpe_merges").orderBy(col("rank")).collect()
    assert(merges.nonEmpty && merges.length <= 6)
    assert(workConn.read("bpe_dict").columns.toSeq == Seq("word", "syms", "freq"))
    // the packed chunks account in SUBWORDS: per doc, chunk n_tokens
    // must sum to the document's independently-recomputed subword count
    val model = graft.operators.Bpe.BpeModel(
      merges.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq,
      workConn.read("bpe_dict"))
    val expected = graft.operators.Bpe
      .segmentCorpus(workConn.read("docs_split"), "text", "doc_id", model)
      .groupBy("doc_id").agg(sum(size(col("syms"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = workConn.read("docs_packed")
      .groupBy("doc_id").agg(sum(col("n_tokens")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "chunk token totals must be the trained-tokenizer counts")
    assert(workConn.read("docs_packed").filter(col("bin") < 0).count() == 0)
  }

  test("dsir_select stage keeps the exact top fraction and feeds the mix") {
    val work = tmpDir("graft_pipe_dsir_")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_")))
    // target = the source corpus itself: selection semantics (exact
    // ranked keep, stage wiring) are what's under test, not the weights
    TrainingDataPipeline.build(plan, src, work, minQuality = 0.2,
      dsirTargetDir = Some(src), dsirKeepFraction = 0.4, dsirNumBuckets = 256)
    plan.run()
    val f = TrainingDataPipeline.funnel(plan, src, work)
    assert(f.dsirKept == math.ceil(f.nearUnique * 0.4).toLong,
      s"exact top-40% of ${f.nearUnique}, got ${f.dsirKept}")
    assert(f.mixed <= f.dsirKept, "mix must read the SELECTED set")
    assert(plan.logger.messages.exists(_.contains(s"dsir-selected: ${f.dsirKept}")))
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
    plan.run(Seq("scrub", "dedup")) // selected-step rerun, same plan instance? steps run once —
    val f = TrainingDataPipeline.funnel(plan, src, work)
    assert(before == f.kept)
    assert(f.nearUnique < f.scrubbed, "planted near-dup must be removed")
  }

  test("jaccard strategy + explicit mix weights + labeled lang column (the q_pipeline_funnel config)") {
    val work = tmpDir("graft_pipe_work4_")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid4_")))
    TrainingDataPipeline.build(plan, src, work, minQuality = 0.0,
      nearDedup = "jaccard",
      mixWeights = Some(Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.125, "es" -> 0.125)),
      langCol = "lang")
    plan.run()
    val workConn = new graft.sources.ParquetConnector(spark, work)
    // the labeled column rides through profile -> ... -> packed output
    assert(workConn.read("doc_profile").columns.contains("lang"))
    assert(workConn.read("docs_packed").columns.contains("lang"))
    val f = TrainingDataPipeline.funnel(plan, src, work)
    assert(f.mixed > 0 && f.mixed <= f.finalKept)
    assert(f.packedChunks >= f.mixed)
    // explicit weights: no stratum exceeds its budget share by more than
    // one straddling document's tokens (mixByWeight's cut contract)
    val toks = workConn.read("docs_mixed").groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks.nonEmpty && toks.keySet.subsetOf(Set("en", "de", "fr", "es")))
    // an unknown strategy fails loudly at build time
    intercept[IllegalArgumentException] {
      TrainingDataPipeline.build(
        new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid5_"))),
        src, tmpDir("graft_pipe_work5_"), nearDedup = "bogus")
    }
  }

  test("lm_filter stage keeps exactly the docs at or under the NLL cap; short docs drop") {
    val work = tmpDir("graft_pipe_lm_")
    val planA = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_lm_a_")))
    TrainingDataPipeline.build(planA, src, work, minQuality = 0.0, langCol = "lang")
    planA.run(Seq("profile", "filter"))
    val workConn = new graft.sources.ParquetConnector(spark, work)
    val clean = workConn.read("docs_clean")
    // cap = the median score, computed with the SAME operator — the
    // stage must then keep a strict, non-empty subset
    val lm = graft.operators.LanguageModel.train(
      clean.filter(col("lang") === "en"), "text", 50000)
    val scored = graft.operators.LanguageModel.scoreNll(clean, "text", "doc_id", lm)
    val cap = scored.filter(col("avg_nll").isNotNull)
      .stat.approxQuantile("avg_nll", Array(0.5), 0.0).head
    val expected = scored.filter(col("avg_nll") <= cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty && expected.size < clean.count())
    val planB = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_lm_b_")))
    TrainingDataPipeline.build(planB, src, work, minQuality = 0.0, langCol = "lang",
      maxAvgNll = Some(cap))
    planB.run(Seq("lm_filter", "scrub"))
    val gotLm = workConn.read("docs_lm").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(gotLm == expected, "stage keep set must equal the operator's")
    val f = TrainingDataPipeline.funnel(planB, src, work)
    assert(f.lmKept == expected.size)
    assert(f.scrubbed <= f.lmKept, "scrub consumes the LM-gated set")
  }

  test("lm_bucket_mix stage equals qualityBuckets + mixByWeight run by hand; exclusivity guard") {
    val work = tmpDir("graft_pipe_lmb_")
    val planA = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_lmb_a_")))
    TrainingDataPipeline.build(planA, src, work, minQuality = 0.0, langCol = "lang")
    planA.run(Seq("profile", "filter"))
    val workConn = new graft.sources.ParquetConnector(spark, work)
    val clean = workConn.read("docs_clean")
    val weights = Map("head" -> 0.5, "middle" -> 0.375, "tail" -> 0.125)
    // expected keep set: the same operators composed by hand
    val lm = graft.operators.LanguageModel.train(
      clean.filter(col("lang") === "en"), "text", 50000)
    val scored = graft.operators.LanguageModel.scoreNll(clean, "text", "doc_id", lm)
    val bucketed = graft.operators.LanguageModel.qualityBuckets(scored, "doc_id")
      .filter(col("bucket").isNotNull)
      .join(clean.select("doc_id", "n_tokens"), Seq("doc_id"))
    val expected = graft.operators.Curation
      .mixByWeight(bucketed, "bucket", weights, "n_tokens", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty && expected.size < clean.count(),
      "bucket sampling must keep a strict, non-empty subset")
    val planB = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_lmb_b_")))
    TrainingDataPipeline.build(planB, src, work, minQuality = 0.0, langCol = "lang",
      lmBucketWeights = Some(weights))
    planB.run(Seq("lm_bucket_mix", "scrub"))
    val got = workConn.read("docs_lm").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == expected, "stage keep set must equal the operator composition's")
    val f = TrainingDataPipeline.funnel(planB, src, work)
    assert(f.lmKept == expected.size && f.scrubbed <= f.lmKept)
    // the hard cap and the soft sampler cannot stack
    intercept[IllegalArgumentException] {
      TrainingDataPipeline.build(
        new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_lmb_c_"))),
        src, tmpDir("graft_pipe_lmb_c_"),
        maxAvgNll = Some(5.0), lmBucketWeights = Some(weights))
    }
    intercept[IllegalArgumentException] {
      TrainingDataPipeline.build(
        new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_lmb_d_"))),
        src, tmpDir("graft_pipe_lmb_d_"),
        lmBucketWeights = Some(Map("bogus" -> 1.0)))
    }
  }

  test("decontaminate stage drops documents overlapping the benchmark") {
    val work = tmpDir("graft_pipe_work3_")
    val benchDir = tmpDir("graft_pipe_bench_")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid3_")))
    TrainingDataPipeline.build(plan, src, work, minQuality = 0.0,
      benchDir = Some(benchDir), maxContamination = 0.05)
    // run the funnel up to dedup, then build the benchmark from 5 DOCS
    // THAT SURVIVED (scrub/dedup may legitimately drop any fixed choice),
    // so decontaminate provably has overlapping targets
    plan.run(Seq("profile", "filter", "scrub", "dedup"))
    val workConn0 = new graft.sources.ParquetConnector(spark, work)
    val benchConn = new graft.sources.ParquetConnector(spark, benchDir)
    benchConn.write(workConn0.read("docs_unique").orderBy(col("doc_id")).limit(5)
      .select("doc_id", "text"), "documents")
    plan.run(Seq("decontaminate", "report"))
    val f = TrainingDataPipeline.funnel(plan, src, work)
    assert(f.finalKept < f.nearUnique, "benchmark members must be dropped")
    val workConn = new graft.sources.ParquetConnector(spark, work)
    val finalIds = workConn.read("docs_final").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val benchIds = benchConn.read("documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(benchIds.intersect(finalIds).isEmpty, "no benchmark doc survives")
  }

  test("experiment_report step writes the composed CUPED->Welch->Holm readout") {
    val work = tmpDir("graft_pipe_exp_")
    val workConn = new graft.sources.ParquetConnector(spark, work)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // one real effect, one null effect (the AnalyticsSpec fixture shape)
    val rows = (0 until 50).flatMap { i =>
      val b = (i % 5).toDouble; val j = (i % 3) * 0.1
      val v = if (i % 2 == 1) "treatment" else "control"
      val delta = if (i % 2 == 1) 5.0 else 0.0
      Seq(Row("shift", v, b + j + delta, b), Row("nil", v, b + j, b))
    }
    workConn.write(df(StructType(Seq(
      StructField("experiment", StringType), StructField("variant", StringType),
      StructField("metric", DoubleType), StructField("covariate", DoubleType))),
      rows), "readout")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_exp_")))
    TrainingDataPipeline.experimentReadout(plan, workConn, "readout")
    plan.run()
    val rep = workConn.read("experiment_report").collect()
      .map(r => r.getString(0) -> r.getBoolean(14)).toMap
    assert(rep == Map("shift" -> true, "nil" -> false), rep.toString)
    // step output matches the operator run by hand
    val direct = graft.operators.Analytics.experimentReport(
        workConn.read("readout"), "experiment", "variant", "metric", "covariate")
      .collect().map(r => r.getString(0) -> r.toString).toMap
    val persisted = workConn.read("experiment_report").collect()
      .map(r => r.getString(0) -> r.toString).toMap
    assert(direct == persisted)
  }

  test("snapshot_diff step writes per-feature KS, unigram JS, and embedding drift") {
    val work = tmpDir("graft_pipe_snap_")
    val workConn = new graft.sources.ParquetConnector(spark, work)
    val docs = new graft.sources.ParquetConnector(spark, src).read("documents")
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
    // release N = the corpus; release N+1 = a regressed extraction that
    // truncates documents — exactly what the gate exists to catch. A
    // derived embedding (dim 0 tracks length, dim 1 constant) gives the
    // vector leg a planted shift confined to dim 0.
    def emb(d: org.apache.spark.sql.DataFrame) = d.withColumn("emb",
      array(col("n_chars").cast("double") / 100.0, lit(1.0)))
    workConn.write(emb(docs), "release_1")
    workConn.write(emb(docs
      .withColumn("text", substring(col("text"), 1, 120))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))),
      "release_2")
    val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_pid_snap_")))
    TrainingDataPipeline.snapshotDiff(plan, workConn, "release_1", "release_2",
      embCol = Some("emb"))
    plan.run()
    // embedding leg: the shift localizes to dim 0, the constant dim is quiet
    val embOut = workConn.read("drift_emb").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(math.abs(embOut(0).getDouble(5)) > 0.01, s"dim 0 must shift: ${embOut(0)}")
    assert(embOut(1).getDouble(5) == 0.0 && embOut(1).isNullAt(7),
      s"constant dim must be quiet: ${embOut(1)}")
    // KS half == the batch operator run by hand
    val ks = workConn.read("drift_ks").collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(5))).toMap
    val expect = graft.operators.Analytics.snapshotKs(
        workConn.read("release_1"), workConn.read("release_2"),
        Seq("n_chars", "n_tokens")).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(5))).toMap
    assert(ks == expect, s"$ks vs $expect")
    assert(ks("n_chars")._2 && ks("n_tokens")._2,
      s"truncation must drift both marginals: $ks")
    // JS half: total present and constant across rows, diagnostic rows exist
    val js = workConn.read("drift_js")
    assert(js.count() > 0)
    assert(js.select("js_total_fp").distinct().count() == 1)
    // PSI half == the batch operator run by hand; wholesale truncation
    // piles the current release into the low deciles -> both trip 0.2
    val psi = workConn.read("drift_psi").collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(5))).toMap
    val psiExpect = graft.operators.Analytics.psiDrift(
        workConn.read("release_1"), workConn.read("release_2"),
        Seq("n_chars", "n_tokens")).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(5))).toMap
    assert(psi == psiExpect, s"$psi vs $psiExpect")
    assert(psi("n_chars")._2 && psi("n_tokens")._2,
      s"truncation must trip the PSI gate on both marginals: $psi")
  }
}
