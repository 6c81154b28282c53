package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Physical-plan evidence that the scale properties hold: filters reach
  * the parquet scan, projections prune columns, small dims broadcast.
  * These are the `.explain` audits the 100 TB design depends on, encoded
  * as assertions so they cannot silently regress. */
class PlanEvidenceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Collect the file scans, descending through the AdaptiveSparkPlanExec
    * wrapper AQE puts around any plan with an exchange (it is a leaf node,
    * so a plain collect stops at it). */
  private def scansIn(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scansIn(a.executedPlan)
    }.flatten

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    scansIn(df.queryExecution.executedPlan).head

  test("connector read + filter: predicate pushes down to the parquet scan") {
    val li = graft.sources.ParquetConnector.readTable(spark, s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") > 1000)
      .select("l_orderkey", "l_quantity")
    val scan = scanOf(li)
    assert(scan.metadata("PushedFilters").contains("GreaterThan(l_orderkey,1000)"),
      scan.metadata("PushedFilters"))
  }

  test("projection prunes the scan to the referenced columns (ReadSchema)") {
    val li = graft.sources.ParquetConnector.readTable(spark, s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val rs = scanOf(li).metadata("ReadSchema")
    assert(rs.contains("l_orderkey") && rs.contains("l_quantity"))
    assert(!rs.contains("l_comment") && !rs.contains("l_extendedprice"), rs)
  }

  test("q_scan_project: shipdate filter reaches the scan") {
    val df = SparkEntry.queries("q_scan_project")(spark, sf)
    val pushed = scanOf(df).metadata("PushedFilters")
    assert(pushed.contains("l_shipdate"), pushed)
  }

  test("q_join_nation_revenue: dims broadcast, no shuffle join on the small sides") {
    val plan = SparkEntry.queries("q_join_nation_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
  }

  test("q_agg_pricing: partial aggregation before the shuffle (map-side combine)") {
    val plan = SparkEntry.queries("q_agg_pricing")(spark, sf)
      .queryExecution.executedPlan.toString
    // two HashAggregate levels = partial + final; the shuffle moves
    // pre-aggregated rows, not the fact table
    assert("HashAggregate".r.findAllIn(plan).size >= 2, "expected partial+final aggregates")
  }

  test("q_ann_cosine: top-k is TakeOrdered, not a global sort") {
    val plan = SparkEntry.queries("q_ann_cosine")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("whole-stage codegen covers the text-function pipeline (no codegen breaks)") {
    // quality + langid + fingerprint in one projection: the r3 regression
    // was higher-order lambdas (CodegenFallback) dropping this projection
    // to interpreted eval — assert the ProjectExec sits INSIDE a
    // WholeStageCodegen span, not merely that one exists somewhere.
    val df = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
        graft.functions.TextFunctions.langId(col("text")).as("lang_pred"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
        graft.operators.Dedup.minhashSignatureText(col("text")).as("sig"),
        graft.operators.Dedup.simhash(col("text")).as("sim"))
    val codegenProjects = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.collect { case p: ProjectExec => p }
    }.flatten
    // the project INSIDE the codegen span must be the one holding OUR
    // expressions — a trivial residual projection staying codegen'd while
    // the expensive one falls out would otherwise keep this green
    def hasExpr(pred: org.apache.spark.sql.catalyst.expressions.Expression => Boolean): Boolean =
      codegenProjects.exists(_.projectList.exists(_.exists(pred)))
    assert(hasExpr(_.isInstanceOf[graft.functions.TextProfile]),
      "TextProfile must be inside WholeStageCodegen:\n" + df.queryExecution.executedPlan)
    assert(hasExpr(_.isInstanceOf[graft.functions.RollingHash]), "RollingHash must be codegen'd")
    assert(hasExpr(_.isInstanceOf[graft.functions.MinHashTextSignature]),
      "MinHashTextSignature must be codegen'd")
    assert(hasExpr(_.isInstanceOf[graft.functions.SimHashText]), "SimHashText must be codegen'd")
  }

  test("canonical_url stays inside WholeStageCodegen (the crawl frontier's hot projection)") {
    // VERDICT r17 #7: the canonicalization sits on the highest-row-count
    // projection of a real crawl (every capture's diff/frontier key) —
    // as a UDF it broke the scan's codegen span; as a native expression
    // it must sit INSIDE one
    val df = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.operators.Robots.canonicalUrlCol(
          concat(lit("HTTP://Example.COM:80/a/./"), col("doc_id").cast("string"),
            lit("?b=2&a=1"))).as("canonical_url"))
    val codegenProjects = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.collect { case p: ProjectExec => p }
    }.flatten
    assert(codegenProjects.exists(_.projectList.exists(
        _.exists(_.isInstanceOf[graft.functions.CanonicalUrl]))),
      "CanonicalUrl must be inside WholeStageCodegen:\n" + df.queryExecution.executedPlan)
  }

  test("repetition profile + PII scrub + n-gram hashes stay inside WholeStageCodegen") {
    val df = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(graft.functions.TextFunctions.repetitionProfile(col("text")).as("rep"),
        graft.functions.TextFunctions.gopherRepetitionKeep(col("text")).as("keep"),
        graft.functions.TextFunctions.redactPii(col("text")).as("clean"),
        org.apache.spark.sql.graftshim.ColumnBridge.column(
          graft.functions.WordNgramHashes(
            org.apache.spark.sql.graftshim.ColumnBridge.expression(
              graft.functions.TextFunctions.normalizeForFingerprint(col("text"))), 5)).as("gs"))
    val codegenProjects = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.collect { case p: ProjectExec => p }
    }.flatten
    def hasExpr(pred: org.apache.spark.sql.catalyst.expressions.Expression => Boolean): Boolean =
      codegenProjects.exists(_.projectList.exists(_.exists(pred)))
    assert(hasExpr(_.isInstanceOf[graft.functions.RepetitionProfile]),
      "RepetitionProfile must be inside WholeStageCodegen:\n" + df.queryExecution.executedPlan)
    assert(hasExpr(_.isInstanceOf[graft.functions.WordNgramHashes]),
      "WordNgramHashes must be codegen'd")
  }

  test("chunkDocuments is shuffle-free: no exchange anywhere in the plan") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val plan = graft.operators.Curation.chunkDocuments(docs, "text", "doc_id", 64, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "chunking must stay row-local:\n" + plan)
  }

  test("packSequencesStrict: ONE exchange (the group shuffle), no window, no cartesian") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val plan = graft.operators.Curation
      .packSequencesStrict(docs, "n_chars", 16384L, Seq("lang"), "doc_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"strict pack = one group shuffle, found $exchanges:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Cartesian"), plan)
  }

  test("tokenBudgetChunks: per-doc window only, no cartesian, dict joins are equi-joins") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val model = graft.operators.Bpe.train(docs.limit(50), "text", numMerges = 4,
      minPairFreq = 1L)
    val plan = graft.operators.Bpe
      .tokenBudgetChunks(docs, "text", "doc_id", model, chunkTokens = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      "word-keyed segmentation must stay an equi-join:\n" + plan)
    // the only window is the per-document prefix sum (partitioned by id —
    // bounded by a document, never the corpus)
    assert("windowspecdefinition\\(doc_id".r.findAllIn(plan.toLowerCase).nonEmpty
      || plan.contains("Window"), plan)
  }

  test("LSH candidate generation is join-free: no join operator in any sketch-dedup plan") {
    // the scale contract of minhash/simhash/embedding near-dup: band/chunk
    // explode → groupBy → in-bucket pair explode. ONE shuffle, no
    // self-join (a join would shuffle the corpus twice and give the
    // optimizer a quadratic blow-up surface on skewed buckets).
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def joinsIn(p: SparkPlan): Seq[BaseJoinExec] =
      p.collect {
        case j: BaseJoinExec => Seq(j)
        case a: AdaptiveSparkPlanExec => joinsIn(a.executedPlan)
      }.flatten
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val emb = graft.sources.ParquetConnector.readTable(spark, s"$sf/embeddings.parquet")
    val plans = Seq(
      "minhash" -> graft.operators.Dedup.minhashCandidates(docs, "text", "doc_id"),
      "simhash" -> graft.operators.Dedup.simhashCandidates(docs, "text", "doc_id"),
      "embedding" -> graft.operators.Dedup.embeddingNearDup(emb, "embedding", "vec_id", dim = 64),
      "embedding_multi" -> graft.operators.Dedup.embeddingNearDupMulti(
        emb, "embedding", "vec_id", dim = 64, tables = 4))
    plans.foreach { case (name, df) =>
      assert(joinsIn(df.queryExecution.executedPlan).isEmpty,
        s"$name candidates must be join-free:\n" + df.queryExecution.executedPlan)
    }
  }

  test("deterministic samplers: no per-stratum window funnel (value-binned prefix)") {
    // VERDICT r9 #2: row_number()/sum() OVER (PARTITION BY stratum ORDER
    // BY orderCol) funnels each stratum into ONE task's sort — at 100 TB
    // the `en` stratum is most of the corpus. The de-funneled shape must
    // show (a) the _gbin value-binning column keying the data windows and
    // (b) no window partitioned by the stratum alone that orders by the
    // order column (the offsets window orders by _gbin and runs over a
    // metadata-sized frame).
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val w = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25)
    val plans = Seq(
      "stratifiedExact" -> graft.operators.Curation.stratifiedExact(docs, Seq("lang"), 0.2, "doc_id"),
      "mixSources" -> graft.operators.Curation.mixSources(docs, "lang", w, "doc_id"),
      "mixByWeight" -> graft.operators.Curation.mixByWeight(docs, "lang", w, "n_chars", "doc_id"))
    val funnel = raw"windowspecdefinition\(lang#\d+, doc_id#\d+ ASC".r
    plans.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("_gbin"),
        s"$name must bin (stratum, orderCol) by value:\n$plan")
      assert(funnel.findFirstIn(plan).isEmpty,
        s"$name still has a per-stratum funnel window:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"$name's metadata-sized offsets frame must broadcast, not shuffle the data:\n$plan")
    }
  }

  test("q_asof_join is join-free: union + one keyed window, no per-row lookup join") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def joinsIn(p: SparkPlan): Seq[BaseJoinExec] =
      p.collect {
        case j: BaseJoinExec => Seq(j)
        case a: AdaptiveSparkPlanExec => joinsIn(a.executedPlan)
      }.flatten
    val df = SparkEntry.queries("q_asof_join")(spark, sf)
    val plan = df.queryExecution.executedPlan
    assert(joinsIn(plan).isEmpty,
      "asof must be the union+carry-forward shape, not a theta join:\n" + plan)
    assert(plan.toString.contains("Window"), "asof needs the carry-forward window")
  }

  test("q_range_join: bucketed equi-join, never a nested-loop/cartesian plan") {
    val plan = SparkEntry.queries("q_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "range join must bucketize to an equi-join:\n" + plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "expected an equi-join on the bucket id:\n" + plan)
  }

  test("q_salted_join: salt is part of the join key and the build side is replicated") {
    val df = SparkEntry.queries("q_salted_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the join must key on (l_orderkey, _graft_salt) — salt visible in the
    // join criteria, not optimized away
    assert(plan.contains("_graft_salt"),
      "salt column missing from the physical plan:\n" + plan)
    assert(plan.contains("Generate explode") || plan.contains("explode"),
      "build side must be replicated via explode:\n" + plan)
  }

  test("Validate.check: every rule evaluates in ONE scan of the input") {
    val li = graft.sources.ParquetConnector.readTable(spark, s"$sf/lineitem.parquet")
    val report = graft.operators.Validate.check(li, Seq(
      graft.operators.Validate.Predicate("qty", col("l_quantity").between(1, 50)),
      graft.operators.Validate.NotNull("ship", "l_shipdate"),
      graft.operators.Validate.Unique("ok", "l_orderkey")))
    assert(scansIn(report.queryExecution.executedPlan).size == 1,
      "adding rules must add aggregate columns, never passes over the data:\n" +
        report.queryExecution.executedPlan)
  }

  test("groupCentroids: partial aggregation before the exchange (index-sized shuffle)") {
    val emb = graft.sources.ParquetConnector.readTable(spark, s"$sf/embeddings.parquet")
    val plan = graft.operators.Similarity.groupCentroids(emb, "embedding", "label")
      .queryExecution.executedPlan.toString
    // map-side combine collapses each task to groups×dim partial sums —
    // without it the exchange would carry every exploded element
    assert(plan.contains("partial_avg"),
      "centroid aggregation must have a partial (map-side) phase:\n" + plan)
  }

  test("readSince: watermark predicate pushes into the scan (incremental = delta read)") {
    val c = new graft.sources.ParquetConnector(spark, tmpDir("graft_push_"))
    c.write(usersDf, "users")
    val since = ts("2024-01-03 00:00:00")
    val pushed = scanOf(c.readSince("users", "updated_at", since)).metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(updated_at"), pushed)
  }

  test("naive-timestamp (isAdjustedToUTC=false) scan: ts predicate still pushes down") {
    // the events table carries pandas-style naive micros; reading them
    // as NTZ + a cast above the scan would silently kill timestamp
    // pushdown — the incremental readSince watermark would scan 100 TB.
    // readTable must surface TimestampType AT THE SCAN and keep the
    // filter in PushedFilters.
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
      .filter(expr("ts >= TIMESTAMP '2024-01-25 00:00:00'"))
      .select("event_id", "ts")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val pushed = scanOf(ev).metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(ts"), pushed)
  }

  test("contamination: benchmark side broadcasts; corpus docs never shuffle") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val out = graft.operators.Curation.contamination(
      docs.filter(col("doc_id") % 20 =!= 0), docs.filter(col("doc_id") % 20 === 0),
      "text", "doc_id", n = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "bench n-gram set must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "corpus side must not shuffle into the join")
  }

  test("LM scoring: vocab mapping broadcasts; per-doc NLL aggregates map-side") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val lm = graft.operators.LanguageModel.train(
      docs.filter(col("lang") === "en"), "text", vocabSize = 1000)
    val out = graft.operators.LanguageModel.scoreNll(docs, "text", "doc_id", lm)
    out.collect()
    // AdaptiveSparkPlan.toString prints the final plan followed by the
    // pre-AQE initial one — only the final section is the verdict
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the vocab tables are driver-bounded (top-K collect) and explicitly
    // broadcast-hinted, so the UNK mapping can never shuffle the exploded
    // corpus bigram stream — this is deterministic, unlike the COUNT-table
    // joins, which are deliberately unhinted (a corpus-scale reference
    // slice produces GB-sized bigram tables; AQE broadcasts them when
    // runtime stats allow and falls back to shuffle when they don't, and
    // both outcomes occur even at this SF — pinning AQE's pick is flake)
    val vocabJoins = plan.linesIterator.filter(_.contains("_v1#")).toSeq
    assert(vocabJoins.exists(_.contains("BroadcastHashJoin")),
      "vocab mapping must broadcast-join:\n" + plan)
    assert(!plan.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && (l.contains("_v1#") || l.contains("_v2#"))),
      "vocab mapping must never sort-merge the bigram stream:\n" + plan)
    // per-doc NLL aggregation must have a map-side partial phase so only
    // (doc, partial sum) rows cross the exchange, never raw bigram rows
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      "per-doc aggregation must be partial before the exchange:\n" + plan)
  }

  test("NB classify: label table broadcasts; per-(doc,label) scores aggregate map-side") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val m = graft.operators.TextClassifier.train(docs, "text", "lang", vocabSize = 500)
    // r19: classify materializes the per-doc joint table (its argmax
    // reads it twice), so the scoring cross's plan evidence lives in
    // the jointScores subplan — assert it at its source
    val out = graft.operators.TextClassifier.jointScores(docs, "text", "doc_id", m, 0.5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the |labels|-row prior/denominator table is explicitly broadcast —
    // the token stream must cross it without an exchange
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "label table must broadcast into the scoring cross:\n" + plan)
    // vocab UNK-mapping is a broadcast join on the driver-bounded array
    assert(!plan.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && l.contains("_v#")),
      "vocab mapping must never sort-merge the token stream:\n" + plan)
    // per-(doc,label) joint aggregation partial before the exchange
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      "per-doc-label aggregation must be partial before the exchange:\n" + plan)
  }

  test("KN trigram scoring: vocab + bounded count tables broadcast; NLL aggregates map-side") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val lm = graft.operators.LanguageModel.trainKn(
      docs.filter(col("lang") === "en"), "text", vocabSize = 500)
    val out = graft.operators.LanguageModel.scoreKnNll(docs, "text", "doc_id", lm)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the three vocab-mapping joins are broadcast-hinted (driver arrays)
    val vocabJoins = plan.linesIterator.filter(_.contains("_v1#")).toSeq
    assert(vocabJoins.exists(_.contains("BroadcastHashJoin")),
      "vocab mapping must broadcast-join:\n" + plan)
    // contMid (_t2c/_n2f) and contUni (_n1p3) are bounded by |V|+1 rows
    // and explicitly broadcast — the trigram stream must never
    // sort-merge into them (tri/pre12/contBi are deliberately unhinted,
    // as with the bigram scorer's count tables)
    assert(!plan.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && (l.contains("_t2c#") || l.contains("_n1p3#"))),
      "vocab-bounded count tables must broadcast, not sort-merge:\n" + plan)
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      "per-doc NLL aggregation must be partial before the exchange:\n" + plan)
  }

  test("PQ ADC over a materialized code index: scan prunes to (id, code); top-k is TakeOrdered") {
    val emb = graft.sources.ParquetConnector.readTable(spark, s"$sf/embeddings.parquet")
    val books = graft.operators.Similarity.trainPq(emb, "embedding", "vec_id", m = 4, k = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_plan_").toString
    try {
      // the compressed index carries codes only — full vectors stay in
      // the source table for re-ranking
      graft.operators.Similarity.pqEncode(emb, "embedding", books)
        .select(col("vec_id"), col("_code"), col("label"))
        .write.parquet(s"$dir/codes")
      val q = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
      val out = graft.operators.Similarity.pqTopKAdc(
        spark.read.parquet(s"$dir/codes"), "_code", "vec_id", books, q, k = 10)
      val scan = scanOf(out)
      // ADC reads m bytes of code + the id, NEVER the unused columns
      assert(scan.schema.fieldNames.toSet == Set("vec_id", "_code"),
        s"ADC must prune the index scan to (vec_id, _code), got ${scan.schema.fieldNames.mkString(",")}")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        "PQ top-k must be TakeOrdered, not a global sort:\n" + plan)
      assert(!plan.contains("SortExec"), "no global sort in the ADC plan:\n" + plan)
    } finally graft.sources.FileTableOps.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("keySkewProfile: top-N plans as TakeOrdered; counts aggregate partial") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
    val out = graft.operators.Diagnostics.keySkewProfile(ev, Seq("user_id"), topN = 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"),
      "the heavy-key pass must surface N candidates per task, never global-sort:\n" + plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("robustOutliers sketch mode (the 100 TB path) has NO window anywhere") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    val out = graft.operators.Profile.robustOutliers(ev, Seq("event_type"), "value",
      exact = false)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"),
      "sketch percentiles must be mergeable aggregates, not per-group sorts:\n" + plan)
    assert(plan.contains("percentile_approx") || plan.contains("ApproximatePercentile"),
      "sketch mode must actually run the sketch:\n" + plan)
  }

  test("corpusOverlap: co-membership aggregates per gram — no join ever touches the gram stream") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val out = graft.operators.Curation.corpusOverlap(docs, "text", "source", n = 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // joins exist only over the |sources|^2 pair frame; the corpus-sized
    // gram frame reaches only groupBy aggregates (no _g in any join line)
    assert(!plan.linesIterator.exists(l =>
        l.contains("Join") && l.contains("_g#")),
      "the gram stream must aggregate, never self-join:\n" + plan)
  }

  test("cooccurrence and triangleCounts: equi-joins only, never a cartesian/nested-loop") {
    val li = graft.sources.ParquetConnector.readTable(spark, s"$sf/lineitem.parquet")
    val pairs = graft.operators.Analytics.cooccurrence(li, "l_orderkey", "l_partkey",
      minPairs = 1L, maxItemsPerTxn = 16)
    val tri = graft.operators.LinkGraph.triangleCounts(
      pairs.select(col("item_a").as("src"), col("item_b").as("dst")), "src", "dst")
    tri.collect()
    for ((name, df) <- Seq("cooccurrence" -> pairs, "triangles" -> tri)) {
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name must stay equi-join:\n" + plan)
    }
  }

  test("DSIR scoring: ratio table broadcasts; per-doc weights aggregate map-side") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val table = graft.operators.Dsir.importanceTable(
      docs, docs.filter(col("source") === "src1"), "text", numBuckets = 64)
    val out = graft.operators.Dsir.importanceWeights(docs, "text", "doc_id", table,
      numBuckets = 64)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the bounded (numBuckets-row) log-ratio table is explicitly
    // broadcast-hinted — the exploded n-gram stream must never shuffle
    // into that join on the bucket key
    assert(plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("_b#")),
      "ratio table must broadcast-join on _b:\n" + plan)
    assert(!plan.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && l.contains("_b#")),
      "n-gram stream must never sort-merge on the bucket key:\n" + plan)
    // per-doc weight aggregation partial before the exchange: only
    // (doc, partial sum) rows cross, never raw n-gram rows
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      "per-doc aggregation must be partial before the exchange:\n" + plan)
  }

  test("skipGramPairs: one corpus scan, no join, no window — shifted-zip pairs") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val out = graft.operators.Retrieval.skipGramPairs(docs, "text", window = 3)
    val opt = out.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), "skip-grams must not self-join:\n" + opt)
    assert(!opt.contains("Window"), "skip-grams must not use a window:\n" + opt)
    val scans = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.length == 1, s"one corpus scan expected, got ${scans.length}:\n$opt")
  }

  test("downsample: a single partial-aggregated groupBy, never a window") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
    val out = graft.operators.TimeSeries.downsample(ev, "user_id", "ts", "value",
      "event_id", 86400L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), "OHLC must not use a window:\n" + plan)
    assert(plan.contains("partial_min_by") || plan.contains("partial_min"),
      "candle aggregates must be map-side partial before the exchange:\n" + plan)
  }

  test("negativeSample: pure projection + generate — zero exchanges") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val out = graft.operators.Curation.negativeSample(docs, "doc_id", k = 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"),
      "negative sampling must be shuffle-free:\n" + plan)
  }

  test("corrMatrix: ONE corpus scan feeds every pair's moments — no join, no window") {
    val li = graft.sources.ParquetConnector.readTable(spark, s"$sf/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount")
    val out = graft.operators.Profile.corrMatrix(li,
      Seq("l_quantity", "l_extendedprice", "l_discount"))
    val opt = out.queryExecution.optimizedPlan
    val scans = opt.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.length == 1, s"one scan for all C(k,2) pairs, got ${scans.length}")
    val s = opt.toString
    assert(!s.contains("Join") && !s.contains("Window"),
      "moment matrix is a single aggregate:\n" + s)
    out.collect()
    val phys = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(phys.contains("partial_sum"),
      "moments must partial-aggregate before the exchange:\n" + phys)
  }

  test("rocAuc: corpus partial-aggregates to (group, score); window is group-partitioned") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
      .select(col("event_type"), col("value"), (col("user_id") % 3 === 0).as("y"))
    val out = graft.operators.Evaluation.rocAuc(ev, "event_type", "value", "y")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("partial_sum"),
      "per-score counts must combine map-side:\n" + plan)
    val winLine = plan.linesIterator.find(_.contains("windowspecdefinition"))
    assert(winLine.exists(_.contains("event_type")),
      "rank window must partition by the group, never run global:\n" + plan)
  }

  test("rankedEval: rank window partitions per query — no global sort task") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"), col("value"),
        (col("event_type") === "purchase").as("rel"))
    val out = graft.operators.Evaluation.rankedEval(ev, "user_id", "event_id",
      "value", "rel", k = 10)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val winLine = plan.linesIterator.find(_.contains("windowspecdefinition"))
    assert(winLine.exists(_.contains("user_id")),
      "ranking must be group-local:\n" + plan)
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      "metric rollup must partial-aggregate:\n" + plan)
  }

  test("preferencePairs: one scan, one partial-aggregated pass, no window") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars").cast("double").as("sc"))
    val out = graft.operators.Preference.preferencePairs(docs, "source", "doc_id", "sc")
    out.collect()
    val opt = out.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join") && !opt.contains("Window"),
      "best-vs-worst is a single max/min-struct aggregate:\n" + opt)
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("partial_max") || plan.contains("partial_min"),
      "struct extremes must combine map-side:\n" + plan)
  }

  test("distMatch: keep-fraction table broadcast-joins back; corpus never sort-merges") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .withColumn("bucket", expr("CAST(n_chars AS BIGINT) DIV 100"))
    val src = docs.filter(col("source").rlike("^src[0-9]$"))
    val tgt = docs.filter(!col("source").rlike("^src[0-9]$"))
    val out = graft.operators.Curation.distMatch(src, tgt, "bucket", "doc_id", seed = 5L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      "the tiny (bucket, keep_fp) table must broadcast:\n" + plan)
    assert(!plan.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && l.contains("bucket")),
      "the corpus must never shuffle on the bucket key:\n" + plan)
  }

  test("intervalOverlap: bucket equi-join, never a cartesian/nested-loop plan") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
    def daily(t: String, p: String) = ev.filter(col("event_type") === t)
      .groupBy(col("user_id"), to_date(col("ts")).as(s"${p}_day"))
      .agg(min(col("ts")).as(s"${p}_start"),
        (max(col("ts")) + expr("INTERVAL 1 SECOND")).as(s"${p}_end"))
    val out = graft.operators.TemporalJoin.intervalOverlap(
      daily("click", "a"), daily("view", "b"), Seq("user_id"),
      "a_start", "a_end", "b_start", "b_end", bucketSeconds = 21600)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "overlap must resolve through the bucket equi-join:\n" + plan)
  }

  test("bm25HardNegativesIndexed: postings scan carries the bucket partition filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pe_hn_").toString + "/idx"
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    graft.operators.Retrieval.buildInvertedIndex(docs, "text", "doc_id", dir, buckets = 8)
    val rel = docs.select(lit(1L).as("q_id"), col("doc_id")).limit(0)
    val out = graft.operators.Retrieval.bm25HardNegativesIndexed(spark, dir,
      Seq(1L -> Seq("spark")), rel, k = 5, buckets = 8)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      "the whole batch must read only its terms' posting buckets:\n" + plan)
    assert(plan.contains("BroadcastHashJoin"),
      "the (q_id, term, idf) weight table must broadcast:\n" + plan)
  }

  test("sq8 encode scan stays inside whole-stage codegen once codes are materialized") {
    val e = graft.sources.ParquetConnector.readTable(spark, s"$sf/embeddings.parquet")
    val stats = graft.operators.Similarity.sq8Train(e, "embedding")
    val enc = graft.operators.Similarity.sq8Encode(e, "embedding", stats)
    // encode alone (the index-build scan) must be codegen'd — 64
    // unrolled affine expressions are fine; it is the COLLAPSED
    // encode+error+score projection that overflows 64 KB (q_sq8
    // checkpoints between them; sq8Encode documents the contract)
    val hasCodegenProject = enc.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec if w.collect { case p: ProjectExec => p }.nonEmpty => w
    }.nonEmpty
    assert(hasCodegenProject, enc.queryExecution.executedPlan.toString)
  }

  test("domainSoftmaxWeights: one corpus aggregate; normalizers broadcast back") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(col("source"), (col("n_chars") % 7).cast("double").as("avg_nll"),
        col("n_chars").as("n_bigrams"))
    val out = graft.operators.Curation.domainSoftmaxWeights(
      docs, "source", "avg_nll", "n_bigrams")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "the single-row totals must broadcast, never shuffle the domain table:\n" + plan)
    assert(!plan.contains("SortMergeJoin"),
      "no sort-merge anywhere in a domain-cardinality rollup:\n" + plan)
  }

  test("ngramOverlap: cand/ref gram counts meet in an equi-join on (doc, n, gram)") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("ref"),
        regexp_replace(col("text"), "\\bthe\\b", " ").as("cand"))
    val out = graft.operators.Evaluation.ngramOverlap(docs, "cand", "ref", "doc_id", maxN = 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "clipped-match counting must be a keyed join, never a product:\n" + plan)
  }

  test("kaplanMeier: windows partition the counts table, never one global task") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(col("lang"), (col("n_chars") % 20).as("dur"),
        (col("n_chars") % 3 === 0).as("e"))
    val out = graft.operators.Analytics.kaplanMeier(docs, "lang", "dur", "e")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty &&
      windowLines.forall(l => !l.contains("Window") || l.contains("lang")),
      "every window frame must be group-partitioned:\n" + plan)
  }

  test("pseudonymize: stateless scan — zero exchanges, projection pruned to its columns") {
    val cust = graft.sources.ParquetConnector.readTable(spark, s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val out = graft.operators.Privacy.pseudonymize(cust, Seq("c_name"), "salt")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "tokenization must not shuffle:\n" + plan)
    val rs = scanOf(out).metadata("ReadSchema")
    assert(!rs.contains("c_acctbal"), "untouched columns must stay pruned: " + rs)
  }

  test("knnClassify: query batch broadcasts; the labeled corpus never sort-merges") {
    val emb = graft.sources.ParquetConnector.readTable(spark, s"$sf/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val queries = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val out = graft.operators.Similarity.knnClassify(corpus, "embedding",
      "vec_id", "label", queries, "qv", "q_id", k = 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "the query batch must broadcast against the corpus scan:\n" + plan)
    assert(!plan.contains("CartesianProduct"),
      "scoring must never materialize a shuffled product:\n" + plan)
  }

  test("ngramDiversity: gram counts partial-aggregate before the exchange") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val out = graft.operators.Profile.ngramDiversity(docs, "text", "lang", maxN = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // two-level aggregate: hot (boilerplate) grams must collapse map-side
    // — a partial_count before each exchange
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      "gram counting must map-side combine:\n" + plan)
    assert(!plan.contains("Window"), "diversity is aggregation, never a window:\n" + plan)
  }

  test("spanCorrupt: every window partitions by document — no corpus-wide frame") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
    val out = graft.operators.Curation.spanCorrupt(docs, "text", "doc_id", 15, 100, 42)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty &&
      windowLines.forall(l => !l.contains("Window") || l.contains("_id")),
      "mask runs must stay inside per-document frames:\n" + plan)
  }

  test("sft render: windows partition by conversation") {
    val docs = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(expr("doc_id div 4").as("conv_id"),
        pmod(col("doc_id"), lit(4L)).as("turn"),
        when(pmod(col("doc_id"), lit(2L)) === 0, "user").otherwise("assistant").as("role"),
        substring(col("text"), 1, 40).as("content"))
    val out = graft.operators.Sft.renderConversations(docs, "conv_id", "turn",
      "role", "content")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty &&
      windowLines.forall(l => !l.contains("Window") || l.contains("conv_id")),
      "offsets must stay inside per-conversation frames:\n" + plan)
  }

  test("ratioMetricCI: one partial-aggregated moment pass — no join, no window") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
      .select(col("event_type"), col("value").as("y"),
        (pmod(col("event_id"), lit(5L)) + 1L).cast("double").as("x"))
    val out = graft.operators.Analytics.ratioMetricCI(ev, "event_type", "y", "x")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "delta-method CI is one moment aggregation:\n" + plan)
    assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      "one shuffle of pre-aggregated moments:\n" + plan)
  }

  test("spearman: rank windows run on aggregated distinct tables, equi-joins only") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
      .select(col("event_type"), col("value"),
        pmod(col("user_id"), lit(97L)).cast("double").as("proxy"))
    val out = graft.operators.Analytics.spearman(ev, "event_type", "value", "proxy")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      "rank joins must stay equi:\n" + plan)
    // both rank windows partition per group — no corpus-wide frame
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("event_type")),
      "rank windows must partition by the group key:\n" + plan)
    // windows consume the (group, value) COUNT tables, so a partial +
    // final HashAggregate pair exists under each
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      "distinct-value tables must aggregate before ranking:\n" + plan)
  }

  test("snapshotKs: per-feature melt is row-local; KS needs no join at all") {
    val d = graft.sources.ParquetConnector.readTable(spark, s"$sf/documents.parquet")
      .select(col("n_chars"), length(col("text")).cast("long").as("n_len"))
    val out = graft.operators.Analytics.snapshotKs(d, d, Seq("n_chars", "n_len"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), "KS is union + aggregate + windows:\n" + plan)
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("feature")),
      "ECDF windows must partition per feature:\n" + plan)
  }

  test("cuped: per-arm moments aggregate partially; theta joins back equi, no cartesian") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
      .select(col("event_type"),
        when(pmod(col("user_id"), lit(2L)) === 0L, lit("c")).otherwise(lit("t")).as("v"),
        col("value"), (col("value") * 0.5).as("pre"))
    val out = graft.operators.Analytics.cuped(ev, "event_type", "v", "value", "pre")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      "pooled-theta join must stay equi:\n" + plan)
    // the join operands are arm-table-sized (the corpus was reduced by the
    // eager per-arm checkpoint), so no file scan appears below the join
    assert(!plan.contains("FileScan"),
      "corpus must be consumed by the checkpointed arm table:\n" + plan)
  }

  test("ipsEstimate: one partial-aggregated pass — no join, no window, one exchange") {
    val ev = graft.sources.ParquetConnector.readTable(spark, s"$sf/events.parquet")
      .select(col("event_type"),
        (pmod(col("event_id"), lit(900000L)) + 1L).as("prop_fp"),
        (pmod(col("event_id") + 7L, lit(900000L)) + 1L).as("target_fp"),
        floor(col("value") * 1000000.0).cast("long").as("reward_fp"))
    val out = graft.operators.Preference.ipsEstimate(ev, "event_type",
      "prop_fp", "target_fp", "reward_fp")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "IPS is one aggregation pass:\n" + plan)
    assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      "one shuffle of pre-aggregated partials:\n" + plan)
  }
}
