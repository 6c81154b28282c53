package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Trained multinomial Naive Bayes document classifier — the
  * linear-classifier quality/domain filter of the published LLM
  * pipelines (the GPT-3 WebText-vs-CommonCrawl quality classifier and
  * fastText-style curation filters are exactly this shape: bag-of-words
  * features, per-class token log-odds, argmax/threshold). Complements
  * the UNTRAINED n-gram heuristic in `TextFunctions.langId`: this one
  * learns its table from a labeled reference slice.
  *
  * Like [[LanguageModel]], everything is count arithmetic: the whole
  * train→score→argmax pipeline is deterministic and externally
  * replayable (`q_nb_classify` recomputes it end-to-end in DuckDB).
  * Per-token log-probabilities quantize to FIXED-POINT LONGS at 1e-8
  * scale — `floor(logp * 1e8)` is pure IEEE double arithmetic plus an
  * exact floor, so the quantized value is bit-identical in any engine
  * (unlike `round(double, 8)`, whose half-way cases resolve by
  * decimal-string in Spark but by binary value in DuckDB — a live 1-ulp
  * divergence found at sf0.01). Long sums are order-independent AND
  * cheaper than DECIMAL aggregation; the only decimal op is the final
  * exact ×1e-8 + round(4) for the reported score. Argmax resolves ties
  * by label ascending through an exact min over the tied label set.
  *
  * Scale shape: model state is bounded by (vocabSize × numLabels)
  * counts and collected ONLY for labels/priors (numLabels scalars);
  * the count table stays a DataFrame that broadcasts when small. The
  * corpus side explodes to tokens map-side, crosses with the tiny
  * label list (|labels|× row multiplier — the standard NB scoring
  * join), joins the counts, and partially aggregates per (doc, label)
  * before the only exchange of the stream.
  */
object TextClassifier {

  /** A trained model: `labels` sorted ascending with `logPriorsFixed`
    * aligned (ln of class doc-share as 1e-8 fixed-point longs — see the
    * class doc for why fixed-point); `tokenCounts` = (_label, _w, _c)
    * over the UNK-mapped reference token stream; `totals` = per-class
    * token totals aligned with `labels` (collected — numLabels
    * scalars); `vocabTokens` the driver-side top-K vocabulary
    * ([[LanguageModel.train]] trade). */
  final case class NaiveBayesModel(labels: Array[String],
                                   logPriorsFixed: Array[Long],
                                   totals: Array[Long],
                                   tokenCounts: DataFrame,
                                   vocabTokens: Array[String]) {
    def eventSpace: Double = vocabTokens.length + 1.0
  }

  /** Normalized non-empty token stream (id, w) of `df` — lowercase,
    * whitespace-collapsed, empty tokens dropped (an empty document
    * contributes no rows and classifies to null). */
  private def tokenStream(df: DataFrame, textCol: String, idExpr: Column): DataFrame =
    df.select(idExpr.as("_nbid"),
        explode(split(TextFunctions.normalizeForFingerprint(col(textCol)), " ")).as("_w"))
      .filter(length(col("_w")) > 0)

  /** OOV → the [[LanguageModel.Unk]] sentinel via one broadcast join
    * against the driver-side vocabulary. */
  private def mapUnk(stream: DataFrame, vocabTokens: Array[String]): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val v = broadcast(vocabTokens.toSeq.toDF("_v"))
    stream.join(v, col("_w") === col("_v"), "left")
      .select(col("_nbid"),
        when(col("_v").isNull, lit(LanguageModel.Unk)).otherwise(col("_w")).as("_w"))
  }

  /** Train on `ref` with classes from `labelCol` (null labels are
    * rejected loudly — a silent "null" class is never what a caller
    * wants). Eager driver work is bounded: the top-`vocabSize`
    * vocabulary, the sorted label list, one (docs, tokens) scalar pair
    * per label. */
  def train(ref: DataFrame, textCol: String, labelCol: String,
            vocabSize: Int = 50000): NaiveBayesModel = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val nullLabels = ref.filter(col(labelCol).isNull).limit(1).count()
    require(nullLabels == 0L, s"train: null values in label column '$labelCol'")
    val vocabTokens = TextFunctions.vocabulary(ref, textCol, vocabSize)
      .select("token").collect().map(_.getString(0))
    val perClass = ref.groupBy(col(labelCol).cast("string").as("_label"))
      .agg(count(lit(1)).as("_docs"))
      .orderBy("_label").collect()
    val labels = perClass.map(_.getString(0))
    val nTotal = perClass.map(_.getLong(1)).sum.toDouble
    val logPriorsFixed = perClass.map(r =>
      math.floor(math.log(r.getLong(1) / nTotal) * 1e8).toLong)
    val mapped = mapUnk(
      tokenStream(ref, textCol, col(labelCol).cast("string")), vocabTokens)
      .withColumnRenamed("_nbid", "_label")
    // r19: materialize the count table at train time (model-sized:
    // ≤ labels × (vocab+1) rows). Lazy, the training corpus re-tokenized
    // once for the totals collect below and once per scoring evaluation
    // (q_nb_classify measured 1.8 s checkpointed vs 2.45 s lazy; the
    // single-reference uncertaintySample path is a noise-level wash).
    val tokenCounts = mapped.groupBy("_label", "_w").agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
    val totalRows = tokenCounts.groupBy("_label").agg(sum("_c").as("_tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a class whose docs are all empty has zero tokens — still a valid
    // class (all its token probabilities are the smoothed floor)
    val totals = labels.map(l => totalRows.getOrElse(l, 0L))
    NaiveBayesModel(labels, logPriorsFixed, totals, tokenCounts, vocabTokens)
  }

  /** Classify every document of `df`: (id, label, score) where label is
    * the argmax class (ties → label ascending) of
    * logPrior(c) + Σ_tokens ln((count(w,c) + k) / (total(c) + k·(|V|+1)))
    * and score is that log-joint (1e-8 fixed-point internally) rounded
    * to 4 decimals. Documents with no token keep null label and score —
    * callers decide their fate.
    *
    * EAGER since r19 (ADVICE r19 — documented contract): constructing
    * the result runs the tokenize/score chain immediately and pins the
    * docs × labels joint table in executor storage, because the argmax
    * reads it twice; callers that only sample the result still pay one
    * full scoring pass. */
  def classify(df: DataFrame, textCol: String, idCol: String,
               model: NaiveBayesModel, addK: Double = 0.5): DataFrame = {
    require(addK > 0.0, s"addK must be > 0, got $addK")
    val perDocClass = jointScores(df, textCol, idCol, model, addK)
      // r19: the argmax below reads this table TWICE (the max aggregate
      // and the tie-resolving join back) — lazy, the whole tokenize →
      // cross → score chain ran twice per classify. Materialized, it is
      // docs × labels narrow long rows, and the chain runs once.
      .localCheckpoint(true)
    // exact argmax without a struct-valued agg buffer (those fall out of
    // HashAggregate): max joint per doc, join back, min label among the
    // exact-LONG ties — the same winner pattern as semanticDedup
    val maxJoint = perDocClass.groupBy("_nbid").agg(max("_jointF").as("_mj"))
    val best = perDocClass.join(maxJoint, Seq("_nbid"))
      .filter(col("_jointF") === col("_mj"))
      .groupBy(col("_nbid"), col("_mj"))
      .agg(min("_label").as("_bestLabel"))
      .select(col("_nbid"), col("_bestLabel"),
        // fixed → decimal is an EXACT ×1e-8 (decimal scales add under
        // multiplication), then one exact decimal round(4); both engines
        // agree on every half-way case by construction
        round(col("_mj").cast("decimal(20,0)") * lit(BigDecimal("0.00000001")), 4)
          .cast("double").as("_bestScore"))
    df.select(col(idCol))
      .join(best.withColumnRenamed("_nbid", idCol), Seq(idCol), "left")
      .select(col(idCol), col("_bestLabel").as("label"),
        (col("_bestScore") + lit(0.0)).as("score"))
  }

  /** The per-(doc, label) fixed-point joint log-probability table the
    * scorer and the selector share: one token-stream pass crossed with
    * the broadcast label table, per-token log-probs floor-quantized at
    * 1e-8 (bit-identical in every engine), summed per (doc, label).
    * Output: (_nbid, _label, _jointF long). */
  private[graft] def jointScores(df: DataFrame, textCol: String, idCol: String,
                                 model: NaiveBayesModel, addK: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // tiny literal label table: label, fixed-point prior, smoothing
    // denominator — crossed with the token stream (the |labels|× NB
    // scoring multiplier), broadcast by construction
    val labelRows = model.labels.indices.map { i =>
      (model.labels(i), model.logPriorsFixed(i),
        model.totals(i).toDouble + addK * model.eventSpace)
    }
    val labelDf = broadcast(labelRows.toDF("_label", "_priorF", "_denom"))
    val stream = mapUnk(tokenStream(df, textCol, col(idCol)), model.vocabTokens)
      .crossJoin(labelDf)
      .join(model.tokenCounts, Seq("_label", "_w"), "left")
    val logp = log((coalesce(col("_c"), lit(0L)).cast("double") + lit(addK)) / col("_denom"))
    stream
      .select(col("_nbid"), col("_label"), col("_priorF"),
        // 1e-8 fixed-point quantization: double multiply + exact floor,
        // bit-identical in every engine (see class doc)
        floor(logp * lit(1e8)).cast("long").as("_lpF"))
      .groupBy("_nbid", "_label", "_priorF")
      .agg(sum(col("_lpF")).as("_sumF"))
      .select(col("_nbid"), col("_label"),
        (col("_sumF") + col("_priorF")).as("_jointF"))
  }

  /** Active-learning selection by margin uncertainty: the `k` documents
    * whose best-vs-runner-up NB joint-score gap is SMALLEST — the rows
    * a labeling loop should send to annotators next (the classic
    * margin-sampling criterion; entropy and least-confidence reduce to
    * it for well-separated NB posteriors).
    *
    * Built on the same fixed-point joint table as [[classify]], so the
    * margin is an exact LONG difference of 1e-8-quantized scores:
    * ties, ordering, and the selection boundary are engine-exact.
    * A doc whose every label ties (margin 0) is maximally uncertain;
    * docs with no tokens have no signal and are EXCLUDED (their
    * "margin" would be pure prior spread, not text uncertainty).
    *
    * Scale shape: the joint table partial-aggregates per (doc, label),
    * is evaluated ONCE, and best/runner-up come out of a single
    * doc-keyed window + co-partitioned aggregate (the pre-r13 shape
    * joined the table back to its own aggregate, re-running the whole
    * tokenize→score subtree per reference); the global bottom-k is
    * TakeOrdered, never a full sort.
    *
    * Output: (idCol, label [current best, ties→lowest], margin_fp),
    * the k smallest margins, ties by ascending id. */
  def uncertaintySample(df: DataFrame, textCol: String, idCol: String,
                        model: NaiveBayesModel, k: Int,
                        addK: Double = 0.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_nbid")
    // one shuffle on the doc key; the groupBy below re-uses that
    // partitioning (grouping keys ⊇ partition key), so the joint table
    // is scored exactly once
    val scored = jointScores(df, textCol, idCol, model, addK)
      .withColumn("_mj", max(col("_jointF")).over(w))
    scored.groupBy(col("_nbid"), col("_mj"))
      .agg(min(when(col("_jointF") === col("_mj"), col("_label"))).as("label"),
        max(when(col("_jointF") < col("_mj"), col("_jointF"))).as("_m2"))
      .select(col("_nbid").as(idCol), col("label"),
        // all labels tied -> no runner-up row -> margin exactly 0
        (col("_mj") - coalesce(col("_m2"), col("_mj"))).as("margin_fp"))
      .orderBy(col("margin_fp").asc, col(idCol).asc)
      .limit(k)
  }

  /** χ² feature selection over the labeled corpus: for each (term,
    * class) build the document-presence contingency table (a = docs of
    * the class containing the term, b = other docs containing it, c =
    * class docs without it, d = the rest) and score
    * χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) — the classic filter
    * that picks the class-discriminative vocabulary BEFORE training the
    * NB/fastText-style classifier above. Everything upstream of the
    * score is exact integer counting (one distinct-presence pass over
    * the token stream, partial-aggregated; the grid is the bounded
    * vocab × labels frame, never corpus-scale). ad−bc is computed in
    * DECIMAL(38,0) (a,d are doc counts — products overflow longs at
    * 100 TB class sizes) and only the final χ² touches doubles, each
    * factor cast from its exact integer separately in a pinned
    * left-associated sequence, so any engine with 128-bit integers
    * replays every double bit-for-bit (`q_chi2_terms` via HUGEINT).
    * Degenerate terms (present in every document) get null χ² and are
    * dropped from the ranking, not a divide-by-zero.
    *
    * Output: (label, term, a, b, c, d, chi2, rank) — the topK terms
    * per class by (χ² desc, term asc). */
  def chi2Terms(ref: DataFrame, textCol: String, idCol: String, labelCol: String,
                vocabSize: Int = 1000, topK: Int = 20): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val nullLabels = ref.filter(col(labelCol).isNull).limit(1).count()
    require(nullLabels == 0L, s"chi2Terms: null values in label column '$labelCol'")
    val vocab = TextFunctions.vocabulary(ref, textCol, vocabSize)
      .select(col("token").as("term"))
    val docs = ref.select(col(idCol).as("_nbid"), col(labelCol).cast("string").as("label"))
    val nc = docs.groupBy("label").agg(count(lit(1)).as("nc")) // |labels| rows
    val n = docs.count()
    require(n > 0L, "chi2Terms: empty input")
    // doc-presence of vocab terms, with the class attached
    val presence = tokenStream(ref, textCol, col(idCol))
      .join(broadcast(vocab.withColumnRenamed("term", "_w")), Seq("_w"))
      .distinct()
      .join(docs, Seq("_nbid"))
    val a = presence.groupBy(col("_w").as("term"), col("label"))
      .agg(count(lit(1)).as("a"))
    val termDocs = a.groupBy("term").agg(sum("a").as("td")) // ≤ vocabSize rows
    // full vocab × labels grid so zero-presence cells score too
    val dec = "decimal(38,0)"
    val grid = broadcast(vocab).crossJoin(broadcast(nc))
      .join(a, Seq("term", "label"), "left")
      .join(broadcast(termDocs), Seq("term"), "left")
      .withColumn("a", coalesce(col("a"), lit(0L)))
      .withColumn("td", coalesce(col("td"), lit(0L)))
      .withColumn("b", col("td") - col("a"))
      .withColumn("c", col("nc") - col("a"))
      .withColumn("d", lit(n) - col("nc") - col("b"))
      .withColumn("_diff",
        col("a").cast(dec) * col("d") - col("b").cast(dec) * col("c"))
      .withColumn("chi2",
        // degenerate marginals → null (not 0/0 = NaN, which Spark would
        // rank ABOVE every real score): td ∈ {0, n} means the term is in
        // no/every doc; nc = n means a single-label corpus (nc = 0 is
        // impossible — nc counts a group that exists)
        when(col("td") =!= 0 && col("td") =!= n && col("nc") =!= n,
          (lit(n).cast("double") * col("_diff").cast("double") * col("_diff").cast("double")) /
            (col("td").cast("double") * (lit(n) - col("td")).cast("double") *
              col("nc").cast("double") * (lit(n) - col("nc")).cast("double"))))
    // the grid is vocab × labels — bounded, so the rank window is safe
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("chi2").desc, col("term").asc)
    grid.filter(col("chi2").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("label"), col("term"), col("a"), col("b"), col("c"), col("d"),
        col("chi2"), col("rank"))
  }
}
