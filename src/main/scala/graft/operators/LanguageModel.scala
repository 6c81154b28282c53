package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** KenLM-style n-gram language-model quality scoring — the CCNet recipe
  * (Wenzek et al. 2020): train add-k-smoothed bigram counts on a trusted
  * reference slice (CCNet uses Wikipedia), then score every corpus
  * document by its mean per-bigram negative log-likelihood under that
  * model. High-NLL documents are gibberish, boilerplate, or
  * out-of-domain; the score is the standard threshold input for
  * head/middle/tail quality binning of a pretraining corpus.
  *
  * Everything is count arithmetic — no floating-point model state — so
  * the whole train→score pipeline is deterministic and externally
  * replayable (the `q_perplexity` oracle recomputes it end-to-end in
  * DuckDB).
  *
  * Scale shape: the model side is bounded by the REFERENCE slice, not
  * the corpus — vocabulary is a driver-collected top-K token array
  * (≤ `vocabSize` strings, the [[Similarity.trainCentroids]] trade),
  * bigram/first-token count tables are lazy DataFrames that broadcast
  * when small (a reference-slice LM is; AQE falls back to a shuffle
  * join on (w1, w2) for a corpus-sized one). The corpus side never
  * shuffles text: documents explode to (doc, w1, w2) bigram rows
  * map-side, join the broadcast counts, and partially aggregate to one
  * (doc, sum, count) row per task before the per-doc exchange.
  */
object LanguageModel {

  /** Out-of-vocabulary sentinel. U+0001 cannot survive
    * [[TextFunctions.normalizeForFingerprint]]'s lowercase/collapse
    * pipeline as a standalone token of real text, so it never collides
    * with a vocabulary entry. */
  val Unk = "\u0001"

  /** A trained bigram LM: `vocabTokens` is the driver-side top-K
    * vocabulary (frequency desc, token asc — deterministic tie-break),
    * `bigrams` the (w1, w2, c12) counts and `totals` the (w1, c1)
    * first-position totals over the UNK-mapped reference stream. The
    * count DataFrames are lazy and unpersisted: a caller scoring many
    * corpora against one model should persist them (train once, score
    * many — the CCNet usage), otherwise the reference is re-scanned per
    * score run. */
  final case class BigramLm(vocabTokens: Array[String],
                            bigrams: DataFrame,
                            totals: DataFrame) {
    /** Smoothing event space: vocabulary plus the UNK bucket. */
    def eventSpace: Double = vocabTokens.length + 1.0
  }

  /** Normalized token array of `c` (lowercase, whitespace collapsed) —
    * empty/whitespace-only text yields a single empty token, which the
    * `size >= 2` bigram guard then drops. */
  private def tokensCol(c: Column): Column =
    split(TextFunctions.normalizeForFingerprint(c), " ")

  /** Exploded (id, w1, w2) bigram stream of `df`. Codegen-friendly by
    * construction: slice + arrays_zip + explode are native expressions
    * (no higher-order lambdas, which would drop the projection to
    * interpreted eval). Documents with fewer than two tokens contribute
    * no rows. */
  private def bigramStream(df: DataFrame, textCol: String, idExpr: Column): DataFrame =
    df.select(idExpr.as("_lmid"), tokensCol(col(textCol)).as("_t"))
      .withColumn("_n", size(col("_t")))
      .filter(col("_n") >= 2)
      .withColumn("_w1s", slice(col("_t"), lit(1), col("_n") - 1))
      .withColumn("_w2s", slice(col("_t"), lit(2), col("_n") - 1))
      .select(col("_lmid"), explode(arrays_zip(col("_w1s"), col("_w2s"))).as("_bg"))
      .select(col("_lmid"), col("_bg._w1s").as("_w1"), col("_bg._w2s").as("_w2"))

  /** Map both bigram positions through the vocabulary, OOV → [[Unk]].
    * The vocabulary is a driver array — the membership test is two
    * broadcast joins against a tiny local relation, never a shuffle of
    * the stream. */
  private def mapUnk(stream: DataFrame, vocabTokens: Array[String]): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val v1 = broadcast(vocabTokens.toSeq.toDF("_v1"))
    val v2 = broadcast(vocabTokens.toSeq.toDF("_v2"))
    stream
      .join(v1, col("_w1") === col("_v1"), "left")
      .join(v2, col("_w2") === col("_v2"), "left")
      .select(col("_lmid"),
        when(col("_v1").isNull, lit(Unk)).otherwise(col("_w1")).as("_w1"),
        when(col("_v2").isNull, lit(Unk)).otherwise(col("_w2")).as("_w2"))
  }

  /** Train a bigram LM on `ref` (the trusted reference slice). Runs ONE
    * eager job — the top-`vocabSize` vocabulary is collected to the
    * driver (bounded: `vocabSize` strings; same documented trade as the
    * samplers' min/max scan and [[Similarity.trainCentroids]]). The
    * bigram and first-token count tables remain lazy. */
  def train(ref: DataFrame, textCol: String, vocabSize: Int = 50000): BigramLm = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val vocabTokens = TextFunctions.vocabulary(ref, textCol, vocabSize)
      .select("token").collect().map(_.getString(0))
    val mapped = mapUnk(bigramStream(ref, textCol, lit(0L)), vocabTokens)
    // r19 note: the two scoring-plan references (`bigrams` and `totals`)
    // both sit above the SAME groupBy exchange, which ReuseExchange
    // already dedupes within one job — an eager train-time checkpoint
    // here measured SLOWER (q_ppl_mix 2.51 → 2.87 s), so the table
    // stays lazy. trainKn is different: its five tables join as five
    // DISTINCT exchange shapes, where materializing tri/contBi wins.
    val bigrams = mapped.groupBy("_w1", "_w2").agg(count(lit(1)).as("_c12"))
    val totals = bigrams.groupBy("_w1").agg(sum("_c12").as("_c1"))
    BigramLm(vocabTokens, bigrams, totals)
  }

  /** Score every document of `df`: (id, n_bigrams, avg_nll, ppl) where
    * avg_nll = mean over the document's UNK-mapped bigrams of
    * −ln((c12 + k) / (c1 + k·(|V|+1))) and ppl = e^avg_nll. Documents
    * with no bigram (fewer than two tokens) keep n_bigrams = 0 and null
    * scores — callers decide their fate, the scorer doesn't.
    *
    * Determinism across engines: each bigram NLL quantizes to a 1e-8
    * FIXED-POINT LONG via `floor(nll * 1e8)` — pure IEEE double
    * arithmetic plus an exact floor, bit-identical in any engine. (The
    * previous `round(nll, 8)` was NOT: its half-way cases resolve by
    * decimal string in Spark but by binary value in DuckDB — the 1-ulp
    * divergence that bit the NB classifier at sf0.01.) Long sums are
    * order-independent, and the 4-decimal mean is computed half-up in
    * pure integer arithmetic (nll ≥ 0 always, since the smoothed bigram
    * probability is < 1), so the reported average involves no
    * engine-defined double rounding at all. */
  def scoreNll(df: DataFrame, textCol: String, idCol: String,
               lm: BigramLm, addK: Double = 0.5): DataFrame = {
    require(addK > 0.0, s"addK must be > 0 (unsmoothed zero-count bigrams have no finite NLL), got $addK")
    val stream = mapUnk(bigramStream(df, textCol, col(idCol)), lm.vocabTokens)
    val nll = -log(
      (coalesce(col("_c12"), lit(0L)).cast("double") + lit(addK)) /
        (coalesce(col("_c1"), lit(0L)).cast("double") + lit(addK) * lit(lm.eventSpace)))
    val perDoc = stream
      .join(lm.bigrams, Seq("_w1", "_w2"), "left")
      .join(lm.totals, Seq("_w1"), "left")
      .select(col("_lmid"), floor(nll * lit(1e8)).cast("long").as("_nllF"))
      .groupBy("_lmid")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_nllF")).as("_sumF"))
      .select(col("_lmid"), col("n_bigrams"),
        // exact half-up mean at 4 decimals in integer arithmetic:
        // avg4 = ⌊(Σ + n·5000) / (n·10000)⌋ (all terms ≥ 0, so the
        // `div` truncation IS floor), then an exact decimal ×1e-4
        (expr("(_sumF + n_bigrams * 5000) div (n_bigrams * 10000)")
          .cast("decimal(20,0)") * lit(BigDecimal("0.0001")))
          .cast("double").as("avg_nll"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("_lmid", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"),
        (round(exp(col("avg_nll")), 4) + lit(0.0)).as("ppl"))
  }

  /** CCNet head/middle/tail quality binning (Wenzek et al. 2020 §4.3):
    * split the SCORED corpus into perplexity thirds — `head` = the
    * best-scored third (lowest NLL), `tail` = the worst — the standard
    * curriculum/quality partition of a pretraining corpus (CCNet
    * computes thirds per language; call per language slice for that).
    *
    * Deterministic at any parallelism and externally replayable: the
    * two cutoffs are the EXACT ranked boundary elements of the total
    * order (`scoreCol` asc, `idCol` asc) at positions ⌈n/3⌉ and ⌈2n/3⌉,
    * and membership compares the (score, id) PAIR lexicographically —
    * ties cannot overfill a bucket in either engine. Documents with a
    * null score (no bigram evidence) keep a null bucket; callers decide
    * their fate, as with [[scoreNll]].
    *
    * Scale shape: eager driver actions at call time (a count and two
    * ranked-boundary lookups — the documented sampler trade:
    * plan-construction runs jobs), then one comparison pass; no window
    * over the corpus, no full sort. The boundary lookup is a top-⌈2n/3⌉
    * TakeOrdered — cheap up to ~10⁸ scored docs per call (CCNet bins per
    * LANGUAGE slice, which holds slices in that regime); for a larger
    * slice swap the cutoffs to `approx_percentile`, losing external
    * replayability but nothing else. */
  def qualityBuckets(scored: DataFrame, idCol: String,
                     scoreCol: String = "avg_nll",
                     bucketCol: String = "bucket"): DataFrame = {
    // persist the (score, id) projection for the three eager lookups
    // below (count + two ranked boundaries): without it each lookup
    // re-evaluates the caller's full upstream chain — for an LM-scored
    // corpus that is the whole train+score pipeline, 3x. Two narrow
    // columns, so the cache is corpus-row-count-bounded, not text-sized.
    val s = scored.filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("double").as("_s"), col(idCol).as("_i"))
      .persist()
    try {
    val n = s.count()
    if (n == 0L) return scored.withColumn(bucketCol, lit(null).cast("string"))
    def boundary(k: Long): (Double, Any) = {
      // k-th element of the (score, id) total order: TakeOrdered(k) then
      // one struct-max — distributed top-k, never a full sort
      val r = s.orderBy(col("_s"), col("_i")).limit(k.toInt)
        .agg(max(struct(col("_s"), col("_i"))).as("m"))
        .head().getStruct(0)
      (r.getDouble(0), r.get(1))
    }
    val k1 = math.ceil(n / 3.0).toLong
    val k2 = math.ceil(2.0 * n / 3.0).toLong
    // TakeOrdered caps at Int.MaxValue rows; beyond ~6B scored docs the
    // exact ranked boundary needs a two-pass rank (or switch cutoffs to
    // approx_percentile and give up external replayability)
    require(k2 <= Int.MaxValue.toLong,
      s"qualityBuckets exact boundary lookup caps at ${Int.MaxValue} scored docs per call, got $n")
    val (c1s, c1i) = boundary(k1)
    val (c2s, c2i) = boundary(k2)
    def le(cs: Double, ci: Any): Column =
      (col(scoreCol) < cs) ||
        ((col(scoreCol) === cs) && (col(idCol) <= lit(ci)))
    scored.withColumn(bucketCol,
      when(col(scoreCol).isNull, lit(null).cast("string"))
        .when(le(c1s, c1i), "head")
        .when(le(c2s, c2i), "middle")
        .otherwise("tail"))
    } finally s.unpersist(false)
  }

  // ---- Interpolated Kneser–Ney trigram LM ----
  //
  // The production CCNet gate is a KenLM n-gram model with modified
  // Kneser–Ney smoothing (Wenzek et al. 2020 §4.2; Heafield 2011) — the
  // add-k bigram above is its teaching-size stand-in. This is the real
  // recipe at trigram order with a single fixed discount D:
  //
  //   P(w3|w1w2) = (max(c(w1w2w3)−D, 0) + D·N1+(w1w2•)·P(w3|w2)) / c(w1w2•)
  //   P(w3|w2)   = (max(N1+(•w2w3)−D, 0) + D·N1+(w2•)·P(w3)) / N1+(•w2•)
  //   P(w3)      = (max(N1+(•w3)−D, 0) + D·T1/(|V|+1)) / N1+(••)
  //
  // with full backoff (an unseen context falls through to the next
  // order) and the unigram interpolating against the uniform
  // distribution over the closed UNK-mapped event space — so every
  // trigram, including all-UNK, has P > 0 and a finite NLL. ALL
  // statistics (plain and continuation counts) derive from the single
  // UNK-mapped trigram event stream of the reference slice — one
  // consistent event space, no separate bigram pass.
  //
  // Engine parity is the [[scoreNll]] contract: counts are exact
  // integers; the probability arithmetic is IEEE doubles composed in a
  // FIXED operator order (mirrored token-for-token by the `q_kn_trigram`
  // oracle); each trigram NLL floor-quantizes to a 1e-8 fixed-point
  // long; per-doc means are pure integer arithmetic. P ≤ 1 by
  // construction, so the quantized NLL is never negative and the
  // half-up integer mean's `div` truncation is exact floor.

  /** A trained KN trigram model. Count DataFrames are lazy and
    * unpersisted (train once / score many callers should persist, as
    * with [[BigramLm]]); `n1pAll` (distinct (w2,w3) context pairs) and
    * `t1Types` (distinct continuation types) are driver scalars — two
    * bounded count jobs at train time. */
  final case class KnTrigramLm(vocabTokens: Array[String],
                               tri: DataFrame,      // (_w1,_w2,_w3) -> _c3
                               pre12: DataFrame,    // (_w1,_w2) -> _t12, _n12
                               contBi: DataFrame,   // (_w2,_w3) -> _n1p23
                               contMid: DataFrame,  // (_w2) -> _t2c, _n2f
                               contUni: DataFrame,  // (_w3) -> _n1p3
                               n1pAll: Long, t1Types: Long) {
    def eventSpace: Double = vocabTokens.length + 1.0
  }

  /** Exploded (id, w1, w2, w3) trigram stream — the [[bigramStream]]
    * shape one order up; documents with fewer than three tokens
    * contribute no rows. */
  private def trigramStream(df: DataFrame, textCol: String, idExpr: Column): DataFrame =
    df.select(idExpr.as("_lmid"), tokensCol(col(textCol)).as("_t"))
      .withColumn("_n", size(col("_t")))
      .filter(col("_n") >= 3)
      .withColumn("_w1s", slice(col("_t"), lit(1), col("_n") - 2))
      .withColumn("_w2s", slice(col("_t"), lit(2), col("_n") - 2))
      .withColumn("_w3s", slice(col("_t"), lit(3), col("_n") - 2))
      .select(col("_lmid"), explode(arrays_zip(col("_w1s"), col("_w2s"), col("_w3s"))).as("_tg"))
      .select(col("_lmid"), col("_tg._w1s").as("_w1"),
        col("_tg._w2s").as("_w2"), col("_tg._w3s").as("_w3"))

  /** UNK-map all three trigram positions (broadcast joins, as
    * [[mapUnk]]). */
  private def mapUnk3(stream: DataFrame, vocabTokens: Array[String]): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val v1 = broadcast(vocabTokens.toSeq.toDF("_v1"))
    val v2 = broadcast(vocabTokens.toSeq.toDF("_v2"))
    val v3 = broadcast(vocabTokens.toSeq.toDF("_v3"))
    stream
      .join(v1, col("_w1") === col("_v1"), "left")
      .join(v2, col("_w2") === col("_v2"), "left")
      .join(v3, col("_w3") === col("_v3"), "left")
      .select(col("_lmid"),
        when(col("_v1").isNull, lit(Unk)).otherwise(col("_w1")).as("_w1"),
        when(col("_v2").isNull, lit(Unk)).otherwise(col("_w2")).as("_w2"),
        when(col("_v3").isNull, lit(Unk)).otherwise(col("_w3")).as("_w3"))
  }

  /** Train the KN trigram model on `ref`. One vocabulary job + two
    * scalar count jobs run eagerly; the count tables stay lazy. */
  def trainKn(ref: DataFrame, textCol: String, vocabSize: Int = 50000): KnTrigramLm = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val vocabTokens = TextFunctions.vocabulary(ref, textCol, vocabSize)
      .select("token").collect().map(_.getString(0))
    val m = mapUnk3(trigramStream(ref, textCol, lit(0L)), vocabTokens)
    // r19: materialize the trigram count table (and the continuation
    // bigrams derived from it) at train time. Both were lazy, and the
    // five count tables a [[knTrigramNll]] scoring join references all
    // derive from `tri` — so one scoring run re-tokenized and
    // re-counted the reference slice FIVE times (tri, pre12, contBi,
    // contMid, contUni), plus twice more for trainKn's own eager
    // n1pAll/t1Types counts. Checkpointed, the reference corpus is
    // tokenized exactly once; everything downstream aggregates
    // model-sized tables — the same rows [[saveKn]] would persist.
    val tri = m.groupBy("_w1", "_w2", "_w3").agg(count(lit(1)).as("_c3"))
      .localCheckpoint(true)
    val pre12 = tri.groupBy("_w1", "_w2")
      .agg(sum("_c3").as("_t12"), count(lit(1)).as("_n12"))
    val contBi = tri.groupBy("_w2", "_w3")
      .agg(countDistinct("_w1").as("_n1p23"))
      .localCheckpoint(true)
    val contMid = contBi.groupBy("_w2")
      .agg(sum("_n1p23").as("_t2c"), count(lit(1)).as("_n2f"))
    val contUni = contBi.groupBy("_w3").agg(count(lit(1)).as("_n1p3"))
    KnTrigramLm(vocabTokens, tri, pre12, contBi, contMid, contUni,
      n1pAll = contBi.count(), t1Types = contUni.count())
  }

  /** Persist a trained KN model into `conn` under `prefix`: the five
    * count tables plus a (rank, token) vocab table and a 1-row meta
    * table of the driver scalars — the train-once / serve-many
    * lifecycle (offline training job writes the model; scoring jobs
    * and [[graft.streaming.IncrementalStream.knScoreStream]] load it
    * without touching the reference corpus again). */
  def saveKn(lm: KnTrigramLm, conn: graft.sources.Connector, prefix: String): Unit = {
    val spark = lm.tri.sparkSession
    import spark.implicits._
    conn.write(lm.tri, s"${prefix}_tri")
    conn.write(lm.pre12, s"${prefix}_pre12")
    conn.write(lm.contBi, s"${prefix}_contbi")
    conn.write(lm.contMid, s"${prefix}_contmid")
    conn.write(lm.contUni, s"${prefix}_contuni")
    conn.write(lm.vocabTokens.toSeq.zipWithIndex
      .map { case (t, i) => (i, t) }.toDF("rank", "token"), s"${prefix}_vocab")
    conn.write(Seq((lm.n1pAll, lm.t1Types)).toDF("n1p_all", "t1_types"), s"${prefix}_meta")
  }

  /** Load a [[saveKn]]-persisted model. The vocab collect is bounded by
    * vocabSize; the count tables stay lazy reads of the persisted
    * parquet — scoring against a loaded model re-reads the MODEL, never
    * the reference corpus. */
  def loadKn(conn: graft.sources.Connector, prefix: String): KnTrigramLm = {
    val vocab = conn.read(s"${prefix}_vocab").orderBy(col("rank"))
      .select("token").collect().map(_.getString(0))
    val meta = conn.read(s"${prefix}_meta").head()
    KnTrigramLm(vocab,
      conn.read(s"${prefix}_tri"), conn.read(s"${prefix}_pre12"),
      conn.read(s"${prefix}_contbi"), conn.read(s"${prefix}_contmid"),
      conn.read(s"${prefix}_contuni"),
      meta.getAs[Long]("n1p_all"), meta.getAs[Long]("t1_types"))
  }

  /** Score every document of `df` by mean interpolated-KN trigram NLL:
    * (id, n_trigrams, avg_nll, ppl), nulls for documents with fewer
    * than three tokens — the [[scoreNll]] output contract one order
    * up. `discountNum/discountDen` is the exact rational discount D
    * (default 3/4 — the classic fixed-D choice; estimate
    * n1/(n1+2·n2) offline for a tuned value). */
  /** The per-trigram fixed-point NLL stream under `lm` — (_lmid,
    * _nllF): every KN backoff evaluation as a 10⁸-scale long, the
    * shared core of [[scoreKnNll]]'s mean and [[minKProb]]'s
    * worst-k% readout. */
  private[graft] def knTrigramNll(df: DataFrame, textCol: String, idCol: String,
                                  lm: KnTrigramLm, discountNum: Long,
                                  discountDen: Long): DataFrame = {
    require(discountNum >= 0 && discountDen > 0 && discountNum <= discountDen,
      s"need 0 <= D = $discountNum/$discountDen <= 1")
    val dD = lit(discountNum.toDouble / discountDen.toDouble)
    val stream = mapUnk3(trigramStream(df, textCol, col(idCol)), lm.vocabTokens)
    // tri/pre12/contBi scale with context diversity (up to (V+1)³ /
    // (V+1)² / (V+1)² types) — shuffle joins; contMid and contUni are
    // bounded by V+1 ROWS, broadcast them so the stream crosses two
    // fewer exchanges.
    val joined = stream
      .join(lm.tri, Seq("_w1", "_w2", "_w3"), "left")
      .join(lm.pre12, Seq("_w1", "_w2"), "left")
      .join(lm.contBi, Seq("_w2", "_w3"), "left")
      .join(broadcast(lm.contMid), Seq("_w2"), "left")
      .join(broadcast(lm.contUni), Seq("_w3"), "left")
    // fixed-order IEEE composition, mirrored verbatim by the oracle
    val p1 = (greatest(coalesce(col("_n1p3"), lit(0L)).cast("double") - dD, lit(0.0)) +
      dD * lit(lm.t1Types.toDouble) / lit(lm.eventSpace)) / lit(lm.n1pAll.toDouble)
    val p2 = when(coalesce(col("_t2c"), lit(0L)) > 0,
      (greatest(coalesce(col("_n1p23"), lit(0L)).cast("double") - dD, lit(0.0)) +
        dD * coalesce(col("_n2f"), lit(0L)).cast("double") * p1) /
        coalesce(col("_t2c"), lit(0L)).cast("double"))
      .otherwise(p1)
    val p3 = when(coalesce(col("_t12"), lit(0L)) > 0,
      (greatest(coalesce(col("_c3"), lit(0L)).cast("double") - dD, lit(0.0)) +
        dD * coalesce(col("_n12"), lit(0L)).cast("double") * p2) /
        coalesce(col("_t12"), lit(0L)).cast("double"))
      .otherwise(p2)
    joined.select(col("_lmid"), floor(-log(p3) * lit(1e8)).cast("long").as("_nllF"))
  }

  def scoreKnNll(df: DataFrame, textCol: String, idCol: String,
                 lm: KnTrigramLm, discountNum: Long = 3L,
                 discountDen: Long = 4L): DataFrame = {
    val perDoc = knTrigramNll(df, textCol, idCol, lm, discountNum, discountDen)
      .groupBy("_lmid")
      .agg(count(lit(1)).as("n_trigrams"), sum(col("_nllF")).as("_sumF"))
      .select(col("_lmid"), col("n_trigrams"),
        (expr("(_sumF + n_trigrams * 5000) div (n_trigrams * 10000)")
          .cast("decimal(20,0)") * lit(BigDecimal("0.0001")))
          .cast("double").as("avg_nll"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("_lmid", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("avg_nll"),
        (round(exp(col("avg_nll")), 4) + lit(0.0)).as("ppl"))
  }

  /** Min-K% Prob membership/memorization audit (Shi et al. 2023,
    * "Detecting Pretraining Data from Large Language Models"): a
    * document the model has SEEN scores its worst tokens much better
    * than an unseen document of the same average quality — so the mean
    * NLL of the k% HIGHEST-NLL trigrams (the lowest-probability ones)
    * separates members from non-members where the plain mean cannot.
    * The curation read: docs whose `min_k_avg_nll` sits anomalously
    * close to `avg_nll` under a benchmark-trained LM are contamination
    * suspects; under the production LM, memorization suspects.
    *
    * Exactness & scale: the per-trigram NLL stream is [[scoreKnNll]]'s
    * exact fixed-point core; the worst-k% selection is a row_number
    * over the DOC-BOUNDED partition ordered by (NLL desc) — ties
    * beyond the cut are sum-invariant (equal values), so the readout
    * is deterministic without a tie-break column — with
    * k = ⌈n·kNum/kDen⌉ in integer arithmetic and both means the
    * half-up 10⁻⁴ rounding idiom (`q_minkprob` replays everything).
    *
    * Output: (idCol, n_trigrams, k_trigrams, avg_nll, min_k_avg_nll) —
    * unscored docs (< 3 tokens) carry zero counts and null means. */
  def minKProb(df: DataFrame, textCol: String, idCol: String,
               lm: KnTrigramLm, kNum: Int = 1, kDen: Int = 5,
               discountNum: Long = 3L, discountDen: Long = 4L): DataFrame = {
    require(kNum >= 1 && kDen >= kNum, s"need 0 < k = $kNum/$kDen <= 1")
    val nll = knTrigramNll(df, textCol, idCol, lm, discountNum, discountDen)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_lmid")).orderBy(col("_nllF").desc)
    val ranked = nll
      .withColumn("_r", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_lmid"))))
      .withColumn("_m", expr(s"(_n * $kNum + ${kDen - 1}) DIV $kDen"))
    def meanFp(sumCol: String, nCol: String) =
      (expr(s"($sumCol + $nCol * 5000) div ($nCol * 10000)")
        .cast("decimal(20,0)") * lit(BigDecimal("0.0001"))).cast("double")
    val perDoc = ranked.groupBy(col("_lmid"), col("_n"), col("_m"))
      .agg(sum(col("_nllF")).as("_sumAll"),
        sum(when(col("_r") <= col("_m"), col("_nllF")).otherwise(lit(0L)))
          .as("_sumK"))
      .select(col("_lmid"), col("_n"), col("_m"),
        meanFp("_sumAll", "_n").as("avg_nll"),
        meanFp("_sumK", "_m").as("min_k_avg_nll"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("_lmid", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_n"), lit(0L)).as("n_trigrams"),
        coalesce(col("_m"), lit(0L)).as("k_trigrams"),
        col("avg_nll"), col("min_k_avg_nll"))
  }
}
