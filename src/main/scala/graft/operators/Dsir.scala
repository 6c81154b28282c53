package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents whose hashed n-gram distribution looks
  * like a small trusted TARGET corpus. The published recipe, re-shaped
  * for Spark:
  *
  *  1. Featurize every document as counts over `numBuckets` hashed
  *     unigram+bigram buckets.
  *  2. Fit two smoothed bucket distributions — p (target) and q (raw) —
  *     and precompute the per-bucket log-ratio ln(p_b/q_b).
  *  3. Score each raw document with the sum of its n-grams' log-ratios
  *     (= the log importance weight of the bag-of-ngrams model).
  *  4. Resample: keep the top fraction by weight (the deterministic
  *     variant; the paper's Gumbel-noise sampling is one extra seeded
  *     column on the same ranked select).
  *
  * Scale shape: the bucket table is BOUNDED (`numBuckets` rows, default
  * 4096) — it broadcasts; the corpus explodes to n-grams map-side, joins
  * the broadcast table, and partially aggregates per doc before the only
  * corpus-wide exchange. Nothing corpus-sized ever shuffles on a
  * token key. The ranked-boundary select reuses the
  * [[LanguageModel.qualityBuckets]] TakeOrdered trick — no full sort,
  * no corpus-wide window.
  *
  * Determinism across engines: bucket log-ratios quantize to 1e-8
  * fixed-point longs (`floor(x*1e8)` — pure IEEE arithmetic, the same
  * contract as [[LanguageModel.scoreNll]]), so per-doc weights are long
  * sums: bit-identical under any parallelism and externally replayable.
  * The default bucketer is seeded xxhash64 (codegen'd, the 100 TB
  * path); [[polyBucket]] is the native codepoint-polynomial variant a
  * SQL oracle can replay exactly (`q_dsir` uses it end-to-end).
  */
object Dsir {

  /** Seed for the default xxhash64 bucketer — fixed so persisted weight
    * tables are stable across runs. */
  val HashSeed = 77L

  /** xxhash64 n-gram → bucket in [0, numBuckets): the production path,
    * one codegen'd expression per n-gram. */
  def hashBucket(numBuckets: Int)(g: Column): Column =
    pmod(xxhash64(lit(HashSeed), g), lit(numBuckets.toLong))

  /** Oracle-replayable bucketer: codepoint polynomial
    * (acc·31 + cp) mod numBuckets as a NATIVE codegen'd expression
    * ([[graft.functions.PolyBucket]]) — the same integer chain any SQL
    * engine can replay (DuckDB: list_reduce over string_split +
    * unicode), at whole-stage-codegen speed (the HOF fold reference
    * below benched ~6× slower on the oracle-path queries). */
  def polyBucket(numBuckets: Int)(g: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      graft.functions.PolyBucket(ColumnBridge.expression(g), numBuckets))
  }

  /** The higher-order-fold reference formulation of [[polyBucket]] —
    * CodegenFallback, kept `private[graft]` for the parity spec (BMP
    * input; see [[graft.functions.PolyBucket]]'s codepoint contract). */
  private[graft] def arithBucket(numBuckets: Int)(g: Column): Column =
    aggregate(split(g, ""), lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + ascii(ch).cast("long"), lit(numBuckets.toLong)))

  /** Exploded (id, bucket) n-gram stream: normalized tokens (lowercase,
    * whitespace-collapsed, empties dropped), unigrams plus
    * space-joined bigrams — the paper's hashed n-gram feature set.
    * Documents with no token contribute no rows. */
  private def bucketStream(df: DataFrame, textCol: String, idExpr: Column,
                           bucket: Column => Column): DataFrame = {
    val toks = df.select(idExpr.as("_dsid"),
        split(TextFunctions.normalizeForFingerprint(col(textCol)), " ").as("_t"))
      .select(col("_dsid"), filter(col("_t"), w => length(w) > 0).as("_t"))
      .filter(size(col("_t")) > 0)
    val unis = toks.select(col("_dsid"), explode(col("_t")).as("_g"))
    val bis = toks.filter(size(col("_t")) >= 2)
      .withColumn("_n", size(col("_t")))
      .select(col("_dsid"),
        slice(col("_t"), lit(1), col("_n") - 1).as("_w1s"),
        slice(col("_t"), lit(2), col("_n") - 1).as("_w2s"))
      .select(col("_dsid"), explode(arrays_zip(col("_w1s"), col("_w2s"))).as("_z"))
      .select(col("_dsid"), concat_ws(" ", col("_z._w1s"), col("_z._w2s")).as("_g"))
    unis.union(bis).select(col("_dsid"), bucket(col("_g")).as("_b"))
  }

  /** The fitted per-bucket importance table: (_b, _lrF) where _lrF =
    * floor(ln(p̂_b / q̂_b)·1e8) with add-k smoothed bucket shares
    * p̂_b = (ct_b + k)/(Nt + k·B), q̂_b = (cr_b + k)/(Nr + k·B).
    * Exactly `numBuckets` rows — broadcastable by construction; fully
    * lazy (totals come from single-row agg cross joins, no collect). */
  def importanceTable(raw: DataFrame, target: DataFrame, textCol: String,
                      numBuckets: Int = 4096, addK: Double = 0.5,
                      bucket: Option[Column => Column] = None): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    require(addK > 0.0, s"addK must be > 0 (unsmoothed empty buckets have no finite log-ratio), got $addK")
    val bk = bucket.getOrElse(hashBucket(numBuckets) _)
    def bucketCounts(df: DataFrame) =
      bucketStream(df, textCol, lit(0L), bk).groupBy("_b").agg(count(lit(1)).as("_c"))
    val spark = raw.sparkSession
    import spark.implicits._
    // all B buckets present even when neither corpus hits them — the
    // log-ratio of an unseen bucket is the smoothed prior ratio, and a
    // missing row would silently zero it in the scoring join
    val allB = spark.range(numBuckets).select(col("id").as("_b"))
    val rawC = bucketCounts(raw).withColumnRenamed("_c", "_cr")
    val tgtC = bucketCounts(target).withColumnRenamed("_c", "_ct")
    val rawN = rawC.agg(sum("_cr").as("_nr"))
    val tgtN = tgtC.agg(sum("_ct").as("_nt"))
    val kB = addK * numBuckets
    allB.join(rawC, Seq("_b"), "left").join(tgtC, Seq("_b"), "left")
      .crossJoin(rawN).crossJoin(tgtN)
      .select(col("_b"),
        floor((log((coalesce(col("_ct"), lit(0L)).cast("double") + lit(addK)) /
                   (coalesce(col("_nt"), lit(0L)).cast("double") + lit(kB))) -
               log((coalesce(col("_cr"), lit(0L)).cast("double") + lit(addK)) /
                   (coalesce(col("_nr"), lit(0L)).cast("double") + lit(kB)))) * lit(1e8))
          .cast("long").as("_lrF"))
      // r19: materialize the fitted table (exactly numBuckets rows).
      // Lazy, it sat under a broadcast inside the SCORING plan, so the
      // resample's eager boundary pass and the final output each
      // re-counted BOTH corpora's n-gram streams; checkpointed, the two
      // featurization passes run once per fit, like the persisted model
      // of LanguageModel.train.
      .localCheckpoint(true)
  }

  /** Score every document of `corpus`: (id, n_ngrams, lw_fixed,
    * log_weight) where lw_fixed is the 1e-8 fixed-point log importance
    * weight (the exact resample key) and log_weight its 4-decimal
    * double rendering. Documents with no token keep n_ngrams = 0 and
    * null weights — callers decide their fate. */
  def importanceWeights(corpus: DataFrame, textCol: String, idCol: String,
                        table: DataFrame, numBuckets: Int = 4096,
                        bucket: Option[Column => Column] = None): DataFrame = {
    val bk = bucket.getOrElse(hashBucket(numBuckets) _)
    val perDoc = bucketStream(corpus, textCol, col(idCol), bk)
      .join(broadcast(table), Seq("_b"))
      .groupBy("_dsid")
      .agg(count(lit(1)).as("n_ngrams"), sum(col("_lrF")).as("lw_fixed"))
    corpus.select(col(idCol))
      .join(perDoc.withColumnRenamed("_dsid", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        col("lw_fixed"),
        (round(col("lw_fixed").cast("decimal(20,0)") * lit(BigDecimal("0.00000001")), 4))
          .cast("double").as("log_weight"))
  }

  /** Shared ranked-keep core: flag the ⌈fraction·n⌉ rows ranked by
    * (`keyCol` desc, id asc). The cutoff is the exact ranked boundary
    * PAIR (TakeOrdered — no full sort), and membership compares the
    * pair lexicographically, so ties cannot overfill the keep set in
    * any engine. Null keys are never kept. */
  private def keepTopByKey(df: DataFrame, keyCol: String, idCol: String,
                           fraction: Double, keptCol: String): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction must be in (0, 1], got $fraction")
    // persist the narrow (key, id) projection across the two eager
    // lookups (count + boundary) — otherwise each re-evaluates the
    // caller's full scoring chain (qualityBuckets' documented trade)
    val scored = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("_w"), col(idCol).as("_i"))
      .persist()
    try {
    val n = scored.count()
    if (n == 0L) return df.withColumn(keptCol, lit(false))
    val k = math.ceil(n * fraction).toLong
    require(k <= Int.MaxValue.toLong,
      s"ranked-keep exact boundary lookup caps at ${Int.MaxValue} scored docs per call, got $k")
    // k-th element of the (key desc, id asc) total order == max of
    // struct(-key, id) over the top-k prefix (negation flips the order;
    // keys are 1e-8-scaled log quantities ≤ ~2⁴⁰ — no overflow)
    val b = scored.orderBy(col("_w").desc, col("_i")).limit(k.toInt)
      .agg(max(struct((-col("_w")).as("_nw"), col("_i").as("_bi"))).as("m"))
      .head().getStruct(0)
    val (bw, bi) = (-b.getLong(0), b.get(1))
    df.withColumn(keptCol,
      col(keyCol).isNotNull &&
        ((col(keyCol) > bw) ||
          (col(keyCol) === bw && col(idCol) <= lit(bi))))
    } finally scored.unpersist(false)
  }

  /** Deterministic top-fraction resample over scored weights: keep the
    * ⌈fraction·n⌉ documents ranked by (lw_fixed desc, id asc). Unscored
    * documents (null lw_fixed) are never kept. Adds a `kept` boolean;
    * filter on it or select where kept. */
  def resampleTop(weights: DataFrame, idCol: String, fraction: Double,
                  keptCol: String = "kept"): DataFrame =
    keepTopByKey(weights, "lw_fixed", idCol, fraction, keptCol)

  /** The paper's SAMPLED resample: Gumbel-top-k draws ⌈fraction·n⌉
    * documents without replacement with probability ∝
    * softmax(log-weight / temperature) — per-doc keys
    * lw/T + Gumbel(0,1), top-k by key. Lower temperature → closer to
    * the deterministic [[resampleTop]]; 1.0 is the paper setting.
    *
    * The noise is a SEEDED, ENGINE-PORTABLE generator so the whole draw
    * is replayable: u from an LCG scramble of the document id in exact
    * BIGINT modular arithmetic, g = −ln(−ln(u)) in IEEE doubles, and
    * the key quantizes fixed-point — `floor(lwF/T + g·1e8)` (the
    * [[LanguageModel.scoreNll]] contract). Spark's `pmod` returns the
    * NON-NEGATIVE residue; an engine whose `%` follows the dividend's
    * sign must mirror it as `((x % m) + m) % m` or the draw diverges
    * for negative ids (the committed q_dsir_gumbel oracle does exactly
    * this). The seed must be ≥ 0 so the post-multiply residue stays
    * sign-free under either convention. An id-keyed LCG is a demo-grade
    * bit mixer — ids correlate with nothing in the corpus, which is all
    * sampling noise needs here — but swap `noiseU` for a seeded
    * xxhash64 when replayability is not required. Requires integral
    * ids (the LCG multiplies the id). */
  def resampleGumbel(weights: DataFrame, idCol: String, fraction: Double,
                     temperature: Double = 1.0, seed: Long = 12345L,
                     keptCol: String = "kept"): DataFrame = {
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    require(seed >= 0L, s"seed must be >= 0 for engine-portable modular arithmetic, got $seed")
    val m = 2147483648L // 2^31: (m-1)·1103515245 stays inside Long exactly
    val u = (pmod(pmod(col(idCol).cast("long"), lit(m)) * lit(1103515245L) + lit(seed), lit(m))
      .cast("double") + lit(0.5)) / lit(m.toDouble)
    val g = -log(-log(u))
    val keyed = weights.withColumn("gumbel_fixed",
      when(col("lw_fixed").isNotNull,
        floor(col("lw_fixed").cast("double") / lit(temperature) + g * lit(1e8)).cast("long")))
    keepTopByKey(keyed, "gumbel_fixed", idCol, fraction, keptCol)
  }
}
