package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: stratified
  * sampling (hit a target fraction per stratum — language/source/quality
  * band) and sequence packing (assign documents to fixed token-budget
  * bins for concat-and-split pretraining batches).
  *
  * Both come in a DETERMINISTIC form (windowed, order-defined, so the
  * same input always yields the same sample/packing — reproducible
  * corpus builds, and an exact SQL oracle) and, for sampling, a seeded
  * randomized form (per-stratum Bernoulli via `DataFrameStatFunctions
  * .sampleBy` — unbiased, approximate counts).
  */
object Curation {

  /** Exclusive per-stratum running aggregate — each row gains
    * `prefixCol` = Σ `weight` over the rows strictly BEFORE it within
    * its stratum in `orderCol` order (and, when `totalCol` is set, the
    * stratum's full Σ `weight`) — the primitive under every
    * deterministic sampler here, computed WITHOUT a per-stratum window.
    *
    * Why not `sum()/row_number() OVER (PARTITION BY stratum ORDER BY
    * orderCol)`: that funnels EVERY row of a stratum into one task's
    * sort. Strata here are languages/sources — at 100 TB the `en`
    * stratum is most of the corpus, so the funnel is a hard
    * scale-killer, not ordinary skew (VERDICT r9 #2). Shape instead:
    *
    *  1. bin rows by `orderCol` VALUE: bin = clamp(⌊(v − lo)/w⌋) with
    *     (lo, hi) collected once driver-side (two scalars off a
    *     column-pruned scan) and w = (hi−lo)/bins — a PURE literal
    *     expression, so every evaluation of the plan bins identically.
    *     (A first cut used `repartitionByRange` + `spark_partition_id`
    *     here; that is unsound — the range exchange SAMPLES its bounds
    *     with a seed derived from the runtime RDD id, so the offsets
    *     subtree and the data subtree can disagree on partition
    *     labels whenever the exchange isn't physically reused, which
    *     mis-shifted cutoffs at sf0.1. Value binning has one source of
    *     truth.);
    *  2. per-(stratum, bin) totals: a tiny frame (≤ bins × strata
    *     rows), so its prefix window is over metadata, not data;
    *  3. every row's prefix = its bin's per-stratum offset (broadcast
    *     joined) + a LOCAL exclusive running sum over (stratum, bin) —
    *     each window bucket holds one bin of one stratum, ~n/bins rows.
    *
    * Contracts: `orderCol` must be NUMERIC, roughly uniformly
    * distributed (ids, fingerprints — already the samplers' bias
    * contract; a value-clustered column would imbalance bins), and
    * UNIQUE within each stratum (with ties, which tied row lands under
    * a cutoff is engine/partitioning-dependent — unless `tieCols`
    * extends the sort to a total order). Null `orderCol` rows
    * sort first (bin 0), matching the window formulation; null STRATA
    * form their own group (null-safe join below), also matching it.
    *
    * EAGER: the min/max bin scan runs at call time (ADVICE r10) — this
    * is not lazy like most operators here; the lo/hi literals also
    * freeze a snapshot of `orderCol`'s range into the returned plan.
    * Callers composing several samplers over one expensive input should
    * cache it first. */
  private[operators] def withStrataPrefix(df: DataFrame, strataCols: Seq[String], orderCol: String,
                               weight: Column, prefixCol: String,
                               totalCol: Option[String] = None,
                               tieCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(orderCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$orderCol must be numeric (an id or fingerprint), got ${df.schema(orderCol).dataType}")
    val parts = math.max(spark.sparkContext.defaultParallelism,
      scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(32))
    val oc = col(orderCol).cast("double")
    val mm = df.agg(min(oc), max(oc)).head()
    val outCols = df.columns.map(col).toIndexedSeq :+ col(prefixCol)
    if (mm.isNullAt(0)) { // empty input / all-null orderCol: rank everything 0
      val base = df.withColumn(prefixCol, lit(0L))
      return totalCol.fold(base)(t => base.withColumn(t, lit(0L)))
        .select(outCols ++ totalCol.map(col): _*)
    }
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val bins = parts * 4 // finer than the shuffle width: a bin is the unit of window locality
    val w = (hi - lo) / bins
    val bin =
      if (w == 0) lit(0)
      else coalesce(
        least(greatest(floor((oc - lit(lo)) / lit(w)), lit(0.0)), lit(bins.toDouble)),
        lit(0.0)).cast("int")
    val binned = df.withColumn("_gbin", bin)
    val strata = strataCols.map(col)
    val perBin = binned.groupBy(strata :+ col("_gbin"): _*)
      .agg(sum(weight).as("_pw"))
    val offsets = perBin.withColumn("_off",
        coalesce(sum(col("_pw")).over(
          Window.partitionBy(strata: _*).orderBy(col("_gbin"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val withTotal = totalCol match {
      case Some(t) => offsets.withColumn(t,
        sum(col("_pw")).over(Window.partitionBy(strata: _*)))
      case None => offsets
    }
    // tieCols extend the in-bin sort to a TOTAL order (callers that
    // need an exact deterministic rank under orderCol duplicates —
    // shardShuffle — pass the unique id here; the sampler callers'
    // contract already demands a unique orderCol and pass nothing)
    val localW = Window.partitionBy(strata :+ col("_gbin"): _*)
      .orderBy(col(orderCol) +: tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // NULL-SAFE join keys (ADVICE r10): a USING/EqualTo join never
    // matches NULL strata, so rows with a null stratum would silently
    // vanish — the window formulation this replaced kept a null stratum
    // as its own group (groupBy and Window.partitionBy both do). Rename
    // the broadcast side and join on <=> so null strata survive; the
    // re-select keeps the input's column order (samplers promise
    // schema-preserving output).
    val rhs0 = withTotal.drop("_pw")
    val rhs = rhs0.columns.foldLeft(rhs0)((d, c) => d.withColumnRenamed(c, "_r_" + c))
    val cond = (strataCols :+ "_gbin").map(c => col(c) <=> col("_r_" + c)).reduce(_ && _)
    binned.join(broadcast(rhs), cond)
      .withColumn(prefixCol, col("_r__off") + coalesce(sum(weight).over(localW), lit(0L)))
      .select(outCols ++ totalCol.map(t => col("_r_" + t).as(t)): _*)
  }

  /** Deterministic stratified sample: the first `ceil(fraction × |g|)`
    * rows of each stratum in `orderCol` order. Exact per-stratum counts,
    * stable across runs and engines. Use a hash-ish `orderCol` (an id,
    * a fingerprint) — ordering by a content-correlated column would bias
    * the sample — and a UNIQUE one (see [[withStrataPrefix]]'s
    * determinism contract).
    *
    * Scale: the de-funneled prefix shape of [[withStrataPrefix]] — no
    * stratum is ever sorted inside a single task. Null strata are kept
    * as their own stratum. NOT fully lazy: one eager min/max scan of
    * `orderCol` runs at call time (see [[withStrataPrefix]]). */
  def stratifiedExact(df: DataFrame, strataCols: Seq[String], fraction: Double,
                      orderCol: String): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction must be in (0, 1], got $fraction")
    withStrataPrefix(df, strataCols, orderCol, lit(1L), "_pfx", totalCol = Some("_cnt"))
      .filter(col("_pfx") + 1 <= ceil(col("_cnt") * fraction))
      .drop("_pfx", "_cnt")
  }

  /** Neyman-allocation stratified sampling: a `budget`-row sample whose
    * per-stratum share is proportional to N_h·σ_h — the optimal
    * allocation for estimating a population mean (Neyman 1934): volatile
    * strata get more of the budget than uniform ones of the same size,
    * which proportional allocation cannot do.
    *
    * Every step is engine-exact so the sampled ROW SET is reproducible
    * anywhere: values quantize to 1e-2 fixed-point (cents); the spread
    * weight per stratum is w_h = ⌊√(N_h·Σc² − (Σc)²)⌋ — the integer
    * variance numerator, DECIMAL-exact, equal to N_h·σ_h up to the
    * shared constant √N̄ that allocation ratios cancel; the sqrt runs on
    * the same IEEE double both engines cast to. Allocation is largest-
    * remainder: base_h = budget·w_h ÷ Σw truncating, the leftover goes
    * +1 each to the largest `budget·w_h mod Σw`, ties broken by stratum
    * value ascending. A stratum's award is capped at its population
    * (no redistribution — the shortfall is reported by the row count,
    * not silently shifted; re-run with a larger budget if exactness
    * matters). All-constant corpora (Σw = 0) fall back to proportional
    * allocation by N_h. The take is the first alloc_h rows per stratum
    * in `orderCol` order ([[mixSources]]' de-funneled prefix shape —
    * no stratum sorts inside one task; `orderCol` must be unique per
    * stratum, an id or fingerprint, never a content-correlated score).
    *
    * Driver state: one row of (n, Σc, Σc²) per stratum — enum-bounded,
    * like every mixer here. NULL values count as 0 cents (they still
    * occupy sample slots; filter first if not wanted). */
  def neymanSample(df: DataFrame, strataCol: String, valueCol: String,
                   orderCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val cents = floor(coalesce(col(valueCol).cast("double"), lit(0.0)) * 100.0).cast("long")
    val stats = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("_n"),
        sum(cents.cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("_s1"),
        // widen BEFORE squaring: cents² overflows a long past ~3·10⁹ cents
        sum(cents.cast(org.apache.spark.sql.types.DecimalType(38, 0)) * cents).as("_s2"))
      .collect()
      .map { r =>
        val n = r.getLong(1)
        val s1 = BigInt(r.getDecimal(2).toBigInteger)
        val s2 = BigInt(r.getDecimal(3).toBigInteger)
        val m = BigInt(n) * s2 - s1 * s1 // >= 0 by Cauchy-Schwarz
        (r.get(0), n, math.floor(math.sqrt(m.toDouble)).toLong)
      }
    require(stats.nonEmpty, "neymanSample: empty input")
    val wSum = stats.map(s => BigInt(s._3)).sum
    val weights: Seq[(Any, Long, BigInt)] =
      if (wSum == 0) stats.map(s => (s._1, s._2, BigInt(s._2))).toSeq
      else stats.map(s => (s._1, s._2, BigInt(s._3))).toSeq
    val totalW = weights.map(_._3).sum
    val based = weights.map { case (k, n, w) =>
      val base = (BigInt(budget) * w / totalW).toLong
      val rem = (BigInt(budget) * w % totalW).toLong
      (k, n, base, rem)
    }
    val leftover = budget - based.map(_._3).sum
    val bumped = based.sortBy { case (k, _, _, rem) => (-rem, String.valueOf(k)) }
      .zipWithIndex
      .map { case ((k, n, base, _), i) =>
        k -> math.min(n, base + (if (i < leftover) 1L else 0L))
      }
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val targetDf = broadcast(spark.createDataFrame(
      bumped.map { case (k, a) => org.apache.spark.sql.Row(k, a) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(strataCol).copy(name = "_sk"),
        org.apache.spark.sql.types.StructField("_alloc",
          org.apache.spark.sql.types.LongType, nullable = false)))))
    withStrataPrefix(df, Seq(strataCol), orderCol, lit(1L), "_pfx")
      .join(targetDf, col(strataCol) <=> col("_sk")) // null stratum survives
      .filter(col("_pfx") < col("_alloc"))
      .drop("_pfx", "_sk", "_alloc")
  }

  /** The "idCol must fit a long" contract of the heap-aggregate family
    * (sampleGroups/topKBy/capPerGroup), ENFORCED: `cast("long")` on a
    * string/decimal id yields nulls and the winner sets silently go
    * wrong/empty (ADVICE r9) — fail at call time instead. */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
      .contains(dt),
      s"$idCol must be an integral column (the heap aggregate keys on it as a long), got $dt")
  }

  /** Seeded per-stratum Bernoulli sample — unbiased but approximate
    * row counts; single stratum column (Spark's `sampleBy` key). */
  def stratifiedSeeded(df: DataFrame, strataCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Weighted corpus mixing: draw from each stratum so the output
    * matches `weights` (normalized) while using as much data as the
    * bottleneck stratum allows. With per-stratum counts nₛ and
    * normalized weights wₛ, the largest supportable total is
    * T = min(nₛ/wₛ); each stratum contributes its first
    * kₛ = floor(wₛ·T) rows in `orderCol` order (deterministic —
    * reproducible corpus builds and an exact SQL oracle,
    * `q_mix_sources`). Strata missing from the input contribute 0 and
    * drag T to 0 — a loud failure beats a silently skewed mix.
    *
    * Scale: the driver sees only per-stratum counts (bounded by the
    * number of strata); the take is the de-funneled prefix shape of
    * [[withStrataPrefix]] — no stratum funnels into one task. `orderCol`
    * must be unique per stratum (determinism contract, ibid.). */
  def mixSources(df: DataFrame, strataCol: String, weights: Map[String, Double],
                 orderCol: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be a non-empty map of positive values")
    require(df.schema(strataCol).dataType == org.apache.spark.sql.types.StringType,
      s"$strataCol must be a string column (weights key on its values)")
    val wsum = weights.values.sum
    val norm = weights.map { case (k, v) => k -> v / wsum }
    val kept = df.filter(col(strataCol).isin(weights.keySet.toSeq: _*))
    val counts = kept.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = norm.map { case (k, w) => counts.getOrElse(k, 0L) / w }.min
    val target = norm.map { case (k, w) => k -> math.floor(w * t).toLong }
    val spark = df.sparkSession
    val targetDf = broadcast(spark.createDataFrame(target.toSeq).toDF(strataCol, "_k"))
    withStrataPrefix(kept, Seq(strataCol), orderCol, lit(1L), "_pfx")
      .join(targetDf, Seq(strataCol))
      .filter(col("_pfx") < col("_k"))
      .drop("_pfx", "_k")
  }

  /** Weighted corpus mixing by a WEIGHT column (token counts), not row
    * counts — the form real pretraining mixes use ("60% of tokens from
    * web, 20% from code, …"): with per-stratum available weight
    * Wₛ = Σ weightCol and normalized mix weights wₛ, the largest
    * supportable total is T = min(Wₛ/wₛ); each stratum contributes its
    * rows in `orderCol` order while the cumulative weight BEFORE the
    * row stays under its budget wₛ·T — so a straddling document is
    * INCLUDED (the cut-at-budget contract [[packSequences]] uses;
    * per-stratum overshoot is bounded by one document's weight).
    * Deterministic and exactly SQL-replayable (`q_mix_weighted`) ONLY
    * when `orderCol` is unique per stratum: with ties, which straddling
    * row lands under budget is partitioning/engine-dependent (see
    * [[withStrataPrefix]]) — pass an id or fingerprint, never a score.
    *
    * Parity note: weights are normalized driver-side with double math —
    * pass weights whose sum is binary-exact (0.5/0.25/0.25, 0.6 is
    * not) when an external engine must replay the arithmetic bit-for-
    * bit. Scale profile = [[mixSources]]: driver sees one scalar per
    * stratum; one window over the stratum shuffle. */
  def mixByWeight(df: DataFrame, strataCol: String, weights: Map[String, Double],
                  weightCol: String, orderCol: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be a non-empty map of positive values")
    require(df.schema(strataCol).dataType == org.apache.spark.sql.types.StringType,
      s"$strataCol must be a string column (weights key on its values)")
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(df.schema(weightCol).dataType),
      s"$weightCol must be an integral column (token/char counts), got ${df.schema(weightCol).dataType}")
    val wsum = weights.values.sum
    val norm = weights.map { case (k, v) => k -> v / wsum }
    // all-null strata sum to NULL — treat as zero available weight
    val avail = df.filter(col(strataCol).isin(weights.keySet.toSeq: _*))
      .groupBy(col(strataCol))
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("_w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = norm.map { case (k, w) => avail.getOrElse(k, 0L).toDouble / w }.min
    val budget = norm.map { case (k, w) => k -> w * t }
    val spark = df.sparkSession
    val budgetDf = broadcast(spark.createDataFrame(budget.toSeq).toDF(strataCol, "_b"))
    withStrataPrefix(df.filter(col(strataCol).isin(weights.keySet.toSeq: _*)),
        Seq(strataCol), orderCol, col(weightCol).cast("long"), "_cb")
      .join(budgetDf, Seq(strataCol))
      .filter(col("_cb") < col("_b"))
      .drop("_cb", "_b")
  }

  /** Temperature-scaled corpus mixing — the multilingual-pretraining
    * rebalance (the XLM-R/mT5 recipe): mix weights pₛ ∝ Wₛ^α over the
    * strata's AVAILABLE weights Wₛ = Σ `weightCol`, α ∈ (0, 1].
    * α = 1 reproduces the natural distribution (no rebalance); α → 0
    * approaches uniform; published multilingual runs use α ≈ 0.2–0.7 to
    * up-sample low-resource strata without flattening entirely. The
    * derived weights feed [[mixByWeight]]'s bottleneck-budget take, so
    * all of its contracts (unique numeric `orderCol`, integral
    * `weightCol`, straddler-included cuts) apply. Strata are taken from
    * the DATA (every non-null stratum participates).
    *
    * Not SQL-oracled: the α-power and normalization arithmetic runs
    * driver-side in doubles whose replay in another engine is
    * ulp-knife-edged (Σ over unordered map iteration, non-correctly-
    * rounded pow) — properties are spec-pinned instead (α=1 ≡
    * proportional; smaller α lifts the smallest stratum's share). */
  def mixByTemperature(df: DataFrame, strataCol: String, weightCol: String,
                       orderCol: String, alpha: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    // per-stratum available weight: bounded by the number of strata
    val avail = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("_w"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 > 0)
    require(avail.nonEmpty, s"no stratum in $strataCol carries positive $weightCol weight")
    val weights = avail.map { case (k, w) => k -> math.pow(w.toDouble, alpha) }.toMap
    mixByWeight(df, strataCol, weights, weightCol, orderCol)
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total token `budget` across strata by
    * water-filling under a per-stratum cap of `maxEpochs` passes over
    * its available weight. Strata too small to absorb an equal share
    * are saturated at `maxEpochs`·Wₛ; the leftover is split equally
    * among the rest — low-resource languages are up-sampled (bounded by
    * the epoch cap, so never degenerately repeated) without the
    * unbounded head-crushing of temperature mixing.
    *
    * PURE INTEGER arithmetic (the cross-engine determinism contract):
    * with capacities cₛ = maxEpochs·Wₛ sorted ascending (ties broken by
    * stratum name), stratum i is saturated iff
    * cᵢ·(m−i+1) ≤ budget − Σ_{k<i} cₖ — the exact rational
    * water-filling criterion via cross-multiplication, which is
    * prefix-closed in that order — and each unsaturated stratum gets
    * ⌊(budget − Σ_sat c) / (m − #sat)⌋. Up to m−#sat−1 tokens of the
    * budget go unassigned (floor division); saturated leftover is
    * intentionally unassigned (UniMax caps, it does not redistribute
    * past the epoch bound — §3.1 of the paper).
    */
  private[graft] def unimaxAllocate(avail: Seq[(String, Long)], budget: Long,
                                    maxEpochs: Int): Seq[(String, Long, Long)] = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    avail.foreach { case (s, w) =>
      require(w > 0, s"stratum $s has non-positive available weight $w")
      require(w <= Long.MaxValue / maxEpochs / math.max(avail.size, 1),
        s"stratum $s: capacity arithmetic would overflow long") }
    val sorted = avail.map { case (s, w) => (s, w, maxEpochs * w) }
      .sortBy { case (s, _, c) => (c, s) }
    val m = sorted.size
    // prefix-closed saturation scan (see scaladoc): find #saturated
    var p = 0L; var j = 0
    while (j < m && { val c = sorted(j)._3; c * (m - j) <= budget - p }) {
      p += sorted(j)._3; j += 1
    }
    val fair = if (j < m) (budget - p) / (m - j) else 0L
    sorted.zipWithIndex.map { case ((s, w, c), i) => (s, w, if (i < j) c else fair) }
  }

  /** UniMax corpus mixing: allocate `budget` (in `weightCol` units —
    * tokens/chars) across the strata present in the data via
    * [[unimaxAllocate]], then materialize each stratum's share as
    * FULL EPOCHS plus a partial-epoch prefix: with allocation bₛ over
    * available weight Wₛ, every row of the stratum is emitted with
    * `epochCol` = 0 … ⌊bₛ/Wₛ⌋−1, and the stratum's `orderCol`-prefix
    * whose cumulative weight BEFORE the row stays under bₛ mod Wₛ is
    * emitted once more (straddler included — the [[mixByWeight]] cut
    * contract, overshoot bounded by one document per stratum per
    * epoch boundary). A saturated stratum therefore emits exactly
    * `maxEpochs` full copies and no partial.
    *
    * Deterministic and exactly SQL-replayable (`q_unimax`): the
    * allocation is pure integer arithmetic, the prefix is the
    * de-funneled [[withStrataPrefix]] shape, and the epoch expansion is
    * a bounded `sequence` explode (≤ maxEpochs+1 per row). `orderCol`
    * must be unique per stratum (ibid.). Scale: driver sees one scalar
    * per stratum; one broadcast of m (stratum, full, rem) rows; the
    * corpus shuffles once for the prefix and explodes map-side — row
    * replication is the OPERATOR'S OUTPUT semantics (an epoch-expanded
    * corpus), so the ≤(maxEpochs+1)× output volume is the contract,
    * not overhead. */
  def unimaxMix(df: DataFrame, strataCol: String, weightCol: String,
                orderCol: String, budget: Long, maxEpochs: Int = 4,
                epochCol: String = "epoch"): DataFrame = {
    require(df.schema(strataCol).dataType == org.apache.spark.sql.types.StringType,
      s"$strataCol must be a string column")
    val avail = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("_w"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 > 0).sortBy(_._1).toSeq
    require(avail.nonEmpty, s"no stratum in $strataCol carries positive $weightCol weight")
    val alloc = unimaxAllocate(avail, budget, maxEpochs)
    val parts = alloc.map { case (s, w, b) => (s, b / w, b % w) }
    val spark = df.sparkSession
    val partsDf = broadcast(spark.createDataFrame(parts).toDF(strataCol, "_full", "_rem"))
    withStrataPrefix(df.filter(col(strataCol).isin(avail.map(_._1): _*)),
        Seq(strataCol), orderCol, col(weightCol).cast("long"), "_cb")
      .join(partsDf, Seq(strataCol))
      .withColumn("_ne", col("_full") + when(col("_cb") < col("_rem"), 1L).otherwise(0L))
      .filter(col("_ne") > 0)
      .withColumn(epochCol, explode(sequence(lit(0L), col("_ne") - 1)))
      .select(df.columns.map(col).toIndexedSeq :+ col(epochCol): _*)
  }

  /** Sequence packing by contiguous budget chunking: order each group by
    * `orderCol`, run a cumulative sum of `weightCol`, and assign row r to
    * bin `floor(cumBefore(r) / budget)`. Every bin holds ~`budget` weight
    * (a document may straddle a boundary — the concat-then-split
    * pretraining contract, where the tokenizer stream is cut at exactly
    * `budget` tokens and a straddling document contributes to both
    * sides). Deterministic; bin ids are dense per group.
    *
    * For strict packing (no straddling, bins never exceed budget) the
    * assignment is inherently sequential state and cannot be a window —
    * that variant is [[packSequencesStrict]] (shuffle + in-partition
    * walk); this quota form stays preferable when approximate bins are
    * acceptable, because it composes into one window pass with other
    * per-group analytics.
    *
    * Scale: one shuffle + sort per group, same profile as sessionize.
    * `groupCols` must be non-empty: packing a 100 TB corpus as ONE group
    * would funnel it through a single sort partition — shard by
    * language/source/hash-bucket instead. */
  def packSequences(df: DataFrame, weightCol: String, budget: Long,
                    groupCols: Seq[String], orderCol: String,
                    binCol: String = "bin"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty — a global pack is a single-partition sort; shard first")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(weightCol)).over(w))
      .withColumn(binCol,
        floor((col("_cum") - col(weightCol)) / lit(budget.toDouble)))
      .drop("_cum")
  }

  /** STRICT sequence packing — bins NEVER exceed `budget` (the
    * context-window contract batch assembly actually needs: a packed
    * window that overflows the model's context is unusable, where
    * [[packSequences]]' quota bins may straddle). Next-fit in
    * `orderCol` order per group: a bin closes when the next item would
    * overflow; an item larger than the budget itself fails LOUDLY
    * (chunk first — `chunkTokens ≤ budget` makes oversize impossible;
    * silently splitting or spilling would corrupt the bin contract).
    * Null weights are rejected for the same reason. Bin ids are dense
    * per group, `orderCol` must be unique per group (same determinism
    * contract as [[packSequences]]).
    *
    * Scale shape: the inherently sequential state machine runs as ONE
    * shuffle on `groupCols` + an in-partition sort + a single
    * mapPartitions walk that detects group boundaries — no window over
    * an unsharded corpus, no driver state; `groupCols` must be
    * non-empty and sharded exactly like [[packSequences]]. */
  def packSequencesStrict(df: DataFrame, weightCol: String, budget: Long,
                          groupCols: Seq[String], orderCol: String,
                          binCol: String = "bin"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty — a global pack is a single-partition walk; shard first")
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(df.schema(weightCol).dataType),
      s"$weightCol must be an integral column, got ${df.schema(weightCol).dataType}")
    val outSchema = df.schema.add(binCol, org.apache.spark.sql.types.LongType)
    val gIdx = groupCols.map(df.schema.fieldIndex)
    val wIdx = df.schema.fieldIndex(weightCol)
    df.repartition(groupCols.map(col): _*)
      .sortWithinPartitions(groupCols.map(col) :+ col(orderCol): _*)
      .mapPartitions { it =>
        var curKey: Seq[Any] = null
        var bin = 0L
        var used = 0L
        it.map { r =>
          val k = gIdx.map(r.get)
          if (k != curKey) { curKey = k; bin = 0L; used = 0L }
          val wRaw = r.get(wIdx)
          require(wRaw != null, s"null $weightCol in strict pack (group $k)")
          val w = wRaw.asInstanceOf[Number].longValue
          require(w >= 0 && w <= budget,
            s"item weight $w outside [0, $budget] in strict pack (group $k) — chunk first")
          if (used + w > budget) { bin += 1L; used = 0L }
          used += w
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Curriculum ordering: rank the corpus easy→hard by a difficulty
    * score without ever sorting it globally — the data-ordering step of
    * curriculum learning (Bengio et al. 2009), where training sees
    * cheap examples first and the ordering must be reproducible.
    *
    * Mechanics: `buckets` difficulty levels from rank-selected quantile
    * boundaries ([[Profile.percentiles]] — exact mode for oracle
    * replay, the sketch at scale), bucket = 1 + #(boundaries < score)
    * with strict comparison (ties land low, the RFM contract); within
    * a bucket, rows order by `idCol` (unique, the determinism contract
    * of every prefix op here); `curriculum_pos` = bucket offset +
    * within-bucket rank, a dense global 0-based order.
    *
    * Scale shape: the boundary pass aggregates; bucket sizes collect
    * driver-side (`buckets` rows); the within-bucket rank is
    * [[withStrataPrefix]]'s de-funneled prefix — no bucket funnels into
    * one task, nothing global ever sorts. Output: input columns +
    * (difficulty_bucket, curriculum_pos). NULL scores are rejected
    * loudly (a null difficulty has no place in the order — filter or
    * impute first). */
  def curriculumOrder(df: DataFrame, scoreCol: String, idCol: String,
                      buckets: Int = 10, exact: Boolean = false): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val head = Profile.percentiles(
      df.select(col(scoreCol).cast("double").as("_m")).withColumn("_g", lit(1)),
      Seq("_g"), "_m", ps = ps, exact = exact).head()
    val cuts = (2 until buckets + 1).map(head.getDouble)
    val bucketCol = cuts.map(b => when(col(scoreCol).cast("double") > lit(b), 1)
      .otherwise(0)).reduce(_ + _) + lit(1)
    val withB = df
      .withColumn("_nullScore", col(scoreCol).isNull)
      .withColumn("difficulty_bucket", bucketCol)
    val sizes = withB.groupBy(col("difficulty_bucket"))
      .agg(count(lit(1)).as("_n"), sum(col("_nullScore").cast("long")).as("_nulls"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    require(sizes.forall(_._3 == 0L),
      s"curriculumOrder: NULL $scoreCol values present — filter or impute first")
    val offsets = sizes.sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, acc), (b, n, _)) => (b, acc + n) }
    val offMap = offsets.sliding(2).collect {
      case Array((_, acc), (b, _)) => (b, acc)
    }.toMap
    val offExpr = offMap.foldLeft(lit(0L)) { case (e, (b, off)) =>
      when(col("difficulty_bucket") === b, lit(off)).otherwise(e)
    }
    withStrataPrefix(withB, Seq("difficulty_bucket"), idCol, lit(1L), "_pfx")
      .withColumn("curriculum_pos", offExpr + col("_pfx"))
      .drop("_pfx", "_nullScore")
  }

  /** Packing-efficiency report over a packed corpus ([[packSequences]] /
    * [[packSequencesStrict]] output): per group, how well the bins use
    * the context-window budget — the number every batch-assembly
    * pipeline watches, because wasted bin tail is wasted training
    * compute at exactly the corpus scale.
    *
    * Output (one row per group): (groupCols…, n_bins, n_items,
    * used_tokens, capacity = n_bins·budget, fill_fp = used·10⁸ ÷
    * capacity, min_bin_fill_fp, max_bin_fill_fp). Truncating long
    * division, so the report is bit-stable; for [[packSequencesStrict]]
    * output fill never exceeds 10⁸, while quota bins
    * ([[packSequences]]) may straddle above it — both visible here.
    *
    * Scale shape: two partial-aggregated groupBys (bin level, then
    * group level) over the packed frame's (group, bin, weight)
    * projection — no window, no join. */
  def packEfficiency(packed: DataFrame, weightCol: String, budget: Long,
                     groupCols: Seq[String], binCol: String = "bin"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(groupCols.nonEmpty, "packEfficiency needs the pack's group columns")
    val bins = packed
      .groupBy((groupCols :+ binCol).map(col): _*)
      .agg(count(lit(1)).as("_items"),
        sum(col(weightCol).cast("long")).as("_used"))
      .withColumn("_fill", expr(s"_used * 100000000L DIV ${budget}L"))
    bins.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_bins"),
        sum(col("_items")).as("n_items"),
        sum(col("_used")).as("used_tokens"),
        min(col("_fill")).as("min_bin_fill_fp"),
        max(col("_fill")).as("max_bin_fill_fp"))
      .withColumn("capacity", col("n_bins") * lit(budget))
      .withColumn("fill_fp", expr("used_tokens * 100000000L DIV capacity"))
      .select(groupCols.map(col) ++ Seq(col("n_bins"), col("n_items"),
        col("used_tokens"), col("capacity"), col("fill_fp"),
        col("min_bin_fill_fp"), col("max_bin_fill_fp")): _*)
  }

  /** Deterministic uniform per-group sample of `k` ids via the native
    * bottom-k-by-hash aggregate ([[graft.functions.BottomKAgg]]): every
    * map task reduces to ≤ k pairs before the shuffle — no group is ever
    * sorted or materialized (a `row_number` window would sort each group
    * in one task). Priority is the Knuth multiplicative hash
    * `(id × 2654435761) mod 2³²` — spread enough for sampling and, unlike
    * xxhash64, exactly replicable in plain SQL on any engine (the oracle
    * recomputes it in DuckDB). Contract: `idCol` non-negative and below
    * ~3.4×10⁹ (Long.MaxValue / 2654435761) so the product stays inside
    * a long on every engine — above that Spark wraps silently while a
    * replaying engine may raise; swap the priority expression for
    * `xxhash64` when ids exceed that. */
  def sampleGroups(df: DataFrame, groupCols: Seq[String], idCol: String,
                   k: Int): DataFrame = {
    require(groupCols.nonEmpty, "sampleGroups needs at least one group column")
    requireIntegralId(df, idCol)
    import org.apache.spark.sql.graftshim.ColumnBridge
    val id = col(idCol).cast("long")
    val agg = graft.functions.BottomKAgg(
      ColumnBridge.expression((id * lit(2654435761L)) % lit(4294967296L)),
      ColumnBridge.expression(id), k)
    df.groupBy(groupCols.map(col): _*)
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("sample_ids"))
  }

  /** SEEDED uniform per-group sample of `k` ids — the randomized
    * counterpart of [[sampleGroups]] (whose Knuth-hash priority is fixed
    * so engines can replay it): priority = xxhash64(seed, id), so
    * different seeds draw independent samples — the reservoir-sampling
    * use case (bootstrap resamples, refresh draws) — while one seed
    * stays fully deterministic. Same mergeable bottom-k heap scale
    * shape: k entries per map task cross the exchange, no group is ever
    * sorted or gathered. */
  def sampleGroupsSeeded(df: DataFrame, groupCols: Seq[String], idCol: String,
                         k: Int, seed: Long): DataFrame = {
    require(groupCols.nonEmpty, "sampleGroupsSeeded needs at least one group column")
    requireIntegralId(df, idCol)
    import org.apache.spark.sql.graftshim.ColumnBridge
    val id = col(idCol).cast("long")
    val agg = graft.functions.BottomKAgg(
      ColumnBridge.expression(xxhash64(lit(seed), id)),
      ColumnBridge.expression(id), k)
    df.groupBy(groupCols.map(col): _*)
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("sample_ids"))
  }

  /** Deterministic train/validation/test split assignment: each row's
    * id hashes (the same engine-replicable Knuth hash as
    * [[sampleGroups]], but computed through a DECIMAL(38,0)
    * intermediate so FULL-RANGE hashed ids — e.g. xxhash64 provenance
    * ids from warc_ingest — never overflow) into one of `buckets`
    * buckets; splits own
    * contiguous bucket ranges sized by their weights (the LAST split
    * absorbs rounding remainder). Pure row-local codegen arithmetic —
    * no shuffle, no sampling state, stable across runs, engines, and
    * re-partitionings, and a document keeps its split when the corpus
    * around it changes (the property random splits lack). */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)] = Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
                   buckets: Int = 10000, splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "splits need positive weights")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val bounds = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * buckets)
    }.tail.dropRight(1) :+ buckets.toLong
    require((0L +: bounds).zip(bounds).forall { case (lo, hi) => hi > lo },
      s"bucket resolution too coarse for the smallest weight — a split " +
        s"would own zero buckets (weights ${splits.map(_._2)}, buckets $buckets); raise `buckets`")
    // DECIMAL(38,0) intermediate: hashed 64-bit ids (e.g. xxhash64
    // provenance ids from warc_ingest) overflow id×2654435761 in long
    // arithmetic — ANSI mode throws; pmod keeps negative hashed ids in
    // [0, 2³²) so every split still owns its share. Identical values
    // to the old form for the small positive ids external replays use.
    val bucket = expr(
      s"CAST(pmod(CAST(CAST(`$idCol` AS BIGINT) AS DECIMAL(38,0)) * 2654435761, " +
        "4294967296) AS BIGINT)") % buckets
    val assignment = splits.map(_._1).zip(bounds).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, (name, hi)) =>
        when(bucket < hi, lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, assignment)
  }

  /** Deterministic seeded global shuffle → trainer shards: every row
    * gets a `shard` in [0, numShards) and a dense 1-based `pos` within
    * its shard, both pure functions of (`idCol`, `seed`) — the
    * reproducible "shuffle the corpus and write N shard files" step a
    * pretraining run needs (data order affects the model; reruns and
    * other engines must agree byte-for-byte). Reading shards
    * round-robin by (`pos`, `shard`) is a deterministic global
    * training order.
    *
    * The shuffle key is the seeded LCG `(id·1103515245 + seed) mod 2³¹`
    * — the [[Dsir.resampleGumbel]] convention: replayable in any
    * engine with 64-bit integer arithmetic (the oracle mirrors `pmod`
    * as `((x % m) + m) % m`). Key COLLISIONS are expected at corpus
    * scale (ids 2³¹ apart collide exactly; distinct ids collide
    * birthday-style) and are ordered by id ascending — `pos` is the
    * exact rank under (key, id), total and deterministic. A production
    * pipeline that doesn't need cross-engine replay can pass a
    * stronger `keyFn` (e.g. `xxhash64(seed, id)`) over the identical
    * pipeline.
    *
    * Scale: shard assignment is a scan-level expression; `pos` uses
    * the de-funneled prefix shape of [[withStrataPrefix]] (id as the
    * tie-breaker), so no shard — at 100 TB each holds corpus/N rows —
    * is ever sorted inside a single task. Ids must be non-null and
    * unique ([[requireIntegralId]] enforces integral). Output: the
    * input columns + (`shard` int, `pos` long). */
  def shardShuffle(df: DataFrame, idCol: String, numShards: Int, seed: Long,
                   keyFn: Option[Column => Column] = None): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    requireIntegralId(df, idCol)
    val m = 2147483648L
    val key = keyFn.fold(
      pmod(pmod(col(idCol).cast("long"), lit(m)) * lit(1103515245L) + lit(seed), lit(m)))(
      f => f(col(idCol)))
    val keyed = df
      .withColumn("_skey", key)
      .withColumn("shard", pmod(col("_skey"), lit(numShards.toLong)).cast("int"))
    withStrataPrefix(keyed, Seq("shard"), "_skey", lit(1L), "_pfx",
        tieCols = Seq(idCol))
      .withColumn("pos", (col("_pfx") + 1L).cast("long"))
      .drop("_skey", "_pfx")
  }

  /** Per-group top-k (or bottom-k) by a numeric score, via the
    * mergeable heap aggregate — the scale-path replacement for
    * `row_number() OVER (PARTITION BY g ORDER BY s) <= k`, which sorts
    * every group in full inside one task. Map tasks reduce to k heap
    * entries each; no group is materialized. Ties break to the lowest
    * id. Output: groupCols ++ (rank from 0, idCol, scoreCol).
    * `idCol` must fit a long (see [[sampleGroups]]). NULL and NaN
    * scores are EXCLUDED (the window formulation sorts them into the
    * result set; exclusion is the useful semantics for a top-k). */
  def topKBy(df: DataFrame, groupCols: Seq[String], scoreCol: String,
             idCol: String, k: Int, ascending: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "topKBy needs at least one group column")
    requireIntegralId(df, idCol)
    import org.apache.spark.sql.graftshim.ColumnBridge
    val sign = if (ascending) 1.0 else -1.0
    val agg = graft.functions.BottomKAgg(
      ColumnBridge.expression(col(scoreCol).cast("double") * sign),
      ColumnBridge.expression(col(idCol).cast("long")), k, withPriorities = true)
    df.groupBy(groupCols.map(col): _*)
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("_top"))
      .select(groupCols.map(col) :+ posexplode(col("_top")).as(Seq("rank", "_e")): _*)
      .select(groupCols.map(col) ++ Seq(col("rank"), col("_e.v").as(idCol),
        (ColumnBridge.column(graft.functions.SortableBitsToDouble(
          ColumnBridge.expression(col("_e.p")))) * sign + 0.0).as(scoreCol)): _*)
  }

  /** Per-group cardinality cap — the per-domain/per-source cap of
    * web-scale curation recipes (a handful of boilerplate-heavy domains
    * otherwise dominate the corpus): keep at most `maxN` rows per
    * group, deterministically the lowest `idCol` values, so the winner
    * set is stable across runs and engines, and appending new
    * higher-id docs never evicts an existing winner. Winners come from
    * the mergeable bottom-k heap aggregate (maxN entries per map task
    * cross the exchange; no group is sorted, gathered, or windowed —
    * a million-doc domain costs maxN rows per task) + a semi-join on
    * the unique id. `idCol` must fit a long. Oracled (`q_cap_group`)
    * against the row_number() formulation it replaces. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                  maxN: Int): DataFrame = {
    require(groupCols.nonEmpty, "capPerGroup needs at least one group column")
    require(maxN > 0, s"maxN must be positive, got $maxN")
    requireIntegralId(df, idCol)
    import org.apache.spark.sql.graftshim.ColumnBridge
    val id = col(idCol).cast("long")
    val agg = graft.functions.BottomKAgg(
      ColumnBridge.expression(id), ColumnBridge.expression(id), maxN)
    val winners = df.groupBy(groupCols.map(col): _*)
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("_keep"))
      .select(explode(col("_keep")).as(idCol))
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Split documents into fixed token-count chunks with overlap — the
    * tokenize-and-chunk step upstream of [[packSequences]] (chunk to
    * the model context length, pack the chunks). Words are whitespace
    * tokens of the normalized (lowercase, single-space) text; chunk `i`
    * starts at word `i × (chunkTokens − overlap)` and the last chunk may
    * be short. Blank documents emit nothing.
    *
    * Scale shape: `split` → `posexplode(sequence(...))` → `slice` /
    * `array_join` — all codegen'd builtins, no HOF lambda, no shuffle at
    * all (chunking is embarrassingly row-local; the explode multiplies
    * rows ~n/stride, exactly the output size). */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int = 512, overlap: Int = 64): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    // blank check runs on the NORMALIZED text: Spark trim strips spaces
    // only, so filtering raw text would pass "\n" through and emit a
    // phantom empty chunk
    df.select(col(idCol),
        graft.functions.TextFunctions.normalizeForFingerprint(col(textCol)).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col(idCol), split(col("_t"), " ").as("_w"))
      .withColumn("_n", size(col("_w")))
      .select(col(idCol), col("_w"), col("_n"),
        posexplode(sequence(lit(0), expr(s"(_n - 1) div $stride"))).as(Seq("_seq", "chunk_idx")))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("_w"), col("chunk_idx") * stride + 1, lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens), col("_n") - col("chunk_idx") * stride).cast("long").as("n_tokens"))
  }

  /** Sentence-boundary-respecting chunking — the RAG / context-window
    * chunker that never splits mid-sentence: sentences pack greedily
    * (next-fit, in document order) into chunks of at most
    * `budgetTokens` whitespace tokens. A sentence is a run of
    * non-terminator characters plus its closing `[.!?]` run, extracted
    * from the normalized text with an RE2∩Java-safe pattern (no
    * lookbehind — external engines replay it; `q_chunk_sentences`).
    *
    * Sentences LONGER than the budget become singleton chunks (their
    * weight caps at the budget for the pack walk; the reported
    * `n_tokens` is the true count) — split such outliers with the word
    * chunker downstream if a hard ceiling matters. Shape: sentence
    * explode → [[packSequencesStrict]] on (doc, sentence-order) → one
    * per-(doc, chunk) aggregation whose state is bounded by the budget,
    * exactly the [[assembleSequences]] scale contract. */
  def chunkSentences(df: DataFrame, textCol: String, idCol: String,
                     budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val sents = df
      .select(col(idCol),
        graft.functions.TextFunctions.normalizeForFingerprint(col(textCol)).as("_nt"))
      .filter(length(col("_nt")) > 0)
      .select(col(idCol),
        posexplode(expr("regexp_extract_all(_nt, '[^.!?]+[.!?]*', 0)")).as(Seq("_sidx", "_s")))
      .select(col(idCol), col("_sidx"), trim(col("_s")).as("_sent"))
      .filter(length(col("_sent")) > 0)
      .withColumn("_stok", size(split(col("_sent"), " ")).cast("long"))
      .withColumn("_w", least(col("_stok"), lit(budgetTokens.toLong)))
    val packed = packSequencesStrict(sents, "_w", budgetTokens.toLong,
      Seq(idCol), "_sidx", binCol = "chunk_idx")
    packed.groupBy(col(idCol), col("chunk_idx"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("_sidx"), col("_sent")))),
          x => x.getField("_sent")), " ").as("chunk_text"),
        count(lit(1)).as("n_sentences"),
        sum(col("_stok")).as("n_tokens"))
  }

  /** Benchmark-contamination check: for every corpus document, how many
    * of its distinct word n-grams also occur in the benchmark set
    * (normalized: lowercase, whitespace collapsed). The decontamination
    * primitive of every serious pretraining pipeline — n-gram overlap
    * against held-out eval sets, n ≈ 8–13 in the published recipes
    * (smaller n for short benchmark strings).
    *
    * Output: idCol, `n_ngrams` (distinct n-grams in the doc),
    * `n_contaminated` (of those, how many appear anywhere in the
    * benchmark), `contamination_frac`.
    *
    * Scale shape: n-grams are 64-bit xxhash64 spans (native
    * [[graft.functions.WordNgramHashes]] — no split arrays, no per-gram
    * strings), so the join key is 8 bytes, never text. The benchmark
    * side (eval sets — thousands of docs, not billions) aggregates to a
    * distinct-hash set and BROADCASTS; the corpus side never shuffles
    * documents — one explode of hashes, a broadcast hash join, and a
    * partial-aggregated count by doc id. */
  def contamination(corpus: DataFrame, bench: DataFrame, textCol: String,
                    idCol: String, n: Int = 8): DataFrame = {
    def grams(c: org.apache.spark.sql.Column) = gramHashes(c, n)
    val benchGrams = bench
      .select(explode(grams(col(textCol))).as("_g")).distinct()
      .withColumn("_hit", lit(1))
    val corpusGrams = corpus
      .select(col(idCol), grams(col(textCol)).as("_gs"))
      .select(col(idCol), size(col("_gs")).cast("long").as("n_ngrams"),
        explode_outer(col("_gs")).as("_g"))
    corpusGrams
      .join(broadcast(benchGrams), Seq("_g"), "left")
      .groupBy(col(idCol), col("n_ngrams"))
      .agg(sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_contaminated"))
      .withColumn("contamination_frac",
        when(col("n_ngrams") === 0, lit(0.0))
          .otherwise(round(col("n_contaminated").cast("double") / col("n_ngrams"), 6)))
  }

  /** Distinct 64-bit word-n-gram hashes of normalized text — shared by
    * the contamination pair. */
  private def gramHashes(c: Column, n: Int): Column =
    array_distinct(org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.WordNgramHashes(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(
          graft.functions.TextFunctions.normalizeForFingerprint(c)), n)))

  /** Reverse contamination ATTRIBUTION — [[contamination]] asks "how
    * dirty is each corpus doc"; this asks the eval team's question:
    * "which BENCHMARK items are compromised, and how broadly" — per
    * bench doc, its distinct n-gram count, how many of those n-grams
    * occur anywhere in the corpus, and how many DISTINCT corpus docs
    * share at least one (the blast radius: one leaked item quoted by a
    * thousand pages is a different problem than a single mirror).
    *
    * Output: benchIdCol, `n_ngrams`, `n_hit_ngrams`, `n_corpus_docs`,
    * `hit_frac` (= n_hit_ngrams / n_ngrams, rounded 6).
    *
    * Scale shape mirrors [[contamination]]: the benchmark side
    * (thousands of docs) explodes to 8-byte gram hashes and BROADCASTS;
    * the corpus explodes hashes in place, never shuffles documents, and
    * the per-(bench, gram)/(bench, doc) distinct aggregation collapses
    * map-side before the exchange. */
  def contaminationAttribution(corpus: DataFrame, bench: DataFrame, textCol: String,
                               corpusIdCol: String, benchIdCol: String,
                               n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(col(benchIdCol), explode(gramHashes(col(textCol), n)).as("_g"))
    val corpusGrams = corpus
      .select(col(corpusIdCol).as("_cid"), explode(gramHashes(col(textCol), n)).as("_g"))
    val base = bench.select(col(benchIdCol),
      size(gramHashes(col(textCol), n)).cast("long").as("n_ngrams"))
    val hits = corpusGrams.join(broadcast(benchGrams), Seq("_g"))
      .groupBy(col(benchIdCol))
      .agg(countDistinct(col("_g")).as("n_hit_ngrams"),
        countDistinct(col("_cid")).as("n_corpus_docs"))
    base.join(hits, Seq(benchIdCol), "left")
      .select(col(benchIdCol), col("n_ngrams"),
        coalesce(col("n_hit_ngrams"), lit(0L)).as("n_hit_ngrams"),
        coalesce(col("n_corpus_docs"), lit(0L)).as("n_corpus_docs"),
        when(col("n_ngrams") === 0, lit(0.0))
          .otherwise(round(coalesce(col("n_hit_ngrams"), lit(0L)).cast("double") /
            col("n_ngrams"), 6)).as("hit_frac"))
  }

  /** Cross-split near-duplicate leakage audit: the pairs of documents
    * that are near-duplicates of each other AND live in different
    * train/val/test splits — the contamination [[contamination]]'s
    * n-gram overlap can't see (a paraphrased or lightly-edited eval doc
    * shares few exact 8-grams with its train twin but has high shingle
    * Jaccard). Run it after [[assignSplits]], before trusting any
    * held-out metric: one leaked near-dup inflates eval scores
    * silently.
    *
    * Composition: [[Dedup.ngramJaccardPairs]]' blocked verify (its
    * block-cap contract included — mirror it in any oracle) + two id
    * joins to attach splits + the cross-split filter. Scale shape is
    * the pairing op's; the split table is (id, split) — joins on the
    * unique id.
    *
    * Output: (id_a, id_b, split_a, split_b, jaccard), cross-split
    * pairs only, both orders of split naming preserved as the id order
    * has them. */
  def splitLeakage(df: DataFrame, textCol: String, idCol: String,
                   splitCol: String, blockCol: Column, n: Int = 3,
                   threshold: Double = 0.5, maxBlockSize: Int = 10000): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(df, textCol, idCol, blockCol,
      n, threshold, maxBlockSize)
    val s = df.select(col(idCol), col(splitCol))
    pairs
      .join(s.select(col(idCol).as("id_a"), col(splitCol).as("split_a")), Seq("id_a"))
      .join(s.select(col(idCol).as("id_b"), col(splitCol).as("split_b")), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"),
        col("jaccard"))
  }

  /** Cross-corpus overlap matrix — for every ORDERED pair of sources,
    * how much of A's distinct n-gram vocabulary also appears in B:
    * `containment_fp` = |A∩B|·10⁸ ÷ |A| (directional — a small corpus
    * fully quoted by a big one shows 10⁸ one way, a sliver the other)
    * and the symmetric `jaccard_fp` = |A∩B|·10⁸ ÷ |A∪B|. The mixture-
    * design / leakage audit run before weighting sources
    * ([[mixWeighted]]) or trusting a "held-out" source as clean.
    *
    * Join keys are the 8-byte word-n-gram hashes ([[contamination]]'s
    * trade: the oracle replays counts on the gram STRINGS, identical
    * modulo ~n²/2⁶⁴ collision odds). Truncating long division; the
    * numerator overflows past ~9·10¹⁰ distinct grams per source —
    * documented, not guarded, like every other `_fp` metric here.
    *
    * Scale shape: one explode → distinct (source, gram) pass; source
    * sizes partial-aggregate from it; co-membership aggregates per
    * GRAM (`collect_set(source)` — bounded by the source count, never
    * by occurrences) and expands to ordered pairs by a plan-level
    * lambda over the sorted set, so no corpus-sized frame is ever
    * self-joined. Sources are enum-cardinality (a mixture has tens,
    * not millions); the pair table is |sources|² rows.
    *
    * Output: (src_a, src_b, n_a, n_b, n_common, containment_fp,
    * jaccard_fp), ordered pairs with src_a ≠ src_b; pairs with an
    * empty intersection still appear (n_common = 0) so the matrix is
    * dense and a zero overlap is visible, not missing. */
  def corpusOverlap(df: DataFrame, textCol: String, srcCol: String,
                    n: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = df
      .select(col(srcCol).cast("string").as("_src"),
        explode(gramHashes(col(textCol), n)).as("_g"))
      .distinct()
    val sizes = grams.groupBy(col("_src")).agg(count(lit(1)).as("_n"))
      .localCheckpoint(true) // |sources| rows: the pair frame joins it twice
    val pairCounts = grams
      .groupBy(col("_g")).agg(sort_array(collect_set(col("_src"))).as("_ss"))
      .filter(size(col("_ss")) > 1)
      .select(explode(expr(
        // ordered pairs (x, y), x < y in sort order, from the gram's source set
        "flatten(transform(_ss, (x, i) -> transform(slice(_ss, i + 2, size(_ss))," +
          " y -> struct(x AS a, y AS b))))")).as("_p"))
      .groupBy(col("_p.a").as("src_a"), col("_p.b").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    // densify: every ordered source pair, zero-filled, both directions
    val allPairs = sizes.select(col("_src").as("src_a"), col("_n").as("n_a"))
      .crossJoin(sizes.select(col("_src").as("src_b"), col("_n").as("n_b")))
      .filter(col("src_a") =!= col("src_b"))
    val sym = pairCounts.unionAll(pairCounts.select(
      col("src_b").as("src_a"), col("src_a").as("src_b"), col("n_common")))
    allPairs.join(sym, Seq("src_a", "src_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("containment_fp", expr("n_common * 100000000L DIV n_a"))
      .withColumn("jaccard_fp",
        expr("n_common * 100000000L DIV (n_a + n_b - n_common)"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_common"),
        col("containment_fp"), col("jaccard_fp"))
  }

  /** Assemble packed bins into trainer-ready token streams: one row per
    * (groupCols, bin) with `doc_ids` (members in id order), `input_ids`
    * (the members' token-id arrays concatenated in that order,
    * optionally joined by `sepId` BETWEEN documents — the EOS/document
    * separator every causal-LM batch layout needs), and `n_tokens`.
    * The last mile from a packed corpus ([[packSequencesStrict]] over
    * [[graft.operators.Bpe.encodeIds]] counts) to the flat id stream a
    * training loop memory-maps.
    *
    * Members order by `idCol` — pack with `orderCol = idCol` (or carry
    * the pack rank as the id) so bin membership and assembly order
    * agree. Scale: the collect_list per bin is bounded by the pack
    * BUDGET (a context window, thousands of ids), never by group size;
    * the aggregation partial-collapses map-side like any other. */
  def assembleSequences(packed: DataFrame, idsCol: String, idCol: String,
                        groupCols: Seq[String], binCol: String = "bin",
                        sepId: Option[Long] = None): DataFrame = {
    require(groupCols.nonEmpty, "assembleSequences needs the pack's group columns")
    val doc = struct(col(idCol).cast("long").as("_did"), col(idsCol).as("_ids"))
    val grouped = packed.groupBy((groupCols.map(col) :+ col(binCol)): _*)
      .agg(array_sort(collect_list(doc)).as("_docs"))
    def dlen(d: Column) = size(d.getField("_ids")).cast("long")
    // alongside the id stream, the two per-token arrays a causal-LM
    // batch needs for document-aware attention: `segment_ids` (which
    // member each token belongs to — the intra-bin attention-mask key)
    // and `position_ids` (positions RESET at each document start). A
    // separator slot carries its preceding document's segment and the
    // next position after it.
    val (flat, seg, pos) = sepId match {
      case Some(sep) =>
        // sep after EVERY doc, then drop the trailing one — exact
        // array ops, engine-replayable
        def dropLast(c: Column) = slice(c, lit(1), size(c) - 1)
        (dropLast(flatten(transform(col("_docs"),
           d => concat(d.getField("_ids"), array(lit(sep)))))),
         dropLast(flatten(transform(col("_docs"),
           (d, i) => array_repeat(i.cast("long"), (dlen(d) + 1).cast("int"))))),
         dropLast(flatten(transform(col("_docs"),
           d => sequence(lit(0L), dlen(d))))))
      case None =>
        (flatten(transform(col("_docs"), d => d.getField("_ids"))),
         flatten(transform(col("_docs"),
           (d, i) => array_repeat(i.cast("long"), dlen(d).cast("int")))),
         flatten(transform(col("_docs"),
           d => when(dlen(d) === 0, array().cast("array<bigint>"))
             .otherwise(sequence(lit(0L), dlen(d) - 1)))))
    }
    grouped.select(groupCols.map(col) ++ Seq(col(binCol),
      col("_docs._did").as("doc_ids"),
      flat.as("input_ids"), seg.as("segment_ids"), pos.as("position_ids")): _*)
      .withColumn("n_tokens", size(col("input_ids")).cast("long"))
  }

  /** Corpus-release diff: per-document status between two corpus
    * versions — `added` (id only in `newDf`), `removed` (only in
    * `oldDf`), `changed` (both, content differs), `unchanged`. The
    * release-management primitive behind "what moved between v3 and
    * v4": attrition audits, incremental re-embedding (re-process only
    * added ∪ changed), changelog reports.
    *
    * Content equality is the exact-dedup contract: the 8-byte
    * [[graft.functions.TextFunctions.fingerprint]] of the normalized
    * text. Each side's scan reduces to (id, fp) BEFORE the full-outer
    * join, so document text never crosses the shuffle — at 100 TB the
    * exchange carries ~10⁻⁴ of the corpus bytes (hash-collision odds at
    * 10¹¹ docs are the same birthday bound the dedup index documents;
    * a collision maps `changed` → `unchanged`). Ids are assumed unique
    * per side (a corpus contract; [[Dedup.exact]] upstream enforces
    * it). */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("_id"),
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("_fpo"))
    val n = newDf.select(col(idCol).as("_id"),
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("_fpn"))
    o.join(n, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_fpo").isNull, lit("added"))
          .when(col("_fpn").isNull, lit("removed"))
          .when(col("_fpo") === col("_fpn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Chronological train/validation split per entity — forecasting and
    * recommendation models must validate on each entity's FUTURE, so
    * the split boundary is per-entity time order, never a row hash
    * (the hash split `assignSplits` covers i.i.d. corpora; this one
    * covers sequences, where hashing leaks the future into training).
    * The first ⌈trainPermille·n/1000⌉ events by (ts, tie) are `train`,
    * the rest `val` — the threshold is exact integer ceil-division, the
    * rank a per-entity window (sharded by the entity key), ties made
    * deterministic by `tieCol`. Output: (entity, tie, ts, split). */
  def timeSplit(df: DataFrame, entityCol: String, tsCol: String, tieCol: String,
                trainPermille: Int = 800): DataFrame = {
    require(trainPermille >= 1 && trainPermille <= 999,
      s"trainPermille must be in [1, 999], got $trainPermille")
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    df.select(col(entityCol), col(tieCol), col(tsCol))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(entityCol))))
      .withColumn("split",
        when(col("_rn") <= expr(s"(_n * $trainPermille + 999) div 1000"),
          lit("train")).otherwise(lit("val")))
      .select(col(entityCol), col(tieCol), col(tsCol), col("split"))
  }

  /** Jensen–Shannon divergence between two corpus slices' unigram
    * distributions — the drift detector between snapshots / sources
    * (symmetric, bounded by ln 2, defined even where one side's count
    * is zero — exactly why it beats raw KL for corpus monitoring).
    * Distributions live on the POOLED top-`vocabSize` vocabulary plus
    * an UNK bucket, so both sides cover identical events and all mass
    * is accounted. All counting is exact integer aggregation; each
    * term's contribution p·ln(p/m) is a pinned double sequence over
    * those exact counts quantized to 1e-12 fixed-point longs, so the
    * TOTAL is an order-independent integer sum (a raw double sum would
    * be partitioning-dependent) and any engine replays it
    * (`q_js_divergence`; ln parity is the LanguageModel contract).
    *
    * Output: one row per pooled-vocab term + UNK — (term, c_a, c_b,
    * contrib_a_fp, contrib_b_fp, js_total_fp) with js_total_fp =
    * Σ(contribs) constant across rows; JS = js_total / 2 / 1e12. The
    * per-term rows ARE the diagnostic (which tokens drove the drift). */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String,
                   vocabSize: Int = 1000): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val Unk = "<unk>"
    def toks(df: DataFrame) = df
      .select(explode(split(
        graft.functions.TextFunctions.normalizeForFingerprint(col(textCol)), " ")).as("_w"))
      .filter(length(col("_w")) > 0)
    // r19: the vocab and the (term, c_a, c_b) grid are vocabSize-bounded
    // and read by MULTIPLE plan references (vocab by both count sides
    // and the grid spine; the grid by the na/nb scalars, the total, and
    // the output) — lazy, each reference re-tokenized the corpora. One
    // checkpoint each caps the whole operator at ONE tokenize scan per
    // side plus bounded-table work; na and nb also collapse to one job.
    val vocab = graft.functions.TextFunctions
      .vocabulary(a.select(col(textCol)).unionAll(b.select(col(textCol))), textCol, vocabSize)
      .select(col("token").as("term"))
      .localCheckpoint(true)
    // one tokenize scan per side: OOV maps to UNK through the broadcast
    // vocab (the TextClassifier.mapUnk shape), then one partial-agg count
    def counts(df: DataFrame, out: String) = toks(df)
      .join(broadcast(vocab.select(col("term").as("_v"))), col("_w") === col("_v"), "left")
      .select(when(col("_v").isNull, lit(Unk)).otherwise(col("_w")).as("term"))
      .groupBy("term").agg(count(lit(1)).as(out))
    val ca = counts(a, "c_a")
    val cb = counts(b, "c_b")
    val grid = vocab.unionAll(a.sparkSession.range(1).select(lit(Unk).as("term")))
      .join(ca, Seq("term"), "left").join(cb, Seq("term"), "left")
      .withColumn("c_a", coalesce(col("c_a"), lit(0L)))
      .withColumn("c_b", coalesce(col("c_b"), lit(0L)))
      .localCheckpoint(true)
    val nRow = grid.agg(sum("c_a"), sum("c_b")).head()
    val na = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val nb = if (nRow.isNullAt(1)) 0L else nRow.getLong(1)
    require(na > 0L && nb > 0L, s"jsDivergence: empty side (na=$na nb=$nb)")
    val pd = col("c_a").cast("double") / lit(na.toDouble)
    val qd = col("c_b").cast("double") / lit(nb.toDouble)
    val md = (pd + qd) / lit(2.0)
    val scored = grid
      .withColumn("contrib_a_fp",
        when(col("c_a") > 0L, floor(pd * log(pd / md) * lit(1e12)).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("contrib_b_fp",
        when(col("c_b") > 0L, floor(qd * log(qd / md) * lit(1e12)).cast("long"))
          .otherwise(lit(0L)))
    val total = scored.agg(sum(col("contrib_a_fp") + col("contrib_b_fp"))).head().getLong(0)
    scored.withColumn("js_total_fp", lit(total))
      .select(col("term"), col("c_a"), col("c_b"),
        col("contrib_a_fp"), col("contrib_b_fp"), col("js_total_fp"))
  }

  /** Seeded in-batch negative sampling for contrastive training
    * (embedding models train on (anchor, positive, k·negatives); the
    * negatives are uniform draws over the corpus excluding the anchor).
    * Requires DENSE ids 0..N−1 (asserted from one bounded agg — the
    * standard contract after a pack/shard stage assigns row numbers):
    * then `neg = (anchor + 1 + draw mod (N−1)) mod N` is uniform over
    * the other N−1 documents and can NEVER collide with the anchor —
    * no rejection loop, no join, no shuffle; the whole operator is a
    * codegen'd projection + a k-wide posexplode, embarrassingly
    * parallel at any corpus size.
    *
    * The draw is the [[Dsir.resampleGumbel]] LCG contract: exact BIGINT
    * modular arithmetic on (id, j, seed) with Spark's sign-free `pmod`,
    * replayable in any engine (`q_neg_sample`; mirror `%` as
    * `((x%m)+m)%m` where it follows the dividend's sign). Seed ≥ 0 for
    * the same reason. Output: (anchor = id, j in 0..k−1, neg_id). */
  def negativeSample(docs: DataFrame, idCol: String, k: Int,
                     seed: Long = 12345L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(seed >= 0L, s"seed must be >= 0, got $seed")
    val b = docs.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long"),
      count(lit(1))).head()
    val (lo, hi, n) = (b.getLong(0), b.getLong(1), b.getLong(2))
    require(n >= 2L, s"negativeSample: need at least 2 documents, got $n")
    require(lo == 0L && hi == n - 1L,
      s"negativeSample: ids must be dense 0..N-1 (got min=$lo max=$hi n=$n) — " +
        "assign row numbers in a shard/pack stage first")
    val m = 2147483648L // 2^31: (m-1)·1103515245 stays inside Long exactly
    val anchor = col("anchor")
    val j = col("j").cast("long")
    val mix = pmod(pmod(anchor, lit(m)) * lit(1103515245L) + lit(seed) + j * lit(12345L), lit(m))
    docs.select(col(idCol).cast("long").as("anchor"),
        posexplode(array_repeat(lit(1), k)).as(Seq("j", "_one")))
      .select(anchor, col("j"),
        pmod(anchor + lit(1L) + pmod(mix, lit(n - 1L)), lit(n)).as("neg_id"))
  }

  /** Distribution matching by seeded downsampling: thin `src` so its
    * share per bucket (a caller-supplied integer feature bucket —
    * length decile, domain, quality band, …) matches the TARGET
    * corpus's bucket distribution — "make the web slice look like the
    * curated slice in length" without importance-weight machinery
    * ([[Dsir]] is the n-gram-feature big sibling; this is the exact
    * histogram-matching small one).
    *
    * Per bucket b the ideal keep fraction is (t_b/T)/(s_b/S), scaled so
    * the binding bucket keeps 100% (maximal data retention):
    * ratio_b = ⌊t_b·S·scale / (s_b·T)⌋ in DECIMAL(38,0) — exact at any
    * corpus size — then keep_fp_b = ⌊ratio_b·scale / max_b ratio_b⌋ ≤
    * scale, a long. A row survives iff LCG(id, seed) mod scale <
    * keep_fp_b — the [[shardShuffle]] LCG, replayable in any engine.
    * Buckets absent from the target are dropped entirely (keep 0);
    * buckets absent from the source simply can't contribute.
    *
    * Scale shape: two count aggregates (bucket-cardinality results),
    * their single-row totals cross-joined broadcast-style, and ONE
    * broadcast hash join of the tiny (bucket, keep_fp) table back onto
    * the source scan — the corpus is read once and filtered at scan
    * level; nothing corpus-sized shuffles.
    *
    * Output: the src columns + (`keep_fp` long). */
  def distMatch(src: DataFrame, tgt: DataFrame, bucketCol: String,
                idCol: String, seed: Long, scale: Long = 1000000L): DataFrame = {
    require(scale >= 1000 && scale <= 1000000000L,
      s"scale must be in [1e3, 1e9], got $scale")
    requireIntegralId(src, idCol)
    val sCnt = src.groupBy(col(bucketCol).as("_b")).agg(count(lit(1)).as("_sb"))
    val tCnt = tgt.groupBy(col(bucketCol).as("_b")).agg(count(lit(1)).as("_tb"))
    val sTot = sCnt.agg(sum(col("_sb")).cast("decimal(38,0)").as("_S"))
    val tTot = tCnt.agg(sum(col("_tb")).cast("decimal(38,0)").as("_T"))
    val ratios = sCnt.join(tCnt, Seq("_b"))
      .crossJoin(broadcast(sTot)).crossJoin(broadcast(tTot))
      .select(col("_b"), expr(
        s"""(CAST(_tb AS DECIMAL(38,0)) * _S * CAST($scale AS DECIMAL(38,0)))
           | DIV (CAST(_sb AS DECIMAL(38,0)) * _T)""".stripMargin.replace("\n", ""))
        .cast("decimal(38,0)").as("_ratio"))
    val mx = ratios.agg(max(col("_ratio")).as("_mx"))
    val keep = ratios.crossJoin(broadcast(mx))
      .select(col("_b"), expr(
        s"CAST((_ratio * CAST($scale AS DECIMAL(38,0))) DIV _mx AS BIGINT)")
        .as("keep_fp"))
    val m = 2147483648L
    val key = pmod(
      pmod(col(idCol).cast("long"), lit(m)) * lit(1103515245L) + lit(seed), lit(m))
    src.join(broadcast(keep), col(bucketCol) === col("_b"))
      .filter(pmod(key, lit(scale)) < col("keep_fp"))
      .drop("_b")
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023): turn measured
    * per-domain excess loss into mixture weights via the exponentiated-
    * gradient update w_i ∝ exp(η·excess_i), smoothed with the uniform
    * mixture — the readout step of DoReMi given a scored corpus (the
    * iterative proxy-retraining loop is a training-cluster job; what
    * the DATA pipeline owns is exactly this: loss rollup → softmax →
    * smoothed weights → hand to [[mixWeighted]]).
    *
    * Input: a per-document scored table ([[LanguageModel.scoreNll]]
    * shape): `nllCol` the 4-decimal mean NLL, `weightCol` the token
    * count it averages over. Unscored docs (NULL nll / zero tokens)
    * are excluded — they carry no loss signal.
    *
    * Exactness: the 4-decimal fixed point is recovered as
    * ⌊nll·10⁴ + 0.5⌋ (exact — the stored double is within 1 ulp of
    * k·10⁻⁴), token-weighted domain means are half-up INTEGER
    * divisions of DECIMAL(38,0) sums, excess clamps at 0 against the
    * token-weighted corpus mean, and the softmax runs on
    * e_fp = ⌊exp(η·excess)·10⁹⌋ integers so the normalizing sum is
    * order-independent; weight/weight_smoothed are the only doubles,
    * pinned divisions of those integers. Corpus-sized work: ONE
    * partial-aggregated pass; everything after is domain-cardinality.
    *
    * Output per domain: (domainCol, n_docs, tokens, nll_x1e4,
    * excess_x1e4, e_fp, weight, weight_smoothed). */
  def domainSoftmaxWeights(scored: DataFrame, domainCol: String,
                           nllCol: String, weightCol: String,
                           eta: Double = 1.0, smoothing: Double = 0.2): DataFrame = {
    require(eta > 0.0, s"eta must be > 0, got $eta")
    require(smoothing >= 0.0 && smoothing < 1.0,
      s"smoothing must be in [0, 1), got $smoothing")
    val nll4 = floor(col(nllCol) * lit(10000.0) + lit(0.5)).cast("long")
    val dom = scored
      .filter(col(nllCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol)).as("tokens"),
        sum((col(weightCol) * nll4).cast("decimal(38,0)")).as("_w4"))
    val tot = dom.agg(sum(col("tokens")).as("_t"), sum(col("_w4")).as("_s"))
    val x = dom.crossJoin(broadcast(tot))
      .withColumn("nll_x1e4",
        expr("(_w4 + CAST(tokens div 2 AS DECIMAL(38,0))) div tokens").cast("long"))
      .withColumn("excess_x1e4", greatest(col("nll_x1e4") -
        expr("(_s + CAST(_t div 2 AS DECIMAL(38,0))) div _t").cast("long"), lit(0L)))
      .withColumn("e_fp", floor(
        exp(lit(eta) * col("excess_x1e4").cast("double") / lit(10000.0)) * lit(1e9))
        .cast("long"))
    val norm = x.agg(sum(col("e_fp")).as("_se"), count(lit(1)).as("_k"))
    val w = col("e_fp").cast("double") / col("_se").cast("double")
    x.crossJoin(broadcast(norm))
      .select(col(domainCol), col("n_docs"), col("tokens"),
        col("nll_x1e4"), col("excess_x1e4"), col("e_fp"),
        w.as("weight"),
        ((lit(1.0) - lit(smoothing)) * w +
          lit(smoothing) / col("_k").cast("double")).as("weight_smoothed"))
  }

  /** Cluster-aware train/dev/test assignment — the FIX to what
    * `q_split_leakage` detects: hash-split documents by their near-dup
    * CLUSTER ROOT instead of their own id, so every member of a
    * duplicate cluster lands in the SAME split and no eval example has
    * a training-set near-twin. Feed it
    * [[Dedup.connectedComponents]]' (id, component) output (or any
    * cluster table); documents absent from it are singletons rooted at
    * their own id.
    *
    * Assignment is the replayable Knuth-hash bucket
    * `(root·2654435761 mod 2³²) mod Σweights` walked through the
    * cumulative split weights — deterministic, partitioning-
    * independent, and exactly replayable in SQL; adding documents to
    * an EXISTING cluster can never move the cluster (the root decides).
    * One co-partitioned left join + a stateless bucket projection.
    *
    * Pair generation for the `components` input: the scale-safe
    * DEFAULT is [[leakageSafeSplit]]'s replayable MinHash-LSH
    * candidates ([[Dedup.replayableMinhashPairs]] — linear, buckets
    * grow with near-dup density); exact blocked all-pairs Jaccard
    * ([[Dedup.ngramJaccardPairs]]) is the opt-in small-corpus verifier
    * — its lang+length blocks grow with the CORPUS (measured scaling
    * exponent 1.99 at the r14 10× stress point), so always bind it to
    * its block cap and audit drops with [[Dedup.oversizedBlocks]].
    *
    * Output: `df`'s idCol plus (root, split). */
  def clusterAwareSplit(df: DataFrame, idCol: String, components: DataFrame,
                        splits: Seq[(String, Long)] =
                          Seq(("train", 8L), ("dev", 1L), ("test", 1L))): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive weights, got $splits")
    requireIntegralId(df, idCol)
    val total = splits.map(_._2).sum
    val roots = df.select(col(idCol))
      .join(components.select(col("id").as(idCol), col("component")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).cast("long").as("root"))
    // DECIMAL(38,0) widening like assignSplits: cluster roots can be
    // hashed 64-bit ids, and root×2654435761 overflows a long
    val bucket = expr(
      "CAST(pmod(CAST(root AS DECIMAL(38,0)) * 2654435761, 4294967296) AS BIGINT)") % lit(total)
    val bounds = splits.scanLeft(0L)(_ + _._2).tail
    // innermost = last split; each earlier split wraps it, so the
    // OUTERMOST (first-bound) check wins — a chained CASE
    val split = splits.zip(bounds).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) => when(bucket < lit(hi), lit(name)).otherwise(acc)
    }
    roots.withColumn("split", split)
  }

  /** End-to-end leakage-proof splitting on a scale-safe LSH path
    * (VERDICT r14 #1 — the exact blocked all-pairs generator this
    * replaced measured scaling exponent 1.99 at the r14 10× stress
    * point; it survives only as the opt-in small-corpus verifier, see
    * [[clusterAwareSplit]]'s scaladoc): LSH candidate pairs →
    * connected components → root-hashed [[clusterAwareSplit]].
    *
    * Two LSH generators, both LINEAR, measured side by side in
    * `BENCH_scale.json`:
    *
    *  - DEFAULT (`replayable = false`): the fused xxhash64 sketch
    *    ([[Dedup.minhashCandidates]]) — the throughput path (10×
    *    ratio ~1.7: overhead-dominated at bench scale), est-Jaccard
    *    verified;
    *  - `replayable = true`: md5 minhashes with EXACT-Jaccard verify
    *    ([[Dedup.replayableMinhashPairs]]) — bit-replayable in any
    *    engine (what `q_cluster_split`'s oracle replays), ~3× the
    *    hash cost (10× ratio 8.6 ≈ exponent 0.93 — the clean linear
    *    signature of a compute-bound scan; md5 is the price of
    *    auditability).
    *
    * Pick replayable when an external audit must reproduce the split
    * bit-for-bit; the default when throughput rules. Both feed the
    * same components + root-hash, so cluster membership semantics are
    * identical up to LSH recall. */
  def leakageSafeSplit(df: DataFrame, textCol: String, idCol: String,
                       splits: Seq[(String, Long)] =
                         Seq(("train", 8L), ("dev", 1L), ("test", 1L)),
                       n: Int = 3, threshold: Double = 0.6,
                       numHashes: Int = 8, maxBucketSize: Int = 2000,
                       replayable: Boolean = false): DataFrame = {
    val pairs =
      if (replayable) graft.operators.Dedup.replayableMinhashPairs(
        df, textCol, idCol, n, numHashes, threshold, maxBucketSize)
      else graft.operators.Dedup.minhashCandidates(
        df, textCol, idCol, shingleLen = n, threshold = threshold,
        maxBucketSize = maxBucketSize)
    clusterAwareSplit(df, idCol, graft.operators.Dedup.connectedComponents(pairs), splits)
  }

  /** Shard-local dynamic batching: group sequences into trainer batches
    * that minimize pad waste — sort by length DESC within each shard,
    * cut every `batchSize` rows, pad each batch to its own max. The
    * per-batch report (n_seqs, max_len, sum_len, padding = n·max − sum)
    * is the "how much compute goes to pad tokens" readout that decides
    * between dynamic batching and [[packSequences]]-style packing.
    *
    * Sharding uses the seeded replayable LCG
    * (`(id·1103515245 + seed) mod 2³¹ mod numShards` — the
    * [[shardShuffle]] key), so batch membership is a pure function of
    * (id, len, seed): deterministic, partitioning-independent, and
    * exactly replayable in SQL. Length ties order by id ASC. Windows
    * partition BY SHARD — pick numShards so a shard's rows fit a task
    * (the global-sort formulation this replaces cannot scale past one
    * machine; per-shard batching is also what a data-parallel trainer
    * actually consumes). Ids must be integral ([[requireIntegralId]]).
    *
    * Output: one row per batch — (shard, batch, n_seqs, max_len,
    * sum_len, padding). */
  def dynamicBatches(df: DataFrame, idCol: String, lenCol: String,
                     batchSize: Int, numShards: Int = 64,
                     seed: Long = 0L): DataFrame = {
    require(batchSize >= 1 && numShards >= 1,
      s"need batchSize >= 1 and numShards >= 1, got $batchSize/$numShards")
    requireIntegralId(df, idCol)
    val shard = pmod(col(idCol).cast("long") * lit(1103515245L) + lit(seed),
      lit(2147483648L)) % lit(numShards.toLong)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("_len").desc, col(idCol))
    df.select(col(idCol), col(lenCol).cast("long").as("_len"))
      .filter(col("_len").isNotNull && col("_len") >= 0)
      .withColumn("shard", shard)
      .withColumn("_rn", row_number().over(w))
      // Column./ is fractional division — integer `div` for the cut
      .withColumn("batch", expr(s"CAST((_rn - 1) div $batchSize AS BIGINT)"))
      .groupBy(col("shard"), col("batch"))
      .agg(count(lit(1)).as("n_seqs"),
        max(col("_len")).as("max_len"),
        sum(col("_len")).as("sum_len"))
      .withColumn("padding", col("n_seqs") * col("max_len") - col("sum_len"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
    * denoising-objective data transform: mask a fraction of each
    * document's tokens, collapse each masked RUN into one numbered
    * sentinel, and emit the (corrupted input, denoising target) pair
    *
    *   input:  "the <extra_id_0> sat on <extra_id_1> mat"
    *   target: "<extra_id_0> cat <extra_id_1> the"
    *
    * Masking is per-token Bernoulli at the exact rational
    * `ratioNum/ratioDen`, drawn from the seeded LCG
    * `((id·1103515245 + pos·12345 + seed) mod 2³¹) mod ratioDen` —
    * the replayable-sampling contract every seeded operator here
    * shares: same inputs ⇒ same corruption in ANY engine, so the
    * oracle replays every mask decision, run boundary, and sentinel
    * number. (Bernoulli gives geometric run lengths — the
    * span-flavored variant of BERT masking; T5's mean-3 spans are one
    * `meanSpan` parameter away but need correlated draws, which would
    * complicate the replay for no test power.)
    *
    * Shape: one tokenize + posexplode, ONE document-partitioned window
    * pass that computes mask draws, run ids (pos − run_ordinal), and
    * sentinel numbers, then a per-document ordered rebuild
    * (collect_list bounded by document length — chunk upstream, the
    * [[chunkDocuments]] contract). Documents with no masked token keep
    * an empty target; ids must be integral ([[requireIntegralId]]).
    *
    * Output: (idCol, corrupted, target, n_tokens, n_masked). */
  def spanCorrupt(df: DataFrame, textCol: String, idCol: String,
                  ratioNum: Long = 15L, ratioDen: Long = 100L,
                  seed: Long = 0L): DataFrame = {
    require(ratioDen > 0 && ratioNum >= 0 && ratioNum <= ratioDen,
      s"need 0 <= ratio = $ratioNum/$ratioDen <= 1")
    requireIntegralId(df, idCol)
    val toks = df.select(col(idCol).cast("long").as("_id"),
        posexplode(split(graft.functions.TextFunctions.normalizeForFingerprint(
          coalesce(col(textCol), lit(""))), " ")).as(Seq("_pos", "_w")))
      .filter(length(col("_w")) > 0)
    val draw = pmod(col("_id") * lit(1103515245L) + col("_pos") * lit(12345L) + lit(seed),
      lit(2147483648L)) % lit(ratioDen)
    val marked = toks.withColumn("_m", draw < lit(ratioNum))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_pos"))
    // a masked token starts a run iff the previous token wasn't masked;
    // the running count of run-starts IS the sentinel number (1-based)
    val runs = marked
      .withColumn("_start", col("_m") &&
        !coalesce(lag(col("_m"), 1).over(wDoc), lit(false)))
      .withColumn("_sent",
        sum(when(col("_start"), 1L).otherwise(0L)).over(wDoc))
    val tok = struct(col("_pos").as("p"), col("_w").as("w"), col("_m").as("m"),
      col("_start").as("st"), (col("_sent") - 1L).as("k"))
    def sentinel(x: Column): Column =
      concat(lit("<extra_id_"), x.getField("k").cast("string"), lit(">"))
    val empty = array().cast("array<string>")
    runs.groupBy(col("_id")).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_m"), 1L).otherwise(0L)).as("n_masked"),
        array_sort(collect_list(tok)).as("_ts"))
      .select(col("_id").as(idCol), col("n_tokens"), col("n_masked"),
        concat_ws(" ", flatten(transform(col("_ts"), x =>
          when(!x.getField("m"), array(x.getField("w")))
            .when(x.getField("st"), array(sentinel(x)))
            .otherwise(empty)))).as("corrupted"),
        concat_ws(" ", flatten(transform(col("_ts"), x =>
          when(x.getField("m") && x.getField("st"),
              array(sentinel(x), x.getField("w")))
            .when(x.getField("m"), array(x.getField("w")))
            .otherwise(empty)))).as("target"))
      .select(col(idCol), col("corrupted"), col("target"),
        col("n_tokens"), col("n_masked"))
  }

  /** Data-constrained EPOCH allocation — the "how many times may each
    * source repeat" planning table for a token budget that exceeds the
    * unique data (the Muennighoff et al. 2023 regime, where repeating
    * good sources up to ~4 epochs beats diluting the mix): per source,
    * desired tokens = weight × budget, capped at `maxEpochsFp/1000`
    * epochs of what the source actually has, with the capped sources'
    * unspent budget redistributed ONCE across the uncapped sources in
    * proportion to their remaining headroom (a second pass would chase
    * integer crumbs; the residual is reported, not hidden).
    *
    * Exactness: weights are caller-normalized binary-exact doubles (the
    * [[mixByWeight]] convention) so `desired = ⌊w·budget⌋` replays;
    * everything after is integer arithmetic (truncating DIV), and
    * `epochs_fp` is thousandths. The per-source table is
    * weights-bounded — totals ride one broadcast aggregate row, no
    * window, no driver loop over data.
    *
    * Output: (source, available, desired, cap, allocated, epochs_fp,
    * saturated) — `allocated ≤ cap` always; `saturated` marks sources
    * pinned at their epoch cap. */
  def epochAllocation(df: DataFrame, sourceCol: String, weightCol: String,
                      weights: Map[String, Double], budget: Long,
                      maxEpochsFp: Long = 4000L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be a non-empty map of positive values")
    require(budget > 0, s"budget must be positive, got $budget")
    require(maxEpochsFp >= 1000L, s"maxEpochsFp must be >= 1000 (1 epoch), got $maxEpochsFp")
    val wsum = weights.values.sum
    val spark = df.sparkSession
    // desired tokens are weights×budget only — computed once here, so
    // the data pass below is pure integer arithmetic
    val plan = broadcast(spark.createDataFrame(weights.toSeq.map { case (k, v) =>
      (k, math.floor(v / wsum * budget).toLong)
    }).toDF(sourceCol, "desired"))
    val avail = df.filter(col(sourceCol).isin(weights.keySet.toSeq: _*))
      .groupBy(col(sourceCol))
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("available"))
    val base = plan.join(avail, Seq(sourceCol), "left")
      .withColumn("available", coalesce(col("available"), lit(0L)))
      // DECIMAL intermediate: available×maxEpochsFp wraps a long once
      // available passes ~2.3e15 tokens — same widening rationale as
      // the leftover×headroom product below
      .withColumn("cap", expr(
        s"CAST(CAST(available AS DECIMAL(38,0)) * ${maxEpochsFp}L DIV 1000L AS BIGINT)"))
      .withColumn("_alloc1", least(col("desired"), col("cap")))
      .withColumn("_headroom", col("cap") - col("_alloc1"))
    val totals = broadcast(base.agg(
      (sum(col("desired")) - sum(col("_alloc1"))).as("_leftover"),
      sum(col("_headroom")).as("_totalHeadroom")))
    base.crossJoin(totals)
      .withColumn("_extra",
        when(col("_totalHeadroom") > 0L,
          least(col("_headroom"),
            // DECIMAL product: leftover×headroom can pass 2⁶³ at real budgets
            expr("CAST(CAST(_leftover AS DECIMAL(38,0)) * _headroom DIV _totalHeadroom AS BIGINT)")))
          .otherwise(lit(0L)))
      .withColumn("allocated", col("_alloc1") + col("_extra"))
      .select(col(sourceCol), col("available"), col("desired"), col("cap"),
        col("allocated"),
        when(col("available") > 0L,
          expr("CAST(CAST(allocated AS DECIMAL(38,0)) * 1000L DIV available AS BIGINT)"))
          .otherwise(lit(0L)).as("epochs_fp"),
        (col("allocated") === col("cap")).as("saturated"))
  }
}
