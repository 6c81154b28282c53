package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-scan column profiling — the ANALYZE/SUMMARIZE analog every
  * ingestion pipeline runs before trusting a new drop: per column,
  * row/null/distinct counts and min/max, emitted as one tidy row per
  * column. Feeds schema-drift alerts, partition-key candidacy checks
  * ("is NDV ~ row count?"), and the optimizer-statistics story.
  *
  * ONE aggregation pass produces every metric; the per-column unpivot
  * is a `stack` over the single result row (plan-literal expansion,
  * zero data motion). Min/max render as strings so heterogeneous
  * columns share one schema.
  *
  * NDV modes: `exactNdv = false` (the 100 TB default) uses
  * `approx_count_distinct` — HLL++ sketches, mergeable partials, still
  * one scan and one exchange of sketch bytes. `exactNdv = true` is the
  * verification mode (the oracle can replay it): k exact distinct
  * aggregates make Catalyst plan an Expand (k+1 rows per input row
  * pre-aggregation) — correct, but the shuffle carries the expansion,
  * so at scale prefer the sketch and reserve exact for samples/audits.
  */
object Profile {

  /** Per-group discrete percentiles of `valueCol` (nulls excluded):
    * one row per group — groupCols ++ (n, p_<pct>…), each percentile
    * the element at rank `ceil(p·n)` of the group's ascending values
    * (PERCENTILE_DISC — a SELECTED value, never interpolated
    * arithmetic, so any engine replays it bit-for-bit).
    *
    * Two modes, same contract as [[profileColumns]]'s NDV:
    * `exact = false` (the 100 TB default) runs
    * `percentile_approx` — a mergeable sketch, map-side partials, one
    * exchange of sketch bytes, no group ever sorted. `exact = true` is
    * the verification mode the oracle replays: a rank window PER GROUP
    * — bounded by the group's row count, the right tool for audits and
    * test-scale parity but a per-group sort at scale. In the sketch's
    * exact regime (accuracy ≥ group size) both modes return identical
    * values (spec-pinned). */
  def percentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
                  exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "percentiles needs at least one group column")
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must be in (0, 1], got $ps")
    def pName(p: Double): String = "p_" + (p * 100).round.toString
    val vals = df.filter(col(valueCol).isNotNull)
    if (exact) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
      val ranked = vals
        .withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)))
      val aggs = count(lit(1)).as("n") +: ps.map(p =>
        max(when(col("_rn") === ceil(lit(p) * col("_n")), col(valueCol))).as(pName(p)))
      ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    } else {
      val pArr = array(ps.map(lit): _*)
      val aggs = count(lit(1)).as("n") +:
        Seq(percentile_approx(col(valueCol), pArr, lit(accuracy)).as("_pa"))
      vals.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
        .select(groupCols.map(col) ++ (col("n") +:
          ps.zipWithIndex.map { case (p, i) => col("_pa").getItem(i).as(pName(p)) }): _*)
    }
  }

  /** Robust outlier detection per group: median / MAD (median absolute
    * deviation) gating — `|x − median| > k·MAD` — the audit that
    * survives the outliers it hunts (mean/stddev gates move with the
    * contamination; the median breaks down only past 50%). Runs on any
    * numeric column; rows with NULL `valueCol` are never flagged.
    *
    * Both location estimates are PERCENTILE_DISC rank selections
    * ([[percentiles]]): selected data values, never interpolated, so
    * the gate `dev > k·mad` is one IEEE multiply+compare of values any
    * engine reproduces bit-for-bit (no consistency constant — fold
    * 1.4826 into `k` if a normal-σ scale is wanted).
    *
    * Scale shape: two grouped percentile passes (sketch mode by
    * default — mergeable partials, no group sorted; `exact = true` is
    * the oracle-replayable audit mode) plus two group-table joins —
    * the group tables are one row per group, broadcast-sized in any
    * realistic grouping. The input is scanned per pass rather than
    * checkpointed: an audit reads the corpus thrice rather than
    * pinning 100 TB to executor storage.
    *
    * Output: the flagged rows only — input columns ++ (med, mad) —
    * bounded by the true outlier count, not the corpus. */
  def robustOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     k: Double = 3.0, exact: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "robustOutliers needs at least one group column")
    require(k > 0.0, s"k must be positive, got $k")
    val med = percentiles(df, groupCols, valueCol, ps = Seq(0.5), exact = exact)
      .select(groupCols.map(col) :+ col("p_50").as("_med"): _*)
    val dev = df.join(med, groupCols)
      .withColumn("_dev", abs(col(valueCol) - col("_med")))
    val mad = percentiles(dev, groupCols, "_dev", ps = Seq(0.5), exact = exact)
      .select(groupCols.map(col) :+ col("p_50").as("_mad"): _*)
    dev.join(mad, groupCols)
      .filter(col("_dev") > lit(k) * col("_mad"))
      .select(df.columns.map(col) :+ col("_med").as("med") :+ col("_mad").as("mad"): _*)
  }

  /** Robust feature scaling: `(x − median) / IQR` per group — the
    * outlier-immune standardization (scikit-learn's RobustScaler) for
    * feature pipelines where one corrupt reading would drag a
    * mean/stddev scale arbitrarily far.
    *
    * Median and quartiles are rank SELECTIONS ([[percentiles]]): data
    * values, so the scale arithmetic is the same two IEEE ops in every
    * engine. Degenerate groups (IQR = 0) scale to 0.0 rather than
    * ±Inf — a constant feature carries no signal either way. NULL
    * values pass through as NULL scaled.
    *
    * Scale shape: one grouped percentile pass (sketch by default,
    * `exact = true` for the oracle) + one broadcast-sized group-table
    * join. Output: input columns + (med, iqr, scaled). */
  def robustScale(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  exact: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "robustScale needs at least one group column")
    val q = percentiles(df, groupCols, valueCol, ps = Seq(0.25, 0.5, 0.75),
        exact = exact)
      .select(groupCols.map(col) ++ Seq(col("p_50").as("med"),
        (col("p_75") - col("p_25")).as("iqr")): _*)
    df.join(q, groupCols)
      .withColumn("scaled",
        when(col("iqr") === 0.0, lit(0.0))
          .otherwise((col(valueCol) - col("med")) / col("iqr")))
      .select(df.columns.map(col) ++ Seq(col("med"), col("iqr"), col("scaled")): _*)
  }

  /** Profile `cols` of `df`: one row per column —
    * (col_name, n_rows, n_nulls, n_distinct, min_val, max_val). */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     exactNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: cols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        sum(col(c).isNull.cast("long")).as(s"_nulls$i"),
        (if (exactNdv) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"_ndv$i"),
        min(col(c)).cast("string").as(s"_min$i"),
        max(col(c)).cast("string").as(s"_max$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', _nulls$i, CAST(_ndv$i AS BIGINT), _min$i, _max$i"
    }.mkString(", ")
    row.select(
      expr(s"stack(${cols.length}, $stackArgs)")
        .as(Seq("col_name", "n_nulls", "n_distinct", "min_val", "max_val")),
      col("_n").as("n_rows"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Per-group winsorization: clamp `valueCol` into its group's
    * [p_lo, p_hi] rank-selected band — the outlier TAMER next to
    * [[robustOutliers]]'s outlier FLAGGER (training pipelines usually
    * want heavy tails pulled in, not rows dropped). Bounds come from
    * [[percentiles]] — PERCENTILE_DISC selections, so both clamp edges
    * are actual data values any engine reproduces; same
    * exact-vs-sketch mode contract (sketch is the 100 TB default, the
    * rank window the oracle-replayable audit mode). The bounds table
    * is one row per group (broadcast); null values pass through null.
    * Output: input columns + (lo, hi, value_w). */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                loP: Double = 0.05, hiP: Double = 0.95,
                exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(loP > 0.0 && loP < hiP && hiP <= 1.0,
      s"need 0 < loP < hiP <= 1, got $loP/$hiP")
    def pName(p: Double): String = "p_" + (p * 100).round.toString
    val bounds = percentiles(df, groupCols, valueCol, Seq(loP, hiP), exact, accuracy)
      .select(groupCols.map(col) :+ col(pName(loP)).as("lo") :+
        col(pName(hiP)).as("hi"): _*)
    // left join: groups with no non-null values keep their rows (null
    // bounds are skipped by least/greatest, so the value passes
    // through); null VALUES must be guarded explicitly — the same
    // null-skipping would otherwise clamp them onto the lower bound
    df.join(broadcast(bounds), groupCols, "left")
      .withColumn("value_w",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("lo")), col("hi"))))
  }

  /** Quantile normalization across sources — score calibration for
    * mixed corpora: each source's `valueCol` distribution maps onto the
    * POOLED distribution, so "top 10% within its source" means the same
    * number everywhere (the cross-scorer comparability a mixing stage
    * needs). Every step is integer arithmetic over SELECTED values —
    * never interpolation — so any engine replays it bit-for-bit
    * (`q_quantile_norm`):
    *
    *  1. global grid: the value at global rank ⌈i·N/Q⌉ for i = 1..Q,
    *     selected from the cumulative counts of DISTINCT values — the
    *     only ordered pass is a window over the NDV-bounded distinct
    *     table, never a corpus-wide row sort (the NDV table is to a
    *     row sort what a histogram is to raw data);
    *  2. per-source rank: row_number partitioned BY SOURCE (sharded),
    *     ordered by (value, id) so ties are deterministic;
    *  3. map: grid index ⌈rn·Q/n_s⌉ (exact integer ceil-div), join the
    *     Q-row grid (broadcast).
    *
    * Output: input id/source/value + (grid_idx, norm_value). Null
    * values pass through with null norm. Q bounds the resolution;
    * sources smaller than Q just hit a coarser subset of the grid. */
  def quantileNormalize(df: DataFrame, sourceCol: String, valueCol: String,
                        idCol: String, gridSize: Int = 100): DataFrame = {
    require(gridSize >= 2, s"gridSize must be >= 2, got $gridSize")
    val spark = df.sparkSession
    val vals = df.filter(col(valueCol).isNotNull)
    val n = vals.count()
    require(n > 0L, "quantileNormalize: no non-null values")
    // cumulative counts over DISTINCT values (NDV rows, not corpus rows)
    val cum = vals.groupBy(col(valueCol).as("_v")).agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("_v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    // grid value i = first value whose cumulative count reaches ⌈i·N/Q⌉
    val targets = spark.range(1, gridSize + 1).select(col("id").cast("int").as("grid_idx"),
      // ⌈i·N/Q⌉ via exact integer div (Column./ is double division)
      expr(s"(id * CAST($n AS BIGINT) + ${gridSize - 1}) div $gridSize").as("_r"))
    val grid = broadcast(targets).join(cum, col("_cum") >= col("_r"))
      .groupBy("grid_idx").agg(min(col("_v")).as("norm_value"))
    val bySource = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(valueCol).asc, col(idCol).asc)
    val ranked = vals
      .withColumn("_rn", row_number().over(bySource))
      .withColumn("_ns", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(sourceCol))))
      .withColumn("grid_idx",
        expr(s"CAST((CAST(_rn AS BIGINT) * $gridSize + _ns - 1) div _ns AS INT)"))
    val normed = ranked.join(broadcast(grid), Seq("grid_idx"))
      .select(col(idCol), col(sourceCol), col(valueCol), col("grid_idx"),
        col("norm_value"))
    df.filter(col(valueCol).isNull)
      .select(col(idCol), col(sourceCol), col(valueCol),
        lit(null).cast("int").as("grid_idx"),
        lit(null).cast(normed.schema("norm_value").dataType).as("norm_value"))
      .unionByName(normed)
  }

  /** Benford leading-digit audit — the classic fabricated-numbers
    * smoke test over any monetary/measure column, one partial-aggregated
    * pass per group. The digit extraction is EXACT integer work (no
    * log10, whose last-ulp differs across libm implementations):
    * quantize to |⌊v·100⌋| cents, print the long (integer→string is
    * identical in every engine), take the first character. Expected
    * Benford mass is a LITERAL fixed-point table (⌊log₁₀(1+1/d)·10⁸⌋
    * precomputed here, so no engine evaluates a transcendental), and
    * the deviation is exact DECIMAL arithmetic: dev_x1e8 =
    * n_d·10⁸ − n_total·p_fp. Zero-valued rows carry no leading digit
    * and are excluded (their count is the n_total complement callers
    * can audit separately); digits with zero observations still emit a
    * row (their deficit IS the signal). Output: (group…, digit, n_obs,
    * n_total, expected_fp, dev_x1e8). */
  def benford(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "benford: need at least one group column")
    // ⌊log10(1 + 1/d)·1e8⌋ for d = 1..9 — literals, not runtime math
    val pFp = Array(30102999L, 17609125L, 12493873L, 9691001L, 7918124L,
      6694678L, 5799194L, 5115252L, 4575749L)
    val spark = df.sparkSession
    import spark.implicits._
    val pTable = broadcast(pFp.indices.map(i => (i + 1, pFp(i))).toDF("digit", "p_fp"))
    val gs = groupCols.map(col)
    val cents = abs(floor(col(valueCol) * lit(100.0)).cast("long"))
    val digits = df
      .filter(col(valueCol).isNotNull)
      .withColumn("_cents", cents)
      .filter(col("_cents") > 0L)
      .withColumn("digit", substring(col("_cents").cast("string"), 1, 1).cast("int"))
      .groupBy(gs :+ col("digit"): _*)
      .agg(count(lit(1)).as("n_obs"))
    val totals = digits.groupBy(gs: _*).agg(sum(col("n_obs")).as("n_total"))
    // group × 9 grid so zero-observation digits surface
    totals.crossJoin(pTable)
      .join(digits, groupCols :+ "digit", "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("expected_fp",
        (col("n_total").cast("decimal(38,0)") * col("p_fp")).cast("long"))
      .withColumn("dev_x1e8",
        (col("n_obs").cast("decimal(38,0)") * lit(100000000L) -
          col("n_total").cast("decimal(38,0)") * col("p_fp")).cast("long"))
      .select((gs :+ col("digit") :+ col("n_obs") :+ col("n_total") :+
        col("expected_fp") :+ col("dev_x1e8")): _*)
  }

  /** Pairwise Pearson correlation matrix over numeric columns, in ONE
    * corpus pass: every moment the formula needs — per-pair n (pairwise-
    * complete: both sides non-null), Σx, Σy, Σx², Σy², Σxy — is an
    * EXACT fixed-point DECIMAL(38,0) sum in a single aggregate (values
    * scaled by 10^scale and floored, products taken in decimal so
    * nothing overflows a long), and the single result row explodes into
    * the C(k,2) pair rows without a second scan. r is then the pinned
    * double (n·Σxy − Σx·Σy)/√((n·Σx²−(Σx)²)·(n·Σy²−(Σy)²)) — same
    * term-for-term tree on any engine, so identical sums give identical
    * doubles. The scale trade is [[Analytics.welchT]]'s: pick `scale`
    * so |x|·10^scale·√rows stays far inside 38 digits.
    *
    * Output: (col_a, col_b, n, r), col_a < col_b by input order,
    * r NULL when either side is constant (zero variance). */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs at least 2 columns, got ${cols.size}")
    require(cols.distinct == cols, s"columns must be distinct, got $cols")
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val fixed = df.select(cols.map(c =>
      floor(col(c) * lit(p)).cast("decimal(38,0)").as(s"_$c")): _*)
    val pairsIdx = for (i <- cols.indices; j <- cols.indices if i < j) yield (i, j)
    def both(i: Int, j: Int) =
      col(s"_${cols(i)}").isNotNull && col(s"_${cols(j)}").isNotNull
    // one aggregate: per-pair moments under pairwise-complete masking
    val aggs = pairsIdx.flatMap { case (i, j) =>
      val (x, y) = (col(s"_${cols(i)}"), col(s"_${cols(j)}"))
      val m = both(i, j)
      Seq(
        sum(when(m, 1L).otherwise(0L)).as(s"n_${i}_$j"),
        sum(when(m, x)).as(s"sx_${i}_$j"),
        sum(when(m, y)).as(s"sy_${i}_$j"),
        sum(when(m, x * y)).as(s"sxy_${i}_$j"),
        sum(when(m, x * x)).as(s"sxx_${i}_$j"),
        sum(when(m, y * y)).as(s"syy_${i}_$j"))
    }
    val one = fixed.agg(aggs.head, aggs.tail: _*)
    // single row → pair rows via an inline-exploded literal-shaped array
    val pairStructs = pairsIdx.map { case (i, j) =>
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        col(s"n_${i}_$j").as("n"),
        col(s"sx_${i}_$j").cast("double").as("sx"),
        col(s"sy_${i}_$j").cast("double").as("sy"),
        col(s"sxy_${i}_$j").cast("double").as("sxy"),
        col(s"sxx_${i}_$j").cast("double").as("sxx"),
        col(s"syy_${i}_$j").cast("double").as("syy"))
    }
    val rows = one.select(explode(array(pairStructs: _*)).as("_p")).select(col("_p.*"))
    val nD = col("n").cast("double")
    val covN = nD * col("sxy") - col("sx") * col("sy")
    val vx = nD * col("sxx") - col("sx") * col("sx")
    val vy = nD * col("syy") - col("sy") * col("sy")
    rows.select(col("col_a"), col("col_b"), col("n"),
      when(col("n") > 1 && vx > 0.0 && vy > 0.0, covN / sqrt(vx * vy)).as("r"))
  }

  /** Distinct-n lexical diversity (Li et al. 2016's distinct-1/-2,
    * computed corpus-side): per (group, n), the total and DISTINCT
    * n-gram counts and their ratio — the standard "is this slice
    * template spam or organic text" readout a curation pipeline runs
    * per source/language before mixing. A near-zero distinct-2 ratio
    * on a large slice is boilerplate (one template stamped millions of
    * times); organic prose sits far higher.
    *
    * Tokenization is the corpus-standard whitespace normalization
    * ([[graft.functions.TextFunctions.normalizeForFingerprint]], empty
    * tokens dropped), so the oracle replays it verbatim. Counts are
    * exact longs; the ratio is the single pinned final division.
    *
    * Scale shape: the n-gram explode (n× token count) feeds a
    * two-level aggregate — the (group, n, gram) count partial-collapses
    * map-side, so hot grams (exactly the boilerplate this detects)
    * never concentrate an exchange; the per-(group, n) rollup is
    * group-cardinality-sized. Nothing is collected; no windows. */
  /** Per-group Gini coefficient of a weight distribution — the
    * inequality readout a curation pipeline runs over token counts per
    * slice: near 0 = uniform usage, near 1 = a handful of tokens (or
    * domains, or duplicated documents) carry all the mass — the
    * concentration complement to [[ngramDiversity]]'s distinct ratios
    * and the Zipf fit.
    *
    * Exact discrete formula over the ascending-sorted weights
    * (i = 1..n): G = Σ w_i·(2i − n − 1) / (n·Σw) — the numerator an
    * integer sum (rank window ordered (weight, item) for a total
    * deterministic order), the value one pinned final division.
    * Windows partition per group and the input is an
    * (item-cardinality)-sized weight table, never the corpus — feed it
    * the output of a count aggregate. Groups with a single item or
    * zero total mass yield G = 0 and NULL respectively. */
  def gini(df: DataFrame, groupCol: String, itemCol: String,
           weightCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_w"), col(itemCol))
    df.select(col(groupCol), col(itemCol), col(weightCol).cast("long").as("_w"))
      .filter(col("_w").isNotNull && col("_w") >= 0)
      .withColumn("_i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col("_w")).as("total"),
        sum(col("_w") * lit(2L) * col("_i")).as("_a"))
      .select(col(groupCol), col("n_items"), col("total"),
        when(col("total") > 0,
          (col("_a") - (col("n_items") + 1L) * col("total")).cast("double") /
            (col("n_items") * col("total")).cast("double"))
          .as("gini"))
  }

  /** Flesch reading-ease per document (Flesch 1948) — the classic
    * readability gate a curation pipeline runs next to Gopher quality
    * heuristics: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words). Higher = easier; English prose sits
    * ~30–70, boilerplate/code/gibberish falls far outside.
    *
    * Counting is deliberately regex-replayable rather than
    * dictionary-perfect (the standard large-corpus trade): sentences =
    * `[.!?]+` runs (min 1), syllables = `[aeiouy]+` vowel groups
    * clamped to ≥ 1 PER WORD — a vowel-less token ("123", "bcd")
    * contributes exactly 1, never borrowing from a multi-vowel
    * neighbor: total = vowel groups + (words − vowel-bearing words),
    * which equals Σ_tokens max(1, groups(token)) because a group
    * cannot span whitespace. Still one stateless codegen'd scan (two
    * regexp_counts, no higher-order functions) — counts are exact
    * integers, the score is one pinned double expression rounded at 6
    * decimals (`+ 0.0` folds −0.0). Empty documents keep a NULL
    * score. */
  def readability(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val low = lower(txt)
    // word count WITHOUT a higher-order function (a single HOF lambda
    // drops the whole projection out of whole-stage codegen): after
    // normalizeForFingerprint every token is non-empty, so the split
    // size IS the count — except the empty string, guarded explicitly
    val norm = graft.functions.TextFunctions.normalizeForFingerprint(txt)
    val w = when(length(norm) === 0, lit(0L))
      .otherwise(size(split(norm, " ")).cast("long"))
    val s = greatest(lit(1L), regexp_count(low, lit("[.!?]+")).cast("long"))
    // \S*[aeiouy]\S* matches exactly once per vowel-bearing token (the
    // greedy \S* runs to the token boundary), so w − count = vowel-less
    // tokens, each owed its clamped 1
    val syl = regexp_count(low, lit("[aeiouy]+")).cast("long") +
      (w - regexp_count(low, lit("\\S*[aeiouy]\\S*")).cast("long"))
    df.select(col(idCol), w.as("n_words"), s.as("n_sentences"), syl.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          round(lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double")),
            6) + 0.0))
  }

  /** Good–Turing vocabulary coverage per group — the "is more data
    * still buying new tokens" diagnostic a corpus-growth decision
    * needs: from the frequency-of-frequencies, the Good–Turing (1953)
    * estimate of the UNSEEN-type probability mass p₀ ≈ n₁/N (the next
    * token drawn is a never-seen type with the singleton fraction's
    * probability) and the bias-corrected Chao1 (1984/1987) richness
    * estimate V + n₁(n₁−1)/(2(n₂+1)) of the true vocabulary size. A
    * slice with high unseen mass is undersampled — more of it adds
    * vocabulary; one near zero has saturated.
    *
    * Exactness: N, V, n₁, n₂ are exact integer aggregates of the
    * (group, token) count table (partial-aggregated — the exchange
    * carries distinct types, never the token stream); the two
    * estimates are pinned double divisions over those integers
    * (`q_vocab_coverage` replays them 1:1). Empty groups never arise
    * (no tokens → no row); p₀ of an all-singleton slice is 1.
    *
    * Output: (groupCol, n_tokens, n_types, n_singletons, n_doubletons,
    * unseen_mass, chao1). */
  def vocabCoverage(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val counts = df.select(col(groupCol),
        explode(filter(split(graft.functions.TextFunctions.normalizeForFingerprint(
            coalesce(col(textCol), lit(""))), " "),
          t => length(t) > 0)).as("_w"))
      .groupBy(col(groupCol), col("_w")).agg(count(lit(1)).as("_c"))
    counts.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("_c") === 1L, 1L).otherwise(0L)).as("n_singletons"),
        sum(when(col("_c") === 2L, 1L).otherwise(0L)).as("n_doubletons"))
      .withColumn("unseen_mass",
        col("n_singletons").cast("double") / col("n_tokens").cast("double"))
      .withColumn("chao1",
        // n₁² as a DOUBLE product, not long (a 100 TB web corpus's
        // singleton count squared overflows int64); both engines round
        // the product identically, so replay parity holds
        col("n_types").cast("double") +
          col("n_singletons").cast("double") * (col("n_singletons") - 1).cast("double") /
            (lit(2.0) * (col("n_doubletons").cast("double") + 1.0)))
  }

  /** Top-p vocabulary mass coverage per slice — "how many distinct
    * tokens cover p% of this corpus slice": the head-heaviness readout
    * that sizes tokenizer vocabularies and spots template spam
    * ([[ngramDiversity]]'s dual: diversity says how flat the tail is,
    * this says how short the head is). Tokens rank by count descending
    * (ties by token ascending — deterministic), the cumulative mass
    * runs as ONE window over the NDV-bounded per-slice vocabulary, and
    * each requested percent p reads off the first rank whose
    * cum·100 ≥ p·total — an exact DECIMAL(38,0) integer comparison, so
    * the boundary replays in SQL (`q_vocab_mass`). Raw rows never
    * enter the window.
    *
    * Output: (groupCol, n_tokens, n_types, tokens_p<P>…) — one column
    * per requested percent. */
  def vocabMass(df: DataFrame, textCol: String, groupCol: String,
                percents: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100], got $percents")
    require(percents.distinct == percents, s"duplicate percents: $percents")
    val d38 = "decimal(38,0)"
    val counts = df.select(col(groupCol),
        explode(filter(split(graft.functions.TextFunctions.normalizeForFingerprint(
            coalesce(col(textCol), lit(""))), " "),
          t => length(t) > 0)).as("_w"))
      .groupBy(col(groupCol), col("_w")).agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_c").desc, col("_w").asc)
    val ranked = counts
      .withColumn("_rank", row_number().over(w).cast("long"))
      .withColumn("_cum", sum(col("_c")).over(
        w.rowsBetween(Long.MinValue, 0)).cast(d38))
      .withColumn("_total", sum(col("_c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))).cast(d38))
    val pCols = percents.map(p =>
      min(when(col("_cum") * 100 >= col("_total") * p, col("_rank")))
        .as(s"tokens_p$p"))
    ranked.groupBy(col(groupCol))
      .agg(max(col("_total")).cast("long").as("n_tokens"),
        (count(lit(1)).as("n_types") +: pCols): _*)
  }

  /** Tokenizer fertility per corpus slice — the standard multilingual
    * tokenizer audit (how many subwords a word fragments into, how many
    * characters a subword carries): languages with fertility far above
    * the corpus norm pay more context budget per word, the signal that
    * drives vocab-size and mix decisions (and the reason the funnel's
    * BPE accountant budgets in subwords, not words). One corpus pass of
    * the native profile counters ([[graft.functions.TextFunctions]]
    * tokenCount/subwordCount — codegen'd, no split arrays) partial-
    * aggregated to per-slice integer sums; fertility and
    * chars-per-subword are pinned double divisions of those exact longs
    * (`q_fertility` replays them verbatim). Slices with zero words
    * surface null ratios, never a division by zero.
    *
    * Output: (groupCol, n_docs, n_words, n_subwords, n_chars,
    * fertility, chars_per_subword). */
  def tokenizerFertility(df: DataFrame, textCol: String,
                         groupCol: String): DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFunctions.tokenCount(col(textCol))).as("n_words"),
        sum(graft.functions.TextFunctions.subwordCount(col(textCol))).as("n_subwords"),
        sum(coalesce(length(col(textCol)), lit(0)).cast("long")).as("n_chars"))
    agg.select(col(groupCol), col("n_docs"), col("n_words"),
      col("n_subwords"), col("n_chars"),
      when(col("n_words") > 0,
        col("n_subwords").cast("double") / col("n_words").cast("double"))
        .as("fertility"),
      when(col("n_subwords") > 0,
        col("n_chars").cast("double") / col("n_subwords").cast("double"))
        .as("chars_per_subword"))
  }

  def ngramDiversity(df: DataFrame, textCol: String, groupCol: String,
                     maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val toks = df.select(col(groupCol),
      filter(split(graft.functions.TextFunctions.normalizeForFingerprint(
          coalesce(col(textCol), lit(""))), " "),
        t => length(t) > 0).as("_w"))
    val grams = toks
      .select(col(groupCol), col("_w"), explode(typedLit((1 to maxN).toList)).as("n"))
      .select(col(groupCol), col("n"), col("_w"),
        explode(when(size(col("_w")) >= col("n"),
            sequence(lit(1), size(col("_w")) - col("n") + 1))
          .otherwise(array().cast("array<int>"))).as("_i"))
      .select(col(groupCol), col("n"),
        concat_ws(" ", slice(col("_w"), col("_i"), col("n"))).as("_gram"))
    grams.groupBy(col(groupCol), col("n"), col("_gram"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(groupCol), col("n"))
      .agg(sum(col("_c")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .withColumn("distinct_ratio",
        col("distinct_ngrams").cast("double") / col("total_ngrams").cast("double"))
  }

  /** The published Gopher QUALITY rules (Rae et al. 2021, table A1) as
    * per-document flags — the structural half of the filter pair whose
    * repetition half is
    * [[graft.functions.TextFunctions.gopherRepetitionKeep]]: word-count
    * bounds, mean word length 3–10, symbol-to-word ratio (# and … )
    * ≤ 0.1, ≤ 90 % of lines bullet-started, ≤ 30 % ellipsis-ended,
    * ≥ 80 % of words containing a letter, and ≥ 2 hits from the
    * required-stopword octet. Each rule is its own column (the audit a
    * filter review asks for — which rule kills what), `keep` is their
    * conjunction.
    *
    * Exactness: every ratio is integer arithmetic against integer
    * counts (cross-multiplied comparisons, no division at all), and
    * every count comes from regex/split constructs expressible
    * identically in Java regex and RE2 — so the full flag table
    * replays externally. One projection pass, all codegen'd — scan
    * speed at 100 TB.
    *
    * Output: (idCol, n_words, n_lines, mean_word_len_fp [hundredths],
    * f_word_count, f_word_len, f_symbol, f_bullet, f_ellipsis,
    * f_alpha, f_stopwords, keep). */
  def gopherQualityFlags(df: DataFrame, idCol: String, textCol: String,
                         minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    require(minWords >= 1 && maxWords > minWords,
      s"need 1 <= minWords < maxWords, got [$minWords, $maxWords]")
    val t = coalesce(col(textCol), lit(""))
    val wordsArr = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val linesArr = split(t, "\n")
    val requiredStopwords = // the Gopher octet
      Seq("the", "be", "to", "of", "and", "that", "have", "with")
    df.select(col(idCol), t.as("_t"), wordsArr.as("_w"), linesArr.as("_l"))
      .select(col(idCol),
        size(col("_w")).cast("long").as("n_words"),
        size(col("_l")).cast("long").as("n_lines"),
        length(regexp_replace(col("_t"), "\\s+", "")).cast("long").as("_nonws"),
        // symbols: '#' plus non-overlapping '...' runs plus '…'
        (regexp_count(col("_t"), lit("#")) + regexp_count(col("_t"), lit("\\.\\.\\.")) +
          regexp_count(col("_t"), lit("…"))).cast("long").as("_symbols"),
        size(filter(col("_l"), l => l.rlike("^\\s*[-*•‣▪]"))).cast("long").as("_bullet"),
        size(filter(col("_l"), l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long").as("_ellipsis"),
        size(filter(col("_w"), w => w.rlike("[A-Za-z]"))).cast("long").as("_alphaWords"),
        requiredStopwords.map(sw =>
          when(lower(col("_t")).rlike(s"(^|[^a-z])$sw([^a-z]|$$)"), 1L).otherwise(0L))
          .reduce(_ + _).as("_stopHits"))
      .select(col(idCol), col("n_words"), col("n_lines"),
        when(col("n_words") > 0L, expr("_nonws * 100L DIV n_words"))
          .otherwise(lit(0L)).as("mean_word_len_fp"),
        (col("n_words") >= minWords && col("n_words") <= maxWords).as("f_word_count"),
        // 3 ≤ mean ≤ 10, cross-multiplied: 3·n ≤ nonws ≤ 10·n
        (col("n_words") > 0L && col("_nonws") >= col("n_words") * 3L &&
          col("_nonws") <= col("n_words") * 10L).as("f_word_len"),
        // symbols/words ≤ 0.1  ⇔  10·symbols ≤ words
        (col("n_words") > 0L && col("_symbols") * 10L <= col("n_words")).as("f_symbol"),
        // bullet lines ≤ 90 %  ⇔  10·bullet ≤ 9·lines
        (col("_bullet") * 10L <= col("n_lines") * 9L).as("f_bullet"),
        // ellipsis lines ≤ 30 %  ⇔  10·ellipsis ≤ 3·lines
        (col("_ellipsis") * 10L <= col("n_lines") * 3L).as("f_ellipsis"),
        // alpha words ≥ 80 %  ⇔  5·alpha ≥ 4·words
        (col("n_words") > 0L && col("_alphaWords") * 5L >= col("n_words") * 4L).as("f_alpha"),
        (col("_stopHits") >= 2L).as("f_stopwords"))
      .withColumn("keep",
        col("f_word_count") && col("f_word_len") && col("f_symbol") &&
          col("f_bullet") && col("f_ellipsis") && col("f_alpha") && col("f_stopwords"))
  }

  /** Character-distribution Shannon entropy per document — the cheap
    * "is this prose or junk" signal the Gopher-style structural rules
    * miss: keyboard mash, repeated-character padding, and binary
    * spills score far below natural text (~4.1 nats for English prose)
    * while still passing word-count/length gates. Measured over the
    * first `cap` characters (the distribution stabilizes within a few
    * hundred chars; an uncapped pass would explode 100 TB docs into
    * corpus×length char rows for no extra signal).
    *
    * Exactness (VERDICT r16 #5): per-character terms are
    * `(c · (LN(n) − LN(c))) DIV n` over a DRIVER-LITERAL
    * `LN(k) = ⌊ln(k)·10¹²⌋` table for k ≤ cap — the whole executor-side
    * expression is PURE INTEGER arithmetic (no libm call anywhere in
    * the plan, so no JVM/libm half-way case can ever flip a hash), then
    * an ORDER-FREE integer sum (the psiDrift convention). The replaying
    * engine carries the identical literal table, so `entropy_fp`
    * matches bit-for-bit by construction. Counts are exact and ≤ cap,
    * so the table is cap-bounded and broadcasts. Overflow-safe:
    * `c·(LN(n)−LN(c))` maximizes at c = n/e ⇒ ≤ (cap/e)·10¹² ≤ 3.9·10¹⁷
    * even at the 2²⁰ cap ceiling. Empty/whitespace-free-empty docs
    * yield no row (no distribution to measure — the
    * [[graft.operators.Dedup.contentDefinedChunks]] convention).
    *
    * Output: (idCol, n_chars_used, distinct_chars, entropy_fp). */
  def charEntropy(df: DataFrame, textCol: String, idCol: String,
                  cap: Int = 512): DataFrame = {
    require(cap >= 1 && cap <= (1 << 20), s"cap must be in [1, 2^20], got $cap")
    val spark = df.sparkSession
    import spark.implicits._
    val lnTab = (1 to cap).map(k =>
      (k.toLong, math.floor(math.log(k.toDouble) * 1e12).toLong)).toDF("_k", "_lf")
    val chars = df.select(col(idCol),
        explode(split(substring(col(textCol), 1, cap), "")).as("_ch"))
      .filter(length(col("_ch")) > 0)
    val counts = chars.groupBy(col(idCol), col("_ch"))
      .agg(count(lit(1)).as("_c"))
    val tot = counts.groupBy(col(idCol))
      .agg(sum(col("_c")).as("_n"), count(lit(1)).as("_dc"))
    counts.join(tot, Seq(idCol))
      .join(broadcast(lnTab.select(col("_k").as("_c"), col("_lf").as("_lfc"))),
        Seq("_c"))
      .join(broadcast(lnTab.select(col("_k").as("_n"), col("_lf").as("_lfn"))),
        Seq("_n"))
      .withColumn("_t", expr("(_c * (_lfn - _lfc)) DIV _n"))
      .groupBy(col(idCol))
      .agg(max(col("_n")).as("n_chars_used"),
        max(col("_dc")).as("distinct_chars"),
        sum(col("_t")).as("entropy_fp"))
  }
}
