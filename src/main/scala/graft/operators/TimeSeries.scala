package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket an event stream onto a fixed
  * per-entity grid, emit the missing buckets, and forward-fill values
  * across the gaps — the resample/ffill step upstream of any
  * training-data featurization over event logs (a model reading "user
  * activity per hour" needs the silent hours as rows, not as absent
  * keys).
  *
  * Semantics: per entity, buckets run from its FIRST observed bucket to
  * its LAST (no entity is extrapolated beyond its own span); `n_events`
  * is 0 on gap rows; `value_sum` is the per-bucket aggregate (null on
  * gaps); `value_ff` carries the last non-null `value_sum` forward.
  * Buckets are epoch seconds (`unix_timestamp div step × step`) —
  * integer arithmetic any engine replays exactly; the pinned-UTC
  * session makes the epoch well-defined (naive timestamps read as UTC
  * wall time).
  *
  * Scale shape, stage by stage:
  *  - bucketize + aggregate: one partial-aggregated groupBy(entity,
  *    bucket) — the only pass over the raw events;
  *  - span: a second aggregate over the (much smaller) bucket table;
  *  - grid: `sequence(lo, hi, step)` exploded ROW-LOCALLY per entity —
  *    no cross join against a calendar table, no shuffle; a span that
  *    would explode past `maxBucketsPerEntity` fails loudly (one guard
  *    row per entity) instead of OOMing an executor;
  *  - fill: left join on (entity, bucket) — both sides hash-partition
  *    the same key — and a forward-fill window PER ENTITY, bounded by
  *    that entity's series length, never corpus-wide.
  */
object TimeSeries {

  /** Gap-fill + forward-fill `df` onto a `stepSeconds` grid.
    * Output: (`entityCol`, bucket, n_events, value_sum, value_ff).
    * Timestamps must be non-negative epochs (integer `div` bucketing). */
  def gapFill(df: DataFrame, entityCol: String, tsCol: String, valueCol: String,
              stepSeconds: Long, maxBucketsPerEntity: Long = 10000000L): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    require(maxBucketsPerEntity > 0, "maxBucketsPerEntity must be positive")
    val obs = df
      .select(col(entityCol),
        expr(s"(unix_timestamp($tsCol) div $stepSeconds) * $stepSeconds").as("bucket"),
        col(valueCol))
      .groupBy(col(entityCol), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        // DECIMAL partial sums are order-independent; the final cast is
        // the only double (the q_events_window parity pattern)
        expr(s"CAST(SUM(CAST($valueCol AS DECIMAL(18,4))) AS DOUBLE)").as("value_sum"))
    val span = obs.groupBy(col(entityCol))
      .agg(min(col("bucket")).as("_lo"), max(col("bucket")).as("_hi"))
      // loud guard, one row per entity: a runaway span (a decade at 1 s
      // step) must fail the job, not silently materialize 10^8 rows
      .withColumn("_n", (col("_hi") - col("_lo")) / lit(stepSeconds) + 1L)
      .withColumn("_ok", when(col("_n") <= maxBucketsPerEntity, lit(true))
        .otherwise(raise_error(concat(lit(s"gapFill: entity "), col(entityCol).cast("string"),
          lit(s" spans more than $maxBucketsPerEntity buckets")))))
      .filter(col("_ok"))
    val grid = span.select(col(entityCol),
      explode(sequence(col("_lo"), col("_hi"), lit(stepSeconds))).as("bucket"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(entityCol, "bucket"), "left")
      .select(col(entityCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("value_sum"),
        last(col("value_sum"), ignoreNulls = true).over(w).as("value_ff"))
  }

  /** Shared shape of the per-entity SEQUENTIAL folds below (EWMA,
    * CUSUM): one shuffle on the entity key, an in-partition sort by
    * (entity, order), and a single mapPartitions walk that resets its
    * state at entity boundaries — the [[Curation.packSequencesStrict]]
    * contract. Never a window over an unsharded stream, no driver
    * state; `orderCol` must be UNIQUE per entity (ties would make the
    * fold order — and therefore every downstream value — partitioning-
    * dependent), and `valueCol` must be non-null (a hole in a recursion
    * has no defined value — gap-fill first). */
  private def entityFold(df: DataFrame, entityCol: String, orderCol: String,
                         valueCol: String, outFields: Seq[org.apache.spark.sql.types.StructField])(
                         init: Double => Any, step: (Any, Double) => Any,
                         emit: Any => Seq[Any]): DataFrame = {
    val outSchema = org.apache.spark.sql.types.StructType(df.schema.fields ++ outFields)
    val eIdx = df.schema.fieldIndex(entityCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.repartition(col(entityCol))
      .sortWithinPartitions(col(entityCol), col(orderCol))
      .mapPartitions { it =>
        var curKey: Any = null
        var first = true
        var state: Any = null
        it.map { r =>
          val k = r.get(eIdx)
          val vRaw = r.get(vIdx)
          require(vRaw != null,
            s"null $valueCol in sequential fold (entity $k) — gap-fill or filter first")
          val x = vRaw.asInstanceOf[Number].doubleValue
          if (first || k != curKey) { curKey = k; first = false; state = init(x) }
          else state = step(state, x)
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ emit(state))
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Exponentially-weighted moving average per entity:
    * y₀ = x₀, yₜ = α·xₜ + (1−α)·yₜ₋₁ in `orderCol` order — the
    * smoothing baseline under anomaly scores, trend dashboards, and
    * rate limiters. The recursion is evaluated LITERALLY (never the
    * closed-form power sum, whose different rounding would diverge), so
    * any engine replaying the same left fold — e.g. DuckDB's
    * `list_reduce` over the ordered prefix — reproduces every double
    * bit-for-bit (`q_ewma`); `1−α` is computed once, as the oracle
    * writes `(1.0 − α)`. Output: input columns + `ewma`. */
  def ewma(df: DataFrame, entityCol: String, orderCol: String, valueCol: String,
           alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val oneMinus = 1.0 - alpha
    entityFold(df, entityCol, orderCol, valueCol,
      Seq(org.apache.spark.sql.types.StructField("ewma",
        org.apache.spark.sql.types.DoubleType, nullable = false)))(
      init = x => x,
      step = (acc, x) => alpha * x + oneMinus * acc.asInstanceOf[Double],
      emit = s => Seq(s))
  }

  /** Holt double-exponential smoothing (level + linear trend) per
    * entity: l₀ = x₀, b₀ = 0;
    * lₜ = α·xₜ + (1−α)·(lₜ₋₁ + bₜ₋₁),
    * bₜ = γ·(lₜ − lₜ₋₁) + (1−γ)·bₜ₋₁ — the trend-aware forecaster EWMA
    * can't be (EWMA lags a drifting series forever; Holt's trend term
    * tracks it). Like [[ewma]], the recursion is evaluated LITERALLY so
    * an engine replaying the same fold reproduces every double
    * bit-for-bit — DuckDB replays it as a recursive CTE with one row
    * per (entity, step), scalar doubles only (`q_holt`; its 1.0
    * list_reduce mis-evaluates chained multi-field struct folds, so the
    * two-state fold must NOT be a struct-lambda). For bit-parity choose
    * α/γ exactly representable as doubles (0.5, 0.25, …): then
    * `1−α`/`1−γ` are exact in both the JVM and the SQL literal.
    * Output: input columns + (`level`, `trend`, `forecast` = l + b,
    * the one-step-ahead prediction). */
  def holt(df: DataFrame, entityCol: String, orderCol: String, valueCol: String,
           alpha: Double, gamma: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0, 1], got $gamma")
    val omA = 1.0 - alpha
    val omG = 1.0 - gamma
    val d = org.apache.spark.sql.types.DoubleType
    entityFold(df, entityCol, orderCol, valueCol,
      Seq(org.apache.spark.sql.types.StructField("level", d, nullable = false),
          org.apache.spark.sql.types.StructField("trend", d, nullable = false),
          org.apache.spark.sql.types.StructField("forecast", d, nullable = false)))(
      init = x => (x, 0.0),
      step = (acc, x) => {
        val (l, b) = acc.asInstanceOf[(Double, Double)]
        val lNew = alpha * x + omA * (l + b)
        val bNew = gamma * (lNew - l) + omG * b
        (lNew, bNew)
      },
      emit = s => {
        val (l, b) = s.asInstanceOf[(Double, Double)]
        Seq(l, b, l + b)
      })
  }

  /** One-sided (upper) CUSUM change-point statistic per entity:
    * s₀ = max(0, c₀ − μ − k), sₜ = max(0, sₜ₋₁ + cₜ − μ − k), alarm
    * when sₜ > h — the classic drift detector over metric streams
    * (Page 1954). ENTIRELY fixed-point: values quantize to 1e-6 longs
    * (c = ⌊x·10⁶⌋) and μ/k/h quantize the same way once, so the fold is
    * integer arithmetic with NO accumulation-order or rounding hazard
    * at all — bit-exact on any engine, any partitioning (`q_cusum`).
    * Output: input columns + (`cusum_fp` long, `alarm` int). */
  def cusum(df: DataFrame, entityCol: String, orderCol: String, valueCol: String,
            target: Double, slack: Double, threshold: Double): DataFrame = {
    require(slack >= 0.0 && threshold > 0.0,
      s"slack must be >= 0 and threshold positive, got k=$slack h=$threshold")
    val muK = math.floor(target * 1e6).toLong + math.floor(slack * 1e6).toLong
    val hFp = math.floor(threshold * 1e6).toLong
    val folded = entityFold(df, entityCol, orderCol, valueCol,
      Seq(org.apache.spark.sql.types.StructField("cusum_fp",
        org.apache.spark.sql.types.LongType, nullable = false)))(
      init = x => math.max(0L, math.floor(x * 1e6).toLong - muK),
      step = (acc, x) =>
        math.max(0L, acc.asInstanceOf[Long] + math.floor(x * 1e6).toLong - muK),
      emit = s => Seq(s))
    folded.withColumn("alarm", (col("cusum_fp") > lit(hFp)).cast("int"))
  }

  /** Seasonal-baseline anomaly detection: compare each point against
    * the trailing mean of its OWN seasonal slot (same hour-of-week by
    * default) — the traffic-metrics detector CUSUM can't be (CUSUM
    * finds sustained drift; this finds "Tuesday 9am looks nothing like
    * the last k Tuesday 9ams" while ignoring ordinary weekly shape).
    * ENTIRELY fixed-point: values quantize to 1e-6 longs, the trailing
    * window is a LONG sum over the frame (a double avg would inherit
    * the engine's frame-summation order — DuckDB's segment tree sums
    * in tree order, not left-to-right), the baseline is an exact
    * integer div, and the gate is integer arithmetic
    * (|v − b| · 1000 > permille · |b|). The window is per
    * (entity, slot), ordered by (ts, tie) — sharded by the entity key.
    * Points with no history keep a null baseline and never flag.
    * Output: input keys + (slot, n_hist, baseline_fp, anomaly). */
  def seasonalBaseline(df: DataFrame, entityCol: String, tsCol: String,
                       tieCol: String, valueCol: String,
                       slotSeconds: Long = 3600L, periodSlots: Int = 168,
                       k: Int = 4, relPermille: Long = 500L): DataFrame = {
    require(slotSeconds > 0L && periodSlots >= 2, s"bad slot grid: $slotSeconds/$periodSlots")
    require(k >= 1, s"k must be >= 1, got $k")
    require(relPermille > 0L, s"relPermille must be positive, got $relPermille")
    val vFp = floor(col(valueCol) * lit(1e6)).cast("long")
    val frame = Window.partitionBy(col(entityCol), col("slot"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-k, -1)
    df.select(col(entityCol), col(tieCol), col(tsCol), col(valueCol))
      .withColumn("_sec", unix_timestamp(col(tsCol)))
      // integer div, not Column./ (double division)
      .withColumn("slot",
        expr(s"CAST(pmod(_sec div $slotSeconds, $periodSlots) AS INT)"))
      .withColumn("_vfp", vFp)
      .withColumn("_hsum", sum(col("_vfp")).over(frame))
      .withColumn("n_hist", count(lit(1)).over(frame))
      .withColumn("baseline_fp",
        when(col("n_hist") > 0L, expr("_hsum div n_hist")))
      .withColumn("anomaly",
        (col("n_hist") > 0L &&
          abs(col("_vfp") - col("baseline_fp")) * lit(1000L) >
            lit(relPermille) * abs(col("baseline_fp"))).cast("int"))
      .select(col(entityCol), col(tieCol), col(tsCol), col(valueCol),
        col("slot"), col("n_hist"), col("baseline_fp"), col("anomaly"))
      .withColumn("anomaly", coalesce(col("anomaly"), lit(0)))
  }

  /** OHLC downsampling: collapse an event stream to one candle per
    * (entity, fixed bucket) — open/high/low/close/count plus an EXACT
    * fixed-point value sum. ONE partial-aggregated groupBy is the whole
    * operator (min_by/max_by and min/max/count are all mergeable
    * aggregates — map-side partials collapse each task before the
    * single exchange; never a window). Buckets are integer epoch
    * arithmetic (`unix_seconds div width × width`); open/close order by
    * (ts, id) so exact-timestamp ties resolve deterministically; the
    * value sum quantizes to 1e-2 longs (order-independent — a double
    * sum would be partitioning-dependent). Output: (entity, bucket,
    * open, high, low, close, n_events, sum_cents). */
  def downsample(df: DataFrame, entityCol: String, tsCol: String, valueCol: String,
                 idCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0L, s"bucketSeconds must be positive, got $bucketSeconds")
    val sec = unix_timestamp(col(tsCol))
    val key = struct(col(tsCol), col(idCol))
    df.groupBy(col(entityCol),
        // sec − (sec mod width): pure integer ops, exact in any engine
        (sec - pmod(sec, lit(bucketSeconds))).as("bucket"))
      .agg(
        min_by(col(valueCol), key).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), key).as("close"),
        count(lit(1)).as("n_events"),
        sum(floor(col(valueCol) * lit(100.0)).cast("long")).as("sum_cents"))
  }

  /** Merge overlapping-or-touching [start, end] spans per entity —
    * gaps-and-islands: session spans from heartbeats, outage windows
    * from alerts, retention holds from audit intervals. The classic
    * two-window shape, both windows partitioned BY THE ENTITY (never an
    * unsharded stream): running max of `end` over preceding rows marks
    * island breaks (`start > prevMax`, so touching spans merge), a
    * running sum of breaks numbers the islands, and one groupBy
    * collapses each island to (start, end, n_merged). All comparisons
    * are on the raw column values — exact in any engine; ties on
    * (start, end) are value-deterministic (the break flag depends only
    * on values, not order within ties). Rows with `end < start` fail
    * loudly — a silently dropped invalid span hides a producer bug.
    *
    * Output: (entity, island, start, end, n_merged), one row per
    * merged span. */
  def coalesceIntervals(df: DataFrame, entityCol: String, startCol: String,
                        endCol: String): DataFrame = {
    val pre = Window.partitionBy(col(entityCol))
      .orderBy(col(startCol).asc, col(endCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col(entityCol))
      .orderBy(col(startCol).asc, col(endCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the assert lives INSIDE the break expression (a dead check column
    // would be pruned by the optimizer and never fire)
    val ok = assert_true(
      col(startCol).isNotNull && col(endCol).isNotNull && col(endCol) >= col(startCol),
      concat(lit("coalesceIntervals: null or inverted span for entity "),
        col(entityCol).cast("string")))
    df.withColumn("_prevMax", max(col(endCol)).over(pre))
      .withColumn("_break",
        when(col("_prevMax").isNull || col(startCol) > col("_prevMax"), 1L).otherwise(0L) +
          coalesce(ok.cast("long"), lit(0L)))
      .withColumn("island", sum(col("_break")).over(run))
      .groupBy(col(entityCol), col("island"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
  }

  /** Mann–Kendall trend test per entity — the NONPARAMETRIC "is this
    * series drifting" gate next to [[cusum]]'s changepoint detector:
    * S = Σ_{i<j} sign(x_j − x_i) over time-ordered observations, the
    * tie-corrected variance, and the continuity-corrected normal Z.
    * No distribution assumption, robust to outliers — the standard
    * monitoring primitive for "is daily volume / quality score /
    * latency trending".
    *
    * Scale contract: callers aggregate the raw stream to BOUNDED
    * buckets first (daily counts, hourly sums — the [[seasonalBaseline]]
    * shape), because the pair count is a per-entity self-join on
    * bucket order: buckets² per entity, never rows². Values arrive as
    * exact longs (counts or pre-quantized sums), so S and the variance
    * NUMERATOR n(n−1)(2n+5) − Σ t(t−1)(2t+5) are exact DECIMAL(38,0);
    * only Z = (S∓1)/√(num/18) is a pinned double sequence (S=0 → Z=0;
    * n<2 or zero variance → Z null).
    *
    * The bucket contract is ENFORCED, not assumed: duplicate
    * (entity, order) rows would be counted in n yet dropped from S by
    * the strict `_tb > _ta` pair join (understated S against an
    * unshrunk variance), so a duplicate bucket fails the job loudly
    * via the same in-expression assert_true idiom as
    * [[coalesceIntervals]] rather than returning a silently-biased Z.
    *
    * Output: (entity, n, s, var_num, z). */
  def mannKendall(df: DataFrame, entityCol: String, orderCol: String,
                  valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(col(entityCol), col(orderCol).as("_t"),
        col(valueCol).cast("long").as("_x"))
      .localCheckpoint(true) // pair join (both sides) + tie rollup read it
    val a = base.select(col(entityCol), col("_t").as("_ta"), col("_x").as("_xa"))
    val b = base.select(col(entityCol).as("_g2"), col("_t").as("_tb"),
      col("_x").as("_xb"))
    val s = a.join(b, a(entityCol) === col("_g2") && col("_tb") > col("_ta"))
      .groupBy(a(entityCol))
      .agg(sum(when(col("_xb") > col("_xa"), 1L)
        .when(col("_xb") < col("_xa"), -1L).otherwise(0L).cast(d38)).as("_s"))
    val ties = base.groupBy(col(entityCol), col("_x"))
      .agg(count(lit(1)).cast(d38).as("_tc"))
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("_ndistinct"),
        sum(col("_tc")).as("_n"),
        sum(col("_tc") * (col("_tc") - 1) * (col("_tc") * 2 + 5)).as("_tieTerm"))
    // bucket-contract guard: one row per (entity, order) or fail loudly
    // (assert_true lives inside the n output below so the optimizer
    // can't prune it; it is NULL when passing → coalesce adds 0)
    val dupGuard = base.groupBy(col(entityCol), col("_t"))
      .agg(count(lit(1)).as("_bn"))
      .groupBy(col(entityCol))
      .agg(max(col("_bn")).as("_maxDup"))
    val g = ties.join(dupGuard, Seq(entityCol))
      .withColumn("_dupOk", coalesce(
        assert_true(col("_maxDup") === 1L,
          concat(lit("mannKendall: duplicate (entity, order) bucket for entity "),
            col(entityCol).cast("string"),
            lit(" — aggregate to distinct buckets first"))).cast("long"),
        lit(0L)))
      .join(s, Seq(entityCol), "left")
      .withColumn("_sv", coalesce(col("_s"), lit(0).cast(d38)))
      .withColumn("_varNum",
        col("_n") * (col("_n") - 1) * (col("_n") * 2 + 5) - col("_tieTerm"))
    val sd = sqrt(col("_varNum").cast("double") / lit(18.0))
    val z = when(col("_sv") > 0, (col("_sv") - 1).cast("double") / sd)
      .when(col("_sv") < 0, (col("_sv") + 1).cast("double") / sd)
      .otherwise(lit(0.0))
    g.select(col(entityCol), (col("_n").cast("long") + col("_dupOk")).as("n"),
      col("_sv").cast("long").as("s"),
      col("_varNum").cast("long").as("var_num"),
      when(col("_n") >= 2 && col("_varNum") > 0, z).as("z"))
  }
}
