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
}
