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
}
