package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-oriented joins Spark has no built-in operator for: as-of join
  * (attach the most recent right row at-or-before each left row's time)
  * and point-in-interval range join. Both are expressed as shuffle-once
  * declarative plans — never a cartesian/broadcast-nested-loop — so they
  * survive a 100× scale-up:
  *
  *  - as-of = union the two sides, ONE hash shuffle on the key, one
  *    window sort, carry the right payload forward (`last(_, ignoreNulls)`),
  *    keep left rows. This is the standard distributed as-of shape
  *    (point lookups per left row would be O(n) lookups; a time-range
  *    theta join would be a nested loop).
  *  - range join = bucketize time: a point belongs to exactly one
  *    fixed-width bucket; an interval is exploded to every bucket it
  *    overlaps. The join becomes an equi-join on bucket id (hash shuffle
  *    or broadcast — AQE's choice), then the exact containment predicate
  *    filters within bucket-pairs. Explosion factor is bounded by
  *    interval_length / bucketWidth, the knob the caller tunes.
  */
object TemporalJoin {

  /** As-of join: every `left` row gains `right`'s payload columns from
    * the latest right row with `right(rightTs) <= left(leftTs)` matching
    * on `keys` (left-outer: unmatched left rows keep the payload null).
    *
    * Contract: `right` must be unique on (keys, rightTs) — pre-aggregate
    * otherwise (ties would make the carried payload order-dependent).
    * Column names must not collide: rename the right side's time/payload
    * columns before the call if the left side shares them.
    *
    * Scale: one Exchange on `keys` + one in-partition sort, regardless of
    * how many right rows precede each left row. Hot keys are window skew —
    * the same profile as any sessionization over the table.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    val collisions = leftOnly.toSet.intersect(payload.toSet)
    require(collisions.isEmpty,
      s"column collision between sides: ${collisions.mkString(", ")} — rename before asof")
    val rSchema = right.schema
    val lSchema = left.schema
    // Tag and union: right rows sort BEFORE left rows at an equal
    // timestamp, making the match inclusive (rightTs == leftTs matches).
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("_t"), lit(1).as("_side")) ++
        leftOnly.map(col) ++
        payload.map(c => lit(null).cast(rSchema(c).dataType).as(c)): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("_t"), lit(0).as("_side")) ++
        leftOnly.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(
        keys.map(col) ++ Seq(col("_t"), col("_side")) ++ leftOnly.map(col) ++
          payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    carried.filter(col("_side") === 1)
      .select(left.columns.map(col).toSeq ++ payload.map(col): _*)
  }

  /** Point-in-interval join: `points` rows paired with every `intervals`
    * row whose `[startCol, endCol)` contains `pointCol` (inner join;
    * overlapping intervals yield one output row per covering interval).
    * Timestamp columns throughout; `bucketSeconds` should be on the
    * order of the typical interval length — explosion factor is
    * ceil(interval / bucket) + 1.
    *
    * No dedup pass is needed: a point has exactly ONE bucket, so a
    * (point, interval) pair can only meet in that bucket. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, pointCol: String,
                      startCol: String, endCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val b = lit(bucketSeconds)
    val p = points.withColumn("_pb", floor(unix_timestamp(col(pointCol)) / b))
    // end is exclusive, but floor(end/b) is kept as the last candidate
    // bucket (an interval ending mid-bucket still covers its start) —
    // the containment filter removes the overshoot.
    val iv = intervals.withColumn("_pb",
      explode(sequence(floor(unix_timestamp(col(startCol)) / b),
        floor(unix_timestamp(col(endCol)) / b))))
    p.join(iv, Seq("_pb"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_pb")
  }

  /** Interval×interval overlap join: every (left, right) pair sharing a
    * key whose half-open windows intersect (`lStart < rEnd && rStart <
    * lEnd`) — shift overlap detection, concurrent-session pairing,
    * conflicting-booking audits. Never a nested-loop/cartesian plan:
    * both sides explode their bucket range and meet in an equi-join on
    * (key…, bucket).
    *
    * De-duplication is join-free and exact: a qualifying pair occupies
    * every bucket from max(start buckets) onward on BOTH sides (the
    * later-starting interval starts there; the earlier one reaches it
    * because overlap means its end passes the later start), so the pair
    * is counted ONLY in `bucket == max(floor(lStart/b), floor(rStart/b))`
    * — no distinct over the blown-up pair stream, which at corpus scale
    * would be a second full shuffle of the largest intermediate.
    *
    * An interval spanning more than `maxBucketsPerInterval` buckets
    * fails LOUDLY in-plan (the [[graft.operators.TimeSeries.gapFill]]
    * contract): a mis-sized `bucketSeconds` otherwise silently explodes
    * the intermediate by orders of magnitude. Non-key payload columns
    * must be disjoint between the two sides (rename before joining). */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      lStart: String, lEnd: String, rStart: String, rEnd: String,
                      bucketSeconds: Long,
                      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(keys.nonEmpty, "keys must be non-empty")
    val b = lit(bucketSeconds)
    def buckets(df: DataFrame, s: String, e: String): DataFrame = {
      val sb = floor(unix_timestamp(col(s)) / b)
      val eb = floor(unix_timestamp(col(e)) / b)
      val guarded = when(eb - sb > maxBucketsPerInterval, raise_error(concat(
          lit(s"intervalOverlap: interval spans more than $maxBucketsPerInterval " +
            s"buckets of ${bucketSeconds}s ("), (eb - sb).cast("string"),
          lit(") — widen bucketSeconds")))).otherwise(eb)
      df.withColumn("_b", explode(sequence(sb, guarded)))
    }
    buckets(left, lStart, lEnd).join(buckets(right, rStart, rEnd), keys :+ "_b")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("_b") === greatest(floor(unix_timestamp(col(lStart)) / b),
          floor(unix_timestamp(col(rStart)) / b)))
      .drop("_b")
  }
}
