package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Customer/product analytics primitives — the feature-engineering ops
  * an analytics engine is asked for daily, built window-free so they
  * hold at 10⁹ entities.
  */
object Analytics {

  /** RFM feature engineering (recency / frequency / monetary): one
    * partial-aggregated pass rolls orders up per customer, quintile
    * boundaries come from the exact rank-selection percentile pass
    * ([[Profile.percentiles]] — swap `exact` off for the sketch at
    * scale), and each metric buckets 1–5 by a codegen'd comparison
    * chain against the four boundary literals — NO ntile, whose global
    * window is a single-task sort over every customer.
    *
    * Buckets are ascending in the raw metric: r_bucket 1 = most recent
    * (small recency_days), f_bucket/m_bucket 5 = most orders/revenue.
    * `segment` concatenates the three digits ("155" = recent whale).
    * Boundary semantics: bucket = 1 + #(boundaries < value), strict
    * comparison, so ties land in the lower bucket on every engine.
    *
    * Output: (custCol, recency_days, frequency, monetary, r_bucket,
    * f_bucket, m_bucket, segment). */
  def rfm(orders: DataFrame, custCol: String, dateCol: String, amountCol: String,
          asOfDate: String, exact: Boolean = false): DataFrame = {
    val base = orders.groupBy(col(custCol))
      .agg(
        datediff(lit(asOfDate).cast("date"), max(col(dateCol).cast("date")))
          .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        // DECIMAL partial sums: order-independent, one final double
        expr(s"CAST(SUM(CAST($amountCol AS DECIMAL(18,4))) AS DOUBLE)").as("monetary"))
      .localCheckpoint(true) // three boundary passes read this, not the orders scan
    def cuts(metric: String): Seq[Double] = {
      val r = Profile.percentiles(
        base.select(col(metric).cast("double").as("_m")).withColumn("_g", lit(1)),
        Seq("_g"), "_m", ps = Seq(0.2, 0.4, 0.6, 0.8), exact = exact).head()
      (2 to 5).map(r.getDouble)
    }
    def bucket(c: Column, cs: Seq[Double]): Column =
      cs.map(b => when(c > lit(b), 1).otherwise(0)).reduce(_ + _) + lit(1)
    val (rc, fc, mc) = (cuts("recency_days"), cuts("frequency"), cuts("monetary"))
    base
      .withColumn("r_bucket", bucket(col("recency_days").cast("double"), rc))
      .withColumn("f_bucket", bucket(col("frequency").cast("double"), fc))
      .withColumn("m_bucket", bucket(col("monetary"), mc))
      .withColumn("segment", concat(col("r_bucket").cast("string"),
        col("f_bucket").cast("string"), col("m_bucket").cast("string")))
  }

  /** Ordered funnel analysis: how many users completed step 1, then
    * step 2 STRICTLY AFTER their first step-1 event, then step 3 after
    * that, … — the product-analytics conversion funnel, as chained
    * co-partitioned joins instead of per-user event-log scans.
    *
    * Semantics: a user's step-i completion time is their EARLIEST
    * step-i event after their step-(i−1) completion time (earliest-
    * completion semantics — the standard unordered-funnel definition;
    * a user can complete step 2 via any qualifying event, not just the
    * first one after a specific step-1 occurrence).
    *
    * Scale shape: each stage filters the events ONCE by type (a scan-
    * pushed predicate), joins the (user, t) survivor table on the user
    * key — both sides hash-partition the same key — and re-aggregates
    * to one row per user. State per stage is one row per surviving
    * user; no per-user event array is ever gathered.
    *
    * Output: (step_idx 1-based, step, n_users), one row per step. */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps needs at least one step")
    require(steps.distinct == steps, s"steps must be distinct, got $steps")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    def level(i: Int, d: DataFrame): DataFrame =
      d.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_idx"), lit(steps(i)).as("step"), col("n_users"))
    var out = level(0, cur)
    for (i <- 1 until steps.length) {
      cur = events.filter(col(typeCol) === steps(i))
        .join(cur, Seq(userCol))
        .filter(col(tsCol) > col("_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      out = out.unionAll(level(i, cur))
    }
    out
  }
}
