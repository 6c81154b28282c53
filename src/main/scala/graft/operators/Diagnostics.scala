package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Operational diagnostics for data at shuffle scale — the audits run
  * BEFORE committing a 100 TB job shape, with no reference analog (the
  * reference delegates joins and grouping to MySQL, SURVEY.md §2.9;
  * key-distribution problems are distributed-shuffle problems by
  * nature).
  *
  * Everything here emits integers / fixed-point longs so the result is
  * bit-stable across engines (the DuckDB oracle replays each metric
  * with the same truncating integer arithmetic).
  */
object Diagnostics {

  /** Join/partition-key skew profile: per-key row counts, the global
    * distribution metrics a shuffle planner needs (total rows, distinct
    * keys, max per-key count), and the top-`topN` heaviest keys with
    * their corpus share.
    *
    * Why: a shuffled join or aggregation degenerates when one reducer
    * receives `max_cnt` rows while the average task gets
    * `total/n_keys`; `skew_x10000` = `max·n_keys·10⁴ ÷ total` is that
    * ratio in fixed-point (10000 = perfectly uniform). Feed the result
    * into [[Skew.saltedJoin]] bucket sizing or an AQE decision.
    *
    * Scale shape: one partial-aggregated `groupBy(keys).count` pass —
    * map-side combine collapses hot keys before the only exchange —
    * then the tiny counts frame is checkpointed and read twice: one
    * single-row global aggregate, and a `TakeOrdered` top-N (each task
    * surfaces N candidates; no global sort). The rank window runs over
    * the N surviving rows only.
    *
    * Fixed-point: `share_fp` = `cnt·10⁸ ÷ total` (truncating long
    * division). Overflow bounds: `cnt·10⁸` holds to ~9·10¹⁰ rows per
    * key; `max·n_keys` to products ~9·10¹⁸ — both far past any real
    * shuffle input; documented rather than guarded so the expression
    * stays a two-op codegen'd long multiply/divide.
    *
    * Output: (rank, keyCols…, cnt, share_fp, total_rows, n_keys,
    * max_cnt, skew_x10000), `topN` rows ordered by rank. */
  def keySkewProfile(df: DataFrame, keyCols: Seq[String], topN: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "keySkewProfile needs at least one key column")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // global pass + top-N pass read this, not the input scan
    val g = counts.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("_total"),
      count(lit(1)).as("_nkeys"),
      coalesce(max(col("cnt")), lit(0L)).as("_max")).head()
    val (total, nKeys, maxC) = (g.getLong(0), g.getLong(1), g.getLong(2))
    require(total > 0, "keySkewProfile: empty input")
    val ord = col("cnt").desc +: keyCols.map(col(_).asc)
    val ordered = counts
      .orderBy(ord: _*)
      .limit(topN) // plans as TakeOrderedAndProject: no global sort
    val w = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
    ordered
      .withColumn("rank", row_number().over(w)) // N rows only: bounded
      // `div`, not `/`: Spark's `/` on longs is a DOUBLE divide; DIV is
      // the truncating long division the oracle replays with `//`
      .withColumn("share_fp", expr(s"cnt * 100000000L DIV ${total}L"))
      .withColumn("total_rows", lit(total))
      .withColumn("n_keys", lit(nKeys))
      .withColumn("max_cnt", lit(maxC))
      .withColumn("skew_x10000", lit(maxC * nKeys * 10000L / total))
      .select((col("rank") +: keyCols.map(col)) ++ Seq(col("cnt"), col("share_fp"),
        col("total_rows"), col("n_keys"), col("max_cnt"), col("skew_x10000")): _*)
  }

  /** k-anonymity audit over quasi-identifier columns: the size of every
    * QI equivalence class, flagged when fewer than `k` records share
    * the combination — the re-identification risk check run before a
    * dataset release (Sweeney 2002; `group_n = 1` is a unique,
    * directly re-identifiable record).
    *
    * NULL is a QI value like any other (a missing ZIP code still
    * narrows a record), so grouping treats NULLs as equal — Spark's
    * groupBy and SQL GROUP BY already agree on that.
    *
    * Scale shape: one partial-aggregated groupBy — identical cost to
    * the count it wraps; the flag is a codegen'd comparison. Callers
    * wanting only the risky classes filter `at_risk` and the predicate
    * reaches the aggregate's output, not the scan.
    *
    * Output: (qiCols…, group_n, at_risk), one row per equivalence
    * class. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", (col("group_n") < lit(k.toLong)).cast("int"))
  }

  /** Pre-join cardinality audit: BEFORE running a join at corpus scale,
    * exactly how many rows it would produce and where the fan-out
    * concentrates — the pre-flight that catches the accidental
    * many-to-many (a "unique" key that isn't) which would otherwise
    * materialize 10¹³ rows three hours into the job.
    *
    * est_rows = Σ_k cntL(k)·cntR(k) is EXACT for an inner equi-join
    * (not an estimate — the name keeps the planner-statistics idiom).
    * Products and their sum widen to DECIMAL(38,0): the whole point is
    * detecting joins whose output overflows a long.
    *
    * Scale shape: one partial-aggregated count per side (tiny vs the
    * join it previews — no payload columns move), a count-table join on
    * the key, one global aggregate row. NULL keys are counted in the
    * per-side totals but never match — exactly like the join itself.
    *
    * Output (one row): (left_rows, right_rows, left_keys, right_keys,
    * matched_keys, left_only_keys, right_only_keys, est_rows,
    * max_key_product). */
  def joinSizeAudit(left: DataFrame, leftKeys: Seq[String],
                    right: DataFrame, rightKeys: Seq[String]): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      s"key lists must be non-empty and same length, got $leftKeys vs $rightKeys")
    val ks = leftKeys.indices.map(i => s"_k$i")
    val lc = left
      .select(leftKeys.zip(ks).map { case (c, k) => col(c).as(k) }: _*)
      .groupBy(ks.map(col): _*).agg(count(lit(1)).as("_ln"))
    val rc = right
      .select(rightKeys.zip(ks).map { case (c, k) => col(c).as(k) }: _*)
      .groupBy(ks.map(col): _*).agg(count(lit(1)).as("_rn"))
    val lt = left.agg(count(lit(1)).as("left_rows"))
    val rt = right.agg(count(lit(1)).as("right_rows"))
    val f = lc.join(rc, ks, "full_outer")
      .withColumn("_matchable",
        ks.map(k => col(k).isNotNull).reduce(_ && _) &&
          col("_ln").isNotNull && col("_rn").isNotNull)
      .withColumn("_prod", expr(
        "CASE WHEN _matchable THEN CAST(_ln AS DECIMAL(38,0)) * _rn ELSE CAST(0 AS DECIMAL(38,0)) END"))
    f.agg(
        sum((col("_ln").isNotNull).cast("long")).as("left_keys"),
        sum((col("_rn").isNotNull).cast("long")).as("right_keys"),
        sum(col("_matchable").cast("long")).as("matched_keys"),
        sum((col("_ln").isNotNull && !col("_matchable")).cast("long")).as("left_only_keys"),
        sum((col("_rn").isNotNull && !col("_matchable")).cast("long")).as("right_only_keys"),
        coalesce(sum(col("_prod")), lit(0)).cast(
          org.apache.spark.sql.types.DecimalType(38, 0)).as("est_rows"),
        coalesce(max(col("_prod")), lit(0)).cast(
          org.apache.spark.sql.types.DecimalType(38, 0)).as("max_key_product"))
      .crossJoin(lt).crossJoin(rt)
      .select(col("left_rows"), col("right_rows"), col("left_keys"),
        col("right_keys"), col("matched_keys"), col("left_only_keys"),
        col("right_only_keys"), col("est_rows"), col("max_key_product"))
  }

  /** Differentially-private count release: per-group counts with seeded
    * Laplace noise (scale 1/ε — counts have sensitivity 1), rounded to
    * integers and clamped at 0 — the ε-DP histogram every public data
    * card needs when exact per-slice counts would leak membership.
    *
    * The draw is SEEDED AND REPLAYABLE, not cryptographic: u derives
    * from the group key's codepoint polynomial hash
    * ([[graft.functions.PolyBucket]], the engine's oracle-replayable
    * string hash) through the standard LCG recurrence, then the inverse
    * Laplace CDF — `±(1/ε)·ln(2u or 2(1−u))` — the same empirical
    * IEEE-ln parity contract the DSIR Gumbel draw relies on. That makes
    * releases REPRODUCIBLE (and auditable against the oracle) at the
    * cost of a publicly-derivable noise stream: treat `seed` as part of
    * the secret in a real release, exactly like [[graft.operators.Dsir]]
    * documents for its draws.
    *
    * Scale shape: one partial-aggregated groupBy; the noise is a
    * codegen'd per-ROW (per-group-row) expression over the tiny count
    * table. Output: (groupCol, noisy_n, epsilon); true counts are NOT
    * in the output (that's the point). */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
                    seed: Long): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    require(seed >= 0L, s"seed must be non-negative (oracle % parity), got $seed")
    import org.apache.spark.sql.graftshim.ColumnBridge
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val h = coalesce(ColumnBridge.column(graft.functions.PolyBucket(
      ColumnBridge.expression(col(groupCol).cast("string")), 16777216)), lit(0L))
    // seed mixes BEFORE the multiply: a +1 seed step must swing u, not
    // nudge it by 2^-31 (which the rounding would erase)
    val r = pmod((h + lit(seed)) * lit(1103515245L) + lit(12345L), lit(2147483648L))
    val u = (r.cast("double") + lit(0.5)) / lit(2147483648.0) // in (0, 1)
    val b = lit(1.0 / epsilon)
    val lap = when(u < 0.5, b * log(lit(2.0) * u))
      .otherwise(-b * log(lit(2.0) * (lit(1.0) - u)))
    counts
      .withColumn("noisy_n",
        greatest(col("_n") + floor(lap + lit(0.5)).cast("long"), lit(0L)))
      .select(col(groupCol), col("noisy_n"), lit(epsilon).as("epsilon"))
  }
}
