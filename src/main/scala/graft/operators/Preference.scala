package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Preference-data operators — the aggregation step between raw human /
  * AI pairwise judgments and a reward-model or DPO training set.
  */
object Preference {

  /** Bradley–Terry strength estimation from pairwise comparisons
    * (the standard aggregate behind preference leaderboards and reward-
    * data quality checks): given one row per (winner, loser) judgment,
    * estimate item strengths p_i with the minorization–maximization
    * update  p_i ← W_i / Σ_j n_ij/(p_i+p_j),  renormalized each round.
    *
    * Scale shape: the corpus-sized work is ONE partial-aggregated
    * groupBy(winner, loser) count; the MM solve runs on the driver over
    * the ITEM-cardinality result (items ≤ `maxItems`, asserted — think
    * "models on a leaderboard", not "documents"), exactly the bounded-
    * metadata-collect pattern of the union-find finish. A billion
    * judgments stream through one aggregate; the driver sees at most
    * maxItems² counts.
    *
    * Determinism: the solve is pure integer arithmetic in fixed point
    * (scale 10¹²) — init s_i = S/m; each round D_i = Σ⌊n_ij·S/(s_i+s_j)⌋
    * (order-independent integer adds over canonically sorted items),
    * raw_i = ⌊W_i·S²/D_i⌋ (BigInt — S² exceeds a long), then renormalize
    * s_i = ⌊raw_i·S/Σraw⌋. An external engine replays every round with
    * exact integer ops (HUGEINT), no float summation order anywhere.
    * An item with zero wins converges to strength 0; an item with no
    * comparisons at all keeps its current strength through the round.
    *
    * Output: (item, wins, comparisons, strength_fp, rank) — rank
    * 1-based by (strength_fp DESC, item ASC). */
  def bradleyTerry(pairs: DataFrame, winnerCol: String, loserCol: String,
                   iterations: Int = 3, maxItems: Int = 1000): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1, 20], got $iterations")
    val spark = pairs.sparkSession
    val cnt = pairs
      .select(col(winnerCol).cast("string").as("_w"), col(loserCol).cast("string").as("_l"))
      .groupBy(col("_w"), col("_l")).agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(cnt.nonEmpty, "bradleyTerry: no comparisons")
    val items = cnt.flatMap(c => Seq(c._1, c._2)).distinct.sorted.toIndexedSeq
    require(items.size <= maxItems,
      s"bradleyTerry: ${items.size} items exceeds maxItems=$maxItems — this is " +
        "an item-leaderboard solve, not a per-document operator")
    val idx = items.zipWithIndex.toMap
    val m = items.size
    val wins = Array.fill(m)(0L)
    val n = Array.fill(m, m)(0L)
    cnt.foreach { case (w, l, c) =>
      val (i, j) = (idx(w), idx(l))
      wins(i) += c; n(i)(j) += c; n(j)(i) += c
    }
    val S = BigInt(1000000000000L)
    var s = Array.fill(m)(S / m)
    (1 to iterations).foreach { _ =>
      val raw = Array.tabulate(m) { i =>
        var d = BigInt(0)
        var j = 0
        while (j < m) {
          if (j != i && n(i)(j) > 0) d += BigInt(n(i)(j)) * S / (s(i) + s(j))
          j += 1
        }
        if (d > 0) BigInt(wins(i)) * S * S / d else s(i)
      }
      val tot = raw.sum
      require(tot > 0, "bradleyTerry: degenerate comparison graph (total strength 0)")
      s = raw.map(_ * S / tot)
    }
    val ranked = items.indices
      .sortBy(i => (-s(i).toLong, items(i)))
      .zipWithIndex.map { case (i, r) => (i, r + 1) }.toMap
    val rows = items.indices.map { i =>
      Row(items(i), wins(i), n(i).sum, s(i).toLong, ranked(i))
    }
    val schema = StructType(Seq(
      StructField("item", StringType), StructField("wins", LongType),
      StructField("comparisons", LongType), StructField("strength_fp", LongType),
      StructField("rank", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Chosen/rejected pair construction (the DPO / reward-model data
    * step): per prompt group, emit the best-scored and worst-scored
    * responses as a training pair, gated on a minimum score margin so
    * near-tie groups produce no (noisy) pair. ONE partial-aggregated
    * pass — max/min of a (score, id) struct, never a per-group sort.
    *
    * Tie pinning: chosen = LOWEST id among max-score rows (max of
    * (score, −id)), rejected = LOWEST id among min-score rows (min of
    * (score, id)) — deterministic on any engine. A group whose rows all
    * tie (chosen id = rejected id) is dropped even at margin 0; ids
    * must be non-negative (the −id trick needs the negation exact).
    *
    * Output: (groupCol, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin, n), margin = chosen − rejected ≥
    * `minMargin`. */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
                      scoreCol: String, minMargin: Double = 0.0): DataFrame = {
    val agg = df.select(col(groupCol), col(idCol).cast("long").as("_id"),
        col(scoreCol).cast("double").as("_s"))
      .filter(col("_s").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(struct(col("_s").as("s"), (-col("_id")).as("ni"))).as("_ch"),
        min(struct(col("_s").as("s"), col("_id").as("i"))).as("_rj"))
    agg.select(col(groupCol),
        (-col("_ch.ni")).as("chosen_id"), col("_rj.i").as("rejected_id"),
        col("_ch.s").as("chosen_score"), col("_rj.s").as("rejected_score"),
        (col("_ch.s") - col("_rj.s")).as("margin"), col("n"))
      .filter(col("n") >= 2 && col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= lit(minMargin))
  }

  /** Offline policy evaluation by clipped importance sampling — IPS and
    * SNIPS (Horvitz–Thompson; Swaminathan & Joachims 2015): from logged
    * bandit feedback (action, logging propensity, reward) and a target
    * policy's propensity for the SAME logged action, estimate the value
    * the target policy WOULD have earned, without deploying it:
    *
    *   IPS   = (1/n) Σ  w_i · r_i,    w_i = min(π(a|x)/μ(a|x), clip)
    *   SNIPS = Σ w_i·r_i / Σ w_i      (self-normalized, lower variance)
    *
    * The RLHF-data use: grade a new response-sampling policy on logged
    * preference traffic before routing live traffic to it. Weight
    * clipping is the standard variance/bias trade — pass `clipFp` =
    * Long.MaxValue to disable.
    *
    * Exactness: propensities and rewards arrive as 10⁶-scaled
    * fixed-point longs; each weight is the integer
    * `min((targetFp · 10⁶) div propFp, clipFp)` and both sums are
    * DECIMAL(38,0) totals of long products (order-independent), so an
    * external engine replays them exactly (HUGEINT on the DuckDB side);
    * the two estimates are final pinned divisions of those sums. Rows
    * with propensity ≤ 0 or a null reward are rejected eagerly — a
    * zero logging propensity means the action could never have been
    * logged, so its presence is a data bug, not a weight of ∞.
    *
    * Output per group: (groupCol, n, sum_w_fp, sum_wr_fp, ips, snips)
    * with ips = sum_wr / (n·10⁶·10⁶) and snips = sum_wr / (sum_w·10⁶). */
  def ipsEstimate(df: DataFrame, groupCol: String, propFpCol: String,
                  targetFpCol: String, rewardFpCol: String,
                  clipFp: Long = 20000000L): DataFrame = {
    val scale = 1000000L
    val w = least(lit(clipFp),
      expr(s"CAST(($targetFpCol * ${scale}L) div $propFpCol AS BIGINT)"))
    val base = df.filter(col(propFpCol) > 0 && col(rewardFpCol).isNotNull &&
        col(targetFpCol) >= 0)
      .select(col(groupCol), w.as("_w"), col(rewardFpCol).cast("long").as("_r"))
    base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_w").cast(DecimalType(38, 0))).as("sum_w_fp"),
        // multiply in decimal so w·r can't wrap a long before widening
        sum(col("_w").cast(DecimalType(38, 0)) * col("_r")).as("sum_wr_fp"))
      .withColumn("ips", col("sum_wr_fp").cast("double") /
        (col("n").cast("double") * lit(scale.toDouble) * lit(scale.toDouble)))
      .withColumn("snips", col("sum_wr_fp").cast("double") /
        (col("sum_w_fp").cast("double") * lit(scale.toDouble)))
  }
}
