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

  /** Cohort retention matrix: users grouped by the week of their FIRST
    * event; for every (cohort, week-offset) cell, how many of them were
    * active that many weeks later and the fixed-point retention share —
    * the standard product-analytics retention triangle, window-free.
    *
    * Weeks are `epoch_days DIV 7` (truncating integer division on days
    * since 1970-01-01) — engine-exact, no timezone arithmetic beyond
    * the date cast. Offset 0 is the cohort week itself, so
    * `cohort_size` = the offset-0 cell by construction and every
    * retention_fp = n_users·10⁸ ÷ cohort_size.
    *
    * Scale shape: distinct (user, week) activity → per-user min week
    * (both partial-aggregated) → a co-partitioned join on the user key
    * → the matrix aggregate. State is one row per (user, active week),
    * never an event gather; no window anywhere.
    *
    * Output: (cohort_week, week_offset, n_users, cohort_size,
    * retention_fp). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val week = expr(
      s"datediff(CAST($tsCol AS DATE), DATE '1970-01-01') DIV 7").cast("long")
    val acts = events.select(col(userCol), week.as("_wk")).distinct()
    val first = acts.groupBy(col(userCol)).agg(min(col("_wk")).as("cohort_week"))
    val mat = acts.join(first, Seq(userCol))
      .groupBy(col("cohort_week"), (col("_wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users")) // (user, week) is distinct: count = users
    val sizes = mat.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    mat.join(sizes, Seq("cohort_week"))
      .withColumn("retention_fp", expr("n_users * 100000000L DIV cohort_size"))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        col("cohort_size"), col("retention_fp"))
  }

  /** First-order event transition matrix: for every ordered pair of
    * consecutive event types within a user's stream, the transition
    * count and fixed-point probability P(to | from) — the Markov-chain
    * view of user behavior (next-step prediction, funnel leak hunting).
    *
    * Consecutive = by (`tsCol`, `idCol`) within the user — the id
    * tiebreak makes the sequence a TOTAL order, so the pair set is
    * deterministic under same-timestamp bursts. A user's last event has
    * no successor and emits nothing.
    *
    * Scale shape: one window partitioned BY USER (bounded by a user's
    * event count — never a global sort) feeding a partial-aggregated
    * pair count; `n_from` aggregates from the pair table (counts
    * transitions out of a type), not a second event scan.
    *
    * Output: (from_type, to_type, n, n_from, prob_fp = n·10⁸ ÷ n_from). */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(fromTotals, Seq("from_type"))
      .withColumn("prob_fp", expr("n * 100000000L DIV n_from"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        col("prob_fp"))
  }

  /** Market-basket co-occurrence mining: for every unordered item pair
    * sharing a transaction, the support / confidence / lift triple of
    * classic association analysis — fixed-point, so the ranking is
    * bit-stable across engines.
    *
    * Metrics (N = transaction count, n_x = transactions containing x,
    * pair_n = transactions containing both):
    *   support_fp   = pair_n·10⁸ ÷ N
    *   conf_ab_fp   = pair_n·10⁸ ÷ n_a   (P(b|a)), conf_ba_fp likewise
    *   lift_x10000  = pair_n·N·10⁴ ÷ (n_a·n_b)   (10000 = independent)
    * All divisions are truncating integer DIV over DECIMAL(38,0)
    * intermediates — `pair_n·N·10⁴` and `n_a·n_b` overflow a long at
    * ~10⁹-transaction corpora, the decimal widening keeps the math
    * exact and the oracle replays it with HUGEINT `//`.
    *
    * Scale shape: the pair explosion is the hazard — a transaction with
    * t items emits t(t−1)/2 pairs, so one 10⁶-item basket is 5·10¹¹
    * rows. `maxItemsPerTxn` caps every basket to its lowest-`cap` item
    * ids BEFORE pairing (the same deterministic blocking-cap contract
    * as the fuzzy join, mirrored in the oracle) via the mergeable
    * bottom-k aggregate — never a per-basket window. After the cap:
    * distinct (txn, item) → self-join on txn (co-partitioned, both
    * sides the same frame) → partial-aggregated pair counts; the item
    * frequency table joins in on the item key.
    *
    * Output: (item_a, item_b, pair_n, n_a, n_b, n_txn, support_fp,
    * conf_ab_fp, conf_ba_fp, lift_x10000), item_a < item_b, pairs with
    * `pair_n >= minPairs` only. */
  def cooccurrence(df: DataFrame, txnCol: String, itemCol: String,
                   minPairs: Long = 2L, maxItemsPerTxn: Int = 64): DataFrame = {
    require(minPairs >= 1L, s"minPairs must be >= 1, got $minPairs")
    require(maxItemsPerTxn >= 2, s"maxItemsPerTxn must be >= 2, got $maxItemsPerTxn")
    import org.apache.spark.sql.graftshim.ColumnBridge
    val item = col(itemCol).cast("long")
    // r20 (guide §2.4/§3): the pair table used to cost THREE exchanges —
    // a (txn, item) distinct, the per-txn cap groupBy, and a
    // co-partitioned SELF-JOIN generating the in-txn pairs. The capped
    // item array is SORTED DISTINCT by construction (bottom-k by
    // (item, item), dedup inside the heap buffer), so the pairs are a
    // row-local double explode of each txn's own array — (items[i],
    // items[j]) for i < j, item_a < item_b automatic — and ONE exchange
    // (the cap groupBy, partial-aggregated map-side) replaces all
    // three. Null semantics preserved exactly: null items never enter
    // the heap (as before via the distinct+agg), a txn whose items are
    // all null exploded to nothing (filter size >= 1), and a NULL txn
    // key produced no self-join pairs and no countDistinct contribution
    // but did feed the item counts.
    val capAgg = graft.functions.BottomKAgg(
      ColumnBridge.expression(item), ColumnBridge.expression(item), maxItemsPerTxn,
      distinct = true)
    val grouped = df.select(col(txnCol), item.as(itemCol))
      .groupBy(col(txnCol))
      .agg(ColumnBridge.column(capAgg.toAggregateExpression()).as("_items"))
      .filter(size(col("_items")) >= 1)
      .localCheckpoint(true) // 3 readers: txn count, item counts, the pairs
    val nTxn = grouped.filter(col(txnCol).isNotNull).count()
    require(nTxn > 0, "cooccurrence: empty input")
    val ic = grouped.select(explode(col("_items")).as(itemCol))
      .groupBy(col(itemCol)).agg(count(lit(1)).as("_n"))
    val pairs = grouped
      .filter(col(txnCol).isNotNull)
      .select(col("_items"), posexplode(col("_items")).as(Seq("_i", "item_a")))
      .select(col("item_a"),
        explode(slice(col("_items"), col("_i") + lit(2), lit(maxItemsPerTxn)))
          .as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= lit(minPairs))
    pairs
      .join(ic.select(col(itemCol).as("item_a"), col("_n").as("n_a")), Seq("item_a"))
      .join(ic.select(col(itemCol).as("item_b"), col("_n").as("n_b")), Seq("item_b"))
      .withColumn("n_txn", lit(nTxn))
      // DIV (truncating integral divide) over DECIMAL(38,0) products:
      // exact at any corpus size, replayed by the oracle as HUGEINT //
      .withColumn("support_fp",
        expr("CAST(pair_n AS DECIMAL(38,0)) * 100000000 DIV n_txn"))
      .withColumn("conf_ab_fp",
        expr("CAST(pair_n AS DECIMAL(38,0)) * 100000000 DIV n_a"))
      .withColumn("conf_ba_fp",
        expr("CAST(pair_n AS DECIMAL(38,0)) * 100000000 DIV n_b"))
      .withColumn("lift_x10000",
        expr("CAST(pair_n AS DECIMAL(38,0)) * n_txn * 10000 DIV (CAST(n_a AS DECIMAL(38,0)) * n_b)"))
      .select(col("item_a"), col("item_b"), col("pair_n"), col("n_a"), col("n_b"),
        col("n_txn"), col("support_fp"), col("conf_ab_fp"), col("conf_ba_fp"),
        col("lift_x10000"))
  }

  /** Two-proportion A/B analysis per experiment: conversion counts per
    * variant (exact integers, one partial-aggregated pass), pooled
    * two-proportion z statistic, absolute lift, and a ±z* Wald interval
    * on the difference — the experiment-readout primitive. Only the
    * final statistics touch doubles, each factor cast from its exact
    * count separately in a pinned sequence (`q_ab_test` replays it
    * term for term), with sqrt of the same double on both engines.
    * Exactly two variants per experiment are required (a silent
    * many-armed readout with pairwise stats is a stats bug, not a
    * feature) — more arms fail loudly. Degenerate pooled rates (0% or
    * 100%) surface null z, not a division by zero.
    *
    * Output: (experiment, variant_a, variant_b, n_a, conv_a, n_b,
    * conv_b, lift, z, ci_lo, ci_hi) — variant_a < variant_b. */
  def abTest(df: DataFrame, expCol: String, variantCol: String,
             convertedCol: String, zStar: Double = 1.96): DataFrame = {
    require(zStar > 0.0, s"zStar must be positive, got $zStar")
    val agg = df.groupBy(col(expCol), col(variantCol).cast("string").as("_v"))
      .agg(count(lit(1)).as("_n"),
        sum(col(convertedCol).cast("int").cast("long")).as("_c"))
    val arms = agg.groupBy(col(expCol)).agg(count(lit(1)).as("_arms"))
      .filter(col("_arms") =!= 2).limit(1).collect()
    require(arms.isEmpty,
      s"abTest: experiment '${if (arms.nonEmpty) arms.head.get(0) else ""}' does not " +
        "have exactly two variants — split multi-armed readouts explicitly")
    val a = agg.select(col(expCol), col("_v").as("variant_a"),
      col("_n").as("n_a"), col("_c").as("conv_a"))
    val b = agg.select(col(expCol), col("_v").as("variant_b"),
      col("_n").as("n_b"), col("_c").as("conv_b"))
    val joined = a.join(b, Seq(expCol)).filter(col("variant_a") < col("variant_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pPool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val sePool = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    val seWald = sqrt(pa * (lit(1.0) - pa) / col("n_a").cast("double") +
      pb * (lit(1.0) - pb) / col("n_b").cast("double"))
    joined
      .withColumn("lift", pb - pa)
      .withColumn("z", when(pPool > 0.0 && pPool < 1.0, (pb - pa) / sePool))
      .withColumn("ci_lo", (pb - pa) - lit(zStar) * seWald)
      .withColumn("ci_hi", (pb - pa) + lit(zStar) * seWald)
      .select(col(expCol), col("variant_a"), col("variant_b"), col("n_a"),
        col("conv_a"), col("n_b"), col("conv_b"), col("lift"), col("z"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Poisson-bootstrap confidence interval for a mean — THE bootstrap
    * that survives scale (resampling n rows with replacement needs a
    * global index; giving every row an independent Poisson(1) weight
    * per replica needs nothing but the row — one projection + one
    * partial-aggregated pass, embarrassingly parallel at any corpus
    * size; Chamandy et al., "Estimating Uncertainty for Massive Data
    * Streams", Google 2012). ENTIRELY integer-exact: the per-(row,
    * replica) weight comes from the [[Dsir.resampleGumbel]] LCG
    * contract mapped through a LITERAL fixed-point Poisson(1) CDF
    * table (no engine evaluates exp), values quantize to 1e-6 longs,
    * replica means are integer divisions of exact sums, and the CI
    * bounds are rank-SELECTED replica means — no doubles anywhere, so
    * any engine replays every output bit (`q_bootstrap_ci`).
    *
    * Output: one row — (n, replicas, mean_fp = the full-sample mean,
    * ci_lo_fp, ci_hi_fp), all 1e-6 fixed-point longs; the interval is
    * the [⌈α/2·B⌉, ⌈(1−α/2)·B⌉] rank band of the replica means.
    * Replicas with zero effective weight (possible only for tiny n)
    * are dropped from the band. */
  def bootstrapMeanCI(df: DataFrame, valueCol: String, idCol: String,
                      replicas: Int = 50, seed: Long = 12345L,
                      alphaPermille: Int = 50): DataFrame = {
    require(replicas >= 4, s"replicas must be >= 4, got $replicas")
    require(seed >= 0L, s"seed must be >= 0, got $seed")
    require(alphaPermille >= 1 && alphaPermille < 1000,
      s"alphaPermille must be in [1, 999], got $alphaPermille")
    val m = 2147483648L // 2^31
    // ⌊CDF_Poisson(1)(k)·2^31⌋ for k = 0..8 — literals, not runtime exp;
    // u past the last threshold draws weight 9 (mass ~1e-9)
    val th = Seq(790015084L, 1580030168L, 1975037710L, 2106706891L,
      2139624186L, 2146207645L, 2147304888L, 2147461638L, 2147481231L)
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"),
        floor(col(valueCol) * lit(1e6)).cast("long").as("_vfp"))
    val exploded = vals
      .select(col("_id"), col("_vfp"),
        posexplode(array_repeat(lit(1), replicas)).as(Seq("_r", "_one")))
      // the seed enters via a Knuth-multiplied offset: a raw `+ seed`
      // aliases with the replica index (seed+1 ≡ r+1, leaving the
      // replica-mean MULTISET — and so the CI band — unchanged), and a
      // post-multiply `+ seed` barely moves any weight; both were live
      // bugs caught by the seed-sensitivity spec
      .withColumn("_u", pmod(
        pmod(col("_id") * replicas + col("_r") +
          lit((seed % m) * 2654435761L % m), lit(m)) * lit(1103515245L) +
          lit(seed), lit(m)))
      .withColumn("_w", th.zipWithIndex.foldRight(lit(9L): Column) {
        case ((t, k), rest) => when(col("_u") < t, k.toLong).otherwise(rest)
      })
    val perReplica = exploded.groupBy(col("_r"))
      .agg(sum(col("_w") * col("_vfp")).as("_ws"), sum(col("_w")).as("_wn"))
      .filter(col("_wn") > 0L)
      .select(col("_r"), expr("_ws div _wn").as("_mean_fp"))
    // B rows: rank-select the band edges (tiny, but stay distributed)
    val b = perReplica.count()
    val loRank = (alphaPermille.toLong * b + 1999L) / 2000L // ceil(α/2·B)
    val hiRank = ((2000L - alphaPermille) * b + 1999L) / 2000L
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_mean_fp"), col("_r"))
    val band = perReplica.withColumn("_rn", row_number().over(w))
      .agg(max(when(col("_rn") === loRank, col("_mean_fp"))).as("ci_lo_fp"),
        max(when(col("_rn") === hiRank, col("_mean_fp"))).as("ci_hi_fp"))
    val full = vals.agg(count(lit(1)).as("n"), sum(col("_vfp")).as("_s"))
      .select(col("n"), expr("_s div n").as("mean_fp"))
    full.crossJoin(band)
      .select(col("n"), lit(b).as("replicas"), col("mean_fp"),
        col("ci_lo_fp"), col("ci_hi_fp"))
  }

  /** Welch's two-sample t statistic per experiment over a CONTINUOUS
    * metric (revenue per user, latency, tokens per doc) — the unequal-
    * variance companion of [[abTest]]'s proportion z. Same exactness
    * contract as [[groupedOls]]: values quantize to ⌊v·10^scale⌋ and
    * n, Σx, Σx² accumulate as DECIMAL(38,0) integers per variant (one
    * partial-aggregated pass); mean, sample variance (n−1), the Welch
    * standard error, t, and the Welch–Satterthwaite df are pinned
    * double sequences over those exact sums (`q_welch_t` replays them
    * over HUGEINT). Exactly two variants per experiment (enforced
    * loudly); single-observation or zero-variance-pair arms surface
    * null t/df, never a division by zero.
    *
    * Output: (experiment, variant_a, variant_b, n_a, mean_a, n_b,
    * mean_b, diff, t, df) — variant_a < variant_b, means in original
    * units. */
  def welchT(df: DataFrame, expCol: String, variantCol: String,
             valueCol: String, scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val agg = df.filter(col(valueCol).isNotNull)
      .select(col(expCol), col(variantCol).cast("string").as("_v"),
        floor(col(valueCol) * lit(p)).cast("decimal(38,0)").as("_x"))
      .groupBy(col(expCol), col("_v"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_x") * col("_x")).as("_sxx"))
    val arms = agg.groupBy(col(expCol)).agg(count(lit(1)).as("_arms"))
      .filter(col("_arms") =!= 2).limit(1).collect()
    require(arms.isEmpty,
      s"welchT: experiment '${if (arms.nonEmpty) arms.head.get(0) else ""}' does not " +
        "have exactly two variants")
    def side(s: String) = agg.select(col(expCol), col("_v").as(s"variant_$s"),
      col("_n").as(s"_n$s"), col("_sx").as(s"_sx$s"), col("_sxx").as(s"_sxx$s"))
    val j = side("a").join(side("b"), Seq(expCol))
      .filter(col("variant_a") < col("variant_b"))
    // mean and (n−1)-variance from exact sums; var numerator n·Σx²−(Σx)²
    // stays DECIMAL-exact, denominators n·(n−1) too
    def stats(s: String) = {
      val n = col(s"_n$s"); val sx = col(s"_sx$s"); val sxx = col(s"_sxx$s")
      val mean = sx.cast("double") / n.cast("double") / lit(p)
      val varNum = n * sxx - sx * sx
      val varD = when(n > 1,
        varNum.cast("double") / (n * (n - 1)).cast("double") / lit(p) / lit(p))
      (mean, varD, n)
    }
    val (ma, va, na) = stats("a")
    val (mb, vb, nb) = stats("b")
    val seSq = va / na.cast("double") + vb / nb.cast("double")
    val t = when(seSq > 0.0, (mb - ma) / sqrt(seSq))
    val dfW = when(seSq > 0.0,
      (seSq * seSq) /
        ((va / na.cast("double")) * (va / na.cast("double")) / (na.cast("double") - 1.0) +
         (vb / nb.cast("double")) * (vb / nb.cast("double")) / (nb.cast("double") - 1.0)))
    j.select(col(expCol), col("variant_a"), col("variant_b"),
      na.cast("long").as("n_a"), ma.as("mean_a"),
      nb.cast("long").as("n_b"), mb.as("mean_b"),
      (mb - ma).as("diff"), t.as("t"), dfW.as("df"))
  }

  /** Experiment power analysis — the pre-registration companion to
    * [[welchT]]/[[abTest]]: given the CURRENT per-arm sample sizes and
    * pooled variance, the minimum detectable effect at significance
    * zAlpha (two-sided critical value, default 1.959963984540054 for
    * α = 0.05) and power zBeta (default 0.8416212335729143 for 80%):
    * MDE = (z_{α/2} + z_β)·√(s²_a/n_a + s²_b/n_b) — the classic
    * two-sample normal approximation. An experiment whose observed
    * |diff| ≪ MDE was never going to read out; shipping that readout
    * is how underpowered launches get green-lit. Quantiles are passed
    * as literals (not computed), so the whole statistic is a pinned
    * double sequence over the same DECIMAL-exact moment sums welchT
    * uses (`q_power_mde` replays it via HUGEINT).
    *
    * Output: (experiment, variant_a, variant_b, n_a, n_b, sd_pooled,
    * mde_abs, mde_rel) — mde_rel relative to arm a's mean; null when a
    * variance is undefined (single-observation arm) or mean_a = 0. */
  def powerAnalysis(df: DataFrame, expCol: String, variantCol: String,
                    valueCol: String, zAlpha: Double = 1.959963984540054,
                    zBeta: Double = 0.8416212335729143,
                    scale: Int = 6): DataFrame = {
    require(zAlpha > 0 && zBeta >= 0, s"quantiles must be positive, got $zAlpha / $zBeta")
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val agg = df.filter(col(valueCol).isNotNull)
      .select(col(expCol), col(variantCol).cast("string").as("_v"),
        floor(col(valueCol) * lit(p)).cast("decimal(38,0)").as("_x"))
      .groupBy(col(expCol), col("_v"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_x") * col("_x")).as("_sxx"))
      .localCheckpoint(true) // experiments×arms rows: the pair self-join
      // below reads it twice; unmaterialized it re-runs the corpus
      // filter+quantize+groupBy subtree per side (ADVICE r13)
    def side(s: String) = agg.select(col(expCol), col("_v").as(s"variant_$s"),
      col("_n").as(s"_n$s"), col("_sx").as(s"_sx$s"), col("_sxx").as(s"_sxx$s"))
    val j = side("a").join(side("b"), Seq(expCol))
      .filter(col("variant_a") < col("variant_b"))
    def varD(s: String) = {
      val n = col(s"_n$s"); val sx = col(s"_sx$s"); val sxx = col(s"_sxx$s")
      when(n > 1, (n * sxx - sx * sx).cast("double") /
        (n * (n - 1)).cast("double") / lit(p) / lit(p))
    }
    val (va, vb) = (varD("a"), varD("b"))
    val meanA = col("_sxa").cast("double") / col("_na").cast("double") / lit(p)
    val seSq = va / col("_na").cast("double") + vb / col("_nb").cast("double")
    val mde = when(seSq > 0.0, lit(zAlpha + zBeta) * sqrt(seSq))
    j.select(col(expCol), col("variant_a"), col("variant_b"),
      col("_na").cast("long").as("n_a"), col("_nb").cast("long").as("n_b"),
      when(seSq >= 0.0, sqrt((va + vb) / 2.0)).as("sd_pooled"),
      mde.as("mde_abs"),
      when(meanA =!= 0.0, mde / abs(meanA)).as("mde_rel"))
  }

  /** Shared distinct-value count table for the rank/ECDF tests below:
    * values quantize to ⌊v·10^scale⌋ (the [[welchT]] parity contract —
    * equality and order become integer-exact in every engine), then one
    * partial-aggregated pass emits per-(group, value) side counts. The
    * windows in the consumers run over THIS table — NDV-bounded per
    * group, never over raw observations. */
  private def sideCounts(df: DataFrame, groupCol: String, sideCol: String,
                         valueCol: String, sideA: String, sideB: String,
                         scale: Int): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    require(sideA != sideB, s"sides must differ, got '$sideA' twice")
    val p = math.pow(10.0, scale)
    df.filter(col(valueCol).isNotNull &&
        col(sideCol).cast("string").isin(sideA, sideB))
      .select(col(groupCol), col(sideCol).cast("string").as("_s"),
        floor(col(valueCol) * lit(p)).cast("long").as("_x"))
      .groupBy(col(groupCol), col("_x"))
      .agg(sum(when(col("_s") === sideA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_s") === sideB, 1L).otherwise(0L)).as("_cb"))
  }

  /** Two-sample Kolmogorov–Smirnov test per group — the distribution-
    * drift gate between two corpus snapshots / traffic slices on a
    * numeric feature (doc length, score, latency), sensitive to ANY
    * distributional change where [[welchT]] only sees the mean:
    * D = max_x |ECDF_a(x) − ECDF_b(x)|, rejected at `alpha` when
    * D > c(α)·√((n_a+n_b)/(n_a·n_b)) with c(α) = √(−ln(α/2)/2) (the
    * classic large-sample approximation).
    *
    * Exactness: ECDF differences are compared as the INTEGER
    * |cum_a·n_b − cum_b·n_a| over the quantized distinct-value table
    * (DECIMAL(38,0) products — 100 TB-count-proof), so the argmax is
    * engine-exact; only the final D and threshold are pinned double
    * divisions (`q_ks_drift` replays them over HUGEINT). One shuffle to
    * the (group, value) counts, cumulative windows on the NDV-bounded
    * table, one aggregate — raw observations never enter a window.
    * Groups missing either side surface null D, never a division by
    * zero.
    *
    * Output: (groupCol, n_a, n_b, d, d_crit, drifted). */
  def ksTest(df: DataFrame, groupCol: String, sideCol: String,
             valueCol: String, sideA: String, sideB: String,
             alpha: Double = 0.05, scale: Int = 6): DataFrame =
    ksCore(sideCounts(df, groupCol, sideCol, valueCol, sideA, sideB, scale),
      groupCol, alpha)

  /** Quantized per-group value histogram — the PERSISTABLE side of a
    * KS comparison: (groupCol, value_q = ⌊v·10^scale⌋, c). Write it
    * once per reference window / corpus release, then feed any number
    * of later snapshots (or arriving micro-batches —
    * [[graft.streaming.IncrementalStream.ksDriftStream]]) through
    * [[ksTestFromCounts]] without ever rescanning the reference rows.
    * NDV-bounded per group, like everything downstream of it. */
  def quantizedHistogram(df: DataFrame, groupCol: String, valueCol: String,
                         scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), floor(col(valueCol) * lit(p)).cast("long").as("value_q"))
      .groupBy(col(groupCol), col("value_q"))
      .agg(count(lit(1)).as("c"))
  }

  /** [[ksTest]]'s integer core over PRE-AGGREGATED side histograms —
    * `counts` = (groupCol, value_q, c_a, c_b), both sides quantized at
    * the SAME scale (the [[quantizedHistogram]] contract; mixing scales
    * makes the ECDFs incomparable). This is the entry point when one
    * side is a persisted artifact: the reference corpus never rescans,
    * only its NDV-bounded histogram joins each new snapshot's. */
  def ksTestFromCounts(counts: DataFrame, groupCol: String,
                       alpha: Double = 0.05): DataFrame =
    ksCore(counts.select(col(groupCol), col("value_q").as("_x"),
      coalesce(col("c_a"), lit(0L)).cast("long").as("_ca"),
      coalesce(col("c_b"), lit(0L)).cast("long").as("_cb")), groupCol, alpha)

  /** Per-FEATURE two-sample KS between two corpus releases — the
    * snapshot-diff readout ([[graft.pipelines.TrainingDataPipeline.snapshotDiff]]):
    * each numeric feature column melts into its own KS group, so one
    * report row per feature says whether THAT marginal drifted between
    * releases. One row-local explode per side (|features|-bounded fan-
    * out), then exactly [[ksTest]]'s shape with the feature name as the
    * group key. Output: (feature, n_a, n_b, d, d_crit, drifted). */
  def snapshotKs(a: DataFrame, b: DataFrame, featureCols: Seq[String],
                 alpha: Double = 0.05, scale: Int = 6): DataFrame = {
    require(featureCols.nonEmpty, "snapshotKs needs at least one feature column")
    def melt(df: DataFrame, s: String) = df
      .select(explode(array(featureCols.map(f =>
        struct(lit(f).as("feature"), col(f).cast("double").as("value"))): _*)).as("_fv"))
      .select(col("_fv.feature").as("feature"), col("_fv.value").as("value"),
        lit(s).as("side"))
    ksTest(melt(a, "a").unionAll(melt(b, "b")),
      "feature", "side", "value", "a", "b", alpha, scale)
  }

  private def ksCore(counts: DataFrame, groupCol: String,
                     alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_x"))
      .rowsBetween(Long.MinValue, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val d38 = "decimal(38,0)"
    val cum = counts
      .withColumn("_na", sum(col("_ca")).over(wAll))
      .withColumn("_nb", sum(col("_cb")).over(wAll))
      .withColumn("_num",
        abs(sum(col("_ca")).over(wCum).cast(d38) * col("_nb") -
          sum(col("_cb")).over(wCum).cast(d38) * col("_na")))
    val c = math.sqrt(-math.log(alpha / 2.0) / 2.0)
    val agg = cum.groupBy(col(groupCol))
      .agg(max(col("_na")).as("_na"), max(col("_nb")).as("_nb"),
        max(col("_num")).as("_m"))
    val na = col("_na").cast("double"); val nb = col("_nb").cast("double")
    val d = when(col("_na") > 0 && col("_nb") > 0,
      col("_m").cast("double") / (na * nb))
    val dCrit = when(col("_na") > 0 && col("_nb") > 0,
      lit(c) * sqrt((na + nb) / (na * nb)))
    agg.select(col(groupCol), col("_na").cast("long").as("n_a"),
      col("_nb").cast("long").as("n_b"), d.as("d"), dCrit.as("d_crit"),
      (d > dCrit).as("drifted"))
  }

  /** Mann–Whitney U test per group (Wilcoxon rank-sum) — the
    * nonparametric A/B readout for skewed metrics (revenue, dwell time,
    * token counts) where [[welchT]]'s normality assumption is wrong:
    * rank the pooled sample (ties take the average rank), U_a =
    * R_a − n_a(n_a+1)/2, and the tie-corrected normal approximation
    * z = (U_a − n_a·n_b/2) / √(n_a·n_b/12 · (N+1 − Σ(t³−t)/(N(N−1)))).
    *
    * Exactness: average ranks live in HALVES, so everything up to z is
    * the exact integer 2·R_a = Σ c_a·(2·cumBefore + c + 1) and the
    * exact tie sum Σ(t³−t), both DECIMAL(38,0)-accumulated over the
    * quantized distinct-value table; z is one pinned double sequence
    * over those integers (`q_mann_whitney` replays via HUGEINT). Same
    * scale shape as [[ksTest]]. Degenerate groups (a missing side, or
    * every observation tied — zero variance) surface null z.
    *
    * Output: (groupCol, n_a, n_b, u2_a = 2·U_a, z) — u2_a doubled to
    * stay integral under tie-ranks. */
  def mannWhitneyU(df: DataFrame, groupCol: String, sideCol: String,
                   valueCol: String, sideA: String, sideB: String,
                   scale: Int = 6): DataFrame = {
    val counts = sideCounts(df, groupCol, sideCol, valueCol, sideA, sideB, scale)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_x"))
      .rowsBetween(Long.MinValue, -1)
    val d38 = "decimal(38,0)"
    val base = counts
      .withColumn("_c", col("_ca") + col("_cb"))
      .withColumn("_before", coalesce(sum(col("_ca") + col("_cb")).over(wCum), lit(0L)))
    val agg = base.groupBy(col(groupCol))
      .agg(sum(col("_ca")).cast(d38).as("_na"),
        sum(col("_cb")).cast(d38).as("_nb"),
        sum(col("_ca").cast(d38) * (lit(2).cast(d38) * col("_before") + col("_c") + 1))
          .as("_r2a"),
        sum(col("_c").cast(d38) * col("_c") * col("_c") - col("_c")).as("_ties"))
    val na = col("_na"); val nb = col("_nb"); val bigN = na + nb
    val u2 = col("_r2a") - na * (na + 1)
    // variance from exact integers, one pinned sequence; null when every
    // pooled value is tied (T = N³−N ⇒ var = 0)
    val varD = when(na > 0 && nb > 0,
      (na * nb).cast("double") / 12.0 *
        ((bigN.cast("double") + 1.0) -
          col("_ties").cast("double") / (bigN * (bigN - 1)).cast("double")))
    val z = when(varD > 0.0,
      (u2.cast("double") - (na * nb).cast("double")) / (lit(2.0) * sqrt(varD)))
    agg.select(col(groupCol), na.cast("long").as("n_a"), nb.cast("long").as("n_b"),
      u2.cast("long").as("u2_a"), z.as("z"))
  }

  /** Spearman rank correlation per group — the monotonic-association
    * readout for skewed metrics where Pearson's linearity assumption is
    * wrong (score vs engagement, length vs quality): Pearson over
    * tie-averaged ranks. The ranks live in HALVES (the [[mannWhitneyU]]
    * identity: 2·rank_avg(v) = 2·cumBefore(v) + count(v) + 1), so both
    * rank columns stay exact integers; rank WINDOWS run per axis on the
    * NDV-bounded distinct-value tables, never on raw rows — rows only
    * pick up their two ranks through co-grouped joins and feed one
    * partial-aggregated DECIMAL(38,0) moment pass. ρ is the
    * [[groupedOls]] pinned double sequence over those exact sums
    * (`q_spearman` replays via HUGEINT). Groups degenerate on either
    * axis (all tied) surface null ρ.
    *
    * Output: (groupCol, n, rho). */
  def spearman(df: DataFrame, groupCol: String, xCol: String, yCol: String,
               scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val d38 = "decimal(38,0)"
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol),
        floor(col(xCol) * lit(p)).cast("long").as("_qx"),
        floor(col(yCol) * lit(p)).cast("long").as("_qy"))
    def rankTable(qCol: String, out: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col(qCol))
        .rowsBetween(Long.MinValue, -1)
      rows.groupBy(col(groupCol), col(qCol))
        .agg(count(lit(1)).as("_c"))
        .withColumn(out,
          lit(2) * coalesce(sum(col("_c")).over(w), lit(0L)) + col("_c") + 1)
        .select(col(groupCol), col(qCol), col(out))
    }
    val ranked = rows
      .join(rankTable("_qx", "_r2x"), Seq(groupCol, "_qx"))
      .join(rankTable("_qy", "_r2y"), Seq(groupCol, "_qy"))
      .select(col(groupCol),
        col("_r2x").cast(d38).as("_x"), col("_r2y").cast(d38).as("_y"))
    val agg = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(d38).as("_n"),
      sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
      sum(col("_x") * col("_y")).as("_sxy"),
      sum(col("_x") * col("_x")).as("_sxx"),
      sum(col("_y") * col("_y")).as("_syy"))
    val num = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val denx = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val deny = col("_n") * col("_syy") - col("_sy") * col("_sy")
    agg.select(col(groupCol), col("_n").cast("long").as("n"),
      when(denx > 0 && deny > 0,
        num.cast("double") /
          sqrt(denx.cast("double")) / sqrt(deny.cast("double"))).as("rho"))
  }

  /** Cliff's delta per group — the ordinal effect SIZE companion to
    * [[mannWhitneyU]]'s significance: δ = (#(a>b) − #(a<b)) / (n_a·n_b),
    * read straight off the shared quantized distinct-value table. For
    * each distinct value, a-count × the b-mass strictly below/above it —
    * both cumulative windows on the NDV-bounded table, both counts exact
    * DECIMAL(38,0) integers; only the final δ is a pinned double
    * division (`q_cliffs_delta` replays via HUGEINT). Groups missing a
    * side surface null δ.
    *
    * Output: (groupCol, n_a, n_b, gt, lt, delta) with gt/lt the exact
    * concordant/discordant pair counts. */
  def cliffsDelta(df: DataFrame, groupCol: String, sideCol: String,
                  valueCol: String, sideA: String, sideB: String,
                  scale: Int = 6): DataFrame = {
    val counts = sideCounts(df, groupCol, sideCol, valueCol, sideA, sideB, scale)
    val d38 = "decimal(38,0)"
    val wBefore = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_x"))
      .rowsBetween(Long.MinValue, -1)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val base = counts
      .withColumn("_nb", sum(col("_cb")).over(wAll))
      .withColumn("_na", sum(col("_ca")).over(wAll))
      .withColumn("_bBelow", coalesce(sum(col("_cb")).over(wBefore), lit(0L)))
    val agg = base.groupBy(col(groupCol)).agg(
      max(col("_na")).cast(d38).as("_n_a"),
      max(col("_nb")).cast(d38).as("_n_b"),
      sum(col("_ca").cast(d38) * col("_bBelow")).as("_gt"),
      sum(col("_ca").cast(d38) * (col("_nb") - col("_bBelow") - col("_cb"))).as("_lt"))
    val pairs = col("_n_a") * col("_n_b")
    agg.select(col(groupCol),
      col("_n_a").cast("long").as("n_a"), col("_n_b").cast("long").as("n_b"),
      col("_gt").cast("long").as("gt"), col("_lt").cast("long").as("lt"),
      when(pairs > 0, (col("_gt") - col("_lt")).cast("double") / pairs.cast("double"))
        .as("delta"))
  }

  /** Cramér's V — association strength between two CATEGORICAL columns
    * (source × language, event type × value band), the bounded-[0,1]
    * normalization of χ² a release report can threshold: V =
    * √(χ² / (N·(min(r,c) − 1))). One pass to the observed grid
    * (bounded by distinct-pair count), two marginal aggregates, then
    * each OBSERVED cell's (O−E)²/E as a pinned double from exact
    * integers, floor-quantized at 1e9 fixed point and SUMMED AS LONGS —
    * the [[graft.operators.Curation.jsDivergence]] pattern, so the
    * total is partitioning-independent and any engine replays it
    * (`q_cramers_v`). UNOBSERVED grid cells (O = 0) each contribute
    * exactly E to χ², and Σ_unobserved E = N − Σ_observed E — so the
    * full-grid total needs only the observed-cell pass:
    * chi2_fp = Σ term_fp + N·10⁹ − Σ e_fp. The grid never materializes
    * beyond the observed distinct pairs. Output (one row):
    * (n, r, c, chi2_fp, v); v null for degenerate (single-category)
    * tables. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("_a"), col(bCol).cast("string").as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
      .localCheckpoint(true) // grid-sized; three readers below
    val ra = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val cb = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    // null-safe read (ADVICE r14): sum over zero rows is null, and
    // .getLong on it would NPE before the designed error message fires
    val nRow = cells.agg(sum(col("_o")).cast("long")).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(n > 0, "cramersV: empty input")
    val r = ra.count(); val c = cb.count()
    val e = col("_ra").cast("double") * col("_cb").cast("double") / lit(n.toDouble)
    val d = col("_o").cast("double") - e
    val sums = cells.join(broadcast(ra), Seq("_a")).join(broadcast(cb), Seq("_b"))
      .select(floor(d * d / e * lit(1e9)).cast("long").as("_t"),
        floor(e * lit(1e9)).cast("long").as("_e"))
      .agg(sum(col("_t")), sum(col("_e"))).head()
    val chiFp = sums.getLong(0) + n * 1000000000L - sums.getLong(1)
    val minDim = math.min(r, c) - 1
    val spark = df.sparkSession
    import spark.implicits._
    val v = if (minDim > 0) Some(math.sqrt(chiFp / 1e9 / (n.toDouble * minDim))) else None
    Seq((n, r, c, chiFp, v)).toDF("n", "r", "c", "chi2_fp", "v")
  }

  /** CUPED variance reduction (Deng et al. 2013) — the experiment
    * readout upgrade every mature A/B platform runs: adjust each arm's
    * metric mean by a PRE-EXPERIMENT covariate, mean_adj = ȳ_v −
    * θ·(x̄_v − x̄), with θ = cov(x,y)/var(x) fitted on the POOLED
    * experiment (per-arm θ would bias the contrast). The variance
    * shrinks by the pooled ρ² — shipped per experiment as `rho2` so the
    * readout reports its own sensitivity gain.
    *
    * Exactness: one partial-aggregated pass to per-(experiment, arm)
    * DECIMAL(38,0) moment sums over ⌊v·10^scale⌋ integers (the
    * [[groupedOls]] contract); pooled sums are the in-plan per-arm
    * rollup, θ / means / ρ² are pinned double sequences over those
    * integers (`q_cuped` replays via HUGEINT). Experiments with
    * degenerate pooled covariate variance surface NULL θ/adjusted
    * means (CUPED is undefined there), never a division by zero.
    *
    * Output: (expCol, variant, n, mean_y, mean_adj, theta, rho2). */
  def cuped(df: DataFrame, expCol: String, variantCol: String,
            metricCol: String, covariateCol: String,
            scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val d38 = "decimal(38,0)"
    val arm = df.filter(col(metricCol).isNotNull && col(covariateCol).isNotNull)
      .select(col(expCol), col(variantCol).cast("string").as("variant"),
        floor(col(metricCol) * lit(p)).cast(d38).as("_y"),
        floor(col(covariateCol) * lit(p)).cast(d38).as("_x"))
      .groupBy(col(expCol), col("variant"))
      .agg(count(lit(1)).cast(d38).as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
      .localCheckpoint(true) // experiments×arms rows; pooled rollup + join below
    val pooled = arm.groupBy(col(expCol)).agg(
      sum(col("_n")).as("_pn"), sum(col("_sx")).as("_psx"), sum(col("_sy")).as("_psy"),
      sum(col("_sxy")).as("_psxy"), sum(col("_sxx")).as("_psxx"),
      sum(col("_syy")).as("_psyy"))
    val num = col("_pn") * col("_psxy") - col("_psx") * col("_psy")
    val denx = col("_pn") * col("_psxx") - col("_psx") * col("_psx")
    val deny = col("_pn") * col("_psyy") - col("_psy") * col("_psy")
    val theta = when(denx > 0, num.cast("double") / denx.cast("double"))
    val rho2 = when(denx > 0 && deny > 0,
      num.cast("double") / denx.cast("double") * num.cast("double") / deny.cast("double"))
    val withPool = arm.join(
      pooled.select(col(expCol), theta.as("theta"), rho2.as("rho2"),
        (col("_psx").cast("double") / col("_pn").cast("double") / lit(p)).as("_pxbar")),
      Seq(expCol))
    val meanY = col("_sy").cast("double") / col("_n").cast("double") / lit(p)
    val meanX = col("_sx").cast("double") / col("_n").cast("double") / lit(p)
    withPool.select(col(expCol), col("variant"),
      col("_n").cast("long").as("n"), meanY.as("mean_y"),
      (meanY - col("theta") * (meanX - col("_pxbar"))).as("mean_adj"),
      col("theta"), col("rho2"))
  }

  /** Delta-method CI for a RATIO metric (revenue per session, tokens
    * per doc, clicks per user) — the readout [[abTest]]/[[welchT]]
    * cannot give: R = Σy/Σx is a ratio of sums over the SAME units, so
    * its variance needs the covariance term,
    * Var(R) ≈ (s²_y − 2R·s_xy + R²·s²_x) / (n·x̄²), CI = R ± z·SE.
    * One partial-aggregated DECIMAL(38,0) moment pass per group over
    * quantized integers; variances/covariance exact rationals until
    * the pinned final doubles (`q_ratio_ci` replays via HUGEINT).
    * Groups with n < 2, zero denominator, or negative variance
    * estimate surface NULL se/bounds.
    *
    * Output: (groupCol, n, ratio, se, lo, hi). */
  def ratioMetricCI(df: DataFrame, groupCol: String, numCol: String,
                    denCol: String, zAlpha: Double = 1.959963984540054,
                    scale: Int = 6): DataFrame = {
    require(zAlpha > 0, s"zAlpha must be positive, got $zAlpha")
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val d38 = "decimal(38,0)"
    val agg = df.filter(col(numCol).isNotNull && col(denCol).isNotNull)
      .select(col(groupCol),
        floor(col(numCol) * lit(p)).cast(d38).as("_y"),
        floor(col(denCol) * lit(p)).cast(d38).as("_x"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast(d38).as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
    val nD = col("_n").cast("double")
    val ratio = when(col("_sx") =!= lit(0).cast(d38),
      col("_sy").cast("double") / col("_sx").cast("double"))
    // sample (co)variances: (n·Σab − Σa·Σb) / (n·(n−1)), exact DECIMAL
    // numerators, one pinned double division each
    def sVar(sab: Column, sa: Column, sb: Column) =
      (col("_n") * sab - sa * sb).cast("double") /
        (col("_n") * (col("_n") - 1)).cast("double") / lit(p) / lit(p)
    val (vy, vx) = (sVar(col("_syy"), col("_sy"), col("_sy")),
      sVar(col("_sxx"), col("_sx"), col("_sx")))
    val cxy = sVar(col("_sxy"), col("_sx"), col("_sy"))
    val xbar = col("_sx").cast("double") / nD / lit(p)
    val varR = when(col("_n") > 1 && ratio.isNotNull && xbar =!= 0.0,
      (vy - lit(2.0) * ratio * cxy + ratio * ratio * vx) / (nD * xbar * xbar))
    val se = when(varR >= 0.0, sqrt(varR))
    agg.select(col(groupCol), col("_n").cast("long").as("n"), ratio.as("ratio"),
      se.as("se"), (ratio - lit(zAlpha) * se).as("lo"),
      (ratio + lit(zAlpha) * se).as("hi"))
  }

  /** Per-group simple linear regression (OLS y = a + b·x) from EXACT
    * fixed-point moment sums — the trend-per-segment primitive (price
    * curves per brand, score drift per source, …) computed as ONE
    * partial-aggregated pass: quantize x/y to ⌊v·10^scale⌋ and
    * accumulate n, Σx, Σy, Σxy, Σx², Σy² as DECIMAL(38,0) integers, so
    * the sums are order/partitioning-independent and exact at any group
    * size (fp products ≤1e18/row leave 20 digits of row-count headroom).
    * Only the FINAL stats touch doubles, in a pinned expression
    * sequence over the exact sums (slope = num/den, intercept =
    * (Σy − slope·Σx)/(n·10^scale), r² = num²/(den·deny)) — so any
    * engine with exact 128-bit sums replays every double bit-for-bit
    * (`q_group_ols` replays via HUGEINT). Degenerate groups (constant
    * x) surface null slope/intercept/r², not a divide-by-zero.
    *
    * Output: (group, n, slope, intercept, r2), one row per group. */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String, yCol: String,
                 scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    // floor(v·10^s): double multiply + floor are exactly-rounded IEEE ops,
    // so the quantized integer is engine-independent
    def fp(c: String) = floor(col(c) * lit(p)).cast("decimal(38,0)")
    df.select(col(groupCol), fp(xCol).as("_x"), fp(yCol).as("_y"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
      .withColumn("_num", col("_n") * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("_den", col("_n") * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_deny", col("_n") * col("_syy") - col("_sy") * col("_sy"))
      .withColumn("slope",
        when(col("_den") =!= 0, col("_num").cast("double") / col("_den").cast("double")))
      .withColumn("intercept",
        when(col("_den") =!= 0,
          (col("_sy").cast("double") - col("slope") * col("_sx").cast("double")) /
            (col("_n").cast("double") * lit(p))))
      .withColumn("r2",
        when(col("_den") =!= 0 && col("_deny") =!= 0,
          (col("_num").cast("double") * col("_num").cast("double")) /
            (col("_den").cast("double") * col("_deny").cast("double"))))
      .select(col(groupCol), col("_n").cast("long").as("n"),
        col("slope"), col("intercept"), col("r2"))
  }

  /** Kaplan–Meier survival curves per group — time-to-churn /
    * time-to-conversion with right-censoring (the subject left the
    * observation window without the event; it counts in the risk set
    * until its censoring time, then drops out silently — discarding
    * censored rows instead would bias survival DOWN).
    *
    * Input: one row per subject — (`groupCol`, `durationCol` integral
    * time units, `eventCol` true = event observed, false = censored).
    * S(t) = Π_{u ≤ t} (1 − d_u / n_u) over distinct event times.
    *
    * Scale shape: the corpus partial-aggregates to (group × distinct
    * durations) counts in one pass; the risk-set and survival windows
    * run on THAT table — per-group frames bounded by distinct-duration
    * cardinality, never subject count. The cumulative product rides
    * exp(Σ ln(1 − d/n)) over the ordered frame: both engines add the
    * SAME ln terms in the SAME (time-sorted) sequential order, and
    * `survival` rounds to 9 decimals (+0.0) so residual libm ulps
    * vanish. A time where the whole risk set events (d = n) pins
    * survival to exactly 0 from there on — the ln(0) branch is never
    * evaluated on either engine.
    *
    * Output per (group, t): (groupCol, t, d, c, n_at_risk, survival) —
    * d events, c censored at t, ordered semantics only (no sort
    * applied). */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(col(groupCol), col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").as("_e"))
      .groupBy(col(groupCol), col("t"))
      .agg(sum(when(col("_e"), 1L).otherwise(0L)).as("d"),
        sum(when(col("_e"), 0L).otherwise(1L)).as("c"))
    val wTot = Window.partitionBy(col(groupCol))
    val wBefore = Window.partitionBy(col(groupCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpTo = Window.partitionBy(col(groupCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    counts
      .withColumn("n_at_risk", sum(col("d") + col("c")).over(wTot) -
        coalesce(sum(col("d") + col("c")).over(wBefore), lit(0L)))
      .withColumn("_lnS", sum(
        when(col("d") > 0 && col("d") < col("n_at_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_at_risk").cast("double")))
          .otherwise(lit(0.0))).over(wUpTo))
      .withColumn("_dead", max(when(col("d") === col("n_at_risk"), 1).otherwise(0))
        .over(wUpTo))
      .withColumn("survival",
        when(col("_dead") === 1, lit(0.0))
          .otherwise(round(exp(col("_lnS")), 9) + 0.0))
      .select(col(groupCol), col("t"), col("d"), col("c"),
        col("n_at_risk"), col("survival"))
  }

  /** Two-sample LOG-RANK test per stratum — [[kaplanMeier]]'s
    * significance companion: "do the A and B survival curves differ",
    * the standard gate before reading a churn/retention split. At each
    * distinct event time, arm A's observed events compare against the
    * hypergeometric expectation d·n_a/n given the at-risk counts;
    * U = Σ(d_a − E_a), V = Σ Var_a, χ² = U²/V (1 df).
    *
    * Exactness & scale: the corpus collapses to the (stratum × arm ×
    * distinct-duration) counts table in one aggregate; at-risk counts
    * are cumulative windows on that NDV-bounded table, every per-time
    * U/V term is ONE pinned division of exact DECIMAL numerators, and
    * the time-ordered totals fold via sort_array + aggregate (never an
    * unordered double sum) — the [[graft.operators.Evaluation.brierDecomposition]]
    * convention, so `q_logrank` replays bit-for-bit. Strata with no
    * event times or zero variance surface null z/χ².
    *
    * Output: (groupCol, n_a, n_b, events_a, events_b, u, v, chi2, z). */
  def logRank(df: DataFrame, groupCol: String, armCol: String,
              durationCol: String, eventCol: String,
              armA: String, armB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val counts = df
      .filter(col(armCol).isin(armA, armB) && col(durationCol).isNotNull)
      .select(col(groupCol), (col(armCol) === armA).as("_a"),
        col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").as("_e"))
      .groupBy(col(groupCol), col("t"))
      .agg(
        sum(when(col("_a") && col("_e"), 1L).otherwise(0L)).as("d_a"),
        sum(when(!col("_a") && col("_e"), 1L).otherwise(0L)).as("d_b"),
        sum(when(col("_a"), 1L).otherwise(0L)).as("tot_a"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("tot_b"))
    val wTot = Window.partitionBy(col(groupCol))
    val wBefore = Window.partitionBy(col(groupCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risky = counts
      .withColumn("n_a", sum(col("tot_a")).over(wTot) -
        coalesce(sum(col("tot_a")).over(wBefore), lit(0L)))
      .withColumn("n_b", sum(col("tot_b")).over(wTot) -
        coalesce(sum(col("tot_b")).over(wBefore), lit(0L)))
      .withColumn("d", col("d_a") + col("d_b"))
      .withColumn("n", col("n_a") + col("n_b"))
      .filter(col("d") > 0L && col("n") > 1L)
    // per-time terms: the U numerator is an exact DECIMAL (≤ n², always
    // double-exact); V is FACTORED so every integer→double conversion
    // is a value ≤ n — a fused n⁴-scale numerator would pass 2⁵³ on
    // large strata and its decimal→double rounding could differ from
    // another engine's int128→double. Identical pinned op order both
    // sides ⇒ bit-equal IEEE sequences.
    val uNum = (col("d_a").cast(d38) * col("n") - col("d").cast(d38) * col("n_a"))
    val dD = col("d").cast("double")
    val vTerm = dD * (col("n") - col("d")).cast("double") /
      (col("n") - 1).cast("double") * col("n_a").cast("double") /
      col("n").cast("double") * col("n_b").cast("double") /
      col("n").cast("double")
    val terms = risky.select(col(groupCol),
      col("t"), col("d_a"), col("d_b"),
      (uNum.cast("double") / col("n").cast("double")).as("_u"),
      vTerm.as("_v"))
    val totals = df
      .filter(col(armCol).isin(armA, armB) && col(durationCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        sum(when(col(armCol) === armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(armCol) === armB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col(armCol) === armA && col(eventCol).cast("boolean"), 1L)
          .otherwise(0L)).as("events_a"),
        sum(when(col(armCol) === armB && col(eventCol).cast("boolean"), 1L)
          .otherwise(0L)).as("events_b"))
    val folded = terms
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("t"), col("_u"), col("_v"))))
        .as("_terms"))
      .withColumn("u", aggregate(col("_terms"), lit(0.0),
        (acc, x) => acc + x.getField("_u")))
      .withColumn("v", aggregate(col("_terms"), lit(0.0),
        (acc, x) => acc + x.getField("_v")))
      .select(col(groupCol), col("u"), col("v"))
    totals.join(folded, Seq(groupCol), "left")
      .select(col(groupCol), col("n_a"), col("n_b"),
        col("events_a"), col("events_b"), col("u"), col("v"),
        when(col("v") > 0.0, col("u") * col("u") / col("v")).as("chi2"),
        when(col("v") > 0.0, col("u") / sqrt(col("v"))).as("z"))
  }

  /** U-shaped (position-based) multi-touch attribution: each
    * conversion's credit splits across the touchpoints since the
    * user's previous conversion — 40% to the first touch, 40% to the
    * last, the middle 20% evenly over the rest (1 touch takes 100%,
    * 2 touches split 50/50). The standard step past the
    * last-touch/first-touch extremes (`q_first_touch`).
    *
    * Credit is exact integer fixed-point out of 10⁶ per conversion:
    * first/last ⌊4·10⁵⌋, each middle ⌊2·10⁵/(k−2)⌋ — truncating
    * division, so a conversion's credits can sum to slightly under
    * 10⁶ with many middles (documented, engine-exact; nothing hides in
    * float remainders). Conversions with NO preceding touch carry
    * their full credit on themselves under type `_direct`.
    *
    * Scale shape: one user-partitioned window pass stamps every touch
    * with its owning conversion (the running conversion count — no
    * join back to conversions), a second per-(user, conversion) window
    * ranks positions (frames bounded by path length), then ONE
    * partial-aggregated rollup to (touch type, credit). Output:
    * (typeCol, touches, conversions, credit_fp), credit_fp = Σ of the
    * 10⁶-scale credits — divide by 10⁶·conversions downstream for
    * share-of-credit. */
  def positionAttribution(events: DataFrame, userCol: String, tsCol: String,
                          typeCol: String, convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(typeCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val isConv = col(typeCol) === convType
    // path id = how many conversions happened up to AND INCLUDING this
    // row: a touch belongs to the path of the next conversion, so its
    // path id is (conversions so far) + 1 == the conversion's own id
    val stamped = events
      .select(col(userCol), col(tsCol), col(typeCol), isConv.as("_conv"))
      .withColumn("_cum", sum(when(col("_conv"), 1L).otherwise(0L)).over(wUser))
      .withColumn("_path", when(col("_conv"), col("_cum")).otherwise(col("_cum") + 1))
    // touches whose path has a conversion (paths after the last
    // conversion never convert and earn nothing)
    val nConvPerUser = stamped.filter(col("_conv"))
      .groupBy(col(userCol)).agg(max(col("_cum")).as("_nconv"))
    val touches = stamped.filter(!col("_conv"))
      .join(nConvPerUser, Seq(userCol))
      .filter(col("_path") <= col("_nconv"))
    val wPath = Window.partitionBy(col(userCol), col("_path"))
    val wPos = wPath.orderBy(col(tsCol), col(typeCol))
    val ranked = touches
      .withColumn("_k", count(lit(1)).over(wPath))
      .withColumn("_pos", row_number().over(wPos))
      .withColumn("_credit",
        when(col("_k") === 1, lit(1000000L))
          .when(col("_k") === 2, lit(500000L))
          .when(col("_pos") === 1 || col("_pos") === col("_k"), lit(400000L))
          .otherwise(expr("200000 div (_k - 2)")))
    val attributed = ranked.groupBy(col(typeCol))
      .agg(count(lit(1)).as("touches"),
        count_distinct(col(userCol), col("_path")).as("conversions"),
        sum(col("_credit")).as("credit_fp"))
    // conversions with an empty path self-attribute as `_direct`
    val direct = stamped.filter(col("_conv"))
      .join(touches.select(col(userCol), col("_path")).distinct(),
        Seq(userCol, "_path"), "left_anti")
      .groupBy(lit("_direct").as(typeCol))
      .agg(count(lit(1)).as("touches"), count(lit(1)).as("conversions"),
        (count(lit(1)) * lit(1000000L)).as("credit_fp"))
    attributed.unionByName(direct)
  }

  /** Benjamini–Hochberg FDR correction (1995) over a table of
    * hypothesis p-values — the multiple-testing gate for a fleet of
    * per-segment experiment readouts ([[welchT]] / [[abTest]] grids):
    * rank p ascending, reject the smallest k where k is the LARGEST
    * rank with p_(k) ≤ k·α/m. Controls the expected false-discovery
    * rate at α, where per-test α would flag m·α false positives.
    *
    * Exactness: the comparison runs in integers —
    * ⌊p·10⁹⌋·m·alphaDen ≤ rank·alphaNum·10⁹ — so the rejection
    * boundary replays exactly in SQL; rank ties on equal quantized p
    * break by key ascending. The input is HYPOTHESIS-count-sized (one
    * row per experiment readout, not per observation): the global rank
    * window runs in one task over m rows — asserted ≤ 10⁷, far above
    * any real experiment fleet but far below corpus scale.
    *
    * Output: (keyCol, p, rank, m, rejected). Null p-values are
    * excluded from m (they carry no evidence). */
  def bhCorrect(df: DataFrame, keyCol: String, pCol: String,
                alphaNum: Long = 5L, alphaDen: Long = 100L): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen,
      s"need 0 < alpha = $alphaNum/$alphaDen <= 1")
    val scale = 1000000000L
    val base = df.filter(col(pCol).isNotNull)
      .select(col(keyCol), col(pCol).cast("double").as("p"),
        floor(col(pCol) * lit(scale.toDouble)).cast("long").as("_pfp"))
    val m = base.count()
    require(m <= 10000000L,
      s"bhCorrect is hypothesis-table-sized; got $m rows (max 1e7)")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_pfp"), col(keyCol))
    // DECIMAL(38,0) comparison: _pfp·m·alphaDen reaches 1e16·alphaDen,
    // which wraps Long for alphaDen ≥ ~922 (e.g. alpha = 1/1000) and
    // would silently mark arbitrary hypotheses rejected
    val d38 = "decimal(38,0)"
    val ranked = base
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("_ok",
        col("_pfp").cast(d38) * lit(m) * lit(alphaDen) <=
          col("rank").cast(d38) * lit(alphaNum) * lit(scale))
    val kRow = ranked.agg(max(when(col("_ok"), col("rank")))).head()
    val k = if (kRow.isNullAt(0)) 0L else kRow.getLong(0)
    ranked.select(col(keyCol), col("p"), col("rank"), lit(m).as("m"),
      (col("rank") <= lit(k)).as("rejected"))
  }

  /** Wilcoxon signed-rank test per group — the PAIRED nonparametric
    * readout that completes the family ([[mannWhitneyU]]: two
    * independent samples; [[anovaF]]: k arms): each unit measured
    * before and after (same users, same docs — the launch-review shape
    * where independence is false by design), test whether the paired
    * differences are symmetric about zero. Differences quantize to
    * ⌊(x−y)·10^scale⌋ integers (exact), zeros drop (the published
    * rule), |d| ranks tie-average over the NDV-bounded distinct-|d|
    * table, and the doubled positive-rank sum 2W⁺ = Σ c⁺·(2·cumBefore
    * + c + 1) stays an exact DECIMAL(38,0) integer — as does the tie
    * sum Σ(t³−t). The normal approximation
    * z = (2W⁺ − n(n+1)/2) / √(n(n+1)(2n+1)/6 − Σ(t³−t)/12)
    * is one pinned double sequence over those integers
    * (`q_wilcoxon` replays via HUGEINT). Groups whose pairs are all
    * zero differences drop out entirely (no evidence either way).
    *
    * Output: (groupCol, n, w2_pos = 2W⁺, z). */
  def wilcoxonSignedRank(df: DataFrame, groupCol: String, xCol: String,
                         yCol: String, scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val d38 = "decimal(38,0)"
    val counts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol),
        floor((col(xCol) - col(yCol)) * lit(p)).cast("long").as("_d"))
      .filter(col("_d") =!= 0L)
      .select(col(groupCol), abs(col("_d")).as("_ad"), col("_d"))
      .groupBy(col(groupCol), col("_ad"))
      .agg(sum(when(col("_d") > 0, 1L).otherwise(0L)).as("_cp"),
        count(lit(1)).as("_c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_ad"))
      .rowsBetween(Long.MinValue, -1)
    val base = counts
      .withColumn("_before", coalesce(sum(col("_c")).over(wCum), lit(0L)))
    val agg = base.groupBy(col(groupCol)).agg(
      sum(col("_c")).cast(d38).as("_n"),
      sum(col("_cp").cast(d38) *
        (lit(2).cast(d38) * col("_before") + col("_c") + 1)).as("_w2"),
      sum(col("_c").cast(d38) * col("_c") * col("_c") - col("_c")).as("_ties"))
    val n = col("_n")
    val varNum = (n * (n + 1) * (lit(2).cast(d38) * n + 1)).cast("double") / 6.0 -
      col("_ties").cast("double") / 12.0
    val z = when(varNum > 0.0,
      (col("_w2").cast("double") - (n * (n + 1)).cast("double") / 2.0) /
        sqrt(varNum))
    agg.select(col(groupCol), n.cast("long").as("n"),
      col("_w2").cast("long").as("w2_pos"), z.as("z"))
  }

  /** One-way ANOVA F per experiment — the k-ARM omnibus test [[welchT]]
    * (two arms) and [[mannWhitneyU]] (two samples) leave open: with k
    * variants, k·(k−1)/2 pairwise t-tests inflate the false-positive
    * rate, so the launch gate asks the omnibus question first ("does
    * ANY arm differ?") and only then drills into pairs (under
    * [[bhCorrect]]/[[holmCorrect]]). F = (SSB/(k−1)) / (SSW/(n−k))
    * from the standard decompositions SSB = Σ_g S_g²/n_g − S²/n and
    * SSW = Σ_g (Sxx_g − S_g²/n_g), computed from the same exact
    * DECIMAL(38,0) per-arm moment sums as [[powerAnalysis]]. Each
    * arm's term is one pinned double over exact integers,
    * floor-quantized at 1e6 fixed point before the cross-arm sum (the
    * [[graft.operators.Curation.jsDivergence]] pattern — a raw double
    * sum over arms would be partition-order-dependent), so the totals
    * replay in any engine (`q_anova_f` via HUGEINT). Experiments with
    * k < 2 arms or zero within-variance surface null F.
    *
    * Output: (expCol, k, n, ssb, ssw, f). */
  def anovaF(df: DataFrame, expCol: String, variantCol: String,
             valueCol: String, scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val d38 = "decimal(38,0)"
    val arm = df.filter(col(valueCol).isNotNull)
      .select(col(expCol), col(variantCol).cast("string").as("_v"),
        floor(col(valueCol) * lit(p)).cast(d38).as("_x"))
      .groupBy(col(expCol), col("_v"))
      .agg(count(lit(1)).cast(d38).as("_n"), sum(col("_x")).as("_sx"),
        sum(col("_x") * col("_x")).as("_sxx"))
    // per-arm contributions as pinned doubles over the exact sums:
    // SSB = Σ S_g²/n_g − S²/n, SSW = Σ (Sxx_g − S_g²/n_g); the Σ terms
    // are floor-quantized at 1e6 fixed point before summing (the
    // jsDivergence pattern) so the totals are partition-independent
    val armTerm = arm.select(col(expCol), col("_n"), col("_sx"), col("_sxx"),
      floor(col("_sx").cast("double") * col("_sx").cast("double") /
        col("_n").cast("double") / lit(p) / lit(p) * lit(1e6)).cast(d38).as("_bfp"),
      floor((col("_sxx").cast("double") -
        col("_sx").cast("double") * col("_sx").cast("double") / col("_n").cast("double"))
        / lit(p) / lit(p) * lit(1e6)).cast(d38).as("_wfp"))
    val agg = armTerm.groupBy(col(expCol)).agg(
      count(lit(1)).as("k"), sum(col("_n")).as("_tn"), sum(col("_sx")).as("_ts"),
      sum(col("_bfp")).as("_sb"), sum(col("_wfp")).as("_sw"))
    val nD = col("_tn").cast("double")
    val grand = col("_ts").cast("double") * col("_ts").cast("double") / nD / lit(p) / lit(p)
    val ssb = col("_sb").cast("double") / lit(1e6) - grand
    val ssw = col("_sw").cast("double") / lit(1e6)
    val f = when(col("k") > 1 && col("_tn").cast("double") > col("k").cast("double") &&
      ssw > 0.0,
      (ssb / (col("k").cast("double") - 1.0)) /
        (ssw / (nD - col("k").cast("double"))))
    agg.select(col(expCol), col("k"), col("_tn").cast("long").as("n"),
      ssb.as("ssb"), ssw.as("ssw"), f.as("f"))
  }

  /** Holm–Bonferroni step-down correction — [[bhCorrect]]'s FWER
    * sibling: controls the probability of ANY false rejection (the
    * right guarantee when a single wrong launch is the disaster, vs
    * BH's false-discovery RATE for screening). Reject the hypotheses
    * ranked 1..k where k+1 is the FIRST rank j whose p(j) exceeds
    * α/(m−j+1) — every comparison is the exact DECIMAL(38,0) integer
    * test p_fp·(m−j+1)·αDen ≤ αNum·10⁹ (the [[bhCorrect]] overflow
    * contract), ties broken by key, so the step-down boundary replays
    * exactly in SQL (`q_holm`). Holm rejections are always a subset of
    * BH's at the same α (spec-pinned). Same hypothesis-table-sized
    * input contract as [[bhCorrect]].
    *
    * Output: (keyCol, p, rank, m, rejected). */
  def holmCorrect(df: DataFrame, keyCol: String, pCol: String,
                  alphaNum: Long = 5L, alphaDen: Long = 100L): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum <= alphaDen,
      s"need 0 < alpha = $alphaNum/$alphaDen <= 1")
    val scale = 1000000000L
    val base = df.filter(col(pCol).isNotNull)
      .select(col(keyCol), col(pCol).cast("double").as("p"),
        floor(col(pCol) * lit(scale.toDouble)).cast("long").as("_pfp"))
    val m = base.count()
    require(m <= 10000000L,
      s"holmCorrect is hypothesis-table-sized; got $m rows (max 1e7)")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_pfp"), col(keyCol))
    val d38 = "decimal(38,0)"
    val ranked = base
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("_ok",
        col("_pfp").cast(d38) * (lit(m) - col("rank") + 1) * lit(alphaDen) <=
          lit(alphaNum).cast(d38) * lit(scale))
    val firstBad = ranked.agg(min(when(!col("_ok"), col("rank")))).head()
    val k = if (firstBad.isNullAt(0)) m else firstBad.getLong(0) - 1L
    ranked.select(col(keyCol), col("p"), col("rank"), lit(m).as("m"),
      (col("rank") <= lit(k)).as("rejected"))
  }

  /** The COMPOSED experiment readout (VERDICT r14 #4) — the full chain
    * a platform's per-release experiment report runs, as one operator
    * the way `lm_bucket_mix`/`snapshot_diff` compose their stages:
    *
    *   1. [[cuped]]'s pooled θ / x̄ per experiment (exact DECIMAL
    *      moments) adjusts every unit's metric,
    *      adj = y − θ·(x − x̄_pooled) (θ degenerate → unadjusted);
    *   2. [[welchT]] on the ADJUSTED metric per experiment (exactly
    *      two arms, enforced loudly) — the variance-reduced contrast;
    *   3. a two-sided normal-approximation p from |t| via the
    *      Abramowitz–Stegun 7.1.26 erfc polynomial (max abs error
    *      1.5e-7 — far inside any launch gate's tolerance; with
    *      thousands of units per arm, t ≈ z), floor-quantized at 1e9
    *      so the gate boundary is integer-exact;
    *   4. [[holmCorrect]] across the experiment family — the FWER
    *      step-down gate (one wrong launch is the disaster, so Holm,
    *      not BH).
    *
    * Exactness: θ/x̄/ρ² are pinned doubles over exact DECIMAL(38,0)
    * moments (the `q_cuped` contract); adj is a fixed IEEE sequence
    * over them, so its ⌊adj·10^scale⌋ quantization replays; the Welch
    * stats are the `q_welch_t` pinned sequence; p rides the erfc
    * polynomial whose only libm call is exp (the `q_ppl_mix` /
    * `q_doremi` precedent: engines agree at the 1e9 quantization).
    * `q_experiment_report` replays the entire chain via HUGEINT.
    *
    * Scale shape: TWO corpus passes (the pooled-moment aggregate, then
    * the adjusted-moment aggregate after a BROADCAST join of the
    * experiment-cardinality θ table) — everything downstream is
    * experiment-cardinality, and the Holm window inherits
    * [[holmCorrect]]'s hypothesis-table-size contract. Experiments
    * whose Welch t is undefined (zero variance) surface null p and a
    * null gate verdict, never entering the family correction.
    *
    * Output: (expCol, variant_a, variant_b, n_a, n_b, mean_adj_a,
    * mean_adj_b, diff_adj, theta, rho2, t, p, rank, m, rejected). */
  def experimentReport(df: DataFrame, expCol: String, variantCol: String,
                       metricCol: String, covariateCol: String,
                       scale: Int = 6,
                       alphaNum: Long = 5L, alphaDen: Long = 100L): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p10 = math.pow(10.0, scale)
    val d38 = "decimal(38,0)"
    val base = df.filter(col(metricCol).isNotNull && col(covariateCol).isNotNull)
      .select(col(expCol), col(variantCol).cast("string").as("_v"),
        col(metricCol).cast("double").as("_yraw"),
        col(covariateCol).cast("double").as("_xraw"))
    // stage 1: pooled CUPED moments → (experiment, theta, rho2, x̄)
    val mom = base.select(col(expCol),
        floor(col("_yraw") * lit(p10)).cast(d38).as("_y"),
        floor(col("_xraw") * lit(p10)).cast(d38).as("_x"))
      .groupBy(col(expCol))
      .agg(count(lit(1)).cast(d38).as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
    val num = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val denx = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val deny = col("_n") * col("_syy") - col("_sy") * col("_sy")
    val pool = mom.select(col(expCol),
      when(denx > 0, num.cast("double") / denx.cast("double")).as("theta"),
      when(denx > 0 && deny > 0, num.cast("double") / denx.cast("double") *
        num.cast("double") / deny.cast("double")).as("rho2"),
      (col("_sx").cast("double") / col("_n").cast("double") / lit(p10)).as("_pxbar"))
    // stage 2: per-unit adjusted metric (broadcast of the tiny θ table)
    val adj = base.join(broadcast(pool), Seq(expCol))
      .withColumn("_adj", col("_yraw") -
        coalesce(col("theta"), lit(0.0)) * (col("_xraw") - col("_pxbar")))
    // stage 3: Welch on the adjusted metric
    val w = welchT(adj, expCol, "_v", "_adj", scale)
    // stage 4: two-sided p ≈ erfc(|t|/√2), A&S 7.1.26, 1e9 fixed point
    val z = abs(col("t")) / lit(1.4142135623730951)
    val u = lit(1.0) / (lit(1.0) + lit(0.3275911) * z)
    val poly = ((((lit(1.061405429) * u - lit(1.453152027)) * u +
      lit(1.421413741)) * u - lit(0.284496736)) * u + lit(0.254829592)) * u
    val pApprox = poly * exp(-z * z)
    val scored = w
      .join(broadcast(pool.select(col(expCol), col("theta"), col("rho2"))), Seq(expCol))
      .withColumn("p",
        when(col("t").isNotNull,
          floor(pApprox * lit(1e9)).cast("long").cast("double") / lit(1e9)))
      .localCheckpoint(true) // experiment-cardinality; holm + join below
    // stage 5: Holm FWER gate across the experiment family
    val gate = holmCorrect(scored.filter(col("p").isNotNull)
        .select(col(expCol), col("p")), expCol, "p", alphaNum, alphaDen)
      .select(col(expCol), col("rank"), col("m"), col("rejected"))
    scored.join(gate, Seq(expCol), "left")
      .select(col(expCol), col("variant_a"), col("variant_b"),
        col("n_a"), col("n_b"), col("mean_a").as("mean_adj_a"),
        col("mean_b").as("mean_adj_b"), col("diff").as("diff_adj"),
        col("theta"), col("rho2"), col("t"), col("p"),
        col("rank"), col("m"), col("rejected"))
  }

  /** Kendall's τ-b per group — the rank-correlation companion to
    * [[spearman]] that reads CONCORDANT/DISCORDANT pair counts instead
    * of rank moments (robust to the same monotone transforms, but its
    * pair semantics match the classic "probability a random pair
    * agrees" reading).
    *
    * Scale contract: raw rows collapse to the quantized JOINT
    * distinct-value table (group, ⌊x·10^scale⌋, ⌊y·10^scale⌋, count) —
    * one aggregate over the corpus — and the pair counting is a
    * self-join of THAT table with a strict `qx` inequality, so the
    * join is NDV²-bounded per group, never row², the [[cramersV]] /
    * [[cliffsDelta]] contract (pick `scale` so per-group joint NDV
    * stays in the thousands; each concordant/discordant unordered pair
    * is counted exactly once because the join orders pairs by qx).
    * Tie corrections n1/n2 come from the marginal distinct tables.
    * Every count is an exact DECIMAL(38,0); only the final
    * τ-b = (C−D)/√(n0−n1)/√(n0−n2) is a pinned double sequence.
    *
    * Output: (groupCol, n, concordant, discordant, tau_b); τ-b null
    * when a denominator term is non-positive (constant margin). */
  def kendallTau(df: DataFrame, groupCol: String, xCol: String, yCol: String,
                 scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val d38 = "decimal(38,0)"
    val joint = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol),
        floor(col(xCol) * lit(p)).cast("long").as("_qx"),
        floor(col(yCol) * lit(p)).cast("long").as("_qy"))
      .groupBy(col(groupCol), col("_qx"), col("_qy"))
      .agg(count(lit(1)).cast(d38).as("_c"))
      .localCheckpoint(true) // three readers below: pair join (twice) + margins
    val a = joint.select(col(groupCol), col("_qx").as("_ax"),
      col("_qy").as("_ay"), col("_c").as("_ca"))
    val b = joint.select(col(groupCol).as("_g2"), col("_qx").as("_bx"),
      col("_qy").as("_by"), col("_c").as("_cb"))
    // strict qx ordering ⇒ each unordered cell pair appears exactly once;
    // same-qx pairs are x-ties and belong to neither C nor D
    val pairs = a.join(b, a(groupCol) === col("_g2") && col("_bx") > col("_ax"))
      .groupBy(a(groupCol))
      .agg(
        sum(when(col("_by") > col("_ay"), col("_ca") * col("_cb"))
          .otherwise(lit(0).cast(d38))).as("_conc"),
        sum(when(col("_by") < col("_ay"), col("_ca") * col("_cb"))
          .otherwise(lit(0).cast(d38))).as("_disc"))
    def tieTerm(qCol: String, out: String) = joint
      .groupBy(col(groupCol), col(qCol))
      .agg(sum(col("_c")).as("_t"))
      .groupBy(col(groupCol))
      .agg((sum(col("_t") * (col("_t") - 1)) / lit(2)).cast(d38).as(out))
    val sizes = joint.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("_n"))
      .withColumn("_n0", (col("_n") * (col("_n") - 1) / lit(2)).cast(d38))
    val g = sizes
      .join(tieTerm("_qx", "_n1"), Seq(groupCol))
      .join(tieTerm("_qy", "_n2"), Seq(groupCol))
      .join(pairs, Seq(groupCol), "left")
    val conc = coalesce(col("_conc"), lit(0).cast(d38))
    val disc = coalesce(col("_disc"), lit(0).cast(d38))
    val denx = (col("_n0") - col("_n1")).cast("double")
    val deny = (col("_n0") - col("_n2")).cast("double")
    g.select(col(groupCol), col("_n").cast("long").as("n"),
      conc.cast("long").as("concordant"), disc.cast("long").as("discordant"),
      when(denx > 0.0 && deny > 0.0,
        (conc - disc).cast("double") / sqrt(denx) / sqrt(deny)).as("tau_b"))
  }

  /** Population Stability Index per feature — the third leg of the
    * release drift gate next to [[snapshotKs]] (distribution shape) and
    * [[graft.operators.Curation.jsDivergence]] (vocabulary): the
    * banking/ML-monitoring standard Σ (p−q)·ln(p/q) over REFERENCE
    * decile bins, with the usual read (< 0.1 stable, 0.1–0.2 watch,
    * > 0.2 drifted).
    *
    * Scale contract: the corpus pass is one melt + partial-agg count
    * per side (the snapshotKs shape); boundary selection, bin
    * assignment and the PSI fold all run on the NDV-bounded distinct-
    * value tables. Bin boundaries are exact reference order statistics
    * (b_k = min q with cum ≥ ⌈k·n/bins⌉, integer arithmetic), bins are
    * Laplace-smoothed ((c+1)/(n+bins) — exact rationals, so empty bins
    * never hit ln 0), and each bin's (p−q)·ln(p/q) ≥ 0 contribution is
    * floored at 10¹² fixed point before the order-free integer total
    * (the jsDivergence convention — `q_psi` replays every bin).
    * Features missing from either side drop (the reference defines the
    * binning).
    *
    * Output: (feature, n_ref, n_cur, psi_fp, psi, drifted). */
  def psiDrift(ref: DataFrame, cur: DataFrame, features: Seq[String],
               bins: Int = 10, scale: Int = 6,
               thresholdFp: Long = 200000000000L): DataFrame = {
    require(features.nonEmpty, "psiDrift needs at least one feature")
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    def melt(df: DataFrame, out: String, zero: String) = features.map(f =>
        df.filter(col(f).isNotNull).select(lit(f).as("feature"),
          floor(col(f).cast("double") * lit(p)).cast("long").as("_q")))
      .reduce(_ unionAll _)
      .groupBy(col("feature"), col("_q"))
      .agg(count(lit(1)).as(out)).withColumn(zero, lit(0L))
    val counts = melt(ref, "c_a", "c_b")
      .unionByName(melt(cur, "c_b", "c_a"))
      .groupBy(col("feature"), col("_q"))
      .agg(sum(col("c_a")).as("c_a"), sum(col("c_b")).as("c_b"))
    psiFromCounts(counts, "feature", bins, thresholdFp)
  }

  /** The PSI core over a pre-aggregated side-by-side histogram —
    * (groupCol, _q, c_a, c_b) with c_a the REFERENCE counts — shared by
    * [[psiDrift]] and the streaming
    * [[graft.streaming.IncrementalStream.psiDriftStream]] tick so the
    * two surfaces cannot diverge (the [[ksTestFromCounts]] pattern).
    * Zero-count rows on either side are fine: reference boundaries see
    * only c_a mass, and Laplace smoothing keeps empty bins finite.
    * Groups with zero reference mass drop (the reference defines the
    * binning). */
  def psiFromCounts(counts: DataFrame, groupCol: String, bins: Int = 10,
                    thresholdFp: Long = 200000000000L): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000], got $bins")
    val h = counts.localCheckpoint(true) // cum window + totals + bin counts
    val totals = h.groupBy(col(groupCol))
      .agg(sum(col("c_a")).as("_n"), sum(col("c_b")).as("_m"))
      .filter(col("_n") > 0L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_q"))
      .rowsBetween(Long.MinValue, 0)
    val cum = h.withColumn("_cum", sum(col("c_a")).over(w))
    val ks = totals.withColumn("_k", explode(sequence(lit(1L), lit(bins - 1L))))
      .withColumn("_rank", expr(s"(_k * _n + ${bins - 1}) DIV $bins"))
    val bounds = cum.join(ks.select(col(groupCol), col("_k"), col("_rank")),
        Seq(groupCol))
      .filter(col("_cum") >= col("_rank"))
      .groupBy(col(groupCol), col("_k")).agg(min(col("_q")).as("_b"))
      .localCheckpoint(true) // both sides' bin assignment reads it
    val binned = h
      .join(bounds, Seq(groupCol)) // (bins-1) boundary rows per distinct q
      .groupBy(col(groupCol), col("_q"), col("c_a"), col("c_b"))
      .agg(sum(when(col("_b") <= col("_q"), 1L).otherwise(0L)).as("_bin"))
      .groupBy(col(groupCol), col("_bin"))
      .agg(sum(col("c_a")).as("_ca0"), sum(col("c_b")).as("_cb0"))
    val grid = totals
      .withColumn("_bin", explode(sequence(lit(0L), lit(bins - 1L))))
    val joined = grid
      .join(binned, Seq(groupCol, "_bin"), "left")
      .withColumn("_ca", coalesce(col("_ca0"), lit(0L)))
      .withColumn("_cb", coalesce(col("_cb0"), lit(0L)))
    val pa = (col("_ca") + lit(1L)).cast("double") /
      (col("_n") + lit(bins.toLong)).cast("double")
    val pb = (col("_cb") + lit(1L)).cast("double") /
      (col("_m") + lit(bins.toLong)).cast("double")
    joined
      .select(col(groupCol), col("_n"), col("_m"),
        floor((pa - pb) * log(pa / pb) * lit(1e12)).cast("long").as("_t"))
      .groupBy(col(groupCol), col("_n"), col("_m"))
      .agg(sum(col("_t")).as("psi_fp"))
      .select(col(groupCol), col("_n").as("n_ref"), col("_m").as("n_cur"),
        col("psi_fp"),
        (col("psi_fp").cast("double") / lit(1e12)).as("psi"),
        (col("psi_fp") > lit(thresholdFp)).as("drifted"))
  }

  /** Paired PERMUTATION test per group (Fisher's sign-flip randomization
    * on paired differences) — the assumption-free companion to
    * [[wilcoxonSignedRank]]: under H₀ each pair's difference is
    * symmetric around 0, so every ±1 sign assignment of the observed
    * |dᵢ| is equally likely; the p-value is the fraction of `reps`
    * replayable sign patterns whose |Σ sᵢdᵢ| reaches the observed |Σ dᵢ|
    * (with the standard +1 add-one correction so p is never 0).
    *
    * Determinism: the sign of pair `i` in rep `r` is a middle bit of
    * the multiplicative hash (id·2654435761 + r·40503) mod 2³² — the
    * repo's LCG family, integer-exact in any engine, so every one of
    * the reps·n signs replays externally. Differences arrive
    * PRE-QUANTIZED as longs (the [[wilcoxonSignedRank]] input
    * convention), so every replicate statistic is an exact
    * DECIMAL(38,0) sum; only the final p = extreme/(reps+1) divides.
    *
    * Scale: the explode is reps rows per pair, but partial aggregation
    * combines map-side — the shuffle carries groups × reps rows, never
    * n × reps; `reps` is capped to keep the blow-up explicit.
    *
    * Output: (groupCol, n, t_obs, n_extreme, p) — n_extreme INCLUDES
    * the +1 correction. */
  def permutationTestPaired(df: DataFrame, groupCol: String, idCol: String,
                            dCol: String, reps: Int = 199): DataFrame = {
    require(reps >= 19 && reps <= 9999, s"reps must be in [19, 9999], got $reps")
    val d38 = "decimal(38,0)"
    val base = df.filter(col(dCol).isNotNull)
      .select(col(groupCol), col(idCol).cast("long").as("_i"),
        col(dCol).cast("long").as("_d"))
      .localCheckpoint(true) // the observed pass + the reps explode both read it
    val obs = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("_d").cast(d38)).as("_tobs"))
    val h = pmod(col("_i") * lit(2654435761L) + col("_r") * lit(40503L),
      lit(4294967296L))
    val sign = when(pmod(floor(h / lit(65536L)), lit(2L)) === 0L, lit(1L))
      .otherwise(lit(-1L))
    val ts = base
      .withColumn("_r", explode(sequence(lit(0), lit(reps - 1))))
      .groupBy(col(groupCol), col("_r"))
      .agg(sum((sign * col("_d")).cast(d38)).as("_t"))
    ts.join(obs, Seq(groupCol))
      .groupBy(col(groupCol), col("n"), col("_tobs"))
      .agg((sum(when(abs(col("_t")) >= abs(col("_tobs")), 1L).otherwise(0L)) + 1L)
        .as("n_extreme"))
      .select(col(groupCol), col("n"), col("_tobs").cast("long").as("t_obs"),
        col("n_extreme"),
        (col("n_extreme").cast("double") / lit((reps + 1).toDouble)).as("p"))
  }
}
