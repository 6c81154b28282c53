package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics at corpus scale — the offline-eval pass a
  * training pipeline runs after every retrieval / classifier / reward
  * model change. Every metric is one partial-aggregated pass (plus a
  * group-local rank where ranking IS the semantics); every fractional
  * output is either an exact integer or a pinned double computed from
  * exact integer sums, so an external engine replays them bit-for-bit.
  */
object Evaluation {

  /** Fixed-point discount gains for DCG: gain(rank) =
    * ⌊10¹² / log₂(rank+1)⌋, precomputed HERE (driver-side, once) and
    * inlined as literals on both the Spark side and the oracle side —
    * the two engines never each evaluate `log2`, so libm last-ulp
    * differences can't split them. */
  def ndcgGains(k: Int): IndexedSeq[Long] =
    (1 to k).map(r => math.floor(1e12 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** Prefix sums of [[ndcgGains]]: ideal DCG when the group holds
    * exactly `i` relevant items (i = 1..k). */
  def ndcgIdealPrefix(k: Int): IndexedSeq[Long] =
    ndcgGains(k).scanLeft(0L)(_ + _).tail

  /** Ranked-retrieval evaluation: NDCG@k, MRR, precision@k and recall@k
    * per query, over a (query, item, score, relevant) table — the
    * "did the new ranker actually rank better" readout.
    *
    * Ranking is rank-by-(score DESC, item ASC) WITHIN each query — a
    * group-local sort, the one place a window is the semantics. A query
    * group is one ranked result list (10²–10⁴ rows), so the per-group
    * sort never concentrates the corpus in one task; the metric rollup
    * after it is an ordinary partial aggregate.
    *
    * Determinism: binary relevance; DCG/IDCG are integer sums of the
    * [[ndcgGains]] literals (order-independent long adds); MRR's
    * reciprocal is the integer `10¹² DIV first_rel_rank`. The only
    * doubles are final pinned divisions of those integers.
    *
    * Output per query: (queryCol, n, n_rel, hits_k, first_rel_rank,
    * rr_fp, dcg_fp, idcg_fp, ndcg, precision_k, recall_k). A query with
    * no relevant item keeps NULL first_rel_rank/rr_fp/ndcg/recall_k —
    * it has no ideal ranking to compare against. */
  def rankedEval(df: DataFrame, queryCol: String, itemCol: String,
                 scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val gains = ndcgGains(k)
    val ideal = ndcgIdealPrefix(k)
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(itemCol).asc)
    val ranked = df.select(col(queryCol), col(itemCol), col(scoreCol),
        col(relCol).cast("boolean").as("_rel"))
      .withColumn("_rank", row_number().over(w))
    val inK = col("_rank") <= k
    val grp = ranked.groupBy(col(queryCol)).agg(
      count(lit(1)).as("n"),
      sum(when(col("_rel"), 1L).otherwise(0L)).as("n_rel"),
      sum(when(col("_rel") && inK, 1L).otherwise(0L)).as("hits_k"),
      min(when(col("_rel"), col("_rank").cast("long"))).as("first_rel_rank"),
      sum(when(col("_rel") && inK,
        element_at(typedLit(gains), col("_rank"))).otherwise(0L)).as("dcg_fp"))
    grp.select(col(queryCol), col("n"), col("n_rel"), col("hits_k"),
        col("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          expr("1000000000000 DIV first_rel_rank")).as("rr_fp"),
        col("dcg_fp"),
        when(col("n_rel") > 0,
          element_at(typedLit(ideal), least(col("n_rel"), lit(k.toLong)).cast("int")))
          .as("idcg_fp"))
      .withColumn("ndcg", when(col("idcg_fp").isNotNull,
        col("dcg_fp").cast("double") / col("idcg_fp").cast("double")))
      .withColumn("precision_k", col("hits_k").cast("double") / lit(k.toDouble))
      .withColumn("recall_k", when(col("n_rel") > 0,
        col("hits_k").cast("double") / col("n_rel").cast("double")))
  }

  /** ROC AUC per group via the Mann-Whitney rank-sum, tie-aware, in
    * histogram shape: the corpus-sized pass is ONE partial aggregate to
    * (group, score) → (n_pos, n_neg); the rank arithmetic then runs on
    * the DISTINCT-SCORE table (bounded by score cardinality, not row
    * count — for quantized model scores, thousands of rows where the
    * corpus has billions). AUC = P(score⁺ > score⁻) + ½·P(tie),
    * accumulated exactly: auc_num2 = Σ_scores n_pos·(2·neg_below +
    * neg_same) — an integer, so the only double is the final pinned
    * division by 2·P·N.
    *
    * Output: (groupCol, n_pos, n_neg, auc_num2, auc); auc NULL when a
    * group lacks both classes. Null-scored rows are excluded up front —
    * a null score has no rank position (and engines disagree on where
    * nulls sort), so it must not move the statistic. */
  def rocAuc(df: DataFrame, groupCol: String, scoreCol: String,
             labelCol: String): DataFrame = {
    val perScore = df
      .filter(col(scoreCol).isNotNull)
      .select(col(groupCol), col(scoreCol).as("_s"),
        col(labelCol).cast("boolean").as("_y"))
      .groupBy(col(groupCol), col("_s"))
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("_np"),
        sum(when(col("_y"), 0L).otherwise(1L)).as("_nn"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore.withColumn("_cumn", sum(col("_nn")).over(w))
    cum.groupBy(col(groupCol)).agg(
        sum(col("_np")).as("n_pos"),
        sum(col("_nn")).as("n_neg"),
        sum(col("_np") * (lit(2L) * (col("_cumn") - col("_nn")) + col("_nn")))
          .as("auc_num2"))
      .withColumn("auc", when(col("n_pos") > 0 && col("n_neg") > 0,
        col("auc_num2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double"))))
  }

  /** Per-class precision / recall / F1 from a (truth, prediction)
    * table — the confusion-matrix rollup for any labeler (langid,
    * quality classifier, …). The corpus-sized pass is the single
    * groupBy(truth, pred) count; marginals and the class list (the
    * UNION of truth and predicted labels, so a never-predicted class
    * still reports recall and a spurious prediction still reports
    * precision) are label-cardinality-sized derivations from it.
    *
    * Doubles are pinned divisions of exact counts; F1 = 2·p·r/(p+r)
    * with that exact tree. A class with no predictions has NULL
    * precision (0/0); with no truth rows, NULL recall; F1 is NULL
    * unless both are defined and p+r > 0.
    *
    * Output: (label, n_true, n_pred, tp, precision, recall, f1). */
  def classifierEval(df: DataFrame, truthCol: String, predCol: String): DataFrame = {
    val conf = df.select(col(truthCol).cast("string").as("_t"),
        col(predCol).cast("string").as("_p"))
      .groupBy(col("_t"), col("_p")).agg(count(lit(1)).as("_n"))
      .localCheckpoint(true) // label-cardinality rows; 3 readers below
    val truthN = conf.groupBy(col("_t").as("label")).agg(sum(col("_n")).as("n_true"))
    val predN = conf.groupBy(col("_p").as("label")).agg(sum(col("_n")).as("n_pred"))
    val tp = conf.filter(col("_t") === col("_p"))
      .select(col("_t").as("label"), col("_n").as("tp"))
    val base = truthN.join(predN, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left_outer")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
    val p = when(col("n_pred") > 0, col("tp").cast("double") / col("n_pred").cast("double"))
    val r = when(col("n_true") > 0, col("tp").cast("double") / col("n_true").cast("double"))
    base.withColumn("precision", p).withColumn("recall", r)
      .withColumn("f1", when(p.isNotNull && r.isNotNull && (p + r) > 0.0,
        lit(2.0) * p * r / (p + r)))
  }

  /** Cohen's kappa — chance-corrected agreement between TWO labelers
    * over the same items (annotator QA for preference/label data, or
    * "how far beyond chance does our classifier agree with gold"). The
    * corpus-sized pass is ONE groupBy(group, a, b) count; marginals and
    * the diagonal are label²-cardinality derivations from it.
    *
    * Exactness: kappa = (po−pe)/(1−pe) with po = agree/n and
    * pe = Σ_k row_k·col_k / n² reduces to the single integer-ratio
    * (n·agree − Σrow·col) / (n² − Σrow·col); products run in
    * DECIMAL(38,0) so a 10¹¹-row group can't overflow. The only doubles
    * are final pinned divisions. kappa is NULL when the denominator is
    * 0 (both raters constant — chance explains everything).
    *
    * Output per group: (groupCol, n, agree, pe_num [=Σrow·col], po, pe,
    * kappa). */
  def cohenKappa(df: DataFrame, groupCol: String, aCol: String,
                 bCol: String): DataFrame = {
    val conf = df.select(col(groupCol), col(aCol).cast("string").as("_a"),
        col(bCol).cast("string").as("_b"))
      .groupBy(col(groupCol), col("_a"), col("_b"))
      .agg(count(lit(1)).as("_n"))
      .localCheckpoint(true) // label²-cardinality rows; 3 readers below
    val rowm = conf.groupBy(col(groupCol), col("_a").as("_k"))
      .agg(sum(col("_n")).as("_rn"))
    val colm = conf.groupBy(col(groupCol), col("_b").as("_k"))
      .agg(sum(col("_n")).as("_cn"))
    val pe = rowm.join(colm, Seq(groupCol, "_k"))
      .groupBy(col(groupCol))
      .agg(sum(col("_rn").cast("decimal(38,0)") * col("_cn")).as("pe_num"))
    val base = conf.groupBy(col(groupCol))
      .agg(sum(col("_n")).as("n"),
        sum(when(col("_a") === col("_b"), col("_n")).otherwise(0L)).as("agree"))
    val n2 = col("n").cast("decimal(38,0)") * col("n")
    base.join(pe, Seq(groupCol))
      .withColumn("po", col("agree").cast("double") / col("n").cast("double"))
      .withColumn("pe", (col("pe_num").cast("double") + 0.0) /
        (n2.cast("double") + 0.0))
      .withColumn("kappa", when(n2 =!= col("pe_num"),
        (col("n").cast("decimal(38,0)") * col("agree") - col("pe_num")).cast("double") /
          (n2 - col("pe_num")).cast("double")))
  }

  /** McNemar's test per group — the PAIRED model comparison: two
    * classifiers judged on the SAME examples (the standard model-eval
    * situation, where the independent-proportions z-test is wrong
    * because the errors correlate through the shared inputs). Only the
    * DISCORDANT pairs carry evidence: with b = A-right/B-wrong and
    * c = A-wrong/B-right, χ² = (b − c)²/(b + c) on 1 df. All four
    * cell counts are exact integers from one aggregation pass; χ² is
    * a pinned double over them (`q_mcnemar` replays it), NULL when no
    * discordant pairs exist (the models are indistinguishable on this
    * data — no evidence, not χ² = 0).
    *
    * Output: (groupCol, n, both_right, a_only, b_only, neither, chi2). */
  def mcnemar(df: DataFrame, groupCol: String, aCorrectCol: String,
              bCorrectCol: String): DataFrame = {
    val a = col(aCorrectCol).cast("boolean")
    val b = col(bCorrectCol).cast("boolean")
    df.filter(a.isNotNull && b.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(a && b, 1L).otherwise(0L)).as("both_right"),
        sum(when(a && !b, 1L).otherwise(0L)).as("a_only"),
        sum(when(!a && b, 1L).otherwise(0L)).as("b_only"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("neither"))
      .withColumn("chi2", when(col("a_only") + col("b_only") > 0,
        ((col("a_only") - col("b_only")).cast("decimal(38,0)") *
          (col("a_only") - col("b_only"))).cast("double") /
          (col("a_only") + col("b_only")).cast("double")))
  }

  /** Gwet's AC1 — the prevalence-robust alternative to [[cohenKappa]]:
    * on imbalanced label distributions kappa collapses toward 0 even
    * at near-perfect observed agreement (the "kappa paradox"), because
    * its chance term rewards marginal imbalance; AC1's chance term
    * P_e = Σ_c π_c(1−π_c)/(C−1) with π_c = (rowMarg_c + colMarg_c)/2n
    * instead PENALIZES concentration, so a 95%-one-class rater pair
    * with 95% agreement scores high, as it should.
    *
    * Exactness: same one confusion pass as kappa; per-category
    * marginals meet in a full-outer category rollup; the P_e numerator
    * Σ(rn_c + cn_c)·(2n − rn_c − cn_c) and its 4n²(C−1) denominator
    * are exact DECIMAL(38,0) integers, P_o/P_e/AC1 pinned doubles over
    * them (`q_gwet_ac1` replays via HUGEINT). Degenerate groups (one
    * category, or P_e = 1) surface null ac1.
    *
    * Rows with a NULL rating on either side are DROPPED up front
    * (ADVICE r14): the marginal rollup meets row/col counts in an
    * equi-join on the category, and a null category never matches
    * itself — one null label would otherwise split into two `_tc`
    * rows, inflating n_cats and skewing P_e. "No rating" is not a
    * category; raters abstaining belongs upstream of an agreement
    * statistic.
    *
    * Output: (groupCol, n, agree, n_cats, po, pe, ac1). */
  def gwetAC1(df: DataFrame, groupCol: String, aCol: String,
              bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val conf = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(groupCol), col(aCol).cast("string").as("_a"),
        col(bCol).cast("string").as("_b"))
      .groupBy(col(groupCol), col("_a"), col("_b"))
      .agg(count(lit(1)).as("_n"))
      .localCheckpoint(true) // label²-cardinality rows; 3 readers below
    val rowm = conf.groupBy(col(groupCol), col("_a").as("_k"))
      .agg(sum(col("_n")).as("_rn"))
    val colm = conf.groupBy(col(groupCol), col("_b").as("_k"))
      .agg(sum(col("_n")).as("_cn"))
    val cats = rowm.join(colm, Seq(groupCol, "_k"), "full_outer")
      .select(col(groupCol),
        (coalesce(col("_rn"), lit(0L)).cast(d38) +
          coalesce(col("_cn"), lit(0L))).as("_tc"))
    val base = conf.groupBy(col(groupCol))
      .agg(sum(col("_n")).as("n"),
        sum(when(col("_a") === col("_b"), col("_n")).otherwise(0L)).as("agree"))
    val peAgg = cats.join(base.select(col(groupCol), col("n").as("_bn")), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_cats"),
        sum(col("_tc") * (lit(2).cast(d38) * col("_bn") - col("_tc"))).as("_s"))
    val out = base.join(peAgg, Seq(groupCol))
    val peDen = lit(4).cast(d38) * col("n") * col("n") * (col("n_cats") - 1)
    val po = col("agree").cast("double") / col("n").cast("double")
    val pe = when(col("n_cats") > 1, col("_s").cast("double") / peDen.cast("double"))
    out.select(col(groupCol), col("n"), col("agree"), col("n_cats"),
      po.as("po"), pe.as("pe"),
      when(pe.isNotNull && peDen =!= col("_s"),
        (po - pe) / (lit(1.0) - pe)).as("ac1"))
  }

  /** Fleiss' kappa — chance-corrected agreement for m ≥ 2 raters per
    * item, over (item, category) rating rows (one row per individual
    * rating). Uses the variable-rater generalization: with n_ic the
    * count of raters giving item i category c, m_i = Σ_c n_ic,
    *   P̄  = Σ_i (Σ_c n_ic² − m_i) / Σ_i m_i(m_i−1)
    *   P̄e = Σ_c (Σ_i n_ic)² / (Σ_i m_i)²
    * kappa = (P̄−P̄e)/(1−P̄e) — which reduces to the constant-m Fleiss
    * formula when every item has the same rater count, and stays
    * well-defined on ragged panels. Items with m_i < 2 contribute
    * marginals but no agreement mass (0/0 of a single rating).
    *
    * Shape: ONE corpus pass to (item, category) counts; per-item and
    * per-category rollups are item- and category-cardinality aggs.
    * All numerators/denominators are exact DECIMAL(38,0) sums of
    * integers; kappa is one pinned division, NULL when chance explains
    * everything (denominator 0).
    *
    * Output (single row): (n_items, n_ratings, a_num, d_num, s_num,
    * pbar, pbar_e, kappa). */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String): DataFrame = {
    val cnt = df.select(col(itemCol).as("_i"), col(catCol).cast("string").as("_c"))
      .groupBy(col("_i"), col("_c")).agg(count(lit(1)).as("_n"))
      .localCheckpoint(true) // item×category rows; 2 readers below
    val perItem = cnt.groupBy(col("_i"))
      .agg(sum(col("_n").cast("decimal(38,0)") * col("_n")).as("_sq"),
        sum(col("_n")).as("_m"))
    val itemAgg = perItem.agg(
      count(lit(1)).as("n_items"),
      sum(col("_m")).as("n_ratings"),
      sum(col("_sq") - col("_m")).as("a_num"),
      sum(col("_m").cast("decimal(38,0)") * (col("_m") - 1)).as("d_num"))
    val catAgg = cnt.groupBy(col("_c")).agg(sum(col("_n")).as("_cc"))
      .agg(sum(col("_cc").cast("decimal(38,0)") * col("_cc")).as("s_num"))
    val t2 = col("n_ratings").cast("decimal(38,0)") * col("n_ratings")
    itemAgg.crossJoin(broadcast(catAgg))
      .withColumn("pbar", when(col("d_num") > 0,
        col("a_num").cast("double") / col("d_num").cast("double")))
      .withColumn("pbar_e", (col("s_num").cast("double") + 0.0) /
        (t2.cast("double") + 0.0))
      // kappa = (A·T² − D·S) / (D·(T² − S)), exact decimal until the
      // final division
      .withColumn("kappa", {
        val den = col("d_num") * (t2 - col("s_num"))
        when(col("d_num") > 0 && den =!= lit(0).cast("decimal(38,0)"),
          (col("a_num") * t2 - col("d_num") * col("s_num")).cast("double") /
            den.cast("double"))
      })
  }

  /** ROUGE-L per (candidate, reference) pair — the LCS-based summary/
    * generation eval [[ngramOverlap]]'s fixed-n grams cannot express:
    * the longest common SUBSEQUENCE rewards in-order content with
    * arbitrary gaps, so reorderings score lower than omissions.
    * P = LCS/|cand|, R = LCS/|ref|, F = 2PR/(P+R) (β = 1).
    *
    * Execution: the O(n·m) two-row DP is a per-document sequential
    * fold — the documented mapPartitions exception class (media decode
    * / Viterbi walkers) — over NORMALIZED whitespace tokens truncated
    * to `maxTokens` per side, so a row costs at most maxTokens² cell
    * updates and the operator stays embarrassingly row-parallel: no
    * shuffle, no state, scan → scan. The three ratios are pinned
    * double divisions over the exact integer (lcs, n_cand, n_ref)
    * (`q_rouge_l`'s oracle pins LCS through two closed-form families:
    * a constructed subsequence forcing LCS = |cand| for the match
    * diagonal, and a distinct-token block swap forcing
    * LCS = n − ⌊n/2⌋ < |cand| so the else/max recurrence branch is
    * oracle-checked too; adversarial free-form cases remain
    * spec-pinned goldens).
    *
    * Output: (idCol, lcs, n_cand, n_ref, rouge_l_p, rouge_l_r,
    * rouge_l_f) — ratios NULL when a side is empty. */
  def rougeL(df: DataFrame, candCol: String, refCol: String, idCol: String,
             maxTokens: Int = 1024): DataFrame = {
    require(maxTokens >= 1 && maxTokens <= 8192,
      s"maxTokens must be in [1, 8192] (the DP is maxTokens^2 per row), got $maxTokens")
    def toks(c: String) = slice(filter(
      split(graft.functions.TextFunctions.normalizeForFingerprint(
        coalesce(col(c), lit(""))), " "), t => length(t) > 0), 1, maxTokens)
    val prepared = df.select(col(idCol), toks(candCol).as("_c"), toks(refCol).as("_r"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      prepared.schema.head,
      org.apache.spark.sql.types.StructField("lcs", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_cand", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_ref", org.apache.spark.sql.types.LongType, nullable = false)))
    val counted = prepared.mapPartitions { it =>
      it.map { row =>
        val a = row.getSeq[String](1).toArray
        val b = row.getSeq[String](2).toArray
        val (n, m) = (a.length, b.length)
        val prev = new Array[Int](m + 1)
        val cur = new Array[Int](m + 1)
        var i = 0
        while (i < n) {
          var j = 0
          while (j < m) {
            cur(j + 1) =
              if (a(i) == b(j)) prev(j) + 1
              else math.max(prev(j + 1), cur(j))
            j += 1
          }
          System.arraycopy(cur, 0, prev, 0, m + 1)
          i += 1
        }
        org.apache.spark.sql.Row(row.get(0), prev(m).toLong, n.toLong, m.toLong)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    val p = when(col("n_cand") > 0, col("lcs").cast("double") / col("n_cand").cast("double"))
    val r = when(col("n_ref") > 0, col("lcs").cast("double") / col("n_ref").cast("double"))
    counted
      .withColumn("rouge_l_p", p)
      .withColumn("rouge_l_r", r)
      .withColumn("rouge_l_f",
        when(p.isNotNull && r.isNotNull && (p + r) > 0.0,
          lit(2.0) * p * r / (p + r)).otherwise(
          when(p.isNotNull && r.isNotNull, lit(0.0))))
  }

  /** Krippendorff's alpha (nominal) — the reliability coefficient for
    * annotation tables with MISSING ratings, which [[fleissKappa]]
    * cannot weight correctly: raters overlap on some items and skip
    * others (the normal state of a labeling queue), and alpha's
    * item-level 1/(mᵢ−1) pair weighting plus its (T−1) expected-
    * disagreement denominator are exactly the corrections for that.
    * Items with fewer than 2 ratings carry no pairable information and
    * drop (the published algorithm's rule). α = 1 − D_o/D_e with
    *   D_o = (1/T)·Σᵢ [mᵢ(mᵢ−1) − Σ_c mᵢc(mᵢc−1)] / (mᵢ−1),
    *   D_e = (T² − Σ_c n_c²) / (T(T−1)).
    *
    * Exactness: the only non-integer step, the per-item /(mᵢ−1), is
    * floor-quantized at 1e9 fixed point (the [[WeakSupervision]]
    * integer-weights pattern) — engine-exact; every other sum is an
    * exact integer (DECIMAL(38,0) where products can exceed int64),
    * and D_o/D_e/α are pinned double sequences over those integers
    * (`q_krippendorff` replays via HUGEINT `//`). Ratings per item are
    * asserted ≤ 30000 so the fixed-point product stays in int64 — far
    * above any real annotation fan-out, far below corpus scale.
    *
    * Shape: one (item, value) count shuffle, a co-partitioned per-item
    * aggregate, then two scalar aggregates (items / value marginals) —
    * the exchange carries distinct (item, value) rows, never ratings.
    *
    * Output (one row): (n_items, n_ratings, d_o, d_e, alpha); alpha is
    * NULL when every pairable rating agrees on one value (D_e = 0). */
  def krippendorffAlpha(df: DataFrame, itemCol: String, valueCol: String): DataFrame = {
    val scale = 1000000000L
    val d38 = "decimal(38,0)"
    val cnt = df.filter(col(valueCol).isNotNull)
      .select(col(itemCol).as("_i"), col(valueCol).cast("string").as("_v"))
      .groupBy(col("_i"), col("_v")).agg(count(lit(1)).as("_c"))
      .localCheckpoint(true) // two readers: per-item aggs + value marginals
    val perItem = cnt.groupBy(col("_i"))
      .agg(sum(col("_c")).as("_m"),
        sum(col("_c") * (col("_c") - 1)).as("_eq"))
      .filter(col("_m") >= 2)
      .localCheckpoint(true) // two readers: D_o sum + the marginal semi-join
    val oversized = perItem.filter(col("_m") > 30000L).limit(1).count()
    require(oversized == 0L,
      "krippendorffAlpha: an item has > 30000 ratings — fixed-point D_o would overflow int64")
    val items = perItem
      .select(expr(s"((_m * (_m - 1) - _eq) * ${scale}L) div (_m - 1)").as("_fp"),
        col("_m"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("_m")).cast(d38).as("_t"),
        sum(col("_fp").cast(d38)).as("_dofp"))
    val marg = cnt.join(perItem.select(col("_i")), Seq("_i"), "left_semi")
      .groupBy(col("_v")).agg(sum(col("_c")).as("_nc"))
      .agg(coalesce(sum(col("_nc").cast(d38) * col("_nc")),
        lit(0).cast(d38)).as("_s"))
    val t = col("_t")
    val dO = col("_dofp").cast("double") / (t.cast("double") * lit(scale.toDouble))
    val dE = (t * t - col("_s")).cast("double") / (t * (t - 1)).cast("double")
    items.crossJoin(broadcast(marg))
      .select(col("n_items"), t.cast("long").as("n_ratings"),
        when(t >= 2, dO).as("d_o"),
        when(t >= 2, dE).as("d_e"),
        when(t >= 2 && (t * t - col("_s")) > 0, lit(1.0) - dO / dE).as("alpha"))
  }

  /** Corpus-level n-gram overlap between a candidate and a reference
    * text column — the shared machinery of BLEU (clipped precision) and
    * ROUGE-N (recall): per n = 1..maxN, matches = Σ_docs Σ_grams
    * min(count_cand, count_ref), micro-averaged over the corpus.
    *
    * Shape: tokenize once per side, explode gram STARTS (sequence +
    * slice + concat_ws — no higher-order lambdas, everything codegen'd,
    * same idiom as [[Dedup.duplicateSpanScrub]]), count per (doc, n,
    * gram), and inner-join candidate↔reference counts on (doc, n,
    * gram) — a co-partitioned join whose shuffle carries gram-count
    * rows (≤ maxN·tokens), never text. Gram identity is the gram
    * STRING, not a hash — no collision caveat, and an external engine
    * replays it exactly. Totals come from token lengths alone.
    *
    * Output per n: (n, matches, cand_ngrams, ref_ngrams, precision_n,
    * recall_n) — exact longs and two pinned divisions (NULL when the
    * respective side has no n-grams). */
  def ngramOverlap(df: DataFrame, candCol: String, refCol: String,
                   idCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val toks = df.select(col(idCol).as("_id"),
      split(graft.functions.TextFunctions.normalizeForFingerprint(col(candCol)), " ").as("_cw"),
      split(graft.functions.TextFunctions.normalizeForFingerprint(col(refCol)), " ").as("_rw"))
    def gramCounts(wCol: String, out: String): DataFrame = toks
      .select(col("_id"), col(wCol).as("_w"),
        explode(typedLit((1 to maxN).toList)).as("n"))
      .select(col("_id"), col("n"), col("_w"),
        explode(when(size(col("_w")) >= col("n"),
            sequence(lit(1), size(col("_w")) - col("n") + 1))
          .otherwise(array().cast("array<int>"))).as("_i"))
      .select(col("_id"), col("n"),
        concat_ws(" ", slice(col("_w"), col("_i"), col("n"))).as("_g"))
      .groupBy(col("_id"), col("n"), col("_g"))
      .agg(count(lit(1)).as(out))
    val matches = gramCounts("_cw", "_cc").join(gramCounts("_rw", "_rc"),
        Seq("_id", "n", "_g"))
      .groupBy(col("n"))
      .agg(sum(least(col("_cc"), col("_rc"))).as("matches"))
    // totals need only the lengths: Σ max(len − n + 1, 0) per n
    val totals = toks
      .select(size(col("_cw")).as("_cl"), size(col("_rw")).as("_rl"),
        explode(typedLit((1 to maxN).toList)).as("n"))
      .groupBy(col("n"))
      .agg(sum(greatest(col("_cl") - col("n") + 1, lit(0)).cast("long")).as("cand_ngrams"),
        sum(greatest(col("_rl") - col("n") + 1, lit(0)).cast("long")).as("ref_ngrams"))
    totals.join(matches, Seq("n"), "left_outer")
      .select(col("n"), coalesce(col("matches"), lit(0L)).as("matches"),
        col("cand_ngrams"), col("ref_ngrams"))
      .withColumn("precision_n", when(col("cand_ngrams") > 0,
        col("matches").cast("double") / col("cand_ngrams").cast("double")))
      .withColumn("recall_n", when(col("ref_ngrams") > 0,
        col("matches").cast("double") / col("ref_ngrams").cast("double")))
  }

  /** Corpus BLEU-4 summary from [[ngramOverlap]] output (maxN must have
    * been 4): one row with token totals, the four clipped precisions,
    * the brevity penalty, and bleu = BP·(p₁p₂p₃p₄)^¼.
    *
    * Determinism: the geometric mean is sqrt(sqrt(·)) — IEEE
    * correctly-rounded on every engine, unlike pow/exp. The brevity
    * penalty exp(1 − r/c) is the one genuinely libm-dependent term, so
    * `bleu` is rounded to 9 decimals (+0.0 to fold −0.0) — last-ulp
    * libm differences vanish; bp itself ships unrounded for callers who
    * want the raw factor. bleu = 0 when any pₙ is 0 (standard unsmoothed
    * corpus BLEU), NULL when the candidate side is empty. */
  def bleuSummary(overlap: DataFrame): DataFrame = {
    def at(c: String, n: Int) = max(when(col("n") === n, col(c)))
    val wide = overlap.agg(
      at("cand_ngrams", 1).as("cand_tokens"),
      at("ref_ngrams", 1).as("ref_tokens"),
      at("matches", 1).as("m1"), at("matches", 2).as("m2"),
      at("matches", 3).as("m3"), at("matches", 4).as("m4"),
      at("precision_n", 1).as("p1"), at("precision_n", 2).as("p2"),
      at("precision_n", 3).as("p3"), at("precision_n", 4).as("p4"))
    val bp = when(col("cand_tokens") >= col("ref_tokens"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("ref_tokens").cast("double") /
        col("cand_tokens").cast("double")))
    wide.withColumn("bp", when(col("cand_tokens") > 0, bp))
      .withColumn("bleu", when(col("cand_tokens") > 0,
        when(col("p1") > 0.0 && col("p2") > 0.0 && col("p3") > 0.0 && col("p4") > 0.0,
          round(col("bp") * sqrt(sqrt(col("p1") * col("p2") * col("p3") * col("p4"))), 9) + 0.0)
          .otherwise(0.0)))
  }

  /** Calibration-bin report (the per-bin view behind expected
    * calibration error): predicted probabilities bucketed into `bins`
    * equal-width bins, each bin reporting exact counts, the fixed-point
    * confidence sum, and the integer calibration gap
    * |Σconf_fp − n_pos·scale| — so ECE = Σ gap_fp / (N·scale) is a
    * ratio of exact integers computable downstream without revisiting
    * the corpus. ONE partial-aggregated pass; state is groups × bins.
    *
    * Binning is ⌊prob·bins⌋ clamped to bins−1 (prob 1.0 joins the top
    * bin). A below-range probability surfaces as a NEGATIVE bin row
    * rather than being silently folded into bin 0 — a mis-scaled score
    * column shows up in the report instead of corrupting it.
    * Determinism: prob·bins is a single IEEE multiply of the stored
    * double — identical on any engine evaluating the same tree.
    *
    * Output: (groupCol, bin, n, n_pos, conf_fp, gap_fp, avg_conf,
    * accuracy), avg_conf / accuracy pinned doubles. */
  def calibrationBins(df: DataFrame, groupCol: String, probCol: String,
                      labelCol: String, bins: Int = 10,
                      scale: Long = 1000000000L): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000], got $bins")
    val bin = least(floor(col(probCol) * lit(bins.toDouble)).cast("long"),
      lit(bins - 1L))
    df.select(col(groupCol), bin.as("bin"),
        col(labelCol).cast("boolean").as("_y"),
        floor(col(probCol) * lit(scale.toDouble)).cast("long").as("_cfp"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("_cfp")).as("conf_fp"))
      .withColumn("gap_fp", abs(col("conf_fp") - col("n_pos") * lit(scale)))
      .withColumn("avg_conf",
        col("conf_fp").cast("double") / col("n").cast("double") / lit(scale.toDouble))
      .withColumn("accuracy", col("n_pos").cast("double") / col("n").cast("double"))
  }

  /** Split-conformal prediction gate (Vovk et al. 2005; Angelopoulos &
    * Bates 2023 §3): from a CALIBRATION set of nonconformity scores,
    * the (1−α) conformal threshold is the ⌈(n+1)(1−α)⌉-th smallest
    * calibration score; a test point whose score exceeds it is flagged
    * non-conforming, with the finite-sample guarantee that a conforming
    * point is wrongly flagged with probability ≤ α. The curation use:
    * a distribution-drift gate — calibrate on last week's quality /
    * perplexity scores, flag today's outliers with a calibrated false
    * positive rate instead of an eyeballed cutoff.
    *
    * Exactness: α is the rational `alphaNum/alphaDen`, the rank is the
    * integer ⌈(n+1)·(alphaDen−alphaNum) / alphaDen⌉ (left-assoc integer
    * math), and the threshold is the rank-th ORDER STATISTIC of the
    * calibration scores — a distributed TakeOrdered(k), never a full
    * sort (the [[graft.operators.LanguageModel.qualityBuckets]]
    * boundary pattern; same ≤ Int.MaxValue-rank cap, same
    * `approx_percentile` escape hatch at larger calibration sets). The
    * test pass is then one stateless comparison scan. If the rank
    * exceeds n (α too small for the calibration size), every test row
    * conforms — the standard conformal convention, mirrored by the
    * oracle via a null threshold.
    *
    * Output: `test` plus (threshold, conforming). */
  def conformalFlag(calib: DataFrame, calibScoreCol: String,
                    test: DataFrame, testScoreCol: String,
                    alphaNum: Long = 5L, alphaDen: Long = 100L): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"need 0 < alpha = $alphaNum/$alphaDen < 1")
    val s = calib.select(col(calibScoreCol).cast("double").as("_s"))
      .filter(col("_s").isNotNull)
    val n = s.count()
    val k = ((n + 1L) * (alphaDen - alphaNum) + alphaDen - 1L) / alphaDen
    if (n == 0L || k > n) {
      test.withColumn("threshold", lit(null).cast("double"))
        .withColumn("conforming", lit(true))
    } else {
      require(k <= Int.MaxValue.toLong,
        s"conformalFlag exact rank lookup caps at ${Int.MaxValue} calibration rows, got rank $k")
      val thr = s.orderBy(col("_s")).limit(k.toInt)
        .agg(max(col("_s"))).head().getDouble(0)
      test.withColumn("threshold", lit(thr))
        .withColumn("conforming", col(testScoreCol).cast("double") <= lit(thr))
    }
  }

  /** The calibration artifact behind [[conformalFlag]], as a 1-row
    * persistable table (n, rank, threshold) — fit offline on last
    * window's scores, serve every streaming tick
    * ([[graft.streaming.IncrementalStream.conformalStream]]). A rank
    * beyond n (α too small for the calibration size) persists a NULL
    * threshold = everything conforms, the same convention as
    * [[conformalFlag]]. */
  def conformalThresholdTable(calib: DataFrame, scoreCol: String,
                              alphaNum: Long = 5L,
                              alphaDen: Long = 100L): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"need 0 < alpha = $alphaNum/$alphaDen < 1")
    val spark = calib.sparkSession
    val s = calib.select(col(scoreCol).cast("double").as("_s"))
      .filter(col("_s").isNotNull)
    val n = s.count()
    val k = ((n + 1L) * (alphaDen - alphaNum) + alphaDen - 1L) / alphaDen
    val thr: Option[Double] =
      if (n == 0L || k > n) None
      else {
        require(k <= Int.MaxValue.toLong,
          s"conformal rank lookup caps at ${Int.MaxValue} calibration rows, got rank $k")
        Some(s.orderBy(col("_s")).limit(k.toInt)
          .agg(max(col("_s"))).head().getDouble(0))
      }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(n, k, thr.map(Double.box).orNull)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("threshold", org.apache.spark.sql.types.DoubleType))))
  }

  /** Apply an [[isotonicCalibrate]] step function to a score column:
    * each row gets the rate of the LAST block whose `score_lo` is ≤ its
    * score (blocks partition the observed score range; scores below
    * the first block clamp to it, beyond the last extend it — the
    * standard isotonic extrapolation). The block table is
    * driver-collected (it is step-count-sized by construction) and the
    * lookup is a codegen'd literal binary-search-free chained
    * comparison for small step counts — O(steps) per row, stateless,
    * no join, no shuffle.
    *
    * Output: `df` plus (calibrated_fp, calibrated) — the block's
    * `rate_fp`/`rate`. Null scores stay null. */
  def applyCalibration(df: DataFrame, scoreCol: String,
                       blocks: DataFrame): DataFrame = {
    val bs = blocks.select(col("score_lo"), col("rate_fp"), col("rate"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    require(bs.nonEmpty, "empty calibration block table")
    require(bs.length <= 10000,
      s"applyCalibration inlines the step function; got ${bs.length} blocks (max 10k)")
    val s = col(scoreCol).cast("double")
    // fold from the highest block down: the first lo <= s wins
    val initFp = lit(bs.head._2)
    val initRt = lit(bs.head._3)
    val (fp, rt) = bs.drop(1).foldLeft((initFp, initRt)) {
      case ((accFp, accRt), (lo, rfp, r)) =>
        (when(s >= lit(lo), lit(rfp)).otherwise(accFp),
         when(s >= lit(lo), lit(r)).otherwise(accRt))
    }
    df.withColumn("calibrated_fp", when(s.isNotNull, fp))
      .withColumn("calibrated", when(s.isNotNull, rt))
  }

  /** Isotonic regression calibration by Pool-Adjacent-Violators
    * (Barlow et al. 1972; the sklearn `isotonic` / reward-model
    * calibration standard): learn the best monotone map from raw model
    * scores to empirical success rates. Where [[calibrationBins]]
    * DIAGNOSES miscalibration on a fixed grid, this FIXES it — the
    * output step function is the L2-optimal monotone calibrator.
    *
    * Shape: the corpus reduces in ONE partial-aggregated pass to
    * (distinct score → n, positives); PAV pooling then runs on the
    * driver over that table (asserted ≤ `maxBins` rows — quantize
    * scores upstream if the raw space is too fine). The pooled result
    * is the UNIQUE isotonic fit, and every pooling comparison is an
    * exact cross-multiplied integer rational (pos_prev·n_cur >
    * pos_cur·n_prev) — no float drift, partitioning-independent.
    *
    * Output: one row per step — (score_lo, score_hi, n, n_pos,
    * rate_fp = (n_pos·10⁹) div n, rate) — monotone non-decreasing in
    * rate; apply with a range join or an `element_at` over collected
    * boundaries. */
  def isotonicCalibrate(df: DataFrame, scoreCol: String, labelCol: String,
                        maxBins: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    val agg = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("_s"),
        col(labelCol).cast("boolean").as("_y"))
      .groupBy(col("_s"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("_p"))
      .orderBy(col("_s"))
    val rows = agg.collect()
    require(rows.length <= maxBins,
      s"isotonicCalibrate: ${rows.length} distinct scores exceed maxBins=$maxBins — quantize upstream")
    final case class Block(lo: Double, hi: Double, n: Long, pos: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    rows.foreach { r =>
      var cur = Block(r.getDouble(0), r.getDouble(0), r.getLong(1), r.getLong(2))
      // pool while the previous block's rate exceeds the current's:
      // pos_prev/n_prev > pos_cur/n_cur  ⇔  pos_prev·n_cur > pos_cur·n_prev
      // (BigInt: block counts can reach 10¹⁰⁺ at corpus scale, whose
      // cross-products overflow a long)
      while (stack.nonEmpty &&
          BigInt(stack.last.pos) * cur.n > BigInt(cur.pos) * stack.last.n) {
        val prev = stack.remove(stack.length - 1)
        cur = Block(prev.lo, cur.hi, prev.n + cur.n, prev.pos + cur.pos)
      }
      stack += cur
    }
    import scala.jdk.CollectionConverters._
    val out = stack.toSeq.map(b => org.apache.spark.sql.Row(
      b.lo, b.hi, b.n, b.pos,
      (BigInt(b.pos) * 1000000000L / b.n).toLong,
      b.pos.toDouble / b.n.toDouble))
    spark.createDataFrame(out.asJava, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score_lo", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("score_hi", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_pos", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rate_fp", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rate", org.apache.spark.sql.types.DoubleType))))
  }

  /** Murphy decomposition of the Brier score per group — [[calibrationBins]]'
    * single-number companion: the raw Brier score split into
    * RELIABILITY (calibration error — lower is better), RESOLUTION
    * (how far bin outcome rates stray from the base rate — higher is
    * better) and UNCERTAINTY (the base rate's own variance, the
    * forecast-independent floor). The readout that tells you whether a
    * reward model's bad Brier is a calibration fix or a discrimination
    * ceiling.
    *
    * Exactness: probabilities quantize to `scale` fixed-point on entry,
    * so the Brier numerator Σ(p_fp − scale·y)², every bin's (n_k,
    * so_k, sp_k), and both decomposition NUMERATORS are exact
    * DECIMAL(38,0); each bin's reliability/resolution term is then one
    * pinned double division and the K-term total is an ORDERED fold
    * over the sorted bin array (sort_array + aggregate here, list(...
    * ORDER BY) + list_reduce in the oracle) — never an unordered
    * double SUM whose addition order an engine may pick. One
    * aggregate + one K-row rollup per group; K ≤ 1000.
    *
    * Output: (groupCol, n, brier, uncertainty, reliability, resolution)
    * — brier uses the raw per-row forecasts, the decomposition the
    * binned ones, so brier ≈ rel − res + unc up to within-bin variance
    * (exact equality iff forecasts are bin-constant). */
  def brierDecomposition(df: DataFrame, groupCol: String, probCol: String,
                         labelCol: String, bins: Int = 10,
                         scale: Long = 1000000L): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000], got $bins")
    val d38 = "decimal(38,0)"
    val rows = df.filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(col(groupCol),
        least(floor(col(probCol) * lit(bins.toDouble)).cast("long"),
          lit(bins - 1L)).as("_bin"),
        floor(col(probCol) * lit(scale.toDouble)).cast(d38).as("_pfp"),
        col(labelCol).cast("boolean").cast("long").cast(d38).as("_y"))
    val binned = rows.groupBy(col(groupCol), col("_bin"))
      .agg(count(lit(1)).cast(d38).as("_nk"),
        sum(col("_y")).as("_sok"),
        sum(col("_pfp")).as("_spk"),
        sum((col("_pfp") - col("_y") * lit(scale)) *
          (col("_pfp") - col("_y") * lit(scale))).as("_bk"))
    val totals = binned.groupBy(col(groupCol))
      .agg(sum(col("_nk")).as("_n"), sum(col("_sok")).as("_so"),
        sum(col("_bk")).as("_bnum"))
    val s2 = lit(scale).cast(d38) * lit(scale).cast(d38)
    val withTerms = binned.join(totals, Seq(groupCol))
      .withColumn("_relTerm",
        ((col("_spk") - col("_sok") * lit(scale)) *
          (col("_spk") - col("_sok") * lit(scale))).cast("double") /
          col("_nk").cast("double") / col("_n").cast("double") /
          s2.cast("double"))
      .withColumn("_resTerm",
        ((col("_sok") * col("_n") - col("_nk") * col("_so")) *
          (col("_sok") * col("_n") - col("_nk") * col("_so"))).cast("double") /
          col("_nk").cast("double") / col("_n").cast("double") /
          col("_n").cast("double") / col("_n").cast("double"))
    val folded = withTerms.groupBy(col(groupCol), col("_n"), col("_so"), col("_bnum"))
      .agg(sort_array(collect_list(struct(col("_bin"), col("_relTerm"),
        col("_resTerm")))).as("_terms"))
      .withColumn("reliability", aggregate(col("_terms"), lit(0.0),
        (acc, x) => acc + x.getField("_relTerm")))
      .withColumn("resolution", aggregate(col("_terms"), lit(0.0),
        (acc, x) => acc + x.getField("_resTerm")))
    folded.select(col(groupCol), col("_n").cast("long").as("n"),
      (col("_bnum").cast("double") / col("_n").cast("double") /
        s2.cast("double")).as("brier"),
      ((col("_so") * (col("_n") - col("_so"))).cast("double") /
        col("_n").cast("double") / col("_n").cast("double")).as("uncertainty"),
      col("reliability"), col("resolution"))
  }
}
