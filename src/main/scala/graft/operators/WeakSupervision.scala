package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weak-supervision label modeling (the Snorkel recipe, Ratner et al.
  * 2017, in its deterministic agreement-weighted form): combine many
  * noisy, partially-abstaining labeling functions (LFs) into one
  * training label per item WITHOUT ground truth — the standard way a
  * curation team bootstraps a quality/topic classifier before any
  * human labels exist. Labels are integer codes; an abstain is a null
  * vote.
  *
  * Everything is exact integer arithmetic (counts, fixed-point
  * agreement weights, weighted-vote sums) with ties broken to the
  * SMALLEST label, so an external engine replays the full model —
  * anchor, weights, final vote — bit-identically.
  *
  * Scale shape: the vote table (items × LFs rows) is the corpus-sized
  * object; it is persisted once (two narrow columns + the label) and
  * read three times — anchor vote, per-LF agreement, weighted vote —
  * each a partial-aggregated groupBy. The LF weight table is
  * LF-cardinality-sized (dozens) and broadcast. No windows, no
  * driver-side data.
  */
object WeakSupervision {

  /** Unweighted per-item majority vote; abstains (null votes) ignored,
    * ties → smallest label. Output: (itemCol, label, votes, n_votes) —
    * `votes` for the winning label, `n_votes` total cast. */
  def majorityVote(votes: DataFrame, itemCol: String,
                   voteCol: String): DataFrame = {
    val v = votes.filter(col(voteCol).isNotNull)
      .select(col(itemCol).as("_item"), col(voteCol).cast("long").as("_vote"))
    v.groupBy(col("_item"), col("_vote")).agg(count(lit(1)).as("_c"))
      .groupBy(col("_item"))
      .agg(max(struct(col("_c"), (-col("_vote")).as("_nv"))).as("_m"),
        sum(col("_c")).as("n_votes"))
      .select(col("_item").as(itemCol), (-col("_m._nv")).as("label"),
        col("_m._c").as("votes"), col("n_votes"))
  }

  /** Agreement-weighted label model, three exact passes over the vote
    * table:
    *
    *  1. ANCHOR: the unweighted majority label per item (ties →
    *     smallest) — a first-pass consensus estimate;
    *  2. LF WEIGHTS: each LF's fixed-point agreement rate with the
    *     anchor over the votes it actually cast,
    *     `w = (agreements·10⁶) div votes_cast` — an LF that parrots
    *     the consensus weighs ~10⁶, a contrarian or random LF weighs
    *     less (the 1-step EM approximation of the Snorkel generative
    *     model: reliability ≈ agreement with consensus);
    *  3. FINAL VOTE: per item, each label's score is the SUM of the
    *     weights of the LFs voting for it; argmax by (score DESC,
    *     label ASC).
    *
    * Output: (itemCol, label, score_fp, n_votes). Items whose every LF
    * abstained are absent (they have no evidence to label). */
  def labelModel(votes: DataFrame, itemCol: String, lfCol: String,
                 voteCol: String): DataFrame = {
    val v = votes.filter(col(voteCol).isNotNull)
      .select(col(itemCol).as("_item"), col(lfCol).as("_lf"),
        col(voteCol).cast("long").as("_vote"))
      .persist()
    try {
      val anchor = v.groupBy(col("_item"), col("_vote"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("_item"))
        .agg(max(struct(col("_c"), (-col("_vote")).as("_nv"))).as("_m"))
        .select(col("_item"), (-col("_m._nv")).as("_anchor"))
      // weights are LF-cardinality-sized: materialize them NOW (while
      // the vote table is cached for the anchor + agreement passes) so
      // the returned plan carries only the tiny checkpointed table and
      // ONE further scan of the votes
      val weights = v.join(anchor, "_item")
        .groupBy(col("_lf"))
        .agg(count(lit(1)).as("_n"),
          sum(when(col("_vote") === col("_anchor"), 1L).otherwise(0L)).as("_a"))
        .select(col("_lf"), expr("CAST((_a * 1000000L) div _n AS BIGINT)").as("_w"))
        .localCheckpoint(true)
      v.join(broadcast(weights), "_lf")
        .groupBy(col("_item"), col("_vote"))
        .agg(sum(col("_w")).as("_s"), count(lit(1)).as("_cv"))
        .groupBy(col("_item"))
        .agg(max(struct(col("_s"), (-col("_vote")).as("_nv"))).as("_m"),
          sum(col("_cv")).as("n_votes"))
        .select(col("_item").as(itemCol), (-col("_m._nv")).as("label"),
          col("_m._s").as("score_fp"), col("n_votes"))
    } finally v.unpersist(false)
  }
}
