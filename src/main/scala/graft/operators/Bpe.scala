package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding vocabulary training (Sennrich et al. 2016) — the
  * standard subword tokenizer learner, reduced to Spark the way the
  * original algorithm reduces it: training operates on the DISTINCT
  * word-frequency dictionary, never the corpus. At 100 TB the corpus
  * has ~10¹¹ tokens but ~10⁸ distinct words — every merge round is a
  * dict-sized job (adjacent-pair count, one-row argmax, one fold over
  * the symbol arrays), so cost scales with vocabulary, not data.
  *
  * Two deliberate scale choices:
  *  - Each round's transformed dict is `localCheckpoint`ed (truncating
  *    the otherwise numMerges-deep lazy plan) and the superseded
  *    checkpoint's blocks are freed immediately — the
  *    [[Dedup.connectedComponents]] lifecycle lesson.
  *  - The final dict state IS the segmentation of every training word,
  *    so corpus encoding is a word-keyed join against the returned
  *    `segments` table; only words never seen in training re-derive
  *    their segmentation through the merge folds ([[encodeTable]]).
  *
  * Determinism: the argmax pair breaks frequency ties by (left, right)
  * lexicographic ascending — the merge sequence is a pure function of
  * the word-frequency dict, independent of partitioning (spec-pinned;
  * `q_bpe_train` oracles the merge table against golden literal rows,
  * the q_fingerprint pattern, since an N-round data-dependent argmax
  * chain is not expressible as one SQL query). */
object Bpe {

  /** A trained model: `merges` in application order (rank ascending,
    * with the winning pair's dict frequency), and `segments` — the
    * final (word, syms, freq) dict state = each training word's
    * subword segmentation. */
  final case class BpeModel(merges: Seq[(Int, String, String, Long)],
                            segments: DataFrame)

  /** (word, freq) over the normalized corpus — the Sennrich reduction:
    * everything downstream is weighted by this dict. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(TextFunctions.normalizeForFingerprint(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** One leftmost-greedy merge pass of (a, b) → a+b over a symbol
    * array — the fold appends, or replaces its own last output when it
    * completes the pair. A symbol produced by THIS pass never re-pairs
    * (a+b ≠ a since b is non-empty), which is exactly the sequential
    * leftmost-non-overlapping semantics of the reference algorithm. */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Train `numMerges` merges over the corpus' word-frequency dict.
    * Each round runs one bounded eager job (the pair-count argmax — a
    * 1-row TakeOrdered collect) plus the dict transform; rounds stop
    * early when the best pair's frequency drops below `minPairFreq`
    * (the reference's stopping rule — merging hapax pairs memorizes
    * noise).
    *
    * Practicality bound: each merge is a driver round trip, so this
    * loop is sized for hundreds-to-low-thousands of merges (subword
    * vocab prototyping, domain-specific token tables). A full 30k+
    * production vocabulary wants the batched variant of the algorithm
    * (re-count pair deltas instead of full recounts, pick many
    * non-interfering merges per round) — the per-round dict transform
    * and checkpoint lifecycle here are the building blocks it would
    * reuse. */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
            minPairFreq: Long = 2L): BpeModel = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairFreq >= 1L, s"minPairFreq must be >= 1, got $minPairFreq")
    var dict = wordFreq(corpus, textCol)
      .select(col("word"), col("freq"), split(col("word"), "").as("syms"))
      .localCheckpoint(true)
    var dictRdd = Dedup.checkpointedRdd(dict)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val best = dict.filter(size(col("syms")) >= 2)
        .select(col("freq"),
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("_as"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("_bs"))
        .select(col("freq"), explode(arrays_zip(col("_as"), col("_bs"))).as("_p"))
        .groupBy(col("_p._as").as("_a"), col("_p._bs").as("_b"))
        .agg(sum(col("freq")).as("_pf"))
        .orderBy(col("_pf").desc, col("_a"), col("_b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minPairFreq) done = true
      else {
        val (a, b, pf) = (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += ((rank, a, b, pf))
        val next = dict
          .withColumn("syms", mergeFold(col("syms"), a, b))
          // merging can collapse two dict entries' symbol forms, but the
          // WORD key stays distinct — no re-group needed
          .localCheckpoint(true)
        dictRdd.foreach(_.unpersist(false))
        dict = next
        dictRdd = Dedup.checkpointedRdd(dict)
        rank += 1
      }
    }
    BpeModel(merges.toSeq, dict.select(col("word"), col("syms"), col("freq")))
  }

  /** Segment arbitrary words with a trained model: replay the merge
    * folds in rank order over (word → chars). numMerges chained
    * higher-order folds — checkpoint every few rounds keeps the plan
    * bounded. Intended for the UNSEEN remainder after a join against
    * `model.segments`, which is dict-sized, not corpus-sized. */
  def encodeTable(words: DataFrame, model: BpeModel,
                  wordCol: String = "word"): DataFrame = {
    var out = words.select(col(wordCol).as("word"))
      .withColumn("syms", split(col("word"), ""))
    var outRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    model.merges.zipWithIndex.foreach { case ((_, a, b, _), i) =>
      out = out.withColumn("syms", mergeFold(col("syms"), a, b))
      if ((i + 1) % 8 == 0) {
        val next = out.localCheckpoint(true)
        outRdd.foreach(_.unpersist(false))
        out = next
        outRdd = Dedup.checkpointedRdd(out)
      }
    }
    out
  }

  /** Ordered subword segmentation of every document: (id, pos, word,
    * syms). Seen words resolve through the `segments` table (a
    * word-keyed join — the scale path); unseen words re-derive their
    * segmentation through the merge folds over the DISTINCT unseen
    * word set only. */
  def segmentCorpus(df: DataFrame, textCol: String, idCol: String,
                    model: BpeModel): DataFrame = {
    val stream = df.select(col(idCol).as("_id"),
        posexplode(split(TextFunctions.normalizeForFingerprint(col(textCol)), " "))
          .as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val seen = model.segments.select(col("word"), col("syms"))
    val unseen = encodeTable(
      stream.select("word").distinct().join(seen, Seq("word"), "left_anti"), model)
    stream.join(seen.union(unseen), Seq("word"))
      .select(col("_id").as(idCol), col("pos"), col("word"), col("syms"))
  }
}
