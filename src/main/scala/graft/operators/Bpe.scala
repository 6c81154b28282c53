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
    * form is sized for hundreds-to-low-thousands of merges (subword
    * vocab prototyping, domain-specific token tables). A full 30k+
    * production vocabulary wants [[trainBatched]] — many
    * non-interfering merges per round trip; this method IS
    * `trainBatched(batchSize = 1)`, the sequential reference the
    * batched variant is spec-pinned against. */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
            minPairFreq: Long = 2L): BpeModel =
    trainBatched(corpus, textCol, numMerges, batchSize = 1, minPairFreq)

  /** Adjacent-pair frequencies over the dict, ranked (freq desc, then
    * (left, right) binary-ascending — the deterministic argmax order). */
  private def rankedPairs(dict: DataFrame): DataFrame =
    dict.filter(size(col("syms")) >= 2)
      .select(col("freq"),
        slice(col("syms"), lit(1), size(col("syms")) - 1).as("_as"),
        slice(col("syms"), lit(2), size(col("syms")) - 1).as("_bs"))
      .select(col("freq"), explode(arrays_zip(col("_as"), col("_bs"))).as("_p"))
      .groupBy(col("_p._as").as("_a"), col("_p._bs").as("_b"))
      .agg(sum(col("freq")).as("_pf"))
      .orderBy(col("_pf").desc, col("_a"), col("_b"))

  /** Batched merge training — the production-vocabulary variant the
    * sequential loop's scaladoc points at: each DRIVER ROUND TRIP
    * harvests up to `batchSize` merges instead of one, so a 30k-merge
    * vocabulary is ~500 rounds at batch 64, not 30k. One round ranks
    * the pair counts once, then accepts pairs in rank order, SKIPPING
    * any pair that interferes with an already-accepted one — shares a
    * symbol, or involves a symbol an accepted merge creates. Disjoint
    * merges have invariant counts (an occurrence of `c d` cannot gain
    * or lose from merging `a b` when {a,b} ∩ {c,d} = ∅) and their
    * folds commute, so every ACCEPTED merge carries exactly the count
    * and effect it would have had sequentially; a SKIPPED pair stays a
    * candidate for the next round under its then-updated counts.
    *
    * Fidelity contract: `batchSize = 1` IS the sequential reference
    * algorithm (what [[train]] delegates to). For larger batches the
    * merge SEQUENCE may legally diverge from sequential BPE — after a
    * merge, a newly-formed pair (e.g. `(ab, c)`) can out-rank the
    * round's remaining candidates, which sequential training would see
    * and a batch cannot — the standard frequency-snapshot trade every
    * batched BPE implementation makes (spec-pinned: equality on
    * disjoint-family fixtures, batch-1 equality always).
    *
    * `batchSize` is capped at 64: the round's merges apply as ONE
    * chained projection of `batchSize` nested folds — dict-sized work,
    * but expression-tree depth is a JVM/analyzer cost that should stay
    * bounded. `candidateSlack` × batchSize ranked rows are collected
    * per round (bounded driver metadata) so interference skips rarely
    * starve a batch. */
  def trainBatched(corpus: DataFrame, textCol: String, numMerges: Int,
                   batchSize: Int, minPairFreq: Long = 2L,
                   candidateSlack: Int = 4): BpeModel = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairFreq >= 1L, s"minPairFreq must be >= 1, got $minPairFreq")
    require(batchSize >= 1 && batchSize <= 64,
      s"batchSize must be in [1, 64], got $batchSize")
    require(candidateSlack >= 1, s"candidateSlack must be >= 1, got $candidateSlack")
    var dict = wordFreq(corpus, textCol)
      .select(col("word"), col("freq"), split(col("word"), "").as("syms"))
      .localCheckpoint(true)
    var dictRdd = Dedup.checkpointedRdd(dict)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val want = math.min(batchSize, numMerges - rank + 1)
      val top = rankedPairs(dict)
        .filter(col("_pf") >= minPairFreq)
        .limit(want * candidateSlack).collect()
      if (top.isEmpty) done = true
      else {
        val accepted = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        val used = scala.collection.mutable.HashSet[String]()
        top.iterator.foreach { r =>
          val (a, b, pf) = (r.getString(0), r.getString(1), r.getLong(2))
          if (accepted.size < want && !used(a) && !used(b)) {
            accepted += ((a, b, pf))
            used += a; used += b; used += (a + b)
          }
        }
        // apply the round's merges in acceptance order as one chained
        // projection — identical to replaying them sequentially (the
        // folds commute only across DISJOINT pairs, but acceptance
        // order is preserved within the chain regardless). Merging can
        // collapse two dict entries' symbol forms, but the WORD key
        // stays distinct — no re-group needed.
        val folded = accepted.foldLeft(col("syms")) { case (c, (a, b, _)) =>
          mergeFold(c, a, b) }
        val next = dict.withColumn("syms", folded).localCheckpoint(true)
        dictRdd.foreach(_.unpersist(false))
        dict = next
        dictRdd = Dedup.checkpointedRdd(dict)
        accepted.foreach { case (a, b, pf) => merges += ((rank, a, b, pf)); rank += 1 }
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

  /** Chunk documents on TRAINED-tokenizer token counts — the BPE
    * accounting for [[graft.pipelines.TrainingDataPipeline]]'s pack
    * stage (r11 ask: a real pretraining pipeline budgets context
    * windows in tokenizer tokens, not whitespace words). Chunk
    * boundaries stay on word boundaries (segmentation is word-keyed);
    * a word belongs to chunk `⌊(subword-prefix-sum − n_sub)/chunkTokens⌋`
    * — the same cumulative-quota convention as
    * [[Curation.packSequences]] (chunks may straddle the budget by at
    * most one word; no overlap — packing-oriented chunking does not
    * window). Output: (`idCol`, `chunk_idx`, `n_tokens` = the chunk's
    * subword count, `chunk_text` = its words joined) — the
    * [[Curation.chunkDocuments]] schema, so the two are drop-in
    * alternatives upstream of packSequences.
    *
    * Scale: [[segmentCorpus]]'s word-keyed join (never per-occurrence
    * fold work), one per-document window (documents bound the
    * partition, never the corpus), one (id, chunk) aggregate. */
  def tokenBudgetChunks(df: DataFrame, textCol: String, idCol: String,
                        model: BpeModel, chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    segmentCorpus(df, textCol, idCol, model)
      .select(col(idCol), col("pos"), col("word"), size(col("syms")).as("_nsub"))
      .withColumn("_cum", sum(col("_nsub")).over(w))
      .withColumn("chunk_idx",
        floor((col("_cum") - col("_nsub")) / lit(chunkTokens.toDouble)).cast("int"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(sum(col("_nsub")).cast("long").as("n_tokens"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("word")))),
          x => x.getField("word")), " ").as("chunk_text"))
  }

  /** Token-id vocabulary of a trained model — the standard BPE layout:
    * the ALPHABET (every distinct character of the dict's words),
    * binary-ascending from id 0, then one id per merge output in rank
    * order. A pure function of the model, so ids are stable across
    * runs, partitionings, and engines. Returns (`token`, `id`).
    *
    * The alphabet collects to the driver — bounded by the character
    * set (≤ the vocabulary size by construction; a few hundred for
    * Latin corpora, tens of thousands for CJK — driver metadata
    * either way, like the merge list itself). */
  def vocab(model: BpeModel): Seq[(String, Long)] = {
    val alphabet = model.segments
      .select(explode(split(col("word"), "")).as("tok"))
      .filter(length(col("tok")) > 0).distinct()
      .collect().map(_.getString(0)).sortBy(identity)
    val fromMerges = model.merges.sortBy(_._1).map { case (_, a, b, _) => a + b }
    (alphabet ++ fromMerges).zipWithIndex.map { case (t, i) => (t, i.toLong) }
  }

  /** Documents → trainer-ready token-id sequences: (`idCol`,
    * `token_ids`) with ids from [[vocab]]; characters outside the
    * training alphabet encode as `unkId` (a real tokenizer's `<unk>`).
    * The vocab rides in as a broadcast literal table (it is driver
    * metadata); ordering inside a document is (word position, subword
    * position) — deterministic. When `eowId` is set, that id is
    * emitted after each word's subwords (an explicit end-of-word /
    * separator token, the GPT-2-style space marker) — with it,
    * [[decodeIds]] reconstructs the normalized text exactly. Scale:
    * [[segmentCorpus]]'s word-keyed join + one per-doc aggregate;
    * nothing corpus-sized ever sorts globally. */
  def encodeIds(df: DataFrame, textCol: String, idCol: String,
                model: BpeModel, unkId: Long = -1L,
                eowId: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // The end-of-word marker rides as a sentinel SYMBOL " " appended to
    // each word's segmentation: a subword is a substring of a
    // space-split word, so no real symbol can be a single space — the
    // sentinel cannot collide, and the vocab join resolves it like any
    // other token through one extra broadcast row.
    val base = vocab(model)
    (eowId.toSeq :+ unkId).foreach(id => require(id < 0 || id >= base.size,
      s"eowId/unkId $id collides with a vocab id (vocab size ${base.size}) — decode would be ambiguous"))
    require(!eowId.contains(unkId),
      s"eowId and unkId are both $unkId — decode would be ambiguous")
    val entries = base ++ eowId.map((" ", _)).toSeq
    val v = broadcast(entries.toDF("_tok", "_tid"))
    val segd = segmentCorpus(df, textCol, idCol, model)
    val marked = eowId.fold(segd)(_ =>
      segd.withColumn("syms", concat(col("syms"), array(lit(" ")))))
    marked
      .select(col(idCol), col("pos"), posexplode(col("syms")).as(Seq("sub", "_tok")))
      .join(v, Seq("_tok"), "left")
      .withColumn("_tid", coalesce(col("_tid"), lit(unkId)))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sub"), col("_tid")))),
        x => x.getField("_tid")).as("token_ids"))
  }

  /** The inverse of [[encodeIds]]: token-id sequences → text. Ids map
    * back through the model's [[vocab]] (broadcast — driver metadata),
    * `eowId` renders as the word separator, `unkId` as `unkToken`, and
    * the subwords concatenate in sequence order. When the sequences
    * were encoded with the SAME model, an `eowId`, and contain no
    * `unkId`, the output is exactly
    * [[TextFunctions.normalizeForFingerprint]] of the source text —
    * the round trip `q_bpe_roundtrip` oracles end-to-end against an
    * independent derivation that never runs BPE at all.
    *
    * Rows whose id array is empty or null produce no output row
    * (matching [[encodeIds]], which emits nothing for documents that
    * normalize to the empty string). Scale: explode + broadcast-join +
    * one per-doc aggregate — the decode mirror of the encode shape;
    * nothing corpus-sized sorts globally. */
  def decodeIds(df: DataFrame, idsCol: String, idCol: String, model: BpeModel,
                unkId: Long = -1L, unkToken: String = "<unk>",
                eowId: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = vocab(model)
    (eowId.toSeq :+ unkId).foreach(id => require(id < 0 || id >= base.size,
      s"eowId/unkId $id collides with a vocab id (vocab size ${base.size}) — decode would be ambiguous"))
    require(!eowId.contains(unkId),
      s"eowId and unkId are both $unkId — decode would be ambiguous")
    val entries = base.map(_.swap) ++
      eowId.map((_, " ")).toSeq :+ ((unkId, unkToken))
    val v = broadcast(entries.toDF("_tid", "_tok"))
    df.select(col(idCol), posexplode(col(idsCol)).as(Seq("_tpos", "_tid")))
      .join(v, Seq("_tid"), "left")
      // an id outside the vocab entirely (corrupt input) also renders
      // as unkToken rather than silently vanishing from the text
      .withColumn("_tok", coalesce(col("_tok"), lit(unkToken)))
      .groupBy(col(idCol))
      .agg(rtrim(array_join(
        transform(array_sort(collect_list(struct(col("_tpos"), col("_tok")))),
          x => x.getField("_tok")), "")).as("text"))
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
