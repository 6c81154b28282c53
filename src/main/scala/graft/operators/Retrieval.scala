package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical retrieval scoring over a document corpus: Okapi BM25 against
  * a FIXED probe-term set — the shape curation pipelines actually run
  * (score 100 TB of web text against a benchmark's query terms, a
  * quality-probe vocabulary, or a contamination watch-list), as opposed
  * to serving ad-hoc user queries (that is an index server's job, not a
  * batch engine's).
  *
  * The probe terms are LITERALS, which buys the whole plan its shape:
  * per-document term frequencies are `size(filter(tokens, = term))`
  * projections — no token explode, no (doc × term) shuffle, everything
  * whole-stage-codegen — so scoring is ONE corpus scan plus two passes
  * over its narrow projection:
  *
  *  0. tokenize: the corpus text is read once, reduced to the
  *     (id, dl, tf…) integer projection, and `localCheckpoint`ed —
  *     both later passes read the materialized projection, never the
  *     text again (at 100 TB the text scan is the dominant cost; the
  *     projection is a few longs per doc).
  *  1. stats: one aggregate emitting N (docs), Σdl (corpus token
  *     count), and one document-frequency counter per term — a single
  *     driver row, embedded into pass 2 as literals (the "broadcast"
  *     is plan constants; nothing executor-side).
  *  2. score: per-doc BM25 sum + `TakeOrdered(k)` — no corpus-wide
  *     sort; k rows per task cross the exchange.
  *
  * Scoring is the Lucene BM25 form: per term t with doc frequency df,
  * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) ≥ 0, and per doc with
  * length dl and term frequency tf,
  * score += idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
  *
  * Cross-engine exactness (`q_bm25`): N/df/Σdl are integer aggregates;
  * every double op mirrors the oracle SQL's expression tree 1:1 (same
  * literals, same association — see the parity notes inline), and each
  * per-term score quantizes to 1e-8 fixed-point (`floor(x·1e8)` long,
  * the [[LanguageModel.scoreNll]] contract) BEFORE the per-doc sum, so
  * doc scores are order-independent long sums. ln parity between
  * engines is the same empirical contract `q_perplexity` relies on.
  */
object Retrieval {

  /** Default BM25 free parameters (the Robertson/Lucene standard). */
  val DefaultK1 = 1.2
  val DefaultB = 0.75

  private def tokens(textCol: String): Column = {
    // null text scores like an empty doc (dl = 0), not as NULL rows
    val toks = split(TextFunctions.normalizeForFingerprint(
      coalesce(col(textCol), lit(""))), " ")
    filter(toks, t => length(t) > 0)
  }

  /** Per-document BM25 scores against `terms`: one row per input doc —
    * (`idCol`, `score_fp` = Σ_t floor(score_t·1e8) as a long,
    * `matched` = #probe terms present). Docs matching no term score 0
    * (kept: the caller decides whether 0 is a filter or a floor). */
  def bm25Scores(df: DataFrame, textCol: String, idCol: String, terms: Seq[String],
                 k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.distinct == terms, "terms must be distinct")
    // pass 0: tokenize once — the text scan happens exactly once; the
    // checkpointed frame is the narrow (id, dl, tf…) projection both
    // passes below read (r11 advice: the stats pass was a second full
    // corpus read). Lifecycle: the checkpoint backs the RETURNED frame,
    // so it is not unpersisted here; it is freed with the session (or
    // by the caller once the scores are persisted).
    val toked = df.select(col(idCol), tokens(textCol).as("_t"))
      .select(col(idCol) +: size(col("_t")).as("_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("_t"), x => x === lit(t))).as(s"_tf$i") }: _*)
      .localCheckpoint(true)
    // pass 1: N, Σdl, df_t — one driver row of longs
    val statCols = count(lit(1)).as("_n") +:
      coalesce(sum(col("_dl").cast("long")), lit(0L)).as("_sumdl") +:
      terms.indices.map(i => sum((col(s"_tf$i") > 0).cast("long")).as(s"_df$i"))
    val stats = toked.agg(statCols.head, statCols.tail: _*).head()
    val n = stats.getLong(0)
    val sumdl = stats.getLong(1)
    require(n > 0, "empty corpus")
    // driver-side doubles, same IEEE ops the oracle runs:
    // avgdl = CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)
    val avgdl = sumdl.toDouble / n.toDouble
    val dlNorm = // k1·(1 − b + b·dl/avgdl): literal-for-literal the oracle's tree
      lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("_dl").cast("double") / lit(avgdl)))
    val perTerm = terms.indices.map { i =>
      val dfT = stats.getLong(2 + i)
      // idf = ln(1 + (N − df + 0.5)/(df + 0.5)) — (N − df) stays a long
      // before the cast, matching CAST(n - df AS DOUBLE) + 0.5
      val idf = math.log(1.0 + ((n - dfT).toDouble + 0.5) / (dfT.toDouble + 0.5))
      val tf = col(s"_tf$i").cast("double")
      floor(lit(idf) * (tf * (lit(k1) + lit(1.0))) / (tf + dlNorm) * lit(1e8)).as(s"_s$i")
    }
    val matched = terms.indices.map(i => (col(s"_tf$i") > 0).cast("long"))
      .reduce(_ + _)
    toked.select(col(idCol) +: matched.as("matched") +: perTerm: _*)
      .select(col(idCol),
        terms.indices.map(i => col(s"_s$i")).reduce(_ + _).as("score_fp"),
        col("matched"))
  }

  /** Top-`k` documents by BM25 score, ties broken by ascending `idCol`
    * (a total order — deterministic and oracle-replayable). Planned as
    * `TakeOrdered`: each task surfaces k candidates, never a global
    * sort. */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String, terms: Seq[String],
               k: Int, k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    bm25Scores(df, textCol, idCol, terms, k1, b)
      .orderBy(col("score_fp").desc, col(idCol)).limit(k)
  }

  /** Materialize a persisted inverted text index under `dir` — the
    * text-side analog of [[Similarity.writeIvfIndex]]'s lifecycle:
    * build once, probe many times touching only the slivers a query
    * needs.
    *
    * Layout (all parquet):
    *  - `postings/`, PARTITIONED BY term-hash bucket: (term, doc_id,
    *    tf, dl) — the doc length is DENORMALIZED into each posting
    *    (the Lucene-norms trade: +8 bytes/posting buys probe-time
    *    scoring with NO join against a corpus-wide length table);
    *  - `termdf/`, same bucketing: (term, df) document frequencies;
    *  - `stats/`: one row (n_docs, sum_dl).
    *
    * A probe for T terms reads: 1 stats row, ≤T termdf buckets, ≤T
    * posting buckets — partition pruning at the FILE LISTING, exactly
    * the IVF cell contract. Tokenization is [[bm25Scores]]' normalize+
    * split, so index-path scores are bit-identical to the scan path. */
  def buildInvertedIndex(df: DataFrame, textCol: String, idCol: String,
                         dir: String, buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val toked = df.select(col(idCol), tokens(textCol).as("_t"))
      .select(col(idCol), col("_t"), size(col("_t")).cast("long").as("dl"))
      .localCheckpoint(true) // stats pass + posting pass share one tokenize
    toked.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    val postings = toked
      .select(col(idCol), col("dl"), explode(col("_t")).as("term"))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .localCheckpoint(true) // posting write + df aggregation share it
    postings.write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    postings.groupBy(col("bucket"), col("term"))
      .agg(count(lit(1)).as("df"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/termdf")
    toked.unpersist()
    postings.unpersist()
  }

  /** Driver-side bucket of a term — the same xxhash64(seed 42) Spark's
    * `xxhash64` column computes, so the probe's partition filter lands
    * on exactly the files the build wrote. */
  private def termBucket(term: String, buckets: Int): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(term)
    java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L), buckets.toLong)
  }

  /** BM25 top-`k` through the persisted index: identical scores to
    * [[bm25TopK]] (same stats, same literal-for-literal expression
    * tree, same 1e-8 fixed-point floor before the per-doc sum) with one
    * contract difference — docs matching NO probe term are absent, not
    * scored 0 (an inverted index never visits them; that is its point).
    *
    * Cost: one stats row + the probe terms' termdf/posting buckets
    * (partition-pruned at file listing) + a posting-sized aggregate +
    * TakeOrdered(k). The corpus itself is never read. */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
                      terms: Seq[String], k: Int, buckets: Int = 64,
                      idCol: String = "doc_id",
                      k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.distinct == terms, "terms must be distinct")
    require(k > 0, s"k must be positive, got $k")
    val st = spark.read.parquet(s"$dir/stats").head()
    val n = st.getLong(0)
    val sumdl = st.getLong(1)
    require(n > 0, "empty index")
    val avgdl = sumdl.toDouble / n.toDouble
    val bs = terms.map(termBucket(_, buckets)).distinct
    val dfT = spark.read.parquet(s"$dir/termdf")
      .filter(col("bucket").isin(bs: _*) && col("term").isin(terms: _*))
      .collect().map(r => r.getString(r.fieldIndex("term")) ->
        r.getLong(r.fieldIndex("df"))).toMap
    // idf literals: (n - df) stays a long before the cast — the
    // bm25Scores expression tree, computed once on the driver
    val idf = terms.map { t =>
      val d = dfT.getOrElse(t, 0L)
      t -> math.log(1.0 + ((n - d).toDouble + 0.5) / (d.toDouble + 0.5))
    }.toMap
    val idfCol = idf.foldLeft(lit(0.0)) { case (e, (t, v)) =>
      when(col("term") === t, lit(v)).otherwise(e)
    }
    val tf = col("tf").cast("double")
    val dlNorm = lit(k1) * ((lit(1.0) - lit(b)) +
      lit(b) * (col("dl").cast("double") / lit(avgdl)))
    spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(bs: _*) && col("term").isin(terms: _*))
      .withColumn("_s",
        floor(idfCol * (tf * (lit(k1) + lit(1.0))) / (tf + dlNorm) * lit(1e8)))
      .groupBy(col(idCol))
      .agg(sum(col("_s")).as("score_fp"), count(lit(1)).as("matched"))
      .orderBy(col("score_fp").desc, col(idCol)).limit(k)
  }

  /** Hard-negative mining for contrastive training: for EVERY query in
    * a batch, the top-`k` highest-BM25 documents that are NOT in that
    * query's relevance set — the standard "BM25 negatives" recipe for
    * dense-retriever and reranker training data.
    *
    * Runs against a [[buildInvertedIndex]] directory, so the corpus is
    * never read: ONE partition-pruned postings read covers the whole
    * batch (the union of all queries' term buckets), a broadcast
    * (q_id, term, idf) weight table fans each posting row out to the
    * queries that probe its term, per-(query, doc) scores
    * partial-aggregate before the exchange, known-positives leave via
    * ONE left_anti join on (q_id, doc), and per-query top-k rides the
    * mergeable bottom-k heap (k·tasks heap entries cross the exchange,
    * never the scored candidate stream — the [[Similarity]] batch
    * contract).
    *
    * Scores are the [[bm25TopKIndexed]] expression tree row for row
    * (idf a driver double carried through the broadcast join instead of
    * a literal when-chain; same value, same 1e-8 fixed-point floor per
    * posting), so a negative's score_fp equals what the single-query
    * path reports. Index-path contract rides along: docs matching NO
    * probe term of a query are absent, not scored 0 — they are "easy"
    * negatives by construction, not hard ones. Ties at the k boundary
    * break by ascending doc id.
    *
    * `rel` is a (q_id, `idCol`) table of known positives. Output:
    * (q_id, `idCol`, score_fp). */
  def bm25HardNegativesIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
                               queries: Seq[(Long, Seq[String])], rel: DataFrame,
                               k: Int, buckets: Int = 64, idCol: String = "doc_id",
                               k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    queries.foreach { case (q, ts) =>
      require(ts.nonEmpty && ts.distinct == ts, s"query $q terms must be non-empty and distinct")
    }
    require(k > 0, s"k must be positive, got $k")
    import spark.implicits._
    val st = spark.read.parquet(s"$dir/stats").head()
    val n = st.getLong(0)
    val sumdl = st.getLong(1)
    require(n > 0, "empty index")
    val avgdl = sumdl.toDouble / n.toDouble
    val allTerms = queries.flatMap(_._2).distinct
    val bs = allTerms.map(termBucket(_, buckets)).distinct
    val dfT = spark.read.parquet(s"$dir/termdf")
      .filter(col("bucket").isin(bs: _*) && col("term").isin(allTerms: _*))
      .collect().map(r => r.getString(r.fieldIndex("term")) ->
        r.getLong(r.fieldIndex("df"))).toMap
    // (q_id, term, idf): query-batch × terms rows of driver metadata —
    // the idf doubles are bm25TopKIndexed's values verbatim
    val weights = queries.flatMap { case (q, ts) =>
      ts.map { t =>
        val d = dfT.getOrElse(t, 0L)
        (q, t, math.log(1.0 + ((n - d).toDouble + 0.5) / (d.toDouble + 0.5)))
      }
    }.toDF("q_id", "term", "_idf")
    val tf = col("tf").cast("double")
    val dlNorm = lit(k1) * ((lit(1.0) - lit(b)) +
      lit(b) * (col("dl").cast("double") / lit(avgdl)))
    val scored = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(bs: _*) && col("term").isin(allTerms: _*))
      .join(broadcast(weights), Seq("term"))
      .withColumn("_s",
        floor(col("_idf") * (tf * (lit(k1) + lit(1.0))) / (tf + dlNorm) * lit(1e8)))
      .groupBy(col("q_id"), col(idCol))
      .agg(sum(col("_s")).as("score_fp"))
      .join(rel.select(col("q_id"), col(idCol)), Seq("q_id", idCol), "left_anti")
    import org.apache.spark.sql.graftshim.ColumnBridge
    val agg = graft.functions.BottomKAgg(
      ColumnBridge.expression((-col("score_fp")).cast("double")),
      ColumnBridge.expression(col(idCol).cast("long")), k, withPriorities = true)
    scored.groupBy(col("q_id"))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("_top"))
      .select(col("q_id"), explode(col("_top")).as("_e"))
      .select(col("q_id"), col("_e.v").as(idCol),
        (-ColumnBridge.column(graft.functions.SortableBitsToDouble(
          ColumnBridge.expression(col("_e.p")))) + 0.0).cast("long").as("score_fp"))
  }

  /** Rank a scored result as a top-`k` list: (`idCol`, `rank` 1-based)
    * by `scoreCol` descending (or ascending for distance metrics), ties
    * by ascending id. The global selection is `TakeOrdered`; the
    * row_number window then runs over AT MOST k rows — a deliberate
    * single-partition step bounded by k, not by the corpus (k here is
    * a retrieval depth, tens to thousands). */
  def rankTopK(df: DataFrame, idCol: String, scoreCol: String, k: Int,
               ascending: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ord =
      if (ascending) Seq(col(scoreCol), col(idCol))
      else Seq(col(scoreCol).desc, col(idCol))
    df.orderBy(ord: _*).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(ord: _*)))
      .select(col(idCol), col("rank"))
  }

  /** TF-IDF keyword extraction: the top-`k` terms of every document by
    * smoothed TF-IDF (the sklearn `TfidfVectorizer` form:
    * idf = ln((1+N)/(1+df)) + 1, score = tf·idf) — the corpus-analysis
    * primitive behind topic tagging, per-domain vocabulary drift
    * reports, and cheap extractive keywording of a crawl.
    *
    * Output: (`idCol`, rank 1-based, token, `tfidf_fp`) — one row per
    * kept (doc, term); terms seen in fewer than `minDf` documents are
    * dropped (hapaxes under smooth-idf otherwise dominate every list).
    *
    * Scale shape: one tokenize scan → explode → (doc, term) partial-
    * aggregated counts (hot terms collapse map-side); document
    * frequency is a second aggregate OVER THE COUNTS (vocab-sized, not
    * corpus-sized); idf is computed IN-PLAN from `df_t` (N is the only
    * driver scalar — no vocab ever collects). The per-doc top-k window
    * partitions by document — groups are bounded by document length,
    * never corpus-sized, so this is the one place a window beats the
    * heap aggregate (string payloads, small groups).
    *
    * Cross-engine exactness: tf/df/N are integer aggregates; the one
    * double expression mirrors the oracle tree 1:1 and quantizes to
    * 1e-8 fixed point (the [[bm25Scores]] contract), ties break
    * (score desc, token asc). */
  def tfidfTopK(df: DataFrame, textCol: String, idCol: String, k: Int,
                minDf: Int = 2): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val n = df.count()
    require(n > 0, "empty corpus")
    val tf = df.select(col(idCol), explode(tokens(textCol)).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df_t"))
      .filter(col("df_t") >= minDf)
    // idf = ln((1+N)/(1+df)) + 1 — (1+N) constant-folds to the same
    // IEEE literal the oracle computes; df_t stays in-plan (no vocab
    // collect)
    val idf =
      log((lit(1.0) + lit(n.toDouble)) / (lit(1.0) + col("df_t").cast("double"))) + lit(1.0)
    val scored = tf.join(dfT, "token")
      .withColumn("tfidf_fp", floor(col("tf").cast("double") * idf * lit(1e8)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tfidf_fp").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tfidf_fp"))
  }

  /** PMI collocation mining: the corpus-wide top-`k` adjacent-token
    * bigrams by pointwise mutual information,
    * pmi = ln(N·c_xy / (c_x·c_y)) with N = total token count — the
    * classic collocation detector (Church & Hanks 1990) curation
    * pipelines run to find boilerplate phrases, named entities, and
    * tokenizer-merge candidates. Bigrams below `minCount` are dropped
    * (PMI is degenerate on rare pairs).
    *
    * Output: (term_a, term_b, pair_n, `pmi_fp`), top-k by pmi desc,
    * ties by (term_a, term_b) asc.
    *
    * Scale shape: one tokenize scan feeds BOTH count families —
    * unigrams and adjacent pairs — each a partial-aggregated groupBy
    * (hot pairs collapse map-side); the unigram table is vocab-sized,
    * joined twice onto the (filtered, far smaller) bigram table; the
    * final top-k is `TakeOrdered`, never a global sort. PMI is
    * computed in LOGS (ln(N)+ln(c_xy)−ln(c_x)−ln(c_y)) so 100 TB-scale
    * counts never overflow an integer product, then quantized to 1e-8
    * fixed point for cross-engine replay. */
  /** Skip-gram (center, context) pair counts within a ±`window` token
    * neighborhood — the word2vec/GloVe training-pair generator.
    * ENTIRELY row-local until the final count: each offset k's pairs
    * are the token array zipped with its k-shifted self (the
    * [[pmiCollocations]] adjacent-pair trick generalized), all offsets
    * flattened in ONE codegen'd projection — one corpus scan, no
    * self-join, no window function; the only shuffle is the
    * partial-aggregated pair count. Pairs are emitted symmetrically
    * (center→context both directions, the word2vec convention), so
    * `n(center, context) = n(context, center)`. Pairs under `minCount`
    * drop (they dominate the tail and train nothing).
    * Output: (center, context, n). */
  def skipGramPairs(df: DataFrame, textCol: String, window: Int = 3,
                    minCount: Int = 2): DataFrame = {
    require(window >= 1 && window <= 16, s"window must be in [1, 16], got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val t = col("_t")
    val perOffset = (1 to window).map { k =>
      zip_with(
        slice(t, lit(1), greatest(size(t) - k, lit(0))),
        slice(t, lit(k + 1), greatest(size(t) - k, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))
    }
    // mirror row-locally (concat with the swapped transform) — a
    // symmetric unionAll would scan the corpus twice
    val fwd = flatten(array(perOffset: _*))
    val both = concat(fwd, transform(fwd,
      p => struct(p.getField("b").as("a"), p.getField("a").as("b"))))
    df.select(tokens(textCol).as("_t"))
      .select(explode(both).as("_p"))
      .select(col("_p.a").as("center"), col("_p.b").as("context"))
      .groupBy("center", "context").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  def pmiCollocations(df: DataFrame, textCol: String, k: Int,
                      minCount: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toked = df.select(tokens(textCol).as("_t"))
    val uni = toked.select(explode(col("_t")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n1"))
    // adjacent pairs: zip the token array with its tail — row-local,
    // codegen'd, no self-join
    val pairs = toked
      .select(explode(zip_with(
        slice(col("_t"), lit(1), greatest(size(col("_t")) - 1, lit(0))),
        slice(col("_t"), lit(2), greatest(size(col("_t")) - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))).as("_p"))
      .groupBy(col("_p.a").as("term_a"), col("_p.b").as("term_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minCount)
    val nTok = uni.agg(coalesce(sum(col("n1")), lit(0L))).head().getLong(0)
    require(nTok > 0, "empty corpus")
    val na = uni.select(col("term").as("term_a"), col("n1").as("_na"))
    val nb = uni.select(col("term").as("term_b"), col("n1").as("_nb"))
    pairs.join(na, "term_a").join(nb, "term_b")
      .withColumn("pmi_fp", floor(
        (lit(math.log(nTok.toDouble)) + log(col("pair_n").cast("double"))
          - log(col("_na").cast("double")) - log(col("_nb").cast("double")))
          * lit(1e8)))
      .select(col("term_a"), col("term_b"), col("pair_n"), col("pmi_fp"))
      .orderBy(col("pmi_fp").desc, col("term_a"), col("term_b")).limit(k)
  }

  /** Reciprocal-Rank Fusion (Cormack/Clarke/Buettcher 2009) of ranked
    * lists — THE standard hybrid-retrieval combiner (lexical BM25 +
    * embedding ANN): each list contributes 1/(k0 + rank) for the docs
    * it ranked; docs absent from a list contribute 0 from it.
    *
    * Scored in PURE INTEGERS: `rrf_fp` = Σᵢ ⌊10¹² / (k0 + rankᵢ)⌋ via
    * integral division — no floating point anywhere, so any engine
    * replays it bit-for-bit, and the quantization error vs the real
    * formula is < 10⁻¹² per list (rank order is preserved for every
    * realistic k0/depth). Ties (identical rank sets) break by
    * ascending id.
    *
    * Scale: inputs are top-k lists (driver-bounded by construction —
    * see [[rankTopK]]), so the full-outer-join chain and final sort
    * touch k·L rows, not the corpus; the expensive work stays in the
    * upstream retrievers. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, topK: Int,
              k0: Int = 60): DataFrame = {
    require(lists.size >= 2, "rrfFuse needs at least two ranked lists")
    require(topK > 0 && k0 >= 0, s"bad topK=$topK / k0=$k0")
    lists.foreach(d => require(d.columns.contains("rank") && d.columns.contains(idCol),
      s"each list must have ($idCol, rank) columns, got ${d.columns.mkString(",")}"))
    val renamed = lists.zipWithIndex.map { case (d, i) =>
      d.select(col(idCol), col("rank").cast("long").as(s"_r$i")) }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val contrib = lists.indices.map(i =>
      coalesce(expr(s"CAST(1000000000000 AS BIGINT) div (${k0}L + _r$i)"), lit(0L)))
    val hit = lists.indices.map(i => when(col(s"_r$i").isNotNull, 1L).otherwise(0L))
    joined
      .withColumn("rrf_fp", contrib.reduce(_ + _))
      .withColumn("lists_hit", hit.reduce(_ + _))
      .select(col(idCol), col("rrf_fp"), col("lists_hit"))
      .orderBy(col("rrf_fp").desc, col(idCol)).limit(topK)
  }
}
