package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Baseline: brute-force cosine top-k (exact, one scan,
  * no shuffle until the final top-k). Scale path: IVF — k-means-style
  * coarse quantization into `nlist` cells, query probes `nprobe` cells,
  * reading `nprobe/nlist` of the data instead of all of it.
  */
object Similarity {

  /** Exact brute-force top-k by cosine for a single query vector.
    * One scan; per-row cosine is codegen'd expression math; global top-k
    * is `orderBy.limit` which Spark executes as per-partition TakeOrdered
    * + driver merge of k·parts rows — no full sort, no shuffle of data. */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol),
        VectorFunctions.cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact top-k for MANY query vectors at once: queries broadcast,
    * corpus scanned once, and per-query top-k via the mergeable
    * [[graft.functions.BottomKAgg]] heap (priority = −score as sortable
    * bits, decoded back with `sortable_bits_to_double` — no second
    * scan). The previous window formulation shuffled ALL Q×N scored
    * rows and sorted each query's partition; this shuffles Q×tasks×k
    * heap entries — at a 10⁹-vector corpus that is the difference
    * between a terabyte exchange and a few megabytes. Output and
    * ordering are bit-identical to the window form (ties → lowest id)
    * for non-null, non-NaN scores — null/NaN scores are excluded where
    * a window would sort them into the results; cosine here never
    * produces either (zero-norm guard returns 0.0). Spec-pinned. */
  def bruteForceTopKBatch(corpus: DataFrame, vecCol: String, idCol: String,
                          queries: DataFrame, qVecCol: String, qIdCol: String,
                          k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qIdCol), col(idCol).cast("long").as("_cid"),
        (-VectorFunctions.cosine(col(vecCol), col(qVecCol))).as("_negScore"))
    heapTopK(scored, qIdCol, idCol, k)
  }

  /** Shared tail of the batched searches: per-`qIdCol` top-k over
    * (_cid, _negScore) rows via the heap aggregate, scores decoded
    * in-plan. */
  private def heapTopK(scored: DataFrame, qIdCol: String, idCol: String,
                       k: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val agg = graft.functions.BottomKAgg(
      ColumnBridge.expression(col("_negScore")),
      ColumnBridge.expression(col("_cid")), k, withPriorities = true)
    scored.groupBy(col(qIdCol))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("_top"))
      .select(col(qIdCol), explode(col("_top")).as("_e"))
      .select(col(qIdCol), col("_e.v").as(idCol),
        // + 0.0 folds the -0.0 a negated zero score would produce
        (-ColumnBridge.column(graft.functions.SortableBitsToDouble(
          ColumnBridge.expression(col("_e.p")))) + 0.0).as("score"))
  }

  /** IVF search for MANY queries in one pass: each query probes its
    * `nprobe` nearest cells, the scan reads only the UNION of probed
    * cells (partition pruning on a [[writeIvfIndex]] table), each
    * (vector, query) pair scores only where the vector's cell is in
    * that query's probe set (broadcast join on cell), and per-query
    * top-k rides the heap aggregate. Cost: |union cells| of the corpus
    * read once, regardless of Q — vs Q full probes run serially. */
  def ivfTopKBatch(indexed: DataFrame, vecCol: String, idCol: String, cellCol: String,
                   centroids: Array[(Int, Array[Double])],
                   queries: Seq[(Long, Seq[Float])], k: Int,
                   nprobe: Int = 4): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, qv) =>
      val q = qv.map(_.toDouble).toArray
      centroids.map { case (i, cv) => (i, l2SqLocal(q, cv)) }
        .sortBy(_._2).take(nprobe).map { case (cell, _) => (qid, cell, qv) }
    }
    val probes = probeRows.toDF("q_id", "_cell_p", "_qv")
    val cells = probeRows.map(_._2).distinct
    val scored = indexed.filter(col(cellCol).isin(cells: _*))
      .join(broadcast(probes), col(cellCol) === col("_cell_p"))
      .select(col("q_id"), col(idCol).cast("long").as("_cid"),
        (-VectorFunctions.cosine(col(vecCol), col("_qv"))).as("_negScore"))
    heapTopK(scored, "q_id", idCol, k)
  }

  /** Per-group elementwise centroid (mean pooling) of an embedding
    * column — class prototypes, cluster summaries, dedup-cluster
    * representatives. Shape: posexplode to (group, dim, x) then
    * per-(group, dim) mean. The explode looks expensive but partial
    * aggregation collapses each task's contribution to groups × dim
    * running sums before the exchange — the shuffle is index-sized, not
    * corpus-sized, at any scale. Returns flat (group, dim, c) rows —
    * the exact-compare-friendly form; [[assembleCentroids]] repacks to
    * one array per group. */
  def groupCentroids(df: DataFrame, vecCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "_x")))
      .groupBy(col(groupCol), col("dim"))
      .agg(avg(col("_x").cast("double")).as("c"))

  /** (group, centroid array) from [[groupCentroids]] output — the
    * collect_list is bounded by dim, never by corpus size. */
  def assembleCentroids(flat: DataFrame, groupCol: String): DataFrame =
    flat.groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("_s"))
      .select(col(groupCol), col("_s.c").as("centroid"))

  /** Deterministic IVF coarse centroids: the `nlist` lowest-id vectors
    * (a fixed, reproducible seeding — one Lloyd iteration refines them).
    * Returns (centroidId, vector) collected to the driver: nlist is small
    * (≤ a few thousand) by design; this is index metadata, not data.
    *
    * The Lloyd mean sums in DECIMAL (exact) and divides as double: a
    * plain double `avg` is partial-aggregation-ORDER-dependent, which
    * would make "deterministic" false in the last ulp across runs — and
    * an index-building operator whose output drifts run-to-run can't be
    * oracled or reproduced. Same trick as `q_embedding_centroid`. */
  def trainCentroids(df: DataFrame, vecCol: String, idCol: String,
                     nlist: Int, refineIterations: Int = 1): Array[(Int, Array[Double])] = {
    var centroids: Array[(Int, Array[Double])] =
      df.orderBy(col(idCol).asc).limit(nlist)
        .select(col(vecCol).cast("array<double>").as("v"))
        .collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }
    (0 until refineIterations).foreach { _ =>
      // Lloyd step: assign → per-(cell, dim) mean. posexplode shuffles
      // (cell, dimIdx, value) triples — narrow rows, one agg; the result
      // (nlist × dim doubles) is index metadata, safe to collect.
      val means = buildIvfIndex(df, vecCol, centroids)
        .select(col("_cell"), posexplode(col(vecCol).cast("array<double>")).as(Seq("_i", "_x")))
        .groupBy(col("_cell"), col("_i"))
        .agg((expr("CAST(SUM(CAST(_x AS DECIMAL(20,10))) AS DOUBLE)") / count(lit(1))).as("_m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
        }
      centroids = centroids.map { case (i, v) => (i, means.getOrElse(i, v)) }
    }
    centroids
  }

  /** argmin over centroids of L2 distance, as pure column expressions —
    * the centroid table is tiny and inlined as literals (no broadcast
    * join needed, no shuffle). */
  def nearestCell(vec: Column, centroids: Array[(Int, Array[Double])]): Column =
    nearestCellWithDist(vec, centroids)._1

  /** [[nearestCell]] plus the squared L2 distance to that centroid, from
    * the same single argmin pass (one l2Sq per centroid, shared by both
    * outputs). The distance is [[Dedup.semanticDedup]]'s keep-farthest
    * rank: for unit-normalized embeddings, max L2 distance to the
    * centroid is exactly min cosine similarity to it. */
  def nearestCellWithDist(vec: Column, centroids: Array[(Int, Array[Double])]): (Column, Column) = {
    val scored: Seq[(Column, Column)] = centroids.toIndexedSeq.map { case (i, cv) =>
      (lit(i), VectorFunctions.l2Sq(vec, typedLit(cv.toSeq)))
    }
    scored.reduceLeft[(Column, Column)] { case ((ai, ad), (bi, bd)) =>
      (when(bd < ad, bi).otherwise(ai), least(ad, bd))
    }
  }

  /** IVF search: restrict the scan to the `nprobe` cells nearest the
    * query, then exact cosine top-k inside them. With a cell-partitioned
    * (or cell-bucketed) index table, the cell filter becomes partition
    * pruning: a 1000-executor cluster reads nprobe/nlist of 100 TB. */
  def ivfTopK(indexed: DataFrame, vecCol: String, idCol: String, cellCol: String,
              centroids: Array[(Int, Array[Double])],
              query: Seq[Float], k: Int, nprobe: Int = 4): DataFrame = {
    val qv = query.map(_.toDouble).toArray
    val probeCells = centroids
      .map { case (i, cv) => (i, l2SqLocal(qv, cv)) }
      .sortBy(_._2).take(nprobe).map(_._1)
    bruteForceTopK(indexed.filter(col(cellCol).isin(probeCells.toIndexedSeq: _*)),
      vecCol, idCol, query, k)
  }

  /** Build the IVF index table: corpus + `_cell` assignment; callers
    * should persist it partitioned by `_cell` for pruning — see
    * [[writeIvfIndex]]. */
  def buildIvfIndex(df: DataFrame, vecCol: String,
                    centroids: Array[(Int, Array[Double])]): DataFrame =
    df.withColumn("_cell", nearestCell(col(vecCol), centroids))

  /** Materialize the IVF index as a parquet dataset PARTITIONED BY cell:
    * the probe's cell filter then becomes partition pruning at the file
    * listing — a 1000-executor cluster probing nprobe of nlist cells
    * reads nprobe/nlist of 100 TB, and never opens the rest. Rows are
    * clustered per cell first (one shuffle) so each cell is a handful of
    * files, not tasks × cells fragments. */
  def writeIvfIndex(df: DataFrame, vecCol: String,
                    centroids: Array[(Int, Array[Double])], path: String): Unit =
    buildIvfIndex(df, vecCol, centroids)
      .repartition(col("_cell"))
      .write.mode("overwrite").partitionBy("_cell").parquet(path)

  /** Incremental IVF maintenance: assign a DELTA of new vectors to the
    * EXISTING centroids and merge them into the materialized index,
    * dynamically overwriting ONLY the touched cell partitions —
    * existing rows in those cells are kept (read back and unioned in),
    * untouched cells' files are never opened or rewritten. A daily
    * embedding delta costs O(delta + touched cells), not a full index
    * rebuild — the same partition-scoped contract as the partitioned
    * connector's upsert.
    *
    * Centroids are FROZEN: probes over the merged index are exactly as
    * if [[writeIvfIndex]] had been rerun over the union corpus with the
    * same centroids (spec-pinned). The standard IVF drift trade rides
    * along: as the delta distribution shifts away from the training
    * corpus, cell balance and probe recall decay — monitor cell-size
    * skew and re-train ([[trainCentroids]] + [[writeIvfIndex]]) when it
    * degrades. Callers own id-uniqueness across ticks (this is an
    * append, not an upsert).
    *
    * CRASH WINDOW: the merged cells are MATERIALIZED (localCheckpoint)
    * before the overwrite — without that barrier the job both reads and
    * deletes the same partitions, and correctness would hang on the
    * committer deferring deletion to commit (object-store committers
    * don't promise that). What remains is the commit itself: dynamic
    * partition overwrite swaps the touched cells' directories
    * non-atomically across partitions, so a crash MID-COMMIT can leave
    * some touched cells new and some old — rerun the same tick to
    * converge (the checkpoint means the rerun re-reads whatever state
    * the files are in). At cluster scale prefer a reliable checkpoint
    * dir + `checkpoint` over `localCheckpoint` (same trade as
    * [[graft.operators.Dedup.connectedComponents]]), or a table format
    * with atomic multi-partition commits. */
  def ivfIndexAppend(delta: DataFrame, vecCol: String,
                     centroids: Array[(Int, Array[Double])], path: String): Unit = {
    val spark = delta.sparkSession
    val assigned = buildIvfIndex(delta, vecCol, centroids)
    // touched-cell ids to the driver: bounded by nlist (index metadata,
    // ≤ a few thousand by design), never by delta size. The literal
    // isin filter prunes the index scan STATICALLY at the file listing
    // — a broadcast join on _cell would need runtime DPP to avoid
    // reading every cell, and DPP is a planner heuristic, not a
    // guarantee.
    val cells = assigned.select(col("_cell")).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    // existing rows of ONLY the touched cells, materialized BEFORE the
    // overwrite below deletes the files this plan reads (ADVICE r9):
    // lineage is severed the same way incrementalMinhash severs it
    // before rewriting its own index table.
    val kept = spark.read.parquet(path)
      .filter(col("_cell").isin(cells: _*))
      .localCheckpoint(true)
    val out = kept.unionByName(assigned.select(kept.columns.map(col).toIndexedSeq: _*))
    out.repartition(col("_cell"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_cell").parquet(path)
  }

  /** Probe a materialized index: scan ONLY the `nprobe` nearest cells
    * (partition-pruned), exact cosine top-k inside them. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                     vecCol: String, idCol: String,
                     centroids: Array[(Int, Array[Double])],
                     query: Seq[Float], k: Int, nprobe: Int = 4): DataFrame = {
    val qv = query.map(_.toDouble).toArray
    val probeCells = centroids
      .map { case (i, cv) => (i, l2SqLocal(qv, cv)) }
      .sortBy(_._2).take(nprobe).map(_._1)
    val pruned = spark.read.parquet(indexPath)
      .filter(col("_cell").isin(probeCells.toIndexedSeq: _*))
    bruteForceTopK(pruned, vecCol, idCol, query, k)
  }

  // ---- Scalar quantization (SQ8, the no-codebook compression path) ----
  //
  // PQ compresses 64× but pays a codebook train/assign; SQ8 is the
  // simpler Faiss-style companion: one affine (min, max) pair PER
  // DIMENSION, each float becomes one int8 — 4× smaller, zero training
  // beyond a min/max pass, and the decode is a multiply-add (no table
  // lookups), so scans over codes stay trivially codegen'd. The right
  // tool when the index must shrink but recall can't afford PQ's
  // sub-space distortion.

  /** Per-dimension (min, max) ranges: ONE posexplode pass,
    * partial-aggregated to dim-cardinality state before the exchange.
    * min/max of floats are exact data values (no arithmetic), so the
    * result — and everything derived from it — is engine-independent.
    * Returned collected: dim pairs of index metadata, never data. */
  def sq8Train(df: DataFrame, vecCol: String): Array[(Double, Double)] =
    df.select(posexplode(col(vecCol)).as(Seq("_d", "_x")))
      .groupBy(col("_d"))
      .agg(min(col("_x").cast("double")).as("_mn"),
        max(col("_x").cast("double")).as("_mx"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getDouble(1), r.getDouble(2)))

  /** Quantization scale for one dimension: 255/(max−min). Kept as a
    * method so the Spark side, the driver, and any oracle replay share
    * ONE expression tree (IEEE-identical doubles). */
  private def sq8Scale(mn: Double, mx: Double): Double = 255.0 / (mx - mn)

  /** Encode: adds `codeCol`, an array<int> of per-dim codes in
    * [−128, 127] — code = clamp(⌊(x−min)·s + 0.5⌋ − 128). Pure unrolled
    * per-dim expressions (dim element_at + arithmetic, like [[pqEncode]]
    * — no higher-order lambdas, one codegen'd scan, no shuffle).
    * A constant dimension (max == min) encodes as 0. Values outside the
    * trained range (a drifted delta batch) clamp to the boundary codes
    * rather than overflowing. Store the codes cast to tinyint for the
    * 4× footprint win; the float column stays in the source table for
    * re-ranking.
    *
    * MATERIALIZE the encoded output (write the index, or checkpoint)
    * before layering [[sq8Error]]/[[sq8TopK]] on top in the same plan:
    * CollapseProject otherwise re-inlines all dim encode expressions
    * into every downstream element_at, and past ~64 dims the fused
    * projection overflows the JVM's 64 KB method limit and the scan
    * silently drops out of codegen (see q_sq8). */
  def sq8Encode(df: DataFrame, vecCol: String,
                stats: Array[(Double, Double)],
                codeCol: String = "_sq"): DataFrame = {
    val codes = stats.toIndexedSeq.zipWithIndex.map { case ((mn, mx), d) =>
      if (mx == mn) lit(0)
      else {
        val x = element_at(col(vecCol), d + 1).cast("double")
        greatest(lit(-128), least(lit(127),
          (floor((x - lit(mn)) * lit(sq8Scale(mn, mx)) + lit(0.5)) - 128).cast("int")))
      }
    }
    df.withColumn(codeCol, array(codes: _*))
  }

  /** Per-vector reconstruction-error report: adds `err_fp` =
    * ⌊max_d |x_d − dequant(code_d)|·10⁹⌋ — the worst-dimension absolute
    * error as a fixed-point long (dequant = min + (code+128)/s). The
    * max runs over identically-computed doubles, so it is
    * order-independent and engine-replayable. Monitor its distribution
    * to decide when SQ8's 4× is too lossy and the corpus needs
    * re-ranking against full-precision vectors. */
  def sq8Error(df: DataFrame, vecCol: String, codeCol: String,
               stats: Array[(Double, Double)]): DataFrame = {
    val errs = stats.toIndexedSeq.zipWithIndex.map { case ((mn, mx), d) =>
      if (mx == mn) abs(element_at(col(vecCol), d + 1).cast("double") - lit(mn))
      else {
        val x = element_at(col(vecCol), d + 1).cast("double")
        val deq = lit(mn) +
          (element_at(col(codeCol), d + 1).cast("double") + lit(128.0)) /
            lit(sq8Scale(mn, mx))
        abs(x - deq)
      }
    }
    df.withColumn("err_fp", floor(greatest(errs: _*) * lit(1e9)).cast("long"))
  }

  /** Asymmetric top-k over SQ8 codes: rank by
    * score_fp = Σ_d wfp_d·(code_d + 128), where wfp_d = ⌊(q_d/s_d)·2²⁴⌋
    * is a per-dim integer weight built from the query ON THE DRIVER
    * (dim longs of metadata). score_fp is rank-equivalent to
    * dot(q, dequant(codes)) up to the vector-independent constant
    * Σ_d q_d·min_d — identical ordering, but the sum is an INTEGER, so
    * it is order-independent and ties break exactly (by id), where a
    * float dot would be at the mercy of engine addition order. Constant
    * dimensions contribute nothing (wfp = 0). The scan touches ONLY the
    * code column (dim bytes/vector as tinyint); global top-k is
    * TakeOrdered — no shuffle of data. */
  def sq8TopK(encoded: DataFrame, codeCol: String, idCol: String,
              stats: Array[(Double, Double)], query: Seq[Float],
              k: Int): DataFrame = {
    require(query.length == stats.length,
      s"query dim ${query.length} != trained dim ${stats.length}")
    val wfp = stats.toIndexedSeq.zip(query).map { case ((mn, mx), q) =>
      if (mx == mn) 0L
      else math.floor(q.toDouble / sq8Scale(mn, mx) * 16777216.0).toLong
    }
    val score = wfp.zipWithIndex.collect { case (w, d) if w != 0L =>
      lit(w) * (element_at(col(codeCol), d + 1).cast("long") + 128L)
    }.reduceOption[Column](_ + _).getOrElse(lit(0L))
    encoded.select(col(idCol), score.as("score_fp"))
      .orderBy(col("score_fp").desc, col(idCol).asc)
      .limit(k)
  }

  private def l2SqLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  // ---- Product quantization (the ANN memory path) ----
  //
  // IVF prunes WHICH vectors a probe reads; PQ shrinks WHAT each read
  // costs: the d-dim float vector (d·4 bytes) becomes m codebook ids
  // (m bytes for k ≤ 256) — a 64-dim float corpus compresses 64× at
  // m=4, which is the difference between an index that fits in cluster
  // memory and one that doesn't at 10⁹–10¹¹ vectors. Search scores the
  // CODES (asymmetric distance: per-subspace lookup tables built from
  // the query on the driver) and only the shortlist ever touches the
  // full-precision vectors again.

  /** Nearest PQ code in subspace `s` — argmin over the codebook of L2
    * distance on the sliced sub-vector, ties to the LOWER code (same
    * contract as [[nearestCell]]). Pure column expressions: the
    * codebook is index metadata, inlined as literals. */
  def pqNearestCode(vec: Column, s: Int, subDim: Int,
                    book: Array[Array[Double]]): Column = {
    val sv = slice(vec, s * subDim + 1, subDim)
    val scored: Seq[(Column, Column)] = book.toIndexedSeq.zipWithIndex.map { case (cv, i) =>
      (lit(i), VectorFunctions.l2Sq(sv, typedLit(cv.toSeq)))
    }
    scored.reduceLeft[(Column, Column)] { case ((ai, ad), (bi, bd)) =>
      (when(bd < ad, bi).otherwise(ai), least(ad, bd))
    }._1
  }

  /** Deterministic PQ codebooks: `m` subspaces of dim/m dims, `k`
    * codes each. Seeding and refinement follow [[trainCentroids]]'s
    * reproducibility contract exactly — seeds are the `k` lowest-id
    * vectors' sub-slices, each Lloyd iteration assigns with
    * ties-to-lower-code and re-centers with DECIMAL-exact means (a
    * plain double avg is partial-aggregation-order-dependent; an index
    * whose codebooks drift run-to-run can't be oracled or rebuilt
    * byte-identically). ALL m subspaces train in ONE pass per
    * iteration: the vector explodes once, each element routes to its
    * (subspace, code, withinDim) cell, one aggregation — not m corpus
    * scans. Returns books(s)(c) = centroid sub-vector; m·k·(dim/m)
    * doubles of index metadata, safe to collect. */
  def trainPq(df: DataFrame, vecCol: String, idCol: String,
              m: Int, k: Int, refineIterations: Int = 1): Array[Array[Array[Double]]] = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val seedVecs = df.orderBy(col(idCol).asc).limit(k)
      .select(col(vecCol).cast("array<double>").as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(seedVecs.length == k, s"need at least k=$k vectors to seed PQ codebooks")
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => seedVecs.map(v => v.slice(s * subDim, (s + 1) * subDim)))
    (0 until refineIterations).foreach { _ =>
      val codes = array((0 until m).map(s =>
        pqNearestCode(col(vecCol), s, subDim, books(s))): _*)
      val means = df
        .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("_i", "_x")),
          codes.as("_codes"))
        .select((col("_i") / subDim).cast("int").as("_s"),
          (col("_i") % subDim).as("_w"),
          element_at(col("_codes"), (col("_i") / subDim).cast("int") + 1).as("_c"),
          col("_x"))
        .groupBy(col("_s"), col("_c"), col("_w"))
        .agg((expr("CAST(SUM(CAST(_x AS DECIMAL(20,10))) AS DOUBLE)") / count(lit(1))).as("_m"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rows) =>
          (key, rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray)
        }
      books = Array.tabulate(m)(s => Array.tabulate(k)(c =>
        means.getOrElse((s, c), books(s)(c))))
    }
    books
  }

  /** Encode a corpus against trained codebooks: adds `_code`, an
    * array<int> of length m (store as the compressed index — m bytes
    * per vector once written as tinyint at k ≤ 256; the full-precision
    * column stays behind in the source table for re-ranking, it does
    * NOT travel with the index). Pure expression argmins — one
    * codegen'd scan, no shuffle. */
  def pqEncode(df: DataFrame, vecCol: String,
               books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val subDim = books(0)(0).length
    df.withColumn("_code",
      array((0 until m).map(s => pqNearestCode(col(vecCol), s, subDim, books(s))): _*))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query builds
    * per-subspace lookup tables dt(s)(c) = ‖q_s − book(s)(c)‖² on the
    * DRIVER (m·k doubles), and each row's approximate distance is m
    * literal-array lookups summed in subspace order — fixed-order
    * double adds, so the score is engine-replayable exactly. The scan
    * touches ONLY the code column (m bytes/vector); global top-k is
    * TakeOrdered, no shuffle of data. Compose with IVF by running this
    * inside the probed cells, and re-rank the shortlist against the
    * full-precision vectors (see `q_ann_pq`). */
  def pqTopKAdc(encoded: DataFrame, codeCol: String, idCol: String,
                books: Array[Array[Array[Double]]], query: Seq[Float],
                k: Int): DataFrame = {
    val subDim = books(0)(0).length
    val qv = query.map(_.toDouble).toArray
    require(qv.length == books.length * subDim,
      s"query dim ${qv.length} != m*subDim ${books.length * subDim}")
    val dts: Array[Array[Double]] = books.zipWithIndex.map { case (book, s) =>
      book.map(cv => l2SqLocal(qv.slice(s * subDim, (s + 1) * subDim), cv))
    }
    val score = dts.toIndexedSeq.zipWithIndex.map { case (dt, s) =>
      element_at(typedLit(dt.toSeq), col(codeCol).getItem(s) + lit(1))
    }.reduceLeft(_ + _)
    encoded.select(col(idCol), score.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** k-nearest-neighbor CLASSIFICATION over the embedding column — the
    * label-transfer workhorse of data curation: propagate a small set
    * of human quality/domain labels onto the unlabeled remainder of the
    * corpus by majority vote among each point's k nearest labeled
    * neighbors (cosine).
    *
    * Shape: one labeled-corpus scan scores every (corpus, query) pair
    * against the BROADCAST query batch, the per-query top-k rides the
    * mergeable bottom-k heap ([[bruteForceTopKBatch]] — Q·tasks·k heap
    * entries cross the exchange, never Q·N scored rows), and the vote
    * is two tiny aggregates over Q·k rows. At 100 TB the labeled side
    * is the big side (scanned once, partial-aggregated); the query
    * batch must fit a broadcast (~10⁵ vectors) — chunk larger batches.
    *
    * Determinism, mirrored by the oracle: neighbor ties break to the
    * lowest id (the heap's contract); the vote ties break to the
    * SMALLEST label (max count, then min label — works for any
    * orderable label type). Output: (qIdCol, label, votes).
    */
  def knnClassify(corpus: DataFrame, vecCol: String, idCol: String,
                  labelCol: String, queries: DataFrame, qVecCol: String,
                  qIdCol: String, k: Int): DataFrame = {
    val top = bruteForceTopKBatch(corpus, vecCol, idCol, queries, qVecCol, qIdCol, k)
    val labels = corpus.select(col(idCol).cast("long").as("_nid"),
      col(labelCol).as("_lbl"))
    val counted = top.select(col(qIdCol), col(idCol).cast("long").as("_nid"))
      .join(labels, "_nid")
      .groupBy(col(qIdCol), col("_lbl"))
      .agg(count(lit(1)).as("_c"))
    val best = counted.groupBy(col(qIdCol)).agg(max(col("_c")).as("_mc"))
    counted.join(best, Seq(qIdCol))
      .filter(col("_c") === col("_mc"))
      .groupBy(col(qIdCol))
      .agg(min(col("_lbl")).as("label"), max(col("_c")).as("votes"))
  }

  /** Greedy Maximal-Marginal-Relevance selection (Carbonell & Goldstein
    * 1998) — pick k items that are RELEVANT to the query but DIVERSE
    * among themselves:
    *
    *   next = argmax_c  λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
    *
    * The curation use: build an eval / few-shot / annotation set that
    * covers the embedding space instead of k near-duplicates of the
    * single best hit.
    *
    * Exactness: vectors are quantized IN-PLAN to integer grids
    * (⌊double(x)·quantScale⌋ — float→double widening and the double
    * multiply are exact-identical in any IEEE engine), relevance and
    * similarity are then integer dot products, λ the exact rational
    * lambdaNum/lambdaDen, and every score the integer
    * `lambdaNum·rel − (lambdaDen−lambdaNum)·maxsim` — so the whole
    * greedy trajectory (including ties → lowest id) replays
    * bit-identically in SQL as k unrolled argmax steps. The first pick
    * scores `lambdaNum·rel` (empty selected set ⇒ no diversity term).
    *
    * Scale shape: the candidate pool stays DISTRIBUTED (persisted two
    * narrow columns); each of the k rounds is one broadcast of the ≤k
    * already-selected vectors, a partial-aggregated max-sim + argmax,
    * and a SINGLE-ROW collect — k·(poolsize) dot products total,
    * driver state k rows. Feed it a bounded pool (an ANN top-M or a
    * filtered slice), not a raw 100 TB corpus — MMR is quadratic in
    * what it guards against, so the pool bound IS the contract.
    *
    * Output: (rank 1..k, idCol, rel_fp, score_fp), rank in selection
    * order. k is capped by the pool size. */
  def mmrSelect(candidates: DataFrame, vecCol: String, idCol: String,
                query: Seq[Float], k: Int,
                lambdaNum: Long = 7L, lambdaDen: Long = 10L,
                quantScale: Long = 1000L): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"need 0 <= lambda = $lambdaNum/$lambdaDen <= 1")
    require(quantScale > 0, s"quantScale must be positive, got $quantScale")
    val spark = candidates.sparkSession
    val qfp: Seq[Long] = query.map(x => math.floor(x.toDouble * quantScale).toLong)
    val vq = transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(quantScale.toDouble)).cast("long"))
    def dotFp(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    val pool = candidates
      .select(col(idCol).cast("long").as("_id"), vq.as("_v"))
      .withColumn("_rel", dotFp(col("_v"), typedLit(qfp)))
      .persist()
    try {
      var selected = Vector.empty[(Long, Long, Long)] // (id, rel_fp, score_fp)
      (1 to k).foreach { _ =>
        val selIds = selected.map(_._1)
        val rem = if (selIds.isEmpty) pool
          else pool.filter(!col("_id").isin(selIds: _*))
        val scored =
          if (selIds.isEmpty) rem.withColumn("_score", lit(lambdaNum) * col("_rel"))
          else {
            val selVecs = pool.filter(col("_id").isin(selIds: _*))
              .select(col("_v").as("_sv"))
            rem.crossJoin(broadcast(selVecs))
              .groupBy(col("_id"), col("_rel"))
              .agg(max(dotFp(col("_v"), col("_sv"))).as("_ms"))
              .withColumn("_score",
                lit(lambdaNum) * col("_rel") - lit(lambdaDen - lambdaNum) * col("_ms"))
          }
        // single-row argmax: (score DESC, id ASC) via max(struct(score, -id))
        val head = scored
          .agg(max(struct(col("_score"), (-col("_id")).as("_ni"),
            col("_rel").as("_r")))).head()
        if (!head.isNullAt(0)) {
          val st = head.getStruct(0)
          selected :+= ((-st.getLong(1), st.getLong(2), st.getLong(0)))
        }
      }
      import scala.jdk.CollectionConverters._
      val rows = selected.zipWithIndex.map { case ((id, rel, sc), i) =>
        org.apache.spark.sql.Row(i + 1L, id, rel, sc)
      }
      spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(idCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rel_fp", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score_fp", org.apache.spark.sql.types.LongType))))
    } finally pool.unpersist(false)
  }

  /** Per-DIMENSION embedding drift between two corpus releases — the
    * vector-space leg of the snapshot-diff gate (text features:
    * [[graft.operators.Analytics.snapshotKs]]; unigrams:
    * [[graft.operators.Curation.jsDivergence]]): a re-embedded release,
    * an encoder upgrade, or a content shift moves the mean embedding,
    * and the per-dim decomposition says WHERE. Each side posexplodes
    * once to (dim, ⌊v·10^scale⌋) longs and partial-aggregates to exact
    * DECIMAL(38,0) per-dim moments — the exchange carries
    * dims × partials, never vectors; means, the mean shift, the pooled
    * per-dim sd ([[graft.operators.Analytics.powerAnalysis]]'s √((v_a+v_b)/2)
    * chain), and the standardized shift are pinned doubles over those
    * integers (`q_embedding_drift` replays via HUGEINT). Dims with
    * undefined pooled sd (constant on a side) surface null std_delta.
    *
    * Output: (dim, n_a, n_b, mean_a, mean_b, delta, sd_pooled,
    * std_delta), one row per dimension. */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String,
                     scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0, 9], got $scale")
    val p = math.pow(10.0, scale)
    val d38 = "decimal(38,0)"
    def side(df: DataFrame, s: String) = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "_v")))
      .select(col("dim"), lit(s).as("_s"),
        floor(col("_v").cast("double") * lit(p)).cast(d38).as("_x"))
    val agg = side(a, "a").unionAll(side(b, "b"))
      .groupBy(col("dim"), col("_s"))
      .agg(count(lit(1)).cast(d38).as("_n"), sum(col("_x")).as("_sx"),
        sum(col("_x") * col("_x")).as("_sxx"))
    def half(s: String) = agg.filter(col("_s") === s)
      .select(col("dim"), col("_n").as(s"_n$s"),
        col("_sx").as(s"_sx$s"), col("_sxx").as(s"_sxx$s"))
    val j = half("a").join(half("b"), Seq("dim"))
    def mean(s: String) =
      col(s"_sx$s").cast("double") / col(s"_n$s").cast("double") / lit(p)
    def varD(s: String) = {
      val n = col(s"_n$s")
      when(n > 1, (n * col(s"_sxx$s") - col(s"_sx$s") * col(s"_sx$s")).cast("double") /
        (n * (n - 1)).cast("double") / lit(p) / lit(p))
    }
    val delta = mean("b") - mean("a")
    val sd = when(varD("a") + varD("b") >= 0.0, sqrt((varD("a") + varD("b")) / 2.0))
    j.select(col("dim"), col("_na").cast("long").as("n_a"),
      col("_nb").cast("long").as("n_b"), mean("a").as("mean_a"),
      mean("b").as("mean_b"), delta.as("delta"), sd.as("sd_pooled"),
      when(sd > 0.0, abs(delta) / sd).as("std_delta"))
  }

  /** Top PRINCIPAL COMPONENT of an embedding column by replayable
    * integer power iteration — the direction-of-most-variance readout
    * behind whitening checks, anisotropy audits ("is the embedding
    * space collapsing onto one axis?") and SemDeDup-style preprocessing.
    *
    * Exactness & scale: ONE exploded-products pass per corpus computes
    * the d(d+1)/2 upper-triangle second moments Σ xᵢxⱼ over `scale`-
    * quantized components (exact DECIMAL(38,0); the exchange carries d²
    * partials per task, never vectors), plus the d first moments. The
    * centered scatter M = n·Σxx − s·sᵀ (an exact integer multiple of
    * the covariance — eigenvectors unchanged) is d²-bounded, so the
    * `iters` power steps run DRIVER-SIDE in BigInt (the
    * [[graft.operators.Preference]] Bradley–Terry driver-MM precedent):
    * v₀ = vScale·e₀, then vₜ₊₁ = (M vₜ)·vScale / max|M vₜ| with
    * truncating division — the identical arithmetic an external engine
    * replays with 128-bit ints and `//` (`q_pca_power`). No floats
    * anywhere until the reported variance, a pinned double sequence
    * from the exact Rayleigh quotient.
    *
    * Output: one row per dimension — (dim, loading_fp [v at vScale
    * fixed point; sign is iteration-determined], n, var_component
    * [biased variance along the component, original units]). */
  def pcaPowerComponent(df: DataFrame, vecCol: String, dim: Int,
                        iters: Int = 8, scale: Int = 3,
                        vScale: Long = 1000000L): DataFrame = {
    require(dim >= 2 && dim <= 512, s"dim must be in [2, 512], got $dim")
    require(iters >= 1 && iters <= 32, s"iters must be in [1, 32], got $iters")
    require(scale >= 0 && scale <= 6, s"scale must be in [0, 6], got $scale")
    val p = math.pow(10.0, scale)
    // r19 (guide §2.3/§2.4): the moment pass was TWO jobs over a
    // localCheckpoint'd quantized table — a posexplode for the d first
    // moments, then a nested-transform lambda (CodegenFallback,
    // interpreted) exploding d(d+1)/2 structs PER ROW through a shuffle
    // into a decimal aggregate. The moments are a bounded (d²) driver
    // value by the operator's own design, so one treeAggregate over the
    // vector scan computes the identical exact integers — same
    // quantization (floor(v·p) → long, NaN → 0 like Spark's floor),
    // same overflowing-product error class (Math.multiplyExact ≙ the
    // old ANSI long multiply), sums escalating to BigInt exactly where
    // the old DECIMAL(38,0) sums were exact — with zero shuffles and
    // zero per-row allocation. SimilaritySpec's pca tests pin outputs.
    val nTri = dim * (dim + 1) / 2
    val acc = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol).cast("array<double>").as("_v"))
      .queryExecution.toRdd
      .treeAggregate(new PcaMomentAcc(dim, nTri))(
        seqOp = (a, row) => {
          val arr = row.getArray(0)
          val x = a.scratchBuf // reused across rows; add() consumes it fully
          var i = 0
          while (i < dim) { x(i) = math.floor(arr.getDouble(i) * p).toLong; i += 1 }
          a.add(x)
        },
        combOp = (a, b) => a.merge(b))
    require(acc.n > 0, "pcaPowerComponent: empty input")
    val n = acc.n
    val sums = (0 until dim).map(i => i -> (acc.sumAt(i), n)).toMap
    val prods = (for (i <- 0 until dim; j <- i until dim) yield
      (i, j) -> acc.prodAt(i * dim - i * (i - 1) / 2 + (j - i))).toMap
    val bigN = BigInt(n)
    def m(i: Int, j: Int): BigInt = {
      val sxx = prods.getOrElse(if (i <= j) (i, j) else (j, i), BigInt(0))
      bigN * sxx - sums(i)._1 * sums(j)._1
    }
    val vs = BigInt(vScale)
    var v = Array.tabulate(dim)(i => if (i == 0) vs else BigInt(0))
    var t = 0
    while (t < iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + m(i, j) * v(j)))
      val mx = w.map(_.abs).max
      require(mx.signum != 0,
        "pcaPowerComponent: zero iterate (degenerate scatter) — raise scale or check input")
      // BigInt `/` truncates toward zero — the same semantics as SQL
      // integer division, so every iterate replays externally
      v = w.map(wi => wi * vs / mx)
      t += 1
    }
    val rayleighNum = (0 until dim).foldLeft(BigInt(0))((acc, i) =>
      acc + v(i) * (0 until dim).foldLeft(BigInt(0))((a2, j) => a2 + m(i, j) * v(j)))
    val rayleighDen = v.foldLeft(BigInt(0))((acc, vi) => acc + vi * vi)
    val lambda = rayleighNum / rayleighDen // eigenvalue of the n²p²-scaled scatter
    val varComponent = lambda.toDouble / n / n / p / p
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      (0 until dim).map(i => org.apache.spark.sql.Row(
        i, v(i).toLong, n, varComponent)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dim",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("loading_fp",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("var_component",
          org.apache.spark.sql.types.DoubleType))))
  }
}

/** Exact integer moment accumulator for
  * [[Similarity.pcaPowerComponent]]'s one-pass treeAggregate (r19):
  * d first moments + the d(d+1)/2 upper-triangle second moments of the
  * quantized vectors. Per-row products use `Math.multiplyExact` — the
  * same overflow-throws contract as the old plan's ANSI long multiply —
  * and the running sums accumulate in Long, escalating a whole array to
  * BigInt the moment one element would overflow: exactly where the old
  * DECIMAL(38,0) aggregation was exact, at Long-add speed on every
  * realistic input. Driver-bounded by construction (d ≤ 512). */
private[operators] final class PcaMomentAcc(dim: Int, nTri: Int) extends Serializable {
  var n = 0L
  // reusable per-row quantization buffer (ADVICE r19: the seqOp used to
  // allocate a dim-length array per row — avoidable GC churn at d=512).
  // One accumulator is owned by one task thread; transient so a shipped
  // partial never carries it.
  @transient private lazy val scratch: Array[Long] = new Array[Long](dim)
  def scratchBuf: Array[Long] = scratch
  private var sums: Array[Long] = new Array[Long](dim)
  private var sumsBig: Array[BigInt] = null
  private var prods: Array[Long] = new Array[Long](nTri)
  private var prodsBig: Array[BigInt] = null

  private def escalateSums(): Unit =
    if (sumsBig == null) { sumsBig = sums.map(BigInt(_)); sums = null }
  private def escalateProds(): Unit =
    if (prodsBig == null) { prodsBig = prods.map(BigInt(_)); prods = null }

  def add(x: Array[Long]): PcaMomentAcc = {
    n += 1
    var i = 0
    while (i < dim) {
      val v = x(i)
      if (sumsBig == null) {
        val s = sums(i); val r = s + v
        if (((s ^ r) & (v ^ r)) < 0L) { escalateSums(); sumsBig(i) += BigInt(v) }
        else sums(i) = r
      } else sumsBig(i) += BigInt(v)
      i += 1
    }
    var k = 0
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val xx = Math.multiplyExact(x(i), x(j))
        if (prodsBig == null) {
          val s = prods(k); val r = s + xx
          if (((s ^ r) & (xx ^ r)) < 0L) { escalateProds(); prodsBig(k) += BigInt(xx) }
          else prods(k) = r
        } else prodsBig(k) += BigInt(xx)
        k += 1; j += 1
      }
      i += 1
    }
    this
  }

  /** Merge partials — O(log partitions) calls, so both sides just
    * escalate to BigInt (allocation-cheap at that frequency, and it
    * keeps the arithmetic one code path). */
  def merge(o: PcaMomentAcc): PcaMomentAcc = {
    n += o.n
    escalateSums(); o.escalateSums()
    escalateProds(); o.escalateProds()
    var i = 0
    while (i < dim) { sumsBig(i) += o.sumsBig(i); i += 1 }
    var k = 0
    while (k < nTri) { prodsBig(k) += o.prodsBig(k); k += 1 }
    this
  }

  def sumAt(i: Int): BigInt =
    if (sumsBig != null) sumsBig(i) else BigInt(sums(i))
  def prodAt(k: Int): BigInt =
    if (prodsBig != null) prodsBig(k) else BigInt(prods(k))
}
