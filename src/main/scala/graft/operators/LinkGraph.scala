package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph importance for web-curation priors.
  *
  * Large-crawl curation ranks registered domains by link structure and
  * uses the rank as a quality prior — sampling weights, crawl-frontier
  * priority, per-domain caps (the CommonCrawl-style "domain rank" every
  * serious web corpus pipeline carries). This is the PageRank power
  * iteration in EXACT fixed-point integer arithmetic:
  *
  *   r'(v) = (1−d)/N  +  d · Σ_{u→v} r(u)/outdeg(u)
  *
  * with every quantity a scaled BIGINT (default scale 10¹²) and every
  * division integer division — so the result is independent of
  * partitioning, aggregation order, and engine (long sums commute
  * exactly; double sums don't), and a SQL engine replays the whole
  * iteration bit-identically (`q_pagerank`'s DuckDB oracle unrolls it).
  * The deterministic-rounding loss (≤ |E| ulps of 10⁻¹² per iteration)
  * is far below any curation decision threshold.
  *
  * Semantics notes, all mirrored by the oracle:
  *  - Dangling nodes (no out-edges) contribute nothing — their mass
  *    decays rather than redistributing (the "drop dangling mass"
  *    PageRank variant). Total mass is then < 1; ranks remain
  *    comparable, which is all a prior needs.
  *  - Parallel (duplicate) edges act as weights: each edge row carries
  *    r/outdeg where outdeg counts ROWS. Pre-`distinct` the edge set
  *    for the unweighted graph.
  *  - Nodes = src ∪ dst of the edge table.
  *
  * Scale shape (100 TB): ranks are |V| rows (domains — millions), edges
  * |E| (billions). Per iteration: one join of ranks to edges on src,
  * one per-dst sum — partial aggregation collapses each task's
  * contributions before the exchange, so the shuffle carries ≤
  * tasks × |V| rows, not |E|. The edge table is repartitioned by src
  * ONCE and persisted, so every iteration's join reuses that
  * partitioning (one-sided shuffle of the small rank table only); each
  * iteration's result is localCheckpointed and its predecessor freed,
  * the same bounded-lineage contract as
  * [[Dedup.connectedComponents]] — swap in a reliable `checkpoint` dir
  * on a real cluster. */
object LinkGraph {

  /** Fixed-point PageRank. Returns (node, rank_fp) — rank scaled by
    * `scale` as BIGINT; divide by `scale` for the [0,1] value.
    *
    * @param edges     edge table, one row per (src, dst) link
    * @param iterations power-iteration count (rank-stable orderings
    *                  typically need < 10; this is a prior, not an
    *                  eigensolve)
    * @param dampNum/dampDen damping d as an exact rational (85/100) */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5,
               dampNum: Long = 85L, dampDen: Long = 100L,
               scale: Long = 1000000000000L,
               weightCol: Option[String] = None): DataFrame =
    pageRankIter(edges, srcCol, dstCol, iterations, dampNum, dampDen, scale,
      weightCol, priorRanks = None)

  /** Warm-start continuation: run `iterations` more power iterations
    * from a PREVIOUS run's (node, rank_fp) output instead of the
    * uniform init — the daily-refresh path (yesterday's ranks are a far
    * better starting point than uniform, so an updated graph re-ranks
    * in 1–2 iterations instead of a full cold run). Exactly the same
    * recurrence: on an UNCHANGED graph,
    * `pageRankFrom(pageRank(g, k), m) == pageRank(g, k+m)` bit-for-bit
    * (spec-pinned). Nodes NEW to the graph (absent from `priorRanks`)
    * start at the uniform scale/N; departed nodes' prior rows are
    * ignored. */
  def pageRankFrom(edges: DataFrame, priorRanks: DataFrame,
                   srcCol: String, dstCol: String,
                   iterations: Int = 2,
                   dampNum: Long = 85L, dampDen: Long = 100L,
                   scale: Long = 1000000000000L,
                   weightCol: Option[String] = None): DataFrame =
    pageRankIter(edges, srcCol, dstCol, iterations, dampNum, dampDen, scale,
      weightCol, priorRanks = Some(priorRanks))

  private def pageRankIter(edges: DataFrame, srcCol: String, dstCol: String,
                           iterations: Int, dampNum: Long, dampDen: Long,
                           scale: Long, weightCol: Option[String],
                           priorRanks: Option[DataFrame]): DataFrame = {
    require(iterations >= 0 && dampNum >= 0 && dampNum <= dampDen,
      s"need 0 <= d = $dampNum/$dampDen <= 1 and iterations >= 0")
    val spark = edges.sparkSession
    // weighted graphs (link counts, click counts) split a source's mass
    // proportionally: contribution = (r·w) div Σw — still exact longs.
    // Weights are bounded so r·w stays inside a long: r ≤ scale, so
    // w ≤ Long.Max/scale (~9.2·10⁶ at the default scale) — checked
    // eagerly below (silent wrap-around would corrupt ranks, and an
    // engine replaying in wider arithmetic would silently diverge).
    val e = edges.select(col(srcCol).cast("long").as("_src"),
      col(dstCol).cast("long").as("_dst"),
      weightCol.map(w => col(w).cast("long")).getOrElse(lit(1L)).as("_w"))
    weightCol.foreach { _ =>
      val mm = e.agg(min(col("_w")), max(col("_w"))).head()
      require(!mm.isNullAt(0) && mm.getLong(0) >= 0,
        s"edge weights must be non-negative, found min ${mm.get(0)}")
      require(mm.getLong(1) <= Long.MaxValue / scale,
        s"edge weight ${mm.getLong(1)} overflows rank·weight at scale $scale")
    }
    // nodes and out-weights are iteration-invariant: compute once,
    // persist; the edge table is partitioned by src once so each
    // iteration's rank join shuffles only the rank side.
    val nodes = e.select(col("_src").as("node"))
      .union(e.select(col("_dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty edge table")
    val outdeg = e.groupBy(col("_src")).agg(sum(col("_w")).as("_tw"))
    // persist (NOT localCheckpoint): a checkpoint erases the plan's
    // outputPartitioning, so on a graph whose rank table exceeds the
    // broadcast threshold every iteration would re-shuffle the EDGES
    // too. Cached, the src partitioning survives and each iteration's
    // join moves only the |V|-sized rank side — which Spark broadcasts
    // outright at domain-graph sizes (plan-audited: BroadcastHashJoin,
    // edges never exchanged).
    val esrc = e.join(outdeg, "_src")
      .repartition(col("_src")).persist()
    esrc.count()
    // base = scale·(1−d)/N and init = scale/N, both exact left-assoc
    // integer division (mirrored verbatim in the oracle)
    val base = scale * (dampDen - dampNum) / dampDen / n
    val init = priorRanks match {
      case Some(pr) =>
        nodes.join(pr.select(col("node"), col("rank_fp").as("_pr")), Seq("node"), "left")
          .select(col("node"), coalesce(col("_pr"), lit(scale / n)).as("_r"))
      case None => nodes.withColumn("_r", lit(scale / n))
    }
    var ranks = init.localCheckpoint(true)
    var ranksRdd = Dedup.checkpointedRdd(ranks)
    (0 until iterations).foreach { _ =>
      // zero-total sources (all-zero weights) emit nothing — same
      // decay contract as dangling nodes
      val contribs = esrc.filter(col("_tw") > 0)
        .join(ranks.withColumnRenamed("node", "_src"), "_src")
        .select(col("_dst"), expr("CAST((_r * _w) div _tw AS BIGINT)").as("_c"))
        .groupBy(col("_dst")).agg(sum(col("_c")).as("_s"))
      val next = nodes.join(contribs.withColumnRenamed("_dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"CAST(($dampNum * COALESCE(_s, 0L)) div $dampDen AS BIGINT)")).as("_r"))
        .localCheckpoint(true)
      val nextRdd = Dedup.checkpointedRdd(next)
      // superseded checkpoint blocks freed the moment the successor is
      // materialized (the connectedComponents lineage contract)
      ranksRdd.foreach(_.unpersist(false))
      ranks = next; ranksRdd = nextRdd
    }
    esrc.unpersist(false)
    Dedup.checkpointedRdd(nodes).foreach(_.unpersist(false))
    ranks.select(col("node"), col("_r").as("rank_fp"))
  }

  /** Per-node triangle counts of an undirected graph — the local
    * clustering signal (community density, spam-farm detection: link
    * farms are triangle-poor stars, organic neighborhoods are
    * triangle-rich). Degree-ordered wedge counting, the standard
    * distributed algorithm:
    *
    *  1. canonicalize: self-loops dropped, (u, v) with u < v, distinct;
    *  2. ORIENT each edge from its (degree, id)-smaller endpoint to the
    *     larger — every wedge is then enumerated exactly once AT ITS
    *     LOWEST-DEGREE VERTEX, bounding per-vertex wedge work by
    *     O(arboricity²) instead of O(max_degree²): a 10⁶-degree hub
    *     generates no wedges unless BOTH neighbors out-rank it;
    *  3. wedge self-join on the oriented source + one hash join back to
    *     the undirected edge set closes the triangles;
    *  4. each triangle credits its three corners (explode + count).
    *
    * Every step is a deterministic join/aggregate — no randomness, no
    * floats — so the counts replay exactly in SQL. Output: (node,
    * n_triangles), only nodes in ≥ 1 triangle (join with the node set
    * for a zero-filled left side if needed). */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") < col("v")) // drops self-loops AND null endpoints
      .distinct()
      .localCheckpoint(true) // 3 readers: degrees, orientation, closing join
    val deg = und.select(col("u").as("n")).unionAll(und.select(col("v")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("_du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("_dv")), "v")
      .select(
        when(col("_du") < col("_dv") ||
          (col("_du") === col("_dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("_du") < col("_dv") ||
          (col("_du") === col("_dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("apex"), col("e1.t").as("b"), col("e2.t").as("c"))
    wedges
      .join(und, col("u") === least(col("b"), col("c")) &&
        col("v") === greatest(col("b"), col("c")))
      .select(explode(array(col("apex"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan et
    * al. 2007, the deterministic synchronous variant) — the
    * domain-clustering signal a web-curation pipeline uses to group
    * registered domains into link communities (mirror farms, topic
    * hubs) before per-community caps or sampling.
    *
    * Semantics, mirrored exactly by the SQL oracle:
    *  - the graph is UNDIRECTED: edges are canonicalized to distinct
    *    (u < v) pairs (self-loops and null endpoints dropped), then
    *    expanded to both directions;
    *  - labels start as the node's own id;
    *  - each iteration, EVERY node simultaneously adopts the most
    *    frequent label among its neighbors PLUS ITS OWN current label
    *    (the self-vote damps the 2-cycle oscillation synchronous LPA
    *    exhibits on bipartite structure); ties break to the SMALLEST
    *    label — so the whole update is integer counts + a
    *    deterministic argmax, no randomness, no floats, and a fixed
    *    iteration count replays bit-identically in any engine.
    *
    * Scale shape (100 TB): per iteration one join of the |V|-row label
    * table to the |E|-row edge table (edges repartitioned by src ONCE
    * and persisted — every iteration reuses that partitioning and
    * shuffles only the label side, which Spark broadcasts outright at
    * domain-graph sizes), then a (node, label) count with map-side
    * partial aggregation, then a per-node argmax. Each iteration's
    * labels are localCheckpointed and the predecessor's blocks freed —
    * the bounded-lineage contract shared with [[pageRank]] and
    * [[Dedup.connectedComponents]].
    *
    * Output: (node, label) — nodes sharing a label are one community. */
  /** Bounded k-core peeling (Seidman 1983): repeatedly remove nodes
    * with degree < k; what survives `rounds` peels approximates the
    * k-core — the dense sub-graph signal (a link farm's mutual-link
    * cluster survives high-k peeling; organic long-tail sites do not),
    * complementing [[triangleCounts]]' local density with a global
    * one. Exact k-core iterates to a fixpoint; a FIXED round budget
    * keeps the operator's cost and its SQL replay bounded — and peeling
    * converges geometrically on real graphs, so a handful of rounds is
    * the production setting anyway. The oracle unrolls the same rounds
    * exactly (all-integer degrees, no ordering sensitivity).
    *
    * Per round: one degree aggregate over the surviving edge set + one
    * semi-join filter — edges partitioned once, survivors
    * localCheckpointed, predecessors freed ([[pageRank]]'s lineage
    * contract). Output: (node, degree) of the survivors, degree
    * recomputed WITHIN the surviving sub-graph. */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int, rounds: Int = 5): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1 and rounds >= 1, got k=$k rounds=$rounds")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") < col("v"))
      .distinct()
      .localCheckpoint(true)
    def degreesAmong(alive: DataFrame): DataFrame = {
      val e = und
        .join(alive.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(alive.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    }
    var alive = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node"))).distinct()
      .localCheckpoint(true)
    var aliveRdd = Dedup.checkpointedRdd(alive)
    (1 to rounds).foreach { _ =>
      val next = degreesAmong(alive).filter(col("degree") >= k)
        .select(col("node")).localCheckpoint(true)
      val nextRdd = Dedup.checkpointedRdd(next)
      aliveRdd.foreach(_.unpersist(false))
      alive = next; aliveRdd = nextRdd
    }
    // materialize the result BEFORE freeing the edge/survivor blocks —
    // a locally-checkpointed RDD cannot recompute once unpersisted
    val out = degreesAmong(alive).localCheckpoint(true)
    Dedup.checkpointedRdd(und).foreach(_.unpersist(false))
    aliveRdd.foreach(_.unpersist(false))
    out
  }

  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int = 3): DataFrame =
    labelPropagationIter(edges, srcCol, dstCol, iterations, priorLabels = None)

  /** Warm-start continuation of [[labelPropagation]] — run `iterations`
    * more synchronous rounds from a PREVIOUS run's (node, label) output
    * instead of self-labels: the daily-refresh path for a slowly
    * changing link graph. On an UNCHANGED graph,
    * `labelPropagationFrom(labelPropagation(g, k), m) ==
    * labelPropagation(g, k + m)` bit-for-bit (spec-pinned, the
    * [[pageRankFrom]] contract). Nodes NEW to the graph start at their
    * own id; departed nodes' prior rows are ignored. */
  def labelPropagationFrom(edges: DataFrame, priorLabels: DataFrame,
                           srcCol: String, dstCol: String,
                           iterations: Int = 1): DataFrame =
    labelPropagationIter(edges, srcCol, dstCol, iterations,
      priorLabels = Some(priorLabels))

  private def labelPropagationIter(edges: DataFrame, srcCol: String,
                                   dstCol: String, iterations: Int,
                                   priorLabels: Option[DataFrame]): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") < col("v"))
      .distinct()
    val dir = und.select(col("u").as("_src"), col("v").as("_dst"))
      .unionAll(und.select(col("v").as("_src"), col("u").as("_dst")))
      .repartition(col("_src")).persist()
    dir.count()
    val nodes = dir.select(col("_src").as("node")).distinct().localCheckpoint(true)
    val init = priorLabels match {
      case Some(pr) =>
        nodes.join(pr.select(col("node"), col("label").as("_pl")), Seq("node"), "left")
          .select(col("node"), coalesce(col("_pl"), col("node")).as("label"))
      case None => nodes.withColumn("label", col("node"))
    }
    var labels = init.localCheckpoint(true)
    var labelsRdd = Dedup.checkpointedRdd(labels)
    (0 until iterations).foreach { _ =>
      val votes = dir.join(labels.withColumnRenamed("node", "_src"), "_src")
        .select(col("_dst").as("node"), col("label"))
        .unionAll(labels.select(col("node"), col("label")))
      // argmax by (count DESC, label ASC): max of struct(c, -label)
      // compares count first, then the negated label (bigger = smaller
      // label) — one aggregate, no window over the vote table.
      val next = votes.groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("node"))
        .agg(max(struct(col("_c"), (-col("label")).as("_nl"))).as("_m"))
        .select(col("node"), (-col("_m._nl")).as("label"))
        .localCheckpoint(true)
      val nextRdd = Dedup.checkpointedRdd(next)
      labelsRdd.foreach(_.unpersist(false))
      labels = next; labelsRdd = nextRdd
    }
    dir.unpersist(false)
    Dedup.checkpointedRdd(nodes).foreach(_.unpersist(false))
    labels
  }
}
