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
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0 && dampNum >= 0 && dampNum <= dampDen,
      s"need 0 <= d = $dampNum/$dampDen <= 1 and iterations >= 0")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).cast("long").as("_src"),
      col(dstCol).cast("long").as("_dst"))
    // nodes and out-degrees are iteration-invariant: compute once,
    // persist; the edge table is partitioned by src once so each
    // iteration's rank join shuffles only the rank side.
    val nodes = e.select(col("_src").as("node"))
      .union(e.select(col("_dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty edge table")
    val outdeg = e.groupBy(col("_src")).agg(count(lit(1)).as("_deg"))
    val esrc = e.join(outdeg, "_src")
      .repartition(col("_src")).localCheckpoint(true)
    // base = scale·(1−d)/N and init = scale/N, both exact left-assoc
    // integer division (mirrored verbatim in the oracle)
    val base = scale * (dampDen - dampNum) / dampDen / n
    var ranks = nodes.withColumn("_r", lit(scale / n)).localCheckpoint(true)
    var ranksRdd = Dedup.checkpointedRdd(ranks)
    (0 until iterations).foreach { _ =>
      val contribs = esrc.join(ranks.withColumnRenamed("node", "_src"), "_src")
        .select(col("_dst"), expr("CAST(_r div _deg AS BIGINT)").as("_c"))
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
    Dedup.checkpointedRdd(esrc).foreach(_.unpersist(false))
    Dedup.checkpointedRdd(nodes).foreach(_.unpersist(false))
    ranks.select(col("node"), col("_r").as("rank_fp"))
  }
}
