package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — a scale-path operator with no
  * reference analog (the reference delegates every join to MySQL,
  * SURVEY.md §2.9; skew is a distributed-shuffle problem by nature).
  *
  * Mechanics: the probe side gets a per-ROW salt in [0, buckets); the
  * build side is replicated once per salt value; the join key becomes
  * (keys…, salt). A key with 10⁹ rows that would hash into one reducer
  * now spreads across `buckets` tasks, at the cost of `buckets`× the
  * build side's shuffle volume — so keep the build side the SMALLER
  * input, exactly like a broadcast decision.
  *
  * When to reach for this instead of the built-ins:
  *  - AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  *    already splits oversized sort-merge partitions at runtime — prefer
  *    it when it applies. Salting is the explicit tool for when it
  *    cannot: shuffled HASH joins AQE won't split, skew that feeds a
  *    downstream same-key aggregation, or AQE disabled/unavailable
  *    (e.g. inside Structured Streaming micro-batches).
  *  - If the build side fits the broadcast threshold, `broadcast()` and
  *    no salt at all — skew is only a shuffle problem.
  *
  * Join-type contract: the probe (left) side sees ONE full copy of the
  * build side per salt value, so `inner`, `left_outer`, `left_semi`
  * and `left_anti` are exact. Right/full-outer would multiply unmatched
  * build rows by the salt count and are rejected.
  *
  * The salt is `xxhash64(every probe column) mod buckets` — per-ROW
  * content, no correlation with the key alone (hashing only the KEY
  * would send the hot key back to one bucket). Content-hashing keeps
  * the salt DETERMINISTIC under task retries: a recomputed map task
  * assigns every row the same bucket, so a lost-executor recompute can
  * never duplicate or drop rows across reducers (the
  * nondeterministic-expression-above-a-shuffle hazard that
  * `monotonically_increasing_id`/`rand` salts carry). The residual
  * caveat: FULLY identical duplicate probe rows share a bucket — key
  * skew (hot key, varying payload) spreads; identical-row skew does
  * not. Oracled in SparkEntry (`q_salted_join`) against the plain
  * un-salted join in DuckDB.
  */
object Skew {

  private val SaltCol = "_graft_salt"

  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val ok = Set("inner", "left_outer", "left", "left_semi", "semi", "left_anti", "anti")
    require(ok.contains(joinType.toLowerCase),
      s"saltedJoin supports $ok; right/full joins would duplicate unmatched build rows")
    val salted = probe.withColumn(SaltCol,
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong)).cast("int"))
    val replicated = build.withColumn(SaltCol,
      explode(array((0 until buckets).map(i => lit(i)): _*)))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
