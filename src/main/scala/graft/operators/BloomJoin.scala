package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** Explicit bloom-filter join pre-filtering — the shuffle-volume killer
  * for the 100 TB join whose build side is too big to BROADCAST as a
  * hash table but whose key set fits a few MB of bloom bits: filter the
  * probe side AT THE SCAN with a might-contain test before any
  * exchange, so rows that cannot match never enter the shuffle.
  *
  * Spark ships the machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the internals of its runtime row-level
  * filter) but injects it only under AQE's own heuristics. This
  * operator makes the rewrite explicit and deterministic: build the
  * filter with one aggregate on the build side (a mergeable sketch —
  * map tasks combine locally, one blob reaches the driver), embed the
  * blob as a plan literal, filter the probe scan, then run the EXACT
  * join. Bloom false positives survive the pre-filter but die in the
  * join — results are byte-identical to the unfiltered join, which is
  * exactly what the oracle replays (`q_bloom_join`).
  *
  * Keys are bloom-tested as `xxhash64(key)` longs (the same trick
  * Spark's injected filter uses), so any key type works and the filter
  * sees uniform 8-byte items. Null keys never match an equi-join, and
  * the aggregate skips them.
  */
object BloomJoin {

  /** Build the bloom blob over `dim`'s `dimKey` values:
    * `expectedItems <= 0` counts the build side first (one cheap agg —
    * at 100 TB pass the known cardinality instead). Returns null iff
    * the build side is empty. */
  def buildFilter(dim: DataFrame, dimKey: String, expectedItems: Long = -1L): Array[Byte] = {
    val items = if (expectedItems > 0) expectedItems else dim.count()
    if (items == 0) return null
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(dimKey))), items)
    dim.select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** The might-contain pre-filter as a Column, from a prebuilt blob. */
  def mightContain(blob: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(blob)),
      ColumnBridge.expression(xxhash64(key))))

  /** `fact ⋈ dim` with the probe side bloom-pre-filtered: same rows as
    * the plain join (`joinType` "inner", "left_semi", …), minus the
    * shuffle traffic for fact rows whose key cannot be in `dim`. The
    * pre-filter sits directly above the fact scan (a deterministic
    * filter — pushes into the source where the format supports it);
    * an empty build side short-circuits to an empty result without
    * scanning the fact. */
  def join(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
           joinType: String = "inner", expectedItems: Long = -1L): DataFrame = {
    val blob = buildFilter(dim, dimKey, expectedItems)
    val pre =
      if (blob == null) fact.filter(lit(false))
      else fact.filter(mightContain(blob, col(factKey)))
    pre.join(dim, pre(factKey) === dim(dimKey), joinType)
  }
}
