package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Pluggable source/sink, the Spark re-expression of the reference
  * transport contract (taskrabbit/forklift `lib/forklift/base/connection.rb:3-64`:
  * `connect/disconnect/read/write/pipe/exec`). Differences by design:
  *
  *  - `read` returns a lazy [[DataFrame]], not driver-resident batches.
  *    The reference pages `LIMIT offset,limit` loops through driver memory
  *    1000 rows at a time (`transports/mysql.rb:28-53`); here partitioned
  *    columnar reads keep data on executors and the per-batch callback
  *    generality survives as [[Connector.eachBatch]].
  *  - `write` publishes atomically (tmp + rename) — the reference's
  *    tmp-table + `RENAME` pattern (`patterns/mysql_patterns.rb:35-39`)
  *    promoted into the connector so every sink gets it.
  *
  * At 100 TB the contract holds: reads are partition-pruned/pushed-down
  * scans, writes are parallel parquet with a driver-side atomic swap.
  */
trait Connector {
  def spark: SparkSession

  /** Lazy scan of a named collection (table / index / file). */
  def read(table: String): DataFrame

  /** Incremental scan: rows with `matcher >= since`, ordered by matcher —
    * `read_since` (`transports/mysql.rb:149-158`). The predicate pushes
    * down to the source scan; the sort is only for callback parity. */
  def readSince(table: String, matcher: String, since: java.sql.Timestamp): DataFrame =
    read(table).filter(col(matcher) >= lit(since)).orderBy(col(matcher).asc)

  /** Write with atomic publish. Overwrite = full refresh; Append adds. */
  def write(df: DataFrame, table: String, mode: SaveMode = SaveMode.Overwrite): Unit

  /** Upsert by primary key — delete-then-insert semantics
    * (`transports/mysql.rb:55-103`); see [[UpsertWriter]]. */
  def upsert(df: DataFrame, table: String, primaryKey: String = "id"): Unit =
    UpsertWriter.upsert(this, df, table, primaryKey)

  // ---- catalog surface (§2.2 of SURVEY.md) ----
  def tables: Seq[String]                          // D1 `tables` mysql.rb:170-176
  def exists(table: String): Boolean = tables.contains(table)
  def columns(table: String): StructType = read(table).schema // D3 mysql.rb:198-207
  def drop(table: String): Unit                    // D4 mysql.rb:20-22
  def rename(from: String, to: String): Unit       // D5 mysql.rb:24-26 (atomic publish primitive)
  def truncate(table: String): Unit                // D6 mysql.rb:186-196

  // ---- engine-issued aggregates (§2.3) ----
  /** `SELECT COUNT(1)` — A1 (`transports/mysql.rb:182-184`). */
  def count(table: String): Long =
    if (exists(table)) read(table).count() else 0L

  /** `SELECT MAX(matcher)` with epoch fallback for missing
    * table/column/rows — A2 (`transports/mysql.rb:160-168`). */
  def maxTimestamp(table: String, matcher: String): java.sql.Timestamp = {
    val epoch = new java.sql.Timestamp(0L)
    if (!exists(table)) return epoch
    val df = read(table)
    if (!df.columns.contains(matcher)) return epoch
    val r = df.agg(max(col(matcher)).cast("timestamp")).head()
    if (r.isNullAt(0)) epoch else r.getTimestamp(0)
  }

  /** Per-batch imperative callback parity with the reference's
    * `read(query){ |batch| … }` block form (`transports/mysql.rb:43-47`):
    * streams partitions through the driver one at a time, O(batch) driver
    * memory. For distributed per-row logic prefer DataFrame ops — this is
    * the escape hatch, as in the reference. */
  def eachBatch(df: DataFrame, batchSize: Int = 1000)(f: Seq[org.apache.spark.sql.Row] => Unit): Unit =
    Connector.eachBatch(df, batchSize)(f)
}

object Connector {
  /** Shared batch-callback driver loop (see the trait method); also used
    * by [[graft.plans.Plan.eachBatch]] with the plan's configured
    * `batch_size`. */
  def eachBatch(df: DataFrame, batchSize: Int)(f: Seq[org.apache.spark.sql.Row] => Unit): Unit = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val it = df.toLocalIterator()
    val buf = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    while (it.hasNext) {
      buf += it.next()
      if (buf.size >= batchSize) { f(buf.toSeq); buf.clear() }
    }
    if (buf.nonEmpty) f(buf.toSeq)
  }
}

/** SPI for config-driven user connectors (O11): a `class:` line in a
  * `config/connections/<type>/<name>.yml` names an implementation of
  * this trait (Scala object or zero-arg class), which builds the
  * connector from the remaining config keys — the explicit-reflection
  * analog of the reference's auto-required user transport files
  * (taskrabbit/forklift `lib/forklift.rb:15-16`). */
trait ConnectorFactory {
  def build(spark: SparkSession, cfg: Map[String, String]): Connector
}
