package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.sources.{Connector, SchemaInfer, UpsertWriter}

/** Composite dataflow patterns — Spark re-expressions of
  * taskrabbit/forklift `lib/forklift/patterns/mysql_patterns.rb`.
  * Where the reference keeps data movement inside the MySQL server
  * (`INSERT … SELECT`), we keep it on executors: the driver only
  * orchestrates; no rows cross the driver in any pattern.
  */
object Patterns {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** P1 `pipe` (`mysql_patterns.rb:28-43`): full-refresh copy with atomic
    * publish. The connector's write already does tmp+rename, so the whole
    * reference sequence (DROP tmp / CREATE LIKE / INSERT SELECT / DROP dst
    * / RENAME) collapses to one overwrite. Returns rows moved. */
  /** Reference-parity pipe timer (`mysql_patterns.rb:29,41-42,96-98` logs
    * "moved N rows in Ns" per pipe run). */
  private def timed(what: String)(body: => Long): Long = {
    val t0 = System.nanoTime()
    val n = body
    log.info(f"$what: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    n
  }

  def pipe(src: Connector, from: String, dst: Connector, to: String): Long =
    timed(s"pipe $from -> $to") {
      val df = src.read(from)
      dst.write(df, to, SaveMode.Overwrite)
      dst.count(to)
    }

  /** P2 `incremental_pipe` (`mysql_patterns.rb:60-99`): high-watermark CDC.
    *  - ensure dst exists (CREATE IF NOT EXISTS … LIKE, `:67`)
    *  - watermark = dst `max(matcher)` with epoch fallback (`:74`)
    *  - stale-row cleanup + fresh insert: the reference deletes dst pks
    *    with `matcher > wm` then `INSERT … SELECT … WHERE matcher > wm`;
    *    both collapse into one anti-join merge here (`UpsertWriter
    *    .mergeByKey`), published atomically.
    * Scale: the watermark filter pushes into the parquet scan (only fresh
    * partitions read); the merge is the connector's `upsert` — on a
    * [[graft.sources.PartitionedParquetConnector]] that is a
    * partition-scoped copy-on-write merge, so the steady state reads the
    * delta and rewrites only affected partitions, never the whole table. */
  def incrementalPipe(src: Connector, from: String, dst: Connector, to: String,
                      matcher: String = "updated_at", primaryKey: String = "id"): Long =
    timed(s"incremental_pipe $from -> $to") {
      val wm = dst.maxTimestamp(to, matcher) // epoch when dst missing → full first load
      val fresh = src.read(from).filter(col(matcher) > lit(wm)) // strictly >, :83,:95
      dst.upsert(fresh, to, primaryKey)      // lazy create on first write (:67)
      dst.count(to)
    }

  /** P3 `optimistic_pipe` (`mysql_patterns.rb:110-124`): try incremental,
    * fall back to full pipe on guard failure or error — runtime-adaptive
    * driver control flow, the reference's poor-man's AQE. */
  def optimisticPipe(src: Connector, from: String, dst: Connector, to: String,
                     matcher: String = "updated_at", primaryKey: String = "id"): Long =
    if (canIncrementalPipe(src, from, dst, to, matcher))
      try incrementalPipe(src, from, dst, to, matcher, primaryKey)
      catch { case e: Exception =>
        // log before falling back (mysql_patterns.rb:117-119) — a silent
        // swallow would hide a persistent incremental bug as "slow full
        // pipes forever".
        log.warn(s"incremental_pipe $from -> $to failed, falling back to full pipe", e)
        pipe(src, from, dst, to)
      }
    else pipe(src, from, dst, to)

  /** P4 `mysql_import` (`mysql_patterns.rb:178-184`): cross-store full
    * copy. In the reference this streams batches through the driver; here
    * it is the same distributed read→write as [[pipe]]. */
  def importTable(src: Connector, from: String, dst: Connector, to: String): Long = {
    dst.drop(to)
    pipe(src, from, dst, to)
  }

  /** P5 `mysql_incremental_import` (`mysql_patterns.rb:160-166`):
    * dst watermark → `read_since` (>=) → upsert write. */
  def incrementalImport(src: Connector, from: String, dst: Connector, to: String,
                        matcher: String = "updated_at", primaryKey: String = "id"): Long = {
    val wm = dst.maxTimestamp(to, matcher)
    val fresh = src.readSince(from, matcher, wm)
    dst.upsert(fresh, to, primaryKey)
    dst.count(to)
  }

  /** P6 `mysql_optimistic_import` (`mysql_patterns.rb:134-146`). */
  def optimisticImport(src: Connector, from: String, dst: Connector, to: String,
                       matcher: String = "updated_at", primaryKey: String = "id"): Long =
    if (canIncrementalImport(src, from, dst, to, matcher))
      try incrementalImport(src, from, dst, to, matcher, primaryKey)
      catch { case e: Exception =>
        log.warn(s"incremental_import $from -> $to failed, falling back to full import", e)
        importTable(src, from, dst, to)
      }
    else importTable(src, from, dst, to)

  /** P7 `can_incremental_pipe?` (`mysql_patterns.rb:224-239`): both exist,
    * both carry the matcher, column sets identical both directions. */
  def canIncrementalPipe(src: Connector, from: String, dst: Connector, to: String,
                         matcher: String = "updated_at"): Boolean = {
    if (!src.exists(from) || !dst.exists(to)) return false
    val a = src.columns(from).fieldNames.toSet
    val b = dst.columns(to).fieldNames.toSet
    a.contains(matcher) && b.contains(matcher) && a == b
  }

  /** P8 `can_incremental_import?` (`mysql_patterns.rb:246-249`). */
  def canIncrementalImport(src: Connector, from: String, dst: Connector, to: String,
                           matcher: String = "updated_at"): Boolean =
    src.exists(from) && src.columns(from).fieldNames.contains(matcher) &&
      dst.exists(to) && dst.columns(to).fieldNames.contains(matcher)

  /** Incremental aggregate-table maintenance — keep
    * `dst = src.groupBy(groupCols).agg(...)` fresh from an APPEND-ONLY
    * source without ever re-reading old source rows. No reference analog
    * (its transformations re-run full SQL each time,
    * `lib/forklift/base/connection.rb:43-51`); this is the scale path
    * for rollup tables over event streams.
    *
    * Only MERGEABLE aggregates are accepted (`sum`, `count`, `min`,
    * `max` — avg = sum/count downstream): each tick aggregates the delta
    * (rows with `matcher` past the stored watermark) to per-group
    * partials, combines them with the OLD values of just the affected
    * groups (one key-equi join, delta-group-sized), and upserts those
    * groups. Cost per tick: O(delta + affected groups) — the source is
    * never rescanned, which is also why updates/deletes of old rows are
    * out of contract (min/max cannot be un-merged; use a rebuild for
    * correction workloads).
    *
    * The watermark rides IN the aggregate table as `_wm = max(matcher)`
    * per group, so the table is self-describing and the tick needs no
    * side state. Composite group keys get a synthetic `_gkey` column
    * (connector upserts key on one column).
    *
    * `aggs` = (func, srcCol, alias); func ∈ {sum,count,min,max};
    * `("count", "*", alias)` counts rows. */
  def incrementalAggregate(src: Connector, from: String, dst: Connector, to: String,
                           groupCols: Seq[String], aggs: Seq[(String, String, String)],
                           matcher: String = "updated_at"): Long =
    timed(s"incremental_aggregate $from -> $to") {
      validateAggArgs(groupCols, aggs)
      incrementalAggregateTick(src.read(from), dst, to, groupCols, aggs, matcher)
      dst.count(to)
    }

  private def validateAggArgs(groupCols: Seq[String],
                              aggs: Seq[(String, String, String)]): Unit = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(aggs.nonEmpty, "need at least one aggregate")
    val okFuncs = Set("sum", "count", "min", "max")
    aggs.foreach { case (f, _, _) => require(okFuncs.contains(f), s"non-mergeable agg: $f") }
    val aliases = aggs.map(_._3)
    require(aliases.distinct.size == aliases.size, "aggregate aliases must be unique")
    val reserved = Set("_wm", "_gkey") ++ groupCols
    aliases.foreach(a => require(!reserved.contains(a),
      s"alias '$a' collides with a group column or a reserved name (_wm, _gkey)"))
  }

  /** One tick of [[incrementalAggregate]] from an already-read candidate
    * DataFrame (the streaming `foreachBatch` entry point —
    * [[graft.streaming.IncrementalStream.rollupStream]]). Rows at or
    * before the stored watermark are filtered out, which is also what
    * makes a REPLAYED micro-batch (crash between sink commit and
    * checkpoint commit) a no-op instead of a double count. */
  def incrementalAggregateTick(candidate: DataFrame, dst: Connector, to: String,
                               groupCols: Seq[String], aggs: Seq[(String, String, String)],
                               matcher: String = "updated_at"): Unit = {
      validateAggArgs(groupCols, aggs)
      val wm = dst.maxTimestamp(to, "_wm") // epoch when dst missing → full first build
      val delta = candidate.filter(col(matcher) > lit(wm))
      if (delta.isEmpty) return // no-op tick (incl. replay): skip the merge rewrite
      def partialOf(f: String, c: String): org.apache.spark.sql.Column = f match {
        case "count" => count(if (c == "*") lit(1) else col(c))
        case "sum"   => sum(col(c))
        case "min"   => min(col(c))
        case "max"   => max(col(c))
      }
      val partial = delta.groupBy(groupCols.map(col): _*)
        .agg(aggs.head match { case (f, c, a) => partialOf(f, c).as(a) },
          (aggs.tail.map { case (f, c, a) => partialOf(f, c).as(a) } :+
            max(col(matcher)).as("_wm")): _*)
      val pk = if (groupCols.size == 1) groupCols.head else "_gkey"
      def withKey(d: DataFrame): DataFrame =
        if (groupCols.size == 1) d
        else d.withColumn("_gkey", concat_ws("\u0001", groupCols.map(c => col(c).cast("string")): _*))
      val fresh = withKey(partial)
      val merged =
        if (!dst.exists(to)) fresh
        else {
          // old values of ONLY the affected groups ride in on a key join;
          // combine columnwise by the function's own merge law
          val old = dst.read(to).select((pk +: (aggs.map(_._3) :+ "_wm")).map(c =>
            col(c).as(s"__old_$c")).toIndexedSeq: _*)
          val joined = fresh.join(old, fresh(pk) === old(s"__old_$pk"), "left")
          val combinedCols = aggs.map { case (f, _, a) =>
            val n = col(a); val o = col(s"__old_$a")
            (f match {
              case "sum" | "count" => coalesce(n + o, n, o)
              case "min"           => coalesce(least(n, o), n, o)
              case "max"           => coalesce(greatest(n, o), n, o)
            }).as(a)
          } :+ coalesce(greatest(col("_wm"), col("__old__wm")), col("_wm")).as("_wm")
          joined.select((groupCols.map(col) ++ combinedCols ++
            (if (groupCols.size == 1) Nil else Seq(col("_gkey")))): _*)
        }
      dst.upsert(merged, to, pk)
    }

  /** SCD Type-2 dimension maintenance — the upsert that RETAINS history.
    * Where [[incrementalPipe]]'s merge REPLACES a key's row (the
    * reference's delete-then-insert, `transports/mysql.rb:78-87`), this
    * keeps one row per (key, version): the source row plus `valid_to`
    * (the next version's `matcher`; null = current version) and a
    * synthetic `_scd_key` = key + version-time for the upsert identity.
    *
    * Tick shape: candidate rows are filtered against a PER-KEY
    * watermark (each key's stored current `matcher` — a global max
    * would silently drop a key's legitimate update that happens to
    * carry an earlier timestamp than some OTHER key's last version),
    * chain into versions per key (`valid_to = lead(matcher)`), and
    * each affected key's STORED current row is closed at the key's
    * first delta version. The per-key filter also makes any replay a
    * no-op: already-applied rows sit at or before their key's current
    * `matcher`. Cost: O(delta + current rows), never O(history) — the
    * current-row set (one row per key) is read per tick, like the
    * watermark probe it replaces.
    * Contract: `matcher` strictly increases per key and (key, matcher)
    * is unique.
    *
    * Oracled end to end (`q_scd2`): a two-tick build must equal the
    * from-scratch window form `lead(ts) over (partition by key order by
    * ts)` computed by DuckDB on the full history. */
  def scdType2(src: Connector, from: String, dst: Connector, to: String,
               primaryKey: String, matcher: String = "updated_at"): Long =
    timed(s"scd2 $from -> $to") {
      scdType2Tick(src.read(from), dst, to, primaryKey, matcher)
      dst.count(to)
    }

  /** One SCD-2 tick from a candidate DataFrame (streaming foreachBatch
    * entry point). Applies the per-key watermark filter itself, so a
    * replayed batch versions nothing twice. */
  def scdType2Tick(candidate: DataFrame, dst: Connector, to: String,
                   primaryKey: String, matcher: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(primaryKey)).orderBy(col(matcher))
    def versioned(delta: DataFrame): DataFrame = delta
      .withColumn("valid_to", lead(col(matcher), 1).over(w))
      .withColumn("_scd_key", concat_ws("\u0001",
        col(primaryKey).cast("string"), col(matcher).cast("string")))
    if (!dst.exists(to)) {
      if (!candidate.isEmpty) dst.write(versioned(candidate), to)
      return
    }
    // the current-row set (one row per key) feeds both the watermark
    // probe and the close step from ONE definition. Deliberately NOT
    // persisted: the probe consumer prunes its scan to (key, matcher) —
    // a few bytes per row — while the close step reads full rows, so
    // "two scans" is one cheap pruned pass plus one full pass; a cache
    // would materialize FULL width for both and was measured ~25%
    // slower at sf0.1 (and at scale trades pruned parquet reads for
    // executor-storage churn on a possibly-billion-row current set).
    val currentRows = dst.read(to).filter(col("valid_to").isNull)
    // per-key watermark: only rows strictly past their key's stored
    // current version are fresh (brand-new keys pass via the null arm)
    val current = currentRows.select(col(primaryKey), col(matcher).as("_cur_from"))
    val delta = candidate.join(current, Seq(primaryKey), "left")
      .filter(col("_cur_from").isNull || col(matcher) > col("_cur_from"))
      .drop("_cur_from")
    if (delta.isEmpty) return // no-op tick: never pay the merge rewrite
    // close each affected key's stored current row at its first delta
    // version; inner join = only affected keys ride along
    val firstNew = delta.groupBy(col(primaryKey)).agg(min(col(matcher)).as("_new_from"))
    val closed = currentRows
      .join(firstNew, Seq(primaryKey))
      .withColumn("valid_to", col("_new_from")).drop("_new_from")
    val fresh = versioned(delta)
    dst.upsert(closed.unionByName(fresh.select(closed.columns.map(col).toIndexedSeq: _*)),
      to, "_scd_key")
  }

  /** P9 `write_high_water_mark` (`mysql_patterns.rb:190-217`): append one
    * synthetic row with type-appropriate stub values and matcher = given
    * time, faking a watermark so partial runs can resume. */
  /** Resumable windowed backfill — the missing bulk counterpart of the
    * incremental tick: process `[start, end)` in `stepMinutes` windows,
    * recording progress in a dedicated marker table after each
    * window, so a crashed or interrupted backfill resumes at the first
    * unfinished window instead of restarting (exactly the
    * high-water-mark contract the incremental patterns use —
    * `mysql_patterns.rb:60-99` — applied to history instead of the
    * tail). `run(lo, hi)` must be idempotent for the at-least-once
    * window delivery this gives (an upsert by pk, a partition
    * overwrite). Returns the number of windows executed THIS call.
    *
    * Progress lives in a dedicated `<table>__backfill` marker table, NOT
    * in the destination's own watermark — the destination usually also
    * receives live tail data, and conflating "some row is newer than
    * the window" with "the window was backfilled" would silently no-op
    * any backfill of a historical hole behind current data. */
  def backfill(dst: Connector, table: String, matcher: String,
               start: java.sql.Timestamp, end: java.sql.Timestamp,
               stepMinutes: Int)(run: (java.sql.Timestamp, java.sql.Timestamp) => Unit): Int = {
    require(stepMinutes > 0, "stepMinutes must be positive")
    require(!end.before(start), "end must be >= start")
    val stepMs = stepMinutes * 60L * 1000L
    val progressTable = s"${table}__backfill"
    // resume: the marker is the END of the last completed window;
    // epoch (no marker yet) → start from `start`
    val done = dst.maxTimestamp(progressTable, matcher).getTime
    var lo = math.max(start.getTime, done)
    var windows = 0
    def pin(ts: java.sql.Timestamp): Unit =
      if (dst.tables.contains(progressTable))
        writeHighWaterMark(dst, progressTable, matcher, ts)
      else { // first window creates the marker table: one matcher column
        import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
        dst.write(dst.spark.createDataFrame(
          java.util.Collections.singletonList(org.apache.spark.sql.Row(ts)),
          StructType(Seq(StructField(matcher, TimestampType)))),
          progressTable, SaveMode.Append)
      }
    while (lo < end.getTime) {
      val hi = math.min(lo + stepMs, end.getTime)
      run(new java.sql.Timestamp(lo), new java.sql.Timestamp(hi))
      pin(new java.sql.Timestamp(hi))
      windows += 1
      lo = hi
    }
    windows
  }

  def writeHighWaterMark(conn: Connector, table: String, matcher: String,
                         ts: java.sql.Timestamp): Unit = {
    import org.apache.spark.sql.types._
    val schema = conn.columns(table)
    // Stub values must match each field's EXTERNAL type exactly — Spark's
    // row validation rejects e.g. a java.lang.Long for an IntegerType slot.
    val stub = org.apache.spark.sql.Row.fromSeq(schema.fields.map { f =>
      if (f.name == matcher) f.dataType match {
        // the matcher slot must also be type-exact: a DateType or
        // StringType matcher column rejects a raw Timestamp on validation
        case DateType   => new java.sql.Date(ts.getTime)
        case StringType => ts.toString
        case _          => ts
      }
      else f.dataType match {   // stub values per type, :196-210
        case LongType      => 0L
        case IntegerType   => 0
        case ShortType     => 0.toShort
        case ByteType      => 0.toByte
        case DoubleType    => 0.0
        case FloatType     => 0.0f
        case _: DecimalType => java.math.BigDecimal.ZERO
        case BooleanType   => false
        case TimestampType => ts
        case DateType      => new java.sql.Date(ts.getTime)
        case BinaryType    => Array.empty[Byte]
        case _             => "0"
      }
    }.toSeq)
    val df = conn.spark.createDataFrame(
      java.util.Collections.singletonList(stub), SchemaInfer.writable(schema))
    val coerced = SchemaInfer.evolve(df, schema)
    conn.write(coerced, table, SaveMode.Append)
  }
}
