package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming re-expression of the reference's incremental polling loop.
  * The reference has no streaming — its closest analog is the
  * high-watermark batch poll (`read_since` + `max_timestamp`,
  * taskrabbit/forklift `lib/forklift/transports/mysql.rb:149-168`).
  * Structured Streaming subsumes it: file-source discovery replaces the
  * poll, watermarks replace the matcher column bookkeeping, and windowed
  * stateful aggregation adds what the reference cannot do at all
  * (SURVEY.md §2.9).
  */
object IncrementalStream {

  /** Stream a directory of parquet as micro-batches — the `read_since`
    * analog: each new file is a batch, ordered by discovery. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // batch_size analog
      .parquet(path)

  /** Watermarked tumbling-window aggregation over an event stream:
    * counts + sums per (window, event_type), late data beyond
    * `lateness` dropped — state is bounded, safe for unbounded runs. */
  def windowedEventAgg(events: DataFrame, tsCol: String = "ts",
                       window_ : String = "1 hour",
                       lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Session-window aggregation via Spark's NATIVE `session_window` —
    * the built-in complement to [[sessionizeStream]]'s custom
    * `flatMapGroupsWithState` state machine. Prefer this form when the
    * per-session output is an aggregate (count/sum/min/max): the state
    * store holds one MERGING window per open session (gap-extended on
    * every event, sessions merge when late events bridge two windows),
    * eviction rides the watermark, and the whole thing stays inside
    * Spark's aggregation codegen — no user state class, no encoder, no
    * iterator contract to get wrong. Reach for the custom state op only
    * when the output is not a merge-able aggregate (e.g. the reference-
    * style "emit the full ordered event list per session").
    *
    * Output (append mode, on watermark close): (userCol,
    * session_start, session_end, n_events, sum_value). */
  def sessionWindowAgg(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", valueCol: String = "value",
                       gap: String = "30 minutes",
                       lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Run a streaming query into an in-memory sink and block until all
    * currently-available input is processed — the harness used by specs
    * (no always-on cluster in this environment). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** One closed browsing session per output row. */
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long)

  /** An open session carried between micro-batches. */
  case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  /** Stateful streaming sessionization via `flatMapGroupsWithState` —
    * the custom-state surface the reference cannot express at all
    * (SURVEY §2.9): per-user session state lives in the state store
    * across micro-batches, sessions CLOSE when the inactivity gap is
    * exceeded (emitted downstream) or when event-time timeout fires
    * after the watermark passes; state is bounded by the watermark, so
    * the query runs unbounded without state growth.
    *
    * Input needs `user_id`, `event_id`, `ts` columns (the events table
    * shape). Batch-mode sessionization of the same semantics is the
    * window-lag query (`SparkEntry q_sessionize`) — this is its
    * always-on form. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       lateness: String = "2 hours"): org.apache.spark.sql.Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, it: Iterator[(Long, java.sql.Timestamp)],
               state: GroupState[OpenSession]): Iterator[Session] = {
      def toSession(s: OpenSession) = Session(userId,
        new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n)
      if (state.hasTimedOut) {
        // watermark passed the open session's gap window — close it
        val out = state.getOption.map(toSession).iterator
        state.remove()
        return out
      }
      val times = it.map(_._2.getTime).toArray.sorted
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      times.foreach { t =>
        open match {
          case Some(s) if t - s.lastMs <= gapMs =>
            open = Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1))
          case Some(s) => // gap exceeded → close the old, start fresh
            closed += toSession(s)
            open = Some(OpenSession(t, t, 1))
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs) // event-time timeout
      }
      closed.result().iterator
    }

    events.selectExpr("user_id", "event_id", "ts")
      .withWatermark("ts", lateness)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) => update(user, rows.map(r => (r._2, r._3)), state)
      }
  }

  /** One scored point of a streaming CUSUM fold. */
  case class DriftPoint(key: Long, order_id: Long, value: Double,
                        cusum_fp: Long, alarm: Boolean)

  /** Always-on drift detection: the batch [[graft.operators.TimeSeries.cusum]]
    * fold lifted into `flatMapGroupsWithState` — per-key one-sided CUSUM
    * state (a single 8-byte fixed-point long) carried across
    * micro-batches, every arriving point emitted with its statistic and
    * alarm flag. The fold is the IDENTICAL 1e-6 fixed-point integer
    * arithmetic as the batch operator (CUSUM's init is `step(0)`, so an
    * empty state and a fresh series coincide) — DriftAlarmSpec pins
    * stream-equals-batch on the same data split across micro-batches.
    *
    * Ordering contract: rows are folded in `orderCol` order WITHIN each
    * micro-batch, and batches are folded in arrival order — the file
    * source's mtime ordering. A key's state is one long, so state is
    * bounded by key cardinality (no watermark eviction needed; evicting
    * would silently restart the statistic mid-series). */
  def driftAlarmStream(src: DataFrame, keyCol: String, orderCol: String,
                       valueCol: String, target: Double, slack: Double,
                       threshold: Double): org.apache.spark.sql.Dataset[DriftPoint] = {
    require(slack >= 0.0 && threshold > 0.0,
      s"slack must be >= 0 and threshold positive, got k=$slack h=$threshold")
    val spark = src.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val muK = math.floor(target * 1e6).toLong + math.floor(slack * 1e6).toLong
    val hFp = math.floor(threshold * 1e6).toLong
    src.select(col(keyCol).cast("long"), col(orderCol).cast("long"),
        col(valueCol).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, DriftPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) { (key, rows, state) =>
        var s = state.getOption.getOrElse(0L)
        val out = rows.toArray.sortBy(_._2).map { case (_, oid, v) =>
          s = math.max(0L, s + math.floor(v * 1e6).toLong - muK)
          DriftPoint(key, oid, v, s, s > hFp)
        }
        state.update(s)
        out.iterator
      }
  }

  /** One smoothed point of a streaming EWMA fold. */
  case class SmoothedPoint(key: Long, order_id: Long, value: Double, ewma: Double)

  /** Always-on exponential smoothing: the batch
    * [[graft.operators.TimeSeries.ewma]] recursion carried across
    * micro-batches — per-key state is the single last smoothed double,
    * every arriving point emitted with its EWMA. The fold is the
    * IDENTICAL IEEE arithmetic as the batch operator (the first value a
    * key ever sees initializes the state, exactly the batch init), so
    * stream-equals-batch holds bit-for-bit on the same series split
    * across micro-batches (spec-pinned, like [[driftAlarmStream]]).
    * Same ordering contract and bounded-state story as the drift
    * alarm: one double per key, no watermark eviction (evicting would
    * silently restart the smoothing mid-series). */
  def ewmaStream(src: DataFrame, keyCol: String, orderCol: String,
                 valueCol: String, alpha: Double): org.apache.spark.sql.Dataset[SmoothedPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val spark = src.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val oneMinus = 1.0 - alpha
    src.select(col(keyCol).cast("long"), col(orderCol).cast("long"),
        col(valueCol).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, SmoothedPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) { (key, rows, state) =>
        var s = state.getOption
        val out = rows.toArray.sortBy(_._2).map { case (_, oid, v) =>
          val next = s match {
            case Some(prev) => alpha * v + oneMinus * prev
            case None => v
          }
          s = Some(next)
          SmoothedPoint(key, oid, v, next)
        }
        s.foreach(state.update)
        out.iterator
      }
  }

  /** Streaming exact dedup for continuous ingest: drop any document
    * whose normalized-content fingerprint was already seen within the
    * watermark horizon — the always-on form of `Dedup.exact`. State is
    * one 8-byte fingerprint per distinct doc inside the horizon (never
    * the text), expired by the watermark, so the query runs unbounded
    * with bounded state. Cross-horizon duplicates are the accepted
    * recall cost of bounded state; a periodic batch `Dedup.exact` pass
    * over the sink closes them. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  lateness: String = "1 hour"): DataFrame =
    docs
      .withColumn("_fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Stream-stream interval join — the attribution primitive (impression
    * ↔ conversion, click ↔ purchase): inner-join two UNBOUNDED streams
    * where the right event lands within `[leftTs, leftTs + horizon]` of
    * a matching key.
    *
    * Both ingredients of bounded state are mandatory and encoded here:
    * each side carries a watermark (`lateness`), and the time-range
    * predicate is part of the join condition — Spark derives exactly
    * from those how long each side's rows must be retained, then evicts.
    * An equi-join of two streams without the range bound would hold
    * every row forever; that shape is rejected by requiring a positive
    * `horizon`. Matches emit as they arrive (append mode; the watermark
    * only bounds state, it does not delay output).
    *
    * Column names must be disjoint across the two sides (rename before
    * calling) — the join condition references both unqualified. */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTs: String, rightTs: String,
                         horizon: String = "30 minutes",
                         lateness: String = "1 hour",
                         joinType: String = "inner"): DataFrame = {
    val lead = horizon.trim.split("\\s+").headOption.getOrElse("")
    require(scala.util.Try(lead.toDouble).toOption.exists(_ > 0),
      s"horizon must start with a positive number (got '$horizon') — " +
        "the range bound is what makes stream-stream join state evictable")
    require(Set("inner", "leftOuter")(joinType),
      s"stream-stream interval join supports inner|leftOuter, got $joinType")
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    // leftOuter emits the null-padded row only once the watermark proves
    // no match can still arrive — unmatched attribution with an
    // eventually-complete contract, not a guess
    l.join(r, expr(
      s"$leftKey = $rightKey AND $rightTs >= $leftTs AND " +
      s"$rightTs <= $leftTs + INTERVAL $horizon"), joinType)
  }

  /** Streaming NEAR-dup dedup for continuous ingest: each micro-batch
    * MinHash-dedups against the persisted banded index and appends its
    * survivors to both the destination table and the index
    * ([[graft.operators.Dedup.incrementalMinhash]]). Complements
    * [[dedupStream]]: that one drops exact duplicates within the
    * watermark horizon with in-state fingerprints; this one drops
    * NEAR-duplicates against the ENTIRE ingested history, because the
    * state is the sketch index table, not stream state — unbounded
    * horizon, sketch-sized storage.
    *
    * Crash safety under foreachBatch's at-least-once delivery:
    * survivors are UPSERTED into the destination BEFORE the index
    * learns the batch (the `sink` ordering of
    * [[graft.operators.Dedup.incrementalMinhash]]). A crash before the
    * index append replays the batch → identical survivors → idempotent
    * upsert; a crash after it replays to an empty survivor set, but
    * the rows already reached the destination. Writing the table
    * AFTER the index would turn that second crash window into silent,
    * permanent loss of the batch. */
  def nearDedupStream(src: DataFrame, dst: graft.sources.Connector, table: String,
                      indexTable: String, textCol: String, idCol: String,
                      checkpoint: String, numHashes: Int = 64, bands: Int = 16,
                      shingleLen: Int = 3, threshold: Double = 0.7): StreamingQuery = {
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Dedup.incrementalMinhash(
            batch, textCol, idCol, dst, indexTable, numHashes, bands, shingleLen, threshold,
            sink = kept => if (!kept.isEmpty) dst.upsert(kept, table, idCol))
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming EMBEDDING near-dup dedup — the vector analog of
    * [[nearDedupStream]], completing the exact/minhash/embedding
    * symmetry: each micro-batch hyperplane-buckets its vectors, probes
    * the persisted bucket index, drops verified cosine matches against
    * the entire ingested history, near-dedups the remainder, and
    * appends survivors to destination + index
    * ([[graft.operators.Dedup.incrementalEmbedding]]). Same
    * crash-ordering contract as [[nearDedupStream]]: the destination
    * upsert runs BEFORE the index learns the batch, so at-least-once
    * replay is safe on either side of the append. */
  def embeddingDedupStream(src: DataFrame, dst: graft.sources.Connector, table: String,
                           indexTable: String, vecCol: String, idCol: String,
                           checkpoint: String, dim: Int, planes: Int = 16,
                           seed: Long = 42L, threshold: Double = 0.95): StreamingQuery = {
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Dedup.incrementalEmbedding(
            batch, vecCol, idCol, dst, indexTable, dim, planes, seed, threshold,
            sink = kept => if (!kept.isEmpty) dst.upsert(kept, table, idCol))
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming DSIR scoring: each micro-batch scores its documents
    * against the PERSISTED importance table (re-read per batch, so a
    * refit picks up without restart) and upserts (id, n_ngrams,
    * lw_fixed, log_weight) — with an optional fixed-point weight
    * threshold gate. The batch never touches the raw/target corpora:
    * the bounded ratio table is the entire model, so the tick is
    * O(batch + numBuckets) — the sampler analog of the dedup ticks'
    * O(delta + index) contract. Ranked-fraction resampling is
    * deliberately NOT offered here: a top-k% cut is corpus-global,
    * meaningless per batch — calibrate `minWeightFixed` offline (e.g.
    * the boundary weight of a batch [[graft.operators.Dsir.resampleTop]]
    * run) and gate on it. */
  def dsirScoreStream(src: DataFrame, dst: graft.sources.Connector, table: String,
                      ratioTable: String, textCol: String, idCol: String,
                      checkpoint: String, numBuckets: Int = 4096,
                      minWeightFixed: Option[Long] = None): StreamingQuery = {
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val w = graft.operators.Dsir.importanceWeights(
            batch, textCol, idCol, dst.read(ratioTable), numBuckets)
          val kept = minWeightFixed.map(t => w.filter(col("lw_fixed") >= t)).getOrElse(w)
          if (!kept.isEmpty) dst.upsert(kept, table, idCol)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming split-conformal drift gate: flag each arriving row
    * against a PERSISTED conformal threshold
    * ([[graft.operators.Evaluation.conformalThresholdTable]] — fit
    * offline on the last calibration window, refreshed on whatever
    * cadence the pipeline re-calibrates) and upsert the flagged rows
    * into `table`. With `keepConforming = false` only the
    * NON-conforming rows land — the alert stream with a calibrated
    * ≤ α false-positive rate. A NULL persisted threshold (α too small
    * for the calibration size) conforms everything, the batch
    * operator's convention. The threshold table is re-read per batch
    * (1 row — so recalibration takes effect on the next tick without
    * restarting the stream). */
  def conformalStream(src: DataFrame, dst: graft.sources.Connector,
                      table: String, thresholdTable: String,
                      scoreCol: String, idCol: String, checkpoint: String,
                      keepConforming: Boolean = true): StreamingQuery = {
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val tr = dst.read(thresholdTable).select(col("threshold")).limit(2).collect()
          require(tr.length == 1,
            s"threshold table '$thresholdTable' must hold exactly one row, got ${tr.length}")
          val flagged =
            if (tr(0).isNullAt(0))
              batch.withColumn("threshold", lit(null).cast("double"))
                .withColumn("conforming", lit(true))
            else {
              val t = tr(0).getDouble(0)
              batch.withColumn("threshold", lit(t))
                .withColumn("conforming", col(scoreCol).cast("double") <= lit(t))
            }
          val kept = if (keepConforming) flagged
            else flagged.filter(!col("conforming"))
          if (!kept.isEmpty) dst.upsert(kept, table, idCol)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming two-sample KS drift gate: each arriving micro-batch's
    * value distribution is tested per group against a PERSISTED
    * reference histogram
    * ([[graft.operators.Analytics.quantizedHistogram]] — build it
    * offline from the last trusted window, refresh on whatever cadence
    * the pipeline re-baselines) and the per-group verdicts
    * (group, n_a, n_b, d, d_crit, drifted) upsert into `table` keyed
    * by the group. Only groups PRESENT in the batch land — a group the
    * batch never touched has no new evidence and must not clobber its
    * previous verdict. The reference table is re-read per batch (NDV-
    * bounded rows — so a re-baseline takes effect on the next tick
    * without restarting the stream), the batch side aggregates to the
    * same NDV-bounded histogram before the two meet, and the KS core
    * runs [[graft.operators.Analytics.ksTestFromCounts]]'s exact
    * integer ECDF argmax: raw observations never enter a window, the
    * reference corpus never rescans — the tick is
    * O(batch + reference NDV), the conformal/KN persisted-artifact
    * contract. `scale` must match the scale the reference histogram
    * was built with. */
  def ksDriftStream(src: DataFrame, dst: graft.sources.Connector, table: String,
                    refHistTable: String, groupCol: String, valueCol: String,
                    checkpoint: String, alpha: Double = 0.05,
                    scale: Int = 6): StreamingQuery = {
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val ref = dst.read(refHistTable)
            .select(col(groupCol), col("value_q"), col("c").cast("long").as("c_a"),
              lit(0L).as("c_b"))
          val cur = graft.operators.Analytics
            .quantizedHistogram(batch, groupCol, valueCol, scale)
            .select(col(groupCol), col("value_q"), lit(0L).as("c_a"),
              col("c").cast("long").as("c_b"))
          val counts = ref.unionAll(cur)
            .groupBy(col(groupCol), col("value_q"))
            .agg(sum(col("c_a")).as("c_a"), sum(col("c_b")).as("c_b"))
          val verdicts = graft.operators.Analytics
            .ksTestFromCounts(counts, groupCol, alpha)
            .filter(col("n_b") > 0)
          if (!verdicts.isEmpty) dst.upsert(verdicts, table, groupCol)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming PSI gate — [[ksDriftStream]]'s Population-Stability-Index
    * sibling over the SAME persisted reference histogram table: each
    * micro-batch aggregates to its NDV-bounded histogram, meets the
    * re-read reference counts, and
    * [[graft.operators.Analytics.psiFromCounts]] (the exact core the
    * batch [[graft.operators.Analytics.psiDrift]] runs) produces one
    * (group, psi, drifted) verdict row per group PRESENT in the batch
    * — absent groups keep their previous verdict via the keyed upsert.
    * State is histogram-sized; the reference corpus never rescans. */
  def psiDriftStream(src: DataFrame, dst: graft.sources.Connector, table: String,
                     refHistTable: String, groupCol: String, valueCol: String,
                     checkpoint: String, bins: Int = 10,
                     thresholdFp: Long = 200000000000L,
                     scale: Int = 6): StreamingQuery = {
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val ref = dst.read(refHistTable)
            .select(col(groupCol), col("value_q").as("_q"),
              col("c").cast("long").as("c_a"), lit(0L).as("c_b"))
          val cur = graft.operators.Analytics
            .quantizedHistogram(batch, groupCol, valueCol, scale)
            .select(col(groupCol), col("value_q").as("_q"),
              lit(0L).as("c_a"), col("c").cast("long").as("c_b"))
          val counts = ref.unionAll(cur)
            .groupBy(col(groupCol), col("_q"))
            .agg(sum(col("c_a")).as("c_a"), sum(col("c_b")).as("c_b"))
          val verdicts = graft.operators.Analytics
            .psiFromCounts(counts, groupCol, bins, thresholdFp)
            .filter(col("n_cur") > 0)
          if (!verdicts.isEmpty) dst.upsert(verdicts, table, groupCol)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming LM quality gate: score arriving documents against a
    * PERSISTED Kneser–Ney trigram model ([[graft.operators.LanguageModel.saveKn]]
    * — train offline once, serve every tick) and upsert
    * (id, n_trigrams, avg_nll, ppl) into `table`. With `maxAvgNll`,
    * only documents at or below the NLL gate land — including dropping
    * UNSCORED docs (fewer than three tokens ⇒ null score ⇒ no evidence
    * ⇒ no pass, plain SQL filter semantics). The model is loaded ONCE
    * at stream construction (vocab collect bounded by vocabSize; count
    * tables are lazy parquet reads) — each batch re-reads the MODEL
    * tables, never the reference corpus. */
  def knScoreStream(src: DataFrame, dst: graft.sources.Connector, table: String,
                    modelPrefix: String, textCol: String, idCol: String,
                    checkpoint: String, maxAvgNll: Option[Double] = None): StreamingQuery = {
    val lm = graft.operators.LanguageModel.loadKn(dst, modelPrefix)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val scored = graft.operators.LanguageModel.scoreKnNll(batch, textCol, idCol, lm)
          val kept = maxAvgNll.map(t => scored.filter(col("avg_nll") <= t)).getOrElse(scored)
          if (!kept.isEmpty) dst.upsert(kept, table, idCol)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** The incremental-pipe-as-stream: append new rows of `src` into a
    * parquet sink with exactly-once file-sink semantics — the streaming
    * upgrade of `Patterns.incrementalPipe` (checkpoint = watermark). */
  def pipeStream(spark: SparkSession, srcPath: String, schema: StructType,
                 dstPath: String, checkpoint: String): StreamingQuery = {
    val q = readStream(spark, srcPath, schema)
      .writeStream
      .format("parquet")
      .option("path", dstPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming UPSERT ingestion: every micro-batch merges into a
    * connector table by primary key via `foreachBatch` — the streaming
    * form of the reference's `pipe` (delete-then-insert by pk,
    * `patterns/mysql_patterns.rb:12-32`), which `pipeStream`'s
    * append-only file sink cannot express.
    *
    * Delivery is effectively-once: the checkpoint makes each source file
    * processed exactly once per committed batch, and a batch REPLAYED
    * after a crash re-upserts the same (pk, row) pairs — idempotent by
    * the upsert contract. The connector decides the merge scale path
    * (partition-scoped copy-on-write for `PartitionedParquetConnector`,
    * tmp+swap for the plain one). */
  def upsertStream(src: DataFrame, dst: graft.sources.Connector, table: String,
                   primaryKey: String, checkpoint: String): StreamingQuery = {
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) dst.upsert(batch, table, primaryKey)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming rollup maintenance: each micro-batch advances the
    * incremental aggregate table via
    * [[graft.operators.Patterns.incrementalAggregateTick]] — mergeable
    * partials (sum/count/min/max) combined with the old values of just
    * the affected groups, O(batch + affected groups) per trigger.
    *
    * Replay safety comes from the table's own `_wm` watermark, not the
    * checkpoint: a micro-batch replayed after a crash carries rows at or
    * before the stored `max(matcher)` and merges as a no-op. The same
    * watermark imposes the contract that the source is matcher-ordered
    * across batches (the engine-wide high-watermark CDC assumption). */
  def rollupStream(src: DataFrame, dst: graft.sources.Connector, table: String,
                   groupCols: Seq[String], aggs: Seq[(String, String, String)],
                   matcher: String, checkpoint: String): StreamingQuery = {
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.Patterns.incrementalAggregateTick(
            batch, dst, table, groupCols, aggs, matcher)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming SCD Type-2: each micro-batch chains into versions and
    * closes affected current rows via
    * [[graft.operators.Patterns.scdType2Tick]]. The tick's own PER-KEY
    * watermark (each key's stored current `matcher`) makes a replayed
    * batch a no-op — and, unlike a global-max filter, never drops one
    * key's legitimate update because another key carries a later
    * timestamp. */
  def scdStream(src: DataFrame, dst: graft.sources.Connector, table: String,
                primaryKey: String, matcher: String, checkpoint: String): StreamingQuery = {
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.Patterns.scdType2Tick(batch, dst, table, primaryKey, matcher)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
