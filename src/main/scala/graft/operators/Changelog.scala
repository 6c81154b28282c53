package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog → snapshot compaction: reduce an insert/update/delete
  * event stream to the final state per primary key — the batch
  * re-derivation path every CDC sink needs (the always-on counterpart
  * is [[graft.streaming.IncrementalStream.upsertStream]]; this one
  * rebuilds a snapshot from scratch or audits one).
  *
  * Shape: ONE partial-aggregated groupBy(pk) — `max_by` over the
  * composite (ts, tie) ordering key picks each key's last change
  * map-side before the single exchange (never a per-key window over
  * the changelog, which would shuffle every change row). Keys whose
  * LAST operation is the delete op vanish from the snapshot; earlier
  * deletes are overridden by later upserts, exactly the log-compaction
  * contract. `tieCol` must make (ts, tie) unique per key — same-ts
  * changes otherwise have no defined winner.
  */
object Changelog {

  /** Compact `changelog` to its final snapshot.
    * Output: (pk, payloadCols…, tsCol) — one row per surviving key,
    * `tsCol` carrying the winning change's timestamp. */
  def compact(changelog: DataFrame, pkCol: String, tsCol: String, tieCol: String,
              opCol: String, deleteOp: String,
              payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "compact: need at least one payload column")
    val key = struct(col(tsCol), col(tieCol))
    val last = struct((col(opCol) +: payloadCols.map(col)) :+ col(tsCol): _*)
    changelog.groupBy(col(pkCol))
      .agg(max_by(last, key).as("_last"))
      .filter(col(s"_last.$opCol") =!= lit(deleteOp))
      .select(col(pkCol) +: payloadCols.map(c => col(s"_last.$c").as(c)) :+
        col(s"_last.$tsCol").as(tsCol): _*)
  }

  /** Row-level diff of two snapshots by primary key — the audit behind
    * "what did this pipeline run actually change": every key classified
    * `added` / `removed` / `changed`, unchanged keys absent. The
    * inverse companion of [[compact]] (which applies a changelog; this
    * derives one), and the verification step for any snapshot-replace
    * publish.
    *
    * ONE full-outer join on the key — co-partitioned, payload compared
    * null-safely (`<=>`: a NULL→value transition is a change, NULL→NULL
    * is not). Output: (pkCol, change, old_<c>…, new_<c>…) with the
    * absent side's payload NULL. Keys must be unique per side (it is a
    * snapshot diff, not a changelog merge) — duplicate keys fan out
    * exactly like the join they'd corrupt, so run
    * [[graft.operators.Diagnostics.joinSizeAudit]] first when unsure. */
  def snapshotDiff(old: DataFrame, neu: DataFrame, pkCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "snapshotDiff: need at least one payload column")
    val o = old.select((col(pkCol) +: payloadCols.map(c => col(c).as(s"old_$c"))) :+
      lit(1).as("_in_old"): _*)
    val n = neu.select((col(pkCol) +: payloadCols.map(c => col(c).as(s"new_$c"))) :+
      lit(1).as("_in_new"): _*)
    val same = payloadCols.map(c => col(s"old_$c") <=> col(s"new_$c")).reduce(_ && _)
    o.join(n, Seq(pkCol), "full_outer")
      .withColumn("change",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(!same, "changed"))
      .filter(col("change").isNotNull)
      .select(col(pkCol) +: col("change") +:
        (payloadCols.map(c => col(s"old_$c")) ++ payloadCols.map(c => col(s"new_$c"))): _*)
  }
}
