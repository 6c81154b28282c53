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
}
