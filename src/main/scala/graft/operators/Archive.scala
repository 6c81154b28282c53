package graft.operators

import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import org.apache.spark.sql.SaveMode
import graft.sources.Connector

/** S13 snapshot/archival dump — the parquet re-expression of the
  * reference's `mysqldump | gzip > file` sink (taskrabbit/forklift
  * `transports/mysql.rb:209-232`): a timestamped, compressed, immutable
  * snapshot of a table, written by the engine (executors in parallel)
  * instead of a shelled-out dump process. */
object Archive {

  private val stamp = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")

  /** Dump `table` to `<archiveDir>/<table>/<timestamp>/` as gzip parquet.
    * Returns the snapshot path. */
  def snapshot(conn: Connector, table: String, archiveDir: String,
               at: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): String = {
    val path = s"$archiveDir/$table/${at.format(stamp)}"
    conn.read(table).write
      .mode(SaveMode.ErrorIfExists)   // snapshots are immutable
      .option("compression", "gzip")  // the `| gzip` analog
      .parquet(path)
    path
  }

  /** Restore a snapshot into a connector table (the `mysql < dump` path). */
  def restore(conn: Connector, snapshotPath: String, table: String): Unit =
    conn.write(conn.spark.read.parquet(snapshotPath), table, SaveMode.Overwrite)

  /** List snapshot timestamps for a table, newest first. */
  def list(table: String, archiveDir: String): Seq[String] = {
    val d = java.nio.file.Paths.get(archiveDir, table)
    if (!java.nio.file.Files.isDirectory(d)) return Seq.empty
    val s = java.nio.file.Files.list(d)
    try {
      val b = Seq.newBuilder[String]
      val it = s.iterator()
      while (it.hasNext) b += it.next().getFileName.toString
      b.result().sorted.reverse
    } finally s.close()
  }

  /** Retention: delete all but the newest `keepLast` snapshots of
    * `table` and return the deleted timestamps (newest-first order, as
    * [[list]]). A dump-per-tick plan accumulates snapshots without
    * bound; this is the `find … -mtime +N -delete` of the dump-file
    * world, made explicit. Idempotent — re-running deletes nothing
    * further. `keepLast` must be ≥ 1: an archive that can silently
    * drop its ONLY snapshot is a footgun, not a retention policy. */
  def prune(table: String, archiveDir: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val doomed = list(table, archiveDir).drop(keepLast)
    doomed.foreach { ts =>
      graft.sources.FileTableOps.deleteRecursively(
        java.nio.file.Paths.get(archiveDir, table, ts))
    }
    doomed
  }
}
