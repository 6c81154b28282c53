package graft.operators

import graft.SparkSpec
import graft.sources.ParquetConnector
import java.time.{ZoneOffset, ZonedDateTime}

/** S13 snapshot/archival parity (`transports/mysql.rb:209-232`). */
class ArchiveSpec extends SparkSpec {

  test("snapshot dumps a timestamped immutable copy; restore round-trips") {
    val c = new ParquetConnector(spark, tmpDir("graft_arch_src_"))
    val archive = tmpDir("graft_arch_")
    c.write(usersDf, "users")
    val at = ZonedDateTime.of(2024, 6, 1, 12, 0, 0, 0, ZoneOffset.UTC)
    val path = Archive.snapshot(c, "users", archive, at)
    assert(path.endsWith("users/20240601T120000"))
    // immutable: dumping to the same stamp refuses
    intercept[Exception] { Archive.snapshot(c, "users", archive, at) }
    // restore into a fresh table
    c.drop("users")
    Archive.restore(c, path, "users")
    assert(c.count("users") == 5)
  }

  test("partitioned table: snapshot/restore round-trips; a restored stale pk index is never trusted") {
    import java.nio.file.{Files, Path, Paths}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    def copyDir(from: Path, to: Path): Unit = {
      Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else { Files.createDirectories(dst.getParent); Files.copy(p, dst) }
      }
    }
    val d = tmpDir("graft_arch_part_")
    val c = new graft.sources.PartitionedParquetConnector(spark, d,
      matcher = "updated_at", pkIndexMinBytes = 0L)
    val archive = tmpDir("graft_arch_part_dst_")
    c.write(usersDf, "users")
    // first tick bootstraps the pk index
    c.upsert(df(usersSchema, Seq(Row(2L, "tick1@x.com", "F", "L",
      ts("2024-01-02 00:00:00"), ts("2024-01-02 01:00:00")))), "users", "id")
    val idx = Paths.get(d, "users.parquet", "_graft_pkidx")
    val meta = Paths.get(d, "users.parquet", "_graft_pkidx_meta.json")
    assert(Files.isDirectory(idx) && Files.isRegularFile(meta))
    val snap = Archive.snapshot(c, "users", archive)
    // post-snapshot: move id=3 from 2024-01-03 to 2024-05-05 — the live
    // index now disagrees with the snapshot about where id=3 lives
    c.upsert(df(usersSchema, Seq(Row(3L, "moved@x.com", "F", "L",
      ts("2024-01-03 10:00:00"), ts("2024-05-05 00:00:00")))), "users", "id")
    val saved = Paths.get(tmpDir("graft_arch_saved_"), "idx")
    copyDir(idx, saved)
    val savedMeta = Files.readAllBytes(meta)
    // restore: the atomic dir swap must drop index and meta outright
    Archive.restore(c, snap, "users")
    assert(!Files.isDirectory(idx), "restore must not carry the pk index over")
    assert(!Files.isRegularFile(meta), "restore must not carry the index meta over")
    assert(c.read("users").filter(col("id") === 3).head()
      .getAs[String]("email") == "user3@example.com", "restore must bring the snapshot row back")
    // adversarial restore tool: copies the saved (now stale) index back.
    // Trusted, it would say id=3 lives only in gpart=2024-05-05 (which
    // the restore erased) and the merge would leave the restored
    // 2024-01-03 row in place — a duplicate pk. The restore rewrote
    // every part file, so the fingerprint check must flag it stale.
    copyDir(saved, idx)
    Files.write(meta, savedMeta)
    c.upsert(df(usersSchema, Seq(Row(3L, "final@x.com", "F", "L",
      ts("2024-01-03 10:00:00"), ts("2024-06-06 00:00:00")))), "users", "id")
    assert(c.read("users").filter(col("id") === 3).count() == 1,
      "stale restored index must not be trusted")
    assert(c.read("users").filter(col("id") === 3).head().getAs[String]("email") == "final@x.com")
    assert(c.count("users") == 5)
  }

  test("list returns snapshots newest first") {
    val c = new ParquetConnector(spark, tmpDir("graft_arch2_src_"))
    val archive = tmpDir("graft_arch2_")
    c.write(usersDf, "users")
    Archive.snapshot(c, "users", archive, ZonedDateTime.of(2024, 1, 1, 0, 0, 0, 0, ZoneOffset.UTC))
    Archive.snapshot(c, "users", archive, ZonedDateTime.of(2024, 2, 1, 0, 0, 0, 0, ZoneOffset.UTC))
    assert(Archive.list("users", archive) == Seq("20240201T000000", "20240101T000000"))
  }

  test("prune keeps the newest keepLast snapshots, is idempotent, survivors restore") {
    val c = new ParquetConnector(spark, tmpDir("graft_arch3_src_"))
    val archive = tmpDir("graft_arch3_")
    c.write(usersDf, "users")
    (1 to 5).foreach { m =>
      Archive.snapshot(c, "users", archive, ZonedDateTime.of(2024, m, 1, 0, 0, 0, 0, ZoneOffset.UTC))
    }
    val deleted = Archive.prune("users", archive, keepLast = 2)
    assert(deleted == Seq("20240301T000000", "20240201T000000", "20240101T000000"))
    assert(Archive.list("users", archive) == Seq("20240501T000000", "20240401T000000"))
    assert(Archive.prune("users", archive, keepLast = 2).isEmpty) // idempotent
    // a surviving snapshot still restores intact
    Archive.restore(c, s"$archive/users/20240401T000000", "users_r")
    assert(c.count("users_r") == c.count("users"))
    intercept[IllegalArgumentException] { Archive.prune("users", archive, keepLast = 0) }
    // unknown table: nothing to delete, no error
    assert(Archive.prune("ghost", archive, keepLast = 1).isEmpty)
  }
}
