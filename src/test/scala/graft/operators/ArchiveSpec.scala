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

  test("list returns snapshots newest first") {
    val c = new ParquetConnector(spark, tmpDir("graft_arch2_src_"))
    val archive = tmpDir("graft_arch2_")
    c.write(usersDf, "users")
    Archive.snapshot(c, "users", archive, ZonedDateTime.of(2024, 1, 1, 0, 0, 0, 0, ZoneOffset.UTC))
    Archive.snapshot(c, "users", archive, ZonedDateTime.of(2024, 2, 1, 0, 0, 0, 0, ZoneOffset.UTC))
    assert(Archive.list("users", archive) == Seq("20240201T000000", "20240101T000000"))
  }
}
