package graft.operators

import graft.SparkSpec

class WarcSpec extends SparkSpec {

  test("parseWarc walks records by Content-Length; gzip forms parse identically") {
    val plain = Warc.warcBytes(7L, nResponses = 3)
    val recs = Warc.parseWarc(7L, plain)
    assert(recs.length == 4, recs.toString)
    assert(recs.head == Warc.WarcRecord(7L, 0, "warcinfo", "", 17L, None))
    recs.tail.zipWithIndex.foreach { case (r, i) =>
      assert(r == Warc.WarcRecord(7L, i + 1, "response",
        s"http://example.com/7/$i", 91L, Some(200)), r.toString)
    }
    // one whole-stream member and per-record members both gunzip to the
    // same record table (GZIPInputStream walks concatenated members)
    assert(Warc.parseWarc(7L, Warc.warcBytes(7L, 3, gzipWhole = true)) == recs)
    assert(Warc.parseWarc(7L, Warc.warcBytes(7L, 3, gzipMembers = true)) == recs)
  }

  test("dirty archives stay total: truncation keeps the parsed prefix, garbage yields nothing") {
    val plain = Warc.warcBytes(9L, nResponses = 3)
    // cut mid-way through the LAST response's payload: the declared
    // length no longer fits, so exactly the first three records stand
    val clipped = Warc.parseWarc(9L, plain.take(plain.length - 60))
    assert(clipped.length == 3 && clipped.last.rec_idx == 2, clipped.toString)
    assert(Warc.parseWarc(1L, plain.take(8)).isEmpty)       // header only
    assert(Warc.parseWarc(2L, Array.fill[Byte](64)(0x21)).isEmpty)
    assert(Warc.parseWarc(3L, null).isEmpty)
    // gzip magic with junk behind it must not throw
    assert(Warc.parseWarc(4L, Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4,
      5, 6, 7, 8, 9)).isEmpty)
    // a record whose Content-Length lies past the buffer ends the walk
    val lying = new String(plain, java.nio.charset.StandardCharsets.US_ASCII)
      .replaceFirst("Content-Length: 17", "Content-Length: 99999")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    assert(Warc.parseWarc(5L, lying).isEmpty)
    // a non-HTTP response payload parses with a null status
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x/\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    assert(Warc.parseWarc(6L, raw) ==
      Seq(Warc.WarcRecord(6L, 0, "response", "http://x/", 5L, None)))
  }

  test("parseWarcTexts yields each response's body after the HTTP header block") {
    val texts = Warc.parseWarcTexts(7L, Warc.warcBytes(7L, 2, gzipMembers = true))
    assert(texts.length == 2, texts.toString) // the warcinfo record yields no text
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(t.rec_idx == i + 1 && t.target_uri == s"http://example.com/7/$i")
      assert(t.html.startsWith(s"<html>doc 7 $i") && t.html.endsWith("</html>"),
        t.html)
      assert(t.html.length == 47, t.html)
    }
    // a response without an HTTP header split yields its whole payload
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 5\r\n\r\nhello\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    assert(Warc.parseWarcTexts(8L, raw).head.html == "hello")
  }

  test("readWarcDir reads .warc/.warc.gz files into the record table with stable ids") {
    val dir = tmpDir("graft_warc_")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.warc"),
      Warc.warcBytes(1L, 2))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.warc.gz"),
      Warc.warcBytes(2L, 3, gzipMembers = true))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/ignore.txt"),
      "not an archive".getBytes)
    val out = Warc.readWarcDir(spark, dir)
    // 2 files x (warcinfo + responses); the txt file is glob-filtered
    assert(out.count() == (1 + 2) + (1 + 3), out.collect().mkString(";"))
    val byFile = out.groupBy("path").count().collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(byFile == Map("a.warc" -> 3L, "b.warc.gz" -> 4L), byFile.toString)
    // ids are path hashes: re-reading yields the same ids
    val again = Warc.readWarcDir(spark, dir).select("media_id").distinct().count()
    assert(again == 2)
  }
}
