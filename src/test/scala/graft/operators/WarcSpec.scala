package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("warcIterator streams: records surface from a bounded read prefix, not the whole file") {
    // 10k records ≈ 1.8 MB generated LAZILY (one record's bytes live at
    // a time); a counting stream proves the walk buffers O(record) —
    // taking 3 records must read ≲ the 64 KiB buffer fill, never the
    // full stream
    val one = Warc.warcBytes(1L, nResponses = 1)
    var produced = 0L
    val lazyStream: java.io.InputStream = new java.io.InputStream {
      private var rec = 0
      private var cur: java.io.ByteArrayInputStream = _
      override def read(): Int = {
        if (cur == null || cur.available() == 0) {
          if (rec >= 10000) return -1
          rec += 1
          cur = new java.io.ByteArrayInputStream(one)
        }
        produced += 1
        cur.read()
      }
    }
    val it = Warc.warcIterator(lazyStream)
    val first3 = it.take(3).toList
    assert(first3.map(_.warcType) == List("warcinfo", "response", "warcinfo"),
      first3.map(_.warcType))
    // offsets are decompressed-stream positions: the second file's
    // warcinfo starts exactly one file-length in
    assert(first3.map(_.offset) == List(0L, 74L, one.length.toLong), first3.map(_.offset))
    assert(produced < 128 * 1024,
      s"streaming walk read $produced bytes for 3 records — file-sized buffering")
    // and the iterator does finish the stream when drained
    assert(it.size > 10000, "remaining records should all surface")
  }

  test("a lying multi-GB Content-Length ends the walk instead of allocating it") {
    val lying = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${Warc.MaxRecordBytes + 1}\r\n\r\nhello\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    assert(Warc.parseWarc(1L, lying).isEmpty)
  }

  test("charset fallback chain: declared header charset → meta prescan → UTF-8 → Latin-1") {
    val latinBody = "café".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def respond(head: String, body: Array[Byte]): Array[Byte] = {
      val payload = head.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: ${payload.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload ++
        "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    }
    // 1. declared in the Content-Type header wins
    val declared = Warc.parseWarcTexts(1L, respond(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n",
      latinBody)).head
    assert(declared.charset == "ISO-8859-1" && declared.html == "café", declared)
    // 2. no header charset: the meta prescan of the first 1 KiB
    val meta = Warc.parseWarcTexts(2L, respond(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
      "<meta charset=\"windows-1252\">".getBytes ++ latinBody)).head
    assert(meta.charset == "windows-1252" && meta.html.endsWith("café"), meta)
    // 3. no declaration anywhere: strict UTF-8 when the bytes comply
    val utf8 = Warc.parseWarcTexts(3L, respond(
      "HTTP/1.1 200 OK\r\n\r\n",
      "café".getBytes(java.nio.charset.StandardCharsets.UTF_8))).head
    assert(utf8.charset == "UTF-8" && utf8.html == "café", utf8)
    // 4. undeclared non-UTF-8 bytes land on total Latin-1
    val fallback = Warc.parseWarcTexts(4L, respond("HTTP/1.1 200 OK\r\n\r\n",
      latinBody)).head
    assert(fallback.charset == "ISO-8859-1" && fallback.html == "café", fallback)
    // 5. a BOGUS declared charset skips to the UTF-8 step, not a crash
    val bogus = Warc.parseWarcTexts(5L, respond(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=not-a-charset\r\n\r\n",
      "plain".getBytes)).head
    assert(bogus.charset == "UTF-8" && bogus.html == "plain", bogus)
    // 6. the oracled fixture shape: latin1 archives round-trip café
    val withLatin = Warc.parseWarcTexts(6L, Warc.warcBytes(6L, 2, latin1 = true))
    assert(withLatin.length == 3)
    val latinRow = withLatin.last
    assert(latinRow.charset == "ISO-8859-1" &&
      latinRow.html.startsWith("<html>café doc 6") &&
      latinRow.target_uri == "http://example.com/6/latin1", latinRow)
    assert(Warc.parseWarc(6L, Warc.warcBytes(6L, 2, latin1 = true))
      .last.content_length == 111L)
  }

  test("an over-long all-digit status token parses as no status, never a NumberFormatException") {
    // ADVICE r16: 'HTTP/1.1 99999999999' (11 digits) used to throw out
    // of the streaming walk paths and kill the whole task
    val payload = "HTTP/1.1 99999999999 OK\r\n\r\nbody".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload ++
      "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = Warc.parseWarc(1L, rec)
    assert(out == Seq(Warc.WarcRecord(1L, 0, "response", "http://x/",
      payload.length.toLong, None)), out.toString)
    // and the CDX walk survives it too (it calls httpStatus unguarded)
    assert(Warc.parseWarcCdx(1L, rec).head.http_status.isEmpty)
    // ADVICE r17: RFC 9110 codes are EXACTLY three digits — a 1-2 digit
    // token is malformed and must not parse to a bogus small status
    val short = "HTTP/1.1 99 Bogus\r\n\r\nbody".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    val rec2 = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/\r\n" +
      s"Content-Length: ${short.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ short ++
      "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    assert(Warc.parseWarc(1L, rec2).head.http_status.isEmpty)
  }

  test("meta charset prescan only honors charset= inside <meta> tags, any letter case") {
    def respond(body: Array[Byte]): Array[Byte] = {
      val payload = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: ${payload.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload ++
        "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    }
    // ADVICE r16: a stray "charset=" in BODY TEXT near a meta tag must
    // not pick the charset — these valid-UTF-8 bytes decode as UTF-8
    val stray = Warc.parseWarcTexts(1L, respond(
      ("<meta name=\"x\" content=\"y\"><p>use charset=KOI8-R for legacy pages</p>"
        ).getBytes(java.nio.charset.StandardCharsets.UTF_8))).head
    assert(stray.charset == "UTF-8", stray)
    // mixed-case <Meta ...> is still a meta tag (the old prescan only
    // triggered on '<meta'/'<META')
    val mixed = Warc.parseWarcTexts(2L, respond(
      "<Meta Charset=\"ISO-8859-1\">café".getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1))).head
    assert(mixed.charset == "ISO-8859-1" && mixed.html.endsWith("café"), mixed)
  }

  test("parseWarcCdx indexes records by decompressed-stream offset with decoded-text digests") {
    val plain = Warc.parseWarcCdx(7L, Warc.warcBytes(7L, 3, latin1 = true))
    assert(plain.length == 5, plain.toString)
    // offsets: warcinfo 74 bytes, each response 188 + digits(id) = 189
    assert(plain.map(_.offset) == Seq(0L, 74L, 263L, 452L, 641L), plain.map(_.offset))
    assert(plain.head.text_md5.isEmpty && plain.head.warc_type == "warcinfo")
    // digest = md5 of the DECODED html (charset chain applied), so the
    // latin row's digest replays from the café string
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(("<html>café doc 7" + "." * 64).substring(0, 40).concat("</html>")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    assert(plain.last.text_md5.contains(expected), plain.last.toString)
    // the gzip form locates records at the SAME uncompressed offsets —
    // the property that makes the offset a stable CDX locator
    val gzipped = Warc.parseWarcCdx(7L, Warc.warcBytes(7L, 3, gzipMembers = true,
      latin1 = true))
    assert(gzipped == plain, "gzip must not move decompressed offsets")
  }

  test("parseWarcCdx surfaces the Location header of 3xx responses; resolveRedirects follows chains") {
    def resp(uri: String, head: String, body: String): Array[Byte] = {
      val payload = (head + body).getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload ++
        "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    }
    val archive =
      resp("http://x/a", "HTTP/1.1 301 Moved\r\nLocation: http://x/b\r\n\r\n", "") ++
      resp("http://x/b", "HTTP/1.1 302 Found\r\nlocation:   http://x/c\r\n\r\n", "") ++
      resp("http://x/c", "HTTP/1.1 200 OK\r\n\r\n", "landed")
    val cdx = Warc.parseWarcCdx(1L, archive)
    assert(cdx.map(_.redirect_location) ==
      Seq(Some("http://x/b"), Some("http://x/c"), None), cdx.toString)
    // a 200 with a Location header must NOT be treated as a redirect
    val not3xx = Warc.parseWarcCdx(2L,
      resp("http://x/d", "HTTP/1.1 200 OK\r\nLocation: http://x/e\r\n\r\n", "ok"))
    assert(not3xx.head.redirect_location.isEmpty)
    // distributed resolution over the same rows
    val spark0 = spark
    import spark0.implicits._
    val rows = cdx.toDF()
    val out = Warc.resolveRedirects(rows, maxHops = 5).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3),
        r.getBoolean(4))).toMap
    assert(out == Map(
      "http://x/a" -> ("http://x/c", 2L, true, true),
      "http://x/b" -> ("http://x/c", 1L, true, true)), out.toString)
  }

  test("readWarcTextsDir streams response texts from files with charset and stable ids") {
    val dir = tmpDir("graft_warc_texts_")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.warc"),
      Warc.warcBytes(1L, 2, latin1 = true))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.warc.gz"),
      Warc.warcBytes(2L, 1, gzipMembers = true))
    val out = Warc.readWarcTextsDir(spark, dir).collect()
    assert(out.length == 4, out.mkString(";")) // 2 + latin from a, 1 from b
    val byUri = out.map(r => r.getString(2) -> r).toMap
    val latin = byUri("http://example.com/1/latin1")
    assert(latin.getString(3) == "ISO-8859-1" &&
      latin.getString(4).startsWith("<html>café doc 1"), latin.toString)
    assert(byUri("http://example.com/2/0").getString(3) == "UTF-8")
    // ids are path hashes: both of a.warc's texts share one media_id,
    // b's differs, and a re-read reproduces them
    assert(out.map(_.getLong(0)).distinct.length == 2)
    assert(Warc.readWarcTextsDir(spark, dir).collect().map(_.getLong(0)).sorted
      .sameElements(out.map(_.getLong(0)).sorted))
  }

  test("crawlDiff classifies added/gone/changed/unchanged per URI from CDX rows") {
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType)))
    val docs = df(docSchema, Seq(org.apache.spark.sql.Row(7L)))
    val oldCdx = Warc.extractWarcCdx(Warc.syntheticWarcGen(docs, "doc_id", 0)).toDF()
    val newCdx = Warc.extractWarcCdx(Warc.syntheticWarcGen(docs, "doc_id", 1)).toDF()
    val out = Warc.crawlDiff(oldCdx, newCdx).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // id 7 -> n = 4 responses in gen 0 (+latin); gen 1: 5 responses,
    // even pages mutated, latin dropped
    assert(out == Map(
      "http://example.com/7/0" -> "changed",
      "http://example.com/7/1" -> "unchanged",
      "http://example.com/7/2" -> "changed",
      "http://example.com/7/3" -> "unchanged",
      "http://example.com/7/4" -> "added",
      "http://example.com/7/latin1" -> "gone"), out.toString)
    // warcinfo records never participate (both gens have one)
    assert(!out.contains(""))
  }

  test("crawlDiff keys on canonical URIs: alias spellings diff as unchanged (VERDICT r17 #2)") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("warc_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("target_uri",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text_md5",
        org.apache.spark.sql.types.StringType)))
    val oldCdx = df(schema, Seq(
      org.apache.spark.sql.Row("response", "http://h.com/a/b?x=1&y=2", "m1"),
      org.apache.spark.sql.Row("response", "http://h.com/chg", "old")))
    // the new generation re-spells the same page twice — uppercase host,
    // default port, dot-segments, shuffled params — same digest
    val newCdx = df(schema, Seq(
      org.apache.spark.sql.Row("response", "HTTP://H.COM:80/a/./b?y=2&x=1", "m1"),
      org.apache.spark.sql.Row("response", "http://h.com:80/a/b?y=2&x=1", "m1"),
      org.apache.spark.sql.Row("response", "http://h.com/chg", "new")))
    val out = Warc.crawlDiff(oldCdx, newCdx).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // raw-URI keying would have reported added+gone here
    assert(out == Map(
      "http://h.com/a/b?x=1&y=2" -> "unchanged",
      "http://h.com/chg" -> "changed"), out.toString)
  }

  test("readWarcCdxDir streams the capture index from files, matching the in-memory walk") {
    val dir = tmpDir("graft_cdxdir_")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.warc"),
      Warc.warcBytes(3L, 2, latin1 = true))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.warc.gz"),
      Warc.warcBytes(4L, 3, gzipMembers = true))
    val out = Warc.readWarcCdxDir(spark, dir).collect()
    val byFile = out.groupBy(_.getAs[String]("path").split('/').last)
    // a.warc: warcinfo + 2 responses + latin; b: warcinfo + 3 responses
    assert(byFile("a.warc").length == 4 && byFile("b.warc.gz").length == 4)
    // every field matches the in-memory extractor (shared cdxFields):
    // offsets, lengths, statuses, decoded-text digests
    val mem = Warc.parseWarcCdx(3L, Warc.warcBytes(3L, 2, latin1 = true))
    val streamed = byFile("a.warc").sortBy(_.getAs[Int]("rec_idx"))
    mem.zip(streamed).foreach { case (m, s) =>
      assert(m.warc_type == s.getAs[String]("warc_type") &&
        m.target_uri == s.getAs[String]("target_uri") &&
        m.offset == s.getAs[Long]("offset") &&
        m.content_length == s.getAs[Long]("content_length") &&
        m.http_status == Option(s.getAs[Integer]("http_status")).map(_.toInt) &&
        m.text_md5 == Option(s.getAs[String]("text_md5")), s"$m vs $s")
    }
    // gzip form: offsets are decompressed-stream locators either way
    assert(byFile("b.warc.gz").map(_.getAs[Long]("offset")).min == 0L)
  }

  test("readWarcTextsSelected decodes exactly the listed (path, record) slots") {
    val dir = tmpDir("graft_seldir_")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.warc"),
      Warc.warcBytes(5L, 4))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.warc.gz"),
      Warc.warcBytes(6L, 3, gzipMembers = true))
    val full = Warc.readWarcTextsDir(spark, dir)
    // pick records 1 and 3 of a.warc and record 2 of b.warc.gz
    val wanted = full.filter(
      (col("path").endsWith("a.warc") && col("rec_idx").isin(1, 3)) ||
      (col("path").endsWith("b.warc.gz") && col("rec_idx") === 2))
      .select(col("path"), col("rec_idx"))
    val sel = Warc.readWarcTextsSelected(spark, wanted)
    // selected output == the full reader filtered to the same slots,
    // row for row (same decode, same charset, same uri, same ids)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("media_id"), r.getAs[Int]("rec_idx"),
        r.getAs[String]("target_uri"), r.getAs[String]("charset"),
        r.getAs[String]("html"))
    val expect = full.join(wanted, Seq("path", "rec_idx"), "left_semi")
      .collect().map(key).toSet
    val got = sel.collect().map(key).toSet
    assert(got == expect && got.size == 3, s"got=$got")
    // a listed slot that is not a response (warcinfo idx 0) yields no row
    assert(Warc.readWarcTextsSelected(spark,
      full.sparkSession.createDataFrame(Seq((s"$dir/a.warc", 0)))
        .toDF("path", "rec_idx")).count() == 0L)
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
