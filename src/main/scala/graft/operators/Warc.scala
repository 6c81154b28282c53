package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container) reading,
  * pure JVM: a record walk over `WARC/1.x` header blocks driven by
  * `Content-Length` (never a delimiter scan through payloads, which may
  * contain anything), with transparent multi-member gzip (the
  * `.warc.gz` convention compresses each record as its own member;
  * `GZIPInputStream` reads concatenated members natively).
  *
  * The reference has no web-archive surface (forklift moves MySQL/ES
  * rows); this is the LLM-pipeline brief's ingestion front door — a
  * 100 TB text corpus usually STARTS as Common Crawl WARCs, and the
  * record walk here is the stage before [[graft.functions.TextFunctions.stripHtml]]
  * / langid / quality gating.
  *
  * Scale shape: [[extractWarcRecords]] maps payloads per partition
  * (one file's records never leave their executor, headers parse from
  * a few hundred bytes per record, payload bytes are sliced not
  * copied until requested); [[readWarcDir]] feeds it whole `.warc` /
  * `.warc.gz` files via Spark's binaryFile source — per-FILE
  * parallelism, the unit Common Crawl ships (~1 GB gz members), so a
  * crawl dump scales by adding executors, never by a driver loop.
  * Dirty input stays total: a malformed record ends that payload's
  * walk with the records already parsed (the
  * [[Multimodal.decodeAviFrames]] convention), truncated payloads
  * yield the records whose declared lengths fit, and garbage yields
  * zero rows — one poison file must not kill the scan. */
object Warc {

  /** One parsed record: WARC-Type, WARC-Target-URI ('' when absent),
    * declared Content-Length, and — for `response` records whose
    * payload opens with an HTTP status line — the parsed status. */
  case class WarcRecord(media_id: Long, rec_idx: Int, warc_type: String,
                        target_uri: String, content_length: Long,
                        http_status: Option[Int])

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Decompress ALL gzip members (a .warc.gz is many concatenated
    * members — Java's GZIPInputStream walks them natively). */
  private[graft] def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b), 65536)
    try {
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Walk the record stream of one (possibly gzipped) WARC payload.
    * Content-Length drives every hop; anything malformed ends the walk
    * with what parsed. */
  private[graft] def parseWarc(mediaId: Long, bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    walkWarc(bytes) { (warcType, uri, len, b, bodyStart) =>
      val status =
        if (warcType == "response" && len >= 12 &&
            b(bodyStart) == 'H' && b(bodyStart + 1) == 'T' &&
            b(bodyStart + 2) == 'T' && b(bodyStart + 3) == 'P') {
          val head = new String(b, bodyStart, math.min(len, 64L).toInt, Ascii)
          val parts = head.split(" ")
          if (parts.length >= 2 && parts(1).nonEmpty &&
              parts(1).forall(_.isDigit)) Some(parts(1).toInt)
          else None
        } else None
      out += WarcRecord(mediaId, out.length, warcType, uri, len, status)
    }
    out.toSeq
  }

  /** One text row per HTTP `response` record: the payload body AFTER
    * the HTTP header block, decoded UTF-8 — the html that feeds
    * [[graft.functions.TextFunctions.stripHtml]]. Responses without a
    * header/body split yield the whole payload. */
  case class WarcText(media_id: Long, rec_idx: Int, target_uri: String, html: String)

  private[graft] def parseWarcTexts(mediaId: Long, bytes: Array[Byte]): Seq[WarcText] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcText]
    var idx = 0
    walkWarc(bytes) { (warcType, uri, len, b, bodyStart) =>
      if (warcType == "response") {
        // body = after the HTTP header block's blank line
        var i = bodyStart
        val end = bodyStart + len.toInt
        var split = -1
        while (split < 0 && i + 3 < end) {
          if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
            split = i + 4
          else i += 1
        }
        val from = if (split > 0) split else bodyStart
        out += WarcText(mediaId, idx, uri,
          new String(b, from, end - from, java.nio.charset.StandardCharsets.UTF_8))
      }
      idx += 1
    }
    out.toSeq
  }

  /** The record walk shared by the extractors: `emit(type, uri,
    * contentLength, decompressedBuffer, bodyStart)` per well-formed
    * record; anything malformed ends the walk with what was emitted. */
  private def walkWarc(bytes: Array[Byte])(
      emit: (String, String, Long, Array[Byte], Int) => Unit): Unit =
    try {
      if (bytes == null || bytes.length < 8) return
      val b = if (isGzip(bytes)) gunzipAll(bytes) else bytes
      var pos = 0
      var done = false
      def lineEnd(from: Int): Int = { // index of the \r of the next CRLF
        var i = from
        while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
        if (i + 1 < b.length) i else -1
      }
      while (!done && pos + 8 <= b.length) {
        if (!(b(pos) == 'W' && b(pos + 1) == 'A' && b(pos + 2) == 'R' &&
            b(pos + 3) == 'C' && b(pos + 4) == '/')) done = true
        else {
          // header block: the version line, then k: v lines up to the
          // empty line; bodyStart < 0 until the empty line is found
          var lineStart = 0
          var cur = lineEnd(pos) // end of the version line
          var warcType = ""
          var uri = ""
          var len = -1L
          var bodyStart = -1
          while (bodyStart < 0 && cur > 0) {
            lineStart = cur + 2
            val next = lineEnd(lineStart)
            if (next < 0) cur = -1 // no terminator: malformed header
            else if (next == lineStart) { // empty line ends the block
              bodyStart = lineStart + 2
            } else {
              val line = new String(b, lineStart, next - lineStart, Ascii)
              val ci = line.indexOf(':')
              if (ci > 0) {
                val k = line.substring(0, ci).trim.toLowerCase
                val v = line.substring(ci + 1).trim
                if (k == "warc-type") warcType = v
                else if (k == "warc-target-uri") uri = v
                else if (k == "content-length")
                  len = try v.toLong catch { case _: NumberFormatException => -1L }
              }
              cur = next
            }
          }
          if (bodyStart < 0 || len < 0 || bodyStart + len > b.length)
            done = true // malformed header or truncated tail record
          else {
            emit(warcType, uri, len, b, bodyStart)
            // records terminate with CRLF CRLF per the spec
            pos = (bodyStart + len + 4).toInt
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Per-partition batched record extraction over a payload table —
    * one row per WARC record; the media-probe shape
    * ([[Multimodal.extractMp4Probe]]) for web archives. */
  def extractWarcRecords(archives: DataFrame, idCol: String = "media_id",
                         payloadCol: String = "payload"): Dataset[WarcRecord] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.flatMap { case (id, bytes) => parseWarc(id, bytes) } }
  }

  /** Per-partition batched BODY extraction — one row per HTTP response
    * with its html payload decoded: the stage that feeds
    * `stripHtml → langid → quality` in a crawl-ingestion pipeline. */
  def extractWarcTexts(archives: DataFrame, idCol: String = "media_id",
                       payloadCol: String = "payload"): Dataset[WarcText] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.flatMap { case (id, bytes) => parseWarcTexts(id, bytes) } }
  }

  /** Read a directory of `.warc` / `.warc.gz` files into the record
    * table via Spark's binaryFile source — per-file parallelism (the
    * unit Common Crawl ships), ids = a stable hash of the file path so
    * downstream joins don't depend on listing order. */
  def readWarcDir(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(xxhash64(col("path")).as("media_id"), col("path"),
        col("content").as("payload"))
    extractWarcRecords(files).toDF()
      .join(files.select(col("media_id"), col("path")), Seq("media_id"))
  }

  /** Spec-correct WARC bytes: a `warcinfo` record + `n` HTTP `response`
    * records with FIXED-WIDTH bodies (payload = 44-byte HTTP head +
    * 47-byte padded html ⇒ Content-Length 91 for every response — the
    * closed form `q_warc_records` states); `gzipWhole` wraps the
    * stream in one gzip member, `gzipMembers` compresses each record
    * as its own member (the .warc.gz convention). */
  private[graft] def warcBytes(id: Long, nResponses: Int,
                               gzipWhole: Boolean = false,
                               gzipMembers: Boolean = false): Array[Byte] = {
    def record(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
      val h = new StringBuilder("WARC/1.0\r\n")
      headers.foreach { case (k, v) => h.append(k).append(": ").append(v).append("\r\n") }
      h.append("Content-Length: ").append(body.length).append("\r\n\r\n")
      h.toString.getBytes(Ascii) ++ body ++ "\r\n\r\n".getBytes(Ascii)
    }
    val info = record(Seq("WARC-Type" -> "warcinfo"),
      "software: graft\r\n".getBytes(Ascii)) // 17 bytes
    val head = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" // 44 bytes
    val responses = (0 until nResponses).map { i =>
      val html = (s"<html>doc $id $i" + "." * 64).substring(0, 40) + "</html>" // 47 bytes
      record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"http://example.com/$id/$i"),
        (head + html).getBytes(Ascii))
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val members = info +: responses
    if (gzipMembers) members.map(gz).reduce(_ ++ _)
    else {
      val whole = members.reduce(_ ++ _)
      if (gzipWhole) gz(whole) else whole
    }
  }

  /** Archive table of planted WARCs with CLOSED-FORM record rows —
    * (2 + id%5) responses behind a warcinfo record, every response 91
    * content bytes at status 200; even ids arrive as per-record-member
    * .warc.gz (the transparent-gzip path is exercised INSIDE the
    * oracled query, not just a spec). */
  def syntheticWarc(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val payload: Long => Array[Byte] = (id: Long) =>
      warcBytes(id, 2 + (id % 5).toInt, gzipMembers = id % 2 == 0)
    df.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .mapPartitions { it => it.map(id => (id, "warc", s"synthetic://$id", payload(id))) }
      .toDF("media_id", "kind", "uri", "payload")
  }
}
