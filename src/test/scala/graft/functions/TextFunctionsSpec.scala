package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Scalar text functions: sanitize parity (T4) + the text-analysis
  * operators (quality, langid, token counting, fingerprint). */
class TextFunctionsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("t", StringType)))

  private def one(s: String) = df(schema, Seq(Row(1L, s)))

  test("sanitizeUtf8 replaces supplementary-plane chars with ??? (mysql.rb:88-99)") {
    val out = one("ok 😀 text").select(TextFunctions.sanitizeUtf8(col("t"))).head().getString(0)
    assert(out == "ok ??? text")
    // BMP chars (codepoint <= 65535) untouched
    val bmp = one("café 中文").select(TextFunctions.sanitizeUtf8(col("t"))).head().getString(0)
    assert(bmp == "café 中文")
  }

  test("tokenCount: whitespace tokens; blank -> 0") {
    val d = df(schema, Seq(Row(1L, "one two  three"), Row(2L, "   "), Row(3L, "")))
    val out = d.select(col("id"), TextFunctions.tokenCount(col("t")).as("c"))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    assert(out == Seq(3, 0, 0))
  }

  test("punctRatio and upperRatio") {
    assert(one("ab!!").select(TextFunctions.punctRatio(col("t"))).head().getDouble(0) == 0.5)
    assert(one("ABcd").select(TextFunctions.upperRatio(col("t"))).head().getDouble(0) == 0.5)
    assert(one("").select(TextFunctions.punctRatio(col("t"))).head().getDouble(0) == 0.0)
  }

  test("stopwordRatio counts hits over non-empty tokens") {
    val r = one("the cat and the hat").select(
      TextFunctions.stopwordRatio(col("t"), Seq("the", "and"))).head().getDouble(0)
    assert(r == 0.6) // 3 of 5
  }

  test("meanWordLen") {
    val r = one("ab cdef").select(TextFunctions.meanWordLen(col("t"))).head().getDouble(0)
    assert(r == 3.0)
  }

  test("qualityScore lands in [0,1]; English prose beats junk") {
    val good = "the quick brown fox jumps over the lazy dog and it was a fine day for running in the sun with friends"
    val junk = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( )))) ____"
    val d = df(schema, Seq(Row(1L, good), Row(2L, junk)))
    val out = d.select(col("id"), TextFunctions.qualityScore(col("t")).as("q"))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(0) > out(1))
  }

  test("langId identifies clear samples; gibberish -> und") {
    val d = df(schema, Seq(
      Row(1L, "the cat sat on the mat and it was happy with this"),
      Row(2L, "der Hund ist nicht auf der Strasse und das ist gut"),
      Row(3L, "le chat est dans la maison et il est content pour le moment"),
      Row(4L, "el perro es un animal que vive en la casa con una familia"),
      Row(5L, "zzz qqq kkk vvv www")))
    val out = d.select(col("id"), TextFunctions.langId(col("t")).as("l"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("en", "de", "fr", "es", "und"))
  }

  test("langId language set is pluggable: a 5th language classifies without engine changes") {
    // Italian is not in the built-in set — the default would answer 'es'
    // (shared stopwords) or 'und'; with an extended candidate set the
    // same fixture classifies as 'it', and the built-in four keep working
    val it = "it" -> Seq("il", "di", "che", "non", "per", "con", "una", "sono", "della", "questo")
    val d = df(schema, Seq(
      Row(1L, "il gatto non sono per la casa che una storia di questo con della gente"),
      Row(2L, "the cat sat on the mat and it was happy with this")))
    val out = d.select(col("id"),
      TextFunctions.langId(col("t"), TextFunctions.defaultLanguages :+ it).as("l"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("it", "en"))
  }

  test("fingerprint: normalization-invariant, content-sensitive, stable (RollingHash)") {
    val d = df(schema, Seq(
      Row(1L, "Hello   World"), Row(2L, "hello world"), Row(3L, "hello worlds")))
    val out = d.select(col("id"), TextFunctions.fingerprint(col("t")).as("fp"))
      .orderBy("id").collect().map(_.getLong(1))
    assert(out(0) == out(1)) // case/whitespace-insensitive
    assert(out(0) != out(2)) // content-sensitive
    // stable across runs/plans (pure byte math)
    val again = d.select(TextFunctions.fingerprint(col("t"))).collect().map(_.getLong(0))
    assert(again(0) == out(0))
  }

  test("subwordCount splits on word/punct boundaries") {
    val r = one("don't stop").select(TextFunctions.subwordCount(col("t"))).head().getInt(0)
    assert(r == 5) // don / ' / t / stop + space piece filtering -> don,',t,stop + space
  }

  test("profile fields ≡ the original regex compositions on 300 random strings") {
    // the native profile replaced regex/HOF compositions wholesale — this
    // pins every replicated field against the ORIGINAL Spark formulation
    // on adversarial random text (unicode letters, boundary whitespace,
    // punctuation runs), in one batch pass
    val rnd = new scala.util.Random(1234)
    val alphabet = "abzABZ019 \t\n.,!?'éÉßäÖ中ωΣ-_()"
    val strings = (1 to 300).map { _ =>
      val len = rnd.nextInt(40)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "   " :+ "\t\n" :+ "word\n"
    val d = df(schema, strings.zipWithIndex.map { case (s, i) => Row(i.toLong, s) })
    val sw = Seq("the", "ab", "za")
    // original compositions (as shipped before the native profile)
    val toks = split(lower(trim(col("t"))), "[^\\p{L}]+")
    val oldStop = {
      val hits = size(filter(toks, x => x.isInCollection(sw)))
      val total = size(filter(toks, x => length(x) > 0))
      when(total === 0, lit(0.0)).otherwise(hits.cast("double") / total)
    }
    val oldTok = when(length(trim(col("t"))) === 0, lit(0))
      .otherwise(size(split(trim(col("t")), "\\s+")))
    val oldPunct = when(length(col("t")) === 0, lit(0.0))
      .otherwise(length(regexp_replace(col("t"), "[^\\p{Punct}]", "")).cast("double") / length(col("t")))
    val letters = length(regexp_replace(col("t"), "[^\\p{L}]", ""))
    val oldUpper = when(letters === 0, lit(0.0))
      .otherwise(length(regexp_replace(col("t"), "[^\\p{Lu}]", "")).cast("double") / letters)
    val oldSubword = when(length(trim(col("t"))) === 0, lit(0)).otherwise(
      size(filter(split(col("t"), "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"),
        x => length(x) > 0)))
    val rows = d.orderBy("id").select(
      oldStop.as("o_stop"), TextFunctions.stopwordRatio(col("t"), sw).as("n_stop"),
      oldTok.as("o_tok"), oldPunct.as("o_punct"), oldUpper.as("o_upper"),
      oldSubword.as("o_sub"), TextFunctions.subwordCount(col("t")).as("n_sub")).collect()
    rows.zip(strings).foreach { case (r, s) =>
      assert(r.getDouble(0) == r.getDouble(1), s"stopwordRatio mismatch on ${s.take(40)}")
      assert(r.getInt(5) == r.getInt(6), s"subwordCount mismatch on ${s.take(40)}")
    }
    // profile-backed quality components vs composition, via the struct
    val prof = strings.map(s => TextProfileOps.profile(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), Array.empty, false))
    rows.zip(prof).zip(strings).foreach { case ((r, p), s) =>
      val chars = p.getLong(0)
      val punct = if (chars == 0) 0.0 else p.getLong(1).toDouble / chars
      val upper = if (p.getLong(2) == 0) 0.0 else p.getLong(3).toDouble / p.getLong(2)
      assert(r.getInt(2) == p.getLong(4).toInt, s"ws_tokens mismatch on ${s.take(40)}")
      assert(r.getDouble(3) == punct, s"punct mismatch on ${s.take(40)}")
      assert(r.getDouble(4) == upper, s"upper mismatch on ${s.take(40)}")
    }
  }

  test("nfcNormalize and stripAccents: composed/decomposed forms converge") {
    val decomposed = "cafe\u0301 nai\u0308ve" // e + combining acute, i + combining diaeresis
    val composed = "caf\u00e9 na\u00efve"
    val d = df(StructType(Seq(StructField("id", LongType), StructField("t", StringType))),
      Seq(Row(1L, decomposed), Row(2L, composed), Row(3L, "Ø plain ß")))
    val out = d.orderBy("id").select(
      TextFunctions.nfcNormalize(col("t")).as("nfc"),
      TextFunctions.stripAccents(col("t")).as("stripped")).collect()
    assert(out(0).getString(0) == composed, "NFC composes")
    assert(out(0).getString(1) == "cafe naive" && out(1).getString(1) == "cafe naive")
    // non-decomposable letters pass through (DuckDB strip_accents parity)
    assert(out(2).getString(1) == "Ø plain ß")
    // fingerprints collide after NFC, not before
    val fps = d.filter(col("id") <= 2).select(
      TextFunctions.fingerprint(TextFunctions.nfcNormalize(col("t"))).as("f"))
      .collect().map(_.getLong(0)).toSet
    assert(fps.size == 1, "normalized forms must share a fingerprint")
  }

  test("redactPii: emails, IPs, phones redacted; clean text untouched; counts match") {
    val cases = Seq(
      "write to jane.doe+spam@mail.example.org today" -> "write to <EMAIL> today",
      "server at 10.0.255.3 rebooted" -> "server at <IP> rebooted",
      "call (555) 123-4567 or 555.987.6543 now" -> "call <PHONE> or <PHONE> now",
      "version 1.2.3 of lib, 42 items, user_1@x.io" -> "version 1.2.3 of lib, 42 items, <EMAIL>",
      "no pii here at all" -> "no pii here at all")
    val d = df(StructType(Seq(StructField("id", LongType), StructField("t", StringType))),
      cases.zipWithIndex.map { case ((in, _), i) => Row(i.toLong, in) })
    val got = d.orderBy("id").select(TextFunctions.redactPii(col("t")))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), got.mkString("\n"))
    val counts = d.orderBy("id").select(
      TextFunctions.piiCount(col("t"), TextFunctions.defaultPiiRules.head).as("emails"))
      .collect().map(_.getInt(0)).toSeq
    assert(counts == Seq(1, 0, 0, 1, 0))
  }

  test("profile ws_tokens replicates split(trim, \\s+) limit=-1 exactly (boundary quirks)") {
    // Spark's split keeps one empty piece per boundary ws-run (limit -1):
    // the profile's token count — qualityScore's mean-word-len
    // denominator — must agree with the composed tokenCount on every
    // tricky boundary shape, or quality scores drift for docs ending in
    // newlines (most real documents).
    val cases = Seq("hi ok go\n", "\ta b", "\t\t", "a b", "   ", "", "a\t", "\tx\n", "x", " x ")
    val d = df(schema, cases.zipWithIndex.map { case (s, i) => Row(i.toLong, s) })
    val composed = d.orderBy("id")
      .select(when(length(trim(col("t"))) === 0, lit(0))
        .otherwise(size(split(trim(col("t")), "\\s+"))))
      .collect().map(_.getInt(0)).toSeq
    val viaProfile = cases.map { s =>
      TextProfileOps.profile(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        Array.empty, asciiTokens = false).getLong(4).toInt
    }
    assert(viaProfile == composed, s"profile=$viaProfile composed=$composed")
  }

  private def norm(s: String): String =
    one(s).select(TextFunctions.urlNormalize(col("t"))).head().getString(0)
  private def dom(s: String): String =
    one(s).select(TextFunctions.urlRegisteredDomain(col("t"))).head().getString(0)

  test("urlNormalize: case, default ports, fragments, tracking params") {
    assert(norm("HTTPS://Example.COM:443/Docs/A?utm_source=f&ref=x&utm_campaign=c#top")
      == "https://example.com/Docs/A?ref=x")
    // path case preserved; non-default port kept; http strips :80 not :443
    assert(norm("http://HOST.org:80/KeepCase") == "http://host.org/KeepCase")
    assert(norm("http://host.org:443/p") == "http://host.org:443/p")
    assert(norm("https://host.org:8443/p") == "https://host.org:8443/p")
    // tracking-only query vanishes entirely; bare host gains /
    assert(norm("https://a.b/?utm_a=1&utm_b=2") == "https://a.b/")
    assert(norm("https://a.b") == "https://a.b/")
    assert(norm("https://a.b/p?fbclid=xyz") == "https://a.b/p")
    assert(norm("https://a.b/p?gclid=1&keep=2") == "https://a.b/p?keep=2")
    // mid-list tracking param: the & it owned is consumed, list stays valid
    assert(norm("https://a.b/p?x=1&utm_s=2&y=3") == "https://a.b/p?x=1&y=3")
    // non-URL input passes through trimmed
    assert(norm("  not a url  ") == "not a url")
  }

  test("urlNormalize: boundary-anchored tracking removal and empty-path query") {
    // look-alike param names are NOT tracking params — they must survive
    assert(norm("https://a.b/p?xfbclid=1") == "https://a.b/p?xfbclid=1")
    assert(norm("https://a.b/p?my_gclid=2&keep=3") == "https://a.b/p?my_gclid=2&keep=3")
    assert(norm("https://a.b/p?xutm_source=1") == "https://a.b/p?xutm_source=1")
    // a path SEGMENT that looks like a tracking param is never touched
    assert(norm("https://a.b/utm_page=3") == "https://a.b/utm_page=3")
    assert(norm("https://a.b/fbclid=9?keep=1") == "https://a.b/fbclid=9?keep=1")
    // leading tracking param: its `?` survives and absorbs the orphan `&`
    assert(norm("https://a.b/p?utm_s=1&keep=2") == "https://a.b/p?keep=2")
    // consecutive tracking params mid-list collapse to a single `&`
    assert(norm("https://a.b/p?x=1&utm_a=2&utm_b=3&y=4") == "https://a.b/p?x=1&y=4")
    // empty path with surviving query gains the canonical `/`
    assert(norm("https://a.b?keep=1") == "https://a.b/?keep=1")
    assert(norm("https://a.b/?keep=1") == "https://a.b/?keep=1")
    assert(norm("https://a.b?utm_s=1&keep=2") == "https://a.b/?keep=2")
  }

  private def strip(s: String): String =
    one(s).select(TextFunctions.stripHtml(col("t"))).head().getString(0)

  test("stripHtml: scripts/styles/comments die wholesale, tags strip, entities decode") {
    assert(strip("<html><head><style>p{x:1}</style></head><body>" +
      "<h1>Title</h1><p>Hello <b>world</b></p>" +
      "<script>var i = 0; if (i<1) i++;</script></body></html>") == "Title Hello world")
    assert(strip("a<!-- hidden\nmultiline -->b") == "a b")
    assert(strip("<SCRIPT>\nmulti\nline()\n</SCRIPT>ok") == "ok",
      "case-insensitive, dotall script removal")
    assert(strip("x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;z")
      == "x & y <tag> \"q\" 's' z")
    // entity decode AFTER tag removal: encoded markup stays as text
    assert(strip("&lt;script&gt;alert(1)&lt;/script&gt;") == "<script>alert(1)</script>")
    // &amp; decodes last: double-encoded stays single-encoded
    assert(strip("&amp;lt;") == "&lt;")
    assert(strip("  multiple\t\nspaces  ") == "multiple spaces")
  }

  test("mainContent: short blocks and link-dense blocks drop, prose survives") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.StringType)))
    def extract(html: String, minChars: Int = 25, maxLinkPct: Int = 33): String =
      df(schema, Seq(org.apache.spark.sql.Row(html)))
        .select(TextFunctions.mainContent(col("t"), minChars, maxLinkPct).as("m"))
        .collect().head.getString(0)
    val prose = "This paragraph carries plenty of ordinary prose characters to pass."
    val html = "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      s"<p>$prose</p>" +
      "<div>ad</div>" +
      "<footer>See <a href=\"/t\">Terms of Service here</a> and " +
      "<a href=\"/p\">the full Privacy Policy text</a></footer>" +
      "</body></html>"
    assert(extract(html) == prose)
    // a prose block with ONE modest link inside survives the density gate
    val linked = "<p>A long sentence of real content that happens to mention " +
      "<a href=\"/x\">a link</a> but is mostly text either way.</p>"
    assert(extract(linked) == "A long sentence of real content that happens to " +
      "mention a link but is mostly text either way.")
    // the same block fails when the gate is strict
    assert(extract(linked, maxLinkPct = 2) == "")
    // multiple kept blocks join with newlines, in document order
    assert(extract(s"<p>$prose</p><p>$prose again and again and again.</p>")
      == s"$prose\n$prose again and again and again.")
    // pages with nothing salvageable yield '', not a failure
    assert(extract("<nav><a href=x>l</a></nav><div>ad</div>") == "")
    assert(extract("") == "")
  }

  test("urlRegisteredDomain: PSL-aware, userinfo/port stripped, naive fallback for unknown TLDs") {
    assert(dom("https://a.b.Example.COM/x") == "example.com")
    assert(dom("http://user:pw@deep.sub.host.ORG:8080/p?q=1") == "host.org")
    assert(dom("https://example.com") == "example.com")
    // multi-label registries resolve through the vendored PSL snapshot
    assert(dom("https://shop.foo.co.uk/") == "foo.co.uk")
    assert(dom("http://WWW.Bar.COM.AU:80/") == "bar.com.au")
    assert(dom("https://deep.sub.site.gob.mx/x") == "site.gob.mx")
    // a host that IS a public suffix registers nothing
    assert(dom("https://co.uk/") == "")
    // wildcard rule (*.ck): any 2-label .ck name is itself a suffix...
    assert(dom("https://anything.ck/") == "")
    assert(dom("https://shop.anything.ck/") == "shop.anything.ck")
    // ...except the exception rule !www.ck, registrable at 2 labels
    assert(dom("https://foo.www.ck/") == "www.ck")
    // 2-label wildcard base (*.kawasaki.jp) + its exception
    assert(dom("https://x.foo.kawasaki.jp/") == "x.foo.kawasaki.jp")
    assert(dom("https://sub.city.kawasaki.jp/") == "city.kawasaki.jp")
    // unknown TLD -> the PSL implicit-* default (last two labels)
    assert(dom("https://a.b.example.zz/") == "example.zz")
    // dot-less hosts and non-URLs -> empty
    assert(dom("https://localhost:9000/x") == "")
    assert(dom("plain text") == "")
  }

  private def links(s: String): Seq[String] =
    one(s).select(TextFunctions.extractLinks(col("t"))).head().getSeq[String](0)

  test("extractLinks: quote styles, case, attribute order, decoys, document order") {
    assert(links("""<p><a href="http://a.com/1">x</a> and <A CLASS='c' HREF='http://b.com/2?q=1'>y</A></p>""")
      == Seq("http://a.com/1", "http://b.com/2?q=1"))
    // no-href anchors, hrefs on non-anchor tags, unquoted hrefs: not matched
    assert(links("""<a name="anchor">n</a><link href="style.css"><a href=bare>u</a>""").isEmpty)
    // whitespace around =, relative urls kept raw (normalize decides later)
    assert(links("""<a href = '/relative/path'>r</a>""") == Seq("/relative/path"))
    assert(links("").isEmpty && links("no markup at all").isEmpty)
  }

  test("zipfFit: planted power law recovers slope -1; flat corpus scores near 0") {
    val sch = StructType(Seq(StructField("text", StringType)))
    // token w<r> appears ⌊1000/r⌋ times → freq ∝ 1/rank exactly
    val zipfTokens = (1 to 40).flatMap(r => Seq.fill(1000 / r)(s"w$r"))
    val zipf = df(sch, Seq(Row(zipfTokens.mkString(" "))))
    val fit = TextFunctions.zipfFit(zipf, "text", topK = 40).head()
    assert(fit.getLong(1) == 40L)
    assert(math.abs(fit.getDouble(2) - (-1.0)) < 0.05, s"slope ${fit.getDouble(2)}")
    assert(fit.getDouble(4) > 0.99, s"r2 ${fit.getDouble(4)}")
    // uniform frequencies: slope 0 (template spam signature)
    val flat = df(sch, Seq(Row((1 to 30).map(r => s"u$r u$r u$r").mkString(" "))))
    val flatFit = TextFunctions.zipfFit(flat, "text", topK = 30).head()
    assert(math.abs(flatFit.getDouble(2)) < 1e-9)
    intercept[IllegalArgumentException](TextFunctions.zipfFit(zipf, "text", topK = 1))
  }
}
