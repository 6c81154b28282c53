package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {

  test("parseRules: group selection, shadowing, merging, and the empty-Disallow idiom") {
    val txt =
      """# our policy
        |User-agent: *
        |Disallow: /tmp/
        |
        |User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /private/
        |Allow: /private/pub$
        |Crawl-delay: 5
        |
        |User-agent: GRAFTBOT
        |Disallow: /*.zip$
        |
        |Sitemap: https://example.org/sitemap.xml
        |""".stripMargin
    // a specific group SHADOWS * entirely; same-agent groups merge
    // (case-insensitive token match); unknown directives skip
    val rules = Robots.parseRules(txt, "graftbot")
    assert(rules.map(r => (r.allow, r.path)) == Seq(
      (false, "/private/"), (true, "/private/pub$"), (false, "/*.zip$")), rules)
    // an agent with no specific group falls back to *
    assert(Robots.parseRules(txt, "nobody").map(_.path) == Seq("/tmp/"))
    // stacked User-agent lines share the rule block
    assert(Robots.parseRules(txt, "otherbot").map(_.path) ==
      Seq("/private/", "/private/pub$"))
    // empty Disallow: = allow all -> no rule; dirty input is total
    assert(Robots.parseRules("User-agent: *\nDisallow:\n", "x").isEmpty)
    assert(Robots.parseRules(null, "x").isEmpty)
    assert(Robots.parseRules("not robots at all\n%%%", "x").isEmpty)
  }

  test("patternRegex: literals quoted, * wildcard, $ anchor") {
    assert(Robots.patternRegex("/a/b") == "^/a/b")
    assert(Robots.patternRegex("/*.zip$") == "^/.*\\.zip$")
    assert(Robots.patternRegex("/p(1)+x") == "^/p\\(1\\)\\+x")
  }

  test("parseCrawlDelay and sitemapRefs: agent shadowing, host-scoped sitemap lines") {
    val txt =
      """User-agent: *
        |Crawl-delay: 10
        |Disallow: /tmp/
        |Sitemap: https://x/a.xml
        |
        |User-agent: graftbot
        |Crawl-delay: 2.5
        |Disallow: /private/
        |Sitemap: https://x/b.xml
        |""".stripMargin
    // the specific group's delay shadows *; an unknown agent gets *'s
    assert(Robots.parseCrawlDelay(txt, "graftbot").contains(2.5))
    assert(Robots.parseCrawlDelay(txt, "nobody").contains(10.0))
    // no delay anywhere / malformed value / null text -> None
    assert(Robots.parseCrawlDelay("User-agent: *\nDisallow: /x\n", "a").isEmpty)
    assert(Robots.parseCrawlDelay("User-agent: *\nCrawl-delay: soon\n", "a").isEmpty)
    assert(Robots.parseCrawlDelay(null, "a").isEmpty)
    // sitemap lines are host-scoped: every reference surfaces in order
    assert(Robots.sitemapRefs(txt) == Seq("https://x/a.xml", "https://x/b.xml"))
    assert(Robots.sitemapRefs(null).isEmpty)
    assert(Robots.sitemapRefs("nothing here").isEmpty)
  }

  test("a directive between groups ends the start-of-group (reference-parser separator rule)") {
    // ADVICE r16: Google's reference parser treats ANY non-user-agent
    // line as ending the start-of-group, so agent a must get its own
    // EMPTY (allow-all) group here — never merge into the * group below
    val txt = "User-agent: a\nCrawl-delay: 10\nUser-agent: *\nDisallow: /x\n"
    assert(Robots.parseRules(txt, "a").isEmpty,
      "agent a must not inherit the * group's rules")
    assert(Robots.parseRules(txt, "b").map(_.path) == Seq("/x"))
    // the delay parser follows the same separator rule: the delay binds
    // to agent a's group, and * never absorbs agent a
    assert(Robots.parseCrawlDelay(txt, "a").contains(10.0))
    assert(Robots.parseCrawlDelay(txt, "b").isEmpty)
    // a Sitemap line separates just the same
    val sm = "User-agent: a\nSitemap: http://x/s.xml\nUser-agent: *\nDisallow: /y\n"
    assert(Robots.parseRules(sm, "a").isEmpty)
    assert(Robots.parseRules(sm, "c").map(_.path) == Seq("/y"))
  }

  test("parseSitemap: urlset pages, sitemapindex children, dirty input total") {
    val urlset =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc> http://x/a </loc><lastmod>2026-01-01</lastmod>
        |       <changefreq>daily</changefreq><priority>0.8</priority></url>
        |  <url><loc>http://x/b</loc></url>
        |  <url><priority>0.1</priority></url>
        |</urlset>""".stripMargin
    val entries = Robots.parseSitemap(urlset)
    // the loc-less third entry skips; whitespace inside <loc> trims
    assert(entries == Seq(
      Robots.SitemapEntry("url", "http://x/a", "2026-01-01", "daily", "0.8"),
      Robots.SitemapEntry("url", "http://x/b", "", "", "")), entries)
    val index = "<sitemapindex><sitemap><loc>http://x/1.xml</loc></sitemap>" +
      "<sitemap><loc>http://x/2.xml</loc><lastmod>2026-02-01</lastmod></sitemap>" +
      "</sitemapindex>"
    assert(Robots.parseSitemap(index).map(e => (e.kind, e.loc, e.lastmod)) ==
      Seq(("sitemap", "http://x/1.xml", ""), ("sitemap", "http://x/2.xml", "2026-02-01")))
    assert(Robots.parseSitemap(null).isEmpty)
    assert(Robots.parseSitemap("not xml at all <url>").isEmpty)
  }

  test("politenessWaves: per-host rank in priority order, perWave slots, hosts independent") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pri", org.apache.spark.sql.types.LongType)))
    val rows = (for (h <- 1L to 2L; p <- 1L to 5L) yield
      org.apache.spark.sql.Row(h, p * 10 + h)).toSeq
    val out = Robots.politenessWaves(df(schema, rows), "host", "pri", perWave = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // host 1 priorities 11,21,31,41,51 -> ranks 0..4 -> waves 0,0,1,1,2
    assert(out((1L, 11L)) == (0L, 0L) && out((1L, 21L)) == (0L, 1L))
    assert(out((1L, 31L)) == (1L, 0L) && out((1L, 41L)) == (1L, 1L))
    assert(out((1L, 51L)) == (2L, 0L))
    // host 2 ranks independently — no cross-host coupling
    assert(out((2L, 12L)) == (0L, 0L) && out((2L, 52L)) == (2L, 0L))
    // at most perWave URLs of one host share a wave
    val perHostWave = out.toSeq.groupBy { case ((h, _), (w, _)) => (h, w) }
    assert(perHostWave.values.forall(_.size <= 2))
  }

  test("fetchPlan: per-host delays clamp to [floor, cap], missing hosts floor, " +
    "not_before = wave × delay") {
    val robotsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("txt", org.apache.spark.sql.types.StringType)))
    val urlSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pri", org.apache.spark.sql.types.LongType)))
    val robots = df(robotsSchema, Seq(
      Row(1L, "User-agent: graftbot\nCrawl-delay: 2.5\nDisallow: /p/\n"),
      Row(2L, "User-agent: *\nCrawl-delay: 120\nDisallow: /p/\n"),   // capped
      Row(3L, "User-agent: *\nCrawl-delay: 0.2\nDisallow: /p/\n"),   // sub-floor
      Row(4L, "User-agent: *\nDisallow: /p/\n")))                    // no delay
    // host 5 has no robots row at all -> floor
    val urls = df(urlSchema,
      for (h <- 1L to 5L; p <- 1L to 3L) yield Row(h, p * 10 + h))
    val out = Robots.fetchPlan(robots, "host", "txt", urls, "host", "pri",
        "graftbot", perWave = 2, floorDelayMs = 1000L, maxDelayMs = 60000L)
      .collect()
      .map(r => (r.getAs[Long]("host"), r.getAs[Long]("pri")) ->
        (r.getAs[Long]("wave"), r.getAs[Long]("delay_ms"),
          r.getAs[Long]("not_before_ms"))).toMap
    // specific-group fractional delay rounds to ms
    assert(out((1L, 11L)) == (0L, 2500L, 0L))
    assert(out((1L, 31L)) == (1L, 2500L, 2500L)) // wave 1 waits one delay
    // a day-long delay clamps to the cap; sub-floor clamps up; absent
    // delays and absent robots rows both land on the floor
    assert(out((2L, 32L))._2 == 60000L && out((2L, 32L))._3 == 60000L)
    assert(out((3L, 13L))._2 == 1000L)
    assert(out((4L, 14L))._2 == 1000L)
    assert(out((5L, 35L)) == (1L, 1000L, 1000L))
    // duplicate robots captures for one host must not fan URLs out
    // through the join — the conservative (max) delay wins
    val dupRobots = df(robotsSchema, Seq(
      Row(1L, "User-agent: *\nCrawl-delay: 2\nDisallow: /p/\n"),
      Row(1L, "User-agent: *\nCrawl-delay: 7\nDisallow: /p/\n")))
    val dupOut = Robots.fetchPlan(dupRobots, "host", "txt",
        df(urlSchema, Seq(Row(1L, 11L), Row(1L, 21L))), "host", "pri",
        "graftbot", perWave = 1).collect()
    assert(dupOut.length == 2, dupOut.mkString(";"))
    assert(dupOut.forall(_.getAs[Long]("delay_ms") == 7000L))
  }

  test("robotsSitemaps explodes Sitemap references per host in file order") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("txt", org.apache.spark.sql.types.StringType)))
    val robots = df(schema, Seq(
      Row(1L, "User-agent: *\nDisallow: /x\nSitemap: http://a/1.xml\nSitemap: http://a/2.xml\n"),
      Row(2L, "User-agent: *\nDisallow: /y\n"), // none -> zero rows
      Row(3L, null)))                           // dirty input total
    val out = Robots.robotsSitemaps(robots, "host", "txt").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSet == Set((1L, 0, "http://a/1.xml"), (1L, 1, "http://a/2.xml")),
      out.mkString(";"))
  }

  test("canonicalUrl: RFC 3986 normalization, idempotent, dirty input total") {
    val c = Robots.canonicalUrl _
    // case + default port + dot-segments + query sort + fragment
    assert(c("HTTP://Example.COM:80/a/./b/../c?b=2&a=1#frag") ==
      "http://example.com/a/c?a=1&b=2")
    assert(c("https://S.org:443//x//y/") == "https://s.org/x/y/")
    // non-default ports survive; http :443 is NOT default
    assert(c("http://s.org:443/a") == "http://s.org:443/a")
    assert(c("http://s.org:8080/a") == "http://s.org:8080/a")
    // unreserved escapes decode; others uppercase; empty path -> /
    assert(c("http://h/%7Euser/%2fpath?q=%41") == "http://h/~user/%2Fpath?q=A")
    assert(c("http://h") == "http://h/")
    // /.. at root clamps to /; trailing slash is semantic and survives
    assert(c("http://h/a/..") == "http://h/")
    assert(c("http://h/a/b/") == "http://h/a/b/")
    // bare k and k= stay distinct spellings; empty query drops
    assert(c("http://h/p?flag&a=1") == "http://h/p?a=1&flag")
    assert(c("http://h/p?flag=&a=1") == "http://h/p?a=1&flag=")
    assert(c("http://h/p?") == "http://h/p")
    // idempotence: the canonical form is its own canonical form
    Seq("HTTP://Example.COM:80/a/./b/../c?b=2&a=1#frag",
      "https://S.org:443//x//y/", "http://h/%7Euser/%2fpath?q=%41").foreach { u =>
      assert(c(c(u)) == c(u), u)
    }
    // dirty input total
    assert(c(null) == null)
    assert(c("not a url") == "not a url")
    assert(c("mailto:x@y.z") == "mailto:x@y.z") // no ://-authority form
  }

  test("canonicalUrl: authority escapes decode THEN case-fold (ADVICE r17)") {
    val c = Robots.canonicalUrl _
    // §6.2.2.2 applies to the authority too: an escaped unreserved
    // octet in the host must meet its plain spelling
    assert(c("http://ex%41mple.com/") == "http://example.com/")
    assert(c("http://EX%61MPLE.com:80/x") == "http://example.com/x")
    // a surviving (non-unreserved) authority escape keeps §6.2.2.1's
    // UPPERCASE hex (ADVICE r18) while the unescaped host chars fold —
    // the same convention normEscapes applies to path/query, so an
    // external RFC-conformant canonicalizer produces the same spelling
    assert(c("http://H%c3%a9ST.com/") == "http://h%C3%A9st.com/")
    assert(c("http://h%C3%A9st.com/") == "http://h%C3%A9st.com/")
    // idempotence holds through the authority leg
    Seq("http://ex%41mple.com/", "http://h%C3%A9st.com/",
      "http://H%c3%a9ST.com/").foreach { u =>
      assert(c(c(u)) == c(u), u)
    }
  }

  test("recrawlBands: a newer sitemap lastmod promotes unchanged into the changed band") {
    val diffSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("target_uri", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.StringType)))
    val smSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("loc", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lastmod", org.apache.spark.sql.types.StringType)))
    val diff = df(diffSchema, Seq(
      Row("http://h/p/0", "changed"), Row("http://h/p/1", "unchanged"),
      Row("http://h/p/2", "unchanged"), Row("http://h/p/3", "added"),
      Row("http://h/p/4", "gone")))
    val sitemap = df(smSchema, Seq(
      // alias spelling joins through the canonical form; the W3C
      // datetime's date prefix compares lexicographically
      Row("HTTP://h:80/p/1", "2026-02-02T00:00:00Z"),
      Row("http://h/p/1", "2025-01-01"), // older duplicate — newest wins
      Row("http://h/p/2", "2025-11-30"), // older than the release — fresh
      Row("http://h/p/4", "not a date"), // malformed is not evidence
      Row("http://h/p/4", "2026-13-99"))) // digit-shaped but not a date
    val out = Robots.recrawlBands(diff, sitemap, releasedAt = "2026-01-01")
      .collect()
      .map(r => r.getAs[String]("target_uri") ->
        (r.getAs[String]("status"), r.getAs[Boolean]("stale"), r.getAs[Long]("band")))
      .toMap
    assert(out("http://h/p/0") == ("changed", false, 0L))
    assert(out("http://h/p/1") == ("unchanged", true, 0L)) // promoted
    assert(out("http://h/p/2") == ("unchanged", false, 2L))
    assert(out("http://h/p/3") == ("added", false, 1L))
    assert(out("http://h/p/4") == ("gone", false, 3L))
    intercept[IllegalArgumentException] {
      Robots.recrawlBands(diff, sitemap, releasedAt = "Jan 1 2026")
    }
  }

  test("a non-numeric robots host key fails loudly, never an encoder NPE (ADVICE r17)") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("txt", org.apache.spark.sql.types.StringType)))
    val robots = df(schema, Seq(
      Row("example.com", "User-agent: *\nSitemap: http://a/1.xml\n")))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    val e = intercept[Exception] {
      Robots.robotsSitemaps(robots, "host", "txt").collect()
    }
    assert(msgs(e).contains("robotsSitemaps"), msgs(e))
  }

  test("urlGate: longest-match precedence, Allow tie-break, default allow, group shadowing") {
    val robotsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("host_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("txt", org.apache.spark.sql.types.StringType)))
    val urlSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("host_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType)))
    val shadowed =
      "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\n" +
        "Disallow: /private/\nAllow: /private/pub$\nDisallow: /*.zip$\n"
    val starOnly = "User-agent: *\nDisallow: /tmp/\nAllow: /tmp/ok\n"
    val robots = df(robotsSchema, Seq(Row(1L, shadowed), Row(2L, starOnly)))
    val paths = Seq("/index.html", "/private/x", "/private/pub", "/data.zip",
      "/tmp/ok123", "/tmp/zzz")
    val urls = df(urlSchema, for (h <- Seq(1L, 2L); p <- paths) yield Row(h, p))
    val out = Robots.urlGate(robots, "host_id", "txt", urls, "host_id", "path",
        "graftbot")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getBoolean(2), r.getString(3))).toMap
    // host 1: the graftbot group shadows the Disallow-everything * group
    assert(out((1L, "/index.html")) == (true, ""))          // no rule -> allow
    assert(out((1L, "/private/x")) == (false, "/private/"))
    assert(out((1L, "/private/pub")) == (true, "/private/pub$")) // longest wins
    assert(out((1L, "/data.zip")) == (false, "/*.zip$"))    // wildcard + anchor
    assert(out((1L, "/tmp/ok123")) == (true, ""))           // * group shadowed
    // host 2: only a * group
    assert(out((2L, "/tmp/zzz")) == (false, "/tmp/"))
    assert(out((2L, "/tmp/ok123")) == (true, "/tmp/ok"))    // longer Allow wins
    assert(out((2L, "/data.zip")) == (true, ""))
  }
}
