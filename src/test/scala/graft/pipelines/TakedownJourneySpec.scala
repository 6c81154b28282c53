package graft.pipelines

import graft.SparkSpec
import graft.plans.{Plan, PlanConfig}
import org.apache.spark.sql.functions._

/** The takedown/retraction tick end-to-end (VERDICT r17 #3): a crawl
  * tick builds a release with live fp/mh indexes; a takedown removes one
  * doc from the release AND retires its index entries; the NEXT crawl
  * tick then re-ingests an exact twin of the removed doc — the
  * re-ingestable contract: a retired fingerprint/sketch must never keep
  * blocking legitimate content. Crash windows replay through the
  * MIRRORED ordering (stage → release-drop → index-forget → clear):
  * indexes still know the doc until the release drop is durable, and a
  * replay from any window converges. */
class TakedownJourneySpec extends SparkSpec {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def record(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => h.append(k).append(": ").append(v).append("\r\n") }
    h.append("Content-Length: ").append(body.length).append("\r\n\r\n")
    h.toString.getBytes(Ascii) ++ body ++ "\r\n\r\n".getBytes(Ascii)
  }

  private def response(uri: String, text: String): Array[Byte] =
    record(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<html><body><p>$text</p></body></html>").getBytes(Ascii))

  private def warcFile(records: Seq[Array[Byte]]): Array[Byte] =
    (record(Seq("WARC-Type" -> "warcinfo"),
      "software: graft\r\n".getBytes(Ascii)) +: records).reduce(_ ++ _)

  private val pages = Seq(
    "the cat sat on the mat and watched the fire burn low in the evening",
    "a long road runs from the village to the sea and the walk takes one day",
    "bread rises in the warm oven while the baker reads the morning paper",
    "the old clock in the hall strikes twelve and the house falls silent again",
    "rain fell on the tin roof all night and the river rose by the morning",
    "the ship left the harbour before dawn with a cargo of salt and rope")

  private def uri(i: Int) = s"http://example.org/p/$i"

  test("takedown forgets release + every index; a twin re-ingests; crash replays converge") {
    val gen0Dir = tmpDir("graft_take_gen0_")
    val gen1Dir = tmpDir("graft_take_gen1_")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$gen0Dir/a.warc"),
      warcFile((0 until 6).map(i => response(uri(i), pages(i)))))
    // gen 1: byte-identical pages plus an EXACT twin of page 3 under a
    // new URL — before the takedown this would drop at the fp probe
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$gen1Dir/a2.warc"),
      warcFile((0 until 6).map(i => response(uri(i), pages(i))) :+
        response(uri(6), pages(3))))

    val workDir = tmpDir("graft_take_work_")
    val work = new graft.sources.ParquetConnector(spark, workDir)
    def tick(dir: String): Unit = {
      val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_take_pid_")))
      TrainingDataPipeline.crawlTick(plan, dir, workDir,
        minQuality = 0.0, langs = Seq("en"), minhashThreshold = 0.5)
      plan.run()
    }
    def takedown(removeUri: String, steps: Seq[String] = Seq.empty): Unit = {
      val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_take_pid_")))
      TrainingDataPipeline.takedownTick(plan, workDir,
        work.read("release_current").filter(col("url") === removeUri)
          .select(col("doc_id")))
      plan.run(steps)
    }
    def mhIds: Long = work.read("mh_index").select("_id").distinct().count()

    // ── build the corpus
    tick(gen0Dir)
    assert(work.count("release_current") == 6L && work.count("fp_index") == 6L)
    assert(mhIds == 6L)

    // ── takedown page 3 (a robots opt-out / DMCA / PII escalation)
    takedown(uri(3))
    assert(work.count("release_current") == 5L)
    assert(work.read("release_current").filter(col("url") === uri(3)).count() == 0L)
    assert(work.count("fp_index") == 5L, "the fingerprint must be retired")
    assert(mhIds == 5L, "the sketch rows must be retired")
    assert(!work.tables.contains("takedown_pending"))

    // ── the re-ingestable contract: the next tick's EXACT twin of the
    // removed doc passes the fp probe AND the mh probe — a fingerprint
    // that was forgotten stays forgotten
    tick(gen1Dir)
    val released = work.read("release_current")
    assert(released.count() == 6L, released.select("url").collect().mkString(";"))
    assert(released.filter(col("url") === uri(6)).count() == 1L,
      "the removed doc's twin must survive the index probes")
    assert(work.count("fp_index") == 6L && mhIds == 6L)

    // ── crash replays, second takedown (page 1), MIRRORED ordering:
    // crash after take_stage — release and indexes both still intact
    takedown(uri(1), Seq("take_stage"))
    assert(work.tables.contains("takedown_pending") &&
      work.count("takedown_pending") == 1L)
    assert(work.count("release_current") == 6L && work.count("fp_index") == 6L)
    // crash after take_release — the release dropped the doc, but the
    // indexes may forget ONLY after that drop is durable: still 6
    takedown(uri(1), Seq("take_stage", "take_release"))
    assert(work.count("release_current") == 5L)
    assert(work.count("fp_index") == 6L && mhIds == 6L,
      "indexes forget only AFTER the release drop (the mirrored contract)")
    // full replay: take_stage now matches NOTHING in the release, but the
    // staged (doc_id, fp) rows survive the union — the indexes retire
    // from them, and the pending table clears last
    takedown(uri(1))
    assert(work.count("release_current") == 5L)
    assert(work.count("fp_index") == 5L && mhIds == 5L)
    assert(!work.tables.contains("takedown_pending"))
    // replaying the whole takedown once more is a no-op
    takedown(uri(1))
    assert(work.count("release_current") == 5L && work.count("fp_index") == 5L)
  }

  test("revocationTick: robots refusals audit + take down; the audit survives replay") {
    val genDir = tmpDir("graft_rev_gen_")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$genDir/a.warc"),
      warcFile((0 until 6).map(i => response(uri(i), pages(i)))))
    val workDir = tmpDir("graft_rev_work_")
    val work = new graft.sources.ParquetConnector(spark, workDir)
    val plan0 = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_rev_pid_")))
    TrainingDataPipeline.crawlTick(plan0, genDir, workDir,
      minQuality = 0.0, langs = Seq("en"), minhashThreshold = 0.5)
    plan0.run()
    assert(work.count("release_current") == 6L)
    // today's robots revokes pages 3 and 4
    val robots = spark.range(1).select(
      xxhash64(lit("example.org")).as("hkey"),
      lit("User-agent: *\nDisallow: /p/3\nDisallow: /p/4\n").as("txt"))
    def sweep(steps: Seq[String] = Seq.empty): Unit = {
      val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_rev_pid_")))
      TrainingDataPipeline.revocationTick(plan, workDir, robots,
        "hkey", "txt", "graftbot")
      plan.run(steps)
    }
    // crash after the release drop: the audit and pending are staged,
    // the release forgot, the indexes have NOT (mirrored ordering)
    sweep(Seq("revoke_audit", "take_stage", "take_release"))
    assert(work.count("release_current") == 4L)
    assert(work.count("revocations") == 2L)
    assert(work.count("fp_index") == 6L)
    // full replay: revoke_audit matches nothing in the release now, but
    // the audit rows UNION-survive and the indexes retire from pending
    sweep()
    assert(work.count("release_current") == 4L)
    assert(work.count("fp_index") == 4L)
    assert(work.read("mh_index").select("_id").distinct().count() == 4L)
    assert(work.count("revocations") == 2L, "the audit log must survive replay")
    assert(!work.tables.contains("takedown_pending"))
    val rules = work.read("revocations").collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("rule")).toMap
    assert(rules == Map(uri(3) -> "/p/3", uri(4) -> "/p/4"), rules.toString)
    // a second sweep under the same robots is a no-op
    sweep()
    assert(work.count("release_current") == 4L && work.count("revocations") == 2L)
  }

  test("domain + url-prefix takedowns: canonical aliases and subdomains removed, " +
    "public-suffix notices refused loudly (VERDICT r18 #2)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("url", StringType)))
    def art(i: Int) = s"takedown domain article $i holds entirely unique words n$i"
    val docs = df(schema, Seq(
      Row(1L, art(1), "http://www.badguy.com/a"),        // subdomain of notice
      Row(2L, art(2), "HTTP://BADGUY.COM:80/b?x=1"),     // alias spelling of apex
      Row(3L, art(3), "http://deep.sub.badguy.com/c"),   // deep subdomain
      Row(4L, art(4), "http://goodbadguy.com/d"),        // suffix must align on a label
      Row(5L, art(5), "http://shop.victim.co.uk/e"),     // registered domain under co.uk
      Row(6L, art(6), "http://news.example.org/f"),
      Row(7L, art(7), "http://keep.org/general/x"),
      Row(8L, art(8), "http://KEEP.ORG:80/user/123/img"))) // prefix case, alias-spelled
    val workDir = tmpDir("graft_dom_work_")
    val work = new graft.sources.ParquetConnector(spark, workDir)
    work.write(docs, "release_current")
    work.write(graft.operators.Dedup.fingerprintIndex(docs, "text"), "fp_index")
    work.write(graft.operators.Dedup.minhashIndex(docs, "text", "doc_id"), "mh_index")
    val domSchema = StructType(Seq(StructField("domain", StringType)))

    val dplan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_dom_pid_")))
    TrainingDataPipeline.takedownByDomain(dplan, workDir,
      df(domSchema, Seq(Row(" BadGuy.com "), Row("victim.co.uk"))))
    dplan.run()
    def releasedIds: Set[Long] = work.read("release_current")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(releasedIds == Set(4L, 6L, 7L, 8L),
      s"notice must cover apex aliases + all subdomains, nothing more: $releasedIds")
    assert(work.read("mh_index").select("_id").distinct().count() == 4L)
    assert(work.count("fp_index") == 4L)

    // an overbroad notice — a bare public suffix — must fail the plan
    // loudly instead of quietly deleting every .co.uk capture
    val oplan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_dom_pid_")))
    TrainingDataPipeline.takedownByDomain(oplan, workDir,
      df(domSchema, Seq(Row("co.uk"))))
    val e = intercept[Exception](oplan.run())
    assert(e.getMessage != null || e.getCause != null)
    assert(releasedIds == Set(4L, 6L, 7L, 8L), "the refused notice removed nothing")

    // url-prefix notice: the alias-spelled capture under /user/ goes,
    // the sibling path stays
    val pplan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_dom_pid_")))
    TrainingDataPipeline.takedownByUrlPrefix(pplan, workDir,
      df(StructType(Seq(StructField("url_prefix", StringType))),
        Seq(Row("HTTP://keep.org:80/user/"))))
    pplan.run()
    assert(releasedIds == Set(4L, 6L, 7L))
    assert(work.count("fp_index") == 3L)
  }
}
