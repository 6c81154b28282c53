package graft.pipelines

import graft.SparkSpec
import graft.plans.{Plan, PlanConfig}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The index/release MAINTENANCE tick (VERDICT r18 #1) end-to-end:
  * (1) after N append ticks, one maintenance tick leaves every query
  * result identical (probe-equivalence) while the per-tick file
  * fragments compact away and later ingest ticks keep working; (2) the
  * mh rebuild RE-CAPS degenerate buckets — a doc stranded with zero
  * index rows because its every band bucket was hot at arrival becomes
  * probeable again once its hot bucket-mates are taken down. */
class MaintenanceJourneySpec extends SparkSpec {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def record(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => h.append(k).append(": ").append(v).append("\r\n") }
    h.append("Content-Length: ").append(body.length).append("\r\n\r\n")
    h.toString.getBytes(Ascii) ++ body ++ "\r\n\r\n".getBytes(Ascii)
  }

  private val head = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"

  private def response(uri: String, text: String): Array[Byte] =
    record(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri),
      (head + s"<html><body><p>$text</p></body></html>").getBytes(Ascii))

  private def warcFile(records: Seq[Array[Byte]]): Array[Byte] =
    (record(Seq("WARC-Type" -> "warcinfo"),
      "software: graft\r\n".getBytes(Ascii)) +: records).reduce(_ ++ _)

  private val pages = Seq(
    "the cat sat on the mat and watched the fire burn low in the evening",
    "a long road runs from the village to the sea and the walk takes one day",
    "bread rises in the warm oven while the baker reads the morning paper",
    "the old clock in the hall strikes twelve and the house falls silent again",
    "rain fell on the tin roof all night and the river rose by the morning",
    "the ship left the harbour before dawn with a cargo of salt and rope",
    "children played in the yard until the bell called them back to class",
    "the library keeps a map of the city drawn two hundred years ago")

  private def uri(i: Int) = s"http://example.org/p/$i"

  private def dataFiles(dir: String, table: String): Int = {
    val p = java.nio.file.Paths.get(dir, table + ".parquet")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    java.nio.file.Files.walk(p).forEach { f =>
      val n = f.getFileName.toString
      if (java.nio.file.Files.isRegularFile(f) && n.endsWith(".parquet") &&
          !n.startsWith(".") && !n.startsWith("_")) out += n
    }
    out.size
  }

  test("N append ticks then one maintenance tick: probe-equivalence, fewer files, " +
    "ingest continues (VERDICT r18 #1)") {
    val dirs = (0 to 3).map(i => tmpDir(s"graft_maint_gen${i}_"))
    // gen 0: pages 0-3; gen 1: page 1 changed to page 4, page 5 added;
    // gen 2: page 6 added; gen 3 (post-maintenance): page 7 added
    java.nio.file.Files.write(java.nio.file.Paths.get(s"${dirs(0)}/a.warc"),
      warcFile((0 until 4).map(i => response(uri(i), pages(i)))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"${dirs(1)}/a.warc"),
      warcFile((0 until 4).map(i => response(uri(i), if (i == 1) pages(4) else pages(i)))
        :+ response(uri(5), pages(5))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"${dirs(2)}/a.warc"),
      warcFile((0 until 4).map(i => response(uri(i), if (i == 1) pages(4) else pages(i)))
        ++ Seq(response(uri(5), pages(5)), response(uri(6), pages(6)))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"${dirs(3)}/a.warc"),
      warcFile((0 until 4).map(i => response(uri(i), if (i == 1) pages(4) else pages(i)))
        ++ Seq(response(uri(5), pages(5)), response(uri(6), pages(6)),
          response(uri(7), pages(7)))))

    val workDir = tmpDir("graft_maint_work_")
    def tick(dir: String): Unit = {
      val plan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_maint_pid_")))
      TrainingDataPipeline.crawlTick(plan, dir, workDir,
        minQuality = 0.0, langs = Seq("en"), minhashThreshold = 0.5)
      plan.run()
    }
    val work = new graft.sources.ParquetConnector(spark, workDir)
    (0 to 2).foreach(i => tick(dirs(i)))
    assert(work.count("release_current") == 7L) // 4 + changed-kept + 2 added

    // pre-maintenance snapshots (sorted, generation-stamp excluded for
    // the mh index — the rebuild re-stamps at the release generation)
    def relRows = work.read("release_current")
      .select("doc_id", "url", "text").collect().map(_.toString).sorted.toSeq
    def fpRows = work.read("fp_index").select("fp").collect()
      .map(_.getLong(0)).sorted.toSeq
    def mhRows = work.read("mh_index").select("_id", "_band", "_bucket")
      .collect().map(_.toString).sorted.toSeq
    val (rel0, fp0, mh0) = (relRows, fpRows, mhRows)
    val filesBefore = Seq("release_current", "fp_index", "mh_index")
      .map(t => dataFiles(workDir, t))

    val mplan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_maint_pid_")))
    TrainingDataPipeline.maintenanceTick(mplan, workDir)
    mplan.run()

    // probe-equivalence: not one row changed anywhere (no bucket
    // crossed the cap in this fixture, so the rebuild is row-identical)
    assert(relRows == rel0 && fpRows == fp0 && mhRows == mh0)
    val filesAfter = Seq("release_current", "fp_index", "mh_index")
      .map(t => dataFiles(workDir, t))
    assert(filesAfter.zip(filesBefore).forall { case (a, b) => a <= b } &&
      filesAfter.sum < filesBefore.sum,
      s"compaction must reduce fragments: $filesBefore -> $filesAfter")
    // the rebuild leaves an empty suspect window at the release gen
    val st = work.read("tick_state").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st("wm_mh") == st("release"), st.toString)

    // the lifecycle continues over the compacted layout: a steady tick
    // is a no-op, an ingest tick absorbs its delta normally
    tick(dirs(2))
    assert(work.count("release_current") == 7L)
    tick(dirs(3))
    assert(work.count("release_current") == 8L)
    assert(work.read("mh_index").select("_id").distinct().count() == 8L)
    assert(fpRows.size == 8)
  }

  test("mh rebuild re-caps: a doc stranded by hot buckets becomes probeable after " +
    "its bucket-mates are taken down") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // A, B, C share an identical word-trigram SHINGLE SET (one base
    // sentence cyclically repeated 3/4/5 times — same cyclic trigrams,
    // different texts, so exact-dedup's one-doc-per-fingerprint
    // invariant holds) => identical minhash signatures => the same
    // bucket in EVERY band; with maxBucketSize = 2 the build drops all
    // three everywhere: A has ZERO index rows (the degenerate tail the
    // crawlTick scaladoc documents). D and E are ordinary fillers.
    val base = "maple alpha beta gamma delta"
    def rep(k: Int) = Seq.fill(k)(base).mkString(" ")
    val docs = df(schema, Seq(
      Row(1L, rep(3)), Row(2L, rep(4)), Row(3L, rep(5)),
      Row(4L, "a quiet harbour town wakes early when the boats return"),
      Row(5L, "the observatory charts faint stars through the winter sky")))
    val workDir = tmpDir("graft_recap_work_")
    val work = new graft.sources.ParquetConnector(spark, workDir)
    work.write(docs, "release_current")
    work.write(graft.operators.Dedup.fingerprintIndex(docs, "text"), "fp_index")
    work.write(graft.operators.Dedup.minhashIndex(docs, "text", "doc_id",
      maxBucketSize = 2), "mh_index")
    assert(work.read("mh_index").filter(col("_id") <= 3L).count() == 0L,
      "the trio must be capped out of every band bucket")

    // a twin of A is INVISIBLE to the probe — this is the silent
    // near-dup recall gap the rebuild exists to close
    val twin = df(schema, Seq(Row(99L, rep(3))))
    def probe = graft.operators.Dedup.minhashAgainstIndex(
      twin, "text", "doc_id", work.read("mh_index"), threshold = 0.7)
    assert(probe.count() == 0L)

    // B and C are taken down (say, a DMCA notice) — A remains released
    // but STILL unprobeable under the old index
    val tplan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_recap_pid_")))
    TrainingDataPipeline.takedownTick(tplan, workDir,
      df(StructType(Seq(StructField("doc_id", LongType))), Seq(Row(2L), Row(3L))))
    tplan.run()
    assert(work.count("release_current") == 3L)
    assert(probe.count() == 0L, "takedown alone cannot resurrect capped docs")

    // maintenance rebuild (same params) re-caps against today's corpus:
    // A's buckets now hold one member, so A is indexed and the twin hits
    val mplan = new Plan(spark, PlanConfig(pidDir = tmpDir("graft_recap_pid_")))
    TrainingDataPipeline.maintenanceTick(mplan, workDir, maxBucketSize = 2)
    mplan.run()
    assert(work.read("mh_index").filter(col("_id") === 1L).count() > 0L)
    val hits = probe.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.contains((99L, 1L)), hits.mkString(";"))
  }
}
