package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Structured-streaming upgrade of the incremental poll: file-discovery
  * micro-batches, exactly-once parquet sink, watermarked windows. */
class IncrementalStreamSpec extends SparkSpec {

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def batch(ids: Range, day: Int) = df(evSchema, ids.map(i =>
    Row(i.toLong, ts(f"2024-01-$day%02d 10:00:00"), "click", 1.0)).toSeq)

  test("pipeStream moves new files into the sink exactly once (checkpointed)") {
    val srcDir = tmpDir("graft_stream_src_")
    val dstDir = tmpDir("graft_stream_dst_")
    val ckpt = tmpDir("graft_stream_ck_")
    batch(1 to 10, 1).write.mode("append").parquet(srcDir)
    IncrementalStream.pipeStream(spark, srcDir, evSchema, dstDir, ckpt)
    assert(spark.read.parquet(dstDir).count() == 10)
    // new file arrives; re-run processes ONLY the delta (checkpoint holds)
    batch(11 to 15, 2).write.mode("append").parquet(srcDir)
    IncrementalStream.pipeStream(spark, srcDir, evSchema, dstDir, ckpt)
    val out = spark.read.parquet(dstDir)
    assert(out.count() == 15)
    assert(out.select("event_id").distinct().count() == 15) // no re-deliveries
  }

  test("sessionizeStream closes sessions on gap via custom state (flatMapGroupsWithState)") {
    val srcDir = tmpDir("graft_sess_src_")
    // user 1: two sessions separated by a >30min gap; user 2: one session
    df(evSchema, Seq(
      Row(1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      Row(2L, ts("2024-01-01 10:05:00"), "click", 1.0),
      Row(3L, ts("2024-01-01 11:00:00"), "click", 1.0),
      Row(4L, ts("2024-01-01 11:02:00"), "click", 1.0),
      Row(5L, ts("2024-01-01 10:00:00"), "view", 1.0)))
      .withColumn("user_id", org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("event_id") === 5L, 2L).otherwise(1L))
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = IncrementalStream.readStream(spark, srcDir, schema)
    val sessions = IncrementalStream.sessionizeStream(stream, gapMinutes = 30)
    IncrementalStream.runToMemory(sessions.toDF(), "sess_test")
    val out = spark.sql("SELECT * FROM sess_test ORDER BY user_id, session_start").collect()
    // only user 1's FIRST session has closed (the rest await the watermark)
    assert(out.length == 1)
    assert(out(0).getAs[Long]("user_id") == 1L)
    assert(out(0).getAs[java.sql.Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(out(0).getAs[java.sql.Timestamp]("session_end") == ts("2024-01-01 10:05:00"))
    assert(out(0).getAs[Long]("n_events") == 2L)
  }

  test("sessionWindowAgg: native session_window closes on gap, merges within it") {
    val srcDir = tmpDir("graft_sesswin_src_")
    // user 1: events at 10:00/10:05 (one session) then 11:00/11:02
    // (second session, still open at the final watermark); user 2: one
    // event at 10:00. The 11:02 event drives the watermark to 09:02
    // (2h lateness)... use a late driver event at 14:00 to close all.
    df(evSchema, Seq(
      Row(1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      Row(2L, ts("2024-01-01 10:05:00"), "click", 2.0),
      Row(3L, ts("2024-01-01 11:00:00"), "click", 4.0),
      Row(4L, ts("2024-01-01 11:02:00"), "click", 8.0),
      Row(5L, ts("2024-01-01 10:00:00"), "view", 16.0),
      Row(6L, ts("2024-01-01 14:00:00"), "tick", 0.0)))
      .withColumn("user_id", org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("event_id") === 5L, 2L)
        .otherwise(org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("event_id") === 6L, 99L).otherwise(1L)))
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = IncrementalStream.readStream(spark, srcDir, schema)
    val agg = IncrementalStream.sessionWindowAgg(stream, gap = "30 minutes",
      lateness = "1 hour")
    IncrementalStream.runToMemory(agg, "sesswin_test")
    val out = spark.sql(
        "SELECT * FROM sesswin_test ORDER BY user_id, session_start").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    // watermark = 14:00 - 1h = 13:00: every user-1/2 session has closed
    assert(out.length == 3, s"got ${out.mkString("; ")}")
    // session end = last event + gap (the session_window contract)
    assert(out(0) == (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:35:00"), 2L, 3.0))
    assert(out(1) == (1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:32:00"), 2L, 12.0))
    assert(out(2) == (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), 1L, 16.0))
  }

  test("dedupStream drops same-content docs within the watermark (8-byte state)") {
    val srcDir = tmpDir("graft_dedup_src_")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ts", TimestampType),
      StructField("text", StringType)))
    df(docSchema, Seq(
      Row(1L, ts("2024-01-01 10:00:00"), "Hello   World"),
      Row(2L, ts("2024-01-01 10:01:00"), "hello world"),      // normalized dup of 1
      Row(3L, ts("2024-01-01 10:02:00"), "something else"),
      Row(4L, ts("2024-01-01 10:03:00"), "HELLO WORLD"),      // dup again
      Row(5L, ts("2024-01-01 10:04:00"), "something else entirely")))
      .write.mode("append").parquet(srcDir)
    val stream = IncrementalStream.readStream(spark, srcDir, docSchema)
    val deduped = IncrementalStream.dedupStream(stream, "text", "ts", lateness = "1 hour")
    IncrementalStream.runToMemory(deduped, "dedup_test")
    val out = spark.sql("SELECT doc_id FROM dedup_test ORDER BY doc_id").collect().map(_.getLong(0))
    assert(out.length == 3, out.mkString(","))
    // one survivor per content class, and the fp column does not leak out
    assert(spark.table("dedup_test").columns.toSeq == Seq("doc_id", "ts", "text"))
  }

  test("nearDedupStream drops near-dups against the FULL ingested history (index-backed)") {
    val srcDir = tmpDir("graft_nd_src_")
    val ckpt = tmpDir("graft_nd_ck_")
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_nd_dst_"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    df(docSchema, Seq(
      Row(1L, s"$base original"),
      Row(2L, "novel text about mountain weather and climbing gear today")))
      .write.mode("append").parquet(srcDir)
    def run(): Unit = IncrementalStream.nearDedupStream(
      IncrementalStream.readStream(spark, srcDir, docSchema), dst, "docs",
      "docs_mh_idx", "text", "doc_id", ckpt,
      numHashes = 32, bands = 8, threshold = 0.5)
    run()
    assert(dst.read("docs").count() == 2)
    // wave 2 arrives much later than any stream-state watermark could
    // hold: the near-dup of wave-1's doc 1 must still be caught, because
    // the state is the persisted sketch index, not stream memory
    df(docSchema, Seq(
      Row(10L, s"$base original indeed"),
      Row(11L, "completely fresh text regarding deserts and camels in summer")))
      .write.mode("append").parquet(srcDir)
    run()
    val ids = dst.read("docs").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 11L), ids.toString)
    // checkpointed: a run with no new input changes nothing
    run()
    assert(dst.read("docs").count() == 3)
  }

  test("dsirScoreStream scores batches against the persisted ratio table, threshold-gated") {
    val srcDir = tmpDir("graft_dsir_src_")
    val ckpt = tmpDir("graft_dsir_ck_")
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_dsir_dst_"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // fit offline on a raw/target split; persist the bounded model table
    val raw = df(docSchema, Seq(
      Row(1L, "alpha beta gamma"), Row(2L, "delta epsilon zeta"), Row(3L, "alpha beta")))
    val target = df(docSchema, Seq(Row(100L, "alpha beta alpha")))
    dst.write(graft.operators.Dsir.importanceTable(raw, target, "text", numBuckets = 64),
      "dsir_ratios")
    // expected weights computed by the BATCH operator on the same table
    // for BOTH waves — the gate is derived from them (self-calibrating:
    // weights are gram SUMS, so hand-guessing relative order is fragile)
    val expect = graft.operators.Dsir.importanceWeights(
      df(docSchema, Seq(Row(10L, "alpha beta"), Row(11L, "delta zeta"),
        Row(20L, "alpha beta alpha"))),
      "text", "doc_id", dst.read("dsir_ratios"), numBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // target-like docs must outscore the raw-only one, then gate between
    assert(expect(10L) > expect(11L) && expect(20L) > expect(11L), expect.toString)
    val gate = expect(11L) + 1L
    def run(): Unit = IncrementalStream.dsirScoreStream(
      IncrementalStream.readStream(spark, srcDir, docSchema), dst, "scored",
      "dsir_ratios", "text", "doc_id", ckpt, numBuckets = 64,
      minWeightFixed = Some(gate))
    df(docSchema, Seq(Row(10L, "alpha beta"), Row(11L, "delta zeta")))
      .write.mode("append").parquet(srcDir)
    run()
    val out = dst.read("scored").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(10L -> expect(10L)), s"gate must keep only the target-like doc: $out")
    // wave 2 through the SAME checkpoint: only the delta is scored
    df(docSchema, Seq(Row(20L, "alpha beta alpha"))).write.mode("append").parquet(srcDir)
    run()
    val ids = dst.read("scored").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(10L, 20L), ids.toString)
    run() // no new input: nothing changes
    assert(dst.read("scored").count() == 2)
  }

  test("conformalStream flags arrivals against the persisted threshold; recalibration applies next tick") {
    val srcDir = tmpDir("graft_conf_src_")
    val ckpt = tmpDir("graft_conf_ck_")
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_conf_dst_"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    // calibrate at alpha=10% on 1..10 -> rank ceil(11*90/100)=10 -> thr 10.0
    dst.write(graft.operators.Evaluation.conformalThresholdTable(
      df(schema, (1 to 10).map(i => Row(i.toLong, i.toDouble))), "score", 10, 100),
      "conf_thr")
    def run(keep: Boolean): Unit = IncrementalStream.conformalStream(
      IncrementalStream.readStream(spark, srcDir, schema), dst, "flagged",
      "conf_thr", "score", "id", ckpt, keepConforming = keep)
    df(schema, Seq(Row(1L, 9.5), Row(2L, 10.0), Row(3L, 10.5)))
      .write.mode("append").parquet(srcDir)
    run(keep = true)
    val out = dst.read("flagged").collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false), out.toString)
    // RECALIBRATE to a tighter window (1..5 at 10% -> rank 6 > 5 -> null
    // threshold -> everything conforms) — next tick picks it up unrestarted
    dst.write(graft.operators.Evaluation.conformalThresholdTable(
      df(schema, (1 to 5).map(i => Row(i.toLong, i.toDouble))), "score", 10, 100),
      "conf_thr")
    df(schema, Seq(Row(4L, 99.0))).write.mode("append").parquet(srcDir)
    run(keep = true)
    val out2 = dst.read("flagged").collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out2(4L), "null threshold must conform everything")
    assert(out2.size == 4)
    run(keep = true) // replay: no new input, no change
    assert(dst.read("flagged").count() == 4)
  }

  test("ksDriftStream verdicts == batch ksTest; only batch-present groups upsert") {
    val srcDir = tmpDir("graft_ksd_src_")
    val ckpt = tmpDir("graft_ksd_ck_")
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_ksd_dst_"))
    val schema = StructType(Seq(
      StructField("grp", StringType), StructField("value", DoubleType)))
    // reference window: both groups uniform on {0.1 .. 5.0}
    val refRows = (1 to 50).flatMap(i => Seq(Row("g1", i / 10.0), Row("g2", i / 10.0)))
    val ref = df(schema, refRows)
    dst.write(graft.operators.Analytics.quantizedHistogram(ref, "grp", "value"),
      "ref_hist")
    // wave 1: g1 shifted +100 (drifted), g2 identical (not drifted)
    val wave1 = (1 to 50).flatMap(i => Seq(Row("g1", 100.0 + i / 10.0), Row("g2", i / 10.0)))
    df(schema, wave1).write.mode("append").parquet(srcDir)
    def run(): Unit = IncrementalStream.ksDriftStream(
      IncrementalStream.readStream(spark, srcDir, schema), dst, "verdicts",
      "ref_hist", "grp", "value", ckpt)
    run()
    def key(r: Row) = r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(5))
    // stream == batch: the tick must equal ksTest over ref ∪ batch
    val expect = graft.operators.Analytics.ksTest(
        ref.withColumn("side", lit("a"))
          .unionAll(df(schema, wave1).withColumn("side", lit("b"))),
        "grp", "side", "value", "a", "b")
      .collect().map(key).toMap
    val got1 = dst.read("verdicts").collect().map(key).toMap
    assert(got1 == expect, s"$got1 vs $expect")
    assert(got1("g1")._4 && !got1("g2")._4, got1.toString)
    // wave 2: ONLY g2 arrives, now shifted — its verdict flips via the
    // upsert; g1's wave-1 verdict is untouched (no new evidence)
    val wave2 = (1 to 50).map(i => Row("g2", 100.0 + i / 10.0))
    df(schema, wave2).write.mode("append").parquet(srcDir)
    run()
    val got2 = dst.read("verdicts").collect().map(key).toMap
    assert(got2("g1") == got1("g1"), "absent group must keep its old verdict")
    assert(got2("g2")._4, s"shifted wave must drift: ${got2("g2")}")
    assert(got2("g2")._2 == 50L, "n_b is the ARRIVING batch only")
    run() // replay with no new input: nothing changes
    assert(dst.read("verdicts").count() == 2)
  }

  test("psiDriftStream verdicts == batch psiDrift; absent groups keep their verdict") {
    val srcDir = tmpDir("graft_psi_src_")
    val ckpt = tmpDir("graft_psi_ck_")
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_psi_dst_"))
    val schema = StructType(Seq(
      StructField("grp", StringType), StructField("value", DoubleType)))
    val refRows = (1 to 100).flatMap(i => Seq(Row("g1", i / 10.0), Row("g2", i / 10.0)))
    val ref = df(schema, refRows)
    dst.write(graft.operators.Analytics.quantizedHistogram(ref, "grp", "value"),
      "ref_hist")
    // wave 1: g1 shifted wholesale past every decile, g2 identical
    val wave1 = (1 to 100).flatMap(i => Seq(Row("g1", 500.0 + i / 10.0), Row("g2", i / 10.0)))
    df(schema, wave1).write.mode("append").parquet(srcDir)
    def run(): Unit = IncrementalStream.psiDriftStream(
      IncrementalStream.readStream(spark, srcDir, schema), dst, "verdicts",
      "ref_hist", "grp", "value", ckpt)
    run()
    def key(r: Row) = r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))
    // stream tick == the batch operator over (ref window, wave) — the
    // shared psiFromCounts core makes this bit-exact
    val expectMap = {
      def side(g: String, rows: Seq[Row]) = df(schema, rows.filter(_.getString(0) == g))
      Seq("g1", "g2").map { g =>
        g -> graft.operators.Analytics.psiDrift(
            side(g, refRows), side(g, wave1), Seq("value"))
          .collect().head
      }.toMap
    }
    val got1 = dst.read("verdicts").collect().map(key).toMap
    Seq("g1", "g2").foreach { g =>
      val e = expectMap(g)
      assert(got1(g) == ((e.getLong(1), e.getLong(2), e.getLong(3), e.getBoolean(5))),
        s"$g: ${got1(g)} vs $e")
    }
    assert(got1("g1")._4 && !got1("g2")._4, got1.toString)
    assert(got1("g2")._3 == 0L, "identical distribution must score PSI exactly 0")
    // wave 2: only g2 arrives, shifted — its verdict flips; g1 untouched
    val wave2 = (1 to 100).map(i => Row("g2", 500.0 + i / 10.0))
    df(schema, wave2).write.mode("append").parquet(srcDir)
    run()
    val got2 = dst.read("verdicts").collect().map(key).toMap
    assert(got2("g1") == got1("g1"), "absent group must keep its old verdict")
    assert(got2("g2")._4, s"shifted wave must drift: ${got2("g2")}")
  }

  test("knScoreStream scores batches against the persisted model; NLL gate drops unscored docs") {
    val srcDir = tmpDir("graft_kn_src_")
    val ckpt = tmpDir("graft_kn_ck_")
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_kn_dst_"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // train offline on the reference slice; persist the model
    val ref = df(docSchema, Seq(Row(1L, "a b c a b d a b c")))
    graft.operators.LanguageModel.saveKn(
      graft.operators.LanguageModel.trainKn(ref, "text", vocabSize = 100), dst, "km")
    // expected scores from the BATCH scorer on the loaded model
    val loaded = graft.operators.LanguageModel.loadKn(dst, "km")
    val expect = graft.operators.LanguageModel.scoreKnNll(
      df(docSchema, Seq(Row(10L, "a b c"), Row(11L, "x y z w"), Row(20L, "a b d"))),
      "text", "doc_id", loaded)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // in-domain docs must beat the all-UNK one; gate between them
    assert(expect(10L) < expect(11L) && expect(20L) < expect(11L), expect.toString)
    val gate = (expect(10L) max expect(20L)) + 0.0001
    def run(): Unit = IncrementalStream.knScoreStream(
      IncrementalStream.readStream(spark, srcDir, docSchema), dst, "scored",
      "km", "text", "doc_id", ckpt, maxAvgNll = Some(gate))
    // wave 1: one in-domain, one all-UNK (gated), one too short (null
    // score — no evidence, no pass)
    df(docSchema, Seq(Row(10L, "a b c"), Row(11L, "x y z w"), Row(12L, "a b")))
      .write.mode("append").parquet(srcDir)
    run()
    val out = dst.read("scored").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(10L -> expect(10L)), s"gate must keep only the in-domain doc: $out")
    // wave 2 through the SAME checkpoint: only the delta is scored
    df(docSchema, Seq(Row(20L, "a b d"))).write.mode("append").parquet(srcDir)
    run()
    assert(dst.read("scored").select("doc_id").collect().map(_.getLong(0)).toSet == Set(10L, 20L))
    run() // no new input: nothing changes
    assert(dst.read("scored").count() == 2)
  }

  test("embeddingDedupStream drops vector near-dups against the FULL history (index-backed)") {
    val srcDir = tmpDir("graft_emb_src_")
    val ckpt = tmpDir("graft_emb_ck_")
    val dst = new graft.sources.ParquetConnector(spark, tmpDir("graft_emb_dst_"))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("v", ArrayType(FloatType))))
    val rnd = new scala.util.Random(41)
    def vec(): Seq[Float] = Seq.fill(16)(rnd.nextFloat() * 2 - 1)
    val v1 = vec(); val v2 = vec()
    df(embSchema, Seq(Row(1L, v1), Row(2L, v2))).write.mode("append").parquet(srcDir)
    def run(): Unit = IncrementalStream.embeddingDedupStream(
      IncrementalStream.readStream(spark, srcDir, embSchema), dst, "vectors",
      "vec_idx", "v", "vec_id", ckpt, dim = 16, planes = 8, threshold = 0.999)
    run()
    assert(dst.read("vectors").count() == 2)
    // wave 2: a scaled copy of wave-1's v1 must be caught via the
    // persisted bucket index (no stream state could span the gap)
    df(embSchema, Seq(
      Row(10L, v1.map(x => x * 1.001f)),
      Row(11L, vec())))
      .write.mode("append").parquet(srcDir)
    run()
    val ids = dst.read("vectors").select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 11L), ids.toString)
    // checkpointed: a run with no new input changes nothing
    run()
    assert(dst.read("vectors").count() == 3)
  }

  test("intervalJoinStream attributes conversions inside the horizon, both streams unbounded") {
    val impDir = tmpDir("graft_ssj_imp_")
    val convDir = tmpDir("graft_ssj_conv_")
    val impSchema = StructType(Seq(
      StructField("imp_id", LongType), StructField("imp_user", LongType),
      StructField("imp_ts", TimestampType)))
    val convSchema = StructType(Seq(
      StructField("conv_id", LongType), StructField("conv_user", LongType),
      StructField("conv_ts", TimestampType), StructField("amount", DoubleType)))
    df(impSchema, Seq(
      Row(1L, 100L, ts("2024-01-01 10:00:00")),
      Row(2L, 200L, ts("2024-01-01 10:00:00")),
      Row(3L, 100L, ts("2024-01-01 12:00:00")))).write.mode("append").parquet(impDir)
    df(convSchema, Seq(
      Row(10L, 100L, ts("2024-01-01 10:10:00"), 5.0),  // inside horizon of imp 1
      Row(11L, 200L, ts("2024-01-01 11:00:00"), 7.0),  // 60 min after imp 2 — outside
      Row(12L, 100L, ts("2024-01-01 12:20:00"), 9.0))) // inside horizon of imp 3 only
      .write.mode("append").parquet(convDir)
    val joined = IncrementalStream.intervalJoinStream(
      IncrementalStream.readStream(spark, impDir, impSchema),
      IncrementalStream.readStream(spark, convDir, convSchema),
      "imp_user", "conv_user", "imp_ts", "conv_ts",
      horizon = "30 minutes", lateness = "1 hour")
    IncrementalStream.runToMemory(joined, "ssj_test")
    val out = spark.sql("SELECT imp_id, conv_id, amount FROM ssj_test ORDER BY imp_id, conv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 10L, 5.0), (3L, 12L, 9.0)), out.mkString(","))
  }

  test("windowedEventAgg aggregates per tumbling window with watermark") {
    val srcDir = tmpDir("graft_streamw_src_")
    df(evSchema, Seq(
      Row(1L, ts("2024-01-01 10:05:00"), "click", 1.0),
      Row(2L, ts("2024-01-01 10:20:00"), "click", 2.0),
      Row(3L, ts("2024-01-01 11:05:00"), "view", 5.0)))
      .write.mode("append").parquet(srcDir)
    val stream = IncrementalStream.readStream(spark, srcDir, evSchema)
    val agg = IncrementalStream.windowedEventAgg(stream, "ts", "1 hour", "2 hours")
    IncrementalStream.runToMemory(agg, "win_test", outputMode = "complete")
    val out = spark.sql(
      "SELECT window.start AS s, event_type, n_events, sum_value FROM win_test ORDER BY s, event_type")
      .collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1 && out(1).getAs[Double]("sum_value") == 5.0)
  }

  test("upsertStream merges micro-batches by pk into a connector (keyed streaming sink)") {
    val srcDir = tmpDir("graft_ups_src_")
    val dstDir = tmpDir("graft_ups_dst_")
    val ckpt = tmpDir("graft_ups_ck_")
    val dst = new graft.sources.ParquetConnector(spark, dstDir)
    batch(1 to 10, 1).write.mode("append").parquet(srcDir)
    def run(): Unit = IncrementalStream.upsertStream(
      IncrementalStream.readStream(spark, srcDir, evSchema), dst, "events", "event_id", ckpt)
    run()
    assert(dst.read("events").count() == 10)
    // second wave UPDATES keys 6-10 (value 9.0) and inserts 11-12
    df(evSchema, ((6 to 10).map(i => Row(i.toLong, ts("2024-01-02 10:00:00"), "click", 9.0)) ++
        (11 to 12).map(i => Row(i.toLong, ts("2024-01-02 10:00:00"), "click", 1.0))).toSeq)
      .write.mode("append").parquet(srcDir)
    run()
    val out = dst.read("events")
    assert(out.count() == 12) // merged, not appended
    assert(out.filter(col("value") === 9.0).count() == 5)
    // checkpoint holds: a run with no new input changes nothing
    run()
    assert(dst.read("events").count() == 12)
  }

  test("rollupStream advances the aggregate table per batch; replay is a no-op") {
    val srcDir = tmpDir("graft_rs_src_")
    val dstDir = tmpDir("graft_rs_dst_")
    val ckpt = tmpDir("graft_rs_ck_")
    val dst = new graft.sources.ParquetConnector(spark, dstDir)
    val aggs = Seq(("count", "*", "n"), ("sum", "value", "sv"))
    def run(): Unit = IncrementalStream.rollupStream(
      IncrementalStream.readStream(spark, srcDir, evSchema), dst, "rollup",
      Seq("event_type"), aggs, matcher = "ts", checkpoint = ckpt)
    df(evSchema, Seq(
      Row(1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      Row(2L, ts("2024-01-01 10:01:00"), "click", 2.0),
      Row(3L, ts("2024-01-01 10:02:00"), "view", 5.0)))
      .write.mode("append").parquet(srcDir)
    run()
    df(evSchema, Seq(Row(4L, ts("2024-01-02 10:00:00"), "click", 10.0)))
      .write.mode("append").parquet(srcDir)
    run()
    val got = dst.read("rollup").orderBy("event_type").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sv")))
    assert(got.toSeq == Seq(("click", 3L, 13.0), ("view", 1L, 5.0)))
    // replay safety: wipe the CHECKPOINT so the whole source replays; the
    // table watermark must make every replayed row a no-op
    graft.sources.FileTableOps.deleteRecursively(java.nio.file.Paths.get(ckpt))
    run()
    val again = dst.read("rollup").orderBy("event_type").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sv")))
    assert(again.toSeq == got.toSeq, "replayed batches double-counted")
  }

  test("scdStream: micro-batches version the dimension; replay is a no-op") {
    val srcDir = tmpDir("graft_scd_src_")
    val dstDir = tmpDir("graft_scd_dst_")
    val ckpt = tmpDir("graft_scd_ck_")
    val dst = new graft.sources.ParquetConnector(spark, dstDir)
    def run(): Unit = IncrementalStream.scdStream(
      IncrementalStream.readStream(spark, srcDir, evSchema), dst, "dim",
      primaryKey = "event_id", matcher = "ts", checkpoint = ckpt)
    df(evSchema, Seq(
      Row(1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      Row(2L, ts("2024-01-01 11:00:00"), "view", 2.0)))
      .write.mode("append").parquet(srcDir)
    run()
    // second wave: a new version of key 1, and a new key 3
    df(evSchema, Seq(
      Row(1L, ts("2024-01-02 10:00:00"), "click", 9.0),
      Row(3L, ts("2024-01-02 11:00:00"), "view", 3.0)))
      .write.mode("append").parquet(srcDir)
    run()
    def snapshot() = dst.read("dim").orderBy("event_id", "ts").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")).map(_.toString).orNull))
    val got = snapshot()
    assert(got.toSeq == Seq(
      (1L, 1.0, "2024-01-02 10:00:00.0"), (1L, 9.0, null),
      (2L, 2.0, null), (3L, 3.0, null)))
    // wipe the checkpoint → full replay; watermark makes it a no-op
    graft.sources.FileTableOps.deleteRecursively(java.nio.file.Paths.get(ckpt))
    run()
    assert(snapshot().toSeq == got.toSeq, "replayed batches created duplicate versions")
  }

  test("ewmaStream equals the batch EWMA recursion across micro-batches") {
    val seqSchema = StructType(Seq(
      StructField("uid", LongType), StructField("ord", LongType),
      StructField("v", DoubleType)))
    val fileA = Seq(Row(1L, 1L, 10.0), Row(1L, 2L, 20.0), Row(2L, 1L, 5.0))
    val fileB = Seq(Row(1L, 3L, 30.0), Row(2L, 2L, 7.0))
    val srcDir = tmpDir("graft_ewma_src_")
    df(seqSchema, fileA).coalesce(1).write.mode("append").parquet(srcDir)
    Thread.sleep(1500)
    df(seqSchema, fileB).coalesce(1).write.mode("append").parquet(srcDir)
    val stream = IncrementalStream.readStream(spark, srcDir, seqSchema,
      maxFilesPerTrigger = 1)
    val smoothed = IncrementalStream.ewmaStream(stream, "uid", "ord", "v", alpha = 0.25)
    IncrementalStream.runToMemory(smoothed.toDF(), "ewma_test")
    val got = spark.sql("SELECT * FROM ewma_test")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val batch = graft.operators.TimeSeries.ewma(
      df(seqSchema, fileA ++ fileB), "uid", "ord", "v", alpha = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got == batch, s"stream $got\nbatch $batch")
    // bit-equality on the cross-batch point (state carried, not re-inited)
    assert(got((1L, 3L)) == 0.25 * 30.0 + 0.75 * (0.25 * 20.0 + 0.75 * 10.0))
  }

  test("driftAlarmStream equals the batch CUSUM fold across micro-batches") {
    val seqSchema = StructType(Seq(
      StructField("uid", LongType), StructField("ord", LongType),
      StructField("v", DoubleType)))
    // uid 1 drifts (15 vs target 10 → +5e6/step, alarms past h=12);
    // uid 2 stays on target (s pinned at 0)
    val fileA = Seq(Row(1L, 1L, 10.0), Row(1L, 2L, 15.0), Row(1L, 3L, 15.0),
      Row(2L, 1L, 10.0))
    val fileB = Seq(Row(1L, 4L, 15.0), Row(1L, 5L, 2.0), Row(2L, 2L, 10.0))
    val srcDir = tmpDir("graft_drift_src_")
    df(seqSchema, fileA).coalesce(1).write.mode("append").parquet(srcDir)
    Thread.sleep(1500) // distinct mtimes → deterministic file order
    df(seqSchema, fileB).coalesce(1).write.mode("append").parquet(srcDir)
    val stream = IncrementalStream.readStream(spark, srcDir, seqSchema,
      maxFilesPerTrigger = 1) // forces one micro-batch PER FILE
    val scored = IncrementalStream.driftAlarmStream(stream, "uid", "ord", "v",
      target = 10.0, slack = 0.0, threshold = 12.0)
    IncrementalStream.runToMemory(scored.toDF(), "drift_test")
    val got = spark.sql("SELECT * FROM drift_test ORDER BY key, order_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    // the batch fold over the SAME full series is the ground truth
    val batch = graft.operators.TimeSeries.cusum(
      df(seqSchema, fileA ++ fileB), "uid", "ord", "v", 10.0, 0.0, 12.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getInt(4) == 1)).toMap
    assert(got == batch, s"stream $got\nbatch $batch")
    // and the drift actually alarmed (guards against vacuous parity)
    assert(got((1L, 4L))._2 && !got((1L, 5L))._2)
  }
}
