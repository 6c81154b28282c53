package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× corpus expansion + the stress bench over it
  * (VERDICT r13 #1): every 100×-safety claim in SURVEY.md is argued
  * from plan shape but was measured only at sf0.1 — these two mains
  * manufacture the next decade of data and measure the heavy queries
  * on it, committing `BENCH_scale.json` as the evidence.
  *
  * [[ScaleData]] expands sf0.1 by an integer `factor` with arithmetic-
  * only derivations (no RNG, no clock — byte-reproducible):
  *
  *  - `documents`: replica k shifts doc_id by k·10⁶ and suffixes every
  *    token with the replica index (replica 0 IS the original corpus).
  *    Token counts and length profiles survive; replica vocabularies
  *    are disjoint, so planted dup/near-dup families stay WITHIN a
  *    replica and the pair-generation workload scales linearly — ×k
  *    literal copies would instead scale candidate pairs
  *    quadratically and measure a corpus no curator ever sees.
  *  - `embeddings`: replica k rotates each vector left by k dims
  *    (norms and within-replica distances exact; planted near-dup
  *    pairs rotate together and survive).
  *  - `orders`/`lineitem`: replica k shifts orderkeys by k·10⁷ and
  *    cust/supp keys by k·10⁵ — the purchase graph becomes k disjoint
  *    copies, so graph queries scale in |V| and |E| without
  *    manufacturing artificial skew.
  *  - `events`: replica k shifts event_id by k·10⁸ and user_id by
  *    k·10⁶ — per-user pair workloads scale linearly while event_type
  *    cardinality and the time range stay fixed (the scaled copy is
  *    MICROS-typed; readTable's footer-keyed detection reads both, and
  *    the NANOS ingestion path keeps its coverage on the unscaled
  *    dirs).
  *  - dimension tables: byte-copied (they don't scale with corpus
  *    size).
  *
  * [[ScaleBench]] then runs the heavy query set at BOTH scales in one
  * JVM (same box, same session — the cleanest possible ratio), with
  * the Bench telemetry (steal/sys/load/spread), and extends the
  * PlanReport exchange audit to the 10× plans: the scale claim is
  * "same plan, ~linear time", and both halves are recorded per query.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1 && factor <= 100, s"factor must be in [1, 100], got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-data")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    val reps = spark.range(factor).select(col("id").cast("int").as("_k"))

    def t(name: String): DataFrame =
      graft.sources.ParquetConnector.readTable(spark, s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
    // loud key-range guard (ADVICE r14): the replica id shifts assume
    // source keys below the shift — pointed at a larger corpus, replica
    // keys would silently collide and alias the scaled tables. One
    // cheap max() agg per shifted key, failing loudly instead.
    def assertBelow(df: DataFrame, keyCol: String, shift: Long, table: String): Unit = {
      val r = df.agg(max(col(keyCol)).cast("long")).head()
      val mx = if (r.isNullAt(0)) -1L else r.getLong(0)
      require(mx < shift,
        s"ScaleData: max($table.$keyCol) = $mx >= replica shift $shift — " +
          "replica keys would collide; raise the shift for this corpus")
    }

    // documents: replica-suffixed tokens, replica-shifted ids
    val d = t("documents").crossJoin(broadcast(reps))
    assertBelow(t("documents"), "doc_id", 1000000L, "documents")
    val text = when(col("_k") === 0, col("text")).otherwise(
      regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1x"), col("_k").cast("string"))))
    write(d.select(
      (col("doc_id") + col("_k").cast("long") * 1000000L).as("doc_id"),
      text.as("text"), col("lang"), col("source"),
      when(col("_k") === 0, col("n_chars"))
        .otherwise(length(text).cast("long")).as("n_chars")), "documents")

    // embeddings: replica-rotated vectors, replica-shifted ids. The
    // rotation index is _k mod dim (ADVICE r14): slice with a raw _k
    // beyond the vector dimension gets a negative length and fails at
    // runtime for factor in (dim+1, 100] — rotating by the modulus is
    // the same family of distance-preserving permutations.
    val e = t("embeddings").crossJoin(broadcast(reps))
    assertBelow(t("embeddings"), "vec_id", 1000000L, "embeddings")
    val dim = size(col("embedding"))
    val rot = pmod(col("_k"), dim)
    write(e.select(
      (col("vec_id") + col("_k").cast("long") * 1000000L).as("vec_id"),
      concat(slice(col("embedding"), rot + 1, dim - rot),
        slice(col("embedding"), lit(1), rot)).as("embedding"),
      col("label")), "embeddings")

    // purchase graph: k disjoint copies
    val o = t("orders").crossJoin(broadcast(reps))
    assertBelow(t("orders"), "o_orderkey", 10000000L, "orders")
    assertBelow(t("orders"), "o_custkey", 100000L, "orders")
    write(o.select(
      (col("o_orderkey") + col("_k").cast("long") * 10000000L).as("o_orderkey"),
      (col("o_custkey") + col("_k").cast("long") * 100000L).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")
    val l = t("lineitem").crossJoin(broadcast(reps))
    assertBelow(t("lineitem"), "l_orderkey", 10000000L, "lineitem")
    assertBelow(t("lineitem"), "l_suppkey", 100000L, "lineitem")
    write(l.select(Seq(
      (col("l_orderkey") + col("_k").cast("long") * 10000000L).as("l_orderkey"),
      col("l_partkey"),
      (col("l_suppkey") + col("_k").cast("long") * 100000L).as("l_suppkey")) ++
      Seq("l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate").map(col): _*),
      "lineitem")

    // events: k disjoint replicas — ids/users shift so per-user pair
    // workloads (wilcoxon/permutation pairing) scale linearly, while
    // event_type and the time range stay fixed (group cardinality and
    // daily-bucket NDV constant — exactly the contract the NDV-bounded
    // stats claim). The scaled copy is written through Spark, so its
    // physical type is MICROS, not the source's NANOS — readTable's
    // footer-keyed detection reads both; the NANOS ingestion path keeps
    // its own coverage on the unscaled dirs.
    val ev = t("events").crossJoin(broadcast(reps))
    assertBelow(t("events"), "event_id", 100000000L, "events")
    assertBelow(t("events"), "user_id", 1000000L, "events")
    write(ev.select(
      (col("event_id") + col("_k").cast("long") * 100000000L).as("event_id"),
      col("ts"),
      (col("user_id") + col("_k").cast("long") * 1000000L).as("user_id"),
      col("event_type"), col("value"), col("props")), "events")

    // dimension tables: byte-copied, physical types untouched
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$n.parquet"),
        java.nio.file.Paths.get(s"$dst/$n.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    println(s"[scale] wrote x$factor corpus to $dst")
    spark.stop()
  }
}

/** Runs the heavy query set at the base SF and at the scaled dir in one
  * JVM, with the plan-exchange audit at both scales. Artifact:
  * `BENCH_scale.json`. */
object ScaleBench {
  /** The heavy query set: dedup families, graph iterations, ANN
    * lifecycle, LM gates, the cluster-aware split, the full funnel
    * (the VERDICT r13 #1 list), plus — r15 (VERDICT r14 #2) — every
    * remaining operator with a block cap or bounded contract that had
    * never been measured at a scale point: span-scrub, SemDeDup,
    * fuzzy join, BM25 inverted retrieval, BPE round-trip. */
  val heavy: Seq[String] = Seq(
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
    "q_embedding_neardup", "q_ppl_mix", "q_pagerank", "q_label_prop",
    "q_ann_pq", "q_dsir", "q_kn_trigram", "q_cluster_split",
    "q_cluster_split_default", "q_cluster_split_exact",
    "q_pipeline_funnel",
    "q_span_scrub", "q_semdedup", "q_fuzzy_join", "q_inverted_bm25",
    "q_bpe_roundtrip",
    // r15 second wave, quadratic-risk candidates under measurement:
    // kendall's NDV²-bounded joint self-join, the 199-replicate
    // permutation explode, the PSI melt + NDV-bounded bin algebra, and
    // the d²-moment PCA pass
    "q_kendall_tau", "q_permutation", "q_psi", "q_pca_power",
    // r16 third wave (VERDICT r15 #3): the remaining heavy headliners —
    // the 36-moment DECIMAL correlation pass, the LSH-pair threshold
    // sweep, the per-doc bounded-window Min-K% audit, and the streaming
    // WARC→clean-text ingestion composition — plus the new CDC chunk
    // family (per-doc window + digest-ownership rollup)
    "q_corr", "q_threshold_sweep", "q_minkprob", "q_warc_text",
    "q_content_chunks", "q_chunk_share",
    // r16 fourth wave: the digest-bucket containment pairing (the
    // quadratic-risk candidate of the CDC family) and the capped-prefix
    // char-entropy scan
    "q_chunk_containment", "q_char_entropy",
    // r17 wave: the incremental-probe and resolution legs of the CDC
    // family (index semi-joins + capped pairing — must scale like the
    // batch pairing), and the crawl tick's diff→delta→index-probe
    // composition (CDX reductions + one fingerprint anti-join)
    "q_chunk_incr", "q_containment_dedup", "q_crawl_tick",
    // r18 wave: the takedown tick (scan→broadcast-anti→rewrite of the
    // release and all three indexes — must stay IO-linear) and the
    // canonical-keyed alias diff (codegen'd canonicalization + the CDX
    // reductions)
    "q_takedown", "q_crawl_alias",
    // r19 wave: the revocation sweep (release scan + host-bounded rules
    // join + broadcast-anti retirements — the r18 verdict's missing
    // stress point), the domain-notice takedown (canonicalize scan +
    // suffix-explode equi-join), and the maintenance tick (full mh
    // rebuild + compaction — O(corpus) by design, must stay IO-linear)
    "q_revocation_tick", "q_takedown_domain", "q_maintenance_tick")

  /** Scale-bench-local variants, NOT part of the driver correctness
    * contract. r15 FLIPPED the cluster-split default (VERDICT r14 #1)
    * and the stress bench measures all THREE pairing forms side by
    * side:
    *
    *  - `q_cluster_split` (driver contract, fully oracled): the
    *    REPLAYABLE md5-MinHash form — linear (10× ratio 8.6 ≈ exponent
    *    0.93, the clean signature of a compute-bound scan; md5 is the
    *    price of bit-replayability);
    *  - `q_cluster_split_default`: `leakageSafeSplit`'s DEFAULT
    *    xxhash64-sketch generator (fused native signatures) — the
    *    throughput path, overhead-dominated at bench scale (r14
    *    measured ratio ~1.7 for this formulation);
    *  - `q_cluster_split_exact`: the OLD blocked all-pairs
    *    exact-Jaccard path, the named opt-in small-corpus verifier —
    *    measured exponent 1.99 (r14: 1.8 s → 41.5 s at 10×), the
    *    documented reason it is no longer any default. Timing-only
    *    here; its machinery stays hash-checked through
    *    `q_dedup_clusters`/`q_ngram_jaccard`. */
  private val extra: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_split_default" -> ((s: SparkSession, dir: String) => {
      val d = graft.sources.ParquetConnector.readTable(s, s"$dir/documents.parquet")
      graft.operators.Curation.leakageSafeSplit(d, "text", "doc_id",
          n = 3, threshold = 0.6)
        .orderBy(col("doc_id"))
    }),
    "q_cluster_split_exact" -> ((s: SparkSession, dir: String) => {
      val d = graft.sources.ParquetConnector.readTable(s, s"$dir/documents.parquet")
      val pairs = graft.operators.Dedup.ngramJaccardPairs(d, "text", "doc_id",
        graft.operators.Dedup.langLengthBlock(col("lang"), col("n_chars"), width = 100),
        n = 1, threshold = 0.6)
      val cc = graft.operators.Dedup.connectedComponents(pairs)
      graft.operators.Curation.clusterAwareSplit(d, "doc_id", cc)
        .orderBy(col("doc_id"))
    }))

  // q_pipeline_funnel RUNS its multi-step plan while the frame is
  // constructed, so a plan audit of the returned metrics frame would
  // (a) cost a full extra funnel run and (b) audit only the final
  // count projection — its per-stage plans are audited by the
  // pipeline's own PlanEvidence specs instead.
  private val noAudit = Set("q_pipeline_funnel")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaled = if (args.length > 0) args(0) else "/tmp/graft_scale10"
    val factor = if (args.length > 1) args(1).toInt else 10
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = (n: String) => only.forall(_.contains(n))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (preLoad, contaminated) = Bench.waitForIdle(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0").toDouble, 5, 60)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () } // JIT warm-up
    val stat0 = Bench.procStatTicks()

    def fn(name: String) = extra.getOrElse(name, SparkEntry.queries(name))
    def exchanges(name: String, dir: String): Int =
      try graft.plans.PlanReport.of(fn(name)(spark, dir)).exchanges
      catch { case e: Throwable =>
        Bench.diag(s"[scale] plan audit $name@$dir failed: ${e.getMessage}"); -1 }
    def timeReps(name: String, dir: String): Seq[Double] = (1 to reps).map { _ =>
      try {
        val t0 = System.nanoTime()
        fn(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        Bench.diag(s"[scale] $name@$dir failed: ${e.getMessage}"); -1.0 }
    }

    val rows = heavy.filter(selected).map { name =>
      val (exB, exS) =
        if (noAudit(name)) (-1, -1)
        else (exchanges(name, base), exchanges(name, scaled))
      // scaled reps FIRST: any residual first-execution codegen/JIT cost
      // lands on the scaled side, so the reported ratio is conservative
      // for the linear-scaling claim (the audit constructions above
      // already warmed both dirs once for the checkpointing queries)
      val tS = timeReps(name, scaled)
      val tB = timeReps(name, base)
      val (mB, mS) = (Bench.median(tB), Bench.median(tS))
      val ratio = if (mB > 0 && mS > 0) math.round(mS / mB * 100.0) / 100.0 else -1.0
      Bench.diag(f"[scale] $name base=$mB%.2f scaled=$mS%.2f ratio=$ratio%.2f ex=$exB/$exS")
      (name, tB, tS, mB, mS, ratio, exB, exS,
        Bench.spreadFlag(tB) || Bench.spreadFlag(tS))
    }
    val stat1 = Bench.procStatTicks()
    val (stealPct, sysPct) = (stat0, stat1) match {
      case (Some((t0, s0, st0)), Some((t1, s1, st1))) if t1 > t0 =>
        (math.round((st1 - st0).toDouble / (t1 - t0) * 10000.0) / 100.0,
          math.round((s1 - s0).toDouble / (t1 - t0) * 10000.0) / 100.0)
      case _ => (-1.0, -1.0)
    }
    val postLoad = Bench.loadAvg()
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val qjson = rows.map { case (n, tB, tS, mB, mS, r, exB, exS, spread) =>
      s""""$n":{"base_median":${f"$mB%.3f"},"scaled_median":${f"$mS%.3f"},"ratio":$r,""" +
        s""""exchanges_base":$exB,"exchanges_scaled":$exS,"same_plan":${exB == exS},""" +
        s""""spread_flagged":$spread,"base_runs":${arr(tB)},"scaled_runs":${arr(tS)}}"""
    }.mkString("{", ",", "}")
    val spreadNames = rows.filter(_._9).map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    val planDiverged = rows.filter(r => !noAudit(r._1) && r._7 != r._8)
      .map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"scale_ratio","factor":$factor,"reps":$reps,""" +
      s""""base":"$base","scaled":"$scaled","queries":$qjson,""" +
      s""""plan_diverged":$planDiverged,"spread_flagged":$spreadNames,""" +
      s""""load_pre":$preLoad,"load_post":$postLoad,"contaminated":$contaminated,""" +
      s""""steal_pct":$stealPct,"sys_pct":$sysPct}"""
    // an ONLY-filtered profiling run must never clobber the committed
    // full matrix (the Bench BENCH_only.json rule — VERDICT r11 #1)
    val artifact = if (only.isDefined) "BENCH_scale_only.json" else "BENCH_scale.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try spark.stop()
    catch { case e: Throwable => Bench.diag(s"[scale] spark.stop failed: ${e.getMessage}") }
    println(json)
    System.out.flush()
  }
}
