package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CurationSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("w", LongType)))

  private def docs = df(schema,
    (1L to 10L).map(i => Row(i, "en", i * 10)) ++
      (11L to 13L).map(i => Row(i, "de", 100L)) ++
      Seq(Row(14L, "fr", 50L)))

  test("stratifiedExact takes ceil(fraction * count) per stratum, deterministically") {
    val out = Curation.stratifiedExact(docs, Seq("lang"), 0.25, "doc_id")
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 3L, "de" -> 1L, "fr" -> 1L)) // ceil(10*.25)=3, ceil(3*.25)=1, ceil(1*.25)=1
    // deterministic: the FIRST rows in orderCol order, and stable across runs
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 11L, 14L))
    assert(Curation.stratifiedExact(docs, Seq("lang"), 0.25, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet == ids)
  }

  test("stratifiedExact keeps NULL strata as their own stratum (ADVICE r10)") {
    // the window formulation kept nulls as a group; the prefix-join
    // rewrite must too (an EqualTo join would silently drop them)
    val withNulls = df(schema,
      (1L to 10L).map(i => Row(i, "en", i * 10)) ++
        (11L to 14L).map(i => Row(i, null, 100L)))
    val out = Curation.stratifiedExact(withNulls, Seq("lang"), 0.5, "doc_id")
    val byLang = out.collect().groupBy(r => Option(r.getString(1)))
      .map { case (k, v) => k -> v.map(_.getLong(0)).toSet }
    assert(byLang(Some("en")) == Set(1L, 2L, 3L, 4L, 5L)) // ceil(10*.5)
    assert(byLang(None) == Set(11L, 12L))                 // ceil(4*.5) of the null stratum
  }

  test("stratifiedExact keeps the input schema and rejects bad fractions") {
    assert(Curation.stratifiedExact(docs, Seq("lang"), 0.5, "doc_id")
      .columns.toSeq == docs.columns.toSeq)
    intercept[IllegalArgumentException] {
      Curation.stratifiedExact(docs, Seq("lang"), 0.0, "doc_id")
    }
    intercept[IllegalArgumentException] {
      Curation.stratifiedExact(docs, Seq("lang"), 1.5, "doc_id")
    }
  }

  test("stratifiedSeeded is reproducible for a fixed seed") {
    val a = Curation.stratifiedSeeded(docs, "lang", Map("en" -> 0.5, "de" -> 1.0), seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSeeded(docs, "lang", Map("en" -> 0.5, "de" -> 1.0), seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.forall(_ <= 13L)) // fr not in the fraction map → dropped
  }

  test("mixByWeight: budgets by weight column; straddler included; bottleneck rules") {
    // en: weights 10..100 (sum 550); de: 100x3 (sum 300); fr: 50.
    // mix 0.5/0.25/0.25 -> T = min(550/.5, 300/.25, 50/.25) = 200
    // budgets: en 100, de 50, fr 50
    val out = Curation.mixByWeight(docs, "lang",
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), "w", "doc_id")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    // en: cumBefore 0,10,30,60,100 -> ids 1..4 kept (id 5 has cb=100, not < 100)
    // de: id 11 (cb 0 < 50) kept, straddles to 100; id 12 cb=100 out
    // fr: id 14 (cb 0 < 50) kept, straddles
    assert(ids == Set(1L, 2L, 3L, 4L, 11L, 14L), ids.toString)
    // a weighted stratum absent from the input -> empty mix (loud)
    assert(Curation.mixByWeight(docs, "lang",
      Map("en" -> 0.5, "ja" -> 0.5), "w", "doc_id").count() == 0)
  }

  test("unimaxAllocate: water-fills small strata to the epoch cap, splits the rest equally") {
    // capacities at 2 epochs: a 200, b 2000, c 20000; budget 6000:
    // a saturates (200*3 <= 6000), b saturates (2000*2 <= 5800),
    // c gets the leftover 3800
    val alloc = Curation.unimaxAllocate(
      Seq("a" -> 100L, "b" -> 1000L, "c" -> 10000L), budget = 6000L, maxEpochs = 2)
      .map { case (s, _, b) => s -> b }.toMap
    assert(alloc == Map("a" -> 200L, "b" -> 2000L, "c" -> 3800L))
    // budget above total capacity: everything saturates, surplus unassigned
    val all = Curation.unimaxAllocate(
      Seq("a" -> 100L, "b" -> 1000L), budget = 1000000L, maxEpochs = 3)
      .map { case (s, _, b) => s -> b }.toMap
    assert(all == Map("a" -> 300L, "b" -> 3000L))
    // budget below m * min capacity: equal floor shares, nothing saturates
    val tight = Curation.unimaxAllocate(
      Seq("a" -> 100L, "b" -> 1000L, "c" -> 10000L), budget = 500L, maxEpochs = 2)
      .map { case (s, _, b) => s -> b }.toMap
    assert(tight == Map("a" -> 166L, "b" -> 166L, "c" -> 166L))
    intercept[IllegalArgumentException](
      Curation.unimaxAllocate(Seq("a" -> 100L), budget = 0L, maxEpochs = 2))
    intercept[IllegalArgumentException](
      Curation.unimaxAllocate(Seq("a" -> 100L), budget = 10L, maxEpochs = 0))
  }

  test("unimaxMix: saturated strata emit exactly maxEpochs copies; others epochs + prefix") {
    // docs: en w 10..100 (sum 550), de 3x100 (sum 300), fr 50.
    // capacities at 2 epochs: fr 100, de 600, en 1100; budget 1000:
    // fr saturates (100*3 <= 1000); de: 600*2 <= 900 fails ->
    // fair = 900/2 = 450 each for de and en.
    val out = Curation.unimaxMix(docs, "lang", "w", "doc_id",
      budget = 1000L, maxEpochs = 2).cache()
    val byLangEpoch = out.groupBy("lang", "epoch").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // fr (sat): 2 full epochs of its 1 doc, no partial
    assert(byLangEpoch.get(("fr", 0L)).contains(1L) &&
      byLangEpoch.get(("fr", 1L)).contains(1L) && !byLangEpoch.contains(("fr", 2L)))
    // de: 450 over sum 300 -> 1 full epoch (3 docs) + prefix under rem=150:
    // cb 0,100 < 150 -> docs 11, 12 (straddler included)
    assert(byLangEpoch.get(("de", 0L)).contains(3L) &&
      byLangEpoch.get(("de", 1L)).contains(2L))
    assert(out.filter(col("lang") === "de" && col("epoch") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(11L, 12L))
    // en: 450 over sum 550 -> 0 full epochs, prefix cb < 450 -> ids 1..9
    assert(byLangEpoch.get(("en", 0L)).contains(9L) && !byLangEpoch.contains(("en", 1L)))
    assert(out.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet == (1L to 9L).toSet)
    // schema: input columns + epoch; deterministic across runs
    assert(out.columns.toSeq == docs.columns.toSeq :+ "epoch")
    assert(Curation.unimaxMix(docs, "lang", "w", "doc_id", 1000L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet ==
      out.collect().map(r => (r.getLong(0), r.getLong(3))).toSet)
    out.unpersist()
  }

  test("mixByTemperature: alpha=1 is the natural mix; smaller alpha lifts small strata") {
    // synthetic: en dominates (100 docs x 100 chars), fr tiny (10 x 100)
    val rows = (1L to 100L).map(i => Row(i, "en", 100L)) ++
      (201L to 210L).map(i => Row(i, "fr", 100L))
    val d = df(schema, rows)
    def share(out: org.apache.spark.sql.DataFrame): Double = {
      val byLang = out.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      byLang.getOrElse("fr", 0L).toDouble / math.max(out.count(), 1L)
    }
    // alpha = 1: proportional to availability — bottleneck math keeps
    // everything (weights == availables), fr share == natural 10/110
    val natural = Curation.mixByTemperature(d, "lang", "w", "doc_id", alpha = 1.0)
    assert(natural.count() == 110, "alpha=1 must keep the full corpus")
    assert(math.abs(share(natural) - 10.0 / 110) < 1e-9)
    // alpha = 0.3: fr is up-weighted relative to en, so en (the
    // bottleneck-capped giant) is cut while fr keeps everything
    val warm = Curation.mixByTemperature(d, "lang", "w", "doc_id", alpha = 0.3)
    assert(share(warm) > 10.0 / 110, s"fr share must rise: ${share(warm)}")
    val frKept = warm.filter(col("lang") === "fr").count()
    assert(frKept == 10, s"the small stratum keeps all docs, got $frKept")
    assert(warm.filter(col("lang") === "en").count() < 100,
      "the dominant stratum must be down-sampled")
    // determinism: same input, same output
    assert(Curation.mixByTemperature(d, "lang", "w", "doc_id", alpha = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      warm.select("doc_id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException](
      Curation.mixByTemperature(d, "lang", "w", "doc_id", alpha = 0.0))
  }

  test("sampleGroupsSeeded: deterministic per seed, different across seeds, k-bounded") {
    val rows = (1L to 200L).map(i => Row(i, if (i <= 150) "en" else "de", 1L))
    val d = df(schema, rows)
    def draw(seed: Long): Map[String, Seq[Long]] =
      Curation.sampleGroupsSeeded(d, Seq("lang"), "doc_id", k = 10, seed)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val a = draw(1L); val b = draw(1L); val c = draw(2L)
    assert(a == b, "same seed must reproduce the draw")
    assert(a("en") != c("en"), "different seeds must draw differently")
    assert(a.values.forall(_.size == 10) && a("en").distinct.size == 10)
    // a sample is a subset of the group
    assert(a("en").forall(_ <= 150) && a("de").forall(_ > 150))
  }

  test("capPerGroup keeps the lowest maxN ids per group, full rows, no window") {
    val out = Curation.capPerGroup(docs, Seq("lang"), "doc_id", maxN = 3)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    // en capped 10 -> {1,2,3}; de (3 rows) and fr (1) fit under the cap
    assert(ids == Set(1L, 2L, 3L, 11L, 12L, 13L, 14L))
    assert(out.columns.toSeq == docs.columns.toSeq, "full input rows must survive")
    // appending higher-id docs never evicts an existing winner
    val grown = docs.union(df(schema, Seq(Row(99L, "en", 5L))))
    assert(Curation.capPerGroup(grown, Seq("lang"), "doc_id", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet == ids)
    // scale shape: heap aggregate + semi-join, never a per-group window
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "capPerGroup must not window-sort groups")
    intercept[IllegalArgumentException](Curation.capPerGroup(docs, Nil, "doc_id", 3))
    intercept[IllegalArgumentException](Curation.capPerGroup(docs, Seq("lang"), "doc_id", 0))
  }

  test("packSequences assigns contiguous budget chunks per group") {
    // en weights 10,20,...,100 (cum 10,30,...,550); budget 100 →
    // bin boundaries at cumBefore 0,10,30,60,100,150,210,280,360,450
    val out = Curation.packSequences(docs, "w", 100L, Seq("lang"), "doc_id")
      .orderBy("doc_id").collect()
    val enBins = out.filter(_.getString(1) == "en").map(_.getAs[Long]("bin")).toSeq
    assert(enBins == Seq(0L, 0L, 0L, 0L, 1L, 1L, 2L, 2L, 3L, 4L))
    // every bin's PRECEDING-cum start is below i*budget + budget (chunk contract)
    val deBins = out.filter(_.getString(1) == "de").map(_.getAs[Long]("bin")).toSeq
    assert(deBins == Seq(0L, 1L, 2L)) // 100-weight docs fill a 100-budget bin each
    assert(out.filter(_.getString(1) == "fr").map(_.getAs[Long]("bin")).toSeq == Seq(0L))
  }

  test("packSequences bins are dense and weight-bounded below budget + max(weight)") {
    val out = Curation.packSequences(docs, "w", 120L, Seq("lang"), "doc_id")
    val perBin = out.groupBy("lang", "bin").agg(sum(col("w")).as("tot"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val maxW = 100L
    assert(perBin.forall { case (_, _, tot) => tot < 120L + maxW })
    // bins are dense 0..max per group
    perBin.groupBy(_._1).foreach { case (_, rows) =>
      val bins = rows.map(_._2).sorted
      assert(bins.toSeq == (0L until bins.length).toSeq)
    }
  }

  test("packSequencesStrict: bins never exceed budget; next-fit boundaries exact; oversize fails loudly") {
    // en weights 10..100, budget 100: 10+20+30+40 = 100 exactly fills
    // bin 0; every later item overflows its predecessor's bin alone
    val out = Curation.packSequencesStrict(docs, "w", 100L, Seq("lang"), "doc_id")
      .orderBy("doc_id").collect()
    val enBins = out.filter(_.getString(1) == "en").map(_.getAs[Long]("bin")).toSeq
    assert(enBins == Seq(0L, 0L, 0L, 0L, 1L, 2L, 3L, 4L, 5L, 6L))
    assert(out.filter(_.getString(1) == "de").map(_.getAs[Long]("bin")).toSeq
      == Seq(0L, 1L, 2L))
    // the STRICT contract: no bin total exceeds the budget, any group
    val perBin = Curation.packSequencesStrict(docs, "w", 120L, Seq("lang"), "doc_id")
      .groupBy("lang", "bin").agg(sum(col("w")).as("tot")).collect()
    assert(perBin.forall(_.getLong(2) <= 120L))
    // deterministic under repartitioning (the shuffle+sort walk)
    val a = Curation.packSequencesStrict(docs.repartition(1), "w", 100L, Seq("lang"), "doc_id")
      .orderBy("doc_id").collect().map(_.getAs[Long]("bin")).toSeq
    val b = Curation.packSequencesStrict(docs.repartition(7), "w", 100L, Seq("lang"), "doc_id")
      .orderBy("doc_id").collect().map(_.getAs[Long]("bin")).toSeq
    assert(a == b)
    // an item wider than the budget must fail the job, not spill over
    intercept[Exception] {
      Curation.packSequencesStrict(docs, "w", 99L, Seq("lang"), "doc_id").count()
    }
    intercept[IllegalArgumentException] {
      Curation.packSequencesStrict(docs, "w", 100L, Seq.empty, "doc_id")
    }
  }

  test("packSequencesStrict matches an in-memory next-fit reference on random fixtures") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 300L).map { i =>
      Row(i, s"g${rnd.nextInt(4)}", (1 + rnd.nextInt(50)).toLong) }
    val budget = 60L
    val got = Curation.packSequencesStrict(df(schema, rows).repartition(5),
        "w", budget, Seq("lang"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bin")).toMap
    // reference: per-group sequential next-fit over doc_id order
    val ref = rows.groupBy(_.getString(1)).flatMap { case (_, rs) =>
      var bin = 0L; var used = 0L
      rs.sortBy(_.getLong(0)).map { r =>
        val w = r.getLong(2)
        if (used + w > budget) { bin += 1; used = 0L }
        used += w
        r.getLong(0) -> bin
      }
    }
    assert(got == ref)
  }

  test("packSequences rejects empty groupCols and non-positive budgets") {
    intercept[IllegalArgumentException] {
      Curation.packSequences(docs, "w", 100L, Seq.empty, "doc_id")
    }
    intercept[IllegalArgumentException] {
      Curation.packSequences(docs, "w", 0L, Seq("lang"), "doc_id")
    }
  }

  test("mixSources: bottleneck stratum sets the total; first-k per stratum by order") {
    // en: 10 docs, de: 3, fr: 1. Weights 2:1:1 → T = min(10/.5, 3/.25,
    // 1/.25) = 4 → k = (en 2, de 1, fr 1)
    val out = Curation.mixSources(docs, "lang",
      Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.0), orderCol = "doc_id")
    val got = out.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "en"), (2L, "en"), (11L, "de"), (14L, "fr")))
    // deterministic across runs
    assert(Curation.mixSources(docs, "lang",
      Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.0), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet == got.map(_._1))
  }

  test("mixSources: a weighted stratum absent from the input empties the mix (loud, not skewed)") {
    val out = Curation.mixSources(docs, "lang",
      Map("en" -> 1.0, "zh" -> 1.0), orderCol = "doc_id")
    assert(out.count() == 0)
    intercept[IllegalArgumentException] {
      Curation.mixSources(docs, "lang", Map.empty, "doc_id")
    }
  }

  private val textSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("contamination: overlap counted, clean docs zero, short docs empty") {
    val bench = df(textSchema, Seq(Row(100L, "alpha beta gamma delta epsilon zeta")))
    val corpus = df(textSchema, Seq(
      // contains the bench 5-grams "alpha beta gamma delta epsilon" and
      // "beta gamma delta epsilon zeta" plus 2 of its own
      Row(1L, "x alpha beta gamma delta epsilon zeta y"),
      Row(2L, "totally different words with no shared fivegram at all"),
      Row(3L, "too short")))
    val out = Curation.contamination(corpus, bench, "text", "doc_id", n = 5)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4 && out(0).getLong(2) == 2) // 4 grams, 2 hits
    assert(out(0).getDouble(3) == 0.5)
    assert(out(1).getLong(2) == 0)
    assert(out(2).getLong(1) == 0 && out(2).getLong(2) == 0 && out(2).getDouble(3) == 0.0)
  }

  test("contaminationAttribution: per-bench leak counts and corpus blast radius") {
    val bench = df(textSchema, Seq(
      Row(100L, "alpha beta gamma delta epsilon zeta"), // leaked into docs 1 and 2
      Row(101L, "one two three four five six")))        // clean
      .withColumnRenamed("doc_id", "bench_id")
    val corpus = df(textSchema, Seq(
      Row(1L, "x alpha beta gamma delta epsilon zeta y"),   // both bench-100 grams
      Row(2L, "alpha beta gamma delta epsilon other words"), // first gram only
      Row(3L, "totally different words with no shared fivegram at all")))
    val out = Curation.contaminationAttribution(corpus, bench, "text",
        "doc_id", "bench_id", n = 5)
      .orderBy("bench_id").collect()
    // bench 100: 2 grams, both leaked, by 2 distinct corpus docs
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 2 && out(0).getLong(3) == 2)
    assert(out(0).getDouble(4) == 1.0)
    // bench 101: 2 grams, none leaked, zero radius
    assert(out(1).getLong(1) == 2 && out(1).getLong(2) == 0 && out(1).getLong(3) == 0)
    assert(out(1).getDouble(4) == 0.0)
  }

  test("contamination normalizes case and whitespace before matching") {
    val bench = df(textSchema, Seq(Row(100L, "Alpha  Beta\tGamma Delta Epsilon")))
    val corpus = df(textSchema, Seq(Row(1L, "alpha beta gamma delta epsilon tail")))
    val out = Curation.contamination(corpus, bench, "text", "doc_id", n = 5).collect()
    assert(out.head.getLong(2) == 1)
  }

  test("assignSplits: deterministic, weight-proportional, membership-stable") {
    val ids = df(StructType(Seq(StructField("doc_id", LongType))),
      (0L until 2000L).map(Row(_)))
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.assignSplits(ids, "doc_id", splits, buckets = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // exact reference arithmetic
    def ref(id: Long): String = {
      val b = id * 2654435761L % 4294967296L % 10
      if (b < 8) "train" else if (b < 9) "val" else "test"
    }
    assert(out.forall { case (id, s) => s == ref(id) })
    val counts = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 1400 && counts("val") > 80 && counts("test") > 80)
    // membership stability: a subset corpus assigns identically
    val sub = Curation.assignSplits(ids.filter(col("doc_id") < 500), "doc_id", splits, buckets = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(sub.forall { case (id, s) => out(id) == s })
    intercept[IllegalArgumentException] {
      Curation.assignSplits(ids, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    // a split whose weight rounds to zero buckets must fail loudly,
    // not silently produce an empty split
    intercept[IllegalArgumentException] {
      Curation.assignSplits(ids, "doc_id",
        Seq("a" -> 0.999, "b" -> 0.001), buckets = 10)
    }
  }

  test("shardShuffle: exact (key, id) ranks per shard, dense pos, partition-invariant") {
    val ids = df(StructType(Seq(StructField("doc_id", LongType))),
      (0L until 500L).map(Row(_)))
    val out = Curation.shardShuffle(ids, "doc_id", numShards = 8, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 500 && out.map(_._1).toSet.size == 500)
    // reference arithmetic: LCG key, shard, exact (key, id) rank
    val m = 2147483648L
    def key(id: Long) = Math.floorMod(Math.floorMod(id, m) * 1103515245L + 42L, m)
    val expected = (0L until 500L).map(id => id -> (key(id) % 8).toInt).toMap
    out.foreach { case (id, sh, _) => assert(sh == expected(id), s"shard of $id") }
    val byShard = out.groupBy(_._2)
    byShard.foreach { case (sh, rows) =>
      // dense 1..n positions, ordered exactly by (key, id)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"shard $sh pos density")
      val got = rows.sortBy(_._3).map(_._1).toSeq
      val want = rows.map(_._1).sortBy(id => (key(id), id)).toSeq
      assert(got == want, s"shard $sh order")
    }
    // every shard populated and roughly balanced on 500 sequential ids
    assert(byShard.keySet == (0 until 8).toSet)
    // partition invariance
    val re = Curation.shardShuffle(ids.repartition(7), "doc_id", 8, 42L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(re.toSeq == out.sortBy(_._1).toSeq)
  }

  test("shardShuffle: key collisions (ids 2^31 apart) order by id; schema kept; bad args fail") {
    // 5 and 5 + 2^31 produce the SAME key — the tie-break must put the
    // smaller id first, deterministically
    val twin = df(StructType(Seq(StructField("doc_id", LongType), StructField("lang", StringType))),
      Seq(Row(5L, "a"), Row(5L + 2147483648L, "b"), Row(7L, "c")))
    val out = Curation.shardShuffle(twin, "doc_id", numShards = 1, seed = 9L)
    assert(out.columns.toSeq == Seq("doc_id", "lang", "shard", "pos"))
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    val collided = rows.filter(t => t._1 == 5L || t._1 == 5L + 2147483648L)
    assert(collided.map(_._3).toSet.size == 2, "tied keys still get distinct ranks")
    assert(collided.minBy(_._1)._3 < collided.maxBy(_._1)._3, "id ascending inside a key tie")
    assert(rows.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
    // a custom key function rides the identical pipeline
    val alt = Curation.shardShuffle(twin, "doc_id", 2, 0L,
      keyFn = Some((c: org.apache.spark.sql.Column) => pmod(xxhash64(lit(1L), c), lit(1000000L))))
    assert(alt.count() == 3)
    intercept[IllegalArgumentException](Curation.shardShuffle(twin, "doc_id", 0, 1L))
    intercept[IllegalArgumentException](Curation.shardShuffle(twin, "lang", 2, 1L))
  }

  test("chunkDocuments: stride windows, short tail, blank docs vanish") {
    val d = df(textSchema, Seq(
      Row(1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      Row(2L, "only three words"),
      Row(3L, "   ")))
    val out = Curation.chunkDocuments(d, "text", "doc_id", chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
    // stride 3: doc 1 chunks start at 0,3,6,9 -> 4 chunks; last has 1 token
    val doc1 = out.filter(_.getLong(0) == 1L)
    assert(doc1.length == 4)
    assert(doc1.map(_.getString(2)).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10"))
    assert(doc1.map(_.getLong(3)).toSeq == Seq(4L, 4L, 4L, 1L))
    val doc2 = out.filter(_.getLong(0) == 2L)
    assert(doc2.length == 1 && doc2.head.getString(2) == "only three words" &&
      doc2.head.getLong(3) == 3L)
    assert(!out.exists(_.getLong(0) == 3L))
  }

  test("chunkDocuments rejects bad overlap/chunk sizes") {
    val d = df(textSchema, Seq(Row(1L, "a b")))
    intercept[IllegalArgumentException] {
      Curation.chunkDocuments(d, "text", "doc_id", chunkTokens = 4, overlap = 4) }
    intercept[IllegalArgumentException] {
      Curation.chunkDocuments(d, "text", "doc_id", chunkTokens = 0) }
  }

  test("wordNgramHashes: distinct hash count == distinct n-gram string count (random)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val texts = (1 to 40).map { i =>
      Row(i.toLong, (0 until rnd.nextInt(15)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val d = df(textSchema, texts)
    import org.apache.spark.sql.graftshim.ColumnBridge
    val viaHash = d.select(size(array_distinct(ColumnBridge.column(
        graft.functions.WordNgramHashes(ColumnBridge.expression(col("text")), 3)))))
      .collect().map(_.getInt(0)).toSeq
    val viaString = texts.map { r =>
      val w = r.getString(1).split(" ").filter(_.nonEmpty)
      if (w.length < 3) 0 else w.sliding(3).map(_.mkString(" ")).toSet.size
    }
    assert(viaHash == viaString)
  }

  test("assembleSequences: id-ordered concat, separator between docs only, boundaries kept") {
    val s = StructType(Seq(
      StructField("doc_id", LongType), StructField("g", StringType),
      StructField("ids", ArrayType(LongType)), StructField("bin", LongType)))
    val packed = df(s, Seq(
      Row(3L, "en", Seq(30L, 31L), 0L),
      Row(1L, "en", Seq(10L), 0L),      // same bin, lower id -> comes first
      Row(7L, "en", Seq(70L), 1L),
      Row(2L, "de", Seq[Long](), 0L),   // empty doc: contributes only its separator slot
      Row(4L, "de", Seq(40L), 0L)))
    val out = Curation.assembleSequences(packed, "ids", "doc_id", Seq("g"), sepId = Some(-1L))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getSeq[Long](2), r.getSeq[Long](3), r.getSeq[Long](4), r.getSeq[Long](5), r.getLong(6)))).toMap
    // en bin 0: docs 1 [10] then 3 [30, 31]; separator carries the
    // PRECEDING doc's segment and the next position after it
    assert(out(("en", 0L)) == ((Seq(1L, 3L),
      Seq(10L, -1L, 30L, 31L),   // input_ids
      Seq(0L, 0L, 1L, 1L),       // segment_ids
      Seq(0L, 1L, 0L, 1L),       // position_ids (reset per doc)
      4L)))
    assert(out(("en", 1L)) == ((Seq(7L), Seq(70L), Seq(0L), Seq(0L), 1L)))
    // de bin 0: empty doc 2 contributes its separator slot (seg 0,
    // pos 0), then doc 4 restarts at seg 1 / pos 0
    assert(out(("de", 0L)) == ((Seq(2L, 4L), Seq(-1L, 40L), Seq(0L, 1L), Seq(0L, 0L), 2L)))
    // no separator: plain concatenation in id order; empty docs vanish
    val plain = Curation.assembleSequences(packed, "ids", "doc_id", Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getSeq[Long](3), r.getSeq[Long](4), r.getSeq[Long](5)))).toMap
    assert(plain(("en", 0L)) == ((Seq(10L, 30L, 31L), Seq(0L, 1L, 1L), Seq(0L, 0L, 1L))))
    assert(plain(("de", 0L)) == ((Seq(40L), Seq(1L), Seq(0L))))
  }

  test("chunkSentences: sentences never split; budget holds except lone oversize; text reassembles") {
    val s = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val d = df(s, Seq(
      Row(1L, "one two three. four five six! seven eight? nine ten"),
      Row(2L, ("w " * 12).trim + "."),                // oversize single sentence (12 > 8)
      Row(3L, "   "),                                  // blank: no chunks
      Row(4L, "Tiny. Doc.")))
    val out = Curation.chunkSentences(d, "text", "doc_id", budgetTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1: sentences of 3/3/2/2 tokens -> [3+3+2=8][2]
    assert(out((1L, 0L)) == (("one two three. four five six! seven eight?", 3L, 8L)))
    assert(out((1L, 1L)) == (("nine ten", 1L, 2L)))
    // doc 2: a single 12-token sentence becomes a singleton chunk with
    // its TRUE token count reported
    assert(out((2L, 0L))._3 == 12L && out((2L, 0L))._2 == 1L)
    assert(!out.keySet.exists(_._1 == 3L))
    // doc 4: both tiny sentences fit one chunk; normalization lowercases
    assert(out((4L, 0L)) == (("tiny. doc.", 2L, 2L)))
    // chunks concatenated in order reproduce the normalized text
    val joined = out.toSeq.filter(_._1._1 == 1L).sortBy(_._1._2).map(_._2._1).mkString(" ")
    assert(joined == "one two three. four five six! seven eight? nine ten")
  }

  test("corpusDiff random-fixture: matches a local reference; reversal swaps added/removed") {
    val rnd = new scala.util.Random(23)
    val s = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def norm(t: String) = t.toLowerCase.replaceAll("\\s+", " ").trim
    (0 until 3).foreach { round =>
      def text(i: Long, v: Int) = s"doc $i  Version $v " + ("pad " * (i % 3).toInt)
      val oldRows = (0L until 60L).filter(_ => rnd.nextDouble() < 0.8).map(i => i -> text(i, 0))
      val newRows = (0L until 60L).filter(_ => rnd.nextDouble() < 0.8)
        .map(i => i -> (if (rnd.nextBoolean()) text(i, 0) else text(i, 1)))
      val om = oldRows.toMap; val nm = newRows.toMap
      val expect = (om.keySet ++ nm.keySet).map { i =>
        i -> ((om.get(i), nm.get(i)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if norm(a) == norm(b) => "unchanged"
          case _ => "changed"
        })
      }.toMap
      val odf = df(s, oldRows.map { case (i, t) => Row(i, t) })
      val ndf = df(s, newRows.map { case (i, t) => Row(i, t) })
      val got = Curation.corpusDiff(odf, ndf, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expect, s"round $round")
      val rev = Curation.corpusDiff(ndf, odf, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rev == expect.map { case (k, v) => k -> (v match {
        case "added" => "removed"; case "removed" => "added"; case x => x
      }) }, s"round $round reversed")
    }
  }

  test("corpusDiff: added/removed/changed/unchanged; whitespace-only edits are unchanged") {
    val s = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val oldC = df(s, Seq(
      Row(1L, "same text"),
      Row(2L, "will change"),
      Row(3L, "will be removed"),
      Row(4L, "Spacing   And Case")))
    val newC = df(s, Seq(
      Row(1L, "same text"),
      Row(2L, "has changed"),
      Row(4L, " spacing and  case "), // normalization-equal -> unchanged
      Row(5L, "brand new")))
    val got = Curation.corpusDiff(oldC, newC, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  private val stratValSchema = StructType(Seq(
    StructField("g", StringType), StructField("id", LongType),
    StructField("v", DoubleType)))

  test("neymanSample: volatile strata get more budget than uniform ones of equal size") {
    // stratum "flat": 20 rows, constant value -> sigma 0 -> weight 0
    // stratum "wild": 20 rows, high spread -> gets (almost) all the budget
    val rows = (0 until 20).map(i => Row("flat", i.toLong, 10.0)) ++
      (0 until 20).map(i => Row("wild", 100L + i, if (i % 2 == 0) 0.0 else 1000.0))
    val out = Curation.neymanSample(df(stratValSchema, rows), "g", "v", "id", budget = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byG = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byG.getOrElse("wild", 0) == 10 && byG.getOrElse("flat", 0) == 0,
      s"all budget should go to the volatile stratum, got $byG")
    // the take is the id-order prefix of the stratum
    assert(out.filter(_._1 == "wild").map(_._2).sorted.toSeq == (100L to 109L))
  }

  test("neymanSample: all-constant corpus falls back to proportional; award capped at population") {
    val rows = (0 until 30).map(i => Row("big", i.toLong, 5.0)) ++
      (0 until 10).map(i => Row("small", 100L + i, 5.0))
    val out = Curation.neymanSample(df(stratValSchema, rows), "g", "v", "id", budget = 20L)
      .collect().map(r => r.getString(0))
    val byG = out.groupBy(identity).view.mapValues(_.length).toMap
    // proportional: 20 * 30/40 = 15, 20 * 10/40 = 5
    assert(byG == Map("big" -> 15, "small" -> 5), s"got $byG")
    // budget larger than a stratum: award capped at its population
    val capped = Curation.neymanSample(
        df(stratValSchema, (0 until 4).map(i => Row("only", i.toLong, i.toDouble))),
        "g", "v", "id", budget = 100L)
      .count()
    assert(capped == 4L)
    intercept[IllegalArgumentException](
      Curation.neymanSample(df(stratValSchema, Seq(Row("a", 1L, 1.0))), "g", "v", "id", 0L))
  }

  test("splitLeakage: only cross-split near-dup pairs survive") {
    val sch = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("split", StringType)))
    val d = df(sch, Seq(
      Row(1L, "alpha beta gamma delta", "train"),
      Row(2L, "alpha beta gamma delta epsilon", "test"),  // near-dup of 1, cross-split
      Row(3L, "alpha beta gamma delta", "train"),         // exact dup of 1, SAME split
      Row(4L, "totally different content here", "test")))
    val out = Curation.splitLeakage(d, "text", "doc_id", "split",
        blockCol = org.apache.spark.sql.functions.lit("b"), n = 1, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3))).toSet
    // (1,3) is a dup but within train -> excluded; 4 matches nothing
    assert(out == Set((1L, 2L, "train", "test"), (2L, 3L, "test", "train")),
      s"got $out")
  }

  test("curriculumOrder: dense global easy-to-hard order, ties low, nulls rejected") {
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    // scores 1..12 over 4 quartile buckets; ids deliberately NOT in
    // score order so the position must come from the score
    val rows = Seq(5L -> 1.0, 1L -> 2.0, 9L -> 3.0, 2L -> 4.0, 11L -> 5.0,
      3L -> 6.0, 8L -> 7.0, 4L -> 8.0, 12L -> 9.0, 6L -> 10.0, 10L -> 11.0,
      7L -> 12.0).map { case (i, s) => Row(i, s) }
    val out = Curation.curriculumOrder(df(sch, rows), "score", "id",
        buckets = 4, exact = true)
      .collect().map(r => r.getAs[Long]("curriculum_pos") ->
        (r.getAs[Int]("difficulty_bucket"), r.getAs[Long]("id"))).toMap
    assert(out.keySet == (0L until 12L).toSet, "positions are dense 0-based")
    // quartile cuts at 3,6,9 (rank selection): bucket 1 = scores <= 3
    // = ids {5,1,9}, within-bucket order by ID: 1,5,9
    assert((0L to 2L).map(out) == Seq((1, 1L), (1, 5L), (1, 9L)))
    // hardest bucket = scores 10..12 = ids {6,10,7} -> id order 6,7,10
    assert((9L to 11L).map(out) == Seq((4, 6L), (4, 7L), (4, 10L)))
    intercept[IllegalArgumentException](
      Curation.curriculumOrder(df(sch, rows :+ Row(99L, null)), "score", "id", 4, exact = true))
    intercept[IllegalArgumentException](
      Curation.curriculumOrder(df(sch, rows), "score", "id", buckets = 1))
  }

  private val packedSchema = StructType(Seq(
    StructField("g", StringType), StructField("id", LongType),
    StructField("w", LongType)))

  test("packEfficiency: per-group bin stats in fixed-point") {
    // group A, budget 10: strict next-fit over w = [6, 3, 5, 9] in id
    // order -> bins {6,3}=9, {5}=5, {9}=9
    val d = df(packedSchema, Seq(
      Row("A", 1L, 6L), Row("A", 2L, 3L), Row("A", 3L, 5L), Row("A", 4L, 9L)))
    val packed = Curation.packSequencesStrict(d, "w", 10L, Seq("g"), "id")
    val out = Curation.packEfficiency(packed, "w", 10L, Seq("g")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_bins") == 3L && r.getAs[Long]("n_items") == 4L)
    assert(r.getAs[Long]("used_tokens") == 23L && r.getAs[Long]("capacity") == 30L)
    assert(r.getAs[Long]("fill_fp") == 76666666L)        // 23e8 // 30
    assert(r.getAs[Long]("min_bin_fill_fp") == 50000000L) // 5/10
    assert(r.getAs[Long]("max_bin_fill_fp") == 90000000L) // 9/10
    intercept[IllegalArgumentException](Curation.packEfficiency(packed, "w", 0L, Seq("g")))
    intercept[IllegalArgumentException](Curation.packEfficiency(packed, "w", 10L, Seq.empty))
  }

  private val srcTextSchema = StructType(Seq(
    StructField("src", StringType), StructField("text", StringType)))

  test("corpusOverlap: dense ordered matrix, directional containment, zero pairs kept") {
    val d = df(srcTextSchema, Seq(
      Row("A", "a b c"),  // bigrams {a b, b c}  -> n=2
      Row("B", "a b x"),  // bigrams {a b, b x}  -> n=2; A∩B = {a b}
      Row("C", "z z z"))) // bigrams {z z}       -> n=1 (distinct); no overlap
    val out = Curation.corpusOverlap(d, "text", "src", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_common"),
          r.getAs[Long]("containment_fp"), r.getAs[Long]("jaccard_fp"))).toMap
    assert(out.size == 6, s"expected dense 3x2 matrix, got ${out.keySet}")
    assert(out(("A", "B")) == (2L, 1L, 50000000L, 33333333L)) // 1/2, 1/3
    assert(out(("B", "A")) == (2L, 1L, 50000000L, 33333333L))
    assert(out(("A", "C")) == (2L, 0L, 0L, 0L)) // zero overlap is VISIBLE
    assert(out(("C", "A")) == (1L, 0L, 0L, 0L))
  }

  test("corpusOverlap: duplicate grams within a source count once") {
    val d = df(srcTextSchema, Seq(
      Row("A", "p q p q p q"), // bigrams all in {p q, q p} -> n_a = 2
      Row("B", "p q")))        // {p q} -> n_b = 1; common = 1
    val out = Curation.corpusOverlap(d, "text", "src", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_common"),
          r.getAs[Long]("containment_fp"))).toMap
    assert(out(("A", "B")) == (2L, 1L, 1L, 50000000L))  // |A∩B|/|A| = 1/2
    assert(out(("B", "A")) == (1L, 2L, 1L, 100000000L)) // B fully contained
  }

  test("timeSplit: per-entity chronological boundary, ceil threshold, no future in train") {
    val sch = StructType(Seq(
      StructField("uid", LongType), StructField("ts", TimestampType),
      StructField("id", LongType)))
    // uid 1: 5 events → ceil(0.8·5)=4 train; uid 2: 1 event → train
    val rows = (1 to 5).map(i => Row(1L, ts(s"2024-01-0$i 10:00:00"), i.toLong)) :+
      Row(2L, ts("2024-01-01 10:00:00"), 9L)
    val out = Curation.timeSplit(df(sch, rows), "uid", "ts", "id", 800)
      .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(out == Map(1L -> "train", 2L -> "train", 3L -> "train", 4L -> "train",
      5L -> "val", 9L -> "train"), s"got $out")
    // every train ts strictly precedes every val ts within an entity
    val d2 = Curation.timeSplit(df(sch, rows), "uid", "ts", "id", 400)
      .collect().groupBy(_.getLong(0))
    d2.values.foreach { g =>
      val tr = g.filter(_.getString(3) == "train").map(_.getTimestamp(2).getTime)
      val va = g.filter(_.getString(3) == "val").map(_.getTimestamp(2).getTime)
      if (tr.nonEmpty && va.nonEmpty) assert(tr.max < va.min, "future leaked into train")
    }
    intercept[IllegalArgumentException](
      Curation.timeSplit(df(sch, rows), "uid", "ts", "id", 1000))
  }

  test("jsDivergence: identical corpora score 0; disjoint score ln 2; drift terms surface") {
    val sch = StructType(Seq(StructField("text", StringType)))
    val a = df(sch, Seq(Row("x x y"), Row("x y z")))
    // identical distributions → every contribution 0
    val same = Curation.jsDivergence(a, a, "text", vocabSize = 10).collect()
    assert(same.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
    assert(same.head.getLong(5) == 0L)
    // fully disjoint vocabularies → JS = ln 2 (the upper bound)
    val b = df(sch, Seq(Row("p p q"), Row("p q r")))
    val disj = Curation.jsDivergence(a, b, "text", vocabSize = 10).collect()
    val js = disj.head.getLong(5).toDouble / 2.0 / 1e12
    assert(math.abs(js - math.log(2.0)) < 1e-6, s"js $js")
    // the total is constant across rows and counts are per-side exact
    assert(disj.map(_.getLong(5)).distinct.length == 1)
    val byTerm = disj.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byTerm("x") == ((3L, 0L)) && byTerm("p") == ((0L, 3L)))
    intercept[IllegalArgumentException](
      Curation.jsDivergence(a, df(sch, Seq(Row(""))), "text"))
  }

  test("negativeSample: k collision-free uniform draws per anchor; dense-id contract") {
    val idSchema = StructType(Seq(StructField("doc_id", LongType)))
    val d = df(idSchema, (0L until 10L).map(Row(_)))
    val out = Curation.negativeSample(d, "doc_id", k = 3, seed = 42L).collect()
    assert(out.length == 30)
    // never the anchor itself, always in [0, N)
    assert(out.forall(r => r.getLong(2) != r.getLong(0)))
    assert(out.forall(r => r.getLong(2) >= 0L && r.getLong(2) < 10L))
    // deterministic: same seed same draws; different seed diverges somewhere
    val again = Curation.negativeSample(d, "doc_id", k = 3, seed = 42L).collect()
    assert(out.map(_.toSeq).toSeq.sortBy(_.toString) ==
      again.map(_.toSeq).toSeq.sortBy(_.toString))
    val other = Curation.negativeSample(d, "doc_id", k = 3, seed = 43L).collect()
    assert(out.map(_.toSeq).toSet != other.map(_.toSeq).toSet)
    // draws spread over the corpus (not all identical offsets)
    assert(out.map(_.getLong(2)).distinct.length > 3)
    // non-dense ids fail loudly
    val sparse = df(idSchema, Seq(Row(0L), Row(5L)))
    val ex = intercept[IllegalArgumentException](
      Curation.negativeSample(sparse, "doc_id", k = 1))
    assert(ex.getMessage.contains("dense"))
    intercept[IllegalArgumentException](
      Curation.negativeSample(d, "doc_id", k = 0))
    intercept[IllegalArgumentException](
      Curation.negativeSample(df(idSchema, Seq(Row(0L))), "doc_id", k = 1))
  }

  private val dmSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("bucket", LongType)))

  test("distMatch: binding bucket keeps 100%, others thin proportionally") {
    // source uniform over buckets 1/2; target 3:1 toward bucket 1
    val src = df(dmSchema, (0L until 40L).map(i => Row(i, 1L + i % 2)))
    val tgt = df(dmSchema,
      (0L until 30L).map(i => Row(100L + i, 1L)) ++
        (0L until 10L).map(i => Row(200L + i, 2L)))
    val out = Curation.distMatch(src, tgt, "bucket", "doc_id", seed = 7L)
    val keepByBucket = out.select("bucket", "keep_fp").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ratios ∝ (t_b/T)/(s_b/S) = 1.5 and 0.5 → bucket 1 binds at scale,
    // bucket 2 keeps exactly one third of it
    assert(keepByBucket(1L) == 1000000L, s"got $keepByBucket")
    assert(keepByBucket(2L) == 333333L)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val m = 2147483648L
    def lcgMod(id: Long): Long =
      ((id % m + m) % m * 1103515245L + 7L) % m % 1000000L
    val expect = (0L until 40L).filter { i =>
      lcgMod(i) < keepByBucket(1L + i % 2)
    }.toSet
    assert(kept == expect, "kept set is exactly the LCG predicate")
    // bucket-1 rows all survive (keep_fp = scale ⇒ predicate always true)
    assert((0L until 40L).filter(_ % 2 == 0).forall(kept), "bucket 1 keeps all")
  }

  test("distMatch: source bucket absent from the target is dropped") {
    val src = df(dmSchema, (0L until 20L).map(i => Row(i, i % 4)))
    val tgt = df(dmSchema, (0L until 12L).map(i => Row(100L + i, i % 3)))
    val out = Curation.distMatch(src, tgt, "bucket", "doc_id", seed = 1L)
    assert(out.filter(col("bucket") === 3L).count() == 0L,
      "bucket 3 has no target mass")
    // equal target shares over equal source buckets: every surviving
    // bucket keeps 100%
    val keeps = out.select("keep_fp").distinct().collect().map(_.getLong(0)).toSeq
    assert(keeps == Seq(1000000L), s"got $keeps")
    intercept[IllegalArgumentException](
      Curation.distMatch(src, tgt, "bucket", "doc_id", seed = 1L, scale = 10L))
  }

  test("domainSoftmaxWeights: hand-checked integer rollup, clamped excess, softmax") {
    val sch = StructType(Seq(
      StructField("dom", StringType), StructField("avg_nll", DoubleType),
      StructField("n_bigrams", LongType)))
    val scored = df(sch, Seq(
      Row("A", 2.0, 10L), Row("A", 4.0, 30L),  // token-weighted mean 3.5
      Row("B", 1.0, 40L),                      // below corpus mean: excess 0
      Row("B", null, 5L), Row("B", 9.9, 0L)))  // unscored rows excluded
    val out = Curation.domainSoftmaxWeights(scored, "dom", "avg_nll", "n_bigrams",
        eta = 1.0, smoothing = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(1) == 2L && a.getLong(2) == 40L)
    assert(a.getLong(3) == 35000L, "A mean = (10*20000 + 30*40000) / 40")
    // corpus mean = (1400000 + 400000 + 40) div 80 = 22500
    assert(a.getLong(4) == 12500L, "excess = 35000 - 22500")
    assert(a.getLong(5) == math.floor(math.exp(1.25) * 1e9).toLong)
    val b = out("B")
    assert(b.getLong(2) == 40L, "null-nll and zero-token rows carry no loss signal")
    assert(b.getLong(4) == 0L && b.getLong(5) == 1000000000L, "clamped at the mean: e_fp = 1e9")
    val se = a.getLong(5) + b.getLong(5)
    assert(a.getDouble(6) == a.getLong(5).toDouble / se.toDouble)
    assert(b.getDouble(7) == (1.0 - 0.2) * (1e9 / se.toDouble) + 0.2 / 2.0,
      "smoothed with uniform (expected mirrors the operator's IEEE tree)")
    assert(math.abs(out.values.map(_.getDouble(7)).sum - 1.0) < 1e-12,
      "smoothed weights are a distribution")
    intercept[IllegalArgumentException](
      Curation.domainSoftmaxWeights(scored, "dom", "avg_nll", "n_bigrams", eta = 0.0))
  }

  private val scSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Re-interleave (corrupted, target) back into the original text:
    * each sentinel in the corrupted stream substitutes its span from
    * the target stream — the denoising-pair invariant. */
  private def reconstruct(corrupted: String, target: String): String = {
    val sent = "<extra_id_\\d+>".r
    val spans: Map[String, Seq[String]] = {
      val parts = sent.findAllIn(target).toList
      val texts = sent.split(target).toList.map(_.trim)
      // texts.head is the (empty) prefix before the first sentinel
      parts.zip(texts.drop(1).padTo(parts.size, ""))
        .map { case (s, t) => s -> t.split(" ").toSeq.filter(_.nonEmpty) }.toMap
    }
    corrupted.split(" ").filter(_.nonEmpty).flatMap { tok =>
      if (tok.matches("<extra_id_\\d+>")) spans.getOrElse(tok, Seq.empty)
      else Seq(tok)
    }.mkString(" ")
  }

  test("spanCorrupt: corrupted + target reconstruct every document exactly") {
    val docs = df(scSchema, Seq(
      Row(1L, "The  quick Brown fox jumps over the lazy dog again and again"),
      Row(2L, "one two three four five six seven eight nine ten"),
      Row(3L, "solitary"),
      Row(4L, null)))
    val out = Curation.spanCorrupt(docs, "text", "doc_id",
        ratioNum = 40, ratioDen = 100, seed = 7)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L), "null text yields no row")
    Seq(1L, 2L, 3L).foreach { id =>
      val norm = docs.filter(col("doc_id") === id)
        .select(graft.functions.TextFunctions.normalizeForFingerprint(col("text")))
        .head().getString(0)
      val r = out(id)
      assert(reconstruct(r.getString(1), r.getString(2)) == norm,
        s"doc $id: corrupted='${r.getString(1)}' target='${r.getString(2)}'")
      assert(r.getLong(3) == norm.split(" ").length)
    }
    // sentinels are numbered 0..k-1 in order of appearance
    val c1 = out(1L).getString(1)
    val ids = "<extra_id_(\\d+)>".r.findAllMatchIn(c1).map(_.group(1).toInt).toSeq
    assert(ids == ids.indices.toSeq, s"sentinels out of order: $c1")
  }

  test("clusterAwareSplit: every cluster member shares its root's split; singletons self-route") {
    val docs = df(StructType(Seq(StructField("doc_id", LongType))),
      (1L to 200L).map(Row(_)))
    // clusters: {1..5} rooted at 1, {10, 20, 30} rooted at 10
    val comps = df(StructType(Seq(StructField("id", LongType),
        StructField("component", LongType))),
      (1L to 5L).map(Row(_, 1L)) ++ Seq(Row(10L, 10L), Row(20L, 10L), Row(30L, 10L)))
    val out = Curation.clusterAwareSplit(docs, "doc_id", comps)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // cluster members inherit the root and its split
    assert((1L to 5L).map(out(_)).toSet.size == 1)
    assert(Set(10L, 20L, 30L).map(out(_)).size == 1)
    assert(out(20L)._1 == 10L)
    // singleton routes by its own id through the same hash
    def bucket(root: Long) = (root * 2654435761L) % 4294967296L % 10L
    (1L to 200L).foreach { id =>
      val (root, split) = out(id)
      val want = bucket(root) match {
        case b if b < 8 => "train"; case 8 => "dev"; case _ => "test"
      }
      assert(split == want, s"id $id root $root")
    }
    // all three splits are populated at n=200
    assert(out.values.map(_._2).toSet == Set("train", "dev", "test"))
    intercept[IllegalArgumentException](
      Curation.clusterAwareSplit(docs, "doc_id", comps, Seq(("train", 0L))))
  }

  test("leakageSafeSplit: replayable-LSH default agrees with the exact " +
    "all-pairs path on planted near-dup families (VERDICT r14 #1)") {
    // three 4-member families with disjoint vocabularies — each member
    // one word-substitution away from the family base (pairwise trigram
    // jaccard 0.65-0.81, all above the 0.6 threshold) — plus six
    // unrelated singletons. The exact truth is ngramJaccardPairs with a
    // SINGLE block and the cap disabled: the uncapped all-pairs verify.
    val tSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def famText(f: Int, m: Int): String = {
      val words = (0 until 30).map(w => s"fam${f}word$w").toArray
      if (m > 0) words(5 * m) = s"fam${f}sub$m"
      words.mkString(" ")
    }
    val rows = (for (f <- 0 until 3; m <- 0 until 4)
        yield Row(f * 10L + m, famText(f, m))) ++
      (100L to 105L).map(i => Row(i, (0 until 12).map(w => s"solo${i}w$w").mkString(" ")))
    val d = df(tSchema, rows)
    def exactPairs = Dedup.ngramJaccardPairs(d, "text", "doc_id", lit(1),
      n = 3, threshold = 0.6, maxBlockSize = 0)
    val exact = exactPairs.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.replayableMinhashPairs(d, "text", "doc_id", n = 3, threshold = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 6 in-family pairs x 3 families, nothing across families or solos
    assert(exact.size == 18, s"fixture drifted: $exact")
    assert(lsh == exact, s"LSH candidates missed/added pairs: " +
      s"missing=${exact -- lsh} extra=${lsh -- exact}")
    // end-to-end: identical (root, split) assignment for every doc —
    // on the replayable md5 path AND the default xxhash64-sketch path
    // (members connect through the family base, so LSH recall noise on
    // borderline pairs cannot change the components)
    val viaLsh = Curation.leakageSafeSplit(d, "text", "doc_id",
        n = 3, threshold = 0.6, replayable = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val viaExact = Curation.clusterAwareSplit(d, "doc_id",
        Dedup.connectedComponents(exactPairs))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(viaLsh == viaExact)
    val viaDefault = Curation.leakageSafeSplit(d, "text", "doc_id",
        n = 3, threshold = 0.6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(viaDefault == viaExact)
    // families actually cluster: all members share their min-id root
    (0 until 3).foreach { f =>
      assert((0 until 4).map(m => viaLsh(f * 10L + m)._1).toSet == Set(f * 10L),
        s"family $f did not cluster: $viaLsh")
    }
    assert((100L to 105L).forall(i => viaLsh(i)._1 == i), "solos must self-root")
  }

  private val dbSchema = StructType(Seq(
    StructField("id", LongType), StructField("len", LongType)))

  /** Local replay of the shard/sort/cut/pad bookkeeping. */
  private def dynRef(rows: Seq[(Long, Long)], b: Int, shards: Int,
                     seed: Long): Map[(Long, Long), (Long, Long, Long, Long)] =
    rows.groupBy { case (id, _) =>
      ((id * 1103515245L + seed) % 2147483648L) % shards
    }.flatMap { case (sh, rs) =>
      rs.sortBy { case (id, len) => (-len, id) }.grouped(b).zipWithIndex
        .map { case (batch, bi) =>
          val lens = batch.map(_._2)
          (sh, bi.toLong) -> ((lens.size.toLong, lens.max, lens.sum,
            lens.size * lens.max - lens.sum))
        }
    }

  test("dynamicBatches: equals the local shard/sort/cut replay; pad math exact") {
    val rnd = new scala.util.Random(67)
    val rows = (1L to 100L).map(id => (id, rnd.nextInt(512).toLong))
    val out = Curation.dynamicBatches(
        df(dbSchema, rows.map { case (i, l) => Row(i, l) }),
        "id", "len", batchSize = 8, numShards = 4, seed = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == dynRef(rows, 8, 4, 11))
    // length-sorted cuts keep padding far below a random assignment's
    val totalPad = out.values.map(_._4).sum
    val randomPad = rows.grouped(8).map { g =>
      val l = g.map(_._2); l.size * l.max - l.sum }.sum
    assert(totalPad <= randomPad, s"$totalPad vs unsorted $randomPad")
  }

  test("dynamicBatches: batchSize 1 never pads; guards fire") {
    val rows = (1L to 10L).map(id => (id, id * 3))
    val out = Curation.dynamicBatches(
        df(dbSchema, rows.map { case (i, l) => Row(i, l) }),
        "id", "len", batchSize = 1, numShards = 2, seed = 0)
      .collect()
    assert(out.forall(_.getLong(5) == 0L))
    assert(out.map(_.getLong(2)).sum == 10L)
    intercept[IllegalArgumentException](Curation.dynamicBatches(
      df(dbSchema, Nil), "id", "len", batchSize = 0))
  }

  test("spanCorrupt: ratio 0 is the identity; ratio 1 masks everything into one span") {
    val docs = df(scSchema, Seq(Row(1L, "a b c d")))
    val zero = Curation.spanCorrupt(docs, "text", "doc_id", 0, 100, 9).head()
    assert(zero.getString(1) == "a b c d" && zero.getString(2) == "" &&
      zero.getLong(4) == 0L)
    val full = Curation.spanCorrupt(docs, "text", "doc_id", 100, 100, 9).head()
    assert(full.getString(1) == "<extra_id_0>")
    assert(full.getString(2) == "<extra_id_0> a b c d")
    assert(full.getLong(4) == 4L)
    intercept[IllegalArgumentException](
      Curation.spanCorrupt(docs, "text", "doc_id", 2, 1, 9))
  }

  test("epochAllocation: caps saturate, leftover redistributes by headroom, crumbs reported") {
    // availability a=1000, b=100, c=500; weights 1/2, 1/4, 1/4 of 4000:
    // desired 2000/1000/1000, caps 4000/400/2000 -> b saturates (600
    // unspent), headrooms a=2000 c=1000 -> extra a=400 c=200
    val src = StructType(Seq(StructField("src", StringType),
      StructField("tok", LongType)))
    val rows = Seq(Row("a", 1000L), Row("b", 100L), Row("c", 500L),
      Row("zz", 9999L)) // non-weighted sources are ignored
    val out = Curation.epochAllocation(df(src, rows), "src", "tok",
        Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), budget = 4000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6))).toMap
    assert(out("a") == (1000L, 2000L, 4000L, 2400L, 2400L, false), s"got ${out("a")}")
    assert(out("b") == (100L, 1000L, 400L, 400L, 4000L, true))
    assert(out("c") == (500L, 1000L, 2000L, 1200L, 2400L, false))
    assert(!out.contains("zz"))
    // fully saturated corpus: budget dwarfs 4 epochs of everything —
    // every source pins at cap, nothing to redistribute
    val sat = Curation.epochAllocation(df(src, rows), "src", "tok",
        Map("a" -> 0.5, "b" -> 0.5), budget = 100000L)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getBoolean(6))).toMap
    assert(sat == Map("a" -> (4000L, true), "b" -> (400L, true)))
    // a weighted source absent from the data reports zero availability
    val missing = Curation.epochAllocation(df(src, rows.take(1)), "src", "tok",
        Map("a" -> 0.5, "nope" -> 0.5), budget = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(missing("nope") == 0L)
    intercept[IllegalArgumentException](Curation.epochAllocation(
      df(src, rows), "src", "tok", Map("a" -> 0.5), budget = 0L))
  }
}
