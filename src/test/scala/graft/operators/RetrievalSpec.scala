package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class RetrievalSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def corpus = df(schema, Seq(
    Row(1L, "spark fast fast"),
    Row(2L, "slow table"),
    Row(3L, "Spark  spark TABLE"), // normalization: case + whitespace
    Row(4L, ""),
    Row(5L, null)))

  /** The operator's exact driver-side arithmetic, repeated here so the
    * spec pins the FORMULA (Lucene BM25 + 1e-8 fixed-point), not just
    * internal consistency of one implementation. */
  private def expectedFp(n: Long, sumdl: Long, tfDlDf: Seq[(Int, Int, Long)],
                         k1: Double = 1.2, b: Double = 0.75): Long = {
    val avgdl = sumdl.toDouble / n.toDouble
    tfDlDf.map { case (tf, dl, dfT) =>
      val idf = math.log(1.0 + ((n - dfT).toDouble + 0.5) / (dfT.toDouble + 0.5))
      val score = idf * (tf.toDouble * (k1 + 1.0)) /
        (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))
      math.floor(score * 1e8).toLong
    }.sum
  }

  test("bm25Scores: hand-checked fixed-point scores, matched counts, null/empty = 0") {
    val out = Retrieval.bm25Scores(corpus, "text", "doc_id", Seq("spark", "table"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // N=5, dl = 3,2,3,0,0 -> sumdl=8; df(spark)=2, df(table)=2
    assert(out(1L) == (expectedFp(5, 8, Seq((1, 3, 2))), 1L))
    assert(out(2L) == (expectedFp(5, 8, Seq((1, 2, 2))), 1L))
    assert(out(3L) == (expectedFp(5, 8, Seq((2, 3, 2), (1, 3, 2))), 2L))
    assert(out(4L) == (0L, 0L), "empty doc scores zero, stays in the output")
    assert(out(5L) == (0L, 0L), "null text scores like an empty doc")
    assert(out(3L)._1 > out(1L)._1 && out(1L)._1 > 0,
      "two matched terms must outscore one")
  }

  test("bm25Scores: longer docs score below shorter ones at equal tf (length norm)") {
    val d = df(schema, Seq(
      Row(1L, "spark a b c d e f g h i j k l m n o p"),
      Row(2L, "spark a b")))
    val out = Retrieval.bm25Scores(d, "text", "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) > out(1L), s"short doc must win: $out")
  }

  test("bm25TopK: ordered by score desc then id, k-bounded, deterministic") {
    val top = Retrieval.bm25TopK(corpus, "text", "doc_id", Seq("spark", "table"), k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top.head == 3L, "doc 3 matches both terms")
    assert(top.size == 3)
    // ties at score 0 (docs 4, 5) break by ascending id — run with k
    // large enough to cross the tie boundary
    val all = Retrieval.bm25TopK(corpus, "text", "doc_id", Seq("spark", "table"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(all.takeRight(2) == Seq(4L, 5L), s"zero-score ties by id: $all")
    assert(Retrieval.bm25TopK(corpus, "text", "doc_id", Seq("spark", "table"), k = 3)
      .collect().map(_.getLong(0)).toSeq == top)
  }

  test("bm25Scores rejects empty and duplicate term lists; topK rejects k<=0") {
    intercept[IllegalArgumentException](
      Retrieval.bm25Scores(corpus, "text", "doc_id", Seq.empty))
    intercept[IllegalArgumentException](
      Retrieval.bm25Scores(corpus, "text", "doc_id", Seq("spark", "spark")))
    intercept[IllegalArgumentException](
      Retrieval.bm25TopK(corpus, "text", "doc_id", Seq("spark"), k = 0))
  }

  private val rankedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("rank", IntegerType)))

  test("rankTopK: 1-based ranks by score desc then id; ascending flag for distances") {
    val scored = df(StructType(Seq(
      StructField("doc_id", LongType), StructField("s", LongType))),
      Seq(Row(1L, 10L), Row(2L, 30L), Row(3L, 30L), Row(4L, 5L)))
    val r = Retrieval.rankTopK(scored, "doc_id", "s", k = 3)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(2L -> 1, 3L -> 2, 1L -> 3), s"tie 2/3 by id: $r")
    val asc = Retrieval.rankTopK(scored, "doc_id", "s", k = 2, ascending = true)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(asc == Map(4L -> 1, 1L -> 2))
  }

  test("rrfFuse: integer RRF sums, absent-list zero, lists_hit, tie by id") {
    val a = df(rankedSchema, Seq(Row(1L, 1), Row(2L, 2), Row(3L, 3)))
    val b = df(rankedSchema, Seq(Row(2L, 1), Row(4L, 2)))
    val out = Retrieval.rrfFuse(Seq(a, b), "doc_id", topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def c(r: Int) = 1000000000000L / (60L + r)
    // doc2: both lists (ranks 2,1) wins; doc1: rank1 only; doc4: rank2 of b; doc3: rank3
    assert(out.toSeq == Seq(
      (2L, c(2) + c(1), 2L), (1L, c(1), 1L), (4L, c(2), 1L), (3L, c(3), 1L)), out.mkString(","))
    // identical rank sets tie -> ascending id decides
    val t1 = df(rankedSchema, Seq(Row(7L, 1), Row(5L, 2)))
    val t2 = df(rankedSchema, Seq(Row(5L, 1), Row(7L, 2)))
    val tie = Retrieval.rrfFuse(Seq(t1, t2), "doc_id", topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(tie == Seq(5L, 7L), s"equal scores break by id: $tie")
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(a), "doc_id", 2))
    intercept[IllegalArgumentException](
      Retrieval.rrfFuse(Seq(a, b.drop("rank")), "doc_id", 2))
  }

  test("bm25 scoring pass is shuffle-free; topK plans as TakeOrdered, not a sort") {
    val plan = Retrieval.bm25TopK(corpus, "text", "doc_id", Seq("spark"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"),
      s"scoring must be a scan-side projection (stats ride in as literals):\n$plan")
    // r11 advice: the text is tokenized ONCE — the scoring pass reads
    // the checkpointed (id, dl, tf…) projection, never the corpus again
    assert(plan.contains("ExistingRDD"),
      s"scoring must read the materialized tokenized projection:\n$plan")
  }

  /** The operator's smoothed-idf arithmetic (sklearn form), repeated so
    * the spec pins the formula, not one implementation's consistency. */
  private def tfidfFp(tf: Long, n: Long, dfT: Long): Long =
    math.floor(tf.toDouble *
      (math.log((1.0 + n.toDouble) / (1.0 + dfT.toDouble)) + 1.0) * 1e8).toLong

  test("tfidfTopK: hand-checked scores, minDf drops hapaxes, ranks tie by token") {
    val d = df(schema, Seq(
      Row(1L, "alpha alpha beta rare"),
      Row(2L, "alpha beta"),
      Row(3L, "beta  BETA gamma"), // normalization: case + whitespace
      Row(4L, "gamma"),
      Row(5L, null)))
    // N=5; df: alpha=2, beta=3, gamma=2, rare=1 (dropped at minDf=2)
    val out = Retrieval.tfidfTopK(d, "text", "doc_id", k = 3, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3))).toMap
    assert(!out.values.exists(_._1 == "rare"), "hapax must be dropped by minDf")
    assert(out((1L, 1)) == ("alpha", tfidfFp(2, 5, 2)), s"doc1 rank1: $out")
    assert(out((1L, 2)) == ("beta", tfidfFp(1, 5, 3)))
    assert(out((3L, 1)) == ("beta", tfidfFp(2, 5, 3)), "normalized tf=2")
    assert(out((3L, 2)) == ("gamma", tfidfFp(1, 5, 2)))
    // doc2: alpha and beta both tf=1 — alpha (rarer) outscores beta; if
    // scores were EQUAL the token-asc tie-break would give the same order
    assert(out((2L, 1))._1 == "alpha" && out((2L, 2))._1 == "beta")
    assert(!out.contains((5L, 1)), "null text emits no keywords")
    // doc1's third term (rare) was dropped: the list is 2 long, not k=3
    assert(out.keys.filter(_._1 == 1L).map(_._2).toSeq.sorted == Seq(1, 2))
  }

  test("tfidfTopK: k bounds each list; equal-score ties order by token asc") {
    val d = df(schema, Seq(
      Row(1L, "zz aa mm"), // all tf=1, all df=2 -> equal scores
      Row(2L, "zz aa mm")))
    val out = Retrieval.tfidfTopK(d, "text", "doc_id", k = 2, minDf = 2)
      .filter(col("doc_id") === 1L).orderBy(col("rank"))
      .collect().map(_.getString(2)).toSeq
    assert(out == Seq("aa", "mm"), s"tie by token asc, k=2 bounds: $out")
    intercept[IllegalArgumentException](Retrieval.tfidfTopK(d, "text", "doc_id", 0))
    intercept[IllegalArgumentException](Retrieval.tfidfTopK(d, "text", "doc_id", 1, minDf = 0))
  }

  test("pmiCollocations: hand-checked log-domain PMI, minCount filter, short docs inert") {
    val d = df(schema, Seq(
      Row(1L, "big data big data big data"),
      Row(2L, "big data stack"),
      Row(3L, "solo"),
      Row(4L, ""),
      Row(5L, null)))
    // tokens: big x4, data x4, stack x1, solo x1 -> N=10
    // adjacent pairs: (big,data) x4, (data,big) x2, (data,stack) x1
    val out = Retrieval.pmiCollocations(d, "text", k = 10, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(("big", "data"), ("data", "big")),
      s"minCount=2 keeps only the repeated pairs: ${out.keySet}")
    def pmi(cxy: Long, cx: Long, cy: Long, n: Long): Long =
      math.floor((math.log(n.toDouble) + math.log(cxy.toDouble)
        - math.log(cx.toDouble) - math.log(cy.toDouble)) * 1e8).toLong
    assert(out(("big", "data")) == (4L, pmi(4, 4, 4, 10)))
    assert(out(("data", "big")) == (2L, pmi(2, 4, 4, 10)))
    // ordering: higher pmi first
    val ordered = Retrieval.pmiCollocations(d, "text", k = 10, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(ordered == Seq(("big", "data"), ("data", "big")))
  }

  test("pmiCollocations: k truncates; one-token and empty docs produce no pairs") {
    val d = df(schema, Seq(
      Row(1L, "a b a b a b"),
      Row(2L, "c d c d c d"),
      Row(3L, "x"), Row(4L, "")))
    val out = Retrieval.pmiCollocations(d, "text", k = 1, minCount = 2).collect()
    assert(out.length == 1, "k=1 truncates the collocation list")
    intercept[IllegalArgumentException](Retrieval.pmiCollocations(d, "text", 0))
  }

  test("inverted index: probe scores bit-equal the scan path on matched docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_spec_").toString + "/idx"
    Retrieval.buildInvertedIndex(corpus, "text", "doc_id", dir, buckets = 8)
    val viaIndex = Retrieval.bm25TopKIndexed(spark, dir,
        Seq("spark", "table"), k = 10, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaScan = Retrieval.bm25TopK(corpus, "text", "doc_id",
        Seq("spark", "table"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 > 0).toSeq // the index never visits unmatched docs
    assert(viaIndex == viaScan, s"index $viaIndex vs scan $viaScan")
    assert(viaIndex.map(_._1).toSet == Set(1L, 2L, 3L), "docs 4/5 match nothing")
  }

  test("inverted index probe: partition filter prunes to the probe terms' buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inv_spec2_").toString + "/idx"
    Retrieval.buildInvertedIndex(corpus, "text", "doc_id", dir, buckets = 8)
    val probe = Retrieval.bm25TopKIndexed(spark, dir, Seq("spark"), k = 5, buckets = 8)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      "the posting scan must carry a bucket partition filter:\n" + plan)
    // an unknown term probes cleanly (idf of df=0; zero candidates)
    assert(Retrieval.bm25TopKIndexed(spark, dir, Seq("zzz_absent"), k = 5,
      buckets = 8).count() == 0L)
    intercept[IllegalArgumentException](
      Retrieval.bm25TopKIndexed(spark, dir, Seq.empty, k = 5))
  }

  test("skipGramPairs: symmetric windowed pairs, boundaries clipped, minCount gates") {
    val sch = StructType(Seq(StructField("text", StringType)))
    // "a b c d": window 2 → ordered pairs ab, bc, cd, ac, bd (then mirrored)
    val out = Retrieval.skipGramPairs(df(sch, Seq(Row("a b c d"))),
      "text", window = 2, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c", "b" -> "d")
    expected.foreach { case (x, y) =>
      assert(out((x, y)) == 1L && out((y, x)) == 1L, s"pair $x,$y")
    }
    assert(out.size == 10, s"got ${out.keySet}")
    assert(!out.contains(("a", "d")), "window 2 must not reach offset 3")
    // symmetric counts always equal; minCount gates the tail
    val rep = Retrieval.skipGramPairs(
      df(sch, Seq(Row("x y x y x"), Row("z q"))), "text", window = 1, minCount = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep == Map(("x", "y") -> 4L, ("y", "x") -> 4L), s"got $rep")
    // short/empty docs contribute nothing and never error
    assert(Retrieval.skipGramPairs(df(sch, Seq(Row("solo"), Row(""), Row(null))),
      "text", window = 3, minCount = 1).count() == 0L)
    intercept[IllegalArgumentException](
      Retrieval.skipGramPairs(df(sch, Seq(Row("a"))), "text", window = 0))
  }

  test("bm25HardNegativesIndexed: per query == single-query index path minus positives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hn_spec_").toString + "/idx"
    Retrieval.buildInvertedIndex(corpus, "text", "doc_id", dir, buckets = 8)
    val relSchema = StructType(Seq(
      StructField("q_id", LongType), StructField("doc_id", LongType)))
    // q1 holds doc 3 relevant; q2 holds nothing relevant
    val rel = df(relSchema, Seq(Row(10L, 3L)))
    val qs = Seq(10L -> Seq("spark", "table"), 20L -> Seq("table"))
    val got = Retrieval.bm25HardNegativesIndexed(spark, dir, qs, rel,
        k = 5, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    // independent expectation: the pinned single-query path, positives removed
    def single(terms: Seq[String], drop: Set[Long]) =
      Retrieval.bm25TopKIndexed(spark, dir, terms, k = 5, buckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filterNot { case (id, _) => drop(id) }.toSet
    assert(got(10L) == single(Seq("spark", "table"), Set(3L)),
      s"q10: ${got(10L)}")
    assert(got(20L) == single(Seq("table"), Set.empty),
      "empty relevance set: hard negatives are just the top-k")
    assert(!got(10L).exists(_._1 == 3L), "known positive never surfaces")
    intercept[IllegalArgumentException](
      Retrieval.bm25HardNegativesIndexed(spark, dir, Seq(1L -> Seq.empty), rel, k = 5))
  }
}
