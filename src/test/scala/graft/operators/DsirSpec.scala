package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSIR importance resampling: hand-computed bucket log-ratios and doc
  * weights under the arithmetic bucketer, xxhash default-path
  * determinism, resample boundary exactness, empty-doc nulls,
  * partition-order invariance. */
class DsirSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // B = 8, arithmetic bucketer, addK = 0.5.
  // target "a b" → grams {a→1, b→2, "a b"→3}; raw docs:
  //   1 "a b"   → [1, 2, 3]
  //   2 "c c"   → [3, 3, 6]
  //   3 "a a b" → [1, 1, 2, 2, 3]
  // Nt = 3, Nr = 11; lrF_b = ⌊(ln((ct+.5)/(3+4)) − ln((cr+.5)/(11+4)))·1e8⌋:
  //   lrF = {1: −8515781, 2: −8515781, 3: −33647224, 6: −33647224,
  //          unseen: 76214005}
  private def targetDf = df(schema, Seq(Row(100L, "a b")))
  private def rawDf = df(schema,
    Seq(Row(1L, "a b"), Row(2L, "c c"), Row(3L, "a a b")))

  private def arith = Some(Dsir.arithBucket(8) _)

  private def weights = Dsir.importanceWeights(
    rawDf, "text", "doc_id",
    Dsir.importanceTable(rawDf, targetDf, "text", numBuckets = 8, bucket = arith),
    numBuckets = 8, bucket = arith)

  test("hand-computed bucket log-ratios and document weights") {
    val t = Dsir.importanceTable(rawDf, targetDf, "text", numBuckets = 8, bucket = arith)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t.size == 8, "every bucket present, hit or not")
    assert(t(1) == -8515781L && t(2) == -8515781L)
    assert(t(3) == -33647224L && t(6) == -33647224L)
    assert(Seq(0, 4, 5, 7).forall(b => t(b) == 76214005L), t.toString)

    val w = weights.collect().map(r => r.getLong(0) -> r).toMap
    assert(w(1L).getLong(1) == 3L && w(1L).getLong(2) == -50678786L)
    assert(w(1L).getDouble(3) == -0.5068)
    assert(w(2L).getLong(2) == -100941672L && w(2L).getDouble(3) == -1.0094)
    assert(w(3L).getLong(1) == 5L && w(3L).getLong(2) == -67710348L)
    assert(w(3L).getDouble(3) == -0.6771)
  }

  test("resampleTop keeps the exact ranked top-k with a boundary pair") {
    // fraction 2/3 of 3 docs → k = 2: docs 1 (−0.5068) and 3 (−0.6771)
    val kept = Dsir.resampleTop(weights, "doc_id", 2.0 / 3.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(kept == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("resample tie on weight resolves by ascending id at the boundary") {
    val wSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_ngrams", LongType),
      StructField("lw_fixed", LongType), StructField("log_weight", DoubleType)))
    val tied = df(wSchema, Seq(
      Row(1L, 1L, 100L, 0.0), Row(2L, 1L, 50L, 0.0),
      Row(3L, 1L, 50L, 0.0), Row(4L, 1L, 10L, 0.0)))
    // k = 2 → boundary pair (50, 2): doc 3 (same weight, higher id) is out
    val kept = Dsir.resampleTop(tied, "doc_id", 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(kept == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
  }

  test("documents with no tokens keep null weights and are never kept") {
    val corpus = df(schema, Seq(Row(1L, "a b"), Row(2L, ""), Row(3L, " \n\t ")))
    val t = Dsir.importanceTable(rawDf, targetDf, "text", numBuckets = 8, bucket = arith)
    val out = Dsir.resampleTop(
      Dsir.importanceWeights(corpus, "text", "doc_id", t, numBuckets = 8, bucket = arith),
      "doc_id", 1.0)
    val m = out.collect().map(r => r.getLong(0) -> r).toMap
    Seq(2L, 3L).foreach { id =>
      assert(m(id).getLong(1) == 0L && m(id).isNullAt(2) && m(id).isNullAt(3))
      assert(!m(id).getBoolean(4), s"unscored doc $id must not be kept")
    }
    assert(m(1L).getBoolean(4))
  }

  test("default xxhash bucketer: weights invariant to corpus partitioning") {
    val corpus = df(schema, (0L until 40L).map(i => Row(i, s"w${i % 7} x y w${i % 3}")))
    val t = Dsir.importanceTable(corpus, targetDf, "text", numBuckets = 64)
    def run(parts: Int) = Dsir.importanceWeights(
      corpus.repartition(parts), "text", "doc_id", t, numBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(run(1) == run(13))
  }

  test("resampleGumbel: seeded draw is deterministic; tiny temperature recovers top-k") {
    val wSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_ngrams", LongType),
      StructField("lw_fixed", LongType), StructField("log_weight", DoubleType)))
    // DISTINCT weights: with ties the cold draw ranks inside a tie group
    // by Gumbel key while resampleTop ranks by id — only the tie-free
    // ordering makes the two keep sets provably equal
    val w = df(wSchema, (1L to 40L).map(i =>
      Row(i, 1L, i * 10000000L - 200000000L, 0.0)) :+ Row(99L, 0L, null, null))
    def keptSet(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("kept")).collect().map(_.getLong(0)).toSet
    val a = keptSet(Dsir.resampleGumbel(w, "doc_id", 0.5, seed = 7L))
    val b = keptSet(Dsir.resampleGumbel(w, "doc_id", 0.5, seed = 7L))
    assert(a == b, "same seed must draw the same set")
    assert(a.size == 20, s"fraction 0.5 of 40 scored docs → 20 kept, got ${a.size}")
    assert(!a.contains(99L), "unscored docs are never kept")
    // T → 0: lw/T dominates any Gumbel draw → exactly the deterministic keep
    val cold = keptSet(Dsir.resampleGumbel(w, "doc_id", 0.5, temperature = 1e-9))
    val det = keptSet(Dsir.resampleTop(w, "doc_id", 0.5))
    assert(cold == det, "cold draw must equal resampleTop")
  }

  test("resampleGumbel: negative ids draw a valid key (pmod, not sign-of-dividend %)") {
    val wSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_ngrams", LongType),
      StructField("lw_fixed", LongType), StructField("log_weight", DoubleType)))
    // ids straddling 0 including Long.MinValue-adjacent: pmod keeps u in
    // (0,1) so -ln(-ln(u)) is finite; a sign-of-dividend % would go NaN
    val ids = Seq(-1L, -7L, -2147483649L, Long.MinValue + 1, 0L, 5L)
    val w = df(wSchema, ids.map(i => Row(i, 1L, 100000000L, 1.0)))
    val keys = Dsir.resampleGumbel(w, "doc_id", 1.0)
      .select(col("doc_id"), col("gumbel_fixed")).collect()
    assert(keys.length == ids.length)
    keys.foreach(r => assert(!r.isNullAt(1), s"id ${r.getLong(0)} drew a null key"))
    assert(Dsir.resampleGumbel(w, "doc_id", 1.0).filter(col("kept")).count() == ids.length)
    intercept[IllegalArgumentException](Dsir.resampleGumbel(w, "doc_id", 0.5, seed = -1L))
  }

  test("native polyBucket is value-identical to the HOF fold reference") {
    val rnd = new scala.util.Random(23)
    val words = (1 to 300).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString) ++
      Seq("a", "hello world", "Ab cD", "ümlaut tökens", "x" * 200)
    val d = df(StructType(Seq(StructField("g", StringType))), words.map(Row(_)))
    Seq(8, 256, 4096).foreach { b =>
      val cmp = d.select(Dsir.polyBucket(b)(col("g")).as("n"),
        Dsir.arithBucket(b)(col("g")).as("h")).collect()
      cmp.foreach(r => assert(r.getLong(0) == r.getLong(1), s"B=$b diverged"))
    }
  }

  test("arithmetic and xxhash bucketers agree on the bucket RANGE contract") {
    val grams = df(StructType(Seq(StructField("g", StringType))),
      Seq(Row("a"), Row("hello world"), Row("z9 q"), Row("Ab")))
    Seq(Dsir.arithBucket(16) _, Dsir.hashBucket(16) _).foreach { bk =>
      val vals = grams.select(bk(col("g")).as("b")).collect().map(_.getLong(0))
      assert(vals.forall(b => b >= 0 && b < 16), vals.toSeq.toString)
    }
  }
}
