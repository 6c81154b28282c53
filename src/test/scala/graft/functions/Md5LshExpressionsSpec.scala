package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Parity pins for the r19 native md5-LSH expressions against the
  * composed lambda forms they replaced (the oracle replays the
  * compositions — `DuckDB md5 == Spark md5` — so these must be
  * bit-identical, not merely equivalent). */
class Md5LshExpressionsSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def fixture: DataFrame = df(docSchema, Seq(
    Row(1L, "Alpha bravo CHARLIE delta echo foxtrot golf hotel"),
    Row(2L, "alpha\tbravo  charlie\ndelta alpha bravo charlie delta"), // repeats → distinct matters
    Row(3L, "two words"),
    Row(4L, "one"),
    Row(5L, ""),
    Row(6L, null),
    Row(7L, "ünïcode wörds ünïcode wörds mixed IN case"),
    Row(8L, (1 to 60).map(i => s"tok${i % 20}").mkString(" ")))) // dense repeats

  private def norm = graft.functions.TextFunctions.normalizeForFingerprint(col("text"))

  private def nativeShingles(n: Int) =
    ColumnBridge.column(DistinctShingles(ColumnBridge.expression(norm), n))

  private def composedShingles(n: Int) =
    array_distinct(graft.operators.Dedup.shingles(col("text"), n))

  test("distinct_shingles matches array_distinct(shingles(text, n)) exactly — incl. n=1 on empty text") {
    for (n <- Seq(1, 2, 3, 5, 100)) {
      val rows = fixture.select(col("doc_id"),
          nativeShingles(n).as("a"), composedShingles(n).as("b"))
        .collect()
      rows.foreach { r =>
        val a = Option(r.getAs[scala.collection.Seq[String]]("a")).map(_.toList)
        val b = Option(r.getAs[scala.collection.Seq[String]]("b")).map(_.toList)
        assert(a == b,
          s"distinct_shingles diverged at n=$n for doc ${r.getLong(0)}: $a vs $b")
      }
    }
  }

  test("md5_band_mins matches the per-band array_min(transform(md5(concat))) exactly") {
    for (numHashes <- Seq(1, 8, 13)) {
      val composed = array((0 until numHashes).map(i =>
        array_min(transform(col("_sh"),
          s => md5(concat(lit(s"$i:"), s).cast("binary"))))): _*)
      val rows = fixture
        .select(col("doc_id"), nativeShingles(3).as("_sh"))
        .filter(size(col("_sh")) > 0)
        .select(col("doc_id"),
          ColumnBridge.column(Md5BandMins(
            ColumnBridge.expression(col("_sh")), numHashes)).as("a"),
          composed.as("b"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[scala.collection.Seq[String]]("a").toList == r.getAs[scala.collection.Seq[String]]("b").toList,
          s"md5_band_mins diverged at numHashes=$numHashes for doc ${r.getLong(0)}")
      }
    }
  }

  test("set_overlap equals size(array_intersect) on distinct arrays; jaccard identity holds") {
    val pairs = fixture.select(nativeShingles(2).as("a")).filter(size(col("a")) > 0)
      .crossJoin(fixture.select(nativeShingles(2).as("b")).filter(size(col("b")) > 0))
    val rows = pairs.select(
        ColumnBridge.column(SetOverlap(
          ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")))).as("ov"),
        size(array_intersect(col("a"), col("b"))).as("ref_ov"),
        (ColumnBridge.column(SetOverlap(
          ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
          .cast("double") /
          (size(col("a")) + size(col("b")) - ColumnBridge.column(SetOverlap(
            ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")))))).as("j"),
        (size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b")))).as("ref_j"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"overlap ${r.getInt(0)} != ${r.getInt(1)}")
      assert(java.lang.Double.compare(r.getDouble(2), r.getDouble(3)) == 0,
        s"jaccard ${r.getDouble(2)} != ${r.getDouble(3)}")
    }
  }

  test("replayableMinhashPairs end-to-end: native path reproduces the composed pipeline's pairs") {
    // near-dup corpus: base docs + 2-token-mutated twins
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map { i =>
      i -> Seq.fill(25 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val twins = base.map { case (i, t) => (i + 1000L, t + " extra tail") }
    val d = df(docSchema, (base ++ twins).map { case (i, t) => Row(i, t) })
    val native = graft.operators.Dedup.replayableMinhashPairs(
      d, "text", "doc_id", n = 3, threshold = 0.5)
    // frozen pre-r19 composition
    val prep = d.select(col("doc_id").as("_id"), composedShingles(3).as("_sh"))
      .filter(size(col("_sh")) > 0)
    val numHashes = 8
    val bandHashes = array((0 until numHashes).map(i =>
      array_min(transform(col("_sh"),
        s => md5(concat(lit(s"$i:"), s).cast("binary"))))): _*)
    val banded = prep.select(col("_id").as("ia"), col("_sh").as("pa"),
      posexplode(bandHashes).as(Seq("_band", "_bucket")))
    val other = banded.select(col("ia").as("ib"), col("pa").as("pb"),
      col("_band"), col("_bucket"))
    val composed = banded.join(other, Seq("_band", "_bucket"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        (size(array_intersect(col("pa"), col("pb"))).cast("double") /
          size(array_union(col("pa"), col("pb")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .distinct()
    val a = native.orderBy("id_a", "id_b").collect().toSeq
    val b = composed.orderBy("id_a", "id_b").collect().toSeq
    assert(a.nonEmpty, "fixture must produce pairs")
    assert(a == b)
  }
}
