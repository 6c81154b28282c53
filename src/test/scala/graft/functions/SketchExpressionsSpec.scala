package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** Native codegen expressions: interpreted eval ≡ codegen eval, and the
  * sketch math matches an independent Scala reimplementation. */
class SketchExpressionsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("toks", ArrayType(StringType))))

  private def minhashCol(c: org.apache.spark.sql.Column, n: Int) =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), n))
  private def simhashCol(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  /** Independent reference implementation (plain Scala, no shared code
    * with SketchOps beyond the hash constants contract). */
  private def refMinhash(toks: Seq[String], n: Int): Seq[Long] = {
    val (mult, add) = SketchOps.permConstants(n)
    val out = Array.fill(n)(Long.MaxValue)
    toks.foreach { t =>
      val h = SketchOps.hashToken(org.apache.spark.unsafe.types.UTF8String.fromString(t), 42L)
      (0 until n).foreach { j =>
        val v = h * mult(j) + add(j)
        if (v < out(j)) out(j) = v
      }
    }
    out.toSeq
  }

  test("MinHashSignature matches the reference implementation and xxhash64 seed") {
    val toks = Seq("alpha", "bravo", "charlie")
    val d = df(schema, Seq(Row(1L, toks)))
    val got = d.select(minhashCol(col("toks"), 16)).head().getSeq[Long](0)
    assert(got == refMinhash(toks, 16))
    // token hash parity with Spark's built-in xxhash64 (same seed 42)
    val builtin = d.select(explode(col("toks")).as("t")).select(xxhash64(col("t"))).collect()
      .map(_.getLong(0)).toSeq
    val ours = toks.map(t => SketchOps.hashToken(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), 42L))
    assert(builtin == ours)
  }

  test("MinHashSignature: empty array -> MaxValue sentinels; permutation property") {
    val d = df(schema, Seq(Row(1L, Seq.empty[String])))
    val got = d.select(minhashCol(col("toks"), 8)).head().getSeq[Long](0)
    assert(got == Seq.fill(8)(Long.MaxValue))
    // signature is a set function: order-insensitive, duplicate-insensitive
    val a = df(schema, Seq(Row(1L, Seq("x", "y", "z"))))
      .select(minhashCol(col("toks"), 32)).head().getSeq[Long](0)
    val b = df(schema, Seq(Row(1L, Seq("z", "x", "y", "x"))))
      .select(minhashCol(col("toks"), 32)).head().getSeq[Long](0)
    assert(a == b)
  }

  test("MinHash jaccard estimate concentrates near the true value") {
    val base = (1 to 100).map(i => s"tok$i")
    val other = (51 to 150).map(i => s"tok$i") // true jaccard = 50/150 = 1/3
    val d = df(schema, Seq(Row(1L, base), Row(2L, other)))
    val sigs = d.select(minhashCol(col("toks"), 256)).collect().map(_.getSeq[Long](0))
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }.toDouble / 256
    assert(math.abs(est - 1.0 / 3) < 0.12, s"est $est")
  }

  test("SimHash64: deterministic, equal for equal sets, near for near sets") {
    val toks = Seq("the", "quick", "brown", "fox")
    val d = df(schema, Seq(Row(1L, toks), Row(2L, toks), Row(3L, toks :+ "jumps")))
    val out = d.select(col("id"), simhashCol(col("toks")).as("s")).orderBy("id")
      .collect().map(_.getLong(1))
    assert(out(0) == out(1))
    val hamming = java.lang.Long.bitCount(out(0) ^ out(2))
    assert(hamming <= 16, s"hamming $hamming too large for 1-token change")
  }

  test("fused text sketches are bit-identical to the composed array forms") {
    // MinHashTextSignature hashes shingle BYTE SPANS of the normalized
    // text; they must equal hashing the materialized shingle strings —
    // and SimHashText must equal SimHash64 over the split tokens.
    val sSchema = StructType(Seq(StructField("t", StringType)))
    val docs = Seq("The quick   Brown fox JUMPS over the lazy dog",
      "  één  deux  trois quatre cinq  ", // multibyte + messy whitespace
      "single", "two words", "a b c d e f g")
    val d = df(sSchema, docs.map(Row(_)))
    val norm = graft.functions.TextFunctions.normalizeForFingerprint(col("t"))
    for (n <- Seq(1, 2, 3)) {
      val fused = d.select(graft.operators.Dedup.minhashSignatureText(col("t"), n, 32))
        .collect().map(_.getSeq[Long](0)).toSeq
      val composed = d.select(minhashCol(graft.operators.Dedup.shingles(col("t"), n), 32))
        .collect().map(_.getSeq[Long](0)).toSeq
      assert(fused == composed, s"shingleLen=$n")
    }
    val fusedSim = d.select(graft.operators.Dedup.simhash(col("t")))
      .collect().map(_.getLong(0)).toSeq
    val composedSim = d.select(simhashCol(split(norm, " ")))
      .collect().map(_.getLong(0)).toSeq
    assert(fusedSim == composedSim)
  }

  test("fused sketches on EMPTY docs: sentinels / zero, and empty docs still pair together") {
    // intentional divergence from the composed forms (which saw [""] from
    // split and hashed one empty token): no tokens → minhash sentinels,
    // simhash 0L. Both forms agree that empty docs collide ONLY with
    // each other — pin the new values so the divergence stays deliberate.
    val sSchema = StructType(Seq(StructField("t", StringType)))
    val d = df(sSchema, Seq(Row(""), Row("   "))) // both normalize to ""
    val mh = d.select(graft.operators.Dedup.minhashSignatureText(col("t"), 3, 8))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(mh.forall(_ == Seq.fill(8)(Long.MaxValue)))
    val sh = d.select(graft.operators.Dedup.simhash(col("t"))).collect().map(_.getLong(0)).toSeq
    assert(sh.forall(_ == 0L), sh.mkString(","))
  }

  test("SignatureAgreement counts equal positions") {
    val aSchema = StructType(Seq(
      StructField("a", ArrayType(LongType)), StructField("b", ArrayType(LongType))))
    val d = df(aSchema, Seq(Row(Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L))))
    val got = d.select(ColumnBridge.column(SignatureAgreement(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))).head().getInt(0)
    assert(got == 2)
  }

  test("expressions survive interpreted (no-codegen) mode with identical results") {
    val toks = Seq("interp", "check", "tokens")
    val d = df(schema, Seq(Row(1L, toks)))
    val codegenOn = d.select(minhashCol(col("toks"), 16), simhashCol(col("toks"))).head()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = d.select(minhashCol(col("toks"), 16), simhashCol(col("toks"))).head()
      assert(interp.getSeq[Long](0) == codegenOn.getSeq[Long](0))
      assert(interp.getLong(1) == codegenOn.getLong(1))
    }
  }

  private def withSQLConf[A](kvs: (String, String)*)(body: => A): A = {
    val conf = spark.conf
    val olds = kvs.map { case (k, _) => k -> conf.getOption(k) }
    kvs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("RollingHash: known algebraic value and codegen stability") {
    val d = df(StructType(Seq(StructField("s", StringType))), Seq(Row("ab")))
    val got = d.select(ColumnBridge.column(RollingHash(ColumnBridge.expression(col("s")))))
      .head().getLong(0)
    val expected = (RollingHash.Offset * RollingHash.Prime + 'a'.toLong) * RollingHash.Prime + 'b'.toLong
    assert(got == expected)
  }
}
