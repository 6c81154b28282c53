package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", ArrayType(FloatType))))

  test("quantize: int8 storage type, bounded reconstruction error, high fidelity") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 50L).map(i => Row(i, Seq.fill(32)(rnd.nextFloat() * 4 - 2)))
    val d = df(schema, rows)
    val q = d.withColumn("_qs", VectorFunctions.quantize(col("v")))
    // storage type is actually tinyint (the 4× claim)
    val qType = q.schema("_qs").dataType.asInstanceOf[StructType]("q").dataType
    assert(qType == ArrayType(ByteType))
    val checked = q.select(col("id"), col("_qs.scale").as("scale"),
        VectorFunctions.cosine(col("v"), VectorFunctions.dequantize(col("_qs"))).as("fid"),
        aggregate(zip_with(col("v"), VectorFunctions.dequantize(col("_qs")),
          (a, b) => abs(a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"))
      .collect()
    checked.foreach { r =>
      val scale = r.getDouble(1)
      assert(r.getDouble(3) <= scale / 2 + 1e-6, s"err beyond scale/2 for id ${r.getLong(0)}")
      assert(r.getDouble(2) > 0.999, s"fidelity too low for id ${r.getLong(0)}")
    }
  }

  test("quantize: extremes hit ±127; zero vector round-trips to zeros") {
    val d = df(schema, Seq(
      Row(1L, Seq(2.0f, -2.0f, 0.0f)),
      Row(2L, Seq(0.0f, 0.0f, 0.0f))))
    val out = d.select(col("id"), col("v"),
        VectorFunctions.quantize(col("v")).as("qs"))
      .select(col("id"), col("qs.q").as("q"),
        VectorFunctions.dequantize(col("qs")).as("dq"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Byte](1) == Seq[Byte](127, -127, 0))
    assert(out(0).getSeq[Float](2) == Seq(2.0f, -2.0f, 0.0f))
    assert(out(1).getSeq[Byte](1) == Seq[Byte](0, 0, 0))
    assert(out(1).getSeq[Float](2) == Seq(0.0f, 0.0f, 0.0f))
  }

  // ---- native fused-loop vs HOF reference formulation parity ----
  // The native expressions must be BIT-identical to the zip_with/
  // aggregate folds they replaced (same element order, same double
  // arithmetic), including every null / length-mismatch / non-finite
  // edge — these results feed oracle-hashed queries, so ANY divergence
  // moves persisted hashes.

  private val pairSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("a", ArrayType(FloatType)),
    StructField("b", ArrayType(FloatType))))

  private def parityRows: Seq[Row] = {
    val rnd = new scala.util.Random(7)
    def vec(n: Int) = Seq.fill(n)(rnd.nextFloat() * 4 - 2)
    val random = (1L to 200L).map(i => Row(i, vec(64), vec(64)))
    val edges = Seq(
      Row(1001L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)),            // identical
      Row(1002L, Seq.empty[Float], Seq.empty[Float]),          // both empty
      Row(1003L, Seq(1.0f, 2.0f), Seq(1.0f)),                  // length mismatch
      Row(1004L, Seq(0.0f, 0.0f), Seq(1.0f)),                  // mismatch + zero norm
      Row(1005L, Seq(1.0f, null), Seq(1.0f, 2.0f)),            // null element left
      Row(1006L, Seq(1.0f, 2.0f), Seq(null, 2.0f)),            // null element right
      Row(1007L, Seq(Float.NaN, 1.0f), Seq(1.0f, 1.0f)),       // NaN
      Row(1008L, Seq(Float.PositiveInfinity, 1.0f), Seq(1.0f, 1.0f)), // +Inf
      Row(1009L, Seq(0.0f, 0.0f), Seq(0.0f, 0.0f)),            // both zero
      Row(1010L, Seq(-0.0f, 1.0f), Seq(0.0f, 1.0f)),           // signed zero
      Row(1011L, null, Seq(1.0f)),                             // null column
      Row(1012L, Seq(1.0f, 2.0f, 3.0f), Seq.empty[Float]))     // empty vs non-empty
    random ++ edges
  }

  test("native dot/cosine/l2Sq are bit-identical to the HOF reference formulations") {
    val d = df(pairSchema, parityRows)
    val a = col("a"); val b = col("b")
    val cmp = d.select(col("id"),
      VectorFunctions.dot(a, b).as("dn"), VectorFunctions.dotHof(a, b).as("dh"),
      VectorFunctions.cosine(a, b).as("cn"), VectorFunctions.cosineHof(a, b).as("ch"),
      VectorFunctions.l2Sq(a, b).as("ln"), VectorFunctions.l2SqHof(a, b).as("lh"))
      .collect()
    cmp.foreach { r =>
      for ((ni, hi, name) <- Seq((1, 2, "dot"), (3, 4, "cosine"), (5, 6, "l2Sq"))) {
        val n = if (r.isNullAt(ni)) None else Some(r.getDouble(ni))
        val h = if (r.isNullAt(hi)) None else Some(r.getDouble(hi))
        // bit-compare: NaN == NaN must pass, +0.0 vs -0.0 must fail
        val same = (n, h) match {
          case (None, None) => true
          case (Some(x), Some(y)) =>
            java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
          case _ => false
        }
        assert(same, s"$name diverged for id ${r.getLong(0)}: native=$n hof=$h")
      }
    }
  }

  test("native cosine stays inside whole-stage codegen (the point of the rewrite)") {
    val rnd = new scala.util.Random(11)
    val d = df(pairSchema,
      (1L to 10L).map(i => Row(i, Seq.fill(8)(rnd.nextFloat()), Seq.fill(8)(rnd.nextFloat()))))
    // repartition blocks ConvertToLocalRelation from folding the whole
    // projection into a LocalTableScan at plan time
    val out = d.repartition(2)
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"),
        VectorFunctions.l2Sq(col("a"), col("b")).as("l"))
    out.collect() // finalize the adaptive plan before inspecting it
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // `*(n)` prefixes a plan node INSIDE a WholeStageCodegen span in
    // toString form — the projection carrying the native expressions
    // must have one (a CodegenFallback expression would strip it)
    val proj = plan.linesIterator.find(_.contains("vec_cosine_native")).getOrElse("")
    assert(proj.contains("*("),
      "fused vector arithmetic must codegen:\n" + plan)
    // and the projection is NOT an interpreted fallback carrying a lambda
    assert(!plan.contains("lambdafunction"),
      "no HOF lambda may remain in the projection:\n" + plan)
  }

  test("randomProjectFp: matches a scalar reference; null/short vectors poison") {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val dim = 8; val outDim = 3; val seed = 7L
    // scalar reference: same LCG sign rule, same fixed-point floor
    def signOf(k: Int): Int =
      (java.lang.Math.floorMod(k.toLong * 1103515245L + seed, 2147483648L) % 6L) match {
        case 0L => 1; case 1L => -1; case _ => 0
      }
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 20L).map(i => i -> Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val rows = vecs.map { case (i, v) => Row(i, v) } ++
      Seq(Row(100L, Seq.fill(dim - 1)(0.5f)), // short -> null
        Row(101L, null))                      // null vec -> null
    val d = df(schema, rows)
    val out = d.select(col("id"), ColumnBridge.column(RandomProjectFp(
        ColumnBridge.expression(col("v")), dim, outDim, seed)).as("p"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out(100L) == null && out(101L) == null)
    for ((i, v) <- vecs) {
      val cents = v.map(x => math.floor(x.toDouble * 1e6).toLong)
      val exp = (0 until outDim).map(j =>
        (0 until dim).map(dd => signOf(j * dim + dd) * cents(dd)).sum)
      assert(out(i) == exp, s"vec $i: got ${out(i)}, want $exp")
    }
  }

  test("randomProjectFp: sign density ~1/3 and projections stay in codegen") {
    val s = RandomProjection.signs(42L, 64, 8)
    val nz = s.count(_ != 0)
    assert(nz > s.length / 5 && nz < s.length / 2,
      s"density 1/3 expected, got $nz/${s.length}")
    val rows = (1L to 5L).map(i => Row(i, Seq.fill(64)(0.25f)))
    import org.apache.spark.sql.graftshim.ColumnBridge
    // repartition: ConvertToLocalRelation would otherwise fold the whole
    // projection into a LocalTableScan and there'd be no plan to assert on
    val out = df(schema, rows).repartition(2)
      .select(ColumnBridge.column(RandomProjectFp(
        ColumnBridge.expression(col("v")), 64, 8, 42L)).as("p"))
    out.collect() // finalize the adaptive plan before inspecting it
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // `*(n)` prefixes a node inside a WholeStageCodegen span (the
    // vec_cosine_native test's evidence pattern)
    val proj = plan.linesIterator.find(_.contains("random_project_fp")).getOrElse("")
    assert(proj.contains("*("),
      "random_project_fp must stay inside codegen:\n" + plan)
  }
}
