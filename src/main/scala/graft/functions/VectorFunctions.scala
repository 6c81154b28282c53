package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns. The binary forms
  * (dot / cosine / L2²) are native fused-loop expressions
  * ([[VectorArith]]) — the `zip_with`/`aggregate` HOF compositions they
  * replace are CodegenFallback (interpreted, boxed per element) and were
  * the dominant cost of candidate-pair verification; each HOF reference
  * formulation is kept `private[graft]` and parity spec-pinned.
  *
  * Elements are cast to double and accumulated in the same sequential
  * left-to-right order as the folds: scores stay reproducible across
  * partitionings and bit-identical to a DuckDB oracle doing the same
  * left fold.
  */
object VectorFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge

  private def binaryNative(a: Column, b: Column,
                           mk: (org.apache.spark.sql.catalyst.expressions.Expression,
                                org.apache.spark.sql.catalyst.expressions.Expression)
                             => org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(mk(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Σ aᵢ·bᵢ, bit-identical to the sequential left fold the HOF
    * formulation ([[dotHof]]) computes — but as ONE fused codegen'd loop
    * per row ([[VectorArith]]): the HOF form is CodegenFallback and was
    * the dominant cost of every candidate-pair verify. Parity (null /
    * length-mismatch / NaN semantics included) is spec-pinned. */
  def dot(a: Column, b: Column): Column = binaryNative(a, b, DotProduct.apply)

  /** The HOF reference formulation of [[dot]], kept for the parity spec. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity; 0.0 when either norm is 0 (never NaN/null on
    * well-formed input). Native fused loop — see [[dot]]; the HOF
    * reference formulation is [[cosineHof]], parity spec-pinned. */
  def cosine(a: Column, b: Column): Column = binaryNative(a, b, CosineSimilarity.apply)

  private[graft] def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Squared euclidean distance. Native fused loop — see [[dot]]; HOF
    * reference formulation [[l2SqHof]], parity spec-pinned. */
  def l2Sq(a: Column, b: Column): Column = binaryNative(a, b, L2SqDistance.apply)

  private[graft] def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dd = x.cast("double") - y.cast("double"); dd * dd
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Symmetric int8 quantization for embedding storage: scale =
    * max|xᵢ| / 127 (1.0 for the all-zero vector), qᵢ = floor(xᵢ/scale
    * + 0.5) ∈ [-127, 127] stored as tinyint — 4× smaller than float32,
    * the difference between 25 TB and 6 TB of vectors at corpus scale.
    * Rounding is floor(x + 0.5) (half-up), NOT banker's rounding:
    * identical elementary arithmetic in any engine, which is what lets
    * `q_quantize` hash-match a DuckDB oracle. Returns
    * struct(scale: double, q: array<tinyint>). */
  def quantize(a: Column): Column = {
    val amax = aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))
    val scale = when(amax === 0.0, lit(1.0)).otherwise(amax / 127.0)
    // the scale rides in as a repeated array and the lambda divides by
    // its ELEMENT — referencing `scale` inside the lambda body instead
    // would re-evaluate the O(d) max-fold once per element (HOF lambdas
    // are interpreted, no subexpression elimination): O(d²) per row
    struct(scale.as("scale"),
      zip_with(a, array_repeat(scale, size(a)),
        (x, s) => floor(x.cast("double") / s + 0.5).cast("tinyint")).as("q"))
  }

  /** Reconstruct float32 vectors from [[quantize]] output; per-element
    * error is bounded by scale/2. */
  def dequantize(qs: Column): Column =
    transform(qs.getField("q"),
      x => (x.cast("double") * qs.getField("scale")).cast("float"))

  /** Sign bits against `planes` random hyperplanes → a bucket id in
    * [0, 2^planes): the random-hyperplane LSH key for cosine similarity.
    * `seed` derives deterministic pseudo-random plane coefficients from
    * `xxhash64(seed, planeIdx, dimIdx)` so the key needs no broadcast
    * side data and is reproducible across the cluster.
    *
    * Native codegen'd expression ([[HyperplaneBucket]]) — the HOF
    * composition it replaces ([[hyperplaneBucketHof]]) was
    * CodegenFallback and ran ~planes × dim interpreted hash evals per
    * row, the embedding-dedup hot-path killer. Bit-identical output
    * (spec-pinned). */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int, seed: Long = 42L): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(vec), dim, planes, seed))
  }

  /** REFERENCE FORMULATION of [[hyperplaneBucket]] — the interpreted
    * `aggregate(zip_with(...))` composition, kept solely as the parity
    * oracle for the native expression's spec. Do not use in pipelines:
    * HOF lambdas are CodegenFallback and this form re-derives every
    * coefficient per row. */
  private[graft] def hyperplaneBucketHof(vec: Column, dim: Int, planes: Int,
                                         seed: Long = 42L): Column = {
    val bits = (0 until planes).map { p =>
      // plane coefficient for (p, i): deterministic hash → [-1, 1)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (x, i) => {
          val h = xxhash64(lit(seed), lit(p), i)
          val coef = (h.cast("double") / lit(Long.MaxValue.toDouble)) // [-1,1)
          x.cast("double") * coef
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }
}
