package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Bit-parity of the native [[HyperplaneBucket]] expression against the
  * interpreted HOF reference formulation it replaced (VERDICT r9 #1) —
  * the bucket keys of an already-indexed corpus must not move when the
  * engine swaps in the fast path. */
class HyperplaneBucketSpec extends SparkSpec {

  private val fSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", ArrayType(FloatType))))
  private val dSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", ArrayType(DoubleType))))

  private def parity(d: org.apache.spark.sql.DataFrame, dim: Int, planes: Int, seed: Long): Unit = {
    val out = d.select(col("id"),
        VectorFunctions.hyperplaneBucket(col("v"), dim, planes, seed).as("native"),
        VectorFunctions.hyperplaneBucketHof(col("v"), dim, planes, seed).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"bucket mismatch for id ${r.getLong(0)}: native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }

  test("bit parity vs HOF reference: float vectors, several (planes, seed) configs") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 80L).map(i => Row(i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val d = df(fSchema, rows)
    parity(d, dim = 16, planes = 16, seed = 42L)
    parity(d, dim = 16, planes = 8, seed = 7L)
    parity(d, dim = 16, planes = 1, seed = 42L)
  }

  test("bit parity vs HOF reference: double vectors at the embedding shape") {
    val rnd = new scala.util.Random(12)
    val rows = (1L to 40L).map(i => Row(i, Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    parity(df(dSchema, rows), dim = 64, planes = 16, seed = 42L)
  }

  test("edge parity: short, long, null-element, empty, and non-finite vectors") {
    val rows = Seq(
      Row(1L, Seq(0.5f, -0.5f)),                      // shorter than dim → 0
      Row(2L, Seq.fill(10)(0.25f)),                    // longer than dim
      Row(3L, Seq(0.5f, null, 0.5f, 0.5f)),            // null element → 0
      Row(4L, Seq.empty[Float]),                       // empty → 0
      Row(5L, Seq(0.1f, 0.2f, 0.3f, 0.4f)),            // exact dim
      // non-finite elements (ADVICE r10): NaN poisons every projection
      // to NaN, which Spark SQL ordering ranks ABOVE zero — the native
      // path must set the bit exactly like the HOF's `when(proj >= 0)`
      Row(6L, Seq(Float.NaN, 0.2f, 0.3f, 0.4f)),
      Row(7L, Seq(Float.PositiveInfinity, 0.2f, 0.3f, 0.4f)),
      Row(8L, Seq(Float.NegativeInfinity, 0.2f, 0.3f, 0.4f)),
      Row(9L, Seq(Float.PositiveInfinity, Float.NegativeInfinity, 0.3f, 0.4f)))
    val d = df(fSchema, rows)
    parity(d, dim = 4, planes = 6, seed = 42L)
    val native = d.select(col("id"),
        VectorFunctions.hyperplaneBucket(col("v"), 4, 6).as("b"))
      .orderBy("id").collect()
    assert(native(0).getLong(1) == 0L)
    assert(native(2).getLong(1) == 0L)
    assert(native(3).getLong(1) == 0L)
    // all-NaN projections → every sign bit set
    assert(native(5).getLong(1) == (1L << 6) - 1)
  }

  test("buckets spread and near-identical vectors collide") {
    val rnd = new scala.util.Random(13)
    val base = (1L to 200L).map(i => (i, Seq.fill(32)(rnd.nextFloat() * 2 - 1)))
    val rows = base.map { case (i, v) => Row(i, v) } ++
      base.take(20).map { case (i, v) => Row(i + 1000, v.map(x => x * 1.0005f)) }
    val d = df(fSchema, rows)
      .withColumn("b", VectorFunctions.hyperplaneBucket(col("v"), 32, 16))
    val n = d.select(countDistinct(col("b"))).head().getLong(0)
    assert(n > 50, s"expected spread buckets, got $n distinct")
    // each scaled copy lands in its original's bucket (signs unchanged)
    val joined = d.filter(col("id") <= 20)
      .select(col("id").as("a"), col("b").as("ba"))
      .join(d.filter(col("id") > 1000).select((col("id") - 1000).as("a"), col("b").as("bb")), "a")
    assert(joined.filter(col("ba") =!= col("bb")).count() == 0)
  }
}
