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
}
