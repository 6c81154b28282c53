package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class BloomJoinSpec extends SparkSpec {

  private val factSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))
  private val dimSchema = StructType(Seq(
    StructField("dk", LongType), StructField("name", StringType)))

  private def fact = df(factSchema,
    (1L to 100L).map(i => Row(i, s"row$i")))
  private def dim = df(dimSchema, Seq(
    Row(3L, "three"), Row(7L, "seven"), Row(42L, "forty-two")))

  test("join: exact same rows as the plain join (FPs die in the verify join)") {
    val out = BloomJoin.join(fact, "k", dim, "dk")
      .select(col("k"), col("v"), col("name")).collect().toSet
    val plain = fact.join(dim, col("k") === col("dk"))
      .select(col("k"), col("v"), col("name")).collect().toSet
    assert(out == plain && out.size == 3, s"got ${out.size} rows")
  }

  test("join: left_semi keeps fact schema; null fact keys never match") {
    val withNull = df(factSchema, Seq(Row(3L, "three"), Row(null, "nully")))
    val out = BloomJoin.join(withNull, "k", dim, "dk", joinType = "left_semi")
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.collect().map(_.getString(1)).toSeq == Seq("three"))
  }

  test("join: empty build side short-circuits to empty without a fact-side error") {
    val empty = dim.filter(lit(false))
    assert(BloomJoin.join(fact, "k", empty, "dk").isEmpty)
  }

  test("buildFilter blob admits every build key; mightContain filters most others") {
    val blob = BloomJoin.buildFilter(dim, "dk")
    assert(blob != null && blob.length > 0)
    val tested = fact.withColumn("hit", BloomJoin.mightContain(blob, col("k")))
      .filter(col("hit")).collect().map(_.getLong(0)).toSet
    assert(Set(3L, 7L, 42L).subsetOf(tested), "no false negatives, ever")
    assert(tested.size < 20, s"97 non-members should mostly miss: ${tested.size}")
  }

  test("plan: the might-contain pre-filter sits below the join, above the fact scan") {
    // a LocalRelation fact would let Catalyst evaluate the filter at
    // optimization time — use a parquet-backed fact so the filter is a
    // real plan node above the scan
    val dir = java.nio.file.Files.createTempDirectory("bloomjoin").toString
    try {
      fact.write.mode("overwrite").parquet(s"$dir/fact")
      val pf = spark.read.parquet(s"$dir/fact")
      val plan = BloomJoin.join(pf, "k", dim, "dk")
        .queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), s"pre-filter missing:\n$plan")
      // the pre-filter must be on the probe side BELOW the join (the
      // join node prints first; the filter prints inside the probe
      // subtree), not a post-join residual
      val joinAt = plan.indexOf("Join")
      val filterAt = plan.indexOf("might_contain")
      assert(joinAt >= 0 && filterAt > joinAt,
        s"pre-filter should be in the probe subtree under the join:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
