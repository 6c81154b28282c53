package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class LayoutSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("x", LongType), StructField("y", LongType)))

  test("interleaveBits: hand-computed Morton codes") {
    val d = df(schema, Seq(Row(3L, 1L), Row(0L, 0L), Row(2L, 2L)))
    val got = d.select(Layout.interleaveBits(Seq(col("x"), col("y")), bits = 2))
      .collect().map(_.getLong(0)).toSeq
    // x bits land at odd positions, y at even: (3,1)->0b1011=11, (2,2)->0b1100=12
    assert(got == Seq(11L, 0L, 12L))
  }

  test("zorderKey normalizes ranges and constant columns") {
    val d = df(schema, Seq(Row(0L, 7L), Row(100L, 7L)))
    val got = d.select(Layout.zorderKey(
      Seq((col("x"), (0.0, 100.0)), (col("y"), (7.0, 7.0))), bits = 4))
      .collect().map(_.getLong(0)).toSeq
    // y constant -> rank 0 everywhere; x=0 -> 0, x=100 -> 15 interleaved
    assert(got.head == 0L)
    assert(got(1) == Seq(0, 1, 2, 3).map(b => 1L << (2 * b + 1)).sum)
  }

  test("zorder write clusters both dimensions: a 2-D box touches few files; round trip lossless") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4096).map(_ => Row(rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
    val d = df(schema, rows)
    val zDir = tmpDir("zorder")
    val plainDir = tmpDir("plain")
    Layout.zorderWrite(d, zDir, Seq("x", "y"), numFiles = 16)
    d.repartition(16).write.mode("overwrite").parquet(plainDir)

    def filesTouched(path: String): Long =
      spark.read.parquet(path).filter(col("x") < 8 && col("y") < 8)
        .select(input_file_name()).distinct().count()
    val (zf, pf) = (filesTouched(zDir), filesTouched(plainDir))
    assert(zf * 4 <= pf, s"zorder touched $zf files vs $pf unclustered — expected >=4x locality")

    // losslessness: same multiset of rows back
    val back = spark.read.parquet(zDir)
    assert(back.count() == 4096)
    assert(back.agg(sum(col("x") * 64 + col("y"))).head().getLong(0) ==
      d.agg(sum(col("x") * 64 + col("y"))).head().getLong(0))
  }

  test("compactSmallFiles: many tiny files collapse to the byte target, rows intact") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("graft_compact_") + "/t.parquet"
    val spark2 = spark
    import spark2.implicits._
    // 40 separate appends → ≥40 small part files
    (1 to 40).foreach { i =>
      Seq.tabulate(50)(j => (i.toLong * 1000 + j, s"row_${i}_$j"))
        .toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    }
    def files() = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
      .toSeq
    val before = files().size
    assert(before >= 40)
    val sumBefore = spark.read.parquet(dir).agg(sum("id")).head().getLong(0)
    // huge target → everything folds into ONE file
    val (nb, na) = Layout.compactSmallFiles(spark, dir, targetFileBytes = 1L << 30)
    assert(nb == before && na == 1)
    assert(files().size == 1, s"got ${files()}")
    val after = spark.read.parquet(dir)
    assert(after.count() == 2000)
    assert(after.agg(sum("id")).head().getLong(0) == sumBefore)
    // plan sanity: the compaction itself must be coalesce, not a shuffle
    val plan = spark.read.parquet(dir).coalesce(1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "compaction read must be shuffle-free:\n" + plan)
    intercept[IllegalArgumentException](
      Layout.compactSmallFiles(spark, dir, targetFileBytes = 0L))
  }
}
