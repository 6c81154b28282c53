package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** r19 optimization-round parity pins: the native CDC-chunking and
  * md5-LSH expressions must be BIT-IDENTICAL to the composed
  * split/window/groupBy and transform-lambda forms they replaced — the
  * oracle replays those compositions, so any divergence is a
  * correctness regression, not a performance trade. Each test
  * re-implements the ORIGINAL composition inline (frozen here as the
  * reference) and diffs the native operator's full output against it on
  * adversarial fixtures: tabs/CR/vertical-tab/form-feed separators,
  * multi-space runs, unicode (incl. a NBSP, which Java \\s does NOT
  * split on), leading/trailing whitespace, empty and null texts,
  * single-word and boundary-dense docs. */
class CdcExpressionsSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def fixture: DataFrame = df(docSchema, Seq(
    Row(1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    Row(2L, "alpha\tbravo\n charlie\r\n delta   echofoxtrot\fgolf"),
    Row(3L, "  leading and trailing  \t "),
    Row(4L, "single"),
    Row(5L, ""),
    Row(6L, null),
    Row(7L, "café naïve résumé 中文 words nbsp\u00A0glued kept"),
    Row(8L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    Row(9L, "repeat repeat repeat repeat repeat repeat repeat repeat"),
    Row(10L, (1 to 200).map(i => s"w$i").mkString(" "))))

  /** The pre-r19 composed contentDefinedChunks, verbatim. */
  private def composedChunks(d: DataFrame, boundaryHex: Int): DataFrame = {
    val boundaryCut = java.lang.Integer.toHexString(boundaryHex)
    val words = d
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("_pos", "_w")))
      .filter(length(col("_w")) > 0)
      .withColumn("_b", when(substring(md5(col("_w")), 1, 1) < boundaryCut, 1L)
        .otherwise(0L))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("_pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    words
      .withColumn("chunk_idx", coalesce(sum(col("_b")).over(win), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_w")))).as("_s"))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(col("_s._w"), " ").as("chunk_text"),
        size(col("_s")).cast("long").as("n_words"))
      .withColumn("chunk_md5", md5(col("chunk_text")))
  }

  private def sortedRows(d: DataFrame): Seq[Row] =
    d.orderBy(d.columns.map(col).toIndexedSeq: _*).collect().toSeq

  test("cdc_chunks matches the composed split/window/groupBy form exactly") {
    for (hex <- Seq(1, 2, 8, 15)) {
      val native = graft.operators.Dedup.contentDefinedChunks(
        fixture, "text", "doc_id", boundaryHex = hex)
      val composed = composedChunks(fixture, hex)
      assert(sortedRows(native) == sortedRows(composed),
        s"chunk parity broke at boundaryHex=$hex")
    }
  }

  test("cdc_chunk_mass matches the composed groupBy+totals-join form exactly") {
    val native = graft.operators.Dedup.chunkIndex(fixture, "text", "doc_id")
    val mass = composedChunks(fixture, 2)
      .groupBy(col("doc_id"), col("chunk_md5"))
      .agg(sum(col("n_words")).as("mass"))
    val composed = mass.join(
      mass.groupBy(col("doc_id")).agg(sum(col("mass")).as("doc_words")),
      Seq("doc_id"))
    assert(sortedRows(native.select("doc_id", "chunk_md5", "mass", "doc_words")) ==
      sortedRows(composed.select("doc_id", "chunk_md5", "mass", "doc_words")))
  }

  test("chunkContainmentPairs: struct-payload pairing matches the totals-join form") {
    // near-copies so pairs exist: doc 21 embeds doc 20's text
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val d = df(docSchema, Seq(
      Row(20L, base),
      Row(21L, "wrapper start " + base + " wrapper end padding words here"),
      Row(22L, base + " " + base), // repeated-chunk mass
      Row(23L, "unrelated totally different content words nothing shared at all")))
    val native = graft.operators.Dedup.chunkContainmentPairs(
      d, "text", "doc_id", thresholdFp = 100000L)
    // reference: composed chunks → (doc, digest) mass → pair-on-digest →
    // totals join (the pre-r19 formulation, verbatim semantics)
    val mass = composedChunks(d, 2)
      .groupBy(col("doc_id"), col("chunk_md5")).agg(sum(col("n_words")).as("_mass"))
    val l = mass.select(col("chunk_md5"), col("doc_id").as("ia"), col("_mass").as("pa"))
    val r = mass.select(col("chunk_md5"), col("doc_id").as("ib"), col("_mass").as("pb"))
    val shared = l.join(r, Seq("chunk_md5")).filter(col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        least(col("pa"), col("pb")).as("_sh"))
      .groupBy(col("id_a"), col("id_b")).agg(sum(col("_sh")).as("shared_words"))
    val totals = mass.groupBy(col("doc_id")).agg(sum(col("_mass")).as("_w"))
    val composed = shared
      .join(totals.select(col("doc_id").as("id_a"), col("_w").as("words_a")), Seq("id_a"))
      .join(totals.select(col("doc_id").as("id_b"), col("_w").as("words_b")), Seq("id_b"))
      .withColumn("containment_a_fp", expr("shared_words * 1000000L DIV words_a"))
      .withColumn("containment_b_fp", expr("shared_words * 1000000L DIV words_b"))
      .filter(greatest(col("containment_a_fp"), col("containment_b_fp")) >= 100000L)
      .select("id_a", "id_b", "shared_words", "words_a", "words_b",
        "containment_a_fp", "containment_b_fp")
    assert(native.count() > 0, "fixture must produce containment pairs")
    assert(sortedRows(native) == sortedRows(composed))
  }

  test("cdc_chunks generator sits inside a WholeStageCodegen span; plan has no Exchange") {
    // the point of the native expression: the chunk rows come off the
    // scan's codegen span with ZERO exchanges where the composed form
    // paid a window shuffle + a groupBy shuffle of every word
    val qe = graft.operators.Dedup.contentDefinedChunks(
      fixture, "text", "doc_id").queryExecution
    val gens = qe.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }
    }.flatten
    assert(gens.exists(_.generator.exists(_.isInstanceOf[CdcChunksExpr])),
      "cdc_chunks must generate inside WholeStageCodegen:\n" + qe.executedPlan)
    // key-free shuffle-freedom: ensureParallel may round-robin a
    // too-few-splits input (narrow, no sort), but the window's
    // hash-partition+sort and the groupBy's hash exchange must be gone
    val hashExchanges = qe.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    val sorts = qe.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(hashExchanges.isEmpty && sorts.isEmpty,
      "chunking must be keyed-shuffle-free and sort-free:\n" + qe.executedPlan)
  }
}
