package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Headline set = the queries
  * that exercise the scale-critical paths: scan+agg, multi-join,
  * windows, dedup (exact + MinHash), ANN, sessionization. */
object Bench {
  val headline: Seq[String] = Seq(
    "q_agg_pricing", "q_join_nation_revenue", "q_window_topk",
    "q_running_sum", "q_sessionize", "q_events_window",
    "q_dedup_exact", "q_dedup_minhash", "q_ann_cosine", "q_upsert",
    // full-rewrite vs partition-scoped incremental merge, side by side —
    // the partitioned entry's cost tracks the delta, not the table
    "q_incremental_pipe", "q_incremental_part",
    // text quality + language ID — the first-pass full-corpus operators;
    // benched since r4 so the native-profile codegen path stays measured
    "q_quality", "q_langid",
    // the other two LSH families (capped join-free bucket pairing)
    "q_dedup_simhash", "q_embedding_neardup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen once on the smallest SF so headline numbers
    // measure the engine, not first-call JIT + classloading.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
