package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming re-expression of the reference's incremental polling loop.
  * The reference has no streaming — its closest analog is the
  * high-watermark batch poll (`read_since` + `max_timestamp`,
  * taskrabbit/forklift `lib/forklift/transports/mysql.rb:149-168`).
  * Structured Streaming subsumes it: file-source discovery replaces the
  * poll, watermarks replace the matcher column bookkeeping, and windowed
  * stateful aggregation adds what the reference cannot do at all
  * (SURVEY.md §2.9).
  */
object IncrementalStream {

  /** Stream a directory of parquet as micro-batches — the `read_since`
    * analog: each new file is a batch, ordered by discovery. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // batch_size analog
      .parquet(path)

  /** Watermarked tumbling-window aggregation over an event stream:
    * counts + sums per (window, event_type), late data beyond
    * `lateness` dropped — state is bounded, safe for unbounded runs. */
  def windowedEventAgg(events: DataFrame, tsCol: String = "ts",
                       window_ : String = "1 hour",
                       lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Run a streaming query into an in-memory sink and block until all
    * currently-available input is processed — the harness used by specs
    * (no always-on cluster in this environment). */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** The incremental-pipe-as-stream: append new rows of `src` into a
    * parquet sink with exactly-once file-sink semantics — the streaming
    * upgrade of `Patterns.incrementalPipe` (checkpoint = watermark). */
  def pipeStream(spark: SparkSession, srcPath: String, schema: StructType,
                 dstPath: String, checkpoint: String): StreamingQuery = {
    val q = readStream(spark, srcPath, schema)
      .writeStream
      .format("parquet")
      .option("path", dstPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
