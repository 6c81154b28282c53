package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning data assembly: render multi-turn
  * conversations into a single training string per conversation with
  * EXACT per-turn character offsets — the loss-mask boundary data an
  * SFT trainer needs (compute loss on assistant turns only, mask
  * everything else). The reference pipeline shape: (conversation,
  * turn, role, content) rows → one rendered text per conversation +
  * one offset row per turn.
  *
  * Rendering is the minimal delimiter template
  * `<|role|>content<|end|>` concatenated in turn order — swap the
  * literals for a model's own template via the parameters; offsets
  * adjust automatically because they derive from rendered lengths.
  *
  * Exactness: offsets are running sums of `length(rendered_turn)` over
  * the conversation-partitioned turn order — integer, replayable;
  * `length` counts CODE POINTS in both Spark and DuckDB (not UTF-8
  * bytes), so offsets agree on non-ASCII content too. Windows
  * partition by conversation (turn-count-bounded, never corpus-wide).
  *
  * Output: one row per turn — (convCol, turnCol, role, start, end,
  * loss, text) where [start, end) spans the rendered turn inside the
  * conversation string, `loss` = (role == lossRole), and `text` is the
  * full rendered conversation (repeated per turn so a trainer can
  * consume rows independently; project it away if joining elsewhere).
  */
object Sft {

  def renderConversations(df: DataFrame, convCol: String, turnCol: String,
                          roleCol: String, contentCol: String,
                          lossRole: String = "assistant",
                          open: String = "<|", close: String = "|>",
                          end: String = "<|end|>"): DataFrame = {
    val rendered = concat(lit(open), col(roleCol), lit(close),
      coalesce(col(contentCol), lit("")), lit(end))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(convCol)).orderBy(col(turnCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(convCol))
      .orderBy(col(turnCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.select(col(convCol), col(turnCol), col(roleCol).as("role"),
        rendered.as("_r"))
      .withColumn("_len", length(col("_r")).cast("long"))
      .withColumn("end", sum(col("_len")).over(w))
      .withColumn("start", col("end") - col("_len"))
      .withColumn("loss", col("role") === lit(lossRole))
      .withColumn("text", concat_ws("", collect_list(col("_r")).over(wAll)))
      .select(col(convCol), col(turnCol), col("role"), col("start"),
        col("end"), col("loss"), col("text"))
  }
}
