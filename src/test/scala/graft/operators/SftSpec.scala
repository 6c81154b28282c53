package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** SFT conversation rendering: offsets slice the rendered text exactly,
  * loss flags mark the training turns. */
class SftSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("conv", LongType), StructField("turn", LongType),
    StructField("role", StringType), StructField("content", StringType)))

  test("renderConversations: [start,end) slices reproduce each rendered turn") {
    val rows = Seq(
      Row(1L, 0L, "user", "hi"), Row(1L, 1L, "assistant", "hello there"),
      Row(1L, 2L, "user", "bye"),
      Row(2L, 0L, "system", "be brief"), Row(2L, 1L, "assistant", null))
    val out = Sft.renderConversations(df(schema, rows), "conv", "turn",
        "role", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    def rendered(role: String, content: String) = s"<|$role|>$content<|end|>"
    // conversation text = ordered concat, identical on every row
    val t1 = rendered("user", "hi") + rendered("assistant", "hello there") +
      rendered("user", "bye")
    (0L to 2L).foreach(t => assert(out((1L, t)).getString(6) == t1))
    // each turn's [start, end) slice is its rendered form
    Seq((1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello there"),
      (1L, 2L, "user", "bye")).foreach { case (c, t, role, content) =>
      val r = out((c, t))
      val slice = r.getString(6).substring(r.getLong(3).toInt, r.getLong(4).toInt)
      assert(slice == rendered(role, content), s"turn $t: '$slice'")
    }
    // loss marks assistant turns only
    assert(!out((1L, 0L)).getBoolean(5) && out((1L, 1L)).getBoolean(5))
    assert(!out((2L, 0L)).getBoolean(5) && out((2L, 1L)).getBoolean(5))
    // null content renders empty but still spans its delimiters
    val r21 = out((2L, 1L))
    assert(r21.getString(6).substring(r21.getLong(3).toInt, r21.getLong(4).toInt) ==
      "<|assistant|><|end|>")
  }

  test("renderConversations: custom template literals shift the offsets coherently") {
    val rows = Seq(Row(1L, 0L, "user", "q"), Row(1L, 1L, "assistant", "a"))
    val out = Sft.renderConversations(df(schema, rows), "conv", "turn",
        "role", "content", lossRole = "assistant",
        open = "[", close = "]", end = "\n")
      .collect().sortBy(_.getLong(1))
    assert(out(0).getString(6) == "[user]q\n[assistant]a\n")
    assert(out(0).getLong(3) == 0L && out(0).getLong(4) == 8L)
    assert(out(1).getLong(3) == 8L && out(1).getLong(4) == 21L)
  }
}
