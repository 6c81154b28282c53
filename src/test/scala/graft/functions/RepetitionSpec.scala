package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class RepetitionSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private val topNs = Seq(2, 3, 4)
  private val dupNs = Seq(5, 6, 7, 8, 9, 10)

  private def profileOf(text: String): Row = {
    val d = df(StructType(Seq(StructField("t", StringType))), Seq(Row(text)))
    d.select(TextFunctions.repetitionProfile(col("t"), topNs, dupNs).as("p"))
      .select("p.*").head()
  }

  /** Naive reference implementation of the documented semantics. */
  private def ref(s: String): (Long, Long, Long, Long, Long, Long, Long, Seq[Long], Seq[Long]) = {
    def cplen(x: String): Long = x.codePointCount(0, x.length).toLong
    val lines = s.split("\n", -1).toSeq.filter(_.nonEmpty)
    val lineCnt = lines.groupBy(identity).view.mapValues(_.size)
    val dupLines = lineCnt.values.map(c => (c - 1).toLong).sum
    val dupLineChars = lineCnt.map { case (l, c) => (c - 1) * cplen(l) }.sum
    val words = s.split("\\s+").toSeq.filter(_.nonEmpty)
    val wordChars = words.map(cplen).sum
    def grams(n: Int): Seq[Seq[String]] =
      if (words.length < n) Seq.empty else words.sliding(n).toSeq
    val top = topNs.map { n =>
      val g = grams(n)
      if (g.isEmpty) 0L
      else {
        val counts = g.groupBy(_.mkString(" ")).view.mapValues(_.size)
        // max count, tie → smallest key in byte order (ASCII fixtures:
        // plain string order suffices); 0 unless the top n-gram repeats
        val (k, c) = counts.toSeq.sortBy { case (k, c) => (-c, k) }.head
        if (c < 2) 0L
        else c.toLong * g.find(_.mkString(" ") == k).get.map(cplen).sum
      }
    }
    val dup = dupNs.map { n =>
      val g = grams(n)
      if (g.isEmpty) 0L
      else {
        val counts = g.map(_.mkString(" ")).groupBy(identity).view.mapValues(_.size).toMap
        val covered = Array.fill(words.length)(false)
        g.zipWithIndex.foreach { case (gr, i) =>
          if (counts(gr.mkString(" ")) > 1) (i until i + n).foreach(covered(_) = true)
        }
        words.indices.filter(covered).map(i => cplen(words(i))).sum
      }
    }
    (cplen(s), lines.size.toLong, lines.map(cplen).sum, dupLines, dupLineChars,
      words.size.toLong, wordChars, top, dup)
  }

  private def check(text: String): Unit = {
    val p = profileOf(text)
    val (chars, lines, lineChars, dupLines, dupLineChars, words, wordChars, top, dup) = ref(text)
    assert(p.getLong(0) == chars, s"chars for ${text.take(40)}")
    assert(p.getLong(1) == lines, "lines")
    assert(p.getLong(2) == lineChars, "line_chars")
    assert(p.getLong(3) == dupLines, "dup_lines")
    assert(p.getLong(4) == dupLineChars, "dup_line_chars")
    assert(p.getLong(5) == words, "words")
    assert(p.getLong(6) == wordChars, "word_chars")
    assert(p.getSeq[Long](7) == top, s"top_chars: got ${p.getSeq[Long](7)} want $top")
    assert(p.getSeq[Long](8) == dup, s"dup_chars: got ${p.getSeq[Long](8)} want $dup")
  }

  test("hand-computed fixture") {
    val text = "spam spam spam spam\nreal content here\nspam spam spam spam\n\ntail"
    val p = profileOf(text)
    // lines: 4 non-empty; "spam spam spam spam" twice → 1 dup occurrence, 19 dup chars
    assert(p.getLong(1) == 4 && p.getLong(3) == 1 && p.getLong(4) == 19)
    // words: 12; word chars: 8*4 + 4+7+4 + 4 = 51
    assert(p.getLong(5) == 12 && p.getLong(6) == 51)
    // top 2-gram "spam spam": occurs 6 times (3 per spam line), 8 chars each
    assert(p.getSeq[Long](7).head == 48)
    check(text)
  }

  test("empty, blank, single-word, no-repetition edge cases") {
    Seq("", "   \n\t ", "word", "all words here are unique tokens entirely",
      "\n\n\n", "a\na\na").foreach(check)
  }

  test("multibyte codepoints count as one char") {
    val p = profileOf("café 😀\ncafé 😀")
    assert(p.getLong(0) == 13) // (4+1+1) + newline + (4+1+1) codepoints
    assert(p.getLong(3) == 1 && p.getLong(4) == 6)
    assert(p.getLong(6) == 10)
  }

  test("randomized equivalence vs naive reference") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "dog", "ran", "x")
    (1 to 60).foreach { _ =>
      val nLines = rnd.nextInt(6)
      val text = (0 until nLines).map { _ =>
        (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }.mkString("\n")
      check(text)
    }
  }

  test("gopherRepetitionKeep: clean survives, degenerate drops") {
    val clean = "The quick brown fox jumps over the lazy dog near the river bank today.\n" +
      "Many different words appear exactly once in this perfectly normal document text."
    val spammy = ("buy cheap pills now " * 30).trim
    val d = df(StructType(Seq(StructField("t", StringType))),
      Seq(Row(clean), Row(spammy)))
    val keep = d.select(TextFunctions.gopherRepetitionKeep(col("t")).as("k"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(keep == Seq(true, false))
  }

  test("null input yields null struct") {
    val d = df(StructType(Seq(StructField("t", StringType))), Seq(Row(null)))
    assert(d.select(TextFunctions.repetitionProfile(col("t")).as("p")).head().isNullAt(0))
  }
}
