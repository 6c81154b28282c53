package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline scalar functions: the reference's UTF-8 sanitizer
  * (taskrabbit/forklift `lib/forklift/transports/mysql.rb:88-99`) plus the
  * text-analysis operators a large-scale training-data pipeline needs
  * (language-ID, quality scoring, token counting, fingerprinting).
  *
  * All built from `org.apache.spark.sql.functions._` so they stay inside
  * whole-stage codegen — no UDFs in the hot path.
  */
object TextFunctions {

  /** T4 UTF-8 sanitize: replace every char above `charBytecodeMax`
    * (default 65535, `lib/forklift/plan.rb:149`) with `???` — the
    * reference's insert-retry sanitization (`mysql.rb:88-99`) as an
    * eager scalar function. Codepoints above 0xFFFF are exactly the
    * supplementary plane. */
  def sanitizeUtf8(c: Column): Column =
    regexp_replace(c, "[\\x{10000}-\\x{10FFFF}]", "???")

  /** Whitespace token count; empty/blank → 0. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish subword count estimate: splits on word/number/punct
    * boundaries (a GPT-2-style pretokenizer regex, coarse), counting
    * pieces — an upper-bound proxy for tokenizer cost at scale. */
  def subwordCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(
      size(filter(split(c, "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"),
        x => length(x) > 0)))

  /** Punctuation ratio: punct chars / total chars (0 for empty). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^\\p{Punct}]", "")).cast("double") / length(c))

  /** Uppercase ratio over letters. */
  def upperRatio(c: Column): Column = {
    val letters = length(regexp_replace(c, "[^\\p{L}]", ""))
    when(letters === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^\\p{Lu}]", "")).cast("double") / letters)
  }

  /** Mean word length (0 for blank). */
  def meanWordLen(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "\\s+", "")).cast("double") / tokenCount(c))

  /** Stopword hit ratio against a given stopword list — the workhorse of
    * both quality scoring and n-gram language ID. `splitRegex` is the
    * token-boundary pattern (default: any non-letter). */
  def stopwordRatio(c: Column, stopwords: Seq[String], splitRegex: String = "[^\\p{L}]+"): Column = {
    val toks = split(lower(trim(c)), splitRegex)
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    val total = size(filter(toks, t => length(t) > 0))
    when(total === 0, lit(0.0)).otherwise(hits.cast("double") / total)
  }

  /** Heuristic document quality score in [0,1]: rewards stopword density
    * and sane word lengths, penalizes punctuation/uppercase excess —
    * the classic Gopher/C4-style rule-based filter shape, built entirely
    * from codegen'd expressions so it runs at scan speed over 100 TB. */
  def qualityScore(c: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val sw = stopwordRatio(c, stopwords)           // 0..1, good ≈ 0.3-0.6
    val punct = punctRatio(c)                      // good < 0.1
    val upper = upperRatio(c)                      // good < 0.3
    val mwl = meanWordLen(c)                       // good ≈ 3-10
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val swScore = least(sw * 2.5, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punct * 4.0)
    val upperScore = greatest(lit(0.0), lit(1.0) - upper * 2.0)
    val mwlScore = when(mwl >= 2.0 && mwl <= 12.0, lit(1.0)).otherwise(lit(0.0))
    round((lenScore + swScore + punctScore + upperScore + mwlScore) / 5.0, 4)
  }

  /** N-gram-heuristic language ID over a small closed set: scores each
    * candidate language by stopword-hit ratio and returns the argmax
    * (ties → 'und'). Cheap, fully codegen'd, embarrassingly parallel. */
  def langId(c: Column): Column = {
    val scored = langStopwords.map { case (lang, words) => (lang, stopwordRatio(c, words)) }
    // argmax via chained when: keep (bestLang, bestScore) pair in expressions
    val best = scored.reduceLeft[(Column, Column)] {
      case ((aL: Column, aS: Column), (bL, bS)) => (when(bS > aS, bL).otherwise(aL), greatest(aS, bS))
    } match { case (l, s) => when(s > 0.08, l).otherwise(lit("und")) }
    best
  }
  // langStopwords pairs pre-lifted to Columns for reduceLeft above
  private lazy val langStopwords: Seq[(Column, Seq[String])] = Seq(
    lit("en") -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "are", "his", "this", "they"),
    lit("de") -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "sie", "mit", "ein", "eine", "auf", "den", "dem", "zu"),
    lit("fr") -> Seq("le", "la", "les", "de", "des", "et", "est", "une", "dans", "que", "pour", "qui", "sur", "pas", "au"),
    lit("es") -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "del"),
  )

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "were", "that", "it", "for", "on", "with", "as", "at", "by", "this",
    "be", "from", "has", "have", "not", "but", "they", "his", "her")

  /** Document fingerprint: 64-bit polynomial rolling hash over the
    * lowercased, whitespace-collapsed text — stable across row order and
    * partitioning, so `groupBy(fingerprint)` is an exact-dup key that
    * shuffles 8 bytes instead of full documents at 100 TB. */
  def fingerprint(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(RollingHash(ColumnBridge.expression(normalizeForFingerprint(c))))
  }

  /** Normalization used by [[fingerprint]] and exact dedup: lowercase,
    * collapse whitespace, trim. */
  def normalizeForFingerprint(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")
}
