package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline scalar functions: the reference's UTF-8 sanitizer
  * (taskrabbit/forklift `lib/forklift/transports/mysql.rb:88-99`) plus the
  * text-analysis operators a large-scale training-data pipeline needs
  * (language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything stays inside whole-stage codegen — no UDFs, and no
  * higher-order-function lambdas (those are `CodegenFallback` and drop
  * the whole projection to interpreted eval): the token/stopword work is
  * one native single-pass [[TextProfile]] expression, the rest is plain
  * `org.apache.spark.sql.functions._` arithmetic over its struct fields.
  * Spark's subexpression elimination collapses repeated field reads to a
  * single profile call per row, so quality scoring + language ID together
  * cost two passes over the document bytes — scan speed at 100 TB.
  */
object TextFunctions {

  import org.apache.spark.sql.graftshim.ColumnBridge

  /** The native single-pass stats struct (see [[TextProfileOps]]). */
  private def profile(c: Column, sets: Seq[Seq[String]] = Nil,
                      asciiTokens: Boolean = false): Column =
    ColumnBridge.column(TextProfile(ColumnBridge.expression(c), sets, asciiTokens))

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

  /** BPE-ish subword count estimate: pieces of a GPT-2-style pretokenizer
    * split (runs of `[\p{L}\p{N}]` + one piece per other char) — an
    * upper-bound proxy for tokenizer cost at scale. Native single-pass
    * (the regex-split + `filter` lambda form was CodegenFallback). */
  def subwordCount(c: Column): Column = {
    val p = profile(c)
    when(length(trim(c)) === 0, lit(0))
      .otherwise((p.getField("alnum_runs") + p.getField("non_alnum")).cast("int"))
  }

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
    * token-boundary pattern (default: any non-letter); the two patterns
    * the pipeline uses run through the native single-pass profile, any
    * other regex falls back to a (non-codegen) lambda composition. */
  def stopwordRatio(c: Column, stopwords: Seq[String], splitRegex: String = "[^\\p{L}]+"): Column =
    splitRegex match {
      case "[^\\p{L}]+" => ratioFromProfile(profile(c, Seq(stopwords)))
      case "[^a-z]+"    => ratioFromProfile(profile(c, Seq(stopwords), asciiTokens = true))
      case other =>
        val toks = split(lower(trim(c)), other)
        val hits = size(filter(toks, t => t.isInCollection(stopwords)))
        val total = size(filter(toks, t => length(t) > 0))
        when(total === 0, lit(0.0)).otherwise(hits.cast("double") / total)
    }

  private def ratioFromProfile(p: Column, setIdx: Int = 0): Column = {
    val total = p.getField("letter_tokens")
    when(total === 0L, lit(0.0))
      .otherwise(p.getField("hits").getItem(setIdx).cast("double") / total)
  }

  /** Heuristic document quality score in [0,1]: rewards stopword density
    * and sane word lengths, penalizes punctuation/uppercase excess — the
    * classic Gopher/C4-style rule-based filter shape. All five components
    * read ONE [[TextProfile]] struct (subexpression elimination gives one
    * profile call per row), so the full score is a single pass over the
    * document inside whole-stage codegen — scan speed at 100 TB. */
  def qualityScore(c: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val p = profile(c, Seq(stopwords))
    val chars = p.getField("chars")
    val sw = ratioFromProfile(p)                                   // 0..1, good ≈ 0.3-0.6
    val punct = when(chars === 0L, lit(0.0))                       // good < 0.1
      .otherwise(p.getField("punct").cast("double") / chars)
    val upper = when(p.getField("letters") === 0L, lit(0.0))       // good < 0.3
      .otherwise(p.getField("upper").cast("double") / p.getField("letters"))
    val mwl = when(p.getField("ws_tokens") === 0L, lit(0.0))       // good ≈ 3-10
      .otherwise(p.getField("nonws_chars").cast("double") / p.getField("ws_tokens"))
    val lenScore = least(chars.cast("double") / 500.0, lit(1.0))
    val swScore = least(sw * 2.5, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punct * 4.0)
    val upperScore = greatest(lit(0.0), lit(1.0) - upper * 2.0)
    val mwlScore = when(mwl >= 2.0 && mwl <= 12.0, lit(1.0)).otherwise(lit(0.0))
    round((lenScore + swScore + punctScore + upperScore + mwlScore) / 5.0, 4)
  }

  /** N-gram-heuristic language ID over a closed candidate set: scores
    * each language by stopword-hit ratio and returns the argmax (ties →
    * first language in `languages` order; all ≤ 0.08 → 'und'). ONE
    * profile pass computes all per-language hit counts; the argmax is
    * codegen'd CaseWhen arithmetic.
    *
    * The language set is pluggable: pass any `(tag, stopwords)` list —
    * the profile expression already takes arbitrary sets, so adding a
    * language is data, not engine surgery. [[defaultLanguages]] is the
    * built-in 4-language European set. */
  def langId(c: Column, languages: Seq[(String, Seq[String])] = defaultLanguages): Column = {
    require(languages.nonEmpty, "langId needs at least one candidate language")
    val p = profile(c, languages.map(_._2))
    val scored = languages.zipWithIndex.map { case ((lang, _), i) =>
      (lit(lang), ratioFromProfile(p, i))
    }
    scored.reduceLeft[(Column, Column)] {
      case ((aL: Column, aS: Column), (bL, bS)) => (when(bS > aS, bL).otherwise(aL), greatest(aS, bS))
    } match { case (l, s) => when(s > 0.08, l).otherwise(lit("und")) }
  }

  /** Built-in candidate set for [[langId]] — override per call. */
  lazy val defaultLanguages: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "are", "his", "this", "they"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "sie", "mit", "ein", "eine", "auf", "den", "dem", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "une", "dans", "que", "pour", "qui", "sur", "pas", "au"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "del"),
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
    * collapse whitespace, trim. The trim runs AFTER the collapse:
    * Spark's `trim` strips spaces only, so a leading/trailing `\n` or
    * `\t` would otherwise survive as a boundary space — and every
    * space-splitting consumer (token spans, word n-grams, chunking)
    * would see phantom empty tokens at the edges. */
  def normalizeForFingerprint(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Within-document repetition statistics (Gopher-style filters) — one
    * native single-pass struct; see [[RepetitionOps]] for field
    * semantics. `topNs` selects the "most-frequent-n-gram coverage"
    * lengths, `dupNs` the "duplicated-n-gram union coverage" lengths. */
  def repetitionProfile(c: Column, topNs: Seq[Int] = Seq(2, 3, 4),
                        dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)): Column =
    ColumnBridge.column(RepetitionProfile(ColumnBridge.expression(c), topNs, dupNs))

  /** The Gopher repetition filter as a boolean keep/drop column: true =
    * document survives every repetition threshold. Thresholds follow the
    * published Gopher rules (dup-line fraction ≤ 0.30, dup-line-char
    * fraction ≤ 0.20, top-{2,3,4}-gram coverage ≤ {0.20, 0.18, 0.16},
    * dup-{5..10}-gram coverage ≤ {0.15 … 0.10}); fractions are over word
    * chars (separator whitespace excluded). One profile pass per row,
    * all comparisons codegen'd. */
  /** The published Gopher thresholds — the SINGLE source for both the
    * Column predicate below and the SQL `gopher_keep` registration
    * (GraftFunctions builds its formula from these, so the two surfaces
    * cannot drift). */
  val gopherDupLineLimit: Double = 0.30
  val gopherDupLineCharLimit: Double = 0.20
  val gopherTopLimits: Seq[Double] = Seq(0.20, 0.18, 0.16)   // n = 2, 3, 4
  val gopherDupLimits: Seq[Double] = Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10) // n = 5..10

  def gopherRepetitionKeep(c: Column): Column = {
    val p = repetitionProfile(c)
    val lines = p.getField("lines")
    val lineChars = p.getField("line_chars")
    val wordChars = p.getField("word_chars")
    def frac(num: Column, den: Column): Column =
      when(den === 0L, lit(0.0)).otherwise(num.cast("double") / den)
    val checks =
      Seq(frac(p.getField("dup_lines"), lines) <= gopherDupLineLimit,
          frac(p.getField("dup_line_chars"), lineChars) <= gopherDupLineCharLimit) ++
      gopherTopLimits.zipWithIndex.map { case (lim, i) =>
        frac(p.getField("top_chars").getItem(i), wordChars) <= lim } ++
      gopherDupLimits.zipWithIndex.map { case (lim, i) =>
        frac(p.getField("dup_chars").getItem(i), wordChars) <= lim }
    checks.reduce(_ && _)
  }

  /** Unicode NFC canonicalization (native, codegen'd) — run before
    * fingerprinting/dedup so composed and decomposed forms of the same
    * visible text collide. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c), "nfc"))

  /** Accent stripping: NFD + drop combining marks (café→cafe); matches
    * DuckDB `strip_accents` bit-for-bit on decomposable letters. */
  def stripAccents(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c), "strip_accents"))

  /** HTML → text extraction (the RefinedWeb/C4 "strip the markup"
    * step, minus a real DOM): drop `<script>`/`<style>` subtrees and
    * comments wholesale, strip every remaining tag, decode the common
    * named entities (`&amp; &lt; &gt; &quot; &#39; &nbsp;` — numeric
    * character references are NOT decoded; add a lookup pass if a
    * crawl needs them), then collapse whitespace to single spaces.
    * Entity decode runs AFTER tag removal — markup that arrives
    * entity-encoded is treated as text, never re-parsed as tags — and
    * `&amp;` decodes last, per the usual unescape order.
    *
    * Known regex-stripper limitation (shared by every non-DOM
    * extractor): a bare `<`…`>` span in prose is eaten as a tag.
    *
    * Pure codegen'd `regexp_replace` chain in the Java∩RE2 subset
    * (inline `(?is)` flags, non-greedy spans, no lookaround/backrefs)
    * — scan-speed at 100 TB and externally replayable, which is how
    * `q_html_strip` oracles it in DuckDB. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (e, r)) => regexp_replace(col0, e, r) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Main-content extraction — the boilerplate-block removal step
    * (jusText / trafilatura's core heuristic, simplified to a
    * deterministic replayable form) between [[stripHtml]] and
    * langid/quality in a crawl pipeline: whole-page stripping keeps
    * nav bars, link farms, and footers that poison quality scores and
    * n-gram stats at 100 TB; this keeps only blocks that read like
    * prose.
    *
    * Method: split the page into blocks on block-level tag boundaries
    * (`p div section article br h1-6 li ul ol table thead tbody tr td
    * th header footer nav aside blockquote`), clean each block with
    * the [[stripHtml]] chain, and KEEP blocks that (a) carry at least
    * `minChars` cleaned characters and (b) are at most `maxLinkPct`
    * percent link text — link mass measured as the cleaned-length drop
    * when `<a>…</a>` spans are removed (exact enough for gating,
    * deterministic, and identical in any engine). Kept blocks join
    * with newlines.
    *
    * Pure regexp/higher-order-function composition in the Java∩RE2
    * subset — no UDF; per-row work is bounded by the page size.
    * CodegenFallback caveat: the HOF lambdas drop this projection to
    * interpreted eval, so keep it in its own projection (its cost is
    * the regex scans either way). */
  def mainContent(c: Column, minChars: Int = 25, maxLinkPct: Int = 33): Column = {
    require(minChars >= 1 && maxLinkPct >= 0 && maxLinkPct <= 100,
      s"minChars >= 1 and maxLinkPct in [0,100], got $minChars/$maxLinkPct")
    val blockRe = "(?i)</?(?:p|div|section|article|br|h[1-6]|li|ul|ol|table|" +
      "thead|tbody|tr|td|th|header|footer|nav|aside|blockquote)[^>]*>"
    val blocks = split(c, blockRe)
    val kept = filter(blocks, b => {
      val clean = stripHtml(b)
      val cleanNoLinks = stripHtml(
        regexp_replace(b, "(?is)<a[^>]*>.*?</a>", " "))
      val linkChars = greatest(lit(0), length(clean) - length(cleanNoLinks))
      (length(clean) >= minChars) &&
        (linkChars * lit(100) <= lit(maxLinkPct) * length(clean))
    })
    trim(array_join(transform(kept, b => stripHtml(b)), "\n"))
  }

  /** URL canonicalization for web-corpus dedup and per-domain curation
    * (the RefinedWeb/C4 pre-dedup step): lowercase the scheme and
    * authority, strip the default port (`:443` for https, `:80` for
    * http — non-default ports are KEPT), drop the fragment, remove
    * tracking query parameters (`utm_*`, `fbclid`, `gclid`) and clean
    * the dangling `?`/`&` they leave, and render an empty path as `/`.
    * The PATH keeps its case (paths are case-sensitive per RFC 3986)
    * and `www.` is kept (an alias policy, not a syntax rule — strip it
    * upstream if the crawl treats them as one host). Non-URL input
    * (no `scheme://`) passes through trimmed, not nulled — callers
    * chain `urlRegisteredDomain` or a filter when they need URL-only.
    *
    * Pure codegen'd `regexp_extract`/`regexp_replace` composition in
    * the Java∩RE2 subset — scan-speed at 100 TB, and replayable by an
    * external engine (the `q_url_normalize` oracle checks the result
    * BY CONSTRUCTION against independently-built expected strings). */
  def urlNormalize(c: Column): Column = {
    val u = trim(c)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://.*$", 1))
    val auth = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$", 1))
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val authNoPort = when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
    val noFrag = regexp_replace(rest, "#.*$", "")
    // Tracking-param removal is anchored to its `?`/`&` separator so
    // look-alike names survive (`xfbclid`, `my_gclid`) and path segments
    // (`/utm_page=3`) are never touched; the kept separator then absorbs
    // any `&` run it left behind (`?&ref=x` → `?ref=x`).
    val noTrack = regexp_replace(noFrag, "([?&])(utm_[A-Za-z0-9]+|fbclid|gclid)=[^&]*", "$1")
    val collapsed = regexp_replace(noTrack, "([?&])&+", "$1")
    val clean = regexp_replace(collapsed, "[&?]+$", "")
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), authNoPort,
        when(clean === "", lit("/"))
          // empty path with a surviving query: `https://h?a=1` and
          // `https://h/?a=1` are the same resource — render both as `/?a=1`
          .when(clean.startsWith("?"), concat(lit("/"), clean))
          .otherwise(clean)))
  }

  /** Registered domain of a URL — the per-domain cap / blocklist key:
    * authority, minus userinfo and port, resolved against the vendored
    * Public-Suffix-List snapshot ([[PublicSuffix]]): `shop.foo.co.uk` →
    * `foo.co.uk`, `a.b.example.com` → `example.com`, wildcard and
    * exception rules honored (`x.www.ck` → `www.ck`). TLDs outside the
    * snapshot fall back to the last-two-labels rule (the PSL's implicit
    * `*` default). Empty string for non-URLs, dot-less hosts
    * (`localhost`), and hosts that ARE a public suffix (`co.uk`). */
  def urlRegisteredDomain(c: Column): Column = {
    val auth = lower(regexp_extract(trim(c), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$", 1))
    val host = regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":[0-9]+$", "")
    PublicSuffix.registeredDomain(host)
  }

  /** href targets of anchor tags — the edge extractor that turns a
    * crawled HTML corpus into the link graph [[graft.operators.LinkGraph]]
    * ranks: `<a ... href="URL">` (either quote style, any attribute
    * order, case-insensitive) → array of raw URL strings, in document
    * order. Chain [[urlNormalize]] / [[urlRegisteredDomain]] on the
    * results for canonical edges. Regex stays in the Java∩RE2 subset
    * (`(?i)`, `\b`, char classes — no lookaround), so any replaying
    * engine extracts the same list; unquoted hrefs and hrefs containing
    * a quote are NOT matched (malformed-markup recall is a parser's
    * job — [[htmlToText]]'s caveats apply here too). Pure codegen'd
    * `regexp_extract_all`: scan-speed edge extraction, no UDF. */
  def extractLinks(c: Column): Column =
    regexp_extract_all(coalesce(c, lit("")),
      lit("(?i)<a[^>]*\\bhref\\s*=\\s*[\"']([^\"'<>]+)[\"']"), lit(1))

  /** One PII redaction rule: a regex and its replacement tag. Patterns
    * MUST stay in the Java∩RE2 common subset (no lookaround, no
    * backrefs) — the engine runs Java regex, the DuckDB oracle runs RE2,
    * and a user porting the rules to another engine gets identical
    * behavior only inside that subset. */
  final case class PiiRule(name: String, pattern: String, replacement: String)

  /** Default rule set, Dolma/C4-shaped: emails, IPv4 addresses, and
    * NANP-style phone numbers. Order matters — emails first (their digit
    * runs must not be phone-matched), then IPs, then phones. */
  val defaultPiiRules: Seq[PiiRule] = Seq(
    PiiRule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    PiiRule("ipv4", "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>"),
    PiiRule("phone", "\\(?\\d{3}\\)?[-.\\s]?\\d{3}[-.\\s]?\\d{4}\\b", "<PHONE>"))

  /** Redact PII by applying each rule's `regexp_replace` in order. Pure
    * codegen'd string work — no UDF, no shuffle; at 100 TB this runs at
    * scan speed alongside the quality filters. */
  def redactPii(c: Column, rules: Seq[PiiRule] = defaultPiiRules): Column =
    rules.foldLeft(c)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))

  /** Match count for one rule against the ORIGINAL text (counts are
    * per-rule independent; a digit run inside an email counts for both —
    * deterministic and engine-portable, documented rather than hidden). */
  def piiCount(c: Column, rule: PiiRule): Column =
    size(regexp_extract_all(c, lit(rule.pattern), lit(0)))

  /** Sketch form of [[vocabulary]]: approximate top-k tokens via the
    * SpaceSaving aggregate — ONE aggregation whose exchange carries k
    * counters per map task, instead of a groupBy shuffling every
    * DISTINCT token (billions at 100 TB). Output rows
    * (token, est, err): est never undercounts and `est - err` lower-
    * bounds the true frequency; any token with true frequency > N/k is
    * guaranteed present. */
  def vocabularySketch(df: org.apache.spark.sql.DataFrame, textCol: String,
                       topK: Int = 10000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val toks = df.select(explode(split(normalizeForFingerprint(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val agg = HeavyHittersAgg(ColumnBridge.expression(col("token")), topK)
    toks.agg(ColumnBridge.column(agg.toAggregateExpression()).as("_hh"))
      .select(explode(col("_hh")).as("_e"))
      .select(col("_e.item").as("token"), col("_e.est").as("est"), col("_e.err").as("err"))
  }

  /** Corpus vocabulary: top-k tokens of the normalized text by
    * frequency (deterministic tie-break on the token) — the input a
    * tokenizer-training step consumes. explode → groupBy(token) count is
    * the scale shape: partial aggregation collapses each task to its
    * distinct-token counts before the shuffle, and the top-k is a
    * TakeOrdered (per-partition heads + driver merge of k·parts rows),
    * never a global sort. */
  def vocabulary(df: org.apache.spark.sql.DataFrame, textCol: String,
                 topK: Int = 10000): org.apache.spark.sql.DataFrame =
    df.select(explode(split(normalizeForFingerprint(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topK)

  /** Zipf power-law fit over the corpus rank-frequency curve — the
    * one-row corpus-health diagnostic (natural text slopes ≈ −1;
    * boilerplate-heavy or template-spam corpora bend away from it, so a
    * drifting slope between snapshots flags contamination upstream of
    * any per-document filter). [[vocabulary]]'s top-K feeds a
    * log₁₀-free log-log regression: rank is a row_number over the
    * K-row vocab table (bounded — the only ordered pass), ln(rank)/
    * ln(freq) are IEEE doubles of exact integers (the
    * [[graft.operators.LanguageModel]] ln-parity contract), and the
    * fit is [[graft.operators.Analytics.groupedOls]]'s exact
    * fixed-point moment machinery at 1e-8 scale. Output: (corpus = the
    * constant group, n, slope, intercept, r2). */
  def zipfFit(df: org.apache.spark.sql.DataFrame, textCol: String,
              topK: Int = 1000): org.apache.spark.sql.DataFrame = {
    require(topK >= 2, s"zipfFit needs topK >= 2, got $topK")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token"))
    vocabulary(df, textCol, topK)
      .withColumn("rank", row_number().over(w))
      .withColumn("corpus", lit("corpus"))
      .withColumn("ln_rank", log(col("rank").cast("double")))
      .withColumn("ln_freq", log(col("freq").cast("double")))
      .transform(v => graft.operators.Analytics.groupedOls(
        v, "corpus", "ln_rank", "ln_freq", scale = 8))
  }
}
