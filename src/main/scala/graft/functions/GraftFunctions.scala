package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's native expressions, so `spark.sql` users get
  * the same scan-speed operators as the Column API.
  *
  * IMPORTANT: the SQL forms hash the text AS GIVEN — they do NOT apply
  * the lowercase/whitespace normalization the Column wrappers
  * (`TextFunctions.fingerprint`, `Dedup.minhashSignatureText`,
  * `Dedup.simhash`) prepend. To match pipeline-built signatures,
  * normalize explicitly:
  *
  * {{{
  *   SELECT rolling_hash(trim(regexp_replace(lower(text), '\\s+', ' '))),
  *          minhash_text(trim(regexp_replace(lower(text), '\\s+', ' ')), 3, 64),
  *          simhash_text(trim(regexp_replace(lower(text), '\\s+', ' '))),
  *          sig_agreement(sig_a, sig_b)     -- equal-position count
  *   FROM documents
  * }}}
  *
  * Two registration paths, both standard Spark:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build (the [[SparkSessionExtensions]] injection point);
  *  - [[GraftFunctions.register]] on a live session (mutates its
  *    function registry — what the extension does, without a rebuild).
  *
  * Literal int arguments (shingle length, hash count) are required at
  * registration: signatures must be plan-constant or LSH banding would
  * be undefined.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, builder, usage) for every SQL-exposed native expression. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("rolling_hash", { args: Seq[Expression] =>
      require(args.length == 1, "rolling_hash(text)")
      RollingHash(args.head)
    }, "rolling_hash(text) - 64-bit polynomial hash of text AS GIVEN (no normalization)"),
    ("minhash_text", { args: Seq[Expression] =>
      require(args.length == 3, "minhash_text(text, shingleLen, numHashes)")
      val n = intLit(args(1), "shingleLen")
      val k = intLit(args(2), "numHashes")
      require(n >= 1, s"shingleLen must be an integer literal >= 1, got $n")
      require(k >= 1, s"numHashes must be an integer literal >= 1, got $k")
      MinHashTextSignature(args.head, n, k)
    }, "minhash_text(text, shingleLen, numHashes) - fused shingle MinHash over text AS GIVEN; pre-normalize to match the Column API"),
    ("simhash_text", { args: Seq[Expression] =>
      require(args.length == 1, "simhash_text(text)")
      SimHashText(args.head)
    }, "simhash_text(text) - fused token-span 64-bit SimHash over text AS GIVEN; pre-normalize to match the Column API"),
    ("sig_agreement", { args: Seq[Expression] =>
      require(args.length == 2, "sig_agreement(a, b)")
      SignatureAgreement(args.head, args(1))
    }, "sig_agreement(a, b) - count of equal signature positions"),
    // ---- text-curation operators (r5): the functions the
    // TrainingDataPipeline leans on, reachable from pure SQL — the
    // reference's whole audience writes SQL transformations
    // (taskrabbit/forklift lib/forklift/base/connection.rb:43-51).
    // Stopword sets are plan-constant string literals, so the whole
    // score stays a single codegen'd TextProfile pass per row.
    ("text_profile", { args: Seq[Expression] =>
      require(args.length == 1, "text_profile(text)")
      TextProfile(args.head, Nil, asciiTokens = false)
    }, "text_profile(text) - single-pass stats struct (chars, letters, punct, upper, ws_tokens, nonws_chars, alnum_runs, non_alnum, letter_tokens)"),
    ("quality_score", { args: Seq[Expression] =>
      require(args.length == 1 || args.length == 2,
        "quality_score(text[, 'stop,words,csv'])")
      val stopwords =
        if (args.length == 2) csvLit(args(1), "stopwords")
        else TextFunctions.englishStopwords
      qualityExpr(args.head, stopwords)
    }, "quality_score(text[, 'stop,words,csv']) - [0,1] Gopher/C4-style quality heuristic; default English stopwords"),
    ("lang_id", { args: Seq[Expression] =>
      require(args.length == 1 || args.length == 2,
        "lang_id(text[, 'en:the,and|xx:foo,bar'])")
      val langs =
        if (args.length == 2) langsLit(args(1))
        else TextFunctions.defaultLanguages
      langIdExpr(args.head, langs)
    }, "lang_id(text[, 'tag:sw,sw|tag2:...']) - stopword-ratio argmax language ID; default en/de/fr/es; low confidence -> 'und'"),
    ("fingerprint", { args: Seq[Expression] =>
      require(args.length == 1, "fingerprint(text)")
      // unlike rolling_hash (text AS GIVEN), this IS the normalized form
      // the Column API and exact dedup use — lowercase, collapse
      // whitespace, trim — so SQL fingerprints join against pipeline ones
      RollingHash(parsedWith(
        "trim(regexp_replace(lower(__t__), '\\\\s+', ' '))", "__t__" -> args.head))
    }, "fingerprint(text) - normalized 64-bit document fingerprint (matches the Column API / exact-dedup key)"),
    ("token_count", { args: Seq[Expression] =>
      require(args.length == 1, "token_count(text)")
      parsedWith(
        "case when length(trim(__t__)) = 0 then 0 else size(split(trim(__t__), '\\\\s+')) end",
        "__t__" -> args.head)
    }, "token_count(text) - whitespace token count; blank -> 0"),
    ("subword_count", { args: Seq[Expression] =>
      require(args.length == 1, "subword_count(text)")
      parsedWith(
        "case when length(trim(__t__)) = 0 then 0 else cast(__p__.alnum_runs + __p__.non_alnum as int) end",
        "__t__" -> args.head,
        "__p__" -> TextProfile(args.head, Nil, asciiTokens = false))
    }, "subword_count(text) - GPT-2-ish pretokenizer piece count (BPE cost proxy)"),
    // ---- repetition / PII / contamination primitives (r7) ----
    ("repetition_profile", { args: Seq[Expression] =>
      require(args.length == 1, "repetition_profile(text)")
      RepetitionProfile(args.head, topNs = Seq(2, 3, 4), dupNs = Seq(5, 6, 7, 8, 9, 10))
    }, "repetition_profile(text) - Gopher repetition stats struct (lines, dup lines/chars, words, top_chars[2,3,4], dup_chars[5..10])"),
    ("gopher_keep", { args: Seq[Expression] =>
      require(args.length == 1, "gopher_keep(text)")
      parsedWith(gopherKeepSql,
        "__p__" -> RepetitionProfile(args.head, Seq(2, 3, 4), Seq(5, 6, 7, 8, 9, 10)))
    }, "gopher_keep(text) - true when the document passes every Gopher repetition threshold (matches TextFunctions.gopherRepetitionKeep)"),
    ("redact_pii", { args: Seq[Expression] =>
      require(args.length == 1, "redact_pii(text)")
      TextFunctions.defaultPiiRules.foldLeft(args.head) { (acc, r) =>
        org.apache.spark.sql.catalyst.expressions.RegExpReplace(acc,
          Literal.create(r.pattern), Literal.create(r.replacement))
      }
    }, "redact_pii(text) - replace emails/IPv4/phones with <EMAIL>/<IP>/<PHONE> (matches TextFunctions.redactPii defaults)"),
    ("word_ngram_hashes", { args: Seq[Expression] =>
      require(args.length == 2, "word_ngram_hashes(text, n)")
      val n = intLit(args(1), "n")
      require(n >= 1, s"n must be an integer literal >= 1, got $n")
      // normalized form (like fingerprint) so SQL n-grams join against
      // Curation.contamination's — NOT text as given
      WordNgramHashes(parsedWith(
        "trim(regexp_replace(lower(__t__), '\\\\s+', ' '))", "__t__" -> args.head), n)
    }, "word_ngram_hashes(text, n) - xxhash64 of each word n-gram of the NORMALIZED text (contamination join key)"),
    ("normalize_text", { args: Seq[Expression] =>
      require(args.length == 2, "normalize_text(text, 'nfc'|'nfd'|'strip_accents')")
      val mode = args(1) match {
        case Literal(v: org.apache.spark.unsafe.types.UTF8String, org.apache.spark.sql.types.StringType) => v.toString
        case other => throw new IllegalArgumentException(
          s"normalize_text mode must be a string literal, got $other")
      }
      NormalizeText(args.head, mode)
    }, "normalize_text(text, mode) - Unicode normalization: nfc, nfd, or strip_accents (NFD + drop combining marks)"),
    ("heavy_hitters", { args: Seq[Expression] =>
      require(args.length == 2, "heavy_hitters(item, k)")
      val k = intLit(args(1), "k")
      require(k >= 1, s"k must be an integer literal >= 1, got $k")
      HeavyHittersAgg(args.head, k).toAggregateExpression()
    }, "heavy_hitters(item, k) - SpaceSaving top-k sketch: array<struct<item, est, err>>, est >= true >= est - err"),
    ("bottom_k", { args: Seq[Expression] =>
      require(args.length == 3, "bottom_k(priority, payload, k)")
      val k = intLit(args(2), "k")
      require(k >= 1, s"k must be an integer literal >= 1, got $k")
      BottomKAgg(args.head, args(1), k).toAggregateExpression()
    }, "bottom_k(priority, payload, k) - mergeable per-group bottom-k aggregate: k payloads with smallest (priority, payload), ascending"),
    // ---- vector functions (r6; r11: routed to the FUSED native
    // expressions): SQL forms of VectorFunctions for spark.sql users —
    // bit-identical to the deterministic left folds they replaced
    // (VectorFunctionsSpec parity), but one codegen'd loop per row
    // instead of an interpreted HOF chain
    ("vec_dot", { args: Seq[Expression] =>
      require(args.length == 2, "vec_dot(a, b)")
      DotProduct(args.head, args(1))
    }, "vec_dot(a, b) - dot product of two float/double arrays (fused native loop, left-fold-exact)"),
    ("vec_cosine", { args: Seq[Expression] =>
      require(args.length == 2, "vec_cosine(a, b)")
      CosineSimilarity(args.head, args(1))
    }, "vec_cosine(a, b) - cosine similarity; 0.0 when either norm is 0 (matches VectorFunctions.cosine)"),
    ("poly_bucket", { args: Seq[Expression] =>
      require(args.length == 2, "poly_bucket(s, numBuckets)")
      PolyBucket(args.head, intLit(args(1), "numBuckets"))
    }, "poly_bucket(s, numBuckets) - codepoint polynomial (acc*31+cp) mod B; SQL-replayable bucket hash (Dsir)"),
    ("vec_quantize", { args: Seq[Expression] =>
      require(args.length == 1, "vec_quantize(a)")
      // scale repeats into an array so the lambda sees it as an element —
      // referencing the scale CASE inside the lambda would re-run its
      // O(d) fold per element (same O(d²) hazard as the Column form)
      parsedWith(
        s"named_struct('scale', $scaleSql, " +
          s"'q', zip_with(__a__, array_repeat($scaleSql, size(__a__)), " +
          "(x, s) -> cast(floor(cast(x as double) / s + 0.5D) as tinyint)))",
        "__a__" -> args.head)
    }, "vec_quantize(a) - symmetric int8 quantization: struct(scale, q tinyint[]) (matches VectorFunctions.quantize)"),
    ("vec_dequantize", { args: Seq[Expression] =>
      require(args.length == 1, "vec_dequantize(qs)")
      parsedWith(
        "transform(__q__.q, x -> cast(cast(x as double) * __q__.scale as float))",
        "__q__" -> args.head)
    }, "vec_dequantize(qs) - reconstruct float32 vector from vec_quantize output"),
    ("hyperplane_bucket", { args: Seq[Expression] =>
      require(args.length == 3 || args.length == 4,
        "hyperplane_bucket(vec, dim, planes[, seed])")
      val dim = intLit(args(1), "dim")
      val planes = intLit(args(2), "planes")
      require(dim >= 1, s"dim must be an integer literal >= 1, got $dim")
      require(planes >= 1 && planes <= 62,
        s"planes must be an integer literal in [1, 62], got $planes")
      val seed = if (args.length == 4) longLit(args(3), "seed") else 42L
      HyperplaneBucket(args.head, dim, planes, seed)
    }, "hyperplane_bucket(vec, dim, planes[, seed]) - native random-hyperplane LSH bucket id in [0, 2^planes) for cosine similarity (matches VectorFunctions.hyperplaneBucket)"),
    ("random_project_fp", { args: Seq[Expression] =>
      require(args.length == 3 || args.length == 4,
        "random_project_fp(vec, dim, outDim[, seed])")
      val dim = intLit(args(1), "dim")
      val outDim = intLit(args(2), "outDim")
      val seed = if (args.length == 4) longLit(args(3), "seed") else 42L
      RandomProjectFp(args.head, dim, outDim, seed)
    }, "random_project_fp(vec, dim, outDim[, seed]) - seeded sparse (Achlioptas) random projection to outDim fixed-point longs; integer-exact, SQL-replayable"))

  /** The Gopher keep predicate over a `__p__` repetition-profile
    * struct, built FROM [[TextFunctions]]' threshold constants — one
    * source of truth for the Column and SQL surfaces. */
  private val gopherKeepSql: String = {
    def frac(num: String, den: String) =
      s"(case when __p__.$den = 0 then 0.0D else cast(__p__.$num as double) / __p__.$den end)"
    val checks =
      Seq(s"${frac("dup_lines", "lines")} <= ${TextFunctions.gopherDupLineLimit}D",
        s"${frac("dup_line_chars", "line_chars")} <= ${TextFunctions.gopherDupLineCharLimit}D") ++
      TextFunctions.gopherTopLimits.zipWithIndex.map { case (lim, i) =>
        s"(case when __p__.word_chars = 0 then 0.0D else cast(__p__.top_chars[$i] as double) / __p__.word_chars end) <= ${lim}D" } ++
      TextFunctions.gopherDupLimits.zipWithIndex.map { case (lim, i) =>
        s"(case when __p__.word_chars = 0 then 0.0D else cast(__p__.dup_chars[$i] as double) / __p__.word_chars end) <= ${lim}D" }
    checks.mkString(" AND ")
  }

  private val scaleSql =
    "case when aggregate(__a__, 0.0D, (acc, x) -> greatest(acc, abs(cast(x as double)))) = 0.0D " +
      "then 1.0D else aggregate(__a__, 0.0D, (acc, x) -> greatest(acc, abs(cast(x as double)))) / 127.0D end"

  // ---- catalyst builders for the composed text scores ----------------
  // A Spark 4 Column is ColumnNode-backed: converting a COMPOSED Column
  // back to a catalyst Expression inside a function builder yields an
  // unresolvable ColumnNodeExpression (the node→expression conversion
  // only runs at Dataset boundaries). So the SQL forms assemble the same
  // formulas as parsed catalyst trees around the native TextProfile;
  // GraftFunctionsSpec pins SQL-vs-Column equality so the two
  // formulations cannot drift. `D` suffixes keep literals DoubleType
  // (bare `0.0` parses as DECIMAL(1,1) in SQL).

  /** Parse a formula and splice expressions in for placeholder
    * attributes (including `__x__.field` multi-part forms). */
  private def parsedWith(formula: String, subs: (String, Expression)*): Expression = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue}
    import org.apache.spark.sql.catalyst.expressions.UnresolvedNamedLambdaVariable
    val m = subs.toMap
    def extract(parts: Seq[String]): Expression =
      parts.tail.foldLeft(m(parts.head))(
        (e, part) => UnresolvedExtractValue(e, Literal(part)))
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(formula)
      .transformUp {
        case a: UnresolvedAttribute if m.contains(a.nameParts.head) =>
          extract(a.nameParts)
        // inside a lambda body the parser wraps EVERY identifier as a
        // named lambda variable; placeholders there must substitute too
        // (real lambda parameters never collide — the placeholder names
        // are __x__-reserved)
        case v: UnresolvedNamedLambdaVariable if m.contains(v.nameParts.head) =>
          extract(v.nameParts)
      }
  }

  /** Mirrors [[TextFunctions.qualityScore]] component by component. */
  private def qualityExpr(text: Expression, stopwords: Seq[String]): Expression = {
    val f =
      """round((
        |  least(cast(__p__.chars as double) / 500.0D, 1.0D)
        |+ least((case when __p__.letter_tokens = 0 then 0.0D
        |          else cast(__p__.hits[0] as double) / __p__.letter_tokens end) * 2.5D, 1.0D)
        |+ greatest(0.0D, 1.0D - (case when __p__.chars = 0 then 0.0D
        |          else cast(__p__.punct as double) / __p__.chars end) * 4.0D)
        |+ greatest(0.0D, 1.0D - (case when __p__.letters = 0 then 0.0D
        |          else cast(__p__.upper as double) / __p__.letters end) * 2.0D)
        |+ (case when (case when __p__.ws_tokens = 0 then 0.0D
        |          else cast(__p__.nonws_chars as double) / __p__.ws_tokens end)
        |     between 2.0D and 12.0D then 1.0D else 0.0D end)
        |) / 5.0D, 4)""".stripMargin
    parsedWith(f, "__p__" -> TextProfile(text, Seq(stopwords), asciiTokens = false))
  }

  /** Mirrors [[TextFunctions.langId]]'s argmax fold. */
  private def langIdExpr(text: Expression, langs: Seq[(String, Seq[String])]): Expression = {
    require(langs.nonEmpty, "lang_id needs at least one candidate language")
    langs.foreach { case (tag, _) =>
      require(tag.matches("[A-Za-z0-9_-]+"), s"language tag must be alphanumeric, got '$tag'")
    }
    def score(i: Int) =
      s"""(case when __p__.letter_tokens = 0 then 0.0D
         | else cast(__p__.hits[$i] as double) / __p__.letter_tokens end)""".stripMargin
    val (label, best) = langs.zipWithIndex.tail
      .foldLeft((s"'${langs.head._1}'", score(0))) { case ((aL, aS), ((tag, _), i)) =>
        (s"(case when ${score(i)} > $aS then '$tag' else $aL end)",
          s"greatest($aS, ${score(i)})")
      }
    parsedWith(s"case when $best > 0.08D then $label else 'und' end",
      "__p__" -> TextProfile(text, langs.map(_._2), asciiTokens = false))
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** `'the,and,of'` → stopword list. */
  private def csvLit(e: Expression, what: String): Seq[String] =
    strLit(e, what).split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty)

  /** `'en:the,and|xx:foo,bar'` → language candidate set. */
  private def langsLit(e: Expression): Seq[(String, Seq[String])] =
    strLit(e, "languages").split("\\|").toIndexedSeq.map { part =>
      val i = part.indexOf(':')
      require(i > 0, s"language spec needs 'tag:sw,sw,...', got '$part'")
      part.substring(0, i).trim ->
        part.substring(i + 1).split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty)
    }

  /** Register on a live session (idempotent — re-registration replaces). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder, usage) =>
      registry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", null, name, usage, ""),
        builder)
    }
  }
}

/** `spark.sql.extensions` entry point: injects every graft SQL function
  * at session build. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder, usage) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", null, name, usage, ""),
        builder))
    }
}
