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
  *   SELECT rolling_hash(regexp_replace(lower(trim(text)), '\\s+', ' ')),
  *          minhash_text(regexp_replace(lower(trim(text)), '\\s+', ' '), 3, 64),
  *          simhash_text(regexp_replace(lower(trim(text)), '\\s+', ' ')),
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
    }, "sig_agreement(a, b) - count of equal signature positions"))

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
