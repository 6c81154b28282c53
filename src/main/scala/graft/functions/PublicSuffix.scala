package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-Suffix-List-aware registered-domain resolution.
  *
  * The PSL (publicsuffix.org) is a DATA file, not an algorithm: the
  * algorithm — longest matching rule wins, exceptions beat wildcards,
  * registered domain = public suffix + one label — is public and tiny;
  * the value is the rule list. This object parses the standard PSL line
  * format from a vendored snapshot subset
  * (`graft/public_suffix_snapshot.dat`, multi-label ccTLD registries)
  * and compiles it into four literal string sets small enough to embed
  * in the plan (InSet hash lookups inside whole-stage codegen — no
  * join, no broadcast variable, no shuffle). Unknown TLDs fall back to
  * the naive last-two-labels rule, which is exactly the PSL's implicit
  * `*` default. Swap the resource for a full snapshot when curating
  * real crawls; the parser takes the upstream file unchanged.
  *
  * Rule depth supported: exact rules of 2–3 labels, wildcards `*.x` /
  * `*.x.y`, exceptions of 2–3 labels — everything in the snapshot, and
  * every rule class the PSL format defines. (The full upstream list has
  * a handful of 4-label exact rules; the parser ignores deeper rules
  * rather than misapplying them.)
  */
object PublicSuffix {
  /** (exact2, exact3 ∪ implied-by-wildcard2 bases, wildcard1 bases,
    * exceptions) parsed once per JVM. */
  private[functions] val (exact2, exact3, wild1, wild2, exc2, exc3):
      (Set[String], Set[String], Set[String], Set[String], Set[String], Set[String]) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "public_suffix_snapshot.dat missing from resources")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      finally in.close()
    def labels(s: String) = s.count(_ == '.') + 1
    val exc = lines.filter(_.startsWith("!")).map(_.drop(1))
    val wild = lines.filter(_.startsWith("*.")).map(_.drop(2))
    val exact = lines.filterNot(l => l.startsWith("!") || l.startsWith("*."))
    (exact.filter(labels(_) == 2).toSet,
      exact.filter(labels(_) == 3).toSet,
      wild.filter(labels(_) == 1).toSet,
      wild.filter(labels(_) == 2).toSet,
      exc.filter(labels(_) == 2).toSet,
      exc.filter(labels(_) == 3).toSet)
  }

  private def inSet(c: Column, s: Set[String]): Column =
    if (s.isEmpty) lit(false) else c.isInCollection(s)

  /** Registered (registrable) domain of a bare lowercase host, or ''
    * when the host itself is a public suffix / has no dot. */
  def registeredDomain(host: Column): Column = {
    val s1 = regexp_extract(host, "([^.]+)$", 1)
    val s2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val s3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val s4 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$", 1)
    // exceptions first (they beat the wildcard that covers them), then
    // 3-label suffixes (exact, or implied by a *.x.y wildcard — whose
    // base IS s2), then 2-label (exact, or implied by *.tld), then the
    // implicit-* default: last two labels
    when(inSet(s2, exc2), s2)
      .when(inSet(s3, exc3), s3)
      .when(s3 =!= "" && (inSet(s3, exact3) || inSet(s2, wild2)), s4)
      .when(s2 =!= "" && (inSet(s2, exact2) || inSet(s1, wild1)), s3)
      .otherwise(s2)
  }
}
