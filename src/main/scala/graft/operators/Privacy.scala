package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-shape audits a corpus publishes before release: k-anonymity
  * (no quasi-identifier combination isolates fewer than k rows) and
  * l-diversity (each combination covers at least l distinct sensitive
  * values). Complements the row-local PII detectors in
  * [[graft.functions.TextFunctions]] — those find identifiers IN text;
  * this measures whether the STRUCTURED columns re-identify — and
  * extends [[Diagnostics.kAnonymity]] (the size-only class audit,
  * `q_kanon`) with the sensitive-column dimension and the suppression
  * transform.
  */
object Privacy {

  /** Per-quasi-identifier-group audit: ONE corpus pass to
    * (quasi…, n, l) — `n` the group size, `l` the number of distinct
    * sensitive values — plus the two violation flags. count_distinct
    * is Spark's exact two-phase distinct aggregate: partials collapse
    * per (group, sensitive) map-side, so the exchange carries at most
    * group×sensitive cardinality, never the corpus.
    *
    * `k_violation`: the group isolates fewer than k individuals.
    * `l_violation`: everyone in the group shares few sensitive values —
    * an attacker who locates the group learns the secret even without
    * isolating a row (why k alone is not enough).
    *
    * NULL quasi values group together (standard SQL GROUP BY NULL
    * semantics on both engines) — a null is itself a quasi-identifier
    * value. Output: quasi columns + (n, l, k_violation, l_violation). */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Long, l: Long = 1L): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l"))
      .withColumn("k_violation", col("n") < k)
      .withColumn("l_violation", col("l") < l)
  }

  /** Suppression: drop every row whose quasi-identifier group violates
    * k-anonymity or l-diversity — the release-safe subset (suppression
    * is the blunt instrument; generalization — coarsening the quasi
    * columns first — is the caller's lever for keeping more rows).
    *
    * Shape: the audit aggregate (group-cardinality), then ONE left_semi
    * join of the corpus against the passing groups on the quasi key —
    * co-partitioned on the same key the aggregate just shuffled by, and
    * null-safe (`<=>`) so null-valued quasi groups are suppressed or
    * kept as groups, exactly as audited. */
  def suppress(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
               k: Long, l: Long = 1L): DataFrame = {
    val ok = kAnonymityAudit(df, quasiCols, sensitiveCol, k, l)
      .filter(!col("k_violation") && !col("l_violation"))
      .select(quasiCols.map(c => col(c).as(s"_ok_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"_ok_$c")).reduce(_ && _)
    df.join(ok, cond, "left_semi")
  }

  /** Salted deterministic pseudonymization: replace each identifier
    * column with `md5(salt || ':' || value)` — the release-time
    * transform that removes direct identifiers while PRESERVING
    * JOINABILITY (the same value tokenizes identically everywhere, so
    * cross-table keys still line up) and supporting revocation (rotate
    * the salt, every token changes). This is pseudonymization, not
    * anonymization — GDPR Art. 4(5)'s distinction: the salt holder can
    * re-link, so the salt must live in a secret store, never beside
    * the data.
    *
    * Shape: a stateless per-row expression chain — codegen'd md5 over
    * a concat, no shuffle, no UDF; scans stay whole-stage. NULLs stay
    * NULL (no identifier, no token — and no fixed "null token" that
    * would fingerprint missingness as a joinable value). Values are
    * cast to string first, so 42 (int) and "42" (string) tokenize
    * identically — cross-type keys survive.
    *
    * MD5 here is a TOKENIZER, not a password hash: with the salt
    * secret, preimage resistance is not load-bearing (the adversary
    * lacks the salt, not the hash budget); if the threat model includes
    * salt leakage, swap in an HMAC via the same seam. */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    require(salt.nonEmpty, "empty salt defeats the purpose — pass a secret")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNotNull,
          md5(concat(lit(salt), lit(":"), col(c).cast("string")))))
    }
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung after [[kAnonymityAudit]]'s k and l: a quasi-identifier group
    * leaks even when large and diverse if its sensitive-value
    * DISTRIBUTION differs from the corpus's (everyone in the group
    * earning top-decile salaries is a disclosure regardless of k).
    * A group passes when the Earth Mover's Distance between its
    * sensitive distribution and the global one is ≤ t = tNum/tDen;
    * for an ORDERED sensitive attribute with m distinct values the
    * paper's EMD is Σ_i |cum(p−q)_i| / (m−1).
    *
    * Exactness: with group counts c, group size n, global counts C,
    * corpus size N, the cumulative difference at value i is the exact
    * integer Σ_{≤i}(c·N − C·n), so EMD = Σ|cum| / (n·N·(m−1)) and the
    * violation test runs ENTIRELY in integers —
    * Σ|cum|·tDen > tNum·n·N·(m−1) — with DECIMAL(38,0) products
    * (corpus-count-proof); only the reported `emd` double is a pinned
    * final division (`q_tcloseness` replays via HUGEINT).
    *
    * Shape: one (group, value) count pass + one value-marginal pass,
    * the bounded groups×values grid (both NDV-bounded — quasi bands ×
    * sensitive bands, never corpus-scale) via a broadcast cross join,
    * one per-group cumulative window ON THE GRID, one aggregate. The
    * grid is mandatory: a value ABSENT from a group still moves the
    * cumulative difference (c = 0, C > 0).
    *
    * Output: (quasi…, n, emd, t_violation), one row per group. */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(tDen > 0 && tNum >= 0 && tNum <= tDen,
      s"need 0 <= t = $tNum/$tDen <= 1")
    val d38 = "decimal(38,0)"
    val base = df.filter(col(sensitiveCol).isNotNull)
      .select(quasiCols.map(col) :+ col(sensitiveCol).as("_v"): _*)
    val gv = base.groupBy(quasiCols.map(col) :+ col("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val groups = gv.groupBy(quasiCols.map(col): _*).agg(sum(col("_c")).as("_n"))
    val global = gv.groupBy(col("_v")).agg(sum(col("_c")).as("_cg"))
    val totals = global.agg(sum(col("_cg")).as("_nn"), count(lit(1)).as("_m"))
    // null-safe grid join: GROUP BY put null quasi values in one group,
    // so the join back must match them too (plain join equality would
    // silently zero a null-keyed group's counts)
    val gvR = gv.select(quasiCols.map(c => col(c).as(s"_r_$c")) :+
      col("_v").as("_rv") :+ col("_c"): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"_r_$c"))
      .reduce(_ && _) && (col("_v") === col("_rv"))
    val grid = groups
      .crossJoin(broadcast(global.crossJoin(totals)))
      .join(gvR, cond, "left")
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*).orderBy(col("_v"))
      .rowsBetween(Long.MinValue, 0)
    val cum = grid.withColumn("_cum",
      sum(col("_c").cast(d38) * col("_nn") - col("_cg").cast(d38) * col("_n")).over(w))
    val agg = cum.groupBy(quasiCols.map(col): _*)
      .agg(max(col("_n")).as("_n"), max(col("_nn")).as("_nn"),
        max(col("_m")).as("_m"), sum(abs(col("_cum"))).as("_s"))
    // m = 1 (a single global sensitive value) ⇒ every group matches the
    // global distribution exactly: EMD 0 by convention, never a /0
    val den = col("_n").cast(d38) * col("_nn") * (col("_m") - 1)
    val emd = when(col("_m") > 1, col("_s").cast("double") / den.cast("double"))
      .otherwise(lit(0.0))
    val violated = when(col("_m") > 1,
        col("_s") * lit(tDen) > lit(tNum).cast(d38) * den)
      .otherwise(lit(false))
    agg.select(quasiCols.map(col) :+ col("_n").as("n") :+
      emd.as("emd") :+ violated.as("t_violation"): _*)
  }
}
