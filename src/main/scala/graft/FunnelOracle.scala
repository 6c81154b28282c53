package graft

/** Programmatic DuckDB replay of [[pipelines.TrainingDataPipeline]] —
  * the oracle builder behind `q_pipeline_funnel` (LM gate +
  * decontamination ON, whitespace token accounting) and `q_funnel_bpe`
  * (gates off, TRAINED-BPE token accounting — the tokenizer training
  * itself replayed as unrolled merge rounds).
  *
  * The shared prefix replays profile (quality + token stats) → filter
  * → [LM perplexity gate] → scrub (PII + Gopher repetition) → exact
  * dedup → replayable md5-MinHash-LSH near-dedup + connected
  * components → [decontamination] → weighted mix → split,
  * byte-compatible with the pipeline's deterministic configuration
  * (minQuality 0.75, langs en/de/fr/es, trigram jaccard 0.7 verified
  * over 8 md5 minhash bands, explicit weights 0.5/0.25/0.125/0.125,
  * chunk budget 16 / pack budget 32).
  *
  * The BPE tail replays [[operators.Bpe.train]] EXACTLY, without golden
  * rows: each of the 12 merge rounds is one unrolled (pair-count →
  * argmax → fold) CTE triple over the word-frequency dict of the
  * quality-filtered `en` slice. Symbol arrays are sep-joined strings
  * (`chr(31)` after every symbol), because sequential non-overlapping
  * `replace(s, a␟b␟, ab␟)` IS the leftmost-greedy merge fold — the
  * per-symbol separator makes the pattern prefix-safe (`e␟s␟` can
  * never match inside `e␟st␟`), and scanning resumes after each
  * replacement exactly like the fold's "a freshly merged symbol never
  * re-pairs in the same pass" rule. The argmax tie-break (freq desc,
  * then (left, right) binary-ascending) matches `Bpe.train`'s
  * deterministic order; rounds whose best pair drops below
  * `minPairFreq` leave the dict unchanged, and stay no-ops for every
  * later round (the dict is frozen, so the same sub-threshold argmax
  * recurs) — the permanent-stop contract of the Scala loop. The dict
  * carries the CORPUS' distinct words too, at frequency 0 (invisible
  * to pair counts and the argmax, but receiving every fold), so the
  * final dict state segments seen and unseen words alike — the same
  * single-pass equivalence `Bpe.segmentCorpus` relies on.
  *
  * Under the BPE accountant EVERY downstream budget counts trained
  * tokens: the mix stage's language budgets aggregate per-doc subword
  * totals (`ftot` — wordless docs weigh 0), and chunking is
  * cumulative-quota binning over each document's word stream
  * (`⌊(prefix-sum − n_sub)/chunkTokens⌋` — the
  * [[operators.Curation.packSequences]] convention,
  * [[operators.Bpe.tokenBudgetChunks]]); packing is unchanged.
  *
  * Every multi-referenced CTE is `MATERIALIZED` — DuckDB inlines CTE
  * references, and the round chain references each `d{r}` twice. */
private[graft] object FunnelOracle {

  /** Number of unrolled BPE merge rounds and the stop threshold —
    * MUST match the `bpeMerges` / `bpeMinPairFreq` the `q_funnel_bpe`
    * query passes to the pipeline. */
  val BpeMerges = 12
  val BpeMinPairFreq = 2L

  def apply(lm: Boolean, contam: Boolean, bpe: Boolean): String = {
    val enStops = graft.functions.TextFunctions.englishStopwords
      .map(w => s"'$w'").mkString(", ")
    // one top-1-n-gram coverage block per n (the q_repetition shape)
    def topBlock(n: Int): String = {
      val glen = (0 until n).map(k => s"length(w[i+$k])").mkString(" + ")
      s"""gt$n AS (SELECT doc_id, g, count(*) AS cnt, any_value(glen) AS glen FROM (
         |  SELECT doc_id, array_to_string(w[i:i+${n - 1}], ' ') AS g, $glen AS glen
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - ${n - 2})) AS i FROM words))
         |  GROUP BY doc_id, g),
         |top$n AS (SELECT doc_id, cnt * glen AS top_chars FROM (
         |  SELECT doc_id, cnt, glen,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g ASC) AS rn
         |  FROM gt$n) WHERE rn = 1 AND cnt >= 2)""".stripMargin
    }
    // one duplicated-n-gram union-coverage block per n (ditto)
    def dupBlock(n: Int): String =
      s"""gd$n AS MATERIALIZED (SELECT doc_id, i, array_to_string(w[i:i+${n - 1}], ' ') AS g
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - ${n - 2})) AS i FROM words)),
         |dd$n AS (SELECT doc_id, g FROM gd$n GROUP BY doc_id, g HAVING count(*) > 1),
         |cov$n AS (SELECT DISTINCT gd$n.doc_id, unnest(range(gd$n.i, gd$n.i + $n)) AS pos
         |  FROM gd$n JOIN dd$n ON gd$n.doc_id = dd$n.doc_id AND gd$n.g = dd$n.g),
         |dup$n AS (SELECT cov$n.doc_id, CAST(SUM(length(words.w[CAST(pos AS INT)])) AS BIGINT) AS dup_chars
         |  FROM cov$n JOIN words ON cov$n.doc_id = words.doc_id GROUP BY cov$n.doc_id)""".stripMargin
    def wfrac(col: String) =
      s"(CASE WHEN s.word_chars = 0 THEN 0.0 ELSE CAST(COALESCE($col, 0) AS DOUBLE) / s.word_chars END)"
    val tf = graft.functions.TextFunctions
    val topChecks = tf.gopherTopLimits.zipWithIndex.map { case (lim, i) =>
      s"${wfrac(s"t${i + 2}.top_chars")} <= $lim" }.mkString("\n    AND ")
    val dupChecks = tf.gopherDupLimits.zipWithIndex.map { case (lim, i) =>
      s"${wfrac(s"d${i + 5}.dup_chars")} <= $lim" }.mkString("\n    AND ")
    val topJoins = (2 to 4).map(n => s"LEFT JOIN top$n t$n ON s.doc_id = t$n.doc_id").mkString("\n  ")
    val dupJoins = (5 to 10).map(n => s"LEFT JOIN dup$n d$n ON s.doc_id = d$n.doc_id").mkString("\n  ")
    val gopherBlocks = ((2 to 4).map(topBlock) ++ (5 to 10).map(dupBlock)).mkString(",\n")
    val ngram8 =
      """CASE WHEN len(w) >= 8
        |   THEN list_distinct(list_transform(range(1, len(w) - 6), i -> array_to_string(w[i:i+7], ' ')))
        |   ELSE [] END""".stripMargin

    val ctes = Seq.newBuilder[String]
    ctes += s"""ptk AS (
       |  SELECT doc_id, text, lang,
       |         list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> len(x) > 0) AS ltoks
       |  FROM documents)""".stripMargin
    ctes += s"""qstat AS (
       |  SELECT doc_id, text, lang, ltoks,
       |         length(text) AS chars,
       |         len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) AS punct,
       |         len(regexp_extract_all(text, '\\p{L}')) AS letters,
       |         len(regexp_extract_all(text, '\\p{Lu}')) AS uppers,
       |         CASE WHEN len(trim(text)) = 0 THEN 0
       |              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,
       |         length(regexp_replace(text, '\\s', '', 'g')) AS nonws
       |  FROM ptk)""".stripMargin
    ctes += s"""prof AS (
       |  SELECT doc_id, text, lang, ws_tokens AS n_tokens,
       |         ROUND((least(CAST(chars AS DOUBLE) / 500.0, 1.0)
       |              + least((CASE WHEN len(ltoks) = 0 THEN 0.0 ELSE CAST(len(list_filter(ltoks, x -> x IN ($enStops))) AS DOUBLE) / len(ltoks) END) * 2.5, 1.0)
       |              + greatest(0.0, 1.0 - (CASE WHEN chars = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / chars END) * 4.0)
       |              + greatest(0.0, 1.0 - (CASE WHEN letters = 0 THEN 0.0 ELSE CAST(uppers AS DOUBLE) / letters END) * 2.0)
       |              + (CASE WHEN ws_tokens > 0 AND CAST(nonws AS DOUBLE) / ws_tokens >= 2.0 AND CAST(nonws AS DOUBLE) / ws_tokens <= 12.0 THEN 1.0 ELSE 0.0 END)
       |              ) / 5.0, 4) AS quality
       |  FROM qstat)""".stripMargin
    ctes += """clean AS MATERIALIZED (
       |  SELECT doc_id, text, n_tokens, lang FROM prof
       |  WHERE quality >= 0.75 AND lang IN ('en', 'de', 'fr', 'es'))""".stripMargin
    if (lm) {
      ctes += """lmtoks AS MATERIALIZED (
         |  SELECT doc_id, lang,
         |         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
         |  FROM clean)""".stripMargin
      ctes += """lmvocab AS MATERIALIZED (
         |  SELECT token FROM (SELECT unnest(t) AS token FROM lmtoks WHERE lang = 'en')
         |  WHERE length(token) > 0
         |  GROUP BY token ORDER BY COUNT(1) DESC, token LIMIT 50000)""".stripMargin
      ctes += """lmbig AS MATERIALIZED (
         |  SELECT doc_id, lang, unnest(t[1:len(t)-1]) AS w1r, unnest(t[2:len(t)]) AS w2r
         |  FROM lmtoks WHERE len(t) >= 2)""".stripMargin
      ctes += """lmbigm AS MATERIALIZED (
         |  SELECT b.doc_id, b.lang,
         |         CASE WHEN v1.token IS NULL THEN chr(1) ELSE b.w1r END AS w1,
         |         CASE WHEN v2.token IS NULL THEN chr(1) ELSE b.w2r END AS w2
         |  FROM lmbig b
         |  LEFT JOIN lmvocab v1 ON b.w1r = v1.token
         |  LEFT JOIN lmvocab v2 ON b.w2r = v2.token)""".stripMargin
      ctes += """lmc12 AS MATERIALIZED (
         |  SELECT w1, w2, COUNT(1) AS c12 FROM lmbigm WHERE lang = 'en' GROUP BY w1, w2)""".stripMargin
      ctes += """lmc1 AS MATERIALIZED (SELECT w1, SUM(c12) AS c1 FROM lmc12 GROUP BY w1)""".stripMargin
      ctes += """lmvsz AS (SELECT COUNT(1) + 1.0 AS v FROM lmvocab)""".stripMargin
      ctes += """lmnll AS (
         |  SELECT b.doc_id,
         |         CAST(floor(-ln((COALESCE(lmc12.c12, 0) + 0.5) /
         |                        (COALESCE(lmc1.c1, 0) + 0.5 * lmvsz.v)) * 1e8) AS BIGINT) AS nllf
         |  FROM lmbigm b
         |  LEFT JOIN lmc12 ON b.w1 = lmc12.w1 AND b.w2 = lmc12.w2
         |  LEFT JOIN lmc1 ON b.w1 = lmc1.w1
         |  CROSS JOIN lmvsz)""".stripMargin
      ctes += """lmkeep AS MATERIALIZED (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |           CAST(CAST((CAST(SUM(nllf) AS BIGINT) + COUNT(1) * 5000)
         |                      // (COUNT(1) * 10000) AS DECIMAL(20,0)) * 0.0001 AS DOUBLE) AS avg_nll
         |    FROM lmnll GROUP BY doc_id)
         |  WHERE avg_nll <= 3.45)""".stripMargin
    }
    val scrubSrc = if (lm) "FROM clean JOIN lmkeep USING (doc_id)" else "FROM clean"
    ctes += s"""scrub0 AS MATERIALIZED (
       |  SELECT doc_id, lang, n_tokens,
       |         regexp_replace(regexp_replace(regexp_replace(text,
       |             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |             '\\b\\d{1,3}(\\.\\d{1,3}){3}\\b', '<IP>', 'g'),
       |             '\\(?\\d{3}\\)?[-.\\s]?\\d{3}[-.\\s]?\\d{4}\\b', '<PHONE>', 'g') AS text
       |  $scrubSrc)""".stripMargin
    ctes += """words AS MATERIALIZED (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS w,
       |         list_filter(string_split(text, chr(10)), x -> len(x) > 0) AS lns
       |  FROM scrub0)""".stripMargin
    ctes += """lstat AS (
       |  SELECT doc_id,
       |         CAST(SUM(cnt) AS BIGINT) AS n_lines,
       |         CAST(SUM(cnt * len) AS BIGINT) AS line_chars,
       |         CAST(SUM(cnt - 1) AS BIGINT) AS dup_lines,
       |         CAST(SUM((cnt - 1) * len) AS BIGINT) AS dup_line_chars
       |  FROM (SELECT doc_id, line, count(*) AS cnt, length(line) AS len
       |        FROM (SELECT doc_id, unnest(lns) AS line FROM words)
       |        GROUP BY doc_id, line)
       |  GROUP BY doc_id)""".stripMargin
    ctes += """wstat AS (
       |  SELECT doc_id,
       |         CAST(COALESCE(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT) AS word_chars
       |  FROM words)""".stripMargin
    ctes += gopherBlocks
    ctes += s"""keep AS (
       |  SELECT s.doc_id FROM wstat s
       |  LEFT JOIN lstat l ON s.doc_id = l.doc_id
       |  $topJoins
       |  $dupJoins
       |  WHERE (CASE WHEN COALESCE(l.n_lines, 0) = 0 THEN 0.0 ELSE CAST(l.dup_lines AS DOUBLE) / l.n_lines END) <= ${tf.gopherDupLineLimit}
       |    AND (CASE WHEN COALESCE(l.line_chars, 0) = 0 THEN 0.0 ELSE CAST(l.dup_line_chars AS DOUBLE) / l.line_chars END) <= ${tf.gopherDupLineCharLimit}
       |    AND $topChecks
       |    AND $dupChecks)""".stripMargin
    ctes += """scrub AS (SELECT s0.* FROM scrub0 s0 JOIN keep k ON s0.doc_id = k.doc_id)""".stripMargin
    ctes += """exact AS MATERIALIZED (
       |  SELECT doc_id, lang, n_tokens, text FROM (
       |    SELECT sc.*, ROW_NUMBER() OVER (
       |      PARTITION BY trim(regexp_replace(lower(text), '\s+', ' ', 'g')) ORDER BY doc_id) AS rn
       |    FROM scrub sc) WHERE rn = 1)""".stripMargin
    // replayable MinHash-LSH near-dedup (r15, the scale-safe default
    // for audited runs): min over md5(i || ':' || trigram) per doc per
    // permutation i (DuckDB md5 == Spark md5 on UTF-8 bytes), 2..2000
    // bucket cap, exact trigram-Jaccard verify of the candidates
    ctes += """jp0 AS MATERIALIZED (
       |  SELECT doc_id,
       |         CASE WHEN len(nw) >= 3
       |              THEN list_distinct(list_transform(range(1, len(nw) - 1),
       |                                               i -> array_to_string(nw[i:i+2], ' ')))
       |              ELSE [] END AS sh
       |  FROM (SELECT doc_id,
       |               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS nw
       |        FROM exact))""".stripMargin
    ctes += """jmh AS MATERIALIZED (
       |  SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || s)) AS h
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM jp0 WHERE len(sh) > 0), range(8) t(i)
       |  GROUP BY doc_id, i)""".stripMargin
    ctes += """jok AS (SELECT i, h FROM jmh GROUP BY i, h HAVING COUNT(1) BETWEEN 2 AND 2000)""".stripMargin
    ctes += """jcand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM jmh a JOIN jmh b ON a.i = b.i AND a.h = b.h AND a.doc_id < b.doc_id
       |  JOIN jok ON jok.i = a.i AND jok.h = a.h)""".stripMargin
    ctes += """pairs AS MATERIALIZED (
       |  SELECT id_a, id_b FROM jcand
       |  JOIN jp0 pa ON pa.doc_id = jcand.id_a
       |  JOIN jp0 pb ON pb.doc_id = jcand.id_b
       |  WHERE CAST(len(list_intersect(pa.sh, pb.sh)) AS DOUBLE) /
       |        len(list_distinct(list_concat(pa.sh, pb.sh))) >= 0.7)""".stripMargin
    ctes += """edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs)""".stripMargin
    ctes += """reach AS (SELECT u, v FROM edges
       |          UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)""".stripMargin
    ctes += """comp AS (SELECT u, LEAST(u, MIN(v)) AS c FROM reach GROUP BY u)""".stripMargin
    ctes += """uniq AS MATERIALIZED (
       |  SELECT e.* FROM exact e LEFT JOIN comp c ON e.doc_id = c.u
       |  WHERE c.u IS NULL OR c.c = e.doc_id)""".stripMargin
    if (contam) {
      ctes += s"""bgrams AS (
         |  SELECT DISTINCT unnest($ngram8) AS g
         |  FROM (SELECT list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
         |                           x -> len(x) > 0) AS w
         |        FROM documents WHERE doc_id % 13 = 0))""".stripMargin
      ctes += s"""ug AS MATERIALIZED (
         |  SELECT doc_id, $ngram8 AS gs
         |  FROM (SELECT doc_id,
         |               list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
         |                           x -> len(x) > 0) AS w
         |        FROM uniq))""".stripMargin
      ctes += """ghits AS (
         |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM (SELECT doc_id, unnest(gs) AS g FROM ug) e JOIN bgrams b ON e.g = b.g
         |  GROUP BY e.doc_id)""".stripMargin
      ctes += """contam AS (
         |  SELECT ug.doc_id, CAST(len(ug.gs) AS BIGINT) AS n_ngrams,
         |         COALESCE(h.n_hit, 0) AS n_hit
         |  FROM ug LEFT JOIN ghits h ON ug.doc_id = h.doc_id)""".stripMargin
      ctes += """final AS MATERIALIZED (
         |  SELECT u.* FROM uniq u JOIN contam f ON u.doc_id = f.doc_id
         |  WHERE (CASE WHEN f.n_ngrams = 0 THEN 0.0
         |              ELSE ROUND(CAST(f.n_hit AS DOUBLE) / f.n_ngrams, 6) END) <= 0.05)""".stripMargin
    } else {
      ctes += """final AS MATERIALIZED (SELECT * FROM uniq)""".stripMargin
    }
    if (bpe) {
      // BPE training + dict, BEFORE the mix CTEs: under the trained
      // accountant the language-mix budgets count subwords, so the
      // dict must exist by the time `avail` aggregates. Train on the
      // clean en slice; ride the MIX INPUT's (`final`) distinct words
      // through the same merges at freq 0 — invisible to training,
      // segmented by the same folds. `final` ⊇ the post-split docs, so
      // the chunking tail reuses the same dict.
      ctes += """fw AS MATERIALIZED (
         |  SELECT doc_id, lang,
         |         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS w
         |  FROM final WHERE len(trim(text)) > 0)""".stripMargin
      ctes += """cwords AS (SELECT DISTINCT unnest(w) AS word FROM fw)""".stripMargin
      ctes += """bwf AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
         |                              x -> len(x) > 0)) AS word
         |    FROM clean WHERE lang = 'en') GROUP BY word)""".stripMargin
      ctes += """allw AS (
         |  SELECT COALESCE(w.word, c.word) AS word, COALESCE(w.freq, 0) AS freq
         |  FROM bwf w FULL OUTER JOIN cwords c ON w.word = c.word)""".stripMargin
      ctes += """d0 AS MATERIALIZED (
         |  SELECT word, freq, regexp_replace(word, '(.)', '\1' || chr(31), 'g') AS s FROM allw)""".stripMargin
      (1 to BpeMerges).foreach { r =>
        val prev = s"d${r - 1}"
        ctes += s"""p$r AS (
           |  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pf FROM (
           |    SELECT freq, syms[CAST(i AS BIGINT)] AS a, syms[CAST(i AS BIGINT)+1] AS b FROM (
           |      SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM (
           |        SELECT freq, (string_split(s, chr(31)))[1:len(string_split(s, chr(31)))-1] AS syms FROM $prev)))
           |  GROUP BY a, b)""".stripMargin
        ctes += s"""b$r AS MATERIALIZED (
           |  SELECT a, b, pf FROM p$r WHERE pf >= $BpeMinPairFreq ORDER BY pf DESC, a, b LIMIT 1)""".stripMargin
        ctes += s"""d$r AS MATERIALIZED (
           |  SELECT word, freq,
           |    CASE WHEN (SELECT count(*) FROM b$r) = 1
           |         THEN replace(s, (SELECT a FROM b$r) || chr(31) || (SELECT b FROM b$r) || chr(31),
           |                         (SELECT a FROM b$r) || (SELECT b FROM b$r) || chr(31))
           |         ELSE s END AS s
           |  FROM $prev)""".stripMargin
      }
      ctes += s"""wcnt AS MATERIALIZED (
         |  SELECT word, len(string_split(s, chr(31))) - 1 AS n_sub FROM d$BpeMerges)""".stripMargin
      // per-doc trained-token totals over the mix input; wordless docs
      // are absent here and COALESCE to weight 0 downstream
      ctes += """ftot AS MATERIALIZED (
         |  SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS nbpe FROM (
         |    SELECT doc_id, w[CAST(i AS BIGINT)] AS word FROM (
         |      SELECT doc_id, w, unnest(range(1, len(w)+1)) AS i FROM fw))
         |  JOIN wcnt USING (word) GROUP BY doc_id)""".stripMargin
    }
    ctes += """lw(lang, wt) AS (VALUES ('en', 0.5), ('de', 0.25), ('fr', 0.125), ('es', 0.125))""".stripMargin
    if (bpe) {
      ctes += """avail AS (
         |  SELECT lw.lang, lw.wt, CAST(COALESCE(SUM(ft.nbpe), 0) AS DOUBLE) AS wsum
         |  FROM lw LEFT JOIN (SELECT f.lang, COALESCE(t.nbpe, 0) AS nbpe
         |                     FROM final f LEFT JOIN ftot t USING (doc_id)) ft
         |    ON lw.lang = ft.lang
         |  GROUP BY lw.lang, lw.wt)""".stripMargin
    } else {
      ctes += """avail AS (
         |  SELECT lw.lang, lw.wt, CAST(COALESCE(SUM(f.n_tokens), 0) AS DOUBLE) AS wsum
         |  FROM lw LEFT JOIN final f ON lw.lang = f.lang
         |  GROUP BY lw.lang, lw.wt)""".stripMargin
    }
    ctes += """tt AS (SELECT MIN(wsum / wt) AS t FROM avail)""".stripMargin
    ctes += """bdg AS (SELECT lang, wt * (SELECT t FROM tt) AS budget FROM avail)""".stripMargin
    if (bpe) {
      ctes += """cum AS (
         |  SELECT f.doc_id, f.lang, f.text,
         |         COALESCE(SUM(COALESCE(t.nbpe, 0)) OVER (PARTITION BY f.lang ORDER BY f.doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM final f LEFT JOIN ftot t USING (doc_id))""".stripMargin
    } else {
      ctes += """cum AS (
         |  SELECT doc_id, lang, n_tokens, text,
         |         COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM final)""".stripMargin
    }
    ctes += """mixed AS (SELECT cum.doc_id, cum.lang, cum.text FROM cum JOIN bdg USING (lang)
       |          WHERE cum.cb < bdg.budget)""".stripMargin
    ctes += """sp AS (
       |  SELECT doc_id, lang, text,
       |         CASE WHEN (doc_id * 2654435761) % 4294967296 % 10000 < 9800 THEN 'train'
       |              WHEN (doc_id * 2654435761) % 4294967296 % 10000 < 9900 THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM mixed)""".stripMargin
    ctes += """cw AS MATERIALIZED (
       |  SELECT doc_id, lang, split,
       |         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS w
       |  FROM sp WHERE len(trim(text)) > 0)""".stripMargin
    if (!bpe) {
      // whitespace accounting: fixed 16-word windows at stride 12
      ctes += """ck AS (
         |  SELECT doc_id, lang, split, len(w) AS n,
         |         unnest(range(0, (len(w) - 1) // 12 + 1)) AS chunk_idx
         |  FROM cw)""".stripMargin
      ctes += """ct AS (
         |  SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, lang, split,
         |         doc_id % 64 AS pack_shard,
         |         CAST(least(16, n - chunk_idx * 12) AS BIGINT) AS n_tokens
         |  FROM ck)""".stripMargin
    } else {
      // quota-chunk the post-split docs on subword counts (the dict
      // covers them: cw's words ⊆ fw's words since sp ⊆ final)
      ctes += """wpos AS (
         |  SELECT doc_id, lang, split, i AS pos, w[CAST(i AS BIGINT)] AS word FROM (
         |    SELECT doc_id, lang, split, w, unnest(range(1, len(w)+1)) AS i FROM cw))""".stripMargin
      ctes += """wcum AS (
         |  SELECT doc_id, lang, split, pos, n_sub,
         |         SUM(n_sub) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM wpos JOIN wcnt USING (word))""".stripMargin
      ctes += """ct AS (
         |  SELECT doc_id, chunk_idx, lang, split,
         |         doc_id % 64 AS pack_shard, CAST(SUM(n_sub) AS BIGINT) AS n_tokens
         |  FROM (SELECT doc_id, lang, split, n_sub,
         |               CAST(FLOOR((c - n_sub) / 16.0) AS INTEGER) AS chunk_idx FROM wcum)
         |  GROUP BY doc_id, chunk_idx, lang, split)""".stripMargin
    }
    ctes += """pk AS (
       |  SELECT *, SUM(n_tokens) OVER (PARTITION BY split, lang, pack_shard
       |            ORDER BY doc_id, chunk_idx
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM ct)""".stripMargin
    s"""WITH RECURSIVE ${ctes.result().mkString(",\n")}
       |SELECT doc_id, chunk_idx, lang, split, pack_shard, n_tokens,
       |       CAST(FLOOR((cum - n_tokens) / 32.0) AS BIGINT) AS bin
       |FROM pk ORDER BY doc_id, chunk_idx""".stripMargin
  }
}
