package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ProfileSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType),
    StructField("d", DoubleType), StructField("t", TimestampType)))

  private def data = df(schema, Seq(
    Row(1L, "b", 1.5, new java.sql.Timestamp(1000L)),
    Row(2L, "a", null, new java.sql.Timestamp(2000L)),
    Row(3L, "a", 2.5, null),
    Row(null, null, 9.0, new java.sql.Timestamp(500L))))

  test("profileColumns (exact): counts, nulls, NDV, min/max as strings, any type") {
    val out = Profile.profileColumns(data, Seq("id", "s", "d", "t"), exactNdv = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("id") == (4L, 1L, 3L, "1", "3"))
    assert(out("s") == (4L, 1L, 2L, "a", "b"))
    assert(out("d") == (4L, 1L, 3L, "1.5", "9.0"))
    val (tn, tnull, tndv, tmin, _) = out("t")
    assert((tn, tnull, tndv) == (4L, 1L, 3L) && tmin.startsWith("1970-01-01"))
  }

  test("profileColumns: approx mode agrees with exact on small cardinalities") {
    val out = Profile.profileColumns(data, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL++ at default rsd is exact for tiny NDV
    assert(out("id") == 3L && out("s") == 2L)
  }

  private val pSchema = StructType(Seq(
    StructField("g", StringType), StructField("v", DoubleType)))

  test("percentiles (exact): element at rank ceil(p*n), nulls excluded, per group") {
    val rows = (1 to 10).map(i => Row("a", i.toDouble)) ++
      Seq(Row("b", 5.0), Row("b", 1.0), Row("b", null))
    val out = Profile.percentiles(df(pSchema, rows), Seq("g"), "v",
        ps = Seq(0.5, 0.9, 1.0), exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // g=a: n=10, p50 = rank ceil(5)=5 -> 5.0; p90 = rank 9 -> 9.0; p100 -> 10.0
    assert(out("a") == (10L, 5.0, 9.0, 10.0), s"got ${out("a")}")
    // g=b: null excluded -> n=2; p50 = rank 1 -> 1.0; p90/p100 = rank 2 -> 5.0
    assert(out("b") == (2L, 1.0, 5.0, 5.0))
  }

  test("percentiles: sketch mode in its exact regime equals the exact mode") {
    val rows = (1 to 97).map(i => Row(if (i % 2 == 0) "x" else "y", (i * 7 % 31).toDouble))
    val d = df(pSchema, rows)
    val ex = Profile.percentiles(d, Seq("g"), "v", exact = true)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ap = Profile.percentiles(d, Seq("g"), "v", exact = false, accuracy = 100000)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(ex == ap, s"exact=$ex approx=$ap")
    intercept[IllegalArgumentException](
      Profile.percentiles(d, Seq.empty, "v"))
    intercept[IllegalArgumentException](
      Profile.percentiles(d, Seq("g"), "v", ps = Seq(1.5)))
  }

  test("robustOutliers: planted outlier flagged, inliers and NULLs are not") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("id", LongType),
      StructField("v", DoubleType)))
    // group a: 9 values tightly around 10 (med=10, MAD=1) + one at 100;
    // group b: constant (MAD=0 -> nothing can exceed 3*0 strictly... except
    // any deviation > 0; plant one deviating row to pin that edge)
    val rows = Seq(9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 8.0)
      .zipWithIndex.map { case (v, i) => Row("a", i.toLong, v) } ++
      Seq(Row("a", 90L, 100.0), Row("a", 91L, null)) ++
      (0 to 4).map(i => Row("b", 100L + i, 5.0)) ++ Seq(Row("b", 105L, 5.5))
    val out = Profile.robustOutliers(df(schema, rows), Seq("g"), "v", exact = true)
      .collect().map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4))).toMap
    // a: med=10, deviations sorted [0,0,0,1,1,1,1,2,2,90,..] -> MAD=1; only 100.0 flagged
    assert(out.keySet == Set(90L, 105L), s"got ${out.keySet}")
    assert(out(90L) == (10.0, 1.0))
    // b: med=5, MAD=0 -> any nonzero deviation is an outlier
    assert(out(105L) == (5.0, 0.0))
  }

  test("robustOutliers: sketch mode in its exact regime equals exact mode; bad args") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("id", LongType),
      StructField("v", DoubleType)))
    val rows = (0 until 60).map(i =>
      Row(if (i % 2 == 0) "x" else "y", i.toLong, (i % 7).toDouble)) ++
      Seq(Row("x", 200L, 999.0), Row("y", 201L, -999.0))
    val d = df(schema, rows)
    val ex = Profile.robustOutliers(d, Seq("g"), "v", exact = true)
      .collect().map(_.getLong(1)).toSet
    val sk = Profile.robustOutliers(d, Seq("g"), "v", exact = false)
      .collect().map(_.getLong(1)).toSet
    assert(ex == sk && ex == Set(200L, 201L), s"exact $ex vs sketch $sk")
    intercept[IllegalArgumentException](Profile.robustOutliers(d, Seq.empty, "v"))
    intercept[IllegalArgumentException](Profile.robustOutliers(d, Seq("g"), "v", k = 0.0))
  }

  test("robustScale: (x - med)/IQR per group; constant group scales to 0; NULL passes through") {
    val sch = StructType(Seq(
      StructField("g", StringType), StructField("id", LongType),
      StructField("v", DoubleType)))
    // group a: values 1..8 -> q1 = 2 (rank 2), med = 4, q3 = 6 -> IQR 4
    val rows = (1 to 8).map(i => Row("a", i.toLong, i.toDouble)) ++
      Seq(Row("a", 9L, null)) ++
      (1 to 4).map(i => Row("b", 100L + i, 7.0))
    val out = Profile.robustScale(df(sch, rows), Seq("g"), "v", exact = true)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(2)), r.getDouble(3), r.getDouble(4),
          Option(r.get(5)))).toMap
    assert(out(4L) == (Some(4.0), 4.0, 4.0, Some(0.0)))   // the median itself
    assert(out(8L) == (Some(8.0), 4.0, 4.0, Some(1.0)))   // (8-4)/4
    assert(out(1L) == (Some(1.0), 4.0, 4.0, Some(-0.75))) // (1-4)/4
    assert(out(9L)._4.isEmpty, "NULL value stays NULL scaled")
    assert(out(101L) == (Some(7.0), 7.0, 0.0, Some(0.0)), "IQR 0 -> 0.0")
    intercept[IllegalArgumentException](Profile.robustScale(df(sch, rows), Seq.empty, "v"))
  }

  test("profileColumns: one scan — a single aggregate node, no join or union of scans") {
    val plan = Profile.profileColumns(data, Seq("id", "s", "d"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"),
      s"profile must be one aggregation pass, not per-column scans:\n$plan")
    intercept[IllegalArgumentException](Profile.profileColumns(data, Seq.empty))
    intercept[IllegalArgumentException](Profile.profileColumns(data, Seq("nope")))
  }

  test("benford: exact digit extraction, zero/null exclusion, full digit grid") {
    val sch = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))
    val rows = Seq(
      Row("a", 1.0),    // cents 100   -> digit 1
      Row("a", 19.99),  // cents 1999  -> digit 1
      Row("a", 95.0),   // cents 9500  -> digit 9
      Row("a", -2.5),   // cents -250 -> |.| -> digit 2
      Row("a", 0.004),  // floor(0.4) = 0 cents -> excluded
      Row("a", null))   // excluded
    val out = Profile.benford(df(sch, rows), Seq("g"), "v")
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.size == 9, "all nine digits must emit a row")
    // n_total = 4 qualifying rows everywhere
    assert(out.values.forall(_._2 == 4L))
    assert(out(1)._1 == 2L && out(2)._1 == 1L && out(9)._1 == 1L)
    assert(out(5)._1 == 0L, "zero-observation digit still emits")
    // exact expected/dev: digit 1 expects 4·30102999, observed 2·1e8
    assert(out(1)._3 == 4L * 30102999L)
    assert(out(1)._4 == 2L * 100000000L - 4L * 30102999L)
    // the deficit signal on the unobserved digit
    assert(out(5)._4 == -4L * 7918124L)
    intercept[IllegalArgumentException](Profile.benford(df(sch, rows), Seq.empty, "v"))
  }

  test("winsorize: rank-selected clamp band, null passthrough, sketch agrees at test scale") {
    val sch = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))
    val rows = (1 to 20).map(i => Row("a", i.toDouble)) :+ Row("a", null) :+ Row("b", 7.0)
    val out = Profile.winsorize(df(sch, rows), Seq("g"), "v",
      loP = 0.05, hiP = 0.95, exact = true)
      .collect().map(r => (r.getString(0), Option(r.get(1))) ->
        (Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    // band for a: [1, 19] (ceil(.05*20)=1st, ceil(.95*20)=19th value)
    assert(out(("a", Some(20.0))) == ((Some(1.0), Some(19.0), Some(19.0))))
    assert(out(("a", Some(1.0)))._3 == Some(1.0), "lower edge value stays")
    assert(out(("a", Some(10.0)))._3 == Some(10.0), "interior untouched")
    assert(out(("a", None))._3 == None, "null value stays null")
    // singleton group clamps onto itself
    assert(out(("b", Some(7.0))) == ((Some(7.0), Some(7.0), Some(7.0))))
    // sketch mode agrees in its exact regime
    val sk = Profile.winsorize(df(sch, rows), Seq("g"), "v", 0.05, 0.95,
      exact = false, accuracy = 10000)
      .collect().map(r => (r.getString(0), Option(r.get(1))) -> Option(r.get(4))).toMap
    assert(sk == out.view.mapValues(_._3).toMap)
    intercept[IllegalArgumentException](
      Profile.winsorize(df(sch, rows), Seq("g"), "v", 0.9, 0.5))
  }

  test("quantileNormalize: per-source ranks map onto the pooled grid; selected values only") {
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("src", StringType),
      StructField("v", DoubleType)))
    // source A is shifted low (1..4), source B high (101..104); pooled
    // values interleave — after normalization equal within-source ranks
    // get equal pooled values
    val rows = Seq(
      Row(1L, "A", 1.0), Row(2L, "A", 2.0), Row(3L, "A", 3.0), Row(4L, "A", 4.0),
      Row(5L, "B", 101.0), Row(6L, "B", 102.0), Row(7L, "B", 103.0), Row(8L, "B", 104.0),
      Row(9L, "A", null))
    val out = Profile.quantileNormalize(df(sch, rows), "src", "v", "id", gridSize = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    // rank 1 of A and rank 1 of B share grid_idx 1 → pooled q1
    assert(out(1L).getInt(3) == out(5L).getInt(3))
    assert(out(1L).getDouble(4) == out(5L).getDouble(4))
    // the top of each source maps to the pooled max (a SELECTED value)
    assert(out(4L).getDouble(4) == 104.0 && out(8L).getDouble(4) == 104.0)
    // every normalized value is an actual pooled value
    val pooled = rows.filter(_.get(2) != null).map(_.getDouble(2)).toSet
    assert(out.values.filterNot(_.isNullAt(4)).forall(r => pooled(r.getDouble(4))))
    // nulls pass through with null norm
    assert(out(9L).isNullAt(3) && out(9L).isNullAt(4))
    assert(out.size == 9)
    intercept[IllegalArgumentException](
      Profile.quantileNormalize(df(sch, rows), "src", "v", "id", gridSize = 1))
  }

  private val corrSchema = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("z", DoubleType)))

  test("corrMatrix: exact ±1 on linear columns, NULL on constant, all pairs") {
    val rows = (1 to 8).map(i => Row(i.toDouble, 2.0 * i, 10.0 - i))
    val out = Profile.corrMatrix(df(corrSchema, rows), Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")),
      "C(3,2) pairs in input column order")
    assert(out(("x", "y")).getDouble(3) == 1.0, "y = 2x exactly correlates")
    assert(out(("x", "z")).getDouble(3) == -1.0, "z = 10 − x anti-correlates")
    assert(out.values.forall(_.getLong(2) == 8L))
    val const = (1 to 4).map(i => Row(i.toDouble, 5.0, null))
    val c = Profile.corrMatrix(df(corrSchema, const), Seq("x", "y"))
      .collect().head
    assert(c.isNullAt(3), "zero-variance side: r undefined")
    intercept[IllegalArgumentException](
      Profile.corrMatrix(df(corrSchema, rows), Seq("x")))
    intercept[IllegalArgumentException](
      Profile.corrMatrix(df(corrSchema, rows), Seq("x", "x")))
  }

  test("corrMatrix: pairwise-complete n under nulls; fixed-point tolerance") {
    val rows = Seq(
      Row(1.0, 1.0, null), Row(2.0, 4.0, 7.0), Row(3.0, 9.0, 5.0),
      Row(4.0, null, 3.0), Row(5.0, 25.0, 1.0))
    val out = Profile.corrMatrix(df(corrSchema, rows), Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("x", "y")).getLong(2) == 4L, "rows where both present")
    assert(out(("x", "z")).getLong(2) == 4L)
    assert(out(("y", "z")).getLong(2) == 3L)
    // x vs quadratic y: strong but not perfect; exact value from the
    // fixed-point sums is stable, just sanity-band it
    val r = out(("x", "y")).getDouble(3)
    assert(r > 0.95 && r < 1.0, s"got $r")
    // z over the x-complete rows is exactly linear in x → r = −1
    assert(out(("x", "z")).getDouble(3) == -1.0)
  }

  private val divSchema = StructType(Seq(
    StructField("lang", StringType), StructField("text", StringType)))

  test("ngramDiversity: hand-counted distinct-1/-2 per group") {
    val d = df(divSchema, Seq(
      Row("en", "a a a"),     // uni: 3x a; bi: "a a" x2
      Row("en", "a b"),       // uni: a, b; bi: "a b"
      Row("de", "x"),         // uni: x; no bigram
      Row("de", null),        // tokenizes empty -> contributes nothing
      Row("fr", "  ")))       // whitespace-only -> nothing
    val out = Profile.ngramDiversity(d, "text", "lang", maxN = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("en", 1)) == ((5L, 2L, 0.4)))
    assert(out(("en", 2)) == ((3L, 2L, 2.0 / 3.0)))
    assert(out(("de", 1)) == ((1L, 1L, 1.0)))
    assert(!out.contains(("de", 2)), "one-token doc has no bigrams")
    assert(!out.exists(_._1._1 == "fr"), "empty text contributes no grams")
  }

  private val readSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("readability: hand-counted Flesch components and pinned score") {
    val d = df(readSchema, Seq(
      Row(1L, "The cat sat. The dog ran!"), // 6 words, 2 sentences, 6 vowel groups
      Row(2L, ""),                          // empty -> null score
      Row(3L, "zzz zzz")))                  // no vowels -> syllables clamp to words
    val out = Profile.readability(d, "text", "id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 6L && r1.getLong(2) == 2L && r1.getLong(3) == 6L)
    val expected = BigDecimal(206.835 - 1.015 * 3.0 - 84.6 * 1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getDouble(4) == expected)
    assert(out(2L).getLong(1) == 0L && out(2L).isNullAt(4))
    assert(out(3L).getLong(3) == 2L, "vowel-free words clamp to one syllable each")
  }

  test("tokenizerFertility: exact sums + pinned ratios; empty slice null-safes") {
    val fSchema = StructType(Seq(
      StructField("lang", StringType), StructField("text", StringType)))
    val d = df(fSchema, Seq(
      // "hello world": 2 words; subwords = 2 alnum runs + 1 space = 3; 11 chars
      Row("en", "hello world"),
      // "it's a co-op": 3 words; runs it,s,a,co,op = 5 + 4 others
      // (', 2 spaces, -) = 9 subwords; 12 chars
      Row("en", "it's a co-op"),
      Row("xx", ""),                     // 0 words/subwords/chars
      Row("xx", "   ")))                 // blank: 0 words/subwords, 3 chars
    val out = Profile.tokenizerFertility(d, "text", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert((en.getLong(1), en.getLong(2), en.getLong(3), en.getLong(4)) ==
      (2L, 5L, 12L, 23L), en.toString)
    assert(en.getDouble(5) == 12.0 / 5.0 && en.getDouble(6) == 23.0 / 12.0)
    val xx = out("xx")
    assert(xx.getLong(2) == 0L && xx.getLong(4) == 3L &&
      xx.isNullAt(5) && xx.isNullAt(6), xx.toString)
  }

  test("vocabMass: exact integer top-p boundaries on a hand corpus") {
    val sch = StructType(Seq(
      StructField("g", StringType), StructField("text", StringType)))
    // counts a:5 b:3 c:1 d:1 (total 10), ranked cum = 5, 8, 9, 10:
    // p50 -> rank 1 (50 >= 50 exactly), p90 -> rank 3, p99 -> rank 4
    val out = Profile.vocabMass(df(sch, Seq(
        Row("g", "a a a b b"), Row("g", "a a b c d"))), "text", "g")
      .head()
    assert(out.getLong(1) == 10L && out.getLong(2) == 4L, out.toString)
    assert(out.getLong(3) == 1L && out.getLong(4) == 3L && out.getLong(5) == 4L,
      out.toString)
  }

  test("vocabCoverage: hand-computed Good-Turing unseen mass and Chao1") {
    val sch = StructType(Seq(
      StructField("g", StringType), StructField("text", StringType)))
    // g: counts a:2 b:2 c:1 -> N=5 V=3 n1=1 n2=2 -> p0=0.2, chao1=3+0/6=3
    // h: all singletons -> N=3 V=3 n1=3 n2=0 -> p0=1, chao1=3+6/2=6
    val out = Profile.vocabCoverage(df(sch, Seq(
        Row("g", "a A b"), Row("g", "b c"), Row("h", "x y z"))), "text", "g")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) == ((5L, 3L, 1L, 2L)))
    assert(g.getDouble(5) == 0.2 && g.getDouble(6) == 3.0)
    val h = out("h")
    assert(h.getDouble(5) == 1.0 && h.getDouble(6) == 6.0)
  }

  test("readability: per-word clamp — vowel-less token cannot borrow from a multi-vowel neighbor") {
    // "alpha" = 2 vowel groups, "bcd" = 0 → per-word max(1,·) sums to 3;
    // the old aggregate-level clamp (greatest(words, groups)) said 2
    val d = df(readSchema, Seq(Row(1L, "alpha bcd")))
    val r = Profile.readability(d, "text", "id").head()
    assert(r.getLong(1) == 2L && r.getLong(3) == 3L)
  }

  private val giniSchema = StructType(Seq(
    StructField("g", StringType), StructField("item", StringType),
    StructField("w", LongType)))

  test("gini: uniform = 0, single-holder = (n-1)/n, zero mass = NULL") {
    val rows = Seq(
      Row("uni", "a", 5L), Row("uni", "b", 5L), Row("uni", "c", 5L), Row("uni", "d", 5L),
      Row("one", "a", 0L), Row("one", "b", 0L), Row("one", "c", 0L), Row("one", "d", 10L),
      Row("solo", "a", 7L),
      Row("zero", "a", 0L), Row("zero", "b", 0L))
    val out = Profile.gini(df(giniSchema, rows), "g", "item", "w")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("uni").getDouble(3) == 0.0)
    assert(out("one").getDouble(3) == 0.75, "single holder of n=4 -> 3/4")
    assert(out("solo").getDouble(3) == 0.0)
    assert(out("zero").isNullAt(3))
    assert(out("one").getLong(1) == 4L && out("one").getLong(2) == 10L)
  }

  test("gini: matches the exact discrete formula on random weights") {
    val rnd = new scala.util.Random(61)
    val rows = (0 until 50).map(i => Row("g", s"i$i", rnd.nextInt(100).toLong))
    val out = Profile.gini(df(giniSchema, rows), "g", "item", "w").head()
    val ws = rows.map(_.getLong(2)).sorted
    val n = ws.size
    val s = ws.sum
    val num = ws.zipWithIndex.map { case (w, i0) => w * (2L * (i0 + 1) - n - 1) }.sum
    assert(out.getDouble(3) == num.toDouble / (n.toLong * s).toDouble)
  }

  test("ngramDiversity: boilerplate slice scores far below organic text") {
    val spam = (0 until 50).map(i => Row("spam", "click here to win now"))
    val organic = (0 until 50).map(i =>
      Row("org", s"document $i discusses topic${i % 7} in depth ${i * 31 % 13}"))
    val out = Profile.ngramDiversity(df(divSchema, spam ++ organic), "text", "lang", 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(4)).toMap
    assert(out(("spam", 2)) < 0.05)
    assert(out(("org", 2)) > 0.2)
  }

  test("gopherQualityFlags: each published rule trips on its planted violator only") {
    val gSchema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val good = "The quick brown fox jumps over the lazy dog and " +
      "then runs off to find more of that good food with great speed today"
    val docs = Seq(
      Row(1L, good),                                          // passes everything
      Row(2L, "too short to count"),                          // f_word_count
      Row(3L, good + " " + Seq.fill(4)("### ## #").mkString(" ")), // f_symbol
      Row(4L, good + "\n" + (1 to 20).map(i => s"- item $i").mkString("\n")), // f_bullet
      Row(5L, good + "\n" + (1 to 15).map(i => s"cliffhanger line $i...").mkString("\n")), // f_ellipsis
      Row(6L, good + " " + (1 to 30).map(_.toString).mkString(" ")), // f_alpha
      Row(7L, "lorem ipsum dolor sit amet " * 6),             // f_stopwords
      Row(8L, null))                                          // null text -> empty
    val out = Profile.gopherQualityFlags(df(gSchema, docs), "id", "text",
        minWords = 20L, maxWords = 100000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long): Seq[Boolean] =
      (4 to 10).map(i => out(id).getBoolean(i)) // f_word_count..f_stopwords
    assert(out(1L).getBoolean(11), out(1L).toString)          // keep
    assert(flags(1L).forall(identity))
    assert(!out(2L).getBoolean(4) && !out(2L).getBoolean(11)) // word count
    assert(!out(3L).getBoolean(6))                            // symbol ratio
    assert(!out(4L).getBoolean(7))                            // bullet lines
    assert(!out(5L).getBoolean(8))                            // ellipsis lines
    assert(!out(6L).getBoolean(9))                            // alpha words
    assert(!out(7L).getBoolean(10))                           // required stopwords
    // null text: zero words fails the positive-count rules, never throws
    assert(out(8L).getLong(1) == 0L && !out(8L).getBoolean(11))
    // mean word length is integer hundredths: "The quick ..." fixture
    val mwl = out(1L).getLong(3)
    assert(mwl >= 300L && mwl <= 1000L, s"mwl=$mwl")
  }

  test("charEntropy: uniform maxes, constant zeroes, junk scores below prose") {
    val tSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val d = df(tSchema, Seq(
      Row(1L, "abcd"),                                  // uniform over 4 chars
      Row(2L, "aaaaaaaa"),                              // constant -> 0 nats
      Row(3L, "the quick brown fox jumps over the lazy dog and then sleeps"),
      Row(4L, "aaaaabbbbbaaaaabbbbbaaaaabbbbb"),        // 2-symbol mash
      Row(5L, ""), Row(6L, null),                       // no distribution
      Row(7L, "x" * 600 + "yz")))                       // cap: yz never seen
    val out = Profile.charEntropy(d, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // uniform over 4: H = ln 4 = 1.386...e12 fp (sum of 4 floored terms)
    val (n1, d1, h1) = out(1L)
    assert(n1 == 4L && d1 == 4L)
    assert(math.abs(h1 - math.log(4.0) * 1e12) < 10, s"h1=$h1")
    assert(out(2L) == (8L, 1L, 0L))
    // prose carries much more char entropy than a 2-symbol mash
    assert(out(3L)._3 > out(4L)._3 * 2, s"${out(3L)} vs ${out(4L)}")
    // empty/null docs yield no row; the cap hides chars past 512
    assert(!out.contains(5L) && !out.contains(6L))
    assert(out(7L) == (512L, 1L, 0L))
  }
}
