package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** SQL surface: the native expressions registered as functions resolve
  * from `spark.sql` text and agree with the Column API. */
class GraftFunctionsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("t", StringType)))

  test("registered SQL functions resolve and match the Column API") {
    GraftFunctions.register(spark)
    df(schema, Seq(Row(1L, "the quick brown fox jumps over the lazy dog")))
      .createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      """SELECT rolling_hash(t) AS rh, minhash_text(t, 3, 16) AS mh,
        |       simhash_text(t) AS sh,
        |       sig_agreement(minhash_text(t, 3, 16), minhash_text(t, 3, 16)) AS agree
        |FROM gf_docs""".stripMargin).head()
    // SQL forms take the text AS GIVEN; the Column wrappers pre-normalize.
    // The fixture is already normalized (lowercase, single spaces), so
    // both paths must agree exactly.
    val viaCols = spark.table("gf_docs").select(
      graft.operators.Dedup.minhashSignatureText(col("t"), 3, 16).as("mh"),
      graft.operators.Dedup.simhash(col("t")).as("sh")).head()
    assert(viaSql.getSeq[Long](viaSql.fieldIndex("mh")) ==
      viaCols.getSeq[Long](viaCols.fieldIndex("mh")))
    assert(viaSql.getAs[Long]("sh") == viaCols.getAs[Long]("sh"))
    assert(viaSql.getAs[Int]("agree") == 16)
  }

  test("non-literal shingle length is rejected at analysis") {
    GraftFunctions.register(spark)
    df(schema, Seq(Row(1L, "x"))).createOrReplaceTempView("gf_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_text(t, id + 1, 16) FROM gf_bad").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("shingleLen"),
      e.getMessage)
  }

  test("GraftExtensions injects the same functions at session build") {
    // the extension and the runtime helper share one registration table —
    // apply the extension to a fresh extensions container (build-time
    // path; a second live session cannot be built here since getOrCreate
    // reuses the active one), then verify every descriptor constructs
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    GraftFunctions.all.foreach { case (name, build, _) =>
      val args: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = name match {
        case "minhash_text" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal("x"),
          org.apache.spark.sql.catalyst.expressions.Literal(3),
          org.apache.spark.sql.catalyst.expressions.Literal(16))
        case "sig_agreement" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1L),
            ArrayType(LongType)),
          org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1L),
            ArrayType(LongType)))
        case "vec_dot" | "vec_cosine" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0f),
            ArrayType(FloatType)),
          org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0f),
            ArrayType(FloatType)))
        case "vec_quantize" | "vec_dequantize" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0f),
            ArrayType(FloatType)))
        case "word_ngram_hashes" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal("x"),
          org.apache.spark.sql.catalyst.expressions.Literal(5))
        case "poly_bucket" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal("x"),
          org.apache.spark.sql.catalyst.expressions.Literal(64))
        case "normalize_text" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal("x"),
          org.apache.spark.sql.catalyst.expressions.Literal("nfc"))
        case "heavy_hitters" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal("x"),
          org.apache.spark.sql.catalyst.expressions.Literal(4))
        case "bottom_k" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(1L),
          org.apache.spark.sql.catalyst.expressions.Literal(2L),
          org.apache.spark.sql.catalyst.expressions.Literal(3))
        case "hyperplane_bucket" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0f),
            ArrayType(FloatType)),
          org.apache.spark.sql.catalyst.expressions.Literal(1),
          org.apache.spark.sql.catalyst.expressions.Literal(4))
        case "random_project_fp" => Seq(
          org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0f),
            ArrayType(FloatType)),
          org.apache.spark.sql.catalyst.expressions.Literal(1),
          org.apache.spark.sql.catalyst.expressions.Literal(1))
        case _ => // every other registered function takes a single text arg
          Seq(org.apache.spark.sql.catalyst.expressions.Literal("x"))
      }
      assert(build(args) != null, name)
    }
  }

  test("quality_score and lang_id from SQL match the Column API on documents") {
    GraftFunctions.register(spark)
    val docs = df(schema, Seq(
      Row(1L, "The quick brown fox jumps over the lazy dog and it was not alone in the field."),
      Row(2L, "Der Hund ist nicht auf dem Sofa und die Katze ist mit der Maus zu schnell."),
      Row(3L, "zzz qqq xxx")))
    docs.createOrReplaceTempView("gf_text")
    val viaSql = spark.sql(
      "SELECT id, quality_score(t) AS q, lang_id(t) AS l FROM gf_text ORDER BY id").collect()
    val viaCols = docs.select(col("id"),
      TextFunctions.qualityScore(col("t")).as("q"),
      TextFunctions.langId(col("t")).as("l")).orderBy("id").collect()
    assert(viaSql.toSeq.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))) ==
      viaCols.toSeq.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))))
    assert(viaSql.map(_.getString(2)).toSeq == Seq("en", "de", "und"))
  }

  test("custom stopword/language literals: quality_score CSV + lang_id spec string") {
    GraftFunctions.register(spark)
    df(schema, Seq(Row(1L, "lorem ipsum dolor sit amet lorem ipsum")))
      .createOrReplaceTempView("gf_custom")
    val r = spark.sql(
      """SELECT quality_score(t, 'lorem,ipsum,dolor') AS q,
        |       lang_id(t, 'la:lorem,ipsum,dolor,sit,amet|en:the,and,of') AS l
        |FROM gf_custom""".stripMargin).head()
    assert(r.getDouble(0) > 0.5, s"stopword-dense doc should score well, got ${r.getDouble(0)}")
    assert(r.getString(1) == "la")
    // and text_profile is reachable as a struct
    val p = spark.sql("SELECT text_profile(t).ws_tokens AS w FROM gf_custom").head()
    assert(p.getLong(0) == 7L)
  }

  test("vec_* SQL functions match the VectorFunctions Column API") {
    GraftFunctions.register(spark)
    val vschema = StructType(Seq(
      StructField("id", LongType), StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    val rnd = new scala.util.Random(9)
    val d = df(vschema, (1L to 20L).map(i => Row(i,
      Seq.fill(16)(rnd.nextFloat() * 2 - 1), Seq.fill(16)(rnd.nextFloat() * 2 - 1))) :+
      Row(21L, Seq.fill(16)(0.0f), Seq.fill(16)(1.0f)))
    d.createOrReplaceTempView("gf_vec")
    val viaSql = spark.sql(
      """SELECT id, vec_dot(a, b) AS dt, vec_cosine(a, b) AS cs,
        |       vec_dequantize(vec_quantize(a)) AS dq,
        |       hyperplane_bucket(a, 16, 8) AS hb,
        |       hyperplane_bucket(a, 16, 8, 7) AS hb7
        |FROM gf_vec ORDER BY id""".stripMargin).collect()
    val viaCols = d.select(col("id"),
        graft.functions.VectorFunctions.dot(col("a"), col("b")).as("dt"),
        graft.functions.VectorFunctions.cosine(col("a"), col("b")).as("cs"),
        graft.functions.VectorFunctions.dequantize(
          graft.functions.VectorFunctions.quantize(col("a"))).as("dq"),
        graft.functions.VectorFunctions.hyperplaneBucket(col("a"), 16, 8).as("hb"),
        graft.functions.VectorFunctions.hyperplaneBucket(col("a"), 16, 8, 7L).as("hb7"))
      .orderBy("id").collect()
    viaSql.zip(viaCols).foreach { case (s, c) =>
      assert(s.getDouble(1) == c.getDouble(1), s"dot diverged for id ${s.getLong(0)}")
      assert(s.getDouble(2) == c.getDouble(2), s"cosine diverged for id ${s.getLong(0)}")
      assert(s.getSeq[Float](3) == c.getSeq[Float](3), s"dequantize diverged for id ${s.getLong(0)}")
      assert(s.getLong(4) == c.getLong(4), s"bucket diverged for id ${s.getLong(0)}")
      assert(s.getLong(5) == c.getLong(5), s"seeded bucket diverged for id ${s.getLong(0)}")
    }
    assert(viaSql.last.getDouble(2) == 0.0, "zero-norm guard must yield 0.0")
  }

  test("poly_bucket SQL matches the Dsir Column form") {
    GraftFunctions.register(spark)
    val d = df(StructType(Seq(StructField("g", StringType))),
      Seq(Row("hello world"), Row("a"), Row("Ab cD"), Row("x" * 50)))
    d.createOrReplaceTempView("gf_pb")
    val viaSql = spark.sql("SELECT g, poly_bucket(g, 256) AS b FROM gf_pb ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaCol = d.select(col("g"), graft.operators.Dsir.polyBucket(256)(col("g")).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("r7 SQL forms (repetition/gopher/pii/ngram-hash) match the Column API") {
    GraftFunctions.register(spark)
    df(schema, Seq(
      Row(1L, "spam spam spam spam\nreal content\nspam spam spam spam"),
      Row(2L, "Perfectly Normal  prose with MANY distinct words."),
      Row(3L, "mail me: a.b@x.org or 10.0.0.1 or (555) 123-4567")))
      .createOrReplaceTempView("gf_r7")
    val viaSql = spark.sql(
      """SELECT id, repetition_profile(t) AS rep, gopher_keep(t) AS keep,
        |       redact_pii(t) AS clean, word_ngram_hashes(t, 2) AS gs
        |FROM gf_r7 ORDER BY id""".stripMargin).collect()
    val viaCol = spark.table("gf_r7").select(col("id"),
      TextFunctions.repetitionProfile(col("t")).as("rep"),
      TextFunctions.gopherRepetitionKeep(col("t")).as("keep"),
      TextFunctions.redactPii(col("t")).as("clean"),
      ColumnBridge.column(WordNgramHashes(ColumnBridge.expression(
        TextFunctions.normalizeForFingerprint(col("t"))), 2)).as("gs"))
      .orderBy("id").collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getStruct(1) == c.getStruct(1), s"profile diverged for id ${s.getLong(0)}")
      assert(s.getBoolean(2) == c.getBoolean(2), s"keep diverged for id ${s.getLong(0)}")
      assert(s.getString(3) == c.getString(3), s"redaction diverged for id ${s.getLong(0)}")
      assert(s.getSeq[Long](4) == c.getSeq[Long](4), s"ngrams diverged for id ${s.getLong(0)}")
    }
    assert(!viaSql(0).getBoolean(2) && viaSql(1).getBoolean(2))
    assert(viaSql(2).getString(3).contains("<EMAIL>") &&
      viaSql(2).getString(3).contains("<IP>") && viaSql(2).getString(3).contains("<PHONE>"))
  }
}
