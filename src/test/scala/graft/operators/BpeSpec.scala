package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** BPE merge training on the classic Sennrich fixture: golden merge
  * sequence, final-dict segmentation, unseen-word encode, stopping
  * rule, partition invariance. */
class BpeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // word freqs: low 5, lower 2, newest 6, widest 3 — the reference
  // merge sequence (freq-desc, pair-lex-asc ties):
  //   1 (e,s,9) 2 (es,t,9) 3 (l,o,7) 4 (lo,w,7)
  //   5 (e,w,6) 6 (ew,est,6) 7 (n,ewest,6) 8 (d,est,3)
  private def fixture = df(schema, Seq(
    Row(1L, "low low low low low"),
    Row(2L, "lower lower newest newest"),
    Row(3L, "newest newest newest newest"),
    Row(4L, "widest widest widest")))

  private lazy val model = Bpe.train(fixture, "text", numMerges = 8)

  test("golden merge sequence: ranks, pairs, frequencies") {
    assert(model.merges == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L),
      (4, "lo", "w", 7L), (5, "e", "w", 6L), (6, "ew", "est", 6L),
      (7, "n", "ewest", 6L), (8, "d", "est", 3L)))
  }

  test("final dict state segments every training word") {
    val seg = model.segments.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg == Map(
      "low" -> Seq("low"), "lower" -> Seq("low", "e", "r"),
      "newest" -> Seq("newest"), "widest" -> Seq("w", "i", "dest")))
  }

  test("segmentCorpus: seen words join, unseen words replay the merges") {
    val corpus = df(schema, Seq(Row(10L, "Low lowest  unknown")))
    val out = Bpe.segmentCorpus(corpus, "text", "doc_id", model)
      .collect().map(r => r.getInt(1) -> (r.getString(2), r.getSeq[String](3))).toMap
    assert(out(0) == ("low", Seq("low")))                  // seen (normalized case)
    assert(out(1) == ("lowest", Seq("low", "est")))        // unseen: merges apply
    assert(out(2) == ("unknown", "unknown".map(_.toString))) // unseen: nothing merges
  }

  test("stopping rule: best pair below minPairFreq ends training early") {
    val m = Bpe.train(df(schema, Seq(Row(1L, "ab cd ef"))), "text",
      numMerges = 5, minPairFreq = 2L)
    assert(m.merges.isEmpty)
    // and the dict is still the char-split state
    val seg = m.segments.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg("ab") == Seq("a", "b"))
  }

  test("tokenBudgetChunks: quota chunking on trained subword counts") {
    // subword counts under the trained model: low=1 lower=3 newest=1
    // widest=3 lowest=2 (lowest is UNSEEN — the fold replay path);
    // prefix sums 1,4,5,8,10; chunkTokens=4 → chunk = ⌊(cum−n)/4⌋ →
    // chunk0 "low lower" (4), chunk1 "newest widest" (4), chunk2
    // "lowest" (2). Blank docs emit nothing.
    val corpus = df(schema, Seq(
      Row(10L, "low lower newest widest lowest"), Row(11L, " ")))
    val out = Bpe.tokenBudgetChunks(corpus, "text", "doc_id", model, chunkTokens = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set((10L, 0), (10L, 1), (10L, 2)))
    assert(out((10L, 0)) == ((4L, "low lower")))
    assert(out((10L, 1)) == ((4L, "newest widest")))
    assert(out((10L, 2)) == ((2L, "lowest")))
    intercept[IllegalArgumentException](
      Bpe.tokenBudgetChunks(corpus, "text", "doc_id", model, chunkTokens = 0))
  }

  test("vocab: alphabet-then-merges layout; encodeIds: ordered ids, <unk> for unseen chars") {
    val v = Bpe.vocab(model).toMap
    assert(v.size == 18, v)
    assert(v("d") == 0L && v("w") == 9L, "alphabet binary-ascending from 0")
    assert(v("es") == 10L && v("dest") == 17L, "merge outputs in rank order after the alphabet")
    val corpus = df(schema, Seq(
      Row(10L, "Low lowest newest"), Row(11L, "widest unknown lower")))
    val out = Bpe.encodeIds(corpus, "text", "doc_id", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(10L) == Seq(13L, 13L, 11L, 16L))
    assert(out(11L) == Seq(9L, 2L, 17L, -1L, 4L, -1L, 4L, 5L, 9L, 4L, 13L, 1L, 6L))
  }

  test("trainBatched(1) IS sequential train; disjoint families batch to the sequential sequence") {
    // batch-1 delegation: identical merge table on the Sennrich fixture
    assert(Bpe.trainBatched(fixture, "text", numMerges = 8, batchSize = 1).merges
      == model.merges)
    // three symbol-disjoint pair families: one batched round must equal
    // three sequential rounds, counts and order included
    val dis = df(schema, Seq(
      Row(1L, "ab ab ab ab"), Row(2L, "cd cd cd"), Row(3L, "ef ef")))
    val seqM = Bpe.train(dis, "text", numMerges = 3, minPairFreq = 1L).merges
    val batM = Bpe.trainBatched(dis, "text", numMerges = 3, batchSize = 3,
      minPairFreq = 1L).merges
    assert(seqM == Seq((1, "a", "b", 4L), (2, "c", "d", 3L), (3, "e", "f", 2L)))
    assert(batM == seqM)
  }

  test("trainBatched skips interfering pairs within a round (resolves them next round)") {
    // "aba": pairs (a,b) and (b,a) both freq 2 and share symbols — the
    // round accepts only (a,b); round 2 re-counts and finds (ab, a),
    // exactly the sequential sequence
    val d = df(schema, Seq(Row(1L, "aba aba")))
    val seqM = Bpe.train(d, "text", numMerges = 2).merges
    val batM = Bpe.trainBatched(d, "text", numMerges = 2, batchSize = 2).merges
    assert(seqM == Seq((1, "a", "b", 2L), (2, "ab", "a", 2L)))
    assert(batM == seqM)
    // and the batched final dict segments identically
    val seg = Bpe.trainBatched(d, "text", numMerges = 2, batchSize = 2)
      .segments.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg("aba") == Seq("aba"))
    intercept[IllegalArgumentException](
      Bpe.trainBatched(d, "text", numMerges = 2, batchSize = 0))
    intercept[IllegalArgumentException](
      Bpe.trainBatched(d, "text", numMerges = 2, batchSize = 65))
  }

  test("decodeIds inverts encodeIds: eow renders as space, unk as <unk>, corrupt ids as <unk>") {
    val corpus = df(schema, Seq(
      Row(10L, "Low lowest newest"), Row(11L, "widest unknown lower")))
    val enc = Bpe.encodeIds(corpus, "text", "doc_id", model, eowId = Some(100L))
    // eow id appended after each word's subwords
    val ids = enc.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(ids(10L) == Seq(13L, 100L, 13L, 11L, 100L, 16L, 100L))
    val dec = Bpe.decodeIds(enc, "token_ids", "doc_id", model, eowId = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec(10L) == "low lowest newest")
    assert(dec(11L) == "widest <unk>n<unk>nown lower")
    // an id outside vocab ∪ {eow, unk} renders as <unk>, never vanishes
    val corrupt = df(StructType(Seq(StructField("doc_id", LongType),
        StructField("token_ids", ArrayType(LongType)))),
      Seq(Row(1L, Seq(13L, 999L, 100L))))
    val d2 = Bpe.decodeIds(corrupt, "token_ids", "doc_id", model, eowId = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2(1L) == "low<unk>")
    // ambiguous marker ids fail loudly
    intercept[IllegalArgumentException](
      Bpe.encodeIds(corpus, "text", "doc_id", model, eowId = Some(3L)))
    intercept[IllegalArgumentException](
      Bpe.decodeIds(enc, "token_ids", "doc_id", model, unkId = 100L, eowId = Some(100L)))
  }

  test("round trip: decode(encode(x)) == normalized x when every char is in the alphabet") {
    // training corpus supplies the alphabet; the round-trip corpus
    // reuses those characters in unseen word shapes (merge folds replay)
    val corpus = df(schema, Seq(
      Row(1L, "  Low LOWER newest\tlowest "), Row(2L, "wid didoODD dts"),
      Row(3L, "o"), Row(4L, "newestnewest low est")))
    val eow = Bpe.vocab(model).size.toLong
    val enc = Bpe.encodeIds(corpus, "text", "doc_id", model, eowId = Some(eow))
    val dec = Bpe.decodeIds(enc, "token_ids", "doc_id", model, eowId = Some(eow))
    import org.apache.spark.sql.functions.col
    val normalized = corpus.select(col("doc_id"),
        graft.functions.TextFunctions.normalizeForFingerprint(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = dec.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    out.foreach { case (id, t) => assert(t == normalized(id), s"doc $id") }
  }

  test("merge sequence is invariant to corpus partitioning") {
    val text = (0 until 30).map(i => s"alpha${i % 3} beta gamma beta").mkString(" ")
    val corpus = df(schema, Seq(Row(1L, text), Row(2L, text + " delta beta")))
    def run(parts: Int) =
      Bpe.train(corpus.repartition(parts), "text", numMerges = 6).merges
    assert(run(1) == run(7))
  }
}
