package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication operators for training-data pipelines. None of these
  * exist in the reference (its dedup story is "write pks, upsert replaces
  * them" — `lib/forklift/transports/mysql.rb:78-87`); they are the
  * scale-path additions SURVEY.md §7.1 `ext/` calls for.
  *
  * Scale design notes (100 TB):
  *  - exact dedup shuffles an 8-byte fingerprint, never the document text;
  *  - MinHash/SimHash candidate generation is linear (hash + band
  *    explode + groupBy) — the quadratic verify step only ever runs
  *    within LSH buckets;
  *  - all joins key on narrow integer columns so AQE can pick
  *    broadcast/skew strategies.
  */
object Dedup {

  /** Exact dedup: keep the lowest-`idCol` row per normalized-text
    * fingerprint. Hash-groupBy, one shuffle of (fingerprint, id). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val w = Window.partitionBy(fp).orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Word n-gram shingles of the normalized text (lowercase, whitespace
    * collapsed) as an array column — the input unit for MinHash/Jaccard.
    * Docs with fewer than `n` tokens yield an EMPTY array: `sequence` with
    * start > stop produces a descending range, so the short-doc case must
    * be guarded explicitly or slice(toks, 0, n) throws at runtime. */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = split(TextFunctions.normalizeForFingerprint(c), " ")
    val count = size(toks) - (n - 1)
    when(count <= 0, array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
      .otherwise(transform(sequence(lit(1), count),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** MinHash signature: for each of `numHashes` seeds, the min over
    * shingles of `xxhash64(seed, shingle)` — computed per-row, no shuffle.
    * Empty shingle sets get Long.MaxValue sentinels (never collide). */
  def minhashSignature(shinglesCol: Column, numHashes: Int = 64): Column =
    array((0 until numHashes).map { seed =>
      coalesce(
        array_min(transform(shinglesCol, s => xxhash64(lit(seed), s))),
        lit(Long.MaxValue))
    }: _*)

  /** MinHash+LSH candidate pairs: signature → `bands` bands of `rowsPerBand`
    * hashes → hash each band → explode → self-join within (band, bucket).
    * Returns (idA, idB, estJaccard) with idA < idB, estJaccard = fraction
    * of matching signature positions, filtered at `threshold`.
    *
    * Linear in corpus size until the in-bucket join; bucket sizes are
    * bounded w.h.p. for realistic thresholds. Candidates are distinct-ed
    * across bands. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int = 64, bands: Int = 16,
                        shingleLen: Int = 3, threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    // Materialize shingle arrays behind a cache barrier FIRST: without it
    // CollapseProject inlines the shingle expression into all `numHashes`
    // minhash lambdas and the normalize+split regex work runs 64× per row
    // (measured: 40s → ~2s at sf0.01 for exactly this reason).
    val shingled = df.select(col(idCol).as("_id"),
      shingles(col(textCol), shingleLen).as("_sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = shingled.select(col("_id"),
      minhashSignature(col("_sh"), numHashes).as("_sig"))
      // signatures are reused by the band-explode AND the verify join below
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Narrow band rows: (band, bucket, id) — the 64-long signature array
    // stays out of the self-join, which only shuffles 24 bytes/row.
    val banded = sig.select(col("_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("_band", "_bucket")))
    val candidates = banded.select(col("_band"), col("_bucket"), col("_id").as("id_a"))
      .join(banded.select(col("_band"), col("_bucket"), col("_id").as("id_b")),
        Seq("_band", "_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()   // dedup across bands BEFORE the signature compare
    val out = candidates
      .join(sig.select(col("_id").as("id_a"), col("_sig").as("_sig_a")), Seq("id_a"))
      .join(sig.select(col("_id").as("id_b"), col("_sig").as("_sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("_sig_a"), col("_sig_b"), (x, y) => (x === y).cast("int")),
          v => v === 1)).cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize the (small) candidate set so the corpus-sized shingle
    // and signature caches can be released immediately — they must not
    // leak for the life of the session. Callers may unpersist the result.
    out.count()
    shingled.unpersist(false)
    sig.unpersist(false)
    out
  }

  /** MinHash-LSH dedup: drop every doc that is a candidate-duplicate of a
    * lower-id doc (transitive chains collapse to the min root greedily —
    * one connected-components-free pass, the standard near-dup policy). */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleLen: Int = 3, threshold: Double = 0.7): DataFrame = {
    val losers = minhashCandidates(df, textCol, idCol, numHashes, bands, shingleLen, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by token
    * hash bit, sign → bit. Near-dups differ in few bits (hamming ≤ k).
    * Computed per-row from codegen'd expressions. */
  def simhash(c: Column): Column = {
    val toks = split(TextFunctions.normalizeForFingerprint(c), " ")
    val bits = (0 until 64).map { b =>
      val contrib = aggregate(toks,
        lit(0),
        (acc, t) => acc + when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(contrib > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup candidates: block on 4×16-bit chunks (a pair within
    * hamming distance ≤3 of 64 bits must agree on ≥1 chunk — pigeonhole),
    * then verify hamming distance exactly via popcount. Linear blocking,
    * in-bucket verify only. */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("_id"), simhash(col(textCol)).as("_sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunked = withSim.select(col("_id"), col("_sim"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("_sim"), i * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("_chunk_idx", "_chunk")))
    val l = chunked.select(col("_chunk_idx"), col("_chunk"), col("_id").as("id_a"), col("_sim").as("_sim_a"))
    val r = chunked.select(col("_chunk_idx"), col("_chunk"), col("_id").as("id_b"), col("_sim").as("_sim_b"))
    val out = l.join(r, Seq("_chunk_idx", "_chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_sim_a").bitwiseXOR(col("_sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize, then free the corpus-sized simhash cache
    withSim.unpersist(false)
    out
  }

  /** Exact n-gram Jaccard similarity pairs within a blocking key (e.g.
    * language + length bucket): the quadratic verify is confined to
    * blocks, the standard exact-verify companion to MinHash. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        blockCol: Column, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val prep = df.select(col(idCol).as("_id"), blockCol.as("_block"),
      array_distinct(shingles(col(textCol), n)).as("_sh"))
    val l = prep.select(col("_block"), col("_id").as("id_a"), col("_sh").as("_sh_a"))
    val r = prep.select(col("_block"), col("_id").as("id_b"), col("_sh").as("_sh_b"))
    l.join(r, Seq("_block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("double") /
          size(array_union(col("_sh_a"), col("_sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-dup pairs: LSH-bucket on random hyperplanes,
    * verify cosine within buckets. `dim` is the embedding dimensionality. */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String, dim: Int,
                       planes: Int = 12, threshold: Double = 0.95): DataFrame = {
    val keyed = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      VectorFunctions.hyperplaneBucket(col(vecCol), dim, planes).as("_bucket"))
    val l = keyed.select(col("_bucket"), col("_id").as("id_a"), col("_v").as("_v_a"))
    val r = keyed.select(col("_bucket"), col("_id").as("id_b"), col("_v").as("_v_b"))
    l.join(r, Seq("_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("_v_a"), col("_v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
