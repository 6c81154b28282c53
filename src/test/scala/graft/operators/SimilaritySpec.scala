package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** ANN search: exact brute-force semantics and IVF recall vs that
  * baseline (probing all cells must reproduce it exactly). */
class SimilaritySpec extends SparkSpec {

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(FloatType))))

  /** Clustered corpus: `nClusters` centers, points = center + small noise
    * — the IVF-friendly distribution. */
  private def clustered(nClusters: Int, perCluster: Int, dim: Int) = {
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(nClusters)(Array.fill(dim)(rnd.nextFloat() * 10 - 5))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until perCluster
    } yield Row((ci.toLong * perCluster) + j,
      c.map(x => x + (rnd.nextFloat() * 0.2f - 0.1f)).toSeq)
    df(vecSchema, rows)
  }

  test("bruteForceTopK: exact scores on a hand-crafted corpus") {
    val d = df(vecSchema, Seq(
      Row(1L, Seq(1.0f, 0.0f)), Row(2L, Seq(0.0f, 1.0f)),
      Row(3L, Seq(1.0f, 1.0f)), Row(4L, Seq(-1.0f, 0.0f))))
    val out = Similarity.bruteForceTopK(d, "v", "vec_id", Seq(1.0f, 0.0f), k = 3).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L, 2L))
    assert(out(0).getAs[Double]("score") == 1.0)
    assert(math.abs(out(1).getAs[Double]("score") - math.sqrt(0.5)) < 1e-9)
    assert(out(2).getAs[Double]("score") == 0.0)
  }

  test("bruteForceTopKBatch: per-query top-k over one corpus scan") {
    val corpus = clustered(4, 25, 8)
    val queries = corpus.filter(col("vec_id").isin(0L, 30L))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val out = Similarity.bruteForceTopKBatch(corpus, "v", "vec_id", queries, "qv", "q_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 10)
    // each query's own vector is its best match
    val best = out.groupBy(_._1).map { case (q, rows) => q -> rows.maxBy(r => (r._3, -r._2))._2 }
    assert(best(0L) == 0L && best(30L) == 30L)
    // bit-identical to the window formulation it replaced (heap priority
    // is the sortable-bits transform of the same double; ties -> low id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    val ref = corpus.crossJoin(broadcast(queries))
      .select(col("q_id"), col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("v"), col("qv")).as("score"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2) + 0.0)).toSet
    assert(out.toSet == ref)
  }

  test("ivfTopKBatch with nprobe = nlist == bruteForceTopKBatch; partial probe recall high") {
    val corpus = clustered(8, 30, 8)
    val centroids = Similarity.trainCentroids(corpus, "v", "vec_id", nlist = 8)
    val index = Similarity.buildIvfIndex(corpus, "v", centroids)
    val qSeq = Seq(0L, 65L, 130L).map { id =>
      id -> corpus.filter(col("vec_id") === id).head().getSeq[Float](1)
    }
    val full = Similarity.ivfTopKBatch(index, "v", "vec_id", "_cell", centroids, qSeq, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val qDf = corpus.filter(col("vec_id").isin(0L, 65L, 130L))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val brute = Similarity.bruteForceTopKBatch(corpus, "v", "vec_id", qDf, "qv", "q_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full == brute, "probing every cell must reproduce brute force")
    // nprobe=2 of 8 on clustered data: recall@10 >= 0.8 per query
    val part = Similarity.ivfTopKBatch(index, "v", "vec_id", "_cell", centroids, qSeq, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    qSeq.foreach { case (qid, _) =>
      val bruteIds = brute.filter(_._1 == qid).map(_._2)
      val gotIds = part.getOrElse(qid, Array.empty).map(_._2).toSet
      assert(gotIds.intersect(bruteIds).size >= 8, s"recall@10 for query $qid")
    }
  }

  test("IVF with nprobe = nlist reproduces brute force exactly (recall 1.0)") {
    val corpus = clustered(8, 30, 8)
    val q = corpus.filter(col("vec_id") === 17L).head().getSeq[Float](1)
    val centroids = Similarity.trainCentroids(corpus, "v", "vec_id", nlist = 8, refineIterations = 1)
    val index = Similarity.buildIvfIndex(corpus, "v", centroids)
    val ivf = Similarity.ivfTopK(index, "v", "vec_id", "_cell", centroids, q, k = 10, nprobe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val brute = Similarity.bruteForceTopK(corpus, "v", "vec_id", q, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivf == brute)
  }

  test("IVF recall@10 with nprobe=2 of 8 on clustered data is high") {
    val corpus = clustered(8, 30, 8)
    val q = corpus.filter(col("vec_id") === 100L).head().getSeq[Float](1)
    val centroids = Similarity.trainCentroids(corpus, "v", "vec_id", nlist = 8, refineIterations = 1)
    val index = Similarity.buildIvfIndex(corpus, "v", centroids)
    val ivf = Similarity.ivfTopK(index, "v", "vec_id", "_cell", centroids, q, k = 10, nprobe = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val brute = Similarity.bruteForceTopK(corpus, "v", "vec_id", q, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"recall@10 = $recall")
  }

  test("materialized IVF index: probes read ONLY the probed cells' files (partition pruning)") {
    val corpus = clustered(8, 20, 8)
    val centroids = Similarity.trainCentroids(corpus, "v", "vec_id", nlist = 8)
    val idx = tmpDir("graft_ivf_idx_") + "/index"
    Similarity.writeIvfIndex(corpus, "v", centroids, idx)
    val q = corpus.filter(col("vec_id") === 0L).head().getSeq[Float](1)
    val qv = q.map(_.toDouble).toArray
    val probed = centroids.map { case (i, cv) =>
      (i, cv.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy(_._2).take(2).map(_._1).toSet
    val pruned = spark.read.parquet(idx)
      .filter(col("_cell").isin(probed.toSeq: _*))
    pruned.collect() // execute so scan metrics populate
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // the cell filter must be a PARTITION filter (pruned at file listing,
    // not evaluated per-row), and only the probed cells' files read
    assert(scan.partitionFilters.exists(_.toString.contains("_cell")),
      s"cell filter must prune partitions: ${scan.partitionFilters}")
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles == probed.size,
      s"expected ${probed.size} files (one per probed cell), scanned $numFiles")
    // and the probe result matches the in-memory index path
    val a = Similarity.ivfTopKIndexed(spark, idx, "v", "vec_id", centroids, q, k = 5, nprobe = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val b = Similarity.ivfTopK(Similarity.buildIvfIndex(corpus, "v", centroids),
      "v", "vec_id", "_cell", centroids, q, k = 5, nprobe = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(a == b)
  }

  test("ivfIndexAppend == full rebuild on frozen centroids; untouched cells never rewritten") {
    val corpus = clustered(8, 20, 8)
    val base = corpus.filter(col("vec_id") < 150L)
    val delta = corpus.filter(col("vec_id") >= 150L) // last half-cluster
    val centroids = Similarity.trainCentroids(base, "v", "vec_id", nlist = 8)
    val idx = tmpDir("graft_ivf_app_") + "/index"
    Similarity.writeIvfIndex(base, "v", centroids, idx)
    val touched = Similarity.buildIvfIndex(delta, "v", centroids)
      .select("_cell").distinct().collect().map(_.getInt(0)).toSet
    val untouched = Similarity.buildIvfIndex(base, "v", centroids)
      .select("_cell").distinct().collect().map(_.getInt(0)).toSet -- touched
    assert(untouched.nonEmpty, "fixture must leave some cells untouched")
    def cellFiles(cell: Int): Set[String] = {
      val dir = java.nio.file.Paths.get(idx, s"_cell=$cell")
      val s = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
      } finally s.close()
    }
    val before = untouched.map(c => c -> cellFiles(c)).toMap
    Similarity.ivfIndexAppend(delta, "v", centroids, idx)
    untouched.foreach(c => assert(cellFiles(c) == before(c),
      s"untouched cell $c was rewritten by the append"))
    // the merged index is row-identical to a from-scratch rebuild over
    // the union corpus with the SAME centroids...
    val idx2 = tmpDir("graft_ivf_reb_") + "/index"
    Similarity.writeIvfIndex(corpus, "v", centroids, idx2)
    def rows(p: String) = spark.read.parquet(p).select("vec_id", "_cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(idx) == rows(idx2))
    // ...and so is the probe
    val q = corpus.filter(col("vec_id") === 155L).head().getSeq[Float](1)
    def probe(p: String) = Similarity.ivfTopKIndexed(spark, p, "v", "vec_id",
      centroids, q, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe(idx) == probe(idx2))
  }

  test("IVF index assigns every vector to a cell in range") {
    val corpus = clustered(4, 10, 8)
    val centroids = Similarity.trainCentroids(corpus, "v", "vec_id", nlist = 4)
    val cells = Similarity.buildIvfIndex(corpus, "v", centroids)
      .select("_cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until 4).toSet))
  }

  test("groupCentroids: hand-computed elementwise means; assemble repacks in dim order") {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", ArrayType(FloatType))))
    val d = df(schema, Seq(
      Row("a", Seq(1.0f, 2.0f, 3.0f)),
      Row("a", Seq(3.0f, 2.0f, 1.0f)),
      Row("b", Seq(10.0f, 0.0f, -10.0f))))
    val flat = Similarity.groupCentroids(d, "v", "g")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(flat == Map(("a", 0) -> 2.0, ("a", 1) -> 2.0, ("a", 2) -> 2.0,
      ("b", 0) -> 10.0, ("b", 1) -> 0.0, ("b", 2) -> -10.0))
    val packed = Similarity.assembleCentroids(Similarity.groupCentroids(d, "v", "g"), "g")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(packed("a") == Seq(2.0, 2.0, 2.0) && packed("b") == Seq(10.0, 0.0, -10.0))
  }

  // ---- product quantization ----

  test("trainPq: refineIterations=0 books ARE the seed slices; refined books are DECIMAL-exact means") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("v", ArrayType(FloatType))))
    // 4-dim, m=2 sub of 2 dims, k=2 codes; seeds = ids 0,1
    val d = df(schema, Seq(
      Row(0L, Seq(0.0f, 0.0f, 10.0f, 10.0f)),
      Row(1L, Seq(8.0f, 8.0f, 0.0f, 0.0f)),
      Row(2L, Seq(1.0f, 1.0f, 9.0f, 9.0f)),   // sub0 -> code 0, sub1 -> code 0
      Row(3L, Seq(7.0f, 7.0f, 1.0f, 1.0f)))) // sub0 -> code 1, sub1 -> code 1
    val seeds = Similarity.trainPq(d, "v", "vec_id", m = 2, k = 2, refineIterations = 0)
    assert(seeds(0)(0).toSeq == Seq(0.0, 0.0) && seeds(0)(1).toSeq == Seq(8.0, 8.0))
    assert(seeds(1)(0).toSeq == Seq(10.0, 10.0) && seeds(1)(1).toSeq == Seq(0.0, 0.0))
    val books = Similarity.trainPq(d, "v", "vec_id", m = 2, k = 2, refineIterations = 1)
    // Lloyd means over the assigned members: sub0 code0 = mean([0,0],[1,1]),
    // code1 = mean([8,8],[7,7]); sub1 code0 = mean([10,10],[9,9]), code1 = mean([0,0],[1,1])
    assert(books(0)(0).toSeq == Seq(0.5, 0.5) && books(0)(1).toSeq == Seq(7.5, 7.5))
    assert(books(1)(0).toSeq == Seq(9.5, 9.5) && books(1)(1).toSeq == Seq(0.5, 0.5))
  }

  test("trainPq: empty codes keep their seed sub-vector; dim must divide m") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("v", ArrayType(FloatType))))
    // both non-seed rows sit on code 0 in both subspaces; code 1 gets no
    // members beyond its own seed -> refined book keeps/means accordingly
    val d = df(schema, Seq(
      Row(0L, Seq(0.0f, 0.0f)),
      Row(1L, Seq(100.0f, 100.0f)),
      Row(2L, Seq(0.5f, 0.5f))))
    val books = Similarity.trainPq(d, "v", "vec_id", m = 1, k = 2, refineIterations = 1)
    // code1's only member is its seed itself -> mean is the seed
    assert(books(0)(1).toSeq == Seq(100.0, 100.0))
    assert(books(0)(0).toSeq == Seq(0.25, 0.25))
    intercept[IllegalArgumentException] {
      Similarity.trainPq(d, "v", "vec_id", m = 3, k = 2)
    }
  }

  test("pqEncode: argmin per subspace with ties to the lower code") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("v", ArrayType(FloatType))))
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(4.0, 4.0)),
      Array(Array(1.0, 1.0), Array(3.0, 3.0)))
    val d = df(schema, Seq(
      Row(0L, Seq(0.1f, 0.1f, 3.1f, 3.1f)),  // codes (0, 1)
      Row(1L, Seq(2.0f, 2.0f, 2.0f, 2.0f)))) // equidistant BOTH subspaces -> ties -> (0, 0)
    val codes = Similarity.pqEncode(d, "v", books)
      .select(col("vec_id"), col("_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == Seq(0, 1))
    assert(codes(1L) == Seq(0, 0))
  }

  test("pqTopKAdc: distance is the fixed-order sum of per-subspace table lookups") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("v", ArrayType(FloatType))))
    val d = df(schema, Seq(
      Row(0L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      Row(1L, Seq(4.0f, 4.0f, 0.0f, 0.0f)),
      Row(2L, Seq(4.0f, 4.0f, 3.0f, 3.0f))))
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(4.0, 4.0)),
      Array(Array(0.0, 0.0), Array(3.0, 3.0)))
    val enc = Similarity.pqEncode(d, "v", books)
    val q = Seq(0.0f, 0.0f, 0.0f, 0.0f)
    val out = Similarity.pqTopKAdc(enc, "_code", "vec_id", books, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // codes: v0=(0,0) d=0; v1=(1,0) d=32; v2=(1,1) d=32+18=50
    assert(out.toSeq == Seq((0L, 0.0), (1L, 32.0), (2L, 50.0)))
  }

  test("PQ recall: ADC shortlist + exact re-rank recovers brute-force top-10 on clustered data") {
    val corpus = clustered(8, 40, 16)
    val q = corpus.filter(col("vec_id") === 0L).select("v").head().getSeq[Float](0)
    val books = Similarity.trainPq(corpus, "v", "vec_id", m = 4, k = 8, refineIterations = 1)
    val enc = Similarity.pqEncode(corpus, "v", books)
    val short = Similarity.pqTopKAdc(enc, "_code", "vec_id", books, q, k = 40)
    val reranked = short.join(corpus, "vec_id")
      .select(col("vec_id"), graft.functions.VectorFunctions.cosine(col("v"), typedLit(q)).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteForceTopK(corpus, "v", "vec_id", q, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (reranked & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 $recall below 0.8: ADC shortlist missed the true neighborhood")
  }

  test("IVF + PQ compose (the FAISS IVF-PQ shape): ADC inside probed cells, exact re-rank") {
    val corpus = clustered(8, 40, 16)
    val centroids = Similarity.trainCentroids(corpus, "v", "vec_id", nlist = 8)
    val indexed = Similarity.buildIvfIndex(corpus, "v", centroids)
    val books = Similarity.trainPq(corpus, "v", "vec_id", m = 4, k = 8)
    val enc = Similarity.pqEncode(indexed, "v", books).select("vec_id", "_cell", "_code")
    val q = corpus.filter(col("vec_id") === 5L).select("v").head().getSeq[Float](0)
    val qv = q.map(_.toDouble).toArray
    def l2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val probe = centroids.map { case (i, cv) => (i, l2(qv, cv)) }.sortBy(_._2).take(4).map(_._1)
    val short = Similarity.pqTopKAdc(
      enc.filter(col("_cell").isin(probe.toIndexedSeq: _*)), "_code", "vec_id", books, q, k = 30)
    val reranked = short.join(corpus, "vec_id")
      .select(col("vec_id"), graft.functions.VectorFunctions.cosine(col("v"), typedLit(q)).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteForceTopK(corpus, "v", "vec_id", q, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert((reranked & exact).size >= 8,
      s"IVF-PQ recall@10 too low: ${(reranked & exact).size}/10")
  }

  test("trainPq is partition-invariant (DECIMAL-exact Lloyd means)") {
    val corpus = clustered(6, 30, 8)
    val b1 = Similarity.trainPq(corpus, "v", "vec_id", m = 2, k = 4, refineIterations = 2)
    val b2 = Similarity.trainPq(corpus.repartition(13), "v", "vec_id", m = 2, k = 4, refineIterations = 2)
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq == b2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("pqEncode codes bound by k; every subspace emits a code for every row") {
    val corpus = clustered(4, 20, 8)
    val books = Similarity.trainPq(corpus, "v", "vec_id", m = 2, k = 4, refineIterations = 1)
    val rows = Similarity.pqEncode(corpus, "v", books)
      .select(col("_code")).collect().map(_.getSeq[Int](0))
    assert(rows.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 4)))
  }

  test("sq8: train ranges, hand-checked codes, constant dim encodes 0") {
    val d = df(vecSchema, Seq(
      Row(1L, Seq(0.0f, 10.0f, 5.0f)),
      Row(2L, Seq(10.0f, 0.0f, 5.0f)),
      Row(3L, Seq(5.0f, 5.0f, 5.0f))))
    val stats = Similarity.sq8Train(d, "v")
    assert(stats.toSeq == Seq((0.0, 10.0), (0.0, 10.0), (5.0, 5.0)))
    val codes = Similarity.sq8Encode(d, "v", stats)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(codes(1L) == Seq(-128, 127, 0), "range endpoints hit the boundary codes")
    assert(codes(2L) == Seq(127, -128, 0))
    // mid-range 5.0: floor(5*25.5 + 0.5) - 128 = 127.5+0.5=128 -> floor 128 - 128 = 0
    assert(codes(3L) == Seq(0, 0, 0))
  }

  test("sq8Error: exact on boundary codes, bounded by half a quantization step") {
    val d = df(vecSchema, Seq(
      Row(1L, Seq(0.0f, 10.0f, 5.0f)),
      Row(2L, Seq(10.0f, 0.0f, 5.0f)),
      Row(3L, Seq(5.0f, 5.0f, 5.0f)),
      Row(4L, Seq(3.3f, 7.7f, 5.0f))))
    val stats = Similarity.sq8Train(d, "v")
    val errs = Similarity.sq8Error(
        Similarity.sq8Encode(d, "v", stats), "v", "_sq", stats)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("err_fp")).toMap
    assert(errs(1L) == 0L, "min and max dequantize exactly; constant dim err 0")
    // half-step bound: (mx-mn)/255/2 = 10/510 ~ 0.0196; + rounding slack
    val halfStep = (1e9 * 10.0 / 255.0 / 2.0).toLong
    assert(errs.values.forall(_ <= halfStep + 1),
      s"worst-dim error within half a step, got ${errs.values.max}")
    assert(errs(4L) > 0L, "interior values carry real quantization error")
  }

  test("sq8Encode: out-of-range values clamp to boundary codes instead of overflowing") {
    val trainStats = Array((0.0, 10.0), (0.0, 10.0))
    val drifted = df(StructType(Seq(
        StructField("vec_id", LongType), StructField("v", ArrayType(FloatType)))),
      Seq(Row(1L, Seq(-5.0f, 15.0f))))
    val c = Similarity.sq8Encode(drifted, "v", trainStats).head().getSeq[Int](2)
    assert(c == Seq(-128, 127))
  }

  test("sq8TopK: integer ranking matches the dequantized-dot ranking; dim guard") {
    val corpus = clustered(3, 15, 6)
    val stats = Similarity.sq8Train(corpus, "v")
    val q = corpus.orderBy(col("vec_id")).select(col("v")).head().getSeq[Float](0)
    val enc = Similarity.sq8Encode(corpus, "v", stats)
    val got = Similarity.sq8TopK(enc, "_sq", "vec_id", stats, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent local replay: dot(q, dequant(codes)) ordering, ties by id
    val local = enc.select(col("vec_id"), col("_sq")).collect().map { r =>
      val codes = r.getSeq[Int](1)
      val s = stats.indices.map { i =>
        val (mn, mx) = stats(i)
        if (mx == mn) 0.0
        else q(i).toDouble / (255.0 / (mx - mn)) * (codes(i) + 128).toDouble
      }.sum
      (r.getLong(0), s)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(got.map(_._1).toSeq == local.map(_._1).toSeq,
      "integer asymmetric ranking == dequantized-dot ranking")
    assert(got.map(_._2).toSeq == got.map(_._2).sorted(Ordering[Long].reverse).toSeq)
    intercept[IllegalArgumentException](
      Similarity.sq8TopK(enc, "_sq", "vec_id", stats, q.take(3), k = 5))
  }

  private val labeledSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  test("knnClassify: planted two-cluster labels transfer to held-out queries") {
    // corpus: 10 points near e1 labeled 0, 10 near e2 labeled 1 (tiny
    // deterministic jitter keeps cosine order unambiguous)
    val rows = (0 until 10).map(i => Row(i.toLong,
        Seq(1.0f, 0.001f * i, 0.0f), 0)) ++
      (10 until 20).map(i => Row(i.toLong, Seq(0.001f * i, 1.0f, 0.0f), 1))
    val corpus = df(labeledSchema, rows)
    val queries = df(StructType(Seq(StructField("q_id", LongType),
        StructField("qv", ArrayType(FloatType)))),
      Seq(Row(100L, Seq(0.9f, 0.1f, 0.0f)), Row(101L, Seq(0.1f, 0.9f, 0.0f))))
    val out = Similarity.knnClassify(corpus, "v", "vec_id", "label",
        queries, "qv", "q_id", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out(100L) == ((0, 5L)), s"got $out")
    assert(out(101L) == ((1, 5L)))
  }

  test("knnClassify: vote ties break to the smallest label") {
    // 2 neighbors each of labels 7 and 3 at identical distances from
    // the query -> 2-2 tie at k=4 -> label 3 wins
    val rows = Seq(
      Row(1L, Seq(1.0f, 0.0f), 7), Row(2L, Seq(1.0f, 0.0f), 7),
      Row(3L, Seq(1.0f, 0.0f), 3), Row(4L, Seq(1.0f, 0.0f), 3),
      Row(5L, Seq(-1.0f, 0.0f), 9))
    val corpus = df(labeledSchema, rows)
    val queries = df(StructType(Seq(StructField("q_id", LongType),
        StructField("qv", ArrayType(FloatType)))),
      Seq(Row(0L, Seq(1.0f, 0.0f))))
    val out = Similarity.knnClassify(corpus, "v", "vec_id", "label",
        queries, "qv", "q_id", k = 4).collect()
    assert(out.length == 1)
    assert(out(0).getInt(1) == 3 && out(0).getLong(2) == 2L)
  }

  /** Local replay of the integer-quantized greedy MMR trajectory. */
  private def mmrRef(cands: Seq[(Long, Seq[Float])], q: Seq[Float], k: Int,
                     ln: Long = 7L, ld: Long = 10L,
                     qs: Long = 1000L): Seq[(Long, Long, Long, Long)] = {
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * qs).toLong)
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qq = quant(q)
    val pool = cands.map { case (id, v) =>
      (id, quant(v), dot(quant(v), qq)) }
    var sel = Vector.empty[(Long, Long, Long, Long)] // rank,id,rel,score
    (1 to math.min(k, pool.size)).foreach { i =>
      val chosen = sel.map(_._2).toSet
      val scored = pool.filterNot(p => chosen(p._1)).map { case (id, v, rel) =>
        val ms = if (sel.isEmpty) 0L
          else sel.map(s => dot(v, pool.find(_._1 == s._2).get._2)).max
        val score = if (sel.isEmpty) ln * rel else ln * rel - (ld - ln) * ms
        (id, rel, score)
      }
      val best = scored.minBy { case (id, _, sc) => (-sc, id) }
      sel :+= ((i.toLong, best._1, best._2, best._3))
    }
    sel
  }

  test("mmrSelect: skips the near-duplicate of the best hit") {
    // candidates 1 and 2 nearly identical (both highly relevant);
    // 3 moderately relevant but diverse. The query must NOT coincide
    // with the dup pair (rel would then equal sim and the diversity
    // term could never separate them) -> greedy picks 2 then 3, never 1
    val cands = Seq[(Long, Seq[Float])](
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.999f, 0.01f), 3L -> Seq(0.5f, 0.8f))
    val q = Seq(0.9f, 0.44f)
    val out = Similarity.mmrSelect(
        df(vecSchema, cands.map { case (id, v) => Row(id, v) }),
        "v", "vec_id", q, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == mmrRef(cands, q, 2))
    assert(out.map(_._2).toSeq == Seq(2L, 3L), s"got ${out.toSeq}")
  }

  test("mmrSelect: exact trajectory equality with the local reference on a random pool") {
    val rnd = new scala.util.Random(31)
    val cands = (0 until 60).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val q = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
    val out = Similarity.mmrSelect(
        df(vecSchema, cands.map { case (id, v) => Row(id, v) }),
        "v", "vec_id", q, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == mmrRef(cands, q, 6))
  }

  test("mmrSelect: k beyond the pool returns the whole pool; guards fire") {
    val cands = Seq[(Long, Seq[Float])](1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.0f, 1.0f))
    val out = Similarity.mmrSelect(
        df(vecSchema, cands.map { case (id, v) => Row(id, v) }),
        "v", "vec_id", Seq(1.0f, 0.0f), k = 5).collect()
    assert(out.length == 2)
    intercept[IllegalArgumentException](Similarity.mmrSelect(
      df(vecSchema, Nil), "v", "vec_id", Seq(1.0f), k = 0))
  }

  test("embeddingDrift: hand-computed per-dim means, pooled sd, standardized shift") {
    val sch = StructType(Seq(StructField("emb", ArrayType(FloatType))))
    // A dims: (0,2) / (0,2); B dims: (1,3) / (3,5) -> means (1,1) vs
    // (2,4), per-dim var 2 on every side -> sd = sqrt(2), z = (1,3)/sqrt(2)
    val a = df(sch, Seq(Row(Seq(0.0f, 0.0f)), Row(Seq(2.0f, 2.0f))))
    val b = df(sch, Seq(Row(Seq(1.0f, 3.0f)), Row(Seq(3.0f, 5.0f))))
    val out = Similarity.embeddingDrift(a, b, "emb")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 2L)
    assert(math.abs(out(0).getDouble(5) - 1.0) < 1e-9, out(0).toString)
    assert(math.abs(out(1).getDouble(5) - 3.0) < 1e-9, out(1).toString)
    assert(math.abs(out(0).getDouble(6) - math.sqrt(2.0)) < 1e-9)
    assert(math.abs(out(0).getDouble(7) - 1.0 / math.sqrt(2.0)) < 1e-9)
    assert(math.abs(out(1).getDouble(7) - 3.0 / math.sqrt(2.0)) < 1e-9)
    // constant dim on both sides: zero pooled sd -> null std_delta
    val c = df(sch, Seq(Row(Seq(1.0f)), Row(Seq(1.0f))))
    val z = Similarity.embeddingDrift(c, c, "emb").head()
    assert(z.getDouble(5) == 0.0 && z.isNullAt(7), z.toString)
  }

  test("pcaPowerComponent: rank-one data recovers the planted direction exactly") {
    val sch = StructType(Seq(StructField("emb", ArrayType(FloatType))))
    // points t·(3,4,0,0), t ∈ -2..2: scatter = 5e7·uuᵀ, top component
    // ∝ u with max-normalized loadings (750000, 1000000, 0, 0) — a
    // FIXED point of the integer iteration from v0 = e0; variance along
    // the unit direction is Σ(5t)²/5 = 50 exactly
    val rows = (-2 to 2).map(t =>
      Row(Seq(3.0f * t, 4.0f * t, 0.0f, 0.0f)))
    val out = Similarity.pcaPowerComponent(df(sch, rows), "emb", dim = 4)
      .collect().sortBy(_.getInt(0))
    assert(out.map(_.getLong(1)).toSeq == Seq(750000L, 1000000L, 0L, 0L),
      out.mkString(";"))
    assert(out.head.getLong(2) == 5L && out.head.getDouble(3) == 50.0)
    // mean-centering: the same direction shifted off origin must give
    // the same component (scatter is translation-invariant)
    val shifted = (-2 to 2).map(t =>
      Row(Seq(3.0f * t + 10f, 4.0f * t + 20f, 7.0f, 7.0f)))
    val o2 = Similarity.pcaPowerComponent(df(sch, shifted), "emb", dim = 4)
      .collect().sortBy(_.getInt(0))
    assert(o2.map(_.getLong(1)).toSeq == Seq(750000L, 1000000L, 0L, 0L),
      o2.mkString(";"))
    assert(o2.head.getDouble(3) == 50.0)
    // wrong-length vectors are excluded by the dim filter; all-zero
    // input fails loudly instead of silently looping on a zero iterate
    val degenerate = df(sch, Seq(Row(Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      Row(Seq(0.0f, 0.0f, 0.0f, 0.0f))))
    intercept[IllegalArgumentException](
      Similarity.pcaPowerComponent(degenerate, "emb", dim = 4))
  }
}
