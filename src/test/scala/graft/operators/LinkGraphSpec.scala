package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: exact equality with a local integer reference
  * (the arithmetic is deterministic by design — no tolerance anywhere). */
class LinkGraphSpec extends SparkSpec {

  private val edgeSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))

  /** Local replay of the exact integer recurrence pageRank runs. */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
                  scale: Long = 1000000000000L,
                  dn: Long = 85L, dd: Long = 100L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = scale * (dd - dn) / dd / n
    var r = nodes.map(_ -> scale / n).toMap
    (0 until iters).foreach { _ =>
      val sums = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(v => v -> (base + dn * sums.getOrElse(v, 0L) / dd)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkGraph.pageRank(df(edgeSchema, edges.map(e => Row(e._1, e._2))), "src", "dst",
        iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cycle + dangling sink: exact equality with the integer reference") {
    // 1 -> 2 -> 3 -> 1 cycle, 2 -> 4 dangling sink (4 has no out-edges:
    // its mass decays — the documented drop-dangling variant)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L))
    val got = run(edges, 3)
    assert(got == ref(edges, 3))
    // sink received mass but re-emits nothing; total stays under scale
    assert(got(4L) > 0 && got.values.sum <= 1000000000000L)
  }

  test("symmetric cycle: equal ranks; iterations=0 is the uniform init") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = run(cycle, 4)
    assert(got.values.toSet.size == 1, s"cycle ranks must be equal: $got")
    val init = run(cycle, 0)
    assert(init.values.toSet == Set(1000000000000L / 3))
  }

  test("parallel edges act as weights (outdeg counts rows), matching the reference") {
    // 1 links to 2 twice and to 3 once: 2 gets 2/3 of 1's mass
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val got = run(edges, 3)
    assert(got == ref(edges, 3))
    assert(got(2L) > got(3L))
  }

  test("result is partitioning-invariant (exact long arithmetic end to end)") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val d1 = df(edgeSchema, edges.map(e => Row(e._1, e._2)))
    val d2 = d1.repartition(13)
    val r1 = LinkGraph.pageRank(d1, "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = LinkGraph.pageRank(d2, "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
    assert(r1 == ref(edges, 5))
  }

  test("weighted pageRank: mass splits proportionally; unit weights equal the unweighted run") {
    val ws = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType),
      StructField("w", LongType)))
    // 1 sends 3/4 of its mass to 2 and 1/4 to 3; cycle back edges
    val weighted = df(ws, Seq(Row(1L, 2L, 3L), Row(1L, 3L, 1L), Row(2L, 1L, 1L), Row(3L, 1L, 1L)))
    val got = LinkGraph.pageRank(weighted, "src", "dst", iterations = 4, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) > got(3L), s"heavier edge must carry more mass: $got")
    // local exact mirror of one weighted iteration from uniform init
    val n = 3L; val scale = 1000000000000L
    val r0 = scale / n; val base = scale * 15L / 100L / n
    val s2 = r0 * 3L / 4L // (r*w) div tw for edge 1->2
    assert {
      val oneIter = LinkGraph.pageRank(weighted, "src", "dst", iterations = 1, weightCol = Some("w"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      oneIter(2L) == base + 85L * s2 / 100L
    }
    // unit weights reproduce the unweighted path exactly
    val unit = weighted.withColumn("w", lit(1L))
    val a = LinkGraph.pageRank(unit, "src", "dst", iterations = 3, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = LinkGraph.pageRank(unit.drop("w"), "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // negative and overflow-scale weights rejected eagerly
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(df(ws, Seq(Row(1L, 2L, -1L))), "src", "dst", weightCol = Some("w"))
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(df(ws, Seq(Row(1L, 2L, Long.MaxValue))), "src", "dst", weightCol = Some("w"))
    }
  }

  test("pageRankFrom: warm start == continued cold run; new nodes join at uniform") {
    val rnd = new scala.util.Random(19)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val d = df(edgeSchema, edges.map(e => Row(e._1, e._2)))
    val cold5 = LinkGraph.pageRank(d, "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val warm = LinkGraph.pageRankFrom(d,
        LinkGraph.pageRank(d, "src", "dst", iterations = 3), "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm == cold5)
    // a node unseen in the prior ranks starts at uniform: grafting a
    // fresh edge (100 -> 0) and warm-starting must equal a cold run of
    // the SAME iteration count whose init matches (1 warm iteration
    // from cold-0 prior == 1 cold iteration, priors all uniform)
    val d2 = df(edgeSchema, (edges :+ ((100L, 0L))).map(e => Row(e._1, e._2)))
    val fromZero = LinkGraph.pageRankFrom(d2,
        LinkGraph.pageRank(d, "src", "dst", iterations = 0), "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold1 = LinkGraph.pageRank(d2, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iteration-0 priors are uniform over d's 30 nodes = scale/30; d2
    // has 31 nodes (uniform scale/31), so the two inits differ — but
    // node 100 (absent from priors) must be present and ranked in both
    assert(fromZero.keySet == cold1.keySet && fromZero.contains(100L))
  }

  test("hub graph: authorities outrank leaves; empty edges rejected") {
    // every leaf links to the hub; hub links back to leaf 10 only
    val edges = (11L to 15L).map(l => (l, 1L)) :+ (1L, 10L)
    val got = run(edges, 5)
    assert(got(1L) > got(11L) && got(10L) > got(11L))
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(df(edgeSchema, Seq.empty), "src", "dst").collect()
    }
  }

  private val triSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))

  test("triangleCounts: K4 minus an edge, duplicates/self-loops/direction ignored") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles (1,2,3) and (1,2,4).
    // Edges listed in mixed directions, one duplicate, one self-loop.
    val edges = Seq((1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L),
      (2L, 1L) /* dup reversed */, (3L, 3L) /* self-loop */)
    val out = LinkGraph.triangleCounts(
        df(triSchema, edges.map { case (a, b) => Row(a, b) }), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L), s"got $out")
  }

  test("triangleCounts: triangle-free graphs emit nothing; hub stars have no triangles") {
    // star: hub 0 connected to 1..6 — max-degree node, zero triangles
    val star = (1L to 6L).map(i => Row(0L, i))
    assert(LinkGraph.triangleCounts(df(triSchema, star), "src", "dst").count() == 0L)
    // path 1-2-3-4
    val path = Seq(Row(1L, 2L), Row(2L, 3L), Row(3L, 4L))
    assert(LinkGraph.triangleCounts(df(triSchema, path), "src", "dst").count() == 0L)
  }

  test("triangleCounts: matches a brute-force reference on a random graph") {
    val rnd = new scala.util.Random(19)
    val es = (0 until 120).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    val und = es.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val ref = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(x, y, z) <- nodes.combinations(3)
      if und((x, y)) && und((x, z)) && und((y, z))
      n <- Seq(x, y, z)
    } ref(n) += 1L
    val out = LinkGraph.triangleCounts(
        df(triSchema, es.map { case (a, b) => Row(a, b) }), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == ref.toMap, s"got $out want $ref")
  }

  /** Local replay of synchronous LPA with self-vote, ties to the
    * smallest label — the exact semantics labelPropagation documents. */
  private def lpaRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val adj = (und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val nodes = adj.keySet
    var lbl = nodes.map(v => v -> v).toMap
    (0 until iters).foreach { _ =>
      lbl = nodes.map { v =>
        val votes = (adj(v).map(lbl) :+ lbl(v)).groupBy(identity)
          .map { case (l, occ) => l -> occ.size }
        val best = votes.toSeq.map { case (l, c) => (-c, l) }.min
        v -> best._2
      }.toMap
    }
    lbl
  }

  test("labelPropagation: two cliques with a bridge converge to one label each") {
    val es = Seq[(Long, Long)]((1, 2), (1, 3), (2, 3), (10, 11), (10, 12),
      (11, 12), (3, 10))
    val out = LinkGraph.labelPropagation(
        df(edgeSchema, es.map(e => Row(e._1, e._2))), "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == lpaRef(es, 3), s"got $out want ${lpaRef(es, 3)}")
    // each clique is one community
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(10L), out(11L), out(12L)).size == 1)
    assert(out(1L) != out(10L))
  }

  test("labelPropagation: matches the synchronous reference on a random graph") {
    val rnd = new scala.util.Random(23)
    val es = (0 until 150).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val out = LinkGraph.labelPropagation(
        df(edgeSchema, es.map(e => Row(e._1, e._2))), "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == lpaRef(es, 4))
  }

  /** Local replay of bounded peeling. */
  private def kcoreRef(edges: Seq[(Long, Long)], k: Int,
                       rounds: Int): Map[Long, Long] = {
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    var alive = und.flatMap(e => Set(e._1, e._2))
    def degrees: Map[Long, Long] = {
      val live = und.filter(e => alive(e._1) && alive(e._2))
      (live.toSeq.map(_._1) ++ live.toSeq.map(_._2))
        .groupBy(identity).map { case (n, o) => n -> o.size.toLong }
    }
    (1 to rounds).foreach { _ =>
      alive = degrees.filter(_._2 >= k).keySet
    }
    degrees
  }

  test("kCorePeel: a planted clique survives peeling that removes the star") {
    // 5-clique (degree 4 inside) + a star center linked to 6 leaves:
    // at k=3 the leaves (deg 1) peel round 1, the center (deg 0 after)
    // peels round 2, the clique is untouched
    val clique = for {
      a <- 1L to 5L; b <- 1L to 5L if a < b
    } yield (a, b)
    val star = (10L to 15L).map(l => (100L, l))
    val es = clique ++ star
    val out = LinkGraph.kCorePeel(
        df(edgeSchema, es.map(e => Row(e._1, e._2))), "src", "dst", k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == kcoreRef(es, 3, 3), s"got $out")
    assert(out.keySet == (1L to 5L).toSet)
    assert(out.values.forall(_ == 4L))
  }

  test("kCorePeel: matches the local reference on a random graph") {
    val rnd = new scala.util.Random(29)
    val es = (0 until 200).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val out = LinkGraph.kCorePeel(
        df(edgeSchema, es.map(e => Row(e._1, e._2))), "src", "dst", k = 4, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == kcoreRef(es, 4, 4))
    intercept[IllegalArgumentException](LinkGraph.kCorePeel(
      df(edgeSchema, Nil), "src", "dst", k = 0))
  }

  test("labelPropagationFrom: warm continuation == the longer cold run, bit-for-bit") {
    val rnd = new scala.util.Random(37)
    val es = (0 until 120).map(_ => (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
    val edf = df(edgeSchema, es.map(e => Row(e._1, e._2)))
    val cold5 = LinkGraph.labelPropagation(edf, "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val warm = LinkGraph.labelPropagationFrom(edf,
        LinkGraph.labelPropagation(edf, "src", "dst", iterations = 3),
        "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm == cold5)
    // a node absent from the prior starts at its own id: priors from a
    // SUBGRAPH still converge to the full cold run's fixpoint here
    val partial = LinkGraph.labelPropagation(
      df(edgeSchema, es.take(60).map(e => Row(e._1, e._2))), "src", "dst", 2)
    val fromPartial = LinkGraph.labelPropagationFrom(edf, partial, "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromPartial.keySet == cold5.keySet)
  }

  test("labelPropagation: duplicate and reversed edge rows don't double-vote") {
    val es = Seq[(Long, Long)]((1, 2), (2, 1), (1, 2), (2, 3))
    val out = LinkGraph.labelPropagation(
        df(edgeSchema, es.map(e => Row(e._1, e._2))), "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == lpaRef(es, 2))
    assert(out.values.toSet == Set(1L)) // path collapses to min label
  }
}
