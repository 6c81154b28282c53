package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class FuzzyJoinSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def pairsOf(out: Array[Row]): Set[(Long, Long, Long)] =
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet

  test("blockedSelfJoin: typo pairs via either blocker, normalized keys, id_a < id_b") {
    val d = df(schema, Seq(
      Row(1L, "blue bolt"),
      Row(2L, "blue bolts"),   // last-token typo: blocks on 'blue'
      Row(3L, "Blue  Bolt"),   // normalization: dist 0 to id 1
      Row(4L, "glue bolt"),    // first-token typo: blocks on 'bolt'
      Row(5L, "red gear")))    // shares no block with the others
    val out = FuzzyJoin.blockedSelfJoin(d, "name", "id", maxDist = 1).collect()
    assert(pairsOf(out) == Set((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 1L),
      (1L, 4L, 1L), (3L, 4L, 1L)), s"got ${pairsOf(out)}")
    // orientation + both-blocker dedup: every pair appears exactly once
    assert(out.length == 5)
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    // keys come back normalized
    val k13 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 3L).get
    assert(k13.getString(2) == "blue bolt" && k13.getString(3) == "blue bolt")
  }

  test("blockedSelfJoin: maxDist bounds the match set; dist 0 = exact dups") {
    val d = df(schema, Seq(
      Row(1L, "alpha beta"), Row(2L, "alpha bexa"), Row(3L, "alpha bxxa")))
    val d0 = FuzzyJoin.blockedSelfJoin(d, "name", "id", maxDist = 0).collect()
    assert(d0.isEmpty, "no exact dups in this set")
    val d1 = pairsOf(FuzzyJoin.blockedSelfJoin(d, "name", "id", maxDist = 1).collect())
    assert(d1 == Set((1L, 2L, 1L), (2L, 3L, 1L)), s"dist-2 pair excluded: $d1")
    val d2 = pairsOf(FuzzyJoin.blockedSelfJoin(d, "name", "id", maxDist = 2).collect())
    assert(d2 == Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 2L)))
    intercept[IllegalArgumentException](
      FuzzyJoin.blockedSelfJoin(d, "name", "id", maxDist = -1))
  }

  test("canonicalize: transitive entities resolve to the min id; singletons self-map") {
    val d = df(schema, Seq(
      Row(5L, "blue bolt"),
      Row(2L, "blue bolts"),  // ~ 5 (dist 1)
      Row(7L, "blue boltsy"), // ~ 2 (dist 1) but dist 2 from 5: only
                              // TRANSITIVITY puts {2, 5, 7} in one entity
      Row(9L, "red gear")))   // singleton
    val out = FuzzyJoin.canonicalize(d, "name", "id", maxDist = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(5L) == (2L, "blue bolts"), "canonical is the MIN id's key")
    assert(out(2L) == (2L, "blue bolts"))
    assert(out(7L) == (2L, "blue bolts"), "transitive: boltsy joins via bolts")
    assert(out(9L) == (9L, "red gear"), "unmatched record canonicalizes to itself")
    assert(out.size == 4, "one output row per input record")
  }

  test("blockedSelfJoin: hot blocks drop at maxBlockSize instead of going quadratic") {
    val rows = (1L to 10L).map(i => Row(i, s"common tail$i")) :+ Row(99L, "common tail1")
    val d = df(schema, rows)
    // first-token block 'common' holds all 11; cap 5 drops it, but the
    // last-token block ('tail1': ids 1, 99) still pairs
    val capped = pairsOf(FuzzyJoin.blockedSelfJoin(d, "name", "id",
      maxDist = 1, maxBlockSize = 5).collect())
    assert(capped == Set((1L, 99L, 0L)), s"only the small block survives: $capped")
    // cap 0 = uncapped: the same pair plus every within-'common' match
    val full = pairsOf(FuzzyJoin.blockedSelfJoin(d, "name", "id",
      maxDist = 1, maxBlockSize = 0).collect())
    assert(full.contains((1L, 99L, 0L)) && full.size > 1)
  }
}
