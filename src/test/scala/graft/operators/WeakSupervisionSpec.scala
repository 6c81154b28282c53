package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Weak-supervision label model: exact equality with a local replay of
  * the documented algorithm (integer arithmetic end to end). */
class WeakSupervisionSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("item", LongType), StructField("lf", IntegerType),
    StructField("vote", LongType)))

  /** Local anchor → weights → weighted-vote replay. */
  private def ref(votes: Seq[(Long, Int, Option[Long])])
      : Map[Long, (Long, Long, Long)] = {
    val v = votes.collect { case (i, lf, Some(l)) => (i, lf, l) }
    val anchor = v.groupBy(_._1).map { case (item, vs) =>
      val byLabel = vs.groupBy(_._3).map { case (l, o) => l -> o.size }
      item -> byLabel.toSeq.map { case (l, c) => (-c, l) }.min._2
    }
    val w = v.groupBy(_._2).map { case (lf, vs) =>
      val agrees = vs.count { case (i, _, l) => anchor(i) == l }
      lf -> (agrees.toLong * 1000000L) / vs.size
    }
    v.groupBy(_._1).map { case (item, vs) =>
      val scores = vs.groupBy(_._3).map { case (l, o) =>
        l -> o.map(x => w(x._2)).sum }
      val best = scores.toSeq.map { case (l, s) => (-s, l) }.min
      item -> ((best._2, -best._1, vs.size.toLong))
    }
  }

  private def run(votes: Seq[(Long, Int, Option[Long])])
      : Map[Long, (Long, Long, Long)] =
    WeakSupervision.labelModel(
        df(schema, votes.map { case (i, lf, l) =>
          Row(i, lf, l.map(Long.box).orNull) }),
        "item", "lf", "vote")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("labelModel: a contrarian LF is downweighted out of the vote") {
    // LFs 1 and 2 always vote 1, LF 3 always votes 0 -> anchor is 1
    // everywhere, w1 = w2 = 1e6, w3 = 0 -> every item labels 1 with
    // score exactly 2e6 even though 0 got a (weightless) vote
    val votes = (1L to 10L).flatMap(i =>
      Seq((i, 1, Some(1L)), (i, 2, Some(1L)), (i, 3, Some(0L))))
    val out = run(votes)
    assert(out == ref(votes))
    assert(out.values.forall { case (l, s, n) => l == 1L && s == 2000000L && n == 3L })
  }

  test("labelModel: abstains are ignored; all-abstain items are absent") {
    val votes = Seq[(Long, Int, Option[Long])](
      (1L, 1, Some(1L)), (1L, 2, None), (1L, 3, Some(1L)),
      (2L, 1, None), (2L, 2, None), (2L, 3, None), // fully abstained
      (3L, 1, Some(0L)), (3L, 2, Some(1L)), (3L, 3, Some(0L)))
    val out = run(votes)
    assert(out == ref(votes))
    assert(!out.contains(2L))
    assert(out(1L)._3 == 2L, "abstain doesn't count as a vote")
  }

  test("labelModel: exact equality with the reference on a random vote table") {
    val rnd = new scala.util.Random(41)
    val votes = for {
      item <- 1L to 40L
      lf <- 1 to 5
    } yield (item, lf,
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(3).toLong))
    val out = run(votes)
    assert(out == ref(votes))
  }

  test("majorityVote: ties break to the smallest label, abstains ignored") {
    val votes = Seq[(Long, Int, Option[Long])](
      (1L, 1, Some(2L)), (1L, 2, Some(5L)), (1L, 3, None),
      (2L, 1, Some(7L)), (2L, 2, Some(7L)), (2L, 3, Some(1L)))
    val out = WeakSupervision.majorityVote(
        df(schema, votes.map { case (i, lf, l) =>
          Row(i, lf, l.map(Long.box).orNull) }), "item", "vote")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 1L, 2L)), "1-1 tie -> smaller label 2")
    assert(out(2L) == ((7L, 2L, 3L)))
  }
}
