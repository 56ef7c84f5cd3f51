package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GreedyDedup
import graft.operators.GreedyDedup.{Candidate, Identity}

class GreedyDedupSpec extends AnyFunSuite {

  private def cand(group: Long, seq: Long, box: (Double, Double, Double, Double),
                   q: Double, emb: Seq[Float]): Candidate =
    Candidate(group, seq, box._1, box._2, box._3, box._4, q, emb)

  private val e1 = Seq(1f, 0f, 0f)
  private val e2 = Seq(0f, 1f, 0f)
  private val e1b = Seq(0.99f, 0.1f, 0f) // cosine(e1, e1b) ~ 0.995

  private def fold(cs: Candidate*): Seq[Identity] =
    GreedyDedup.foldGroup(0L, cs.iterator, simThr = 0.9, iouThr = 0.2).toSeq

  test("distinct identities append in order") {
    val out = fold(
      cand(0, 1, (0, 0, 10, 10), 0.5, e1),
      cand(0, 2, (100, 100, 110, 110), 0.6, e2))
    assert(out.map(i => (i.identity_idx, i.seq)) == Seq((1, 1L), (2, 2L)))
  }

  test("same identity: higher quality replaces in place, lower is absorbed") {
    val out = fold(
      cand(0, 1, (0, 0, 10, 10), 0.5, e1),
      cand(0, 2, (200, 200, 210, 210), 0.8, e1b), // sim>=0.9 → replaces slot 1
      cand(0, 3, (300, 300, 310, 310), 0.1, e1))  // sim>=0.9, lower q → absorbed
    assert(out.size == 1)
    assert(out.head.identity_idx == 1 && out.head.seq == 2L && out.head.quality == 0.8)
  }

  test("dissimilar but overlapping box (IoU > thr) is discarded as ambiguous") {
    val out = fold(
      cand(0, 1, (0, 0, 10, 10), 0.5, e1),
      cand(0, 2, (1, 1, 11, 11), 0.9, e2)) // sim ~0, IoU ~0.68 → discarded
    assert(out.size == 1 && out.head.seq == 1L)
  }

  test("exact duplicates collapse to one (idempotence)") {
    val c = cand(0, 1, (0, 0, 10, 10), 0.5, e1)
    val out = fold(c, c.copy(seq = 2), c.copy(seq = 3))
    assert(out.size == 1 && out.head.seq == 1L)
  }

  test("iouScalar bounds and reference arithmetic") {
    assert(GreedyDedup.iouScalar(0, 0, 10, 10, 0, 0, 10, 10) == 1.0)
    assert(GreedyDedup.iouScalar(0, 0, 10, 10, 20, 20, 30, 30) == 0.0)
    assert(GreedyDedup.iouScalar(0, 0, 0, 0, 0, 0, 0, 0) == 0.0) // empty union guard
    val v = GreedyDedup.iouScalar(0, 0, 10, 10, 5, 0, 15, 10)
    assert(math.abs(v - 50.0 / 150.0) < 1e-12)
  }

  test("distributed run matches local fold per group") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sp = spark
    val rng = new scala.util.Random(7)
    val cands = (0 until 200).map { i =>
      val base = if (rng.nextBoolean()) e1 else e2
      val jitter = base.map(v => v + (rng.nextFloat() - 0.5f) * 0.05f)
      cand(i % 4, i.toLong, (rng.nextInt(500), rng.nextInt(300),
        rng.nextInt(500) + 520, rng.nextInt(300) + 320), rng.nextInt(100) / 100.0, jitter)
    }
    val got = GreedyDedup.run(cands.toDS()).collect().toSet
    val want = cands.groupBy(_.group).flatMap { case (g, cs) =>
      GreedyDedup.foldGroup(g, cs.sortBy(c => (c.seq, c.x1)).iterator, 0.9, 0.2)
    }.toSet
    assert(got == want)
  }
}
