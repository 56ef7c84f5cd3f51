package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing
import graft.operators.Packing.{Item, Packed}

/** Correctness properties of the rows-only sequence-packing fold. */
class PackingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val budget = 100L

  private def randomItems(seed: Int): Seq[Item] = {
    val rng = new scala.util.Random(seed)
    for {
      g <- Seq("a", "b", "c")
      i <- 0 until 200
    } yield Item(g, i.toLong, 1L + rng.nextInt(60))
  }

  private def check(items: Seq[Item], packed: Seq[Packed]): Unit = {
    // every item packed exactly once, sizes preserved
    assert(packed.map(p => (p.group, p.doc_id)).toSet ==
      items.map(i => (i.group, i.doc_id)).toSet)
    assert(packed.length == items.length)
    val byBin = packed.groupBy(p => (p.group, p.bin_idx))
    byBin.foreach { case ((g, b), docs) =>
      val sorted = docs.sortBy(_.doc_id)
      // budget holds unless a single oversized doc owns the bin
      assert(sorted.map(_.n_tokens).sum <= budget || sorted.length == 1,
        s"bin ($g,$b) overflows with ${sorted.length} docs")
      // offsets are the in-bin prefix sums
      var fill = 0L
      sorted.foreach { p =>
        assert(p.offset == fill, s"bad offset in ($g,$b): $p")
        fill += p.n_tokens
      }
    }
    // greedy tightness: the first doc of bin k did NOT fit in bin k-1
    byBin.toSeq.sortBy(_._1._2).groupBy(_._1._1).foreach { case (g, bins) =>
      val ordered = bins.sortBy(_._1._2).map(_._2)
      ordered.sliding(2).foreach {
        case Seq(prev, next) =>
          val prevFill = prev.map(_.n_tokens).sum
          val firstNext = next.minBy(_.doc_id).n_tokens
          assert(prevFill + firstNext > budget,
            s"group $g: bin not tight (fill $prevFill + next $firstNext <= $budget)")
        case _ => ()
      }
    }
  }

  test("packing: exact partition, budget bound, prefix offsets, tight bins") {
    val items = randomItems(11)
    val packed = Packing.run(items.toDS(), budget)(spark).collect().toSeq
    check(items, packed)
  }

  test("packing: oversized docs get solo bins; deterministic across runs") {
    val items = Seq(
      Item("g", 1L, 40L), Item("g", 2L, 500L), // oversized: alone in its bin
      Item("g", 3L, 70L), Item("g", 4L, 30L), Item("g", 5L, 90L))
    val packed = Packing.run(items.toDS(), budget)(spark)
      .collect().toSeq.sortBy(_.doc_id)
    check(items, packed)
    val solo = packed.find(_.doc_id == 2L).get
    assert(packed.count(_.bin_idx == solo.bin_idx) == 1)
    val again = Packing.run(items.toDS(), budget)(spark).collect().toSeq.sortBy(_.doc_id)
    assert(packed == again)
  }
}
