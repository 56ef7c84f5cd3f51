package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomPrune

/** Laws for the round-5 scale operators: Bloom-filter join pruning and
  * line-level dedup (the registered queries carry the oracle evidence;
  * these pin the operator-level guarantees on adversarial inputs). */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("bloom filter admits every inserted key (no false negatives)") {
    val keys = (0L until 300L).map(_ * 7 + 3).toDF("k")
    val bits = BloomPrune.buildBits(keys, col("k"), nHashes = 3, mBits = 4096)
    val pass = keys.filter(BloomPrune.mightContain(col("k"), bits, 3, 4096)).count()
    assert(pass == 300L)
  }

  test("bloom false-positive rate stays near theory on disjoint probes") {
    val keys = (0L until 200L).toDF("k")
    val bits = BloomPrune.buildBits(keys, col("k"), nHashes = 3, mBits = 4096)
    val probes = (10000L until 20000L).toDF("k")
    val fp = probes.filter(BloomPrune.mightContain(col("k"), bits, 3, 4096)).count()
    // theory: (1 - e^(-3*200/4096))^3 ≈ 0.25% — allow a generous 2%
    assert(fp < 200L, s"false-positive rate ${fp / 10000.0} too high")
  }

  test("prunedJoin equals the plain semi-join, bit for bit") {
    val big = (0L until 5000L).map(i => (i, i % 617)).toDF("id", "key")
    val small = Seq(5L, 11L, 77L, 154L, 609L, 616L).toDF("skey")
    val got = BloomPrune.prunedJoin(big, "key", small, "skey")
      .select("id", "key").as[(Long, Long)].collect().toSet
    val want = big.join(small, col("key") === col("skey"), "left_semi")
      .select("id", "key").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("dedup_lines matches an independent in-memory reference") {
    // Independent Scala reimplementation on the same corpus: plant the nav
    // line, segment at 10 tokens, count lines corpus-wide, drop lines with
    // count >= 5 (the nav AND any lines of corpus-duplicated docs), rejoin.
    val nav = "home about contact privacy terms sitemap login search menu footer"
    val texts = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val segs: Map[Long, Seq[String]] = texts.map { case (id, text) =>
      val t = if (id % 4 == 0) s"$nav $text" else text
      val toks = t.split(" ").filter(_.nonEmpty)
      id -> toks.grouped(10).map(_.mkString(" ")).toSeq
    }
    val lineCounts = segs.values.flatten.groupBy(identity).map { case (l, ls) => l -> ls.size }
    val want = segs.map { case (id, lines) =>
      val kept = lines.filter(l => lineCounts(l) < 5)
      id -> ((lines.size - kept.size).toLong, kept.mkString(" "))
    }
    val rows = SparkEntry.queries("dedup_lines")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_removed", "clean").as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nRemoved, clean) =>
      assert((nRemoved, clean) == want(id), s"doc $id diverged from reference")
    }
    // the planted nav line is boilerplate everywhere it appears
    assert(rows.forall { case (id, n, c) => id % 4 != 0 || (n >= 1 && !c.contains(nav)) })
  }
}
