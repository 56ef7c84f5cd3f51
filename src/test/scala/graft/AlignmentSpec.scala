package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{AlignmentQueries, Tables}

/** Laws for the post-training (SFT/RLHF) data-prep queries — the DuckDB
  * oracle carries the value evidence; these pin the operator-level
  * guarantees on the same sf0.001 driver testdata the correctness gate
  * uses, plus the round-trip/permutation properties SQL can't see. */
class AlignmentSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("chat_template: spans reconstruct the rendered conversation byte-for-byte") {
    val out = AlignmentQueries.chatTemplateQ.spark(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // independently re-render each conversation from its turns, then check
    // every (char_start, char_end) span extracts exactly turn_text and
    // every header/newline sits where the offsets claim
    val preamble = "<|system|>\nYou are a helpful assistant.\n"
    rows.groupBy(_.getLong(0)).foreach { case (_, turns) =>
      val ordered = turns.sortBy(_.getLong(1))
      val rendered = preamble + ordered.map { r =>
        s"<|${r.getString(2)}|>\n${r.getString(3)}\n"
      }.mkString
      ordered.foreach { r =>
        val (start, end) = (r.getLong(4).toInt, r.getLong(5).toInt)
        assert(rendered.substring(start, end) == r.getString(3),
          s"span [$start,$end) does not extract the turn content")
      }
    }
    // roles alternate user/assistant from user; loss lands ONLY on assistant
    rows.foreach { r =>
      val expected = if (r.getLong(1) % 2 == 0) "user" else "assistant"
      assert(r.getString(2) == expected)
      assert(r.getBoolean(6) == (expected == "assistant"))
    }
    // both mask classes fire (multi-turn conversations exist)
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)))
  }

  test("preference_pairs: chosen beats rejected by the margin on every kept prompt") {
    val out = AlignmentQueries.preferencePairsQ.spark(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // independent reference: recompute per-prompt best/worst driver-side
    val cand = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        size(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
          .cast("long").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byPrompt = cand.groupBy { case (id, _) => id / 4 }
    val expected = byPrompt.flatMap { case (pid, cs) =>
      val chosen = cs.minBy { case (id, s) => (-s, id) }
      val rejected = cs.maxBy { case (id, s) => (-s, id) }
      if (chosen._1 != rejected._1 && chosen._2 - rejected._2 >= 8)
        Some(pid -> (chosen, rejected))
      else None
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (ch, rj) = expected(r.getLong(0))
      assert(r.getLong(1) == ch._1 && r.getLong(2) == ch._2)
      assert(r.getLong(3) == rj._1 && r.getLong(4) == rj._2)
      assert(r.getLong(5) == ch._2 - rj._2 && r.getLong(5) >= 8)
    }
    // the margin gate is non-vacuous: some prompts were dropped
    assert(rows.length < byPrompt.size)
  }

  test("length_buckets: buckets cover the corpus and padding accounting balances") {
    val out = AlignmentQueries.lengthBucketsQ.spark(spark, sf).cache()
    val rows = out.collect()
    assert(rows.length > 1) // several buckets populated
    val nDocs = rows.map(_.getLong(1)).sum
    val corpus = Tables.table(spark, sf, "documents")
      .select(graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .filter(col("n") > 0).count()
    assert(nDocs == corpus)
    rows.foreach { r =>
      val (bucket, n, sumTok, padded, ppm) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(padded == n * bucket)
      assert(sumTok <= padded) // nothing exceeds its bucket top
      assert(sumTok > (bucket / 2) * n || bucket == 8) // lower bound: all members > bucket/2
      assert(ppm == (padded - sumTok) * 1000000L / padded)
    }
  }

  test("epoch_shuffle: each epoch is a full permutation, orders differ, positions contiguous") {
    val out = AlignmentQueries.epochShuffleQ.spark(spark, sf).cache()
    val rows = out.collect()
    val n = Tables.table(spark, sf, "documents").count()
    assert(rows.length == 2 * n)
    // positions are exactly 0..2n-1, epoch 0 strictly before epoch 1
    assert(rows.map(_.getLong(1)).sorted.sameElements(0L until 2 * n))
    val e0 = rows.filter(_.getLong(0) == 0L).sortBy(_.getLong(1)).map(_.getLong(2))
    val e1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getLong(1)).map(_.getLong(2))
    assert(e0.sorted.sameElements(e1.sorted)) // same doc set
    assert(!e0.sameElements(e1)) // genuinely reshuffled between epochs
    assert(rows.filter(_.getLong(0) == 0L).map(_.getLong(1)).max <
      rows.filter(_.getLong(0) == 1L).map(_.getLong(1)).min)
    // deterministic across independent runs (resumability)
    val again = AlignmentQueries.epochShuffleQ.spark(spark, sf).collect()
    assert(rows.map(_.toSeq).sameElements(again.map(_.toSeq)))
  }

  test("oov_rate: rates bounded, non-vacuous, and the per-lang rollup matches a direct count") {
    val out = AlignmentQueries.oovRateQ.spark(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(oov >= 0 && oov <= n)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - oov.toDouble / n) < 1e-6)
      // K=16 of a 31-token vocab: neither class can be empty
      assert(oov > 0 && oov < n)
    }
  }
}
