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

  test("pipeline_sft: funnel monotone, reasons consistent, shards balanced on assistant chars") {
    val out = AlignmentQueries.pipelineSftQ.spark(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        Option(r.getString(4)), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.nonEmpty)
    out.foreach { case (_, gate, dup, kept, reason, nTurns, aChars, shard) =>
      // funnel monotone + reason = first failing stage
      assert(kept == (if (gate == 1 && dup == 0) 1 else 0))
      if (gate == 0) assert(reason.contains("gate") && dup == 0)
      else if (dup == 1) assert(reason.contains("dup"))
      else assert(reason.isEmpty)
      // dropped docs carry zeroed stats and shard -1; kept docs real ones
      if (kept == 0) assert(nTurns == 0 && aChars == 0 && shard == -1)
      else {
        assert(nTurns >= 2 && shard >= 0 && shard < 4)
        assert(aChars > 0) // >= 1 assistant turn with content
      }
    }
    // all three classes non-vacuous
    assert(out.exists(_._2 == 0) && out.exists(_._3 == 1) && out.exists(_._4 == 1))
    // shard doc-counts balanced within 1 and assistant-char loads within
    // one round's spread (snake-deal bound: max per-round delta)
    val kept = out.filter(_._4 == 1)
    val counts = (0 until 4).map(sh => kept.count(_._8 == sh))
    assert(counts.max - counts.min <= 1)
    val loads = (0 until 4).map(sh => kept.filter(_._8 == sh).map(_._7).sum)
    val maxDoc = kept.map(_._7).max
    assert(loads.max - loads.min <= maxDoc,
      s"shard loads $loads spread exceeds one doc ($maxDoc)")
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

  test("bt_rating: match accounting balances, normalization holds, ratings track win rate") {
    val out = AlignmentQueries.btRatingQ.spark(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    val k = rows.length.toLong
    rows.foreach { r =>
      val (nm, w, l) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w + l == nm, s"${r.getString(0)}: wins+losses != n_matches")
      assert(r.getLong(4) >= 0)
    }
    // total wins = total losses = total matches / 2 (every match has one of each)
    assert(rows.map(_.getLong(2)).sum == rows.map(_.getLong(3)).sum)
    // each round renormalizes to K * 1e6 micro-units; floor-div loses < 1
    // micro-unit per player
    val s = rows.map(_.getLong(4)).sum
    assert(s <= k * 1000000L && s > k * 1000000L - k)
    // ranks are 1..K in rating order
    val byRank = rows.sortBy(_.getLong(5))
    assert(byRank.map(_.getLong(5)).toSeq == (1L to k).toSeq)
    assert(byRank.map(_.getLong(4)).toSeq == byRank.map(_.getLong(4)).sortBy(-_).toSeq)
    // hand-traced 2-player fixed point: A beats B 3-1 => ratings settle at
    // exactly 3:1 (1,500,000 / 500,000 micro-units) after round 1 and stay
    import spark.implicits._
    // one user, alternating A/B events; A's value higher in 3 of 4 pairs.
    // 8 events -> 7 consecutive pairs, but same-type pairs are filtered;
    // build explicit alternation so every pair is an A-vs-B match:
    // values: A10 B1 (A wins) A10 B1 (B? no A wins) ... choose 4 matches,
    // 3 A-wins + 1 B-win via values, using disjoint users per match so
    // pairing is exactly one match per user
    val ev = Seq(
      (1L, 1L, 1L, "A", 10.0), (1L, 2L, 2L, "B", 1.0),   // A wins
      (2L, 1L, 3L, "A", 10.0), (2L, 2L, 4L, "B", 1.0),   // A wins
      (3L, 1L, 5L, "A", 10.0), (3L, 2L, 6L, "B", 1.0),   // A wins
      (4L, 1L, 7L, "A", 1.0),  (4L, 2L, 8L, "B", 10.0)   // B wins
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val fit = AlignmentQueries.btRatings(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(fit("A") == ((4L, 3L, 1L, 1500000L)))
    assert(fit("B") == ((4L, 1L, 3L, 500000L)))
  }
}
