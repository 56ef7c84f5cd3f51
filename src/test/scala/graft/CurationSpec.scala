package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the corpus-curation data-prep queries (the DuckDB oracle
  * carries the value evidence; these pin operator-level guarantees on the
  * same sf0.001 driver testdata the correctness gate uses). */
class CurationSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("collapse_repeats: output is stutter-free, counts balance, and the op is idempotent") {
    val out = graft.queries.CurationQueries.collapseRepeatsQ.spark(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty && out.exists(_._3 > 0)) // collapse genuinely fires
    val raw = graft.queries.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    out.foreach { case (id, clean, n) =>
      val toks = clean.split(" ").filter(_.nonEmpty)
      // no two consecutive tokens equal → idempotent by construction
      toks.sliding(2).foreach(w => if (w.length == 2) assert(w(0) != w(1)))
      // independent reference collapse
      val ref = raw(id).foldLeft(Vector.empty[String]) { (acc, t) =>
        if (acc.nonEmpty && acc.last == t) acc else acc :+ t
      }
      assert(toks.sameElements(ref), s"doc $id collapse mismatch")
      assert(n == raw(id).length - ref.length)
    }
  }

  test("anchor_extract: every synthesized link is recovered with aligned anchor text and host") {
    val out = graft.queries.CurationQueries.anchorExtractQ.spark(spark, sf).collect()
    assert(out.nonEmpty)
    val n = graft.queries.Tables.table(spark, sf, "documents").count()
    // per-doc link count equals the synthesized doc_id % 3 (zero-link docs emit no rows)
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    (0L until n).foreach { id =>
      assert(byDoc.getOrElse(id, 0) == (id % 3).toInt, s"doc $id link count")
    }
    out.foreach { r =>
      val (id, j) = (r.getLong(0), r.getInt(1))
      assert(r.getString(2) == s"https://site${(id + j) % 7}.example.com/p$id")
      assert(r.getString(3) == s"ref ${(id + j) % 11}") // anchor aligned to its own href
      assert(r.getString(4) == s"site${(id + j) % 7}.example.com")
    }
  }

  test("span_corruption_mask round-trips: filling input sentinels from the target reconstructs the doc") {
    val out = graft.queries.CurationQueries.spanCorruptionQ
      .spark(spark, sf)
      .select("doc_id", "n_tok", "n_spans", "n_masked", "input_text", "target_text")
      .as[(Long, Long, Long, Long, String, String)].collect()
    val orig = graft.queries.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    assert(out.nonEmpty)
    var sawSpan = false; var sawMultiTokenSpan = false
    out.foreach { case (id, nTok, nSpans, nMasked, input, target) =>
      val toks = orig(id)
      assert(nTok == toks.length, s"doc $id n_tok")
      // counting law: input = unmasked tokens + one sentinel per span
      val inToks = input.split(" ").filter(_.nonEmpty).toSeq
      assert(inToks.length == nTok - nMasked + nSpans, s"doc $id input length")
      if (nSpans == 0) {
        assert(nMasked == 0 && target.isEmpty && inToks == toks, s"doc $id unmasked")
      } else {
        sawSpan = true
        // parse target: <extra_id_k> span-tokens ... terminated by <extra_id_nSpans>
        val sent = (0L to nSpans).map(k => s"<extra_id_$k>")
        val tToks = target.split(" ").filter(_.nonEmpty).toSeq
        assert(tToks.last == sent.last, s"doc $id missing final sentinel")
        val spans = scala.collection.mutable.Map[String, Seq[String]]()
        var cur: String = null; var acc = List.empty[String]
        tToks.foreach { t =>
          if (sent.contains(t)) {
            if (cur != null) spans(cur) = acc.reverse
            cur = t; acc = Nil
          } else acc = t :: acc
        }
        assert(spans.keys.toSet == sent.dropRight(1).toSet, s"doc $id sentinel set")
        if (spans.values.exists(_.length > 1)) sawMultiTokenSpan = true
        assert(spans.values.map(_.length).sum == nMasked, s"doc $id masked count")
        // the round trip: substitute each input sentinel with its span
        val rebuilt = inToks.flatMap(t => if (sent.contains(t)) spans(t) else Seq(t))
        assert(rebuilt == toks, s"doc $id round trip failed")
        // sentinels appear in input in increasing order (doc-order spans)
        val order = inToks.filter(sent.contains)
        assert(order == order.sortBy(s => s.stripPrefix("<extra_id_").stripSuffix(">").toInt))
      }
    }
    assert(sawSpan, "no doc was ever masked — mask rate is vacuous")
    assert(sawMultiTokenSpan, "no multi-token run ever formed — run merging untested")
    // aggregate mask rate near the designed 1/5
    val rate = out.map(_._4).sum.toDouble / out.map(_._2).sum.toDouble
    assert(rate > 0.15 && rate < 0.25, s"mask rate $rate far from 0.2")
  }

  test("code_extract laws: block count follows the synthesis rule; code mass equals fence payloads") {
    val spark = TestSpark.spark
    val out = graft.queries.TextQueries.codeExtractQ
      .spark(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_blocks", "code_chars", "langs", "has_code").collect()
    assert(out.nonEmpty)
    val texts = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (id, nb, cc, langs, hc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getInt(4))
      val expectBlocks = (if (id % 4 == 0) 1 else 0) + (if (id % 8 == 0) 1 else 0)
      assert(nb == expectBlocks, s"doc $id: n_blocks $nb != $expectBlocks")
      assert(hc == (if (expectBlocks > 0) 1 else 0))
      val t = texts(id)
      def slice(from: Int, len: Int): String =
        if (t.length < from) "" else t.substring(from - 1, math.min(t.length, from - 1 + len))
      // fence bodies carry a leading slice + trailing newline each
      val expectChars =
        (if (id % 4 == 0) slice(41, 60).length + 1 else 0) +
          (if (id % 8 == 0) slice(101, 30).length + 1 else 0)
      assert(cc == expectChars, s"doc $id: code_chars $cc != $expectChars")
      assert(langs == (if (id % 8 == 0) "python,sql" else if (id % 4 == 0) "python" else ""))
    }
  }

  test("dup_ngram_fraction: independent recompute on the corpus; both verdict classes fire") {
    val spark = TestSpark.spark
    val out = graft.queries.TextQueries.dupNgramFractionQ
      .spark(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_grams", "n_dup", "dup_ppm", "flagged").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val docs = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    def grams(ts: Seq[String]): Seq[String] =
      if (ts.length >= 8) ts.sliding(8).map(_.mkString(" ")).toSeq
      else Seq(ts.mkString(" "))
    val docSets = docs.map { case (id, ts) => id -> grams(ts).toSet }.toMap
    val dfc = docSets.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    out.foreach { case (id, ng, nd, ppm, fl) =>
      val gs = grams(docs.toMap.apply(id))
      assert(ng == gs.length, s"doc $id gram count")
      val expDup = gs.count(g => dfc(g) >= 2)
      assert(nd == expDup, s"doc $id dup count: $nd != $expDup")
      assert(ppm == nd * 1000000L / ng)
      assert(fl == (if (ppm >= 300000) 1 else 0))
    }
    assert(out.exists(_._5 == 1) && out.exists(_._5 == 0), "verdict classes vacuous")
  }

  test("vocab_coverage: rank is a total order, cumulative share is monotone and exact") {
    val out = graft.queries.TextQueries.vocabCoverageQ
      .spark(TestSpark.spark, "/root/testdata/sf0.001")
      .select("rank", "tok", "cnt", "cum_cnt", "cum_ppm").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == out.indices.map(_ + 1L).toSeq)   // contiguous ranks from 1
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) })  // (cnt desc, tok asc) order
    // cum_cnt is the running sum of cnt
    assert(out.map(_._3).scanLeft(0L)(_ + _).tail.toSeq == out.map(_._4).toSeq)
    assert(out.map(_._5).sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    assert(out.last._5 > 900000, "top-30 should cover most of a 31-word vocab corpus")
  }

  test("script_detect: ppm shares recompute from the synthesized page; dominant/mixed law") {
    val spark = TestSpark.spark
    val texts = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.queries.TextQueries.scriptDetectQ
      .spark(spark, "/root/testdata/sf0.001")
      .collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val page =
        if (id % 5 == 0) "привет " * 40 + texts(id).take(30)
        else if (id % 5 == 1) "你好 " * 60 + texts(id).take(30)
        else texts(id)
      val lat = page.count(c => c >= 'a' && c <= 'z')
      val cyr = page.count("привет".contains(_))
      val cjk = page.count("你好".contains(_))
      assert(r.getLong(1) == page.length)
      assert(r.getLong(2) == lat.toLong * 1000000 / page.length)
      assert(r.getLong(3) == cyr.toLong * 1000000 / page.length)
      assert(r.getLong(4) == cjk.toLong * 1000000 / page.length)
      val dom = if (lat >= cyr && lat >= cjk) "latin" else if (cyr >= cjk) "cyrillic" else "cjk"
      assert(r.getString(5) == dom)
      val sec = lat + cyr + cjk - math.max(lat, math.max(cyr, cjk)) - math.min(lat, math.min(cyr, cjk))
      assert(r.getInt(6) == (if (sec * 20 >= page.length) 1 else 0))
    }
    assert(out.map(_.getString(5)).toSet == Set("latin", "cyrillic", "cjk"))
  }

  test("fim_transform: PSM round-trips to the original doc; rate near 1/2; cuts in range") {
    val out = graft.queries.CurationQueries.fimTransformQ
      .spark(TestSpark.spark, sf)
      .select("doc_id", "n_tok", "fim_applied", "cut1", "cut2", "train_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getString(5)))
    val orig = graft.queries.Tables.table(TestSpark.spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    var sawNonTrivialMiddle = false
    out.foreach { case (id, n, applied, c1, c2, txt) =>
      val toks = orig(id)
      assert(n == toks.length)
      if (applied == 0) {
        assert(c1 == -1 && c2 == -1 && txt == toks.mkString(" "))
      } else {
        assert(0 <= c1 && c1 <= c2 && c2 <= n, s"doc $id cuts out of range: $c1 $c2 $n")
        // parse PSM sections and reorder back to PMS
        val pre = txt.indexOf("<PRE> "); val suf = txt.indexOf(" <SUF> "); val mid = txt.indexOf(" <MID> ")
        assert(pre == 0 && suf > 0 && mid > suf)
        val prefix = txt.substring(6, suf)
        val suffix = txt.substring(suf + 7, mid)
        val middle = txt.substring(mid + 7)
        def t(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
        assert(t(prefix) ++ t(middle) ++ t(suffix) == toks, s"doc $id round trip")
        assert(t(prefix).length == c1 && t(middle).length == c2 - c1)
        if (c2 - c1 > 1 && c1 > 0 && c2 < n) sawNonTrivialMiddle = true
      }
    }
    val rate = out.count(_._3 == 1).toDouble / out.length
    assert(rate > 0.4 && rate < 0.6, s"FIM rate $rate far from 0.5")
    assert(sawNonTrivialMiddle, "no doc ever had a real three-way split")
  }

  test("winsorize: fences and clamp counts recompute from raw events") {
    val spark = TestSpark.spark
    val out = graft.queries.MiscQueries.winsorizeQ
      .spark(spark, sf)
      .select("event_type", "n_events", "n_lo", "n_hi", "p5", "p95").collect()
    val raw = graft.queries.Tables.table(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def pct(vs: Array[Double], p: Double): Double = {
      val s = vs.sorted; val idx = p * (s.length - 1)
      val lo = idx.toInt; val f = idx - lo
      if (lo + 1 < s.length) s(lo) * (1 - f) + s(lo + 1) * f else s(lo)
    }
    assert(out.nonEmpty)
    out.foreach { r =>
      val vs = raw(r.getString(0))
      assert(r.getLong(1) == vs.length)
      val (p5, p95) = (pct(vs, 0.05), pct(vs, 0.95))
      assert(math.abs(r.getDouble(4) - p5) < 1e-6 && math.abs(r.getDouble(5) - p95) < 1e-6)
      assert(r.getLong(2) == vs.count(_ < p5) && r.getLong(3) == vs.count(_ > p95))
      assert(r.getLong(2) > 0 && r.getLong(3) > 0, "clamp tails vacuous")
    }
  }

  test("skew_report: heavy keys and distribution stats recompute from raw counts") {
    val spark = TestSpark.spark
    val out = graft.queries.MiscQueries.skewReport.spark(spark, sf)
      .select("key", "n_in_key", "share_ppm", "n_keys").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = graft.queries.Tables.table(spark, sf, "events")
      .select("user_id").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nRows = counts.values.sum
    val top10 = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    assert(out.map(t => (t._1, t._2)).toSeq == top10)
    out.foreach { case (_, c, share, nKeys) =>
      assert(share == c * 1000000L / nRows)
      assert(nKeys == counts.size)
    }
  }

  test("dataloader_manifest: shards account for the whole corpus with contiguous rank windows") {
    val out = graft.queries.MiscQueries.dataloaderManifest.spark(TestSpark.spark, sf)
      .select("shard", "path", "n_docs", "n_tokens", "first_rank", "last_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 8L))
    val nDocs = graft.queries.Tables.table(TestSpark.spark, sf, "documents").count()
    assert(out.map(_._3).sum == nDocs)            // every doc in exactly one shard
    assert(out.map(_._3).max - out.map(_._3).min <= 1)  // snake balance
    out.foreach { case (sh, path, _, _, fr, lr) =>
      assert(path == f"/data/shards/train-$sh%05d-of-00008.parquet")
      assert(fr >= 0 && lr < nDocs && fr <= lr)
    }
    // token totals spread within one round's biggest doc (snake-deal law)
    val toks = out.map(_._4)
    assert(toks.max - toks.min <= graft.queries.Tables.table(TestSpark.spark, sf, "documents")
      .select(org.apache.spark.sql.functions.size(
        graft.functions.TextFunctions.tokens(org.apache.spark.sql.functions.col("text"))))
      .collect().map(_.getInt(0)).max)
  }

  test("anomaly_zscore: stats recompute from the reference half; both classes fire") {
    val spark = TestSpark.spark
    val out = graft.queries.MiscQueries.anomalyZscore.spark(spark, sf)
      .select("event_type", "n_ref", "n_scored", "n_flagged", "ref_mean", "ref_std").collect()
    val raw = graft.queries.Tables.table(spark, sf, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.nonEmpty)
    var flaggedTotal = 0L
    out.foreach { r =>
      val et = r.getString(0)
      val ref = raw.filter(t => t._2 == et && t._1 % 2 == 0).map(_._3)
      val scored = raw.filter(t => t._2 == et && t._1 % 2 == 1).map(_._3)
      assert(r.getLong(1) == ref.length && r.getLong(2) == scored.length)
      val mu = ref.sum / ref.length
      val sig = math.sqrt(ref.map(v => v * v).sum / ref.length - mu * mu)
      assert(math.abs(r.getDouble(4) - mu) < 1e-4 && math.abs(r.getDouble(5) - sig) < 1e-4)
      val nf = scored.count(v => math.abs((v - mu) / sig) > 2)
      assert(r.getLong(3) == nf, s"$et flagged ${r.getLong(3)} != $nf")
      flaggedTotal += r.getLong(3)
      assert(r.getLong(3) < r.getLong(2)) // never flags everything
    }
    assert(flaggedTotal > 0, "anomaly class vacuous")
  }

  test("snapshot_diff: classes partition both versions; totals conserve") {
    val spark = TestSpark.spark
    val out = graft.queries.MiscQueries.snapshotDiff.spark(spark, sf)
      .select("event_type", "status", "n").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val byStatus = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byStatus.keySet == Set("added", "removed", "changed", "unchanged"))
    val ids = graft.queries.Tables.table(spark, sf, "events")
      .select("event_id").collect().map(_.getLong(0))
    val v1 = ids.filter(_ % 5 != 1).toSet
    val v2 = ids.filter(_ % 7 != 2).toSet
    assert(byStatus("added") == (v2 -- v1).size)
    assert(byStatus("removed") == (v1 -- v2).size)
    val both = (v1 & v2)
    assert(byStatus("changed") == both.count(_ % 3 == 0))
    assert(byStatus("unchanged") == both.count(_ % 3 != 0))
  }

  test("funnel_steps: counts are monotone non-increasing; median window splits the clickers") {
    val out = graft.queries.MiscQueries.funnelSteps.spark(TestSpark.spark, sf)
      .select("step", "n_reached", "from_start_ppm", "from_prev_ppm").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1, 2, 3))
    assert(out.sliding(2).forall { case Array(a, b) => b._2 <= a._2; case _ => true })
    // every step loses someone after step 1 (the median window guarantees it)
    assert(out(1)._2 < out(0)._2 && out(1)._2 > 0)
    assert(out(2)._2 <= out(1)._2 && out(2)._2 > 0)
    // median-window law: click step converts about half of the clicking users
    assert(out(1)._4 >= 400000 && out(1)._4 <= 600000, s"click conv ${out(1)._4}")
  }

  test("cube_counts: margins sum consistently across grouping sets") {
    val out = graft.queries.MiscQueries.cubeCounts.spark(TestSpark.spark, sf)
      .select("g_type", "g_day", "event_type", "weekday", "n").collect()
      .map(r => (r.getInt(0), r.getInt(1),
        Option(r.get(2)).map(_.toString), if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
    val cells = out.filter(t => t._1 == 0 && t._2 == 0)
    val typeMargin = out.filter(t => t._1 == 0 && t._2 == 1)
    val dayMargin = out.filter(t => t._1 == 1 && t._2 == 0)
    val grand = out.filter(t => t._1 == 1 && t._2 == 1)
    assert(grand.length == 1 && grand.head._5 == cells.map(_._5).sum)
    typeMargin.foreach { m =>
      assert(m._5 == cells.filter(_._3 == m._3).map(_._5).sum, s"type margin ${m._3}") }
    dayMargin.foreach { m =>
      assert(m._5 == cells.filter(_._4 == m._4).map(_._5).sum, s"day margin ${m._4}") }
    assert(cells.map(_._4).distinct.length == 7) // all weekdays occur
  }

  test("time_split: 90/10 by rank, boundary is time-monotone under the total order") {
    val out = graft.queries.MiscQueries.timeSplitQ
      .spark(TestSpark.spark, "/root/testdata/sf0.001")
      .select("event_id", "ts_sec", "rank", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val n = out.length
    val train = out.filter(_._4 == "train")
    assert(train.length == n * 9 / 10)
    // ranks are a permutation of 1..n and train is exactly the rank prefix
    assert(out.map(_._3).sorted.toSeq == (1L to n.toLong).toSeq)
    assert(train.forall(_._3 * 10 <= n * 9L))
    // no eval event precedes a train event in time
    val maxTrainTs = train.map(_._2).max
    val minEvalTs = out.filter(_._4 == "eval").map(_._2).min
    assert(maxTrainTs <= minEvalTs)
  }
}
