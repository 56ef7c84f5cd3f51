package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the third major
  * public tokenizer family after BPE and WordPiece (Kudo, ACL 2018 —
  * "Subword Regularization: Improving Neural Network Translation Models
  * with Multiple Subword Candidates"): instead of growing a vocabulary by
  * merges, start from an overcomplete SEED vocabulary of frequent
  * substrings, fit piece probabilities by EM over the corpus, and PRUNE
  * to the target size. This implementation is the deterministic
  * hard-EM (Viterbi) variant — each word contributes counts through its
  * single best segmentation under the current model, the decoding rule
  * SentencePiece itself uses at inference time — so every step is
  * replayable bit-for-bit by the DuckDB oracle:
  *
  *  1. SEED: all substrings of length 1..maxPieceLen of the weighted
  *     corpus vocabulary; keep every single character (coverage
  *     guarantee) + the top `seedMulti` multi-char substrings under the
  *     (count desc, piece asc) total order.
  *  2. PROBABILITIES: add-one smoothing, p = (n+1)/(Σn + |V|). Both
  *     operands are exact BIGINT→DOUBLE conversions (< 2^53) and the
  *     single division is IEEE correctly-rounded, so Spark and DuckDB
  *     produce bit-identical doubles — the lm_score linear-space
  *     discipline (no libm call anywhere in the chain).
  *  3. VITERBI: per-word best segmentation by a DP over character
  *     positions, unrolled to `maxWordLen` relational steps — position
  *     i's state is the argmax over the ≤ maxPieceLen predecessor states
  *     joined against the piece table on the connecting substring. The
  *     DP score is a product of the smoothed probabilities accumulated
  *     in a fixed left-to-right order (one IEEE multiply per step —
  *     deterministic); ties break by (fewer pieces, then lexicographic
  *     segmentation path) — a total order, since the path string
  *     identifies the segmentation.
  *  4. EM: piece counts = word-frequency-weighted occurrences in the
  *     Viterbi paths; re-smooth; repeat.
  *  5. PRUNE: keep all single characters + the top `pruneMulti`
  *     multi-char pieces by (EM count desc, piece asc) — the
  *     deterministic practical pruning rule (Kudo's loss-ranked pruning
  *     with the Viterbi-count approximation of the loss) — then run a
  *     final EM pass over the pruned vocabulary.
  *
  * Scale shape at 100 TB: everything after the one corpus-sized
  * word-count aggregation is bounded by the DISTINCT vocabulary (the
  * corpus enters only through word frequencies, as in [[Bpe]]); the
  * piece table is seed-bounded and broadcast into every DP step; DP
  * states are one row per (word, position); steps localCheckpoint so
  * lineage never nests the unrolled DP. No udf, no driver-side loop
  * over data — the only driver action is orchestration of a fixed,
  * data-independent number of steps.
  */
object Unigram {

  /** Default DP unroll depth — words longer than this are excluded from
    * training (and from fertility reporting) by the registered queries;
    * real trainers cap candidate and word lengths the same way. */
  val MaxWordLen = 8

  /** Longest seed substring — SentencePiece's max_sentencepiece_length
    * analog (default 16 there; 4 here keeps the seed table tight). */
  val MaxPieceLen = 4

  /** Seed vocabulary (piece, n): substrings of length 1..maxPieceLen of
    * the weighted word vocabulary; all single chars + top `seedMulti`
    * multi-char substrings by (count desc, piece asc). */
  def seed(words: DataFrame, maxPieceLen: Int, seedMulti: Int): DataFrame = {
    val subs = words
      .select(col("w"), col("wc"),
        explode(sequence(lit(1), least(lit(maxPieceLen), length(col("w"))))).as("l"))
      .select(col("w"), col("wc"), col("l"),
        explode(sequence(lit(1), length(col("w")) - col("l") + 1)).as("p"))
      .select(col("wc"), col("w").substr(col("p"), col("l")).as("piece"))
      .groupBy("piece").agg(sum(col("wc")).as("n"))
    val multi = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("n").desc, col("piece").asc).limit(seedMulti)
    subs.filter(length(col("piece")) === 1).unionByName(multi)
  }

  /** Add-one-smoothed probabilities over a (piece, n) count table:
    * p = (n+1)/(Σn + |V|) — exact-integer totals through one
    * correctly-rounded IEEE division (bit-identical across engines).
    * The totals row is a 1-row aggregate build side. */
  def probs(cnt: DataFrame): DataFrame = {
    val tot = cnt.agg((sum(col("n")) + count(lit(1))).cast("long").as("tv"))
    cnt.crossJoin(tot)
      .select(col("piece"),
        ((col("n") + 1).cast("double") / col("tv").cast("double")).as("p"))
  }

  /** One Viterbi segmentation pass: best (max-probability) segmentation
    * of every word under the piece model. Returns one row per word:
    * (w, wc, pos = length(w), prob, k = piece count, path = pieces
    * joined by '|'). The DP is unrolled to `maxWordLen` relational
    * steps; each step is a vocab-bounded join + per-word window. */
  def viterbi(words: DataFrame, pieces: DataFrame,
              maxWordLen: Int, maxPieceLen: Int): DataFrame = {
    var dps = Vector(words.select(col("w"), col("wc"),
        lit(0).as("pos"), lit(1.0).as("prob"), lit(0L).as("k"), lit("").as("path"))
      .localCheckpoint())
    for (i <- 1 to maxWordLen) {
      val lo = math.max(0, i - maxPieceLen)
      val prev = dps.slice(lo, i).reduce(_ unionByName _)
      val cand = prev.filter(length(col("w")) >= i)
        .join(pieces,
          col("piece") === substring(col("w"), col("pos") + 1, lit(i) - col("pos")))
        .select(col("w"), col("wc"), lit(i).as("pos"),
          (col("prob") * col("p")).as("prob"), (col("k") + 1).as("k"),
          when(col("path") === "", col("piece"))
            .otherwise(concat(col("path"), lit("|"), col("piece"))).as("path"))
      val win = Window.partitionBy("w")
        .orderBy(col("prob").desc, col("k").asc, col("path").asc)
      dps = dps :+ cand.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1).drop("rn").localCheckpoint()
    }
    (1 to maxWordLen).map(i => dps(i).filter(length(col("w")) === i))
      .reduce(_ unionByName _)
  }

  /** Word-frequency-weighted Viterbi piece counts over a kept piece set
    * (kept pieces unused by any path count 0). */
  def counts(fin: DataFrame, kept: DataFrame): DataFrame = {
    val used = fin
      .select(col("wc"), explode(split(col("path"), "\\|")).as("piece"))
      .groupBy("piece").agg(sum(col("wc")).as("u"))
    kept.select("piece").join(used, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("u"), lit(0L)).as("n"))
  }

  /** Full training run: seed → `emRounds` hard-EM rounds → prune (all
    * single chars + top `pruneMulti` multi-char by count) → final EM
    * pass. Returns (final piece counts over the pruned vocabulary,
    * final per-word Viterbi segmentation). */
  def train(wordsIn: DataFrame, maxWordLen: Int = MaxWordLen,
            maxPieceLen: Int = MaxPieceLen, seedMulti: Int = 80,
            emRounds: Int = 2, pruneMulti: Int = 40): (DataFrame, DataFrame) = {
    require(emRounds >= 1 && seedMulti >= 1 && pruneMulti >= 1)
    val words = wordsIn.localCheckpoint() // corpus-sized agg runs once
    var pieceCnt = seed(words, maxPieceLen, seedMulti).localCheckpoint()
    var fin: DataFrame = null
    for (_ <- 1 to emRounds) {
      fin = viterbi(words, probs(pieceCnt), maxWordLen, maxPieceLen)
      pieceCnt = counts(fin, pieceCnt).localCheckpoint()
    }
    val multi = pieceCnt.filter(length(col("piece")) >= 2)
      .orderBy(col("n").desc, col("piece").asc).limit(pruneMulti)
    val pruned = pieceCnt.filter(length(col("piece")) === 1)
      .unionByName(multi).localCheckpoint()
    fin = viterbi(words, probs(pruned), maxWordLen, maxPieceLen)
    (counts(fin, pruned).localCheckpoint(), fin)
  }

  // ── full-EM (soft) variant ──────────────────────────────────────────────

  /** Micro-unit scale for the full-EM trainer's quantized expected
    * counts: one occurrence = 10⁶ units. Kudo's actual E-step produces
    * REAL expected counts (marginals over all segmentations), whose
    * corpus aggregation would be an order-dependent float sum — the one
    * thing the oracle discipline forbids. Each word-span's expected
    * count is therefore FLOORED to micro-units (a fixed IEEE expression
    * tree per span, then one exact floor) and summed as exact integers
    * (order-free, DECIMAL(38,0)/HUGEINT), so both engines aggregate
    * identically. The 10⁻⁶ quantization is far below any pruning
    * decision's resolution; counts stay wrap-safe up to ~9·10¹²
    * occurrences per (word, span) — raise the unit before that. */
  val EmUnit = 1000000L

  /** Forward pass of the full-EM E-step: α(w, pos) = total probability
    * of ALL segmentations of the prefix w[1..pos] (the forward
    * algorithm — [[viterbi]] with sum in place of max). Determinism:
    * each position's ≤ maxPieceLen predecessor terms are PIVOTED into
    * fixed columns (one row per (w, d) by construction — max over a
    * singleton) and summed through a static left-assoc IEEE add chain —
    * never a groupBy float sum, whose accumulation order is
    * shuffle-dependent. Missing terms contribute exactly 0.0 (x + 0.0
    * = x for the nonnegative masses here). Returns (w, wc, pos, a) for
    * pos 0..len(w). */
  def forward(words: DataFrame, pieces: DataFrame,
              maxWordLen: Int, maxPieceLen: Int): DataFrame = {
    var dps = Vector(words
      .select(col("w"), col("wc"), lit(0).as("pos"), lit(1.0).as("a"))
      .localCheckpoint())
    for (i <- 1 to maxWordLen) {
      val lo = math.max(0, i - maxPieceLen)
      val prev = dps.slice(lo, i).reduce(_ unionByName _)
      val terms = prev.filter(length(col("w")) >= i)
        .join(pieces,
          col("piece") === substring(col("w"), col("pos") + 1, lit(i) - col("pos")))
        .select(col("w"), col("wc"), (lit(i) - col("pos")).as("d"),
          (col("a") * col("p")).as("v"))
      val aggs = (1 to maxPieceLen)
        .map(d => max(when(col("d") === d, col("v"))).as(s"t$d"))
      dps = dps :+ terms.groupBy("w", "wc").agg(aggs.head, aggs.tail: _*)
        .select(col("w"), col("wc"), lit(i).as("pos"),
          (1 to maxPieceLen).map(d => coalesce(col(s"t$d"), lit(0.0)))
            .reduce(_ + _).as("a"))
        .localCheckpoint()
    }
    dps.reduce(_ unionByName _)
  }

  /** Backward pass: β(w, r) = total probability of all segmentations of
    * the SUFFIX of length r (r = len(w) − position, so the recursion
    * unrolls over suffix length exactly like [[forward]] over prefix
    * length). Same pivot + fixed-add-chain determinism discipline.
    * Returns (w, wc, r, b) for r 0..len(w). */
  def backward(words: DataFrame, pieces: DataFrame,
               maxWordLen: Int, maxPieceLen: Int): DataFrame = {
    var dps = Vector(words
      .select(col("w"), col("wc"), lit(0).as("r"), lit(1.0).as("b"))
      .localCheckpoint())
    for (r <- 1 to maxWordLen) {
      val lo = math.max(0, r - maxPieceLen)
      val prev = dps.slice(lo, r).reduce(_ unionByName _)
      val terms = prev.filter(length(col("w")) >= r)
        .join(pieces,
          col("piece") === substring(col("w"),
            length(col("w")) - lit(r) + 1, lit(r) - col("r")))
        .select(col("w"), col("wc"), (lit(r) - col("r")).as("d"),
          (col("b") * col("p")).as("v"))
      val aggs = (1 to maxPieceLen)
        .map(d => max(when(col("d") === d, col("v"))).as(s"t$d"))
      dps = dps :+ terms.groupBy("w", "wc").agg(aggs.head, aggs.tail: _*)
        .select(col("w"), col("wc"), lit(r).as("r"),
          (1 to maxPieceLen).map(d => coalesce(col(s"t$d"), lit(0.0)))
            .reduce(_ + _).as("b"))
        .localCheckpoint()
    }
    dps.reduce(_ unionByName _)
  }

  /** Fused forward+backward pass: both DP directions in ONE unrolled
    * loop, one combined frame (and ONE localCheckpoint job) per step
    * instead of two. Step i's rows carry `dir` ('f'/'b'); the piece join
    * keys on the direction's own substring (prefix span ending at i vs
    * suffix span of length i) inside one equi-join, and the per-(w, dir)
    * pivot/add-chain is exactly [[forward]]'s/[[backward]]'s — values
    * are BIT-IDENTICAL to the separate passes (spec-pinned), only the
    * job count changes. Motivation: the full-EM trainer's cost is plan
    * time — ~60 driver-orchestrated checkpoint jobs for 3 rounds × (2
    * directions × (1 seed + maxWordLen steps)) — and fusing directions
    * halves the DP job count (26.5 s cold plan measured before, r13).
    * Returns (fwd, bwd) views of the shared checkpointed frames with
    * [[forward]]'s/[[backward]]'s exact schemas. */
  def forwardBackward(words: DataFrame, pieces: DataFrame,
                      maxWordLen: Int, maxPieceLen: Int): (DataFrame, DataFrame) = {
    var dps = Vector(words
      .select(col("w"), col("wc"), lit(0).as("idx"), lit(1.0).as("v"))
      .withColumn("dir", explode(array(lit("f"), lit("b"))))
      .localCheckpoint())
    for (i <- 1 to maxWordLen) {
      val lo = math.max(0, i - maxPieceLen)
      val prev = dps.slice(lo, i).reduce(_ unionByName _)
      val terms = prev.filter(length(col("w")) >= i)
        .join(pieces,
          col("piece") === when(col("dir") === "f",
              substring(col("w"), col("idx") + 1, lit(i) - col("idx")))
            .otherwise(substring(col("w"),
              length(col("w")) - lit(i) + 1, lit(i) - col("idx"))))
        .select(col("w"), col("wc"), col("dir"),
          (lit(i) - col("idx")).as("d"), (col("v") * col("p")).as("v"))
      val aggs = (1 to maxPieceLen)
        .map(d => max(when(col("d") === d, col("v"))).as(s"t$d"))
      dps = dps :+ terms.groupBy("w", "wc", "dir").agg(aggs.head, aggs.tail: _*)
        .select(col("w"), col("wc"), col("dir"), lit(i).as("idx"),
          (1 to maxPieceLen).map(d => coalesce(col(s"t$d"), lit(0.0)))
            .reduce(_ + _).as("v"))
        .localCheckpoint()
    }
    val all = dps.reduce(_ unionByName _)
    (all.filter(col("dir") === "f")
       .select(col("w"), col("wc"), col("idx").as("pos"), col("v").as("a")),
     all.filter(col("dir") === "b")
       .select(col("w"), col("wc"), col("idx").as("r"), col("v").as("b")))
  }

  /** Quantized expected piece counts — the full-EM E-step: for every
    * span (i−d, i] of every word whose substring is a vocabulary piece,
    * the posterior mass routed through that span is
    * α(i−d)·p(piece)·β(len−i)/α(len); weighted by word frequency,
    * floored to [[EmUnit]] micro-units per span (fixed IEEE tree:
    * ((((wc·α)·p)·β)/α_full)·10⁶), and summed exactly per piece.
    * Kept-but-unused pieces count 0 (mirroring [[counts]]). */
  def expectedCounts(words: DataFrame, pieces: DataFrame,
                     fwd: DataFrame, bwd: DataFrame, kept: DataFrame,
                     maxPieceLen: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spans = words
      .select(col("w"), col("wc"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("wc"), col("i"),
        explode(sequence(lit(1), least(lit(maxPieceLen), col("i")))).as("d"))
    val terms = spans
      .join(pieces,
        col("piece") === substring(col("w"), col("i") - col("d") + 1, col("d")))
      .join(fwd.select(col("w").as("fw"), col("pos"), col("a")),
        col("fw") === col("w") && col("pos") === col("i") - col("d"))
      .join(bwd.select(col("w").as("bw"), col("r"), col("b")),
        col("bw") === col("w") && col("r") === length(col("w")) - col("i"))
      .join(fwd.filter(col("pos") === length(col("w")))
          .select(col("w").as("uw"), col("a").as("af")),
        col("uw") === col("w"))
    val em = terms.select(col("piece"),
      floor((((col("wc").cast("double") * col("a")) * col("p")) * col("b")
          / col("af")) * lit(1000000.0))
        .cast(DecimalType(38, 0)).as("em"))
    kept.select("piece")
      .join(em.groupBy("piece").agg(sum(col("em")).as("u")), Seq("piece"), "left")
      .select(col("piece"),
        coalesce(col("u"), lit(0L).cast(DecimalType(38, 0))).as("n"))
  }

  /** Smoothed probabilities over micro-unit counts:
    * p = (n + U)/(Σn + |V|·U) with U = [[EmUnit]] — the [[probs]]
    * add-one rule expressed in micro-units (for integer seed counts the
    * two rules produce BIT-IDENTICAL doubles: numerator and denominator
    * are the same reals scaled by U, both exact, one correctly-rounded
    * divide). Exact integer operands, one IEEE division. */
  def probsMicro(cnt: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tot = cnt.agg((sum(col("n")) + count(lit(1)) * lit(EmUnit))
      .cast(DecimalType(38, 0)).as("tv"))
    cnt.crossJoin(tot)
      .select(col("piece"),
        ((col("n") + lit(EmUnit)).cast("double") / col("tv").cast("double")).as("p"))
  }

  /** Full-EM training run — Kudo's actual E-step (marginalize over ALL
    * segmentations via forward/backward) where [[train]] uses the
    * hard-EM Viterbi-count approximation: seed → `emRounds` soft-EM
    * rounds → prune (singles + top `pruneMulti` multi-char by expected
    * micro-count) → final soft round. Returns the final expected
    * micro-unit count table (piece, n: DECIMAL(38,0)). Scale shape is
    * [[train]]'s: one corpus word-count agg, then everything
    * DISTINCT-vocabulary-bounded (per-(word, position) DP states ×2
    * directions, vocab-bounded span join, seed-bounded broadcast piece
    * table); steps localCheckpoint so lineage never nests. */
  def trainEm(wordsIn: DataFrame, maxWordLen: Int = MaxWordLen,
              maxPieceLen: Int = MaxPieceLen, seedMulti: Int = 80,
              emRounds: Int = 2, pruneMulti: Int = 40): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(emRounds >= 1 && seedMulti >= 1 && pruneMulti >= 1)
    val words = wordsIn.localCheckpoint() // corpus-sized agg runs once
    def emRound(kept: DataFrame): DataFrame = {
      val p = probsMicro(kept).localCheckpoint() // read by fwd, bwd, span join
      val (f, b) = forwardBackward(words, p, maxWordLen, maxPieceLen)
      expectedCounts(words, p, f, b, kept, maxPieceLen).localCheckpoint()
    }
    var cnt = seed(words, maxPieceLen, seedMulti)
      .select(col("piece"),
        (col("n").cast(DecimalType(38, 0)) * lit(EmUnit)).as("n"))
      .localCheckpoint()
    for (_ <- 1 to emRounds) cnt = emRound(cnt)
    val multi = cnt.filter(length(col("piece")) >= 2)
      .orderBy(col("n").desc, col("piece").asc).limit(pruneMulti)
    val pruned = cnt.filter(length(col("piece")) === 1)
      .unionByName(multi).localCheckpoint()
    emRound(pruned)
  }
}
