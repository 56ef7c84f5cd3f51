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
}
