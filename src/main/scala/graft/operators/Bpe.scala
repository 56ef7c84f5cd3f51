package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** CANONICAL iterative BPE training (Sennrich et al., ACL 2016 — "Neural
  * Machine Translation of Rare Words with Subword Units"), distributed:
  * the true training loop in which adjacent-pair statistics are
  * RECOMPUTED over the re-encoded vocabulary after every merge, so later
  * merges see earlier merges' output symbols as first-class units (the
  * one-shot ranked cut `bpe_encode` uses is a documented approximation;
  * this is the algorithm SentencePiece/HF trainers run, usually on a
  * single-node sample — here it runs exactly, over the full corpus).
  *
  * Representation: one ROW per (word, position, symbol) — no per-row
  * loops, no opaque lambdas. Each merge round is:
  *  1. dense re-index per word (row_number window — word-length bounded);
  *  2. adjacency via lead(sym) (same bounded window);
  *  3. frequency-weighted pair counts — a map-side-partial agg whose
  *     output is bounded by the live symbol-pair space, never the corpus;
  *  4. best pair under the (count desc, sym asc, nsym asc) TOTAL order —
  *     a one-row driver collect (the kmeans-centroid class);
  *  5. leftmost-first non-overlapping merge application, relationally:
  *     matches chain into runs (gaps-and-islands on idx − match-rank) and
  *     only ODD ranks within a run merge — exactly canonical BPE's scan
  *     semantics in "aaaa" → "aa aa"; the merged row takes `sym‖nsym`,
  *     its consumed neighbour drops via a lag(head) flag.
  * Every step is integer counts, string concat, and bounded per-word
  * windows — `bpe_train_oracle` replays all rounds bit-for-bit in SQL.
  *
  * Scale shape at 100 TB: the loop runs over the DISTINCT weighted
  * vocabulary (bounded by the language, ~10⁷ words, not the corpus), so
  * per-round work is vocab-sized; corpus size enters only through the
  * one word-count agg that builds the vocab. Rounds localCheckpoint (the
  * iterative-algorithm discipline — Components/HITS) so the lineage
  * never stacks K rounds deep.
  */
object Bpe {

  /** One learned merge: (left symbol, right symbol, weighted count). */
  final case class Merge(left: String, right: String, n: Long)

  /** Symbol rows (w, wc, pos, sym) from a weighted vocab (w, wc):
    * one row per character position. substring-based (not split) so the
    * SQL replay's `substring(w, i, 1)` is character-identical. */
  def symbolRows(vocab: DataFrame): DataFrame =
    vocab.select(col("w"), col("wc"),
        posexplode(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))).as(Seq("p", "sym")))
      .select(col("w"), col("wc"), (col("p") + 1).as("pos"), col("sym"))

  /** Run `numMerges` canonical rounds; returns the learned merge table in
    * rank order and the final symbol rows (w, wc, pos, sym). */
  def train(vocab: DataFrame, numMerges: Int): (Seq[Merge], DataFrame) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    var rows = symbolRows(vocab).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      // idx and nsym ride ONE window pass (r16): row_number and lead share
      // the (w, pos) spec — idx order IS pos order, so lead-over-pos ≡
      // lead-over-idx and one WindowExec/sort serves both (the old shape
      // sorted twice per round per consumer).
      val wWin = Window.partitionBy("w").orderBy("pos")
      val iWin = Window.partitionBy("w").orderBy("idx")
      val adj = rows
        .withColumn("idx", row_number().over(wWin))
        .withColumn("nsym", lead("sym", 1).over(wWin))
        .drop("pos")
      val best = adj.filter(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("sym").asc, col("nsym").asc)
        .limit(1).collect() // bounded: 1-row argmax
      if (best.isEmpty) exhausted = true
      else {
        val (ma, mb, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(ma, mb, n)
        val kept = adj.filter(col("sym") === ma && col("nsym") === mb)
          .withColumn("mrn", row_number().over(iWin))
          .withColumn("grp", col("idx") - col("mrn"))
          .withColumn("krn",
            row_number().over(Window.partitionBy("w", "grp").orderBy("idx")))
          .filter(col("krn") % 2 === 1)
          .select(col("w"), col("idx"), lit(true).as("head"))
        rows = adj.join(kept, Seq("w", "idx"), "left")
          .withColumn("head", coalesce(col("head"), lit(false)))
          .withColumn("prev_head", coalesce(lag("head", 1).over(iWin), lit(false)))
          .filter(!col("prev_head"))
          .select(col("w"), col("wc"), col("idx").as("pos"),
            when(col("head"), concat(col("sym"), col("nsym")))
              .otherwise(col("sym")).as("sym"))
          .localCheckpoint()
        k += 1
      }
    }
    (merges.result(), rows)
  }

  /** One learned WordPiece merge: symbols, pair count, and the
    * micro-scaled likelihood score n_ab·10¹² ⌊/⌋ (n_a·n_b). */
  final case class WpMerge(left: String, right: String, n: Long, score: Long)

  /** WordPiece symbol rows: the first character of a word is a plain
    * symbol, every later character carries the `##` continuation prefix
    * (Schuster & Nakajima, ICASSP 2012 — the BERT tokenizer's alphabet),
    * so "abc" → a, ##b, ##c and subword identity encodes word position. */
  def symbolRowsWordPiece(vocab: DataFrame): DataFrame =
    symbolRows(vocab).select(col("w"), col("wc"), col("pos"),
      when(col("pos") === 1, col("sym"))
        .otherwise(concat(lit("##"), col("sym"))).as("sym"))

  /** CANONICAL iterative WordPiece training — the same distributed loop
    * as [[train]] with the WordPiece PAIR SCORE: each round merges the
    * pair maximizing count(ab)/(count(a)·count(b)) — the unigram-LM
    * likelihood GAIN of the merge — instead of raw count, so a rare pair
    * of rare symbols beats a frequent pair of ubiquitous ones (the
    * property that gives BERT vocabularies their long-tail morphemes).
    * Scoring is exact integer micro-units (n_ab·10¹² floor-div n_a·n_b,
    * accumulated in DECIMAL(38,0) — the bt_rating discipline, no float
    * boundary and no BIGINT wrap at 100 TB counts); ties break
    * (score desc, n desc, sym asc, nsym asc) — a total order. Merge
    * application is leftmost-first non-overlapping exactly as BPE; the
    * merged symbol strips the right side's `##` (a‖##b → ab, ##a‖##b →
    * ##ab). Per-round work is bounded by the DISTINCT vocabulary, the
    * argmax is a one-row driver collect, rounds localCheckpoint —
    * `wordpiece_train_oracle` replays every round bit-for-bit in SQL. */
  def trainWordPiece(vocab: DataFrame, numMerges: Int): (Seq[WpMerge], DataFrame) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    var rows = symbolRowsWordPiece(vocab).localCheckpoint()
    val merges = Seq.newBuilder[WpMerge]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      // idx AND nsym ride one window pass INTO the per-round checkpoint
      // (r16): the old shape checkpointed only idx and re-ran the lead
      // window over the checkpoint once per consumer (pair counts, merge
      // match, rewrite).
      val wWin = Window.partitionBy("w").orderBy("pos")
      val iWin = Window.partitionBy("w").orderBy("idx")
      val adj = rows
        .withColumn("idx", row_number().over(wWin))
        .withColumn("nsym", lead("sym", 1).over(wWin))
        .drop("pos")
        .localCheckpoint() // read by pair counts, singles, and the rewrite
      val singles = adj.groupBy("sym").agg(sum(col("wc")).as("occ"))
      val pairs = adj.filter(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(sum(col("wc")).as("n"))
      val num = col("n").cast(DecimalType(38, 0)) *
        lit(1000000000000L).cast(DecimalType(38, 0))
      val den = col("na").cast(DecimalType(38, 0)) * col("nb").cast(DecimalType(38, 0))
      val best = pairs
        .join(singles.select(col("sym"), col("occ").as("na")), "sym")
        .join(singles.select(col("sym").as("nsym"), col("occ").as("nb")), "nsym")
        .withColumn("score", ((num - (num % den)) / den).cast("long"))
        .orderBy(col("score").desc, col("n").desc, col("sym").asc, col("nsym").asc)
        .limit(1).select("sym", "nsym", "n", "score").collect() // bounded: 1-row argmax
      if (best.isEmpty) exhausted = true
      else {
        val (ma, mb) = (best(0).getString(0), best(0).getString(1))
        merges += WpMerge(ma, mb, best(0).getLong(2), best(0).getLong(3))
        val kept = adj.filter(col("sym") === ma && col("nsym") === mb)
          .withColumn("mrn", row_number().over(iWin))
          .withColumn("grp", col("idx") - col("mrn"))
          .withColumn("krn",
            row_number().over(Window.partitionBy("w", "grp").orderBy("idx")))
          .filter(col("krn") % 2 === 1)
          .select(col("w"), col("idx"), lit(true).as("head"))
        val joined = when(col("nsym").startsWith("##"),
          concat(col("sym"), col("nsym").substr(lit(3), length(col("nsym")))))
          .otherwise(concat(col("sym"), col("nsym")))
        rows = adj.join(kept, Seq("w", "idx"), "left")
          .withColumn("head", coalesce(col("head"), lit(false)))
          .withColumn("prev_head", coalesce(lag("head", 1).over(iWin), lit(false)))
          .filter(!col("prev_head"))
          .select(col("w"), col("wc"), col("idx").as("pos"),
            when(col("head"), joined).otherwise(col("sym")).as("sym"))
          .localCheckpoint()
        k += 1
      }
    }
    (merges.result(), rows)
  }
}
