package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-scale deduplication operators: exact (hash-groupBy), MinHash+LSH
  * (shingle → signature → banded bucket join), SimHash (64-bit weighted
  * bit votes + banded Hamming blocking).
  *
  * Scale design:
  *  - exact dedup = one hash aggregate on a 128-bit content key (map-side
  *    partial; the canonical key is computed in codegen, never collected);
  *  - MinHash LSH shuffles (band_idx, band_hash) — candidate generation is
  *    linear in corpus size, never the O(n²) pair space; the self-join hits
  *    only same-bucket rows, and near-dup verification runs on the
  *    candidate set only;
  *  - SimHash blocking: a 64-bit sketch per doc, pairs only within equal
  *    16-bit bands (pigeonhole: any pair with Hamming distance <= 12 shares
  *    at least one of 4 bands... guaranteed for <= 3; wider distances are
  *    caught probabilistically by multiple bands).
  */
object Dedup {

  /** Intersection size of two DISTINCT, SORTED shingle arrays: sorted-merge
    * native expression when registered (no per-pair hash-set allocation),
    * `size(array_intersect(...))` otherwise. Exact integer either way, so
    * swapping paths can never change a Jaccard oracle result. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    if (graft.plans.GraftFunctions.nativeAvailable)
      call_function("graft_sorted_intersect_count", a, b)
    else size(array_intersect(a, b))

  /** Canonical bag-of-words key: sorted distinct tokens, space-joined.
    * Invariant to token order/repetition — catches shuffled/duplicated
    * copies that byte-exact hashing misses. */
  def bagOfWordsKey(text: Column): Column =
    array_join(array_sort(array_distinct(TextFunctions.tokens(text))), " ")

  /** Exact dedup groups: md5(canonical key) → (content_hash, keep_id =
    * min id, dup_count). Survivors = rows where id == keep_id. */
  def exactGroups(df: DataFrame, idCol: String, canonicalKey: Column): DataFrame =
    df.groupBy(md5(canonicalKey).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** k-permutation MinHash signature over a shingle array: element j is
    * min over shingles of xxhash64(j, shingle) (seeded by position).
    * Native single-pass kernel when bridging is available; declarative
    * fallback is bit-compatible (same XxHash64 chain). */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val native =
      try Some(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.MinHashSignature(
          org.apache.spark.sql.graft.ColumnBridge.expression(shingles), k)))
      catch { case _: Throwable => None }
    native.getOrElse(minhashSignatureHof(shingles, k))
  }

  /** Declarative MinHash fallback (k transform+array_min trees). */
  def minhashSignatureHof(shingles: Column, k: Int): Column =
    array((0 until k).map(j =>
      array_min(transform(shingles, t => xxhash64(lit(j), t)))): _*)

  /** Estimated Jaccard from two equal-length signatures: matching fraction. */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k

  /** LSH banding: (id, band_idx, band_hash) rows — join key for candidate
    * generation. `bands * rowsPerBand` must equal the signature length.
    * `replayable=true` hashes each band as the high 60 bits of md5 of the
    * comma-joined slice (any engine recomputes it); default is engine
    * xxhash64. Both modes join on an 8-byte LONG key — the shuffle the
    * whole operator is designed around never ships a string bucket name.
    * Either way the hash only NAMES the bucket — equal slices collide
    * identically, so the candidate set is the same. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int, replayable: Boolean = false): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      val bandSlice = slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand)
      val h = if (replayable) md5Hash60(array_join(bandSlice.cast("array<string>"), ","))
              else xxhash64(bandSlice)
      struct(lit(b).as("band_idx"), h.as("band_hash"))
    }: _*)
    // NULL signatures (zero-shingle docs) generate no bands at all: the
    // md5 path would null the band hash (dropped by the equi-join anyway)
    // but xxhash64 hashes a null slice to the bare seed — every null-sig
    // doc would share one bucket. Filter once here, before the explode.
    df.filter(col(sigCol).isNotNull)
      .select(col(idCol), col(sigCol), explode(bandStructs).as("band"))
      .select(col(idCol), col(sigCol), col("band.band_idx"), col("band.band_hash"))
  }

  /** Candidate pairs from LSH banding (distinct id pairs sharing any band),
    * each carrying both signatures for estimation/verification.
    *
    * The band self-join and the distinct run over BARE (id_a, id_b) rows;
    * signatures attach afterwards, once per surviving pair — the same
    * ship-arrays-late shape as [[graft.operators.Similarity.lshNearDupPairs]].
    * Carrying the two 32-element arrays THROUGH the join (sig shipped once
    * per band row, then once per pre-distinct collision, then hashed inside
    * a distinct over ~1 KB composite rows) measured 10.6× the rows but 30×
    * the time at the 10× scale probe; id-only rows restore linear scaling.
    * The candidate SET is unchanged, so oracle replays are unaffected.
    *
    * PRECONDITION: `idCol` is unique in `df` (one signature per id). The
    * sig-attach joins emit one row per (pair × id occurrence), so a
    * duplicated id would duplicate its pairs — the pre-rewrite 4-column
    * distinct would have collapsed them. Every caller feeds a frame keyed
    * by id (survivors of an exact-dedup groupBy or a per-doc signature
    * select), which is also what makes the banding itself meaningful. */
  def lshCandidatePairs(df: DataFrame, idCol: String, sigCol: String,
                        bands: Int, rowsPerBand: Int, replayable: Boolean = false): DataFrame =
    lshCandidateIdPairs(df, idCol, sigCol, bands, rowsPerBand, replayable)
      .join(df.select(col(idCol).as("id_a"), col(sigCol).as("sig_a")), "id_a")
      .join(df.select(col(idCol).as("id_b"), col(sigCol).as("sig_b")), "id_b")
      .select("id_a", "id_b", "sig_a", "sig_b")

  // ── Oracle-replayable (md5-keyed) variants ─────────────────────────────
  //
  // xxhash64 exists in no other engine, so signatures built on it can only
  // ever be rows-only checked. These variants re-key the sketches on
  // md5-derived integers — the same engine-exact technique splitBucket /
  // hashBucket use — so an external engine (the DuckDB oracle) replays
  // signatures, bands, candidate pairs, and verdicts bit-for-bit.

  /** High 60 bits of md5 as a non-negative long (hex chars 1-15).
    * Replayable: `CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)`. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 56 bits from md5 hex chars 17-30 — independent of [[md5Hash60]]'s
    * bits, sized so `h1 + j*h2` < 2^60 + j·2^56 stays under 2^62 for
    * j ≤ 48 and under 2^63 (signed-64 overflow-free, ANSI-safe) for all
    * j ≤ 63 — callers raising k past 49 keep correctness but lose the
    * 2^62 headroom. */
  def md5Hash56(c: Column): Column =
    conv(substring(md5(c), 17, 14), 16, 10).cast("long")

  /** Oracle-replayable MinHash signature as a pure narrow map: ONE md5
    * per shingle, split into two independent halves (`_hs` struct array),
    * then k cheap arithmetic array_min passes. The k "permutations" are
    * Kirsch–Mitzenmacher double hashing `g_j = h1 + j*h2` — the published
    * standard for deriving k hash functions from two (Kirsch &
    * Mitzenmacher, ESA'06), and strictly cheaper at 100 TB than k full
    * hashes per shingle (the xxhash64 kernel path pays k=32
    * hashes/shingle; this pays 1 md5 + k adds). The sketch rides the
    * document scan: no explode, no k-column aggregate, no shuffle — only
    * the band join shuffles. `_hs` is materialized as its own projection
    * so CollapseProject cannot inline the md5 into every one of the k
    * minima. Replayable: any engine recomputes `g_j` from
    * `CAST(('0x' || substring(md5(t),...)) AS BIGINT)`.
    *
    * Empty/null shingle arrays get a NULL signature — matching the
    * explode+GROUP BY formulation (and a replaying engine's UNNEST),
    * which drops zero-shingle docs. Without the guard, array_min over an
    * empty transform yields k NULLs, every such doc band-hashes the same
    * empty slice, and they all collide into one spurious LSH bucket. A
    * NULL sig falls out of [[lshCandidatePairs]] naturally: its md5 band
    * hash is NULL and equi-joins drop NULL keys. */
  def withMinhashSignatureMd5(df: DataFrame, shingles: Column, k: Int,
                              sigName: String = "sig"): DataFrame = {
    val hs = transform(shingles, t =>
      struct(md5Hash60(t).as("h1"), md5Hash56(t).as("h2")))
    df.withColumn("_hs", hs)
      .withColumn(sigName, when(size(col("_hs")) > 0, array((0 until k).map(j =>
        array_min(transform(col("_hs"),
          h => h.getField("h1") + lit(j.toLong) * h.getField("h2")))): _*)))
      .drop("_hs")
  }

  /** [[withMinhashSignatureMd5]] that ALSO emits the sorted-distinct
    * [[md5Hash60]] shingle hashes (`hashedName`) from the SAME per-shingle
    * md5 pass — for callers that build both the signature and a hashed
    * shingle-set column (the exact-Jaccard verify side): one md5 per
    * shingle instead of two. Bit-identical to computing
    * `array_sort(array_distinct(transform(shingles, md5Hash60)))`
    * separately — `_hs` preserves shingle order and h1 IS md5Hash60. */
  def withMinhashSigAndHashesMd5(df: DataFrame, shingles: Column, k: Int,
                                 sigName: String = "sig",
                                 hashedName: String = "shh"): DataFrame = {
    val hs = transform(shingles, t =>
      struct(md5Hash60(t).as("h1"), md5Hash56(t).as("h2")))
    df.withColumn("_hs", hs)
      .withColumn(sigName, when(size(col("_hs")) > 0, array((0 until k).map(j =>
        array_min(transform(col("_hs"),
          h => h.getField("h1") + lit(j.toLong) * h.getField("h2")))): _*)))
      .withColumn(hashedName, array_sort(array_distinct(
        transform(col("_hs"), h => h.getField("h1")))))
      .drop("_hs")
  }

  /** The bare-id candidate-pair half of [[lshCandidatePairs]] — distinct
    * (id_a, id_b) sharing any band, NO signature attach. For callers that
    * never read the signatures off the pairs (or attach their own per-doc
    * features once), skipping the two sig-attach joins entirely. */
  def lshCandidateIdPairs(df: DataFrame, idCol: String, sigCol: String,
                          bands: Int, rowsPerBand: Int,
                          replayable: Boolean = false): DataFrame = {
    val bd = lshBands(df, idCol, sigCol, bands, rowsPerBand, replayable)
      .select(col(idCol), col("band_idx"), col("band_hash"))
    bd.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
      .join(bd.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b")),
        Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** 64-bit SimHash per row. Native path: one per-row expression
    * ([[graft.plans.SimHash64]]) — a pure narrow map, zero shuffles, so the
    * sketch rides the document scan. Fallback (no registration): relational
    * explode → 64 conditional-sum aggregates → bit reassembly (one shuffle). */
  def simhash64(df: DataFrame, idCol: String, tokensCol: Column): DataFrame =
    if (graft.plans.GraftFunctions.nativeAvailable)
      df.select(col(idCol), call_function("graft_simhash", tokensCol).as("simhash"))
    else simhash64Relational(df, idCol, tokensCol)

  /** Relational SimHash fallback (engine-builtin hashing via xxhash64). */
  def simhash64Relational(df: DataFrame, idCol: String, tokensCol: Column): DataFrame = {
    val hashed = df.select(col(idCol), explode(tokensCol).as("_tok"))
      .select(col(idCol), xxhash64(lit(0), col("_tok")).as("_th"))
    val votes = (0 until 64).map(j =>
      sum(when((shiftright(col("_th"), j) % 2 =!= 0), 1).otherwise(-1)).as(s"_v$j"))
    val grouped = hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val bits = (0 until 64).map(j =>
      when(col(s"_v$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
    grouped.withColumn("simhash", bits.reduce(_.bitwiseOR(_)))
      .select(col(idCol), col("simhash"))
  }

  // ── Bottom-k (KMV) set sketch ──────────────────────────────────────────

  /** Bottom-k (KMV) sketch per key: the k SMALLEST md5-derived 60-bit
    * hashes of the group's distinct items, as one sorted array — the
    * single-permutation min-wise sample (Broder, "On the resemblance and
    * containment of documents", SEQUENCES'97; Bar-Yossef et al.'s KMV
    * distinct-value sketch, RANDOM'02). One hash per item, mergeable
    * (union two sketches = bottom-k of their concat), bounded at k longs
    * per key — the corpus-pair similarity sketch that compares 100 TB
    * datasets with a tiny array join.
    *
    * NOT interchangeable with the Kirsch–Mitzenmacher k-permutation
    * signature ([[withMinhashSignatureMd5]]): over a corpus-sized item
    * set all k of its g_j = h1 + j·h2 minima concentrate on the same
    * tiny-h1/tiny-h2 element, so its per-position match indicators
    * collapse into one correlated coin (measured |est − exact| up to
    * 0.97 as a dataset-similarity estimate — fine only for LSH candidate
    * screening, where exact verification follows). Bottom-k match
    * indicators are distinct elements of the union, which is what holds
    * the estimator variance at √(J(1−J)/k).
    *
    * Implementation: exact integer window top-k (row_number over the
    * hash) — NOT a double-scored heap: doubles lose exactness above 2^53
    * and these are 60-bit keys an oracle compares as exact integers. */
  def bottomKSketch(df: DataFrame, keyCol: String, itemCol: String, k: Int,
                    outCol: String = "hs"): DataFrame = {
    val hashed = df.select(col(keyCol), md5Hash60(col(itemCol)).as("_h")).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCol).orderBy("_h")
    hashed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(keyCol).agg(sort_array(collect_list(col("_h"))).as(outCol))
  }

  /** Jaccard estimate from two [[bottomKSketch]] arrays:
    * |X ∩ botA ∩ botB| / |X| with X = bottom-k of A∪B (assembled from
    * the two sketches). The denominator is |X|, NOT k: when the union
    * has fewer than k distinct hashes X is the ENTIRE union and the
    * estimate is exact (identical small sets → 1.0, disjoint → 0.0);
    * dividing by k would bias every small-set estimate toward 0. */
  def kmvJaccardEst(ha: Column, hb: Column, k: Int): Column = {
    val unionBotK = slice(array_sort(array_distinct(concat(ha, hb))), 1, k)
    val common = size(filter(unionBotK, x =>
      array_contains(ha, x) && array_contains(hb, x)))
    when(size(unionBotK) > 0,
      common.cast("double") / size(unionBotK).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Oracle-replayable 60-bit SimHash: md5-keyed token hashes, bit votes
    * folded relationally (explode → 60 conditional sums, map-side partial
    * → bit reassembly; one shuffle on idCol). The 64-bit native kernel
    * ([[simhash64]]) is the zero-shuffle fast path; this variant trades
    * one agg shuffle for a sketch any engine can recompute. Docs with no
    * tokens produce no row (no bits to vote) — matching a replaying
    * engine's UNNEST-of-empty-list semantics. */
  def simhash60Md5(df: DataFrame, idCol: String, tokensCol: Column): DataFrame = {
    val hashed = df.select(col(idCol), explode(tokensCol).as("_tok"))
      .select(col(idCol), md5Hash60(col("_tok")).as("_th"))
    val votes = (0 until 60).map(j =>
      sum(when((shiftright(col("_th"), j) % 2 =!= 0), 1).otherwise(-1)).as(s"_v$j"))
    val grouped = hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val bits = (0 until 60).map(j =>
      when(col(s"_v$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
    grouped.withColumn("simhash", bits.reduce(_.bitwiseOR(_)))
      .select(col(idCol), col("simhash"))
  }

  /** Near-dup pairs by banded SimHash blocking: pairs sharing any
    * bandBits-wide band, kept when Hamming distance <= maxHamming.
    * Defaults fit the 64-bit sketch (4×16); the 60-bit md5 sketch uses
    * 4×15. Pigeonhole: any pair with distance < nBands shares a band. */
  def simhashPairs(df: DataFrame, idCol: String, simhashCol: String,
                   maxHamming: Int, nBands: Int = 4, bandBits: Int = 16): DataFrame = {
    val mask = (1L << bandBits) - 1
    val banded = df.select(col(idCol), col(simhashCol),
      explode(array((0 until nBands).map(b => struct(lit(b).as("band_idx"),
        (shiftrightunsigned(col(simhashCol), b * bandBits).bitwiseAND(lit(mask))).as("band_val"))): _*))
        .as("band"))
      .select(col(idCol), col(simhashCol), col("band.band_idx"), col("band.band_val"))
    val a = banded.withColumnRenamed(idCol, "id_a").withColumnRenamed(simhashCol, "sim_a")
    val b = banded.withColumnRenamed(idCol, "id_b").withColumnRenamed(simhashCol, "sim_b")
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
