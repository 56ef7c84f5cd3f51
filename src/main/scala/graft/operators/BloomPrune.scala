package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the explicit form of runtime filter
  * pushdown: build a bit-array Bloom filter over the SMALL side's join
  * keys (one explode + one ≤ m/64-row bit_or aggregate + one bounded
  * collect), ship it to every executor as a literal, and prune the BIG
  * side's scan BEFORE the join shuffle. At 100 TB the shuffle of
  * non-matching big-side rows is the dominant join cost; a few-KB bit
  * array deletes most of it at the scan. The pruned frame still passes
  * through the exact join (Bloom admits false positives, never false
  * negatives), so results are provably identical to the plain join.
  *
  * Bits are md5-derived (Kirsch–Mitzenmacher double hashing, the
  * [[Dedup.md5Hash60]]/[[Dedup.md5Hash56]] technique): position j of key
  * is `(h1 + j·h2) mod m`. Engine-exact, so an external engine replays
  * the filter INCLUDING its false positives — the candidate set itself
  * sits under the DuckDB oracle, not just the final join result.
  */
object BloomPrune {

  /** The nHashes bit positions of a key (non-negative; h1 < 2^60 and
    * j·h2 < j·2^56 keep the sum overflow-free for j ≤ 48 — ENFORCED:
    * past 48 the sum could wrap negative and `% mBits` would emit
    * negative positions, which element_at reads count-from-end —
    * silent false negatives in a filter documented false-negative-free). */
  def bitPositions(key: Column, nHashes: Int, mBits: Int): Seq[Column] = {
    require(nHashes >= 1 && nHashes <= 48,
      s"nHashes must be in [1, 48] (overflow-free double-hash range), got $nHashes")
    val ks = key.cast("string")
    val h1 = Dedup.md5Hash60(ks)
    val h2 = Dedup.md5Hash56(ks)
    (0 until nHashes).map(j => (h1 + lit(j.toLong) * h2) % mBits)
  }

  /** Build the filter: mBits/64 longs, word w holds bits [64w, 64w+63].
    * The aggregate output is ≤ mBits/64 rows regardless of corpus size —
    * the only collect is that bounded frame. */
  def buildBits(keys: DataFrame, key: Column, nHashes: Int, mBits: Int): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val words = keys
      .select(explode(array(bitPositions(key, nHashes, mBits): _*)).as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("w"), (col("p") % 64).as("b"))
      // shift amount is a COLUMN — the SQL function form takes expressions
      .groupBy("w").agg(bit_or(call_function("shiftleft", lit(1L), col("b"))).as("bits"))
      .collect() // bounded: ≤ mBits/64 bit-word rows
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test against the literal bit array: all nHashes bits set.
    * Pure codegen'd bit math riding the scan — no join, no shuffle. The
    * bit-word literal is hoisted ONCE and referenced from every probe —
    * the serialized plan ships one mBits/64-long array, not nHashes
    * copies. Practical mBits ceiling: the array is a plan literal, so
    * keep it broadcast-sized (≤ a few MB, i.e. mBits ≲ 10⁸); larger
    * filters should switch to a real broadcast-join runtime filter. */
  def mightContain(key: Column, bits: Array[Long], nHashes: Int, mBits: Int): Column = {
    val bitsLit = typedlit(bits.toSeq)
    bitPositions(key, nHashes, mBits).map { p =>
      val word = element_at(bitsLit, shiftright(p, 6).cast("int") + 1)
      call_function("shiftright", word, (p % 64)).bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Prune `big` to rows whose key might be in `smallKeys`, then take the
    * exact semi-join against the (deduplicated) small side — identical
    * output to the un-pruned semi-join. The exact join is NOT forced
    * broadcast: the bloom build never collects the key set (only the
    * fixed-size bit words), so the "small" side may still be
    * shuffle-join-sized — AQE decides, and the shuffle it decides over
    * is the PRUNED big side. */
  def prunedJoin(big: DataFrame, bigKey: String, smallKeys: DataFrame,
                 smallKey: String, nHashes: Int = 3, mBits: Int = 4096): DataFrame = {
    val keys = smallKeys.select(col(smallKey)).distinct()
    val bits = buildBits(keys, col(smallKey), nHashes, mBits)
    big.filter(mightContain(col(bigKey), bits, nHashes, mBits))
      .join(keys, col(bigKey) === col(smallKey), "left_semi")
  }
}
