package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The per-replica salt families the scale probes replicate corpora
  * with — extracted so their CLAIMED family sizes are spec-verifiable.
  *
  * The r12 lesson this object exists for: a salt family whose nominal
  * size exceeds its real PERIOD silently turns a scale probe into an
  * adversarial near-copy corpus (the original coordinate-permutation
  * pairing `mult = 2r+1, shift = r` aliased at period 64, so a 100×
  * embedding corpus carried 36 exact twin bands and the probe measured
  * duplicate geometry, not scale). Every family here carries a claimed
  * size; ScaleOpsSpec's salt-period law verifies each claim by exact
  * pairwise distinctness of the full orbit and FAILS on a deliberately
  * aliased family, so the next salt author cannot repeat the mistake
  * unchecked. */
object ProbeSalts {

  /** Multipliers coprime to 26 — the text affine family's `a` values. */
  val textCoprime: Array[Int] = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Claimed size of the text alphabet-permutation family. */
  val textFamilySize: Int = textCoprime.length * 26

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  /** Replica r's alphabet permutation x → a·x + b (mod 26), a coprime to
    * 26 — shifts enumerate first so replicas 0..25 are exactly the
    * rotation family earlier probe rows were measured with (r = 0
    * identity). Two replicas share a shingle only if their permutations
    * coincide, so pairwise distinctness of the orbit IS the
    * shingle-disjointness claim. */
  def textPermutation(r: Int): String = {
    require(0 <= r && r < textFamilySize,
      s"text-permutation replica $r outside the family [0, $textFamilySize)" +
        " — more replicas than the affine family has distinct members" +
        " would alias and measure a near-copy corpus, not scale")
    val a = textCoprime(r / 26)
    val b = r % 26
    alpha.indices.map(x => alpha((a * x + b) % 26)).mkString
  }

  /** Claimed size of the embedding coordinate-permutation family. */
  val coordFamilySize: Int = 2048

  /** Replica `rep`'s 1-based permuted index for coordinate `i` (0-based):
    * j = (i·mult + shift) mod 64 + 1 with mult = 2·((rep ≫ 6) mod 32)+1
    * (odd ⇒ bijective mod 2⁶) and shift = rep mod 64 — 32 multipliers ×
    * 64 shifts = 2048 DISTINCT permutations. Replicas 0–63 keep the
    * identity multiplier, so every ≤ 64× probe row measured before the
    * r12 fix is unaffected. */
  def coordPermutation(rep: Column, i: Column): Column =
    ((i * ((shiftright(rep, 6) % 32) * 2 + 1) + rep % 64) % 64) + 1

  /** The DELIBERATELY ALIASED pre-r12 pairing (mult = 2r+1, shift = r):
    * mult and mult+64 act identically mod 2⁶, so the real period is 64
    * — kept as the negative case the salt-period law must detect. */
  def coordPermutationAliased(rep: Column, i: Column): Column =
    ((i * (rep * 2 + 1) + rep) % 64) + 1

  /** Claimed size of the direction-salt family (amplitude salt for
    * cosine-separated replicas: the multiplier walks i·(rep+1) mod 23, a
    * prime, so replicas rep and rep+23 get identical factor vectors —
    * the period IS 23 and probes `require(m <= 23)`). */
  val directionFamilySize: Int = 23

  /** Replica `rep`'s per-component amplitude factor for coordinate `i`:
    * 1 + (((i·(rep+1)) mod 23) − 11) · 0.07. */
  def directionFactor(rep: Column, i: Column): Column =
    lit(1.0) + (((i * (rep + 1)) % 23) - 11).cast("double") * lit(0.07)
}
