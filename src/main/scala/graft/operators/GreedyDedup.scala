package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Order-dependent greedy identity dedup — the reference's `best_faces`
  * fold (ref: pipeline/video_extract_frame.py:203-230):
  *
  * stream candidates in scan order; vs each kept identity compute embedding
  * similarity and box IoU:
  *   - first kept entry with `sim >= simThr` → same identity; replace the
  *     entry in place iff the candidate's quality is strictly higher;
  *   - else first entry with `sim < simThr && iou > iouThr` → ambiguous
  *     overlap, discard the candidate;
  *   - no entry matched → append as a new identity.
  *
  * This is NOT a pure groupBy (results depend on fold order), so it runs as
  * `groupByKey(group).flatMapGroups` with an explicit in-group sort by
  * `seq` — deterministic, and documented as such. Per-group state is the
  * kept-identity list only (refs per video are tiny: the reference gates at
  * 2–3), so memory stays O(identities), while candidates stream through a
  * sorted buffer bounded by per-video candidate count.
  *
  * At 100 TB scale: one shuffle on `group` (video id); group fan-in is
  * per-video frame candidates, which the upstream gates keep small. Skewed
  * videos don't exist by construction (frame scan is stride-sampled).
  */
object GreedyDedup {

  /** One face candidate: `group` = video, `seq` = deterministic scan order
    * (frame_idx, then box index), box in absolute coords, quality score,
    * embedding (AdaFace stand-in). */
  case class Candidate(group: Long, seq: Long,
                       x1: Double, y1: Double, x2: Double, y2: Double,
                       quality: Double, embedding: Seq[Float])

  /** A kept identity: `identity_idx` is the 1-based append order (stable —
    * in-place replacement keeps the slot). `seq` is the winning candidate's;
    * the winning embedding rides along for downstream ref-similarity joins. */
  case class Identity(group: Long, identity_idx: Int, seq: Long,
                      x1: Double, y1: Double, x2: Double, y2: Double,
                      quality: Double, embedding: Seq[Float])

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    if (na <= 0 || nb <= 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** IoU matching the reference arithmetic (pipeline/video_extract_frame.py:112-120). */
  def iouScalar(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
                bx1: Double, by1: Double, bx2: Double, by2: Double): Double = {
    val iw = math.max(0.0, math.min(ax2, bx2) - math.max(ax1, bx1))
    val ih = math.max(0.0, math.min(ay2, by2) - math.max(ay1, by1))
    val inter = iw * ih
    val areaA = math.max(0.0, ax2 - ax1) * math.max(0.0, ay2 - ay1)
    val areaB = math.max(0.0, bx2 - bx1) * math.max(0.0, by2 - by1)
    val union = areaA + areaB - inter
    if (union > 0) inter / union else 0.0
  }

  private final class Entry(var seq: Long, var x1: Double, var y1: Double,
                            var x2: Double, var y2: Double, var quality: Double,
                            var embedding: Seq[Float])

  /** Pure fold over one group's candidates (must already be in scan order). */
  def foldGroup(group: Long, cands: Iterator[Candidate],
                simThr: Double, iouThr: Double): Iterator[Identity] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Entry]
    cands.foreach { c =>
      var matched = false
      var i = 0
      while (!matched && i < kept.length) {
        val e = kept(i)
        val sim = cosine(e.embedding, c.embedding)
        if (sim >= simThr) {
          matched = true
          if (c.quality > e.quality) {
            e.seq = c.seq; e.x1 = c.x1; e.y1 = c.y1; e.x2 = c.x2; e.y2 = c.y2
            e.quality = c.quality; e.embedding = c.embedding
          }
        } else if (iouScalar(e.x1, e.y1, e.x2, e.y2, c.x1, c.y1, c.x2, c.y2) > iouThr) {
          matched = true // ambiguous overlap, discard candidate
        }
        i += 1
      }
      if (!matched)
        kept += new Entry(c.seq, c.x1, c.y1, c.x2, c.y2, c.quality, c.embedding)
    }
    kept.iterator.zipWithIndex.map { case (e, idx) =>
      Identity(group, idx + 1, e.seq, e.x1, e.y1, e.x2, e.y2, e.quality, e.embedding)
    }
  }

  def run(cands: Dataset[Candidate], simThr: Double = 0.9, iouThr: Double = 0.2)
         (implicit spark: SparkSession): Dataset[Identity] = {
    import spark.implicits._
    cands.groupByKey(_.group).flatMapGroups { (g, it) =>
      foldGroup(g, it.toArray.sortBy(c => (c.seq, c.x1)).iterator, simThr, iouThr)
    }
  }
}
