package graft.ml

/** Channel-order / dtype robustness semantics of the reference's image
  * ops, modeled as deterministic pre-processing + retry policy over a
  * symbolic frame (no pixel libs in container; the policies are what
  * matter and they are pure functions of the frame representation).
  *
  *  - RetinaFace crop coercion: clip-to-uint8, gray→3-channel, BGR→RGB
  *    (ref common/image/retinaface_op.py:31-42);
  *  - person-detect channel-swap retry on empty result
  *    (ref common/image/person_detect_op.py:97-114);
  *  - face-quality raw → RGB → BGR triple retry with errors-as-data
  *    (ref common/image/face_quality_op.py:120-174).
  */
object ImageOps {

  sealed trait ChannelOrder extends Serializable
  case object RGB extends ChannelOrder
  case object BGR extends ChannelOrder
  case object Gray extends ChannelOrder

  /** Symbolic frame: interleaved per-pixel channel values (3 per pixel
    * for color, 1 for gray). Values may exceed uint8 range until clipped
    * (the reference receives float crops). */
  final case class Frame(order: ChannelOrder, values: Array[Int]) extends Serializable {
    def isColor: Boolean = order != Gray
  }

  /** dtype != uint8 → clip(0,255) (retinaface_op.py:31-32). */
  def clipToUint8(f: Frame): Frame =
    f.copy(values = f.values.map(v => math.max(0, math.min(255, v))))

  /** ndim == 2 → replicate the gray channel ×3 (retinaface_op.py:34-36).
    * cv2.COLOR_GRAY2BGR yields BGR ordering. */
  def grayToColor(f: Frame): Frame =
    if (f.isColor) f
    else Frame(BGR, f.values.flatMap(v => Array(v, v, v)))

  /** RGB↔BGR: reverse each pixel's channel triple; gray is unchanged. */
  def swapChannels(f: Frame): Frame = f.order match {
    case Gray => f
    case o =>
      val out = f.values.clone()
      var i = 0
      while (i + 2 < out.length) {
        val t = out(i); out(i) = out(i + 2); out(i + 2) = t
        i += 3
      }
      Frame(if (o == RGB) BGR else RGB, out)
  }

  /** The full RetinaFace crop coercion chain (retinaface_op.py:31-42):
    * clip to uint8 → gray to 3-channel → convert to RGB if the caller
    * passed BGR (`crop_bgr` key), else assume RGB already. */
  def coerceCrop(f: Frame, callerPassedBgr: Boolean): Frame = {
    val colored = grayToColor(clipToUint8(f))
    if (callerPassedBgr || colored.order == BGR) {
      if (colored.order == BGR) swapChannels(colored) else colored
    } else colored
  }

  /** Channel-swap retry (person_detect_op.py:97-114): run the detector;
    * on an EMPTY result (or error) retry ONCE with channels swapped —
    * only for 3-channel frames. Errors surface as data: boxes stay empty
    * and the first error string is returned, never thrown. */
  def detectWithChannelRetry(detect: Frame => Either[String, Seq[Models.Box]],
                             frame: Frame): (Seq[Models.Box], Option[String]) = {
    val first = detect(frame)
    val firstErr = first.left.toOption
    val boxes = first.getOrElse(Seq.empty)
    if (boxes.nonEmpty || !frame.isColor) (boxes, if (boxes.isEmpty) firstErr else None)
    else detect(swapChannels(frame)) match {
      case Right(alt) if alt.nonEmpty => (alt, None)
      case Right(_) => (Seq.empty, firstErr)
      case Left(e2) => (Seq.empty, firstErr.orElse(Some(e2)))
    }
  }

  /** Face-quality permutation retry (face_quality_op.py:120-174): score
    * the raw input; on failure coerce to RGB and retry; on failure again
    * retry as BGR. All three failing → score 0.0, msg "predict_failed",
    * plus the accumulated error string (errors as data). */
  def scoreWithPermutationRetry(score: Frame => Either[String, (Double, String)],
                                frame: Frame): ((Double, String), Option[String]) =
    score(frame) match {
      case Right(ok) => (ok, None)
      case Left(e1) =>
        val rgb = {
          val colored = grayToColor(clipToUint8(frame))
          if (colored.order == BGR) swapChannels(colored) else colored
        }
        score(rgb) match {
          case Right(ok) => (ok, None)
          case Left(e2) =>
            score(swapChannels(rgb)) match {
              case Right(ok) => (ok, None)
              case Left(e3) =>
                ((0.0, "predict_failed"),
                  Some(s"first_err=$e1; rgb_err=$e2; bgr_err=$e3"))
            }
        }
    }
}
