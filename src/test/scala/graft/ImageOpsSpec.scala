package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{ImageOps, Models}
import graft.ml.ImageOps.{BGR, Frame, Gray, RGB}

class ImageOpsSpec extends AnyFunSuite {

  private def randomArrays(seed: Long, n: Int): Seq[Array[Int]] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(_ => Array.fill(rng.nextInt(60))(rng.nextInt(1000) - 200))
  }

  test("dHash: stable, near-dup robust, far for different content, fallback for garbage") {
    import graft.multimodal.Multimodal
    def gradientPng(w: Int, h: Int, tweak: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8))
      if (tweak) img.setRGB(1, 1, 0xffffff) // single-pixel edit
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def checkerPng(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, if (((x / 8) + (y / 8)) % 2 == 0) 0xffffff else 0x000000)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = Multimodal.dhash64(gradientPng(64, 64, tweak = false)).get
    val same = Multimodal.dhash64(gradientPng(64, 64, tweak = false)).get
    val tweaked = Multimodal.dhash64(gradientPng(64, 64, tweak = true)).get
    val resizedSrc = Multimodal.dhash64(
      Multimodal.ImageIoCodec.resize(gradientPng(128, 128, tweak = false), 64).get).get
    val other = Multimodal.dhash64(checkerPng(64, 64)).get
    assert(base == same)                                          // deterministic
    assert(java.lang.Long.bitCount(base ^ tweaked) <= 4)          // near-dup close
    assert(java.lang.Long.bitCount(base ^ resizedSrc) <= 6)       // survives resize
    assert(java.lang.Long.bitCount(base ^ other) > 10)            // different far
    assert(Multimodal.dhash64(Array.fill(40)(3.toByte)).isEmpty)  // garbage → None
    // fallback path: exact byte dups still pair up through the banded join
    assert(Multimodal.byteContentHash(Array[Byte](1, 2, 3)) ==
      Multimodal.byteContentHash(Array[Byte](1, 2, 3)))
    assert(Multimodal.byteContentHash(Array[Byte](1, 2, 3)) !=
      Multimodal.byteContentHash(Array[Byte](1, 2, 4)))
  }

  test("syntheticPng: deterministic bytes, twin within 2 Hamming bits, seeds far apart") {
    import graft.multimodal.Multimodal
    val seeds = Seq(0L, 50L, 100L, 150L, 200L, 250L)
    seeds.foreach { s =>
      // byte-reproducible render+encode
      assert(java.util.Arrays.equals(Multimodal.syntheticPng(s), Multimodal.syntheticPng(s)))
      val base = Multimodal.dhash64(Multimodal.syntheticPng(s)).get
      val twin = Multimodal.dhash64(Multimodal.syntheticPng(s, perturbed = true)).get
      assert(java.lang.Long.bitCount(base ^ twin) <= 2,
        s"seed $s: twin drifted ${java.lang.Long.bitCount(base ^ twin)} bits")
    }
    // distinct seeds: dHashes far apart (no accidental planted cross-pairs)
    val hs = seeds.map(s => Multimodal.dhash64(Multimodal.syntheticPng(s)).get)
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) > 10,
        s"seeds ${seeds(i)} / ${seeds(j)} collide perceptually")
  }

  test("coercion properties: clip bounds, gray triples, swap is an involution") {
    randomArrays(1L, 100).foreach { raw =>
      val clipped = ImageOps.clipToUint8(Frame(RGB, raw))
      assert(clipped.values.forall(v => v >= 0 && v <= 255))
    }
    randomArrays(2L, 100).foreach { raw =>
      val g = ImageOps.grayToColor(Frame(Gray, raw))
      assert(g.order == BGR && g.values.length == raw.length * 3)
      assert(raw.indices.forall(i =>
        g.values(3 * i) == raw(i) && g.values(3 * i + 1) == raw(i) && g.values(3 * i + 2) == raw(i)))
    }
    randomArrays(3L, 100).foreach { seed =>
      val vals = seed.take(seed.length / 3 * 3) // whole pixels
      val f = Frame(BGR, vals)
      val twice = ImageOps.swapChannels(ImageOps.swapChannels(f))
      assert(twice.order == BGR && twice.values.sameElements(vals))
    }
  }

  test("retinaface crop coercion: float BGR gray input ends uint8 3-channel RGB") {
    val grayFloat = Frame(Gray, Array(-5, 100, 300))
    val out = ImageOps.coerceCrop(grayFloat, callerPassedBgr = true)
    assert(out.order == RGB)
    assert(out.values.toSeq == Seq(0, 0, 0, 100, 100, 100, 255, 255, 255))
    // RGB caller passes through untouched apart from the clip
    val rgbIn = Frame(RGB, Array(1, 2, 3))
    assert(ImageOps.coerceCrop(rgbIn, callerPassedBgr = false).values.toSeq == Seq(1, 2, 3))
  }

  test("person detect: channel-swap retry recovers a detector that wants the other order") {
    var calls = 0
    // a detector that only sees people in BGR frames
    val bgrOnly = (f: Frame) => {
      calls += 1
      if (f.order == BGR) Right(Seq(Models.Box(1, 2, 3, 4))) else Right(Seq.empty)
    }
    val (boxes, err) = ImageOps.detectWithChannelRetry(bgrOnly, Frame(RGB, Array(9, 8, 7)))
    assert(boxes == Seq(Models.Box(1, 2, 3, 4)) && err.isEmpty && calls == 2)
    // already-correct order: single call, no retry
    calls = 0
    val (b2, _) = ImageOps.detectWithChannelRetry(bgrOnly, Frame(BGR, Array(9, 8, 7)))
    assert(b2.nonEmpty && calls == 1)
    // gray frames never retry (reference guards ndim==3)
    calls = 0
    val (b3, _) = ImageOps.detectWithChannelRetry(bgrOnly, Frame(Gray, Array(5)))
    assert(b3.isEmpty && calls == 1)
  }

  test("person detect: error surfaces as data, empty-after-retry keeps first error") {
    val failing = (_: Frame) => Left("cuda out of memory"): Either[String, Seq[Models.Box]]
    val (boxes, err) = ImageOps.detectWithChannelRetry(failing, Frame(RGB, Array(1, 2, 3)))
    assert(boxes.isEmpty && err.contains("cuda out of memory"))
    val emptyFirst = (f: Frame) =>
      if (f.order == RGB) Left("bad tensor") else Right(Seq.empty[Models.Box])
    val (b2, e2) = ImageOps.detectWithChannelRetry(emptyFirst, Frame(RGB, Array(1, 2, 3)))
    assert(b2.isEmpty && e2.contains("bad tensor"))
  }

  test("face quality: raw -> RGB -> BGR retry ladder, errors as data when all fail") {
    // model succeeds only on BGR input (third rung of the ladder)
    var orders = List.empty[ImageOps.ChannelOrder]
    val bgrModel = (f: Frame) => {
      orders = orders :+ f.order
      if (f.order == BGR) Right((0.87, "ok")) else Left(s"wrong order ${f.order}")
    }
    val ((score, msg), err) =
      ImageOps.scoreWithPermutationRetry(bgrModel, Frame(Gray, Array(300, -2)))
    assert(score == 0.87 && msg == "ok" && err.isEmpty)
    assert(orders == List(Gray, RGB, BGR), s"ladder order was $orders")
    // all three rungs failing: score 0.0, predict_failed, accumulated errors
    val never = (_: Frame) => Left("nan"): Either[String, (Double, String)]
    val ((s2, m2), e2) = ImageOps.scoreWithPermutationRetry(never, Frame(RGB, Array(1, 2, 3)))
    assert(s2 == 0.0 && m2 == "predict_failed")
    assert(e2.exists(e => e.contains("first_err") && e.contains("bgr_err")))
  }

  test("md5GrayPng: decode->resize is the identity, so dHash == direct md5 bit math") {
    import graft.multimodal.Multimodal
    val md = java.security.MessageDigest.getInstance("MD5")
    def gray(seed: Long, x: Int, y: Int, perturbed: Boolean): Int = {
      val g = md.digest(s"graft-dimg:$seed:$x:$y".getBytes("UTF-8"))(0) & 0xff
      if (perturbed && x == 3 && y == 2) math.min(255, g + 6) else g
    }
    def directHash(seed: Long, perturbed: Boolean): Long = {
      var h = 0L; var bit = 0
      for (y <- 0 until 8; x <- 0 until 8) {
        if (gray(seed, x, y, perturbed) < gray(seed, x + 1, y, perturbed)) h |= (1L << bit)
        bit += 1
      }
      h
    }
    // the law dedup_image_dhash_oracle's SQL replay rests on: the REAL
    // decode -> drawImage(9x8) -> luma -> gradient path returns exactly
    // the bits computed straight from the md5 bytes
    for (seed <- Seq(0L, 7L, 10L, 123L); p <- Seq(false, true)) {
      val engine = Multimodal.dhash64(Multimodal.md5GrayPng(seed, p))
      assert(engine.contains(directHash(seed, p)),
        s"seed=$seed perturbed=$p: engine $engine != direct ${directHash(seed, p)}")
    }
    // the planted twin sits within 2 Hamming bits of its original
    for (seed <- Seq(0L, 10L, 50L)) {
      val d = java.lang.Long.bitCount(directHash(seed, false) ^ directHash(seed, true))
      assert(d <= 2, s"twin distance $d for seed $seed")
    }
  }
}
