package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal.{JdkCodecs, MediaAsset, MediaSpec}

/** The media codecs are REAL JDK containers, not fakes: encode must emit
  * well-formed PNG/WAV magic, and decode must recover every pixel and
  * sample value exactly (PNG is lossless, 16-bit PCM is exact). The
  * end-to-end aggregate is separately oracle-gated (`mm_decode_real`);
  * this spec pins the per-asset round-trip against the closed forms.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PNG/WAV containers carry real format magic") {
    val png = JdkCodecs.encodePng(7L)
    assert(png.take(8).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
      0x1a, 0x0a).map(_.toByte), "not a PNG container")
    val wav = JdkCodecs.encodeWav(7L)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
  }

  test("encode -> decode round-trip matches the closed forms exactly") {
    for (id <- Seq(0L, 1L, 63L, 64L, 255L, 256L, 511L)) {
      val dec = JdkCodecs.decode(
        MediaAsset(id, "s", JdkCodecs.encodePng(id),
          JdkCodecs.encodePngGrad(id), JdkCodecs.encodeWav(id)))
      assert(dec.width == MediaSpec.width(id), s"width id=$id")
      assert(dec.height == MediaSpec.height(id), s"height id=$id")
      assert(dec.mean_r == MediaSpec.red(id), s"mean_r id=$id")
      assert(dec.mean_g == MediaSpec.green(id), s"mean_g id=$id")
      assert(dec.mean_b == MediaSpec.blue(id), s"mean_b id=$id")
      assert(dec.n_samples == MediaSpec.nSamples(id), s"n_samples id=$id")
      assert(dec.mean_amp == MediaSpec.amplitude(id), s"mean_amp id=$id")
    }
  }

  test("resize2x picks exactly the even-coordinate source pixels") {
    for (id <- Seq(0L, 1L, 63L, 64L, 255L, 511L)) {
      val (w2, h2, sum) = JdkCodecs.decodeResize2x(id, JdkCodecs.encodePngGrad(id))
      val (w, h) = (MediaSpec.width(id), MediaSpec.height(id))
      assert(w2 == (w + 1) / 2 && h2 == (h + 1) / 2, s"dims id=$id")
      var want = 0L
      for (y <- 0 until h2; x <- 0 until w2)
        want += MediaSpec.gradPix(id, 2 * x, 2 * y)
      assert(sum == want, s"gray sum id=$id")
      // a one-off sampler (taking (2x+1, 2y), the classic off-by-one)
      // would produce a different sum on the gradient — the closed form
      // is pixel-position-sensitive, not just value-sensitive
      var off = 0L
      for (y <- 0 until h2; x <- 0 until w2)
        off += MediaSpec.gradPix(id, math.min(2 * x + 1, w - 1), 2 * y)
      assert(off != want, s"gradient must expose off-by-one sampling id=$id")
    }
  }

  test("a corrupted container fails loudly, not silently") {
    val good = MediaAsset(3L, "s", JdkCodecs.encodePng(3L),
      JdkCodecs.encodePngGrad(3L), JdkCodecs.encodeWav(3L))
    intercept[Exception] {
      JdkCodecs.decode(good.copy(png = good.png.take(10)))
    }
    intercept[Exception] {
      JdkCodecs.decode(good.copy(wav = Array[Byte](1, 2, 3)))
    }
  }

  test("averageHash64 matches the grid closed form; decode is position-exact") {
    for (id <- Seq(0L, 1L, 63L, 64L, 255L, 256L, 511L)) {
      val got = JdkCodecs.averageHash64(JdkCodecs.encodePngGrad(id), id)
      val (w, h) = (MediaSpec.width(id), MediaSpec.height(id))
      val samples = for (y <- 0 until 8; x <- 0 until 8)
        yield MediaSpec.gradPix(id, x * w / 8, y * h / 8).toLong
      val s = samples.sum
      var want = 0L
      for (k <- 0 until 64) if (samples(k) * 64 > s) want |= 1L << (63 - k)
      assert(got == want, s"aHash id=$id")
      assert(got != 0L && got != -1L, s"degenerate hash id=$id")
    }
  }

  test("mm_phash_dedup equals brute-force hamming<=3; blocking is cartesian-free") {
    def ahash(id: Long): Long = {
      val (w, h) = (MediaSpec.width(id), MediaSpec.height(id))
      val samples = for (y <- 0 until 8; x <- 0 until 8)
        yield MediaSpec.gradPix(id, x * w / 8, y * h / 8).toLong
      val s = samples.sum
      var bits = 0L
      for (k <- 0 until 64) if (samples(k) * 64 > s) bits |= 1L << (63 - k)
      bits
    }
    val nDocs = math.min(
      Tables.load(spark, sfDir, "documents").count(),
      operators.Multimodal.MediaDocs.toLong)
    val hs = (0L until nDocs).map(id => id -> ahash(id)).toMap
    val want = (for {
      a <- 0L until nDocs; b <- (a + 1) until nDocs
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d)).toSet
    val df = operators.Multimodal.queries("mm_phash_dedup")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want, s"got=${got.size} want=${want.size}")
    assert(got.exists(_._3 == 0), "fixture must contain exact hash collisions")
    assert(got.exists(_._3 > 0), "fixture must contain non-identical near-dups")
    assert(got.size.toLong < nDocs * (nDocs - 1) / 20,
      "hamming gate must be selective, not all-pairs")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"pair generation must go through the quarter-block equi-join:\n$p")
  }

  test("audio resample halves sample count (ceil) and keeps amplitude mass") {
    for (id <- Seq(3L, 4L)) { // n = 503 (odd, ceil path) and 504 (even)
      val (n, sum) = JdkCodecs.decodeResampleWav2x(id, JdkCodecs.encodeWav(id))
      assert(n == (MediaSpec.nSamples(id) + 1) / 2, s"doc $id count")
      assert(sum == MediaSpec.amplitude(id).toLong * n, s"doc $id mass")
    }
  }

  test("pipeline_multimodal: funnel is monotone and cartesian-free") {
    val df = operators.Multimodal.queries("pipeline_multimodal")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 4)
    val byStage = rows.map(r => r.getAs[String]("stage_name") ->
      (r.getAs[Long]("n_items"), r.getAs[Long]("n_pixels"))).toMap
    val (nDec, pxDec) = byStage("decoded")
    val (nKept, pxKept) = byStage("deduped")
    val (nRz, pxRz) = byStage("resized")
    val (nBins, pxBins) = byStage("packed")
    assert(nDec > 0 && nKept < nDec, "phash dedup must drop something")
    assert(nRz == nKept, "resize consumes exactly the keep set")
    assert(pxRz < pxKept && pxBins == pxRz,
      "resize shrinks pixel mass; packing preserves it")
    assert(nBins > 0 && nBins < nRz, "packing must bin multiple images")
    assert(pxKept < pxDec, "dropped images must take their pixels with them")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"pipeline must stay on the quarter-block equi-join:\n$p")
  }

  test("mm_pair_integrity: all three statuses non-vacuous, masses closed-form") {
    val got = SparkEntry.queries("mm_pair_integrity")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set("paired", "caption_only", "media_only"),
      s"statuses: ${got.keySet}")
    val ids = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cap = ids.keySet.filter(_ % 11 != 3)
    val med = ids.keySet.filter(id =>
      id < operators.Multimodal.MediaDocs && id % 13 != 5)
    def px(id: Long): Long = (64 + id % 64) * (48 + id % 48)
    val wantN = Map(
      "paired" -> (cap & med).size.toLong,
      "caption_only" -> (cap -- med).size.toLong,
      "media_only" -> (med -- cap).size.toLong)
    got.foreach { case (st, (n, chars, pxm)) =>
      assert(n == wantN(st), s"$st: n=$n want=${wantN(st)}")
      val members = st match {
        case "paired" => cap & med
        case "caption_only" => cap -- med
        case _ => med -- cap
      }
      val wantChars =
        if (st == "media_only") 0L else members.toSeq.map(ids).sum
      val wantPx =
        if (st == "caption_only") 0L else members.toSeq.map(px).sum
      assert(chars == wantChars && pxm == wantPx,
        s"$st masses: ($chars,$pxm) want ($wantChars,$wantPx)")
    }
  }

  test("mm_decode_real decodes the generated corpus at sf0.001") {
    val rows = operators.Multimodal.queries("mm_decode_real")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_media")).sum
    assert(total == math.min(500L, operators.Multimodal.MediaDocs.toLong),
      s"expected every doc under the cap to decode, got $total")
  }
}
