package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synthesize(
    spark, Tables.documents(spark, sf0001).select("doc_id"), "doc_id")

  test("synthesized media matches the declared schema shape") {
    assert(media.columns.toSeq == Seq("media_id", "kind", "content", "meta"))
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("expression-level decode stub emits bounded features per row") {
    val out = Multimodal.decodeStub(media)
    assert(out.count() == media.count())
    val feats = out.select("features").as[Seq[Double]].collect()
    assert(feats.forall(f => f.length == 8 && f.forall(v => v >= 0.0 && v < 1.0)))
  }

  test("partition-wise decode is deterministic and preserves cardinality") {
    val a = Multimodal.decodePartitionwise(media)
      .select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    val b = Multimodal.decodePartitionwise(media.repartition(7))
      .select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(a.size == media.count())
    assert(a == b) // partitioning must not change per-row results
    assert(a.values.forall(_.length == 8))
  }

  import org.apache.spark.sql.functions._

  // hand-built media with controlled durations/geometry (synthesize can't
  // produce a zero-duration video: 60000 ≡ 0 mod 3 forces kind=image)
  private def mediaRow(id: Long, kind: String, w: Int, h: Int, dur: Long) =
    (id, kind, w, h, dur)
  private def handMedia(rows: (Long, String, Int, Int, Long)*) =
    rows.toDF("media_id", "kind", "w", "h", "dur").select(
      col("media_id"), col("kind"),
      to_binary(sha2(col("media_id").cast("string"), 256), lit("hex"))
        .as("content"),
      struct(col("w").as("width"), col("h").as("height"),
        lit(16000).as("sample_rate"), col("dur").as("duration_ms")).as("meta"))

  test("frameSample emits ceil(dur·fps/1000) frames, videos only, ts<dur") {
    val fr = Multimodal.frameSample(media, fps = 30.0, featureDims = 4)
    val durs = Multimodal.metadataScan(media)
      .filter(col("kind") === "video")
      .select("media_id", "duration_ms").as[(Long, Long)].collect().toMap
    val counts = fr.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    // every video with dur>0 appears with exactly ceil(dur*30/1000) frames
    assert(counts.keySet == durs.filter(_._2 > 0).keySet)
    counts.foreach { case (id, n) =>
      assert(n == math.ceil(durs(id) * 30.0 / 1000.0).toLong)
    }
    val bad = fr.join(Multimodal.metadataScan(media), Seq("media_id"))
      .filter(col("ts_ms") >= col("duration_ms")).count()
    assert(bad == 0L) // no sampled frame past end-of-stream
    val feats = fr.select("frame_features").as[Seq[Double]].collect()
    assert(feats.forall(f => f.length == 4 && f.forall(v => v >= 0.0 && v < 1.0)))
  }

  test("frameSample guards zero-duration videos (no fabricated frames)") {
    val m = handMedia(
      mediaRow(1L, "video", 64, 64, 0L),   // zero-length stream
      mediaRow(2L, "video", 64, 64, 1L),   // 1 ms → exactly 1 frame at ts 0
      mediaRow(3L, "image", 64, 64, 0L))   // non-video never explodes
    val fr = Multimodal.frameSample(m, fps = 30.0, featureDims = 2)
      .select("media_id", "frame_no", "ts_ms").as[(Long, Int, Long)].collect()
    assert(fr.toSeq == Seq((2L, 0, 0L)))
  }

  test("resizePlan caps the long side, preserves aspect, floors, min 1px") {
    val m = handMedia(
      mediaRow(1L, "image", 640, 480, 0L), // shrink: 256/640 → 256×192
      mediaRow(2L, "image", 100, 50, 0L),  // in budget: untouched
      mediaRow(3L, "image", 3000, 2, 0L),  // extreme aspect: floor→0 clamps to 1
      mediaRow(4L, "audio", 640, 480, 0L)) // non-image passes through
    val out = Multimodal.resizePlan(m, maxSide = 256)
      .select("media_id", "target_width", "target_height", "needs_resize")
      .as[(Long, Int, Int, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 256, 192, true),
      (2L, 100, 50, false),
      (3L, 256, 1, true),   // floor(2·256/3000)=0 → clamped to 1
      (4L, 640, 480, false)))
  }

  test("ingestBinaryFiles: kind by extension, byte round-trip, " +
    "stable path-hash ids, glob filter, decode-stub composes") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_media").toString
    Files.write(Paths.get(dir, "a.png"), Array[Byte](1, 2, 3, 4))
    Files.write(Paths.get(dir, "b.wav"), Array[Byte](9, 8, 7))
    Files.write(Paths.get(dir, "c.xyz"), Array[Byte](5))
    Files.write(Paths.get(dir, "skip.txt"), Array[Byte](0))
    val got = graft.ops.Multimodal
      .ingestBinaryFiles(spark, dir, glob = "*.{png,wav,xyz}")
      .collect()
    assert(got.length == 3)
    val byKind = got.map(r => r.getAs[String]("kind") ->
      r.getAs[Array[Byte]]("content")).toMap
    assert(byKind("image").toSeq == Seq[Byte](1, 2, 3, 4))
    assert(byKind("audio").toSeq == Seq[Byte](9, 8, 7))
    assert(byKind("unknown").toSeq == Seq[Byte](5))
    assert(got.map(_.getAs[Long]("media_id")).distinct.length == 3)
    // re-ingest yields the SAME ids (stable across runs)
    val again = graft.ops.Multimodal
      .ingestBinaryFiles(spark, dir, glob = "*.{png,wav,xyz}")
      .collect().map(_.getAs[Long]("media_id")).toSet
    assert(again == got.map(_.getAs[Long]("media_id")).toSet)
    // the stub decoder runs over ingested rows (schema-compatible)
    val feats = graft.ops.Multimodal.decodeStub(
      graft.ops.Multimodal.ingestBinaryFiles(spark, dir, "*.png"))
    assert(feats.count() == 1)
  }

  // ---------------------------------------------------- real codec tier

  test("synthesizePng: decode(encode(img)) round-trips every pixel " +
    "through javax.imageio losslessly") {
    val ids = Seq(0L, 3L, 6L, 9L, 12L, 33L).toDF("doc_id") // id%3==0 → image
    val rows = Multimodal.synthesizePng(spark, ids, "doc_id")
      .select("media_id", "content", "meta.width", "meta.height")
      .as[(Long, Array[Byte], Int, Int)].collect()
    assert(rows.length == 6 && rows.forall(_._2 != null))
    rows.foreach { case (id, png, w, h) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == Multimodal.synthChannel(id, x, y, 0))
        assert(((rgb >> 8) & 0xff) == Multimodal.synthChannel(id, x, y, 1))
        assert((rgb & 0xff) == Multimodal.synthChannel(id, x, y, 2))
      }
    }
  }

  test("synthesizePng: non-image rows carry NULL content; kind follows " +
    "the id%3 mapping") {
    val ids = (0L to 8L).toDF("doc_id")
    val got = Multimodal.synthesizePng(spark, ids, "doc_id")
      .select("media_id", "kind", "content")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Array[Byte]]("content") == null)).sortBy(_._1)
    got.foreach { case (id, kind, nullBlob) =>
      val expect = Seq("image", "audio", "video")((id % 3).toInt)
      assert(kind == expect, s"id=$id")
      assert(nullBlob == (kind != "image"), s"id=$id")
    }
  }

  test("decodeResizeImages: only needs_resize blobs reach the codec " +
    "(in-budget images never deserialize), geometry from decoded truth") {
    // ids chosen so geometry spans in-budget and over-budget: w=id%13+4,
    // h=id%11+4; maxSide=9 → decode iff max(w,h)>9
    val ids = (0L to 59L by 3L).toDF("doc_id") // all images
    val media = Multimodal.synthesizePng(spark, ids, "doc_id")
    val expectDecodes = media
      .filter(greatest(col("meta.width"), col("meta.height")) > 9).count()
    assert(expectDecodes > 0 && expectDecodes < media.count(),
      "fixture must span both sides of the budget")
    val counter = spark.sparkContext.longAccumulator("decodes")
    val out = Multimodal.decodeResizeImages(media, maxSide = 9,
      decodeCounter = Some(counter))
    val got = out.collect()
    assert(got.length.toLong == expectDecodes)
    assert(counter.value == expectDecodes) // untouched blobs never decoded
    // decoded geometry is the codec's truth and matches the metadata here
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("src_width") == (id % 13 + 4).toInt)
      assert(r.getAs[Int]("src_height") == (id % 11 + 4).toInt)
      assert(math.max(r.getAs[Int]("target_width"),
        r.getAs[Int]("target_height")) <= 9)
    }
  }

  test("imageAHash: byte-identical images collide (patternMod dup " +
    "injection), lanes replay the hand-computed mean threshold") {
    // patternMod=10: ids 0 and 30 (both images, both ≡0 mod 10) carry
    // byte-identical PNG content → identical hash lanes; id 3 (pattern
    // 3) differs. Hand-replay pattern 0's aHash from the closed form.
    val ids = Seq(0L, 3L, 30L).toDF("doc_id")
    val got = Multimodal.imageAHash(
        Multimodal.synthesizePng(spark, ids, "doc_id", patternMod = 10))
      .select("media_id", "ahash_hi", "ahash_lo")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(0L) == got(30L), "identical content must collide")
    assert(got(0L) != got(3L), "distinct patterns must differ")
    // closed-form replay for pattern id=0 (w=4, h=4)
    val (w, h) = (4, 4)
    val gray = Array.tabulate(64) { p =>
      val (tx, ty) = (p % 8, p / 8)
      val (sx, sy) = (tx * w / 8, ty * h / 8)
      (Multimodal.synthChannel(0L, sx, sy, 0) +
        Multimodal.synthChannel(0L, sx, sy, 1) +
        Multimodal.synthChannel(0L, sx, sy, 2)) / 3
    }
    val sum = gray.map(_.toLong).sum
    var hi = 0L; var lo = 0L
    for (p <- 0 until 64; if gray(p) * 64L >= sum)
      if (p >= 32) hi |= 1L << (p - 32) else lo |= 1L << p
    assert(got(0L) == ((hi, lo)), s"got ${got(0L)} want ($hi, $lo)")
    // distance helper: identical → 0, self vs other > 0
    val d = Seq((got(0L)._1, got(0L)._2, got(30L)._1, got(30L)._2,
        got(3L)._1, got(3L)._2)).toDF("h1", "l1", "h2", "l2", "h3", "l3")
      .select(
        Multimodal.ahashDistance(col("h1"), col("l1"), col("h2"), col("l2")),
        Multimodal.ahashDistance(col("h1"), col("l1"), col("h3"), col("l3")))
      .head()
    assert(d.getInt(0) == 0 && d.getInt(1) > 0)
  }

  test("synthesizeWav + decodeWavFeatures: javax.sound WAV round-trips " +
    "every 16-bit sample; features replay the closed form") {
    val ids = Seq(1L, 4L, 7L, 49L).toDF("doc_id") // id%3==1 → audio
    val media = Multimodal.synthesizeWav(spark, ids, "doc_id")
    assert(media.filter(col("kind") =!= "audio").count() == 0)
    val got = Multimodal.decodeWavFeatures(media)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(got.size == 4)
    got.foreach { case (id, r) =>
      val n = (id % 50 + 20).toInt
      val samples = (0 until n).map(Multimodal.synthSample(id, _))
      assert(r.getAs[Int]("sample_rate") == 16000)
      assert(r.getAs[Long]("n_samples") == n.toLong)
      assert(r.getAs[Int]("peak_abs") == samples.map(math.abs).max)
      assert(r.getAs[Long]("sum_abs") ==
        samples.map(s => math.abs(s).toLong).sum)
      val zc = samples.sliding(2).count(p => p.head.toLong * p(1) < 0)
      assert(r.getAs[Long]("zero_crossings") == zc.toLong, s"id=$id")
    }
    // non-audio kinds carry NULL content and never reach the codec
    val all = Multimodal.synthesizeWav(spark,
      (0L to 8L).toDF("doc_id"), "doc_id")
    assert(all.filter(col("kind") === "audio" && col("content").isNull)
      .count() == 0)
    assert(all.filter(col("kind") =!= "audio" && col("content").isNotNull)
      .count() == 0)
    assert(Multimodal.decodeWavFeatures(all).count() == 3)
  }

  test("imageQualityRaw: exact integer moments + nano-snapped histogram " +
    "entropy replay the closed form; corrupted meta never changes pixels") {
    val ids = Seq(9L).toDF("doc_id") // image: w=9%13+4=13, h=9%11+4=13
    val media = Multimodal.synthesizePng(spark, ids, "doc_id")
    val r = Multimodal.imageQualityRaw(media).collect().head
    val (w, h) = (13, 13)
    assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
    val grays = for (y <- 0 until h; x <- 0 until w) yield
      (Multimodal.synthChannel(9L, x, y, 0) +
        Multimodal.synthChannel(9L, x, y, 1) +
        Multimodal.synthChannel(9L, x, y, 2)) / 3
    assert(r.getAs[Long]("gray_sum") == grays.map(_.toLong).sum)
    assert(r.getAs[Long]("gray_sq_sum") ==
      grays.map(g => g.toLong * g).sum)
    val hist = grays.groupBy(_ / 16).view.mapValues(_.size.toLong)
    val ent = hist.values.map(c => math.round(c * math.log(c.toDouble) * 1e9)).sum
    assert(r.getAs[Long]("ent_nano") == ent)
    // the metadata lie flags in the audit but the decoded truth (and so
    // every pixel statistic) is untouched
    val lied = Multimodal.withCorruptedMeta(media, everyNth = 9)
    assert(Multimodal.metadataScan(lied).select("width")
      .as[Int].head() == w + 5)
    val r2 = Multimodal.imageQualityRaw(lied).collect().head
    assert(r2.getAs[Int]("width") == w &&
      r2.getAs[Long]("gray_sum") == r.getAs[Long]("gray_sum"))
  }

  test("grayContrast computes in double from the first product: a 14 Mpx " +
    "saturated image is finite (the BIGINT n*s2 form would ANSI-throw)") {
    import org.apache.spark.sql.functions.{col, round}
    // n·Σg² = 1.4e7 · (65025 · 1.4e7) ≈ 1.27e19 > 2^63 — the r11 form
    // overflowed int64 here; the double form must return exact variance
    val n = 4000L * 3500L
    val rows = Seq(
      (n, 255L * n, 65025L * n),     // all-white: variance 0
      (n, 128L * n, 16384L * n))     // constant g=128: variance 0
      .toDF("n", "s1", "s2")
    val got = rows.select(
        round(Multimodal.grayContrast(col("n"), col("s1"), col("s2")), 6)
          .as("c"))
      .as[Double].collect().toSeq
    assert(got == Seq(0.0, 0.0), got.toString)
    // a non-degenerate case stays exact: half 0s, half 200s → var 10000
    val mixed = Seq((n, 100L * n, 20000L * n)).toDF("n", "s1", "s2")
    assert(mixed.select(round(Multimodal.grayContrast(col("n"), col("s1"),
      col("s2")), 6)).as[Double].head() == 10000.0)
  }

  test("audioFingerprint: byte-identical audio collides (patternMod), " +
    "fingerprint replays the hand-computed energy deltas") {
    // patternMod=10: ids 1 and 31 (both audio, both ≡1 mod 10) carry
    // byte-identical WAV content; id 4 (pattern 4) differs
    val ids = Seq(1L, 4L, 31L).toDF("doc_id")
    val got = Multimodal.audioFingerprint(
        Multimodal.synthesizeWav(spark, ids, "doc_id", patternMod = 10))
      .select("media_id", "n_samples", "fingerprint")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) == got(31L), "identical content must collide")
    assert(got(1L) != got(4L), "distinct signals must differ")
    // closed-form replay for pattern 1 (n = 21 samples, 16 windows)
    val n = 21
    val e = new Array[Long](16)
    for (i <- 0 until n)
      e(i * 16 / n) += math.abs(Multimodal.synthSample(1L, i)).toLong
    var fp = 0L
    for (w <- 1 until 16; if e(w) > e(w - 1)) fp |= 1L << (w - 1)
    assert(got(1L) == ((n.toLong, fp)), s"got ${got(1L)} want ($n, $fp)")
  }

  test("decodeResizeImages: nearest-neighbor checksum matches a " +
    "hand-computed replay of the closed form") {
    val ids = Seq(21L).toDF("doc_id") // w=21%13+4=12, h=21%11+4=14 → resize
    val out = Multimodal.decodeResizeImages(
      Multimodal.synthesizePng(spark, ids, "doc_id"), maxSide = 9)
      .collect().head
    val (w, h) = (12, 14)
    val tw = math.max((w * (9.0 / math.max(w, h))).floor.toInt, 1)
    val th = math.max((h * (9.0 / math.max(w, h))).floor.toInt, 1)
    assert(out.getAs[Int]("target_width") == tw)
    assert(out.getAs[Int]("target_height") == th)
    var ck = 0L; var rs = 0L
    for (ty <- 0 until th; tx <- 0 until tw) {
      val sx = tx * w / tw; val sy = ty * h / th
      val r = Multimodal.synthChannel(21L, sx, sy, 0)
      val g = Multimodal.synthChannel(21L, sx, sy, 1)
      val b = Multimodal.synthChannel(21L, sx, sy, 2)
      rs += r
      ck += (r + 256L * g + 65536L * b) * (1L + tx + tw.toLong * ty)
    }
    assert(out.getAs[Long]("pixel_checksum") == ck)
    assert(math.abs(out.getAs[Double]("r_mean") -
      rs.toDouble / (tw * th)) < 1e-9)
  }

  test("quarantine lane: corrupt blobs yield (null metrics, decode_error) " +
    "rows in EVERY codec tier — the job succeeds, the census is honest") {
    import org.apache.spark.sql.DataFrame
    // 20 image ids, every 5th blob garbage → 16 decode, 4 quarantine
    val imgIds = (0L to 57L by 3L).toDF("doc_id")
    val badImgs = Multimodal.withCorruptedBlobs(
      Multimodal.synthesizePng(spark, imgIds, "doc_id"), everyNth = 5)
    def split(out: DataFrame, metricCol: String): (Long, Long) = {
      val q = out.filter(col("decode_error").isNotNull)
      // quarantined rows carry NO metric values; decoded rows carry no error
      assert(q.filter(col(metricCol).isNotNull).count() == 0)
      (out.filter(col("decode_error").isNull).count(), q.count())
    }
    assert(split(Multimodal.imageQualityRaw(badImgs), "gray_sum")
      == ((16L, 4L)))
    assert(split(Multimodal.imageAHash(badImgs), "ahash_hi") == ((16L, 4L)))
    // resize tier: corrupt blobs that pass the metadata budget gate
    // quarantine inside the codec (maxSide=1 → every image over budget)
    assert(split(Multimodal.decodeResizeImages(badImgs, maxSide = 1),
      "pixel_checksum") == ((16L, 4L)))
    // 20 audio ids (id%3==1), every 5th blob garbage → ids 10, 25, 40, 55
    val audIds = (1L to 58L by 3L).toDF("doc_id")
    val badWavs = Multimodal.withCorruptedBlobs(
      Multimodal.synthesizeWav(spark, audIds, "doc_id"), everyNth = 5)
    assert(split(Multimodal.decodeWavFeatures(badWavs), "sum_abs")
      == ((16L, 4L)))
    assert(split(Multimodal.audioFingerprint(badWavs), "fingerprint")
      == ((16L, 4L)))
    // the census rolls the same numbers up in one pass
    val census = Multimodal.decodeCensus(
      Multimodal.imageQualityRaw(badImgs)).head()
    assert(census.getAs[Long]("n_rows") == 20L)
    assert(census.getAs[Long]("n_decoded") == 16L)
    assert(census.getAs[Long]("n_quarantined") == 4L)
  }

  test("JPEG flows through the same decode tier as PNG (ImageIO container " +
    "sniffing): geometry exact, zero quarantine, bytes genuinely lossy") {
    val ids = (0L to 27L by 3L).toDF("doc_id")
    val jpegs = Multimodal.synthesizeJpeg(spark, ids, "doc_id")
    // it IS a different container: JPEG SOI marker, not PNG magic
    val firstBytes = jpegs.select(col("content")).as[Array[Byte]]
      .collect()
    assert(firstBytes.forall(b => (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8), "expected JPEG SOI header")
    val out = Multimodal.imageQualityRaw(jpegs).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[String]("decode_error") == null, s"id=$id")
      assert(r.getAs[Int]("width") == (id % 13 + 4).toInt)
      assert(r.getAs[Int]("height") == (id % 11 + 4).toInt)
    }
    // lossy: same pattern, different pixel statistics than the PNG truth
    val png = Multimodal.imageQualityRaw(
      Multimodal.synthesizePng(spark, ids, "doc_id"))
      .select("media_id", "gray_sum").as[(Long, Long)].collect().toMap
    val diff = out.count(r =>
      png(r.getAs[Long]("media_id")) != r.getAs[Long]("gray_sum"))
    assert(diff > 0, "JPEG decode should not equal the lossless pattern")
  }

  test("audioFingerprint quarantines clips shorter than the window count " +
    "instead of hashing zero-filled windows (ADVICE r11 latent drift)") {
    // id=1 → n=21 samples: fine at windows=16, too short at windows=32
    val ids = Seq(1L).toDF("doc_id")
    val media = Multimodal.synthesizeWav(spark, ids, "doc_id")
    val ok = Multimodal.audioFingerprint(media, windows = 16).head()
    assert(ok.getAs[String]("decode_error") == null)
    val short = Multimodal.audioFingerprint(media, windows = 32).head()
    assert(short.getAs[String]("decode_error") != null &&
      short.getAs[String]("decode_error").contains("too short"))
    assert(short.isNullAt(short.fieldIndex("fingerprint")))
  }

  test("synthesizeAvi + decodeAviFrames: real MJPEG-in-AVI round-trips — " +
    "geometry and frame count match the closed form, frames within a " +
    "scene decode byte-identical, scene boundaries always differ") {
    // id%3==2 → video; id=5: w=5%13+4=9, h=5%11+4=9, n=5%10+4=9 frames,
    // scenes of 3 → boundaries at k=3 and k=6
    val ids = Seq(2L, 5L, 8L, 11L, 35L).toDF("doc_id")
    val media = Multimodal.synthesizeAvi(spark, ids, "doc_id")
    // container sanity: RIFF....AVI magic at the expected offsets
    media.select(col("content")).as[Array[Byte]].collect().foreach { b =>
      assert(new String(b.take(4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "AVI ")
    }
    val frames = Multimodal.decodeAviFrames(media).collect()
    assert(frames.forall(_.getAs[String]("decode_error") == null))
    val byVid = frames.groupBy(_.getAs[Long]("media_id"))
    assert(byVid.keySet == Set(2L, 5L, 8L, 11L, 35L))
    byVid.foreach { case (id, fr) =>
      assert(fr.length == (id % 10 + 4).toInt, s"id=$id frame count")
      fr.foreach { r =>
        assert(r.getAs[Int]("width") == (id % 13 + 4).toInt)
        assert(r.getAs[Int]("height") == (id % 11 + 4).toInt)
      }
      val metrics = fr.sortBy(_.getAs[Int]("frame_no"))
        .map(r => (r.getAs[Long]("gray_sum"), r.getAs[Long]("pixel_checksum")))
      metrics.zipWithIndex.sliding(2).foreach {
        case Array((a, i), (b, j)) =>
          if (j / 3 == i / 3)
            assert(a == b, s"id=$id frames $i,$j same scene must be equal")
          else assert(a != b, s"id=$id frames $i,$j cross a scene boundary")
        case _ =>
      }
    }
    // patternMod: distinct ids share byte-identical video (re-upload dup)
    val dup = Multimodal.synthesizeAvi(spark, Seq(2L, 32L).toDF("doc_id"),
      "doc_id", patternMod = 30)
      .select(col("content")).as[Array[Byte]].collect()
    assert(java.util.Arrays.equals(dup(0), dup(1)))
  }

  test("ahashNearDupPairs maxBucket: the hot-band cap is a subset of the " +
    "exact result, keeps each bucket's lowest-id prefix (byte-identical " +
    "groups still pair within it), and plans as bounded GroupedTopK") {
    // 30 images, patternMod=3 → three byte-identical groups of 10: every
    // band bucket is HOT (10 ids deep)
    val ids = (0L to 87L by 3L).toDF("doc_id")
    val ah = Multimodal.imageAHash(Multimodal.synthesizePng(spark, ids,
      "doc_id", patternMod = 3)).filter(col("decode_error").isNull)
    val exact = Multimodal.ahashNearDupPairs(ah, maxDist = 3)
      .as[(Long, Long)].collect().toSet
    val capped = Multimodal.ahashNearDupPairs(ah, maxDist = 3,
      maxBucket = 4)
    val got = capped.as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact) && got.nonEmpty)
    // the cap keeps the LOWEST ids: each pattern's 4 smallest image ids
    // still pair with each other (CC reps unchanged for them)
    val keptPerPattern = (0L to 87L by 3L).groupBy(_ % 3)
      .values.map(_.sorted.take(4)).toSeq
    keptPerPattern.foreach { g =>
      for (a <- g; b <- g if a < b)
        assert(got((a, b)), s"lowest-prefix pair ($a,$b) must survive the cap")
    }
    // bounded state: the cap plans as GroupedTopK partial+final, with no
    // unbounded per-bucket collect anywhere
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopKPartial") &&
      plan.contains("GroupedTopKFinal"), plan)
    assert(!plan.contains("collect_list") && !plan.contains("collect_set"),
      plan)
  }

  test("aHash index: the banded probe equals brute-force Hamming (the " +
    "pigeonhole superset + exact verify), append is replay-idempotent, " +
    "probes read the bucketed table in place") {
    val corpusIds = (0L to 174L by 6L).toDF("doc_id")  // images, even ids
    val batchIds = (3L to 177L by 6L).toDF("doc_id")   // images, odd ids
    // patternMod = 5: even and odd id slices BOTH cover all five
    // patterns (mod 10 would give parity-disjoint pattern sets and an
    // empty probe), so cross-slice dist-0 dups are guaranteed
    val corpus = Multimodal.synthesizePng(spark, corpusIds, "doc_id",
      patternMod = 5)
    val batch = Multimodal.synthesizePng(spark, batchIds, "doc_id",
      patternMod = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_ahidx").toString
    Multimodal.buildAHashIndex(corpus, "t_ah_idx", dir, bands = 4)
    def probe() = Multimodal.probeAHashIndex(batch, "t_ah_idx",
      maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    val got = probe()
    // brute force over the SAME hashes — banding must lose nothing
    val bh = Multimodal.imageAHash(batch)
      .select(col("media_id"), col("ahash_hi"), col("ahash_lo"))
      .as[(Long, Long, Long)].collect()
    val ch = Multimodal.imageAHash(corpus)
      .select(col("media_id"), col("ahash_hi"), col("ahash_lo"))
      .as[(Long, Long, Long)].collect()
    val brute = (for {
      (bid, bHi, bLo) <- bh; (cid, cHi, cLo) <- ch
      d = java.lang.Long.bitCount(bHi ^ cHi) +
        java.lang.Long.bitCount(bLo ^ cLo)
      if d <= 3
    } yield (bid, cid, d)).toSet
    assert(got == brute && got.nonEmpty, s"got=${got.size} brute=${brute.size}")
    // exact dups (shared pattern id) are found at distance 0
    assert(got.exists(_._3 == 0), "patternMod dups must match at dist 0")
    // append: new images join the candidate set; replay appends nothing
    val moreIds = (180L to 240L by 6L).toDF("doc_id")
    val more = Multimodal.synthesizePng(spark, moreIds, "doc_id",
      patternMod = 5)
    Multimodal.appendToAHashIndex(spark, "t_ah_idx", more, bands = 4)
    val afterAppend = probe()
    assert(afterAppend.size > got.size,
      "appended images must become probe candidates")
    val rows = spark.table("t_ah_idx_bands").count()
    Multimodal.appendToAHashIndex(spark, "t_ah_idx", more, bands = 4)
    assert(spark.table("t_ah_idx_bands").count() == rows,
      "replayed append must write nothing")
    assert(probe() == afterAppend)
    // compaction: contents bit-identical, fewer file generations
    val before = spark.table("t_ah_idx_bands").collect().toSet
    Multimodal.compactAHashIndex(spark, "t_ah_idx", dir)
    assert(spark.table("t_ah_idx_bands").collect().toSet == before)
    assert(probe() == afterAppend)
    // the maintenance policy runs the same compaction past the
    // generation threshold (build + append = 2 generations of 32 files)
    val r0 = graft.ops.Maintenance.maintainAHashIndex(spark, "t_ah_idx",
      dir, numBuckets = 32, maxGenerations = 3)
    assert(!r0.compacted, s"$r0") // just compacted: one generation
    val r1 = graft.ops.Maintenance.maintainAHashIndex(spark, "t_ah_idx",
      dir, numBuckets = 32, maxGenerations = 3)
    assert(r1.files <= 32L * 3, s"$r1")
    // GDPR delete: forgotten images stop matching, survivors unaffected —
    // the probe converges to a fresh build over corpus-minus-forgotten
    val goneIds = Seq(0L, 6L, 180L).toDF("media_id")
    Multimodal.deleteFromAHashIndex(spark, "t_ah_idx", dir, goneIds)
    assert(spark.table("t_ah_idx_bands")
      .join(goneIds, Seq("media_id"), "left_semi").count() == 0)
    val afterDelete = probe()
    assert(afterDelete == afterAppend.filterNot(p =>
      Set(0L, 6L, 180L)(p._2)),
      "delete must remove exactly the forgotten corpus ids' matches")
    // scale shape: the probe's index side reads the bucketed table in
    // place (no exchange on the index scan)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = Multimodal.probeAHashIndex(batch, "t_ah_idx", maxDist = 3)
      p.collect()
      val scans = p.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.exists(_.bucketedScan), p.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
    spark.sql("DROP TABLE IF EXISTS t_ah_idx_bands")
  }

  test("AVI demux total robustness: EVERY truncation point of a valid " +
    "container either decodes (a prefix of frames is still whole) or " +
    "quarantines — never throws out of the tier, never over-reads") {
    val whole = Multimodal.synthesizeAvi(spark, Seq(2L).toDF("doc_id"),
      "doc_id").select(col("content")).as[Array[Byte]].head()
    // exhaustive over every byte boundary — the bounds-checked demux
    // must classify all of them without escaping the quarantine lane
    val cuts = (0 until whole.length).map(n => (n.toLong, whole.take(n)))
      .toDF("media_id", "content")
      .select(col("media_id"), lit("video").as("kind"), col("content"))
    val out = Multimodal.decodeAviFrames(cuts)
      .groupBy(col("media_id"))
      .agg(max(col("decode_error").isNotNull).as("q"),
        count(lit(1)).as("n"))
      .as[(Long, Boolean, Long)].collect()
    assert(out.length == whole.length, "every cut classifies exactly once")
    // the full container is NOT in this set (max cut = len-1), so very
    // short prefixes must all quarantine and nothing may exceed the
    // true frame count
    val full = Multimodal.decodeAviFrames(
      Multimodal.synthesizeAvi(spark, Seq(2L).toDF("doc_id"), "doc_id"))
      .count()
    assert(out.filter(!_._2).forall(_._3 <= full))
    assert(out.filter(_._1 < 12).forall(_._2), "headerless prefixes quarantine")
  }

  test("image and audio tiers share the AVI demux's total robustness: " +
    "EVERY truncation point of a valid PNG/WAV either decodes or " +
    "quarantines — no codec tier ever throws out of its task") {
    // PNG through imageQualityRaw (id 3 → image)
    val png = Multimodal.synthesizePng(spark, Seq(3L).toDF("doc_id"),
      "doc_id").select(col("content")).as[Array[Byte]].head()
    val pngCuts = (0 until png.length).map(n => (n.toLong, png.take(n)))
      .toDF("media_id", "content")
      .select(col("media_id"), lit("image").as("kind"), col("content"))
    val pngOut = Multimodal.imageQualityRaw(pngCuts).collect()
    assert(pngOut.length == png.length)
    // the JDK PNG reader tolerates a cut AFTER the pixel data (IEND is
    // optional to it) — decoded prefixes must still report the TRUE
    // header geometry; anything shorter quarantines, nothing crashes
    pngOut.foreach { r =>
      if (r.getAs[String]("decode_error") == null) {
        assert(r.getAs[Int]("width") == 7 && r.getAs[Int]("height") == 7)
      }
    }
    assert(pngOut.count(_.getAs[String]("decode_error") != null) > 0)
    assert(pngOut.filter(_.getAs[Long]("media_id") < 8)
      .forall(_.getAs[String]("decode_error") != null))
    // WAV through decodeWavFeatures (id 1 → audio)
    val wav = Multimodal.synthesizeWav(spark, Seq(1L).toDF("doc_id"),
      "doc_id").select(col("content")).as[Array[Byte]].head()
    val wavCuts = (0 until wav.length).map(n => (n.toLong, wav.take(n)))
      .toDF("media_id", "content")
      .select(col("media_id"), lit("audio").as("kind"), col("content"))
    val wavOut = Multimodal.decodeWavFeatures(wavCuts).collect()
    assert(wavOut.length == wav.length)
    // RIFF truncation may still parse a shorter PCM run (javax.sound
    // reads what the header admits) — decoded cuts must never claim
    // MORE samples than the full clip; headerless prefixes quarantine
    val fullN = Multimodal.decodeWavFeatures(
      Multimodal.synthesizeWav(spark, Seq(1L).toDF("doc_id"), "doc_id"))
      .head().getAs[Long]("n_samples")
    wavOut.foreach { r =>
      if (r.getAs[String]("decode_error") == null)
        assert(r.getAs[Long]("n_samples") <= fullN)
    }
    assert(wavOut.filter(_.getAs[Long]("media_id") < 12)
      .forall(_.getAs[String]("decode_error") != null))
  }

  test("decodeAviFrames quarantines corrupt containers (garbage bytes AND " +
    "truncation) as one per-video error row instead of crashing") {
    val ids = Seq(2L, 5L, 8L, 11L, 20L).toDF("doc_id")
    // every 5th id's blob is sha2 garbage: ids 5 and 20 quarantine
    val bad = Multimodal.withCorruptedBlobs(
      Multimodal.synthesizeAvi(spark, ids, "doc_id"), everyNth = 5)
    val out = Multimodal.decodeAviFrames(bad).collect()
    val q = out.filter(_.getAs[String]("decode_error") != null)
    assert(q.map(_.getAs[Long]("media_id")).toSet == Set(5L, 20L))
    assert(q.forall(r => r.isNullAt(r.fieldIndex("frame_no")) &&
      r.isNullAt(r.fieldIndex("gray_sum"))))
    assert(out.filter(_.getAs[String]("decode_error") == null)
      .map(_.getAs[Long]("media_id")).toSet == Set(2L, 8L, 11L))
    // truncation: cut a valid container mid-movi — the bounds-checked
    // demux must throw into the quarantine lane, not read past the buffer
    val whole = Multimodal.synthesizeAvi(spark, Seq(2L).toDF("doc_id"),
      "doc_id").select(col("content")).as[Array[Byte]].head()
    val cut = spark.createDataset(Seq((2L, whole.take(whole.length / 2))))
      .toDF("media_id", "content")
      .select(col("media_id"), lit("video").as("kind"), col("content"))
    val tr = Multimodal.decodeAviFrames(cut).collect()
    assert(tr.length == 1 && tr.head.getAs[String]("decode_error") != null)
  }

  test("decodeImageFeatures ≡ imageQualityRaw ⋈ imageAHash (one decode " +
    "pass serves both tiers, quarantine included)") {
    import org.apache.spark.sql.functions.col
    // corrupt-injected fixture with re-upload dups: exercises decoded
    // rows, quarantined rows, AND patternMod collisions in one corpus
    val ids = (0L to 87L by 3L).toDF("doc_id")
    val media = Multimodal.withCorruptedBlobs(
      Multimodal.synthesizePng(spark, ids, "doc_id", patternMod = 10),
      everyNth = 5)
    val combined = Multimodal.decodeImageFeatures(media)
      .select("media_id", "width", "height", "gray_sum", "gray_sq_sum",
        "ent_nano", "ahash_hi", "ahash_lo", "decode_error")
    val quality = Multimodal.imageQualityRaw(media)
      .select(col("media_id"), col("width"), col("height"),
        col("gray_sum"), col("gray_sq_sum"), col("ent_nano"),
        col("decode_error"))
    val ahash = Multimodal.imageAHash(media)
      .select(col("media_id"), col("ahash_hi"), col("ahash_lo"))
    val joined = quality.join(ahash, "media_id")
      .select("media_id", "width", "height", "gray_sum", "gray_sq_sum",
        "ent_nano", "ahash_hi", "ahash_lo", "decode_error")
    assert(combined.count() == ids.count())
    assert(combined.exceptAll(joined).count() == 0)
    assert(joined.exceptAll(combined).count() == 0)
    // both lanes genuinely populated: some decoded, some quarantined
    assert(combined.filter(col("decode_error").isNull).count() > 0)
    assert(combined.filter(col("decode_error").isNotNull).count() > 0)
  }

  private def pngBytes(w: Int, h: Int, gray: (Int, Int) => Int)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = math.max(0, math.min(255, gray(x, y)))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imagePHash survives a clipped brightness shift that flips " +
    "aHash past the near-dup threshold; the banded pair join catches " +
    "the pHash pair and (correctly per its own metric) not the aHash") {
    // 16×16 horizontal gradient + checker texture; +120 with clipping
    // at 255 saturates the bright half, which moves the MEAN by less
    // than the unclipped pixels — aHash's mean-threshold bits flip
    // (dist 8 at these fixtures), while pHash thresholds AC DCT
    // coefficients against their own median: the shift lives almost
    // entirely in the (excluded) DC term, so only 1 bit drifts.
    def grad(shift: Int)(x: Int, y: Int): Int =
      (x * 255) / 15 + (if ((x + y) % 2 == 0) 8 else 0) + shift
    val media = Seq(
      (1L, "image", pngBytes(16, 16, grad(0))),
      (2L, "image", pngBytes(16, 16, grad(120))))
      .toDF("media_id", "kind", "content")
    val ph = Multimodal.imagePHash(media)
    val phDist = ph.select(col("media_id"), col("phash_hi"),
        col("phash_lo")).as[(Long, Long, Long)].collect()
      .sortBy(_._1) match { case Array(a, b) =>
        java.lang.Long.bitCount(a._2 ^ b._2) +
          java.lang.Long.bitCount(a._3 ^ b._3) }
    val ahDist = Multimodal.imageAHash(media)
      .select(col("media_id"), col("ahash_hi"), col("ahash_lo"))
      .as[(Long, Long, Long)].collect()
      .sortBy(_._1) match { case Array(a, b) =>
        java.lang.Long.bitCount(a._2 ^ b._2) +
          java.lang.Long.bitCount(a._3 ^ b._3) }
    assert(ahDist > 3, s"fixture must flip aHash past maxDist=3: $ahDist")
    assert(phDist <= 3, s"pHash must survive the clipped shift: $phDist")
    // the generic banded machinery over the renamed pHash lanes finds
    // the pair; over aHash it (per aHash's own distances) must not
    val phPairs = Multimodal.ahashNearDupPairs(
      Multimodal.phashAsHashRelation(ph), maxDist = 3).collect()
    assert(phPairs.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 2L)))
    assert(Multimodal.ahashNearDupPairs(
      Multimodal.imageAHash(media).filter(col("decode_error").isNull)
        .select("media_id", "ahash_hi", "ahash_lo"),
      maxDist = 3).isEmpty)
  }

  private def wavBytes(samples: Array[Int]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1,
      true, false)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioSequencyFingerprint separates signals the time-domain " +
    "energy profile cannot, and is volume-invariant where the exact " +
    "bytes are not") {
    // constant tone vs ±alternation: per-window sum-|s| energies are
    // IDENTICAL (audioFingerprint collides), but the sequency spectrum
    // concentrates at opposite ends (spectral tier separates); 3× the
    // alternating clip changes the bytes but scales every |X_b|
    // together, so the delta-coded spectral hash is unchanged
    val n = 64
    val const = Array.fill(n)(500)
    val alt = Array.tabulate(n)(i => if (i % 2 == 0) 500 else -500)
    val alt3 = alt.map(_ * 3)
    val media = Seq(
      (1L, "audio", wavBytes(const)),
      (2L, "audio", wavBytes(alt)),
      (3L, "audio", wavBytes(alt3)))
      .toDF("media_id", "kind", "content")
    val tfp = Multimodal.audioFingerprint(media)
      .select(col("media_id"), col("fingerprint"))
      .as[(Long, Long)].collect().toMap
    assert(tfp(1L) == tfp(2L),
      s"time-domain tier must collide on equal window energies: $tfp")
    val sfp = Multimodal.audioSequencyFingerprint(media)
      .select(col("media_id"), col("spectral_fp"))
      .as[(Long, Long)].collect().toMap
    assert(sfp(1L) != sfp(2L),
      s"spectral tier must separate tone from alternation: $sfp")
    assert(sfp(2L) == sfp(3L),
      s"spectral hash must be volume-invariant: $sfp")
    // ...and the 3x re-encode is byte-distinct (exact dedup would miss)
    val bytes = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(!java.util.Arrays.equals(bytes(2L), bytes(3L)))
  }

  test("audioSequencyFingerprint quarantine: short and corrupt clips " +
    "carry decode_error, never a hash") {
    val media = Seq(
      (1L, "audio", wavBytes(Array.fill(8)(100))), // 8 < 16 bands
      (2L, "audio", Array[Byte](1, 2, 3)),
      (3L, "audio", wavBytes(Array.fill(32)(100))))
      .toDF("media_id", "kind", "content")
    val out = Multimodal.audioSequencyFingerprint(media).collect()
      .map(r => r.getLong(0) ->
        ((r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(out(1L) == ((true, false)) && out(2L) == ((true, false)))
    assert(out(3L) == ((false, true)))
  }

  test("pHash rides the PERSISTED banded index lifecycle: a brightness-" +
    "shifted probe matches through the pHash index and not the aHash one") {
    def grad(shift: Int)(x: Int, y: Int): Int =
      (x * 255) / 15 + (if ((x + y) % 2 == 0) 8 else 0) + shift
    def noise(x: Int, y: Int): Int = (x * 31 + y * 17) % 256
    val corpus = Seq(
      (1L, "image", pngBytes(16, 16, grad(0))),
      (2L, "image", pngBytes(16, 16, noise)))
      .toDF("media_id", "kind", "content")
    val batch = Seq((10L, "image", pngBytes(16, 16, grad(120))))
      .toDF("media_id", "kind", "content")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phash_idx").toString
    Multimodal.buildHashIndex(
      Multimodal.phashAsHashRelation(Multimodal.imagePHash(corpus)),
      "t_ph_idx", s"$dir/ph", bands = 4)
    val hits = Multimodal.probeAHashHashes(
      Multimodal.phashAsHashRelation(Multimodal.imagePHash(batch)),
      "t_ph_idx", maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits == Seq((10L, 1L)),
      s"pHash index must catch the clipped-brightness re-host: $hits")
    // the same probe through an aHash index of the same corpus misses
    Multimodal.buildAHashIndex(corpus, "t_ah_bright_idx", s"$dir/ah",
      bands = 4)
    assert(Multimodal.probeAHashIndex(batch, "t_ah_bright_idx",
      maxDist = 3).isEmpty)
  }

  test("imagePHash quarantine: corrupt blobs yield (null lanes, " +
    "decode_error) like every codec tier") {
    val imgIds = (0L to 57L by 3L).toDF("doc_id")
    val badImgs = Multimodal.withCorruptedBlobs(
      Multimodal.synthesizePng(spark, imgIds, "doc_id"), everyNth = 5)
    val out = Multimodal.imagePHash(badImgs)
    val q = out.filter(col("decode_error").isNotNull)
    assert(q.filter(col("phash_hi").isNotNull).count() == 0)
    assert(out.filter(col("decode_error").isNull).count() == 16L)
    assert(q.count() == 4L)
  }

  test("videoFramePHashes: same-scene frames share a pHash, scene cuts " +
    "change it; corrupt containers quarantine as one row") {
    // ids ≡ 2 (mod 3) are videos; sceneLen=3 → frames k,k+1,k+2 of one
    // scene are the SAME JPEG bytes, hence identical pHash
    val vids = Seq(2L, 5L, 8L, 11L).toDF("doc_id")
    val fph = Multimodal.videoFramePHashes(
      Multimodal.synthesizeAvi(spark, vids, "doc_id"))
    val rows = fph.filter(col("decode_error").isNull)
      .select("media_id", "frame_no", "phash_hi", "phash_lo")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        (r.getLong(2), r.getLong(3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, fr) =>
      val byScene = fr.groupBy(_._2 / 3).values
      byScene.foreach { s => assert(s.map(_._3).distinct.length == 1) }
    }
    // scene-cut sensitivity: at least one video has ≥2 scenes with
    // different hashes (synthChannel patterns differ per scene pid)
    assert(rows.groupBy(_._1).values.exists(fr =>
      fr.map(_._3).distinct.length >= 2))
    val bad = Multimodal.videoFramePHashes(Multimodal.withCorruptedBlobs(
      Multimodal.synthesizeAvi(spark, vids, "doc_id"), everyNth = 1))
    assert(bad.filter(col("decode_error").isNotNull).count() == 4L)
    assert(bad.filter(col("phash_hi").isNotNull).count() == 0L)
  }

  test("robust video near-dup: a trimmed copy is caught with the " +
    "closed-form jaccard; the exact triple provably misses it") {
    val vids = (2L to 59L by 3L).toDF("doc_id") // 20 videos
    val base = Multimodal.synthesizeAvi(spark, vids, "doc_id")
    val copies = Multimodal.trimVideoCopies(base, idOffset = 600000L,
      dropFrames = 2)
    val pairs = Multimodal.videoNearDupPairs(base.unionByName(copies),
      shingleLen = 2, numPerm = 64, bands = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // perceptual twin on the same fixture: every trimmed copy is still
    // CAUGHT (c ⊆ o ⇒ j = |c|/|o|, and pHash scene collisions only
    // merge shingles, never lose suffix overlap), though its jaccard
    // need not match the closed form — membership only
    val ppairs = Multimodal.videoNearDupPairsPerceptual(
      base.unionByName(copies), shingleLen = 2, numPerm = 64,
      bands = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (2L to 59L by 3L).filter(_ % 10 != 0).foreach { id =>
      assert(ppairs.contains((id, id + 600000L)),
        s"perceptual tier lost the trimmed copy of $id")
    }
    // closed form (sceneLen=3, drop=2, shingleLen=2): the copy loses
    // exactly the within-scene-0 shingle, so j = (k-1)/k with
    // k = 2(m-1) + [r >= 2], m = ceil(n/3), r = n - 3(m-1), n = id%10+4;
    // j >= 0.6 ⟺ k >= 3 ⟺ n >= 5 ⟺ id%10 != 0
    val expected = (2L to 59L by 3L).filter(_ % 10 != 0).map { id =>
      val n = (id % 10 + 4).toInt
      val m = (n + 2) / 3
      val k = 2 * (m - 1) + (if (n - 3 * (m - 1) >= 2) 1 else 0)
      (id, id + 600000L, (k - 1).toDouble / k)
    }.toSet
    assert(pairs.toSet == expected,
      s"got ${pairs.sortBy(_._1).mkString(",")}")
    // the exact triple tier (q292's key) misses EVERY trimmed copy:
    // n_frames and both sums differ, so no fingerprint collides
    val fr = Multimodal.decodeAviFrames(base.unionByName(copies))
    val exact = fr.groupBy(col("media_id"))
      .agg(count(lit(1)).as("nf"), sum(col("pixel_checksum")).as("f1"),
        sum(col("gray_sum")).as("f2"))
      .groupBy("nf", "f1", "f2").count().filter(col("count") >= 2)
    assert(exact.count() == 0L)
  }

  test("deep-trim clips: the jaccard tier provably misses them, the " +
    "containment tier catches every one at exactly 1.0") {
    // originals with n ≥ 8 frames losing their first 6: jaccard
    // collapses to |c|/|o| < 0.6, containment stays 1
    val vids = (2L to 89L by 3L).filter(_ % 10 >= 4).toDF("doc_id")
    val base = Multimodal.synthesizeAvi(spark, vids, "doc_id")
    val both = base.unionByName(
      Multimodal.trimVideoCopies(base, idOffset = 600000L, dropFrames = 6))
    val jac = Multimodal.videoNearDupPairs(both, shingleLen = 2,
      numPerm = 64, bands = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.isEmpty,
      s"deep trims must escape the jaccard tier (that's the point): $jac")
    val cont = Multimodal.videoContainmentPairs(both, shingleLen = 2,
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = (2L to 89L by 3L).filter(_ % 10 >= 4)
      .map(id => (id + 600000L, id, 1.0)).toSet
    assert(cont.toSet == expect, s"got ${cont.sortBy(_._1).mkString(",")}")
  }

  test("trim-robust audio near-dup: a byte-trimmed copy is caught with " +
    "the (k-1)/k closed form; both whole-clip fingerprints miss it") {
    // audio ids ≡ 1 mod 3; n = id%50+20 samples, k = n div 16 windows;
    // dropping one 16-sample window keeps windows 1..k-1 bit-identical
    val ids = (1L to 148L by 3L).toDF("doc_id")
    val base = Multimodal.synthesizeWavMixed(spark, ids, "doc_id")
    val copies = Multimodal.trimWavCopies(base, idOffset = 600000L,
      dropSamples = 16)
    val pairs = Multimodal.audioNearDupPairsWindowed(
      base.unionByName(copies), windowSamples = 16, shingleLen = 1,
      numPerm = 64, bands = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = (1L to 148L by 3L).filter(_ % 50 >= 28).map { id =>
      val k = ((id % 50 + 20) / 16).toInt
      (id, id + 600000L, (k - 1).toDouble / k)
    }.toSet
    assert(pairs.toSet == expected,
      s"got ${pairs.sortBy(_._1).mkString(",")}")
    // whole-clip tiers anchor bands at sample 0 over the FULL clip: the
    // trim shifts every band boundary, so NEITHER fingerprint collides
    // on any (original, trimmed copy) pair the windowed tier catches —
    // the audio twin of q322's "exact triple misses every trimmed copy"
    val both = base.unionByName(copies)
    def fpMisses(fp: org.apache.spark.sql.DataFrame,
                 fpCol: String): Unit = {
      val m = fp.select(col("media_id"), col(fpCol), col("n_samples"))
        .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
      expected.foreach { case (a, b, _) =>
        assert(m(a) != m(b),
          s"whole-clip $fpCol must miss the trimmed pair ($a, $b)")
      }
    }
    fpMisses(Multimodal.audioFingerprint(both), "fingerprint")
    fpMisses(Multimodal.audioSequencyFingerprint(both), "spectral_fp")
    // and a sub-window trim (not a multiple of 16) misses in the
    // windowed tier too — the documented fixed-hop alignment trade
    val ragged = Multimodal.audioNearDupPairsWindowed(
      base.unionByName(Multimodal.trimWavCopies(base,
        idOffset = 700000L, dropSamples = 7)),
      windowSamples = 16, shingleLen = 1, numPerm = 64, bands = 32,
      threshold = 0.6)
      .filter(col("id_b") >= 700000L).count()
    assert(ragged == 0L,
      "sub-window trims shift every window: the fixed-hop tier " +
        "documents this miss (overlapping hops are the production fix)")
  }

  test("audio deep-trim + half-window trim: containment and the " +
    "overlapped-lane tier each catch what the plain windowed tier " +
    "provably misses") {
    val ids = (1L to 148L by 3L).toDF("doc_id")
    val base = Multimodal.synthesizeWavMixed(spark, ids, "doc_id")
    // DEEP trim (2 of k ≤ 4 windows): jaccard ≤ 1/2 misses everything,
    // containment catches every copy with ≥ 1 surviving window at 1.0
    val deep = base.unionByName(Multimodal.trimWavCopies(base,
      idOffset = 600000L, dropSamples = 32))
    val jDeep = Multimodal.audioNearDupPairsWindowed(deep,
      windowSamples = 16, shingleLen = 1, numPerm = 64, bands = 32,
      threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jDeep.isEmpty, s"deep trims must escape the jaccard tier: $jDeep")
    val cont = Multimodal.audioContainmentPairs(deep, windowSamples = 16,
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cExpect = (1L to 148L by 3L).filter(_ % 50 >= 28)
      .map(id => (id + 600000L, id, 1.0)).toSet
    assert(cont.toSet == cExpect, s"got ${cont.sortBy(_._1).mkString(",")}")
    // HALF-WINDOW trim (8 samples): the single-lane tier misses every
    // copy; lanes {0, 8} keep (s−1)/s of the union — the closed form
    val half = base.unionByName(Multimodal.trimWavCopies(base,
      idOffset = 600000L, dropSamples = 8))
    val jHalf = Multimodal.audioNearDupPairsWindowed(half,
      windowSamples = 16, shingleLen = 1, numPerm = 64, bands = 32,
      threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jHalf.isEmpty,
      s"half-window trims must escape the single-lane tier: $jHalf")
    val ov = Multimodal.audioNearDupPairsOverlapped(half,
      windowSamples = 16, numPerm = 64, bands = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val oExpect = (1L to 148L by 3L).filter(_ % 50 >= 12).map { id =>
      val n = (id % 50 + 20).toInt
      val s = n / 16 + (n - 8) / 16
      (id, id + 600000L, (s - 1).toDouble / s)
    }.toSet
    assert(ov.toSet == oExpect, s"got ${ov.sortBy(_._1).mkString(",")}")
  }

  test("crop-robust image tier: a grid-aligned crop scores containment " +
    "1.0 while BOTH whole-image hashes (aHash, pHash) walk away") {
    // image ids ≡ 0 mod 3; dims (m%4+2)×(m%3+2) tiles of 16px, m=id/3
    val ids = (0L to 120L by 3L).toDF("doc_id")
    val base = Multimodal.synthesizePngTextured(spark, ids, "doc_id")
    val crops = Multimodal.cropImageCopies(base, idOffset = 600000L,
      dropLeftTiles = 1, dropTopTiles = 1)
    val both = base.unionByName(crops)
    val cont = Multimodal.imageCropContainmentPairs(both, tilePx = 16,
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = (0L to 120L by 3L).map(id => (id + 600000L, id, 1.0)).toSet
    assert(cont.toSet == expect, s"got ${cont.sortBy(_._1).mkString(",")}")
    // whole-image hashes: any crop moves every 8x8 sample point, so no
    // (original, crop) pair collides on EITHER hash — the gap this tier
    // exists to close
    def lanes(df: org.apache.spark.sql.DataFrame, hi: String,
              lo: String): Map[Long, (Long, Long)] =
      df.select(col("media_id"), col(hi), col(lo)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ah = lanes(Multimodal.imageAHash(both), "ahash_hi", "ahash_lo")
    val ph = lanes(Multimodal.imagePHash(both), "phash_hi", "phash_lo")
    (0L to 120L by 3L).foreach { id =>
      assert(ah(id) != ah(id + 600000L),
        s"whole-image aHash must miss the crop of $id")
      assert(ph(id) != ph(id + 600000L),
        s"whole-image pHash must miss the crop of $id")
    }
  }

  test("perceptual video tier vs re-encode: every frame's bytes change " +
    "and the exact tier catches nothing, yet frame pHashes survive " +
    "bit-exact and the perceptual pair set is complete at 1.0") {
    val ids = (2L to 150L by 3L).toDF("doc_id")
    val base = Multimodal.synthesizeAviTextured(spark, ids, "doc_id")
    val copies = Multimodal.reencodeVideoCopies(base, idOffset = 600000L,
      quality = 0.5f)
    // container bytes all change (different quant tables + entropy
    // coding); decoded pixels drift on nearly every frame
    val blobs = base.unionByName(copies)
      .select(col("media_id"), col("content")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    (2L to 150L by 3L).foreach { id =>
      assert(!java.util.Arrays.equals(blobs(id), blobs(id + 600000L)),
        s"re-encode must change the bytes of $id")
    }
    // per-frame pHash survives EXACTLY: binary per-block-uniform luma
    // means recompression is an affine gray remap (all dark cells map
    // to one value, all light cells to another), and pHash compares
    // AC coefficients to their median — affine-invariant
    val phB = Multimodal.videoFramePHashes(base)
      .select(col("media_id"), col("frame_no"),
        col("phash_hi"), col("phash_lo"))
    val phC = Multimodal.videoFramePHashes(copies)
      .select((col("media_id") - 600000L).as("media_id"), col("frame_no"),
        col("phash_hi").as("chi"), col("phash_lo").as("clo"))
    val j = phB.join(phC, Seq("media_id", "frame_no"))
    assert(j.filter(col("phash_hi") =!= col("chi") ||
      col("phash_lo") =!= col("clo")).count() == 0L,
      "every frame pHash must survive the re-encode bit-exact")
    // the exact decoded-identity tier loses every copy (that's the gap
    // the perceptual tier exists to close)
    val both = base.unionByName(copies)
    val exact = Multimodal.videoNearDupPairs(both, shingleLen = 2,
      numPerm = 64, bands = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.isEmpty,
      s"exact tier must miss re-encoded copies: $exact")
    val pp = Multimodal.videoNearDupPairsPerceptual(both, shingleLen = 2,
      numPerm = 64, bands = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = (2L to 150L by 3L).map(id => (id, id + 600000L, 1.0)).toSet
    assert(pp.toSet == expect, s"got ${pp.sortBy(_._1).mkString(",")}")
  }

  test("media fixture encoders codegen cleanly: zero interpreted-mode " +
    "fallback across all three codec tiers") {
    // A private nested case class (the r14 state of SynthPng/Wav/Avi)
    // makes Janino fail to compile the generated row encoder — every
    // media query then pays a failed-compile round trip plus interpreted
    // serialization. Correctness never notices (the fallback is silent),
    // so this gate listens to the log: any "Failed to compile" /
    // "falling back to interpreter" WARN+ event during synthesis of all
    // three fixture families fails the test.
    val ctx = org.apache.logging.log4j.core.LoggerContext.getContext(false)
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-codegen-gate", null, null, false, Array.empty) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        events.add(e.getMessage.getFormattedMessage)
    }
    appender.start()
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try {
      val ids = (0L to 29L).toDF("doc_id")
      assert(Multimodal.synthesizePng(spark, ids, "doc_id").count() == 30L)
      assert(Multimodal.synthesizeWav(spark, ids, "doc_id").count() == 30L)
      assert(Multimodal.synthesizeAvi(spark, ids, "doc_id").count() == 30L)
    } finally {
      rootCfg.removeAppender("graft-codegen-gate")
      ctx.updateLoggers()
      appender.stop()
    }
    import scala.jdk.CollectionConverters._
    val bad = events.asScala.filter(m =>
      m.contains("Failed to compile") || m.contains("falling back to interpreter"))
    assert(bad.isEmpty, s"codegen fallback during media synthesis:\n${bad.mkString("\n")}")
  }
}
