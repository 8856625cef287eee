package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MultimodalOps

/** Real-codec multimodal pipeline: PNG/WAV/frame-container roundtrips are
  * pixel/sample-exact, the media table is deterministic, and the decoded
  * statistics match the closed forms the DuckDB oracles compute (m01–m03
  * hash-gate the same thing end-to-end through the driver).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("PNG roundtrip is pixel-exact (real ImageIO codec)") {
    val rows = MultimodalOps.mediaTable(spark, dir)
      .filter(_.kind == "image").collect().sortBy(_.doc_id).take(5)
    assert(rows.nonEmpty)
    rows.foreach { m =>
      // PNG magic: a real encoded file, not a fake byte blob.
      assert((m.payload(0) & 0xFF) == 0x89 && m.payload(1) == 'P'.toByte)
      val px = MultimodalOps.decodeImage(m.payload)
      assert(px.length == m.width * m.height)
      px.zipWithIndex.foreach { case (v, i) =>
        assert(v == ((m.doc_id + i) % 256).toInt, s"doc ${m.doc_id} px $i")
      }
    }
  }

  test("WAV roundtrip is sample-exact (real AudioSystem codec)") {
    val rows = MultimodalOps.mediaTable(spark, dir)
      .filter(_.kind == "audio").collect().sortBy(_.doc_id).take(5)
    assert(rows.nonEmpty)
    rows.foreach { m =>
      assert(new String(m.payload.take(4), "US-ASCII") == "RIFF")
      val s = MultimodalOps.decodeAudio(m.payload)
      assert(s.length == m.width) // width carries the sample count
      s.zipWithIndex.foreach { case (v, i) =>
        assert(v == (((m.doc_id + i) % 256).toInt - 128) * 256,
          s"doc ${m.doc_id} sample $i")
      }
    }
  }

  test("video container holds 2-4 decodable PNG frames") {
    val rows = MultimodalOps.mediaTable(spark, dir)
      .filter(_.kind == "video").collect().sortBy(_.doc_id).take(6)
    assert(rows.nonEmpty)
    rows.foreach { m =>
      val frames = MultimodalOps.decodeVideo(m.payload)
      assert(frames.length == (2 + (m.doc_id / 3) % 3).toInt)
      frames.zipWithIndex.foreach { case (px, f) =>
        assert(px.length == 256)
        px.zipWithIndex.foreach { case (v, i) =>
          assert(v == ((m.doc_id + 31L * f + i) % 256).toInt)
        }
      }
    }
  }

  test("media table is deterministic and schema-complete") {
    val a = MultimodalOps.mediaTable(spark, dir).collect().sortBy(_.doc_id)
    val b = MultimodalOps.mediaTable(spark, dir).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.map(_.payload.toSeq) sameElements b.map(_.payload.toSeq))
    assert(a.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("feature extraction: one row per doc, closed-form mean golden") {
    val f = MultimodalOps.extractFeatures(MultimodalOps.mediaTable(spark, dir))
      .collect()
    assert(f.length == 500)
    // Image/video values live in [0,255]; audio in [-32768, 32512].
    assert(f.forall(x => x.mean_val >= -32768 && x.mean_val <= 32512
      && x.std_val >= 0))
    // Closed-form golden: a full 256-cycle (any doc whose unit count is a
    // multiple of 256 — every video) has mean exactly 127.5.
    val vids = f.filter(_.kind == "video")
    assert(vids.nonEmpty && vids.forall(v => v.mean_val == 127.5))
  }

  test("resize: box means match a hand recompute through the real codec") {
    val media = MultimodalOps.mediaTable(spark, dir)
    val images = media.filter(_.kind == "image").collect()
      .map(m => m.doc_id -> m).toMap
    val rows = MultimodalOps.resizeImages(media).collect()
    assert(rows.length == images.size)
    rows.sortBy(_.getLong(0)).take(5).foreach { r =>
      val m = images(r.getLong(0))
      val (ow, oh) = (m.width / 2, m.height / 2)
      assert(r.getInt(1) == ow && r.getInt(2) == oh)
      assert(r.getLong(3) == ow.toLong * oh)
      // Recompute the floor 2×2 box mean straight from the pixel formula.
      val sum = (for {
        oy <- 0 until oh; ox <- 0 until ow
      } yield {
        def p(dx: Int, dy: Int) =
          ((m.doc_id + (2 * oy + dy).toLong * m.width + 2 * ox + dx) % 256).toInt
        (p(0, 0) + p(1, 0) + p(0, 1) + p(1, 1)) / 4
      }).map(_.toLong).sum
      assert(r.getDouble(4) == sum.toDouble / (ow.toLong * oh),
        s"doc ${m.doc_id}")
    }
  }

  test("resample: pair means match a hand recompute through the real codec") {
    val media = MultimodalOps.mediaTable(spark, dir, onlyKind = Some("audio"))
    val clips = media.collect().map(m => m.doc_id -> m).toMap
    val rows = MultimodalOps.resampleAudio(media).collect()
    assert(rows.length == clips.size)
    rows.sortBy(_.getLong(0)).take(5).foreach { r =>
      val m = clips(r.getLong(0))
      val n = m.width // audio rows carry the sample count as width
      assert(r.getLong(1) == n.toLong && r.getLong(2) == (n / 2).toLong)
      // Recompute the pair mean straight from the sample formula — exact
      // (every sample is a multiple of 256, so the pair mean is integral).
      def s(i: Int) = (((m.doc_id + i) % 256).toInt - 128) * 256
      val sum = (0 until n / 2).map(i => ((s(2 * i) + s(2 * i + 1)) / 2).toLong).sum
      assert(r.getDouble(3) == sum.toDouble / (n / 2), s"doc ${m.doc_id}")
    }
  }

  test("audio windows: floor(n/64) frames per clip, RMS matches the " +
      "sample formula") {
    val media = MultimodalOps.mediaTable(spark, dir, onlyKind = Some("audio"))
    val clips = media.collect().map(m => m.doc_id -> m).toMap
    val rows = MultimodalOps.audioWindows(media).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.keySet == clips.keySet)
    perDoc.foreach { case (id, ws) =>
      // Tail remainder dropped: exactly floor(n/64) windows, 0-indexed.
      assert(ws.length == clips(id).width / 64, s"doc $id")
      assert(ws.map(_.getInt(1)).sorted.toSeq == (0 until ws.length))
    }
    rows.sortBy(r => (r.getLong(0), r.getInt(1))).take(8).foreach { r =>
      val (id, wi) = (r.getLong(0), r.getInt(1))
      def s(i: Int) = (((id + i) % 256).toInt - 128) * 256
      val s2 = (64 * wi until 64 * wi + 64).map(i => s(i).toLong * s(i)).sum
      assert(r.getDouble(2) == math.sqrt(s2.toDouble / 64), s"doc $id win $wi")
    }
  }

  test("frame sampling: one decoded row per (video, frame), exact means") {
    val fr = MultimodalOps.frameSample(MultimodalOps.mediaTable(spark, dir))
      .collect()
    val expected = MultimodalOps.mediaTable(spark, dir)
      .filter(_.kind == "video").collect()
      .map(m => (2 + (m.doc_id / 3) % 3).toInt).sum
    assert(fr.length == expected)
    // Full 256-cycle per frame: every frame mean is exactly 127.5.
    assert(fr.forall(r => r.getInt(2) == 256 && r.getDouble(3) == 127.5))
  }

  test("pair manifest: one survivor per phash group, every caption passes " +
      "the quality gate") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("m10_pair_manifest")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // Survivorship: phashes are unique (dedup applied) and each survivor
    // is its group's min doc_id.
    assert(got.map(_._2).distinct.length == got.length, "duplicate phash")
    val groups = MultimodalOps.imagePhash(
        MultimodalOps.mediaTable(spark, dir, onlyKind = Some("image")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).map { case (h, xs) => h -> xs.map(_._1).min }
    got.foreach { case (id, h, _) =>
      assert(groups(h) == id, s"survivor of $h should be ${groups(h)}, got $id")
    }
    // Quality: every manifest caption passes l16.
    val keep = graft.llmops.TextStats.qualityFilter(spark, dir)
      .filter($"keep").select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(g => keep(g._1)))
  }

  test("scene cuts: one row per consecutive frame pair, tile-sum scores " +
      "match the pixel arithmetic, both cut classes occur") {
    val rows = MultimodalOps.sceneCuts(
        MultimodalOps.mediaTable(spark, dir, onlyKind = Some("video")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getBoolean(3))))
      .toMap
    val vids = MultimodalOps.mediaTable(spark, dir, onlyKind = Some("video"))
      .collect().map(_.doc_id)
    // Row count: frames − 1 pairs per video.
    assert(rows.size == vids.map(id => (1 + (id / 3) % 3).toInt).sum)
    // Independent recompute from the generator arithmetic (the decode path
    // under test never enters here): tile sums over (id + 31f + i) % 256.
    def tileSum(id: Long, f: Int, t: Int): Long =
      (0 until 16).map { j =>
        val i = 16 * (4 * (t / 4) + j / 4) + 4 * (t % 4) + j % 4
        (id + 31L * f + i) % 256
      }.sum
    vids.foreach { id =>
      val nf = (2 + (id / 3) % 3).toInt
      (0 until nf - 1).foreach { f =>
        val sd = (0 until 16)
          .map(t => math.abs(tileSum(id, f + 1, t) - tileSum(id, f, t))).sum
        val (mad, cut) = rows((id, f.toLong))
        assert(mad == sd.toDouble / 256.0, s"doc $id pair $f")
        assert(cut == (mad > 40.0))
      }
    }
    // The threshold is a real boundary on this corpus, not a constant flag.
    assert(rows.values.exists(_._2) && rows.values.exists(!_._2))
  }

  test("video fingerprint: tile-sum signature through the real codec; " +
      "2304-periodic doc_ids collide (the perceptual-dup class)") {
    import spark.implicits._
    val fps = MultimodalOps.videoFingerprint(
        MultimodalOps.mediaTable(spark, dir, onlyKind = Some("video")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Closed-form recompute of one signature: tile sums over
    // (id + 31f + i) % 256 pixels, (frame, tile) order, comma-joined.
    val id = fps.keys.min
    def tileSum(f: Int, t: Int): Long =
      (0 until 16).map { j =>
        (id + 31L * f + 16 * (4 * (t / 4) + j / 4) + 4 * (t % 4) + j % 4) % 256
      }.sum
    val nf = (2 + (id / 3) % 3).toInt
    val exp = (0 until nf)
      .flatMap(f => (0 until 16).map(t => tileSum(f, t))).mkString(",")
    assert(fps(id) == exp)
    // The pixel rule is 256-periodic in doc_id and the frame count
    // 9-periodic, so videos 2304 apart are byte-identical — the dup class
    // m11 groups. (sf0.001 has <2304 docs, so build the pair directly.)
    def frames(d: Long) = 2 + (d / 3) % 3
    def pixel(d: Long, f: Int, i: Int) = (d + 31L * f + i) % 256
    assert(frames(2) == frames(2306))
    assert((0 until 16 * 16).forall(i => pixel(2, 0, i) == pixel(2306, 0, i)))
  }
}
