package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * transforms.
  *
  * Since round 5 the codec is REAL, built on public JDK standard-library
  * codecs only: images are actual PNG files encoded and decoded with
  * `javax.imageio.ImageIO`, audio is actual 16-bit mono PCM WAV through
  * `javax.sound.sampled.AudioSystem`, and video is a minimal length-prefixed
  * container of PNG frames (no JDK video codec exists; the container format
  * is defined here and both sides of the roundtrip use it). The CONTENT of
  * every blob is deterministic arithmetic in (doc_id, n_chars) — so the
  * decoded pixel/sample statistics are closed-form SQL over `documents`,
  * which is what lets m01/m02 sit behind the DuckDB oracle gate even though
  * the payload bytes themselves are codec output.
  *
  * Scale posture: encode, decode, and feature extraction are all
  * partition-local typed transforms (`map`/`mapPartitions` — the JVM
  * equivalent of the `mapInPandas` batch-UDF surface), so the pipeline adds
  * ZERO shuffles on top of the `documents` scan; blobs never enter an
  * exchange except the final small aggregation of per-doc feature rows.
  */
object MultimodalOps {

  // ImageIO's default ImageInputStream/OutputStream cache is DISK-backed: a
  // temp file in java.io.tmpdir per encode/decode. At thousands of small
  // images per query that is pure syscall overhead, and it couples codec
  // throughput to /tmp contention (measured: m01/m04 swung 2.7-4x between
  // identical-code bench runs while concurrent jobs wrote /tmp). The
  // payloads here are KB-sized — memory-backed streams are strictly better.
  // Object-init runs on every JVM that loads the codec (executors included).
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, kind: String, n_units: Long,
                                 mean_val: Double, std_val: Double)

  // ---------------------------------------------------------------- content
  // Deterministic content functions — the SINGLE definition both the Spark
  // encoders below and the DuckDB oracles (closed-form over `documents`)
  // derive from. Changing any formula here requires changing the oracle.

  /** Image dims: width from the text length, height from the id. */
  private[multimodal] def imageDims(id: Long, nChars: Long): (Int, Int) =
    ((16 + nChars % 16).toInt, (16 + id % 16).toInt)

  /** Gray pixel at flat index i of image `id`: (id + i) mod 256. */
  private[multimodal] def imagePixel(id: Long, i: Long): Int =
    ((id + i) % 256).toInt

  /** Audio sample count: 256 + n_chars mod 256. */
  private[multimodal] def audioLen(nChars: Long): Int =
    (256 + nChars % 256).toInt

  /** 16-bit PCM sample at index i of clip `id`. Range [-32768, 32512]. */
  private[multimodal] def audioSample(id: Long, i: Long): Int =
    (((id + i) % 256).toInt - 128) * 256

  /** Video frame count: 2..4, varying with id/3 so all three counts occur
    * among the id % 3 == 2 rows.
    */
  private[multimodal] def videoFrames(id: Long): Int =
    (2 + (id / 3) % 3).toInt

  /** Video frames are fixed 16×16; pixel i of frame f: (id + 31f + i) % 256. */
  private[multimodal] val VideoFrameSide = 16
  private[multimodal] def videoPixel(id: Long, f: Int, i: Long): Int =
    ((id + 31L * f + i) % 256).toInt

  // ---------------------------------------------------------------- encoders

  /** Real PNG bytes for a gray image whose flat pixels are `px(i)`. */
  private def encodePng(w: Int, h: Int, px: Long => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, px(i)); x += 1; i += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real WAV bytes (16-bit mono little-endian PCM, 8 kHz). */
  private def encodeWav(n: Int, sample: Long => Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(i.toLong)
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Minimal video container: int32-BE frame count, then per frame an
    * int32-BE byte length followed by that frame's PNG bytes.
    */
  private def encodeVideo(id: Long): Array[Byte] = {
    val side = VideoFrameSide
    val nF = videoFrames(id)
    val out = new ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(nF)
    (0 until nF).foreach { f =>
      val png = encodePng(side, side, i => videoPixel(id, f, i))
      d.writeInt(png.length)
      d.write(png)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- decoders

  /** Decode a PNG payload to flat gray pixel values (row-major, 0-255). */
  def decodeImage(payload: Array[Byte]): Array[Int] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    out
  }

  /** Decode a WAV payload to its 16-bit PCM samples. */
  def decodeAudio(payload: Array[Byte]): Array[Int] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val bytes = ais.readAllBytes()
    ais.close()
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF))
      i += 1
    }
    out
  }

  /** Split a video container into its still-encoded PNG frames. */
  def videoFrameBytes(payload: Array[Byte]): Array[Array[Byte]] = {
    val d = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    Array.fill(d.readInt()) {
      val buf = new Array[Byte](d.readInt())
      d.readFully(buf)
      buf
    }
  }

  /** Decode every frame of a video payload to flat pixels. */
  def decodeVideo(payload: Array[Byte]): Array[Array[Int]] =
    videoFrameBytes(payload).map(decodeImage)

  // ------------------------------------------------------------------ table

  /** Synthesize the media table from `documents`: one real encoded blob per
    * doc (PNG / WAV / frame-container by doc_id mod 3), metadata describing
    * the payload. Encoding is partition-local — no shuffle.
    *
    * `onlyKind` prunes BEFORE encoding: a kind-specific consumer (m02
    * frame sampling, m04 resize) would otherwise pay full codec work for
    * the two-thirds of documents it immediately filters away.
    * `encodePayload = false` skips the codec entirely (payload = empty):
    * metadata-only consumers (m03) read kind/width/height, which are
    * closed-form in (doc_id, n_chars) — real encoding would be pure waste.
    */
  def mediaTable(s: SparkSession, dir: String,
                 onlyKind: Option[String] = None,
                 encodePayload: Boolean = true): Dataset[MediaRow] = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").select($"doc_id", $"n_chars")
    val wanted = onlyKind match {
      case Some("image") => docs.filter($"doc_id" % 3 === 0)
      case Some("audio") => docs.filter($"doc_id" % 3 === 1)
      case Some("video") => docs.filter($"doc_id" % 3 === 2)
      case _ => docs
    }
    wanted
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val none = Array.emptyByteArray
        (id % 3) match {
          case 0 =>
            val (w, h) = imageDims(id, nChars)
            val png = if (encodePayload)
              encodePng(w, h, i => imagePixel(id, i)) else none
            MediaRow(id, "image", png, w, h)
          case 1 =>
            val n = audioLen(nChars)
            val wav = if (encodePayload)
              encodeWav(n, i => audioSample(id, i)) else none
            MediaRow(id, "audio", wav, n, 1)
          case _ =>
            val vid = if (encodePayload) encodeVideo(id) else none
            MediaRow(id, "video", vid, VideoFrameSide, VideoFrameSide)
        }
      }
  }

  // --------------------------------------------------------------- features

  /** Per-doc decoded-value statistics via the REAL decoders, one
    * partition-local batch pass. Mean and variance come from exact integer
    * sums (Σv and Σv² are exact in Long for every payload here), so the
    * resulting doubles are bit-identical to any other engine computing the
    * same closed forms — the oracle does, from `documents` arithmetic.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val vals: Array[Int] = m.kind match {
        case "image" => decodeImage(m.payload)
        case "audio" => decodeAudio(m.payload)
        case _       => decodeVideo(m.payload).flatten
      }
      var s1 = 0L
      var s2 = 0L
      vals.foreach { v => s1 += v; s2 += v.toLong * v }
      val n = vals.length.toLong
      val mean = s1.toDouble / n
      val variance = s2.toDouble / n - mean * mean
      MediaFeatures(m.doc_id, m.kind, n, mean, math.sqrt(math.max(variance, 0.0)))
    })
  }

  /** Frame sampling over the video rows: split the container, DECODE each
    * frame, return per-frame stats — the video-frame access pattern (row
    * explosion bounded by the frame count, no shuffle, codec inside the
    * partition-local pass).
    */
  def frameSample(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      videoFrameBytes(m.payload).zipWithIndex.map { case (png, f) =>
        val px = decodeImage(png)
        var s1 = 0L
        px.foreach(s1 += _)
        (m.doc_id, f, px.length, s1.toDouble / px.length)
      }
    }.toDF("doc_id", "frame_idx", "n_px", "frame_mean")
  }

  /** Windowed RMS energy over the audio rows: decode the WAV PCM through
    * the REAL codec, split into fixed 64-sample frames (hop = frame
    * length, tail remainder dropped — the standard framing), and emit
    * per-window RMS. This is the framing pass in front of every audio
    * featurizer (spectrograms, filter banks, VAD); like the other media
    * ops it is codec-in-partition, shuffle-free row explosion bounded by
    * clip length / 64. Σv² stays exact in Long (|v| ≤ 32768, 64 terms),
    * so the RMS doubles are engine-reproducible closed forms.
    */
  def audioWindows(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").flatMap { m =>
      val pcm = decodeAudio(m.payload)
      pcm.grouped(64).zipWithIndex
        .filter(_._1.length == 64)
        .map { case (w, wi) =>
          var s2 = 0L
          w.foreach(v => s2 += v.toLong * v)
          (m.doc_id, wi, math.sqrt(s2.toDouble / 64))
        }
    }.toDF("doc_id", "win_idx", "rms")
  }

  /** Image resize over the image rows: decode, 2×2 box-average downsample
    * (integer floor mean, last odd row/col dropped), then RE-ENCODE to PNG
    * and decode again — the resize path exercises the codec in both
    * directions, and the roundtrip is lossless for gray PNG so the stats
    * are the closed forms of the box means. Partition-local end to end.
    */
  def resizeImages(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").map { m =>
      val px = decodeImage(m.payload)
      val (w, h) = (m.width, m.height)
      val (ow, oh) = (w / 2, h / 2)
      val out = new Array[Int](ow * oh)
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          val s = px(2 * oy * w + 2 * ox) + px(2 * oy * w + 2 * ox + 1) +
            px((2 * oy + 1) * w + 2 * ox) + px((2 * oy + 1) * w + 2 * ox + 1)
          out(oy * ow + ox) = s / 4
          ox += 1
        }
        oy += 1
      }
      val rt = decodeImage(encodePng(ow, oh, i => out(i.toInt)))
      var s1 = 0L
      rt.foreach(s1 += _)
      (m.doc_id, ow, oh, rt.length.toLong, s1.toDouble / rt.length)
    }.toDF("doc_id", "out_w", "out_h", "n_px", "mean_px")
  }

  /** Audio resample over the audio rows: decode, decimate 2:1 by averaging
    * each adjacent sample pair (a trailing odd sample drops, mirroring the
    * resize's odd row/col), then RE-ENCODE to WAV and decode again — the
    * audio twin of [[resizeImages]], exercising the PCM codec in both
    * directions. Every source sample is a multiple of 256, so each pair
    * mean is an exact integer (multiple of 128): no floor-vs-truncate
    * divergence between Java's `/` and the oracle's `//` is possible, and
    * the roundtrip is bit-exact. Partition-local end to end.
    */
  def resampleAudio(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").map { m =>
      val sm = decodeAudio(m.payload)
      val on = sm.length / 2
      val out = new Array[Int](on)
      var i = 0
      while (i < on) { out(i) = (sm(2 * i) + sm(2 * i + 1)) / 2; i += 1 }
      val rt = decodeAudio(encodeWav(on, i => out(i.toInt)))
      var s1 = 0L
      rt.foreach(s1 += _)
      (m.doc_id, sm.length.toLong, rt.length.toLong, s1.toDouble / rt.length)
    }.toDF("doc_id", "n_in", "n_out", "mean_sample")
  }

  /** Perceptual average-hash (aHash) over the decoded images: an 8×8
    * subsample grid of the REAL decoded pixels, each bit = "sample above
    * the grid mean" (compared as 64·sample > Σsamples — integer-exact, no
    * mean rounding to disagree on), emitted as a 64-char bit string —
    * then a dup-group report (hash, group size, canonical survivor). The
    * image-modality sibling of l01's text dedup: the codec runs
    * partition-local, only (doc_id, 64-char hash) rows ever shuffle, and
    * the group-by is map-side partial — the shape that holds when the
    * images are MB-scale and the corpus is 100 TB.
    */
  def imagePhash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").map { m =>
      val px = decodeImage(m.payload)
      val (w, h) = (m.width, m.height)
      val samples = Array.tabulate(64) { k =>
        val cy = k / 8
        val cx = k % 8
        px((cy * h / 8) * w + (cx * w / 8))
      }
      var tot = 0L
      samples.foreach(tot += _)
      val bits = samples.map(s => if (s * 64L > tot) '1' else '0').mkString
      (m.doc_id, bits)
    }.toDF("doc_id", "phash")
  }

  /** Audio perceptual fingerprint — the audio twin of [[imagePhash]]:
    * decode the real WAV payload, split the clip into 16 index-balanced
    * windows (window(i) = i·16÷n), and emit one sign bit per window from
    * the exact integer cross-multiply `windowSum·n > totalSum·windowCount`
    * (i.e. window mean above clip mean — no float division, so the bits
    * are engine-exact). Clips sharing all 16 bits are perceptual
    * duplicates; the oracle restates the decoded samples as the
    * ((id+i) mod 256 − 128)·256 closed form.
    */
  def audioFingerprint(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").map { m =>
      val xs = decodeAudio(m.payload)
      val n = xs.length
      var tot = 0L
      xs.foreach(tot += _)
      val wsum = new Array[Long](16)
      val wcnt = new Array[Long](16)
      var i = 0
      while (i < n) {
        val w = (i.toLong * 16 / n).toInt
        wsum(w) += xs(i); wcnt(w) += 1; i += 1
      }
      val bits = (0 until 16).map(w =>
        if (wsum(w) * n > tot * wcnt(w)) '1' else '0').mkString
      (m.doc_id, bits)
    }.toDF("doc_id", "afp")
  }

  /** Per-frame 4×4 tile sums of a `side`×`side` gray frame — the shared
    * spatial feature of [[sceneCuts]] (m09) and [[videoFingerprint]]
    * (m11); one definition so the tile geometry cannot diverge.
    */
  private def tileSums(px: Array[Int], side: Int): Array[Long] = {
    val tilesPerRow = side / 4
    val sums = new Array[Long](tilesPerRow * tilesPerRow)
    var i = 0
    while (i < px.length) {
      val t = (i / side / 4) * tilesPerRow + (i % side) / 4
      sums(t) += px(i)
      i += 1
    }
    sums
  }

  /** Per-video PERCEPTUAL FINGERPRINT: decode every frame through the real
    * codec, sum pixels per 4×4 tile (the m09 feature), and concatenate the
    * integer tile sums over (frame, tile) order into one signature string —
    * a coarse 16-longs-per-frame sketch of the video's spatial layout, the
    * video twin of m07's image phash / m08's audio fingerprint. Videos
    * whose pixel streams differ but whose tile sums agree collide (that is
    * the perceptual point); integer-exact, no rounding surface.
    *
    * Scale posture: codec-in-partition map (no shuffle until the group-by
    * on the fingerprint), signature size bounded by frames×tiles — the
    * only exchanged payload is the signature string, never frame bytes.
    */
  def videoFingerprint(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").map { m =>
      val frames = decodeVideo(m.payload)
      val sb = new StringBuilder
      frames.foreach { px =>
        tileSums(px, m.width).foreach { s0 =>
          if (sb.nonEmpty) sb.append(',')
          sb.append(s0)
        }
      }
      (m.doc_id, sb.toString)
    }.toDF("doc_id", "vfp")
  }

  /** Block-based SCENE-CHANGE detection over the video rows — the cheap
    * shot-boundary detector every video-curation pipeline fronts with
    * (block difference is how encoder lookaheads flag cuts): decode each
    * frame through the REAL codec, sum pixels per 4×4 tile (integer,
    * exact), and score each consecutive-frame pair by the mean absolute
    * TILE-SUM difference (Σ_t |s_{f+1,t} − s_{f,t}| / n_px). Tile sums —
    * not whole-frame means — carry the spatial signal a global mean
    * cancels out. A pair is a cut when the score clears `threshold`.
    *
    * All arithmetic is integer sums divided by a power of two, so the
    * scores are exact dyadic doubles — no grid rounding needed, the
    * oracle's closed forms match bit-for-bit. Codec-in-partition,
    * shuffle-free row explosion bounded by the frame count (the m02
    * shape).
    */
  def sceneCuts(media: Dataset[MediaRow], threshold: Double = 40.0): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = decodeVideo(m.payload)
      val side = m.width
      val nTiles = (side / 4) * (side / 4)
      val ts = frames.map(px => tileSums(px, side))
      (0 until frames.length - 1).map { f =>
        var sd = 0L
        var t = 0
        while (t < nTiles) { sd += math.abs(ts(f + 1)(t) - ts(f)(t)); t += 1 }
        val mad = sd.toDouble / (side * side)
        (m.doc_id, f.toLong, mad, mad > threshold)
      }
    }.toDF("doc_id", "frame_from", "mad", "is_cut")
  }

  // ---------------------------------------------------------------- queries

  /** Driver-facing queries — all three oracle-checked since round 5 (the
    * codec is real but the content is deterministic arithmetic, so DuckDB
    * reproduces the decoded statistics from `documents` alone).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full decode roundtrip: encode → decode → exact-integer stats. Any
    // codec asymmetry (wrong sample order, dropped row, sign error) breaks
    // the hash match against the closed-form oracle.
    "m01_media_features" -> ((s, dir) => {
      import s.implicits._
      extractFeatures(mediaTable(s, dir))
        .toDF()
        .select($"doc_id", $"kind", $"n_units",
          graft.Canon.sig6($"mean_val").as("mean_val"),
          graft.Canon.sig6($"std_val").as("std_val"))
    }),
    // Per-frame-position aggregate over the decoded video frames.
    "m02_frame_sample" -> ((s, dir) => {
      import s.implicits._
      frameSample(mediaTable(s, dir, onlyKind = Some("video")))
        .groupBy($"frame_idx")
        .agg(count(lit(1)).as("n_frames"),
          sum($"n_px").as("total_px"),
          graft.Canon.sig6(avg($"frame_mean")).as("avg_frame_mean"))
    }),
    // Resize: decode → box-downsample → re-encode → decode. The oracle
    // restates each output pixel as the floor-mean of its 2×2 source block
    // in (doc_id, n_chars) arithmetic — any resize indexing error (offset,
    // stride, dropped edge) shifts the sums and breaks the hash.
    "m04_resize_image" -> ((s, dir) => {
      import s.implicits._
      resizeImages(mediaTable(s, dir, onlyKind = Some("image")))
        .select($"doc_id", $"out_w", $"out_h", $"n_px",
          graft.Canon.sig6($"mean_px").as("mean_px"))
    }),
    "m06_audio_windows" -> ((s, dir) => {
      import s.implicits._
      audioWindows(mediaTable(s, dir, onlyKind = Some("audio")))
        .select($"doc_id", $"win_idx",
          graft.Canon.sig6($"rms").as("rms"))
    }),
    // Resample: decode → 2:1 pair-mean decimation → re-encode → decode.
    // The oracle restates each output sample as the exact pair mean in
    // (doc_id, n_chars) arithmetic — an off-by-one in the PCM byte order
    // or pair indexing shifts the sums and breaks the hash.
    "m05_resample_audio" -> ((s, dir) => {
      import s.implicits._
      resampleAudio(mediaTable(s, dir, onlyKind = Some("audio")))
        .select($"doc_id", $"n_in", $"n_out",
          graft.Canon.sig6($"mean_sample").as("mean_sample"))
    }),
    // Perceptual-hash image dedup: decode → 8×8 grid aHash → dup groups
    // (multimodal dedup, the image twin of l01). The oracle restates the
    // 64 grid samples in (doc_id, n_chars) arithmetic.
    "m07_image_phash" -> ((s, dir) => {
      import s.implicits._
      imagePhash(mediaTable(s, dir, onlyKind = Some("image")))
        .groupBy($"phash")
        .agg(count(lit(1)).as("n_images"), min($"doc_id").as("min_id"))
        .filter($"n_images" >= 2)
    }),
    // Audio-fingerprint dedup: real WAV decode → 16 window-mean sign bits
    // → dup groups (the audio twin of m07). Emits EVERY clip's
    // fingerprint with its group size, so the oracle hashes all 16·n bits
    // rather than only the groups that happen to collide.
    "m08_audio_fingerprint" -> ((s, dir) => {
      import s.implicits._
      audioFingerprint(mediaTable(s, dir, onlyKind = Some("audio")))
        .groupBy($"afp")
        .agg(count(lit(1)).as("n_clips"), min($"doc_id").as("min_id"))
    }),
    // Video perceptual dedup: per-video tile-sum fingerprint groups (m08's
    // group shape over m09's feature). Genuine duplicate groups exist at
    // sf0.1 (the 256-periodic pixel rule × the 9-periodic frame count
    // collide doc_ids 2304 apart).
    "m11_video_dedup" -> ((s, dir) => {
      import s.implicits._
      videoFingerprint(mediaTable(s, dir, onlyKind = Some("video")))
        .groupBy($"vfp")
        .agg(count(lit(1)).as("n_videos"), min($"doc_id").as("min_id"))
    }),
    // Scene-change detection: decode → per-frame 4×4 tile sums →
    // consecutive-pair block-difference score + cut flag. The oracle
    // restates every tile sum in (doc_id, frame, tile) arithmetic; scores
    // are exact dyadic doubles (integer sums / 256), so any decode or
    // tiling error breaks the hash without rounding slack.
    "m09_scene_cuts" -> ((s, dir) =>
      sceneCuts(mediaTable(s, dir, onlyKind = Some("video")))),
    // The CLIP-style image–text PAIR MANIFEST: what a multimodal training
    // run actually ingests. Each image doc pairs with its own caption
    // (the documents row's text); the pair survives iff (a) it is the
    // perceptual-dedup survivor of its aHash group (m07's hash, min
    // doc_id wins — near-identical images must not ship twice) and
    // (b) the caption passes the l16 quality gate. Cross-modality
    // composition of two first-class operators; only (doc_id, 64-bit
    // hash, counts) rows ever shuffle — the image payloads stay
    // partition-local inside the phash pass.
    "m10_pair_manifest" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ph = imagePhash(mediaTable(s, dir, onlyKind = Some("image")))
      val q = graft.llmops.TextStats.qualityFilter(s, dir)
        .select($"doc_id", $"n_tokens", $"keep")
      val w = Window.partitionBy($"phash").orderBy($"doc_id")
      ph.join(q, "doc_id")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1 && $"keep")
        .select($"doc_id", $"phash", $"n_tokens")
    }),
    // Metadata-only stats: kind/width/height are deterministic arithmetic
    // over (doc_id, n_chars) — pins the media-table schema itself. The
    // payload is never read, so the codec is skipped outright
    // (encodePayload = false): same rows, none of the encode cost.
    "m03_media_meta" -> ((s, dir) => {
      import s.implicits._
      mediaTable(s, dir, encodePayload = false).toDF()
        .groupBy($"kind")
        .agg(count(lit(1)).as("n"),
          graft.Canon.sig6(avg($"width")).as("avg_w"),
          graft.Canon.sig6(avg($"height")).as("avg_h"))
    }),
  )

  /** The decoded-unit multisets as closed-form DuckDB series over
    * `documents`: image pixels (id+i) mod 256 over w·h units, audio samples
    * ((id+i) mod 256 − 128)·256 over 256+(n_chars mod 256) units, video
    * pixels (id+31f+i) mod 256 over (2+(id÷3 mod 3))·256 units. `unnest
    * (range(n))` expands the per-doc index; sums are exact integers, so
    * mean/std match the Scala decode bit-for-bit before the shared sig6
    * rounding.
    */
  val oracles: Map[String, String] = Map(
    "m01_media_features" -> {
      val sig = graft.Canon.sig6Sql _
      s"""WITH img AS (
         |  SELECT doc_id, 'image' AS kind,
         |         (16 + n_chars % 16) * (16 + doc_id % 16) AS n
         |  FROM documents WHERE doc_id % 3 = 0),
         |aud AS (
         |  SELECT doc_id, 'audio' AS kind, 256 + n_chars % 256 AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |vid AS (
         |  SELECT doc_id, 'video' AS kind,
         |         (2 + (doc_id // 3) % 3) * 256 AS n
         |  FROM documents WHERE doc_id % 3 = 2),
         |vals AS (
         |  SELECT doc_id, kind, n,
         |         (doc_id + unnest(range(n))) % 256 AS v
         |  FROM img
         |  UNION ALL
         |  SELECT doc_id, kind, n,
         |         ((doc_id + unnest(range(n))) % 256 - 128) * 256
         |  FROM aud
         |  UNION ALL
         |  SELECT doc_id, kind, n,
         |         (doc_id + 31 * (unnest(range(n)) // 256)
         |          + unnest(range(n)) % 256) % 256
         |  FROM vid),
         |stats AS (
         |  SELECT doc_id, kind, n AS n_units,
         |         CAST(sum(v) AS DOUBLE) / n AS mean_val,
         |         sqrt(greatest(CAST(sum(CAST(v AS BIGINT) * v) AS DOUBLE) / n
         |              - (CAST(sum(v) AS DOUBLE) / n)
         |                * (CAST(sum(v) AS DOUBLE) / n), 0.0)) AS std_val
         |  FROM vals GROUP BY doc_id, kind, n)
         |SELECT doc_id, kind, n_units,
         |       ${sig("mean_val")} AS mean_val,
         |       ${sig("std_val")} AS std_val
         |FROM stats""".stripMargin
    },
    "m02_frame_sample" -> {
      s"""WITH vid AS (
         |  SELECT doc_id, 2 + (doc_id // 3) % 3 AS n_f
         |  FROM documents WHERE doc_id % 3 = 2),
         |frames AS (
         |  SELECT doc_id, unnest(range(n_f)) AS f FROM vid),
         |px AS (
         |  SELECT doc_id, f,
         |         (doc_id + 31 * f + unnest(range(256))) % 256 AS v
         |  FROM frames),
         |fm AS (
         |  SELECT doc_id, f AS frame_idx,
         |         CAST(sum(v) AS DOUBLE) / 256 AS frame_mean
         |  FROM px GROUP BY doc_id, f)
         |SELECT frame_idx, count(*) AS n_frames,
         |       count(*) * 256 AS total_px,
         |       ${graft.Canon.sig6Sql("avg(frame_mean)")} AS avg_frame_mean
         |FROM fm GROUP BY frame_idx""".stripMargin
    },
    // Audio framing restated in (doc_id, n_chars) arithmetic: sample i of
    // window w is ((doc_id + 64w + i) % 256 − 128)·256, Σv² exact in
    // BIGINT — any framing error (offset, hop, tail handling) shifts a
    // window's sum and breaks the hash.
    "m06_audio_windows" -> {
      val sig = graft.Canon.sig6Sql _
      s"""WITH aud AS (
         |  SELECT doc_id, 256 + n_chars % 256 AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |wins AS (
         |  SELECT doc_id, unnest(range(n // 64)) AS win_idx FROM aud),
         |px AS (
         |  SELECT doc_id, win_idx,
         |         ((doc_id + win_idx * 64 + unnest(range(64))) % 256 - 128)
         |           * 256 AS v
         |  FROM wins)
         |SELECT doc_id, win_idx,
         |       ${sig("sqrt(CAST(sum(CAST(v AS BIGINT) * v) AS DOUBLE) / 64)")}
         |         AS rms
         |FROM px GROUP BY doc_id, win_idx""".stripMargin
    },
    "m04_resize_image" -> {
      val sig = graft.Canon.sig6Sql _
      // p(dx,dy) of output pixel i: source (2·(i%ow)+dx, 2·(i//ow)+dy).
      def p(dx: Int, dy: Int) =
        s"(doc_id + (2 * (i // ow) + $dy) * w + 2 * (i % ow) + $dx) % 256"
      s"""WITH img AS (
         |  SELECT doc_id,
         |         16 + n_chars % 16 AS w, 16 + doc_id % 16 AS h,
         |         (16 + n_chars % 16) // 2 AS ow, (16 + doc_id % 16) // 2 AS oh
         |  FROM documents WHERE doc_id % 3 = 0),
         |px AS (
         |  SELECT doc_id, ow, oh,
         |         (${p(0, 0)} + ${p(1, 0)} + ${p(0, 1)} + ${p(1, 1)}) // 4 AS v
         |  FROM (SELECT doc_id, w, ow, oh, unnest(range(ow * oh)) AS i FROM img))
         |SELECT doc_id, CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
         |       count(*) AS n_px,
         |       ${sig("CAST(sum(v) AS DOUBLE) / count(*)")} AS mean_px
         |FROM px GROUP BY doc_id, ow, oh""".stripMargin
    },
    "m05_resample_audio" -> {
      s"""WITH aud AS (
         |  SELECT doc_id, 256 + n_chars % 256 AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |v AS (
         |  SELECT doc_id, n,
         |         ((((doc_id + 2 * i) % 256 - 128) * 256
         |           + ((doc_id + 2 * i + 1) % 256 - 128) * 256) // 2) AS s
         |  FROM (SELECT doc_id, n, unnest(range(n // 2)) AS i FROM aud))
         |SELECT doc_id, CAST(n AS BIGINT) AS n_in,
         |       count(*) AS n_out,
         |       ${graft.Canon.sig6Sql("CAST(sum(s) AS DOUBLE) / count(*)")} AS mean_sample
         |FROM v GROUP BY doc_id, n""".stripMargin
    },
    "m03_media_meta" ->
      s"""SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
         |            WHEN doc_id % 3 = 1 THEN 'audio'
         |            ELSE 'video' END AS kind,
         |       count(*) AS n,
         |       ${graft.Canon.sig6Sql(
               "avg(CASE WHEN doc_id % 3 = 0 THEN 16 + n_chars % 16 " +
               "WHEN doc_id % 3 = 1 THEN 256 + n_chars % 256 ELSE 16 END)")} AS avg_w,
         |       ${graft.Canon.sig6Sql(
               "avg(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 16 " +
               "WHEN doc_id % 3 = 1 THEN 1 ELSE 16 END)")} AS avg_h
         |FROM documents GROUP BY 1""".stripMargin,
    // aHash restated: sample pixel at grid cell (cx, cy) of the w×h ramp
    // image = (id + (cy·h÷8)·w + cx·w÷8) mod 256; bit via the integer
    // 64·sample > Σ compare; bits packed in row-major grid order.
    "m07_image_phash" ->
      s"""WITH img AS (
         |  SELECT doc_id, 16 + n_chars % 16 AS w, 16 + doc_id % 16 AS h
         |  FROM documents WHERE doc_id % 3 = 0),
         |s AS (
         |  SELECT doc_id, cy * 8 + cx AS k,
         |         (doc_id + ((cy * h) // 8) * w + ((cx * w) // 8)) % 256 AS v
         |  FROM img, unnest(range(0, 8)) tx(cx), unnest(range(0, 8)) ty(cy)),
         |t AS (SELECT doc_id, sum(v) AS tot FROM s GROUP BY doc_id),
         |b AS (
         |  SELECT s.doc_id,
         |         string_agg(CASE WHEN s.v * 64 > t.tot THEN '1' ELSE '0' END,
         |                    '' ORDER BY s.k) AS phash
         |  FROM s JOIN t USING (doc_id) GROUP BY s.doc_id)
         |SELECT phash, CAST(count(*) AS BIGINT) AS n_images,
         |       min(doc_id) AS min_id
         |FROM b GROUP BY phash HAVING count(*) >= 2""".stripMargin,
    // Scene cuts restated: pixel i of frame f is (id + 31f + i) mod 256;
    // tile t of a 16×16 frame holds the 16 indices
    // i = 16·(4·(t÷4) + j÷4) + 4·(t mod 4) + j mod 4, j ∈ [0,16); the
    // score is Σ_t |s_{f+1,t} − s_{f,t}| / 256 — integer sums over a
    // power-of-two divisor, bit-exact on both engines.
    "m09_scene_cuts" ->
      s"""WITH vid AS (
         |  SELECT doc_id, 2 + (doc_id // 3) % 3 AS n_f
         |  FROM documents WHERE doc_id % 3 = 2),
         |fr AS (SELECT doc_id, unnest(range(n_f)) AS f FROM vid),
         |ts AS (
         |  SELECT doc_id, f, t,
         |         sum((doc_id + 31 * f
         |              + 16 * (4 * (t // 4) + j // 4)
         |              + 4 * (t % 4) + j % 4) % 256) AS s
         |  FROM fr, unnest(range(0, 16)) a(t), unnest(range(0, 16)) b(j)
         |  GROUP BY doc_id, f, t),
         |d AS (
         |  SELECT a.doc_id, a.f AS frame_from, sum(abs(b.s - a.s)) AS sd
         |  FROM ts a JOIN ts b ON b.doc_id = a.doc_id AND b.t = a.t
         |                     AND b.f = a.f + 1
         |  GROUP BY a.doc_id, a.f)
         |SELECT doc_id, CAST(frame_from AS BIGINT) AS frame_from,
         |       CAST(sd AS DOUBLE) / 256.0 AS mad,
         |       (CAST(sd AS DOUBLE) / 256.0 > 40.0) AS is_cut
         |FROM d""".stripMargin,
    // Pair manifest = m07's phash CTE ∘ l16's quality CTE ∘ a per-hash
    // survivor window: both component chains restated verbatim, joined on
    // doc_id, survivor = min doc_id per phash, keep = the l16 verdict.
    "m10_pair_manifest" -> {
      val toksSql = graft.llmops.LlmOracleHelpers.toksSql
      s"""WITH img AS (
         |  SELECT doc_id, 16 + n_chars % 16 AS w, 16 + doc_id % 16 AS h
         |  FROM documents WHERE doc_id % 3 = 0),
         |s AS (
         |  SELECT doc_id, cy * 8 + cx AS k,
         |         (doc_id + ((cy * h) // 8) * w + ((cx * w) // 8)) % 256 AS v
         |  FROM img, unnest(range(0, 8)) tx(cx), unnest(range(0, 8)) ty(cy)),
         |t AS (SELECT doc_id, sum(v) AS tot FROM s GROUP BY doc_id),
         |b AS (
         |  SELECT s.doc_id,
         |         string_agg(CASE WHEN s.v * 64 > t.tot THEN '1' ELSE '0' END,
         |                    '' ORDER BY s.k) AS phash
         |  FROM s JOIN t USING (doc_id) GROUP BY s.doc_id),
         |q AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
         |         CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter($toksSql,
         |           w -> w IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE)
         |           / greatest(len($toksSql), 1) AS stop_ratio
         |  FROM documents),
         |k AS (
         |  SELECT doc_id, n_tokens,
         |         (chars >= 150 AND n_tokens >= 20 AND stop_ratio <= 0.45)
         |           AS keep
         |  FROM q),
         |r AS (
         |  SELECT b.doc_id, b.phash, k.n_tokens, k.keep,
         |         row_number() OVER (PARTITION BY b.phash
         |           ORDER BY b.doc_id) AS rn
         |  FROM b JOIN k USING (doc_id))
         |SELECT doc_id, phash, n_tokens FROM r WHERE rn = 1 AND keep""".stripMargin
    },
    // Audio fingerprint restated: sample i of clip id =
    // ((id+i) mod 256 − 128)·256 over n = 256 + n_chars mod 256 units,
    // window(i) = (i·16)//n, bit via the exact integer cross-multiply
    // wsum·n > tot·wcnt (window mean above clip mean), bits in window
    // order.
    // The m09 tile-sum CTE aggregated to one signature string per video
    // (CAST to VARCHAR so string_agg matches Long.toString), then m08's
    // fingerprint-group shape.
    "m11_video_dedup" ->
      s"""WITH vid AS (
         |  SELECT doc_id, 2 + (doc_id // 3) % 3 AS n_f
         |  FROM documents WHERE doc_id % 3 = 2),
         |fr AS (SELECT doc_id, unnest(range(n_f)) AS f FROM vid),
         |ts AS (
         |  SELECT doc_id, f, t,
         |         sum((doc_id + 31 * f
         |              + 16 * (4 * (t // 4) + j // 4)
         |              + 4 * (t % 4) + j % 4) % 256) AS s
         |  FROM fr, unnest(range(0, 16)) a(t), unnest(range(0, 16)) b(j)
         |  GROUP BY doc_id, f, t),
         |b AS (
         |  SELECT doc_id,
         |         string_agg(CAST(s AS VARCHAR), ',' ORDER BY f, t) AS vfp
         |  FROM ts GROUP BY doc_id)
         |SELECT vfp, CAST(count(*) AS BIGINT) AS n_videos,
         |       min(doc_id) AS min_id
         |FROM b GROUP BY vfp""".stripMargin,
    "m08_audio_fingerprint" ->
      s"""WITH aud AS (
         |  SELECT doc_id, 256 + n_chars % 256 AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |s AS (
         |  SELECT doc_id, n, (i * 16) // n AS w,
         |         ((doc_id + i) % 256 - 128) * 256 AS v
         |  FROM aud, unnest(range(0, n)) t(i)),
         |t AS (SELECT doc_id, sum(v) AS tot FROM s GROUP BY doc_id),
         |ws AS (
         |  SELECT doc_id, w, any_value(n) AS n, sum(v) AS wsum,
         |         count(*) AS wcnt
         |  FROM s GROUP BY doc_id, w),
         |b AS (
         |  SELECT ws.doc_id,
         |         string_agg(CASE WHEN ws.wsum * ws.n > t.tot * ws.wcnt
         |                         THEN '1' ELSE '0' END, '' ORDER BY ws.w) AS afp
         |  FROM ws JOIN t USING (doc_id) GROUP BY ws.doc_id)
         |SELECT afp, CAST(count(*) AS BIGINT) AS n_clips, min(doc_id) AS min_id
         |FROM b GROUP BY afp""".stripMargin,
  )
}
