package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * transforms.
  *
  * The Spark-side contract is the real deliverable — schema (binary payload
  * + metadata struct), partition-preserving typed transforms, batch shape —
  * while the codec itself is STUBBED: this container has no image/audio
  * libraries, so `decodeStub` derives deterministic fake "pixels" from the
  * payload bytes. Swapping in a real codec changes one function, nothing
  * about the pipeline. (A Python deployment would put the same stub behind
  * `mapInPandas`; here the typed-Dataset `mapPartitions` is the JVM
  * equivalent batch-UDF surface.)
  */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                                 mean_px: Double, std_px: Double)

  /** Synthesize a deterministic media table from `documents`: payload bytes
    * derived from the text (stand-in for real image/audio blobs), metadata
    * from stable per-doc arithmetic.
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRow(id, kind, payloadFor(id, text),
          width = (64 + nChars % 64).toInt, height = (64 + id % 64).toInt)
      }
  }

  /** Deterministic fake payload: 256 bytes seeded by (doc_id, text-hash).
    * STUB — stands in for the real encoded blob.
    */
  private def payloadFor(id: Long, text: String): Array[Byte] = {
    var x = id * 6364136223846793005L + text.hashCode.toLong
    Array.fill(256) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 56).toByte
    }
  }

  /** STUB decode: treats payload bytes as pixels. A real deployment replaces
    * the body with an actual codec; the signature — one batch-shaped pass
    * per partition, no shuffle, constant memory per row — stays.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] =
    payload.map(b => (b & 0xFF).toDouble)

  /** Feature extraction over the media table: partition-local typed
    * transform (the mapInPandas-shaped stage).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val px = decodeStub(m.payload)
      val mean = px.sum / px.length
      val std = math.sqrt(px.map(p => (p - mean) * (p - mean)).sum / px.length)
      MediaFeatures(m.doc_id, m.kind, m.payload.length, mean, std)
    })
  }

  /** Frame sampling: slice the payload into `nFrames` equal byte ranges and
    * explode to one row per frame — the video-frame-sample access pattern
    * (row explosion bounded by nFrames, no shuffle).
    */
  def frameSample(media: Dataset[MediaRow], nFrames: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val sz = m.payload.length / nFrames
      (0 until nFrames).map(i =>
        (m.doc_id, m.kind, i, m.payload.slice(i * sz, (i + 1) * sz)))
    }.toDF("doc_id", "kind", "frame_idx", "frame_bytes")
  }

  /** Driver-facing queries (rows-only checks: binary payloads and the stub
    * codec are not SQL-expressible; MultimodalSpec covers determinism).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_features" -> ((s, dir) => {
      import s.implicits._
      extractFeatures(mediaTable(s, dir))
        .toDF()
        .select($"doc_id", $"kind", $"n_bytes",
          graft.Canon.sig6($"mean_px").as("mean_px"),
          graft.Canon.sig6($"std_px").as("std_px"))
    }),
    "m02_frame_sample" -> ((s, dir) => {
      import s.implicits._
      frameSample(mediaTable(s, dir))
        .groupBy($"kind", $"frame_idx")
        .agg(count(lit(1)).as("n_frames"),
          sum(length($"frame_bytes")).as("total_bytes"))
    }),
    // Metadata-only stats: kind/width/height are deterministic arithmetic
    // over (doc_id, n_chars), so this one IS SQL-expressible and puts the
    // media-table schema + typed pipeline behind the hash-checked gate.
    "m03_media_meta" -> ((s, dir) => {
      import s.implicits._
      mediaTable(s, dir).toDF()
        .groupBy($"kind")
        .agg(count(lit(1)).as("n"),
          graft.Canon.sig6(avg($"width")).as("avg_w"),
          graft.Canon.sig6(avg($"height")).as("avg_h"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "m03_media_meta" ->
      s"""SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
         |            WHEN doc_id % 3 = 1 THEN 'audio'
         |            ELSE 'video' END AS kind,
         |       count(*) AS n,
         |       ${graft.Canon.sig6Sql("avg(64 + n_chars % 64)")} AS avg_w,
         |       ${graft.Canon.sig6Sql("avg(64 + doc_id % 64)")} AS avg_h
         |FROM documents GROUP BY 1""".stripMargin,
  )
}
