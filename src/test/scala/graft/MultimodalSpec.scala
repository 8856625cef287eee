package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("media table is deterministic and schema-complete") {
    val a = MultimodalOps.mediaTable(spark, dir).collect().sortBy(_.doc_id)
    val b = MultimodalOps.mediaTable(spark, dir).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.map(_.payload.toSeq) sameElements b.map(_.payload.toSeq))
    assert(a.forall(m => m.payload.length == 256 && m.width >= 64 && m.height >= 64))
    assert(a.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("feature extraction: one row per doc, bounded pixel stats") {
    val f = MultimodalOps.extractFeatures(MultimodalOps.mediaTable(spark, dir))
      .collect()
    assert(f.length == 500)
    assert(f.forall(x => x.mean_px >= 0 && x.mean_px <= 255 && x.std_px >= 0))
    assert(f.forall(_.n_bytes == 256))
  }

  test("frame sampling explodes to nFrames rows of equal size") {
    val fr = MultimodalOps.frameSample(MultimodalOps.mediaTable(spark, dir), 4)
    assert(fr.count() == 2000) // 500 docs x 4 frames
    import spark.implicits._
    val sizes = fr.select(org.apache.spark.sql.functions.length($"frame_bytes"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(sizes == Set(64))
  }
}
