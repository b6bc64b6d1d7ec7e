package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Media
import graft.operators.Media.{MediaFeatures, MediaRow}

/** Multimodal plumbing tests: binary columns, metadata, the decode stub's
  * partition-parallel path, frame sampling, resize metadata.
  */
class MediaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def rows: Seq[MediaRow] = Seq(
    MediaRow(1L, "image", Array[Byte](0x42, 0x4d, 1, 2, 3, 4), "image/bmp", 640, 480, 0L),
    MediaRow(2L, "audio", Array.tabulate[Byte](256)(i => i.toByte), "audio/wav", 0, 0, 2500L),
    MediaRow(3L, "video", Array[Byte](0, 0, 0, 0x18, 0x66, 0x74, 0x79, 0x70), "video/mp4", 1920, 1080, 10000L))

  test("mediaMeta: size, sha, and magic bytes from the binary column") {
    val meta = Media.mediaMeta(rows.toDF()).collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getAs[Long]("size_bytes") === 6L)
    assert(meta(1L).getAs[String]("magic_hex") === "424D0102") // BM..
    assert(meta(3L).getAs[String]("magic_hex") === "00000018")
    assert(meta(2L).getAs[String]("content_sha").length === 64)
  }

  test("decodeStub: deterministic fixed-width features, L1-normalized") {
    val feats = Media.decodeStub(rows.toDS()).collect().map(f => f.media_id -> f).toMap
    assert(feats.size === 3)
    feats.values.foreach { f =>
      assert(f.feature.length === 16)
      assert(math.abs(f.feature.sum - 1.0) < 1e-9, "histogram must be L1-normalized")
    }
    // the 256-byte ramp hits every nibble bucket equally: 16/256 each
    assert(feats(2L).feature.forall(v => math.abs(v - 1.0 / 16) < 1e-12))
    // determinism
    val again = Media.decodeStub(rows.toDS()).collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(again === feats.view.mapValues(_.feature.toSeq).toMap)
  }

  test("frameSampleOffsets: evenly spaced within duration, video only") {
    val out = Media.frameSampleOffsets(rows.toDF(), 4).collect()
    assert(out.length === 1) // only the video row
    val offs = out.head.getSeq[Long](1)
    assert(offs === Seq(0L, 2500L, 5000L, 7500L))
  }

  test("resizeMeta: aspect ratio preserved, small media untouched") {
    val out = Media.resizeMeta(rows.toDF(), 960).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getAs[Int]("target_width") === 960)
    assert(out(3L).getAs[Int]("target_height") === 540)
    assert(out(1L).getAs[Int]("target_width") === 640) // already within bounds
    assert(out(1L).getAs[Int]("target_height") === 480)
  }
}
