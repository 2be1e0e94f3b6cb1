package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical payloads collapse to the smallest asset id") {
    val assets = Multimodal.packAssets(
      Seq((2L, "same"), (1L, "same"), (3L, "other")).toDF("doc_id", "text"),
      "doc_id", "text")
    val got = Multimodal.dedupAssets(assets)
      .as[(String, Long, Long)].collect()
      .map(r => r._3 -> r._2).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L)) // keeper -> n_copies
  }

  test("digest is payload-defined: distinct bytes never merge") {
    val assets = Multimodal.packAssets(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(Multimodal.dedupAssets(assets).count() == 3L)
  }

  test("pixel pHash: visually identical PNG/BMP/GIF-gray encodings collide at Hamming 0") {
    // the payload-hash stand-in can NEVER do this — different containers,
    // different bytes; the decoded-pixel hash sees the same image.
    // (gif is left out of the identical trio: its palette quantization is
    // writer-dependent; png and bmp are exact TYPE_INT_RGB round trips.)
    val png = Multimodal.syntheticGradientImage(16, 16, 7, "png")
    val bmp = Multimodal.syntheticGradientImage(16, 16, 7, "bmp")
    val other = Multimodal.syntheticGradientImage(16, 16, 300, "png")
    assert(!png.sameElements(bmp)) // really different encodings
    val assets = Seq((1L, "image", png), (2L, "image", bmp),
        (3L, "image", other))
      .toDF("asset_id", "kind", "payload")
    val hashes = Multimodal.pixelPhash(assets, Multimodal.ImageIoDecoder)
      .select("asset_id", "phash", "format")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(hashes(0)._2 == hashes(1)._2, s"png/bmp hashes differ: $hashes")
    assert(hashes(0)._3 == "png" && hashes(1)._3 == "bmp") // real decode
    val pairs = Multimodal.phashPixelNearDup(assets,
        Multimodal.ImageIoDecoder, bands = 4, maxHamming = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)), s"pairs=$pairs")
  }

  test("pixel pHash is content-defined: same bytes re-encoded shifted do not collide") {
    // two different gradients at the tight threshold stay apart
    val a = Multimodal.syntheticGradientImage(16, 16, 7)
    val b = Multimodal.syntheticGradientImage(16, 16, 8)
    val assets = Seq((1L, "image", a), (2L, "image", b))
      .toDF("asset_id", "kind", "payload")
    val hs = Multimodal.pixelPhash(assets, Multimodal.ImageIoDecoder)
      .select("asset_id", "phash").as[(Long, Long)].collect().toMap
    assert(hs(1L) != hs(2L))
  }

  test("pixel pHash fallbacks: non-image and undecodable hash to 0, never throw") {
    val assets = Seq(
      (1L, "audio", "not pixels".getBytes("UTF-8")),
      (2L, "image", Array[Byte](1, 2, 3)))
      .toDF("asset_id", "kind", "payload")
    val out = Multimodal.pixelPhash(assets, Multimodal.ImageIoDecoder)
      .select("asset_id", "phash", "format")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 0L, "not-image")))
    assert(out(1) == ((2L, 0L, "undecodable")))
  }
}
