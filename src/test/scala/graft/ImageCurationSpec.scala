package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ImageOps
import graft.synth.{Bmp, Codec, Synth}

/** Image-curation operators: cross-codec pixel dedup, deterministic
  * augmentations, spatially-local shard packing. */
class ImageCurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("pixelDigest: hand-computed on a 3-byte array; sensitive to position swaps") {
    // bytes [1, 2, 3]: Σ (p+1)(p+7)(v+17) = 1·7·18 + 2·8·19 + 3·9·20 = 970
    assert(ImageOps.pixelDigest(Array[Byte](1, 2, 3)) === 1L * 7 * 18 + 2L * 8 * 19 + 3L * 9 * 20)
    // swapping two equal-sum positions changes the digest (position weights)
    assert(ImageOps.pixelDigest(Array[Byte](3, 2, 1)) !==
      ImageOps.pixelDigest(Array[Byte](1, 2, 3)))
  }

  test("augmentPixels: involutions and a hand-checked 2x1 hflip") {
    val rgb = Array[Byte](10, 11, 12, 20, 21, 22) // two pixels, 2x1
    val flipped = ImageOps.augmentPixels(rgb, 2, 1, "hflip")
    assert(flipped.toSeq === Seq[Byte](20, 21, 22, 10, 11, 12))
    // hflip ∘ hflip = id, rot180 ∘ rot180 = id on a non-square image
    val src = Bmp.pixels(12345L, 5, 3)
    for (a <- Seq("hflip", "rot180")) {
      val once = ImageOps.augmentPixels(src, 5, 3, a)
      assert(ImageOps.augmentPixels(once, 5, 3, a).toSeq === src.toSeq, a)
      assert(once.toSeq !== src.toSeq, s"$a must move pixels")
    }
    // rot180 = hflip ∘ vflip: row y of rot180 equals reversed row h-1-y
    val rot = ImageOps.augmentPixels(src, 5, 3, "rot180")
    val hf = ImageOps.augmentPixels(src, 5, 3, "hflip")
    for (y <- 0 until 3; x <- 0 until 5; c <- 0 until 3)
      assert(rot((y * 5 + x) * 3 + c) === hf(((3 - 1 - y) * 5 + x) * 3 + c))
  }

  test("pixelDedupGroups: bmp↔png re-encodes of the same pixels group; distinct pixels don't") {
    val imgs = Seq(
      ("a1", "bmp", Codec.encodeFor("bmp", 777L, 6, 4)),
      ("a2", "png", Codec.encodeFor("png", 777L, 6, 4)), // same pixels, different codec
      ("b1", "bmp", Codec.encodeFor("bmp", 778L, 6, 4)), // different pixels
      ("c1", "png", Codec.encodeFor("png", 779L, 5, 5))
    ).toDF("image_id", "fmt", "bytes")
    val groups = ImageOps.pixelDedupGroups(spark, imgs).collect()
    assert(groups.length === 1)
    val g = groups.head
    assert(g.getAs[String]("keep_id") === "a1")
    assert(g.getAs[Long]("n_copies") === 2L)
    assert(g.getAs[String]("fmts") === "bmp,png")
  }

  test("shardPack: shards respect the budget chop and partition by cell") {
    val g = 16
    val imgs = Synth.withGeotag(
      Synth.images(spark, sf, g, withBytes = false), g)
    val packed = ImageOps.shardPack(imgs, cellMicro = 5000L, budgetBytes = 4096L)
    val rows = packed.collect()
    assert(rows.nonEmpty)
    // per (cell, shard): px_bytes of all but the last shard in a cell must
    // have crossed the budget (the chop rule: an item starts a new shard
    // only once cum-before passes the boundary) — so every non-final shard
    // holds ≥ budget - maxItem and ≤ budget + maxItem bytes
    val maxItem = 15L * 15L * 3L
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    byCell.foreach { case (_, shards) =>
      val sorted = shards.sortBy(_.getAs[Long]("shard"))
      sorted.dropRight(1).foreach { r =>
        val b = r.getAs[Long]("px_bytes")
        assert(b >= 4096L - maxItem && b <= 4096L + maxItem,
          s"non-final shard bytes $b out of chop envelope")
      }
      // shard ids are dense from 0
      assert(sorted.map(_.getAs[Long]("shard")).toSeq ===
        (0L until sorted.length.toLong))
    }
    // total images preserved
    assert(rows.map(_.getAs[Long]("n_images")).sum === imgs.count())
  }

  test("augmentDigests: digest equals digest of physically flipped source pixels") {
    val imgs = Seq(
      ("x1", "bmp", Codec.encodeFor("bmp", 424242L, 7, 5)),
      ("x2", "png", Codec.encodeFor("png", 434343L, 4, 9))
    ).toDF("image_id", "fmt", "bytes")
    val got = ImageOps.augmentDigests(spark, imgs, Seq("hflip", "rot180"))
      .select("image_id", "aug", "digest").as[(String, String, Long)]
      .collect().map { case (id, a, d) => (id, a) -> d }.toMap
    for ((id, ph, w, h) <- Seq(("x1", 424242L, 7, 5), ("x2", 434343L, 4, 9));
         a <- Seq("hflip", "rot180")) {
      val expect = ImageOps.pixelDigest(
        ImageOps.augmentPixels(Bmp.pixels(ph, w, h), w, h, a))
      assert(got((id, a)) === expect, s"$id/$a")
    }
  }
}
