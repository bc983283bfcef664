package graft

import graft.operators.{Multimodal, VideoOps}
import graft.tables.{Images, Video}

class VideoSpec extends SparkSuite {

  import spark.implicits._

  test("GVID container packs and seeks frames without decoding the rest") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6))
    val packed = Video.pack(frames)
    assert(Video.frameCount(packed) == 3)
    (0 until 3).foreach(k => assert(Video.frame(packed, k).toSeq == frames(k).toSeq))
    intercept[IllegalArgumentException](Video.frame(packed, 3))
    intercept[IllegalArgumentException](Video.frameCount(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)))
  }

  test("generated video frames decode to the rendered pattern") {
    val r = Video.row(5L)
    assert(r.n_frames == Video.nFramesFor(5L) && r.n_frames >= 4 && r.n_frames <= 8)
    val (w, h, px) = Images.decode(Video.frame(r.bytes, 2))
    assert(w == r.w && h == r.h)
    val ref = Images.render(Video.frameSeed(5L, 2), r.w, r.h)
    val refPx = new Array[Int](r.w * r.h)
    ref.getRGB(0, 0, r.w, r.h, refPx, 0, r.w)
    assert(px.toSeq == refPx.toSeq) // PNG lossless
  }

  test("sampleFrames: stride sampling, exact ahash per sampled frame") {
    val r = Video.row(9L)
    val out = VideoOps.sampleFrames(spark,
        Seq((r.video_id, r.bytes)).toDF("video_id", "bytes"), stride = 2)
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq == (0 until r.n_frames by 2).map(_.toLong))
    out.foreach { case (_, f, ah, _) =>
      val (w, h, px) = Images.decode(Video.frame(r.bytes, f.toInt))
      assert(ah == Multimodal.ahash(px, w, h))
    }
  }
}
