package graft

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Multimodal, Video}
import graft.multimodal.Multimodal.MediaRow

/** Video modality leg: the GIF block walk must agree with the synthesis
  * parameters on our own multi-frame containers, parse REAL single-frame
  * GIFs produced by the JVM's own encoder (global color table and all —
  * structures our writer never emits), sample frames by index, and
  * reject hostile bytes without looping or throwing. */
class VideoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("synthesized multi-frame GIF round-trips meta from the parameters") {
    val docs = docsDf(Seq((0L, "a" * 10), (3L, "xyz"), (7L, ""), (12L, "b" * 300)))
    val metas = Video.extractMeta(Video.synthesizeGif(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas.keySet == Set(0L, 3L, 7L, 12L))
    // doc 0: len 10 → 5 frames, width 16, height 8, loop 0
    val m0 = metas(0L)
    assert((m0.width, m0.height, m0.frame_count, m0.loop_count) == (16, 8, 5, 0))
    assert(m0.duration_cs == (0 until 5).map(4 + _).sum)
    assert(m0.data_bytes == 10L)
    // doc 7: empty text still carries one (empty) frame
    val m7 = metas(7L)
    assert((m7.frame_count, m7.data_bytes) == (1, 0L))
    assert((m7.width, m7.height, m7.loop_count) == (16 + 7, 8 + 2, 3))
    // doc 12: 300 bytes forces multi-sub-block frames (>255 per frame? no —
    // 1+300%6=1 frame of 300 bytes → two sub-blocks) and len survives
    assert((metas(12L).frame_count, metas(12L).data_bytes) == (1, 300L))
  }

  test("frame sampling keeps every Nth frame with exact payload split") {
    val text = (0 until 25).map(i => ('a' + i % 26).toChar).mkString // len 25 → 2 frames
    val docs = docsDf(Seq((1L, text + "x" * 2))) // len 27 → 4 frames
    val frames = Video.sampleFrames(Video.synthesizeGif(docs), every = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2)) // 4 frames → idx 0,2
    val bytes = (text + "xx").getBytes("UTF-8")
    val nf = 1 + bytes.length % 6
    def slice(f: Int) = bytes.zipWithIndex
      .filter { case (_, i) => i.toLong * nf / bytes.length == f }.map(_._1)
    for (fr <- frames) {
      val s = slice(fr.frame_idx)
      assert(fr.data_bytes == s.length.toLong)
      assert(fr.payload_sum == s.map(_ & 0xff).map(_.toLong).sum)
      assert(fr.delay_cs == 4 + fr.frame_idx)
    }
  }

  test("parses a REAL GIF from the JVM's own encoder (GCT, foreign writer)") {
    val img = new BufferedImage(23, 9, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 23; y <- 0 until 9) img.setRGB(x, y, (x * 37 + y * 11) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos), "JVM carries no GIF writer")
    val meta = Video.decode(MediaRow(5L, "image/gif", bos.toByteArray))
      .getOrElse(fail("real encoder output not recognized"))
    assert((meta.width, meta.height) == (23, 9))
    assert(meta.frame_count == 1)
    assert(meta.data_bytes > 0) // real LZW payload, counted via sub-blocks
  }

  test("hostile inputs: truncation, bad magic, sub-block overrun → None") {
    val good = Video.synthesizeGif(docsDf(Seq((2L, "hello world"))))
      .collect().head.media
    assert(Video.decode(MediaRow(9L, "image/gif", good)).isDefined)
    // every truncation of a valid container must be rejected, not looped on
    for (cut <- Seq(0, 5, 6, 12, 13, 20, good.length / 2, good.length - 1))
      assert(Video.decode(MediaRow(9L, "image/gif", good.take(cut))).isEmpty,
        s"truncation at $cut accepted")
    val badMagic = good.clone(); badMagic(0) = 'J'.toByte
    assert(Video.decode(MediaRow(9L, "image/gif", badMagic)).isEmpty)
    // claim a 255-byte sub-block that runs past the buffer: an empty-text
    // container ends [lzw][0x00 terminator][0x3B], so length−2 is the
    // terminator byte — turning it into a length prefix must overrun
    val empty = Video.synthesizeGif(docsDf(Seq((7L, "")))).collect().head.media
    val overrun = empty.clone()
    overrun(overrun.length - 2) = 0xFF.toByte
    assert(Video.decode(MediaRow(9L, "image/gif", overrun)).isEmpty)
    // unknown top-level block type is malformed, not skipped
    val unknown = good.clone(); unknown(unknown.length - 1) = 0x7F.toByte
    assert(Video.decode(MediaRow(9L, "image/gif",
      unknown :+ 0x3B.toByte)).isEmpty)
  }

  test("comment extension from a foreign writer is skipped, not fatal") {
    val base = Video.synthesizeGif(docsDf(Seq((4L, "abcdef"))))
      .collect().head.media
    // splice a comment extension (0x21 0xFE, one sub-block) before trailer
    val comment = Array(0x21, 0xFE, 0x03, 'h', 'i', '!', 0x00).map(_.toByte)
    val spliced = base.dropRight(1) ++ comment :+ 0x3B.toByte
    val meta = Video.decode(MediaRow(4L, "image/gif", spliced))
      .getOrElse(fail("comment extension broke the walk"))
    assert(meta.frame_count == 1 + 6 % 6)
    assert(meta.data_bytes == 6L)
  }
}
