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

  test("LZW round-trips arbitrary index streams at 2-bit and 4-bit") {
    val rnd = new scala.util.Random(42)
    for (mcs <- Seq(2, 4); len <- Seq(1, 7, 255, 256, 1000)) {
      val nc = 1 << mcs
      val px = Array.fill(len)(rnd.nextInt(nc).toByte)
      val enc = graft.multimodal.GifLzw.encode(mcs, px)
      val dec = graft.multimodal.GifLzw.decode(mcs, enc, len)
        .getOrElse(fail(s"decode failed mcs=$mcs len=$len"))
      assert(dec.toSeq == px.toSeq, s"roundtrip mismatch mcs=$mcs len=$len")
      // wrong expected length must be rejected, not padded/truncated
      assert(graft.multimodal.GifLzw.decode(mcs, enc, len + 1).isEmpty)
      if (len > 1) assert(graft.multimodal.GifLzw.decode(mcs, enc, len - 1).isEmpty)
      // truncated streams must be rejected
      assert(graft.multimodal.GifLzw.decode(mcs, enc.take(enc.length / 2), len).isEmpty
        || len <= 2) // tiny streams may still complete at half length
    }
  }

  test("JVM's own GIF reader decodes our pixel GIFs to the rule's pixels") {
    // even id → 4 colors (2-bit), odd id → 16 colors (4-bit)
    val docs = docsDf(Seq((2L, "a" * 23), (5L, "b" * 40)))
    val media = Video.synthesizePixelGif(docs).collect().map(m => m.doc_id -> m).toMap
    for ((id, text) <- Seq((2L, "a" * 23), (5L, "b" * 40))) {
      val n = text.getBytes("UTF-8").length
      val nc = if (id % 2 == 0) 4 else 16
      val (w, h, nf) = (16 + (id % 8).toInt, 8 + (id % 5).toInt, 1 + n % 6)
      val iis = ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(media(id).media))
      val readers = ImageIO.getImageReaders(iis)
      assert(readers.hasNext, "JVM carries no GIF reader")
      val reader = readers.next()
      reader.setInput(iis)
      assert(reader.getNumImages(true) == nf)
      val bytes = text.getBytes("UTF-8")
      for (f <- 0 until nf) {
        val img = reader.read(f)
        assert((img.getWidth, img.getHeight) == (w, h))
        for (y <- 0 until h; x <- 0 until w) {
          val t = if (n == 0) 0L
            else (bytes(((f.toLong * w + x + y) % n).toInt) & 0xff).toLong
          val idx = ((x + 2L * y + 3L * f + id + n + t) % nc).toInt
          val g = idx * 255 / (nc - 1)
          val expected = 0xFF000000 | (g << 16) | (g << 8) | g
          assert(img.getRGB(x, y) == expected,
            s"id=$id f=$f ($x,$y): got ${img.getRGB(x, y).toHexString}, want gray $g")
        }
      }
      reader.dispose()
    }
  }

  test("our LZW decoder reads the JVM encoder's stream byte-for-byte") {
    val img = new BufferedImage(21, 11, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 21; y <- 0 until 11)
      img.setRGB(x, y, (x * 53 + y * 17) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos), "JVM carries no GIF writer")
    val bytes = bos.toByteArray
    val frames = Video.decodeFrames(MediaRow(1L, "image/gif", bytes))
      .getOrElse(fail("foreign LZW stream not decoded"))
    assert(frames.size == 1 && frames.head.length == 21 * 11)
    // referee: the JVM's decode of its own file; our indices mapped
    // through the file's global color table must agree pixel-for-pixel
    val gctSize = 1 << ((bytes(10) & 0x07) + 1)
    val palette = (0 until gctSize).map { i =>
      val o = 13 + 3 * i
      0xFF000000 | ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) |
        (bytes(o + 2) & 0xff)
    }
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 11; x <- 0 until 21) {
      val idx = frames.head(y * 21 + x) & 0xff
      assert(idx < gctSize)
      assert(palette(idx) == ref.getRGB(x, y), s"pixel ($x,$y) diverges")
    }
  }

  test("frameFeatures equals the hand-computed pixel rule") {
    val docs = docsDf(Seq((4L, "hello!"), (9L, "0123456789ab")))
    val feats = Video.frameFeatures(Video.synthesizePixelGif(docs))
      .collect().map(f => (f.doc_id, f.frame_idx) -> f).toMap
    for ((id, text) <- Seq((4L, "hello!"), (9L, "0123456789ab"))) {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      val nc = if (id % 2 == 0) 4 else 16
      val (w, h, nf) = (16 + (id % 8).toInt, 8 + (id % 5).toInt, 1 + n % 6)
      def lum(f: Int, x: Int, y: Int) = {
        val t = if (n == 0) 0L
          else (bytes(((f.toLong * w + x + y) % n).toInt) & 0xff).toLong
        (((x + 2L * y + 3L * f + id + n + t) % nc).toInt * 255) / (nc - 1)
      }
      for (f <- 0 until nf) {
        val ft = feats.getOrElse((id, f), fail(s"missing frame $id/$f"))
        val ls = for (y <- 0 until h; x <- 0 until w) yield lum(f, x, y)
        assert(ft.sum_lum == ls.map(_.toLong).sum)
        assert(Seq(ft.b0, ft.b1, ft.b2, ft.b3) ==
          (0 until 4).map(b => ls.count(_ / 64 == b).toLong))
        val wantDelta = if (f == 0) 0L
          else (for (y <- 0 until h; x <- 0 until w)
            yield math.abs(lum(f, x, y) - lum(f - 1, x, y)).toLong).sum
        assert(ft.delta_prev == wantDelta, s"delta $id/$f")
      }
      assert((0 until nf).forall(f => feats.contains((id, f))))
    }
  }

  test("planted video copies pair at hamming 0; drifted tails are rejected") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val off = Multimodal.plantedIdOffset(docs)
    val pairs = Video.plantedVideoPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val copyIds = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id")).as[Long].collect()
    assert(copyIds.nonEmpty)
    for (id <- copyIds)
      assert(pairs.exists(p => p._1 == id && p._2 == id + off && p._3 == 0),
        s"planted exact copy of $id did not pair at hamming 0")
    // drift contract: the drifted copy must NOT pair with its own
    // source (a 5-char tail scrambles the fingerprint); incidental
    // near-collisions with UNRELATED docs are legitimate output
    val driftSources = docs.filter(col("doc_id") % 20 === 5)
      .select(col("doc_id")).as[Long].collect()
    assert(driftSources.nonEmpty)
    for (id <- driftSources)
      assert(!pairs.exists(p => p._1 == id && p._2 == id + 2 * off),
        s"drifted copy of $id paired with its source")
  }

  test("corpus is ASCII: octet length equals char length (oracle twins rely on it)") {
    // videoMetaSql/sampleFramesSql/videoFeaturesSql restate byte counts
    // via length(text); synthesis slices UTF-8 octets. This gate turns
    // the comment-level assumption into a checked invariant — if a
    // regenerated corpus ever ships non-ASCII text, THIS fails instead
    // of a silent oracle divergence.
    import org.apache.spark.sql.functions.{col, length, octet_length}
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.documents(spark, sf)
      val nonAscii = docs
        .filter(octet_length(col("text")) =!= length(col("text"))).count()
      assert(nonAscii == 0L, s"$sf: $nonAscii non-ASCII documents")
    }
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
