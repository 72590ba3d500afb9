package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal.MediaRow

/** Audio columns for a training-data pipeline — the audio analog of
  * [[Multimodal.ImageHeaderCodec]]: a REAL RIFF/WAVE container parser
  * (chunk walk, little-endian fmt fields) plus sample-level feature
  * extraction, both pure-JVM executor-side code. The synthetic corpus
  * is genuine PCM WAV bytes built from the document text (8-bit mono
  * 8 kHz; each UTF-8 octet is one unsigned sample), which makes every
  * parsed field and every frame energy replayable by the DuckDB oracle
  * from the text alone — the codec's output is pinned against the
  * synthesis parameters end-to-end.
  *
  * Scale shape: synthesis, parse, and feature extraction are all
  * mapPartitions batches over the media column (no shuffle, no
  * driver); at 100 TB the WAV bytes come from object-store parquet and
  * the same chunk-walk/energy loops run unchanged — frame energies are
  * one O(n_bytes) pass per blob, emitted as nFrames kB-sized rows.
  */
object Audio {

  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                       bits: Int, n_samples: Long, duration_ms: Long)
  case class FrameEnergy(doc_id: Long, frame: Int, n_samples: Long,
                         energy: Long)

  private val Rate = 8000

  /** Genuine 44-byte-header PCM WAV: RIFF size, fmt (PCM, mono,
    * 8 kHz, 8-bit), data chunk = the text's UTF-8 octets as unsigned
    * samples. */
  def synthesizeWav(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val pcm = text.getBytes("UTF-8")
        val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1) // PCM, mono
          .putInt(Rate).putInt(Rate) // sample rate, byte rate
          .putShort(1).putShort(8) // block align, bits
          .put("data".getBytes("US-ASCII")).putInt(pcm.length)
          .put(pcm)
        MediaRow(id, "audio/wav", bb.array())
      })
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Strict RIFF chunk walk: WAVE form, then fmt / data chunks in any
    * order (the container permits LIST/fact chunks between them).
    * None for anything malformed — callers decide the fallback, the
    * [[Multimodal.ImageHeaderCodec]] contract. */
  def decode(m: MediaRow): Option[AudioMeta] = {
    val b = m.media
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") None
    else {
      var (o, rate, ch, bits, dataLen) = (12, -1, -1, -1, -1L)
      while (o + 8 <= b.length) {
        val (id, sz) = (tag(b, o), u32(b, o + 4))
        if (id == "fmt " && o + 24 <= b.length) {
          ch = u16(b, o + 10); rate = u32(b, o + 12).toInt
          bits = u16(b, o + 22)
        } else if (id == "data") dataLen = sz
        o += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
      if (rate <= 0 || ch <= 0 || bits <= 0 || dataLen < 0) None
      else {
        val n = dataLen / (ch * bits / 8)
        Some(AudioMeta(m.doc_id, rate, ch, bits, n, n * 1000L / rate))
      }
    }
  }

  def extractMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(decode))
  }

  /** Per-frame signal energy over the 8-bit unsigned samples:
    * Σ (s − 128)² with sample i assigned to frame (i·nFrames) div n —
    * one O(n) pass per blob. Integer arithmetic end-to-end, so the
    * oracle replays it from the source text with ascii(). */
  def frameEnergy(media: Dataset[MediaRow],
                  nFrames: Int = 4): Dataset[FrameEnergy] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      decode(m).toSeq.flatMap { meta =>
        val n = meta.n_samples.toInt
        val off = m.media.length - n // samples are the data-chunk tail
        val (cnt, en) = (new Array[Long](nFrames), new Array[Long](nFrames))
        var i = 0
        while (i < n) {
          val f = (i.toLong * nFrames / n).toInt
          val d = (m.media(off + i) & 0xff) - 128
          cnt(f) += 1; en(f) += d.toLong * d
          i += 1
        }
        (0 until nFrames).filter(cnt(_) > 0)
          .map(f => FrameEnergy(m.doc_id, f, cnt(f), en(f)))
      }
    })
  }

  /** Oracle twin of synthesize → [[extractMeta]]: every parsed field
    * restated from the synthesis parameters and the text's octet
    * length. */
  def audioMetaSql: String =
    s"""SELECT doc_id, $Rate AS sample_rate, 1 AS channels, 8 AS bits,
       |       CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
       |       CAST(octet_length(encode(text)) * 1000 // $Rate AS BIGINT)
       |         AS duration_ms
       |FROM documents""".stripMargin

  /** Oracle twin of synthesize → [[frameEnergy]] (ASCII corpus: one
    * octet per char, so ascii() IS the sample value). */
  def frameEnergySql(nFrames: Int = 4): String =
    s"""WITH samples AS (
       |  SELECT doc_id, i,
       |         ascii(substring(text, CAST(i AS INT), 1)) AS s,
       |         length(text) AS n
       |  FROM (SELECT doc_id, text,
       |          unnest(generate_series(1, length(text))) AS i
       |        FROM documents))
       |SELECT doc_id, CAST((i - 1) * $nFrames // n AS INT) AS frame,
       |       CAST(count(*) AS BIGINT) AS n_samples,
       |       CAST(sum((s - 128) * (s - 128)) AS BIGINT) AS energy
       |FROM samples
       |GROUP BY doc_id, (i - 1) * $nFrames // n""".stripMargin
}
