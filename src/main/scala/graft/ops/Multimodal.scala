package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-decoded per partition.
  *
  * The Spark-side plumbing — schema, partition sizing, per-partition batch
  * iteration, feature schema — is real and tested. Both seams have a REAL
  * JDK-backed implementation and a container-safe stub: [[ImageIoCodec]]
  * decodes PNG/JPEG/BMP/GIF stills behind the [[Codec]] seam, and
  * [[GifDemuxer]] iterates animated-GIF frames behind the [[Demuxer]] seam
  * (the JDK cannot demux MP4/audio — a production deployment drops an
  * FFmpeg-backed [[Demuxer]] into the same seam and nothing else changes).
  * Non-decodable payloads fall back to the deterministic stubs so mixed
  * corpora never fail a partition.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (SURVEY-style explicit
    * schema; binary stays opaque to Catalyst and is never shuffled except
    * by explicit repartition). */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      mean_byte: Double,
      histogram: Array[Double])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("bytes", BinaryType)
  ))

  /** Pluggable codec seam: one implementation turns an opaque media row
    * into typed features. Implementations must be Serializable — the
    * instance ships to executors and runs inside the partition iterator. */
  trait Codec extends Serializable {
    def decode(r: MediaRow): MediaFeatures
  }

  /** Container-safe default: the deterministic fake decode below. */
  object StubCodec extends Codec {
    override def decode(r: MediaRow): MediaFeatures = decodeStub(r)
  }

  /** Real image decode via `javax.imageio` (PNG/JPEG/BMP/GIF readers ship
    * with the JDK — no external dependency, headless-safe): width/height
    * from the decoded raster, 16-bin luminance histogram, mean luminance
    * (integer Rec.601 weights). Non-image payloads (ImageIO.read → null)
    * fall back to the stub so mixed corpora don't fail the partition. */
  object ImageIoCodec extends Codec {
    /** ImageIO present in this JVM (absent on stripped runtimes without
      * the java.desktop module). */
    lazy val available: Boolean =
      try { Class.forName("javax.imageio.ImageIO"); true }
      catch { case _: Throwable => false }

    override def decode(r: MediaRow): MediaFeatures = {
      // JDK image plugins can throw RuntimeExceptions (IllegalArgument,
      // CMMException, AIOOBE) on malformed payloads, not just IOException —
      // any decode failure falls back to the stub so mixed corpora never
      // fail the partition; same for a stripped runtime without java.desktop
      val img =
        if (!available) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
          catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) StubCodec.decode(r)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Double](16)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum / 16) += 1
            sum += lum
            x += 1
          }
          y += 1
        }
        val n = math.max(w * h, 1)
        MediaFeatures(r.media_id, r.kind, r.bytes.length, w, h,
          sum.toDouble / n, hist.map(_ / n))
      }
    }
  }

  /** STUB CODEC — deterministic fake "decode": width/height from the
    * first 4 bytes (big-endian u16 pairs), 16-bin byte histogram as the
    * "feature vector". The pluggable seam is [[Codec]]; this remains the
    * default because the provisioned corpus carries no real media. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val b = r.bytes
    def u16(i: Int): Int =
      if (b.length > i + 1) ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff) else 0
    val hist = new Array[Double](16)
    var sum = 0L
    var i = 0
    while (i < b.length) { val v = b(i) & 0xff; hist(v / 16) += 1; sum += v; i += 1 }
    val n = math.max(b.length, 1)
    MediaFeatures(r.media_id, r.kind, b.length, u16(0), u16(2),
      sum.toDouble / n, hist.map(_ / n))
  }

  /** Batch decode: one pass per partition, codec invoked per record
    * inside the partition iterator (mapPartitions ≈ mapInPandas batch
    * shape — amortizes per-batch codec setup, never collects). */
  def decodeFeatures(media: Dataset[MediaRow],
                     codec: Codec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs would initialize per-partition state here (decoder
      // handles, model weights, thread pools)
      it.map(codec.decode)
    }
  }

  /** One sampled frame out of a media payload: byte offset within the
    * container plus a content hash of the decoded frame. */
  case class Frame(media_id: Long, frame_offset: Int, frame_hash: Int)

  /** Pluggable demux seam for audio/video: one implementation turns an
    * opaque media row into an iterator of sampled frames. Same contract
    * as [[Codec]] — Serializable, runs inside the partition iterator, a
    * production deployment swaps in a real demuxer (container parse +
    * keyframe decode) and nothing else changes. */
  trait Demuxer extends Serializable {
    def frames(r: MediaRow, stride: Int): Iterator[Frame]
  }

  /** STUB demuxer — container-safe default: every `stride`-th 4-byte
    * window stands in for a decoded keyframe (no media libs in this
    * container). Deterministic, so the plumbing is fully testable. */
  object StubDemuxer extends Demuxer {
    override def frames(r: MediaRow, stride: Int): Iterator[Frame] =
      Iterator.range(0, math.max(r.bytes.length - 3, 0), math.max(stride, 1))
        .map { off =>
          val frameHash = java.util.Arrays.hashCode(
            java.util.Arrays.copyOfRange(r.bytes, off, off + 4))
          Frame(r.media_id, off, frameHash)
        }
  }

  /** Real multi-frame demux via the JDK GIF reader — the proof (like
    * [[ImageIoCodec]] for [[Codec]]) that the [[Demuxer]] seam takes a real
    * implementation with no other change: `javax.imageio` iterates the
    * frames of an animated GIF (`getNumImages` / indexed `read`), every
    * `stride`-th frame is decoded standalone (no disposal compositing) and
    * hashed over its ARGB raster. `frame_offset` is the FRAME INDEX within
    * the container (the stub's byte offset has no meaning once a real
    * container is parsed). Non-GIF or malformed payloads fall back to
    * [[StubDemuxer]] so mixed corpora never fail the partition — the same
    * contract as [[ImageIoCodec]].
    *
    * NOTE: frames must be written non-interlaced; the JDK GIF reader
    * mis-rasterizes tiny interlaced images (observed on 2×2). */
  object GifDemuxer extends Demuxer {
    override def frames(r: MediaRow, stride: Int): Iterator[Frame] = {
      if (!ImageIoCodec.available) return StubDemuxer.frames(r, stride)
      val s = math.max(stride, 1)
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); return StubDemuxer.frames(r, stride) }
        val reader = readers.next()
        if (!reader.getFormatName.equalsIgnoreCase("gif")) {
          reader.dispose(); iis.close(); return StubDemuxer.frames(r, stride)
        }
        val decoded =
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true) // forward scan — needs the full stream
            // materialize before dispose: the iterator must not outlive the reader
            Iterator.range(0, n, s).map { i =>
              val img = reader.read(i)
              val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
              Frame(r.media_id, i, java.util.Arrays.hashCode(px))
            }.toVector
          } finally { reader.dispose(); iis.close() }
        // a torn GIF can scan to ZERO complete frames without throwing —
        // treat "no decodable frame" as non-GIF and fall back
        if (decoded.isEmpty) StubDemuxer.frames(r, stride) else decoded.iterator
      } catch {
        case scala.util.control.NonFatal(_) => StubDemuxer.frames(r, stride)
      }
    }
  }

  /** Real audio demux via `javax.sound.sampled` (the WAV/PCM parser ships
    * with the JDK — no external dependency): the RIFF header is parsed,
    * the PCM payload is windowed into [[AudioWavDemuxer.WindowFrames]]
    * -sample-frame windows, and every `stride`-th window becomes one
    * [[Frame]] — `frame_offset` is the WINDOW INDEX (the audio analog of
    * [[GifDemuxer]]'s frame index), `frame_hash` the hash of the window's
    * raw PCM bytes. Non-PCM encodings (A-law/µ-law/float WAVs) and
    * non-WAV payloads fall back to [[StubDemuxer]] — the same
    * never-fail-the-partition contract as the other real seams. Closes
    * the multimodal stub surface to formats the pure JDK genuinely
    * cannot parse (MP4/MP3). */
  object AudioWavDemuxer extends Demuxer {
    /** PCM sample frames per emitted window (~64 ms at 16 kHz). */
    val WindowFrames = 1024

    override def frames(r: MediaRow, stride: Int): Iterator[Frame] = {
      val s = math.max(stride, 1)
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.bytes))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          if (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
            return StubDemuxer.frames(r, stride)
          val windowBytes = math.max(fmt.getFrameSize, 1) * WindowFrames
          val data = in.readAllBytes()
          if (data.isEmpty) return StubDemuxer.frames(r, stride)
          val nWindows = (data.length + windowBytes - 1) / windowBytes
          Iterator.range(0, nWindows, s).map { w =>
            val from = w * windowBytes
            val until = math.min(from + windowBytes, data.length)
            Frame(r.media_id, w, java.util.Arrays.hashCode(
              java.util.Arrays.copyOfRange(data, from, until)))
          }.toVector.iterator
        } finally in.close()
      } catch {
        case scala.util.control.NonFatal(_) => StubDemuxer.frames(r, stride)
      }
    }
  }

  /** Container dispatch over the magic bytes: animated GIFs go through
    * [[GifDemuxer]], RIFF/WAVE audio through [[AudioWavDemuxer]], anything
    * else through [[StubDemuxer]] — so a MIXED media corpus flows through
    * ONE [[Demuxer]] seam and each payload gets the real parser the JDK
    * has for it. */
  object AutoDemuxer extends Demuxer {
    private def startsWith(b: Array[Byte], at: Int, magic: String): Boolean =
      b.length >= at + magic.length &&
        magic.indices.forall(i => b(at + i) == magic.charAt(i).toByte)

    override def frames(r: MediaRow, stride: Int): Iterator[Frame] =
      if (startsWith(r.bytes, 0, "GIF8")) GifDemuxer.frames(r, stride)
      else if (startsWith(r.bytes, 0, "RIFF") && startsWith(r.bytes, 8, "WAVE"))
        AudioWavDemuxer.frames(r, stride)
      else StubDemuxer.frames(r, stride)
  }

  /** Frame sampling through the [[Demuxer]] seam: one demux pass per
    * partition, one output row per sampled frame. Never collects; frame
    * fan-out stays inside the partition iterator. */
  def frameSample(media: Dataset[MediaRow], stride: Int,
                  demuxer: Demuxer = StubDemuxer): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(demuxer.frames(_, stride))
      .toDF("media_id", "frame_offset", "frame_hash")
  }

  /** Back-compat alias for the pre-seam entry point. */
  def frameSampleStub(media: Dataset[MediaRow], stride: Int): DataFrame =
    frameSample(media, stride, StubDemuxer)

  /** Size-aware repartition: media blobs are orders of magnitude bigger
    * than their metadata, so partition count follows total payload bytes,
    * not row count (targeting `targetBytes` per partition keeps executor
    * memory flat at 100 TB). */
  def repartitionBySize(df: DataFrame, bytesCol: String, targetBytes: Long): DataFrame = {
    // sum() is NULL on empty/all-null input — coalesce to 0 so the probe
    // never NPEs
    val total = df.agg(coalesce(sum(length(col(bytesCol))), lit(0L)))
      .head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    df.repartition(parts)
  }

  /** Wrap any table into a fake media table (test/demo harness): text
    * bytes become the opaque payload. Lets the multimodal path run
    * against the provisioned `documents` table without real media. */
  def syntheticMedia(spark: SparkSession, df: DataFrame,
                     idCol: String, payloadCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit("image/fake").as("kind"),
        col(payloadCol).cast("binary").as("bytes"))
      .as[MediaRow]
  }
}
