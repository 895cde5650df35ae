package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(spark, sf).limit(20)

  test("withImageMeta attaches typed metadata struct per binary asset") {
    val out = Multimodal.withImageMeta(media, "content")
    assert(out.schema("image_meta").dataType == Multimodal.imageMetaSchema)
    val r = out.select("image_meta.width", "image_meta.height", "image_meta.format").head()
    assert(r.getInt(0) >= 64 && r.getInt(1) >= 64)
    assert(Set("jpeg", "png").contains(r.getString(2)))
  }

  test("ImageIoCodec decodes REAL PNG and JPEG bytes through the same dataflow") {
    def imageBytes(fmt: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      img.setRGB(0, 0, 0xff8800)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rgb = java.awt.image.BufferedImage.TYPE_INT_RGB
    val gray = java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    val assets = Seq(
      (1L, imageBytes("png", 17, 9, rgb)),
      (2L, imageBytes("jpg", 32, 24, rgb)),
      (3L, imageBytes("png", 5, 5, gray)),
      (4L, "definitely not an image".getBytes("UTF-8")),
    ).toDF("media_id", "content")
    val metas = Multimodal
      .withImageMeta(assets, "content", codec = Multimodal.ImageIoCodec)
      .select($"media_id", $"image_meta.width", $"image_meta.height",
        $"image_meta.channels", $"image_meta.format")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))))
      .toMap
    assert(metas(1L).contains((17, 9, 3, "png")))
    assert(metas(2L).exists { case (w, h, c, f) => w == 32 && h == 24 && c == 3 && f.startsWith("jp") })
    assert(metas(3L).contains((5, 5, 1, "png")))
    assert(metas(4L).isEmpty, "non-image bytes must yield a null struct, not a crash")
  }

  test("withImageMeta is a codegen'd projection, equivalent to the mapPartitions path") {
    // Stateless codecs ride the ImageMeta Catalyst expression: the plan
    // must NOT re-encode rows around the decode (no object-boundary pair).
    val viaExpr = Multimodal.withImageMeta(media, "content")
    val plan = viaExpr.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject") && !plan.contains("DeserializeToObject"),
      s"image-meta projection broke whole-stage codegen:\n$plan")
    assert(plan.contains("graft_image_meta"))
    // Byte-identical results vs the per-partition-lifecycle scaffold.
    val exprRows = viaExpr.select("media_id", "image_meta.*").collect().map(_.toSeq).toSet
    val mpRows = Multimodal.withImageMetaPartitioned(media, "content")
      .select("media_id", "image_meta.*").collect().map(_.toSeq).toSet
    assert(exprRows == mpRows)
  }

  test("JavaSoundCodec decodes REAL WAV and AIFF headers; stub serves text bytes") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def audioBytes(tpe: AudioFileFormat.Type, rate: Float, bits: Int, ch: Int,
        frames: Int, bigEndian: Boolean): Array[Byte] = {
      val fmt = new AudioFormat(rate, bits, ch, true, bigEndian)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    val assets = Seq(
      (1L, audioBytes(AudioFileFormat.Type.WAVE, 8000f, 16, 1, 4000, bigEndian = false)),
      (2L, audioBytes(AudioFileFormat.Type.AIFF, 44100f, 16, 2, 44100, bigEndian = true)),
      (3L, "definitely not audio".getBytes("UTF-8")),
    ).toDF("media_id", "content")
    val out = Multimodal
      .withAudioMeta(assets, "content", codec = Multimodal.JavaSoundCodec)
    assert(out.schema("audio_meta").dataType == Multimodal.audioMetaSchema)
    val metas = out
      .select($"media_id", $"audio_meta.sample_rate", $"audio_meta.channels",
        $"audio_meta.bits_per_sample", $"audio_meta.frames", $"audio_meta.duration_sec",
        $"audio_meta.format")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getDouble(5), r.getString(6)))))
      .toMap
    assert(metas(1L).contains((8000, 1, 16, 4000L, 0.5, "wav")))
    assert(metas(2L).contains((44100, 2, 16, 44100L, 1.0, "aif")))
    assert(metas(3L).isEmpty, "non-audio bytes must yield a null struct, not a crash")
    // Codegen'd projection, like images: no object re-encoding boundary.
    // (Asserted on the parquet-backed table — a local relation would be
    // constant-folded by ConvertToLocalRelation before reaching here.)
    val plan = Multimodal.withAudioMeta(media, "content", codec = Multimodal.JavaSoundCodec)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject") && plan.contains("graft_audio_meta"), plan)
  }

  test("JavaSoundCodec resamples a REAL WAV 44.1k->16k: frame counts, format, determinism") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // A real 0.1 s 440 Hz sine at 44.1 kHz mono 16-bit — not silence, so
    // a broken converter can't pass by accident.
    def sineWav(rate: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](frames * 2)
      (0 until frames).foreach { i =>
        val s = (math.sin(2 * math.Pi * 440 * i / rate) * 10000).toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = (s >> 8).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong), AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val src = sineWav(44100, 4410)
    val assets = Seq(
      (1L, src),
      (2L, "definitely not audio".getBytes("UTF-8")),
    ).toDF("media_id", "content")
    val out = Multimodal.withResampledAudio(
        assets, "content", targetRate = 16000, codec = Multimodal.JavaSoundCodec)
      .select($"media_id", $"resampled").as[(Long, Array[Byte])].collect().toMap
    assert(out(2L) == null, "non-audio bytes must resample to null, not crash")
    val meta = Multimodal.JavaSoundCodec.audioMeta(out(1L))
    assert(meta.isDefined, "resampled output must itself be decodable WAV")
    val (sr, ch, bits, frames, _) = meta.get
    assert(sr == 16000 && ch == 1 && bits == 16, s"got ($sr, $ch, $bits)")
    // 4410 frames at 44.1k → 1600 at 16k (the provider may emit ±1 edge
    // frame from interpolation windup).
    assert(math.abs(frames - 1600L) <= 2, s"expected ~1600 frames, got $frames")
    // Deterministic: the conversion collects no RNG and no wall clock.
    val rerun = Multimodal.withResampledAudio(
        assets, "content", targetRate = 16000, codec = Multimodal.JavaSoundCodec)
      .select($"media_id", $"resampled").as[(Long, Array[Byte])].collect().toMap
    assert(java.util.Arrays.equals(out(1L), rerun(1L)), "resample not deterministic")
    // Same-rate input passes through decodable and at full length.
    val same = Multimodal.JavaSoundCodec.resample(src, 44100)
    assert(same.exists(b => Multimodal.JavaSoundCodec.audioMeta(b).exists(_._4 == 4410L)))
  }

  test("Mp4Codec decodes a REAL ISO BMFF header; audio track skipped; text bytes null") {
    // Hand-assembled minimal MP4: ftyp(isom) + moov(mvhd + audio trak +
    // video trak) + mdat. The codec must take the brand from ftyp,
    // timescale/duration from mvhd, dimensions from the FIRST trak with
    // nonzero width/height (the audio trak has 0x0), and skip mdat
    // entirely (its "frames" here are garbage bytes).
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(tag.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    def fullBoxPayload(size: Int)(fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(size)
      fill(b)
      b.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0))
    // mvhd v0: v+flags, ctime, mtime, timescale=600, duration=1200, then
    // rate/volume/reserved/matrix/predefined/next_track (zeros).
    val mvhd = box("mvhd", fullBoxPayload(100) { b =>
      b.putInt(0).putInt(0).putInt(0).putInt(600).putInt(1200)
    })
    // tkhd v0: v+flags, ctime, mtime, track_id, reserved, duration,
    // reserved(8), layer/alt/volume/reserved, matrix(36), width, height
    // (16.16 fixed at the payload tail).
    def tkhd(w: Int, h: Int, trackId: Int) = box("tkhd", fullBoxPayload(84) { b =>
      b.putInt(0).putInt(0).putInt(0).putInt(trackId)
      b.position(76)
      b.putInt(w << 16).putInt(h << 16)
    })
    val audioTrak = box("trak", tkhd(0, 0, 1))
    val videoTrak = box("trak", tkhd(320, 240, 2))
    val moov = box("moov", mvhd ++ audioTrak ++ videoTrak)
    val mdat = box("mdat", Array.fill[Byte](256)(0x5a))
    val mp4 = ftyp ++ moov ++ mdat
    assert(Multimodal.Mp4Codec.videoMeta(mp4).contains((320, 240, 1200L, 600L, "isom")))
    val assets = Seq((1L, mp4), (2L, "definitely not video".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val out = Multimodal.withVideoMeta(assets, "content", codec = Multimodal.Mp4Codec)
    assert(out.schema("video_meta").dataType == Multimodal.videoMetaSchema)
    val r1 = out.filter($"media_id" === 1L)
      .select($"video_meta.width", $"video_meta.height", $"video_meta.duration_sec",
        $"video_meta.timescale", $"video_meta.brand").head()
    assert((r1.getInt(0), r1.getInt(1), r1.getDouble(2), r1.getLong(3), r1.getString(4)) ==
      ((320, 240, 2.0, 600L, "isom")))
    assert(out.filter($"media_id" === 2L).select($"video_meta").head().isNullAt(0),
      "non-video bytes must yield a null struct, not a crash")
    // Truncated container: parses as corrupt, never throws.
    assert(Multimodal.Mp4Codec.videoMeta(mp4.take(40)).isEmpty)
    // Undersized tkhd (4-byte payload): must yield None, not read the
    // preceding sibling's bytes as 16.16 dimensions.
    val shortTkhd = box("tkhd", fullBoxPayload(4)(_.putInt(0)))
    assert(Multimodal.Mp4Codec.videoMeta(
      ftyp ++ box("moov", mvhd ++ box("trak", shortTkhd)) ++ mdat).isEmpty)
  }

  test("withAudioMeta stub path is deterministic over arbitrary bytes") {
    val a = Multimodal.withAudioMeta(media, "content")
      .select($"media_id", $"audio_meta.sample_rate", $"audio_meta.frames")
      .collect().map(_.toSeq)
    val b = Multimodal.withAudioMeta(media, "content")
      .select($"media_id", $"audio_meta.sample_rate", $"audio_meta.frames")
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty && a.forall(r => Set(8000, 16000, 22050, 44100, 48000).contains(r(1).asInstanceOf[Int])))
  }

  test("withFeatures produces array<float> ready for ANN, deterministic") {
    val a = Multimodal.withFeatures(media, "content", dim = 16)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val b = Multimodal.withFeatures(media, "content", dim = 16)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(a == b, "stub featurizer must be deterministic")
    assert(a.values.forall(_.length == 16))
  }

  test("withResized scales payloads toward the target dim, idempotent when small") {
    val out = Multimodal.withResized(media, "content", targetDim = 128)
      .select($"media_id", length($"content").as("orig"), length($"resized").as("res"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (orig, res) = (r.getAs[Int]("orig"), r.getAs[Int]("res"))
      assert(res <= orig, s"resize must never grow the payload ($orig -> $res)")
      assert(res > 0)
    }
    // determinism: same input -> byte-identical output
    val a = Multimodal.withResized(media, "content", 128).select($"resized").collect().map(_.getAs[Array[Byte]](0).toSeq)
    val b = Multimodal.withResized(media, "content", 128).select($"resized").collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("withResized uses the pluggable codec: real dims via ImageIoCodec, null when undecodable") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val big = png(512, 256)
    val small = png(16, 16)
    val assets = Seq(
      (1L, big),
      (2L, small),
      (3L, "not an image".getBytes("UTF-8")),
    ).toDF("media_id", "content")
    val out = Multimodal.withResized(assets, "content", targetDim = 128, codec = Multimodal.ImageIoCodec)
      .select("media_id", "resized").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]](1))).toMap
    // 512x256 scaled by 128/512: payload shrinks to ~1/4
    assert(out(1L).exists(b => b.length == math.max(1, (big.length.toLong * 128 + 511) / 512).toInt))
    assert(out(2L).exists(_.sameElements(small)), "already within target: passthrough")
    assert(out(3L).isEmpty, "undecodable bytes -> null, never a hash-faked resize")
  }

  test("explodeFrames yields frame rows with indices") {
    val out = Multimodal.explodeFrames(media, "content", framesPerVideo = 4)
    assert(out.count() == 80)
    val idx = out.filter($"media_id" === 0).select("frame_idx").as[Int].collect().sorted.toSeq
    assert(idx == Seq(0, 1, 2, 3))
    assert(out.schema("frame").dataType.typeName == "binary")
  }

  test("readBinaryDir ingests real files: glob prunes, recursion descends, metadata decodes") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_media").toString
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def wav(rate: Float, frames: Int): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](frames * fmt.getFrameSize)), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    Files.write(Paths.get(dir, "a.png"), png(17, 9))
    Files.write(Paths.get(dir, "b.png"), png(5, 5))
    Files.createDirectory(Paths.get(dir, "sub"))
    Files.write(Paths.get(dir, "sub", "c.wav"), wav(8000f, 4000))
    Files.write(Paths.get(dir, "decoy.txt"), "not media".getBytes("UTF-8"))

    val pngs = Multimodal.readBinaryDir(spark, dir, glob = "*.png")
    assert(pngs.count() == 2, "glob must prune at listing time")
    val dims = Multimodal.withImageMeta(pngs, "content", codec = Multimodal.ImageIoCodec)
      .select($"image_meta.width", $"image_meta.height").as[(Int, Int)].collect().toSet
    assert(dims == Set((17, 9), (5, 5)))

    val wavs = Multimodal.readBinaryDir(spark, dir, glob = "*.wav") // sub/ via recursion
    val au = Multimodal.withAudioMeta(wavs, "content", codec = Multimodal.JavaSoundCodec)
      .select($"audio_meta.sample_rate", $"audio_meta.duration_sec").as[(Int, Double)].collect()
    assert(au.toSeq == Seq((8000, 0.5)))

    val all = Multimodal.readBinaryDir(spark, dir)
    assert(all.count() == 4)
    // length column is real file size, usable as a pre-decode guard
    val bySize = all.select("length").as[Long].collect()
    assert(bySize.forall(_ > 0))
    val nonRec = Multimodal.readBinaryDir(spark, dir, recursive = false)
    assert(nonRec.count() == 3, "recursive=false must skip sub/")
  }

  test("AviMjpegCodec: REAL frame extraction from an MJPEG AVI; frames decode via ImageIO") {
    def jpeg(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, 32, 24); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // Minimal RIFF AVI: 'RIFF' size 'AVI ' + LIST(movi) of '00dc' JPEG
    // chunks, word-aligned — the container shape AviMjpegCodec walks.
    def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
      def u32(v: Int): Array[Byte] = {
        val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.putInt(v); b.array()
      }
      def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
      val movi = new java.io.ByteArrayOutputStream()
      movi.write(cc("movi"))
      frames.foreach { f =>
        movi.write(cc("00dc")); movi.write(u32(f.length)); movi.write(f)
        if ((f.length & 1) == 1) movi.write(0) // pad to word boundary
      }
      val m = movi.toByteArray
      val inner = new java.io.ByteArrayOutputStream()
      inner.write(cc("AVI "))
      inner.write(cc("LIST")); inner.write(u32(m.length)); inner.write(m)
      val i = inner.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write(cc("RIFF")); out.write(u32(i.length)); out.write(i)
      out.toByteArray
    }
    val frames = Seq(jpeg(0xFF0000), jpeg(0x00FF00), jpeg(0x0000FF), jpeg(0xFFFFFF))
    val avi = mjpegAvi(frames)
    assert(Multimodal.AviMjpegCodec.frameCount(avi) == 4)
    // Extracted payloads are byte-identical to the encoded JPEGs.
    assert(Multimodal.AviMjpegCodec.sampleFrames(avi, 4).map(_.toSeq) == frames.map(_.toSeq))
    // Sampling 2 of 4 picks evenly spaced frames 0 and 2.
    assert(Multimodal.AviMjpegCodec.sampleFrames(avi, 2).map(_.toSeq) ==
      Seq(frames(0).toSeq, frames(2).toSeq))
    // Through the Spark explode with the real codec: one row per frame,
    // and EVERY frame is a decodable standalone JPEG.
    val rows = Multimodal
      .explodeFrames(Seq((1L, avi)).toDF("id", "content"), "content", 4,
        Multimodal.AviMjpegCodec)
      .select("frame_idx", "frame").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    rows.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame")))
      assert(img != null && img.getWidth == 32 && img.getHeight == 24)
    }
    // Non-AVI bytes → no frames; truncated container stops cleanly at
    // the last complete frame instead of throwing.
    assert(Multimodal.AviMjpegCodec.sampleFrames("not an avi".getBytes, 3).isEmpty)
    assert(Multimodal.AviMjpegCodec
      .sampleFrames(java.util.Arrays.copyOf(avi, avi.length - 5), 9).length == 3)
  }

  test("GifCodec: REAL multi-frame GIF decode; sampled frames are standalone PNGs") {
    // A genuine 5-frame animated GIF, written by ImageIO's own GIF writer.
    def animatedGif(colors: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { rgb =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00, 0xFF00FF)
    val gif = animatedGif(colors, 16, 12)
    assert(Multimodal.GifCodec.frameCount(gif) == 5)
    // Sampling 3 of 5 picks evenly spaced frames 0, 1, 3.
    val three = Multimodal.GifCodec.sampleFrames(gif, 3)
    assert(three.length == 3)
    // Through the Spark explode: one row per frame, every frame a
    // standalone PNG with the source dims and the EXACT source color
    // (solid frames survive GIF palettization losslessly).
    val rows = Multimodal
      .explodeFrames(Seq((1L, gif)).toDF("id", "content"), "content", 5,
        Multimodal.GifCodec)
      .select("frame_idx", "frame").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3, 4))
    rows.zip(colors).foreach { case (r, rgb) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame")))
      assert(img != null && img.getWidth == 16 && img.getHeight == 12)
      assert((img.getRGB(8, 6) & 0xFFFFFF) == rgb,
        f"frame color 0x${img.getRGB(8, 6) & 0xFFFFFF}%06x != 0x$rgb%06x")
    }
    // withImageMeta composes over the frame column: format png, real dims.
    val meta = Multimodal.withImageMeta(
      Multimodal.explodeFrames(Seq((1L, gif)).toDF("id", "content"), "content", 2,
        Multimodal.GifCodec),
      "frame", codec = Multimodal.ImageIoCodec)
      .select("image_meta.width", "image_meta.height", "image_meta.format")
      .as[(Int, Int, String)].collect().toSet
    assert(meta == Set((16, 12, "png")), meta.toString)
    // Non-GIF bytes and corrupt GIFs degrade to empty, never a throw.
    assert(Multimodal.GifCodec.sampleFrames("GIF89a but not really".getBytes, 3).isEmpty)
    assert(Multimodal.GifCodec.sampleFrames("plain text".getBytes, 3).isEmpty)
    assert(Multimodal.GifCodec.frameCount(null) == 0)
  }

  test("GifComposedCodec: delta frames composite onto the canvas; disposal honored") {
    import javax.imageio.metadata.IIOMetadataNode
    // A genuinely DELTA-ENCODED animation, built by handing ImageIO's GIF
    // writer per-frame metadata: frame 0 = 8x8 red full canvas
    // (doNotDispose), frame 1 = 4x4 blue sub-rectangle at offset (2,2).
    def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      img
    }
    def gifMeta(
        writer: javax.imageio.ImageWriter,
        img: java.awt.image.BufferedImage,
        x: Int, y: Int, disposal: String): javax.imageio.metadata.IIOMetadata = {
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), null)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def child(name: String): IIOMetadataNode = {
        val kids = tree.getElementsByTagName(name)
        if (kids.getLength > 0) kids.item(0).asInstanceOf[IIOMetadataNode]
        else { val n = new IIOMetadataNode(name); tree.appendChild(n); n }
      }
      val desc = child("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", x.toString)
      desc.setAttribute("imageTopPosition", y.toString)
      val gce = child("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      if (gce.getAttribute("delayTime").isEmpty) gce.setAttribute("delayTime", "10")
      if (gce.getAttribute("transparentColorFlag").isEmpty)
        gce.setAttribute("transparentColorFlag", "FALSE")
      if (gce.getAttribute("userInputFlag").isEmpty)
        gce.setAttribute("userInputFlag", "FALSE")
      if (gce.getAttribute("transparentColorIndex").isEmpty)
        gce.setAttribute("transparentColorIndex", "0")
      meta.setFromTree(fmt, tree)
      meta
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val f0 = solid(8, 8, 0xFF0000)
    val f1 = solid(4, 4, 0x0000FF)
    writer.writeToSequence(
      new javax.imageio.IIOImage(f0, null, gifMeta(writer, f0, 0, 0, "doNotDispose")), null)
    writer.writeToSequence(
      new javax.imageio.IIOImage(f1, null, gifMeta(writer, f1, 2, 2, "doNotDispose")), null)
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    val gif = bos.toByteArray

    // Raw codec: frame 1 is the bare 4x4 sub-rectangle (the documented
    // pre-compositing limit).
    val raw = Multimodal.GifCodec.sampleFrames(gif, 2)
    val rawF1 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(raw(1)))
    assert(rawF1.getWidth == 4 && rawF1.getHeight == 4)
    // Composed codec: every frame is the full canvas; frame 1 = red
    // canvas with the blue delta at (2,2).
    val comp = Multimodal.GifComposedCodec.sampleFrames(gif, 2)
    assert(comp.length == 2)
    val c0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(comp(0)))
    val c1 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(comp(1)))
    assert(c0.getWidth == 8 && c0.getHeight == 8)
    assert((c0.getRGB(4, 4) & 0xFFFFFF) == 0xFF0000, "frame 0 canvas must be red")
    assert(c1.getWidth == 8 && c1.getHeight == 8)
    assert((c1.getRGB(0, 0) & 0xFFFFFF) == 0xFF0000, "outside the delta stays red")
    assert((c1.getRGB(3, 3) & 0xFFFFFF) == 0x0000FF, "delta rectangle lands at its offset")
    assert((c1.getRGB(6, 6) & 0xFFFFFF) == 0xFF0000, "beyond the delta stays red")

    // restoreToBackgroundColor: after the delta frame disposes, the next
    // composited frame shows the cleared (transparent) rectangle, not
    // the stale delta.
    val bos2 = new java.io.ByteArrayOutputStream()
    val ios2 = javax.imageio.ImageIO.createImageOutputStream(bos2)
    val writer2 = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    writer2.setOutput(ios2)
    writer2.prepareWriteSequence(null)
    val g1 = solid(4, 4, 0x00FF00)
    val tiny = solid(2, 2, 0xFFFF00)
    writer2.writeToSequence(
      new javax.imageio.IIOImage(g1, null, gifMeta(writer2, g1, 0, 0, "doNotDispose")), null)
    writer2.writeToSequence(
      new javax.imageio.IIOImage(tiny, null, gifMeta(writer2, tiny, 1, 1, "restoreToBackgroundColor")), null)
    writer2.writeToSequence(
      new javax.imageio.IIOImage(tiny, null, gifMeta(writer2, tiny, 2, 2, "doNotDispose")), null)
    writer2.endWriteSequence()
    ios2.close(); writer2.dispose()
    val frames2 = Multimodal.GifComposedCodec.sampleFrames(bos2.toByteArray, 3)
    val d2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames2(2)))
    // (1,1) was the disposed delta's top-left: cleared to transparent
    // (alpha 0), NOT still yellow; (2,2) is the new delta.
    assert((d2.getRGB(1, 1) >>> 24) == 0, "disposed rect must clear to transparent")
    assert((d2.getRGB(2, 2) & 0xFFFFFF) == 0xFFFF00, "new delta lands after disposal")
    // Degradation contract matches the raw codec.
    assert(Multimodal.GifComposedCodec.sampleFrames("plain text".getBytes, 3).isEmpty)
    assert(Multimodal.GifComposedCodec.frameCount(null) == 0)
  }

  test("PerceptualHash.dHash64: stable, edit-tolerant, content-sensitive; kernel column path") {
    import org.apache.spark.sql.functions._
    // Deterministic gradient image + variants, encoded as real PNGs.
    def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gradient(seed: Int)(x: Int, y: Int): Int = {
      val v = (x * 7 + y * 3) % 256
      (v << 16) | (v << 8) | ((v + seed) % 256)
    }
    val base = png(64, 48)(gradient(0))
    val nearDup = png(64, 48) { (x, y) =>
      // Small blue-channel perturbation in one corner — a "minor edit".
      if (x < 6 && y < 6) gradient(5)(x, y) else gradient(0)(x, y)
    }
    val different = png(64, 48) { (x, y) =>
      val v = ((x * 131) ^ (y * 197)) % 256  // high-frequency noise
      (v << 16) | (((255 - v) & 0xff) << 8) | ((v * 3) % 256)
    }
    val h1 = Multimodal.PerceptualHash.dHash64(base).get
    val h2 = Multimodal.PerceptualHash.dHash64(nearDup).get
    val h3 = Multimodal.PerceptualHash.dHash64(different).get
    assert(Multimodal.PerceptualHash.dHash64(base).get == h1, "same bytes, same hash")
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2) <= 8, s"near-dup must stay within a few bits: ${ham(h1, h2)}")
    assert(ham(h1, h3) >= 16, s"distinct content must diverge: ${ham(h1, h3)}")
    // Column/kernel path: identical to the driver-side call; nulls for
    // undecodable bytes; a banded self-join finds the near-dup pair.
    val df = Seq((1L, base), (2L, nearDup), (3L, different),
      (4L, "not an image".getBytes("UTF-8"))).toDF("id", "bytes")
      .withColumn("dh", graft.functions.GraftFunctions.imageDHash($"bytes"))
    val got = df.select("id", "dh").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(h1) && got(2L).contains(h2) && got(3L).contains(h3))
    assert(got(4L).isEmpty, "non-image bytes must be null, not a crash")
    // 4 bands of 16 bits: near-dups (<= 8 bits apart) share >= 1 band
    // by pigeonhole at threshold 3 per band - the SimHash64 banding rule.
    val banded = df.filter($"dh".isNotNull).select($"id", $"dh",
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright($"dh", b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
    val pairs = banded.as("l").join(banded.as("r"),
        $"l.bk" === $"r.bk" && $"l.id" < $"r.id")
      .select($"l.id", $"r.id").distinct().as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "banding must surface the near-dup pair")
    assert(!pairs.contains((1L, 3L)), "noise image must not collide on any band")
  }
}
