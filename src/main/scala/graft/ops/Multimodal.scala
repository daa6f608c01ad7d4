package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline: media
  * travels as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs batched per partition.
  *
  * Image decode is REAL: `javax.imageio` (JDK built-in, zero extra
  * dependencies) decodes PNG/JPEG/BMP/GIF payloads to true pixel
  * dimensions. Non-image payloads (audio/video stand-ins with no JDK
  * codec) fall back to deterministic byte-level metadata, clearly
  * dispatched on the mime type.
  *
  * Scale notes: `mapPartitions` keeps per-record decode off the driver
  * and amortizes decoder init per partition (the reason real pipelines
  * use partition-batched UDFs); binary payloads stay columnar in
  * Tungsten rows until the decode boundary.
  */
object Multimodal {

  /** Fan the fixture-synthesis input out to the session's full
    * parallelism BEFORE the per-row codec work (guide §2.5 "one huge
    * unsplittable file … repartition immediately after the read"): the
    * bench testdata is a single parquet row group, so without this every
    * attach* synthesis — and every decode stage downstream of it, since
    * decode inherits attach's partitioning — runs in ONE task while 31
    * cores idle. Keyed (deterministic under retry, unlike round-robin)
    * on the id column; the shuffled rows are the narrow pre-synthesis
    * projection (ids, never media bytes). N derives from the runtime
    * (`defaultParallelism` follows SPARK_GRAFT_CPUS / the cluster), not
    * a constant; explicit N keeps AQE from coalescing the tiny fixture
    * exchange back to one partition. */
  private def spreadByKey(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** Media column schema: opaque bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = false),
    StructField("source_id", LongType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("source_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Attach a deterministic opaque media column to documents (text bytes
    * standing in for an undecodable payload — exercises the non-image
    * fallback path). */
  def attachMedia(docs: DataFrame): DataFrame =
    spreadByKey(docs.select(col("doc_id"), col("text")), "doc_id").select(
      struct(
        col("text").cast(BinaryType).as("bytes"),
        lit("application/octet-stream").as("mime"),
        col("doc_id").as("source_id")).as("media"))

  /** Attach real PNG payloads: a deterministic synthetic image per doc,
    * generated executor-side (partition-batched — the encoder is the
    * same `javax.imageio` machinery the decode path exercises). */
  def attachImages(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(StructField("media", mediaSchema))))
    spreadByKey(docs.select(col("doc_id")), "doc_id")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(Row(ImageCodec.syntheticPng(id), "image/png", id))
        }
      }(enc)
  }

  /** JDK-built-in image codec: deterministic synthesis (for fixtures)
    * and real decode. */
  object ImageCodec {
    // ImageIO's default stream cache is a TEMP FILE per encode/decode —
    // at 5 000 images that is 10 000 file creates/deletes of pure
    // overhead (and at 100 TB, an iops storm on executor-local disks).
    // Payloads here are small in-memory buffers; cache in memory.
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic image dimensions for a source id — the golden
      * values tests assert against. */
    def dims(id: Long): (Int, Int) =
      (8 + (id % 32).toInt, 8 + ((id / 3) % 24).toInt)

    /** A real PNG: per-pixel colors from a splitmix-style hash of
      * (id, x, y), so bytes are stable across runs and executors. */
    def syntheticPng(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var z = id * 0x9e3779b97f4a7c15L + x * 0xbf58476d1ce4e5b9L + y * 0x94d049bb133111ebL
          z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L; z ^= z >>> 27
          img.setRGB(x, y, (z & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    private def checksum(bytes: Array[Byte]): Long = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum = (sum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
      sum
    }

    /** Average-hash (aHash — the classic published perceptual hash):
      * the image is box-averaged onto an 8×8 luminance grid and bit i
      * is 1 iff cell i is brighter than the grid mean. ALL-INTEGER
      * arithmetic (BT.601 luma in parts-per-mille, integer cell
      * boundaries `i·w div 8`) so the hash is bit-identical on any JVM/
      * platform — no float resize, no rounding-mode dependence.
      * Near-duplicate images (re-encodes, small edits, light resizes)
      * land within a few bits of hamming distance.
      */
    def averageHash(img: java.awt.image.BufferedImage): Long = {
      val (w, h) = (img.getWidth, img.getHeight)
      require(w >= 8 && h >= 8, s"averageHash needs >= 8x8 pixels, got ${w}x$h")
      val cells = new Array[Long](64)
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          val (x0, x1) = (cx * w / 8, (cx + 1) * w / 8)
          val (y0, y1) = (cy * h / 8, (cy + 1) * h / 8)
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          cells(cy * 8 + cx) = sum / ((x1 - x0).toLong * (y1 - y0))
          cx += 1
        }
        cy += 1
      }
      val mean = cells.sum / 64
      var hash = 0L
      var i = 0
      while (i < 64) { if (cells(i) > mean) hash |= (1L << i); i += 1 }
      hash
    }

    /** Feature row per payload. Image mimes decode for real; anything
      * else yields byte-level metadata with sentinel dimensions (-1). */
    def decode(bytes: Array[Byte], mime: String, sourceId: Long): Row = mime match {
      case "image/png" | "image/jpeg" | "image/bmp" | "image/gif" =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
        require(img != null, s"undecodable $mime payload for source $sourceId")
        Row(sourceId, mime, bytes.length, checksum(bytes), img.getWidth, img.getHeight)
      case _ =>
        Row(sourceId, mime, bytes.length, checksum(bytes), -1, -1)
    }
  }

  /** Partition-batched feature extraction over the media column. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        // decoder init (ImageIO scanner registry) amortizes per partition
        rows.map { r =>
          ImageCodec.decode(r.getAs[Array[Byte]](0), r.getString(1), r.getLong(2))
        }
      }(enc)
  }

  /** Perceptual hash per image payload: REAL decode → integer aHash.
    * Output (source_id, ahash); non-image mimes fail loudly (hash of
    * undecoded bytes would silently be a byte hash, not perceptual). */
  def imageHashes(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("source_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false))))
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val mime = r.getString(1)
          require(mime.startsWith("image/"),
            s"imageHashes: non-image mime $mime for source ${r.getLong(2)}")
          val img = javax.imageio.ImageIO.read(
            new ByteArrayInputStream(r.getAs[Array[Byte]](0)))
          require(img != null, s"undecodable $mime payload for source ${r.getLong(2)}")
          Row(r.getLong(2), ImageCodec.averageHash(img))
        }
      }(enc)
  }

  /** Near-duplicate images by perceptual hash: pairs within
    * `maxHamming` bits of aHash distance. Candidates come from
    * PIGEONHOLE banding — the 64-bit hash splits into maxHamming+1
    * bands, and two hashes within the bound must agree on at least one
    * whole band — an equi-join on (band index, band bits), never
    * all-pairs; the verify is an exact `bit_count(xor)`. The same
    * banding logic as MinHash-LSH, with recall GUARANTEED (pigeonhole,
    * not probabilistic) for pairs whose bands survive the df-cap
    * (`dfCap = 0` opts out of the cap for unbounded exact recall).
    */
  def imageNearDups(media: DataFrame, maxHamming: Int = 3,
                    dfCap: Int = Dedup.DefaultDfCap): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 15,
      s"imageNearDups: maxHamming=$maxHamming out of [1,15]")
    val nBands = maxHamming + 1
    // pin the hashes: both join sides (and the cap aggregate) consume
    // them, and the real ImageIO decode behind them must not run once
    // per consumer
    val hashes = imageHashes(media).localCheckpoint(true)
    val allBands = hashes.select(col("source_id"), col("ahash"),
      posexplode(expr(
        s"""transform(sequence(0, ${nBands - 1}), i -> CASE
           |  WHEN (i + 1) * 64 div $nBands - i * 64 div $nBands = 64 THEN ahash
           |  ELSE shiftright(ahash, i * 64 div $nBands) &
           |    (shiftleft(1L, (i + 1) * 64 div $nBands - i * 64 div $nBands) - 1)
           |  END)""".stripMargin)).as(Seq("band_i", "band")))
    // flat-image hot bands (everything hashing near 0x0/0xff…f) fan out
    // quadratically on one key — excise past the cap, the shingle
    // family's df posture; recall stays guaranteed for surviving bands
    val bands =
      if (dfCap <= 0) allBands
      else allBands.join(
        allBands.groupBy(col("band_i"), col("band"))
          .agg(count(lit(1)).as("__df")).filter(col("__df") > dfCap)
          .select(col("band_i"), col("band")),
        Seq("band_i", "band"), "left_anti")
    bands.as("a").join(bands.as("b"),
        col("a.band_i") === col("b.band_i") && col("a.band") === col("b.band") &&
          col("a.source_id") < col("b.source_id"))
      .select(col("a.source_id").as("id_a"), col("b.source_id").as("id_b"),
        col("a.ahash").as("h_a"), col("b.ahash").as("h_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(h_a ^ h_b) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Fixture companion to [[attachImages]]: the SAME decode path with a
    * single-pixel perturbation and an id offset — the planted near-dup
    * twin an image-dedup demo needs (re-encoded, 1px different →
    * perceptually identical). */
  def perturbImages(media: DataFrame, idOffset: Long): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(StructField("media", mediaSchema))))
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new ByteArrayInputStream(r.getAs[Array[Byte]](0)))
          require(img != null,
            s"perturbImages: undecodable payload for source ${r.getLong(2)}")
          img.setRGB(0, 0, img.getRGB(0, 0) ^ 0x0f0f0f)
          val bos = new ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(Row(bos.toByteArray, "image/png", r.getLong(2) + idOffset))
        }
      }(enc)
  }

  /** JDK-built-in audio codec (`javax.sound.sampled` — WAV/AIFF ship
    * with the JDK): deterministic PCM synthesis for fixtures and REAL
    * header+frame decode. The audio twin of [[ImageCodec]]. */
  object AudioCodec {
    /** Golden values per source id: 8 kHz mono 16-bit PCM,
      * 100 + id % 400 frames. */
    def frames(id: Long): Int = 100 + (id % 400).toInt
    val SampleRate = 8000f

    // The AudioSystem entry points walk the provider registry on EVERY
    // call through a SYNCHRONIZED JDK13Services.getProviders — jstack-
    // sampled as the hottest frame once the audio operators ran on all
    // lanes (a 32-thread lock convoy: ~47 s of task time for work one
    // thread did in ~1 s). Resolve the SPI providers ONCE per JVM via
    // the public javax.sound.sampled.spi ServiceLoader surface and call
    // them directly — same providers, same parsers, same bytes; only
    // the per-call registry walk is gone (guide §4.5: initialise
    // heavyweight state once, not per row).
    import scala.jdk.CollectionConverters._
    private[Multimodal] lazy val audioReaders = {
      val rs = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala.toList
      // stable partition: the soft-synth MIDI reader probes by calling
      // MidiSystem.getSequence — ANOTHER per-call synchronized registry
      // walk plus an exception throw for every non-MIDI payload
      // (jstack-sampled as the residual hot frame) — so the cheap
      // header-sniffing container readers (wave/au/aiff) go first. The
      // accepted-format sets are disjoint across JDK readers, so trying
      // order changes which REJECTIONS happen, never the outcome.
      val (midi, rest) = rs.partition(_.getClass.getName.contains("Midi"))
      rest ++ midi
    }
    private lazy val audioWriters =
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .iterator().asScala.toList

    /** AudioSystem.getAudioInputStream semantics over the cached
      * provider list: first reader that accepts the stream wins. */
    private[Multimodal] def readAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      val it = audioReaders.iterator
      while (it.hasNext) {
        val r = it.next()
        try return r.getAudioInputStream(new ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException(
        "Stream of unsupported format")
    }

    /** AudioSystem.write semantics for WAVE over the cached writers. */
    private def writeWave(ais: javax.sound.sampled.AudioInputStream,
                          out: java.io.OutputStream): Unit = {
      val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
      audioWriters.find(_.isFileTypeSupported(t, ais)) match {
        case Some(w) => w.write(ais, t, out)
        case None => throw new IllegalArgumentException(
          "could not write audio file: file type not supported: WAVE")
      }
    }

    /** A real RIFF/WAV byte payload: xorshifted deterministic samples. */
    def syntheticWav(id: Long): Array[Byte] = {
      val n = frames(id)
      val samples = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        var z = id * 0x9e3779b97f4a7c15L + i * 0xbf58476d1ce4e5b9L
        z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L; z ^= z >>> 27
        samples(2 * i) = (z & 0xff).toByte
        samples(2 * i + 1) = ((z >>> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(samples), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      writeWave(ais, bos)
      bos.toByteArray
    }

    /** Quiet variant for exact-gain experiments: samples confined to
      * 12 bits (±2048) then multiplied by an integer gain ≤ 8 — never
      * clips, so a gain-g copy is SAMPLE-EXACTLY g× the base. */
    def syntheticWavQuiet(id: Long, gain: Int): Array[Byte] = {
      val n = frames(id)
      val samples = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        var z = id * 0x9e3779b97f4a7c15L + i * 0xbf58476d1ce4e5b9L
        z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L; z ^= z >>> 27
        val s = (((z & 0xfff) - 2048).toInt * gain).toShort
        samples(2 * i) = (s & 0xff).toByte
        samples(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(samples), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      writeWave(ais, bos)
      bos.toByteArray
    }

    /** Real decode: container header + frame count from the JDK parser.
      * Echoes the INPUT mime — decode accepts WAV and AIFF, and
      * relabeling an AIFF row as wav would lie to mime-keyed consumers. */
    def decode(bytes: Array[Byte], mime: String, sourceId: Long): Row = {
      val ais = readAudio(bytes)
      val f = ais.getFormat
      Row(sourceId, mime, bytes.length,
        f.getSampleRate.toInt, f.getChannels, ais.getFrameLength)
    }
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("source_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Acoustic fingerprint — the audio member of the perceptual-dedup
    * family (image aHash / video keyframe hashes): per 4-sample window
    * the integer energy `Σ s²`, fingerprint bit i = `energy(i) >
    * energy(i+1)` (up to 64 deltas). Comparing ADJACENT energies makes
    * the print GAIN-INVARIANT — an exactly-scaled copy (remaster at a
    * different level) scales every energy by the same factor and flips
    * no bit; real-world re-encodes are near-exact (truncation can flip
    * a bit only where adjacent energies nearly tie, the standard
    * fingerprint robustness caveat). Dedup = equality on
    * (n_windows, fingerprint) — a plain groupBy, no pairwise stage.
    */
  object AudioFingerprint {
    // 4-sample windows: short fixtures (100-500 frames) still yield
    // 24-64 delta bits — a 16-sample window would leave single-digit
    // bits and a degenerate fingerprint space on clips this short
    val WindowSamples = 4

    /** (fingerprint, n_windows) from 16-bit LE mono PCM inside a
      * WAV/AIFF container (real JDK decode). */
    def fingerprint(bytes: Array[Byte]): (Long, Int) = {
      val ais = AudioCodec.readAudio(bytes)
      val pcm = ais.readAllBytes()
      val bigEndian = ais.getFormat.isBigEndian
      val n = pcm.length / 2
      val nw = n / WindowSamples
      val energies = new Array[Long](nw)
      var w = 0
      while (w < nw) {
        var e = 0L
        var i = 0
        while (i < WindowSamples) {
          val off = (w * WindowSamples + i) * 2
          val s =
            if (bigEndian) ((pcm(off) << 8) | (pcm(off + 1) & 0xff)).toShort
            else ((pcm(off + 1) << 8) | (pcm(off) & 0xff)).toShort
          e += s.toLong * s.toLong
          i += 1
        }
        energies(w) = e
        w += 1
      }
      var fp = 0L
      var i = 0
      val bits = math.min(nw - 1, 64)
      while (i < bits) {
        if (energies(i) > energies(i + 1)) fp |= 1L << (i % 64)
        i += 1
      }
      (fp, nw)
    }
  }

  val audioFpSchema: StructType = StructType(Seq(
    StructField("source_id", LongType, nullable = false),
    StructField("n_windows", IntegerType, nullable = false),
    StructField("fingerprint", LongType, nullable = false)))

  /** Per-payload acoustic fingerprints (executor-side real decode). */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFpSchema)
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (bytes, mime, id) = (r.getAs[Array[Byte]](0), r.getString(1), r.getLong(2))
          if (mime == "audio/wav" || mime == "audio/aiff") {
            val (fp, nw) = AudioFingerprint.fingerprint(bytes)
            Some(Row(id, nw, fp))
          } else None
        }
      }(enc)
  }

  /** Acoustic near-dup pairs: equality on (n_windows, fingerprint) —
    * one groupBy-sized shuffle, keep-lowest pairing like the image
    * family. */
  def audioNearDups(media: DataFrame): DataFrame = {
    // pin: both self-join sides (and AQE's size probe) consume the
    // fingerprints — unpinned, the WAV decode+fingerprint pass behind
    // them ran three times (profiled: 3 × ~31 s of task time at sf0.1);
    // the same stance as videoNearDups/imageNearDups
    val fps = audioFingerprints(media).localCheckpoint(true)
    fps.as("a").join(fps.as("b"),
        col("a.n_windows") === col("b.n_windows") &&
          col("a.fingerprint") === col("b.fingerprint") &&
          col("a.source_id") < col("b.source_id"))
      .select(col("a.source_id").as("id_a"), col("b.source_id").as("id_b"),
        col("a.n_windows").as("n_windows"), col("a.fingerprint").as("fingerprint"))
  }

  /** Gain-scaled twin corpus for the fingerprint specs/query: quiet
    * 12-bit samples multiplied by an EXACT integer gain — energies
    * scale by gain² uniformly, so the fingerprint is provably
    * identical while the bytes differ. */
  def attachAudioGain(docs: DataFrame, gain: Int, idOffset: Long): DataFrame = {
    require(gain >= 1 && gain <= 8, s"gain $gain would clip 12-bit samples")
    val enc = RowEncoder.encoderFor(StructType(Seq(StructField("media", mediaSchema))))
    spreadByKey(docs.select(col("doc_id")), "doc_id")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(Row(AudioCodec.syntheticWavQuiet(id, gain), "audio/wav", id + idOffset))
        }
      }(enc)
  }

  /** Attach real WAV payloads (deterministic synthesis, executor-side). */
  def attachAudio(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(StructField("media", mediaSchema))))
    spreadByKey(docs.select(col("doc_id")), "doc_id")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(Row(AudioCodec.syntheticWav(id), "audio/wav", id))
        }
      }(enc)
  }

  /** Partition-batched REAL audio feature extraction: sample rate,
    * channel count, and frame length parsed from the container by the
    * JDK (`javax.sound.sampled`) — the audio modality is decode-real
    * like images, not a byte-metadata stub. Non-audio mimes get
    * sentinel values. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (bytes, mime, id) = (r.getAs[Array[Byte]](0), r.getString(1), r.getLong(2))
          if (mime == "audio/wav" || mime == "audio/aiff")
            AudioCodec.decode(bytes, mime, id)
          else Row(id, mime, bytes.length, -1, -1, -1L)
        }
      }(enc)
  }

  /** Partition-batched image RESIZE: decode → `Graphics2D` bilinear
    * scale to a bounding box (aspect preserved, never upscaled) →
    * re-encode PNG. The standard vision-model preprocessing step, JDK
    * machinery only; non-image mimes pass through untouched (bytes and
    * sentinel -1 dims). Same scale posture as [[decodeFeatures]]: the
    * work is per-row CPU on the executors, zero shuffle, memory-cached
    * streams.
    */
  val resizedSchema: StructType = StructType(Seq(
    StructField("source_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bytes", BinaryType, nullable = true)))

  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0, s"resize box must be positive: ${maxW}x$maxH")
    val enc = RowEncoder.encoderFor(resizedSchema)
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (bytes, mime, id) = (r.getAs[Array[Byte]](0), r.getString(1), r.getLong(2))
          mime match {
            case "image/png" | "image/jpeg" | "image/bmp" | "image/gif" =>
              val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
              require(img != null, s"undecodable $mime payload for source $id")
              // fit inside the box, preserve aspect, never upscale
              val scale = math.min(1.0,
                math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
              val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
                math.max(1, (img.getHeight * scale).toInt))
              val out = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              val bos = new ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Row(id, "image/png", w, h, bos.toByteArray)
            case other => Row(id, other, -1, -1, bytes)
          }
        }
      }(enc)
  }

  /** Length-prefixed frame container for the video modality: `GVID` +
    * frame count + per-frame `[len][png bytes]`. The JDK ships no mp4
    * demuxer, so the CONTAINER is a fixture format (clearly labeled);
    * the demultiplex and the per-frame `ImageIO` decode are real — the
    * same partition-batched shape an mp4 pipeline would run with a
    * codec library on the classpath. */
  object VideoCodec {
    val Magic = 0x47564944 // "GVID"
    def frameCount(id: Long): Int = 4 + (id % 6).toInt

    def syntheticVideo(id: Long): Array[Byte] =
      encode((0 until frameCount(id)).map(f => ImageCodec.syntheticPng(id * 131 + f)))

    /** Mux: frames back into a container (demux's inverse). */
    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(Magic); out.writeInt(frames.length)
      frames.foreach { png => out.writeInt(png.length); out.write(png) }
      out.flush()
      bos.toByteArray
    }

    /** Demux: the container's frames, in order. */
    def demux(bytes: Array[Byte]): Seq[Array[Byte]] = {
      val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
      require(in.readInt() == Magic, "not a GVID container")
      val n = in.readInt()
      (0 until n).map { _ =>
        val len = in.readInt()
        val frame = new Array[Byte](len)
        in.readFully(frame)
        frame
      }
    }
  }

  def attachVideo(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(StructField("media", mediaSchema))))
    spreadByKey(docs.select(col("doc_id")), "doc_id")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(Row(VideoCodec.syntheticVideo(id), "video/x-graft-frames", id))
        }
      }(enc)
  }

  val keyFrameSchema: StructType = StructType(Seq(
    StructField("source_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frame_bytes", IntegerType, nullable = false)))

  /** Key-frame extraction: demux the container, keep every `stride`-th
    * frame, REAL-decode each kept frame's pixel dimensions. Skipped
    * frames are never decoded (the whole point of key-frame sampling at
    * scale — decode cost follows the sample rate, not the footage).
    * One flatMap per partition, zero shuffle. */
  def videoKeyFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val enc = RowEncoder.encoderFor(keyFrameSchema)
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (bytes, mime, id) = (r.getAs[Array[Byte]](0), r.getString(1), r.getLong(2))
          if (mime != "video/x-graft-frames") Iterator.empty
          else VideoCodec.demux(bytes).zipWithIndex.iterator.collect {
            case (frame, f) if f % stride == 0 =>
              val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(frame))
              require(img != null, s"undecodable frame $f of source $id")
              Row(id, f, img.getWidth, img.getHeight, frame.length)
          }
        }
      }(enc)
  }

  /** Per-keyframe perceptual hashes: demux, keep every `stride`-th
    * frame, REAL-decode it, aHash it. The video analog of
    * [[imageHashes]] — (source_id, frame_no, ahash), skipped frames
    * never decoded, zero shuffle. */
  def videoFrameHashes(media: DataFrame, stride: Int = 2): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("source_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("ahash", LongType, nullable = false))))
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (bytes, mime, id) = (r.getAs[Array[Byte]](0), r.getString(1), r.getLong(2))
          require(mime == "video/x-graft-frames",
            s"videoFrameHashes: non-video mime $mime for source $id")
          VideoCodec.demux(bytes).zipWithIndex.iterator.collect {
            case (frame, f) if f % stride == 0 =>
              val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(frame))
              require(img != null, s"undecodable frame $f of source $id")
              Row(id, f, ImageCodec.averageHash(img))
          }
        }
      }(enc)
  }

  /** Near-duplicate VIDEOS by shared keyframe perceptual hashes — the
    * standard video-dedup recipe (re-encodes, trims, and container
    * repacks of the same footage share most keyframe hashes; different
    * footage shares none). Candidates come from an equi-join on the
    * exact aHash (a 64-bit match is already a near-identical frame;
    * per-frame hamming tolerance belongs in [[imageNearDups]]), so the
    * join key is bounded and never all-pairs; hot hashes (test cards,
    * black frames — every corpus has them) are df-capped out like the
    * shingle family. Output per pair: distinct shared hashes and each
    * side's distinct-hash count, so both Jaccard and containment
    * (trimmed-copy) judgments read straight off the row.
    */
  def videoNearDups(media: DataFrame, stride: Int = 2, minShared: Int = 2,
                    dfCap: Int = Dedup.DefaultDfCap): DataFrame = {
    require(minShared >= 1, s"videoNearDups: minShared=$minShared must be >= 1")
    // pin: the decode behind the hashes must not run once per consumer
    val hashes = videoFrameHashes(media, stride)
      .select(col("source_id"), col("ahash")).distinct()
      .localCheckpoint(true)
    val capped =
      if (dfCap <= 0) hashes
      else hashes.join(
        hashes.groupBy(col("ahash")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") > dfCap).select(col("ahash")),
        Seq("ahash"), "left_anti")
    // family convention (cappedShingles → thresholdedPairs): the
    // denominators come from the SAME capped universe as n_shared, so
    // the Jaccard/containment ratios stay unbiased when hot hashes are
    // excised
    val counts = capped.groupBy(col("source_id"))
      .agg(count(lit(1)).as("n_frames"))
    capped.as("a").join(capped.as("b"),
        col("a.ahash") === col("b.ahash") &&
          col("a.source_id") < col("b.source_id"))
      .groupBy(col("a.source_id").as("id_a"), col("b.source_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      // counts is corpus-sized (one row per video) — never broadcast
      // it; the post-filter pair table is the small side, AQE
      // broadcasts that at runtime
      .join(counts.withColumnRenamed("source_id", "id_a")
        .withColumnRenamed("n_frames", "n_a"), "id_a")
      .join(counts.withColumnRenamed("source_id", "id_b")
        .withColumnRenamed("n_frames", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"), col("n_b"))
  }

  /** Fixture companion to [[attachVideo]]: the same container minus its
    * LAST frame, under an offset id — the planted trimmed-copy twin a
    * video-dedup demo needs (shares every surviving keyframe hash). */
  def perturbVideos(media: DataFrame, idOffset: Long): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(StructField("media", mediaSchema))))
    media.select(col("media.bytes"), col("media.mime"), col("media.source_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val frames = VideoCodec.demux(r.getAs[Array[Byte]](0))
          Row(Row(VideoCodec.encode(frames.dropRight(1)),
            r.getString(1), r.getLong(2) + idOffset))
        }
      }(enc)
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * fixed-size frames, keep every `stride`-th — pure columnar ops, no
    * UDF, demonstrating explode-based fan-out that scales with input
    * splits. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media
      .select(col("media.source_id").as("source_id"),
        expr(s"transform(sequence(0, (octet_length(media.bytes) - 1) div $frameBytes), " +
          s"i -> named_struct('frame_no', i, 'frame', substring(media.bytes, i * $frameBytes + 1, $frameBytes)))")
          .as("frames"))
      .select(col("source_id"), explode(col("frames")).as("f"))
      .select(col("source_id"), col("f.frame_no").cast(IntegerType).as("frame_no"),
        col("f.frame").as("frame"))
      .filter(pmod(col("frame_no"), lit(stride)) === 0)
}
