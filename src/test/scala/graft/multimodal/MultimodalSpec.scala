package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val df = Seq((1L, "hello"), (2L, "")).toDF("id", "payload")
    Multimodal.asMedia(df, "id", "payload", "text/plain")
  }

  test("asMedia produces the canonical media schema") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "data", "meta"))
    assert(media.schema("data").dataType.typeName == "binary")
    val m = media.orderBy("media_id").collect()(0)
    assert(new String(m.getAs[Array[Byte]]("data")) == "hello")
    assert(m.getStruct(2).getAs[String]("format") == "text/plain")
  }

  test("byteStats: length and content hash without decoding") {
    val out = Multimodal.byteStats(media).orderBy("media_id")
      .select("n_bytes").as[Long].collect()
    assert(out.toSeq == Seq(5L, 0L))
  }

  import MultimodalSpec.fnvFixtureCodec

  test("decodeBatched: batch iterator shape with a pluggable codec") {
    val many = Multimodal.asMedia(
      (1L to 100L).map(i => (i, s"payload-$i")).toDF("id", "payload"),
      "id", "payload", "text/plain")
    // custom codec records batch sizes via the feature value
    val out = Multimodal.decodeBatched(many, dim = 2, batchSize = 16,
      decode = batch => batch.map(b => Array(b.length.toFloat, batch.length.toFloat)))
      .orderBy("media_id").as[(Long, Seq[Float])].collect()
    assert(out.length == 100)
    assert(out.forall { case (_, f) => f.length == 2 })
    // batches are bounded by batchSize (per-partition remainder batches allowed)
    assert(out.forall { case (_, f) => f(1) <= 16.0f })
    // the codec-less (audio/video) seam: a hash fixture codec plugs in and
    // is deterministic across runs
    val a = Multimodal.decodeBatched(many, dim = 4, decode = fnvFixtureCodec(4))
      .orderBy("media_id").as[(Long, Seq[Float])].collect()
    val b = Multimodal.decodeBatched(many, dim = 4, decode = fnvFixtureCodec(4))
      .orderBy("media_id").as[(Long, Seq[Float])].collect()
    assert(a.toSeq == b.toSeq)
    assert(a(0)._2 != a(1)._2) // different payloads -> different features
  }

  test("decodeBatched default codec is the REAL image decoder") {
    // 6x4 two-band PNG: means are closed-form band averages; features are
    // [w, h, mean_r, mean_g, mean_b] zero-padded to dim
    val bytes = Multimodal.encodeTwoBandPng(6, 4, (10, 20, 30), (50, 60, 70))
    val m = Multimodal.asMedia(Seq((7L, bytes)).toDF("id", "png"), "id", "png", "image/png")
    val (id, f) = Multimodal.decodeBatched(m, dim = 6, batchSize = 4)
      .as[(Long, Seq[Float])].collect()(0)
    assert(id == 7L)
    assert(f == Seq(6f, 4f, 30f, 40f, 50f, 0f))
    // non-image payloads fail loudly under the default codec
    intercept[Exception] {
      Multimodal.decodeBatched(media, dim = 5).collect()
    }
    // dim must fit the real feature head
    intercept[Exception] {
      Multimodal.decodeBatched(m, dim = 4).collect()
    }
  }

  test("stubResize rewrites dimensions and re-emits a payload, schema intact") {
    val out = Multimodal.stubResize(media, 224, 224)
    assert(out.schema == media.schema)
    val m = out.orderBy("media_id").collect()(0)
    assert(m.getStruct(2).getAs[Int]("width") == 224)
    assert(m.getStruct(2).getAs[Int]("height") == 224)
    assert(m.getAs[Array[Byte]]("data").nonEmpty)
    // deterministic and input-dependent
    val again = Multimodal.stubResize(media, 224, 224).orderBy("media_id").collect()(0)
    assert(java.util.Arrays.equals(m.getAs[Array[Byte]]("data"), again.getAs[Array[Byte]]("data")))
  }

  test("real PNG round-trip: encode, decode stats, dimensions + exact means") {
    // 6x4 two-band: top 2 rows (10,20,30), bottom 2 rows (50,60,70) —
    // decoded means are the closed-form band averages
    val bytes = Multimodal.encodeTwoBandPng(6, 4, (10, 20, 30), (50, 60, 70))
    val df = Seq((7L, bytes)).toDF("id", "png")
    val m = Multimodal.asMedia(df, "id", "png", "image/png")
    val out = Multimodal.decodeImageStats(m).collect()(0)
    assert((out.getInt(1), out.getInt(2)) == (6, 4))
    assert(out.getDouble(3) == 30.0 && out.getDouble(4) == 40.0 &&
      out.getDouble(5) == 50.0)
    // undecodable payloads fail loudly with the media id, never skew stats
    val junk = Multimodal.asMedia(Seq((9L, "not an image")).toDF("id", "t"),
      "id", "t", "image/png")
    val e = intercept[Exception] {
      Multimodal.decodeImageStats(junk).collect()
    }
    assert(e.getMessage.contains("media_id=9") ||
      e.getCause != null && e.getCause.getMessage.contains("media_id=9"))
  }

  test("resizeImages scales payloads for real: re-decode confirms geometry") {
    // solid color (both bands equal) so bilinear resampling cannot change
    // the channel means — geometry changes, means are invariant
    val bytes = Multimodal.encodeTwoBandPng(8, 8, (100, 150, 200), (100, 150, 200))
    val m = Multimodal.asMedia(Seq((3L, bytes)).toDF("id", "png"),
      "id", "png", "image/png")
    val resized = Multimodal.resizeImages(m, 4, 2)
    val meta = resized.collect()(0).getStruct(2)
    assert(meta.getAs[Int]("width") == 4 && meta.getAs[Int]("height") == 2)
    val stats = Multimodal.decodeImageStats(resized).collect()(0)
    assert((stats.getInt(1), stats.getInt(2)) == (4, 2))
    assert(stats.getDouble(3) == 100.0 && stats.getDouble(4) == 150.0 &&
      stats.getDouble(5) == 200.0)
  }

  test("averageHash + ahashNearDups: closed-form bits, full recall at the threshold") {
    // 8×8 two-band images: top 4 sample rows read band 1, bottom 4 band 2.
    // Brighter band ⇒ its rows' gray beats the mean ⇒ bits set there.
    def png(c1: (Int, Int, Int), c2: (Int, Int, Int)) =
      Multimodal.encodeTwoBandPng(8, 8, c1, c2)
    val media = Seq(
      (1L, png((200, 200, 200), (10, 10, 10))),  // bright top: bits rows 0-3
      (2L, png((201, 199, 203), (12, 9, 8))),    // same pattern → hamming 0
      (3L, png((10, 10, 10), (200, 200, 200))),  // inverted: hamming 64 vs 1
      (4L, png((50, 50, 50), (50, 50, 50)))      // uniform: gray == mean, all 0
    ).toDF("id", "png")
    val m = Multimodal.asMedia(media, "id", "png", "image/png")
    val hashes = Multimodal.averageHash(m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val low32 = (1L << 32) - 1L   // bits 0-31 = sample rows 0-3
    assert(hashes(1L) == low32 && hashes(2L) == low32)
    assert(hashes(3L) == ~low32) // bottom rows set
    assert(hashes(4L) == 0L)     // strict > never fires on a uniform image
    val pairs = Multimodal.ahashNearDups(m, maxDistance = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs == Map((1L, 2L) -> 0))  // inverted/uniform are 32-64 away
    // distance-32 pairs appear once the threshold admits them (recall is
    // pigeonhole-guaranteed at any threshold, not tuned for small ones)
    val wide = Multimodal.ahashNearDups(m, maxDistance = 32)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(wide((3L, 4L)) == 32 && wide((1L, 4L)) == 32 && !wide.contains((1L, 3L)))
  }

  test("real WAV round-trip: PCM encode, decode stats are sample-exact") {
    val samples = Array[Short](100, -200, 32767, -32768, 0, 5)
    val wav = Multimodal.encodePcm16Wav(44100, samples)
    val m = Multimodal.asMedia(Seq((7L, wav)).toDF("id", "w"), "id", "w", "audio/wav")
    val r = Multimodal.decodeWavStats(m).collect()(0)
    assert(r.getInt(1) == 44100 && r.getInt(2) == 1)       // rate, mono
    assert(r.getLong(3) == 6L)                              // n_samples
    assert(r.getInt(4) == -32768 && r.getInt(5) == 32767)   // min, max
    assert(r.getLong(6) == samples.map(_.toLong).sum)
    assert(r.getLong(7) == samples.map(s => math.abs(s.toLong)).sum)
    // junk bytes fail loudly, not silently
    val junk = Multimodal.asMedia(Seq((8L, "not audio")).toDF("id", "w"),
      "id", "w", "audio/wav")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWavStats(junk).collect()
    }
    // a structurally valid but ZERO-FRAME wav (external payloads aren't
    // bound by the encoder's non-empty rule) fails loudly too, instead of
    // emitting Int.MaxValue/MinValue sentinel stats
    val emptyWav = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array.emptyByteArray), fmt, 0L)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val zero = Multimodal.asMedia(Seq((9L, emptyWav)).toDF("id", "w"),
      "id", "w", "audio/wav")
    val ze = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWavStats(zero).collect()
    }
    assert(ze.getMessage.contains("media_id=9") ||
      Option(ze.getCause).exists(_.getMessage.contains("media_id=9")))
    // a truncated STEREO file — 2 bytes chopped off a 2-frame payload.
    // AudioInputStream floors reads to whole frames, so the torn tail is
    // silently discarded and only 1 of the header's 2 declared frames is
    // readable; the declared-vs-read frame check must fail loudly
    val tornStereo = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
      val pcm = Array[Byte](1, 0, 2, 0, 3, 0, 4, 0) // 2 whole stereo frames
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 2L)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray.dropRight(2)
    }
    val torn = Multimodal.asMedia(Seq((10L, tornStereo)).toDF("id", "w"),
      "id", "w", "audio/wav")
    val te = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWavStats(torn).collect()
    }
    val teMsg = te.getMessage + Option(te.getCause).map(_.getMessage).getOrElse("")
    assert(teMsg.contains("media_id=10") && teMsg.contains("truncated"))
  }

  test("frameOffsets samples every N ms over the recorded duration") {
    val withDur = media.withColumn("meta",
      struct(col("meta.format"), col("meta.width"), col("meta.height"),
        when(col("media_id") === 1L, 2500L).otherwise(0L).as("duration_ms")))
    val out = Multimodal.frameOffsets(withDur, everyMs = 1000L).orderBy("media_id")
      .select("frame_offsets_ms").as[Seq[Long]].collect()
    assert(out(0) == Seq(0L, 1000L, 2000L))
    assert(out(1) == Seq())
  }
}

object MultimodalSpec {
  /** Test-fixture codec (the retired FNV-1a stub): deterministic features
    * from a byte hash — stands in for an audio/video decoder where no JVM
    * codec exists, exercising the pluggable-codec seam. Top-level object
    * so task closures don't capture the (non-serializable) suite. */
  def fnvFixtureCodec(dim: Int)(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map { bytes =>
      var h = 0xcbf29ce484222325L
      bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      Array.tabulate(dim) { i =>
        val z = (h ^ (i * 0x9e3779b97f4a7c15L))
        (((z % 1000L + 1000L) % 1000L).toFloat / 500.0f) - 1.0f
      }
    }
}
