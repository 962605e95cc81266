package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fixture(spark, n = 12)

  test("extractFeatures: fixed dim, deterministic, corrupt rows survive") {
    val out = Multimodal.extractFeatures(spark, media).collect()
    assert(out.length === 12)
    val ok = out.filter(_.decode_ok)
    assert(ok.forall(_.features.length === 32))
    // the deliberately-corrupt blob (empty content) fails but is retained
    val bad = out.filter(!_.decode_ok)
    assert(bad.length === 1)
    assert(bad.head.features.isEmpty)
    // determinism: re-running produces identical features
    val again = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    out.foreach(f => assert(again(f.media_id) === f.features.toSeq))
  }

  test("sampleFrames: only video, correct count and timestamps") {
    val frames = Multimodal.sampleFrames(spark, media, everyMs = 500).collect()
    assert(frames.nonEmpty)
    val vids = media.collect().filter(_.kind == "video")
    val byId = frames.groupBy(_.media_id)
    assert(byId.keySet.subsetOf(vids.map(_.media_id).toSet))
    vids.filter(v => v.content.nonEmpty).foreach { v =>
      val expected = math.max((v.meta.duration_ms / 500).toInt, 1)
      assert(byId(v.media_id).length === expected)
      assert(byId(v.media_id).map(_.ts_ms).toSet ===
        (0 until expected).map(_ * 500L).toSet)
    }
    // distinct frames of the same clip get distinct features (stub varies by index)
    val f0 = byId.values.head.sortBy(_.frame_index)
    if (f0.length > 1) assert(f0(0).features.toSeq !== f0(1).features.toSeq)
  }

  test("resize: aspect-preserving box fit, no upscale, non-images untouched") {
    val out = Multimodal.resizeImages(spark, media, maxW = 32, maxH = 32)
      .collect().map(r => r.media_id -> r).toMap
    val in = media.collect().map(r => r.media_id -> r).toMap
    in.values.foreach { r =>
      val o = out(r.media_id)
      if (r.kind == "image") {
        assert(o.meta.width <= 32 && o.meta.height <= 32)
        // aspect ratio preserved within integer truncation
        val expScale = math.min(math.min(32.0 / r.meta.width, 32.0 / r.meta.height), 1.0)
        assert(o.meta.width === math.max((r.meta.width * expScale).toInt, 1))
        assert(o.meta.height === math.max((r.meta.height * expScale).toInt, 1))
        assert(o.content.toSeq === r.content.toSeq) // stub passes bytes through
      } else {
        assert(o.meta === r.meta)
      }
    }
    // already-small images are not upscaled
    val tiny = Multimodal.resizeImages(spark, media, maxW = 4096, maxH = 4096)
      .collect().map(r => r.media_id -> r.meta).toMap
    in.values.filter(_.kind == "image").foreach { r =>
      assert(tiny(r.media_id) === r.meta)
    }
  }

  test("audioWindows: only audio, window grid, stats in range, corrupt dropped") {
    val media = Multimodal.fixture(spark, 12)
    val out = Multimodal.audioWindows(spark, media, windowMs = 900L).collect()
    // fixture audio ids: 1,4,7,10 (kind = i%3==1); 10 % 7 != 6 so only
    // media6 (video) is corrupt — all four audio clips decode
    assert(out.map(_.media_id).distinct.sorted ===
      Array("media1", "media10", "media4", "media7"))
    out.groupBy(_.media_id).foreach { case (_, ws) =>
      val sorted = ws.sortBy(_.window_index)
      assert(sorted.map(_.window_index).toSeq === sorted.indices)
      sorted.foreach { w =>
        assert(w.start_ms === w.window_index * 900L)
        assert(w.end_ms > w.start_ms)
        assert(w.n_samples === 32)
        assert(w.rms > 0.0 && w.rms <= 2.0)
        assert(w.peak >= w.rms.toFloat) // max |x| ≥ quadratic mean
      }
    }
    // duration 1000*(i+1): media1 → 2000 ms → floor(2000/900) = 2 windows,
    // ragged tail dropped (frame-sampling semantics)
    val m1 = out.filter(_.media_id === "media1").sortBy(_.window_index)
    assert(m1.length === 2)
    assert(m1.last.end_ms === 1800L)
    // sub-window clip: one window, end capped at the clip duration
    import spark.implicits._
    val short = Seq(Multimodal.MediaRow("tiny", "audio", "x".getBytes,
      Multimodal.MediaMeta("audio/wav", 0, 0, 500L, 16000))).toDS()
    val sw = Multimodal.audioWindows(spark, short, windowMs = 900L).collect()
    assert(sw.length === 1 && sw.head.end_ms === 500L)
  }

  test("schema: binary content + typed metadata survive a parquet round-trip") {
    val path = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() === 12)
    val fields = back.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("content") === "binary")
    assert(fields("meta").startsWith("struct"))
  }
}
