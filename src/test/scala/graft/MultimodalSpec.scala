package graft

import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthetic media table: binary payload column + typed metadata") {
    val m = MediaPipeline.syntheticMedia(spark, Sf)
    val schema = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("modality") == "string")
    assert(m.count() > 0)
  }

  test("feature extraction is partition-local, deterministic, and payload-free downstream") {
    val feats = MediaPipeline.extractFeatures(MediaPipeline.syntheticMedia(spark, Sf))
    val r1 = feats.orderBy("media_id").collect()
    val r2 = MediaPipeline.extractFeatures(MediaPipeline.syntheticMedia(spark, Sf))
      .orderBy("media_id").collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    assert(!feats.schema.fieldNames.contains("payload"))
    r1.take(20).foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.byte_entropy > 0.0 && f.byte_entropy <= 8.0)
      assert(f.width >= 64 && f.height >= 64)
      assert(if (f.modality == "image") f.duration_ms == 0 else f.duration_ms > 0)
      assert(f.payload_sha.length == 64)
    }
  }

  test("modality report aggregates the three modalities") {
    val rep = MediaPipeline.modalityReport(
      MediaPipeline.extractFeatures(MediaPipeline.syntheticMedia(spark, Sf)))
    val rows = rep.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("image", "audio", "video"))
    assert(rows.values.sum == MediaPipeline.syntheticMedia(spark, Sf).count())
  }

  test("payload sha matches Spark's sha2 over the same bytes (plumbing consistency)") {
    val m = MediaPipeline.syntheticMedia(spark, Sf).limit(10)
    val viaSql = m.toDF().select(col("media_id"), sha2(col("payload"), 256).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaExtract = MediaPipeline.extractFeatures(m).collect()
      .map(f => f.media_id -> f.payload_sha).toMap
    assert(viaSql == viaExtract)
  }

  test("frame sampling: plan rule exact, frames contiguous and time-monotone, fully deterministic") {
    import graft.multimodal.MediaPipeline
    // the plan rule in isolation: still images are one frame; one
    // frame per started 10 s; the MaxFrames cap binds
    assert(MediaPipeline.framePlan("image", 999999L) == 1)
    assert(MediaPipeline.framePlan("video", 0L) == 1)
    assert(MediaPipeline.framePlan("video", 9999L) == 1)
    assert(MediaPipeline.framePlan("video", 10000L) == 2)
    assert(MediaPipeline.framePlan("audio", 60999L) == 7)
    assert(MediaPipeline.framePlan("video", 10L * 1000L * 1000L)
      == MediaPipeline.MaxFrames)
    val media = MediaPipeline.syntheticMedia(spark, Sf)
    val frames = MediaPipeline.sampleFrames(media).collect()
    val byMedia = frames.groupBy(_.media_id)
    assert(byMedia.nonEmpty)
    byMedia.foreach { case (id, fs) =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.frame_idx).toSeq == (0 until fs.length),
        s"media $id: frame indices must be contiguous from 0")
      val ts = sorted.map(_.frame_ts_ms)
      assert(ts.zip(ts.tail).forall { case (a, b) => a <= b },
        s"media $id: frame timestamps must be non-decreasing")
      assert(sorted.head.frame_ts_ms == 0L,
        s"media $id: the first sampled frame sits at t=0")
      assert(fs.forall(f => f.luma_mean >= 0 && f.luma_mean < 256))
      if (sorted.head.modality == "image")
        assert(fs.length == 1, s"still image $id must be its own single frame")
    }
    // deterministic: a second pass is row-for-row identical
    val again = MediaPipeline.sampleFrames(media).collect()
    assert(frames.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("frame hashes: temporal byte-slices follow the m4 plan, hash the exact slice, and stay deterministic") {
    import graft.multimodal.MediaPipeline
    import graft.multimodal.MediaPipeline.FeatureExtractor
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val img = Array.fill[Byte](333)((rng.nextInt(256) - 128).toByte)
    val vid = Array.fill[Byte](501)((rng.nextInt(256) - 128).toByte)
    val media = Seq(
      MediaPipeline.MediaRecord(1L, "image", img, "spec", img.length.toLong),
      MediaPipeline.MediaRecord(2L, "video", vid, "spec", vid.length.toLong))
    val out = MediaPipeline.frameHashes(media.toDS()).collect()
      .groupBy(_.media_id)
    // a still image is one frame whose hash IS the container hash
    val imgFrames = out(1L).sortBy(_.frame_idx)
    assert(imgFrames.length == 1 && imgFrames.head.n_frames == 1)
    val whole = FeatureExtractor.aHashBands(img)
    assert(Seq(imgFrames.head.f0, imgFrames.head.f1,
      imgFrames.head.f2, imgFrames.head.f3) == whole.toSeq)
    // the video follows the m4 plan capped at the payload length, and
    // each frame hashes EXACTLY its slice [ceil(f*L/nf), ceil((f+1)*L/nf))
    val (_, _, dur) = FeatureExtractor.decodeStub("video", vid)
    val nf = math.max(1, math.min(MediaPipeline.framePlan("video", dur),
      vid.length))
    val vidFrames = out(2L).sortBy(_.frame_idx)
    assert(vidFrames.length == nf && vidFrames.forall(_.n_frames == nf))
    assert(vidFrames.map(_.frame_idx).toSeq == (0 until nf))
    def start(f: Int) = ((f.toLong * vid.length + nf - 1) / nf).toInt
    vidFrames.foreach { fr =>
      val exp = FeatureExtractor.aHashBands(
        vid.slice(start(fr.frame_idx), start(fr.frame_idx + 1)))
      assert(Seq(fr.f0, fr.f1, fr.f2, fr.f3) == exp.toSeq,
        s"frame ${fr.frame_idx} hash != its slice hash")
    }
    // slices partition the payload: starts are monotone, cover [0, L)
    assert(start(0) == 0 && start(nf) == vid.length)
    assert((0 until nf).forall(f => start(f) < start(f + 1)))
    // deterministic across passes
    val again = MediaPipeline.frameHashes(media.toDS()).collect()
    assert(again.map(_.toString).sorted.toSeq ==
      (out(1L) ++ out(2L)).map(_.toString).sorted.toSeq)
  }

  test("aHash scan window: over-cap payloads hash their window prefix exactly (overflow bound enforced)") {
    import graft.multimodal.MediaPipeline.FeatureExtractor
    val rng = new scala.util.Random(42)
    val full = Array.fill[Byte](100)((rng.nextInt(256) - 128).toByte)
    // the cap semantics in miniature: a payload past the window hashes
    // identically to its window-length prefix — the real cap at
    // MaxHashBytes behaves the same way by the same code path
    val w = 16
    assert(FeatureExtractor.aHashBandsWindow(full, w).toSeq ==
      FeatureExtractor.aHashBandsWindow(full.take(w), w).toSeq)
    assert(FeatureExtractor.aHashBandsWindow(full, w).toSeq ==
      FeatureExtractor.aHashBands(full.take(w)).toSeq)
    // sub-window payloads are unaffected by the cap (the oracle-fixture
    // regime): default-window hash == unbounded-window hash
    assert(FeatureExtractor.aHashBands(full).toSeq ==
      FeatureExtractor.aHashBandsWindow(full, Int.MaxValue).toSeq)
    // the default window keeps the exact integer compare inside Long:
    // max block_sum * n = 255 * (n/64 + 1) * n at n = MaxHashBytes
    val n = FeatureExtractor.MaxHashBytes.toLong
    val maxProduct = BigInt(255) * (n / 64 + 1) * n
    assert(maxProduct < BigInt(Long.MaxValue),
      "MaxHashBytes must keep block_sum * n exactly representable in Long")
  }

  test("m6 flag builder: exact leaks flag, far hashes don't, benchmark ids never flag themselves into the report") {
    import spark.implicits._
    def hf(rows: (Long, Int, Int, Int, Int)*) =
      rows.toDF("media_id", "b0", "b1", "b2", "b3")
    // train 1 == bench 100 (exact leak, ham 0); train 2 within the bar
    // of bench 101 on a shared band (ham = 2); train 3 shares a band
    // with bench 102 but sits past the bar (ham = 16 on the others);
    // train 4 shares NO band (blocked — never a candidate)
    val train = hf(
      (1L, 10, 20, 30, 40),
      (2L, 11, 21, 31, 41),
      (3L, 5, 50, 60, 70),
      (4L, 7, 8, 9, 12))
    val bench = hf(
      (100L, 10, 20, 30, 40),
      (101L, 11, 21, 31, 43), // xor 41^43 = 2 -> ham 1
      (102L, 5, 0xFF0F, 0xF0FF, 0x0F0F),
      (103L, 1000, 2000, 3000, 4000))
    val flagged = graft.queries.Multimodal
      .mediaDecontamFlags(train, bench)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L, 2L),
      s"exact + in-bar leaks flag; far and band-blocked don't: $flagged")
  }

  test("m6 report: injected leaks make every modality's flag count non-vacuous; counts are internally consistent") {
    val rows = SparkEntry.queries("m6_media_decontam")(spark, Sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("audio", "image", "video"))
    rows.foreach { r =>
      assert(r.getLong(3) > 0,
        s"${r.getString(0)}: injected exact leaks must flag — vacuous")
      assert(r.getLong(3) <= r.getLong(1),
        s"${r.getString(0)}: flagged exceeds the training side")
      assert(r.getLong(2) > 0, s"${r.getString(0)}: empty benchmark slice")
    }
    // the benchmark carries the eval slice PLUS the injected leaks
    val media = MediaPipeline.syntheticMedia(spark, Sf).toDF().cache()
    val nEval = media.filter(col("media_id") % 7 === 0).count() +
      media.filter(col("media_id") % 7 =!= 0 &&
        col("media_id") % 31 === 5).count()
    assert(rows.map(_.getLong(2)).sum == nEval)
    assert(rows.map(_.getLong(1)).sum ==
      media.filter(col("media_id") % 7 =!= 0).count())
  }

  test("m7 flag builder: an in-bar FRAME flags its container; far and band-blocked frames don't") {
    import spark.implicits._
    // container 1's frame 2 is an exact benchmark hit; container 2's
    // frame 0 is within the bar on a shared band (ham 1); container
    // 3's frame shares a band but sits far past the bar; container
    // 4's frame shares no band (blocked — never a candidate)
    val train = Seq(
      (1L, 2, 3, 10, 20, 30, 40),
      (2L, 0, 1, 11, 21, 31, 41),
      (3L, 1, 4, 5, 50, 60, 70),
      (4L, 0, 1, 7, 8, 9, 12))
      .toDF("media_id", "frame_idx", "n_frames", "f0", "f1", "f2", "f3")
    val bench = Seq(
      (100L, 10, 20, 30, 40),
      (101L, 11, 21, 31, 43), // xor 41^43 = 2 -> ham 1
      (102L, 5, 0xFF0F, 0xF0FF, 0x0F0F),
      (103L, 1000, 2000, 3000, 4000))
      .toDF("media_id", "b0", "b1", "b2", "b3")
    val flagged = graft.queries.Multimodal
      .frameDecontamFlags(train, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == Set((1L, 10L), (2L, 16L)),
      s"exact + in-bar frames flag with invertible uids; far and " +
        s"band-blocked don't: $flagged")
  }

  test("m7 report: every injected leaked still flags its training container; counts internally consistent") {
    val rows = SparkEntry.queries("m7_frame_decontam")(spark, Sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("audio", "image", "video"))
    rows.foreach { r =>
      assert(r.getLong(3) > 0,
        s"${r.getString(0)}: injected leaked stills must flag — vacuous")
      assert(r.getLong(3) <= r.getLong(1),
        s"${r.getString(0)}: flagged containers exceed the training side")
      assert(r.getLong(4) >= r.getLong(3),
        s"${r.getString(0)}: a flagged container needs >= 1 flagged frame")
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: sampled frames can't undercount containers")
    }
    // EVERY injected container (frame 0 re-appears as a benchmark
    // still) is a distance-0 match and must be caught — recall pin
    val fh = MediaPipeline.frameHashes(
      MediaPipeline.syntheticMedia(spark, Sf)).toDF().cache()
    val train = fh.filter(col("media_id") % 7 =!= 0)
    def asBench(df: org.apache.spark.sql.DataFrame) =
      df.select(col("media_id"), col("f0").as("b0"), col("f1").as("b1"),
        col("f2").as("b2"), col("f3").as("b3"))
    val bench = asBench(fh.filter(col("media_id") % 7 === 0 &&
        col("media_id") % 3 === 0))
      .unionAll(asBench(fh.filter(col("media_id") % 7 =!= 0 &&
        col("media_id") % 31 === 5 && col("frame_idx") === 0)))
    val flaggedIds = graft.queries.Multimodal
      .frameDecontamFlags(train, bench)
      .select("media_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val injected = train.filter(col("media_id") % 31 === 5)
      .select("media_id").distinct().collect().map(_.getLong(0)).toSet
    assert(injected.nonEmpty && injected.subsetOf(flaggedIds),
      s"missed injected stills: ${(injected -- flaggedIds).take(5)}")
  }

  test("m8 groups: canonical is the min member, partners share a canonical, saturated rows are honest singletons") {
    val rows = SparkEntry.queries("m8_media_dedup_groups")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getInt(4)))
    assert(rows.nonEmpty, "fixture must produce dedup groups")
    val byGroup = rows.groupBy(_._2)
    byGroup.foreach { case (canon, members) =>
      // exactly one canonical per group, and it is the min member
      assert(members.count(_._4) == 1,
        s"group $canon: ${members.count(_._4)} canonicals")
      assert(members.filter(_._4).head._1 == members.map(_._1).min,
        s"group $canon: canonical is not the min member")
      assert(members.map(_._1).min == canon,
        s"group $canon: canonical_id != min member id")
      // group_size is consistent across members
      assert(members.map(_._3).distinct.size == 1 &&
        members.head._3 == members.size,
        s"group $canon: inconsistent group_size")
    }
    // a multi-member group exists (the CC leg is live) and a
    // saturated row exists (the guard leg is live)
    assert(byGroup.exists(_._2.size > 1), "no multi-member group — CC vacuous")
    assert(rows.exists(_._5 == 1), "no saturated row — guard leg vacuous")
    // m3 and m8 agree on who is "interesting": m8's row set is exactly
    // m3's rollup population (saturated ∪ paired) — the composition pin
    val m3ids = SparkEntry.queries("m3_phash_neardup")(spark, Sf)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == m3ids,
      "m8 must cover exactly m3's saturated-or-paired population")
  }

  test("m9 funnel: attrition is monotone per modality, every stage drops somewhere, totals cover the train corpus") {
    val rows = SparkEntry.queries("m9_media_funnel")(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).sorted.toSeq == Seq("audio", "image", "video"))
    rows.foreach { case (mod, raw, q, nd, clean, ret) =>
      assert(raw >= q && q >= nd && nd >= clean && clean >= 0,
        s"$mod: attrition not monotone ($raw >= $q >= $nd >= $clean)")
      assert(math.abs(ret - (2 * clean * 1000000 + raw) / (2 * raw)
          / 1000000.0) < 1e-12,
        s"$mod: retention is not the integer-micro ratio")
    }
    // each stage's drop is non-vacuous in aggregate (the probe's
    // registration bar, re-checked in the engine)
    assert(rows.map(r => r._2 - r._3).sum > 0, "quality stage vacuous")
    assert(rows.map(r => r._3 - r._4).sum > 0, "near-dup stage vacuous")
    assert(rows.map(r => r._4 - r._5).sum > 0, "decontam stage vacuous")
    // the funnel covers exactly the training corpus
    val nTrain = MediaPipeline.syntheticMedia(spark, Sf).toDF()
      .filter(col("media_id") % 7 =!= 0).count()
    assert(rows.map(_._2).sum == nTrain,
      "per-modality n_raw must partition the training corpus")
  }
}
