package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.api.{DedupIndex, ManifestIO}
import graft.functions.DedupEnrich
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Cross-surface agreement of the ONE shared dedup enrichment path
  * ([[graft.functions.DedupEnrich]]): the batch query shape, the
  * maintained [[DedupIndex]] store, and the streaming candidate
  * generator must produce IDENTICAL band keys, Bloom positions, and
  * candidate sets on the same corpus. These keys are join keys across
  * surfaces — a silent divergence (a tokenizer tweak that reaches
  * three call sites but not the fourth) would admit duplicates while
  * every per-surface suite stays green. This spec makes that failure
  * mode loud. */
class DedupSurfacesSpec extends SparkSpec {

  private val baseText =
    "the quick brown fox jumps over the lazy dog again and again tonight"
  private val otherText =
    "completely different content about databases and sorting algorithms"

  // exact dup (3 == 1 after token normalization: order-insensitive),
  // near dup (2), short docs (6, 7), empty docs (8, 9 — exact dups of
  // each other), plus unrelated fillers
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> baseText,
    2L -> (baseText + " ok"),
    3L -> ("tonight again and again " + baseText),
    4L -> otherText,
    5L -> (otherText + " indeed"),
    6L -> "alpha beta",
    7L -> "gamma",
    8L -> "",
    9L -> "",
    10L -> "entirely novel text about sailing boats and tides this week")

  private def corpusDF = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  /** The batch-query-shape enrichment (exactly what d3/d10 build). */
  private def batchBands: Map[Long, Set[String]] =
    DedupEnrich.withBandKeys(
      DedupEnrich.withShingleSet(corpusDF, "text"), "sh")
      .select(col("doc_id"), col("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap

  private def freshDir(): String = {
    val d = Files.createTempDirectory("dedup-surfaces").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("maintained index persists the SAME band keys the batch query computes") {
    val dir = freshDir()
    new DedupIndex(spark, dir, capacity = 1000).ingest(corpusDF).collect()
    val seg = ManifestIO.read(dir).get("segs").split(",").head
    val indexBands = spark.read.parquet(s"$dir/$seg/bands")
      .groupBy("prior_id").agg(collect_set(col("bk")).as("bks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(indexBands == batchBands,
      s"index band keys diverged from the batch path:\n index=$indexBands\n batch=$batchBands")
  }

  test("maintained index's packed Bloom words decode to the d8 model's position set") {
    val dir = freshDir()
    new DedupIndex(spark, dir, capacity = 1000).ingest(corpusDF).collect()
    val man = ManifestIO.read(dir).get
    assert(man("version") == "2", "a fresh store must use the packed encoding")
    val m = man("m").toLong
    val seg = man("segs").split(",").head
    // decode (word_idx, bits) -> the set positions it packs
    val indexPos = spark.read.parquet(s"$dir/$seg/bloom")
      .collect().flatMap { r =>
        val (w, bits) = (r.getLong(0), r.getLong(1))
        (0 until 64).collect { case b if (bits >> b & 1L) == 1L => w * 64 + b }
      }.toSet
    val modelPos = corpusDF
      .select(explode(DedupEnrich.bloomPositions(
        DedupEnrich.exactFp(col("text")), lit(m))).as("pos"))
      .collect().map(_.getLong(0)).toSet
    assert(indexPos == modelPos,
      s"packed Bloom words diverged from the d8 model: index=$indexPos model=$modelPos")
  }

  test("streaming candidate pairs equal the batch band-collision pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // batch truth: distinct (a < b) pairs sharing at least one band key
    val bandPairs = (for {
      (a, as) <- batchBands.toSeq; (b, bs) <- batchBands.toSeq
      if a < b && (as & bs).nonEmpty
    } yield (a, b)).toSet

    val t0 = Timestamp.valueOf("2024-02-01 10:00:00")
    val src = MemoryStream[(Long, String, Timestamp)]
    val q = EventStream.streamingNearDupCandidates(
        src.toDF().toDF("doc_id", "text", "ts"), horizonMs = 24L * 3600 * 1000)
      .writeStream.format("memory").queryName("surfaces_neardup")
      .outputMode("append").start()
    try {
      // two micro-batches so the pairs cross the state seam too
      val (first, second) = corpus.partition(_._1 <= 5)
      src.addData(first.map { case (id, tx) => (id, tx, t0) }: _*)
      q.processAllAvailable()
      src.addData(second.map { case (id, tx) => (id, tx, t0) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("surfaces_neardup").select("a", "b")
        .collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
      assert(streamed == bandPairs,
        s"streaming candidates diverged from batch band collisions:\n stream=$streamed\n batch=$bandPairs")
    } finally q.stop()
  }

  test("streaming horizon gap reconciles through the maintained index (nightly batch pass)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the streaming candidate generator is deliberately RECENT-state
    // only (horizon-bounded); a re-post of a doc older than the
    // horizon emits nothing. The maintained index holds the FULL
    // corpus, so the nightly batch ingest of the day's docs closes
    // exactly that gap — this is the worked handoff example.
    val idx = new DedupIndex(spark, freshDir(), capacity = 1000)
    idx.ingest(Seq(1L -> baseText).toDF("doc_id", "text")).collect()

    val src = MemoryStream[(Long, String, Timestamp)]
    val q = EventStream.streamingNearDupCandidates(
        src.toDF().toDF("doc_id", "text", "ts"), horizonMs = 3600 * 1000)
      .writeStream.format("memory").queryName("reconcile_neardup")
      .outputMode("append").start()
    try {
      // doc 1 aged out long ago; the day's only arrival has no recent
      // band-mates -> the stream sees nothing
      src.addData((50L, baseText + " ok", Timestamp.valueOf("2024-02-02 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("reconcile_neardup").count() == 0,
        "stream must not pair across its horizon")
    } finally q.stop()

    // nightly reconciliation: the same day's docs through the index
    val night = idx.ingest(Seq(50L -> (baseText + " ok")).toDF("doc_id", "text"))
      .collect()
    assert(night.head.getSeq[Long](2).toList == List(1L),
      s"the index must surface the cross-horizon candidate: ${night.toList}")
  }

  test("the combined one-binding builder equals the separate builders column-for-column") {
    // withFpShinglesWindows (the window-enabled DedupIndex ingest
    // shape, ONE tokenize pass) must be byte-identical to composing
    // withFpAndShingles + withWindowHashes (two passes) — if the
    // combined builder ever drifts, index keys silently diverge from
    // the batch queries that compose the separate builders
    import spark.implicits._
    val longDocs = corpus ++ Seq(
      20L -> (1 to 40).map(i => s"tok$i").mkString(" "), // >= WindowW tokens
      21L -> ((1 to 20).map(i => s"w$i").mkString(" ") + " " + baseText))
    val df = longDocs.toDF("doc_id", "text")
    val combined = DedupEnrich.withFpShinglesWindows(df, "text")
      .select("doc_id", "fp", "sh", "ws")
    val separate = DedupEnrich.withWindowHashes(
      DedupEnrich.withFpAndShingles(df, "text"), "text")
      .select("doc_id", "fp", "sh", "ws")
    val c = combined.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getSeq[String](2).toList, r.getSeq[String](3).toList)).toMap
    val s = separate.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getSeq[String](2).toList, r.getSeq[String](3).toList)).toMap
    assert(c == s, s"combined builder drifted from the separate builders")
  }

  test("streaming hot-band cap: a templated flood emits saturation markers, bounded pairs, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = Timestamp.valueOf("2024-02-01 10:00:00")
    val src = MemoryStream[(Long, String, Timestamp)]
    // cap 3: the 4th-and-later identical docs hit a saturated band
    val q = EventStream.streamingNearDupCandidates(
        src.toDF().toDF("doc_id", "text", "ts"),
        horizonMs = 24L * 3600 * 1000, maxBandDocs = 3)
      .writeStream.format("memory").queryName("sat_neardup")
      .outputMode("append").start()
    try {
      // 6 identical docs across two micro-batches (identical text =
      // all 4 band keys shared — the boilerplate corpus shape)
      src.addData((1L to 3L).map(i => (i, baseText, t0)): _*)
      q.processAllAvailable()
      src.addData((4L to 6L).map(i => (i, baseText, t0)): _*)
      q.processAllAvailable()
      val rows = spark.table("sat_neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
      val pairs = rows.filter(!_._3).map(r => (r._1, r._2))
      // field convention: the ARRIVING doc is `b` on marker rows too
      // (a = -1), so a positional consumer reads one field for "the
      // new doc" across both row kinds
      val sats = rows.filter(_._3).map(_._2)
      assert(rows.filter(_._3).forall(_._1 == -1L),
        "marker rows must carry a = -1")
      // docs 1-3 fill the cap: pairs only among them (1,2),(1,3),(2,3)
      // per shared band; dedup'd here — NEVER a pair touching 4..6
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"pairs must stop at the cap: $pairs")
      // every capped arrival carries its saturation marker instead
      assert(sats == Set(4L, 5L, 6L),
        s"capped arrivals must flag, not enumerate: $sats")
    } finally q.stop()
  }

  test("streaming MEDIA twin: same stateful core on phash keys — cap markers, bounded pairs, and index parity within one horizon") {
    // the media family's third surface (batch m3 / maintained
    // ingestMedia / THIS stream): the stateful core is literally the
    // text twin's function, keyed through the one phashKeyArray
    // encoding — so the flood/cap/marker contract and the
    // within-one-horizon index parity must hold verbatim on media keys
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = Timestamp.valueOf("2024-02-01 10:00:00")
    val src = MemoryStream[(Long, Timestamp, Int, Int, Int, Int)]
    val q = EventStream.streamingMediaNearDupCandidates(
        src.toDF().toDF("media_id", "ts", "b0", "b1", "b2", "b3"),
        horizonMs = 24L * 3600 * 1000, maxBandDocs = 3)
      .writeStream.format("memory").queryName("sat_media_neardup")
      .outputMode("append").start()
    // 6 identical hashes (the re-encoded-template flood) + a cold pair
    // (7, 8) that crosses the micro-batch state seam
    val flood = (1L to 6L).map(i => (i, t0, 1000, 2000, 3000, 4000))
    val cold = Seq((7L, t0, 5000, 6000, 7000, 8000),
      (8L, t0, 5000, 6000, 7000, 8000))
    try {
      src.addData(flood.take(3) :+ cold.head: _*)
      q.processAllAvailable()
      src.addData(flood.drop(3) :+ cold.last: _*)
      q.processAllAvailable()
      val rows = spark.table("sat_media_neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
      val pairs = rows.filter(!_._3).map(r =>
        (math.min(r._1, r._2), math.max(r._1, r._2)))
      val sats = rows.filter(_._3).map(_._2)
      assert(rows.filter(_._3).forall(_._1 == -1L))
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L)),
        s"pairs must stop at the cap and keep the cold pair: $pairs")
      assert(sats == Set(4L, 5L, 6L),
        s"capped arrivals must flag, not enumerate: $sats")
    } finally q.stop()
    // index parity: the same hashes doc-by-doc at hotBandThreshold = 3
    // (lifetime counts) flag the SAME media and enumerate the SAME
    // candidate pairs — within one horizon on a fresh history the two
    // trigger semantics coincide, the text family's pinned contract
    val idx = new DedupIndex(spark, freshDir(), capacity = 1000,
      hotBandThreshold = 3)
    val verdicts = (flood ++ cold).map { case (i, _, a, b, c, d) =>
      i -> idx.ingestMedia(Seq((i, a, b, c, d))
        .toDF("media_id", "b0", "b1", "b2", "b3")).collect().head
    }
    val idxFlagged = verdicts.collect {
      case (i, v) if v.getAs[Int]("phash_saturated") == 1 => i }.toSet
    val idxPairs = verdicts.flatMap { case (i, v) =>
      v.getSeq[Long](1).map(p => (math.min(p, i), math.max(p, i))) }.toSet
    assert(idxFlagged == Set(4L, 5L, 6L),
      s"index flags must match the stream's within one horizon: $idxFlagged")
    assert(idxPairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L)),
      s"index candidates must match the stream's: $idxPairs")
  }

  test("streaming media decontam: the stateless broadcast screen flags EXACTLY the batch m6 set") {
    // the m6 screen's ingest surface: a stream-static broadcast probe,
    // deliberately STATELESS (the benchmark is fixed and small — the
    // pl14/m6 argument), so parity with the batch builder is the whole
    // contract: a media row flags here iff batch m6 flags it
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = Timestamp.valueOf("2024-02-01 10:00:00")
    val bench = Seq(
      (100L, 10, 20, 30, 40),
      (101L, 1000, 2000, 3000, 4000))
      .toDF("media_id", "b0", "b1", "b2", "b3")
    // 1 = exact leak of 100; 2 = in-bar near 101 (ham 2 on the last
    // band); 3 = shares band 0 with 100 but sits far past the bar;
    // 4 = shares no band with any benchmark item (blocked)
    val arrivals = Seq(
      (1L, t0, 10, 20, 30, 40),
      (2L, t0, 1000, 2000, 3000, 4005),
      (3L, t0, 10, 0xFF0F, 0xF0FF, 0x0F0F),
      (4L, t0, 7, 8, 9, 12))
    val src = MemoryStream[(Long, Timestamp, Int, Int, Int, Int)]
    val q = EventStream.streamingMediaDecontam(
        src.toDF().toDF("media_id", "ts", "b0", "b1", "b2", "b3"), bench)
      .writeStream.format("memory").queryName("stream_decontam")
      .outputMode("append").start()
    val got = try {
      src.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      src.addData(arrivals.drop(2): _*)
      q.processAllAvailable()
      spark.table("stream_decontam").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
    } finally q.stop()
    assert(got == Set((1L, 100L), (2L, 101L)),
      s"exact + in-bar flag with their partners; far + blocked don't: $got")
    val batch = graft.queries.Multimodal.mediaDecontamFlags(
      arrivals.map { case (i, _, a, b, c, d) => (i, a, b, c, d) }
        .toDF("media_id", "b0", "b1", "b2", "b3"),
      bench).collect().map(_.getLong(0)).toSet
    assert(batch == got.map(_._1),
      s"stream and batch screens must flag identically: $batch vs $got")
  }

  test("saturated case crosses surfaces: index lifetime-count guard == streaming live-held cap within one horizon") {
    // same templated flood, same threshold: the index (hotBandThreshold
    // = 3, lifetime counts, driven doc-by-doc) and the stream
    // (maxBandDocs = 3, horizon-live held entries — the flood test
    // above) must flag the SAME docs and emit the SAME pairs, because
    // within one horizon on a fresh history the two trigger semantics
    // coincide. This is the saturated extension of the cross-surface
    // equality this suite pins for the healthy case.
    import spark.implicits._
    val idx = new DedupIndex(spark, freshDir(), capacity = 1000,
      hotBandThreshold = 3)
    val verdicts = (1L to 6L).map { i =>
      i -> idx.ingest(Seq(i -> baseText).toDF("doc_id", "text")).collect().head
    }
    val idxPairs = verdicts.flatMap { case (i, v) =>
      v.getSeq[Long](2).map(p => (math.min(p, i), math.max(p, i))) }.toSet
    val idxFlagged = verdicts.collect {
      case (i, v) if v.getAs[Int]("band_saturated") == 1 => i }.toSet
    // the streaming flood (cap 3, same corpus) produced pairs among
    // 1-3 and markers for 4-6 — the index must agree exactly
    assert(idxPairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"index pairs diverged from the streaming flood: $idxPairs")
    assert(idxFlagged == Set(4L, 5L, 6L),
      s"index saturation diverged from the streaming flood: $idxFlagged")
    // and saturation widened, never hid: flagged docs carry NO
    // candidate list (the wide-verify routing), but the exact-dup leg
    // still fires on the identical text
    verdicts.filter(v => idxFlagged(v._1)).foreach { case (i, v) =>
      assert(v.getSeq[Long](2).isEmpty, s"doc $i: saturated but enumerated")
      assert(v.getAs[Int]("maybe_dup") == 1, s"doc $i: exact leg must survive")
    }
  }

  test("the maintained index's GUARD verdicts equal the registered d11 formulation on one corpus") {
    // d11_guarded_lsh is documented as THE oracle-checked model of the
    // index's hot-band guard; this pins the claim: same history, same
    // threshold, the index's (band_saturated, near_candidate_ids) must
    // equal the d11 formulation computed fresh over the same split.
    import spark.implicits._
    val template = baseText
    val hist: Seq[(Long, String)] = Seq(
      1L -> template, 2L -> template, 3L -> template, // 3 docs/band >= H
      5L -> otherText,
      6L -> "one lonely unrelated document about glaciers and moraine today")
    val probes: Seq[(Long, String)] = Seq(
      20L -> (template + " regards"), // near-dup of the HOT template
      21L -> (otherText + " indeed"), // near-dup of a COLD doc
      22L -> "entirely novel words nobody wrote before in this corpus")
    val H = 2L

    val idx = new DedupIndex(spark, freshDir(), capacity = 1000,
      hotBandThreshold = H)
    idx.ingest(hist.toDF("doc_id", "text")).collect()
    val got = idx.ingest(probes.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(3), r.getSeq[Long](2).toList))).toMap

    // the d11 formulation, computed fresh over the same split through
    // the SAME shared builder
    val bands = DedupEnrich.withBandKeys(
      DedupEnrich.withShingleSet((hist ++ probes).toDF("doc_id", "text"),
        "text"), "sh")
      .select(col("doc_id"), col("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val counts = hist.map(_._1).flatMap(bands).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val hot = counts.filter(_._2 >= H).keySet
    probes.map(_._1).foreach { b =>
      val expSat = if ((bands(b) & hot).nonEmpty) 1 else 0
      val expCands = hist.map(_._1)
        .filter(h => (bands(h) & bands(b)).exists(!hot(_))).sorted
      assert(got(b) == ((expSat, expCands)),
        s"probe $b: index guard ${got(b)} != d11 model ($expSat, $expCands)")
    }
    // and the fixture is non-vacuous on every leg: a saturated probe,
    // a candidate-bearing probe, and a clean probe
    assert(got(20L)._1 == 1, s"template near-dup must saturate: $got")
    assert(got(21L)._1 == 0 && got(21L)._2 == List(5L),
      s"cold near-dup must enumerate: $got")
    assert(got(22L) == ((0, Nil)), s"novel doc must be clean: $got")
  }

  test("batch d12 rollup over-approximates the incremental guard: flags are a superset, suppressed pairs have flagged endpoints") {
    // same templated flood + one cold near-dup pair, same threshold 3.
    // The batch rollup is ORDER-INDEPENDENT (every holder of a hot
    // band flags), the index is arrival-ordered (pairs until the band
    // fills, flags after) — the pinned relationship is containment,
    // not equality: batch flags ⊇ index flags, and any pair the batch
    // guard suppresses has both endpoints flagged (never a hidden dup).
    import spark.implicits._
    val flood: Seq[(Long, String)] =
      (1L to 6L).map(i => i -> baseText) ++
        Seq(7L -> otherText, 8L -> (otherText + " indeed"))
    val base = DedupEnrich.withBandKeys(
      DedupEnrich.withShingleSet(flood.toDF("doc_id", "text"), "text"), "sh")
    val rollup = DedupEnrich.guardedBatchRollup(base, hotThreshold = 3)
      .collect()
    val batchFlagged = rollup.filter(_.getAs[Int]("band_saturated") == 1)
      .map(_.getAs[Long]("doc_id")).toSet
    val batchPairs = rollup.flatMap { r =>
      val ps = r.getAs[String]("partners")
      if (ps.isEmpty) Nil
      else ps.split(",").map(p => (r.getAs[Long]("doc_id"), p.toLong)).toSeq
    }.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    // whole-corpus semantics: ALL six templated docs flag; the cold
    // near-dup pair survives the guard
    assert(batchFlagged == (1L to 6L).toSet,
      s"every holder of the hot band must flag: $batchFlagged")
    assert(batchPairs == Set((7L, 8L)),
      s"the cold near-dup pair must survive the guard: $batchPairs")

    // the index over the same corpus, arrival order 1..8, threshold 3
    val idx = new DedupIndex(spark, freshDir(), capacity = 1000,
      hotBandThreshold = 3)
    val verdicts = flood.map { case (i, tx) =>
      i -> idx.ingest(Seq(i -> tx).toDF("doc_id", "text")).collect().head
    }
    val idxFlagged = verdicts.collect {
      case (i, v) if v.getAs[Int]("band_saturated") == 1 => i }.toSet
    val idxPairs = verdicts.flatMap { case (i, v) =>
      v.getSeq[Long](2).map(p => (math.min(p, i), math.max(p, i))) }.toSet
    // containment, both directions of the contract
    assert(idxFlagged.subsetOf(batchFlagged),
      s"index flags must be contained in batch flags: $idxFlagged vs $batchFlagged")
    assert(idxFlagged == Set(4L, 5L, 6L), s"arrival-order flags: $idxFlagged")
    val lost = idxPairs.filterNot { case (a, b) =>
      batchPairs((a, b)) || batchFlagged(a) || batchFlagged(b) }
    assert(lost.isEmpty,
      s"pairs the batch guard suppressed without flagging an endpoint: $lost")
    // and the cold pair is live on BOTH surfaces
    assert(idxPairs.contains((7L, 8L)),
      s"the index must also enumerate the cold near-dup: $idxPairs")
  }

  test("media phash guard extends the over-approximation contract to the MEDIA key family: flood flags, cold pair survives") {
    // the m3 rollup rides the SAME guard core as d12/d13
    // (guardedCandidatePairs + saturationRollup), so the same contract
    // must hold on perceptual-hash keys: every holder of a hot hash
    // bucket FLAGS (order-independent, whole-corpus), any pair the
    // guard suppresses has both endpoints flagged (never a hidden
    // dup), and a cold near-dup pair still pairs. Flood = six
    // byte-identical payloads (identical aHash -> all four of their
    // band keys reach occupancy 6 >= 4); cold pair = two identical
    // payloads of OTHER content (occupancy 2 < 4, Hamming 0 <= 12);
    // plus an unrelated singleton that must not appear at all.
    import graft.multimodal.MediaPipeline
    import graft.queries.Multimodal
    import spark.implicits._
    val floodBytes = (0 until 1024).map(i => (i % 251).toByte).toArray
    val pairBytes = (0 until 900).map(i => ((i * 7) % 256).toByte).toArray
    val loneBytes = (0 until 700).map(i => ((i * i) % 256).toByte).toArray
    val media = ((1L to 6L).map(i => (i, floodBytes)) ++
      Seq(7L -> pairBytes, 8L -> pairBytes, 9L -> loneBytes))
      .map { case (id, p) =>
        MediaPipeline.MediaRecord(id, "image", p, "spec", p.length.toLong) }
    val hashes = MediaPipeline.perceptualHash(
      media.toDS()).toDF()
    // the hash pass must not be degenerate: flood and pair hash apart
    val hv = hashes.collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getInt)).toMap
    assert(hv(1L) != hv(7L), "flood and cold-pair payloads hash equal — fixture broken")
    assert(hv(7L) == hv(8L) && hv(1L) == hv(6L))
    val rollup = Multimodal.phashRollup(hashes, hotThreshold = 4).collect()
    val flagged = rollup.filter(_.getAs[Int]("phash_saturated") == 1)
      .map(_.getAs[Long]("media_id")).toSet
    assert(flagged == (1L to 6L).toSet,
      s"every holder of a hot hash bucket must flag: $flagged")
    val pairs = rollup.flatMap { r =>
      val ps = r.getAs[String]("partners")
      if (ps.isEmpty) Nil
      else ps.split(",").map(p => (r.getAs[Long]("media_id"), p.toLong)).toSeq
    }.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    assert(pairs == Set((7L, 8L)),
      s"the cold near-dup pair must survive the guard: $pairs")
    // over-approximation: every flood pair the guard suppressed has
    // BOTH endpoints flagged — no hidden dup is possible
    for (a <- 1L to 6L; b <- (a + 1) to 6L)
      assert(flagged(a) && flagged(b), s"suppressed pair ($a,$b) unflagged")
    assert(!rollup.exists(_.getAs[Long]("media_id") == 9L),
      "a singleton with no signal must not appear in the rollup")
  }

  test("maintained index media flags are a SUBSET of the m3 batch flags; no suppressed pair loses both endpoints") {
    // the batch-vs-incremental contract, MEDIA key family edition
    // (r17 verdict item 3): the whole-corpus m3 rollup flags EVERY
    // holder of a hot perceptual-hash band (order-independent), while
    // the maintained index, driven arrival-by-arrival, flags only the
    // arrivals after the LIFETIME count reaches the threshold — so
    // index flags ⊆ batch flags, any pair either surface suppresses
    // has both endpoints batch-flagged, and the genuine cold near-dup
    // pair survives on BOTH surfaces.
    import graft.queries.Multimodal
    import spark.implicits._
    val flood = (1L to 6L).map(i => (i, 1000, 2000, 3000, 4000))
    val cold = Seq((7L, 5000, 6000, 7000, 8000), (8L, 5000, 6000, 7000, 8000))
    val lone = Seq((9L, 111, 222, 333, 444))
    val hashes = (flood ++ cold ++ lone)
      .toDF("media_id", "b0", "b1", "b2", "b3")
    val batch = Multimodal.phashRollup(hashes, hotThreshold = 3).collect()
    val batchFlagged = batch.filter(_.getAs[Int]("phash_saturated") == 1)
      .map(_.getAs[Long]("media_id")).toSet
    val batchPairs = batch.flatMap { r =>
      val ps = r.getAs[String]("partners")
      if (ps.isEmpty) Nil
      else ps.split(",").map(p => (r.getAs[Long]("media_id"), p.toLong)).toSeq
    }.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    assert(batchFlagged == (1L to 6L).toSet && batchPairs == Set((7L, 8L)))
    // the index over the same hashes, arrival order 1..9, threshold 3
    val idx = new DedupIndex(spark, freshDir(), capacity = 1000,
      hotBandThreshold = 3)
    val verdicts = (flood ++ cold ++ lone).map { case (i, a, b, c, d) =>
      i -> idx.ingestMedia(Seq((i, a, b, c, d))
        .toDF("media_id", "b0", "b1", "b2", "b3")).collect().head
    }
    val idxFlagged = verdicts.collect {
      case (i, v) if v.getAs[Int]("phash_saturated") == 1 => i }.toSet
    val idxPairs = verdicts.flatMap { case (i, v) =>
      v.getSeq[Long](1).map(p => (math.min(p, i), math.max(p, i))) }.toSet
    assert(idxFlagged.subsetOf(batchFlagged),
      s"index flags must be contained in batch flags: $idxFlagged")
    assert(idxFlagged == Set(4L, 5L, 6L), s"arrival-order flags: $idxFlagged")
    val lost = idxPairs.filterNot { case (a, b) =>
      batchPairs((a, b)) || batchFlagged(a) || batchFlagged(b) }
    assert(lost.isEmpty,
      s"pairs the batch guard suppressed without flagging an endpoint: $lost")
    assert(idxPairs.contains((7L, 8L)),
      s"the index must also enumerate the cold near-dup: $idxPairs")
  }

  test("frame-key guard (m5) extends the contract to FRAME granularity: flood flags containers, overlap bar gates pairs") {
    // frameNeardupRollup rides the SAME guard core on per-frame keys
    // and aggregates pair evidence to CONTAINER level, so the contract
    // gains one clause: a container pairs only when >= half of EACH
    // side's frames verified (2*m >= n), and a container holding ANY
    // saturated frame flags (its evidence may be incomplete). Driven
    // on a hand-built FrameHash frame so every leg is exact:
    //  - containers 1..6: 2 frames each, ALL sharing one hash -> every
    //    frame key occupancy 12 >= 4 -> all six containers flag, no pairs;
    //  - containers 7, 8: 4 frames each, frames 0-2 identical across,
    //    frame 3 disjoint -> m = 3 of n = 4 both ways -> dup pair;
    //  - containers 10, 11: 4 frames each, ONE matching frame -> a
    //    verified frame pair that FAILS the overlap bar -> absent;
    //  - container 12: two identical frames of its own -> same-container
    //    pair must not self-match -> absent.
    import graft.queries.Multimodal
    import spark.implicits._
    def fh(media: Long, idx: Int, nf: Int, h: Int) =
      (media, idx, nf, h, h + 1, h + 2, h + 3)
    val rows =
      (1L to 6L).flatMap(m => Seq(fh(m, 0, 2, 100), fh(m, 1, 2, 100))) ++
        Seq(7L, 8L).flatMap(m => (0 to 2).map(i => fh(m, i, 4, 200 + i))) ++
        Seq(fh(7L, 3, 4, 300), fh(8L, 3, 4, 400)) ++
        Seq(10L, 11L).map(m => fh(m, 0, 4, 500)) ++
        Seq(10L, 11L).flatMap(m =>
          (1 to 3).map(i => fh(m, i, 4, 600 + 10 * i.toInt + m.toInt))) ++
        Seq(fh(12L, 0, 2, 700), fh(12L, 1, 2, 700))
    val frame = rows.toDF(
      "media_id", "frame_idx", "n_frames", "f0", "f1", "f2", "f3")
    val rollup = Multimodal.frameNeardupRollup(frame, hotThreshold = 4)
      .collect()
    val flagged = rollup.filter(_.getAs[Int]("frame_saturated") == 1)
      .map(_.getAs[Long]("media_id")).toSet
    assert(flagged == (1L to 6L).toSet,
      s"every container holding a hot frame key must flag: $flagged")
    val pairs = rollup.flatMap { r =>
      val ps = r.getAs[String]("partners")
      if (ps.isEmpty) Nil
      else ps.split(",").map(p => (r.getAs[Long]("media_id"), p.toLong)).toSeq
    }.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    assert(pairs == Set((7L, 8L)),
      s"only the >=half-overlap container pair may flag: $pairs")
    // over-approximation: every flood pair suppressed by the guard has
    // both endpoints flagged
    for (a <- 1L to 6L; b <- (a + 1) to 6L)
      assert(flagged(a) && flagged(b), s"suppressed pair ($a,$b) unflagged")
    val present = rollup.map(_.getAs[Long]("media_id")).toSet
    assert(!present(10L) && !present(11L),
      "a one-frame overlap on 4-frame containers is below the bar")
    assert(!present(12L), "same-container frame matches must not self-pair")
  }

  test("derived saturation threshold: the median-occupancy formula flags the planted hot band and no cold ones") {
    // the production form of the fixture constants (BatchHotBands/
    // EmbHotBucket): H = max(floor, ceil(slack * median occupancy)).
    // On a templated flood the planted band's occupancy (6) sits far
    // above 4x the median (cold keys hold 1-2 docs), so the derived H
    // lands between them: every template doc flags, the genuine cold
    // near-dup pair still pairs, and no cold doc is flagged.
    import spark.implicits._
    val flood: Seq[(Long, String)] =
      (1L to 6L).map(i => i -> baseText) ++
        Seq(7L -> otherText, 8L -> (otherText + " indeed"),
          9L -> "entirely novel text about sailing boats and tides",
          10L -> "another unrelated document mentioning compilers")
    val base = DedupEnrich.withBandKeys(
      DedupEnrich.withShingleSet(flood.toDF("doc_id", "text"), "text"), "sh")
    val keys = base.select(col("doc_id").as("id"),
      explode(col("bands")).as("key"))
    val h = DedupEnrich.deriveHotThreshold(keys)
    assert(h > 2 && h <= 6,
      s"derived H must separate cold occupancy (<= 2) from the flood (6): $h")
    val (sat, pairs) = DedupEnrich.guardedCandidatePairs(keys, h)
    val flagged = sat.collect().map(_.getLong(0)).toSet
    assert(flagged == (1L to 6L).toSet,
      s"derived H must flag exactly the planted flood: $flagged")
    val p = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((7L, 8L)),
      s"the cold near-dup pair must survive the derived guard: $p")
    assert(p.forall { case (a, b) => a >= 7L && b >= 7L },
      s"no pair may involve a flagged flood doc: $p")
  }

  test("short docs get per-doc shingles, never a shared degenerate band key") {
    val b = batchBands
    assert((b(6L) & b(7L)).isEmpty,
      "two DIFFERENT short docs must not share a band key")
    assert(b(8L) == b(9L) && b(8L).nonEmpty,
      "two EMPTY docs are true exact dups and must share all band keys")
    assert((b(8L) & b(6L)).isEmpty && (b(8L) & b(7L)).isEmpty,
      "empty docs must not band-match non-empty short docs")
  }

  test("an empty or null shingle set emits NO band keys, not constant keys") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq.empty[String]),
      (3L, Seq("real shingle here")))
      .toDF("doc_id", "sh")
      // null shingle set for doc 2
      .withColumn("sh", when(col("doc_id") === 2, lit(null)).otherwise(col("sh")))
    val bands = DedupEnrich.withBandKeys(df, "sh")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2).toSet).toMap
    assert(bands(1L).isEmpty && bands(2L).isEmpty,
      s"degenerate shingle sets must emit no band keys: $bands")
    assert(bands(3L).size == DedupEnrich.NHashes / DedupEnrich.RowsPerBand,
      s"a real shingle set must emit one key per band: $bands")
  }
}
