package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** THE shared document-enrichment path for every dedup surface: the
  * batch queries (`d3_minhash_lsh`, `d8_bloom_incremental`,
  * `d10_incremental_lsh`), the maintained [[graft.api.DedupIndex]]
  * store, and the streaming candidate generator
  * ([[graft.streaming.EventStream.streamingNearDupCandidates]]).
  *
  * Why one module: the tokenize → shingle → minhash → band pipeline
  * and the fingerprint → Bloom-position mapping are JOIN KEYS across
  * those surfaces — a batch-built index is probed by a streaming
  * ingest, a streamed candidate is verified by a batch join. Any two
  * surfaces that compute the family differently (another shingle
  * width, another band count, another hash seed) silently stop
  * matching each other's keys and admit duplicates while every
  * per-surface test stays green. Centralizing the constants and the
  * column builders makes that drift impossible by construction, and
  * `DedupSurfacesSpec` pins the cross-surface equality on a shared
  * corpus.
  *
  * Evaluation discipline: shingling and minhashing use higher-order
  * lambdas, whose bodies re-evaluate non-attribute argument
  * expressions once PER ELEMENT ACCESS — so the token array and the
  * fingerprint array must each be bound to a named column before the
  * next stage consumes them (the O(n²)-per-doc trap the round-4 bench
  * caught). The multi-stage builders here are therefore DataFrame
  * transformers that do that binding internally; the Column-level
  * helpers are only the lambda-free pieces that are safe unbound.
  *
  * All builders are codegen'd column expressions (no UDFs) and have
  * exact DuckDB mirrors (see the `d3`/`d8`/`d10` oracle SQL), so the
  * family is cross-engine deterministic.
  */
object DedupEnrich {

  /** Word-shingle width of the near-dup family (the d2/d3/d10 k). */
  val ShingleK = 3

  /** MinHash signature length. */
  val NHashes = 8

  /** Band width: NHashes/RowsPerBand = 4 band keys per document. */
  val RowsPerBand = 2

  /** Bloom hash count (slots probed per exact fingerprint). */
  val BloomK = 4

  /** Build-side wrapper for the groupBy + join-back shape (d1/d4/pl13/
    * pl16): `graft.joinback.strategy=shuffle_hash` hints the build side
    * so the probe STREAMS through a hash join instead of paying a
    * sort-merge sort of the mega-dup partition — the at-scale setting
    * for corpora where the groups table exceeds the broadcast
    * threshold (AQE's skew split structurally cannot engage on this
    * shape: the groups aggregate is co-partitioned with the join key,
    * which breaks OptimizeSkewedJoin's pattern — SkewJoinSpec pins
    * both facts).
    *
    * Default `auto` leaves the planner's size-based choice (broadcast
    * at test scale). MEASURED caveat (BENCH_AB, round-robin reps at
    * sf0.1 local[32] — the committed artifact's numbers): the
    * broadcast default is NOT locally fastest — d1 broadcast 0.49 s
    * min / 0.55 median vs shuffle_hash 0.32/0.34 and even sort-merge
    * 0.43/0.46 — because local[32]'s "shuffle" is an in-process
    * memory copy while broadcast pays a real collect-to-driver +
    * rebuild. What broadcast buys is the
    * ELIMINATED PROBE-SIDE EXCHANGE, a cost class that only exists on
    * a real cluster where the probe is a corpus-wide network shuffle —
    * exactly what a 1000-executor run avoids by broadcasting a
    * fits-in-memory groups side. `auto` therefore stays the default
    * (the planner's broadcast pick is right where it matters and its
    * local premium is fractions of a second); the conf exists for the
    * corpus-scale case where the groups side CANNOT broadcast and the
    * planner would otherwise sort the mega-dup partition. */
  def joinBackBuild(groups: DataFrame): DataFrame =
    if (groups.sparkSession.conf
      .get("graft.joinback.strategy", "auto") == "shuffle_hash")
      groups.hint("shuffle_hash")
    else groups

  /** Token width of the exact substring-dedup windows (the d9 /
    * Lee et al. 2022 W). */
  val WindowW = 16

  /** Whole-document exact-dup fingerprint: md5 of the sorted distinct
    * token bag (the d1/d8 normalization — case/punctuation/word-order
    * insensitive). Lambda-free, so safe to use unbound. */
  def exactFp(text: Column): Column = exactFpFromToks(TextOps.tokens(text))

  /** [[exactFp]] over an already-bound token-array column. */
  def exactFpFromToks(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Distinct word-[[ShingleK]]-shingle set over an already-bound
    * token-array column. NEVER empty: a doc shorter than K tokens
    * collapses to one whole-doc shingle (see [[TextOps.shingles]]), so
    * two distinct short docs still get distinct shingle sets — not a
    * shared degenerate key. `toks` MUST be an attribute (the shingle
    * lambda re-evaluates it per element otherwise) — use
    * [[withShingleSet]] when starting from raw text. */
  def shingleSetFromToks(toks: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.ShingleSetExpr(
      ColumnBridge.expression(toks), ShingleK))
  }

  /** The pre-round-19 higher-order-function composition of
    * [[shingleSetFromToks]] — retained as the equality REFERENCE the
    * NativeKernelsSpec pins the native kernel against (the oracle SQL
    * mirrors THIS construction). */
  private[graft] def shingleSetFromToksComposed(toks: Column): Column =
    array_distinct(TextOps.shingles(toks, ShingleK))

  /** Append the shingle-set column `out` from raw text, binding the
    * token array to an attribute in between. */
  def withShingleSet(df: DataFrame, textCol: String,
      out: String = "sh"): DataFrame =
    df.withColumn("_de_toks", TextOps.tokens(col(textCol)))
      .withColumn(out, shingleSetFromToks(col("_de_toks")))
      .drop("_de_toks")

  /** Append BOTH the exact fingerprint and the shingle set from raw
    * text off one token binding (the [[graft.api.DedupIndex]] shape:
    * its Bloom leg keys on `fp`, its band leg on `sh`). */
  def withFpAndShingles(df: DataFrame, textCol: String,
      fpOut: String = "fp", shOut: String = "sh"): DataFrame =
    df.withColumn("_de_toks", TextOps.tokens(col(textCol)))
      .withColumn(fpOut, exactFpFromToks(col("_de_toks")))
      .withColumn(shOut, shingleSetFromToks(col("_de_toks")))
      .drop("_de_toks")

  /** The [[BloomK]] Bloom slot positions of an exact fingerprint under
    * slot count `m` — k independent md5-derived 32-bit draws reduced
    * mod m. May contain repeats (a position occupied twice is one slot
    * set twice); callers that count membership hits must distinct
    * first. Lambda-free. */
  def bloomPositions(fp: Column, m: Column): Column =
    array((0 until BloomK).map(i =>
      conv(substring(md5(concat(fp, lit(s":$i"))), 1, 8), 16, 10)
        .cast("long") % m): _*)

  /** EVERY [[WindowW]]-token window occurrence over an already-bound
    * token-array column, with its 1-based start position — an
    * `array<struct<pos:int, h:string>>` (empty for docs shorter than
    * W). This is the ONE window-hash construction (md5 of the
    * space-joined W-token slice): [[windowHashesFromToks]] derives
    * its distinct set from it, and the d14 rewrite consumes the
    * positioned form directly — so the d9 counts, the maintained
    * [[graft.api.DedupIndex]] window leg, and what d14 REMOVES can
    * never disagree about what "a duplicated window" is (review
    * finding: an inline copy of the hash expression was the exact
    * drift class the phashKeyArray extraction fixed for media keys).
    * `toks` MUST be an attribute (W element lookups per position
    * re-evaluate it otherwise). */
  def windowOccurrencesFromToks(toks: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.WindowOccurrencesExpr(
      ColumnBridge.expression(toks), WindowW))
  }

  /** The pre-round-19 higher-order-function composition of
    * [[windowOccurrencesFromToks]] — retained as the equality
    * REFERENCE the NativeKernelsSpec pins the native kernel against
    * (the d9/d14 oracle SQL mirrors THIS construction). */
  private[graft] def windowOccurrencesFromToksComposed(toks: Column): Column =
    when(size(toks) >= WindowW,
      transform(sequence(lit(0), size(toks) - WindowW), i =>
        struct((i + 1).as("pos"),
          md5(concat_ws(" ",
            (0 until WindowW).map(j => element_at(toks, i + j + 1)): _*))
            .as("h"))))
      .otherwise(array().cast("array<struct<pos:int,h:string>>"))

  /** DISTINCT md5 hashes of every [[WindowW]]-token window over an
    * already-bound token-array column — the d9 / Lee et al. exact
    * substring-dedup granularity (a window repeated INSIDE one doc
    * counts once; a doc shorter than W tokens legitimately has zero
    * windows, unlike the shingle path, because a partial window is
    * not an exact W-token match). Derived from
    * [[windowOccurrencesFromToks]] — one construction. Shared
    * by the `d9_substring_dedup` query and the maintained
    * [[graft.api.DedupIndex]] window leg, so batch and incremental
    * window verdicts key identically. */
  def windowHashesFromToks(toks: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.WindowHashesExpr(
      ColumnBridge.expression(toks), WindowW))
  }

  /** The pre-round-19 composition of [[windowHashesFromToks]] — the
    * NativeKernelsSpec equality reference. */
  private[graft] def windowHashesFromToksComposed(toks: Column): Column =
    array_distinct(transform(windowOccurrencesFromToksComposed(toks),
      x => x.getField("h")))

  /** Append the window-hash column `out` from raw text, binding the
    * token array to an attribute in between. */
  def withWindowHashes(df: DataFrame, textCol: String,
      out: String = "ws"): DataFrame =
    df.withColumn("_de_toks", TextOps.tokens(col(textCol)))
      .withColumn(out, windowHashesFromToks(col("_de_toks")))
      .drop("_de_toks")

  /** Append fingerprint, shingle set, AND window hashes off ONE token
    * binding — the window-enabled [[graft.api.DedupIndex]] shape.
    * Tokenizing is the per-doc linear pass every derived key shares;
    * a window-enabled ingest that composed [[withFpAndShingles]] and
    * [[withWindowHashes]] separately would run it twice per document
    * on the streaming hot path. Column-for-column identical to that
    * composition (DedupSurfacesSpec pins it). */
  def withFpShinglesWindows(df: DataFrame, textCol: String,
      fpOut: String = "fp", shOut: String = "sh",
      wsOut: String = "ws"): DataFrame =
    df.withColumn("_de_toks", TextOps.tokens(col(textCol)))
      .withColumn(fpOut, exactFpFromToks(col("_de_toks")))
      .withColumn(shOut, shingleSetFromToks(col("_de_toks")))
      .withColumn(wsOut, windowHashesFromToks(col("_de_toks")))
      .drop("_de_toks")

  /** The hot-band-GUARDED batch pair rollup (the `d12_guarded_batch_
    * pairs` shape, shared with the cross-surface specs): over an
    * enriched frame carrying `doc_id`, `bands` (from [[withBandKeys]])
    * and `sh` (from [[withShingleSet]]), resolve the hot band set
    * (>= `hotThreshold` distinct docs) from a counts aggregate FIRST,
    * flag every doc holding a hot band `band_saturated` via a
    * semi-join, generate candidate pairs by self-joining the
    * anti-joined COLD remainder only, verify with exact Jaccard >=
    * `minJaccard`, and roll up per doc. Output: one row per doc with
    * any signal — (doc_id, band_saturated, n_dups, partners).
    *
    * Batch-vs-incremental semantics (pinned by DedupSurfacesSpec):
    * this WHOLE-CORPUS form is order-independent — EVERY doc holding a
    * hot band flags — while the maintained index / streaming state,
    * driven arrival-by-arrival, emit pairs until the band reaches the
    * threshold and flag only the arrivals after it. The batch flags
    * are therefore a SUPERSET of the incremental flags on the same
    * corpus and thresholds, and any pair the guard suppresses has
    * both endpoints flagged — over-approximation on every surface,
    * never a hidden dup. */
  def guardedBatchRollup(base: DataFrame, hotThreshold: Long,
      minJaccard: Double = 0.3): DataFrame = {
    val keys = base.select(col("doc_id").as("id"),
      explode(col("bands")).as("key"))
    val (sat, pairs) = guardedCandidatePairs(keys, hotThreshold)
    val sets = base.select(col("doc_id"), col("sh"))
    val ver = pairs
      .join(sets.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .filter(TextOps.jaccard(col("sha"), col("shb")) >= minJaccard)
      .select("a", "b")
    saturationRollup(sat, ver, "doc_id", "band_saturated")
  }

  /** The guard CORE, generalized over the blocking-key family: from a
    * `(id, key)` frame (one row per id per blocking key — MinHash
    * bands, hyperplane (table, bucket) cells, any equi-join blocking
    * scheme), resolve the hot keys (>= `hotThreshold` distinct ids)
    * from a counts aggregate FIRST, and return (saturated ids — every
    * id holding a hot key, via semi-join; candidate pairs — the
    * self-join of the anti-joined COLD remainder only). The O(h²)
    * explosion of a hot key is structurally unproducible: the key
    * never reaches the pair join. Callers verify the cold pairs with
    * their own similarity (Jaccard for shingles, cosine for vectors)
    * and roll up with [[saturationRollup]]. */
  def guardedCandidatePairs(keys: DataFrame, hotThreshold: Long)
      : (DataFrame, DataFrame) = {
    val hot = keys.groupBy("key")
      .agg(countDistinct(col("id")).as("cnt"))
      .filter(col("cnt") >= hotThreshold)
      .select("key")
    val sat = keys.join(hot, Seq("key"), "left_semi")
      .select("id").distinct()
    val cold = keys.join(hot, Seq("key"), "left_anti")
    val pairs = cold.select(col("id").as("a"), col("key"))
      .join(cold.select(col("id").as("b"), col("key")), Seq("key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    (sat, pairs)
  }

  /** PRODUCTION derivation of a guard's hot threshold from the
    * key-occupancy distribution — the formula the fixture constants
    * (`Dedup.BatchHotBands` = 3, `Dedup.EmbHotBucket` = 8) stand in
    * for at test scale:
    *
    *   H = max(floor, ceil(slack × quantile_q(occupancy)))
    *
    * with q = 0.5 (MEDIAN) and slack = 4 by default: the median is
    * robust against the hot tail itself (a p99 on a corpus whose
    * templates ARE the tail would chase the spike it is meant to
    * catch), and 4× median occupancy is far outside natural bucket
    * variance on a provisioned blocking scheme (median ≈ 1-2 when
    * planes/bands are sized to the corpus) while orders of magnitude
    * below a template flood. The occupancy frame is the SAME
    * `(key → countDistinct id)` aggregate the guard computes — callers
    * that cache `keys` (the d12/d13 discipline) pay one extra
    * reduction over the cached frame, nothing corpus-sized. The
    * quantile runs at a SMALL nonzero relative error (0.001 —
    * Greenwald-Khanna's bounded-memory sketch; zero error forces the
    * exact-quantile algorithm, which at corpus scale over all blocking
    * keys is substantially heavier than the one driver-side double
    * this is). Honesty note: the 0.001 bound is on RANK, not value —
    * on a discrete occupancy distribution whose median rank sits
    * within 0.1% of a mass boundary (e.g. a corpus that is ~half
    * templated), the sketch may resolve to either side of the jump,
    * and the result can vary with partition layout. That regime is
    * ambiguous for ANY median-based provisioning rule (the "median" of
    * such a corpus is a coin flip by construction); operators who need
    * an exact, reproducible threshold there use the integer override —
    * `graft.dedup.hotThreshold=<int>` — which is also the production
    * answer once a corpus's occupancy profile is known. On every
    * normal profile (cold mass far from hot tail) the 0.1% rank error
    * cannot move the median off its plateau and the derivation is
    * deterministic. Queries expose this through
    * `graft.dedup.hotThreshold=fixture|auto|<int>`; DedupSurfacesSpec
    * pins that on a templated flood the derived H flags exactly the
    * planted hot band's docs and no cold ones. */
  def deriveHotThreshold(keys: DataFrame, floor: Long = 2,
      quantile: Double = 0.5, slack: Double = 4.0): Long =
    deriveHotThresholdFromCounts(
      keys.groupBy("key")
        .agg(countDistinct(col("id")).cast("double").as("cnt")),
      floor, quantile, slack)

  /** [[deriveHotThreshold]] over an ALREADY-AGGREGATED per-key
    * occupancy frame (one `cnt` row per key) — for callers that
    * maintain the counts as state (the [[graft.api.DedupIndex]]
    * lifetime `bcnt`), where re-deriving from raw (id, key) rows is
    * impossible (history holds counts, not ids) and, calibration-wise,
    * WRONG: the guard triggers on the summed lifetime count, so the
    * threshold must be derived from that same distribution. */
  def deriveHotThresholdFromCounts(occ: DataFrame, floor: Long = 2,
      quantile: Double = 0.5, slack: Double = 4.0): Long =
    // approxQuantile returns an EMPTY array on an empty frame — an
    // empty corpus slice must resolve to the floor, not crash
    occ.stat.approxQuantile("cnt", Array(quantile), 0.001) match {
      case Array(q) => math.max(floor, math.ceil(q * slack).toLong)
      case _ => floor
    }

  /** Conf-gated hot-threshold resolution for the guard family — ONE
    * resolver for every guarded surface (d12, d13, the pl16 funnel's
    * fuzzy stage): `graft.dedup.hotThreshold` = `fixture` (default —
    * the caller's pinned constant, which the oracle SQL embeds),
    * `auto` (the [[deriveHotThreshold]] median-occupancy formula over
    * the SAME `(id, key)` counts aggregate the guard computes), or an
    * integer override. `keys` is by-name: the derivation's reduction
    * runs only in auto mode. A malformed value THROWS (unlike the
    * engine-choice confs below, where a parse failure degrades to a
    * default with identical output): the threshold changes guard
    * VERDICTS, so a typo like `Auto` or `10_000` silently running the
    * fixture constant would be a silent semantic change — the one
    * failure mode this family's fail-loudly discipline exists to
    * prevent (review finding). */
  def hotThresholdFor(s: org.apache.spark.sql.SparkSession,
      fixture: Long, keys: => DataFrame): Long =
    // trimmed BEFORE matching: a conf set from a shell/yaml with
    // trailing whitespace must not silently fall through "auto" into
    // the fixture branch (review finding)
    s.conf.get("graft.dedup.hotThreshold", "fixture").trim match {
      case "fixture" => fixture
      case "auto" => deriveHotThreshold(keys)
      case v => scala.util.Try(v.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"graft.dedup.hotThreshold must be 'fixture', 'auto', or an " +
            s"integer — got '$v'"))
    }

  /** Defensive integer-conf parse for ENGINE-CHOICE knobs (size gates,
    * iteration caps — settings where every value yields identical
    * output): a malformed value logs a warning and falls back to the
    * default rather than crashing every caller (the r15 ADVICE
    * discipline for `graft.cc.localEdgeLimit`, now one helper instead
    * of three drift-prone inline copies — review finding). The result
    * is parsed as a LONG and clamped to Int.MaxValue - 1 HERE, not at
    * call sites, because the size-gate callers all probe with
    * `limit(n + 1)` and an un-clamped Int.MaxValue would overflow the
    * sentinel into a negative limit (second review finding — the clamp
    * itself was starting to copy-paste; the long parse closes the r16
    * ADVICE gap where an oversized value like '9999999999' failed
    * toInt and took the malformed-fallback path instead of clamping).
    * Semantic confs (values that change
    * RESULTS, e.g. `graft.dedup.hotThreshold`) must NOT route through
    * this: they fail loudly instead (see [[hotThresholdFor]]). */
  private[graft] def confInt(s: org.apache.spark.sql.SparkSession,
      key: String, default: Int): Int =
    scala.util.Try(s.conf.get(key, default.toString).trim.toLong)
      .map(v =>
        math.max(Int.MinValue.toLong, math.min(Int.MaxValue - 1L, v)).toInt)
      .getOrElse {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"malformed $key='${s.conf.get(key, "")}' - falling back to " +
            s"the default $default")
        default
      }

  /** Min-label propagation WITH POINTER DOUBLING to fixpoint over an
    * undirected pair graph — the connected-components step of a dedup
    * pass (`d6_dedup_groups`, the pl16 funnel's fuzzy stage,
    * `g3_connected_components`): from verified pairs `(a, b)` — the
    * first two columns MUST be literally named `a` and `b` (required,
    * not assumed: every caller builds the frame, so a misnamed frame
    * is a bug worth failing on, not silently mislabeling) — returns
    * one `(node, component)` row per node appearing in any pair, where
    * `component` is the MINIMUM id reachable from the node (the
    * deterministic canonical-survivor convention: the component min
    * survives). Nodes in no pair are absent — trivially their own
    * survivors.
    *
    * EAGER, two execution paths with identical output (spec-pinned):
    * a size-gated driver-local union-find when the whole edge list
    * fits under `graft.cc.localEdgeLimit` (see the inline note — zero
    * job rounds), else a driver loop of Spark jobs. Each distributed
    * iteration takes the min over THREE candidates per node: its
    * current label, its neighbors' labels (one join + one aggregate —
    * classic min-label, O(diameter) alone), and its LABEL'S label
    * (one self-equi-join of the label table — pointer doubling). The
    * shortcut at least doubles the covered distance per round, so the
    * loop converges in O(log diameter) rounds: a 10⁶-diameter chain
    * (gradually-edited boilerplate is exactly how crawl corpora grow
    * long thin near-dup chains) labels in ~21 rounds where linear
    * propagation needs 10⁶. Every candidate label is an id REACHABLE
    * from the node (reachability is transitive through the pointer
    * hop), so the fixpoint is exactly the component min — and the two
    * paths stay equality-pinned on randomized graphs.
    *
    * NON-CONVERGENCE IS LOUD: the 50-round cap is a runaway backstop
    * (2⁵⁰ diameter — unreachable), and if the loop somehow exits with
    * changes still pending it THROWS rather than returning silently
    * SPLIT components (the r15 verdict's at-scale edge: split
    * components mean over-retention in the funnel and wrong group
    * sizes in d6/g3). Skew note: both per-round joins key on the
    * current label, so a giant component concentrates its probe rows
    * on one key late in the loop — the joins are plain shuffle
    * equi-joins, which AQE's skew split handles (unlike the
    * groupBy+join-back shape, there is no co-partitioned aggregate in
    * the way). Each iteration localCheckpoints to truncate lineage;
    * the convergence count is the one driver-side action (the d6
    * loop-control discipline). `parts` sizes the iteration frames
    * (callers pass [[graft.queries.IterSizing.iterParts]]). */
  def minLabelComponents(pairs: DataFrame, parts: Int): DataFrame = {
    require(pairs.columns.length >= 2 &&
      pairs.columns(0) == "a" && pairs.columns(1) == "b",
      s"minLabelComponents requires the first two columns to be named " +
        s"(a, b) — got (${pairs.columns.take(2).mkString(", ")})")
    // SIZE-GATED fast path (the learnBpeLocal discipline applied to
    // the CC loop): each distributed iteration is a full Spark job
    // round (joins + aggregate + convergence count + checkpoint), pure
    // cadence on the small graphs a verified near-dup pass usually
    // yields (48 pairs at sf0.1). A bounded limit(N+1) collect probes
    // the size WITHOUT a separate count pass: if the whole edge list
    // fits under `graft.cc.localEdgeLimit` (default 100k pairs — a few
    // MB), a driver-local min-rooted union-find produces the IDENTICAL
    // (node, component) table in microseconds with ZERO further job
    // rounds. At 100 TB the verified graph CAN exceed any driver
    // (billions of edges) — the distributed loop below stays the
    // fallback, and conf=0 forces it (the equality specs drive both
    // paths on one graph). Long-typed ids only (all current callers);
    // other key types take the distributed path.
    // project to the two contract columns ONCE, so a frame carrying
    // extra columns behaves identically on both paths (the distributed
    // unionAll below would otherwise reject what the fast path
    // accepted — review finding)
    val ab = pairs.select(col("a"), col("b"))
    val s = pairs.sparkSession
    // a malformed conf value falls back to the default limit rather
    // than crashing every CC caller (d6, g3, pl16) — ADVICE r15;
    // confInt also clamps, so the +1 sentinel probe cannot overflow
    val localLimit = confInt(s, "graft.cc.localEdgeLimit", 100000)
    val longTyped = ab.schema.fields.take(2)
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (longTyped && localLimit > 0) {
      val head = ab.limit(localLimit + 1).collect()
      if (head.length <= localLimit) {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) {
            val n = parent(c); parent(c) = r; c = n
          }
          r
        }
        head.foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        val nodes = head.iterator
          .flatMap(r => Iterator(r.getLong(0), r.getLong(1)))
          .toArray.distinct
        import s.implicits._
        return nodes.map(n => (n, find(n))).toSeq.toDF("node", "component")
      }
    }
    val edges = ab
      .unionAll(ab.select(col("b").as("a"), col("a").as("b")))
      .coalesce(parts).cache()
    // deterministic checkpoint lifecycle (r16 verdict hygiene item):
    // each round's localCheckpoint is a persisted RDD that Spark only
    // reclaims when the ContextCleaner GCs the frame — a long loop
    // would hold every superseded round's blocks in storage memory
    // until then. Once `changed` has MATERIALIZED the next round's
    // checkpoint, the previous round's blocks are unreachable from any
    // live plan, so they are released explicitly; `edges` and (on a
    // failure path only) the in-flight checkpoint release in the
    // finally. The one survivor is the RETURNED frame's own
    // checkpoint — the caller consumes it. The try opens BEFORE the
    // initial checkpoint job so a failure there cannot leak the
    // already-computed edges cache (review finding).
    import org.apache.spark.sql.graftbridge.RddBridge
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    var converged = false
    var changed = 1L
    var iter = 0
    try {
      var labels = edges.select(col("a").as("node")).distinct()
        .withColumn("component", col("node"))
        .coalesce(parts).localCheckpoint()
      prevCkpt = RddBridge.checkpointedRdd(labels)
      // 50 rounds is a RUNAWAY backstop, not a correctness bound: with
      // the pointer-doubling shortcut the loop needs ~log2(diameter)
      // rounds (50 covers diameter 2^50), where the pre-r16 linear loop
      // needed one round PER unit of diameter and exited silently split
      // past the cap — the r15 verdict's at-scale edge, now loud below.
      // Conf-able ONLY so the spec can PIN the loud-failure contract
      // (an artificially small cap on a long chain must throw, never
      // return split components); production has no reason to touch it
      val maxIters = confInt(s, "graft.cc.maxRounds", 50)
      while (changed > 0 && iter < maxIters) {
        val viaNeighbors = edges
          .join(labels.withColumnRenamed("node", "a"), "a")
          .groupBy(col("b").as("node"))
          .agg(min(col("component")).as("ncomp"))
        // pointer doubling: adopt label(label(node)) too — every label
        // value is itself a node in the table (labels start as node →
        // node and only ever adopt other labels), so the self-equi-join
        // resolves for every row; the left join + coalesce is belt and
        // braces, not a reachable branch
        val ptr = labels.select(col("node").as("component"),
          col("component").as("pcomp"))
        // lazy checkpoint: the convergence-count action materializes it
        val next = labels.join(viaNeighbors, Seq("node"), "left")
          .join(ptr, Seq("component"), "left")
          .select(col("node"),
            least(col("component"),
              coalesce(col("ncomp"), col("component")),
              coalesce(col("pcomp"), col("component"))).as("component"),
            (least(coalesce(col("ncomp"), col("component")),
              coalesce(col("pcomp"), col("component"))) < col("component"))
              .as("chg"))
          .coalesce(parts).localCheckpoint(false)
        changed = next.filter(col("chg")).count()
        // next's checkpoint is materialized — the previous round's
        // blocks are now unreachable; release them
        prevCkpt.foreach(_.unpersist(blocking = false))
        prevCkpt = RddBridge.checkpointedRdd(next)
        labels = next.drop("chg")
        iter += 1
      }
      if (changed > 0)
        throw new IllegalStateException(
          s"minLabelComponents did not converge within $maxIters rounds " +
            s"($changed labels still changing) — refusing to return split " +
            "components (they would silently over-retain near-dups); at " +
            "the default cap the pointer-doubled loop covers diameter " +
            "2^50, so this indicates a bug, a non-Long id pathology, or " +
            "an artificially low graft.cc.maxRounds")
      converged = true
      labels
    } finally {
      edges.unpersist(blocking = false)
      if (!converged) prevCkpt.foreach(_.unpersist(blocking = false))
    }
  }

  /** Per-id rollup of a guard's two legs: `sat` (ids holding a hot
    * key) and `ver` (verified cold pairs) → one row per id with any
    * signal: (idOut, flagOut, n_dups, partners-csv).
    *
    * `ver` need not be pair-distinct: the directed (id, partner) rows
    * are deduplicated here before counting, so `n_dups` always equals
    * the partner-list length (the count/list invariant the specs pin)
    * even for a caller that skips its own `.distinct()` — relying on
    * every caller to pre-dedupe was a silent-contract trap (the r14
    * advice finding). */
  def saturationRollup(sat: DataFrame, ver: DataFrame,
      idOut: String, flagOut: String): DataFrame = {
    val flagged = sat.withColumn("sat", lit(1))
    val partners = ver.select(col("a").as("id"), col("b").as("p"))
      .unionAll(ver.select(col("b").as("id"), col("a").as("p")))
      .distinct()
      .groupBy("id").agg(
        count(lit(1)).as("n_dups"),
        concat_ws(",",
          transform(array_sort(collect_set(col("p"))),
            x => x.cast("string"))).as("partners"))
    flagged.join(partners, Seq("id"), "full_outer")
      .select(col("id").as(idOut),
        coalesce(col("sat"), lit(0)).as(flagOut),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("partners"), lit("")).as("partners"))
  }

  /** Append the MinHash band-key array (`array<string>`, one md5 key
    * per band) derived from the shingle-set column `shCol`, binding
    * the per-shingle fingerprints and the signature to named columns
    * between stages (see the evaluation-discipline note above).
    *
    * Null-signature guard: if the shingle set were ever empty or null
    * (not producible through [[shingleSetFromToks]], but reachable if
    * a caller hands a pre-built set), `array_min` over it is null and
    * the band md5s would collapse to per-band CONSTANTS shared by
    * every such doc — an ever-growing everything-matches-everything
    * bucket in a maintained index. Guarded: those docs emit an EMPTY
    * band array (no keys, no candidates) instead. */
  def withBandKeys(df: DataFrame, shCol: String,
      out: String = "bands"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val (as, bs) = MinHash.coeffs(NHashes).unzip
    df.withColumn(out, ColumnBridge.column(graft.plans.MinHashBandKeysExpr(
      ColumnBridge.expression(col(shCol)),
      as.toIndexedSeq, bs.toIndexedSeq, RowsPerBand, MinHash.Prime,
      MinHash.Sep)))
  }

  /** The pre-round-19 higher-order-function composition of
    * [[withBandKeys]] — retained as the equality REFERENCE the
    * NativeKernelsSpec pins the native kernel against (the oracle SQL
    * mirrors THIS fingerprints → signature → band-keys chain). */
  private[graft] def withBandKeysComposed(df: DataFrame, shCol: String,
      out: String = "bands"): DataFrame =
    df.withColumn("_de_fpr", MinHash.shingleFingerprints(col(shCol)))
      .withColumn("_de_sig", MinHash.signature(col("_de_fpr"), NHashes))
      .withColumn(out,
        when(element_at(col("_de_sig"), 1).isNotNull,
          MinHash.bandKeys(col("_de_sig"), NHashes, RowsPerBand))
          .otherwise(array().cast("array<string>")))
      .drop("_de_fpr", "_de_sig")
}
