package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenizer-fit step of the training-data story (curate → mix →
  * shard → TRAIN TOKENIZER), shared between the registered
  * `pl18_bpe_merges` query and its specs.
  *
  * Declared adaptations: symbols are the characters of each
  * whitespace-split token (no end-of-word marker — [[TextOps.tokens]]'
  * [a-z0-9]+ alphabet is already word-bounded, so merges never cross a
  * word), and the merge count is a fixed small constant (the operator
  * learns the FIRST [[NMerges]] merges; a production vocabulary runs
  * the same loop tens of thousands of times — the per-iteration cost
  * model is what matters and is identical).
  *
  * Determinism, cross-engine: the per-iteration argmax is totally
  * ordered (count DESC, then left/right symbol ASC — binary ASCII in
  * both engines over this alphabet), and merge application is the
  * same greedy left-to-right fold in both engines (Spark `aggregate`,
  * DuckDB `list_reduce`): scan symbols left to right, merge when
  * (last(acc), next) equals the pair; the merged symbol becomes the
  * new last element and participates in further merges exactly as BPE
  * specifies ([a,a,a] under (a,a) → [aa,a] — FunctionsSpec pins it).
  *
  * Scale shape: the corpus is touched ONCE (word-frequency aggregate);
  * every iteration runs over the VOCABULARY (distinct words), which is
  * orders of magnitude smaller than the corpus and bounded by the
  * language, not the data size. The per-iteration pair count is a
  * map-side-combinable hash aggregate (PlanSpec pins it) and the
  * driver round-trip is ONE (pair, count) row per iteration — the
  * same bounded loop-control collect as d6's convergence count.
  */
object BpeOps {

  /** Merges learned by `pl18_bpe_merges` (fixture-sized; see above).
    *
    * JOB-CADENCE BOUND (the honest production constraint): each merge
    * of the distributed loop is one full Spark job round — a pair-count
    * aggregate, a 1-row argmax collect, and a checkpointed merge
    * application — a FIXED ~0.3-0.4 s of scheduling latency at sf0.1
    * regardless of data size (SCALING.json: pl18 is ~77% fixed
    * overhead). At a production merge count (30k+ for a real
    * vocabulary) that is HOURS of pure cadence no matter how small the
    * corpus: the driver loop, not the data, is the bound. The
    * production claw-back is [[learnBpeLocal]]: the vocabulary is
    * BOUNDED by the language (the same argument that makes the d6 CC
    * loop's collect legitimate), so after the one corpus-sized
    * word-frequency pass the collected (word, freq) table fits the
    * driver and the remaining 30k iterations are pure in-memory work.
    * MEASURED (BENCH_AB, round-robin at sf0.1 local[32]): distributed
    * loop 5.91 s min / 7.06 median vs collect-then-fit 5.24/5.44 —
    * the shared corpus+funnel pass dominates both, and the delta is
    * the loop itself, ~0.07-0.16 s PER MERGE of pure cadence on an
    * idle local box (a real cluster's scheduling latency is higher):
    * at 30k merges, 35 minutes to 1.4 hours of overhead that the
    * local fit replaces with in-memory milliseconds. The registered
    * query DEFAULTS to the distributed loop because it is the
    * oracle-checkable per-iteration cost model and exercises the
    * map-side pair-count shape a sharded fit would reuse — and since
    * round 16 the production form is conf-reachable inside pl18/pl19
    * (`graft.bpe.strategy=local`, via [[fitBpeLocal]]); PipelineSpec
    * pins that both strategies produce identical query output. */
  val NMerges = 10

  /** Driver-local BPE fit over a COLLECTED (word, freq) vocabulary —
    * the production form of the merge loop once the one corpus pass
    * has reduced the data to its language-bounded vocabulary (see the
    * cadence note on [[NMerges]]). Merge-for-merge identical to the
    * distributed loop by construction: same pair counting (adjacent
    * pairs, word-frequency weighted, multiplicity within a word), same
    * total argmax order (count DESC, lhs ASC, rhs ASC — JVM String
    * ordering is binary, matching both engines on this alphabet), same
    * greedy left-to-right merge fold as [[applyMerge]]; PipelineSpec
    * pins equality against the registered pl18 output on the real
    * survivor vocabulary. Stops early when the pair space is exhausted
    * (the loop's `live = false` semantics). */
  def learnBpeLocal(vocab: Seq[(String, Long)], nMerges: Int = NMerges)
      : Seq[(Int, String, String, Long)] =
    fitBpeLocal(vocab, nMerges)._2

  /** The full driver-local fit: [[learnBpeLocal]]'s loop, ALSO
    * returning the final per-word (word, freq, syms) state — the
    * encode table pl19 consumes. One return value per input word, in
    * input order; the state falls out of the fit for free (each merge
    * is applied to learn the next one), so the
    * `graft.bpe.strategy=local` path never re-applies the merge table.
    */
  def fitBpeLocal(vocab: Seq[(String, Long)], nMerges: Int = NMerges)
      : (Seq[(String, Long, Seq[String])], Seq[(Int, String, String, Long)]) = {
    // symbolize by CODE POINT, not UTF-16 unit: Spark's substr (and
    // DuckDB's substr) count characters, so a supplementary-plane char
    // is ONE symbol there — w.map(_.toString) would split it into two
    // unpaired surrogate halves and silently break the equality
    // contract off the fixture alphabet
    var syms: Array[(Array[String], Long)] = vocab.map { case (w, f) =>
      (if (w.isEmpty) Array.empty[String]
       else w.codePoints().toArray
         .map(cp => new String(Character.toChars(cp))), f)
    }.toArray
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var k = 1
    var live = true
    while (k <= nMerges && live) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (ss, f) =>
        var i = 0
        while (i < ss.length - 1) {
          val key = (ss(i), ss(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) live = false
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        merges += ((k, a, b, c))
        syms = syms.map { case (ss, f) => (applyMergeLocal(ss, a, b), f) }
        k += 1
      }
    }
    val state = vocab.iterator.zip(syms.iterator)
      .map { case ((w, f), (ss, _)) => (w, f, ss.toSeq) }.toSeq
    (state, merges.result())
  }

  /** Driver-local mirror of [[applyMerge]]'s greedy fold. */
  private def applyMergeLocal(ss: Array[String], lhs: String,
      rhs: String): Array[String] =
    if (ss.isEmpty) ss
    else {
      val out = scala.collection.mutable.ArrayBuffer[String](ss(0))
      var i = 1
      while (i < ss.length) {
        if (out.last == lhs && ss(i) == rhs) out(out.length - 1) = lhs + rhs
        else out += ss(i)
        i += 1
      }
      out.toArray
    }

  /** Character-symbol array of a word — the level-0 BPE state. `word`
    * MUST be a bound attribute (the lambda re-evaluates non-attribute
    * expressions per element — the DedupEnrich discipline).
    *
    * Empty-word guard: Spark's two-arg `sequence(1, 0)` infers step -1
    * and yields [1, 0] — an UNGUARDED transform would emit ["", ""]
    * for an empty word while DuckDB's `generate_series(1, 0)` yields
    * [], a cross-engine divergence AND a degenerate ("", "") pair that
    * could win an argmax. TextOps.tokens never produces empty words,
    * but this builder is public to any vocabulary source. */
  def charSyms(word: Column): Column =
    when(length(word) > 0,
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))))
      .otherwise(array().cast("array<string>"))

  /** Adjacent-pair counts over a (syms, freq) vocabulary frame — the
    * aggregate each merge iteration argmaxes. Only ids-free narrow
    * data moves: (a, b, partial count) through a hash aggregate. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) > 1)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + lit(1)).as("b")))).as("pr"))
      .select(col("freq"), col("pr.a").as("a"), col("pr.b").as("b"))
      .groupBy("a", "b").agg(sum(col("freq")).as("c"))

  /** Greedy left-to-right application of ONE merge rule to a bound
    * symbol-array column (see the fold contract in the object doc).
    * Empty arrays pass through unchanged — the fold needs a first
    * element as its accumulator seed, and slice() rejects the -1
    * tail length an empty input would produce. */
  def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    when(size(syms) > 0,
      aggregate(
        slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
        array(element_at(syms, 1)),
        (acc, s) => when(element_at(acc, -1) === lit(lhs) && s === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(s)))))
      .otherwise(syms)

  /** DuckDB mirror of ONE merge level: CTEs `p{k}` (pair counts),
    * `m{k}` (the argmax merge row), `v{k}` (vocabulary with the merge
    * applied) over `v{k-1}`. `m{k}`/`v{k}` are MATERIALIZED: each
    * level references the previous one twice, and inlined CTEs would
    * expand the chain exponentially in k (measured: a 10-level
    * unmaterialized chain did not finish in 300 s; materialized it
    * runs in ~1 s at sf0.1). chr(1) is a safe pair separator — the
    * symbol alphabet is [a-z0-9]. The vocabulary carries `word` (the
    * encode consumers key on it) and each level LEFT-joins its merge
    * row: on a level whose pair space is EXHAUSTED (m{k} empty) the
    * vocabulary passes through UNCHANGED — a CROSS JOIN would blank
    * it, silently emptying every later level and any encode built on
    * the final state (the Spark loop's exhaustion `live = false` stop
    * has exactly these pass-through semantics). */
  def levelSql(k: Int): String = s"""
      p$k AS (
        SELECT string_split(pr, chr(1))[1] AS a, string_split(pr, chr(1))[2] AS b,
               CAST(SUM(freq) AS BIGINT) AS c
        FROM (SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
                     i -> syms[i] || chr(1) || syms[i+1])) AS pr
              FROM v${k - 1} WHERE len(syms) > 1)
        GROUP BY 1, 2),
      m$k AS MATERIALIZED (
        SELECT $k AS merge_rank, a AS lhs, b AS rhs, c AS pair_count
        FROM p$k ORDER BY c DESC, a ASC, b ASC LIMIT 1),
      v$k AS MATERIALIZED (
        SELECT word, freq,
               CASE WHEN lhs IS NULL THEN syms ELSE
                 list_reduce(list_transform(syms, s -> [s]),
                   (acc, x) -> CASE WHEN acc[len(acc)] = lhs AND x[1] = rhs
                               THEN list_concat(list_slice(acc, 1, len(acc) - 1), [lhs || rhs])
                               ELSE list_concat(acc, x) END) END AS syms
        FROM v${k - 1} LEFT JOIN m$k ON TRUE)"""

  /** The final union of the learned merge rows, rank-ascending. */
  def unionSql(n: Int): String =
    "SELECT merge_rank, lhs, rhs, pair_count FROM (" +
      (1 to n).map(k => s"SELECT * FROM m$k").mkString(" UNION ALL ") +
      ") ORDER BY merge_rank"
}
