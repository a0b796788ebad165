package graft

import org.apache.spark.sql.functions._

class QueriesSpec extends SparkSpec {

  test("every query runs on sf0.001 and is deterministic across two executions") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val r1 = fn(spark, Sf).collect()
      val r2 = fn(spark, Sf).collect()
      assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
        s"$name not deterministic")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys and non-empty") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs))
    assert(os.size >= 40, s"expected >=40 oracle-checked queries, got ${os.size}")
    // every registered query is oracle-checked — the media stub decode
    // became sha-derived (SQL-expressible) in round 4, closing the last
    // rows-only gap
    assert((qs -- os).isEmpty, s"queries without an oracle: ${qs -- os}")
  }

  private def assertRankedDescending(name: String): Unit = {
    val rows = SparkEntry.queries(name)(spark, Sf)
      .select("qid", "rank", "cosine").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.nonEmpty, s"$name returned nothing")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq,
        s"$name qid=$q ranks not contiguous")
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._3 >= y._3
        case _ => true
      }, s"$name qid=$q cosine not non-increasing with rank")
    }
  }

  test("LSH knn: candidates share the query's bucket and are correctly ranked") {
    assertRankedDescending("v2_knn_lsh")
    // bucket co-membership is definitional for the LSH path
    val e = Tables.embeddings(spark, Sf)
      .withColumn("bucket",
        graft.functions.VectorOps.hyperplaneBucket(col("embedding"), 64, 8))
    val buckets = e.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    SparkEntry.queries("v2_knn_lsh")(spark, Sf)
      .select("qid", "vec_id").collect()
      .foreach(r => assert(buckets(r.getLong(0)) == buckets(r.getLong(1)),
        s"LSH pair ${r.getLong(0)}->${r.getLong(1)} not in same bucket"))
  }

  test("IVF knn: correctly ranked, and every hit lives in one of the query's probed cells") {
    assertRankedDescending("v3_knn_ivf")
    // agreement with brute force is partial by design (bounded probes);
    // the 3-round Lloyd codebook over stratified seeds at NProbe=16
    // measures 18/21 at sf0.1 — pin a deterministic ≥ 3/4 floor
    val brute = SparkEntry.queries("v1_knn_bruteforce")(spark, Sf)
      .filter(col("rank") === 1)
      .select("qid", "vec_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = SparkEntry.queries("v3_knn_ivf")(spark, Sf)
      .filter(col("rank") === 1)
      .select("qid", "vec_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = ivf.count { case (q, v) => brute.get(q).contains(v) }
    assert(agree * 4 >= ivf.size * 3,
      s"IVF top-1 agreement $agree/${ivf.size} below the 3/4 floor")
  }

  test("dedup: d1 groups are genuine duplicates (same token bag)") {
    val rows = SparkEntry.queries("d1_exact_dedup")(spark, Sf).collect()
    if (rows.nonEmpty) {
      val byFp = rows.groupBy(_.getAs[String]("fp"))
      byFp.foreach { case (_, members) =>
        assert(members.length == members.head.getAs[Long]("group_size"))
        assert(members.count(_.getAs[Boolean]("is_canonical")) == 1)
      }
    }
  }

  test("w8: keyless forges are walk-caught; keyed head forges only registration-caught; keyed mid-chain forges are the reported detection boundary") {
    val rows = SparkEntry.queries("w8_payload_forge")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val forgedTotal = rows.map(_.getAs[Long]("n_forged")).sum
    assert(forgedTotal > 0, "fixture produced no forges")
    // the boundary is real AND reported: some keyed mid-chain forge
    // evades both the walk and the (length, head-hash) registration
    assert(rows.map(_.getAs[Long]("n_undetected")).sum > 0,
      "expected the keyed mid-chain tier to evade detection (the documented gap)")
    rows.foreach { r =>
      val lid = r.getAs[Long]("ledger_id")
      // a ledger never catches more than it was forged
      assert(r.getAs[Long]("n_walk_caught") <= r.getAs[Long]("n_forged"), s"ledger $lid")
      // undetected forges occur ONLY in the keyed mid-chain tier
      // (ledger_id % 5 == 2): keyless is always walk-caught (the
      // canonical hash is keyed), and a keyed HEAD forge always flips
      // the registered head hash
      if (r.getAs[Long]("n_undetected") > 0)
        assert(lid % 5 == 2,
          s"ledger $lid: undetected forge outside the keyed_mid tier")
    }
    // at least one keyed-head ledger demonstrates registration-only
    // detection: walk missed a forge, registration caught the ledger
    assert(rows.exists(r => r.getAs[Boolean]("registration_caught") &&
      r.getAs[Long]("n_walk_caught") < r.getAs[Long]("n_forged")),
      "no ledger exhibits registration-only detection of a keyed head forge")
  }

  test("w9: the recursive chain digest closes w8's keyed mid-chain boundary — zero undetected forges") {
    val rows = SparkEntry.queries("w9_chain_digest")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val midLedgers = rows.filter(_.getAs[String]("forge_tier") == "keyed_mid")
    assert(midLedgers.nonEmpty, "fixture produced no keyed mid-chain forges")
    rows.foreach { r =>
      val lid = r.getAs[Long]("ledger_id")
      val forged = r.getAs[Long]("n_forged") > 0
      // the digest catches every forged ledger and ONLY forged ledgers
      assert(r.getAs[Boolean]("digest_caught") == forged, s"ledger $lid")
      // nothing evades: the boundary w8 reports is closed by the digest
      assert(!r.getAs[Boolean]("undetected"), s"ledger $lid: undetected forge")
      // the w7-style head registration still misses mid-chain forges —
      // the digest is strictly stronger, not redundantly equal
      if (r.getAs[String]("forge_tier") == "keyed_mid")
        assert(!r.getAs[Boolean]("head_reg_caught"),
          s"ledger $lid: head registration unexpectedly caught a mid forge")
      if (r.getAs[String]("forge_tier") == "keyed_head")
        assert(r.getAs[Boolean]("head_reg_caught"), s"ledger $lid")
    }
  }

  test("hash chain query: per user, exactly one chain head and each prev_hash is another row's content_hash") {
    val rows = SparkEntry.queries("w4_hash_chain")(spark, Sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val contents = rs.map(_.getAs[String]("content_hash")).toSet
      val prevs = rs.map(_.getAs[String]("prev_hash"))
      assert(prevs.count(_.isEmpty) == 1, s"user $u: expected exactly one chain head")
      val nonEmpty = prevs.filter(_.nonEmpty)
      assert(nonEmpty.toSet.subsetOf(contents), s"user $u: dangling prev_hash")
      assert(nonEmpty.length == rs.length - 1)
    }
  }

  test("d8 bloom filter has zero false negatives and a sized-to-corpus FP floor") {
    val rows = SparkEntry.queries("d8_bloom_incremental")(spark, Sf)
      .select("maybe_dup", "is_dup").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.nonEmpty)
    // the Bloom contract: a true duplicate can NEVER probe negative
    assert(rows.forall { case (mb, is) => is == 0 || mb == 1 },
      "bloom false negative: an exact dup probed clean")
    // non-vacuity: the split actually carries dups, and the filter
    // clears most genuinely-new docs (sized filter, not saturated)
    assert(rows.exists(_._2 == 1), "fixture has no cross-split dups")
    val newDocs = rows.filter(_._2 == 0)
    assert(newDocs.count(_._1 == 0) > newDocs.length / 2,
      "filter saturated: most new docs probe maybe_dup")
  }

  test("d11 guarded LSH: saturation and candidates are both live, and internally coherent") {
    val rows = SparkEntry.queries("d11_guarded_lsh")(spark, Sf).collect()
    assert(rows.nonEmpty)
    // both legs non-vacuous at every fixture scale (DuckDB-probed:
    // 1 sat / 9 with candidates here, 2/4 at sf0.01, 30/97 at sf0.1)
    assert(rows.exists(_.getAs[Int]("band_saturated") == 1),
      "no saturated probe doc — the guard leg is vacuous")
    assert(rows.exists(_.getAs[Long]("n_candidates") > 0),
      "no candidate-bearing probe doc — the normal leg is vacuous")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_candidates")
      val cands = r.getAs[String]("candidates")
      assert((n == 0) == cands.isEmpty,
        s"doc ${r.get(0)}: count/list mismatch ($n vs '$cands')")
      if (n > 0) {
        val ids = cands.split(",").map(_.toLong)
        assert(ids.length == n, s"doc ${r.get(0)}: $n != ${ids.length}")
        assert(ids.forall(_ % 5 != 4),
          s"doc ${r.get(0)}: candidates must come from the history split")
      }
    }
  }

  test("d12 guarded batch pairs: the guard over-approximates — no unguarded near-dup pair is silently lost") {
    val g = SparkEntry.queries("d12_guarded_batch_pairs")(spark, Sf).collect()
    // both legs non-vacuous at every fixture scale (DuckDB-probed:
    // 13 sat / 19 verified pairs here, 9/23 at sf0.01, 225/228 at sf0.1)
    assert(g.exists(_.getAs[Int]("band_saturated") == 1),
      "no saturated doc — the guard leg is vacuous")
    assert(g.exists(_.getAs[Long]("n_dups") > 0),
      "no cold-band pair — the pair leg is vacuous")
    g.foreach { r =>
      val n = r.getAs[Long]("n_dups")
      val ps = r.getAs[String]("partners")
      assert((n == 0) == ps.isEmpty, s"doc ${r.get(0)}: count/list mismatch")
      if (n > 0) assert(ps.split(",").length == n, s"doc ${r.get(0)}")
    }
    // the contract: a saturated band emits a FLAG instead of pairs, so
    // every pair the unguarded d3 form verifies must either survive as
    // a d12 partner pair or have an endpoint flagged for the
    // saturated-cluster path — the guard may widen work, never hide a dup
    val sat = g.filter(_.getAs[Int]("band_saturated") == 1)
      .map(_.getAs[Long]("doc_id")).toSet
    val pairs = g.flatMap { r =>
      val ps = r.getAs[String]("partners")
      if (ps.isEmpty) Nil
      else ps.split(",").map(p => (r.getAs[Long]("doc_id"), p.toLong)).toSeq
    }.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    val unguarded = SparkEntry.queries("d3_minhash_lsh")(spark, Sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.nonEmpty, "fixture has no near-dup pairs")
    val lost = unguarded.filterNot { case (a, b) =>
      pairs((a, b)) || sat(a) || sat(b) }
    assert(lost.isEmpty, s"pairs hidden by the guard with no saturation flag: $lost")
  }

  test("d13 guarded embedding pairs: the guard over-approximates — no unguarded d5 pair is silently lost") {
    val g = SparkEntry.queries("d13_guarded_embedding_pairs")(spark, Sf).collect()
    assert(g.exists(_.getAs[Int]("bucket_saturated") == 1),
      "no saturated vector — the guard leg is vacuous")
    assert(g.exists(_.getAs[Long]("n_dups") > 0),
      "no cold-cell pair — the pair leg is vacuous")
    g.foreach { r =>
      val n = r.getAs[Long]("n_dups")
      val ps = r.getAs[String]("partners")
      assert((n == 0) == ps.isEmpty, s"vec ${r.get(0)}: count/list mismatch")
      if (n > 0) assert(ps.split(",").length == n, s"vec ${r.get(0)}")
    }
    val sat = g.filter(_.getAs[Int]("bucket_saturated") == 1)
      .map(_.getAs[Long]("vec_id")).toSet
    val pairs = g.flatMap { r =>
      val ps = r.getAs[String]("partners")
      if (ps.isEmpty) Nil
      else ps.split(",").map(p => (r.getAs[Long]("vec_id"), p.toLong)).toSeq
    }.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    val unguarded = SparkEntry.queries("d5_embedding_neardup")(spark, Sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.nonEmpty, "fixture has no embedding near-dups")
    val lost = unguarded.filterNot { case (a, b) =>
      pairs((a, b)) || sat(a) || sat(b) }
    assert(lost.isEmpty, s"pairs hidden by the guard with no saturation flag: $lost")
  }

  test("lsh planes provisioning: auto derives ~log2 N planes and de-saturates the sf0.1 fixture 10x") {
    // the d13 scaladoc's at-scale finding made executable: with the
    // planes=8 fixture pin, 1989/2000 vectors touch an overloaded cell
    // at sf0.1; graft.lsh.planes=auto applies the planes~log2(N)+1
    // provisioning rule the d5 scaladoc states, and the saturated
    // count must fall by AT LEAST an order of magnitude. The default
    // (conf unset) stays at the fixture pin — the oracle gate depends
    // on it, and this test re-checks that pinned run too.
    val dir = "/root/testdata/sf0.1"
    def saturated(): Long =
      SparkEntry.queries("d13_guarded_embedding_pairs")(spark, dir)
        .agg(sum(col("bucket_saturated"))).collect()(0).getLong(0)
    val pinned = saturated()
    assert(pinned > 1500,
      s"fixture-pin saturation changed: expected the documented ~1989, got $pinned")
    var auto = -1L
    withConf("graft.lsh.planes" -> "auto") { auto = saturated() }
    assert(auto >= 0 && auto * 10 <= pinned,
      s"auto provisioning must de-saturate 10x: pinned=$pinned auto=$auto")
    // the guard still catches the PLANTED hot clusters: some residual
    // saturation should remain (a genuinely clustered cell is hot at
    // any planes count — the knob fixes occupancy, not true dups)
  }

  test("pl10 DSIR top-50 is enriched in the target source (the length-bias guard)") {
    // at Sf the target source is 25/500 docs, so a random top-50 holds
    // ~2.5; the per-token-mean weight must enrich it at least 2x over
    // that (the raw-sum formulation this pin guards against selected
    // SHORT docs and held zero)
    val top = SparkEntry.queries("pl10_dsir_importance")(spark, Sf)
      .select("doc_id")
    val srcs = Tables.documents(spark, Sf).select("doc_id", "source")
    val n = top.join(srcs, "doc_id")
      .filter(col("source") === "src0").count()
    assert(n >= 5, s"target-source docs in top-50: $n — importance signal lost")
  }

  test("d10 incremental-LSH finds every true cross-split near-dup pair at Sf") {
    import org.apache.spark.sql.DataFrame
    val sh = Tables.documents(spark, Sf)
      .select(col("doc_id"), graft.functions.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(graft.functions.TextOps.shingles(col("toks"), 3)).as("sh"))
    def side(n: String, pred: DataFrame => DataFrame) =
      pred(sh).select(col("doc_id").as(n), col("sh").as(s"sh_$n"))
    val truth = side("a", _.filter(col("doc_id") % 5 =!= 4))
      .crossJoin(side("b", _.filter(col("doc_id") % 5 === 4)))
      .filter(graft.functions.TextOps.jaccard(col("sh_a"), col("sh_b")) >= 0.3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = SparkEntry.queries("d10_incremental_lsh")(spark, Sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture has no cross-split near-dups")
    assert(found == truth,
      s"missed: ${truth -- found}, spurious: ${found -- truth}")
  }

  test("d7 semdedup survivors are pairwise tau-separated within every cluster") {
    // the keep rule's guarantee: for any tau-similar pair the outranked
    // member is ALWAYS removed, so no two survivors in one cluster can
    // be tau-similar (over-removal is possible by design — one-pass
    // form — but under-removal never)
    val out = SparkEntry.queries("d7_semdedup")(spark, Sf).cache()
    val survivors = out.filter(col("removed") === 0)
      .select(col("vec_id"), col("cid"))
    val vecs = Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))
    val offending = survivors.join(vecs, "vec_id")
      .select(col("cid"), col("vec_id").as("a"), col("embedding").as("va"))
      .join(survivors.join(vecs, "vec_id")
        .select(col("cid"), col("vec_id").as("b"), col("embedding").as("vb")),
        Seq("cid"))
      .filter(col("a") < col("b"))
      .filter(graft.functions.VectorOps.cosineFast(col("va"), col("vb")) >= 0.3)
      .count()
    assert(out.filter(col("removed") === 1).count() > 0, "dedup was vacuous")
    assert(offending == 0, s"$offending tau-similar survivor pairs remain")
  }

  test("d8 bloom on an EMPTY history: every batch doc probes proven-new, none vanish") {
    // first ingest of a fresh corpus: all doc_ids fall in the batch
    // split (id % 5 == 4), history is empty — the sized filter floors
    // m at 1 and the bloom is the empty set, so the output must be
    // every batch doc with maybe_dup = 0 (NOT an empty frame)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d8-empty").toFile.getAbsolutePath
    Seq((4L, "alpha beta gamma", "en", "src0", 16L),
        (9L, "delta epsilon zeta", "en", "src0", 18L),
        (14L, "eta theta iota", "en", "src0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("d8_bloom_incremental")(spark, dir)
      .select("doc_id", "maybe_dup", "is_dup").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows == Set((4L, 0, 0), (9L, 0, 0), (14L, 0, 0)),
      s"empty-history probe wrong: $rows")
  }
}
