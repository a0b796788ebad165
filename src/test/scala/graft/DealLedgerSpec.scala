package graft

import java.sql.Timestamp

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.api.DealLedger
import graft.api.DealLedger.Envelope

/** The DealLedger API contract (mnemo-deal ledger.rs trait semantics):
  * stable offsets across appends, range replay, per-ledger heads, and
  * the dispute walk pinpointing the exact tampered offset. */
class DealLedgerSpec extends SparkSpec {

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  private def env(l: String, i: Int): Envelope =
    Envelope(f"d$i%04d", l, s"buyer-${i % 3}", s"seller-${i % 5}",
      s"""{"task":"t$i","price":${i * 10}}""", ts(i))

  private def fresh(tag: String): DealLedger = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_dl_$tag").toFile
    d.deleteOnExit()
    DealLedger.open(spark, d.getAbsolutePath + "/ledger")
  }

  test("describe() reports ledger health: envelope/ledger counts and append-file pressure") {
    val dl = fresh("health")
    val h0 = dl.describe()
    assert(!h0.exists && h0.envelopes == 0 && h0.ledgers == 0 && h0.dataFiles == 0)
    dl.append(Seq(env("A", 0), env("A", 1), env("B", 2)))
    dl.append(Seq(env("B", 3)))
    val h1 = dl.describe()
    assert(h1.exists && h1.envelopes == 4 && h1.ledgers == 2,
      s"ledger health: $h1")
    assert(h1.dataFiles >= 2, s"two appends produce at least two files: $h1")
  }

  test("never-written ledger: verify/replay/headHashes return empty typed frames, not errors") {
    val dl = fresh("empty")
    assert(dl.length == 0L)
    assert(dl.verify().collect().isEmpty)
    assert(dl.replay(0, 10).collect().isEmpty)
    val hh = dl.headHashes()
    assert(hh.collect().isEmpty && hh.columns.toSeq == Seq("ledger_id", "head_hash"))
    // ChainSchema cannot drift from the persisted layout (names+order+types)
    val emptySig = dl.table().schema.map(f => f.name -> f.dataType)
    dl.append(Seq(env("A", 0)))
    val writtenSig = dl.table().schema.map(f => f.name -> f.dataType)
    assert(emptySig == writtenSig,
      s"ChainSchema drifted from the persisted layout:\n$emptySig\nvs\n$writtenSig")
  }

  test("append assigns stable per-ledger offsets across batches; replay slices by offset") {
    val dl = fresh("ofs")
    dl.append((0 until 6).map(env("A", _)) ++ (0 until 4).map(i => env("B", i + 100)))
    val before = dl.table().filter(col("ledger_id") === "A")
      .select("deal_offset", "deal_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    dl.append((6 until 9).map(env("A", _)))
    val after = dl.table().filter(col("ledger_id") === "A")
      .select("deal_offset", "deal_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // earlier offsets unchanged by the second append (ledger.rs:11-13)
    before.foreach { case (o, id) => assert(after(o) == id) }
    assert(after.keySet == (0L until 9L).toSet)
    assert(dl.length == 13L)
    val sliced = dl.replay(2, 5).filter(col("ledger_id") === "A")
      .select("deal_id").collect().map(_.getString(0)).toSeq
    assert(sliced == Seq("d0002", "d0003", "d0004"))
  }

  test("verify: intact chains are all-valid; cross-batch linkage holds") {
    val dl = fresh("ok")
    dl.append((0 until 5).map(env("A", _)))
    dl.append((5 until 8).map(env("A", _))) // second batch chains off the tail
    val v = dl.verify().collect()
    assert(v.length == 1 && v(0).getAs[Boolean]("chain_valid"))
    assert(v(0).getAs[Long]("n_deals") == 8L && v(0).getAs[Long]("n_invalid") == 0L)
    assert(dl.headHashes().collect().length == 1)
  }

  test("verify pinpoints the exact offset of a post-signing tamper") {
    val dl = fresh("tam")
    dl.append((0 until 7).map(env("A", _)) ++ (0 until 3).map(i => env("B", i + 50)))
    // hostile edit: rewrite the stored terms at A/offset 4 (the signed
    // hashes stay — exactly the dispute.rs tampered_terms scenario)
    val tampered = dl.table().withColumn("terms",
      when(col("ledger_id") === "A" && col("deal_offset") === 4L,
        lit("""{"task":"t4","price":999999}""")).otherwise(col("terms")))
    val tmp = dl.path + ".tmp"
    tampered.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(dl.path)
    val v = dl.verify().collect().map(r => r.getString(0) -> r).toMap
    assert(!v("A").getAs[Boolean]("chain_valid"))
    assert(v("A").getAs[Long]("divergent_offset") == 4L)
    assert(v("A").getAs[Long]("n_invalid") == 1L)
    assert(v("A").getAs[String]("expected_hash") != v("A").getAs[String]("actual_hash"))
    assert(v("B").getAs[Boolean]("chain_valid"))
  }

  test("verify anchors the genesis at the empty string: a forged offset-0 prev_hash is caught") {
    val dl = fresh("gen")
    dl.append((0 until 3).map(env("A", _)))
    // forge: replace offset 0's prev_hash with an attacker-chosen value
    // and recompute the (unkeyed) row mac so the mac check passes — the
    // attack the reference's zero-anchored verify_chain catches
    val forged = dl.table().withColumn("prev_hash",
      when(col("deal_offset") === 0L, lit("forged-anchor"))
        .otherwise(col("prev_hash")))
      .withColumn("mac",
        when(col("deal_offset") === 0L,
          sha2(concat(col("content_hash"), lit("forged-anchor")), 256))
          .otherwise(col("mac")))
    val tmp = dl.path + ".tmp"
    forged.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(dl.path)
    val v = dl.verify().collect()
    assert(v.length == 1 && !v(0).getAs[Boolean]("chain_valid"))
    assert(v(0).getAs[Long]("divergent_offset") == 0L)
  }

  test("verify reports duplicate offsets from a violated single-writer assumption") {
    val dl = fresh("dup")
    dl.append((0 until 3).map(env("A", _)))
    // simulate two concurrent appends chaining off the same tail: a
    // second copy of offset 3 with different content
    dl.append(Seq(env("A", 3)))
    val fork = dl.table().filter(col("deal_offset") === 3L)
      .withColumn("deal_id", lit("d9999"))
      .withColumn("terms", lit("""{"task":"fork","price":1}"""))
    // forked row carries consistent hashes (the writer computed them
    // honestly off the same tail), so only the offset collision betrays it
    val rechained = fork
      .withColumn("content_hash",
        sha2(concat_ws(graft.functions.HashChain.Sep, lit("deal-ledger-key"),
          col("deal_id"), col("buyer"), col("seller"),
          col("terms").cast("string"), col("signed_at").cast("string")), 256))
      .withColumn("mac", sha2(concat(col("content_hash"), col("prev_hash")), 256))
    rechained.write.mode(SaveMode.Append).parquet(dl.path)
    val v = dl.verify().collect()
    assert(v.length == 1)
    assert(v(0).getAs[Long]("n_dup_offsets") == 1L)
    assert(!v(0).getAs[Boolean]("chain_valid"))
  }

  test("tail truncation passes the link walk (the reference's documented gap) but a head registration catches it") {
    val dl = fresh("trunc")
    dl.append((0 until 6).map(env("A", _)))
    // signing-time registration: the introspection surface a relying
    // party snapshots (head hash + length per ledger)
    val regHead = dl.headHashes().collect().head.getString(1)
    val regLen = dl.length
    // attack: drop the newest two envelopes from the stored chain
    val truncated = dl.table().filter(col("deal_offset") < regLen - 2)
    val tmp = dl.path + ".tmp"
    truncated.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(dl.path)
    // every remaining link still verifies — truncation is invisible to
    // the dispute walk alone, exactly the reference's disclosed hole
    val v = dl.verify().collect()
    assert(v.length == 1 && v(0).getAs[Boolean]("chain_valid"))
    // the registration comparison flags it: shorter AND a different head
    assert(dl.length == regLen - 2)
    assert(dl.headHashes().collect().head.getString(1) != regHead)
  }

  test("chainDigests registration catches the keyed mid-chain forge that verify and headHashes miss") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.HashChain
    val dl = fresh("digest")
    dl.append((0 until 6).map(env("A", _)))
    dl.append((0 until 4).map(env("B", _)))
    // signing-time registration snapshot, pinned before any tamper
    val reg = dl.chainDigests().localCheckpoint()
    val regHeadA = dl.headHashes().filter(col("ledger_id") === "A")
      .collect().head.getString(1)

    // the strongest attacker: HAS the signing key, rewrites the terms
    // of A's interior envelope (offset 2), recomputes the keyed
    // canonical, and relinks the whole suffix — internally consistent
    val w = Window.partitionBy(col("ledger_id")).orderBy(col("deal_offset"))
    val forged = dl.table()
      .withColumn("terms",
        when(col("ledger_id") === "A" && col("deal_offset") === 2,
          lit("""{"task":"t2","price":999999}""")).otherwise(col("terms")))
      .withColumn("content_hash",
        sha2(concat_ws(HashChain.Sep, lit("deal-ledger-key"),
          col("deal_id"), col("buyer"), col("seller"),
          col("terms").cast("string"), col("signed_at").cast("string")), 256))
      .withColumn("prev_hash",
        coalesce(lag(col("content_hash"), 1).over(w), lit("")))
      .withColumn("mac", sha2(concat(col("content_hash"), col("prev_hash")), 256))
    val tmp = dl.path + ".tmp"
    forged.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(dl.path)

    // the dispute walk passes (every link re-verifies) and the head
    // registration passes (the head envelope's own fields are
    // untouched) — this forge beats both
    assert(dl.verify().collect().forall(_.getAs[Boolean]("chain_valid")))
    assert(dl.headHashes().filter(col("ledger_id") === "A")
      .collect().head.getString(1) == regHeadA)
    // the digest registration catches exactly the forged ledger
    val audit = dl.verifyDigests(reg).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("intact")).toMap
    assert(!audit("A"), "mid-chain forge must break A's registered digest")
    assert(audit("B"), "untouched ledger must stay intact")

    // truncation-to-empty cannot hide by vanishing from the store:
    // drop ledger B entirely — the full-outer audit still reports it
    val wiped = dl.table().filter(col("ledger_id") =!= "B")
    wiped.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(dl.path)
    val audit2 = dl.verifyDigests(reg).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("intact")).toMap
    assert(audit2.contains("B") && !audit2("B"),
      "a ledger erased from the store must surface as not intact")
  }

  test("streaming appends via foreachBatch keep every chain valid across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dl = fresh("stream")
    val src = MemoryStream[(String, String, String, String, String, Long)]
    val q = src.toDF()
      .toDF("deal_id", "ledger_id", "buyer", "seller", "terms", "at_ms")
      .withColumn("signed_at", (col("at_ms") / 1000).cast("timestamp"))
      .drop("at_ms")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        dl.append(batch)
      }
      .start()
    def feed(l: String, is: Range) = is.map { i =>
      val e = env(l, i)
      (e.dealId, e.ledgerId, e.buyer, e.seller, e.terms, e.signedAt.getTime)
    }
    try {
      src.addData(feed("A", 0 until 4) ++ feed("B", 100 until 102): _*)
      q.processAllAvailable()
      src.addData(feed("A", 4 until 7): _*) // chains off A's stored tail
      q.processAllAvailable()
    } finally q.stop()
    val v = dl.verify().collect().map(r => r.getString(0) -> r).toMap
    assert(v.size == 2 && v.values.forall(_.getAs[Boolean]("chain_valid")))
    val offsA = dl.table().filter(col("ledger_id") === "A")
      .select("deal_offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offsA == (0L until 7L), "offsets must stay contiguous across micro-batches")
  }
}
