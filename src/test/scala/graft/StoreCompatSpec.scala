package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.api.{ManifestIO, Mnemo}
import graft.api.Mnemo.RememberRequest
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Backward compatibility of the maintained stores (SURVEY §5 row 4;
  * the reference pins a v0.3.4 db file in tests/migration_roundtrip.rs):
  * a store written in the PREVIOUS on-disk layout must re-open under
  * the current code, and the first write must migrate it to the
  * manifest-committed layout without losing rows. Also pins the
  * manifest version stamps and the crash-orphan sweep. */
class StoreCompatSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def freshStore() = {
    val dir = Files.createTempDirectory("compat-store").toFile
    dir.delete()
    Mnemo.open(spark, dir.getAbsolutePath)
  }

  private def seed(store: graft.api.MnemoStore): Unit =
    store.remember(Seq(
      RememberRequest("m1", "alice", "t1", "alpha beta gamma tokens here",
        createdAt = ts("2024-01-01 10:00:00")),
      RememberRequest("m2", "alice", "t1", "delta epsilon zeta tokens here",
        createdAt = ts("2024-01-02 10:00:00"))))

  /** Write an orientation store in the v1 layout exactly as the old
    * writer did: hive-partitioned by namespace, no manifest. */
  private def writeLegacyOrientation(root: String): Unit = {
    import spark.implicits._
    Seq(
      ("alice", "alpha", 3L, 1706745600L, "alpha", 2L),
      ("alice", "beta", 1L, 1706745600L, "beta", 2L),
      ("bob", "gamma", 5L, 1706745600L, "gamma", 2L))
      .toDF("namespace", "key", "freq", "last_seen", "value", "tokens")
      .write.mode(SaveMode.Overwrite).partitionBy("namespace").parquet(root)
  }

  test("legacy hive-partitioned orientation store re-opens, and the first update migrates it") {
    val store = freshStore()
    seed(store)
    val root = store.path + "_orientation"
    writeLegacyOrientation(root)

    // re-open: the legacy layout reads through the current code path
    assert(ManifestIO.read(root).isEmpty)
    val legacy = store.orientationState()
    assert(legacy.count() == 3)
    assert(store.orientationRender("bob").select("freq").collect().head.getLong(0) == 5L)

    // first update against one namespace migrates EVERY namespace into
    // generation dirs behind one manifest commit
    val hits = store.recall(
      Mnemo.RecallRequest(strategy = "exact", agentId = Some("alice"), limit = 10),
      ts("2024-02-01 00:00:00"))
    store.orientationUpdate(hits, "alice", 1706832000L)

    val manifest = ManifestIO.read(root).getOrElse(fail("manifest missing after migration"))
    assert(manifest("version") == "2")
    assert(manifest.contains("ns.alice") && manifest.contains("ns.bob"))
    // bob's rows survived the migration byte-for-byte in content
    val bob = store.orientationRender("bob").collect()
    assert(bob.length == 1 && bob.head.getAs[Long]("freq") == 5L)
    // alice's map merged the legacy rows with the new batch: alpha's
    // legacy freq 3 must have been bumped, not reset
    val alice = store.orientationRender("alice")
      .select("key", "freq").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(alice("alpha") > 3L, s"legacy freq lost in migration: $alice")
    // the legacy hive dirs are swept after the commit
    assert(!Files.exists(Paths.get(root, "namespace=alice")))
    assert(!Files.exists(Paths.get(root, "namespace=bob")))
  }

  test("orphan generation dir (crash before manifest commit) is invisible and swept") {
    val store = freshStore()
    seed(store)
    val root = store.path + "_orientation"
    val hits = store.recall(
      Mnemo.RecallRequest(strategy = "exact", agentId = Some("alice"), limit = 10),
      ts("2024-02-01 00:00:00"))
    store.orientationUpdate(hits, "alice", 1706745600L)
    val committed = store.orientationRender("alice").count()

    // simulate a crash: a half-written generation dir that never made
    // it into the manifest
    import spark.implicits._
    Seq(("alice", "junk", 99L, 0L, "junk", 1L))
      .toDF("namespace", "key", "freq", "last_seen", "value", "tokens")
      .write.parquet(s"$root/alice-g999")

    // readers never see it
    assert(store.orientationRender("alice").count() == committed)
    assert(!store.orientationRender("alice").select("key").collect()
      .map(_.getString(0)).contains("junk"))
    // the next committed update sweeps it
    store.orientationUpdate(hits, "alice", 1706832000L)
    assert(!Files.exists(Paths.get(root, "alice-g999")))
  }

  test("legacy root-file attention store re-opens; compaction migrates it and preserves history") {
    val store = freshStore()
    // legacy layout: parquet appends directly at the store root — which
    // is exactly what puts against a fresh store produce
    store.attentionStatePut("alice", "focus", "v1".getBytes, ts("2024-01-01 10:00:00"))
    store.attentionStatePut("alice", "focus", "v2".getBytes, ts("2024-01-02 10:00:00"))
    store.attentionStatePut("alice", "other", "x".getBytes, ts("2024-01-03 10:00:00"))
    val root = store.path + "_attention"
    assert(ManifestIO.read(root).isEmpty, "puts alone must not create a manifest")

    store.attentionStateCompact()
    val m1 = ManifestIO.read(root).getOrElse(fail("manifest missing after compact"))
    assert(m1("version") == "1" && m1("data") == "g1")
    // latest-per-key resolution unchanged; history retained (3 rows)
    assert(store.attentionStateGet("alice", "focus").map(new String(_)).contains("v2"))
    assert(spark.read.parquet(s"$root/g1").count() == 3)
    // absorbed root-level files are swept
    assert(Files.list(Paths.get(root)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .forall(_.getFileName.toString.startsWith(ManifestIO.FileName)))

    // puts continue into the committed generation; a second compaction
    // rolls to g2 and sweeps g1
    store.attentionStatePutAll(Seq(
      ("alice", "focus", "v3".getBytes, ts("2024-01-04 10:00:00")),
      ("bob", "k", "y".getBytes, ts("2024-01-04 11:00:00"))))
    assert(store.attentionStateGet("alice", "focus").map(new String(_)).contains("v3"))
    store.attentionStateCompact()
    val m2 = ManifestIO.read(root).getOrElse(fail("manifest missing"))
    assert(m2("data") == "g2")
    assert(!Files.exists(Paths.get(root, "g1")))
    assert(store.attentionStateGet("alice", "focus").map(new String(_)).contains("v3"))
    assert(store.attentionStateGet("bob", "k").map(new String(_)).contains("y"))
    assert(spark.read.parquet(s"$root/g2").count() == 5)
  }

  test("manifest write is an atomic replace: a reader mid-commit sees old or new, never partial") {
    val dir = Files.createTempDirectory("manifest-io").toString
    ManifestIO.write(dir, Map("version" -> "1", "data" -> "g1"))
    assert(ManifestIO.read(dir).contains(Map("version" -> "1", "data" -> "g1")))
    ManifestIO.write(dir, Map("version" -> "1", "data" -> "g2"))
    assert(ManifestIO.read(dir).get("data") == "g2")
    // the scratch file never survives a commit
    assert(!Files.exists(Paths.get(dir, ManifestIO.FileName + ".tmp")))
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
