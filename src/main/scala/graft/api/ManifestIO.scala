package graft.api

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Atomic manifest commits for maintained parquet stores.
  *
  * A maintained store (profile sync, orientation cache) is a set of
  * immutable data directories plus ONE `manifest.properties` file
  * naming the currently-committed directory per partition/namespace.
  * Writers produce new directories off to the side, then publish them
  * with a single atomic rename of the manifest — a crash at any point
  * leaves the previous manifest (and the directories it references)
  * fully intact, and uncommitted directories are swept by [[gc]].
  * Readers see either the old or the new committed state, never a
  * half-written mix. Single-writer per store, like the reference's
  * embedded engine (storage/duckdb.rs single connection).
  *
  * Deployment constraint (explicit, not accidental): the manifest
  * protocol runs on driver-local `java.nio` and requires a filesystem
  * with POSIX atomic rename that the single writer sees directly —
  * local disk or an NFS-style mount. The DATA directories a manifest
  * references are read/written through Spark and may live anywhere
  * Spark can reach; it is only this one control file that is
  * driver-local. Porting the store to HDFS/S3 means swapping this one
  * seam (FileContext rename-with-overwrite on HDFS, a conditional-put
  * or a coordination service on object stores, where no atomic rename
  * exists) — every caller goes through these four functions, nothing
  * else touches the manifest.
  */
object ManifestIO {

  val FileName = "manifest.properties"

  def manifestPath(storePath: String): Path = Paths.get(storePath, FileName)

  def exists(storePath: String): Boolean = Files.exists(manifestPath(storePath))

  /** Read the committed key→value map (None if never committed). */
  def read(storePath: String): Option[Map[String, String]] = {
    val p = manifestPath(storePath)
    if (!Files.exists(p)) None
    else {
      val props = new java.util.Properties()
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
      Some(props.stringPropertyNames().asScala
        .map(k => k -> props.getProperty(k)).toMap)
    }
  }

  /** Commit a full manifest state: write to a scratch file, then
    * atomically rename over the live manifest. */
  def write(storePath: String, entries: Map[String, String]): Unit = {
    Files.createDirectories(Paths.get(storePath))
    val props = new java.util.Properties()
    entries.foreach { case (k, v) => props.setProperty(k, v) }
    val tmp = Paths.get(storePath, FileName + ".tmp")
    val out = Files.newOutputStream(tmp)
    try props.store(out, null) finally out.close()
    Files.move(tmp, manifestPath(storePath),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Post-commit sweep: delete any immediate subdirectory of the store
    * that is not referenced by `live` — orphans from crashed writes and
    * superseded generations. */
  def gc(storePath: String, live: Set[String]): Unit = {
    val root = Paths.get(storePath)
    if (!Files.isDirectory(root)) return
    val ls = Files.list(root)
    val orphans =
      try ls.iterator().asScala
        .filter(Files.isDirectory(_))
        .filterNot(d => live.contains(d.getFileName.toString))
        .toList
      finally ls.close()
    orphans.foreach(deleteRecursively)
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      // close the directory stream explicitly — a bare Files.list leaks
      // one fd per deleted dir until GC, and whole-store rewrites call
      // this on every mutation
      val ls = Files.list(p)
      try ls.iterator().asScala.toList.foreach(deleteRecursively)
      finally ls.close()
    }
    Files.deleteIfExists(p)
  }
}
