package graft.api

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Atomic manifest commits for maintained parquet stores.
  *
  * A maintained store (memory store, profile sync, orientation cache,
  * attention KV, dedup index) is a set of immutable data directories
  * plus ONE `manifest.properties` file naming the currently-committed
  * directory per partition/namespace. Writers produce new directories
  * off to the side, then publish them with a single atomic rename of
  * the manifest — a crash at any point leaves the previous manifest
  * (and the directories it references) fully intact, and uncommitted
  * directories are swept by [[gc]]. Readers see either the old or the
  * new committed state, never a half-written mix. Single-writer per
  * store, like the reference's embedded engine (storage/duckdb.rs
  * single connection).
  *
  * Every operation resolves the Hadoop [[FileSystem]] for the path's
  * SCHEME — the same filesystem Spark's data I/O resolves — so the
  * protocol is truthful wherever the store lives (`file://` local
  * disk, `hdfs://`, a mounted NFS path). The one scheme-specific leg
  * is the commit rename, which must be ATOMIC-WITH-OVERWRITE or the
  * whole protocol is fiction:
  *  - `file` (and scheme-less local paths): `java.nio.Files.move`
  *    with ATOMIC_MOVE — the POSIX rename(2) primitive. Hadoop's own
  *    local FileContext rename-with-overwrite is delete-then-rename
  *    (AbstractFileSystem.renameInternal), which would open a
  *    no-manifest crash window, so the local scheme keeps the real
  *    atomic primitive;
  *  - `hdfs`/`viewfs`: `FileContext.rename(..., Options.Rename
  *    .OVERWRITE)` — atomic in the NameNode (HDFS overrides
  *    renameInternal with the native atomic rename);
  *  - object stores (`s3`/`s3a`/`s3n`/`gs`/`wasb`/`abfs`/`oss`):
  *    REFUSED with a loud error at commit time. S3-style rename is
  *    copy+delete — not atomic, not overwrite-safe — and silently
  *    running the protocol there would corrupt on the first crashed
  *    writer. Committing a maintained store to an object store needs
  *    a conditional-put or coordination-service primitive this
  *    library does not ship; readers ([[read]]/[[gc]]) still work for
  *    inspection.
  *  - any OTHER scheme: refused the same way — atomicity is the
  *    correctness keystone, and an unverified scheme's rename
  *    semantics are an assumption, not a fact.
  */
object ManifestIO {

  val FileName = "manifest.properties"

  /** Hadoop configuration: the active Spark session's (so `fs.*`
    * settings and `fs.defaultFS` behave exactly like the data I/O
    * next to this manifest), or a bare default off-session (tests,
    * tooling). Built fresh per operation — a clone costs microseconds
    * against the Spark jobs around every commit, and caching it would
    * either freeze runtime `fs.*` changes for the session's lifetime
    * (breaking the behaves-like-the-data-I/O contract: Spark's own
    * reads re-resolve the conf) or pin a stopped session from a
    * static field. Multi-step operations ([[write]]) bind it once. */
  private def hconf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsOf(p: Path): FileSystem = p.getFileSystem(hconf)

  /** Schemes whose rename-with-overwrite is verified atomic. */
  private val AtomicRenameSchemes = Set("file", "hdfs", "viewfs")

  def manifestPath(storePath: String): Path =
    new Path(storePath, FileName)

  def exists(storePath: String): Boolean = {
    val p = manifestPath(storePath)
    fsOf(p).exists(p)
  }

  /** Read the committed key→value map (None if never committed). */
  def read(storePath: String): Option[Map[String, String]] = {
    val p = manifestPath(storePath)
    val fs = fsOf(p)
    if (!fs.exists(p)) None
    else {
      val props = new java.util.Properties()
      val in = fs.open(p)
      try props.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      Some(props.stringPropertyNames().asScala
        .map(k => k -> props.getProperty(k)).toMap)
    }
  }

  /** Commit a full manifest state: write to a scratch file, then
    * atomically rename over the live manifest — the scheme-gated
    * primitive described in the object doc. */
  def write(storePath: String, entries: Map[String, String]): Unit = {
    val live = manifestPath(storePath)
    val conf = hconf // ONE conf for the whole multi-step commit
    // gate on the URI scheme BEFORE resolving the filesystem: an
    // object-store path must hit the documented refusal even when the
    // scheme's FS implementation is not on the classpath
    val scheme = Option(live.toUri.getScheme)
      .getOrElse(FileSystem.getDefaultUri(conf).getScheme)
    if (!AtomicRenameSchemes.contains(scheme))
      throw new UnsupportedOperationException(
        s"maintained store at $storePath: manifest commits need an " +
          s"ATOMIC rename-with-overwrite, and scheme '$scheme' does not " +
          "provide one (object-store rename is copy+delete). Running the " +
          "protocol here would corrupt on the first crashed writer; use a " +
          "file:// or hdfs:// store path, or front the store with a " +
          "filesystem that guarantees atomic rename.")
    val fs = live.getFileSystem(conf)
    // local writes go through the RAW local FS: the checksummed
    // LocalFileSystem would shadow every scratch file with a .crc
    // sidecar the atomic move below does not carry along
    val fsw: FileSystem =
      if (scheme == "file") FileSystem.getLocal(conf).getRaw else fs
    fsw.mkdirs(new Path(storePath))
    val props = new java.util.Properties()
    entries.foreach { case (k, v) => props.setProperty(k, v) }
    val tmp = new Path(storePath, FileName + ".tmp")
    val out = fsw.create(tmp, true)
    try props.store(out, null) finally out.close()
    if (scheme == "file") {
      // POSIX rename(2): overwrite-atomic. qualify through the FS so a
      // relative store path resolves exactly like the data I/O did
      val q = fs.makeQualified(live)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(q.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      FileContext.getFileContext(fs.getUri, conf)
        .rename(fs.makeQualified(tmp), fs.makeQualified(live),
          Options.Rename.OVERWRITE)
    }
  }

  /** Post-commit sweep: delete any immediate subdirectory of the store
    * that is not referenced by `live` — orphans from crashed writes and
    * superseded generations. */
  def gc(storePath: String, live: Set[String]): Unit = {
    val root = new Path(storePath)
    val fs = fsOf(root)
    if (!fs.exists(root) || !fs.getFileStatus(root).isDirectory) return
    fs.listStatus(root)
      .filter(_.isDirectory)
      .filterNot(st => live.contains(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, true))
  }

  // ---- shared driver-side FS helpers (the store implementations'
  //      listing/sweep legs, routed through the SAME scheme-resolved
  //      filesystem as the manifest and the data I/O) ----

  /** Immediate children of `path`: (name, isDirectory). Empty for a
    * missing or non-directory path. */
  def listChildren(path: String): Seq[(String, Boolean)] = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) Nil
    else fs.listStatus(p).toSeq.map(st => (st.getPath.getName, st.isDirectory))
  }

  def pathExists(path: String): Boolean = {
    val p = new Path(path)
    fsOf(p).exists(p)
  }

  def isDirectory(path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  /** Plain rename (no overwrite; dst must not exist) — the staged-dir
    * promote used by migrations. Fails loudly if the FS refuses. */
  def movePath(src: String, dst: String): Unit = {
    val s = new Path(src)
    val fs = fsOf(s)
    if (!fs.rename(s, new Path(dst)))
      throw new java.io.IOException(s"rename $src -> $dst refused")
  }

  def deleteRecursively(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).delete(p, true)
  }

  /** Delete one file (not recursive); no-op if missing. */
  def deleteFile(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).delete(p, false)
  }
}
