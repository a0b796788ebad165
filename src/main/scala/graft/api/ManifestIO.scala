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
  * protocol is truthful wherever the store lives. TWO publish
  * protocols, picked per scheme (and sticky per store):
  *
  * RENAME protocol (`file`, `hdfs`, `viewfs` — schemes with a verified
  * atomic rename-with-overwrite): one mutable `manifest.properties`,
  * replaced by an atomic rename of a fully-written scratch file:
  *  - `file` (and scheme-less local paths): `java.nio.Files.move`
  *    with ATOMIC_MOVE — the POSIX rename(2) primitive. Hadoop's own
  *    local FileContext rename-with-overwrite is delete-then-rename
  *    (AbstractFileSystem.renameInternal), which would open a
  *    no-manifest crash window, so the local scheme keeps the real
  *    atomic primitive;
  *  - `hdfs`/`viewfs`: `FileContext.rename(..., Options.Rename
  *    .OVERWRITE)` — atomic in the NameNode (HDFS overrides
  *    renameInternal with the native atomic rename).
  *
  * POINTER protocol (object stores — `s3`/`s3a`/`s3n`/`gs`/`wasb`/
  * `wasbs`/`abfs`/`abfss`/`oss` — where rename is copy+delete and the
  * rename protocol would be fiction): RENAME-FREE, write-once
  * generation files `_manifests/manifest-<N-zero-padded>.properties`;
  * a commit is ONE put-if-absent of generation max+1, a reader
  * resolves the largest committed N. Crash-window reasoning:
  *  - crash BEFORE the publish: on an object store an incomplete PUT
  *    never becomes a visible object (S3 PUT visibility is
  *    all-or-nothing, and S3 is strongly consistent for read-after-put
  *    and list-after-put), so readers still resolve the previous
  *    generation; data dirs staged for the dead commit are orphans the
  *    next commit's [[gc]] sweeps — exactly the rename protocol's
  *    guarantee;
  *  - crash AFTER the publish: the commit simply happened;
  *  - zombie writer (an old driver resuming after a replacement took
  *    over — the store contract is single-writer): its publish targets
  *    a generation number that now EXISTS, so the put-if-absent fails
  *    loudly instead of silently clobbering the new writer's commit.
  *    On connectors with true conditional writes (S3 If-None-Match
  *    PUT; Hadoop S3A exposes it on recent releases, ABFS/GCS creates
  *    are conditional natively) this is watertight; an older connector
  *    that implements create(overwrite=false) as check-then-create
  *    narrows the zombie detection to best-effort — the single-writer
  *    contract itself is unchanged.
  *  Old generation files beyond the newest [[PointerKeep]] are swept
  *  after each commit (readers resolve max, so dropping older ones can
  *  never change what any reader sees). Every generation carries a
  *  torn-write sentinel as its last line ([[CommittedKey]]): on a
  *  forced unknown scheme whose create-then-write is NOT all-or-nothing,
  *  a crash mid-write leaves a truncated head generation, and readers
  *  skip it (no sentinel) back to the newest intact commit instead of
  *  silently loading a partial manifest.
  *
  * The pointer protocol can be FORCED on any scheme with the
  * `graft.manifest.protocol=pointer` (Hadoop/session) conf — on
  * atomic-rename schemes the put-if-absent primitive is then a staged
  * write + link/rename-without-overwrite (fails on an existing target,
  * publishes fully-written bytes atomically), which is how the
  * protocol is driven end to end in tests without an object store. A
  * store that has ever committed a pointer generation stays on the
  * pointer protocol (layout presence is the gate, like the Bloom
  * encoding version), and a leftover rename-protocol manifest is
  * removed by the first pointer commit after it is shadowed.
  *
  * Any OTHER scheme is refused at commit time unless the pointer
  * protocol is forced: atomicity of publish visibility is the
  * correctness keystone, and an unverified scheme's semantics are an
  * assumption, not a fact.
  */
object ManifestIO {

  private val Log = org.slf4j.LoggerFactory.getLogger(getClass)

  val FileName = "manifest.properties"

  /** Write-once generation-file directory of the pointer protocol. */
  val PointerDir = "_manifests"

  /** Pointer generations retained after a commit (readers resolve the
    * max, so any slack >= 1 is purely for slow concurrent listers). */
  val PointerKeep = 10

  private val PointerName = """manifest-(\d{20})\.properties""".r

  private def pointerName(n: Long): String = f"manifest-$n%020d.properties"

  /** Torn-write sentinel of the pointer protocol: every publish appends
    * this property as the PHYSICALLY LAST line of the generation file
    * (after `Properties.store`, whose own key order is hash-driven), so
    * any byte-truncation of the file — possible only on schemes where
    * create-then-write is not all-or-nothing, i.e. a FORCED unknown
    * scheme; object-store PUTs and the staged link/rename publishes
    * cannot tear — cuts the sentinel off. Readers resolve the newest
    * generation that carries it and never surface the sentinel key
    * itself. Generations written before the sentinel existed carry no
    * marker; they are accepted only when NO generation in the store
    * validates (pre-sentinel stores keep today's resolve-max behavior,
    * while a store that has ever committed with a sentinel falls back
    * past a torn head to its newest intact generation).
    *
    * Documented edges of this rule (reviewed deliberately, not
    * oversights):
    *  - MIGRATION CONTRACT: a sentinel-less head on a sentinel-era
    *    store reads as TORN. A pre-sentinel binary must therefore not
    *    write to a store a sentinel-era binary has committed to — by
    *    content the two cases are indistinguishable, the store is
    *    single-writer, and the reader resolves the ambiguity in favor
    *    of torn-write protection (a rolled-back writer is an operator
    *    error; a torn head is the designed failure).
    *  - RESIDUAL WINDOW: on an all-legacy store (no sentinel
    *    anywhere) a torn FIRST sentinel-era commit is accepted as the
    *    head — nothing distinguishes it from a legacy commit. The
    *    window is one commit wide, exists only on forced unknown
    *    schemes (staged publishes and object-store PUTs cannot
    *    tear), and closes permanently at the first intact sentinel
    *    commit.
    *  - LEGACY READ COST: a store whose head lacks the sentinel walks
    *    older generations looking for one — bounded by [[PointerKeep]]
    *    small property files per read, paid only until a sentinel-era
    *    commit heals the store (the walk is a lazy iterator;
    *    sentinel-era heads stop at ONE load). */
  private[graft] val CommittedKey = "graft.manifest.committed"

  /** Bounded re-list retries for the pointer read(): between a
    * reader's listing and its open, [[PointerKeep]]-or-more commits by
    * the live writer can sweep the listed generation — the open throws
    * FileNotFound and the fix is a fresh listing, not an error. */
  private val ReadRelistAttempts = 5

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

  /** Object-store schemes routed to the pointer protocol: visibility
    * of a completed PUT/create is all-or-nothing, and
    * create(overwrite=false) maps to a conditional write on current
    * connectors (see the object doc's zombie-writer note). */
  private val ObjectStoreSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss")

  def manifestPath(storePath: String): Path =
    new Path(storePath, FileName)

  private def schemeOf(p: Path, conf: Configuration): String =
    Option(p.toUri.getScheme)
      .getOrElse(FileSystem.getDefaultUri(conf).getScheme)

  /** Committed pointer generations, ascending. Empty for no dir. */
  private def pointerGens(fs: FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.collect {
      case st if st.isFile => st.getPath.getName
    }.collect { case PointerName(n) => n.toLong }.sorted

  def exists(storePath: String): Boolean = {
    val p = manifestPath(storePath)
    val fs = fsOf(p)
    val pdir = new Path(storePath, PointerDir)
    pointerGens(fs, pdir).nonEmpty || fs.exists(p)
  }

  private def loadProps(fs: FileSystem, p: Path): Map[String, String] = {
    val props = new java.util.Properties()
    val in = fs.open(p)
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    props.stringPropertyNames().asScala
      .map(k => k -> props.getProperty(k)).toMap
  }

  /** Read the committed key→value map (None if never committed). A
    * pointer-layout store shadows any leftover rename-layout file.
    *
    * Pointer resolution walks the committed generations NEWEST-FIRST
    * and returns the first one carrying the [[CommittedKey]] sentinel.
    * A generation that cannot be PARSED (Properties.load throws — a
    * head truncated mid-`\\uXXXX` escape raises IllegalArgumentException,
    * not FileNotFound, so a bare FNF-only handler would surface the
    * torn-write crash the sentinel exists to absorb) is treated
    * exactly like a sentinel-less one: torn, skipped, never the
    * legacy fallback. If no generation validates, the newest PARSEABLE
    * one is accepted as-is (pre-sentinel store). Skipping a head in
    * favor of an older sentinel-bearing generation logs a WARNING: on
    * a mixed-binary deployment (a pre-sentinel writer rolled back onto
    * a sentinel-era store) the skip is silent stale reads, and the log
    * line is the only signal that distinguishes it from normal
    * operation. A FileNotFound while opening a LISTED generation means
    * the listing went stale under a live writer's retention sweep
    * (>= [[PointerKeep]] commits landed since the list) — the whole
    * resolution re-lists and retries, bounded by
    * [[ReadRelistAttempts]]. */
  def read(storePath: String): Option[Map[String, String]] = {
    val conf = hconf
    val pdir = new Path(storePath, PointerDir)
    val fs = pdir.getFileSystem(conf)
    def resolve(attempt: Int): Option[Map[String, String]] = {
      val gens = pointerGens(fs, pdir)
      if (gens.isEmpty) None
      else try {
        // lazy walk: a sentinel-era head stops at ONE load
        val it = gens.reverse.iterator
        var newestRaw: Option[Map[String, String]] = None
        var validated: Option[Map[String, String]] = None
        var skippedPastHead = false
        while (validated.isEmpty && it.hasNext) {
          val n = it.next()
          val m =
            try Some(loadProps(fs, new Path(pdir, pointerName(n))))
            catch {
              // unparseable generation = torn (Properties.load raises
              // IllegalArgumentException on a malformed \uXXXX escape —
              // the truncation-mid-escape class): skip it like a
              // sentinel-less one, and never use it as the fallback.
              // Everything else propagates: FileNotFound escalates to
              // the re-list retry below, and a TRANSIENT stream error
              // (connection reset, checksum failure) must surface as
              // the error it is — swallowing it as "torn" would turn
              // an infra blip into a silent stale read
              case _: IllegalArgumentException => None
            }
          m match {
            case Some(mm) =>
              if (newestRaw.isEmpty) newestRaw = Some(mm)
              if (mm.contains(CommittedKey)) validated = Some(mm)
              else skippedPastHead = true
            case None => skippedPastHead = true
          }
        }
        if (validated.isDefined && skippedPastHead)
          Log.warn(
            "maintained store at {}: newest pointer generation(s) have " +
              "no committed sentinel (torn write, or a pre-sentinel " +
              "binary committed to a sentinel-era store) — resolving " +
              "the newest VALIDATED generation instead; if a rolled-back " +
              "writer is live, its commits are being read as stale",
            storePath)
        if (validated.isEmpty && newestRaw.isEmpty)
          // every listed generation failed to parse: the resolve
          // returns None and the caller falls through to the legacy
          // rename-layout file — surface that a pointer layout EXISTS
          // but yielded nothing, or the fallback reads as normal
          Log.warn(
            "maintained store at {}: pointer generations exist but " +
              "none parsed — falling back to the legacy manifest " +
              "file if present (pre-pointer state)", storePath)
        validated.map(_ - CommittedKey).orElse(newestRaw)
      } catch {
        case e: java.io.FileNotFoundException =>
          if (attempt < ReadRelistAttempts) resolve(attempt + 1)
          else throw new java.io.IOException(
            s"maintained store at $storePath: every listing of the " +
              s"pointer manifests went stale $ReadRelistAttempts times " +
              "in a row (a writer is committing faster than this reader " +
              "can list-and-open)", e)
      }
    }
    resolve(0).orElse {
      val p = manifestPath(storePath)
      if (fs.exists(p)) Some(loadProps(fs, p)) else None
    }
  }

  /** Commit a full manifest state through the store's protocol (see
    * the object doc): rename-with-overwrite on atomic-rename schemes,
    * write-once generation pointer everywhere else (object stores by
    * default, any scheme under `graft.manifest.protocol=pointer`, and
    * any store that already carries a pointer layout). */
  def write(storePath: String, entries: Map[String, String]): Unit = {
    val live = manifestPath(storePath)
    val conf = hconf // ONE conf for the whole multi-step commit
    // gate on the URI scheme BEFORE resolving the filesystem: an
    // unknown scheme must hit the documented refusal even when the
    // scheme's FS implementation is not on the classpath
    val scheme = schemeOf(live, conf)
    val forcedPointer = conf.get("graft.manifest.protocol") == "pointer"
    val usePointer =
      if (forcedPointer || ObjectStoreSchemes.contains(scheme)) true
      else if (AtomicRenameSchemes.contains(scheme))
        // sticky: a store that ever committed a pointer generation
        // stays on the pointer protocol, whoever opens it next
        pointerGens(live.getFileSystem(conf),
          new Path(storePath, PointerDir)).nonEmpty
      else
        throw new UnsupportedOperationException(
          s"maintained store at $storePath: manifest commits need either " +
            s"an ATOMIC rename-with-overwrite or all-or-nothing create " +
            s"visibility, and scheme '$scheme' is verified for neither. " +
            "Use a file:// or hdfs:// store path, an object store " +
            "(s3a/gs/abfs/...), or — if this filesystem's create " +
            "visibility is known atomic — force the write-once protocol " +
            "with graft.manifest.protocol=pointer.")
    if (usePointer) writePointer(storePath, entries, conf, scheme)
    else writeRename(storePath, entries, conf, scheme)
  }

  /** RENAME protocol commit: scratch file + atomic overwrite-rename. */
  private def writeRename(storePath: String, entries: Map[String, String],
      conf: Configuration, scheme: String): Unit = {
    val live = manifestPath(storePath)
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

  /** POINTER protocol commit: ONE put-if-absent of generation max+1.
    * The publish primitive per scheme family:
    *  - `file`: stage fully, then link(2) (atomic, EEXIST on an
    *    existing target — the POSIX put-if-absent), then unlink the
    *    stage;
    *  - `hdfs`/`viewfs`: stage fully, then rename WITHOUT overwrite
    *    (atomic in the NameNode, false if the target exists);
    *  - object stores / forced unknown schemes: create(overwrite =
    *    false) and write directly — PUT visibility is all-or-nothing,
    *    so a reader never sees a partial manifest, and the no-overwrite
    *    create is the conditional write. */
  private def writePointer(storePath: String, entries: Map[String, String],
      conf: Configuration, scheme: String): Unit = {
    val pdir = new Path(storePath, PointerDir)
    val fs0 = pdir.getFileSystem(conf)
    val fs: FileSystem =
      if (scheme == "file") FileSystem.getLocal(conf).getRaw else fs0
    fs.mkdirs(pdir)
    val gens = pointerGens(fs, pdir)
    val next = gens.lastOption.getOrElse(0L) + 1
    publishPointer(storePath, entries, fs0, fs, scheme, pdir, next)
    // retention + dead-writer stage sweep: single writer from here on
    // (the publish above succeeded), readers resolve max(N), so neither
    // delete can change what any reader resolves
    pointerGens(fs, pdir).dropRight(PointerKeep)
      .foreach(n => fs.delete(new Path(pdir, pointerName(n)), false))
    if (fs.exists(pdir)) fs.listStatus(pdir).toSeq
      .filter(st => st.isFile && st.getPath.getName.contains(".tmp"))
      .foreach(st => fs.delete(st.getPath, false))
    // complete a rename->pointer migration: the old mutable manifest is
    // shadowed by every read from now on; removing it is cleanup, and a
    // crash before this delete changes nothing
    val legacy = manifestPath(storePath)
    if (fs.exists(legacy)) fs.delete(legacy, false)
  }

  /** The pointer protocol's put-if-absent publish of ONE generation —
    * package-visible so the writer-race conflict (two writers that both
    * resolved `next` before either published) is directly testable. */
  private[graft] def publishPointer(storePath: String,
      entries: Map[String, String], fs0: FileSystem, fs: FileSystem,
      scheme: String, pdir: Path, next: Long): Unit = {
    val target = fs.makeQualified(new Path(pdir, pointerName(next)))
    require(!entries.contains(CommittedKey),
      s"manifest entry key '$CommittedKey' is reserved by the pointer protocol")
    val props = new java.util.Properties()
    entries.foreach { case (k, v) => props.setProperty(k, v) }
    // serialize ONCE with the torn-write sentinel as the physically
    // last line (Properties.store orders keys by hash, so the sentinel
    // must be appended to the bytes, not setProperty'd)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      props.store(bos, null)
      bos.write(s"$CommittedKey=true\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      bos.toByteArray
    }
    def conflict(cause: Throwable): Nothing =
      throw new java.io.IOException(
        s"maintained store at $storePath: pointer manifest generation " +
          s"$next already exists — a second writer committed since this " +
          "writer read the store (the contract is single-writer; this " +
          "writer is stale and must re-open the store)", cause)
    if (AtomicRenameSchemes.contains(scheme)) {
      // the stage name carries a per-writer nonce: two racing writers
      // that both resolved `next` must NOT share a stage file, or the
      // loser's create(overwrite) truncates the winner's fully-written
      // bytes between its stage and its publish — the shared-stage
      // variant of exactly the zombie-writer race the put-if-absent
      // publish exists to detect. With distinct stages the loser can
      // only lose at the publish (conflict, loudly), never corrupt.
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val tmp = fs.makeQualified(
        new Path(pdir, pointerName(next) + s".tmp-$nonce"))
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      if (scheme == "file") {
        val t = java.nio.file.Paths.get(tmp.toUri.getPath)
        try java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath), t)
        catch {
          case e: java.nio.file.FileAlreadyExistsException => conflict(e)
          // a live writer's post-commit sweep deletes dead stages — a
          // zombie whose stage vanished IS the stale-writer case, not
          // filesystem corruption; same outcome as conflict(), but the
          // message describes what actually happened (the target
          // generation may not even exist)
          case e: java.nio.file.NoSuchFileException =>
            throw new java.io.IOException(
              s"maintained store at $storePath: this writer's staged " +
                s"manifest for generation $next was swept by a newer " +
                "writer's commit (the contract is single-writer; this " +
                "writer is stale and must re-open the store)", e)
        } finally java.nio.file.Files.deleteIfExists(t)
      } else {
        if (!fs0.rename(tmp, target)) conflict(null)
      }
    } else {
      val out =
        try fs0.create(target, false)
        catch { case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          conflict(e) }
      try out.write(bytes) finally out.close()
    }
  }

  /** Test seam: (rawLocalFs, pointerDir, committedGens) of a local
    * store — lets the race spec drive [[publishPointer]] directly. */
  private[graft] def pointerStateForTest(storePath: String)
      : (FileSystem, Path, Seq[Long]) = {
    val pdir = new Path(storePath, PointerDir)
    val fs = FileSystem.getLocal(hconf).getRaw
    (fs, pdir, pointerGens(fs, pdir))
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
      // the pointer-protocol generation dir is never a data dir a
      // manifest references — it IS the manifest
      .filterNot(st => live.contains(st.getPath.getName) ||
        st.getPath.getName == PointerDir)
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

  /** Count of genuine DATA files directly under `path`: excludes
    * directories, write markers (`_SUCCESS`) and hidden files — the
    * ONE definition every store Health surface's small-files signal
    * uses, so a marker-convention change cannot desync them. */
  def countDataFiles(path: String): Int =
    listChildren(path).count { case (nm, isDir) =>
      !isDir && !nm.startsWith("_") && !nm.startsWith(".")
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
