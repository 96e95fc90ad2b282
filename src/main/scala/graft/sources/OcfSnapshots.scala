package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

/** Snapshot manifests for `graft-ocf` catalog tables: every commit writes a
  * new numbered manifest listing the table's VISIBLE data files, making the
  * manifest — not the directory listing — the source of truth for reads.
  *
  * What this buys at 100 TB:
  *  - **O(1) planning listings**: a read opens ONE small JSON instead of
  *    recursively listing a million-file directory tree (the S3 LIST call
  *    train that dominates large-table planning).
  *  - **Atomic commits + snapshot isolation**: a manifest appears with a
  *    single create; concurrent readers see either the old complete version
  *    or the new complete version, never a half-renamed directory.
  *  - **Optimistic concurrency**: the next version is created with
  *    CREATE-exclusive semantics — two racing committers cannot both win;
  *    the loser recomputes against the winner's manifest and retries.
  *  - **Time travel**: `VERSION AS OF n` / `TIMESTAMP AS OF t` pin a read
  *    to an old manifest. Removed files are dropped from the manifest but
  *    NOT physically deleted — `expire_snapshots` reclaims unreferenced
  *    files once history is no longer wanted.
  *
  * Layout: `<table>/_graft_snapshots/v000000000042.json` (underscore dir —
  * invisible to data-file listings). Paths inside a manifest are RELATIVE
  * to the table directory, so a table can be relocated wholesale.
  *
  * Migration: a directory without a snapshots dir reads by listing, exactly
  * as before; the FIRST snapshot commit folds the pre-existing listing in
  * as its base, so existing tables upgrade in place. */
private[graft] object OcfSnapshots {

  val Dir = "_graft_snapshots"

  /** One manifest entry: the file's relative path + length, plus (when the
    * commit embedded it) the header metadata a scan needs — writer schema,
    * codec, sync marker, first-block offset, row stamp, stats and sort
    * stamps. A manifest whose entries carry metas plans with ZERO per-file
    * header reads: at 100k files that removes 100k round trips from every
    * query's planning. Bloom / block-index stamps are deliberately NOT
    * inlined (they can be MBs per file); `hasBloom`/`hasBlockIndex` tell
    * the scan a lazy header pread is worthwhile for the query shapes that
    * can use them. */
  final case class SnapFile(path: String, len: Long,
                            meta: Option[OcfDataSource.OcfFileMeta] = None)
  final case class Snapshot(version: Long, timestampMs: Long, operation: String,
                            files: Seq[SnapFile],
                            // the table's Catalyst schema AT COMMIT TIME
                            // (catalog commits only): a pinned VERSION AS OF
                            // read shows the schema the data had, not the
                            // one DDL later evolved it to
                            tableSchemaJson: Option[String] = None)

  private val mapper = new ObjectMapper()

  def snapshotsDir(tableDir: Path): Path = new Path(tableDir, Dir)

  // underscore-prefixed NAME: every data listing in this source filters
  // file names on "_"/"." prefixes, so manifests are invisible to them
  // even when a recursive walk reaches inside _graft_snapshots
  private def manifestFile(dir: Path, version: Long): Path =
    new Path(dir, f"_v$version%012d.json")

  private def manifestPath(tableDir: Path, version: Long): Path =
    manifestFile(snapshotsDir(tableDir), version)

  /** Physically remove one manifest (expire_snapshots). */
  def deleteManifest(fs: FileSystem, tableDir: Path, version: Long): Unit = {
    fs.delete(manifestPath(tableDir, version), false)
    ()
  }

  def enabled(fs: FileSystem, tableDir: Path): Boolean =
    try fs.exists(snapshotsDir(tableDir)) catch { case _: java.io.IOException => false }

  private def versionsIn(fs: FileSystem, d: Path): Seq[Long] =
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith("_v") && n.endsWith(".json"))
      .flatMap(n => n.stripPrefix("_v").stripSuffix(".json").toLongOption)
      .toSeq.sorted

  /** All manifest versions present, ascending. */
  def versions(fs: FileSystem, tableDir: Path): Seq[Long] =
    versionsIn(fs, snapshotsDir(tableDir))

  def read(fs: FileSystem, tableDir: Path, version: Long): Snapshot =
    readManifest(fs, manifestPath(tableDir, version))

  private def readManifest(fs: FileSystem, file: Path): Snapshot = {
    val in = fs.open(file)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val root = mapper.readTree(bytes)
    // writer schemas are deduplicated into one table (a 10k-file table
    // usually has a handful of distinct schemas, not 10k copies)
    val schemas: IndexedSeq[String] = Option(root.get("schemas")) match {
      case Some(arr) =>
        val b = IndexedSeq.newBuilder[String]
        val it = arr.elements()
        while (it.hasNext) b += it.next().asText
        b.result()
      case None => IndexedSeq.empty
    }
    val files = Seq.newBuilder[SnapFile]
    val it = root.get("files").elements()
    while (it.hasNext) {
      val f = it.next()
      val path = f.get("path").asText
      val len = f.get("len").asLong
      // meta fields are OPTIONAL: manifests written before meta embedding
      // (or by minimal commits) still read — the scan falls back to preads
      val meta = Option(f.get("schema")).map { sIdx =>
        def strOpt(k: String): Option[String] = Option(f.get(k)).map(_.asText)
        OcfDataSource.OcfFileMeta(
          path = path, len = len,
          writerSchemaJson = schemas(sIdx.asInt),
          codecName = f.get("codec").asText,
          sync = java.util.Base64.getDecoder.decode(f.get("sync").asText),
          headerEnd = f.get("end").asLong,
          statsJson = strOpt("stats"),
          sortedByJson = strOpt("sorted"),
          rowsStamp = Option(f.get("rows")).map(_.asLong),
          bloomInHeader = Option(f.get("bloom")).exists(_.asBoolean),
          blockIndexInHeader = Option(f.get("blockIndex")).exists(_.asBoolean))
      }
      files += SnapFile(path, len, meta)
    }
    Snapshot(root.get("version").asLong, root.get("timestampMs").asLong,
      root.get("operation").asText, files.result(),
      Option(root.get("tableSchema")).map(_.asText))
  }

  def latest(fs: FileSystem, tableDir: Path): Option[Snapshot] =
    versions(fs, tableDir).lastOption.map(read(fs, tableDir, _))

  /** Latest snapshot with `timestampMs <= ts`, for TIMESTAMP AS OF. */
  def asOfTimestamp(fs: FileSystem, tableDir: Path, ts: Long): Option[Snapshot] =
    versions(fs, tableDir).map(read(fs, tableDir, _))
      .filter(_.timestampMs <= ts).lastOption

  /** Incremental append scan (the Iceberg `incremental read` shape): the
    * files ADDED strictly after `startVersion` and up to & including
    * `endVersion` (default: latest) — so "process only what arrived since
    * the last run" costs reading exactly the new files, never a diff of row
    * sets. Exact-or-refuse: every retained manifest step in the range must
    * be append-only (its file set a superset of its predecessor's); a
    * commit that removed or replaced files (overwrite, CoW delete/update,
    * compaction) makes "the changes" unrepresentable as added rows, and the
    * read REFUSES with the offending version rather than emit rows that
    * were since deleted or double-count compacted ones. Both endpoint
    * manifests must still be retained (`expire_snapshots` may have
    * collected them); expired INTERMEDIATE manifests degrade the
    * append-only check to coarser consecutive-retained pairs, which still
    * proves no retained file ever disappeared. Writers never reuse file
    * names (task-unique temps), so path-set difference is exact. */
  def incrementalFiles(fs: FileSystem, tableDir: Path,
                       startVersion: Long, endVersion: Option[Long]): Seq[SnapFile] =
    incrementalWithStart(fs, tableDir, startVersion, endVersion)._1

  /** [[incrementalFiles]] plus the start snapshot's path set (the streaming
    * exclusion set) — one manifest read serves both, instead of the caller
    * re-reading the start manifest it just validated. */
  def incrementalWithStart(fs: FileSystem, tableDir: Path,
                           startVersion: Long, endVersion: Option[Long])
      : (Seq[SnapFile], Set[String]) = {
    val vs = versions(fs, tableDir)
    require(vs.nonEmpty, s"graft-ocf: $tableDir has no snapshot manifests")
    def known(v: Long, role: String): Unit = require(vs.contains(v),
      s"graft-ocf: $role version $v is not a retained snapshot of $tableDir " +
        s"(retained: ${vs.mkString(", ")}); expire_snapshots may have removed it")
    known(startVersion, "startingVersion")
    val end = endVersion.getOrElse(vs.last)
    known(end, "endingVersion")
    require(end >= startVersion,
      s"graft-ocf: endingVersion $end precedes startingVersion $startVersion")
    val chain = vs.filter(v => v >= startVersion && v <= end)
    var prevPaths = read(fs, tableDir, chain.head).files.map(_.path).toSet
    val startPaths = prevPaths
    if (end == startVersion) return (Nil, startPaths)
    var endSnap: Snapshot = null
    chain.tail.foreach { v =>
      val snap = read(fs, tableDir, v)
      val cur = snap.files.map(_.path).toSet
      val removed = prevPaths.diff(cur)
      require(removed.isEmpty,
        s"graft-ocf: incremental read of $tableDir ($startVersion, $end] " +
          s"refused: version $v (operation '${snap.operation}') removed or " +
          s"replaced ${removed.size} file(s) (e.g. ${removed.head}) — the " +
          "range's changes are not representable as appended rows. Read " +
          "a full snapshot (VERSION AS OF) instead, or start after the " +
          "rewriting commit.")
      prevPaths = cur
      endSnap = snap
    }
    (endSnap.files.filterNot(f => startPaths.contains(f.path)), startPaths)
  }

  private def render(s: Snapshot): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("version", s.version)
    root.put("timestampMs", s.timestampMs)
    root.put("operation", s.operation)
    s.tableSchemaJson.foreach(root.put("tableSchema", _))
    val schemaIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val arr = root.putArray("files")
    s.files.foreach { f =>
      val o = arr.addObject()
      o.put("path", f.path)
      o.put("len", f.len)
      f.meta.foreach { m =>
        val idx = schemaIdx.getOrElseUpdate(m.writerSchemaJson, schemaIdx.size)
        o.put("schema", idx)
        o.put("codec", m.codecName)
        o.put("sync", java.util.Base64.getEncoder.encodeToString(m.sync))
        o.put("end", m.headerEnd)
        m.rowsStamp.foreach(o.put("rows", _))
        m.statsJson.foreach(o.put("stats", _))
        m.sortedByJson.foreach(o.put("sorted", _))
        // presence flags only — the stamps themselves stay in the header
        if (m.bloomJson.isDefined || m.bloomInHeader) o.put("bloom", true)
        if (m.blockIndexJson.isDefined || m.blockIndexInHeader)
          o.put("blockIndex", true)
      }
    }
    val sarr = root.putArray("schemas")
    schemaIdx.keys.foreach(sarr.add)
    mapper.writeValueAsBytes(root)
  }

  /** Optimistic snapshot commit: `transform` maps the previous visible set
    * (the latest manifest's files, or — on the very first commit — the
    * directory's current listing, folding a pre-snapshot table in) to the
    * new visible set. The next version is written CREATE-EXCLUSIVE through
    * a temp + no-overwrite rename; when a racing committer wins the
    * version, the transform re-runs against the WINNER's files — the
    * retry sees the concurrent commit's effects, it does not clobber them.
    * Returns the committed snapshot. */
  def commit(fs: FileSystem, tableDir: Path, operation: String,
             tableSchemaJson: Option[String] = None)
            (transform: Seq[SnapFile] => Seq[SnapFile]): Snapshot = {
    val sdir = snapshotsDir(tableDir)
    fs.mkdirs(sdir)
    var attempts = 0
    while (true) {
      attempts += 1
      val prevVersion = versions(fs, tableDir).lastOption
      val prevFiles = prevVersion match {
        case Some(v) => read(fs, tableDir, v).files
        case None => listingAsFiles(fs, tableDir)
      }
      val prevSchema = prevVersion.flatMap(v => read(fs, tableDir, v).tableSchemaJson)
      val next = Snapshot(prevVersion.getOrElse(0L) + 1, System.currentTimeMillis(),
        operation, transform(prevFiles),
        // a schema-less commit (path write) inherits the previous schema
        tableSchemaJson.orElse(prevSchema))
      val dest = manifestPath(tableDir, next.version)
      val tmp = new Path(sdir, s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, false)
      try { out.write(render(next)) } finally out.close()
      // rename WITHOUT overwrite: exactly one committer wins a version
      val won = !fs.exists(dest) && fs.rename(tmp, dest)
      if (won) return next
      fs.delete(tmp, false)
      if (attempts >= 20) throw new java.io.IOException(
        s"graft-ocf snapshots: lost the commit race $attempts times under $tableDir")
    }
    throw new IllegalStateException("unreachable")
  }

  // ---- branches (X83): write-audit-publish ---------------------------------
  // A branch is its own manifest sequence under
  // `_graft_snapshots/_branch-<name>/`, seeded from a MAIN version (the
  // branch base) and numbering onward from it. Writes routed to the branch
  // land their DATA files in the table directory as usual — manifests gate
  // visibility, so main readers never see them — and commit manifests into
  // the branch dir. `fast_forward` publishes: when main still sits at the
  // branch base, the branch's manifests copy into main verbatim (manifests
  // are absolute file lists, so no rebasing) and main's head jumps to the
  // branch head atomically-per-manifest; a main that advanced past the base
  // REFUSES (divergent histories need a rewrite, not a silent merge).

  /** Legal branch names: path-safe (no separators/dot-segments — the name
    * becomes a directory, and Hadoop Path resolution would let '../..'
    * escape the branch namespace into the manifests themselves) and
    * non-numeric (VERSION AS OF parses digits as a snapshot version FIRST,
    * so a branch named '7' could never be resolved by name). */
  private def validBranchName(name: String): Boolean =
    name.matches("[A-Za-z0-9][A-Za-z0-9_.-]*") && !name.contains("..") &&
      name.toLongOption.isEmpty

  def branchDir(tableDir: Path, name: String): Path = {
    // EVERY branch operation funnels through here: a traversal-shaped name
    // (drop_branch(name => '../..') would resolve to the snapshots dir and
    // recursively delete every manifest) must die before touching paths
    require(validBranchName(name),
      s"graft-ocf branches: invalid branch name '$name' (letters, digits, " +
        "._- only, not starting with a separator, not purely numeric)")
    new Path(snapshotsDir(tableDir), "_branch-" + name)
  }

  private def branchBasePath(bd: Path): Path = new Path(bd, "_base.json")

  def branchExists(fs: FileSystem, tableDir: Path, name: String): Boolean =
    validBranchName(name) && // arbitrary VERSION AS OF strings probe here
      (try fs.exists(branchBasePath(branchDir(tableDir, name)))
       catch { case _: java.io.IOException => false })

  def listBranches(fs: FileSystem, tableDir: Path): Seq[String] = {
    val d = snapshotsDir(tableDir)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).iterator.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("_branch-"))
      .map(_.stripPrefix("_branch-"))
      .filter(validBranchName) // foreign/mangled dir names are not branches
      // a dir without its base marker is creation debris (crash between
      // mkdirs and the marker write) — invisible, so it can never wedge
      // expiry/orphan collection/.branches; createBranch sweeps it
      .filter(b => fs.exists(branchBasePath(branchDir(tableDir, b))))
      .toSeq.sorted
  }

  /** Create `name` at main version `from` (default: latest). Create-exclusive
    * on the base marker: of two racing creators exactly one wins. */
  def createBranch(fs: FileSystem, tableDir: Path, name: String,
                   from: Option[Long]): Long = {
    require(validBranchName(name),
      s"graft-ocf branches: invalid branch name '$name' (letters, digits, " +
        "._- only, not purely numeric — VERSION AS OF would shadow a " +
        "numeric name with the snapshot version)")
    val vs = versions(fs, tableDir)
    require(vs.nonEmpty,
      s"graft-ocf branches: $tableDir has no snapshots to branch from")
    val base = from.getOrElse(vs.last)
    require(vs.contains(base),
      s"graft-ocf branches: version $base is not a retained snapshot " +
        s"(retained: ${vs.mkString(", ")})")
    val bd = branchDir(tableDir, name)
    // a marker-less dir is debris from a crashed create — sweep and retry;
    // a marked dir is a real branch and refuses
    if (fs.exists(bd) && !fs.exists(branchBasePath(bd))) fs.delete(bd, true)
    require(!fs.exists(bd),
      s"graft-ocf branches: branch '$name' already exists")
    fs.mkdirs(bd)
    val out = fs.create(branchBasePath(bd), false)
    try out.write(s"""{"base":$base}""".getBytes("UTF-8")) finally out.close()
    base
  }

  def branchBase(fs: FileSystem, tableDir: Path, name: String): Long = {
    val p = branchBasePath(branchDir(tableDir, name))
    require(fs.exists(p),
      s"graft-ocf branches: no branch '$name' of $tableDir " +
        s"(branches: ${listBranches(fs, tableDir).mkString(", ")})")
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    mapper.readTree(bytes).get("base").asLong
  }

  def branchVersions(fs: FileSystem, tableDir: Path, name: String): Seq[Long] =
    versionsIn(fs, branchDir(tableDir, name))

  /** The branch's visible snapshot: its newest own manifest, or (before any
    * branch commit) the main BASE manifest — which must still be retained. */
  def branchHead(fs: FileSystem, tableDir: Path, name: String): Snapshot = {
    val bd = branchDir(tableDir, name)
    branchVersions(fs, tableDir, name).lastOption match {
      case Some(v) => readManifest(fs, manifestFile(bd, v))
      case None =>
        val base = branchBase(fs, tableDir, name)
        require(versions(fs, tableDir).contains(base),
          s"graft-ocf branches: branch '$name' base version $base was " +
            "expired; the branch has no readable state")
        read(fs, tableDir, base)
    }
  }

  /** Optimistic commit into the branch's manifest sequence (same discipline
    * as [[commit]]: exactly one committer wins a version). */
  def commitToBranch(fs: FileSystem, tableDir: Path, name: String,
                     operation: String, tableSchemaJson: Option[String])
                    (transform: Seq[SnapFile] => Seq[SnapFile]): Snapshot = {
    val bd = branchDir(tableDir, name)
    require(fs.exists(branchBasePath(bd)),
      s"graft-ocf branches: no branch '$name' of $tableDir " +
        s"(branches: ${listBranches(fs, tableDir).mkString(", ")}); " +
        "CALL <cat>.system.create_branch first")
    var attempts = 0
    while (true) {
      attempts += 1
      val head = branchHead(fs, tableDir, name)
      val next = Snapshot(head.version + 1, System.currentTimeMillis(),
        operation, transform(head.files),
        tableSchemaJson.orElse(head.tableSchemaJson))
      val dest = manifestFile(bd, next.version)
      val tmp = new Path(bd, s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, false)
      try { out.write(render(next)) } finally out.close()
      val won = !fs.exists(dest) && fs.rename(tmp, dest)
      if (won) return next
      fs.delete(tmp, false)
      if (attempts >= 20) throw new java.io.IOException(
        s"graft-ocf branches: lost the commit race $attempts times on '$name'")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Publish the branch: copy its manifests into main (verbatim — version
    * numbers continue from the base) and drop the branch. IDEMPOTENT and
    * RESUMABLE: a main manifest that already holds byte-identical content
    * (an earlier partial publish, or a concurrent fast_forward of the same
    * branch) is skipped, so a crash or race mid-copy never wedges the
    * branch — retrying finishes the job. A main manifest with DIFFERENT
    * content is a genuinely foreign commit: refuse (divergent histories are
    * never silently merged) and leave the branch intact for inspection.
    * Returns (base, new main head). */
  def fastForward(fs: FileSystem, tableDir: Path, name: String): (Long, Long) = {
    val base = branchBase(fs, tableDir, name)
    val bd = branchDir(tableDir, name)
    val bvs = branchVersions(fs, tableDir, name)
    val mainLast = versions(fs, tableDir).lastOption.getOrElse(0L)
    require(mainLast >= base,
      s"graft-ocf branches: branch '$name' base $base is ahead of main " +
        s"($mainLast) — the base manifest was expired or removed")
    def bytesOf(p: Path): Array[Byte] = {
      val in = fs.open(p)
      try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    }
    def refuse(v: Long): Nothing = throw new IllegalArgumentException(
      s"graft-ocf branches: cannot fast-forward '$name' — main's version $v " +
        "differs from the branch's (a foreign commit landed); histories " +
        "diverged and publish would drop main's commits. Re-branch from the " +
        "current head and replay, or rollback main first.")
    if (mainLast > base + bvs.length) refuse(base + bvs.length + 1)
    val sdir = snapshotsDir(tableDir)
    bvs.foreach { v =>
      val src = manifestFile(bd, v)
      val dest = manifestPath(tableDir, v)
      val bytes = bytesOf(src)
      if (fs.exists(dest)) {
        if (!java.util.Arrays.equals(bytes, bytesOf(dest))) refuse(v)
        // byte-identical: already published (partial retry) — continue
      } else {
        // the same temp + no-overwrite-rename discipline as [[commit]]:
        // dest either doesn't exist or is a COMPLETE manifest — a crashed
        // write can never leave truncated bytes that a retry (or a reader)
        // would misread
        val tmp = new Path(sdir, s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
        val out = fs.create(tmp, false)
        try out.write(bytes) finally out.close()
        val won = !fs.exists(dest) && fs.rename(tmp, dest)
        if (!won) {
          fs.delete(tmp, false)
          // lost the rename race: identical content means a concurrent
          // publish of the same branch; anything else is a foreign commit
          if (!java.util.Arrays.equals(bytes, bytesOf(dest))) refuse(v)
        }
      }
    }
    // Retire EXACTLY what was published: the copied manifests and the base
    // marker, then the (now empty) directory NON-recursively. Publishing
    // while branch writers are still active violates the WAP contract
    // (publish happens after the audit, writers quiesced) — but if it
    // happens anyway, the racing commit's manifest survives the per-file
    // deletes, the directory delete fails on the non-empty dir, and this
    // raises LOUDLY instead of recursively destroying a committed epoch.
    bvs.foreach(v => fs.delete(manifestFile(bd, v), false))
    fs.delete(branchBasePath(bd), false)
    val emptied = try fs.delete(bd, false)
      catch { case _: java.io.IOException => false }
    if (!emptied && fs.exists(bd)) throw new IllegalStateException(
      s"graft-ocf branches: a commit landed on '$name' DURING fast_forward — " +
        s"its manifest remains under $bd. The published versions are live on " +
        "main; re-create the branch from the current head and replay the " +
        "late commit.")
    (base, if (bvs.nonEmpty) bvs.last else base)
  }

  def dropBranch(fs: FileSystem, tableDir: Path, name: String): Boolean =
    fs.delete(branchDir(tableDir, name), true)

  /** Every file path any branch manifest references, plus branch BASE
    * versions — what expiry and orphan collection must treat as live. */
  def branchReferencedFiles(fs: FileSystem, tableDir: Path): Set[String] =
    listBranches(fs, tableDir).flatMap { b =>
      val bd = branchDir(tableDir, b)
      versionsIn(fs, bd).flatMap(v =>
        readManifest(fs, manifestFile(bd, v)).files.map(_.path))
    }.toSet

  def branchBases(fs: FileSystem, tableDir: Path): Set[Long] =
    listBranches(fs, tableDir).map(b => branchBase(fs, tableDir, b)).toSet

  // ---- tags (named snapshots) ---------------------------------------------
  // `CALL g.system.tag('ns.t', 'v1-release')` pins a name to a version;
  // `VERSION AS OF 'v1-release'` resolves through it, and expire_snapshots
  // RETAINS tagged versions (and their files) regardless of keep_last —
  // the Iceberg tag semantics. One small JSON, replaced atomically.

  private def tagsPath(tableDir: Path): Path =
    new Path(snapshotsDir(tableDir), "_tags.json")

  def readTags(fs: FileSystem, tableDir: Path): Map[String, Long] = {
    val p = tagsPath(tableDir)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val root = mapper.readTree(bytes)
    val b = Map.newBuilder[String, Long]
    val it = root.fields()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asLong }
    b.result()
  }

  private def writeTags(fs: FileSystem, tableDir: Path,
                        tags: Map[String, Long]): Unit = {
    val root = mapper.createObjectNode()
    tags.toSeq.sortBy(_._1).foreach { case (k, v) => root.put(k, v) }
    val dest = tagsPath(tableDir)
    val tmp = new Path(snapshotsDir(tableDir),
      s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
    fs.mkdirs(snapshotsDir(tableDir))
    val out = fs.create(tmp, false)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"graft-ocf snapshots: could not replace $dest")
  }

  def tag(fs: FileSystem, tableDir: Path, name: String, version: Long): Unit = {
    require(name.nonEmpty && name.exists(!_.isDigit),
      s"graft-ocf snapshots: tag name '$name' must not look like a version number")
    require(versions(fs, tableDir).contains(version),
      s"graft-ocf snapshots: no snapshot version $version to tag under $tableDir")
    writeTags(fs, tableDir, readTags(fs, tableDir) + (name -> version))
  }

  def untag(fs: FileSystem, tableDir: Path, name: String): Boolean = {
    val tags = readTags(fs, tableDir)
    if (!tags.contains(name)) false
    else { writeTags(fs, tableDir, tags - name); true }
  }

  /** The table directory's current visible data files as relative manifest
    * entries — the migration base for a table's first snapshot commit. */
  def listingAsFiles(fs: FileSystem, tableDir: Path): Seq[SnapFile] = {
    val qual = fs.makeQualified(tableDir).toString
    val listed =
      try OcfDataSource.list(fs.getConf, Seq(tableDir.toString), None, recursive = true)
      catch { case _: java.io.FileNotFoundException => Nil }
    listed.map(f => SnapFile(relativize(qual, f.path), f.len))
  }

  def relativize(qualifiedTableDir: String, path: String): String = {
    val qp = path
    val prefix = qualifiedTableDir.stripSuffix("/") + "/"
    require(qp.startsWith(prefix),
      s"graft-ocf snapshots: $qp is not under table directory $qualifiedTableDir")
    qp.substring(prefix.length)
  }

  /** Manifest entries → qualified FileSlices (partition values re-derived
    * from the relative paths by the normal inference). */
  def toFileSlices(fs: FileSystem, tableDir: Path, files: Seq[SnapFile])
      : Seq[OcfDataSource.FileSlice] = {
    val base = fs.makeQualified(tableDir)
    files.map(f => OcfDataSource.FileSlice(new Path(base, f.path).toString, f.len))
  }
}
