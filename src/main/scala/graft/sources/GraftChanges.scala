package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, count, explode, lit, sequence}

/** Change-data-feed reads over snapshot history (X92, the Delta CDF /
  * Iceberg changelog shape): every row the table GAINED or LOST in
  * `(startVersion, endVersion]`, tagged `_change_type` ('insert'|'delete')
  * and `_commit_version` — the primitive that propagates corpus edits
  * (GDPR erasures, corrections, appends) to downstream derived datasets
  * incrementally instead of re-diffing whole snapshots.
  *
  * How each commit's changes derive, all DISTRIBUTED (no driver row
  * materialization anywhere):
  *  - files ADDED as table data → their rows, read AS OF that version
  *    (later versions' deletes must not leak backward), as inserts;
  *  - position-delete files ADDED → the lost rows, recovered exactly as
  *    `rows(target, v-1) ANTI JOIN rows(target, v) ON (_file, _pos)` —
  *    two targeted scans and one shuffle over only the burdened files;
  *  - a merge-on-read UPDATE therefore emits its old rows as deletes and
  *    its new rows as inserts in the same commit (the standard CDC pair);
  *  - equality-delete files ADDED (X94 upserts) → the same before/after
  *    anti-join over the burdened (older-seq) files;
  *  - a COPY-ON-WRITE row-level commit ('replace-rows': CoW DELETE/
  *    UPDATE/MERGE) → the MULTISET DIFF of the replaced files' rows
  *    (as of v-1) against the replacement files' rows (as of v): rows
  *    only in the before side are deletes, only in the after side are
  *    inserts, and surviving rows cancel — a groupBy-count full-outer
  *    join over only the replaced/replacement files, exact by value;
  *  - row-preserving rewrites (compact, rewrite_position_deletes) emit
  *    nothing; any OTHER commit that removed/replaced data files
  *    (overwrites, partition drops) REFUSES — its per-row changes are
  *    not recoverable from the file diff, and a silent partial answer
  *    would corrupt every downstream increment.
  *
  * `readerSchemaJson` (Avro, DATA columns) pins one schema across the
  * range — catalog callers pass their stored reader schema so a range
  * spanning schema evolution still unions cleanly; None falls back to the
  * first file's writer schema (fine without evolution). */
object GraftChanges {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** Commits whose file removals are row-preserving by construction. */
  private val RowPreservingOps = Set("compact", "rewrite-position-deletes")

  /** The copy-on-write row-level operation ([[OcfCommit]]'s `replace-rows`):
    * the ONLY file-replacing commit whose per-row changes are recoverable —
    * the replaced and replacement file sets are both named by the commit,
    * so their value-level multiset diff IS the change set. */
  private val CowRowLevelOp = "replace-rows"

  /** Exact multiset diff of two row sets sharing a schema: rows only in
    * `before` are deletes, only in `after` inserts, common multiplicity
    * cancels. One groupBy-count per side + a null-safe full-outer join —
    * work proportional to the replaced/replacement files, never the table.
    * `pairKeys` (X104, CoW commits): the changed rows re-tag as update
    * pairs by key where both sides carry the key. */
  private def multisetDiff(before: Option[DataFrame], after: Option[DataFrame],
                           v: Long, pairKeys: Seq[String] = Nil): Seq[DataFrame] = {
    (before, after) match {
      case (None, None) => Nil
      case (Some(b), None) => Seq(tag(b, "delete", v))
      case (None, Some(a)) => Seq(tag(a, "insert", v))
      case (Some(b), Some(a)) =>
        val cols = b.columns.toSeq
        val bg = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_nb"))
        val ag = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_na"))
        val joined = bg.join(ag,
          cols.map(c => bg(c) <=> ag(c)).reduce(_ && _), "full_outer")
        val merged = joined.select(
          cols.map(c => coalesce(bg(c), ag(c)).as(c)) ++ Seq(
            coalesce(col("_nb"), lit(0L)).as("_nb"),
            coalesce(col("_na"), lit(0L)).as("_na")): _*)
        def emit(n: org.apache.spark.sql.Column) =
          merged.where(n > lit(0L))
            .withColumn("_dup", explode(sequence(lit(1L), n)))
            .select(cols.map(col): _*)
        pairAndTag(Some(emit(col("_na") - col("_nb"))),
          Some(emit(col("_nb") - col("_na"))), pairKeys, v)
    }
  }

  private def tag(df: DataFrame, t: String, v: Long): DataFrame =
    df.withColumn(ChangeTypeCol, lit(t)).withColumn(CommitVersionCol, lit(v))

  /** Tag one commit's insert/delete row sets — as update pairs by key
    * (X104) when `pairKeys` is given and both sides exist, else plainly.
    * Null-safe key equality (the engine's tuple match treats null == null,
    * so must the join); the key sets are O(changed rows), broadcastable. */
  private def pairAndTag(insertDf: Option[DataFrame], deleteDf: Option[DataFrame],
                         pairKeys: Seq[String], v: Long): Seq[DataFrame] =
    (insertDf, deleteDf) match {
      case (Some(ins), Some(del)) if pairKeys.nonEmpty =>
        val kc = pairKeys.map(k => ins.columns.find(_.equalsIgnoreCase(k))
          .getOrElse(throw new IllegalArgumentException(
            s"graft-ocf changes: pairing key column '$k' is not in the feed " +
              s"schema (${ins.columns.mkString(", ")})")))
        // The insert and delete sides of a CoW commit derive from the SAME
        // file-diff plan, so a key set selected straight off one side would
        // share expression IDs with the other — a self-join whose
        // resolution rests on Spark's dataset-id disambiguation. Aliasing
        // every key-set column to a fresh name mints new expression IDs at
        // the key set's output, making each semi/anti join unambiguous by
        // construction (the probe side's attributes can only resolve left).
        val fresh = kc.indices.map(i => s"_graft_pk$i")
        def keysOf(side: DataFrame) =
          side.select(kc.zip(fresh).map { case (c, f) => side(c).as(f) }: _*)
            .distinct()
        val insKeys = keysOf(ins)
        val delCond = kc.zip(fresh).map { case (c, f) => del(c) <=> insKeys(f) }
          .reduce(_ && _)
        val delKeys = keysOf(del)
        val insCond = kc.zip(fresh).map { case (c, f) => ins(c) <=> delKeys(f) }
          .reduce(_ && _)
        Seq(tag(del.join(insKeys, delCond, "left_semi"), "update_preimage", v),
          tag(del.join(insKeys, delCond, "left_anti"), "delete", v),
          tag(ins.join(delKeys, insCond, "left_semi"), "update_postimage", v),
          tag(ins.join(delKeys, insCond, "left_anti"), "insert", v))
      case _ =>
        insertDf.map(tag(_, "insert", v)).toSeq ++
          deleteDf.map(tag(_, "delete", v))
    }

  /** [[changes]] for a catalog-qualified table (`"cat.ns.table"`): the
    * location AND the stored reader schema come from the catalog, so the
    * feed unions cleanly even across schema evolution in the range. */
  def forTable(spark: SparkSession, qualifiedName: String,
               startVersion: Long, endVersion: Option[Long] = None,
               updateImages: Boolean = false): DataFrame = {
    val parts = qualifiedName.split('.')
    require(parts.length >= 3,
      s"graft-ocf changes: want 'catalog.namespace.table', got '$qualifiedName'")
    val cat = spark.sessionState.catalogManager.catalog(parts.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"graft-ocf changes: catalog '${parts.head}' is ${other.getClass.getName}, " +
          "not a GraftCatalog")
    }
    val meta = cat.tableMeta(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        parts.tail.init, parts.last))
    // a declared `upsertKeys` table option names the row identity — CoW
    // commits pair by it under updateImages (eq commits carry their own)
    val declaredKeys: Seq[String] =
      if (!updateImages) Nil
      else meta.options.find(_._1.equalsIgnoreCase("upsertKeys"))
        .map(_._2.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    changes(spark, meta.location, startVersion, endVersion,
      Some(GraftCatalog.readerJsonWithDefaults(meta.dataSchema)),
      updateImages = updateImages, pairKeys = declaredKeys)
  }

  /** `updateImages=true` (X104 parity for the programmatic surface): an
    * equality-delete commit's delete+insert rows sharing a key re-tag
    * `update_preimage`/`update_postimage` — two broadcastable key
    * semi/anti joins per upsert commit, O(batch). Pairing applies to the
    * upsert/apply-changes commit SHAPE (equality deletes, one key-column
    * set, both sides present); a commit also carrying position deletes or
    * mixing key shapes stays delete+insert — the file diff cannot
    * attribute its lost rows to keys.
    *
    * `pairKeys` extends pairing to COPY-ON-WRITE row-level commits (CoW
    * UPDATE/MERGE), whose value-level multiset diff has no delete files to
    * derive keys from: the caller names the row-identity columns and the
    * diff's changed rows pair by them. `forTable` fills it from the
    * table's declared `upsertKeys` option when present. */
  def changes(spark: SparkSession, tableDir: String,
              startVersion: Long, endVersion: Option[Long] = None,
              readerSchemaJson: Option[String] = None,
              updateImages: Boolean = false,
              pairKeys: Seq[String] = Nil): DataFrame = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(OcfSnapshots.enabled(fs, root),
      s"graft-ocf changes: $tableDir is not snapshot-managed")
    val vs = OcfSnapshots.versions(fs, root)
    def known(v: Long, role: String): Unit = require(vs.contains(v),
      s"graft-ocf changes: $role version $v is not a retained snapshot " +
        s"(retained: ${vs.mkString(", ")})")
    // startVersion 0 = the GENESIS baseline (empty table before its first
    // commit), mirroring the streaming feed's `startingVersion=0`: every
    // retained version replays, the first one as pure inserts. Exact only
    // while the full history survives — an expired v1 refuses.
    if (startVersion == 0L)
      require(vs.headOption.contains(1L),
        "graft-ocf changes: startVersion 0 (genesis) needs the full " +
          s"history retained; earliest retained version is ${vs.headOption
            .getOrElse(-1L)}")
    else known(startVersion, "startVersion")
    val end = endVersion.getOrElse(vs.last)
    known(end, "endVersion")
    require(end > startVersion,
      s"graft-ocf changes: empty range ($startVersion, $end]")
    val chain = vs.filter(v => v >= startVersion && v <= end)

    def readAsOf(v: Long, relFiles: Seq[String], withPos: Boolean): DataFrame = {
      var r = spark.read.format("graft-ocf")
        .option("graft.snapshot.version", v.toString)
        .option("graft.files", relFiles.sorted.mkString(","))
        // engine lens: `_p_*` transform levels are derived layout, never
        // feed columns — also what keeps MIXED spec eras (X100) unioning
        // instead of failing on per-era phantom columns
        .option("transformPartitions", "")
      readerSchemaJson.foreach(j => r = r.option("readerSchema", j))
      val df0 = r.load(tableDir)
      // bucket levels (any era, X103) are layout too (the read has no
      // bucket spec to fold them into, so they would surface as columns)
      val df = df0.drop(df0.columns.filter(OcfBucket.isLevel).toIndexedSeq: _*)
      if (withPos) df.selectExpr("*", OcfDataSource.FileColName,
        OcfDataSource.PosColName)
      else df
    }

    var prev =
      if (startVersion == 0L)
        OcfSnapshots.Snapshot(0L, 0L, "genesis", Nil)
      else OcfSnapshots.read(fs, root, chain.head)
    var prevV = if (startVersion == 0L) 0L else chain.head
    val parts = Seq.newBuilder[DataFrame]
    val walk = if (startVersion == 0L) chain else chain.tail
    walk.foreach { v =>
      val cur = OcfSnapshots.read(fs, root, v)
      val prevByPath = prev.files.map(f => f.path -> f).toMap
      val curPaths = cur.files.map(_.path).toSet
      val removedData = prev.files.filter(f =>
        f.isData && !curPaths.contains(f.path))
      if (removedData.nonEmpty)
        require(RowPreservingOps.contains(cur.operation) ||
            cur.operation == CowRowLevelOp,
          s"graft-ocf changes: version $v (operation '${cur.operation}') " +
            s"removed or replaced ${removedData.size} data file(s) — its " +
            "per-row changes are not recoverable from the file diff. Read " +
            "a full snapshot instead, or start after the rewriting commit.")
      if (cur.operation == CowRowLevelOp) {
        // copy-on-write DELETE/UPDATE/MERGE: the replaced files' rows
        // (before) vs the replacement files' rows (after), value-exact
        val addedData = cur.files.filter(f =>
          f.isData && !prevByPath.contains(f.path)).map(_.path)
        val before =
          if (removedData.isEmpty) None
          else Some(readAsOf(prevV, removedData.map(_.path), withPos = false))
        val after =
          if (addedData.isEmpty) None
          else Some(readAsOf(v, addedData, withPos = false))
        parts ++= multisetDiff(before, after, v,
          pairKeys = if (updateImages) pairKeys else Nil)
      } else if (!RowPreservingOps.contains(cur.operation)) {
        val addedData = cur.files.filter(f =>
          f.isData && !prevByPath.contains(f.path)).map(_.path)
        // anti-join only targets that were VISIBLE at the previous
        // retained version: a target added in the same step (or an expired
        // gap) surfaces through the as-of-v insert read, which already
        // applies this step's deletes
        val addedPosTargets = cur.files.filter(f =>
          f.isPositionDelete && !prevByPath.contains(f.path))
          .flatMap(_.deleteOf).distinct
          .filter(prevByPath.contains)
        // an EQUALITY delete (X94, upsert commit) burdens every data file
        // born before it: the same before/after anti-join recovers its
        // per-row deletions exactly — the after-read applies the new keys.
        // Burden SCOPING ([[OcfEqScope]]): files whose manifest-inline
        // min/max bounds provably admit none of the commit's keys lost no
        // rows and are excluded — without this, every upsert commit
        // re-reads ~the whole pre-commit table through the anti-join.
        val addedEq = cur.files.filter(f =>
          f.isEqualityDelete && !prevByPath.contains(f.path))
        val addedEqTargets =
          if (addedEq.isEmpty) Nil
          else {
            val conf = spark.sessionState.newHadoopConf()
            val baseQ = fs.makeQualified(root)
            val eqInfos = addedEq.map(e => (e.seq,
              OcfEqScope.summaryFor(OcfEqScope.metaOfSnap(baseQ, e, conf), conf)))
            prev.files.filter(f => f.isData && eqInfos.exists {
              case (eseq, sum) => f.seq < eseq &&
                OcfEqScope.mayBurdenFile(f, baseQ, sum, conf)
            }).map(_.path)
          }
        val addedDeleteTargets = (addedPosTargets ++ addedEqTargets).distinct
        val insertDf: Option[DataFrame] =
          if (addedData.isEmpty) None
          else Some(readAsOf(v, addedData, withPos = false))
        val deleteDf: Option[DataFrame] =
          if (addedDeleteTargets.isEmpty) None
          else {
            // before = the previous RETAINED version (v-1 may be expired);
            // deletions inside an expired gap then attribute to v — the same
            // consecutive-retained coarsening the incremental read documents
            val before = readAsOf(prevV, addedDeleteTargets, withPos = true)
            val after = readAsOf(v, addedDeleteTargets, withPos = true)
              .select(OcfDataSource.FileColName, OcfDataSource.PosColName)
            Some(before.join(after,
                Seq(OcfDataSource.FileColName, OcfDataSource.PosColName),
                "left_anti")
              .drop(OcfDataSource.FileColName, OcfDataSource.PosColName))
          }
        // UPDATE pairing (X104): only the clean upsert shape pairs — the
        // anti-join's lost rows are attributable to keys only when EVERY
        // delete this commit made was an equality delete of ONE key shape.
        val eqPairKeys: Seq[String] =
          if (updateImages && addedEq.nonEmpty && addedPosTargets.isEmpty &&
              addedEq.map(_.equalityOf.get).distinct.length == 1)
            addedEq.head.equalityOf.get
          else Nil
        parts ++= pairAndTag(insertDf, deleteDf, eqPairKeys, v)
      }
      prev = cur
      prevV = v
    }
    val all = parts.result()
    if (all.isEmpty) {
      // a range of only row-preserving commits legitimately changed zero
      // rows — an EMPTY frame (shaped by the pinned reader schema, the
      // same rule as X78's incremental read), not an error; incremental
      // consumers must not have to try/catch "no changes". Without a
      // schema there is nothing to shape, so the refusal stays loud.
      readerSchemaJson match {
        case Some(j) =>
          val (dataSql, _) = OcfDataSource.sqlShape(j)
          val shape = org.apache.spark.sql.types.StructType(dataSql.fields ++ Seq(
            org.apache.spark.sql.types.StructField(ChangeTypeCol,
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField(CommitVersionCol,
              org.apache.spark.sql.types.LongType, nullable = false)))
          return spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](), shape)
        case None => throw new IllegalArgumentException(
          s"graft-ocf changes: range ($startVersion, $end] holds only " +
            "row-preserving commits and no readerSchema was given to shape " +
            "an empty result; read any version in the range for the " +
            "(unchanged) rows")
      }
    }
    all.reduce(_ unionByName _)
  }
}
