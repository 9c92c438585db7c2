package graft.sources

import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{
  DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter,
  DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.{
  ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.types.{
  BooleanType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.io.Versioned

/**
 * Row-level SQL DML (`UPDATE`, `MERGE INTO`, and predicate `DELETE`s
 * the metadata path can't translate) for [[graft.io.Versioned]]
 * tables, as a DELTA-based V2 row-level operation — the natural fit
 * for a merge-on-read log: matched rows become APPENDED deltas
 * (updates as new-version rows, deletes as tombstones), never file
 * rewrites.
 *
 * The operation's table scan must produce each key's CURRENT row
 * exactly once (Spark joins it with the MERGE source and raises
 * MERGE_CARDINALITY_VIOLATION on duplicate matches), so it reads the
 * head CHECKPOINT directly — a pure file scan of the resolved
 * snapshot. When the head is NOT a checkpoint, one is auto-maintained
 * at DELTA cost first ([[graft.io.Versioned.compactIncremental]]):
 * only the commits since the last checkpoint fold, untouched
 * checkpoint files carry by reference — so the continuous-ingest +
 * periodic-MERGE rhythm pays O(delta) per statement, never the
 * O(table) rewrite a mandatory full `CALL system.compact` would
 * (the pre-r12 prerequisite). The maintenance commit is planning-time
 * work (it runs when the DML scan resolves its snapshot) and is
 * ordinary — time travel, CDC, and maintained views are indifferent
 * to it, like any compaction. Translatable `DELETE FROM` never hits
 * this path — Spark's optimizer swaps it to the metadata delete
 * ([[GraftCatalogTable.deleteWhere]]), which works at any head and
 * auto-compacts nothing.
 *
 * The write side is ONE staged commit shared by all tasks: the driver
 * claims a version slot and a staging dir
 * ([[Versioned.beginStagedCommit]]), executors write parquet parts
 * straight into it ([[ParquetOutputWriter]] — Spark's own row
 * writer), and commit publishes with the standard atomic rename,
 * keeping only files named in task commit messages (speculative or
 * retried attempts prune away). An UPDATE that changes the key column
 * itself writes tombstone(old key) + row(new key); a plain update
 * writes just the new row (the within-commit `__seq` order resolves
 * same-key pairs).
 */
private[sources] class GraftRowOperation(spark: SparkSession,
    path: String, keyCol: String, dataSchema: StructType,
    cmd: RowLevelOperation.Command,
    checks: Seq[(String, String)] = Nil) extends SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft row-level $cmd on $path (delta append over the head checkpoint)"

  // the rowId attribute must be non-nullable (Spark validates) — true
  // by construction for a checkpoint scan: the resolve is KEYED on
  // this column, a null key never survives it
  private val scanSchema = StructType(dataSchema.fields.map(f =>
    if (f.name == keyCol) f.copy(nullable = false) else f))

  /** (scanV, snapshotV): the CHECKPOINT this DML's scan reads, and
    * the SNAPSHOT the mapping resolves at / the write's conflict
    * guard checks against. LAZY on purpose: a DELETE the optimizer
    * swaps for the metadata path never evaluates it (nor the
    * checkpoint maintenance). A non-checkpoint head gets its
    * checkpoint maintained incrementally (delta cost) right here, so
    * DML works at ANY head. The two versions differ exactly when the
    * commits above the checkpoint are ALL metadata-only (rename/
    * drop/widen — no parquet parts): those carry no rows, so the
    * scan reads the checkpoint's files either way, but the snapshot
    * MUST advance to head — planning below a committed rename would
    * (a) resolve the WRONG (pre-rename) mapping for the scan's
    * physical projection and (b) spuriously abort the publish on the
    * rename commit as a phantom interloper ("compact → RENAME →
    * first UPDATE" failed every time). Column-mapped tables work
    * through the same logical→physical translation as every other
    * face: the scan below pins the physical projection of the
    * logical schema (the mapping thunk resolves at snapshotV), and
    * the write side translates its staged parts in
    * [[GraftDeltaBatchWrite]]. */
  private lazy val resolvedV: (Int, Int) = {
    val scanV = Versioned.headCheckpointVersion(spark, path).getOrElse(
      Versioned.compactIncremental(spark, path, keyCol))
    (scanV, Versioned.metadataOnlySuffixHead(spark, path, scanV))
  }
  private def snapshotV: Int = resolvedV._2

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, path, () => Seq(resolvedV._1), scanSchema,
      mappingThunk =
        () => Versioned.logicalToPhysical(spark, path, snapshotV))

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(keyCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new GraftDeltaBatchWrite(spark, path, info.schema(),
            info.rowIdSchema().orElse(StructType(Seq(
              dataSchema(dataSchema.fieldIndex(keyCol))))),
            () => snapshotV, checks)
      }
    }
}

/** Declared CHECK constraints evaluated against a STAGED commit before
  * publish — the gate every write path shares: the catalog INSERT
  * validates pre-stage ([[graft.io.Versioned.appendChecked]]); the
  * row-level DML write and the streaming V2 sink validate here, over
  * the staged parquet parts, so a declared-but-unenforced constraint
  * cannot exist. One aggregate pass; tombstone rows are excluded (a
  * DELETE writes nulls outside the key — SQL CHECKs constrain live
  * rows). SQL CHECK semantics: a row violates only when the expression
  * evaluates to FALSE (null passes — guard with `isNotNull` when null
  * must fail). Throws with per-constraint violation counts; callers
  * abort the stage, so the table and the version counter are
  * untouched. */
private[sources] object GraftChecks {
  /** The constraints whose referenced columns are ALL present — a
    * DELETE-only staged commit carries the key + tombstone columns
    * ONLY, and a constraint referencing absent columns can face
    * nothing but (exempt) tombstones there, because live rows always
    * carry the operation's full row schema. Skip those instead of
    * failing the statement on an unresolvable column. ONE rule shared
    * by the refuse-whole and dead-letter faces — they must never
    * diverge on which checks apply. */
  def applicableChecks(spark: SparkSession,
      checks: Seq[(String, String)],
      cols: Seq[String]): Seq[(String, String)] = {
    val present = cols.map(_.toLowerCase).toSet
    checks.filter { case (_, e) =>
      spark.sessionState.sqlParser.parseExpression(e).collect {
        case u: org.apache.spark.sql.catalyst.analysis
          .UnresolvedAttribute => u.nameParts.last.toLowerCase
      }.forall(present.contains(_))
    }
  }

  /** `physToLogical` renames a column-mapped table's staged PHYSICAL
    * columns back to the logical names the declared constraint
    * expressions speak (empty = unmapped, no rename). */
  def validateStaged(spark: SparkSession, staging: String,
      keep: Set[String], checks: Seq[(String, String)],
      physToLogical: Map[String, String] = Map.empty): Unit = {
    if (checks.isEmpty || keep.isEmpty) return
    import org.apache.spark.sql.functions.{col, expr, lit, sum, when}
    val raw = spark.read
      .parquet(keep.toSeq.sorted.map(n => s"$staging/$n"): _*)
    val df = raw.select(raw.columns.toSeq.map(c =>
        col(c).as(physToLogical.getOrElse(c, c))): _*)
      .filter(!col(Versioned.DeletedCol))
    val applicable = applicableChecks(spark, checks, df.columns)
    if (applicable.isEmpty) return
    val aggs = applicable.map { case (name, e) =>
      sum(when(expr(e) === lit(false), 1L).otherwise(0L)).as(name)
    }
    val counts = df.agg(aggs.head, aggs.tail: _*).head()
    val violated = applicable.map(_._1).zipWithIndex
      .map { case (name, i) =>
        name -> (if (counts.isNullAt(i)) 0L else counts.getLong(i))
      }
      .filter(_._2 > 0)
    if (violated.nonEmpty) throw new IllegalArgumentException(
      "CHECK constraint violation(s), nothing committed — " +
        violated.map { case (n, c) =>
          s"$n: $c row" + (if (c == 1) "" else "s")
        }.mkString("; "))
  }
}

/** One staged commit shared by every task of the DML write;
  * `snapshot` is the version the scan read — the publish runs the
  * optimistic-concurrency check against it
  * ([[Versioned.publishStagedChecked]]).
  *
  * COLUMN-MAPPED tables: Spark hands LOGICAL row/rowId schemas; the
  * staged parquet parts must carry the stable PHYSICAL names every
  * other commit writes. The factory translates both schemas through
  * the snapshot's mapping (rows are positional — only schema METADATA
  * changes), a logical column the mapping has never seen gets a fresh
  * version-salted physical id (MERGE schema evolution, the same rule
  * as [[graft.io.Versioned]]'s commitAt), and the publish persists
  * the updated snapshot atomically with the data. */
private[sources] class GraftDeltaBatchWrite(spark: SparkSession,
    path: String, rowSchema: StructType, idSchema: StructType,
    snapshot: () => Int, checks: Seq[(String, String)] = Nil)
    extends DeltaBatchWrite {

  // claimed when Spark asks for the writer factory (execution start);
  // read by commit/abort on the driver afterwards
  @volatile private var claimed: (Int, String) = _
  // the claimed slot's mapping state (empty/None on unmapped tables)
  @volatile private var l2p: Map[String, String] = Map.empty
  @volatile private var colmapOut: Option[Seq[(String, String)]] = None
  @volatile private var extrasOut: Seq[String] = Nil

  private def phys(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = l2p.getOrElse(f.name, f.name))))

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    claimed = Versioned.beginStagedCommit(spark, path)
    // extras (logical columns the mapping has never seen) are LEGAL
    // here — MERGE schema evolution mints them fresh physical ids
    val (m, snap, extras) = Versioned.stagedMapping(spark, path, claimed._1,
      (rowSchema.fields ++ idSchema.fields).map(_.name).toSeq)
    l2p = m; colmapOut = snap; extrasOut = extras
    // declare the intended snapshot BEFORE executors write: a
    // concurrent commit claiming a higher slot merges these extras
    // into its own re-snapshot instead of superseding them
    Versioned.writePendingColmap(spark, path, claimed._1, snap)
    GraftDeltaWriterFactory(claimed._2, claimed._1, phys(rowSchema),
      phys(idSchema),
      new SerializableConfiguration(GraftWriteConf.prepared(spark)))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val keep = messages.collect {
      case GraftDeltaCommit(file) if file.nonEmpty => file
    }.toSet
    // declared CHECK constraints gate THIS write path too (the INSERT
    // path validates pre-stage): a violating UPDATE/MERGE refuses
    // whole, the staged commit aborts, the version counter untouched
    try GraftChecks.validateStaged(spark, claimed._2, keep, checks,
      l2p.map(_.swap))
    catch {
      case e: Throwable =>
        Versioned.abortStaged(spark, path, claimed._1, claimed._2)
        throw e
    }
    // the key column narrows the OCC conflict domain: a plain INSERT
    // that committed below this slot with provably disjoint key
    // ranges (zone maps both sides) is not a conflict — periodic
    // MERGEs survive steady disjoint ingest without livelock. The
    // zone maps both sides speak PHYSICAL names.
    Versioned.publishStagedChecked(spark, path, claimed._1, claimed._2,
      keep, snapshot(),
      idSchema.fields.headOption.map(f => l2p.getOrElse(f.name, f.name)),
      colmap = colmapOut, colmapExtras = extrasOut)
    ()
  }

  // `claimed` is null when the write aborts before the factory ran
  // (planning failure, beginStagedCommit refusal) — nothing was staged,
  // so there is nothing to release; an unguarded dereference would NPE
  // and mask the original error
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    if (claimed != null)
      Versioned.abortStaged(spark, path, claimed._1, claimed._2)
}

private[sources] case class GraftDeltaCommit(file: String)
    extends WriterCommitMessage

/** The hadoop conf a direct [[ParquetOutputWriter]] needs — what
  * `ParquetFileFormat.prepareWrite` wires for DataFrame writes
  * ([[ParquetWriteSupport]].init ASSERTS these are explicitly set). */
private[sources] object GraftWriteConf {
  def prepared(spark: SparkSession): org.apache.hadoop.conf.Configuration = {
    val conf = spark.sessionState.newHadoopConf()
    val sqlc = spark.sessionState.conf
    conf.set("parquet.compression",
      sqlc.getConfString("spark.sql.parquet.compression.codec", "snappy"))
    conf.set("spark.sql.parquet.writeLegacyFormat",
      sqlc.writeLegacyParquetFormat.toString)
    conf.set("spark.sql.parquet.outputTimestampType",
      sqlc.parquetOutputTimestampType.toString)
    conf.set("spark.sql.parquet.fieldId.write.enabled",
      sqlc.parquetFieldIdWriteEnabled.toString)
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled",
      sqlc.getConfString(
        "spark.sql.parquet.variant.annotateLogicalType.enabled", "false"))
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite",
      sqlc.getConfString("spark.sql.parquet.datetimeRebaseModeInWrite",
        "EXCEPTION"))
    conf.set("spark.sql.parquet.int96RebaseModeInWrite",
      sqlc.getConfString("spark.sql.parquet.int96RebaseModeInWrite",
        "EXCEPTION"))
    conf
  }
}

/**
 * Structured-Streaming sink for the catalog table
 * (`df.writeStream…toTable("<catalog>.<t>")`): each micro-batch is
 * ONE staged commit carrying its `_BATCH_<epoch>` idempotency marker,
 * published only if no committed version already carries that marker
 * — so a replayed epoch (crash between sink commit and checkpoint
 * write) discards its staging instead of double-appending: the same
 * exactly-once contract as [[Versioned.appendBatch]], through the V2
 * sink API. Epochs run sequentially per query, so one in-flight
 * claim at a time.
 */
private[sources] class GraftStreamingWrite(spark: SparkSession,
    path: String, rowSchema: StructType, queryId: String,
    checks: Seq[(String, String)] = Nil,
    quarantinePath: Option[String] = None)
    extends StreamingWrite {

  @volatile private var claimed: (Int, String) = _
  // column-mapped table: staged parts carry PHYSICAL names (same
  // translation as the DML write; rows are positional, only schema
  // metadata changes) and the publish re-snapshots the mapping
  @volatile private var l2p: Map[String, String] = Map.empty
  @volatile private var colmapOut: Option[Seq[(String, String)]] = None

  // epoch ids restart at 0 for every NEW checkpoint, so the marker is
  // scoped by the checkpoint-STABLE query id (survives restarts of
  // the same query; distinct for a second query into the same table)
  private def marker(epochId: Long) = s"_BATCH_${queryId}_$epochId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    claimed = Versioned.beginStagedCommit(spark, path)
    val (m, snap, extras) = Versioned.stagedMapping(spark, path,
      claimed._1, rowSchema.fields.map(_.name).toSeq)
    // the sink schema was validated against the table at query start,
    // so a logical column the mapping no longer knows can only mean
    // concurrent rename/drop DDL — minting it a fresh physical id
    // would silently resurrect a dropped column or split one logical
    // column's data across two physical ids. Fail the epoch instead
    // (Delta's fail-on-schema-change for running streams); the user
    // restarts the query against the new schema.
    if (extras.nonEmpty) {
      Versioned.abortStaged(spark, path, claimed._1, claimed._2)
      throw new IllegalStateException(
        s"streaming write to $path: column(s) ${extras.mkString(", ")} " +
          "are no longer in the table's column mapping — a RENAME or " +
          "DROP COLUMN committed while this query ran. Restart the " +
          "stream against the current schema (epoch aborted, nothing " +
          "published).")
    }
    l2p = m; colmapOut = snap
    // declare the (extras-free) snapshot for the epoch's in-flight
    // window: concurrent commits above must not refuse on this claim
    Versioned.writePendingColmap(spark, path, claimed._1, snap)
    GraftStreamingWriterFactory(claimed._2, claimed._1,
      StructType(rowSchema.fields.map(f =>
        f.copy(name = l2p.getOrElse(f.name, f.name)))),
      new SerializableConfiguration(GraftWriteConf.prepared(spark)))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    if (Versioned.markerCommitted(spark, path, marker(epochId))) {
      // replayed epoch: its rows are already at rest — drop the stage
      Versioned.abortStaged(spark, path, claimed._1, claimed._2)
    } else {
      val keep = messages.collect {
        case GraftDeltaCommit(file) if file.nonEmpty => file
      }.toSet
      quarantinePath match {
        case Some(qp) if checks.nonEmpty && keep.nonEmpty =>
          try commitQuarantined(epochId, keep, qp)
          catch {
            case e: Throwable =>
              Versioned.abortStaged(spark, path, claimed._1, claimed._2)
              throw e
          }
        case _ =>
          // declared CHECK constraints gate the streaming sink too: a
          // violating micro-batch fails the query, nothing published
          try GraftChecks.validateStaged(spark, claimed._2, keep, checks,
            l2p.map(_.swap))
          catch {
            case e: Throwable =>
              Versioned.abortStaged(spark, path, claimed._1, claimed._2)
              throw e
          }
          publishClean(epochId, keep)
      }
    }
  }

  /** The non-quarantine publish: colmap re-resolved at publish — a
    * rename that committed DURING this epoch (after the factory
    * snapshotted the mapping) must not be rolled back by publishing
    * the stale snapshot. */
  private def publishClean(epochId: Long, keep: Set[String],
      extraMarkers: Seq[String] = Nil): Unit = {
    Versioned.publishStaged(spark, path, claimed._1, claimed._2, keep,
      markers = marker(epochId) +: extraMarkers,
      colmap = Versioned.refreshColmap(spark, path, claimed._1,
        colmapOut))
    ()
  }

  /** DEAD-LETTER epoch commit (the streaming face of
    * [[Versioned.appendCheckedQuarantine]], selected by the
    * `quarantine.path` table property): instead of failing the query
    * on a violating micro-batch, split the staged parts — violating
    * rows (enriched with `q_violated`, the comma-joined names of the
    * constraints they failed, and `q_batch` = the epoch id) divert to
    * the quarantine table via [[Versioned.appendBatch]] under the
    * SAME `_BATCH_<queryId>_<epoch>` marker family as this sink, so a
    * replayed epoch is exactly-once on BOTH tables; the clean slice
    * is rewritten into the staging dir and published through the
    * standard path. The quarantine commits FIRST — dead letters are
    * durable before any clean row becomes visible; a crash between
    * the two commits replays into "skip the committed quarantine,
    * land the clean slice" (epoch replay re-delivers the same source
    * offsets, so the split is deterministic). A violation-free epoch
    * publishes its staged parts untouched — the common case pays one
    * validation aggregate, no rewrite. Tombstone-flagged rows are
    * exempt, like [[GraftChecks.validateStaged]]. */
  private def commitQuarantined(epochId: Long, keep: Set[String],
      qp: String): Unit = {
    import org.apache.spark.sql.functions._
    // same guard as the batch API: a quarantine.path resolving to the
    // table itself would commit the dead letters as ordinary MAIN rows
    require(new org.apache.hadoop.fs.Path(qp) !=
      new org.apache.hadoop.fs.Path(path),
      s"quarantine.path resolves to the table itself ($path) — point " +
        "it at a separate table")
    val staging = claimed._2
    val raw = spark.read
      .parquet(keep.toSeq.sorted.map(n => s"$staging/$n"): _*)
    val p2l = l2p.map(_.swap)
    val logical = raw.select(raw.columns.toSeq.map(c =>
      col(c).as(p2l.getOrElse(c, c))): _*)
    // same applicability rule as validateStaged — ONE shared helper,
    // the faces must never diverge on which checks apply
    val applicable =
      GraftChecks.applicableChecks(spark, checks, logical.columns)
    if (applicable.isEmpty) { publishClean(epochId, keep); return }
    val anyViol = coalesce(applicable.map { case (_, e) =>
      expr(e) === lit(false) }.reduce(_ || _), lit(false)) &&
      !col(Versioned.DeletedCol)
    val counts = logical.agg(count(lit(1)).as("__n"),
      sum(when(anyViol, 1L).otherwise(0L)).as("__bad")).head()
    val bad = if (counts.isNullAt(1)) 0L else counts.getLong(1)
    if (bad == 0) { publishClean(epochId, keep); return }
    val stats = s"_CHECKS_clean-${counts.getLong(0) - bad}_bad-$bad"
    // dead letters FIRST, exactly-once via the quarantine table's own
    // _BATCH_<queryId>_<epoch> marker
    val reasons = concat_ws(",", applicable.map { case (n, e) =>
      when(expr(e) === lit(false), lit(n)) }: _*)
    Versioned.appendBatch(
      logical.filter(anyViol)
        .drop(Versioned.MetaCols.toSeq: _*)
        .withColumn("q_violated", reasons)
        .withColumn("q_batch", lit(epochId)),
      qp, epochId, queryId, extraMarkers = Seq(stats))
    // clean slice: rewrite into the SAME staging dir as fresh parts
    // (meta columns — __v, __seq, tombstone flags — ride through the
    // physical-name projection untouched), publish ONLY those; the
    // original full parts prune away in publishStaged
    val cleanLogical = logical.filter(!anyViol)
    val cleanPhys = cleanLogical.select(cleanLogical.columns.toSeq
      .map(c => col(c).as(l2p.getOrElse(c, c))): _*)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(staging, ".cleanq")
    cleanPhys.write.mode("overwrite").parquet(tmp.toString)
    val newNames = f.listStatus(tmp).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).zipWithIndex
      .map { case (p, i) =>
        val n = s"part-cleanq-$i-${p.getName.stripPrefix("part-")}"
        require(f.rename(p, new org.apache.hadoop.fs.Path(staging, n)),
          s"quarantine epoch $epochId: failed to move clean part $p")
        n
      }.toSet
    f.delete(tmp, true)
    publishClean(epochId, newNames, extraMarkers = Seq(stats))
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    if (claimed != null) // see GraftDeltaBatchWrite.abort
      Versioned.abortStaged(spark, path, claimed._1, claimed._2)
}

private[sources] case class GraftStreamingWriterFactory(staging: String,
    version: Int, rowSchema: StructType,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftDeltaWriter(staging, version, rowSchema, StructType(Nil),
      conf, partitionId, taskId)
}

private[sources] case class GraftDeltaWriterFactory(staging: String,
    version: Int, rowSchema: StructType, idSchema: StructType,
    conf: SerializableConfiguration) extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(staging, version, rowSchema, idSchema,
      conf, partitionId, taskId)
}

/**
 * Per-task delta writer: appends MOR rows — the full new row for
 * inserts/updates, a key-only tombstone for deletes — into one
 * parquet part in the shared staging dir, stamping the commit-log
 * columns ([[Versioned.commit]]'s job on the DataFrame path). The
 * parquet file is Spark's own [[ParquetOutputWriter]], so types,
 * timestamps, and compression match DataFrame-written commits.
 */
private[sources] class GraftDeltaWriter(staging: String, version: Int,
    rowSchema: StructType, idSchema: StructType,
    conf: SerializableConfiguration, partitionId: Int, taskId: Long)
    extends DeltaWriter[InternalRow] {

  private val fileName =
    f"part-$partitionId%05d-$taskId-graftdml.parquet"

  // output layout: row columns, then id columns the row schema lacks
  // (a DELETE-only write has an empty row schema), then the log
  // columns. All nullable: tombstones carry nulls outside the key.
  private val extraIdFields =
    idSchema.fields.filterNot(f => rowSchema.fieldNames.contains(f.name))
  private val outSchema = StructType(
    (rowSchema.fields ++ extraIdFields)
      .map(f => StructField(f.name, f.dataType, nullable = true)) ++ Seq(
      StructField(Versioned.DeletedCol, BooleanType, nullable = false),
      StructField(Versioned.MergeCol, BooleanType, nullable = false),
      StructField(Versioned.CkptCol, BooleanType, nullable = false),
      StructField(Versioned.VersionCol, IntegerType, nullable = false),
      StructField(Versioned.SeqCol, LongType, nullable = false)))
  private val nData = rowSchema.length + extraIdFields.length
  private val deletedAt = nData
  private val mergeAt = nData + 1
  private val ckptAt = nData + 2
  private val versionAt = nData + 3
  private val seqAt = nData + 4
  // id column positions in the OUT row, and in the ROW schema (for
  // the update() key-change check), aligned by name
  private val idOutPos = idSchema.fields.map(f =>
    outSchema.fieldIndex(f.name))
  private val idRowPos = idSchema.fields.map(f =>
    rowSchema.fieldNames.indexOf(f.name))
  private var seq = 0L

  private lazy val writer: ParquetOutputWriter = {
    val c = new org.apache.hadoop.conf.Configuration(conf.value)
    // what ParquetFileFormat.prepareWrite wires for DataFrame writes:
    // the InternalRow write support + its row schema
    c.set("parquet.write.support.class",
      classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(outSchema, c)
    val tid = new TaskAttemptID(
      new TaskID(new JobID(s"graftdml-v$version", 0), TaskType.MAP,
        partitionId), taskId.toInt)
    new ParquetOutputWriter(s"$staging/$fileName",
      new TaskAttemptContextImpl(c, tid))
  }
  private var opened = false

  private def emit(fill: GenericInternalRow => Unit,
      deleted: Boolean): Unit = {
    val out = new GenericInternalRow(outSchema.length)
    fill(out)
    out.update(deletedAt, deleted)
    out.update(mergeAt, false)
    out.update(ckptAt, false)
    out.update(versionAt, version)
    // task-unique, monotonic within the task: same-key tombstone+row
    // pairs resolve to the later write
    out.update(seqAt, (partitionId.toLong << 40) | seq)
    seq += 1
    opened = true
    writer.write(out)
  }

  override def insert(row: InternalRow): Unit =
    emit(out => copyRow(row, out), deleted = false)

  /** Plain-append face (the streaming sink's writer): every row is an
    * insert. */
  override def write(row: InternalRow): Unit = insert(row)

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    // key changed by SET? then the old key must die for the new row
    // to be an insert, not a shadow
    val keyChanged = idRowPos.indices.exists { i =>
      idRowPos(i) >= 0 && !java.util.Objects.equals(
        valueAt(id, i, idSchema.fields(i).dataType),
        valueAt(row, idRowPos(i), idSchema.fields(i).dataType))
    }
    if (keyChanged) delete(meta, id)
    emit(out => copyRow(row, out), deleted = false)
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    emit(out => idOutPos.indices.foreach(i => out.update(idOutPos(i),
      valueAt(id, i, idSchema.fields(i).dataType))), deleted = true)

  private def copyRow(row: InternalRow, out: GenericInternalRow): Unit = {
    var i = 0
    while (i < rowSchema.length) {
      out.update(i, valueAt(row, i, rowSchema.fields(i).dataType))
      i += 1
    }
  }

  private def valueAt(row: InternalRow, i: Int,
      dt: org.apache.spark.sql.types.DataType): Any =
    if (row.isNullAt(i)) null else row.get(i, dt)

  override def commit(): WriterCommitMessage = {
    if (opened) { writer.close(); GraftDeltaCommit(fileName) }
    else GraftDeltaCommit("") // wrote nothing: no file to keep
  }

  override def abort(): Unit = {
    if (opened) writer.close()
    // best-effort: the driver-side publish prunes uncommitted files
    // anyway; this just frees space early
    try {
      val p = new org.apache.hadoop.fs.Path(s"$staging/$fileName")
      p.getFileSystem(conf.value).delete(p, false)
      ()
    } catch { case _: java.io.IOException => () }
  }

  override def close(): Unit = ()
}
