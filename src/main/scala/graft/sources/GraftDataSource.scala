package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Expression, Literal, And => CAnd,
  EqualTo => CEqualTo, GreaterThan => CGreaterThan,
  GreaterThanOrEqual => CGreaterThanOrEqual, In => CIn,
  IsNotNull => CIsNotNull, LessThan => CLessThan,
  LessThanOrEqual => CLessThanOrEqual}
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{
  Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, Statistics, SupportsPushDownAggregates,
  SupportsPushDownFilters, SupportsPushDownLimit,
  SupportsPushDownRequiredColumns, SupportsReportStatistics,
  SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, ReadLimit, SupportsTriggerAvailableNow,
  Offset => SOffset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{
  IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Versioned

/**
 * The SQL-facing DataSourceV2 read path for [[graft.io.Versioned]]
 * tables:
 *
 * {{{
 *   spark.read.format("graft").load(path)                     // latest
 *   spark.read.format("graft")
 *     .option("versionAsOf", 7).load(path)                    // time travel
 *   spark.read.format("graft")
 *     .option("timestampAsOf", epochMillis).load(path)
 * }}}
 *
 * Semantics are EXACTLY [[Versioned.asOf]]: the committed log slice at
 * the requested version — checkpoint dirs excluded, the vacuum base
 * standing in for a reclaimed prefix — with the commit metadata
 * columns (`__v`, `__deleted`, …) exposed so
 * [[Versioned.currentOf]] resolves keys on top exactly like the Scala
 * API. The scan itself is Spark's own V2 parquet machinery
 * ([[ParquetTable]]) handed a file list that this provider prunes with
 * the table's commit-time zone maps (`_STATS.tsv`): pushed filters are
 * translated to per-column bounds, files whose footer [min,max] cannot
 * match are never opened, and the same filters are re-pushed into the
 * parquet scan for row-group pruning — pushdown reaches BOTH
 * file-skipping layers. Column pruning passes straight through to the
 * parquet reader (`ReadSchema`). All filters are also reported back as
 * residual, so a bound the stats cannot evaluate is still applied
 * row-wise — pruning can drop work, never rows.
 */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = GraftDataSource.pathOf(options)
    Versioned.sliceSchema(spark, path, GraftDataSource.sliceOf(
      spark, path, GraftDataSource.versionOf(spark, options), options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] object GraftDataSource {

  /** The version-dir slice a read covers. Default = the LOG view
    * ([[Versioned.asOfVersions]]: every non-checkpoint commit — raw
    * history, O(commits) dirs). `fromCheckpointBase=true` = the
    * BOUNDED resolve set ([[Versioned.currentAsOfVersions]]: the
    * newest checkpoint at or below the version plus the log above
    * it) — same resolved state once key-resolved, but the scan reads
    * the checkpoint's key-clustered files, whose tight zone maps are
    * what runtime IN-set pruning needs for per-key lookups. */
  def sliceOf(spark: SparkSession, path: String, version: Int,
      options: CaseInsensitiveStringMap): Seq[Int] =
    if (options.getBoolean("fromCheckpointBase", false))
      Versioned.currentAsOfVersions(spark, path, version)
    else Versioned.asOfVersions(spark, path, version)

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null,
      "graft source needs a table path: spark.read.format(\"graft\").load(path)")
    p
  }

  /** The version this read travels to: `versionAsOf` wins, then
    * `timestampAsOf` (epoch millis against the commit `_TS_` stamps),
    * else the latest committed version. */
  def versionOf(spark: SparkSession, options: CaseInsensitiveStringMap): Int = {
    val path = pathOf(options)
    require(!(options.containsKey("versionAsOf") &&
        options.containsKey("timestampAsOf")),
      "set versionAsOf or timestampAsOf, not both")
    Option(options.get("versionAsOf")).map(_.toInt)
      .orElse(Option(options.get("timestampAsOf"))
        .map(ts => Versioned.versionAt(spark, path, ts.toLong)))
      .getOrElse(Versioned.latestVersion(spark, path))
  }

  /** Streaming admission control: `maxVersionsPerTrigger` caps how
    * many commit versions one micro-batch may deliver. */
  def maxVersionsOf(options: CaseInsensitiveStringMap): Option[Int] =
    Option(options.get("maxVersionsPerTrigger")).map { s =>
      val n = s.toInt
      require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n")
      n
    }

  /** Streaming admission control by BYTE budget: `maxBytesPerTrigger`
    * caps a micro-batch at the commit dirs whose data bytes fit the
    * budget (the first version past an empty budget is still
    * admitted — progress is guaranteed). Composes with the version
    * cap: whichever binds first stops the batch. */
  def maxBytesOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("maxBytesPerTrigger")).map { s =>
      val n = s.toLong
      require(n >= 1, s"maxBytesPerTrigger must be >= 1, got $n")
      n
    }

  /** Where a FRESH stream starts: `startingVersion` = deliver from
    * that commit version (inclusive) instead of backfilling the
    * whole table; the string `latest` = only commits AFTER stream
    * start. Resuming from a checkpoint ignores this (the offset in
    * the checkpoint wins — Spark never asks for initialOffset
    * again). Starting below the vacuum horizon refuses loudly at
    * first planning ([[graft.io.Versioned.streamSlice]]). */
  def startingVersionOf(spark: SparkSession, path: String,
      options: CaseInsensitiveStringMap): Option[Int] =
    Option(options.get("startingVersion")).map {
      case s if s.equalsIgnoreCase("latest") =>
        Versioned.latestVersion(spark, path) + 1
      case s =>
        val n = s.toInt
        require(n >= 1, s"startingVersion must be >= 1 or 'latest', got $n")
        n
    }

  /** Per-column [lo, hi] bounds implied by pushed V1 filters — the
    * zone-map language. Conservative: unhandled shapes contribute no
    * bound (the file is kept; the residual filter still applies). */
  def boundsOf(filters: Seq[Filter]): Seq[(String, Option[Any], Option[Any])] =
    filters.flatMap {
      case EqualTo(c, v)            => Seq((c, Some(v), Some(v)))
      case EqualNullSafe(c, v) if v != null => Seq((c, Some(v), Some(v)))
      case GreaterThan(c, v)        => Seq((c, Some(v), None))
      case GreaterThanOrEqual(c, v) => Seq((c, Some(v), None))
      case LessThan(c, v)           => Seq((c, None, Some(v)))
      case LessThanOrEqual(c, v)    => Seq((c, None, Some(v)))
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) =>
        // [min, max] envelope of the literal set — sound, coarser.
        // Strings order in unsigned UTF-8 byte order (UTF8String's
        // binary compare) — the SAME order the zone-map consumer
        // compares in. A UTF-16 sort here inverts the envelope for
        // sets mixing U+E000–U+FFFF with supplementary-plane values
        // (lo > hi in byte order), wrongly pruning every file.
        (vs.headOption.collect { case _: Number =>
          val ns = vs.map(_.asInstanceOf[Number].doubleValue())
          Seq((c, Some(vs(ns.indexOf(ns.min)): Any),
            Some(vs(ns.indexOf(ns.max)): Any)))
        }).getOrElse {
          val cmp = vs.sortBy(v =>
            org.apache.spark.unsafe.types.UTF8String.fromString(v.toString))
          Seq((c, Some(cmp.head: Any), Some(cmp.last: Any)))
        }
      case And(l, r) => boundsOf(Seq(l)) ++ boundsOf(Seq(r))
      case _ => Nil
    }

  /** Translate a pushed V1 filter back into a RESOLVED catalyst
    * predicate over the table schema, for re-pushing into the inner
    * parquet scan (row-group pruning). Partial: None = not re-pushed
    * (still applied as the residual). */
  def toCatalyst(f: Filter,
      attrs: Map[String, AttributeReference]): Option[Expression] = {
    def a(c: String) = attrs.get(c)
    f match {
      case EqualTo(c, v)            => a(c).map(CEqualTo(_, Literal(v)))
      case GreaterThan(c, v)        => a(c).map(CGreaterThan(_, Literal(v)))
      case GreaterThanOrEqual(c, v) =>
        a(c).map(CGreaterThanOrEqual(_, Literal(v)))
      case LessThan(c, v)           => a(c).map(CLessThan(_, Literal(v)))
      case LessThanOrEqual(c, v)    => a(c).map(CLessThanOrEqual(_, Literal(v)))
      case IsNotNull(c)             => a(c).map(CIsNotNull(_))
      case In(c, vs)                =>
        a(c).map(at => CIn(at, vs.toSeq.map(Literal(_))))
      case And(l, r) =>
        for (cl <- toCatalyst(l, attrs); cr <- toCatalyst(r, attrs))
          yield CAnd(cl, cr)
      case _ => None
    }
  }
}

private[sources] class GraftTable(tableSchema: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {

  private val path = GraftDataSource.pathOf(options)

  override def name(): String = s"graft.`$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    // travel options arrive via the TABLE options (DataFrameReader
    // merges .option(...) into the table properties)
    val version = GraftDataSource.versionOf(spark, options)
    new GraftScanBuilder(spark, path,
      () => GraftDataSource.sliceOf(spark, path, version, options),
      tableSchema,
      GraftDataSource.maxVersionsOf(scanOptions)
        .orElse(GraftDataSource.maxVersionsOf(options)),
      () => Versioned.logicalToPhysical(spark, path, version),
      GraftDataSource.maxBytesOf(scanOptions)
        .orElse(GraftDataSource.maxBytesOf(options)),
      GraftDataSource.startingVersionOf(spark, path, scanOptions)
        .orElse(GraftDataSource.startingVersionOf(spark, path, options)))
  }
}

/** V2 scan over an explicit version-dir slice (a thunk, so callers
  * that may be optimized away — e.g. a row-level DML scan superseded
  * by a metadata-only delete — never pay or enforce it).
  *
  * COLUMN MAPPING: `mapping` is the logical→physical name snapshot at
  * the resolved version (empty = unmapped). The inner parquet scan is
  * pinned to the PHYSICAL projection of the logical schema — same
  * field order and types, physical names — so the positional
  * InternalRows it yields ARE the logical rows (names live only in
  * schema metadata); filters, column pruning, and zone-map bounds are
  * translated to physical names on the way in, and [[GraftScan]]
  * renames the read schema back to logical on the way out. Physical
  * ids are stable across renames, so one head snapshot is correct for
  * every version dir in the slice, and a DROPPED column (absent from
  * the mapping and the logical schema) is simply never requested —
  * its bytes stay invisible. */
private[sources] class GraftScanBuilder(spark: SparkSession, path: String,
    versionSlice: () => Seq[Int], tableSchema: StructType,
    private[sources] val maxVersionsPerTrigger: Option[Int] = None,
    mappingThunk: () => Map[String, String] = () => Map.empty,
    private[sources] val maxBytesPerTrigger: Option[Long] = None,
    private[sources] val startingVersion: Option[Int] = None)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var filters: Array[Filter] = Array.empty
  private var required: StructType = tableSchema
  // COMPLETE aggregate pushdown resolved from commit metadata:
  // (result schema, the one pre-computed result row's values)
  private var pushedAgg: Option[(StructType, Array[Any])] = None
  private var pushedLimit: Option[Int] = None
  // the file list the most recent innerScan planned over — the set
  // the numRows statistic must describe
  private var lastFiles: Seq[String] = Nil

  /** Exact planned-file row count from commit metadata, for the
    * scan's numRows statistic. Only meaningful with no pushed
    * filters (a filtered scan returns fewer rows than its files
    * hold). */
  private[sources] def metadataRowCount(): Option[Long] =
    if (filters.nonEmpty) None
    else Versioned.fileRowCountSum(spark, path, lastFiles)

  /** LIMIT PUSHDOWN at FILE granularity: `LIMIT k` keeps only a
    * prefix of the slice's files whose `__nrows` commit-metadata
    * counts sum to >= k — on a 100 TB table, `SELECT * FROM t LIMIT
    * 100` opens one file instead of planning millions. Partial by
    * contract (Spark keeps its limit operator; we only guarantee AT
    * LEAST min(k, total) rows survive), and only sound when NO
    * filter applies below the limit — a filtered prefix could
    * under-deliver — so it declines whenever filters are pushed, and
    * [[innerScan]] ignores it when a runtime filter rebuilds the
    * scan. Files without a row count stay (unknown means "keep"). */
  override def pushLimit(limit: Int): Boolean = {
    if (filters.nonEmpty || limit <= 0) false
    else { pushedLimit = Some(limit); true }
  }

  // LAZY on purpose (like versionSlice): the row-level DML path
  // resolves its mapping at the snapshot it auto-maintains, which
  // must not run for a scan the optimizer supersedes
  private lazy val mapping: Map[String, String] = mappingThunk()

  private def physName(c: String): String = mapping.getOrElse(c, c)
  private def physSchema(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = physName(f.name))))
  /** physical→logical for the outbound schema rename. */
  private[sources] lazy val logicalName: Map[String, String] =
    mapping.map(_.swap)

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // everything stays residual: pruning drops work, never rows
  }

  override def pushedFilters(): Array[Filter] = filters

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** AGGREGATE PUSHDOWN, resolved entirely from commit metadata:
    * a no-filter, no-group-by COUNT(*) / MIN / MAX(integer col) over
    * the slice is answered by [[Versioned.aggregateFromStats]] — the
    * per-file `__nrows` row counts and exact integer [min,max] the
    * commit protocol stamps into `_STATS.tsv` from the parquet
    * footers. When every file of the slice carries the needed stats
    * the scan never opens a data file (`SELECT count(*) FROM t` on
    * 100 TB = one small TSV per live version dir, read driver-side);
    * any gap, any residual filter, or any unsupported shape declines
    * COMPLETELY and the ordinary scan runs — pushdown can drop work,
    * never change answers. Partial pushdown is never claimed. */
  override def supportCompletePushDown(agg: Aggregation): Boolean = {
    pushedAgg = tryAgg(agg)
    pushedAgg.isDefined
  }

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (pushedAgg.isEmpty) pushedAgg = tryAgg(agg)
    pushedAgg.isDefined
  }

  private def colOf(e: org.apache.spark.sql.connector.expressions
      .Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  private def tryAgg(agg: Aggregation): Option[(StructType, Array[Any])] = {
    if (agg.groupByExpressions.nonEmpty || filters.nonEmpty) return None
    val fieldsByName = tableSchema.fields.map(f => f.name -> f).toMap
    // only integer-backed min/max: float footer stats have NaN/-0.0
    // hazards, string stats may be truncated bounds (see
    // Versioned.aggregateFromStats)
    def intField(c: String): Option[StructField] = fieldsByName.get(c)
      .filter(f => f.dataType == IntegerType || f.dataType == LongType)
    val parsed = agg.aggregateExpressions().foldLeft(
        Option(Vector.empty[(Versioned.StatAgg, StructField)])) {
      case (None, _) => None
      case (Some(acc), f) => f match {
        case _: CountStar => Some(acc :+ ((Versioned.StatRowCount: Versioned.StatAgg,
          StructField("count(*)", LongType, nullable = false))))
        case m: Min => colOf(m.column).flatMap(intField).map(fld =>
          acc :+ ((Versioned.StatMin(physName(fld.name)): Versioned.StatAgg,
            StructField(s"min(${fld.name})", fld.dataType, nullable = true))))
        case m: Max => colOf(m.column).flatMap(intField).map(fld =>
          acc :+ ((Versioned.StatMax(physName(fld.name)): Versioned.StatAgg,
            StructField(s"max(${fld.name})", fld.dataType, nullable = true))))
        case _ => None
      }
    }.filter(_.nonEmpty)
    parsed.flatMap { sf =>
      Versioned.aggregateFromStats(spark, path, versionSlice(), sf.map(_._1))
        .map { vals =>
          val row = vals.zip(sf.map(_._2)).map {
            case (null, _) => null
            case (v: java.lang.Long, StructField(_, IntegerType, _, _)) =>
              java.lang.Integer.valueOf(v.intValue())
            case (v, _) => v
          }.toArray
          (StructType(sf.map(_._2)), row)
        }
    }
  }

  override def build(): Scan = pushedAgg match {
    case Some((schema, row)) => new GraftAggScan(schema, row)
    case None => new GraftScan(spark, path, this, innerScan(versionSlice()))
  }

  /** Rebuild the inner scan with RUNTIME `IN` sets intersected into
    * the file pruning (logical names in; physical pruning inside). */
  private[sources] def innerScanRuntime(
      inSets: Seq[(String, Seq[Any])]): Scan = {
    val keep = Versioned.pruneFilesForInSets(spark, path, versionSlice(),
      inSets.map { case (c, v) => (physName(c), v) }).toSet
    innerScan(versionSlice(), Some(keep))
  }

  /** The pruned parquet scan over an explicit version-dir slice —
    * shared by the batch read and each streaming micro-batch (which
    * calls it per offset range, same pushed filters and pruning).
    * `runtimeKeep` intersects a runtime-filter file set into the
    * static zone-map pruning. */
  private[sources] def innerScan(vs: Seq[Int],
      runtimeKeep: Option[Set[String]] = None): Scan = {
    val statPruned = Versioned.pruneFilesForBounds(spark, path, vs,
      GraftDataSource.boundsOf(filters.toSeq)
        .map { case (c, lo, hi) => (physName(c), lo, hi) })
    val kept = runtimeKeep match {
      case Some(keep) => statPruned.filter(keep)
      case None => statPruned
    }
    // limit prefix only on the plain unfiltered read — a filtered
    // prefix could under-deliver (see pushLimit)
    val pruned = pushedLimit match {
      case Some(k) if filters.isEmpty && runtimeKeep.isEmpty =>
        Versioned.limitFilePrefix(spark, path, kept, k.toLong)
      case _ => kept
    }
    lastFiles = pruned
    // all files pruned => any of the dirs yields the right (empty)
    // result under the pinned schema; keep one so the parquet table
    // has a location to plan over
    val paths =
      if (pruned.nonEmpty) pruned
      else Seq(s"$path/v=${vs.head}")
    val opts = new CaseInsensitiveStringMap(
      Map("mergeSchema" -> "true").asJava)
    // Spark's own V2 parquet stack over the pruned file list; the
    // (physical) table schema is pinned (userSpecifiedSchema) so
    // zone-map pruning can never change the visible schema, and files
    // missing an evolved column surface it as null like the Scala
    // read path
    val pt = ParquetTable(s"graft.`$path`", spark, opts, paths,
      Some(physSchema(tableSchema)), classOf[ParquetFileFormat])
    val psb = pt.newScanBuilder(opts)
    // filters reference LOGICAL names; the attrs they resolve to carry
    // the PHYSICAL name the parquet row groups know
    val attrs = tableSchema.fields
      .map(f => f.name -> AttributeReference(physName(f.name), f.dataType,
        f.nullable)()).toMap
    val exprs = filters.toSeq
      .flatMap(GraftDataSource.toCatalyst(_, attrs))
    if (exprs.nonEmpty) psb.pushFilters(exprs)
    psb.pruneColumns(physSchema(required))
    psb.build()
  }
}

/**
 * The scan handed to Spark: batch reads and statistics delegate to
 * the inner pruned parquet scan; `toMicroBatchStream` turns the SAME
 * builder state (pushed filters, pruned columns, zone maps) into the
 * version-offset STREAMING source ([[GraftMicroBatchStream]]).
 *
 * RUNTIME FILTERING ([[SupportsRuntimeFiltering]], the DPP analog
 * for an unpartitioned V2 source): when this table is the big side
 * of a join against a selective dim, Spark plans a dynamic-pruning
 * subquery over the dim keys (reusing the broadcast exchange) and
 * hands the resulting `IN` set here at runtime; the inner scan is
 * rebuilt with the key set intersected into the zone-map file
 * pruning — fact files whose [min,max] covers none of the join keys
 * are never opened. On a key-clustered (compacted / Z-ordered)
 * 100 TB table this turns a dim-join backfill from a full scan into
 * a per-key file lookup, exactly like partition pruning on a
 * partitioned table — without the partitioning.
 */
private[graft] class GraftScan(spark: SparkSession, path: String,
    builder: GraftScanBuilder, initialInner: Scan)
    extends Scan with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  private var currentInner: Scan = initialInner
  private[graft] def inner: Scan = currentInner

  // runtime filters may arrive on any column this scan OUTPUTS
  // (Spark resolves these against the pruned relation output — a
  // column projected away can't carry a join key anyway); the zone
  // maps decide per file whether a given key set actually prunes
  override def filterAttributes(): Array[NamedReference] =
    readSchema().fields.map(f => org.apache.spark.sql.connector
      .expressions.Expressions.column(f.name))

  override def filter(runtime: Array[Filter]): Unit = {
    val inSets = runtime.toSeq.collect {
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) =>
        (c, vs.toSeq)
    }
    if (inSets.nonEmpty) currentInner = builder.innerScanRuntime(inSets)
  }

  // the inner scan reads PHYSICAL names; the visible schema is
  // logical. Same field order and types, so rows pass through as-is.
  override def readSchema(): StructType =
    StructType(inner.readSchema().fields.map(f =>
      f.copy(name = builder.logicalName.getOrElse(f.name, f.name))))

  override def toBatch: Batch = inner.toBatch

  override def description(): String = s"graft ${inner.description()}"

  /** Size from the inner file scan; EXACT row count from the commit
    * metadata when every slice file stamped one (`__nrows`) — a real
    * numRows sharpens the optimizer's join-side and AQE estimates,
    * and it's the same driver-side TSV read the planner already
    * pays. */
  override def estimateStatistics(): Statistics = {
    val innerStats = inner match {
      case s: SupportsReportStatistics => Some(s.estimateStatistics())
      case _ => None
    }
    val rows = builder.metadataRowCount()
    new Statistics {
      override def sizeInBytes() = innerStats.map(_.sizeInBytes())
        .getOrElse(java.util.OptionalLong.empty())
      override def numRows() = rows
        .map(java.util.OptionalLong.of)
        .orElse(innerStats.map(_.numRows()))
        .getOrElse(java.util.OptionalLong.empty())
    }
  }

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(spark, path, builder, inner)
}

/** Commit-version offset: the stream has delivered every version
  * `<= v`. */
private[sources] case class GraftOffset(v: Int) extends SOffset {
  override def json(): String = v.toString
}

/** `maxVersionsPerTrigger` / `maxBytesPerTrigger` as a [[ReadLimit]]:
  * at most `maxVersions` commit versions AND `maxBytes` of commit-dir
  * data admitted per micro-batch (whichever binds first; at least one
  * version always admits). Source-private — the engine passes limits
  * back opaquely; only [[GraftMicroBatchStream]] interprets it. */
private[sources] case class ReadAdmission(maxVersions: Option[Int],
    maxBytes: Option[Long]) extends ReadLimit

/**
 * The versioned table as a STREAMING SOURCE with COMMIT-VERSION
 * offsets (`spark.readStream.format("graft").load(path)`, or
 * `.table("<cat>.<t>")`): each micro-batch delivers the version dirs
 * in (start, end] — whole committed versions, exactly once, planned
 * at dir granularity. Checkpoint versions are EXCLUDED at planning
 * time (they duplicate rows the stream already delivered — no row-
 * wise filtering, no wasted IO, unlike the file-glob
 * [[Versioned.logStream]]); a fresh stream's initial batch is the
 * standard asOf slice, so a vacuumed table re-delivers its base
 * checkpoint as the initial load. Resuming past the vacuum horizon
 * refuses loudly ([[Versioned.streamSlice]]). Rows carry the commit
 * columns (`__v`, `__deleted`, …) for downstream CDC handling; the
 * schema is fixed at stream start.
 *
 * ADMISSION CONTROL (`maxVersionsPerTrigger`): without it, a fresh
 * stream's initial batch is the ENTIRE asOf slice — one micro-batch
 * sized like the whole table, which at large scale means hours of
 * work inside a single epoch (no checkpoint granularity, one retry
 * domain). With it, each micro-batch admits at most N commit
 * versions, so backfill proceeds as a sequence of bounded,
 * individually-checkpointed epochs and a restart loses at most N
 * versions of work. The one floor: a fresh stream on a VACUUMED
 * table must admit up to the vacuum base in its first batch — the
 * base checkpoint is the indivisible stand-in for the reclaimed
 * prefix (it is one compacted dir; versions below it no longer
 * exist to deliver separately). Version granularity isn't in
 * [[ReadLimit]]'s stock vocabulary of rows/files/bytes, so the cap
 * rides a source-private [[ReadAdmission]] returned by
 * `getDefaultReadLimit` and interpreted only here. The stream also
 * implements [[SupportsTriggerAvailableNow]] — without it Spark
 * falls back to running Trigger.AvailableNow as ONE batch of
 * everything, silently bypassing the cap; with it the head version
 * is pinned at `prepareForTriggerAvailableNow` and the run drains to
 * that pinned target in capped epochs (commits racing the drain wait
 * for the next run, exactly the file-source contract).
 */
private[sources] class GraftMicroBatchStream(spark: SparkSession,
    path: String, builder: GraftScanBuilder, fullScan: Scan)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // head pinned at AvailableNow start: the run's drain target. None =
  // continuous trigger, follow the live head.
  private var pinnedHead: Option[Int] = None

  private def head(): Int = pinnedHead
    .getOrElse(Versioned.latestVersion(spark, path))

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedHead = Some(Versioned.latestVersion(spark, path))

  // a fresh stream starts at startingVersion (exclusive lower bound =
  // v-1) or the table's beginning; a checkpointed resume never asks
  override def initialOffset(): SOffset =
    GraftOffset(builder.startingVersion.map(_ - 1).getOrElse(0))

  override def latestOffset(): SOffset = GraftOffset(head())

  override def getDefaultReadLimit: ReadLimit =
    if (builder.maxVersionsPerTrigger.isEmpty &&
        builder.maxBytesPerTrigger.isEmpty) ReadLimit.allAvailable()
    else ReadAdmission(builder.maxVersionsPerTrigger,
      builder.maxBytesPerTrigger)

  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val latest = head()
    val s = start.asInstanceOf[GraftOffset].v
    val capped = limit match {
      case ReadAdmission(maxV, maxB) =>
        // fresh stream on a vacuumed table: the initial batch cannot
        // stop below the base checkpoint (its slice was reclaimed —
        // versions at or below the floor admit regardless of budget)
        val floor =
          if (s <= 0) Versioned.vacuumBase(spark, path).getOrElse(0)
          else 0
        // walk versions while under BOTH caps; the first version of
        // a batch always admits (progress guarantee). Byte accounting
        // is over raw commit dirs — a checkpoint dir inside the range
        // counts toward the budget even though planning excludes it:
        // conservative (smaller batches), never unsound.
        var end = s
        var bytes = 0L
        var n = 0
        var stop = false
        while (!stop && end < latest) {
          val next = end + 1
          val sz = Versioned.dirBytes(spark, path, next)
          val overV = maxV.exists(m => n + 1 > m)
          val overB = maxB.exists(m => n > 0 && bytes + sz > m)
          if ((overV || overB) && next > floor) stop = true
          else { end = next; bytes += sz; n += 1 }
        }
        end
      case _ => latest
    }
    GraftOffset(capped)
  }

  /** True head for progress reporting — `latestOffset` above may lag
    * it by design under `maxVersionsPerTrigger`. */
  override def reportLatestOffset(): SOffset =
    GraftOffset(Versioned.latestVersion(spark, path))

  override def deserializeOffset(json: String): SOffset =
    GraftOffset(json.trim.toInt)

  override def planInputPartitions(start: SOffset,
      end: SOffset): Array[InputPartition] = {
    val a = start.asInstanceOf[GraftOffset].v
    val b = end.asInstanceOf[GraftOffset].v
    val vs = Versioned.streamSlice(spark, path, a, b)
    if (vs.isEmpty) Array.empty
    else builder.innerScan(vs).toBatch.planInputPartitions()
  }

  // file-agnostic (schema + conf bound): one factory decodes every
  // micro-batch's FilePartitions
  override def createReaderFactory(): PartitionReaderFactory =
    fullScan.toBatch.createReaderFactory()

  override def commit(end: SOffset): Unit = ()

  override def stop(): Unit = ()
}

/** The scan a COMPLETELY pushed aggregate builds: one pre-computed
  * row, resolved on the driver from `_STATS.tsv` commit metadata —
  * no parquet file is ever opened (the plan shows this scan where a
  * file read would be). */
private[sources] class GraftAggScan(aggSchema: StructType,
    row: Array[Any]) extends Scan with Batch {

  override def readSchema(): StructType = aggSchema

  override def toBatch: Batch = this

  override def description(): String =
    "graft metadata-only aggregate (_STATS.tsv resolve; no files opened)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(row))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory
}

private[sources] case class GraftAggPartition(values: Array[Any])
    extends InputPartition

private[sources] class GraftAggReaderFactory
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val vals = p.asInstanceOf[GraftAggPartition].values
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(vals)
      override def close(): Unit = ()
    }
  }
}
