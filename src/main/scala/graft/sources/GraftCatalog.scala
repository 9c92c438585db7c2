package graft.sources

import java.util.{Collections, Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{
  NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{
  Identifier, MetadataColumn, NamespaceChange, ProcedureCatalog,
  SupportsDelete, SupportsMetadataColumns, SupportsNamespaces,
  SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog,
  TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{
  LogicalWriteInfo, RowLevelOperationBuilder, RowLevelOperationInfo,
  V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Versioned

/**
 * SQL catalog over [[graft.io.Versioned]] tables — the DDL/DML face of
 * the lakehouse format:
 *
 * {{{
 *   spark.conf.set("spark.sql.catalog.graft_sql",
 *     "graft.sources.GraftCatalog")
 *   spark.conf.set("spark.sql.catalog.graft_sql.warehouse", "/data/wh")
 *
 *   CREATE TABLE graft_sql.t (id BIGINT, v STRING)
 *     TBLPROPERTIES ('key' = 'id')               -- v1: empty commit
 *   INSERT INTO graft_sql.t SELECT ...           -- one commit per insert
 *   DELETE FROM graft_sql.t WHERE v = 'x'        -- tombstone commit
 *   SELECT * FROM graft_sql.t VERSION AS OF 3    -- time travel
 *   SELECT * FROM graft_sql.t TIMESTAMP AS OF '...'
 * }}}
 *
 * A table named `ns.t` lives at `<warehouse>/ns/t` in the standard
 * versioned-table layout, so the SQL face and the Scala API
 * ([[Versioned.append]]/[[Versioned.current]]/…) interoperate on the
 * SAME files: `CREATE TABLE` is an empty schema-fixing commit,
 * `INSERT INTO` is [[Versioned.append]], `DELETE FROM` is
 * [[Versioned.deleteWhere]] (needs the `key` table property naming
 * the key column), and reads ride the same zone-map-pruned
 * DataSourceV2 scan as `spark.read.format("graft")`.
 *
 * The commit-log columns (`__v`, `__deleted`, `__seq`, …) surface as
 * V2 METADATA columns: invisible to `SELECT *` and to INSERT schema
 * validation, selectable by name — so the merge-on-read resolve is
 * expressible in plain SQL (`row_number() OVER (PARTITION BY key
 * ORDER BY __v DESC, __seq DESC)`), exactly the window
 * [[Versioned.currentOf]] plans.
 *
 * Supported ALTERs (r11): table properties, `RENAME COLUMN` /
 * `DROP COLUMN` (column mapping — no data rewrite; the V2 scan and
 * its zone-map pruning are mapping-aware), and `ALTER COLUMN TYPE`
 * widening to BIGINT/DOUBLE ([[Versioned.widenColumn]] — old narrow
 * files upcast per file on scan). Remaining mapped-table refusals
 * (fail-loud, before any slot is claimed): the staged-commit write
 * faces — row-level SQL DML and the streaming V2 sink — and
 * [[Versioned.bloomIndex]].
 *
 * Deliberately NOT supported (fail-loud, never silent): INSERT
 * OVERWRITE (the log is append-only — use RESTORE/deleteWhere),
 * partition transforms (files are clustered by
 * [[Versioned.compactZOrder]], not by dir layout), and RENAME TABLE.
 */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs a warehouse root: set " +
          s"spark.sql.catalog.$name.warehouse"))
      .stripSuffix("/")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def checkPart(p: String): String = {
    require(p.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"),
      s"graft catalog: illegal identifier part '$p' (allowed: " +
        "[A-Za-z0-9_][A-Za-z0-9_.-]*)")
    p
  }

  private def pathOf(ident: Identifier): String =
    (warehouse +: (ident.namespace :+ ident.name).toSeq.map(checkPart))
      .mkString("/")

  private def dirOf(namespace: Array[String]): Path =
    new Path((warehouse +: namespace.toSeq.map(checkPart)).mkString("/"))

  /** A dir is a table iff it holds at least one committed version. */
  private def isTable(path: String): Boolean =
    Versioned.versions(spark, path).nonEmpty

  override def tableExists(ident: Identifier): Boolean = {
    val p = new Path(pathOf(ident))
    fs.exists(p) && isTable(p.toString)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isTable(new Path(dir, n).toString))
      .sorted
      .map(Identifier.of(namespace, _))
  }

  override def loadTable(ident: Identifier): Table = loadAt(ident, None)

  /** `VERSION AS OF n` — the integer commit version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    require(version.matches("[0-9]+"),
      s"graft time travel: VERSION AS OF takes the integer commit " +
        s"version, got '$version'")
    loadAt(ident, Some(version.toInt))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands epoch MICROseconds; the
    * commit `_TS_` stamps are millis. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    loadAt(ident, Some(Versioned.versionAt(spark, path, timestamp / 1000L)))
  }

  private def loadAt(ident: Identifier, version: Option[Int]): Table = {
    val path = pathOf(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = version.getOrElse(Versioned.latestVersion(spark, path))
    new GraftCatalogTable(spark, ident, path, v,
      GraftCatalog.readProps(fs, path))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog: partition transforms are not supported — cluster " +
        "files with Versioned.compactZOrder instead")
    schema.fieldNames.foreach(n => require(!Versioned.MetaCols.contains(n),
      s"graft catalog: column name '$n' collides with a commit-log " +
        "metadata column"))
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val path = pathOf(ident)
    // v1 = an empty commit that fixes the schema (the parquet writer
    // emits one zero-row file, so the footer carries the schema)
    properties.asScala.keys.foreach(GraftCatalog.requireValidCheckName)
    val empty = spark.createDataFrame(
      Collections.emptyList[Row](), schema)
    Versioned.append(empty, path)
    GraftCatalog.writeProps(fs, path, properties.asScala.toSeq.sorted)
    loadTable(ident)
  }

  /** Only table-property changes are supported — column DDL must go
    * through [[Versioned.renameColumn]]/[[Versioned.dropColumn]]
    * (column mapping), which the V2 face then refuses to read. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = pathOf(ident)
    val props = scala.collection.mutable.LinkedHashMap(
      GraftCatalog.readProps(fs, path).toSeq: _*)
    changes.foreach {
      case s: TableChange.SetProperty =>
        GraftCatalog.requireValidCheckName(s.property)
        props(s.property) = s.value
      case r: TableChange.RemoveProperty => props.remove(r.property)
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames.length == 1, "graft catalog: RENAME " +
          "COLUMN on nested fields is not supported")
        val from = rc.fieldNames.head
        Versioned.renameColumn(spark, path, from, rc.newName)
        // the declared primary key follows its column's new name
        if (props.get(GraftCatalog.KeyProp).contains(from))
          props(GraftCatalog.KeyProp) = rc.newName
      case ac: TableChange.AddColumn =>
        require(ac.fieldNames.length == 1, "graft catalog: ADD COLUMN " +
          "on nested fields is not supported")
        val name = ac.fieldNames.head
        require(!Versioned.MetaCols.contains(name),
          s"graft catalog: column name '$name' collides with a " +
            "commit-log metadata column")
        // refuse what the zero-row schema-extension commit cannot
        // honor rather than silently dropping the user's declaration:
        // existing rows necessarily read the new column as NULL, and
        // column order is the slice union's, not a requested position
        require(ac.isNullable, s"graft catalog: ADD COLUMN '$name' " +
          "NOT NULL is not supported — existing rows read the new " +
          "column as NULL by construction")
        require(ac.position() == null, s"graft catalog: ADD COLUMN " +
          s"'$name' with a position (FIRST/AFTER) is not supported")
        // schema extension = one zero-row commit whose parquet footer
        // carries the FULL extended schema (existing columns + the new
        // one): the slice's union-by-name schema picks the column up
        // (existing rows read it as null), and the V2 slice read stays
        // sound — a footer carrying only the new column would make the
        // vectorized reader refuse the file for missing key columns.
        // On a column-mapped table commitAt mints the new column a
        // fresh salted physical id. This is what MERGE ... WITH SCHEMA
        // EVOLUTION drives (Spark applies the AddColumn TableChange
        // here before rewriting rows).
        val curSchema = Versioned.sliceSchema(spark, path,
          Versioned.asOfVersions(spark, path,
            Versioned.latestVersion(spark, path)))
        require(!curSchema.fieldNames.map(_.toLowerCase)
          .contains(name.toLowerCase),
          s"graft catalog: column '$name' already exists")
        val extended = spark.createDataFrame(
          Collections.emptyList[Row](),
          org.apache.spark.sql.types.StructType(
            curSchema.fields.filterNot(f =>
              Versioned.MetaCols.contains(f.name)).toSeq :+
              org.apache.spark.sql.types.StructField(
                name, ac.dataType(), true)))
        Versioned.append(extended, path)
      case dc: TableChange.DeleteColumn =>
        require(dc.fieldNames.length == 1, "graft catalog: DROP " +
          "COLUMN on nested fields is not supported")
        require(!props.get(GraftCatalog.KeyProp).contains(dc.fieldNames.head),
          s"graft catalog: cannot drop the declared key column " +
            s"'${dc.fieldNames.head}'")
        Versioned.dropColumn(spark, path, dc.fieldNames.head)
      case ut: TableChange.UpdateColumnType =>
        require(ut.fieldNames.length == 1, "graft catalog: ALTER " +
          "COLUMN TYPE on nested fields is not supported")
        val to = ut.newDataType() match {
          case org.apache.spark.sql.types.LongType => "long"
          case org.apache.spark.sql.types.DoubleType => "double"
          case other => sys.error("graft catalog: ALTER COLUMN TYPE " +
            s"supports widening to BIGINT or DOUBLE, got $other")
        }
        Versioned.widenColumn(spark, path, ut.fieldNames.head, to)
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER ($other) — supported: " +
          "properties, RENAME COLUMN, DROP COLUMN, ALTER COLUMN TYPE " +
          "(widening)")
    }
    GraftCatalog.writeProps(fs, path, props.toSeq)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (!tableExists(ident)) false
    else { Versioned.drop(spark, pathOf(ident)); true }

  override def renameTable(old: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: RENAME TABLE is not supported (readers may hold " +
        "the path); copy via CTAS instead")

  // ---- stored procedures: the maintenance lifecycle under
  //      `<catalog>.system` (see [[GraftProcedures]]) ----

  /** Procedure-side table resolution: same path mapping as tables,
    * existence-checked. */
  private[sources] def resolveTablePath(ident: Identifier): String = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    pathOf(ident)
  }

  /** Identifier → path WITHOUT the existence requirement (procedures
    * that CREATE at the name — e.g. `create_matview`). */
  private[sources] def pathForName(ident: Identifier): String =
    pathOf(ident)

  /** Persist table properties at `path` (procedure-facing). */
  private[sources] def setProps(path: String,
      props: Map[String, String]): Unit =
    GraftCatalog.writeProps(fs, path,
      (GraftCatalog.readProps(fs, path) ++ props).toSeq)

  /** The `key` table property, when set. */
  private[sources] def keyPropertyOf(path: String): Option[String] =
    GraftCatalog.readProps(fs, path).get(GraftCatalog.KeyProp)

  /** All table properties at `path` (procedure-facing). */
  private[sources] def propsOf(path: String): Map[String, String] =
    GraftCatalog.readProps(fs, path)

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(GraftProcedures.Namespace),
      s"graft catalog: procedures live under the 'system' namespace " +
        s"(CALL $catalogName.system.<proc>), got " +
        ident.namespace.mkString("."))
    GraftProcedures.load(this, ident.name)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(GraftProcedures.Namespace)) Array.empty
    else GraftProcedures.names
      .map(Identifier.of(GraftProcedures.Namespace, _)).toArray

  // ---- namespaces: directories under the warehouse ----

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty[String])

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = dirOf(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith(".") ||
        isTable(new Path(dir, n).toString))
      .sorted
      .map(n => namespace :+ n)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(dirOf(namespace))

  override def loadNamespaceMetadata(
      namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    fs.mkdirs(dirOf(namespace)); ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    require(namespace.nonEmpty, "cannot drop the warehouse root")
    val dir = dirOf(namespace)
    if (!fs.exists(dir)) false
    else {
      require(cascade || fs.listStatus(dir).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(dir, true)
    }
  }
}

private[sources] object GraftCatalog {

  private val PropsFile = "_PROPS.tsv"

  /** Table property naming the key column — required by DELETE (the
    * tombstone needs a key) and by anything key-resolving downstream. */
  val KeyProp = "key"

  /** Table property switching declared CHECK constraints from
    * refuse-whole to DEAD-LETTER mode on the INGEST faces (INSERT and
    * the streaming sink): violating rows divert to the named
    * quarantine table, the clean slice lands. Value with a '/' = a
    * table PATH; otherwise a SIBLING table name in the same namespace
    * directory. Row-level DML (UPDATE/MERGE) always refuses whole — a
    * statement that partially applies is not a dead-letter shape. */
  val QuarantineProp = "quarantine.path"

  /** Resolve [[QuarantineProp]] against the table's own path. */
  def quarantinePathOf(props: Map[String, String],
      tablePath: String): Option[String] =
    props.get(QuarantineProp).map { q =>
      if (q.contains('/')) q
      else new Path(new Path(tablePath).getParent, q).toString
    }

  /** Named CHECK constraints from `check.<name>` table properties —
    * the single source every write path (INSERT, row-level DML, the
    * streaming sink) evaluates. Name shape is enforced where the
    * property is SET ([[validCheckName]] in createTable/alterTable,
    * so the DDL itself refuses), NOT here: the validation pass reads
    * its counts positionally and `.as(name)` is literal, so a
    * pre-existing odd name still evaluates — throwing here would make
    * an already-written table retroactively unwritable. */
  def checkConstraints(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq.collect {
      case (k, v) if k.startsWith("check.") =>
        (k.stripPrefix("check."), v)
    }.sortBy(_._1)

  /** Constraint-name shape gate, applied at DDL time (CREATE TABLE
    * and ALTER ... SET TBLPROPERTIES) — the ALTER refuses instead of
    * every subsequent write failing. Enforced only on NEWLY SET
    * properties: a table written before this gate existed keeps
    * working (grandfathered — see [[checkConstraints]]). */
  def requireValidCheckName(prop: String): Unit =
    if (prop.startsWith("check.")) {
      val name = prop.stripPrefix("check.")
      require(name.matches("[A-Za-z0-9_-]+"),
        s"graft CHECK constraint name '$name' is invalid — use " +
          "[A-Za-z0-9_-]+ (it names the constraint in violation " +
          "reports)")
    }

  def readProps(fs: FileSystem, path: String): Map[String, String] = {
    val p = new Path(path, PropsFile)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t')
        require(i > 0, s"malformed $PropsFile line at $path: '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }.toMap
    finally in.close()
  }

  def writeProps(fs: FileSystem, path: String,
      props: Seq[(String, String)]): Unit = {
    props.foreach { case (k, v) =>
      require(!k.contains('\t') && !k.contains('\n') &&
        !v.contains('\t') && !v.contains('\n'),
        s"table property may not contain tabs/newlines: $k")
    }
    val out = fs.create(new Path(path, PropsFile), true)
    try out.write(props.map { case (k, v) => s"$k\t$v" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** V1 pushed filter → Column, for DELETE WHERE. Partial: None means
    * "cannot delete by this predicate" (Spark then refuses the DELETE
    * instead of deleting the wrong rows). */
  def filterToColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(c, v)            => Some(col(c) === lit(v))
    case sources.EqualNullSafe(c, v)      => Some(col(c) <=> lit(v))
    case sources.GreaterThan(c, v)        => Some(col(c) > lit(v))
    case sources.GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case sources.LessThan(c, v)           => Some(col(c) < lit(v))
    case sources.LessThanOrEqual(c, v)    => Some(col(c) <= lit(v))
    case sources.In(c, vs)                =>
      Some(col(c).isin(vs.toSeq: _*))
    case sources.IsNull(c)                => Some(col(c).isNull)
    case sources.IsNotNull(c)             => Some(col(c).isNotNull)
    case sources.StringStartsWith(c, v)   => Some(col(c).startsWith(v))
    case sources.StringEndsWith(c, v)     => Some(col(c).endsWith(v))
    case sources.StringContains(c, v)     => Some(col(c).contains(v))
    case sources.Not(inner)  => filterToColumn(inner).map(!_)
    case sources.And(l, r)   =>
      for (cl <- filterToColumn(l); cr <- filterToColumn(r)) yield cl && cr
    case sources.Or(l, r)    =>
      for (cl <- filterToColumn(l); cr <- filterToColumn(r)) yield cl || cr
    case sources.AlwaysTrue()  => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

/**
 * One versioned table as seen by the SQL catalog, pinned at `version`
 * (loadTable re-pins per statement, so plain reads always see the
 * latest commit). `schema()` is the DATA schema; the commit-log
 * columns ride as [[MetadataColumn]]s — invisible to `SELECT *` and
 * to INSERT validation, selectable by name. The scan is the same
 * zone-map-pruned [[GraftScanBuilder]] as the path-based
 * `format("graft")` face.
 */
private[sources] class GraftCatalogTable(spark: SparkSession,
    ident: Identifier, path: String, version: Int,
    props: Map[String, String]) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsMetadataColumns with SupportsRowLevelOperations {

  // parquet-derived slice schema, with the declared key column (when
  // the `key` property is set) marked NON-nullable: it is the table's
  // primary key by contract — the MOR resolve is keyed on it, ANSI
  // inserts null-check it, and Spark's row-level DML requires a
  // non-nullable rowId attribute
  private val fullSchema: StructType = {
    val raw = Versioned.sliceSchema(spark, path,
      Versioned.asOfVersions(spark, path, version))
    props.get(GraftCatalog.KeyProp) match {
      case Some(k) => StructType(raw.fields.map(f =>
        if (f.name == k) f.copy(nullable = false) else f))
      case None => raw
    }
  }

  private val (metaFields, dataFields) =
    fullSchema.fields.partition(f => Versioned.MetaCols.contains(f.name))

  override def name(): String = ident.toString

  override def schema(): StructType = StructType(dataFields)

  override def properties(): JMap[String, String] = props.asJava

  override def metadataColumns(): Array[MetadataColumn] =
    metaFields.map(f => new MetadataColumn {
      override def name(): String = f.name
      override def dataType(): DataType = f.dataType
      override def isNullable: Boolean = true
      override def comment(): String = "graft commit-log column"
    })

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.STREAMING_WRITE,
      // MERGE ... WITH SCHEMA EVOLUTION: Spark turns the source's
      // extra columns into AddColumn TableChanges and applies them
      // through alterTable before rewriting rows
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, path,
      () => Versioned.asOfVersions(spark, path, version), fullSchema,
      GraftDataSource.maxVersionsOf(options),
      () => Versioned.logicalToPhysical(spark, path, version),
      GraftDataSource.maxBytesOf(options),
      GraftDataSource.startingVersionOf(spark, path, options))

  /** INSERT INTO / CTAS / df.writeTo(...).append — ONE committed
    * version per insert, through [[Versioned.append]] (same contract:
    * at most one row per key per commit for clean MOR resolve). The
    * V1 fallback hands us the whole DataFrame, which is exactly what
    * the commit protocol wants — no per-task writer state to manage,
    * the atomic-rename publish IS the commit. CHECK constraints from
    * `check.<name>` table properties gate the insert
    * ([[Versioned.appendChecked]]): any violating row refuses the
    * WHOLE batch, nothing committed. The same constraints gate the
    * row-level DML write and the streaming sink at staged-commit time
    * ([[GraftChecks.validateStaged]]) — every write path enforces a
    * declared constraint. The STREAMING face
    * (`df.writeStream…toTable(…)`) is [[GraftStreamingWrite]]: one
    * exactly-once batch-marked commit per micro-batch. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              require(!overwrite,
                s"graft table $path is append-only via SQL: INSERT " +
                  "OVERWRITE would rewrite history — use DELETE FROM " +
                  "(tombstones) or Versioned.restore (roll-forward)")
              val checks = GraftCatalog.checkConstraints(props)
                .map { case (n, e) =>
                  (n, org.apache.spark.sql.functions.expr(e))
                }
              val quar = GraftCatalog.quarantinePathOf(props, path)
              if (checks.nonEmpty) quar match {
                // dead-letter mode: violating rows divert, clean land
                case Some(qp) =>
                  Versioned.appendCheckedQuarantine(data, path, checks, qp)
                case None => Versioned.appendChecked(data, path, checks)
              }
              else Versioned.append(data, path)
              ()
            }
          }
        override def toStreaming: org.apache.spark.sql.connector.write
            .streaming.StreamingWrite =
          new GraftStreamingWrite(spark, path, info.schema(),
            info.queryId(), GraftCatalog.checkConstraints(props),
            GraftCatalog.quarantinePathOf(props, path))
      }
    }

  /** UPDATE / MERGE INTO / non-translatable DELETE — the delta-based
    * row-level operation ([[GraftRowOperation]]): scan the head
    * checkpoint, append update rows + tombstones as ONE staged commit.
    * Needs the `key` table property, like DELETE. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    val keyCol = props.getOrElse(GraftCatalog.KeyProp,
      sys.error(s"graft table $path has no '${GraftCatalog.KeyProp}' " +
        "table property; row-level DML resolves keys — CREATE TABLE … " +
        s"TBLPROPERTIES ('${GraftCatalog.KeyProp}' = '<col>') or ALTER " +
        "TABLE … SET TBLPROPERTIES"))
    require(dataFields.exists(_.name == keyCol),
      s"graft table $path: key property '$keyCol' is not a column")
    () => new GraftRowOperation(spark, path, keyCol,
      StructType(dataFields), info.command(),
      GraftCatalog.checkConstraints(props))
  }

  /** DELETE FROM … WHERE — [[Versioned.deleteWhere]]: tombstone every
    * CURRENT key matching the predicate, one commit. Needs the `key`
    * table property (`TBLPROPERTIES ('key' = '<col>')`). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftCatalog.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val keyCol = props.getOrElse(GraftCatalog.KeyProp,
      sys.error(s"graft table $path has no '${GraftCatalog.KeyProp}' " +
        "table property; DELETE needs the key column — CREATE TABLE … " +
        s"TBLPROPERTIES ('${GraftCatalog.KeyProp}' = '<col>') or ALTER " +
        "TABLE … SET TBLPROPERTIES"))
    val cond = filters.flatMap(GraftCatalog.filterToColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    Versioned.deleteWhere(spark, path, keyCol, cond)
    ()
  }
}
