package graft.sources

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{
  BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{
  DoubleType, IntegerType, LongType, StringType, StructField, StructType}

import graft.io.Versioned
import graft.pipeline.{Search, VecIndex}

/**
 * SQL stored procedures for the versioned-table maintenance
 * lifecycle — the operations a table OWNER runs, exposed under the
 * catalog's `system` namespace (the Iceberg convention):
 *
 * {{{
 *   CALL graft_sql.system.compact('t')            -- MOR checkpoint
 *   CALL graft_sql.system.zorder('t', 'a,b')      -- clustered compact
 *   CALL graft_sql.system.zorder_quantile('t', 'a,b')
 *   CALL graft_sql.system.vacuum('t', 5)          -- reclaim < head-5
 *   CALL graft_sql.system.restore('t', 3)         -- roll-forward undo
 *   CALL graft_sql.system.bloom_index('t')        -- point-lookup index
 *   CALL graft_sql.system.detail('t')             -- per-version stats
 * }}}
 *
 * Each CALL runs the corresponding [[graft.io.Versioned]] operation
 * and returns its result as rows (the committed version, the
 * reclaimed versions, the DESCRIBE-DETAIL table). The key column
 * comes from the table's `key` property (`TBLPROPERTIES
 * ('key' = '<col>')`) — procedures that resolve keys refuse loudly
 * without it, same as DELETE.
 */
private[sources] object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  private def spark: SparkSession = SparkSession.active

  private val versionOut =
    StructType(Seq(StructField("version", IntegerType, nullable = false)))

  private def in(name: String, dt: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(name, dt).build()

  private def str(row: InternalRow, i: Int, param: String): String = {
    require(!row.isNullAt(i), s"procedure argument '$param' must not be null")
    row.getUTF8String(i).toString
  }

  private def oneVersion(v: Int): Array[InternalRow] =
    Array(InternalRow(v))

  /** One procedure = parameters + an `exec` over (tablePath, keyProp,
    * args). Binding is trivial (no overloads); `call` wraps the
    * result rows in a driver-local scan. */
  private class Proc(procName: String, desc: String,
      params: Seq[ProcedureParameter], out: StructType,
      exec: (GraftCatalog, InternalRow) => Array[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false // commits/IO
    private var cat: GraftCatalog = _
    def forCatalog(c: GraftCatalog): Proc = { cat = c; this }
    override def call(input: InternalRow): JIterator[Scan] = {
      val result = exec(cat, input)
      java.util.Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = result
        override def readSchema(): StructType = out
        override def description(): String = s"graft procedure $procName"
      }).iterator()
    }
  }

  /** Resolve the `table` argument (always parameter 0: `'t'` or
    * `'ns.t'`, relative to this catalog) to its path, requiring the
    * table to exist. */
  private def tablePath(cat: GraftCatalog, row: InternalRow): String = {
    val parts = str(row, 0, "table").split('.')
    cat.resolveTablePath(Identifier.of(parts.init, parts.last))
  }

  /** Rebuild a create_sketchview handle from the view's persisted
    * `sv.*` properties. */
  private def sketchHandle(cat: GraftCatalog,
      viewPath: String): graft.io.SketchView.Handle = {
    val props = cat.propsOf(viewPath)
    graft.io.SketchView.Handle(viewPath,
      props.getOrElse("sv.source", sys.error(
        s"$viewPath is not a create_sketchview view (no sv.* properties)")),
      props("sv.key"), props("sv.group"), props("sv.value"),
      props("sv.b").toInt)
  }

  /** Resolve an eval-procedure frame argument: a string containing
    * '/' reads as a parquet path; anything else resolves through
    * `spark.table` (temp views, or catalog tables by qualified name —
    * `graft_sql.t` serves the table's current snapshot). The eval
    * outputs are query-set-sized (one row per qid, or n per qid), so
    * the driver-local procedure result stays bounded by the QUERY
    * set, never the corpus. */
  private def evalFrame(s: String): org.apache.spark.sql.DataFrame =
    if (s.contains("/")) spark.read.parquet(s) else spark.table(s)

  private def keyOf(cat: GraftCatalog, path: String): String =
    cat.keyPropertyOf(path).getOrElse(sys.error(
      s"graft table $path has no 'key' table property; this procedure " +
        "resolves keys — ALTER TABLE … SET TBLPROPERTIES ('key' = '<col>')"))

  /** Rebuild a create_joinview / create_joinview_chain handle from
    * the view's persisted `mv.*`/`jv.*` properties. Chain views carry
    * `jv.dims` (URL-encoded hop chain — [[encodeDims]]) + `jv.attrs`
    * (+ optional `mv.minmax`); legacy single-dim views carry
    * `jv.dim`/`jv.dimkey`/`jv.dimattr`. */
  private def joinHandleOf(cat: GraftCatalog,
      viewPath: String): graft.io.JoinView.Handle = {
    val props = cat.propsOf(viewPath)
    def need(k: String, what: String): String = props.getOrElse(k,
      sys.error(s"$viewPath is not a create_joinview view " +
        s"(no $what properties)"))
    val fkCol = need("mv.group", "mv.*")
    val minMax = props.getOrElse("mv.minmax", "")
      .split(',').filter(_.nonEmpty).toSeq
    val inner = graft.io.MatView.Handle(viewPath,
      need("mv.source", "mv.*"), need("mv.key", "mv.*"), fkCol,
      need("mv.sums", "mv.*").split(',').filter(_.nonEmpty).toSeq,
      minMax)
    props.get("jv.dims") match {
      case Some(enc) =>
        graft.io.JoinView.Handle(inner, decodeDims(enc),
          need("jv.attrs", "jv.*").split(',').filter(_.nonEmpty).toSeq)
      case None =>
        val dimAttr = need("jv.dimattr", "jv.*")
        graft.io.JoinView.Handle(inner,
          Seq(graft.io.JoinView.DimLink(need("jv.dim", "jv.*"),
            need("jv.dimkey", "jv.*"), fkCol, Seq(dimAttr))),
          Seq(dimAttr))
    }
  }

  /** The `jv.dims` property codec: hops joined by ';', fields within
    * a hop by ':', carry columns by '|'; every field %XX-encoded so
    * paths with ':' (URIs) or user strings never break the framing.
    * Spaces encode as %20 (NOT '+') and the decoder preserves literal
    * '+': raw user input like 'dim+2024' must survive the decode the
    * create procedure applies — only ':;|%' genuinely need escaping. */
  /** Format VERSION marker. An UNMARKED `jv.dims` value was persisted
    * by the r15 codec, which already wrote spaces as %20 and left a
    * literal '+' raw — so the legacy decode must use the SAME
    * pre-escape rule as v2 ('+' stays literal), or an r15 view whose
    * dim path contains '+' would silently re-point to a spaced name.
    * (The short-lived earlier form-encoded writer never survived to a
    * round boundary; no persisted value carries '+'-means-space.)
    * The marker exists so future codec changes stay decodable. */
  private val DimsV2 = "2!"

  private def encodeDims(dims: Seq[graft.io.JoinView.DimLink]): String =
    DimsV2 + dims.map { d =>
      def e(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
        .replace("+", "%20")
      Seq(e(d.dimPath), e(d.dimKeyCol), e(d.joinCol),
        d.carryCols.map(e).mkString("|")).mkString(":")
    }.mkString(";")

  private def decodeDims(raw: String): Seq[graft.io.JoinView.DimLink] = {
    val enc = if (raw.startsWith(DimsV2)) raw.substring(DimsV2.length)
      else raw
    enc.split(';').filter(_.nonEmpty).toSeq.map { hop =>
      // '+' re-escaped before the decode in BOTH formats — URLDecoder's
      // form-encoding quirk would otherwise turn a literal '+' (which
      // every writer since r15 stores raw) into a space
      def d(s: String) = java.net.URLDecoder.decode(
        s.replace("+", "%2B"), "UTF-8")
      // split with limit -1: a carry-less hop ("p:k:j:" — a pure
      // semi-join-filter dim) keeps its trailing empty field instead
      // of collapsing to 3 and failing the re-open of a view that
      // CREATEd fine
      hop.split(":", -1) match {
        case Array(p, k, j, cs) => graft.io.JoinView.DimLink(
          d(p), d(k), d(j),
          cs.split('|').filter(_.nonEmpty).toSeq.map(d))
        case other => sys.error(
          s"malformed jv.dims hop '$hop' (${other.length} fields)")
      }
    }
  }

  /** One table's auto-maintenance pass: [[Versioned.maintain]] under
    * the table's `maintain.*` property overrides. Shared by the
    * `maintain` and `maintain_all` procedures; `props` is the
    * caller's single read of the property store. */
  private def maintainOne(path: String, props: Map[String, String],
      keyCol: String): Seq[(String, String)] = {
    val d = Versioned.MaintainConfig()
    val cfg = Versioned.MaintainConfig(
      deltaCommits = props.get("maintain.delta_commits")
        .map(_.toInt).getOrElse(d.deltaCommits),
      deltaBytesFrac = props.get("maintain.delta_bytes_frac")
        .map(_.toDouble).getOrElse(d.deltaBytesFrac),
      fullRewriteFrac = props.get("maintain.full_rewrite_frac")
        .map(_.toDouble).getOrElse(d.fullRewriteFrac),
      targetFileBytes = props.get("maintain.target_file_bytes")
        .map(_.toLong).getOrElse(d.targetFileBytes),
      smallFileFrac = props.get("maintain.small_file_frac")
        .map(_.toDouble).getOrElse(d.smallFileFrac),
      vacuumHorizon = props.get("maintain.vacuum_horizon")
        .map(_.toInt).getOrElse(d.vacuumHorizon),
      vacuumRetainMs = props.get("maintain.vacuum_retain_ms")
        .map(_.toLong).getOrElse(d.vacuumRetainMs))
    Versioned.maintain(spark, path, keyCol, cfg)
  }

  /** The table half of a maintenance pass — keyless tables report a
    * `skip` row (the resolve needs a key) instead of failing, so the
    * declared-index sweep that follows still runs. */
  private def maintainTable(path: String,
      props: Map[String, String]): Seq[(String, String)] =
    props.get(GraftCatalog.KeyProp) match {
      case None => Seq(("skip", "no 'key' table property"))
      case Some(k) => maintainOne(path, props, k)
    }

  /** Indexes DECLARED on a table via `index.<name>` table properties
    * (value = `search:<path>` or `vector:<path>`): the table's own
    * at-rest generation-log indexes, swept by `maintain` /
    * `maintain_all` right after the table itself so ONE call keeps
    * the whole serving surface healthy. A malformed value fails
    * loudly — a silently skipped index would rot unseen. */
  private def maintainIndexes(path: String,
      props: Map[String, String]): Seq[(String, String)] = {
    // the index policy's knobs override from the TABLE's properties
    // (one pair for all its declared indexes — the maintain.* pattern)
    val d = graft.io.GenLog.MaintainConfig()
    val cfg = graft.io.GenLog.MaintainConfig(
      deltaGens = props.get("maintain.index.delta_gens")
        .map(_.toInt).getOrElse(d.deltaGens),
      purgeFrac = props.get("maintain.index.purge_frac")
        .map(_.toDouble).getOrElse(d.purgeFrac))
    def exists(ip: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(ip)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    declaredIndexes(props).flatMap { case (k, v) =>
        val name = k.stripPrefix("index.")
        val acts = v.split(":", 2) match {
          // declared-before-built: a skip row, not a sweep-wide
          // failure (the declaration is forward-looking by design)
          case Array("search" | "vector", ip) if !exists(ip) =>
            Seq(("skip", "not built yet"))
          case Array("search", ip) =>
            Search.maintain(spark, Search.open(spark, ip), cfg)
          case Array("vector", ip) =>
            VecIndex.maintain(spark, VecIndex.open(spark, ip), cfg)
          case _ => sys.error(s"table property $k must be " +
            s"'search:<path>' or 'vector:<path>', got '$v'")
        }
        acts.map { case (a, det) => (a, s"index $name: $det") }
      }
  }

  /** The `index.<name>` DECLARATIONS among a table's properties —
    * sub-properties (`index.<name>.text` / `.vec` / `.sync`, the
    * sync-binding knobs) are not declarations. Sorted for
    * deterministic sweep order. */
  private def declaredIndexes(
      props: Map[String, String]): Seq[(String, String)] =
    props.toSeq.filter { case (k, _) =>
      k.startsWith("index.") && !k.stripPrefix("index.").contains(".")
    }.sortBy(_._1)

  /** TABLE → INDEX CDC SYNC over the table's declared indexes
    * ([[graft.pipeline.IndexSync]]): drain the table's change feed
    * `(watermark, head]` into each — inserts/updates re-ingest the
    * keys' current rows, deletes tombstone, exactly once per source
    * version. Bindings: key from the table's `key` property, text
    * column from `index.<name>.text` (default `text`), vector column
    * from `index.<name>.vec` (default `vec`). `onlyOptIn` restricts
    * to indexes declaring `index.<name>.sync = 'true'` — the
    * maintain sweep's gate, so a hand-maintained declared index is
    * never surprise-synced; the explicit `sync_indexes` CALL syncs
    * every declaration. `isolate` turns a failing sync into a
    * `sync-error` row instead of killing a namespace sweep. */
  private def syncDeclaredIndexes(path: String,
      props: Map[String, String], onlyOptIn: Boolean,
      isolate: Boolean = false): Seq[(String, String)] = {
    def exists(ip: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(ip)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    declaredIndexes(props).flatMap { case (k, v) =>
      val name = k.stripPrefix("index.")
      def run(): Seq[(String, String)] = v.split(":", 2) match {
        case Array("search" | "vector", ip) if !exists(ip) =>
          Seq(("skip", s"index $name: not built yet"))
        case Array(kind @ ("search" | "vector"), ip) =>
          val key = props.getOrElse(GraftCatalog.KeyProp, sys.error(
            s"table $path has no 'key' property; the index sync " +
              "resolves keys — ALTER TABLE … SET TBLPROPERTIES " +
              "('key' = '<col>')"))
          val (f, t) =
            if (kind == "search")
              graft.pipeline.IndexSync.syncSearch(spark, path, key,
                props.getOrElse(s"index.$name.text", "text"),
                Search.open(spark, ip))
            else
              graft.pipeline.IndexSync.syncVector(spark, path, key,
                props.getOrElse(s"index.$name.vec", "vec"),
                VecIndex.open(spark, ip))
          if (t > f)
            Seq(("sync", s"index $name: folded source versions ($f, $t]"))
          else Seq(("noop", s"index $name: up to date at $t"))
        case _ => sys.error(s"table property $k must be " +
          s"'search:<path>' or 'vector:<path>', got '$v'")
      }
      if (onlyOptIn && !props.get(s"index.$name.sync").contains("true"))
        Nil
      else if (!isolate) run()
      else
        try run()
        catch {
          case scala.util.control.NonFatal(e) =>
            Seq(("sync-error", s"index $name: sync failed — the " +
              s"sweep continues: ${e.getMessage}"))
        }
    }
  }

  /** The VIEW-FRESHNESS half of a maintenance pass: when the table's
    * persisted properties identify it as a MAINTAINED VIEW
    * (`create_matview` / `create_joinview[_chain]` /
    * `create_sketchview` record the view→source binding as
    * `mv.*`/`jv.*`/`sv.*`), run the idempotent delta-cost refresh
    * BEFORE file-shape maintenance — one cron'd `CALL
    * system.maintain[_all]` keeps the serving surface FRESH and
    * folded, not just compacted. A quiet source reports nothing (the
    * refresh returns without committing); a stale view reports the
    * source-version range it folded. Plain tables return no rows.
    * `isolate` (the namespace sweep): a failing refresh — dropped
    * source, vacuumed-past binding — reports a `refresh-error` row
    * and lets the table's own file-shape maintenance (and the REST of
    * the sweep) continue, instead of one broken view killing every
    * other table's cron'd pass; the targeted `maintain` call keeps
    * the loud failure. */
  private def maintainViewFreshness(cat: GraftCatalog, path: String,
      props: Map[String, String],
      isolate: Boolean = false): Seq[(String, String)] = {
    def report(kind: String, before: Int, after: Int) =
      if (after > before)
        Seq(("refresh",
          s"$kind view folded source versions ($before, $after]"))
      else Seq.empty[(String, String)]
    def run(): Seq[(String, String)] =
      if (props.contains("jv.dims") || props.contains("jv.dim")) {
        val h = joinHandleOf(cat, path)
        report("join", graft.io.JoinView.refreshedVersion(spark, h),
          graft.io.JoinView.refresh(spark, h))
      } else if (props.contains("mv.source")) {
        val h = graft.io.MatView.Handle(path, props("mv.source"),
          props("mv.key"), props("mv.group"),
          props("mv.sums").split(',').filter(_.nonEmpty).toSeq,
          props.getOrElse("mv.minmax", "").split(',')
            .filter(_.nonEmpty).toSeq)
        report("mat", graft.io.MatView.refreshedVersion(spark, h),
          graft.io.MatView.refresh(spark, h))
      } else if (props.contains("sv.source")) {
        val h = sketchHandle(cat, path)
        report("sketch", graft.io.SketchView.refreshedVersion(spark, h),
          graft.io.SketchView.refresh(spark, h))
      } else Seq.empty
    if (!isolate) run()
    else
      try run()
      catch {
        case scala.util.control.NonFatal(e) =>
          Seq(("refresh-error", s"view refresh failed — file-shape " +
            s"maintenance continues: ${e.getMessage}"))
      }
  }

  private def procs: Seq[Proc] = Seq(
    new Proc("compact",
      "merge-on-read checkpoint: resolve current state into one commit",
      Seq(in("table", StringType)), versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        oneVersion(Versioned.compact(spark, p, keyOf(cat, p)))
      }),
    new Proc("maintain",
      "one-call auto-maintenance: read the table's shape (checkpoint " +
        "base, delta commits/bytes, file-size histogram) and run the " +
        "fold / full-compact / vacuum combination the thresholds call " +
        "for; thresholds override via maintain.* table properties " +
        "(delta_commits, delta_bytes_frac, full_rewrite_frac, " +
        "target_file_bytes, small_file_frac, vacuum_horizon, " +
        "vacuum_retain_ms — the time-based retention, taking " +
        "precedence over the horizon). A MAINTAINED VIEW " +
        "(create_matview/joinview/sketchview) refreshes FIRST — the " +
        "idempotent delta fold against its recorded source — so the " +
        "call keeps it fresh, not just compacted; then " +
        "sweeps indexes DECLARED on the table via index.<name> = " +
        "'search:<path>' | 'vector:<path>' properties through the " +
        "index_maintain policy; returns the actions taken. A keyless " +
        "table reports skip for the table half and still sweeps its " +
        "declared indexes",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("action", StringType, nullable = false),
        StructField("detail", StringType, nullable = false))),
      (cat, row) => {
        val p = tablePath(cat, row)
        val props = cat.propsOf(p)
        (maintainViewFreshness(cat, p, props) ++
          maintainTable(p, props) ++
          syncDeclaredIndexes(p, props, onlyOptIn = true) ++
          maintainIndexes(p, props)).map {
          case (a, det) => InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(a),
            org.apache.spark.unsafe.types.UTF8String.fromString(det))
        }.toArray
      }),
    new Proc("maintain_all",
      "the namespace-wide sweep of maintain: run the same auto-policy " +
        "(per-table maintain.* property overrides included) over " +
        "EVERY table in the namespace ('' = the root) — maintained " +
        "views refresh against their recorded source FIRST, then " +
        "fold like any other graft table. Tables " +
        "without a 'key' property report action='skip' (the resolve " +
        "needs a key); 'noop' rows are included so the sweep's " +
        "coverage is auditable. Indexes DECLARED via index.<name> " +
        "table properties sweep with their table; generation-log " +
        "indexes nothing declares need index_maintain directly. " +
        "Tables sweep sequentially on purpose: each table's " +
        "maintenance is itself a distributed job, and vacuum's " +
        "single-writer caveat is per-table",
      Seq(in("namespace", StringType)),
      StructType(Seq(
        StructField("table_name", StringType, nullable = false),
        StructField("action", StringType, nullable = false),
        StructField("detail", StringType, nullable = false))),
      (cat, row) => {
        val ns = str(row, 0, "namespace")
        val nsArr = if (ns.isEmpty) Array.empty[String]
          else ns.split('.')
        def u(s: String) =
          org.apache.spark.unsafe.types.UTF8String.fromString(s)
        cat.listTables(nsArr).toSeq.flatMap { ident =>
          val p = cat.resolveTablePath(ident)
          val props = cat.propsOf(p)
          // view freshness first (a stale maintained view refreshes
          // before its files fold; a broken binding reports an error
          // row instead of killing the sweep); declared index.<name>
          // properties sweep even on keyless tables (index
          // maintenance never resolves the table's key)
          val acts = maintainViewFreshness(cat, p, props,
            isolate = true) ++
            maintainTable(p, props) ++
            syncDeclaredIndexes(p, props, onlyOptIn = true,
              isolate = true) ++
            maintainIndexes(p, props)
          acts.map { case (a, det) =>
            InternalRow(u(ident.name), u(a), u(det)) }
        }.toArray
      }),
    new Proc("create_matview",
      "create + fully refresh a maintained per-group aggregate view " +
        "over a graft table: sums (and optional min/max) per group, " +
        "delta-cost refreshes thereafter; the view is itself a graft " +
        "table keyed by the group column (SELECT it like any other)",
      Seq(in("view", StringType), in("source", StringType),
        in("group_col", StringType), in("sum_cols", StringType)),
      versionOut,
      (cat, row) => {
        val parts = str(row, 0, "view").split('.')
        val viewPath = cat.pathForName(Identifier.of(parts.init, parts.last))
        val srcParts = str(row, 1, "source").split('.')
        val srcPath = cat.resolveTablePath(
          Identifier.of(srcParts.init, srcParts.last))
        val groupCol = str(row, 2, "group_col")
        val sums = str(row, 3, "sum_cols").split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val keyCol = keyOf(cat, srcPath)
        val h = graft.io.MatView.init(spark, srcPath, keyCol, groupCol,
          sums, viewPath)
        // persist the handle as table properties so refresh_matview
        // (and any later session) can rebuild it. The view's STORAGE
        // schema names the group column 'g' (its generic name), so
        // the view's own resolve key — what CALL compact/vacuum on
        // the view itself would use — is 'g', not the source name.
        cat.setProps(viewPath, Map(
          GraftCatalog.KeyProp -> "g",
          "mv.source" -> srcPath, "mv.key" -> keyCol,
          "mv.group" -> groupCol, "mv.sums" -> sums.mkString(",")))
        oneVersion(graft.io.MatView.refreshedVersion(spark, h))
      }),
    new Proc("refresh_matview",
      "fold the source versions committed since the last refresh " +
        "into a create_matview view (delta-cost, exactly-once); " +
        "returns the source version the view now reflects",
      Seq(in("view", StringType)), versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        val props = cat.propsOf(p)
        val h = graft.io.MatView.Handle(p,
          props.getOrElse("mv.source", sys.error(
            s"$p is not a create_matview view (no mv.* properties)")),
          props("mv.key"), props("mv.group"),
          props("mv.sums").split(',').filter(_.nonEmpty).toSeq, Nil)
        oneVersion(graft.io.MatView.refresh(spark, h))
      }),
    new Proc("create_joinview",
      "create + fully refresh a maintained JOIN view: fact JOIN dim " +
        "grouped by a dim attribute, materialized at the JOIN-KEY " +
        "grain (fact deltas fold at delta cost via refresh_joinview; " +
        "dim changes are visible at the next serve-side read with " +
        "ZERO refresh — the state is an ordinary graft table, SELECT " +
        "it joined to the dims and re-group)",
      Seq(in("view", StringType), in("fact", StringType),
        in("fk_col", StringType), in("sum_cols", StringType),
        in("dim", StringType), in("dim_key", StringType),
        in("dim_attr", StringType)),
      versionOut,
      (cat, row) => {
        val parts = str(row, 0, "view").split('.')
        val viewPath = cat.pathForName(Identifier.of(parts.init, parts.last))
        def resolve(i: Int, what: String): String = {
          val ps = str(row, i, what).split('.')
          cat.resolveTablePath(Identifier.of(ps.init, ps.last))
        }
        val factPath = resolve(1, "fact")
        val dimPath = resolve(4, "dim")
        val fkCol = str(row, 2, "fk_col")
        val sums = str(row, 3, "sum_cols").split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val dimKey = str(row, 5, "dim_key")
        val dimAttr = str(row, 6, "dim_attr")
        val keyCol = keyOf(cat, factPath)
        val h = graft.io.JoinView.init(spark, factPath, keyCol, fkCol,
          sums, dimPath, dimKey, dimAttr, viewPath)
        cat.setProps(viewPath, Map(
          GraftCatalog.KeyProp -> "g",
          "mv.source" -> factPath, "mv.key" -> keyCol,
          "mv.group" -> fkCol, "mv.sums" -> sums.mkString(","),
          "jv.dim" -> dimPath, "jv.dimkey" -> dimKey,
          "jv.dimattr" -> dimAttr))
        oneVersion(graft.io.JoinView.refreshedVersion(spark, h))
      }),
    new Proc("create_joinview_chain",
      "the SNOWFLAKE shape of create_joinview: fact JOIN dim [JOIN " +
        "dim2 ...] grouped by attributes drawn from any hop, with " +
        "optional min/max columns maintained alongside the sums. " +
        "dims = ';'-joined hops, each 'dim:dim_key:join_col:" +
        "carryA|carryB' (join_col = a column of the level below; " +
        "fields URL-encoded if they contain ':;|'); attrs = comma " +
        "list (the read's GROUP BY); minmax_cols = comma list (may " +
        "be empty). Same fk-grain materialization and delta-cost " +
        "refresh_joinview as the single-dim shape",
      Seq(in("view", StringType), in("fact", StringType),
        in("fk_col", StringType), in("sum_cols", StringType),
        in("dims", StringType), in("attrs", StringType),
        in("minmax_cols", StringType)),
      versionOut,
      (cat, row) => {
        val parts = str(row, 0, "view").split('.')
        val viewPath = cat.pathForName(Identifier.of(parts.init, parts.last))
        def resolve(name: String): String = {
          val ps = name.split('.')
          cat.resolveTablePath(Identifier.of(ps.init, ps.last))
        }
        val factPath = resolve(str(row, 1, "fact"))
        val fkCol = str(row, 2, "fk_col")
        val sums = str(row, 3, "sum_cols").split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        // hops arrive with TABLE NAMES; resolve each to its path
        val dims = decodeDims(str(row, 4, "dims")).map(dl =>
          dl.copy(dimPath = resolve(dl.dimPath)))
        require(dims.nonEmpty, "create_joinview_chain needs >= 1 hop")
        val attrs = str(row, 5, "attrs").split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        require(attrs.nonEmpty, "create_joinview_chain needs >= 1 attr")
        val minMax = str(row, 6, "minmax_cols").split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val keyCol = keyOf(cat, factPath)
        val h = graft.io.JoinView.init(spark, factPath, keyCol, fkCol,
          sums, dims, attrs, viewPath, minMax)
        cat.setProps(viewPath, Map(
          GraftCatalog.KeyProp -> "g",
          "mv.source" -> factPath, "mv.key" -> keyCol,
          "mv.group" -> fkCol, "mv.sums" -> sums.mkString(","),
          "mv.minmax" -> minMax.mkString(","),
          "jv.dims" -> encodeDims(dims),
          "jv.attrs" -> attrs.mkString(",")))
        oneVersion(graft.io.JoinView.refreshedVersion(spark, h))
      }),
    new Proc("refresh_joinview",
      "fold the fact versions committed since the last refresh into a " +
        "create_joinview / create_joinview_chain view (delta-cost, " +
        "exactly-once); dim changes never need a refresh",
      Seq(in("view", StringType)), versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        val h = joinHandleOf(cat, p)
        oneVersion(graft.io.JoinView.refresh(spark, h))
      }),
    new Proc("create_sketchview",
      "create + fully refresh a maintained per-group DISTINCT-estimate " +
        "view over a graft table (HLL registers, 2^b per group; " +
        "delta-cost refreshes thereafter)",
      Seq(in("view", StringType), in("source", StringType),
        in("group_col", StringType), in("value_col", StringType),
        in("b", IntegerType)),
      versionOut,
      (cat, row) => {
        val parts = str(row, 0, "view").split('.')
        val viewPath = cat.pathForName(Identifier.of(parts.init, parts.last))
        val sp = str(row, 1, "source").split('.')
        val srcPath = cat.resolveTablePath(Identifier.of(sp.init, sp.last))
        val g = str(row, 2, "group_col")
        val vcol = str(row, 3, "value_col")
        val b = row.getInt(4)
        val h = graft.io.SketchView.init(spark, srcPath,
          keyOf(cat, srcPath), g, vcol, viewPath, b)
        // the view's own resolve key is its composite register key
        cat.setProps(viewPath, Map(GraftCatalog.KeyProp -> "__sk",
          "sv.source" -> srcPath, "sv.key" -> keyOf(cat, srcPath),
          "sv.group" -> g, "sv.value" -> vcol, "sv.b" -> b.toString))
        oneVersion(graft.io.SketchView.refreshedVersion(spark, h))
      }),
    new Proc("refresh_sketchview",
      "fold source commits since the last refresh into a " +
        "create_sketchview view (delta-cost, exactly-once)",
      Seq(in("view", StringType)), versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        oneVersion(graft.io.SketchView.refresh(spark,
          sketchHandle(cat, p)))
      }),
    new Proc("sketchview_estimate",
      "per-group distinct estimates from the maintained registers — " +
        "reads ONLY the view (<= 2^b rows per group), never the " +
        "source; groups returned as strings (rows are (g, estimate))",
      Seq(in("view", StringType)),
      StructType(Seq(StructField("g", StringType, nullable = true),
        StructField("estimate", LongType, nullable = false))),
      (cat, row) => {
        val p = tablePath(cat, row)
        val h = sketchHandle(cat, p)
        graft.io.SketchView.estimate(spark, h)
          .select(org.apache.spark.sql.functions.col(h.groupCol)
              .cast("string").as("g"),
            org.apache.spark.sql.functions.col("est_distinct"))
          .orderBy("g").collect()
          .map(r => InternalRow(
            org.apache.spark.unsafe.types.UTF8String
              .fromString(r.getString(0)), r.getLong(1)))
      }),
    new Proc("bm25",
      "BM25 top-k over an at-rest text index (path-addressed: the " +
        "search tier's SQL face; rows are (id, score))",
      Seq(in("index_path", StringType), in("query", StringType),
        in("k", IntegerType)),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))),
      (_, row) => {
        val p = str(row, 0, "index_path")
        val terms = str(row, 1, "query")
          .split("\\s+").filter(_.nonEmpty).toSeq
        val k = row.getInt(2)
        require(k >= 1, s"k must be >= 1, got $k")
        Search.searchBm25(spark, Search.open(spark, p), terms, k)
          .collect().map(r => InternalRow(r.getLong(0), r.getDouble(1)))
      }),
    new Proc("search_fuzzy",
      "typo-tolerant BM25 top-k over an at-rest text index: each " +
        "query term expands against the index vocabulary within " +
        "max_dist edits (first character shared — Lucene FuzzyQuery " +
        "prefix_length=1), the variant union serves through BM25; " +
        "rows are (id, score)",
      Seq(in("index_path", StringType), in("query", StringType),
        in("max_dist", IntegerType), in("k", IntegerType)),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))),
      (_, row) => {
        val p = str(row, 0, "index_path")
        val terms = str(row, 1, "query")
          .split("\\s+").filter(_.nonEmpty).toSeq
        Search.searchFuzzy(spark, Search.open(spark, p), terms,
            row.getInt(2), row.getInt(3))
          .collect().map(r => InternalRow(r.getLong(0), r.getDouble(1)))
      }),
    new Proc("search_prefix",
      "prefix (term*) BM25 top-k over an at-rest text index — the " +
        "autocomplete shape: vocabulary tokens starting with any " +
        "given prefix serve as one BM25 disjunction; rows are " +
        "(id, score)",
      Seq(in("index_path", StringType), in("prefixes", StringType),
        in("k", IntegerType)),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))),
      (_, row) => {
        val p = str(row, 0, "index_path")
        val prefixes = str(row, 1, "prefixes")
          .split("\\s+").filter(_.nonEmpty).toSeq
        Search.searchPrefix(spark, Search.open(spark, p), prefixes,
            row.getInt(2))
          .collect().map(r => InternalRow(r.getLong(0), r.getDouble(1)))
      }),
    new Proc("sync_indexes",
      "table -> index CDC sync: drain the table's change feed " +
        "(watermark, head] into EVERY index declared via " +
        "index.<name> = 'search:<path>' | 'vector:<path>' table " +
        "properties — inserts/updates re-ingest the keys' current " +
        "rows (bounded point-lookup read), deletes tombstone, " +
        "exactly once per source version (the append carries the " +
        "head-version marker); bindings: key from the table's 'key' " +
        "property, text column from index.<name>.text (default " +
        "'text'), vector column from index.<name>.vec (default " +
        "'vec'). Set index.<name>.sync = 'true' to run this sync " +
        "automatically inside maintain / maintain_all. Returns " +
        "(action, detail) rows",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("action", StringType, nullable = false),
        StructField("detail", StringType, nullable = false))),
      (cat, row) => {
        val p = tablePath(cat, row)
        syncDeclaredIndexes(p, cat.propsOf(p), onlyOptIn = false).map {
          case (a, det) => InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(a),
            org.apache.spark.unsafe.types.UTF8String.fromString(det))
        }.toArray
      }),
    new Proc("eval_retrieval",
      "offline retrieval evaluation: per-query recall@k, reciprocal " +
        "rank, and nDCG@k from a (qid, id, score) results table and a " +
        "(qid, id, rel) graded-qrels table — each argument a parquet " +
        "path (contains '/') or a table/view name (temp view or " +
        "catalog table); rows are (qid, recall_k, rr, ndcg_k), one " +
        "per judged-or-retrieved query",
      Seq(in("results", StringType), in("qrels", StringType),
        in("k", IntegerType)),
      StructType(Seq(StructField("qid", LongType, nullable = false),
        StructField("recall_k", DoubleType, nullable = false),
        StructField("rr", DoubleType, nullable = false),
        StructField("ndcg_k", DoubleType, nullable = false))),
      (_, row) => {
        val res = evalFrame(str(row, 0, "results"))
        val rel = evalFrame(str(row, 1, "qrels"))
        graft.pipeline.Eval.rankMetrics(res, rel, row.getInt(2))
          .selectExpr("CAST(qid AS BIGINT) AS qid", "recall_k", "rr",
            "ndcg_k")
          .collect().map(r => InternalRow(r.getLong(0), r.getDouble(1),
            r.getDouble(2), r.getDouble(3)))
      }),
    new Proc("eval_negatives",
      "hard-negative mining: per query, the n best-ranked results " +
        "NOT relevant in the qrels (the contrastive training pairs a " +
        "dense retriever mines from its own serve) — same argument " +
        "resolution as eval_retrieval; rows are (qid, id, neg_rank), " +
        "neg_rank 1 = hardest",
      Seq(in("results", StringType), in("qrels", StringType),
        in("n", IntegerType)),
      StructType(Seq(StructField("qid", LongType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("neg_rank", IntegerType, nullable = false))),
      (_, row) => {
        val res = evalFrame(str(row, 0, "results"))
        val rel = evalFrame(str(row, 1, "qrels"))
        graft.pipeline.Eval.hardNegatives(res, rel, row.getInt(2))
          .selectExpr("CAST(qid AS BIGINT) AS qid",
            "CAST(id AS BIGINT) AS id", "neg_rank")
          .collect().map(r => InternalRow(r.getLong(0), r.getLong(1),
            r.getInt(2)))
      }),
    new Proc("ann_maxsim",
      "multi-vector (max-sim) DOC ranking over a chunk-embedding " +
        "index: the query vector retrieves its top-n_chunks chunk " +
        "candidates through the probed IVF read and docs rank by the " +
        "max of their retrieved chunks' cosines (doc_col = the " +
        "metadata column holding the parent doc id); rows are " +
        "(doc, score)",
      Seq(in("index_path", StringType), in("vector", StringType),
        in("doc_col", StringType), in("n_probe", IntegerType),
        in("n_chunks", IntegerType), in("k", IntegerType)),
      StructType(Seq(StructField("doc", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))),
      (_, row) => {
        val p = str(row, 0, "index_path")
        val vec = str(row, 1, "vector").split(',').map(_.trim.toFloat)
        val sess = spark
        import sess.implicits._
        val q = Seq((-1L, vec)).toDF("id", "vec")
        VecIndex.maxSimTopK(spark, q, VecIndex.open(spark, p),
            str(row, 2, "doc_col"), row.getInt(3), row.getInt(4),
            row.getInt(5))
          .select(org.apache.spark.sql.functions
            .col(str(row, 2, "doc_col")).cast("long"),
            org.apache.spark.sql.functions.col("score"))
          .collect().map { r =>
            require(!r.isNullAt(0), "ann_maxsim: doc_col '" +
              str(row, 2, "doc_col") + "' is not an integral column " +
              "(its values do not cast to BIGINT) — this SQL face " +
              "returns (doc BIGINT, score); use the Scala face for " +
              "non-numeric doc ids")
            InternalRow(r.getLong(0), r.getDouble(1))
          }
      }),
    new Proc("hybrid_topk",
      "hybrid retrieval from SQL: BM25 top-n_lex for the query terms " +
        "from the text index + cosine top-n_sem for the query vector " +
        "from the vector index (probed IVF), fused by reciprocal " +
        "rank fusion (k0=60) to top-k; rows are (id, rrf)",
      Seq(in("text_index_path", StringType),
        in("vector_index_path", StringType), in("query", StringType),
        in("vector", StringType), in("n_probe", IntegerType),
        in("k", IntegerType)),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("rrf", DoubleType, nullable = false))),
      (_, row) => {
        val terms = str(row, 2, "query")
          .split("\\s+").filter(_.nonEmpty).toSeq
        val vec = str(row, 3, "vector").split(',').map(_.trim.toFloat)
        val sess = spark
        import sess.implicits._
        val q = Seq((-1L, vec)).toDF("id", "vec")
        graft.pipeline.Hybrid.hybridTopK(spark,
            Search.open(spark, str(row, 0, "text_index_path")),
            VecIndex.open(spark, str(row, 1, "vector_index_path")),
            terms, q, nProbe = row.getInt(4), topK = row.getInt(5))
          .collect().map(r => InternalRow(r.getLong(0), r.getDouble(1)))
      }),
    new Proc("hybrid_topk_weighted",
      "hybrid retrieval with TUNED fusion: BM25 top-20 + probed " +
        "cosine top-20 fused by fusion = 'rrf' (score = " +
        "w_i/(60+rank_i), per-list weights) or 'minmax' (each list " +
        "min-max normalized to [0,1] over its own candidates, " +
        "weighted sum) to top-k; rows are (id, score)",
      Seq(in("text_index_path", StringType),
        in("vector_index_path", StringType), in("query", StringType),
        in("vector", StringType), in("n_probe", IntegerType),
        in("k", IntegerType), in("w_lex", DoubleType),
        in("w_sem", DoubleType), in("fusion", StringType)),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))),
      (_, row) => {
        val terms = str(row, 2, "query")
          .split("\\s+").filter(_.nonEmpty).toSeq
        val vec = str(row, 3, "vector").split(',').map(_.trim.toFloat)
        val sess = spark
        import sess.implicits._
        val q = Seq((-1L, vec)).toDF("id", "vec")
        val lex = Search.searchBm25(spark,
          Search.open(spark, str(row, 0, "text_index_path")), terms,
          topK = 20)
        val sem = VecIndex.ivfTopK(spark, q,
          VecIndex.open(spark, str(row, 1, "vector_index_path")),
          row.getInt(4), 20)
        val lists = Seq((lex, "id", "score"), (sem, "nid", "cos"))
        val ws = Seq(row.getDouble(6), row.getDouble(7))
        val fused = str(row, 8, "fusion") match {
          case "rrf" => graft.pipeline.Hybrid
            .rrf(lists, 60, row.getInt(5), weights = ws)
          case "minmax" => graft.pipeline.Hybrid
            .minMaxFuse(lists, ws, row.getInt(5))
          case other => sys.error(
            s"fusion must be 'rrf' or 'minmax', got '$other'")
        }
        fused.collect().map(r => InternalRow(r.getLong(0), r.getDouble(1)))
      }),
    new Proc("ann_topk",
      "probed ANN top-k over an at-rest generational vector index " +
        "(path-addressed; query vector as comma-separated floats; " +
        "rows are (id, cos))",
      Seq(in("index_path", StringType), in("vector", StringType),
        in("n_probe", IntegerType), in("k", IntegerType)),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("cos", DoubleType, nullable = false))),
      (_, row) => {
        val p = str(row, 0, "index_path")
        val vec = str(row, 1, "vector").split(',').map(_.trim.toFloat)
        val nProbe = row.getInt(2)
        val k = row.getInt(3)
        require(nProbe >= 1 && k >= 1,
          s"n_probe and k must be >= 1, got $nProbe / $k")
        val sess = spark
        import sess.implicits._
        val q = Seq((0L, vec)).toDF("id", "vec")
        VecIndex.ivfTopK(spark, q, VecIndex.open(spark, p), nProbe, k)
          .select("nid", "cos")
          .collect().map(r => InternalRow(r.getLong(0), r.getDouble(1)))
      }),
    new Proc("index_compact",
      "fold an at-rest text or vector index's live generations into " +
        "one base (path-addressed; kind = 'search' | 'vector'); " +
        "returns the new base generation count as rows folded",
      Seq(in("index_path", StringType), in("kind", StringType)),
      versionOut,
      (_, row) => {
        val p = str(row, 0, "index_path")
        str(row, 1, "kind") match {
          case "search" =>
            Search.compact(spark, Search.open(spark, p))
            oneVersion(1)
          case "vector" =>
            VecIndex.compact(spark, VecIndex.open(spark, p))
            oneVersion(1)
          case other => sys.error(
            s"index_compact: kind must be 'search' or 'vector', got '$other'")
        }
      }),
    new Proc("index_compact_incremental",
      "fold an at-rest text or vector index's delta generations into " +
        "a new base at DELTA COST: only the token buckets / cluster " +
        "dirs the deltas touched are rewritten, clean ones are " +
        "carried by reference (path-addressed; kind = 'search' | " +
        "'vector'); the 100 TB maintenance path — run the full " +
        "index_compact occasionally to purge tombstoned rows physically",
      Seq(in("index_path", StringType), in("kind", StringType)),
      versionOut,
      (_, row) => {
        val p = str(row, 0, "index_path")
        str(row, 1, "kind") match {
          case "search" =>
            Search.compactIncremental(spark, Search.open(spark, p))
            oneVersion(1)
          case "vector" =>
            VecIndex.compactIncremental(spark, VecIndex.open(spark, p))
            oneVersion(1)
          case other => sys.error(
            "index_compact_incremental: kind must be 'search' or " +
              s"'vector', got '$other'")
        }
      }),
    new Proc("index_maintain",
      "one-call auto-maintenance for an at-rest text or vector index " +
        "(path-addressed; kind = 'search' | 'vector'): the metas-only " +
        "policy picks full compact (tombstone purge) past the purge " +
        "fraction, an incremental fold past the delta-generation " +
        "threshold, or nothing — then vacuums; returns the actions " +
        "taken. The index twin of CALL system.maintain",
      Seq(in("index_path", StringType), in("kind", StringType)),
      StructType(Seq(StructField("action", StringType, nullable = false),
        StructField("detail", StringType, nullable = false))),
      (_, row) => {
        val p = str(row, 0, "index_path")
        val acts = str(row, 1, "kind") match {
          case "search" => Search.maintain(spark, Search.open(spark, p))
          case "vector" => VecIndex.maintain(spark, VecIndex.open(spark, p))
          case other => sys.error(
            s"index_maintain: kind must be 'search' or 'vector', " +
              s"got '$other'")
        }
        acts.map { case (a, det) => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(a),
          org.apache.spark.unsafe.types.UTF8String.fromString(det))
        }.toArray
      }),
    new Proc("index_delete",
      "tombstone documents/vectors out of an at-rest index by id " +
        "(path-addressed; kind = 'search' | 'vector'; ids as a comma-" +
        "separated list of longs) — the delete+append reingest cycle's " +
        "SQL face; BM25 stats / vector counts stay exact (only LIVE " +
        "victims are counted). Returns the number of ids submitted",
      Seq(in("index_path", StringType), in("kind", StringType),
        in("ids", StringType)),
      StructType(Seq(
        StructField("ids_submitted", IntegerType, nullable = false))),
      (_, row) => {
        val p = str(row, 0, "index_path")
        val ids = str(row, 2, "ids").split(',').map(_.trim)
          .filter(_.nonEmpty).map(_.toLong).toSeq
        require(ids.nonEmpty, "index_delete: no ids given")
        val sess = spark
        import sess.implicits._
        val df = ids.toDF("id")
        str(row, 1, "kind") match {
          case "search" => Search.delete(df, "id", Search.open(spark, p))
          case "vector" => VecIndex.delete(df, "id", VecIndex.open(spark, p))
          case other => sys.error(
            s"index_delete: kind must be 'search' or 'vector', got '$other'")
        }
        Array(InternalRow(ids.length))
      }),
    new Proc("index_delete_where",
      "PREDICATE tombstones for an at-rest index (path-addressed; " +
        "kind = 'search' | 'vector'): delete every LIVE doc/vector " +
        "whose stored metadata matches the SQL predicate — the " +
        "GDPR/retention shape (DELETE FROM idx WHERE source = '…'). " +
        "A predicate over an un-stored column fails loudly listing " +
        "the stored ones. Returns the number of matched live rows",
      Seq(in("index_path", StringType), in("kind", StringType),
        in("predicate", StringType)),
      StructType(Seq(
        StructField("rows_deleted", org.apache.spark.sql.types.LongType,
          nullable = false))),
      (_, row) => {
        val p = str(row, 0, "index_path")
        val pred = org.apache.spark.sql.functions.expr(
          str(row, 2, "predicate"))
        val n = str(row, 1, "kind") match {
          case "search" =>
            Search.deleteWhere(spark, Search.open(spark, p), pred)
          case "vector" =>
            VecIndex.deleteWhere(spark, VecIndex.open(spark, p), pred)
          case other => sys.error("index_delete_where: kind must be " +
            s"'search' or 'vector', got '$other'")
        }
        Array(InternalRow(n))
      }),
    new Proc("replay_quarantine",
      "dead-letter REPLAY: take the live rows of <table>'s quarantine " +
        "sibling (the 'quarantine.path' property), apply the SQL " +
        "select-list <fix> (e.g. 'k, abs(x) AS x'), re-validate " +
        "against the table's own check.* constraints (any surviving " +
        "violation refuses loudly, nothing committed), land the " +
        "corrected rows in <table> and drain them from the quarantine " +
        "— marker-paired exactly-once, torn replays heal on the next " +
        "call. Returns (main_version, drain_version), nulls when " +
        "there was nothing to replay",
      Seq(in("table", StringType), in("fix", StringType)),
      StructType(Seq(
        StructField("main_version", IntegerType),
        StructField("drain_version", IntegerType))),
      (cat, row) => {
        val p = tablePath(cat, row)
        val props = GraftCatalog.readProps(
          new org.apache.hadoop.fs.Path(p).getFileSystem(
            spark.sparkContext.hadoopConfiguration), p)
        val qAbs = GraftCatalog.quarantinePathOf(props, p)
          .getOrElse(sys.error(
            "replay_quarantine: the table has no 'quarantine.path' " +
              "property — dead letters were never diverted for it"))
        val keyCol = props.getOrElse(GraftCatalog.KeyProp, sys.error(
          "replay_quarantine: the table declares no key " +
            "('key' = '<col>') — the drain tombstones by key"))
        val checks = GraftCatalog.checkConstraints(props).map {
          case (n, sql) => (n, org.apache.spark.sql.functions.expr(sql))
        }
        require(checks.nonEmpty, "replay_quarantine: the table " +
          "declares no check.* constraints to re-validate against")
        val fixSelect = str(row, 1, "fix")
        val view = "graft_replay_fix_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val fix = (df: org.apache.spark.sql.DataFrame) => {
          df.createOrReplaceTempView(view)
          spark.sql(s"SELECT $fixSelect FROM $view")
        }
        val r = try Versioned.replayQuarantine(spark, qAbs, p, keyCol,
          checks, fix)
        finally spark.catalog.dropTempView(view)
        Array(r.map { case (mv, dv) => InternalRow(mv, dv) }
          .getOrElse(InternalRow(null, null)))
      }),
    new Proc("index_detail",
      "DESCRIBE-DETAIL for an at-rest generation-log index (text or " +
        "vector — the log format is shared): one row per committed " +
        "generation with its kind (base/seg/del, streaming batch tag " +
        "included), stats deltas, layout constant, codebook version, " +
        "and the base's hidden dead mass (the consolidated tombstone " +
        "snapshot's row count — what drives the purge decision in " +
        "index_maintain). Pure marker metadata, no data scan",
      Seq(in("index_path", StringType)),
      StructType(Seq(
        StructField("gen", IntegerType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("a", LongType, nullable = false),
        StructField("b", LongType, nullable = false),
        StructField("n", IntegerType, nullable = false),
        StructField("cbv", IntegerType, nullable = false),
        StructField("dead", LongType, nullable = false))),
      (_, row) => {
        val p = str(row, 0, "index_path")
        val f = new org.apache.hadoop.fs.Path(p)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        graft.io.GenLog.metas(spark, f, p).map(m =>
          InternalRow(m.gen,
            org.apache.spark.unsafe.types.UTF8String.fromString(m.kind),
            m.a, m.b, m.n, m.cbv, m.dead)).toArray
      }),
    new Proc("index_vacuum",
      "reclaim an at-rest index's generations below its newest base " +
        "plus stale claims (path-addressed; kind = 'search' | " +
        "'vector'); returns the number of reclaimed generations",
      Seq(in("index_path", StringType), in("kind", StringType)),
      versionOut,
      (_, row) => {
        val p = str(row, 0, "index_path")
        val got = str(row, 1, "kind") match {
          case "search" => Search.vacuum(spark, Search.open(spark, p))
          case "vector" => VecIndex.vacuum(spark, VecIndex.open(spark, p))
          case other => sys.error(
            s"index_vacuum: kind must be 'search' or 'vector', got '$other'")
        }
        oneVersion(got.length)
      }),
    new Proc("clone",
      "SHALLOW CLONE (zero-copy): create <table> as a new table whose " +
        "base checkpoint references every file of <source>'s resolved " +
        "head (auto-folded incrementally if dirty) — no data copied; " +
        "table properties (key, checks) copy over. Writes to the clone " +
        "never touch the source; CALL compact on the clone materializes " +
        "its own bytes. Caveat (Delta's shallow-clone contract): " +
        "vacuuming/dropping the source past the clone-time checkpoint " +
        "strands the references (reads fail loudly)",
      Seq(in("table", StringType), in("source", StringType)), versionOut,
      (cat, row) => {
        val parts = str(row, 0, "table").split('.')
        val dstPath = cat.pathForName(Identifier.of(parts.init, parts.last))
        val sp = str(row, 1, "source").split('.')
        val srcPath = cat.resolveTablePath(Identifier.of(sp.init, sp.last))
        val v = Versioned.cloneShallow(spark, srcPath, dstPath,
          keyOf(cat, srcPath))
        cat.setProps(dstPath, cat.propsOf(srcPath))
        oneVersion(v)
      }),
    new Proc("compact_partial",
      "INCREMENTAL merge-on-read checkpoint: fold only the delta since " +
        "the last checkpoint, carrying untouched checkpoint files by " +
        "reference (manifest) — O(touched files + delta), never " +
        "O(table). min_file_bytes also folds under-sized files in " +
        "(bin-packing); pass 0 to carry every untouched file",
      Seq(in("table", StringType), in("min_file_bytes", LongType)),
      versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        val minBytes = row.getLong(1)
        require(minBytes >= 0, s"min_file_bytes must be >= 0, got $minBytes")
        oneVersion(Versioned.compactIncremental(spark, p, keyOf(cat, p),
          minBytes))
      }),
    new Proc("compact_sized",
      "merge-on-read checkpoint sized + key-clustered into n_files " +
        "range-partitioned files (selective zone maps per file)",
      Seq(in("table", StringType), in("n_files", IntegerType)), versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        val n = row.getInt(1)
        require(n >= 1, s"n_files must be >= 1, got $n")
        oneVersion(Versioned.compact(spark, p, keyOf(cat, p), n))
      }),
    new Proc("zorder",
      "checkpoint-compact clustered by a Z-order key over the given " +
        "columns (linear [min,max] scale per column)",
      Seq(in("table", StringType), in("columns", StringType)), versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        val cols = str(row, 1, "columns").split(',').map(_.trim).toSeq
        oneVersion(Versioned.compactZOrder(spark, p, keyOf(cat, p), cols))
      }),
    new Proc("zorder_quantile",
      "checkpoint-compact clustered by an equi-depth (quantile-cut) " +
        "Z-order key — the outlier-proof variant",
      Seq(in("table", StringType), in("columns", StringType)), versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        val cols = str(row, 1, "columns").split(',').map(_.trim).toSeq
        oneVersion(
          Versioned.compactZOrderQuantile(spark, p, keyOf(cat, p), cols))
      }),
    new Proc("vacuum",
      "reclaim version dirs superseded by a checkpoint at least " +
        "<horizon> commits old; returns the reclaimed versions. " +
        "Clone-pinned files are kept; set the export.lease_ms table " +
        "property to get a warning when a pin outlives its lease",
      Seq(in("table", StringType), in("horizon", IntegerType)),
      StructType(Seq(
        StructField("reclaimed_version", IntegerType, nullable = false))),
      (cat, row) => {
        val p = tablePath(cat, row)
        val lease = cat.propsOf(p).get("export.lease_ms")
          .map(_.toLong).getOrElse(0L)
        Versioned.vacuum(spark, p, row.getInt(1), lease)
          .map(v => InternalRow(v)).toArray
      }),
    new Proc("vacuum_retain",
      "time-based retention (the RETAIN n HOURS shape): reclaim " +
        "version dirs superseded by a checkpoint whose commit " +
        "timestamp is at least <retain_ms> old; every commit younger " +
        "than the window survives, TIMESTAMP AS OF keeps working " +
        "inside it. Same clone-pin and export-lease semantics as " +
        "vacuum",
      Seq(in("table", StringType), in("retain_ms", LongType)),
      StructType(Seq(
        StructField("reclaimed_version", IntegerType, nullable = false))),
      (cat, row) => {
        val p = tablePath(cat, row)
        val lease = cat.propsOf(p).get("export.lease_ms")
          .map(_.toLong).getOrElse(0L)
        Versioned.vacuumOlderThan(spark, p, row.getLong(1), lease)
          .map(v => InternalRow(v)).toArray
      }),
    new Proc("clone_pins",
      "per-pin retention observability: which files of this table " +
        "are referenced by which shallow clone (lease_ms = 0, held " +
        "until release_clone) or reader snapshot pin (pin:<name>, " +
        "lease-bounded) since when — these files block vacuum reclaim",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("clone", StringType, nullable = false),
        StructField("file", StringType, nullable = false),
        StructField("since_ts_millis", LongType, nullable = false),
        StructField("lease_ms", LongType, nullable = false))),
      (cat, row) => {
        val p = tablePath(cat, row)
        Versioned.clonePins(spark, p).collect().map(r => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)),
          r.getLong(2), r.getLong(3)))
      }),
    new Proc("pin_snapshot",
      "pin a reader snapshot: register the files a resolve at the " +
        "given version reads so vacuum keeps those bytes while a " +
        "long-running query is in flight; lease-bounded (vacuum " +
        "auto-releases expired pins) — release early with " +
        "release_pin; returns the pinned file count",
      Seq(in("table", StringType), in("version", IntegerType),
        in("name", StringType), in("lease_ms", LongType)),
      StructType(Seq(StructField("files", IntegerType, nullable = false))),
      (cat, row) => {
        val p = tablePath(cat, row)
        Array(InternalRow(Versioned.pinSnapshot(spark, p,
          row.getInt(1), str(row, 2, "name"), row.getLong(3))))
      }),
    new Proc("release_pin",
      "release a reader snapshot pin taken by pin_snapshot; returns " +
        "the released file-reference count (0 = expired or never " +
        "taken)",
      Seq(in("table", StringType), in("name", StringType)),
      StructType(Seq(StructField("released", IntegerType,
        nullable = false))),
      (cat, row) => {
        val p = tablePath(cat, row)
        Array(InternalRow(
          Versioned.releasePin(spark, p, str(row, 1, "name"))))
      }),
    new Proc("restore",
      "restore the table to an old version as a NEW roll-forward " +
        "checkpoint commit (nothing deleted; all versions stay " +
        "travelable)",
      Seq(in("table", StringType), in("version", IntegerType)), versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        oneVersion(
          Versioned.restore(spark, p, keyOf(cat, p), row.getInt(1)))
      }),
    new Proc("restore_at",
      "restore to the newest version committed at or before the given " +
        "epoch-millis timestamp (the TIMESTAMP AS OF twin of restore) " +
        "— a roll-forward checkpoint commit, nothing deleted",
      Seq(in("table", StringType), in("ts_millis", LongType)), versionOut,
      (cat, row) => {
        val p = tablePath(cat, row)
        oneVersion(Versioned.restore(spark, p, keyOf(cat, p),
          Versioned.versionAt(spark, p, row.getLong(1))))
      }),
    new Proc("bloom_index",
      "build per-file key Bloom filters for point lookups; returns " +
        "the number of newly indexed version dirs",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("indexed_versions", IntegerType, nullable = false))),
      (cat, row) => {
        val p = tablePath(cat, row)
        Array(InternalRow(Versioned.bloomIndex(spark, p, keyOf(cat, p))))
      }),
    new Proc("detail",
      "DESCRIBE-DETAIL observability: one row per committed version " +
        "(commit time, checkpoint/merge/batch flags, operation class " +
        "derived from the commit's own markers, files, bytes, and the " +
        "dead-letter split stats when the commit carried a _CHECKS_ " +
        "marker)",
      Seq(in("table", StringType)),
      // must mirror Versioned.detail's schema — spec-pinned
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("commit_ts_millis", org.apache.spark.sql.types.LongType),
        StructField("is_checkpoint", org.apache.spark.sql.types.BooleanType,
          nullable = false),
        StructField("is_merge", org.apache.spark.sql.types.BooleanType,
          nullable = false),
        StructField("batch_id", StringType),
        StructField("operation", StringType, nullable = false),
        StructField("num_files", IntegerType, nullable = false),
        StructField("size_bytes", org.apache.spark.sql.types.LongType,
          nullable = false),
        StructField("exported_files", IntegerType, nullable = false),
        StructField("checks_clean", org.apache.spark.sql.types.LongType),
        StructField("checks_bad", org.apache.spark.sql.types.LongType))),
      (cat, row) => {
        val p = tablePath(cat, row)
        Versioned.detail(spark, p).queryExecution.executedPlan
          .executeCollect()
      }),
    new Proc("quarantine_stats",
      "dead-letter rate observability without reading the quarantine " +
        "table: one row per ingest version that carried a _CHECKS_ " +
        "stats marker (the quarantine INSERT face / streaming epoch " +
        "validation) — version, batch_id, clean_rows, bad_rows. Works " +
        "against the main OR the quarantine table; pure metadata",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("version", IntegerType, nullable = false),
        StructField("batch_id", StringType),
        StructField("clean_rows", org.apache.spark.sql.types.LongType),
        StructField("bad_rows", org.apache.spark.sql.types.LongType))),
      (cat, row) => {
        val p = tablePath(cat, row)
        Versioned.quarantineStats(spark, p).queryExecution.executedPlan
          .executeCollect()
      }))

  def load(cat: GraftCatalog, name: String): UnboundProcedure =
    procs.find(_.name == name).getOrElse(sys.error(
      s"graft catalog: no procedure 'system.$name' (available: " +
        procs.map(_.name).mkString(", ") + ")")).forCatalog(cat)

  def names: Seq[String] = procs.map(_.name)
}
