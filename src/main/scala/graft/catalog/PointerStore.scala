package graft.catalog

import java.sql.{Connection, DriverManager, SQLException, SQLIntegrityConstraintViolationException}

/** JDBC pointer store — the exact `iceberg_tables` contract of the
  * reference's Postgres catalog (reference: src/catalog/mod.rs:365-385; the
  * same DDL as Apache Iceberg's public JdbcCatalog). One row per table,
  * holding the current metadata-file pointer; commits move the pointer with
  * a guarded compare-and-swap UPDATE (reference: src/catalog/mod.rs:309-335).
  *
  * Differences from the reference, on purpose:
  *   - every statement is a PreparedStatement (the reference concatenates
  *     SQL strings, e.g. mod.rs:60-80 — an injection anti-pattern);
  *   - ANSI SQL + a tiny dialect shim so embedded Derby (tests) and
  *     Postgres (prod) both work: Derby has no `CREATE TABLE IF NOT EXISTS`
  *     or `ON CONFLICT DO NOTHING`, so bootstrap catches "already exists"
  *     and register catches duplicate-key — same 0/1-row semantics as the
  *     reference's ON CONFLICT insert (mod.rs:252-288);
  *   - a `graft_namespaces` side table backs explicit CREATE/DROP NAMESPACE
  *     (the reference keeps namespaces implicit in table rows only).
  *
  * All access is driver-side and serialized on the single connection —
  * executors never touch JDBC.
  */
// not `final`: crash-recovery tests subclass it to tear the JDBC call at
// exact points (apply-then-throw) — the only sanctioned way to exercise
// CasCommit.guardedCas's ambiguity resolution without a real network
class PointerStore(jdbcUrl: String, catalogName: String) extends AutoCloseable {

  // Not a val: Derby (and real JDBC drivers) close the connection when a
  // thread is INTERRUPTED mid-call — e.g. a streaming query's stop()
  // interrupts its micro-batch thread while a trigger's refresh() is inside
  // store.load(). One killed connection must not brick the catalog for
  // every other caller, so each entry point revalidates and reopens. The
  // failing call itself still throws (its thread is being torn down); the
  // NEXT caller heals.
  private var conn: Connection = DriverManager.getConnection(jdbcUrl)

  private def connection: Connection = {
    if (conn == null || conn.isClosed) conn = DriverManager.getConnection(jdbcUrl)
    conn
  }

  /** Idempotent bootstrap, the reference's `initialize` (mod.rs:362-391). */
  def initialize(): Unit = synchronized {
    createIfMissing(PointerStore.Sql.CreateIcebergTables)
    createIfMissing(PointerStore.Sql.CreateNamespacesTable)
    createIfMissing(PointerStore.Sql.CreateLeasesTable)
  }

  private def createIfMissing(ddl: String): Unit = {
    val st = connection.createStatement()
    try st.execute(ddl)
    catch {
      // Derby: X0Y32 "already exists"; Postgres: 42P07 duplicate_table.
      case e: SQLException if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" => ()
    } finally st.close()
  }

  /** reference list_tables (mod.rs:56-96). */
  def listTables(namespace: String): Seq[String] = synchronized {
    val ps = connection.prepareStatement(
      PointerStore.Sql.ListTables)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      val rs = ps.executeQuery()
      val b = Seq.newBuilder[String]
      while (rs.next()) b += rs.getString(1)
      b.result()
    } finally ps.close()
  }

  /** reference table_exists (mod.rs:107-136). */
  def tableExists(namespace: String, name: String): Boolean = synchronized {
    val ps = connection.prepareStatement(
      PointerStore.Sql.TableExists)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace); ps.setString(3, name)
      ps.executeQuery().next()
    } finally ps.close()
  }

  /** reference register_table (mod.rs:242-294): conditional INSERT; returns
    * false when the row already exists (the reference's 0-rows ⇒
    * "already exists" path, mod.rs:285-288).
    */
  def register(namespace: String, name: String, metadataLocation: String): Boolean = synchronized {
    val ps = connection.prepareStatement(
      PointerStore.Sql.Register)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      ps.setString(3, name); ps.setString(4, metadataLocation)
      ps.executeUpdate() == 1
    } catch {
      case _: SQLIntegrityConstraintViolationException => false
      case e: SQLException if e.getSQLState == "23505" => false // PG unique_violation
    } finally ps.close()
  }

  /** reference load_table's pointer lookup (mod.rs:180-235): exactly one row
    * or None — the >1 case is impossible under the PK, matching the
    * reference's invariant check (mod.rs:229-235).
    */
  def load(namespace: String, name: String): Option[String] = synchronized {
    val ps = connection.prepareStatement(
      PointerStore.Sql.Load)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace); ps.setString(3, name)
      val rs = ps.executeQuery()
      if (rs.next()) Option(rs.getString(1)) else None
    } finally ps.close()
  }

  /** The commit primitive — reference update_table (mod.rs:296-347), "the
    * single most important 52 lines in the reference": a guarded CAS UPDATE.
    * Returns the updated row count: 1 = committed, 0 = a concurrent commit
    * moved the pointer first (caller refreshes and retries or fails).
    */
  def casUpdate(namespace: String, name: String, newLocation: String,
      expectedLocation: String): Int = synchronized {
    val ps = connection.prepareStatement(
      PointerStore.Sql.CasUpdate)
    try {
      ps.setString(1, newLocation); ps.setString(2, expectedLocation)
      ps.setString(3, catalogName); ps.setString(4, namespace); ps.setString(5, name)
      ps.setString(6, expectedLocation)
      ps.executeUpdate()
    } finally ps.close()
  }

  /** reference drop_table (mod.rs:138-175): point DELETE, exactly-one check
    * surfaced as the boolean (0 rows = table didn't exist).
    */
  def drop(namespace: String, name: String): Boolean = synchronized {
    val ps = connection.prepareStatement(
      PointerStore.Sql.Drop)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace); ps.setString(3, name)
      ps.executeUpdate() == 1
    } finally ps.close()
  }

  /** Not in the reference (listed as a gap in SURVEY §2a): atomic rename.
    * ONE statement — the PK violation, not a check-then-act exists probe,
    * decides "target already exists", so two racing renames to the same
    * target can never both succeed.
    */
  def rename(fromNs: String, fromName: String, toNs: String, toName: String): PointerStore.RenameResult =
    synchronized {
      val ps = connection.prepareStatement(
        PointerStore.Sql.Rename)
      try {
        ps.setString(1, toNs); ps.setString(2, toName)
        ps.setString(3, catalogName); ps.setString(4, fromNs); ps.setString(5, fromName)
        if (ps.executeUpdate() == 1) PointerStore.Renamed else PointerStore.SourceMissing
      } catch {
        case _: SQLIntegrityConstraintViolationException => PointerStore.TargetExists
        case e: SQLException if e.getSQLState == "23505" => PointerStore.TargetExists
      } finally ps.close()
    }

  // ── namespace CRUD (SupportsNamespaces backing) ────────────────────────

  def createNamespace(namespace: String): Boolean = synchronized {
    val ps = connection.prepareStatement(
      PointerStore.Sql.CreateNamespace)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      ps.executeUpdate() == 1
    } catch {
      case _: SQLIntegrityConstraintViolationException => false
      case e: SQLException if e.getSQLState == "23505" => false
    } finally ps.close()
  }

  def dropNamespace(namespace: String): Boolean = synchronized {
    val ps = connection.prepareStatement(
      PointerStore.Sql.DropNamespace)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      ps.executeUpdate() == 1
    } finally ps.close()
  }

  /** Namespaces = explicitly created ∪ implied by existing tables (the
    * reference knows only the implied kind).
    */
  def listNamespaces(): Seq[String] = synchronized {
    val ps = connection.prepareStatement(
      PointerStore.Sql.ListNamespaces)
    try {
      ps.setString(1, catalogName); ps.setString(2, catalogName)
      val rs = ps.executeQuery()
      val b = Seq.newBuilder[String]
      while (rs.next()) b += rs.getString(1)
      b.result().sorted
    } finally ps.close()
  }

  def namespaceExists(namespace: String): Boolean =
    listNamespaces().contains(namespace)

  // ── torn-call resolution for rename + namespace CRUD (r11) ─────────────
  // The same ambiguity guardedCas resolves for the pointer CAS exists for
  // every other mutating statement: the JDBC call can throw with the
  // statement already applied server-side. Each resolver probes current
  // state to a DEFINITE outcome within the CasRetry budget. Pointer
  // locations are UUID-unique and never reused, which makes the rename
  // probe decisive: target pointing at the SOURCE's pre-call location can
  // only mean our rename landed.

  /** [[rename]] with torn-call resolution. Probe ladder on a thrown CAS:
    * target holds the source's old pointer → ours LANDED; target holds
    * anything else → a real conflict (TargetExists — a concurrent ALTER on
    * the just-renamed table inside the probe window, OR an ALTER on the
    * SOURCE between the srcLoc capture and the rename landing, would
    * misread as this, accepted: the failure mode in both windows is a
    * spurious already-exists error after a rename that actually applied,
    * never state corruption; a rename-intent journal row would close both
    * if spurious errors show up in practice); target absent + source
    * present → not applied,
    * re-issue (the PK guard makes the re-issue exactly-once); both absent
    * → the source went away some other way (SourceMissing).
    */
  def renameResolving(fromNs: String, fromName: String,
      toNs: String, toName: String): PointerStore.RenameResult = {
    val srcLoc = load(fromNs, fromName)
    val torn = try return rename(fromNs, fromName, toNs, toName)
    catch { case e: SQLException => e }
    var probes = 0
    while (probes < CasRetry.maxAttempts) {
      probes += 1
      try {
        load(toNs, toName) match {
          case Some(l) if srcLoc.contains(l) => return PointerStore.Renamed
          case Some(_) => return PointerStore.TargetExists
          case None => load(fromNs, fromName) match {
            case Some(_) => return rename(fromNs, fromName, toNs, toName)
            case None => return PointerStore.SourceMissing
          }
        }
      } catch { case _: SQLException => CasRetry.backoff(probes) }
    }
    throw new CommitStateUnknownException(
      s"rename $fromNs.$fromName -> $toNs.$toName: outcome unknown after $probes probes", torn)
  }

  /** [[createNamespace]] with torn-call resolution: if the namespace exists
    * when probed, the create is treated as SUCCEEDED — the torn INSERT may
    * well be the row we see, the post-state is identical either way, and
    * erroring "already exists" on one logical create would be wrong more
    * often than this is (documented optimistic resolution). Absent → the
    * INSERT never applied → re-issue (PK-guarded, exactly-once).
    */
  def createNamespaceResolving(namespace: String): Boolean = {
    val torn = try return createNamespace(namespace)
    catch { case e: SQLException => e }
    var probes = 0
    while (probes < CasRetry.maxAttempts) {
      probes += 1
      try {
        return if (namespaceExists(namespace)) true else createNamespace(namespace)
      } catch { case _: SQLException => CasRetry.backoff(probes) }
    }
    throw new CommitStateUnknownException(
      s"create namespace $namespace: outcome unknown after $probes probes", torn)
  }

  /** [[dropNamespace]] with torn-call resolution: gone when probed →
    * dropped (ours or equivalent), still there → the DELETE never applied,
    * re-issue.
    */
  def dropNamespaceResolving(namespace: String): Boolean = {
    // pre-capture: "gone when probed" only means OUR delete landed if it
    // existed at call start (callers have already emptied the namespace,
    // so the implied-by-tables arm of listNamespaces is quiet here)
    val existedBefore = listNamespaces().contains(namespace)
    val torn = try return dropNamespace(namespace)
    catch { case e: SQLException => e }
    var probes = 0
    while (probes < CasRetry.maxAttempts) {
      probes += 1
      try {
        return if (!listNamespaces().contains(namespace)) existedBefore
        else dropNamespace(namespace)
      } catch { case _: SQLException => CasRetry.backoff(probes) }
    }
    throw new CommitStateUnknownException(
      s"drop namespace $namespace: outcome unknown after $probes probes", torn)
  }

  // ── starvation-escape commit lease (r11; advisory, see CasCommit) ──────
  // The optimistic CAS livelocks once a writer's rebase cycle (reload +
  // metadata rewrite + CAS) exceeds the mean gap between competitors'
  // commits — measured by CommitContentionBench: at 8 sustained writers,
  // commits exhausted all 32 retry attempts. The escape is a TTL'd lease
  // row a starving writer claims; OTHER LOSING writers yield while it is
  // held (winners on their first attempt never look, so the uncontended
  // fast path pays nothing). The lease is ADVISORY — it is never required
  // for the CAS, so every correctness property of the pure-CAS protocol is
  // untouched, and all three methods degrade to a no-op on SQLException
  // (e.g. a store bootstrapped before the lease table existed).

  /** Claim the table's commit lease: fresh INSERT, else steal one whose
    * `acquired_at_ms` is older than the TTL (crashed holder). True = ours.
    */
  def tryAcquireLease(namespace: String, name: String, holder: String,
      nowMs: Long, ttlMs: Long): Boolean = synchronized {
    val ins = connection.prepareStatement(PointerStore.Sql.LeaseInsert)
    try {
      ins.setString(1, catalogName); ins.setString(2, namespace); ins.setString(3, name)
      ins.setString(4, holder); ins.setLong(5, nowMs)
      if (ins.executeUpdate() == 1) return true
    } catch {
      case _: SQLIntegrityConstraintViolationException => ()
      case e: SQLException if e.getSQLState == "23505" => ()
    } finally ins.close()
    val upd = connection.prepareStatement(PointerStore.Sql.LeaseSteal)
    try {
      upd.setString(1, holder); upd.setLong(2, nowMs)
      upd.setString(3, catalogName); upd.setString(4, namespace); upd.setString(5, name)
      upd.setLong(6, nowMs - ttlMs)
      upd.executeUpdate() == 1
    } finally upd.close()
  }

  /** The current UNEXPIRED lease holder, if any. */
  def peekLease(namespace: String, name: String,
      nowMs: Long, ttlMs: Long): Option[String] = synchronized {
    val ps = connection.prepareStatement(PointerStore.Sql.LeasePeek)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace); ps.setString(3, name)
      val rs = ps.executeQuery()
      if (rs.next() && rs.getLong(2) >= nowMs - ttlMs) Some(rs.getString(1)) else None
    } finally ps.close()
  }

  /** Release — guarded by holder id, so a stolen lease is never deleted by
    * the crashed original when it comes back.
    */
  def releaseLease(namespace: String, name: String, holder: String): Unit = synchronized {
    val ps = connection.prepareStatement(PointerStore.Sql.LeaseRelease)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace); ps.setString(3, name)
      ps.setString(4, holder)
      ps.executeUpdate()
    } finally ps.close()
  }

  override def close(): Unit = synchronized { if (conn != null) conn.close() }
}

object PointerStore {
  /** Outcome of the single-statement atomic rename. */
  sealed trait RenameResult
  case object Renamed extends RenameResult
  case object SourceMissing extends RenameResult
  case object TargetExists extends RenameResult

  /** EVERY SQL string this store ever sends, as named constants — the
    * catalog's complete wire contract (reference: src/catalog/mod.rs §2a).
    * Frozen verbatim in `src/test/resources/pointer_store_sql.golden` and
    * grammar-linted for Postgres compatibility by `PointerStoreGoldenSpec`,
    * so the Derby-only test environment cannot silently drift from the
    * "Postgres in prod" contract. Change a statement ⇒ change the golden
    * file in the same commit, consciously.
    */
  object Sql {
    val CreateIcebergTables: String =
      """CREATE TABLE iceberg_tables (
        |  catalog_name VARCHAR(255) NOT NULL,
        |  table_namespace VARCHAR(255) NOT NULL,
        |  table_name VARCHAR(255) NOT NULL,
        |  metadata_location VARCHAR(5500),
        |  previous_metadata_location VARCHAR(5500),
        |  PRIMARY KEY (catalog_name, table_namespace, table_name)
        |)""".stripMargin
    val CreateNamespacesTable: String =
      """CREATE TABLE graft_namespaces (
        |  catalog_name VARCHAR(255) NOT NULL,
        |  namespace VARCHAR(255) NOT NULL,
        |  PRIMARY KEY (catalog_name, namespace)
        |)""".stripMargin
    val ListTables: String =
      "SELECT table_name FROM iceberg_tables WHERE catalog_name = ? AND table_namespace = ?"
    val TableExists: String =
      "SELECT 1 FROM iceberg_tables WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?"
    val Register: String =
      """INSERT INTO iceberg_tables
        |  (catalog_name, table_namespace, table_name, metadata_location, previous_metadata_location)
        |  VALUES (?, ?, ?, ?, NULL)""".stripMargin
    val Load: String =
      "SELECT metadata_location FROM iceberg_tables WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?"
    val CasUpdate: String =
      """UPDATE iceberg_tables
        |  SET metadata_location = ?, previous_metadata_location = ?
        |  WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?
        |    AND metadata_location = ?""".stripMargin
    val Drop: String =
      "DELETE FROM iceberg_tables WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?"
    val Rename: String =
      """UPDATE iceberg_tables SET table_namespace = ?, table_name = ?
        |  WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""".stripMargin
    val CreateNamespace: String =
      "INSERT INTO graft_namespaces (catalog_name, namespace) VALUES (?, ?)"
    val DropNamespace: String =
      "DELETE FROM graft_namespaces WHERE catalog_name = ? AND namespace = ?"
    val ListNamespaces: String =
      """SELECT namespace FROM graft_namespaces WHERE catalog_name = ?
        |UNION
        |SELECT table_namespace FROM iceberg_tables WHERE catalog_name = ?""".stripMargin
    // advisory starvation-escape lease (r11) — BIGINT is deliberate: ANSI,
    // identical semantics in Derby and Postgres, needed for the numeric
    // TTL-expiry guard in lease_steal
    val CreateLeasesTable: String =
      """CREATE TABLE graft_commit_leases (
        |  catalog_name VARCHAR(255) NOT NULL,
        |  table_namespace VARCHAR(255) NOT NULL,
        |  table_name VARCHAR(255) NOT NULL,
        |  holder VARCHAR(255) NOT NULL,
        |  acquired_at_ms BIGINT NOT NULL,
        |  PRIMARY KEY (catalog_name, table_namespace, table_name)
        |)""".stripMargin
    val LeaseInsert: String =
      """INSERT INTO graft_commit_leases
        |  (catalog_name, table_namespace, table_name, holder, acquired_at_ms)
        |  VALUES (?, ?, ?, ?, ?)""".stripMargin
    val LeaseSteal: String =
      """UPDATE graft_commit_leases SET holder = ?, acquired_at_ms = ?
        |  WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?
        |    AND acquired_at_ms < ?""".stripMargin
    val LeasePeek: String =
      """SELECT holder, acquired_at_ms FROM graft_commit_leases
        |  WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""".stripMargin
    val LeaseRelease: String =
      """DELETE FROM graft_commit_leases
        |  WHERE catalog_name = ? AND table_namespace = ? AND table_name = ? AND holder = ?""".stripMargin

    /** Name → statement, the golden file's iteration order. */
    val All: Seq[(String, String)] = Seq(
      "create_iceberg_tables" -> CreateIcebergTables,
      "create_namespaces_table" -> CreateNamespacesTable,
      "list_tables" -> ListTables,
      "table_exists" -> TableExists,
      "register" -> Register,
      "load" -> Load,
      "cas_update" -> CasUpdate,
      "drop" -> Drop,
      "rename" -> Rename,
      "create_namespace" -> CreateNamespace,
      "drop_namespace" -> DropNamespace,
      "list_namespaces" -> ListNamespaces,
      "create_leases_table" -> CreateLeasesTable,
      "lease_insert" -> LeaseInsert,
      "lease_steal" -> LeaseSteal,
      "lease_peek" -> LeasePeek,
      "lease_release" -> LeaseRelease)
  }
}
