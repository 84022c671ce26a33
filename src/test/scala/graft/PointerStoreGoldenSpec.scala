package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.PointerStore

/** Freezes the catalog's complete JDBC wire contract (VERDICT r8 #6).
  *
  * The test environment only ever runs the store against embedded Derby,
  * but the production north star is Postgres (the reference IS a Postgres
  * catalog, src/catalog/mod.rs). Two guards keep the dialect honest:
  *
  *  1. GOLDEN TEXT — every statement [[PointerStore.Sql]] can emit is
  *     frozen verbatim in `src/test/resources/pointer_store_sql.golden`.
  *     Editing a statement without consciously updating the golden file
  *     fails here, with a diff.
  *  2. GRAMMAR LINT — each statement must stay inside the ANSI subset
  *     that Derby AND Postgres both parse: no backticks or bracketed
  *     identifiers, no `ON CONFLICT` / `ON DUPLICATE KEY` (the 0/1-row
  *     + SQLState dance replaces it on purpose), no `IF NOT EXISTS`
  *     (Derby lacks it), no LIMIT/FETCH, only VARCHAR types, only `?`
  *     placeholders, only the two catalog tables.
  *
  * Parameter counts are also pinned per statement — they are the shape of
  * the reference's six-statement contract (mod.rs:56-347).
  */
class PointerStoreGoldenSpec extends AnyFunSuite {

  private def render(d: PointerStore.Dialect): String =
    d.All.map { case (name, sql) =>
      s"-- statement: $name\n$sql\n"
    }.mkString("\n")

  private def assertGolden(d: PointerStore.Dialect, resource: String): Unit = {
    val actual = render(d)
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"src/test/resources/$resource"),
        actual.getBytes("UTF-8"))
      fail(s"regenerated $resource — rerun without GRAFT_REGEN_GOLDEN")
    }
    val in = getClass.getClassLoader.getResourceAsStream(resource)
    assert(in != null, s"missing src/test/resources/$resource")
    val golden = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(actual == golden,
      s"PointerStore SQL drifted from the golden contract ($resource).\n--- actual ---\n$actual\n--- golden ---\n$golden")
  }

  test("golden: the emitted ANSI SQL text is frozen, byte for byte") {
    assertGolden(PointerStore.Sql, "pointer_store_sql.golden")
  }

  test("golden: the native-Postgres SQL text is frozen, byte for byte (r12)") {
    assertGolden(PointerStore.PgSql, "pointer_store_sql_pg.golden")
  }

  test("pg dialect: differs from ANSI in EXACTLY the native-primitive statements") {
    val ansi = PointerStore.Sql.All.toMap
    val pg = PointerStore.PgSql.All.toMap
    val diff = ansi.keySet.filter(k => ansi(k) != pg(k))
    assert(diff == Set("create_iceberg_tables", "create_namespaces_table",
      "create_leases_table", "create_views_table", "register",
      "create_namespace", "lease_insert", "view_register"),
      s"unexpected dialect divergence: $diff")
    // the divergences are exactly IF NOT EXISTS / ON CONFLICT DO NOTHING
    for (k <- diff) {
      val stripped = pg(k)
        .replace("CREATE TABLE IF NOT EXISTS", "CREATE TABLE")
        .replace(" ON CONFLICT DO NOTHING", "")
      assert(stripped == ansi(k),
        s"$k: the PG statement must be the ANSI one plus a native primitive:\n${pg(k)}")
    }
    // and the CAS — the contract's heart — is byte-identical
    assert(ansi("cas_update") == pg("cas_update"))
  }

  test("pg grammar: no Derby-isms, still single-statement, still ?-placeholders only") {
    val forbidden = Seq("`", "[", "]", "\"", "ON DUPLICATE", "RETURNING",
      "LIMIT", "OFFSET", "FETCH FIRST", "SERIAL", "AUTO_INCREMENT",
      "IDENTITY", "ILIKE", "::", "NOW()", "CURRENT_TIMESTAMP", ";")
    for ((name, sql) <- PointerStore.PgSql.All; bad <- forbidden)
      assert(!sql.toUpperCase.contains(bad.toUpperCase),
        s"$name contains dialect-unsafe token '$bad':\n$sql")
    for ((name, sql) <- PointerStore.PgSql.All)
      assert(sql.matches("(?s)^(SELECT|INSERT INTO|UPDATE|DELETE FROM|CREATE TABLE)\\b.*"),
        s"$name does not start with an allowed verb:\n$sql")
  }

  test("grammar: every statement stays inside the Derby∩Postgres ANSI subset") {
    val forbidden = Seq(
      "`", "[", "]", // MySQL / T-SQL identifier quoting
      "\"", // no quoted identifiers at all — case-folding differs per engine
      "ON CONFLICT", "ON DUPLICATE", // PG / MySQL upsert (replaced by SQLState dance)
      "IF NOT EXISTS", "IF EXISTS", // Derby lacks them
      "RETURNING", // PG-only
      "LIMIT", "OFFSET", "FETCH FIRST", // unneeded; dialect-divergent
      "SERIAL", "AUTO_INCREMENT", "IDENTITY", // no generated keys in the contract
      "ILIKE", "::", "NOW()", "CURRENT_TIMESTAMP", // PG-isms / nondeterminism
      ";") // one statement per prepare — no batching, no injection surface
    for ((name, sql) <- PointerStore.Sql.All; bad <- forbidden)
      assert(!sql.toUpperCase.contains(bad.toUpperCase),
        s"$name contains dialect-unsafe token '$bad':\n$sql")
    // verbs: nothing but the five shapes the contract needs
    for ((name, sql) <- PointerStore.Sql.All)
      assert(sql.matches("(?s)^(SELECT|INSERT INTO|UPDATE|DELETE FROM|CREATE TABLE)\\b.*"),
        s"$name does not start with an allowed verb:\n$sql")
    // identifiers: only the two catalog tables are ever referenced
    for ((name, sql) <- PointerStore.Sql.All) {
      val tables = "(?i)(?:FROM|INTO|UPDATE|TABLE)\\s+([a-z_]+)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      assert(tables.subsetOf(Set("iceberg_tables", "graft_namespaces",
        "graft_commit_leases", "iceberg_views")),
        s"$name touches unexpected tables $tables:\n$sql")
    }
    // types: VARCHAR plus BIGINT (r11, the lease expiry stamp) — both are
    // ANSI with identical Derby/Postgres semantics
    for ((name, sql) <- PointerStore.Sql.All if sql.startsWith("CREATE TABLE")) {
      val colTypes = "(?m)^\\s{2}[a-z_]+\\s+([A-Z]+)".r
        .findAllMatchIn(sql).map(_.group(1)).toSet
      assert(colTypes.subsetOf(Set("VARCHAR", "BIGINT")),
        s"$name uses types outside the VARCHAR/BIGINT contract: $colTypes")
    }
  }

  test("shape: placeholder counts pin the reference's statement contract") {
    val expected = Map(
      "create_iceberg_tables" -> 0, "create_namespaces_table" -> 0,
      "list_tables" -> 2, // mod.rs:56-96
      "table_exists" -> 3, // mod.rs:107-136
      "register" -> 4, // mod.rs:242-294
      "load" -> 3, // mod.rs:177-236
      "cas_update" -> 6, // mod.rs:296-347 — the CAS guard re-binds expected
      "drop" -> 3, // mod.rs:138-175
      "rename" -> 5,
      "create_namespace" -> 2, "drop_namespace" -> 2, "list_namespaces" -> 2,
      // r11 starvation-escape lease (advisory; see CasCommit.retryLoop)
      "create_leases_table" -> 0, "lease_insert" -> 5, "lease_steal" -> 6,
      "lease_peek" -> 3, "lease_release" -> 4,
      // r12 V2 views — the table pointer contract, verbatim, on iceberg_views
      "create_views_table" -> 0, "view_list" -> 2, "view_load" -> 3,
      "view_register" -> 4, "view_cas_update" -> 6, "view_drop" -> 3,
      "view_rename" -> 5)
    val actual = PointerStore.Sql.All.map { case (n, s) => n -> s.count(_ == '?') }.toMap
    assert(actual == expected, s"placeholder drift: $actual")
    assert(PointerStore.Sql.All.map(_._1).toSet == expected.keySet)
  }

  test("cas guard: the WHERE clause binds the expected pointer (the CAS), not just the PK") {
    // the single most important property of the whole store — if someone
    // "simplifies" the UPDATE to a PK-only WHERE, commits stop being CAS
    // and concurrent writers silently clobber each other (mod.rs:309-335)
    val where = PointerStore.Sql.CasUpdate.toUpperCase
      .split("WHERE").last
    assert(where.contains("METADATA_LOCATION = ?"),
      "cas_update lost its compare-and-swap guard")
    // and the guard column is the same one SET moves — pointer semantics
    assert(PointerStore.Sql.CasUpdate.toUpperCase.split("WHERE").head
      .contains("SET METADATA_LOCATION = ?"))
  }
}
