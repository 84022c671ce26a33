package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Store-level tests: the reference's single E2E lifecycle test
  * (reference: src/catalog/mod.rs:397-480) ported 1:1, plus the paths the
  * reference never covers — CAS conflict, register conflict, two-writer
  * race (SURVEY §5 test plan).
  */
class PointerStoreSpec extends AnyFunSuite {

  private def freshStore(tag: String) = {
    val s = new PointerStore(
      s"jdbc:derby:memory:ps_${tag}_${System.nanoTime()};create=true", "test_cat")
    s.initialize()
    s
  }

  test("reference E2E lifecycle: create -> exists -> commit moves pointer -> drop -> !exists") {
    val store = freshStore("life")
    // create_table = write metadata + register pointer (mod.rs:98-105)
    assert(!store.tableExists("test", "table1"))
    assert(store.register("test", "table1", "/wh/test/table1/metadata/v0.json"))
    assert(store.tableExists("test", "table1")) // mod.rs:458-462
    val loc0 = store.load("test", "table1").get
    // transaction commit = CAS pointer swap (mod.rs:464-471)
    assert(store.casUpdate("test", "table1", "/wh/test/table1/metadata/v1.json", loc0) == 1)
    val loc1 = store.load("test", "table1").get
    assert(loc1 != loc0, "metadata pointer must move on commit")
    // drop -> exists flips (mod.rs:473-478)
    assert(store.drop("test", "table1"))
    assert(!store.tableExists("test", "table1"))
  }

  test("initialize is idempotent (reference mod.rs:362-391)") {
    val s = freshStore("idem")
    s.initialize(); s.initialize() // no throw
  }

  test("register conflict: second insert reports already-exists (mod.rs:285-288)") {
    val store = freshStore("conflict")
    assert(store.register("ns", "t", "/a.json"))
    assert(!store.register("ns", "t", "/b.json"))
    assert(store.load("ns", "t").contains("/a.json"), "loser must not clobber the pointer")
  }

  test("CAS conflict: stale expected pointer updates 0 rows (mod.rs:342-343)") {
    val store = freshStore("cas")
    store.register("ns", "t", "/v0.json")
    assert(store.casUpdate("ns", "t", "/v1.json", "/v0.json") == 1)
    // a second committer still holding /v0.json as its base must lose
    assert(store.casUpdate("ns", "t", "/v2.json", "/v0.json") == 0)
    assert(store.load("ns", "t").contains("/v1.json"))
  }

  test("two-writer race: exactly one CAS wins") {
    val store = freshStore("race")
    store.register("ns", "t", "/v0.json")
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = Await.result(
      Future.sequence((1 to 8).map(i => Future(
        store.casUpdate("ns", "t", s"/v$i.json", "/v0.json")))),
      30.seconds).toList
    pool.shutdown()
    assert(results.count(_ == 1) == 1, s"exactly one writer must win, got $results")
    assert(results.count(_ == 0) == 7)
  }

  test("a killed JDBC connection heals: the next call reopens, state intact") {
    // Derby closes the connection when a thread is interrupted mid-call
    // (e.g. a streaming query's stop() lands inside a trigger's
    // store.load()). One dead connection must not brick the catalog.
    val store = freshStore("heal")
    assert(store.register("ns", "t", "/a.json"))
    store.close() // simulate the interrupt-killed connection
    assert(store.load("ns", "t").contains("/a.json"),
      "operations after connection loss reconnect and see the same database")
    assert(store.casUpdate("ns", "t", "/b.json", "/a.json") == 1)
  }

  test("drop of nonexistent table reports false (exactly-one check, mod.rs:163-174)") {
    val store = freshStore("dropmiss")
    assert(!store.drop("ns", "missing"))
  }

  test("two racing renames to one target: the PK guard lets exactly one win") {
    val store = freshStore("rnrace")
    store.register("rn", "a", "/a.json")
    store.register("rn", "b", "/b.json")
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = Await.result(Future.sequence(Seq("a", "b").map(n =>
      Future(store.rename("rn", n, "rn", "c")))), 30.seconds)
    pool.shutdown()
    assert(results.count(_ == PointerStore.Renamed) == 1,
      s"exactly one rename must win, got $results")
    assert(results.count(_ == PointerStore.TargetExists) == 1)
    assert(store.tableExists("rn", "c"))
    // the loser's source row must be untouched
    assert(store.listTables("rn").size == 2)
  }

  test("rename of a missing source reports SourceMissing, not a silent no-op") {
    val store = freshStore("rnmiss")
    assert(store.rename("rn", "ghost", "rn", "t") == PointerStore.SourceMissing)
  }

  test("list_tables filters by namespace (mod.rs:56-96)") {
    val store = freshStore("list")
    store.register("a", "t1", "/1.json")
    store.register("a", "t2", "/2.json")
    store.register("b", "t3", "/3.json")
    assert(store.listTables("a").sorted == Seq("t1", "t2"))
    assert(store.listTables("b") == Seq("t3"))
    assert(store.listTables("c").isEmpty)
  }

  test("namespaces: explicit + implied from tables") {
    val store = freshStore("nsops")
    assert(store.createNamespace("explicit"))
    assert(!store.createNamespace("explicit"))
    store.register("implied", "t", "/1.json")
    assert(store.listNamespaces() == Seq("explicit", "implied"))
    assert(store.namespaceExists("implied"))
  }
}

/** SQL-surface tests through the registered `lake` catalog: DDL, writes via
  * CAS commit, reads via the metadata-driven scan, time travel.
  */
class LakeCatalogSpec extends AnyFunSuite {
  import TestSpark._

  test("a commit from a SECOND catalog instance is visible through the first's cache") {
    // regression (r7): loadTable cached the handle forever, so a commit
    // from any other catalog INSTANCE (second app on the same store, or
    // the cloned session foreachBatch runs under) was never seen. The
    // cache now re-checks the store pointer per hit (the reference's own
    // load_table round-trip, mod.rs:209-220).
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.vis")
    spark.sql("DROP TABLE IF EXISTS lake.vis.t")
    spark.sql("CREATE TABLE lake.vis.t (id BIGINT)")
    spark.sql("INSERT INTO lake.vis.t VALUES (1)")
    assert(spark.table("lake.vis.t").count() == 1) // cache the handle
    // an independent catalog instance over the same store + warehouse
    val other = new LakeCatalog()
    other.initialize("lake", new CaseInsensitiveStringMap(java.util.Map.of(
      "warehouse", graft.Sessions.defaultWarehouse,
      "jdbc.url", graft.Sessions.defaultJdbcUrl)))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("vis"), "t")
    val t2 = other.loadTable(ident).asInstanceOf[LakeTable]
    val next = TableMeta.withAppend(t2.meta, "append",
      Nil, spark.sessionState.newHadoopConf()) // metadata-only commit
    val loc = TableMeta.write(next, spark.sessionState.newHadoopConf())
    assert(other.pointerStore.casUpdate("vis", "t", loc, t2.metadataLocation) == 1)
    // the FIRST catalog must serve the new snapshot immediately
    assert(spark.table("lake.vis.t").count() == 1) // re-resolution, same rows
    val resolved = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(ident).asInstanceOf[LakeTable]
    assert(resolved.metadataLocation == loc,
      "session catalog must see the other instance's commit on next resolution")
  }

  test("CREATE TABLE / SHOW TABLES / DROP TABLE through SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ddl")
    spark.sql("DROP TABLE IF EXISTS lake.ddl.t1")
    spark.sql("CREATE TABLE lake.ddl.t1 (id BIGINT, name STRING)")
    val tables = spark.sql("SHOW TABLES IN lake.ddl").collect().map(_.getString(1))
    assert(tables.contains("t1"))
    intercept[Exception](spark.sql("CREATE TABLE lake.ddl.t1 (id BIGINT)"))
    spark.sql("DROP TABLE lake.ddl.t1")
    assert(!spark.sql("SHOW TABLES IN lake.ddl").collect().map(_.getString(1)).contains("t1"))
  }

  test("INSERT INTO appends; snapshots accumulate; VERSION AS OF time-travels") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.tt")
    spark.sql("DROP TABLE IF EXISTS lake.tt.snap")
    spark.sql("CREATE TABLE lake.tt.snap (k INT, v STRING)")
    spark.sql("INSERT INTO lake.tt.snap VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO lake.tt.snap VALUES (3, 'c')")
    assert(spark.table("lake.tt.snap").count() == 3)
    // snapshot 1 = first append only
    assert(spark.sql("SELECT * FROM lake.tt.snap VERSION AS OF 1").count() == 2)
    val v1 = spark.sql("SELECT k FROM lake.tt.snap VERSION AS OF 1")
      .collect().map(_.getInt(0)).sorted
    assert(v1.sameElements(Array(1, 2)))
  }

  test("INSERT OVERWRITE replaces contents (truncate capability)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ow")
    spark.sql("DROP TABLE IF EXISTS lake.ow.t")
    spark.sql("CREATE TABLE lake.ow.t (k INT)")
    spark.sql("INSERT INTO lake.ow.t VALUES (1), (2)")
    spark.sql("INSERT OVERWRITE lake.ow.t VALUES (9)")
    assert(spark.table("lake.ow.t").collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("TRUNCATE TABLE empties the table in one commit; history survives") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ow")
    spark.sql("DROP TABLE IF EXISTS lake.ow.tr")
    spark.sql("CREATE TABLE lake.ow.tr (k INT)")
    spark.sql("INSERT INTO lake.ow.tr VALUES (1), (2), (3)")
    spark.sql("TRUNCATE TABLE lake.ow.tr")
    assert(spark.table("lake.ow.tr").count() == 0)
    // pre-truncate snapshot still answers via time travel
    assert(spark.sql("SELECT * FROM lake.ow.tr VERSION AS OF 1").count() == 3)
    spark.sql("INSERT INTO lake.ow.tr VALUES (7)")
    assert(spark.table("lake.ow.tr").collect().map(_.getInt(0)).toSeq == Seq(7))
  }

  test("CTAS from testdata parquet round-trips values exactly") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ctas")
    spark.sql("DROP TABLE IF EXISTS lake.ctas.nation2")
    val src = spark.read.parquet(s"$sf/nation.parquet")
    src.createOrReplaceTempView("nation_src")
    spark.sql("CREATE TABLE lake.ctas.nation2 AS SELECT * FROM nation_src")
    val back = spark.table("lake.ctas.nation2")
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("file pruning: per-append min/max stats prune non-matching files from the scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.prune")
    spark.sql("DROP TABLE IF EXISTS lake.prune.m")
    spark.sql("CREATE TABLE lake.prune.m (k INT, v STRING)")
    spark.sql("INSERT INTO lake.prune.m SELECT id AS k, 'lo' AS v FROM range(0, 100)")
    spark.sql("INSERT INTO lake.prune.m SELECT id AS k, 'hi' AS v FROM range(1000, 1100)")
    val plan = spark.sql("SELECT * FROM lake.prune.m WHERE k > 5000")
      .queryExecution.executedPlan.toString
    // both files pruned by metadata min/max -> scan over zero parquet files
    assert(spark.sql("SELECT * FROM lake.prune.m WHERE k > 5000").count() == 0)
    val one = spark.sql("SELECT count(*) FROM lake.prune.m WHERE k >= 1000")
      .collect().head.getLong(0)
    assert(one == 100)
    assert(spark.table("lake.prune.m").count() == 200)
  }

  test("concurrent INSERTs both land (commit retry rebases the loser)") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.cc")
    spark.sql("DROP TABLE IF EXISTS lake.cc.t")
    spark.sql("CREATE TABLE lake.cc.t (k INT)")
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    Await.result(Future.sequence((1 to 4).map(i =>
      Future(spark.sql(s"INSERT INTO lake.cc.t VALUES ($i)")))), 120.seconds)
    pool.shutdown()
    assert(spark.table("lake.cc.t").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("CTAS is atomic: a failing query leaves NO table and no files behind") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stg")
    spark.sql("DROP TABLE IF EXISTS lake.stg.boom")
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE lake.stg.boom AS
          |SELECT raise_error('mid-write failure') AS x FROM range(10)""".stripMargin)
    }
    assert(!spark.catalog.tableExists("lake.stg.boom"),
      "failed CTAS must not register the table (staged commit never ran)")
  }

  test("REPLACE TABLE AS SELECT swaps contents atomically via the CAS") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stg")
    spark.sql("DROP TABLE IF EXISTS lake.stg.r")
    spark.sql("CREATE TABLE lake.stg.r AS SELECT id FROM range(5)")
    assert(spark.table("lake.stg.r").count() == 5)
    spark.sql("REPLACE TABLE lake.stg.r AS SELECT id * 10 AS id FROM range(3)")
    val vals = spark.table("lake.stg.r").collect().map(_.getLong(0)).sorted.toSeq
    assert(vals == Seq(0L, 10L, 20L))
    // replace of a nonexistent table must fail (stageReplace contract)...
    spark.sql("DROP TABLE lake.stg.r")
    intercept[Exception] { spark.sql("REPLACE TABLE lake.stg.r AS SELECT 1 AS k") }
    // ...while CREATE OR REPLACE lands either way
    spark.sql("CREATE OR REPLACE TABLE lake.stg.r AS SELECT 7 AS k")
    assert(spark.table("lake.stg.r").collect().head.getInt(0) == 7)
    spark.sql("CREATE OR REPLACE TABLE lake.stg.r AS SELECT 8 AS k")
    assert(spark.table("lake.stg.r").collect().head.getInt(0) == 8)
  }

  test("PARTITIONED BY clusters writes so partition filters prune to exact files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.pt")
    spark.sql("DROP TABLE IF EXISTS lake.pt.sales")
    spark.sql("CREATE TABLE lake.pt.sales (region INT, amount BIGINT) PARTITIONED BY (region)")
    // one INSERT spanning 4 partition values: the required clustering must
    // split them into per-region files
    spark.sql(
      """INSERT INTO lake.pt.sales
        |SELECT CAST(id % 4 AS INT) AS region, id AS amount FROM range(1000)""".stripMargin)
    val all = spark.table("lake.pt.sales")
    assert(all.count() == 1000)
    // a partition-filtered scan must read ONLY files whose min==max==2
    val one = spark.sql("SELECT * FROM lake.pt.sales WHERE region = 2")
    assert(one.count() == 250)
    val scanned = one.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    val allFiles = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("pt"), "sales"))
      .asInstanceOf[graft.catalog.LakeTable].meta.currentFiles
    assert(allFiles.size >= 4, s"clustered write should emit >=1 file per region, got ${allFiles.size}")
    val matching = allFiles.filter(f =>
      f.minValues.get("region").contains("2") && f.maxValues.get("region").contains("2"))
    assert(matching.nonEmpty, "region=2 rows must sit in files with min==max==2")
    // the physical scan's file list excludes non-matching partitions
    val nonMatching = allFiles.filterNot(matching.contains)
    nonMatching.foreach(f =>
      assert(!scanned.contains(new java.io.File(f.path).getName),
        s"file ${f.path} (regions ${f.minValues.get("region")}-${f.maxValues.get("region")}) should be pruned"))
  }

  test("DELETE FROM rewrites only affected files (copy-on-write), atomic via CAS") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.del")
    spark.sql("DROP TABLE IF EXISTS lake.del.t")
    spark.sql("CREATE TABLE lake.del.t (k BIGINT, v BIGINT)")
    // two appends -> two files with disjoint k ranges (min/max prunable)
    spark.sql("INSERT INTO lake.del.t SELECT id AS k, id * 2 AS v FROM range(0, 100)")
    spark.sql("INSERT INTO lake.del.t SELECT id AS k, id * 2 AS v FROM range(1000, 1100)")
    def files = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("del"), "t"))
      .asInstanceOf[graft.catalog.LakeTable].meta.currentFiles
    val before = files
    // every file whose k-range cannot intersect k < 50 must survive untouched
    val untouched = before.filter(f => BigDecimal(f.minValues("k")) >= 50)
    assert(untouched.nonEmpty && untouched.size < before.size)
    spark.sql("DELETE FROM lake.del.t WHERE k < 50")
    assert(spark.table("lake.del.t").count() == 150)
    assert(spark.sql("SELECT min(k) FROM lake.del.t").collect().head.getLong(0) == 50)
    val after = files
    untouched.foreach(f => assert(after.contains(f),
      s"file ${f.path} (k ${f.minValues("k")}..${f.maxValues("k")}) should survive byte-identical"))
    // deleting nothing is a no-op rewrite of zero files
    spark.sql("DELETE FROM lake.del.t WHERE k = 999999")
    assert(spark.table("lake.del.t").count() == 150)
    // unconditional delete empties the table
    spark.sql("DELETE FROM lake.del.t")
    assert(spark.table("lake.del.t").count() == 0)
  }

  test("schema evolution: ADD COLUMNS backfills null, DROP COLUMN hides old data") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev")
    spark.sql("DROP TABLE IF EXISTS lake.ev.t")
    spark.sql("CREATE TABLE lake.ev.t (k BIGINT)")
    spark.sql("INSERT INTO lake.ev.t VALUES (1)")
    spark.sql("ALTER TABLE lake.ev.t ADD COLUMNS (tag STRING)")
    spark.sql("INSERT INTO lake.ev.t VALUES (2, 'new')")
    val rows = spark.table("lake.ev.t").orderBy("k").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(1), "pre-evolution rows surface NULL for the added column")
    assert(rows(1).getString(1) == "new")
    spark.sql("ALTER TABLE lake.ev.t DROP COLUMN tag")
    assert(spark.table("lake.ev.t").columns.toSeq == Seq("k"))
    assert(spark.table("lake.ev.t").count() == 2)
  }

  test("DROP COLUMN then ADD COLUMNS of the same name must NOT resurrect old values") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev")
    spark.sql("DROP TABLE IF EXISTS lake.ev.fid")
    spark.sql("CREATE TABLE lake.ev.fid (k BIGINT, tag STRING)")
    spark.sql("INSERT INTO lake.ev.fid VALUES (1, 'secret-old-value')")
    spark.sql("ALTER TABLE lake.ev.fid DROP COLUMN tag")
    spark.sql("ALTER TABLE lake.ev.fid ADD COLUMNS (tag STRING)")
    // the old file still physically carries 'secret-old-value'; the NEW
    // logical tag column maps to a fresh physical name, so it must read NULL
    val r1 = spark.table("lake.ev.fid").collect()
    assert(r1.length == 1 && r1(0).isNullAt(1),
      s"re-added column must read NULL for pre-drop rows, got ${r1.toSeq}")
    spark.sql("INSERT INTO lake.ev.fid VALUES (2, 'fresh')")
    val rows = spark.table("lake.ev.fid").orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(rows.toSeq == Seq((1L, null), (2L, "fresh")))
    // filters on the re-added column resolve against the new physical column
    assert(spark.sql("SELECT k FROM lake.ev.fid WHERE tag = 'secret-old-value'").count() == 0)
    assert(spark.sql("SELECT k FROM lake.ev.fid WHERE tag = 'fresh'")
      .collect().head.getLong(0) == 2)
  }

  test("RENAME COLUMN keeps existing data connected (physical name pinned)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev")
    spark.sql("DROP TABLE IF EXISTS lake.ev.rnc")
    spark.sql("CREATE TABLE lake.ev.rnc (k BIGINT, v STRING)")
    spark.sql("INSERT INTO lake.ev.rnc VALUES (1, 'a')")
    spark.sql("ALTER TABLE lake.ev.rnc RENAME COLUMN v TO label")
    assert(spark.table("lake.ev.rnc").columns.toSeq == Seq("k", "label"))
    // pre-rename data reads under the new logical name
    assert(spark.sql("SELECT label FROM lake.ev.rnc WHERE k = 1")
      .collect().head.getString(0) == "a")
    // writes after the rename land in the same physical column
    spark.sql("INSERT INTO lake.ev.rnc VALUES (2, 'b')")
    assert(spark.sql("SELECT k FROM lake.ev.rnc WHERE label = 'b'")
      .collect().head.getLong(0) == 2)
    // rename onto an existing column is refused
    intercept[Exception] { spark.sql("ALTER TABLE lake.ev.rnc RENAME COLUMN label TO k") }
    // and a DELETE through the renamed column rewrites correctly
    spark.sql("DELETE FROM lake.ev.rnc WHERE label = 'a'")
    assert(spark.table("lake.ev.rnc").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("RENAME of a partition column keeps clustering, pruning and SPJ metadata") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev")
    spark.sql("DROP TABLE IF EXISTS lake.ev.prn")
    spark.sql("CREATE TABLE lake.ev.prn (region INT, amount BIGINT) PARTITIONED BY (region)")
    spark.sql(
      """INSERT INTO lake.ev.prn
        |SELECT CAST(id % 4 AS INT), id FROM range(400)""".stripMargin)
    spark.sql("ALTER TABLE lake.ev.prn RENAME COLUMN region TO geo")
    assert(spark.sql("SELECT count(*) FROM lake.ev.prn WHERE geo = 2")
      .collect().head.getLong(0) == 100)
    // post-rename inserts still cluster on the (renamed) partition column
    spark.sql("INSERT INTO lake.ev.prn SELECT CAST(id % 4 AS INT), id FROM range(100)")
    assert(spark.sql("SELECT count(*) FROM lake.ev.prn WHERE geo = 2")
      .collect().head.getLong(0) == 125)
    val t = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("ev"), "prn"))
      .asInstanceOf[graft.catalog.LakeTable]
    assert(t.meta.partitionColumns == Seq("geo"))
    assert(t.meta.currentFiles.forall(f =>
      f.minValues.keySet.contains("region") && f.minValues.get("region") == f.maxValues.get("region")),
      "files keep the original physical column stats, single-valued per file")
  }

  test("UPDATE rewrites rows copy-on-write, atomic via CAS") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.rlo")
    spark.sql("DROP TABLE IF EXISTS lake.rlo.u")
    spark.sql("CREATE TABLE lake.rlo.u AS SELECT id AS k, id * 10 AS v FROM range(10)")
    spark.sql("UPDATE lake.rlo.u SET v = v + 1 WHERE k < 3")
    val rows = spark.table("lake.rlo.u").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 10)
    assert(rows.take(3).toSeq == Seq((0L, 1L), (1L, 11L), (2L, 21L)))
    assert(rows.drop(3).forall { case (k, v) => v == k * 10 })
  }

  test("UPDATE on a partitioned table rewrites ONLY the matching partition's files (runtime group filter)") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.rlo")
    spark.sql("DROP TABLE IF EXISTS lake.rlo.pu")
    spark.sql("CREATE TABLE lake.rlo.pu (region INT, amount BIGINT) PARTITIONED BY (region)")
    spark.sql(
      """INSERT INTO lake.rlo.pu
        |SELECT CAST(id % 4 AS INT) AS region, id AS amount FROM range(400)""".stripMargin)
    def files = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("rlo"), "pu"))
      .asInstanceOf[graft.catalog.LakeTable].meta.currentFiles
    val before = files
    val otherRegions = before.filterNot(f =>
      f.minValues.get("region").contains("2") || f.maxValues.get("region").contains("2"))
    assert(otherRegions.nonEmpty)
    spark.sql("UPDATE lake.rlo.pu SET amount = amount + 1000000 WHERE region = 2")
    val after = files
    otherRegions.foreach(f => assert(after.contains(f),
      s"file ${f.path} (region ${f.minValues.get("region")}) must survive a region=2 update"))
    assert(spark.sql("SELECT count(*) FROM lake.rlo.pu WHERE amount >= 1000000").collect()
      .head.getLong(0) == 100)
    assert(spark.table("lake.rlo.pu").count() == 400)
  }

  test("MERGE INTO upserts (matched update + not-matched insert) in one commit") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.rlo")
    spark.sql("DROP TABLE IF EXISTS lake.rlo.m")
    spark.sql("CREATE TABLE lake.rlo.m AS SELECT id AS k, CAST(0 AS BIGINT) AS v FROM range(5)")
    Seq((3L, 33L), (4L, 44L), (7L, 77L), (9L, 99L)).toDF("k", "v")
      .createOrReplaceTempView("merge_src")
    spark.sql(
      """MERGE INTO lake.rlo.m t USING merge_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val got = spark.table("lake.rlo.m").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 33L), (4L, 44L), (7L, 77L), (9L, 99L)))
    // snapshot history: the merge is ONE commit
    val t = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("rlo"), "m"))
      .asInstanceOf[graft.catalog.LakeTable]
    assert(t.meta.snapshots.last.operation == "replace-rows")
  }

  test("compaction bin-packs small files; values identical; partition pruning survives") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mx")
    spark.sql("DROP TABLE IF EXISTS lake.mx.c")
    spark.sql("CREATE TABLE lake.mx.c (region INT, amount BIGINT) PARTITIONED BY (region)")
    // 5 small appends -> many small files (the streaming-sink shape)
    (0 until 5).foreach(i => spark.sql(
      s"INSERT INTO lake.mx.c SELECT CAST(id % 2 AS INT), id + ${i * 100} FROM range(100)"))
    def t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("mx"), "c")).asInstanceOf[graft.catalog.LakeTable]
    val beforeSum = spark.sql("SELECT sum(amount) FROM lake.mx.c").collect().head.getLong(0)
    val nBefore = t.meta.currentFiles.size
    val (b, a) = graft.catalog.LakeMaintenance.compact(spark, "lake.mx.c")
    assert(b == nBefore && a < b, s"expected fewer files, got $b -> $a")
    assert(spark.table("lake.mx.c").count() == 500)
    assert(spark.sql("SELECT sum(amount) FROM lake.mx.c").collect().head.getLong(0) == beforeSum)
    // rewritten files keep per-partition min==max so pruning still works
    val f = t.meta.currentFiles
    assert(f.forall(x => x.minValues.get("region") == x.maxValues.get("region")),
      s"compacted files must stay partition-clustered: $f")
  }

  test("history() exposes the snapshot log with counts and the current marker") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mx")
    spark.sql("DROP TABLE IF EXISTS lake.mx.h")
    spark.sql("CREATE TABLE lake.mx.h (k BIGINT)")
    spark.sql("INSERT INTO lake.mx.h VALUES (1), (2)")
    spark.sql("INSERT INTO lake.mx.h VALUES (3)")
    val h = graft.catalog.LakeMaintenance.history(spark, "lake.mx.h")
      .orderBy("snapshot_id").collect()
    assert(h.length == 2)
    assert(h.map(_.getAs[String]("operation")).toSeq == Seq("append", "append"))
    assert(h.last.getAs[Long]("n_rows") == 3 && h.last.getAs[Boolean]("is_current"))
    assert(!h.head.getAs[Boolean]("is_current"))
  }

  test("expireSnapshots truncates history and deletes orphaned files") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mx")
    spark.sql("DROP TABLE IF EXISTS lake.mx.e")
    spark.sql("CREATE TABLE lake.mx.e (k BIGINT)")
    spark.sql("INSERT INTO lake.mx.e VALUES (1)")
    spark.sql("INSERT INTO lake.mx.e VALUES (2)")
    spark.sql("INSERT OVERWRITE lake.mx.e VALUES (9)") // orphans the first two files
    def t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("mx"), "e")).asInstanceOf[graft.catalog.LakeTable]
    assert(t.meta.snapshots.size == 3)
    val removed = graft.catalog.LakeMaintenance.expireSnapshots(spark, "lake.mx.e", keepLast = 1)
    assert(removed == 2, s"two pre-overwrite files should be orphaned, got $removed")
    assert(t.meta.snapshots.size == 1)
    assert(spark.table("lake.mx.e").collect().map(_.getLong(0)).toSeq == Seq(9L))
    // expired snapshot ids no longer resolve
    intercept[Exception] {
      spark.sql("SELECT * FROM lake.mx.e VERSION AS OF 1").collect()
    }
  }

  test("storage-partitioned join: co-partitioned lake tables join with NO shuffle") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.spj")
    spark.sql("DROP TABLE IF EXISTS lake.spj.a")
    spark.sql("DROP TABLE IF EXISTS lake.spj.b")
    spark.sql("CREATE TABLE lake.spj.a (region INT, x BIGINT) PARTITIONED BY (region)")
    spark.sql("CREATE TABLE lake.spj.b (region INT, y BIGINT) PARTITIONED BY (region)")
    spark.sql("INSERT INTO lake.spj.a SELECT CAST(id % 4 AS INT), id FROM range(100)")
    spark.sql("INSERT INTO lake.spj.b SELECT CAST(id % 4 AS INT), id * 2 FROM range(80)")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // with accurate manifest stats these tiny tables would (correctly)
    // broadcast; disable it so the test exposes the co-partitioned path a
    // large-table join would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT a.region, count(*) AS n FROM lake.spj.a a
          |JOIN lake.spj.b b ON a.region = b.region GROUP BY a.region""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("Join")
      assert(joinIdx >= 0, s"expected a join:\n$plan")
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"co-partitioned join must not shuffle its inputs:\n$plan")
      // values: per region, 25 a-rows x 20 b-rows
      val rows = joined.orderBy("region").collect().map(r => (r.getInt(0), r.getLong(1)))
      assert(rows.toSeq == Seq((0, 500L), (1, 500L), (2, 500L), (3, 500L)))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("manifest statistics reach Catalyst: a small catalog table broadcast-joins") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.st")
    spark.sql("DROP TABLE IF EXISTS lake.st.dim")
    spark.sql("CREATE TABLE lake.st.dim AS SELECT id AS k, concat('n', id) AS name FROM range(20)")
    val fact = spark.range(0, 100000).selectExpr("id % 20 AS k", "id AS v")
    val joined = fact.join(spark.table("lake.st.dim"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 20-row catalog table must broadcast (stats missing?):\n$plan")
    assert(joined.count() == 100000)
  }

  test("option-based time travel: spark.read.option(snapshot-id, n)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.st")
    spark.sql("DROP TABLE IF EXISTS lake.st.tt")
    spark.sql("CREATE TABLE lake.st.tt (k BIGINT)")
    spark.sql("INSERT INTO lake.st.tt VALUES (1)")
    spark.sql("INSERT INTO lake.st.tt VALUES (2)")
    val v1 = spark.read.option("snapshot-id", "1").table("lake.st.tt")
    assert(v1.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.table("lake.st.tt").count() == 2)
  }

  test("CAS stress: 8 writers x 5 commits each all land exactly once") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.cc")
    spark.sql("DROP TABLE IF EXISTS lake.cc.stress")
    spark.sql("CREATE TABLE lake.cc.stress (w INT, i INT)")
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    Await.result(Future.sequence(for (w <- 1 to 8) yield Future {
      (1 to 5).foreach(i => spark.sql(s"INSERT INTO lake.cc.stress VALUES ($w, $i)"))
    }), 300.seconds)
    pool.shutdown()
    val rows = spark.table("lake.cc.stress").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.length == 40, s"expected 40 committed rows, got ${rows.length}")
    assert(rows.toSet.size == 40, "every commit must land exactly once (no double-appends)")
  }

  test("write.distribution-mode: 'none' trusts upstream layout, default 'hash' clusters per value") {
    import org.apache.spark.sql.functions.col
    def filesOf(name: String): Int = {
      import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
      spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
        .loadTable(Identifier.of(Array("dm"), name))
        .asInstanceOf[graft.catalog.LakeTable].meta.currentFiles.size
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.dm")
    spark.sql("DROP TABLE IF EXISTS lake.dm.none_t")
    spark.sql("DROP TABLE IF EXISTS lake.dm.hash_t")
    spark.sql("CREATE TABLE lake.dm.none_t (p INT, v BIGINT) PARTITIONED BY (p)" +
      " TBLPROPERTIES ('write.distribution-mode'='none')")
    spark.sql("CREATE TABLE lake.dm.hash_t (p INT, v BIGINT) PARTITIONED BY (p)")
    val df = spark.range(8)
      .select((col("id") % 2).cast("int").as("p"), col("id").as("v"))
      .repartition(4) // every upstream task carries BOTH partition values
    df.writeTo("lake.dm.none_t").append()
    df.writeTo("lake.dm.hash_t").append()
    // none: no shuffle requested -> each task rolls per value (> 2 files);
    // hash (default): clustered -> exactly one file per partition value
    assert(filesOf("none_t") > 2,
      s"mode=none must not re-cluster upstream tasks, got ${filesOf("none_t")} files")
    assert(filesOf("hash_t") == 2,
      s"default hash mode clusters to one file per value, got ${filesOf("hash_t")}")
    // identical content either way; min==max single-value stats hold in both
    assert(spark.table("lake.dm.none_t").orderBy("v").collect().toSeq ==
      spark.table("lake.dm.hash_t").orderBy("v").collect().toSeq)
    assert(spark.sql("SELECT count(*) FROM lake.dm.none_t WHERE p = 1").head().getLong(0) == 4)
    spark.sql("DROP TABLE lake.dm.none_t")
    spark.sql("DROP TABLE lake.dm.hash_t")
  }

  test("multi-column PARTITIONED BY: clustering, pruning and values hold for (a, b)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.pt")
    spark.sql("DROP TABLE IF EXISTS lake.pt.mc")
    spark.sql(
      """CREATE TABLE lake.pt.mc (a INT, b INT, v BIGINT)
        |PARTITIONED BY (a, b)""".stripMargin)
    spark.sql(
      """INSERT INTO lake.pt.mc
        |SELECT CAST(id % 2 AS INT), CAST(id % 3 AS INT), id FROM range(600)""".stripMargin)
    assert(spark.table("lake.pt.mc").count() == 600)
    val one = spark.sql("SELECT count(*) FROM lake.pt.mc WHERE a = 1 AND b = 2")
      .collect().head.getLong(0)
    assert(one == 100)
    val t = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("pt"), "mc"))
      .asInstanceOf[graft.catalog.LakeTable]
    assert(t.meta.currentFiles.forall(f =>
      f.minValues.get("a") == f.maxValues.get("a")
        && f.minValues.get("b") == f.maxValues.get("b")),
      "every file must be single-valued on BOTH partition columns")
  }

  test("FOR TIMESTAMP AS OF resolves the latest snapshot at-or-before the timestamp") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.tt")
    spark.sql("DROP TABLE IF EXISTS lake.tt.ts")
    spark.sql("CREATE TABLE lake.tt.ts (k INT)")
    spark.sql("INSERT INTO lake.tt.ts VALUES (1)")
    Thread.sleep(10)
    val mid = System.currentTimeMillis()
    Thread.sleep(10)
    spark.sql("INSERT INTO lake.tt.ts VALUES (2)")
    // option path (epoch millis): between the appends -> first snapshot only
    val v1 = spark.read.option("as-of-timestamp", mid.toString).table("lake.tt.ts")
    assert(v1.collect().map(_.getInt(0)).toSeq == Seq(1))
    // SQL path (micros through TableCatalog.loadTable(ident, ts)):
    // far future -> current contents; before creation -> error
    assert(spark.sql("SELECT * FROM lake.tt.ts TIMESTAMP AS OF '2999-12-31 00:00:00'")
      .count() == 2)
    intercept[Exception] {
      spark.sql("SELECT * FROM lake.tt.ts TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
    }
  }

  test("REPLACE TABLE preserves snapshot history (VERSION AS OF a pre-replace snapshot)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.stg")
    spark.sql("DROP TABLE IF EXISTS lake.stg.hist")
    spark.sql("CREATE TABLE lake.stg.hist AS SELECT id FROM range(5)")
    spark.sql("REPLACE TABLE lake.stg.hist AS SELECT id * 10 AS id FROM range(3)")
    assert(spark.table("lake.stg.hist").count() == 3)
    // the pre-replace snapshot is still on the timeline
    assert(spark.sql("SELECT * FROM lake.stg.hist VERSION AS OF 1").count() == 5)
    val h = graft.catalog.LakeMaintenance.history(spark, "lake.stg.hist")
      .orderBy("snapshot_id").collect()
    assert(h.map(_.getAs[String]("operation")).toSeq == Seq("create", "replace"))
  }

  test("registerTable adopts an existing metadata document under a new identifier") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.reg")
    spark.sql("DROP TABLE IF EXISTS lake.reg.src")
    spark.sql("DROP TABLE IF EXISTS lake.reg.adopted")
    spark.sql("CREATE TABLE lake.reg.src AS SELECT id AS k FROM range(7)")
    val cat = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[graft.catalog.LakeCatalog]
    val loc = cat.loadTable(Identifier.of(Array("reg"), "src"))
      .asInstanceOf[graft.catalog.LakeTable].metadataLocation
    cat.registerTable(Identifier.of(Array("reg"), "adopted"), loc)
    assert(spark.table("lake.reg.adopted").count() == 7)
    // conflict: the pointer must not be clobbered (mod.rs:285-288)
    intercept[Exception] { cat.registerTable(Identifier.of(Array("reg"), "src"), loc) }
    // unreadable metadata is refused before any pointer lands
    intercept[Exception] {
      cat.registerTable(Identifier.of(Array("reg"), "bogus"), "/nonexistent/v0.json")
    }
    assert(!spark.catalog.tableExists("lake.reg.bogus"))
  }

  test("decimal min/max stats prune files on decimal predicates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.prune")
    spark.sql("DROP TABLE IF EXISTS lake.prune.dec")
    spark.sql("CREATE TABLE lake.prune.dec (k INT, price DECIMAL(10,2))")
    spark.sql(
      """INSERT INTO lake.prune.dec
        |SELECT CAST(id AS INT), CAST(id AS DECIMAL(10,2)) FROM range(0, 100)""".stripMargin)
    spark.sql(
      """INSERT INTO lake.prune.dec
        |SELECT CAST(id AS INT), CAST(id AS DECIMAL(10,2)) FROM range(1000, 1100)""".stripMargin)
    val q = spark.sql("SELECT * FROM lake.prune.dec WHERE price >= 1000.00")
    assert(q.count() == 100)
    // the low file (price 0.00..99.00) must be pruned out of the physical scan
    val t = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("prune"), "dec"))
      .asInstanceOf[graft.catalog.LakeTable]
    val lowFiles = t.meta.currentFiles.filter(f =>
      f.maxValues.get("price").exists(v => BigDecimal(v) < 1000))
    assert(lowFiles.nonEmpty, "writer must record decimal min/max stats")
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    lowFiles.foreach(f => assert(!scanned.contains(new java.io.File(f.path).getName),
      s"file ${f.path} (price <= ${f.maxValues("price")}) should be pruned"))
    // both files pruned -> zero-file scan
    assert(spark.sql("SELECT * FROM lake.prune.dec WHERE price > 99999.99").count() == 0)
  }

  test("DELETE FROM keeps rows where the predicate evaluates to NULL (SQL 3VL)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.del")
    spark.sql("DROP TABLE IF EXISTS lake.del.nulls")
    spark.sql("CREATE TABLE lake.del.nulls (k INT, v INT)")
    spark.sql("INSERT INTO lake.del.nulls VALUES (1, 10), (2, NULL), (3, 3)")
    // DELETE removes only rows where v > 5 is TRUE; row 2's NULL predicate
    // must NOT delete it (the old filter(!cond) rewrite dropped it)
    spark.sql("DELETE FROM lake.del.nulls WHERE v > 5")
    val kept = spark.table("lake.del.nulls").collect().map(_.getInt(0)).sorted.toSeq
    assert(kept == Seq(2, 3), "rows with a NULL delete predicate must survive")
  }

  test("concurrent rewrite of the same files fails the later commit (serializable-or-fail)") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.cfl")
    spark.sql("DROP TABLE IF EXISTS lake.cfl.t")
    spark.sql("CREATE TABLE lake.cfl.t (k BIGINT)")
    spark.sql("INSERT INTO lake.cfl.t SELECT id FROM range(100)")
    // writer A loads the table, capturing the current manifest...
    val stale = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("cfl"), "t")).asInstanceOf[graft.catalog.LakeTable]
    // ...then writer B rewrites every file A is about to rewrite
    spark.sql("INSERT OVERWRITE lake.cfl.t SELECT id FROM range(5)")
    // A's delete must now FAIL (blind rebase would resurrect B's removed rows)
    intercept[graft.catalog.CommitConflictException] {
      stale.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.GreaterThan("k", 10L)))
    }
    assert(spark.table("lake.cfl.t").count() == 5, "winner's contents must be intact")
  }

  test("ALTER TABLE retries through concurrent INSERT commits (CAS rebase)") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.cc")
    spark.sql("DROP TABLE IF EXISTS lake.cc.alt")
    spark.sql("CREATE TABLE lake.cc.alt (k INT)")
    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // property-only ALTERs so insert analysis is schema-stable; the commit
    // path (pointer CAS) is identical to ADD/DROP COLUMNS
    val work = (1 to 4).map(i =>
      Future(spark.sql(s"INSERT INTO lake.cc.alt VALUES ($i)"))) ++
      Seq(Future(spark.sql("ALTER TABLE lake.cc.alt SET TBLPROPERTIES ('steward'='a')")),
        Future(spark.sql("ALTER TABLE lake.cc.alt SET TBLPROPERTIES ('team'='b')")))
    Await.result(Future.sequence(work), 120.seconds)
    pool.shutdown()
    // every commit landed: 4 rows AND both properties
    assert(spark.table("lake.cc.alt").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
    val props = spark.sql("SHOW TBLPROPERTIES lake.cc.alt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("steward").contains("a") && props.get("team").contains("b"))
  }

  test("ADD COLUMNS of an existing column name is refused (case-insensitive)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.ev")
    spark.sql("DROP TABLE IF EXISTS lake.ev.dup")
    spark.sql("CREATE TABLE lake.ev.dup (k BIGINT)")
    intercept[Exception] { spark.sql("ALTER TABLE lake.ev.dup ADD COLUMNS (k INT)") }
    intercept[Exception] { spark.sql("ALTER TABLE lake.ev.dup ADD COLUMNS (K INT)") }
    assert(spark.table("lake.ev.dup").columns.toSeq == Seq("k"),
      "schema must be unchanged after a refused duplicate add")
  }

  test("RENAME onto an existing table is refused; both tables intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.rn")
    spark.sql("DROP TABLE IF EXISTS lake.rn.x")
    spark.sql("DROP TABLE IF EXISTS lake.rn.y")
    spark.sql("CREATE TABLE lake.rn.x AS SELECT 1 AS k")
    spark.sql("CREATE TABLE lake.rn.y AS SELECT 2 AS k")
    intercept[Exception] { spark.sql("ALTER TABLE lake.rn.x RENAME TO lake.rn.y") }
    assert(spark.table("lake.rn.x").collect().head.getInt(0) == 1)
    assert(spark.table("lake.rn.y").collect().head.getInt(0) == 2)
  }

  test("PARTITIONED BY bucket(8, k): writes cluster by hash bucket with min==max stats") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bk")
    spark.sql("DROP TABLE IF EXISTS lake.bk.t")
    spark.sql("CREATE TABLE lake.bk.t (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO lake.bk.t SELECT id, id * 2 FROM range(1000)")
    assert(spark.table("lake.bk.t").count() == 1000)
    val t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("bk"), "t")).asInstanceOf[graft.catalog.LakeTable]
    val files = t.meta.currentFiles
    assert(files.forall(f =>
      f.minValues.get("_bucket_8_k") == f.maxValues.get("_bucket_8_k")
        && f.minValues.contains("_bucket_8_k")),
      s"every file must be single-valued on the bucket key: $files")
    val buckets = files.flatMap(_.minValues.get("_bucket_8_k")).toSet
    assert(buckets.size == 8, s"1000 sequential keys should hit all 8 buckets, got $buckets")
    // the recorded bucket matches the engine's own hash for the file's keys
    val hashes = spark.sql("SELECT k, pmod(hash(k), 8) AS b FROM lake.bk.t").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    files.foreach { f =>
      val lo = f.minValues("k").toLong
      assert(f.minValues("_bucket_8_k").toInt == hashes(lo),
        s"file bucket stat must equal pmod(hash(k), 8) of its rows")
    }
  }

  test("storage-partitioned join on a bucketed HIGH-cardinality key: no shuffle") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bk")
    spark.sql("DROP TABLE IF EXISTS lake.bk.a")
    spark.sql("DROP TABLE IF EXISTS lake.bk.b")
    spark.sql("CREATE TABLE lake.bk.a (k BIGINT, x BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("CREATE TABLE lake.bk.b (k BIGINT, y BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO lake.bk.a SELECT id, id FROM range(500)")
    spark.sql("INSERT INTO lake.bk.b SELECT id, id * 3 FROM range(400)")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        "SELECT count(*) AS n FROM lake.bk.a a JOIN lake.bk.b b ON a.k = b.k")
      val plan = joined.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("Join")
      assert(joinIdx >= 0, s"expected a join:\n$plan")
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"bucket-co-partitioned join must not shuffle either side:\n$plan")
      assert(joined.collect().head.getLong(0) == 400)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("point lookup on a bucketed key scans only that bucket's files") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bk")
    spark.sql("DROP TABLE IF EXISTS lake.bk.pl")
    spark.sql("CREATE TABLE lake.bk.pl (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO lake.bk.pl SELECT id, id FROM range(1000)")
    val t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("bk"), "pl")).asInstanceOf[graft.catalog.LakeTable]
    val files = t.meta.currentFiles
    val targetBucket = spark.sql("SELECT pmod(hash(CAST(7 AS BIGINT)), 8)").collect().head.getInt(0)
    val matching = files.count(_.minValues.get("_bucket_8_k").contains(targetBucket.toString))
    assert(matching > 0 && matching < files.size,
      s"need a prunable layout: $matching of ${files.size} files in bucket $targetBucket")
    val q = spark.sql("SELECT v FROM lake.bk.pl WHERE k = 7")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(7L))
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    val m = """LakeScan\(lake\.bk\.pl, (\d+) files\)""".r.findFirstMatchIn(scanned)
    assert(m.isDefined, s"expected a LakeScan leaf:\n$scanned")
    assert(m.get.group(1).toInt == matching,
      s"k = 7 must scan only bucket $targetBucket's $matching files, scanned ${m.get.group(1)}")
  }

  test("UPDATE on a bucketed table rewrites ONLY the matching bucket's files (runtime group filter)") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bk")
    spark.sql("DROP TABLE IF EXISTS lake.bk.up")
    spark.sql("CREATE TABLE lake.bk.up (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO lake.bk.up SELECT id, id FROM range(1000)")
    def files = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("bk"), "up")).asInstanceOf[graft.catalog.LakeTable]
      .meta.currentFiles
    val before = files
    val targetBucket = spark.sql("SELECT pmod(hash(CAST(7 AS BIGINT)), 8)").collect().head.getInt(0)
    val otherFiles = before.filterNot(_.minValues.get("_bucket_8_k").contains(targetBucket.toString))
    assert(otherFiles.nonEmpty)
    spark.sql("UPDATE lake.bk.up SET v = -1 WHERE k = 7")
    val after = files
    otherFiles.foreach(f => assert(after.contains(f),
      s"file ${f.path} (bucket ${f.minValues.get("_bucket_8_k")}) must survive a k=7 update untouched"))
    assert(spark.sql("SELECT v FROM lake.bk.up WHERE k = 7").collect().head.getLong(0) == -1L)
    assert(spark.table("lake.bk.up").count() == 1000)
  }

  test("bucketed table survives DML + compaction with bucket clustering intact") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.bk")
    spark.sql("DROP TABLE IF EXISTS lake.bk.m")
    spark.sql("CREATE TABLE lake.bk.m (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO lake.bk.m SELECT id + ${i * 100}, id FROM range(100)"))
    spark.sql("DELETE FROM lake.bk.m WHERE k < 10")
    assert(spark.table("lake.bk.m").count() == 290)
    graft.catalog.LakeMaintenance.compact(spark, "lake.bk.m", smallFileBytes = 64L * 1024 * 1024)
    assert(spark.table("lake.bk.m").count() == 290)
    val t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("bk"), "m")).asInstanceOf[graft.catalog.LakeTable]
    assert(t.meta.currentFiles.forall(f =>
      f.minValues.get("_bucket_4_k") == f.maxValues.get("_bucket_4_k")),
      "compacted files must stay bucket-clustered")
  }

  test("incremental batch read: start/end-snapshot-id yields exactly the appended rows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.tt")
    spark.sql("DROP TABLE IF EXISTS lake.tt.inc")
    spark.sql("CREATE TABLE lake.tt.inc (k INT)")
    spark.sql("INSERT INTO lake.tt.inc VALUES (1)")
    spark.sql("INSERT INTO lake.tt.inc VALUES (2), (3)")
    spark.sql("INSERT INTO lake.tt.inc VALUES (4)")
    // (1, 3] = second + third appends
    val delta = spark.read.option("start-snapshot-id", "1").option("end-snapshot-id", "3")
      .table("lake.tt.inc")
    assert(delta.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3, 4))
    // open-ended: everything after snapshot 2
    val tail = spark.read.option("start-snapshot-id", "2").table("lake.tt.inc")
    assert(tail.collect().map(_.getInt(0)).toSeq == Seq(4))
    // empty range
    assert(spark.read.option("start-snapshot-id", "3").table("lake.tt.inc").count() == 0)
    // a non-append snapshot inside the range fails fast
    spark.sql("INSERT OVERWRITE lake.tt.inc VALUES (9)")
    intercept[Exception] {
      spark.read.option("start-snapshot-id", "1").table("lake.tt.inc").collect()
    }
  }

  test("null-count stats prune IS NULL / IS NOT NULL scans to the right files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.prune")
    spark.sql("DROP TABLE IF EXISTS lake.prune.nn")
    spark.sql("CREATE TABLE lake.prune.nn (k BIGINT, v STRING)")
    spark.sql("INSERT INTO lake.prune.nn SELECT id, CAST(NULL AS STRING) FROM range(100)")
    spark.sql("INSERT INTO lake.prune.nn SELECT id + 100, concat('x', id) FROM range(100)")
    def scanCount(sql: String): Int = {
      val q = spark.sql(sql)
      q.collect()
      """LakeScan\(lake\.prune\.nn, (\d+) files\)""".r
        .findFirstMatchIn(q.queryExecution.executedPlan.collectLeaves()
          .map(_.toString).mkString("\n")).map(_.group(1).toInt).getOrElse(-1)
    }
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    def files = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("prune"), "nn")).asInstanceOf[graft.catalog.LakeTable]
      .meta.currentFiles
    val withNulls = files.count(_.nulls.get("v").exists(_ > 0))
    val allValued = files.count(f => f.nulls.get("v").contains(0L))
    assert(withNulls > 0 && allValued > 0 && withNulls + allValued == files.size)
    // IS NULL: only files that recorded nulls can match
    assert(spark.sql("SELECT count(*) FROM lake.prune.nn WHERE v IS NULL")
      .collect().head.getLong(0) == 100)
    assert(scanCount("SELECT * FROM lake.prune.nn WHERE v IS NULL") == withNulls,
      "IS NULL must prune every zero-null file")
    // IS NOT NULL: only files with at least one non-null value can match
    assert(scanCount("SELECT * FROM lake.prune.nn WHERE v IS NOT NULL") == allValued,
      "IS NOT NULL must prune every all-null file")
    // DELETE through the same stats rewrites only the null-carrying files
    val noNullFiles = files.filter(_.nulls.get("v").contains(0L))
    spark.sql("DELETE FROM lake.prune.nn WHERE v IS NULL")
    assert(spark.table("lake.prune.nn").count() == 100)
    noNullFiles.foreach(f => assert(files.contains(f),
      s"file ${f.path} has zero nulls and must survive a DELETE WHERE v IS NULL untouched"))
  }

  test("readStream starting-snapshot-id: 'latest' skips history, explicit id resumes after it") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.strm")
    spark.sql("DROP TABLE IF EXISTS lake.strm.src")
    spark.sql("CREATE TABLE lake.strm.src (k INT)")
    spark.sql("INSERT INTO lake.strm.src VALUES (1)")
    spark.sql("INSERT INTO lake.strm.src VALUES (2)")
    def drain(startOpt: Option[String]): Seq[Int] = {
      val reader = spark.readStream
      startOpt.foreach(v => reader.option("starting-snapshot-id", v))
      val out = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
      val q = reader.table("lake.strm.src").writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => out.add(r.getInt(0))))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      out.iterator().asScala.toSeq.sorted
    }
    assert(drain(None) == Seq(1, 2), "default replays the whole table")
    assert(drain(Some("1")) == Seq(2), "explicit id consumes strictly after it")
    assert(drain(Some("latest")).isEmpty, "'latest' starts at now: nothing to consume")
  }

  test("metadata tables: t$snapshots / t$files / t$manifests are SQL-queryable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mx")
    spark.sql("DROP TABLE IF EXISTS lake.mx.md")
    spark.sql("CREATE TABLE lake.mx.md (k BIGINT)")
    spark.sql("INSERT INTO lake.mx.md VALUES (1), (2)")
    spark.sql("INSERT INTO lake.mx.md VALUES (3)")
    val snaps = spark.sql("SELECT * FROM lake.mx.`md$snapshots` ORDER BY snapshot_id").collect()
    assert(snaps.length == 2)
    assert(snaps.map(_.getAs[String]("operation")).toSeq == Seq("append", "append"))
    assert(snaps.last.getAs[Boolean]("is_current") && !snaps.head.getAs[Boolean]("is_current"))
    assert(snaps.last.getAs[Long]("n_rows") == 3)
    val files = spark.sql("SELECT * FROM lake.mx.`md$files`").collect()
    assert(files.map(_.getAs[Long]("row_count")).sum == 3)
    assert(files.forall(_.getAs[Map[String, String]]("min_values").contains("k")))
    val manifests = spark.sql("SELECT * FROM lake.mx.`md$manifests`").collect()
    assert(manifests.length == 2, "two append manifests shared by reference")
    assert(manifests.map(_.getAs[Long]("n_files")).sum == files.length)
    // the planning-skip summaries ride along, keyed by logical name
    assert(manifests.forall(_.getAs[Map[String, String]]("summary_mins").contains("k")))
    val kRanges = manifests.map(m => (
      m.getAs[Map[String, String]]("summary_mins")("k").toLong,
      m.getAs[Map[String, String]]("summary_maxs")("k").toLong)).sorted.toSeq
    assert(kRanges == Seq((1L, 2L), (3L, 3L)), s"got $kRanges")
    assert(manifests.forall(_.getAs[Map[String, Long]]("summary_null_counts").get("k").contains(0L)))
    // an aggregation over a metadata table plans like any other relation
    val total = spark.sql("SELECT sum(size_bytes) FROM lake.mx.`md$files`")
      .collect().head.getLong(0)
    assert(total > 0)
    intercept[Exception] { spark.sql("SELECT * FROM lake.mx.`md$bogus`").collect() }
  }

  test("t$partitions: per-partition-value file/row counts from stats") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.mx")
    spark.sql("DROP TABLE IF EXISTS lake.mx.pp")
    spark.sql("CREATE TABLE lake.mx.pp (region INT, v BIGINT) PARTITIONED BY (region)")
    spark.sql("INSERT INTO lake.mx.pp SELECT CAST(id % 3 AS INT), id FROM range(300)")
    val rows = spark.sql("SELECT * FROM lake.mx.`pp$partitions` ORDER BY partition").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("partition")).toSeq == Seq("region=0", "region=1", "region=2"))
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 300)
    rows.foreach(r => assert(r.getAs[Long]("n_rows") == 100))
  }

  test("rename preserves data; purge removes files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.rn")
    spark.sql("DROP TABLE IF EXISTS lake.rn.a")
    spark.sql("DROP TABLE IF EXISTS lake.rn.b")
    spark.sql("CREATE TABLE lake.rn.a (k INT)")
    spark.sql("INSERT INTO lake.rn.a VALUES (42)")
    spark.sql("ALTER TABLE lake.rn.a RENAME TO lake.rn.b")
    assert(spark.table("lake.rn.b").collect().head.getInt(0) == 42)
    assert(!spark.catalog.tableExists("lake.rn.a"))
  }

  test("snapshot tags: VERSION AS OF 'name' resolves; tagged snapshots survive expiration") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.tg")
    spark.sql("DROP TABLE IF EXISTS lake.tg.t")
    spark.sql("CREATE TABLE lake.tg.t (k BIGINT)")
    spark.sql("INSERT INTO lake.tg.t VALUES (1)")
    val taggedId = graft.catalog.LakeMaintenance.createTag(spark, "lake.tg.t", "v1_release")
    spark.sql("INSERT INTO lake.tg.t VALUES (2)")
    spark.sql("INSERT INTO lake.tg.t VALUES (3)")
    // tag resolves to the pre-append snapshot
    assert(spark.sql("SELECT * FROM lake.tg.t VERSION AS OF 'v1_release'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // unknown tag: clear error listing the known ones
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM lake.tg.t VERSION AS OF 'nope'").collect()
    }
    assert(e.getMessage.contains("v1_release"))
    // expiration keeps the tagged snapshot (and its files) alive
    graft.catalog.LakeMaintenance.expireSnapshots(spark, "lake.tg.t", keepLast = 1)
    assert(spark.sql("SELECT * FROM lake.tg.t VERSION AS OF 'v1_release'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql(s"SELECT * FROM lake.tg.t VERSION AS OF $taggedId")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // after tag removal the snapshot expires normally
    graft.catalog.LakeMaintenance.removeTag(spark, "lake.tg.t", "v1_release")
    graft.catalog.LakeMaintenance.expireSnapshots(spark, "lake.tg.t", keepLast = 1)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM lake.tg.t VERSION AS OF $taggedId").collect()
    }
    assert(spark.table("lake.tg.t").count() == 3)
  }

  test("write-audit-publish: staged append invisible until fast-forward publish") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.wap")
    spark.sql("DROP TABLE IF EXISTS lake.wap.ff")
    spark.sql("CREATE TABLE lake.wap.ff (k BIGINT) TBLPROPERTIES ('wap.enabled'='true')")
    spark.sql("INSERT OVERWRITE lake.wap.ff VALUES (1)") // overwrite publishes directly
    spark.sql("INSERT INTO lake.wap.ff VALUES (2)") // staged
    def t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("wap"), "ff")).asInstanceOf[graft.catalog.LakeTable]
    // readers still see the audited version
    assert(spark.table("lake.wap.ff").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val staged = t.meta.snapshots.filter(_.operation == "stage-append")
    assert(staged.size == 1)
    // auditor reads the staged snapshot by version
    assert(spark.sql(s"SELECT * FROM lake.wap.ff VERSION AS OF ${staged.head.snapshotId}")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // publish = fast-forward
    val published = graft.catalog.LakeMaintenance.publish(
      spark, "lake.wap.ff", staged.head.snapshotId)
    assert(published == staged.head.snapshotId)
    assert(spark.table("lake.wap.ff").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("write-audit-publish: cherry-pick re-applies a staged append onto a moved table") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.wap")
    spark.sql("DROP TABLE IF EXISTS lake.wap.cp")
    spark.sql("CREATE TABLE lake.wap.cp (k BIGINT) TBLPROPERTIES ('wap.enabled'='true')")
    def t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("wap"), "cp")).asInstanceOf[graft.catalog.LakeTable]
    spark.sql("INSERT INTO lake.wap.cp VALUES (1)") // staged S1
    val s1 = t.meta.snapshots.last.snapshotId
    // table moves on independently (wap off for the direct append)
    spark.sql("ALTER TABLE lake.wap.cp UNSET TBLPROPERTIES ('wap.enabled')")
    spark.sql("INSERT INTO lake.wap.cp VALUES (10)")
    assert(spark.table("lake.wap.cp").collect().map(_.getLong(0)).toSeq == Seq(10L))
    // publishing S1 now must CHERRY-PICK: result = direct append + staged rows
    graft.catalog.LakeMaintenance.publish(spark, "lake.wap.cp", s1)
    assert(spark.table("lake.wap.cp").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 10L))
    assert(t.meta.snapshot(t.meta.currentSnapshotId).get.operation == "publish")
    // only staged appends are publishable
    intercept[IllegalArgumentException] {
      graft.catalog.LakeMaintenance.publish(spark, "lake.wap.cp", t.meta.currentSnapshotId)
    }
  }

  test("write-audit-publish: two racing publishes both land via CAS retry") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.wap")
    spark.sql("DROP TABLE IF EXISTS lake.wap.race")
    spark.sql("CREATE TABLE lake.wap.race (k BIGINT) TBLPROPERTIES ('wap.enabled'='true')")
    def t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("wap"), "race")).asInstanceOf[graft.catalog.LakeTable]
    spark.sql("INSERT INTO lake.wap.race VALUES (1)")
    val s1 = t.meta.snapshots.last.snapshotId
    spark.sql("INSERT INTO lake.wap.race VALUES (2)")
    val s2 = t.meta.snapshots.last.snapshotId
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(s1, s2).map(id => new Thread(() =>
      try graft.catalog.LakeMaintenance.publish(spark, "lake.wap.race", id)
      catch { case e: Throwable => errs.add(e) }))
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(errs.isEmpty, s"both publishes must land: ${errs.toArray.mkString}")
    assert(spark.table("lake.wap.race").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L), "both staged rows visible after racing publishes")
  }

  test("write-audit-publish: abandoned stages expire once the pointer passes them") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.wap")
    spark.sql("DROP TABLE IF EXISTS lake.wap.ab")
    spark.sql("CREATE TABLE lake.wap.ab (k BIGINT) TBLPROPERTIES ('wap.enabled'='true')")
    spark.sql("INSERT INTO lake.wap.ab VALUES (1)") // staged, will be abandoned
    spark.sql("ALTER TABLE lake.wap.ab UNSET TBLPROPERTIES ('wap.enabled')")
    spark.sql("INSERT INTO lake.wap.ab VALUES (2)")
    spark.sql("INSERT INTO lake.wap.ab VALUES (3)")
    // staged snapshot id (2) < current (4): no longer protected
    val removed = graft.catalog.LakeMaintenance.expireSnapshots(spark, "lake.wap.ab", keepLast = 1)
    assert(removed >= 1, "the abandoned staged file must be vacuumed")
    assert(spark.table("lake.wap.ab").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("CALL lake.system.*: SQL-native maintenance procedures") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.proc")
    spark.sql("DROP TABLE IF EXISTS lake.proc.t")
    spark.sql("CREATE TABLE lake.proc.t (k BIGINT)")
    spark.sql("INSERT INTO lake.proc.t VALUES (1)")
    spark.sql("INSERT INTO lake.proc.t VALUES (2)")

    // tag + time travel via CALL
    val tagged = spark.sql("CALL lake.system.create_tag('proc.t', 'audited')").collect()
    assert(tagged.head.getLong(0) == 2L)
    spark.sql("INSERT INTO lake.proc.t VALUES (3)")
    assert(spark.sql("SELECT * FROM lake.proc.t VERSION AS OF 'audited'").count() == 2)

    // compaction via CALL (3 tiny files -> 1)
    val c = spark.sql("CALL lake.system.compact('proc.t')").collect().head
    assert(c.getInt(0) == 3 && c.getInt(1) == 1,
      s"expected 3 files compacted to 1, got $c")

    // rollback via CALL (named args work too)
    spark.sql("CALL lake.system.rollback(table => 'proc.t', snapshot_id => 2)")
    assert(spark.table("lake.proc.t").count() == 2)
    spark.sql("CALL lake.system.remove_tag('proc.t', 'audited')")
    val e = intercept[Exception] {
      spark.sql("CALL lake.system.nope('proc.t')").collect()
    }
    assert(e.getMessage.contains("nope"), s"unknown procedure must fail to load: $e")
  }

  test("z-order compaction: multi-dimensional clustering prunes on BOTH columns") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.zo")
    spark.sql("DROP TABLE IF EXISTS lake.zo.t")
    spark.sql("CREATE TABLE lake.zo.t (x BIGINT, y BIGINT, v BIGINT)")
    // a 100x100 grid inserted in x-major order: after a LINEAR x-sort, every
    // file spans the full y range — y predicates prune nothing
    spark.sql("INSERT INTO lake.zo.t SELECT id DIV 100, id % 100, id FROM range(10000)")
    def t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("zo"), "t")).asInstanceOf[graft.catalog.LakeTable]

    val (before, after) = graft.catalog.LakeMaintenance.zorderCompact(
      spark, "lake.zo.t", Seq("x", "y"), targetFileBytes = 8 * 1024)
    assert(after > 4, s"need several output files to observe pruning, got $after")

    // values intact
    assert(spark.table("lake.zo.t").count() == 10000)
    assert(spark.sql("SELECT sum(v) FROM lake.zo.t").collect()(0).getLong(0) ==
      (0L until 10000L).sum)

    // a quadrant query must exclude most files on STATS alone — possible
    // only if files are tight boxes in (x, y), which a linear sort can't do
    val files = t.meta.currentFiles
    def overlaps(f: graft.catalog.DataFileMeta, c: String, lo: Long, hi: Long) =
      f.minValues.get(c).forall(_.toDouble <= hi) &&
        f.maxValues.get(c).forall(_.toDouble >= lo)
    val hit = files.count(f => overlaps(f, "x", 0, 24) && overlaps(f, "y", 0, 24))
    assert(hit.toDouble / files.size <= 0.5,
      s"quadrant (6% of the grid) should prune >half the files: $hit of ${files.size}")
    // both dimensions individually prunable too
    val hitY = files.count(f => overlaps(f, "y", 0, 9))
    assert(hitY < files.size, s"y-range pruning must exclude some files: $hitY of ${files.size}")
    assert(spark.sql("SELECT count(*) FROM lake.zo.t WHERE x < 25 AND y < 25")
      .collect()(0).getLong(0) == 625)
    // and via CALL (idempotent second pass)
    val viaCall = spark.sql("CALL lake.system.zorder('zo.t', 'x;y')").collect().head
    assert(viaCall.getInt(1) >= 1)
    assert(spark.table("lake.zo.t").count() == 10000)
  }

  test("rollback moves the pointer back; history stays; rolling forward works") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.rb")
    spark.sql("DROP TABLE IF EXISTS lake.rb.t")
    spark.sql("CREATE TABLE lake.rb.t (k BIGINT)")
    spark.sql("INSERT INTO lake.rb.t VALUES (1)") // snap 1
    spark.sql("INSERT INTO lake.rb.t VALUES (2)") // snap 2 (bad data, say)
    graft.catalog.LakeMaintenance.rollback(spark, "lake.rb.t", 1)
    assert(spark.table("lake.rb.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the rolled-past snapshot is still readable history
    assert(spark.sql("SELECT * FROM lake.rb.t VERSION AS OF 2").count() == 2)
    // new writes fork from the rolled-back state
    spark.sql("INSERT INTO lake.rb.t VALUES (3)")
    assert(spark.table("lake.rb.t").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // roll forward again
    graft.catalog.LakeMaintenance.rollback(spark, "lake.rb.t", 2)
    assert(spark.table("lake.rb.t").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      graft.catalog.LakeMaintenance.rollback(spark, "lake.rb.t", 99)
    }
  }

  test("write.sort-order: range-distributed writes give disjoint per-file ranges") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.so")
    spark.sql("DROP TABLE IF EXISTS lake.so.t")
    spark.sql("CREATE TABLE lake.so.t (k BIGINT, v BIGINT) TBLPROPERTIES ('write.sort-order'='k')")
    // scrambled input: without the required ordering, file ranges would
    // all span [0, 997). AQE would (correctly) coalesce this tiny insert
    // into one partition — pin it off so the range layout is observable.
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("INSERT INTO lake.so.t SELECT (id * 37) % 1000 AS k, id FROM range(10000)")
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    def t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("so"), "t")).asInstanceOf[graft.catalog.LakeTable]
    val files = t.meta.currentFiles
    assert(files.size > 1, "range distribution should produce multiple files")
    val ranges = files.map(f => (BigDecimal(f.minValues("k")), BigDecimal(f.maxValues("k"))))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file key ranges must be disjoint after a range write: $ranges")
      case _ => ()
    }
    // a point query is prunable to exactly the one covering file
    val covering = files.count(f =>
      BigDecimal(f.minValues("k")) <= 500 && BigDecimal(f.maxValues("k")) >= 500)
    assert(covering == 1, s"point key must fall in exactly one file's range, got $covering")
    assert(spark.sql("SELECT count(*) FROM lake.so.t WHERE k = 500").collect()(0).getLong(0) ==
      (0 until 10000).count(id => (id * 37) % 1000 == 500))
  }

  test("partition evolution: old files keep reading, new writes cluster by the new spec") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.pe")
    spark.sql("DROP TABLE IF EXISTS lake.pe.t")
    spark.sql("CREATE TABLE lake.pe.t (region INT, v BIGINT)")
    spark.sql("INSERT INTO lake.pe.t SELECT CAST(id % 4 AS INT), id FROM range(100)")
    def t = spark.sessionState.catalogManager.catalog("lake").asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("pe"), "t")).asInstanceOf[graft.catalog.LakeTable]
    val oldFiles = t.meta.currentFiles.map(_.path).toSet

    graft.catalog.LakeMaintenance.setPartitionSpec(spark, "lake.pe.t", Seq("region"))
    spark.sql("INSERT INTO lake.pe.t SELECT CAST(id % 4 AS INT), id FROM range(100, 200)")

    val meta = t.meta
    assert(meta.partitionColumns == Seq("region"))
    // old files untouched; every NEW file is clustered (min==max on region)
    val newFiles = meta.currentFiles.filterNot(f => oldFiles(f.path))
    assert(newFiles.nonEmpty)
    newFiles.foreach(f => assert(f.minValues("region") == f.maxValues("region"),
      s"post-evolution file not clustered: $f"))
    // full reads see both generations
    assert(spark.table("lake.pe.t").count() == 200)
    assert(spark.sql("SELECT sum(v) FROM lake.pe.t WHERE region = 2").collect()(0).getLong(0) ==
      (0 until 200).filter(_ % 4 == 2).map(_.toLong).sum)
    // the new generation is exactly prunable: every new file is
    // single-valued on region, so a region filter skips non-matching ones
    assert(newFiles.count(_.minValues("region") == "2") > 0)
    // spec errors are rejected
    intercept[IllegalArgumentException] {
      graft.catalog.LakeMaintenance.setPartitionSpec(spark, "lake.pe.t", Seq("nope"))
    }
    // evolving to a bucket spec also works going forward
    graft.catalog.LakeMaintenance.setPartitionSpec(spark, "lake.pe.t", Seq("bucket(4,v)"))
    spark.sql("INSERT INTO lake.pe.t SELECT CAST(id % 4 AS INT), id FROM range(200, 300)")
    assert(spark.table("lake.pe.t").count() == 300)
    val gen3 = t.meta.currentFiles.filterNot(f =>
      oldFiles(f.path) || newFiles.exists(_.path == f.path))
    assert(gen3.nonEmpty && gen3.forall(_.minValues.contains("_bucket_4_v")),
      "bucket-spec files must carry bucket stats")
  }
}
