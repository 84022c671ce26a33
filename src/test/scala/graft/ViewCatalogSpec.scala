package graft

import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The programmatic V2 ViewCatalog surface (VERDICT r11 #8): Spark 4.1
  * ships the API without a SQL path, so the engine is exercised directly —
  * the day Spark wires `CREATE VIEW` to V2 catalogs, this storage is ready.
  * Views ride the table pointer pattern: immutable JSON docs in the
  * warehouse, one iceberg_views row, CAS on alter.
  */
class ViewCatalogSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val cat: ViewCatalog =
    spark.sessionState.catalogManager.catalog("lake").asInstanceOf[ViewCatalog]

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def info(ns: String, name: String, sql: String,
      props: Map[String, String] = Map.empty): ViewInfo = {
    import scala.jdk.CollectionConverters._
    new ViewInfo(Identifier.of(Array(ns), name), sql, "lake", Array("views"),
      schema, Array("k", "v"), Array.empty, Array.empty, props.asJava)
  }

  test("create / load / exists / drop round-trip every ViewInfo field") {
    val ident = Identifier.of(Array("views"), "v_roundtrip")
    cat.dropView(ident)
    val created = cat.createView(info("views", "v_roundtrip",
      "SELECT k, v FROM lake.views.base", Map("comment" -> "a test view")))
    assert(created.query() == "SELECT k, v FROM lake.views.base")
    assert(cat.viewExists(ident))
    val loaded = cat.loadView(ident)
    assert(loaded.query() == "SELECT k, v FROM lake.views.base")
    assert(loaded.currentCatalog() == "lake")
    assert(loaded.currentNamespace().toSeq == Seq("views"))
    assert(loaded.schema() == schema)
    assert(loaded.queryColumnNames().toSeq == Seq("k", "v"))
    assert(loaded.properties().get("comment") == "a test view")
    assert(cat.dropView(ident))
    assert(!cat.viewExists(ident))
    assert(!cat.dropView(ident), "second drop: 0-row semantics")
  }

  test("createView on an existing name throws ViewAlreadyExistsException") {
    val ident = Identifier.of(Array("views"), "v_dup")
    cat.dropView(ident)
    cat.createView(info("views", "v_dup", "SELECT 1"))
    intercept[ViewAlreadyExistsException] {
      cat.createView(info("views", "v_dup", "SELECT 2"))
    }
    assert(cat.loadView(ident).query() == "SELECT 1", "loser must not clobber")
    cat.dropView(ident)
  }

  test("loadView of a missing view throws NoSuchViewException") {
    intercept[NoSuchViewException] {
      cat.loadView(Identifier.of(Array("views"), "v_missing"))
    }
  }

  test("alterView set/remove property goes through the views CAS") {
    val ident = Identifier.of(Array("views"), "v_alter")
    cat.dropView(ident)
    cat.createView(info("views", "v_alter", "SELECT 1", Map("a" -> "1")))
    cat.alterView(ident, ViewChange.setProperty("b", "2"))
    assert(cat.loadView(ident).properties().get("b") == "2")
    cat.alterView(ident, ViewChange.removeProperty("a"))
    val p = cat.loadView(ident).properties()
    assert(p.get("a") == null && p.get("b") == "2")
    assert(cat.loadView(ident).query() == "SELECT 1", "alter must not touch the query")
    cat.dropView(ident)
  }

  test("renameView is atomic: target-exists loses, missing source throws") {
    val a = Identifier.of(Array("views"), "v_ren_a")
    val b = Identifier.of(Array("views"), "v_ren_b")
    cat.dropView(a); cat.dropView(b)
    cat.createView(info("views", "v_ren_a", "SELECT 10"))
    cat.renameView(a, b)
    assert(!cat.viewExists(a) && cat.loadView(b).query() == "SELECT 10")
    cat.createView(info("views", "v_ren_a", "SELECT 11"))
    intercept[ViewAlreadyExistsException] { cat.renameView(a, b) }
    intercept[NoSuchViewException] {
      cat.renameView(Identifier.of(Array("views"), "v_ren_missing"), a)
    }
    cat.dropView(a); cat.dropView(b)
  }

  test("listViews sees only its namespace; views survive a fresh catalog instance") {
    val ident = Identifier.of(Array("views2"), "v_listed")
    cat.dropView(ident)
    cat.createView(info("views2", "v_listed", "SELECT 42"))
    assert(cat.listViews("views2").map(_.name()).toSeq == Seq("v_listed"))
    assert(!cat.listViews("views").map(_.name()).contains("v_listed"))
    // a second catalog instance on the same store resolves the view (the
    // pointer row + immutable doc are the source of truth, not the JVM)
    val cat2 = new graft.catalog.LakeCatalog()
    val opts = new java.util.HashMap[String, String]()
    opts.put("warehouse", Sessions.defaultWarehouse)
    opts.put("jdbc.url", Sessions.defaultJdbcUrl)
    cat2.initialize("lake", new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts))
    assert(cat2.loadView(ident).query() == "SELECT 42")
    cat.dropView(ident)
  }
}
