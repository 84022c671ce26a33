package graft

import java.sql.SQLException

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Torn-call resolution for rename + namespace CRUD (VERDICT r10 #7): the
  * CommitAmbiguitySpec treatment for the three mutating statements that
  * never had it. Each test tears the JDBC call at an exact point (applied-
  * then-threw, or never-applied) via a store subclass and asserts the
  * resolving wrapper reaches a definite, exactly-once outcome — the same
  * discipline guardedCas gives the pointer CAS. Renames are decisive
  * because pointer locations are UUID-unique: target holding the source's
  * pre-call pointer can only mean OUR rename landed.
  */
class TornRenameSpec extends AnyFunSuite {

  private def fresh(tag: String): (PointerStore, String) = {
    val url = s"jdbc:derby:memory:torn$tag${System.nanoTime()};create=true"
    val store = new PointerStore(url, "c")
    store.initialize()
    (store, url)
  }

  test("torn rename that APPLIED resolves to Renamed; exactly one row, pointer intact") {
    val (store, url) = fresh("a")
    assert(store.register("ns", "src", "loc-1"))
    val tearing = new PointerStore(url, "c") {
      override def rename(fns: String, fn: String, tns: String, tn: String)
          : PointerStore.RenameResult = {
        super.rename(fns, fn, tns, tn) // APPLIES
        throw new SQLException("connection reset (after apply)")
      }
    }
    assert(tearing.renameResolving("ns", "src", "ns", "dst") == PointerStore.Renamed)
    assert(store.load("ns", "dst").contains("loc-1"), "pointer must survive the rename")
    assert(store.load("ns", "src").isEmpty, "no duplicate source row")
    store.close(); tearing.close()
  }

  test("torn rename that did NOT apply is re-issued and lands exactly once") {
    val (store, url) = fresh("b")
    assert(store.register("ns", "src", "loc-1"))
    var first = true
    val tearing = new PointerStore(url, "c") {
      override def rename(fns: String, fn: String, tns: String, tn: String)
          : PointerStore.RenameResult = {
        if (first) { first = false; throw new SQLException("write timeout (never applied)") }
        super.rename(fns, fn, tns, tn)
      }
    }
    assert(tearing.renameResolving("ns", "src", "ns", "dst") == PointerStore.Renamed)
    assert(store.load("ns", "dst").contains("loc-1"))
    assert(store.load("ns", "src").isEmpty)
    store.close(); tearing.close()
  }

  test("torn rename whose target was taken by ANOTHER table resolves to TargetExists") {
    val (store, url) = fresh("c")
    assert(store.register("ns", "src", "loc-1"))
    val tearing = new PointerStore(url, "c") {
      override def rename(fns: String, fn: String, tns: String, tn: String)
          : PointerStore.RenameResult = {
        // model: our statement dies on the wire; a different table lands on
        // the target name first
        super.register(tns, tn, "loc-other")
        throw new SQLException("connection reset (ours never applied)")
      }
    }
    assert(tearing.renameResolving("ns", "src", "ns", "dst") == PointerStore.TargetExists)
    assert(store.load("ns", "src").contains("loc-1"), "source untouched on conflict")
    assert(store.load("ns", "dst").contains("loc-other"))
    store.close(); tearing.close()
  }

  test("torn rename of a source that never existed resolves to SourceMissing") {
    val (store, url) = fresh("d")
    val tearing = new PointerStore(url, "c") {
      override def rename(fns: String, fn: String, tns: String, tn: String)
          : PointerStore.RenameResult =
        throw new SQLException("write timeout")
    }
    assert(tearing.renameResolving("ns", "ghost", "ns", "dst") ==
      PointerStore.SourceMissing)
    store.close(); tearing.close()
  }

  test("torn CREATE NAMESPACE that applied resolves to created, exactly one row") {
    val (store, url) = fresh("e")
    val tearing = new PointerStore(url, "c") {
      override def createNamespace(n: String): Boolean = {
        super.createNamespace(n)
        throw new SQLException("ack lost (after apply)")
      }
    }
    assert(tearing.createNamespaceResolving("nsx"))
    assert(store.listNamespaces().count(_ == "nsx") == 1)
    store.close(); tearing.close()
  }

  test("torn CREATE NAMESPACE that never applied is re-issued exactly once") {
    val (store, url) = fresh("f")
    var first = true
    val tearing = new PointerStore(url, "c") {
      override def createNamespace(n: String): Boolean = {
        if (first) { first = false; throw new SQLException("write timeout") }
        super.createNamespace(n)
      }
    }
    assert(tearing.createNamespaceResolving("nsy"))
    assert(store.listNamespaces().count(_ == "nsy") == 1)
    store.close(); tearing.close()
  }

  test("torn DROP NAMESPACE that applied resolves true; never-existed resolves false") {
    val (store, url) = fresh("g")
    assert(store.createNamespace("nsz"))
    val tearing = new PointerStore(url, "c") {
      override def dropNamespace(n: String): Boolean = {
        super.dropNamespace(n)
        throw new SQLException("ack lost (after apply)")
      }
    }
    assert(tearing.dropNamespaceResolving("nsz"), "existed and is gone: dropped")
    assert(!store.listNamespaces().contains("nsz"))
    // a namespace that never existed: gone-when-probed must NOT claim credit
    val tearing2 = new PointerStore(url, "c") {
      override def dropNamespace(n: String): Boolean =
        throw new SQLException("write timeout")
    }
    assert(!tearing2.dropNamespaceResolving("never-there"))
    store.close(); tearing.close(); tearing2.close()
  }
}
