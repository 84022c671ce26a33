package graft

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** The r11 starvation-escape commit lease. CommitContentionBench found the
  * pure optimistic CAS livelocking in LOCKSTEP: a challenger's rebase cycle
  * (reload + metadata rewrite + CAS) matches the incumbent's commit cycle,
  * so its CAS lands just after every incumbent commit — 33 consecutive
  * losses measured at TWO writers, full 32-attempt exhaustion at 8. The
  * lease is the escape: a writer that has lost `starveLeaseAfter` CASes
  * claims a TTL'd row; every writer peeks it before each commit attempt and
  * yields while a foreign lease is live. ADVISORY by construction — never
  * required for the CAS to succeed, degrades to plain backoff on any
  * SQLException.
  */
class CommitLeaseSpec extends AnyFunSuite {

  private val conf = new org.apache.hadoop.conf.Configuration()
  private val schema = StructType(Seq(StructField("k", LongType)))

  private def freshStore(tag: String): (PointerStore, String) = {
    val url = s"jdbc:derby:memory:lease$tag${System.nanoTime()};create=true"
    val store = new PointerStore(url, "c")
    store.initialize()
    (store, url)
  }

  test("lifecycle: acquire, peek, contend, release, reacquire") {
    val (store, _) = freshStore("a")
    val now = 1000000L
    assert(store.tryAcquireLease("ns", "t", "h1", now, 10000L))
    assert(store.peekLease("ns", "t", now, 10000L).contains("h1"))
    // a live lease cannot be taken
    assert(!store.tryAcquireLease("ns", "t", "h2", now + 1, 10000L))
    assert(store.peekLease("ns", "t", now + 1, 10000L).contains("h1"))
    store.releaseLease("ns", "t", "h1")
    assert(store.peekLease("ns", "t", now + 2, 10000L).isEmpty)
    assert(store.tryAcquireLease("ns", "t", "h2", now + 3, 10000L))
    store.close()
  }

  test("TTL: an expired lease reads as free and is stealable; release is holder-guarded") {
    val (store, _) = freshStore("b")
    val now = 1000000L
    assert(store.tryAcquireLease("ns", "t", "h1", now, 10000L))
    // beyond the TTL the row no longer gates anyone…
    assert(store.peekLease("ns", "t", now + 10001L, 10000L).isEmpty)
    // …and a new holder steals it in place
    assert(store.tryAcquireLease("ns", "t", "h2", now + 10001L, 10000L))
    assert(store.peekLease("ns", "t", now + 10002L, 10000L).contains("h2"))
    // the crashed original coming back CANNOT delete the stolen lease
    store.releaseLease("ns", "t", "h1")
    assert(store.peekLease("ns", "t", now + 10003L, 10000L).contains("h2"))
    store.releaseLease("ns", "t", "h2")
    assert(store.peekLease("ns", "t", now + 10004L, 10000L).isEmpty)
    store.close()
  }

  test("leases are per-table: another table's lease gates nobody here") {
    val (store, _) = freshStore("c")
    assert(store.tryAcquireLease("ns", "other", "h1", 1000L, 10000L))
    assert(store.peekLease("ns", "t", 1001L, 10000L).isEmpty)
    assert(store.tryAcquireLease("ns", "t", "h2", 1002L, 10000L))
    store.close()
  }

  test("retryLoop with a caller-held lease commits without yielding to it and leaves it held") {
    val (store, _) = freshStore("d")
    val dir = java.nio.file.Files.createTempDirectory("leased").toString
    val base = TableMeta(1, dir, schema.json, Nil, Map.empty, 1L,
      Seq(SnapshotMeta(1L, 1000L, "append", Nil)))
    val loc = TableMeta.write(base, conf)
    assert(store.register("ns", "t", loc))
    assert(store.tryAcquireLease("ns", "t", "mine", System.currentTimeMillis(), 10000L))
    val f = DataFileMeta(s"$dir/data/f.parquet", 10L, 100L,
      Map("k" -> "0"), Map("k" -> "9"), Map("k" -> 0L))
    // would deadlock (yield to its own lease until TTL) without heldLease
    val t0 = System.nanoTime()
    CasCommit.retryLoop(store, "ns", "t", loc, base, "append", "ns.t", conf,
      heldLease = Some("mine"))(_ => ())(
      b => TableMeta.withAppend(b, "append", Seq(f), conf))(())
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "commit must not wait out the TTL")
    // ownership stayed with the caller: the lease is still live
    assert(store.peekLease("ns", "t", System.currentTimeMillis(), 10000L)
      .contains("mine"))
    store.releaseLease("ns", "t", "mine")
    val got = TableMeta.read(store.load("ns", "t").get, conf)
    assert(got.snapshots.size == 2)
    store.close()
  }

  test("a crashed holder's stale lease never wedges the table") {
    // plant a lease whose holder died long ago (acquired_at past the TTL),
    // then commit through the production loop: the peek must read it as
    // free (no yielding), and the commit lands without anyone releasing it
    val (store, _) = freshStore("stale")
    val dir = java.nio.file.Files.createTempDirectory("stale").toString
    val base = TableMeta(1, dir, schema.json, Nil, Map.empty, 1L,
      Seq(SnapshotMeta(1L, 1000L, "append", Nil)))
    val loc = TableMeta.write(base, conf)
    assert(store.register("ns", "t", loc))
    assert(store.tryAcquireLease("ns", "t", "dead-holder",
      System.currentTimeMillis() - CasRetry.leaseTtlMs - 60000L, CasRetry.leaseTtlMs))
    val f = DataFileMeta(s"$dir/data/f.parquet", 10L, 100L,
      Map("k" -> "0"), Map("k" -> "9"), Map("k" -> 0L))
    val t0 = System.nanoTime()
    CasCommit.retryLoop(store, "ns", "t", loc, base, "append", "ns.t", conf)(
      _ => ())(b => TableMeta.withAppend(b, "append", Seq(f), conf))(())
    assert((System.nanoTime() - t0) / 1e9 < 5.0,
      "a stale lease must not gate anyone (no TTL-length wait)")
    assert(TableMeta.read(store.load("ns", "t").get, conf).snapshots.size == 2)
    // and a live starver can STEAL the dead row in place
    assert(store.tryAcquireLease("ns", "t", "successor",
      System.currentTimeMillis(), CasRetry.leaseTtlMs))
    store.releaseLease("ns", "t", "successor")
    store.close()
  }

  test("concurrent smoke: every commit lands exactly once under 4 racing writers") {
    val dir = java.nio.file.Files.createTempDirectory("leasesmoke").toString
    val url = s"jdbc:derby:memory:leasesmoke${System.nanoTime()};create=true"
    val boot = new PointerStore(url, "c")
    boot.initialize()
    val base = TableMeta(1, dir, schema.json, Nil, Map.empty, 1L,
      Seq(SnapshotMeta(1L, 1000L, "append", Nil)))
    val loc0 = TableMeta.write(base, conf)
    assert(boot.register("ns", "t", loc0))
    val writers = 4
    val commitsPer = 12
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          val store = new PointerStore(url, "c")
          try (0 until commitsPer).foreach { i =>
            val loc = store.load("ns", "t").get
            val b0 = TableMeta.read(loc, conf)
            val f = DataFileMeta(s"$dir/data/w$w-c$i.parquet", 10L, 100L,
              Map("k" -> "0"), Map("k" -> "9"), Map("k" -> 0L))
            CasCommit.retryLoop(store, "ns", "t", loc, b0, "append", "ns.t", conf)(
              _ => ())(b => TableMeta.withAppend(b, "append", Seq(f), conf))(())
          } catch { case e: Throwable => errs.add(e) }
          finally store.close()
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(5, java.util.concurrent.TimeUnit.MINUTES))
    assert(errs.isEmpty, s"commit failures: ${errs.toArray.mkString("; ")}")
    val finalMeta = TableMeta.read(boot.load("ns", "t").get, conf)
    assert(finalMeta.snapshots.size == writers * commitsPer + 1,
      "every commit exactly once")
    assert(finalMeta.snapshots.map(_.snapshotId).distinct.size ==
      finalMeta.snapshots.size, "no duplicate snapshot ids")
    // no lease left behind
    assert(boot.peekLease("ns", "t", System.currentTimeMillis(), 10000L).isEmpty)
    boot.close()
  }
}
