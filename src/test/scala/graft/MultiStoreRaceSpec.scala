package graft

import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._

/** Multi-process commit safety (VERDICT r11 #5): the reference's deployment
  * shape is N INDEPENDENT PROCESSES where only the database serializes —
  * `PointerStore`'s `synchronized` must be a single-connection convenience,
  * never a correctness crutch. A literal two-JVM test is environment-blocked
  * (no derbynet.jar in the image, and embedded Derby's dual-boot lock
  * forbids two JVMs on one database directory — carried in SURVEY), so this
  * spec proves the same property at its root: `synchronized` is PER
  * INSTANCE, each simulated process gets its OWN store instance, and the
  * monitors are therefore provably disjoint — exactly the isolation two
  * processes would have. If anything in the commit path relied on a shared
  * JVM lock (a static monitor, a shared connection), the timing test below
  * would serialize and the race tests would lose or double commits.
  */
class MultiStoreRaceSpec extends AnyFunSuite {

  private val conf = new org.apache.hadoop.conf.Configuration()
  private val schema = StructType(Seq(StructField("k", LongType)))

  private def freshDb(tag: String): String =
    s"jdbc:derby:memory:race$tag${System.nanoTime()};create=true"

  private def dataFile(dir: String, tag: String): DataFileMeta =
    DataFileMeta(s"$dir/data/$tag.parquet", 100L, 1000L,
      Map("k" -> "0"), Map("k" -> "999"), Map("k" -> 0L))

  test("store monitors are disjoint: two instances sleep the injected RTT in PARALLEL") {
    val url = freshDb("par")
    val boot = new PointerStore(url, "c")
    boot.initialize()
    require(boot.register("ns", "t", "loc0"))
    val s1 = new PointerStore(url, "c")
    val s2 = new PointerStore(url, "c")
    PointerStore.injectedLatencyMs.set(400L)
    try {
      val barrier = new CyclicBarrier(2)
      val pool = Executors.newFixedThreadPool(2)
      val t0 = System.nanoTime()
      val f1 = pool.submit(new Runnable {
        def run(): Unit = { barrier.await(); s1.load("ns", "t") } })
      val f2 = pool.submit(new Runnable {
        def run(): Unit = { barrier.await(); s2.load("ns", "t") } })
      f1.get(); f2.get()
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      pool.shutdown()
      // serialized through a shared lock the two 400 ms sleeps would cost
      // >= 800 ms; disjoint monitors overlap them. The 300 ms slack keeps
      // the assertion robust under CI scheduler noise.
      assert(elapsedMs < 700.0,
        f"two store instances serialized ($elapsedMs%.0f ms for two 400 ms RTTs) — " +
          "a shared JVM lock is load-bearing")
    } finally {
      PointerStore.injectedLatencyMs.set(0L)
      s1.close(); s2.close(); boot.close()
    }
  }

  test("simultaneous guarded CAS from two instances: the DATABASE picks exactly one winner") {
    val url = freshDb("cas")
    val boot = new PointerStore(url, "c")
    boot.initialize()
    require(boot.register("ns", "t", "base"))
    val stores = Seq.fill(2)(new PointerStore(url, "c"))
    try {
      (1 to 20).foreach { round =>
        val cur = boot.load("ns", "t").get
        val barrier = new CyclicBarrier(2)
        val pool = Executors.newFixedThreadPool(2)
        val results = stores.zipWithIndex.map { case (st, i) =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            def call(): Int = { barrier.await(); st.casUpdate("ns", "t", s"r$round-w$i", cur) }
          })
        }
        val wins = results.map(_.get()).sum
        pool.shutdown()
        assert(wins == 1, s"round $round: $wins CAS winners (must be exactly 1)")
      }
    } finally { stores.foreach(_.close()); boot.close() }
  }

  test("full retryLoop race, one store instance per writer: exactly-once, nothing lost") {
    val url = freshDb("loop")
    val dir = java.nio.file.Files.createTempDirectory("racespec").toString
    val boot = new PointerStore(url, "c")
    boot.initialize()
    val base = TableMeta(1, dir, schema.json, Nil, Map.empty, 1L,
      Seq(SnapshotMeta(1L, 1000L, "append", Nil)))
    require(boot.register("ns", "t", TableMeta.write(base, conf)))
    val writers = 6
    val commitsPer = 15
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val store = new PointerStore(url, "c") // own instance = own monitor
          start.await()
          try {
            (0 until commitsPer).foreach { i =>
              val loc = store.load("ns", "t").get
              val b = TableMeta.read(loc, conf)
              CasCommit.retryLoop(store, "ns", "t", loc, b, "append", "ns.t", conf)(
                _ => ())(
                m => TableMeta.withAppend(m, "append", Seq(dataFile(dir, s"w$w-c$i")), conf))(
                ())
            }
          } catch { case e: Throwable => failures.add(s"writer $w: ${e.getMessage}") }
          finally store.close()
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(5, TimeUnit.MINUTES))
    assert(failures.isEmpty, failures.toArray.mkString("; "))
    val m = TableMeta.read(boot.load("ns", "t").get, conf)
    assert(m.snapshots.size == writers * commitsPer + 1,
      s"expected ${writers * commitsPer + 1} snapshots, got ${m.snapshots.size}")
    assert(m.snapshots.map(_.snapshotId).distinct.size == m.snapshots.size)
    assert(m.currentFiles.size == writers * commitsPer)
    boot.close()
  }
}
