package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property test for q121's degree-ordered triangle counting
  * (`Relational.trianglesPlan`): on seeded random bipartite data, the
  * distributed plan must agree EXACTLY with a local brute-force count —
  * edges, triangles, wedges, and the clustering coefficient — both with
  * the backbone cut inactive (k larger than the edge count) and with an
  * active top-k cut, whose (support DESC, u, v) tie-break the local model
  * reproduces literally.
  */
class TriangleSpec extends AnyFunSuite {
  import TestSpark._

  /** Local model: support per unordered pair from the distinct (p,s) set,
    * top-k backbone by (support DESC, u, v), brute-force triangle count.
    */
  private def bruteForce(ps: Seq[(Int, Int)], k: Int): (Long, Long, Long, Double) = {
    val byPart = ps.distinct.groupBy(_._1).values
    val support = collection.mutable.Map[(Int, Int), Int]()
    for (grp <- byPart; Seq(a, b) <- grp.map(_._2).sorted.combinations(2))
      support((a, b)) = support.getOrElse((a, b), 0) + 1
    val backbone = support.toSeq
      .sortBy { case ((u, v), s) => (-s, u, v) }.take(k).map(_._1)
    val adj = collection.mutable.Map[Int, Set[Int]]().withDefaultValue(Set.empty)
    for ((u, v) <- backbone) { adj(u) += v; adj(v) += u }
    val nodes = adj.keys.toSeq.sorted
    val tri = (for {
      Seq(a, b, c) <- nodes.combinations(3)
      if adj(a)(b) && adj(a)(c) && adj(b)(c)
    } yield 1).size.toLong
    val wedges = nodes.map(n => adj(n).size.toLong * (adj(n).size - 1) / 2).sum
    (backbone.size.toLong, tri, wedges, 3.0 * tri / wedges)
  }

  private def check(ps: Seq[(Int, Int)], k: Int): Unit = {
    import spark.implicits._
    val li = ps.toDF("l_partkey", "l_suppkey")
      .select(col("l_partkey").cast("long").as("l_partkey"),
        col("l_suppkey").cast("long").as("l_suppkey"))
      .repartition(7) // force real shuffles / multiple partitions
    val (out, e, o) = graft.queries.Relational.trianglesPlan(li, k)
    try {
      val r = out.collect().head
      val (en, tn, wn, cc) = bruteForce(ps, k)
      assert(r.getLong(0) == en, s"edges: got ${r.getLong(0)}, want $en")
      assert(r.getLong(1) == tn, s"triangles: got ${r.getLong(1)}, want $tn")
      assert(r.getLong(2) == wn, s"wedges: got ${r.getLong(2)}, want $wn")
      assert(r.getDouble(3) == cc, s"clustering: got ${r.getDouble(3)}, want $cc")
    } finally { o.unpersist(blocking = false); e.unpersist(blocking = false) }
  }

  test("distributed count matches brute force on seeded random bipartite data") {
    val rnd = new scala.util.Random(42)
    // 60 parts × ~4 suppliers from a pool of 25 (with duplicates — the
    // distinct inside the plan must absorb them)
    val ps = for (p <- 0 until 60; _ <- 0 until 4)
      yield (p, rnd.nextInt(25))
    check(ps, k = 100000) // backbone cut inactive: whole projection
  }

  test("active top-k backbone cut matches the local (support DESC, u, v) order") {
    val rnd = new scala.util.Random(7)
    val ps = for (p <- 0 until 80; _ <- 0 until 5)
      yield (p, rnd.nextInt(20))
    check(ps, k = 40) // cut well below the edge count — ties at the cutoff
  }

  test("degree cap bounds per-part pair generation on a planted hot key") {
    import spark.implicits._
    // planted hot key: one part supplied by 100 suppliers (uncapped it
    // fans out C(100,2)=4950 pairs on a single join key) + normal parts
    val hot = (0 until 100).map(sup => (999, sup))
    val rnd = new scala.util.Random(11)
    val norm = for (p <- 0 until 20; _ <- 0 until 4) yield (p, rnd.nextInt(25))
    val all = hot ++ norm
    val cap = 8
    val li = all.toDF("l_partkey", "l_suppkey")
      .select(col("l_partkey").cast("long").as("l_partkey"),
        col("l_suppkey").cast("long").as("l_suppkey"))
      .repartition(7)
    val (out, e, o) = graft.queries.Relational.trianglesPlan(li, 100000, degCap = cap)
    try {
      // semantics under the cap = brute force over the CAPPED projection
      // (deterministic keep: the cap smallest supplier keys per part)
      val capped = all.distinct.groupBy(_._1).toSeq.flatMap { case (p, grp) =>
        grp.map(_._2).distinct.sorted.take(cap).map(s => (p, s)) }
      val (en, tn, wn, cc) = bruteForce(capped, 100000)
      val r = out.collect().head
      assert(r.getLong(0) == en, s"edges: got ${r.getLong(0)}, want $en")
      assert(r.getLong(1) == tn, s"triangles: got ${r.getLong(1)}, want $tn")
      assert(r.getLong(2) == wn, s"wedges: got ${r.getLong(2)}, want $wn")
      assert(r.getDouble(3) == cc, s"clustering: got ${r.getDouble(3)}, want $cc")
      // the bound is real: the hot part contributes C(cap,2)=28 pairs, and
      // the whole edge set stays far below the uncapped hot-key fan-out
      assert(en < 4950, s"cap must bound the hot key's pair fan-out, got $en edges")
    } finally { o.unpersist(blocking = false); e.unpersist(blocking = false) }
  }

  test("triangle-free graph reports zero with sound wedge count") {
    // star topology: parts 0..9 each supplied by {hub=0, leaf=i+1} — every
    // edge touches the hub, so no triangle can close
    val ps = (0 until 10).flatMap(i => Seq((i, 0), (i, i + 1)))
    check(ps, k = 100000)
  }
}
