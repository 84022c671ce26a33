package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for q129's BFS core (`Relational.bfsCensus`): planted
  * graphs pin the hop bound (nodes beyond `hops` are absent from the
  * census), min-relaxation through diamonds (shortest of several paths
  * wins), and agreement with a local BFS on seeded random graphs.
  */
class BfsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def census(edges: Seq[(String, String)], seeds: Seq[String],
      hops: Int): Map[Int, Long] = {
    val und = edges ++ edges.map(_.swap) // undirected, like q129
    val e = und.toDF("src", "dst").repartition(5)
    val s = seeds.toDF("node")
    graft.queries.Relational.bfsCensus(spark, e, s, hops)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  private def localBfs(edges: Seq[(String, String)], seeds: Seq[String],
      hops: Int): Map[Int, Long] = {
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val dist = collection.mutable.Map(seeds.map(_ -> 0): _*)
    var frontier = seeds.toSet
    for (d <- 1 to hops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = d)
    }
    dist.values.groupBy(identity).map { case (d, v) => d -> v.size.toLong }
  }

  test("hop bound: a path node at distance 5 is absent from a 4-hop census") {
    // path a-b-c-d-e-f-g: from a, g is at distance 6, f at 5 — both absent
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e",
      "e" -> "f", "f" -> "g")
    val got = census(path, Seq("a"), hops = 4)
    assert(got == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L, 4 -> 1L), got.toString)
  }

  test("min relaxation: the short side of a diamond wins") {
    // a->x->z (2 hops) and a->p->q->r->z (4 hops): z must report 2
    val edges = Seq("a" -> "x", "x" -> "z",
      "a" -> "p", "p" -> "q", "q" -> "r", "r" -> "z")
    val got = census(edges, Seq("a"), hops = 4)
    assert(got == Map(0 -> 1L, 1 -> 2L, 2 -> 2L, 3 -> 1L), got.toString)
  }

  test("multi-source: seeds own distance 0, nearest seed wins") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val got = census(edges, Seq("a", "e"), hops = 4)
    // b and d are 1 from their nearest seed, c is 2 from either
    assert(got == Map(0 -> 2L, 1 -> 2L, 2 -> 1L), got.toString)
  }

  test("seeded random graph matches local BFS exactly") {
    val rnd = new scala.util.Random(11)
    val nodes = (0 until 40).map(i => s"n$i")
    val edges = Seq.fill(70)((nodes(rnd.nextInt(40)), nodes(rnd.nextInt(40))))
      .filter(e => e._1 != e._2).distinct
    val seeds = Seq("n0", "n7")
    assert(census(edges, seeds, 4) == localBfs(edges, seeds, 4))
  }
}
