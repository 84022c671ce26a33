package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the operator that
  * turns near-duplicate PAIRS (MinHash/SimHash/embedding candidates) into
  * dedup CLUSTERS, so a pipeline can keep one canonical document per
  * group. The reference delegates all such compute to the engine
  * (reference: src/catalog/mod.rs:359-361).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014 — public
  * paper), which converges in O(log² n) rounds regardless of component
  * DIAMETER. The naive "label = min(neighbor labels), repeat" loop needs
  * O(diameter) rounds — a 10-million-hop chain of near-dups at 100 TB
  * would need 10 million shuffles; this needs ~40.
  *
  * Each round is two hash aggregations + two hash joins on the edge list
  * (no windows, no collect_list per node — a hot node with millions of
  * neighbors never materializes its adjacency in one task), and the
  * per-round result is local-checkpointed so the plan/lineage stays O(1)
  * across iterations.
  */
object ConnectedComponents {

  /** Release the RDD a `localCheckpoint()` pinned: Dataset.unpersist
    * can't reach it (the checkpoint is an internal RDD behind a
    * LogicalRDD, not a CacheManager entry), so without this every CC
    * round leaks one MEMORY_AND_DISK RDD for the session's lifetime —
    * caught by Bench's persistent-RDD assertion.
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** @param nodes one column `node` — every vertex (isolated ones included)
    * @param edges two columns `u`, `v` — undirected, dups/self-loops fine
    * @return `(node, comp)` where comp = the component's minimum node id;
    *         the plan pins the final round's checkpoint — callers that must
    *         not leak it use [[runWithRelease]]
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame =
    runWithRelease(nodes, edges, maxIter)._1

  /** [[run]] plus a release callback freeing the final round's checkpoint
    * RDD — call it after the returned plan's LAST action (the plan reads
    * the checkpoint, so release-then-act would recompute or fail).
    */
  def runWithRelease(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): (DataFrame, () => Unit) = {
    // INVARIANT between rounds: edges are distinct with u > v (enforced on
    // the initial set below, preserved by both stars) — so symmetrization
    // can't create duplicates and small-star needs no re-normalization.
    // That drops two distinct-shuffles from every round.

    // large-star: every neighbor LARGER than u links to the min of u's
    // neighborhood (incl. u) — hooks big ids downward in parallel
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      // emitted (v, m) has v > u >= m ⇒ u > v holds on the output too
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
    }
    // small-star: every neighbor SMALLER than u (and u itself) links to
    // u's minimum smaller neighbor — flattens chains into stars
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min(col("v")).as("m"))
      e.join(mins, "u").select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }
    // order-independent edge-set signature for fixpoint detection (decimal
    // sum: exact, and immune to ANSI long-overflow)
    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).collect()(0)
      (r.getLong(0), r.getDecimal(1))
    }

    var e = edges.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v")).distinct().localCheckpoint()
    var sig = signature(e)
    var converged = e.isEmpty
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      // the superseded round's checkpoint is dead the moment `next`
      // materialized (localCheckpoint is eager): release it, or a 50-round
      // run holds 50 edge-set copies in executor memory
      releaseCheckpoint(e)
      e = next
      i += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    val last = e
    // fixpoint = star forest: every non-root points at its component min
    (nodes.join(e.select(col("u").as("node"), col("v").as("comp")), Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp")),
      () => releaseCheckpoint(last))
  }
}
