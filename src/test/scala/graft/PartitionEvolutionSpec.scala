package graft

import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.TableMeta

/** Partition-spec EVOLUTION under spec history (round 12): evolutions are
  * metadata-only commits that archive the outgoing spec; pruning runs
  * under the UNION of historical specs so pre-evolution files keep
  * skipping on their own transform keys; SPJ self-disables on mixed
  * tables and compaction restores it. Ref `mod.rs` has no partition
  * concept at all — this is the beyond-reference scale surface that lets
  * a 100 TB table change bucket width without rewriting history.
  */
class PartitionEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private def lake = spark.sessionState.catalogManager.catalog("lake")
    .asInstanceOf[TableCatalog]
  private def metaOf(ns: String, t: String): TableMeta =
    lake.loadTable(Identifier.of(Array(ns), t))
      .asInstanceOf[graft.catalog.LakeTable].meta
  private def scannedFiles(df: org.apache.spark.sql.DataFrame, table: String): Int = {
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    val m = ("""LakeScan\(""" + java.util.regex.Pattern.quote(table) +
      """, (\d+) files\)""").r.findFirstMatchIn(leaves)
    assert(m.isDefined, s"expected a LakeScan leaf:\n$leaves")
    m.get.group(1).toInt
  }

  test("evolveSpec records history; legacy docs behave as spec 1") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val m0 = TableMeta.empty("memory:///t", schema, Seq("bucket(4,id)"), Map.empty)
    assert(m0.currentSpecId == 0 && m0.specIdNow == 1)
    assert(m0.specTable == Map("1" -> Seq("bucket(4,id)")))
    assert(m0.allPartitionColumns == Seq("bucket(4,id)"))
    // no-op evolution: same spec, no new id
    assert(m0.evolveSpec(Seq("bucket(4,id)")) eq m0)
    val m1 = m0.evolveSpec(Seq("bucket(8,id)"))
    assert(m1.currentSpecId == 2 && m1.partitionColumns == Seq("bucket(8,id)"))
    assert(m1.specTable == Map("1" -> Seq("bucket(4,id)"), "2" -> Seq("bucket(8,id)")))
    // union lists the CURRENT spec first, history after, deduplicated
    assert(m1.allPartitionColumns == Seq("bucket(8,id)", "bucket(4,id)"))
    // evolving BACK to an old spec: new id, union still two distinct specs
    val m2 = m1.evolveSpec(Seq("bucket(4,id)"))
    assert(m2.currentSpecId == 3 && m2.allPartitionColumns.toSet ==
      Set("bucket(4,id)", "bucket(8,id)"))
  }

  test("old-spec files keep bucket pruning after evolution (union pruning)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.pev")
    spark.sql("DROP TABLE IF EXISTS lake.pev.t")
    spark.sql("CREATE TABLE lake.pev.t (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO lake.pev.t SELECT id, id FROM range(1000)")
    val gen1 = metaOf("pev", "t").currentFiles.map(_.path).toSet

    graft.catalog.LakeMaintenance.setPartitionSpec(spark, "lake.pev.t", Seq("bucket(8,k)"))
    // SAME key domain as gen1 (distinct v) so a k-point-lookup can't prune
    // gen2 on plain k min/max — only the bucket stat can skip its files
    spark.sql("INSERT INTO lake.pev.t SELECT id, id + 1000000 FROM range(1000)")

    val m = metaOf("pev", "t")
    assert(m.partitionColumns == Seq("bucket(8,k)"))
    assert(m.specTable.values.toSet == Set(Seq("bucket(4,k)"), Seq("bucket(8,k)")))
    assert(m.allPartitionFields.flatMap(_.buckets).toSet == Set(4, 8))

    val files = m.currentFiles
    val b4 = spark.sql("SELECT pmod(hash(CAST(7 AS BIGINT)), 4)").head.getInt(0)
    val b8 = spark.sql("SELECT pmod(hash(CAST(7 AS BIGINT)), 8)").head.getInt(0)
    val gen1Matching = files.count(f => gen1(f.path) &&
      f.minValues.get("_bucket_4_k").contains(b4.toString))
    val gen2Matching = files.count(f => !gen1(f.path) &&
      f.minValues.get("_bucket_8_k").contains(b8.toString))
    val gen1Total = files.count(f => gen1(f.path))
    // need a layout where OLD-spec pruning actually buys something
    assert(gen1Matching > 0 && gen1Matching < gen1Total,
      s"need prunable old generation: $gen1Matching of $gen1Total")

    assert(gen2Matching > 0 && gen2Matching < files.size - gen1Total,
      s"need prunable new generation: $gen2Matching of ${files.size - gen1Total}")

    val q = spark.sql("SELECT v FROM lake.pev.t WHERE k = 7 ORDER BY v")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(7L, 1000007L))
    val scanned = scannedFiles(q, "lake.pev.t")
    // each generation prunes under ITS OWN spec: without union pruning the
    // old generation would be read wholesale (gen1Total + gen2Matching)
    assert(scanned == gen1Matching + gen2Matching,
      s"k = 7 must scan $gen1Matching old + $gen2Matching new files, scanned $scanned")
  }

  test("SPJ self-disables on a mixed-spec table; compaction restores it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.pev")
    spark.sql("DROP TABLE IF EXISTS lake.pev.a")
    spark.sql("DROP TABLE IF EXISTS lake.pev.b")
    spark.sql("CREATE TABLE lake.pev.a (k BIGINT, x BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("CREATE TABLE lake.pev.b (k BIGINT, y BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO lake.pev.a SELECT id, id FROM range(500)")
    spark.sql("INSERT INTO lake.pev.b SELECT id, id * 3 FROM range(400)")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def joinPlan(): String = {
        val j = spark.sql(
          "SELECT count(*) AS n FROM lake.pev.a a JOIN lake.pev.b b ON a.k = b.k")
        assert(j.collect().head.getLong(0) >= 400)
        j.queryExecution.executedPlan.toString
      }
      val p0 = joinPlan()
      assert(!p0.substring(p0.indexOf("Join")).contains("Exchange"),
        s"same-spec bucket join must not shuffle:\n$p0")

      // evolve ONE side wider: SPJ must self-disable (the current-spec key
      // parser finds no _bucket_16_k on pre-evolution files), never
      // silently co-locate two different hash layouts
      graft.catalog.LakeMaintenance.setPartitionSpec(spark, "lake.pev.a", Seq("bucket(16,k)"))
      spark.sql("INSERT INTO lake.pev.a SELECT id, id FROM range(500, 600)")
      val p1 = joinPlan()
      assert(p1.substring(p1.indexOf("Join")).contains("Exchange"),
        s"mixed-spec table must fall back to shuffle planning:\n$p1")

      // evolve back + compact: every live file re-clusters under bucket(8)
      // and the metadata-aligned join returns
      graft.catalog.LakeMaintenance.setPartitionSpec(spark, "lake.pev.a", Seq("bucket(8,k)"))
      graft.catalog.LakeMaintenance.compact(spark, "lake.pev.a")
      val p2 = joinPlan()
      assert(!p2.substring(p2.indexOf("Join")).contains("Exchange"),
        s"compaction under the restored spec must re-enable SPJ:\n$p2")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("$specs metadata table and time travel across an evolution") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.pev")
    spark.sql("DROP TABLE IF EXISTS lake.pev.tt")
    spark.sql("CREATE TABLE lake.pev.tt (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO lake.pev.tt SELECT id, id FROM range(100)") // snapshot 1
    graft.catalog.LakeMaintenance.setPartitionSpec(spark, "lake.pev.tt", Seq("k"))
    spark.sql("INSERT INTO lake.pev.tt SELECT id, id FROM range(100, 200)") // snapshot 2
    val specs = spark.sql(
      "SELECT spec_id, spec, is_current FROM lake.pev.`tt$specs` ORDER BY spec_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(specs == Seq((1, "bucket(4,k)", false), (2, "k", true)), s"got $specs")
    // time travel to the pre-evolution snapshot reads exactly gen1, pruning
    // under the OLD spec's keys (they stay in the planning union)
    assert(spark.sql("SELECT count(*) FROM lake.pev.tt VERSION AS OF 1")
      .head.getLong(0) == 100)
    assert(spark.sql("SELECT sum(v) FROM lake.pev.tt VERSION AS OF 1 WHERE k = 7")
      .head.getLong(0) == 7)
    assert(spark.table("lake.pev.tt").count() == 200)
    // a never-evolved table shows exactly one current spec
    spark.sql("DROP TABLE IF EXISTS lake.pev.one")
    spark.sql("CREATE TABLE lake.pev.one (k BIGINT) PARTITIONED BY (bucket(2, k))")
    val one = spark.sql("SELECT spec_id, spec, is_current FROM lake.pev.`one$specs`")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(one == Seq((1, "bucket(2,k)", true)), s"got $one")
  }
}
