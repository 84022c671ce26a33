package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PqOps
import graft.queries.PqAnn

/** Product-quantization ANN: recall against the brute-force oracle,
  * materialized-index parity, codegen-vs-interpreted agreement, and the
  * codebook's property-packed wire form.
  */
class PqSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def top10Ids(q: String): Set[Long] =
    SparkEntry.queries(q)(spark, sf).select("vec_id").collect().map(_.getLong(0)).toSet

  test("codebook pack/unpack through table properties is bit-exact") {
    val cb = Array.tabulate(1024)(i => (math.sin(i) * 1e3).toFloat) ++
      Array(Float.MinPositiveValue, Float.MaxValue, -0f, 1e18f)
    val back = PqAnn.unpackFloats(PqAnn.packFloats(cb))
    assert(back.length == cb.length)
    assert(cb.zip(back).forall { case (a, b) =>
      java.lang.Float.floatToRawIntBits(a) == java.lang.Float.floatToRawIntBits(b) })
  }

  test("pq_encode / pq_adc: codegen and interpreted agree") {
    val cb = PqAnn.train(spark, emb.limit(100), m = 8, ksub = 8)
    val qvec = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toArray
    val lut = PqOps.ipLut(qvec, cb, 8, 8)
    def run(): Seq[String] = emb.limit(100)
      .select(col("vec_id"),
        PqOps.pqEncode(col("embedding"), cb, 8, 8).as("codes"))
      .select(col("vec_id"), col("codes"), PqOps.pqAdc(col("codes"), lut, 8).as("adc"))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val viaCodegen = run()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == viaCodegen)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("ADC approximates the true inner product (bounded reconstruction error)") {
    val cb = PqAnn.train(spark, emb, m = 16, ksub = 16)
    val qvec = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0).toArray
    val lut = PqOps.ipLut(qvec, cb, 16, 16)
    val q = broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("qe")))
    val errs = emb.crossJoin(q)
      .select(abs(PqOps.pqAdc(PqOps.pqEncode(col("embedding"), cb, 16, 16), lut, 16)
        - graft.functions.TextHashing.cosineSim(col("embedding"), col("qe"))).as("err"))
      .agg(avg("err"), max("err")).head()
    val (meanErr, maxErr) = (errs.getDouble(0), errs.getDouble(1))
    // unit vectors: true dot in [-1, 1]. 16 subspaces x 16 centroids over
    // 64 dims reconstructs coarsely but usefully; these bounds fail on a
    // broken LUT/encode (errors ~1) and pass with generous float headroom.
    assert(meanErr < 0.15, s"mean |adc - cos| = $meanErr")
    assert(maxErr < 0.5, s"max |adc - cos| = $maxErr")
  }

  test("q68 PQ probe: 10 rows, recall@10 vs brute force on the hostile corpus") {
    val df = SparkEntry.queries("q68_ann_pq")(spark, sf)
    assert(df.columns.toSeq == Seq("vec_id", "label", "sim"))
    val pq = df.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pq.size == 10)
    val recall = (pq intersect top10Ids("q26_embedding_topk")).size / 10.0
    // observed 0.8 with m=16, ksub=16, rerank=50; the floor leaves float
    // headroom while still failing on any real encode/ADC regression
    assert(recall >= 0.6, s"PQ recall@10 vs brute force was $recall")
  }

  test("q72 IVF-PQ probe: recall through both reductions, partition-pruned to probed cells") {
    val df = SparkEntry.queries("q72_ann_ivfpq")(spark, sf)
    val got = df.collect()
    assert(got.length == 10)
    val recall = (got.map(_.getLong(0)).toSet intersect top10Ids("q26_embedding_topk")).size / 10.0
    // nprobe=4 of 16 cells scans ~1/4 of the corpus on a near-orthogonal
    // (cell-hostile) distribution; observed 0.7
    assert(recall >= 0.4, s"IVF-PQ recall@10 was $recall")

    // the ADC scan is partition-pruned: the probe's LakeScan reads only
    // the files of the probed cells, never the whole code table
    val probe = PqAnn.probeIvfPqIndex(spark, "lake.idx.emb_ivfpq", emb, queryVecId = 0L)
    probe.collect()
    val t = spark.sessionState.catalogManager.catalog("lake")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("idx"), "emb_ivfpq"))
      .asInstanceOf[graft.catalog.LakeTable]
    val files = t.meta.currentFiles
    assert(files.forall(f => f.minValues.get("cell") == f.maxValues.get("cell")),
      "clustered write: every file single-valued on cell")
    val scanned = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    val m = """LakeScan\(lake\.idx\.emb_ivfpq, (\d+) files\)""".r.findFirstMatchIn(scanned)
    assert(m.isDefined, s"expected a lake scan over the IVF-PQ index:\n$scanned")
    assert(m.get.group(1).toInt < files.size,
      s"probe must scan a strict subset of the ${files.size} cell files, " +
        s"scanned ${m.get.group(1)}")
  }

  test("q69 materialized index probe: equals inline PQ, codes-only ADC scan") {
    val viaIndex = SparkEntry.queries("q69_ann_pq_index")(spark, sf)
    val got = viaIndex.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val inline = SparkEntry.queries("q68_ann_pq")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == inline,
      "probing the persisted codes must equal encoding on the fly (deterministic training)")
    // the index is self-describing: a fresh probe loads the codebook from
    // table properties, no retraining, and its ADC shortlist scans ONLY the
    // m-byte codes table
    val probe = PqAnn.probePqIndex(spark, "lake.idx.emb_pq", emb, queryVecId = 0L)
    probe.collect()
    val leaves = probe.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(leaves.contains("LakeScan(lake.idx.emb_pq"),
      s"expected a lake scan over the codes table:\n$leaves")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("pq_adc"), "ADC must run against the stored codes")
    assert(plan.contains("TakeOrderedAndProject"), "shortlist must be a top-k, not a global sort")
  }
}
