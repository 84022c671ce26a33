package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PqOps
import graft.functions.TextHashing.cosineSim

/** Product-quantization ANN (Jégou et al. 2011) — the memory-scale path
  * that completes the ANN family (q26 brute force, q38/q52 LSH buckets,
  * q51 IVF cells): compress every vector to `m` bytes of centroid codes,
  * scan the CODES with a per-query lookup table (ADC), exact-re-rank only
  * the short candidate list. At 100 TB the float corpus never fits anywhere
  * — its PQ codes (m bytes vs 4·D) fit in a fraction of the cluster's page
  * cache, so the probe's full "scan" is over ~1/128th of the data, all of
  * it codegen table lookups.
  *
  * Training is distributed (per-subspace k-means as hash-agg over the
  * corpus — hash-seeded assignment plus Lloyd refinements, the q51
  * pattern); only the m × ksub × subDim centroid floats are collected:
  * planning metadata, like every ANN library's trained index header.
  */
object PqAnn {

  /** Squared L2 distance (the k-means assignment metric) — the codegen
    * `l2_sq` expression; as an interpreted `aggregate(zip_with(...))` this
    * scored-pairs loop dominated training time.
    */
  private def l2sq(a: Column, b: Column): Column = PqOps.l2Sq(a, b)

  /** Train per-subspace codebooks over `emb.embedding` (array<float>,
    * fixed dim divisible by m). Returns the flat codebook
    * `cb[(sub*ksub + cell)*subDim + d]`; cells that end up empty keep a
    * sentinel far-away centroid (1e18) so encode never selects them.
    */
  def train(s: SparkSession, emb: DataFrame, m: Int, ksub: Int, iters: Int = 2): Array[Float] = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"pq train: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val vavg = udaf(graft.functions.VectorAvg)

    // one row per (vector, subspace): the m slices of each embedding.
    // Persisted across the Lloyd passes — each pass re-reads the training
    // set, and re-running the scan + explode lineage per pass triples the
    // I/O for no reason. (At 100 TB the training set is a deterministic
    // SAMPLE of the corpus — k-means on a few hundred thousand vectors
    // saturates codebook quality; the cache holds the sample, not the
    // corpus.)
    val subs = emb.select(col("vec_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        i => slice(col("embedding"), i * subDim + 1, lit(subDim)))).as(Seq("sub", "svec")))
      .persist()

    try {
      def centroidsOf(assigned: DataFrame): DataFrame = assigned
        .groupBy("sub", "cell").agg(vavg(col("svec")).as("cvec"))
        .select(col("sub").as("c_sub"), col("cell").as("c_cell"),
          transform(col("cvec"), x => x.cast("float")).as("c_vec"))

      // deterministic hash seeding, then Lloyd refinements; assignment is ONE
      // hash aggregation per pass (min_by over a broadcast centroid join)
      var cents = centroidsOf(subs.withColumn(
        "cell", pmod(xxhash64(col("vec_id"), col("sub")), lit(ksub)).cast("int")))
      var it = 0
      while (it < iters) {
        val assigned = subs.join(broadcast(cents), col("sub") === col("c_sub"))
          .withColumn("dist", l2sq(col("svec"), col("c_vec")))
          .groupBy("vec_id", "sub")
          .agg(first(col("svec")).as("svec"),
            min_by(col("c_cell"), struct(col("dist"), col("c_cell"))).as("cell"))
        cents = centroidsOf(assigned)
        it += 1
      }

      val out = Array.fill(m * ksub * subDim)(1e18f) // empty-cell sentinel
      cents.collect().foreach { r =>
        val sub = r.getAs[Int]("c_sub")
        val cell = r.getAs[Int]("c_cell")
        val vec = r.getAs[scala.collection.Seq[Float]]("c_vec")
        var d = 0
        while (d < subDim) { out((sub * ksub + cell) * subDim + d) = vec(d); d += 1 }
      }
      out
    } finally subs.unpersist(blocking = false)
  }

  /** End-to-end PQ probe: train, encode (one scan → m bytes/vector), ADC
    * top-`rerank` shortlist, exact cosine re-rank → top-`k`. The corpus
    * embeddings are unit vectors, so the inner-product LUT scores
    * approximate cosine directly.
    */
  def topK(s: SparkSession, emb: DataFrame, queryVecId: Long, k: Int = 10,
      m: Int = 16, ksub: Int = 16, rerank: Int = 50): DataFrame = {
    val base = emb.select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
    val cb = train(s, base, m, ksub)
    val qvec = base.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getAs[scala.collection.Seq[Float]](0).toArray
    val lut = PqOps.ipLut(qvec, cb, m, ksub)
    // encode + ADC fused in one codegen scan here (end-to-end demo); the
    // materialized variant below scans PRE-ENCODED codes, m bytes/vector
    val shortlist = base.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        PqOps.pqAdc(PqOps.pqEncode(col("embedding"), cb, m, ksub), lut, ksub).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rerank)
      .select(col("vec_id"))
    // exact re-rank of the shortlist only (broadcast semi-join back to floats)
    val q = broadcast(base.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe")))
    base.join(broadcast(shortlist), "vec_id")
      .crossJoin(q)
      .select(col("vec_id"), col("label"), cosineSim(col("embedding"), col("qe")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Build (replace) the MATERIALIZED PQ index as a lake table: one scan of
    * the corpus encodes every vector to m bytes; the trained codebook is
    * persisted base64-packed in the table's properties, so the index is
    * fully self-describing in the catalog — any later session probes it
    * without retraining. The 100 TB float corpus reduces to codes a probe
    * can scan wholesale.
    */
  def buildPqIndex(s: SparkSession, emb: DataFrame, indexTable: String,
      m: Int = 16, ksub: Int = 16): Unit = {
    val base = emb.select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
    val cb = train(s, base, m, ksub)
    val ns = indexTable.split('.').dropRight(1).mkString(".")
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
    s.sql(s"DROP TABLE IF EXISTS $indexTable")
    s.sql(s"CREATE TABLE $indexTable (vec_id BIGINT, label INT, codes ARRAY<TINYINT>)")
    s.sql(s"ALTER TABLE $indexTable SET TBLPROPERTIES (" +
      s"'pq.codebook'='${packFloats(cb)}', 'pq.m'='$m', 'pq.ksub'='$ksub')")
    base.select(col("vec_id"), col("label"),
        PqOps.pqEncode(col("embedding"), cb, m, ksub).as("codes"))
      .writeTo(indexTable).append()
  }

  /** Top-k probe against the materialized index: read the codebook from
    * the table properties, scan ONLY the codes table with the ADC
    * expression, re-rank the shortlist against the float corpus.
    */
  def probePqIndex(s: SparkSession, indexTable: String, emb: DataFrame,
      queryVecId: Long, k: Int = 10, rerank: Int = 50): DataFrame = {
    val props = {
      val rows = s.sql(s"SHOW TBLPROPERTIES $indexTable").collect()
      rows.map(r => r.getString(0) -> r.getString(1)).toMap
    }
    val cb = unpackFloats(props("pq.codebook"))
    val m = props("pq.m").toInt
    val ksub = props("pq.ksub").toInt
    val base = emb.select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
    val qvec = base.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getAs[scala.collection.Seq[Float]](0).toArray
    val lut = PqOps.ipLut(qvec, cb, m, ksub)
    val shortlist = s.table(indexTable)
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), PqOps.pqAdc(col("codes"), lut, ksub).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rerank)
      .select(col("vec_id"))
    val q = broadcast(base.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe")))
    base.join(broadcast(shortlist), "vec_id")
      .crossJoin(q)
      .select(col("vec_id"), col("label"), cosineSim(col("embedding"), col("qe")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Build (replace) the IVF-PQ index — the FAISS IVFADC composition and
    * the full 100 TB ANN shape: vectors assign to a coarse k-means cell
    * (q51's IVF layer), the index table is `PARTITIONED BY (cell)` so the
    * catalog's clustered write gives every file min==max on cell, and each
    * row stores only the m-byte PQ codes. A probe prunes to the few files
    * of its probed cells (manifest stats, no directory listing), ADC-scans
    * those codes, and re-ranks a short float list: I/O ∝ (probed cells ×
    * m bytes), independent of corpus size in BOTH dimensions — rows via
    * the cell prune, bytes-per-row via PQ. Coarse centroids and codebook
    * both persist in table properties: the index is self-describing.
    */
  def buildIvfPqIndex(s: SparkSession, emb: DataFrame, indexTable: String,
      cells: Int = 16, m: Int = 16, ksub: Int = 16,
      frozen: Option[(Array[Float], Array[Float])] = None): Unit = {
    require(cells <= 128, "ivf-pq: cell ids ride in a signed byte code") // see assignCell
    val base = emb.select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
    // frozen = (codebook, coarse): a caller may pin pre-trained parameters
    // (q192's oracled frozen-literal index) instead of re-training per build
    val cb = frozen.map(_._1).getOrElse(train(s, base, m, ksub))
    val coarse = frozen.map(_._2).getOrElse(trainCoarse(s, base, cells))
    val ns = indexTable.split('.').dropRight(1).mkString(".")
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
    s.sql(s"DROP TABLE IF EXISTS $indexTable")
    s.sql(s"CREATE TABLE $indexTable (cell INT, vec_id BIGINT, label INT, codes ARRAY<TINYINT>)" +
      " PARTITIONED BY (cell)")
    s.sql(s"ALTER TABLE $indexTable SET TBLPROPERTIES (" +
      s"'pq.codebook'='${packFloats(cb)}', 'pq.m'='$m', 'pq.ksub'='$ksub'," +
      s"'ivf.centroids'='${packFloats(coarse)}', 'ivf.cells'='$cells')")
    base.select(assignCell(col("embedding"), coarse, cells).as("cell"),
        col("vec_id"), col("label"),
        PqOps.pqEncode(col("embedding"), cb, m, ksub).as("codes"))
      .writeTo(indexTable).append()
  }

  /** Incremental index maintenance: encode ONLY `newVecs` under the
    * parameters PINNED at build time (TBLPROPERTIES) and append their
    * (cell, codes) rows — the daily-ingest path at 100 TB: O(new vectors)
    * work, no rebuild, no retraining (parameters are frozen at build, so
    * a refreshed index answers IDENTICALLY to a full rebuild — q199
    * hash-gates exactly that equivalence against the from-scratch DuckDB
    * replay). Each appended file lands partition-clustered by cell, so
    * probes keep pruning to the probed cells' files after any number of
    * refreshes. Assumes new vec_ids (the ingest contract); replacing
    * existing vectors would route through the eq-delete MERGE instead.
    */
  def refreshIvfPqIndex(s: SparkSession, indexTable: String, newVecs: DataFrame): Unit = {
    val props = s.sql(s"SHOW TBLPROPERTIES $indexTable").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val cb = unpackFloats(props("pq.codebook"))
    val m = props("pq.m").toInt
    val ksub = props("pq.ksub").toInt
    val coarse = unpackFloats(props("ivf.centroids"))
    val cells = props("ivf.cells").toInt
    newVecs.select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
      .select(assignCell(col("embedding"), coarse, cells).as("cell"),
        col("vec_id"), col("label"),
        PqOps.pqEncode(col("embedding"), cb, m, ksub).as("codes"))
      .writeTo(indexTable).append()
  }

  /** Top-k IVF-PQ probe: nearest `nprobe` cells chosen driver-side from
    * the persisted coarse centroids, a partition-pruned ADC scan of those
    * cells' code files, exact re-rank of the shortlist.
    */
  def probeIvfPqIndex(s: SparkSession, indexTable: String, emb: DataFrame,
      queryVecId: Long, k: Int = 10, nprobe: Int = 4, rerank: Int = 50): DataFrame = {
    val props = s.sql(s"SHOW TBLPROPERTIES $indexTable").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val cb = unpackFloats(props("pq.codebook"))
    val m = props("pq.m").toInt
    val ksub = props("pq.ksub").toInt
    val coarse = unpackFloats(props("ivf.centroids"))
    val cells = props("ivf.cells").toInt
    val base = emb.select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
    val qvec = base.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getAs[scala.collection.Seq[Float]](0).toArray
    val lut = PqOps.ipLut(qvec, cb, m, ksub)
    val probed = nearestCells(qvec, coarse, cells, nprobe)
    val shortlist = s.table(indexTable)
      .filter(col("cell").isin(probed: _*)) // partition-pruned to the probed cells' files
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), PqOps.pqAdc(col("codes"), lut, ksub).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rerank)
      .select(col("vec_id"))
    val q = broadcast(base.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe")))
    base.join(broadcast(shortlist), "vec_id")
      .crossJoin(q)
      .select(col("vec_id"), col("label"), cosineSim(col("embedding"), col("qe")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** [[probeIvfPqIndex]] for an EXTERNAL query vector (the production ANN
    * shape: the probe is an arbitrary embedding, not a corpus row — no
    * self-exclusion). Same pipeline: partition-pruned ADC scan of the
    * `nprobe` nearest cells, exact cosine re-rank of the shortlist. The
    * assigned cell rides in the output so an oracle can pin the IVF
    * assignment, not just the final ranking.
    */
  def probeIvfPqIndexVec(s: SparkSession, indexTable: String, emb: DataFrame,
      qvec: Array[Float], k: Int = 10, nprobe: Int = 4, rerank: Int = 50): DataFrame = {
    val props = s.sql(s"SHOW TBLPROPERTIES $indexTable").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val cb = unpackFloats(props("pq.codebook"))
    val m = props("pq.m").toInt
    val ksub = props("pq.ksub").toInt
    val coarse = unpackFloats(props("ivf.centroids"))
    val cells = props("ivf.cells").toInt
    val base = emb.select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
    val lut = PqOps.ipLut(qvec, cb, m, ksub)
    val probed = nearestCells(qvec, coarse, cells, nprobe)
    val shortlist = s.table(indexTable)
      .filter(col("cell").isin(probed: _*)) // partition-pruned to the probed cells' files
      .select(col("vec_id"), col("cell"), PqOps.pqAdc(col("codes"), lut, ksub).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rerank)
      .select(col("vec_id"), col("cell"))
    base.join(broadcast(shortlist), "vec_id")
      .select(col("vec_id"), col("label"), col("cell").cast("int").as("cell"),
        cosineSim(col("embedding"), lit(qvec)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Coarse IVF centroids (flat `cells × dim`): whole-vector k-means, the
    * same hash-seed + Lloyd shape as the subspace trainer.
    */
  private[queries] def trainCoarse(s: SparkSession, emb: DataFrame, cells: Int,
      iters: Int = 2): Array[Float] = {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val vavg = udaf(graft.functions.VectorAvg)
    val vecs = emb.select(col("vec_id"), col("embedding")).persist()
    try {
      def centroidsOf(assigned: DataFrame): DataFrame = assigned
        .groupBy("cell").agg(vavg(col("embedding")).as("cvec"))
        .select(col("cell").as("c_cell"), transform(col("cvec"), x => x.cast("float")).as("c_vec"))
      var cents = centroidsOf(vecs.withColumn(
        "cell", pmod(xxhash64(col("vec_id")), lit(cells)).cast("int")))
      var it = 0
      while (it < iters) {
        val assigned = vecs.crossJoin(broadcast(cents))
          .withColumn("dist", PqOps.l2Sq(col("embedding"), col("c_vec")))
          .groupBy("vec_id")
          .agg(first(col("embedding")).as("embedding"),
            min_by(col("c_cell"), struct(col("dist"), col("c_cell"))).as("cell"))
        cents = centroidsOf(assigned)
        it += 1
      }
      val out = Array.fill(cells * dim)(1e18f)
      cents.collect().foreach { r =>
        val cell = r.getAs[Int]("c_cell")
        val vec = r.getAs[scala.collection.Seq[Float]]("c_vec")
        var d = 0
        while (d < dim) { out(cell * dim + d) = vec(d); d += 1 }
      }
      out
    } finally vecs.unpersist(blocking = false)
  }

  /** Nearest-coarse-cell assignment as a codegen scan expression: encode
    * against the coarse "codebook" viewed as ONE subspace of `cells`
    * centroids, then read the single code out as the cell id.
    */
  private[graft] def assignCell(vec: Column, coarse: Array[Float], cells: Int): Column =
    element_at(PqOps.pqEncode(vec, coarse, 1, cells), 1).cast("int")

  /** The query's `nprobe` nearest coarse cells (driver-side, it is query
    * planning — the same argmin the scan expression applies row-side).
    */
  private[graft] def nearestCells(q: Array[Float], coarse: Array[Float], cells: Int,
      nprobe: Int): Seq[Int] = {
    val dim = coarse.length / cells
    (0 until cells).map { c =>
      var d2 = 0d
      var d = 0
      while (d < dim) {
        val diff = q(d) - coarse(c * dim + d)
        d2 += diff * diff
        d += 1
      }
      (d2, c)
    }.sorted.take(nprobe).map(_._2)
  }

  /** Base64 of the little-endian float bytes — the codebook's wire form in
    * table properties (m·ksub·subDim floats ≈ a few KB).
    */
  private[graft] def packFloats(a: Array[Float]): String = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    a.foreach(bb.putFloat)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  private[graft] def unpackFloats(s: String): Array[Float] = {
    val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(s))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bb.remaining() / 4)(bb.getFloat)
  }
}
