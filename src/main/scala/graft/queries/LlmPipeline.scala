package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextHashing.{cosineSim, minhashSignature}
import graft.functions.VectorHashing.srpBands

/** LLM-training-data pipeline operators (north star; SURVEY §2b bottom
  * rows): dedup (exact, MinHash/LSH, SimHash), similarity search over
  * embeddings, text analysis, language-ID, quality scoring, multimodal
  * plumbing. The reference delegates all compute to the engine
  * (reference: src/catalog/mod.rs:359-361); these are the engine-surface
  * operators a 100 TB training-data pipeline needs.
  *
  * Scale posture notes per query are inline — the common rules: candidate
  * generation is always bucketed (LSH bands) and NEVER all-pairs; top-k is
  * per-partition top-k + merge (TakeOrderedAndProject), never a global
  * sort; the only broadcast is the single-row query vector.
  */
object LlmPipeline {

  /** words = split on single space, lowercased (kept identical to the
    * DuckDB oracle's string_split).
    */
  private def words(c: Column): Column = split(lower(c), " ")

  /** q107's FIXED merge table ("left right", index = rank) — shared
    * verbatim by the Spark encode expression and the DuckDB recursive-CTE
    * oracle. Chosen to force multi-round, rank-order-sensitive merges on
    * the corpus vocabulary (table/value/scan/row assemble fully).
    */
  private[graft] val Q107Merges: Array[String] = Array(
    "t a", "ta b", "tab l", "tabl e",
    "v a", "va l", "val u", "valu e",
    "r o", "ro w", "a n", "s c", "sc an", "e r", "o r")

  /** q196/q197's BM25 scorer (k1=1.2, b=0.75) over the fixed query-term
    * list. Every arithmetic step mirrors the oracle SQL's association
    * exactly; the per-term score rides DECIMAL(18,6) into the per-doc sum
    * (order-independent, engine-exact). The tiny df/stats sides broadcast;
    * the only corpus-sized shuffles are the token hash-aggs and the
    * doc_id-keyed tf⋈len join.
    */
  private val Q196Terms = Seq("join", "hash", "window", "dup")

  /** q196's oracle, shared VERBATIM by q201: a probe of the materialized
    * inverted index must equal the from-scratch corpus scan bit-for-bit.
    */
  private[graft] val Bm25OracleSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |              FROM documents),
      |dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM toks GROUP BY doc_id),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |              CAST(sum(len) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |q AS (SELECT * FROM (VALUES ('join'), ('hash'), ('window'), ('dup')) v(tok)),
      |tf AS (SELECT t.doc_id, t.tok, count(*)::BIGINT AS tf
      |       FROM toks t JOIN q USING (tok) GROUP BY t.doc_id, t.tok),
      |idf AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok)
      |SELECT tf.doc_id, count(*)::BIGINT AS n_terms,
      |  CAST(sum(CAST(
      |    ln((st.n - idf.df + 0.5e0) / (idf.df + 0.5e0) + 1.0e0) *
      |    (tf.tf * 2.2e0) /
      |    (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.len / st.avgdl))
      |    AS DECIMAL(18,6))) AS DOUBLE) AS score
      |FROM tf JOIN idf USING (tok) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
      |GROUP BY tf.doc_id
      |ORDER BY score DESC, tf.doc_id LIMIT 20""".stripMargin

  /** One BM25 term score (k1=1.2, b=0.75) — the association mirrors
    * [[Bm25OracleSql]] token for token; shared by the corpus-scan scorer
    * and the index probe so the two can never drift.
    */
  private[graft] def bm25TermScore(tf: Column, df: Column, len: Column,
      n: Column, avgdl: Column): Column =
    (log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0)) *
      (tf * lit(2.2)) /
      (tf + lit(1.2) * (lit(0.25) + lit(0.75) * len / avgdl))
      ).cast("decimal(18,6)")

  /** Fixed probe terms exposed for the q201 index probe. */
  private[graft] def bm25Terms: Seq[String] = Q196Terms
  private def bm25Scores(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val st = dl.agg(count(lit(1)).cast("double").as("n"),
      (sum("len").cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("tok").isin(Q196Terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfc), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .withColumn("term_score", bm25TermScore(
        col("tf"), col("df"), col("len"), col("n"), col("avgdl")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum("term_score").cast("double").as("score"))
      .select(col("doc_id"), col("n_terms"), col("score"))
  }

  /** q195's oracle: the BPE merge loop UNROLLED as `n` chained CTE steps.
    * Each step is one training round over the evolving word histogram —
    * pairs_i counts every adjacent token pair weighted by word count
    * (overlapping occurrences counted, exactly the driver loop's pass),
    * best_i is the argmax under the driver's tie-break (count desc, then
    * lexicographically smallest pair), hist_{i+1} applies the merge via
    * left-to-right non-overlapping `replace` over the whole-token chr(31)
    * delimitation proven by q107. Aggregation-per-round makes this
    * inexpressible as ONE recursive CTE (SQL forbids aggregates over the
    * recursive reference), hence generated unrolling. Cost per step is
    * O(types x word length) over the bounded top-20k histogram — constant
    * in corpus size, matching the trainer's 100 TB split.
    */
  private def q195TrainSql(n: Int): String = {
    val steps = (0 until n).map { i =>
      s"""pairs_$i AS (
         |  SELECT toks[i] AS l, toks[i + 1] AS r, wc
         |  FROM (SELECT toks, wc,
         |               unnest(generate_series(1, len(toks) - 1)) AS i
         |        FROM (SELECT list_filter(string_split(s, chr(31)),
         |                                 x -> x <> '') AS toks, wc
         |              FROM hist_$i))
         |),
         |best_$i AS (
         |  SELECT l, r, c
         |  FROM (SELECT l, r, SUM(wc)::BIGINT AS c
         |        FROM pairs_$i GROUP BY l, r HAVING SUM(wc) > 1)
         |  ORDER BY c DESC, l, r LIMIT 1
         |),
         |hist_${i + 1} AS (
         |  SELECT h.word, h.wc,
         |         replace(h.s, chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
         |                 chr(31) || b.l || b.r || chr(31)) AS s
         |  FROM hist_$i h, best_$i b
         |)""".stripMargin
    }
    val union = (0 until n)
      .map(i => s"SELECT $i::INT AS rank, l AS lft, r AS rgt, c AS cnt FROM best_$i")
      .mkString("\n  UNION ALL ")
    s"""WITH
       |hist_0 AS (
       |  SELECT word, wc,
       |         regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g') AS s
       |  FROM (SELECT word, wc,
       |               row_number() OVER (ORDER BY wc DESC, word) AS rn
       |        FROM (SELECT word, count(*)::BIGINT AS wc
       |              FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
       |                    FROM documents)
       |              WHERE word ~ '^[ -~]+$$' GROUP BY word))
       |  WHERE rn <= 20000
       |),
       |${steps.mkString(",\n")}
       |SELECT * FROM (
       |  $union
       |) ORDER BY rank""".stripMargin
  }

  /** q150's fixed phrase list — literal in BOTH engines (the probe input a
    * user supplies; chosen from the corpus vocabulary so matches exist,
    * with a repeated-term phrase to exercise the count(DISTINCT off)
    * correctness leg).
    */
  private[graft] val Q150Phrases: Array[String] =
    Array("key agg row", "scan slow fast", "table value part", "query query")

  /** Distinct 3-word shingles — the discriminating unit for near-dup
    * detection (word UNIgrams are useless on a small shared vocabulary:
    * nearly everything looks similar; 3-grams separate the planted
    * near-dups at J>=0.9 from background <0.4). Built by the word_ngrams
    * codegen expression: the interpreted transform/element_at/concat_ws
    * chain it replaced dominated the dedup queries' runtime (per-token
    * expression dispatch over ~2k tokens x 5k docs).
    */
  private def shingles3(c: Column): Column = {
    val w = words(c)
    // SORTED distinct shingles: the exact-Jaccard verify intersects by
    // linear merge over the sort order (sorted_intersect_size); sorting
    // once per DOC here is amortized over every candidate PAIR there
    array_sort(array_distinct(
      when(size(w) >= 3, graft.functions.TextHashing.wordNgrams(w, 3))
        .otherwise(array(lower(c)))))
  }

  /** DuckDB replay of q33: same literal table, same XOR shingle hash, same
    * +1/-1 majority vote per bit, same 16-bit band buckets and hamming<=6
    * verify. Shingle positions come from an index probe into the token
    * list (WITH ORDINALITY is unavailable); 300 bounds the corpus's
    * max tokens per doc (observed max 100).
    */
  private val simhashOracleSql: String = {
    val values = graft.functions.FixedSimhash.table
      .map { case (t, a, b, c) => s"('$t', $a, $b, $c)" }.mkString(",\n  ")
    s"""WITH ht(token, h1, h2, h3) AS (VALUES
       |  $values),
       |tok AS (
       |  SELECT doc_id, ts[i.i] AS token, i.i AS pos
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
       |       (SELECT unnest(range(1, 301)) AS i) i
       |  WHERE i.i <= len(ts)),
       |th AS (SELECT doc_id, pos, h1, h2, h3 FROM tok JOIN ht USING (token)),
       |sh AS (
       |  SELECT a.doc_id, xor(xor(a.h1, b.h2), c.h3) AS hv
       |  FROM th a
       |  JOIN th b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  JOIN th c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
       |bits AS (
       |  SELECT doc_id, bb.b,
       |    CASE WHEN sum(CASE WHEN (hv >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
       |      THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |  FROM sh CROSS JOIN (SELECT unnest(range(64)) AS b) bb GROUP BY doc_id, bb.b),
       |sig AS (SELECT doc_id, sum(bit << b)::BIGINT AS sh64 FROM bits GROUP BY doc_id),
       |ch AS (
       |  SELECT doc_id, sh64, cc.c, (sh64 >> (cc.c * 16)) & 65535 AS cv
       |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS c) cc),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    bit_count(xor(a.sh64, b.sh64)) AS hamming
       |  FROM ch a JOIN ch b ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sh64, b.sh64)) <= 6)
       |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
       |FROM pairs ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB replay of q38/q52 SRP-LSH banding: the hyperplane sign masks
    * come from the SAME SplitMix64 pool [[graft.functions.SrpBands]] uses
    * (via `planeMasks64` — for dim-64 embeddings each hyperplane is one
    * 64-bit word), interpolated as BIGINT literals, so both engines compute
    * the identical signature: per-hyperplane signed dot accumulated in
    * array order as doubles (list_sum matches the expression's sequential
    * loop), `> 0` sign bit, 16 bands x 4 bits. Candidates = vectors sharing
    * any band with the query; cosine re-rank replays through DuckDB's
    * list_cosine_similarity (same order-sequential double accumulation as
    * CosineSim — the q26 precedent). q52 probes the MATERIALIZED index with
    * the same banding, so one oracle covers both.
    */
  private val srpOracleSql: String = {
    val masks = graft.functions.VectorHashing.planeMasks64(numPlanes = 64, seed = 7L)
    val mvals = masks.zipWithIndex
      .map { case (m, h) => s"($h, CAST($m AS BIGINT))" }.mkString(",\n  ")
    s"""WITH masks(h, m) AS (VALUES
       |  $mvals),
       |sig AS (
       |  SELECT vec_id, label, embedding, h // 4 AS band,
       |    CASE WHEN list_sum([CASE WHEN (m >> d) & 1 = 1
       |           THEN CAST(embedding[d + 1] AS DOUBLE)
       |           ELSE -CAST(embedding[d + 1] AS DOUBLE) END
       |         for d in range(0, len(embedding))]) > 0
       |      THEN (1 << (h % 4)) ELSE 0 END AS bit
       |  FROM embeddings, masks),
       |bands AS (
       |  SELECT vec_id, label, embedding, band, CAST(sum(bit) AS INT) AS bv
       |  FROM sig GROUP BY 1, 2, 3, 4),
       |q AS (SELECT band, bv, embedding AS qe FROM bands WHERE vec_id = 0),
       |cand AS (
       |  SELECT DISTINCT c.vec_id, c.label, c.embedding, q.qe
       |  FROM bands c JOIN q USING (band, bv) WHERE c.vec_id <> 0)
       |SELECT vec_id, CAST(label AS INT) AS label,
       |       list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]) AS sim
       |FROM cand ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
  }

  /** DuckDB replay of q45 winnowing — the full 64-bit PRODUCTION hash, no
    * portable-variant compromise, because (a) the polynomial rolling hash
    * mod 2^64 replays exactly in HUGEINT (window hash = Σ byte·B^(k-1-j)
    * mod 2^64; Long wraparound IS mod 2^64), and (b) q45 never exposes
    * fingerprint VALUES, only pair counts — and the set of winnowed prints
    * per doc is exactly the distinct FULL-WINDOW MINIMA (the rightmost-min
    * tie-break picks a position, never changes the selected value, and the
    * selected-position sequence is non-decreasing, so consecutive-dedup
    * can't drop a distinct value). Comparisons happen on the SIGNED
    * reinterpretation, matching Winnowing.compute's Long compares. The
    * HAVING<=w-1 branch covers k<=len<k+w-1 docs (single global-min print;
    * unreachable on this corpus, min doc length 44).
    */
  private val winnowOracleSql: String = {
    val B = 1000003L
    val k = 20
    val w = 8
    // B^(k-1-j) mod 2^64 == Long wraparound, rendered unsigned for HUGEINT
    val pows = Array.iterate(1L, k)(_ * B).reverse
      .map(p => s"CAST(${java.lang.Long.toUnsignedString(p)} AS HUGEINT)")
      .mkString(", ")
    s"""WITH docs AS (SELECT doc_id, lower(text) AS s FROM documents),
       |posn AS (
       |  SELECT doc_id, s, CAST(i AS INT) AS i
       |  FROM docs, unnest(range(1, len(s) - $k + 2)) AS u(i)),
       |h AS (
       |  SELECT doc_id, i,
       |    CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616
       |         ELSE hu END AS BIGINT) AS hs
       |  FROM (
       |    SELECT doc_id, i,
       |      list_sum([CAST(ord(s[i + j]) AS HUGEINT) * ([$pows])[j + 1]
       |                for j in range(0, $k)])
       |        % CAST(18446744073709551616 AS HUGEINT) AS hu
       |    FROM posn)),
       |mins AS (
       |  SELECT doc_id,
       |    min(hs) OVER (PARTITION BY doc_id ORDER BY i
       |                  ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp,
       |    count(*) OVER (PARTITION BY doc_id ORDER BY i
       |                   ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wn
       |  FROM h),
       |fps AS (
       |  SELECT DISTINCT doc_id, fp FROM mins WHERE wn = $w
       |  UNION
       |  SELECT doc_id, min(hs) AS fp FROM h GROUP BY doc_id HAVING count(*) <= ${w - 1}),
       |buckets AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 8),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM fps a JOIN fps b USING (fp) JOIN buckets USING (fp)
       |  WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS shared_fps
       |FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY id_a, id_b""".stripMargin
  }

  /** Exact set-Jaccard between two pre-distinct SORTED string arrays.
    * `sorted_intersect_size` is a zero-allocation codegen merge;
    * `size(array_intersect(..))` (CodegenFallback, per-row hash set) made
    * the verify stage the dominant cost of the whole dedup suite — and as
    * an interpreted projection it also dodged codegen subexpression
    * elimination, so the intersection ran TWICE per candidate pair.
    */
  private def jaccard(a: Column, b: Column): Column = {
    val inter = graft.functions.TextHashing.sortedIntersectSize(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** LSH-bucketed embedding near-dup: candidates collide on >=1 of
    * `bands` bands of `bitsPerBand` SRP bits, then exact cosine verify at
    * `threshold`. The only shuffles are the (band, value) grouping and the
    * two candidate joins back to vectors — never an all-pairs product.
    * Exposed for reuse so LlmSpec can run the identical pipeline on planted
    * duplicates.
    */
  def embeddingNeardup(emb: DataFrame, threshold: Double,
      bands: Int = 16, bitsPerBand: Int = 8): DataFrame = {
    val banded = emb.select(col("vec_id"),
      posexplode(srpBands(col("embedding"), bands, bitsPerBand)).as(Seq("band", "bv")))
    val buckets = banded.groupBy("band", "bv")
      .agg(sort_array(collect_list("vec_id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val cands = buckets
      .select(expr("explode_pairs(ids)").as(Seq("id_a", "id_b")))
      .distinct()
    val vecs = emb.select(col("vec_id"), col("embedding"))
    cands
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
      .select(col("id_a"), col("id_b"), cosineSim(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Train BPE merges over a corpus: ONE distributed pass builds the word
    * histogram (top `maxTypes` by count — the cap that bounds driver work
    * at any corpus size), the classic merge loop runs on the driver over
    * that histogram. Deterministic: ties break lexicographically, the
    * histogram order is total.
    */
  def trainBpe(docs: DataFrame, numMerges: Int, maxTypes: Int = 20000): Array[String] = {
    val hist = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxTypes)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.functions.Bpe.trainMerges(hist, numMerges)
  }

  val defs: Seq[QueryDef] = Seq(

    // ───── q26: brute-force cosine top-k over embeddings ─────────────────
    // Scale: one shuffle-free scan; the query vector broadcasts (1 row);
    // orderBy+limit compiles to TakeOrderedAndProject = per-partition
    // top-k then driver merge of k*partitions rows — no global sort at any
    // data size. cosine_sim is a codegen Catalyst expression.
    QueryDef.df(
      "q26_embedding_topk",
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, CAST(label AS INT) AS label,
        |       list_cosine_similarity(embedding::DOUBLE[], qe) AS sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label").cast("int").as("label"),
          cosineSim(col("embedding"), col("qe")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // ───── q27: exact dedup via content fingerprint ──────────────────────
    // Scale: one hash-aggregate keyed by the 128-bit fingerprint (partial +
    // final); no text column survives the shuffle — only fingerprints move.
    QueryDef.shared(
      "q27_exact_dedup",
      """SELECT md5(lower(text)) AS fp,
        |  CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY md5(lower(text))
        |ORDER BY fp""".stripMargin),

    // ───── q28: MinHash/LSH near-dup pairs, exact-verified ───────────────
    // Pipeline: shingle -> 64-slot MinHash signature (custom codegen
    // expression) -> 16 bands x 4 rows -> shuffle ONLY on (band, bandHash)
    // -> candidate pairs from same-bucket docs -> exact Jaccard verify.
    // Scale: never all-pairs — candidates are per-bucket; a bucket holds
    // only docs agreeing on 4 of 64 minhashes. P(miss a J>=0.9 pair) =
    // (1-0.9^4)^16 ~ 4e-8, so the exact-verified output matches the
    // all-pairs oracle deterministically in practice.
    QueryDef.df(
      "q28_neardup_pairs",
      """WITH d AS (
        |  SELECT doc_id, list_distinct(
        |    [lower(text).string_split(' ')[i] || ' ' || lower(text).string_split(' ')[i+1] || ' ' || lower(text).string_split(' ')[i+2]
        |     for i in range(1, greatest(len(string_split(lower(text),' ')) - 1, 2))]) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val bands = 16
      val rowsPerBand = 4
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), shingles3(col("text")).as("sh"))
      val sigs = docs.select(col("doc_id"),
        minhashSignature(col("sh"), bands * rowsPerBand, 42L).as("sig"))
      // band hash: xxhash64 over the band's signature slice (statically
      // unrolled: 16 fixed entries, no lambda interpretation per row)
      val bandStructs = (0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bh")))
      val banded = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
        .select(col("doc_id"), col("e.band"), col("e.bh"))
      // the ONLY shuffle: group by (band, bandHash); a bucket's candidate
      // pairs expand from its sorted id array (ids sorted => a < b) via
      // array lambdas under a built-in explode, which keeps the stage in
      // whole-stage codegen (explode is a CollectionGenerator). Measured
      // alternatives on this corpus: a self-equi-join on the bucket key is
      // 2.4x slower end-to-end (every pairwise row through shuffle/sort
      // machinery); a custom Generator UDTF is ~15% slower (GenerateExec
      // drops codegen for non-CollectionGenerators).
      val buckets = banded.groupBy("band", "bh")
        .agg(sort_array(collect_list("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
      val cands = buckets
        .select(explode(flatten(transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
            struct(a.as("id_a"), b.as("id_b")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .distinct()
      // Background shingle-jaccard in a shared-vocab corpus (~0.35) leaks
      // through 4-row bands (J^4 ~ 1.5% per band), so candidate pairs are
      // plentiful. Screen them with the full 64-slot signature FIRST — the
      // signature table is ~0.5 KB/doc (vs multi-KB shingle arrays), small
      // enough to broadcast at any corpus size that fits a dimension table;
      // matching slots / 64 estimates J with sigma ~ 0.06, so a 0.45
      // cutoff is >2 sigma below the 0.6 verify threshold. Only the
      // survivors (near-real pairs) pay the exact shingle join.
      val estMatch = cands
        .join(broadcast(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))), "id_a")
        .join(broadcast(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))), "id_b")
        .select(col("id_a"), col("id_b"),
          (graft.functions.TextHashing.sigMatchCount(col("sig_a"), col("sig_b"))
            .cast("double") / (bands * rowsPerBand)).as("est_j"))
        .filter(col("est_j") >= 0.45)
        .select("id_a", "id_b")
      // exact verification joins shingles back (shuffle on doc_id)
      val verified = estMatch
        .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.6)
      verified.orderBy("id_a", "id_b")
    },

    // ───── q53: LOSSLESS n-gram Jaccard similarity join (prefix filter) ──
    // Same semantics as q28 (all pairs with shingle-Jaccard >= 0.6, same
    // oracle SQL) via the EXACT algorithm instead of LSH: PPJoin-style
    // prefix filtering. Order every doc's shingles rarest-first by global
    // document frequency; any pair with J >= t MUST share a shingle within
    // each other's first |S| - ceil(t*|S|) + 1 shingles, so the candidate
    // join touches only prefix shingles — guaranteed-complete at any
    // threshold (LSH recall is probabilistic), shuffles bounded by prefix
    // size, and hot shingles never enter prefixes (they sort last).
    QueryDef.df(
      "q53_ngram_jaccard_join",
      """WITH d AS (
        |  SELECT doc_id, list_distinct(
        |    [lower(text).string_split(' ')[i] || ' ' || lower(text).string_split(' ')[i+1] || ' ' || lower(text).string_split(' ')[i+2]
        |     for i in range(1, greatest(len(string_split(lower(text),' ')) - 1, 2))]) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val t0 = 0.6
      // (measured: localCheckpoint-ing the shingled corpus for its three
      // consumers does NOT help — 6.17 s vs 6.15 s median-of-5; the cost
      // lives in the 10M-row gram shuffles, not the codegen shingling)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), shingles3(col("text")).as("sh"))
      // Shingle strings are hashed to 64 bits at the source: everything
      // downstream (df aggregation, prefix ordering, candidate join)
      // shuffles and compares 8-byte longs, never ~50-byte strings. A hash
      // collision can only merge two grams' df counts (ordering nudge) or
      // ADD a candidate pair — the exact verify rejects it, so the join
      // stays lossless. Shapes measured on sf0.1 (medians, ±1 s run
      // noise): hash-agg df + hash join ~5 s; df via count-window ~6 s
      // (window exec adds a 10M-row sort); row_number-rank windows ~8 s
      // (two sorts). Hash-agg wins asymptotically too: no sort anywhere —
      // every stage is hash-partition + hash-agg/join.
      val grams = docs.select(col("doc_id"), explode(col("sh")).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      val freq = grams.groupBy("gh").agg(count(lit(1)).as("df"))
      val prefixes = grams.join(freq, "gh")
        .groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("df"), col("gh")))).as("fg"))
        .select(col("doc_id"),
          slice(transform(col("fg"), x => x.getField("gh")), lit(1),
            greatest(size(col("fg"))
              - ceil(lit(t0) * size(col("fg"))).cast("int") + 1, lit(1))).as("prefix"))
      val ex = prefixes.select(col("doc_id"), explode(col("prefix")).as("gh"))
      val cands = ex.as("a").join(ex.as("b"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      cands
        .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= t0)
        .orderBy("id_a", "id_b")
    },

    // ───── q29: text statistics per language ─────────────────────────────
    QueryDef.df(
      "q29_text_stats",
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens,
        |  CAST(sum(len(list_distinct(string_split(lower(text), ' ')))) AS BIGINT) AS total_distinct_tokens,
        |  CAST(max(len(string_split(lower(text), ' '))) AS BIGINT) AS max_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").withColumn("toks", words(col("text")))
      d.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(col("toks")).cast("long")).as("total_tokens"),
        sum(size(array_distinct(col("toks"))).cast("long")).as("total_distinct_tokens"),
        max(size(col("toks")).cast("long")).as("max_tokens"))
        .orderBy("lang")
    },

    // ───── q38: ANN top-k via SRP-LSH bucket probe (the scale path) ──────
    // q26 is the brute-force baseline (one full scan per query vector); this
    // is the 100 TB shape: candidates = vectors sharing >=1 of 16 LSH bands
    // with the query, cosine computed on candidates only, then per-partition
    // top-k. The band join touches a small fraction of the corpus (the
    // LlmSpec pins candidate count and recall vs q26 on this data). At scale
    // the banded table is precomputed once and bucketed by (band, value), so
    // a probe is a partition-pruned lookup, not a scan. ORACLED (r10): the
    // SplitMix64 hyperplane masks interpolate into the SQL as literals, so
    // DuckDB replays the signature bit-for-bit (see srpOracleSql).
    QueryDef.df("q38_ann_lsh", srpOracleSql) { (s, dir) =>
      val bands = 16
      val bits = 4
      val emb = t(s, dir, "embeddings")
      val banded = emb.select(col("vec_id"), col("label"), col("embedding"),
          posexplode(srpBands(col("embedding"), bands, bits)).as(Seq("band", "bv")))
      val qBands = banded.filter(col("vec_id") === 0)
        .select(col("band"), col("bv"), col("embedding").as("qe"))
      banded.filter(col("vec_id") =!= 0)
        .join(broadcast(qBands), Seq("band", "bv")) // bucket probe, not all-pairs
        .select(col("vec_id"), col("label"), col("embedding"), col("qe"))
        .distinct() // a candidate may collide on several bands
        .select(col("vec_id"), col("label").cast("int").as("label"),
          cosineSim(col("embedding"), col("qe")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // ───── q51: ANN top-k via IVF (inverted-file) cells ──────────────────
    // The other classic ANN scale path (vs q38's LSH): build k=16 coarse
    // centroids (hash-seeded assignment + one Lloyd refinement, both plain
    // aggregations over the VectorAvg UDAF), assign every vector to its
    // nearest cell, then probe only the 2 cells nearest the query — the
    // candidate scan touches ~2/16 of the corpus. At scale the assignment
    // is precomputed and the table is partitioned by cell, so a probe is
    // partition-pruned I/O, not a scan. Centroids broadcast (k x dim
    // floats); the only shuffles are the two centroid aggregations.
    QueryDef.unoracled("q51_ann_ivf") { (s, dir) =>
      val k = 16
      val vavg = udaf(graft.functions.VectorAvg)
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
      val asDouble = transform(col("embedding"), x => x.cast("double"))
      // seed cells: deterministic hash of vec_id
      val seeded = emb.withColumn("cell", pmod(xxhash64(col("vec_id")), lit(k)).cast("int"))
      def centroidsOf(df: DataFrame): DataFrame = df
        .groupBy("cell").agg(vavg(col("embedding")).as("centroid"))
        .select(col("cell").as("c_cell"),
          transform(col("centroid"), x => x.cast("float")).as("c_vec"))
      // nearest-cell assignment as ONE hash aggregation: max_by over a
      // (sim, -cell) struct picks the best cell (smallest cell id on ties)
      // with map-side partial aggregation — the old row_number() window
      // sort-shuffled all 16N scored rows per Lloyd pass
      def assign(df: DataFrame, cents: DataFrame): DataFrame =
        df.drop("cell").crossJoin(broadcast(cents))
          .withColumn("sim", cosineSim(col("embedding"), col("c_vec")))
          .groupBy("vec_id")
          .agg(first(col("label")).as("label"),
            first(col("embedding")).as("embedding"),
            max_by(col("c_cell"), struct(col("sim"), -col("c_cell"))).as("cell"))
          .select(col("vec_id"), col("label"), col("embedding"), col("cell"))
      // one Lloyd refinement over the hash seeding
      val cells = assign(emb, centroidsOf(seeded))
      val cents = centroidsOf(cells)
      // probe: the 2 cells whose centroids are nearest the query vector
      val q = cells.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
      val probeCells = cents.crossJoin(broadcast(q))
        .orderBy(cosineSim(col("c_vec"), col("qe")).desc, col("c_cell"))
        .limit(2).select(col("c_cell").as("cell"))
      cells.filter(col("vec_id") =!= 0)
        .join(broadcast(probeCells), "cell") // candidate set = probed cells only
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"), cosineSim(col("embedding"), col("qe")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // ───── q52: ANN probe against the MATERIALIZED catalog index ─────────
    // Composes the two halves of the engine: q38's SRP banding is written
    // ONCE through the catalog as a PARTITIONED BY (band, bv) lake table
    // (clustered files, min==max stats), and the probe is a bucket-filtered
    // read that the manifest prunes to exactly the query's bucket files —
    // I/O proportional to bucket size, independent of corpus size
    // (AnnIndexSpec asserts the pruned file set and result parity with q38).
    // ORACLED (r10): identical semantics to q38 — same banding, same
    // candidate set, same re-rank — so q38's mask-literal oracle covers the
    // materialized-index path too (a probe through the catalog must answer
    // exactly what the inline pipeline answers).
    QueryDef.df("q52_ann_index_probe", srpOracleSql) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      AnnIndex.buildSrpIndex(s, emb, "lake.idx.emb_bands")
      AnnIndex.probeSrpIndex(s, "lake.idx.emb_bands", emb, queryVecId = 0L)
    },

    // ───── q68: ANN top-k via product quantization (the MEMORY-scale path) ─
    // q38/q51 cut the candidate COUNT; PQ cuts the candidate SIZE: every
    // vector compresses to m=16 centroid-code bytes (16x vs the 64 floats),
    // the probe scores ALL of them with a per-query lookup table (ADC, full
    // codegen — m array reads per row), and only the top-50 shortlist is
    // re-ranked against the real floats. Training = per-subspace k-means as
    // hash aggregations (the q51 pattern); at 100 TB the codes fit where
    // the floats never could, and the scan is pure sequential lookups.
    // LlmSpec pins recall@10 vs the q26 brute-force oracle.
    QueryDef.unoracled("q68_ann_pq") { (s, dir) =>
      PqAnn.topK(s, t(s, dir, "embeddings"), queryVecId = 0L)
    },

    // ───── q69: PQ probe against the MATERIALIZED catalog index ──────────
    // q52's composition, PQ edition: one scan encodes the corpus into a
    // lake table of m-byte code arrays, the trained codebook persists
    // base64-packed in the table properties (the index is self-describing —
    // later sessions probe without retraining), and a probe scans ONLY the
    // codes table (ADC codegen) before the float re-rank touches just the
    // shortlist. AnnIndexSpec asserts probe/inline parity and that the
    // codes table is the only corpus-wide read.
    QueryDef.unoracled("q69_ann_pq_index") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      PqAnn.buildPqIndex(s, emb, "lake.idx.emb_pq")
      PqAnn.probePqIndex(s, "lake.idx.emb_pq", emb, queryVecId = 0L)
    },

    // ───── q76: decontamination (benchmark n-gram overlap) ───────────────
    // The pass every LLM training pipeline runs before release: flag
    // corpus documents sharing any 4-gram with a held-out benchmark set
    // (docs 0-4 stand in for the eval suite; production pipelines use
    // 8-13-grams — on this small-vocabulary synthetic corpus 4 is the
    // discriminating size). Composed the scalable way:
    // the BENCHMARK side's distinct grams are small by construction
    // (benchmarks are fixed-size) and broadcast; the corpus side streams
    // through the explode_ngrams generator into a broadcast hash join —
    // no shuffle of corpus grams, no all-pairs anything. Oracled: DuckDB
    // reproduces the grams with list slicing.
    QueryDef.df(
      "q76_decontaminate",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
        |  FROM toks, unnest(range(1, len(w) - 2)) AS t(i)),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5)
        |SELECT c.doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared
        |FROM grams c JOIN bench USING (g)
        |WHERE c.doc_id >= 5
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), expr("explode_ngrams(split(lower(text), ' '), 4)").as("g"))
      val bench = grams(docs.filter(col("doc_id") < 5)).select("g").distinct()
      grams(docs.filter(col("doc_id") >= 5))
        .join(broadcast(bench), "g")
        .groupBy("doc_id").agg(countDistinct(col("g")).as("n_shared"))
        .orderBy("doc_id")
    },

    // ───── q77: within-document repetition ratio (Gopher-style filter) ───
    // The quality rule that catches boilerplate/spam the q35 surface
    // statistics miss: the fraction of a document's word 2-grams that are
    // repeats (1 - distinct/total). One generator pass + one per-doc
    // aggregation — count(gram) and count(DISTINCT gram) in a single
    // hash-agg keyed by doc, nothing but (doc_id, gram) ever shuffles.
    // Top-20 most repetitive docs, deterministically tie-broken.
    QueryDef.df(
      "q77_repetition",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
        |  FROM toks, unnest(range(1, len(w))) AS t(i))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*) AS DOUBLE) AS rep_ratio
        |FROM grams GROUP BY doc_id
        |ORDER BY rep_ratio DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), expr("explode_ngrams(split(lower(text), ' '), 2)").as("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          (lit(1.0) - countDistinct(col("g")).cast("double") / count(lit(1))).as("rep_ratio"))
        .orderBy(col("rep_ratio").desc, col("doc_id"))
        .limit(20)
    },

    // ───── q72: IVF-PQ — the full FAISS-IVFADC composition ───────────────
    // Both ANN reductions at once: the IVF layer prunes ROWS (the probe
    // reads only its nprobe cells' files — `PARTITIONED BY (cell)` +
    // manifest min/max make it a partition-pruned lookup) and PQ prunes
    // BYTES (each row is m code bytes, ADC-scored in codegen). I/O ∝
    // probed-cells × m bytes — sub-linear in corpus size in both
    // dimensions, which is what a 100 TB embedding store actually needs.
    // Coarse centroids + codebook persist in table properties, so the
    // index is self-describing across sessions. PqSpec pins recall and
    // the partition-pruned plan.
    QueryDef.unoracled("q72_ann_ivfpq") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      PqAnn.buildIvfPqIndex(s, emb, "lake.idx.emb_ivfpq")
      PqAnn.probeIvfPqIndex(s, "lake.idx.emb_ivfpq", emb, queryVecId = 0L)
    },

    // ───── q71: trained BPE tokenizer (the real-tokenizer upgrade) ───────
    // q39 counts tokens with a regex; this TRAINS a byte-pair-encoding
    // vocabulary on the corpus and tokenizes with it — the 100 TB split is
    // one groupBy(word) histogram pass (top-N capped, so driver work is
    // bounded at any corpus size) + a driver merge loop + a codegen encode
    // expression carrying the merge ranks. Output: the 25 most frequent
    // LEARNED subwords (length > 1 = actual merges, not seed characters).
    // BpeSpec pins hand-computed merges, the encode/decode roundtrip, and
    // codegen agreement.
    QueryDef.unoracled("q71_bpe_tokens") { (s, dir) =>
      val docs = t(s, dir, "documents")
      val merges = trainBpe(docs, numMerges = 200)
      docs.select(explode(graft.functions.Bpe.bpeEncode(col("text"), merges)).as("token"))
        .filter(length(col("token")) > 1)
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(25)
    },

    // ───── q107: BPE ENCODE under the oracle (fixed merge table) ─────────
    // q71's encode step, oracled (ADVICE r7 #6): the greedy lowest-rank
    // merge loop is replayed in DuckDB as a recursive CTE — tokens ride
    // sep-joined on chr(31) (absent from the corpus), each recursion step
    // replaces every occurrence of the best-ranked adjacent pair, and a
    // word is final when no merge pattern matches. Every token is WRAPPED
    // in its own chr(31) pair ("␟z␟␟e␟␟r␟␟o␟"), so a pair pattern
    // "␟l␟␟r␟" can only match two WHOLE adjacent tokens — a bare
    // separator join would let `replace` match across token boundaries
    // whenever one token merely ENDS with l or STARTS with r (e.g. pair
    // (e, r) inside [z, e, ro]), silently diverging from the
    // token-sequence algorithm for such vocabularies. With whole-token
    // delimitation, left-to-right non-overlapping `replace` is exactly
    // the codegen loop's merge pass (each match consumes both tokens'
    // own wrappers — adjacent occurrences never share a separator).
    // The merge table here is a FIXED literal shared by both engines so
    // the encoder is gated in isolation; the TRAINER is oracled separately
    // by q195 (unrolled merge rounds), and q71's full 200-merge training
    // run stays value-pinned in BpeSpec.
    QueryDef.df(
      "q107_bpe_encode",
      s"""WITH RECURSIVE
        |mm(rank, pat, rep) AS (
        |  SELECT rank, chr(31) || l || chr(31) || chr(31) || r || chr(31),
        |         chr(31) || l || r || chr(31)
        |  FROM (VALUES
        |    ${Q107Merges.zipWithIndex.map { case (m, i) =>
             val Array(l, r) = m.split(' '); s"($i, '$l', '$r')"
           }.mkString(", ")}) x(rank, l, r)
        |),
        |words AS (
        |  SELECT word, count(*) AS wc
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
        |        FROM documents)
        |  WHERE word <> '' GROUP BY word
        |),
        |init AS (
        |  SELECT word,
        |         regexp_replace(word, '(.)',
        |                        chr(31) || '\\1' || chr(31), 'g') AS s
        |  FROM words
        |),
        |enc AS (
        |  SELECT word, s FROM init
        |  UNION ALL
        |  SELECT e.word, replace(e.s, b.pat, b.rep)
        |  FROM enc e, LATERAL (SELECT pat, rep FROM mm
        |                       WHERE contains(e.s, mm.pat)
        |                       ORDER BY mm.rank LIMIT 1) b
        |),
        |final AS (
        |  SELECT word, s FROM enc
        |  WHERE NOT EXISTS (SELECT 1 FROM mm WHERE contains(enc.s, mm.pat))
        |)
        |SELECT token, SUM(w.wc)::BIGINT AS cnt
        |FROM (SELECT word, unnest(list_filter(string_split(s, chr(31)),
        |                                      x -> x <> '')) AS token
        |      FROM final) f
        |JOIN words w USING (word)
        |GROUP BY token ORDER BY cnt DESC, token""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(
          graft.functions.Bpe.bpeEncode(col("text"), Q107Merges)).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
    },

    // ───── q195: BPE TRAINING under the oracle (unrolled merge rounds) ───
    // q107 oracles the encoder against a fixed merge table; this oracles
    // the TRAINER: both engines learn the first 12 merges from the corpus
    // itself. Spark runs the production shape (one distributed histogram
    // pass, driver merge loop over the bounded top-20k types); DuckDB
    // replays the loop as 12 generated CTE steps — weighted overlapping
    // pair counts, the count-desc/lexicographic-pair argmax (ORDER BY
    // c DESC, l, r LIMIT 1 IS the driver's tie-break), and the histogram
    // rewrite via q107's whole-token chr(31) delimitation. Output is
    // (rank, pair, selection-time count), so a drift anywhere in counting,
    // tie-break, or rewrite fails the hash gate. Early stop matches by
    // construction: an empty best_i empties every later hist/best, so both
    // engines truncate at the same round. Training on >12 merges stays
    // driver-side (q71); 12 rounds is the gate, not the vocabulary.
    QueryDef.df("q195_bpe_train_merges", q195TrainSql(12)) { (s, dir) =>
      val docs = t(s, dir, "documents")
      // histogram restricted to printable-ASCII words IN BOTH ENGINES: the
      // gate's tie-break compares pairs lexicographically, and for ASCII
      // Java's UTF-16 order == DuckDB's UTF-8 binary order; beyond ASCII
      // the two collations (and surrogate-pair char splitting) diverge, so
      // the restriction keeps the trainer oracle sound on ANY corpus
      // (q71's production trainer stays unrestricted)
      val hist = docs.select(explode(split(col("text"), "\\s+")).as("w"))
        .filter(col("w").rlike("^[ -~]+$"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w"))
        .limit(20000)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val merges = graft.functions.Bpe.trainMergesDetailed(hist, numMerges = 12)
      import s.implicits._
      merges.toSeq.zipWithIndex
        .map { case ((l, r, c), i) => (i, l, r, c) }
        .toDF("rank", "lft", "rgt", "cnt")
        .orderBy("rank")
    },

    // ───── q196: BM25 lexical top-k (Robertson/Spärck Jones) ─────────────
    // The retrieval half a curation pipeline needs next to ANN: score docs
    // against a term query with BM25 (k1=1.2, b=0.75). Shape at 100 TB:
    // the query-term list is a broadcast literal, so the token stream
    // filters BEFORE any shuffle (only matching (doc_id, term) pairs
    // move); df is one tiny agg broadcast back; doc lengths co-shuffle on
    // doc_id; the corpus stats are a 1-row broadcast; top-k compiles to
    // TakeOrderedAndProject. Numeric discipline: each per-term score goes
    // through DECIMAL(18,6) before the per-doc sum (q82's ln treatment) so
    // the sum is order-independent and engine-exact.
    QueryDef.df("q196_bm25_topk", Bm25OracleSql) { (s, dir) =>
      bm25Scores(t(s, dir, "documents"))
        .orderBy(col("score").desc, col("doc_id")).limit(20)
    },

    // ───── q201: BM25 through a MATERIALIZED inverted index ──────────────
    // q196's scorer, production-shaped: the postings list (tok, doc_id,
    // tf) is a catalog table PARTITIONED BY bucket(16, tok), doc lengths a
    // second table, corpus stats pinned in TBLPROPERTIES at build — a
    // probe never touches the corpus: the term IN-filter partition-prunes
    // to the query terms' posting buckets (BucketPruner), df is a tiny agg
    // over just those postings, and the score join shuffles O(matching
    // postings), never O(corpus tokens). The oracle is q196's VERBATIM
    // from-scratch scan, so a stale, duplicated, or mis-bucketed index
    // entry fails the hash gate: probe == scan, proven per run.
    QueryDef.df("q201_bm25_index_probe", Bm25OracleSql) { (s, dir) =>
      Bm25Index.build(s, t(s, dir, "documents"),
        "lake.idx.bm25_postings", "lake.idx.bm25_doclen")
      Bm25Index.probe(s, "lake.idx.bm25_postings", "lake.idx.bm25_doclen",
        Q196Terms, k = 20)
    },

    // ───── q202: BM25 index REFRESH ≡ rebuild (oracled) ──────────────────
    // q199's refresh-equals-rebuild discipline on the lexical side: build
    // the index over the even doc_ids, refresh with the odd half (appends
    // + stats re-pin, O(new docs)), probe. BM25 scores are
    // corpus-relative — N, avgdl, and df all shift with the refresh — and
    // the probe recomputes df from the postings themselves, so the
    // refreshed index must answer exactly like a from-scratch build over
    // the union. Oracle: the same full-corpus scan as q196/q201 — a
    // dropped or double-counted posting, a stale pinned stat, or a
    // mis-bucketed append all fail the hash gate.
    QueryDef.df("q202_bm25_index_refresh", Bm25OracleSql) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Bm25Index.build(s, docs.filter(col("doc_id") % 2 === 0),
        "lake.idx.bm25_postings_r", "lake.idx.bm25_doclen_r")
      Bm25Index.refresh(s, "lake.idx.bm25_postings_r", "lake.idx.bm25_doclen_r",
        docs.filter(col("doc_id") % 2 === 1))
      Bm25Index.probe(s, "lake.idx.bm25_postings_r", "lake.idx.bm25_doclen_r",
        Q196Terms, k = 20)
    },

    // ───── q197: hybrid retrieval — RRF fusion of BM25 and cosine ────────
    // Reciprocal-rank fusion (Cormack et al. 2009): fuse the BM25 top-50
    // (q196's scorer) with the embedding-cosine top-50 (q26's scorer,
    // query = vec 0) as sum(1/(60+rank)). Ranks are assigned AFTER the
    // top-k truncation, so the global-order window runs over 50 rows, not
    // the corpus — the corpus-sized work stays in the two
    // TakeOrderedAndProject top-ks. The fused score is a sum of two exact
    // integer-denominator divisions in a fixed order — engine-exact with
    // no decimal detour. COALESCE(rank, 0) spells "absent from that list"
    // without a nullable-int rendering hazard in the gate.
    QueryDef.df(
      "q197_hybrid_rrf",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM toks GROUP BY doc_id),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |              CAST(sum(len) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |q AS (SELECT * FROM (VALUES ('join'), ('hash'), ('window'), ('dup')) v(tok)),
        |tf AS (SELECT t.doc_id, t.tok, count(*)::BIGINT AS tf
        |       FROM toks t JOIN q USING (tok) GROUP BY t.doc_id, t.tok),
        |idf AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
        |bm25 AS (
        |  SELECT tf.doc_id,
        |    CAST(sum(CAST(
        |      ln((st.n - idf.df + 0.5e0) / (idf.df + 0.5e0) + 1.0e0) *
        |      (tf.tf * 2.2e0) /
        |      (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.len / st.avgdl))
        |      AS DECIMAL(18,6))) AS DOUBLE) AS score
        |  FROM tf JOIN idf USING (tok) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
        |  GROUP BY tf.doc_id),
        |ta AS (SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id LIMIT 50),
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
        |       FROM ta),
        |qv AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |cos AS (SELECT vec_id,
        |               list_cosine_similarity(embedding::DOUBLE[], qe) AS sim
        |        FROM embeddings, qv WHERE vec_id <> 0),
        |tb AS (SELECT vec_id, sim FROM cos ORDER BY sim DESC, vec_id LIMIT 50),
        |rb AS (SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS r
        |       FROM tb)
        |SELECT COALESCE(ra.doc_id, rb.vec_id) AS doc_id,
        |  COALESCE(ra.r, 0)::INT AS r_text,
        |  COALESCE(rb.r, 0)::INT AS r_vec,
        |  COALESCE(1.0e0 / (60 + ra.r), 0.0e0) + COALESCE(1.0e0 / (60 + rb.r), 0.0e0) AS rrf
        |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.vec_id
        |ORDER BY rrf DESC, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val topA = bm25Scores(t(s, dir, "documents"))
        .orderBy(col("score").desc, col("doc_id")).limit(50)
      // rank windows run over the ALREADY-TRUNCATED 50-row lists (a global
      // window over the corpus would single-partition at scale)
      val ra = topA.withColumn(
        "r", row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("r"))
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val topB = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), cosineSim(col("embedding"), col("qe")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(50)
      val rb = topB.withColumn(
        "r", row_number().over(Window.orderBy(col("sim").desc, col("vec_id"))))
        .select(col("vec_id"), col("r").as("rv"))
      ra.join(rb, ra("doc_id") === rb("vec_id"), "full_outer")
        .select(
          coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
          coalesce(col("r"), lit(0)).cast("int").as("r_text"),
          coalesce(col("rv"), lit(0)).cast("int").as("r_vec"),
          (coalesce(lit(1.0) / (lit(60) + col("r")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rv")), lit(0.0))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(25)
    },

    // ───── q40: embedding-cosine near-dup pairs (dedup family) ───────────
    // Same LSH-bucketed candidate generation, symmetric: pairs colliding on
    // any of 16 8-bit bands, exact cosine verify at 0.95. With 128 signature
    // bits the miss probability for a true >=0.95 pair is (1-0.899^8)^16 ~
    // 1.4e-4, and the exact verify keeps precision at 1.0 — so the output
    // deterministically equals the all-pairs oracle (empty on this corpus:
    // its vectors are near-orthogonal; LlmSpec proves recall on planted
    // duplicates).
    QueryDef.df(
      "q40_embedding_neardup",
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      embeddingNeardup(t(s, dir, "embeddings"), 0.95)
    },

    // ───── q39: BPE-ish regex token classes (token counting) ─────────────
    // Tokenizer families a training pipeline budgets by: letter runs,
    // digit runs, and single non-alphanumeric marks — the pre-merge atoms
    // of byte-pair tokenizers. Same RE2/Java-compatible patterns run in
    // both engines; one scan, one shuffle on lang.
    QueryDef.df(
      "q39_token_counts",
      // DuckDB spells array length `len`, Spark `size` — same regexes,
      // same aggregation, per-dialect length function.
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT) AS word_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT) AS num_tokens,
        |  CAST(sum(len(regexp_extract_all(lower(text), '[^a-z0-9 ]'))) AS BIGINT) AS punct_tokens,
        |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_ish_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      def n(pattern: String, onLower: Boolean = true) =
        sum(size(regexp_extract_all(
          if (onLower) lower(col("text")) else col("text"), lit(pattern), lit(0))).cast("long"))
      t(s, dir, "documents").groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        n("[a-z]+").as("word_tokens"),
        n("[0-9]+", onLower = false).as("num_tokens"),
        n("[^a-z0-9 ]").as("punct_tokens"),
        n("[a-z]+|[0-9]+|[^a-z0-9 ]").as("bpe_ish_tokens"))
        .orderBy("lang")
    },

    // ───── q45: copy detection via winnowing fingerprints ────────────────
    // Rolling-hash winnowing (MOSS): k=20-byte windows, winnow window w=8
    // -> any shared substring >= 27 bytes (~5 words) yields a shared
    // print. Buckets with > 8 docs are "stop fingerprints" (boilerplate
    // phrases) and are dropped BEFORE pair expansion — the standard MOSS
    // move that keeps buckets bounded and the shuffle O(prints), never
    // quadratic in a hot phrase's document count. Docs sharing >= 5
    // surviving prints are copy candidates. ORACLED (r10) with the FULL
    // production 64-bit hash — mod-2^64 polynomial hashing replays in
    // HUGEINT, and the winnowed print SET per doc equals the distinct
    // full-window minima (see winnowOracleSql); exact positional
    // semantics additionally pinned in LlmSpec.
    QueryDef.df("q45_winnow_copydetect", winnowOracleSql) { (s, dir) =>
      val fps = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(
            graft.functions.Winnowing.winnowFingerprints(lower(col("text")), 20, 8))).as("fp"))
      val buckets = fps.groupBy("fp")
        .agg(sort_array(collect_list("doc_id")).as("ids"))
        .filter(size(col("ids")).between(2, 8)) // drop singletons AND stop-fps
      buckets
        .select(expr("explode_pairs(ids)").as(Seq("id_a", "id_b")))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("shared_fps"))
        .filter(col("shared_fps") >= 5)
        .orderBy("id_a", "id_b")
    },

    // ───── q41: per-label embedding centroids via the UDAF surface ───────
    // VectorAvg is a typed Aggregator -> partial+final hash agg; only
    // O(dim) buffers cross the shuffle regardless of row count. Raw
    // float->double summation order varies with partitioning (~1e-16
    // relative), so the comparable surface rounds the norm to 4 decimals —
    // far above summation noise, far below any real difference — which
    // lets the full DuckDB replay (per-dimension avg via unnest, same
    // rounding) gate it value-exactly. LlmSpec additionally pins exact
    // centroids on a hand-computed case.
    QueryDef.df(
      "q41_label_centroids",
      """WITH d AS (
        |  SELECT label, vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |c AS (SELECT label, i, avg(v) AS m FROM d GROUP BY 1, 2),
        |n AS (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY 1)
        |SELECT c.label, n.n_vectors, CAST(count(*) AS INT) AS dim,
        |  round(sqrt(sum(m * m)), 4) AS centroid_norm
        |FROM c JOIN n USING (label) GROUP BY 1, 2 ORDER BY label""".stripMargin) { (s, dir) =>
      val vavg = udaf(graft.functions.VectorAvg)
      t(s, dir, "embeddings")
        .groupBy(col("label").cast("int").as("label"))
        .agg(count(lit(1)).as("n_vectors"), vavg(col("embedding")).as("centroid"))
        .select(col("label"), col("n_vectors"), size(col("centroid")).as("dim"),
          round(sqrt(aggregate(col("centroid"), lit(0.0d), (acc, x) => acc + x * x)), 4)
            .as("centroid_norm"))
        .orderBy("label")
    },

    // ───── q42: top n-grams per language via the UDTF surface ────────────
    // explode_ngrams is a custom Generator (GenerateExec streams rows, no
    // corpus-sized buffers); counting shuffles on (lang, ngram) with
    // map-side partial aggregation; top-5 per lang is a BOUNDED top-k
    // aggregate (TopKByCount: k-item sorted buffer, partial+final — only
    // lang·5 entries cross its shuffle), deterministic via the (count
    // DESC, ngram) tie-break. The earlier rank-window formulation sorted
    // the whole distinct-ngram table under the tiny lang partition key —
    // data-scale input, skew-cliff at 100× (VERDICT r6 What's-wrong #2).
    QueryDef.df(
      "q42_ngram_freq",
      """WITH g AS (
        |  SELECT lang, unnest(
        |    [lower(text).string_split(' ')[i] || ' ' || lower(text).string_split(' ')[i+1] || ' ' || lower(text).string_split(' ')[i+2]
        |     for i in range(1, greatest(len(string_split(lower(text),' ')) - 1, 1))]) AS ngram
        |  FROM documents),
        |c AS (SELECT lang, ngram, count(*) AS n FROM g GROUP BY 1, 2),
        |r AS (SELECT lang, ngram, n, row_number() OVER (PARTITION BY lang ORDER BY n DESC, ngram) AS rk FROM c)
        |SELECT lang, ngram, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      val grams = t(s, dir, "documents")
        .select(col("lang"), expr("explode_ngrams(split(lower(text), ' '), 3)").as("ngram"))
      val counts = grams.groupBy("lang", "ngram").agg(count(lit(1)).as("n"))
      val top5 = udaf(new graft.functions.TopKByCount(5))
      counts.groupBy("lang").agg(top5(col("ngram"), col("n")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), col("col._1").as("ngram"), col("col._2").as("n"),
          (col("pos") + 1).cast("long").as("rk"))
        .orderBy("lang", "rk")
    },

    // ───── q50: multimodal frame sampling over binary payloads ───────────
    // The "video" pipeline shape end-to-end: opaque binary payload ->
    // sample_frames (stubbed decode, see graft.functions.Multimodal) ->
    // explode to one row per frame -> per-frame feature (xxhash64 as the
    // fake embedding) -> per-source aggregate. One scan, one shuffle on
    // source; frames never materialize outside their partition.
    // ORACLED in r11: the frame slicer is pure integer arithmetic over
    // byte offsets, and this corpus is ASCII (byte == char — the
    // distinct-frame compare itself would catch a drift), so DuckDB
    // replays the exact slices with substr over the text. The HLL
    // estimate — engine-specific by construction — gates through the q32
    // 5%-flag pattern; the exact distinct count hash-compares. LlmSpec
    // still pins exact frame bytes.
    QueryDef.df(
      "q50_frame_sample",
      """WITH d AS (
        |  SELECT source, text, length(text) AS L,
        |    least(4, greatest(1, length(text) // 64)) AS cnt
        |  FROM documents WHERE length(text) > 0),
        |o AS (
        |  SELECT source, text, L,
        |    (L - least(64, L)) * i // greatest(cnt - 1, 1) AS off
        |  FROM d, LATERAL unnest(generate_series(0, cnt - 1)) AS t(i)),
        |f AS (
        |  SELECT source, substr(text, off + 1, least(64, L - off)) AS frame,
        |    least(64, L - off) AS fb FROM o)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(fb) AS BIGINT) AS total_frame_bytes,
        |  CAST(count(DISTINCT frame) AS BIGINT) AS n_distinct_frames,
        |  TRUE AS approx_within_5pct
        |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val payload = encode(col("text"), "UTF-8")
      def within(est: Column, exact: Column): Column =
        abs(est - exact) <= greatest(lit(5L), ceil(exact * 0.05))
      t(s, dir, "documents")
        .select(col("source"),
          explode(graft.functions.Multimodal.sampleFrames(payload, 64, 4)).as("frame"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame")).cast("long")).as("total_frame_bytes"),
          countDistinct(col("frame")).as("n_distinct_frames"),
          approx_count_distinct(col("frame"), 0.02).as("est"))
        .select(col("source"), col("n_frames"), col("total_frame_bytes"),
          col("n_distinct_frames"),
          within(col("est"), col("n_distinct_frames")).as("approx_within_5pct"))
        .orderBy("source")
    },

    // ───── q189: ingest CADENCE profile (inter-arrival gaps) ──────────────
    // The pipeline-health number behind freshness SLOs and burst sizing:
    // per event type, the distribution of microsecond gaps between
    // consecutive events. The lag() window partitions by (type, DAY) — the
    // 100 TB shape: a day's partition is bounded by the event rate, corpus
    // growth adds partitions (more days), never partition depth; the one
    // boundary gap dropped per (type, day) is deterministic in both
    // engines. Gaps are integers, so the exact p95 sorts (type, long)
    // pairs — the q188 discipline; text/props never shuffle.
    QueryDef.df(
      "q189_ingest_cadence",
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY event_type, date_trunc('day', ts)
        |      ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, CAST(count(gap_us) AS BIGINT) AS n_gaps,
        |  CAST(round(avg(gap_us), 4) AS DOUBLE) AS mean_us,
        |  CAST(round(quantile_cont(gap_us, 0.95), 4) AS DOUBLE) AS p95_us,
        |  CAST(max(gap_us) AS BIGINT) AS max_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val byDay = Window
        .partitionBy(col("event_type"), date_trunc("day", col("ts")))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(byDay))
        .where(col("gap_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          round(avg(col("gap_us")), 4).as("mean_us"),
          round(expr("percentile(gap_us, 0.95)"), 4).as("p95_us"),
          max(col("gap_us")).as("max_us"))
        .orderBy("event_type")
    },

    // ───── q54: REAL image decode over sampled frames ────────────────────
    // The composed multimodal pipeline: frame-sample each binary payload,
    // run the JDK-ImageIO `decode_image` on every frame, aggregate decode
    // outcomes. On this corpus the payloads are text bytes, so every
    // decode correctly yields NULL (n_decodable = 0) — the decoder being
    // REAL is pinned in MultimodalSpec against generated PNG/BMP/JPEG
    // fixtures with exact gray-grid values.
    // ORACLED in r11 (VERDICT #3): only the decode itself has no DuckDB
    // analog; the frame COUNT is a pure function of byte length
    // (sample_frames yields min(n, max(1, len/frameBytes)) slices, none
    // for the empty payload), so the oracle replays the whole aggregate
    // and additionally asserts the real JDK decoder rejects every text
    // frame — n_decodable = 0 is a claim the gate now checks, not a stub.
    QueryDef.df(
      "q54_image_decode",
      """SELECT source,
        |  CAST(sum(least(4, greatest(1, octet_length(encode(text)) // 4096))) AS BIGINT) AS n_frames,
        |  CAST(0 AS BIGINT) AS n_decodable
        |FROM documents WHERE octet_length(encode(text)) > 0
        |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val payload = encode(col("text"), "UTF-8")
      t(s, dir, "documents")
        .select(col("source"),
          explode(graft.functions.Multimodal.sampleFrames(payload, 4096, 4)).as("frame"))
        .select(col("source"), graft.functions.Multimodal.decodeImage(col("frame"), 8).as("img"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_frames"),
          count(col("img.width")).as("n_decodable"))
        .orderBy("source")
    },

    // ───── q67: REAL audio decode over a mixed binary column ─────────────
    // Same plumbing shape as q54 for the audio modality: the corpus'
    // payloads are text bytes (correctly decode to NULL); three planted
    // REAL WAV fixtures (16-bit PCM sine, JDK-encoded) prove the decode
    // path end-to-end — per-source decodability counts plus exact duration
    // and near-exact sine RMS for the decodable group. decode_audio is the
    // JDK sampled-audio codec (WAV/AIFF/AU), pinned in MultimodalSpec.
    // ORACLED in r11 (VERDICT #3, the q33 fixed-literal precedent): the
    // three planted WAVs are deterministic JDK-encoded fixtures, so their
    // decoded stats are CONSTANTS the oracle replays as literals — 1000 +
    // 250 + 1000 ms, max peak 0.8 after the 2-dp round — while the Spark
    // side computes them through the REAL decode at query time. If the
    // decoder drifts, the hash gate fails; the corpus legs (every text
    // payload undecodable) are plain counts over documents.
    QueryDef.df(
      "q67_audio_decode",
      """SELECT source, CAST(count(*) AS BIGINT) AS n_payloads,
        |  CAST(0 AS BIGINT) AS n_decodable,
        |  CAST(0.0 AS DOUBLE) AS total_ms, CAST(0.0 AS DOUBLE) AS max_peak
        |FROM documents GROUP BY source
        |UNION ALL
        |SELECT 'audio_fixture', CAST(3 AS BIGINT), CAST(3 AS BIGINT),
        |  CAST(2250.0 AS DOUBLE), CAST(0.8 AS DOUBLE)
        |ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.functions.Multimodal
      val planted = s.createDataFrame(Seq(
        ("audio_fixture", Multimodal.syntheticWav(8000f, 1, 0.5, 440.0, 8000)),
        ("audio_fixture", Multimodal.syntheticWav(16000f, 2, 0.25, 220.0, 4000)),
        ("audio_fixture", Multimodal.syntheticWav(11025f, 1, 0.8, 330.0, 11025))))
        .toDF("source", "payload")
      val docs = t(s, dir, "documents")
        .select(col("source"), encode(col("text"), "UTF-8").as("payload"))
      docs.union(planted)
        .select(col("source"), Multimodal.decodeAudio(col("payload")).as("a"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_payloads"),
          count(col("a.sample_rate")).as("n_decodable"),
          coalesce(round(sum(col("a.duration_ms")), 3), lit(0.0)).as("total_ms"),
          coalesce(round(max(col("a.peak")), 2), lit(0.0)).as("max_peak"))
        .orderBy("source")
    },

    // ───── q32: HLL approximate distinct (SURVEY §2b approx row) ─────────
    // ORACLED since r9 via the q93/q96 pattern: the hashed columns are the
    // EXACT distinct counts (both engines agree), and the HLL estimates —
    // which differ numerically across engines by construction — are gated
    // through a 5%-relative-error flag the oracle asserts as TRUE. The
    // approx aggregation still runs in the same grouped pass, so the
    // sketch path stays exercised; ScalaTest additionally pins the error
    // bound (`SketchSuiteSpec`).
    QueryDef.df(
      "q32_approx_distinct",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  TRUE AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      def within(est: Column, exact: Column): Column =
        abs(est - exact) <= greatest(lit(5L), ceil(exact * 0.05))
      // two single-column distinct aggs + the sketch pass, joined on the
      // 3-row group key — NOT one multi-distinct agg: Spark plans that as
      // a 3-way Expand (every input row triplicated into the shuffle),
      // measured 4.4 s vs 1.3 s for this shape at sf0.1. Each distinct is
      // a map-side partial dedup, so the shuffles carry distinct pairs.
      val base = t(s, dir, "lineitem")
        .select("l_returnflag", "l_orderkey", "l_partkey")
      val est = base.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
      val no = base.select("l_returnflag", "l_orderkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_orders"))
      val np = base.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_parts"))
      est.join(no, "l_returnflag").join(np, "l_returnflag")
        .select(col("l_returnflag"), col("n_orders"), col("n_parts"),
          (within(col("ao"), col("n_orders")) &&
            within(col("ap"), col("n_parts"))).as("approx_within_5pct"))
        .orderBy("l_returnflag")
    },

    // ───── q33: SimHash near-dup candidates ──────────────────────────────
    // Single 64-bit fingerprint per doc; candidates = pairs agreeing on any
    // of 4 16-bit chunks (hamming<=3 guaranteed found for <=3 flipped
    // chunks). Shuffles only on (chunk, value) — never all-pairs.
    // ORACLED since r10 via the merge-table trick (q107's pattern): the
    // per-shingle hash is the XOR of three FIXED 60-bit constants from the
    // literal [[graft.functions.FixedSimhash.table]] (one per shingle position — XOR never
    // overflows, so both engines compute it exactly), and the simhash
    // majority vote + band-bucket + hamming verify replay in portable SQL.
    // The production-path XXH64 fingerprint (open-vocabulary corpora) stays
    // exercised by LlmSpec's exact planted-pair tests.
    QueryDef.df("q33_simhash_neardup", simhashOracleSql) { (s, dir) =>
      // ONE codegen pass per doc ([[graft.functions.FixedSimhash]]): table
      // lookups + XOR shingle hash + 64-bit majority vote in a tight Java
      // loop — the interpreted nested-lambda formulation of the same
      // semantics benched 25x slower (0.6 -> 14.9 s at sf0.1); the text
      // never leaves its row until bucketing
      val d = t(s, dir, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"),
          graft.functions.TextHashing.fixedSimhash(col("ts")).as("sh64"))
      val chunkStructs = (0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("sh64"), c * 16).bitwiseAND(lit(0xFFFFL)).as("cv")))
      val chunks = d.select(col("doc_id"), col("sh64"),
        explode(array(chunkStructs: _*)).as("e"))
        .select(col("doc_id"), col("sh64"), col("e.chunk"), col("e.cv"))
      // per-bucket pair expansion with the hamming cut INSIDE the array
      // lambda: only true near-dup pairs are ever exploded or shuffled
      // (shared-vocab corpora bias simhash bits, making 16-bit chunk
      // buckets hot). The built-in explode over lambdas keeps whole-stage
      // codegen; measured faster than both a self-join on the bucket key
      // (3x) and a custom Generator UDTF (codegen break).
      val buckets = chunks.groupBy("chunk", "cv")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("sh64")))).as("xs"))
        .filter(size(col("xs")) > 1)
      val pairs = buckets
        .select(explode(flatten(transform(col("xs"), (a, i) =>
          filter(
            transform(slice(col("xs"), i + 2, size(col("xs"))), b =>
              struct(a.getField("doc_id").as("id_a"), b.getField("doc_id").as("id_b"),
                bit_count(a.getField("sh64").bitwiseXOR(b.getField("sh64"))).as("hamming"))),
            p => p.getField("hamming") <= 6)))).as("p"))
        .select(col("p.id_a"), col("p.id_b"), col("p.hamming").cast("long").as("hamming"))
        .distinct()
      pairs.orderBy("id_a", "id_b")
    },

    // ───── q34: language-ID heuristic ────────────────────────────────────
    // Stopword-membership n-gram heuristic expressed in portable SQL so the
    // oracle replays it exactly; on this synthetic shared-vocab corpus it
    // demonstrates the operator (confusion counts per true lang).
    QueryDef.shared(
      "q34_langid",
      """SELECT lang,
        |  CASE
        |    WHEN (' ' || lower(text) || ' ') LIKE '% the %' OR (' ' || lower(text) || ' ') LIKE '% and %' THEN 'en'
        |    WHEN (' ' || lower(text) || ' ') LIKE '% der %' OR (' ' || lower(text) || ' ') LIKE '% und %' THEN 'de'
        |    WHEN (' ' || lower(text) || ' ') LIKE '% les %' OR (' ' || lower(text) || ' ') LIKE '% est %' THEN 'fr'
        |    WHEN (' ' || lower(text) || ' ') LIKE '% los %' OR (' ' || lower(text) || ' ') LIKE '% una %' THEN 'es'
        |    ELSE 'und'
        |  END AS predicted,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin),

    // ───── q35: quality scoring ──────────────────────────────────────────
    // Length-window + type-token-ratio + mean-token-length heuristic; same
    // arithmetic spelled for DuckDB in the oracle.
    QueryDef.df(
      "q35_quality_score",
      """WITH scored AS (
        |  SELECT source,
        |    (CASE WHEN n_chars BETWEEN 120 AND 2000 THEN 0.4 ELSE 0.1 END)
        |    + 0.4 * (CAST(len(list_distinct(string_split(lower(text),' '))) AS DOUBLE)
        |             / len(string_split(lower(text),' ')))
        |    + (CASE WHEN CAST(n_chars AS DOUBLE) / len(string_split(lower(text),' ')) BETWEEN 3 AND 9 THEN 0.2 ELSE 0.0 END)
        |      AS q
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) AS sum_quality
        |FROM scored GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val toks = words(col("text"))
      val ttr = size(array_distinct(toks)).cast("double") / size(toks)
      val meanTokLen = col("n_chars").cast("double") / size(toks)
      val q = when(col("n_chars").between(120, 2000), 0.4).otherwise(0.1) +
        lit(0.4) * ttr +
        when(meanTokLen.between(3, 9), 0.2).otherwise(0.0)
      t(s, dir, "documents")
        .select(col("source"), q.as("q"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("q").cast("decimal(18,6)")).cast("double").as("sum_quality"))
        .orderBy("source")
    },

    // ───── q36: multimodal column plumbing ───────────────────────────────
    // Treats the payload as an opaque binary column with typed metadata —
    // the schema/partitioning/batch shape of an image/audio pipeline. The
    // "decode" is a clearly-stubbed deterministic function of the bytes
    // (real codecs aren't in this container); the Spark-side plumbing
    // (binary col -> per-row feature struct -> aggregate) is real and
    // oracled byte-for-byte.
    QueryDef.df(
      "q36_multimodal_features",
      """WITH m AS (
        |  SELECT source, octet_length(encode(text)) AS payload_bytes,
        |         64 + (n_chars * 7) % 1216 AS fake_width,
        |         64 + (n_chars * 13) % 656 AS fake_height,
        |         1 + n_chars % 30 AS fake_frames
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_assets,
        |  CAST(sum(payload_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(fake_width * fake_height) AS BIGINT) AS total_pixels,
        |  CAST(max(fake_frames) AS BIGINT) AS max_frames
        |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val payload = encode(col("text"), "UTF-8") // binary payload column
      t(s, dir, "documents")
        .select(col("source"),
          octet_length(payload).as("payload_bytes"),
          (lit(64) + (col("n_chars") * 7) % 1216).as("fake_width"),
          (lit(64) + (col("n_chars") * 13) % 656).as("fake_height"),
          (lit(1) + col("n_chars") % 30).as("fake_frames"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_assets"),
          sum(col("payload_bytes").cast("long")).as("total_bytes"),
          sum((col("fake_width") * col("fake_height")).cast("long")).as("total_pixels"),
          max(col("fake_frames").cast("long")).as("max_frames"))
        .orderBy("source")
    },

    // ───── q56: dedup clusters = connected components over near-dup pairs ─
    // Pairs say "these two are dups"; a pipeline needs CLUSTERS (keep one
    // canonical doc per group). Candidate pairs here are the SQL-expressible
    // relation (same lang, |n_chars diff| <= 2) so DuckDB can oracle the
    // transitive closure with a recursive CTE; the Spark side generates the
    // SAME pairs via a banded equi-join (n_chars bucketed by 3, each doc
    // probes its own and both neighbor buckets — an equi-shuffle, never a
    // theta-join), then runs alternating large-star/small-star CC
    // (O(log² n) rounds, diameter-independent — see ConnectedComponents).
    QueryDef.df(
      "q56_dedup_components",
      """WITH RECURSIVE edges AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 2 AND a.doc_id <> b.doc_id
        |),
        |reach(node, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
        |),
        |comp AS (SELECT node, min(lbl) AS comp FROM reach GROUP BY node)
        |SELECT comp, CAST(count(*) AS BIGINT) AS n_docs
        |FROM comp GROUP BY comp HAVING count(*) > 1 ORDER BY comp""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
      // banded candidate join ([[docNearDupEdges]]): bucket = n_chars/3;
      // |diff|<=2 ⇒ buckets differ by at most 1, so probing {b-1, b, b+1}
      // covers every pair exactly once — pure equi-join on (lang, bucket)
      val (comp, release) = graft.functions.ConnectedComponents.runWithRelease(
        d.select(col("doc_id").as("node")), docNearDupEdges(d))
      val out = comp.groupBy("comp").agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") > 1)
        .orderBy("comp")
      try {
        // materialize the (output-sized) cluster counts so the final CC
        // round's checkpoint releases — q117's LocalRelation pattern
        import scala.jdk.CollectionConverters._
        s.createDataFrame(out.collect().toSeq.asJava, out.schema)
      } finally release()
    },

    // ───── q57: deterministic (reproducible) stratified sampling ─────────
    // Training-data mixes need samples that are stable across reruns,
    // engines, and partitionings: keep a doc iff a hash of its KEY falls
    // under the stratum's rate — no RNG, no partition-order dependence.
    // md5 is bit-identical in Spark and DuckDB, so the oracle IS the
    // definition. Rates: 50% of 'en' docs (8/16), 25% of the rest (4/16).
    QueryDef.df(
      "q57_deterministic_sample",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <
        |    CASE WHEN lang = 'en' THEN '8' ELSE '4' END) AS BIGINT) AS n_sampled
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val rate = when(col("lang") === "en", lit("8")).otherwise(lit("4"))
      val keep = substring(md5(col("doc_id").cast("string")), 1, 1) < rate
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          count_if(keep).as("n_sampled"))
        .orderBy("lang")
    },

    // ───── q58: TF-IDF top terms (corpus keyword extraction) ─────────────
    // One exploded-token pass -> per-term total tf + df, score =
    // tf·ln(N/df). Aggregates are exact (integer counts); the single
    // ln/multiply is rounded to 6 decimals on both sides for IEEE parity.
    // Top-k is TakeOrderedAndProject (per-partition heads + merge), never
    // a global sort; ties broken by term for determinism.
    QueryDef.df(
      "q58_tfidf_terms",
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
        |  FROM documents
        |),
        |tf AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS tf,
        |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM toks WHERE len(term) >= 3 GROUP BY term
        |)
        |SELECT term, tf, df,
        |  CAST(round(tf * ln((SELECT count(*) FROM documents) / CAST(df AS DOUBLE)), 6)
        |    AS DOUBLE) AS tfidf
        |FROM tf ORDER BY tfidf DESC, term LIMIT 25""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val n = docs.count().toDouble
      docs
        .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("term"))
        .where(length(col("term")) >= 3)
        .groupBy("term")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .select(col("term"), col("tf"), col("df"),
          round(col("tf") * log(lit(n) / col("df").cast("double")), 6).as("tfidf"))
        .orderBy(col("tfidf").desc, col("term"))
        .limit(25)
    },

    // ───── q59: the COMPOSED training-data pipeline ──────────────────────
    // quality-score -> filter -> exact-dedup (canonical = min doc_id per
    // content fingerprint) -> deterministic 50% sample -> per-lang stats.
    // Each stage is an operator proven above (q35/q27/q57); this pins that
    // they COMPOSE — one scan, then hash-aggs and one broadcast-scale join
    // back on the canonical ids. At 100 TB: the dedup shuffle moves only
    // (fingerprint, doc_id) pairs, never text.
    QueryDef.df(
      "q59_pipeline_compose",
      """WITH scored AS (
        |  SELECT doc_id, lang, text,
        |    (CASE WHEN n_chars BETWEEN 120 AND 2000 THEN 0.4 ELSE 0.1 END)
        |    + 0.4 * (CAST(len(list_distinct(string_split(lower(text),' '))) AS DOUBLE)
        |             / len(string_split(lower(text),' ')))
        |    + (CASE WHEN CAST(n_chars AS DOUBLE) / len(string_split(lower(text),' ')) BETWEEN 3 AND 9 THEN 0.2 ELSE 0.0 END)
        |      AS q
        |  FROM documents),
        |filtered AS (SELECT * FROM scored WHERE q >= 0.6),
        |canon AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM (SELECT md5(text) AS fp, doc_id FROM filtered) GROUP BY fp),
        |kept AS (SELECT f.* FROM filtered f JOIN canon c ON f.doc_id = c.doc_id),
        |sampled AS (
        |  SELECT * FROM kept WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8')
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) AS sum_q
        |FROM sampled GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val toks = words(col("text"))
      val ttr = size(array_distinct(toks)).cast("double") / size(toks)
      val meanTokLen = col("n_chars").cast("double") / size(toks)
      val q = when(col("n_chars").between(120, 2000), 0.4).otherwise(0.1) +
        lit(0.4) * ttr +
        when(meanTokLen.between(3, 9), 0.2).otherwise(0.0)
      val filtered = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"), q.as("q"))
        .where(col("q") >= 0.6)
      val canon = filtered
        .select(md5(col("text").cast("binary")).as("fp"), col("doc_id"))
        .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      filtered.join(canon, "doc_id")
        .where(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) < "8")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("q").cast("decimal(18,6)")).cast("double").as("sum_q"))
        .orderBy("lang")
    },

    // ───── q60: context-window chunking (training-sequence packing) ──────
    // Split each document's token stream into windows of 64 tokens with
    // stride 48 (16-token overlap) — the chunk inventory a sequence-packing
    // job feeds from. Chunk geometry is pure arithmetic on token counts, so
    // the chunk explosion carries (doc, chunk_idx) pairs only — the text
    // itself is never duplicated per chunk (at 100 TB the difference
    // between exploding ids and exploding documents).
    QueryDef.df(
      "q60_chunk_windows",
      """WITH d AS (
        |  SELECT source, len(string_split(lower(text), ' ')) AS n FROM documents),
        |g AS (
        |  SELECT source, n,
        |    CAST(CASE WHEN n <= 64 THEN 1
        |         ELSE ceil((n - 64) / 48.0) + 1 END AS BIGINT) AS n_chunks
        |  FROM d),
        |c AS (
        |  SELECT source, n, unnest(range(0, n_chunks)) AS ci FROM g)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(least(64, n - ci * 48)) AS BIGINT) AS sum_chunk_tokens,
        |  CAST(max(n - ci * 48) AS BIGINT) AS max_tail
        |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val n = size(words(col("text")))
      val nChunks = when(n <= 64, lit(1L))
        .otherwise(ceil((n - 64) / lit(48.0)).cast("long") + 1L)
      t(s, dir, "documents")
        .select(col("source"), n.as("n"), nChunks.as("n_chunks"))
        .select(col("source"), col("n"),
          explode(sequence(lit(0L), col("n_chunks") - 1L)).as("ci"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          sum(least(lit(64L), col("n") - col("ci") * 48L)).as("sum_chunk_tokens"),
          max((col("n") - col("ci") * 48L).cast("long")).as("max_tail"))
        .orderBy("source")
    },

    // ───── q61: PII-style pattern scrubbing audit ────────────────────────
    // The redaction pass every training corpus runs: find digit runs (id/
    // phone-shaped) and token@token (email-shaped) patterns, report counts
    // and the corpus size after redaction. Patterns stay in the
    // RE2-compatible subset both engines implement identically; the
    // redaction itself is length-visible via the char delta.
    QueryDef.df(
      "q61_pii_scrub",
      """SELECT source,
        |  CAST(sum(len(regexp_extract_all(text, '[0-9]{3,}'))) AS BIGINT) AS digit_runs,
        |  CAST(count(*) FILTER (WHERE regexp_matches(text, '[0-9]{3,}')) AS BIGINT) AS docs_with_digits,
        |  CAST(sum(length(regexp_replace(text, '[0-9]{3,}', '#', 'g'))) AS BIGINT) AS chars_after_scrub
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val digitRun = "[0-9]{3,}"
      t(s, dir, "documents")
        .groupBy("source")
        .agg(
          sum(size(regexp_extract_all(col("text"), lit(digitRun), lit(0))).cast("long"))
            .as("digit_runs"),
          count_if(regexp_like(col("text"), lit(digitRun))).as("docs_with_digits"),
          sum(length(regexp_replace(col("text"), digitRun, "#")).cast("long"))
            .as("chars_after_scrub"))
        .orderBy("source")
    },

    // ───── q62: corpus profiling (exact distribution stats) ──────────────
    // The length-distribution profile a mix designer reads before setting
    // filter thresholds: exact discrete percentiles (one pass + one
    // shuffle; Spark's exact percentile aggregates per group) — ints in,
    // ints out, so the oracle is bit-exact.
    QueryDef.df(
      "q62_corpus_profile",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars,
        |  CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).cast("long").as("min_chars"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
            .cast("long").as("p50_chars"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)")
            .cast("long").as("p90_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
        .orderBy("lang")
    },

    // ───── q79: duplicate-span removal (C4-style line dedup) ─────────────
    // C4/CCNet's corpus-global unit dedup: split every document into
    // non-overlapping 8-token spans, keep exactly ONE occurrence of each
    // distinct span corpus-wide (the first by (doc_id, chunk_idx)), drop
    // the rest, and reassemble each document from its surviving spans.
    // The 100 TB shape: the keep/drop decision shuffles ONLY
    // (fingerprint, doc_id, chunk_idx) — span text never moves; the winner
    // per fingerprint is a hash-agg min(struct), and reassembly re-slices
    // the spans from the original token array after a doc_id-keyed join of
    // integer index lists. Output pins the reassembled text via md5.
    QueryDef.df(
      "q79_span_dedup",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |chunks AS (
        |  SELECT doc_id, i AS chunk_idx,
        |    array_to_string(w[(i*8+1):((i+1)*8)], ' ') AS chunk
        |  FROM toks, LATERAL unnest(generate_series(0,
        |    CAST(ceil(len(w)/8.0) AS BIGINT) - 1)) AS t(i)),
        |ranked AS (
        |  SELECT doc_id, chunk_idx, chunk,
        |    row_number() OVER (PARTITION BY md5(chunk)
        |                       ORDER BY doc_id, chunk_idx) AS rn
        |  FROM chunks)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
        |  CASE WHEN count(CASE WHEN rn = 1 THEN 1 END) = 0 THEN NULL
        |       ELSE md5(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
        |                           ORDER BY chunk_idx)) END AS kept_md5
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val k = 8
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      // fingerprints only — the span text stays behind
      val chunks = docs
        .select(col("doc_id"),
          explode(sequence(lit(0),
            ceil(size(col("w")) / lit(k.toDouble)).cast("int") - 1)).as("chunk_idx"),
          col("w"))
        .select(col("doc_id"), col("chunk_idx"),
          md5(array_join(slice(col("w"), col("chunk_idx") * k + 1, lit(k)), " "))
            .as("fp"))
      // one winner per fingerprint: lexicographic min(doc_id, chunk_idx) ==
      // the oracle's row_number()=1 under the same ordering
      val keptIdx = chunks
        .groupBy("fp")
        .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("win"))
        .select(col("win.doc_id").as("doc_id"), col("win.chunk_idx").as("chunk_idx"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("chunk_idx"))).as("idx"))
      docs
        .withColumn("n_chunks", ceil(size(col("w")) / lit(k.toDouble)).cast("long"))
        .join(keptIdx, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(size(col("idx")), lit(0)).cast("long").as("n_kept"),
          when(coalesce(size(col("idx")), lit(0)) === 0, lit(null).cast("string"))
            .otherwise(md5(array_join(
              transform(col("idx"),
                i => array_join(slice(col("w"), i * k + 1, lit(k)), " ")),
              " "))).as("kept_md5"))
        .orderBy("doc_id")
    },

    // ───── q80: greedy sequence packing (training-shard assembly) ────────
    // Pack documents into fixed-token-budget bins without splitting: the
    // step that turns a filtered corpus into training sequences. Greedy
    // packing is a running accumulator WITH RESET — not expressible as a
    // window function (prefix sums don't decompose across the reset) — so
    // this is the one legitimately sequential operator in the pipeline,
    // made scalable the Spark way: documents hash into independent shards
    // (`doc_id % S`; S = the output shard count, thousands at 100 TB), ONE
    // shuffle co-locates each shard, flatMapSortedGroups streams it in
    // doc_id order through O(1) packer state (spillable sort, iterator in
    // → iterator out, nothing materialized). Oracle: DuckDB reproduces the
    // same greedy recurrence with a recursive CTE. Oversize docs (> budget)
    // get a bin of their own — packing never splits.
    QueryDef.df(
      "q80_pack_sequences",
      """WITH RECURSIVE docs2 AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |packed AS (
        |  SELECT shard, rn, doc_id, n_tokens,
        |    CAST(0 AS BIGINT) AS bin, n_tokens AS fill
        |  FROM docs2 WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
        |    CASE WHEN p.fill + d.n_tokens > 128 THEN p.bin + 1 ELSE p.bin END,
        |    CASE WHEN p.fill + d.n_tokens > 128 THEN d.n_tokens
        |         ELSE p.fill + d.n_tokens END
        |  FROM packed p JOIN docs2 d ON d.shard = p.shard AND d.rn = p.rn + 1)
        |SELECT doc_id, shard, bin, n_tokens
        |FROM packed ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val budget = 128L
      t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .as[(Long, Long, Long)]
        .groupByKey(_._2)
        .flatMapSortedGroups($"doc_id") { (shard, docs) =>
          var bin = 0L
          var fill = -1L // sentinel: first doc starts bin 0 regardless of size
          docs.map { case (docId, _, nt) =>
            if (fill < 0) fill = nt
            else if (fill + nt > budget) { bin += 1; fill = nt }
            else fill += nt
            (docId, shard, bin, nt)
          }
        }
        .toDF("doc_id", "shard", "bin", "n_tokens")
        .orderBy("doc_id")
    },

    // ───── q81: domain-mixture resampling (exact target proportions) ─────
    // The mix-design step: re-weight a corpus so each source contributes a
    // TARGET share (here weight ∝ source index + 1, total weight 210)
    // rather than its natural share. Exact-quota form: the achievable
    // corpus size is capped by the scarcest source (min over
    // floor(n_s·W/w_s)), each source's quota is floor(T·w_s/W), and the
    // quota is filled deterministically by md5(doc_id) rank — re-runs and
    // engines agree bit-for-bit, no binomial sampling noise. EXACT quotas
    // with NO full-corpus sort: md5 prefixes are uniform by construction,
    // so a 16-bit hex-prefix histogram (one map-combined hash agg, with
    // per-bin char sums riding along) locates each source's quota
    // boundary bin; only that bin's rows (≈ n_s/65536, balanced no matter
    // how skewed the corpus) ride a boundary-rank window, and everything
    // below the bin is answered from the histogram's cumulative sums.
    // The earlier per-source rank window sorted the whole corpus under
    // the tiny source key (VERDICT r6 What's-wrong #3).
    QueryDef.df(
      "q81_domain_mixture",
      """WITH d AS (SELECT doc_id, source, n_chars,
        |    CAST(substring(source, 4) AS INT) + 1 AS wt FROM documents),
        |counts AS (SELECT source, wt, count(*) AS n FROM d GROUP BY source, wt),
        |cap AS (SELECT CAST(min(floor(n * 210.0 / wt)) AS BIGINT) AS total FROM counts),
        |quota AS (SELECT c.source, c.n, CAST(floor(cap.total * c.wt / 210.0) AS BIGINT) AS t
        |          FROM counts c, cap),
        |ranked AS (SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM d)
        |SELECT q.source, CAST(q.n AS BIGINT) AS n_docs, q.t AS quota,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(r.n_chars) AS BIGINT) AS sum_kept_chars
        |FROM ranked r JOIN quota q ON r.source = q.source AND r.rk <= q.t
        |GROUP BY q.source, q.n, q.t ORDER BY q.source""".stripMargin) { (s, dir) =>
      val W = 210.0
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("bin", substring(col("h"), 1, 4))
      // DATA PASS 1: md5-prefix histogram with per-bin counts AND char
      // sums (uniform bins — ≈ n_s/65536 rows each, corpus-skew-immune)
      val hist = d.groupBy("source", "bin")
        .agg(count(lit(1)).as("cnt"), sum("n_chars").as("sc"))
      val histN = hist.groupBy("source").agg(sum("cnt").as("n"))
        .withColumn("wt", expr("CAST(substring(source, 4) AS INT)") + 1)
      val cap = histN
        .agg(floor(min(floor(col("n") * lit(W) / col("wt")))).cast("long").as("total"))
      val quota = histN.crossJoin(broadcast(cap))
        .select(col("source"), col("n"),
          floor(col("total") * col("wt") / lit(W)).cast("long").as("t"))
      // cumulative (count, chars) over the HISTOGRAM (bin-scale) locate
      // each source's boundary bin: the bin where kept-rank t falls
      val wcum = Window.partitionBy("source").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hist
        .withColumn("cb", coalesce(sum("cnt").over(wcum), lit(0L)))
        .withColumn("sb", coalesce(sum("sc").over(wcum), lit(0L)))
      val btarget = cum.join(broadcast(quota), "source")
        .filter(col("t") > 0 && col("cb") < col("t") && col("t") <= col("cb") + col("cnt"))
        .select(col("source"), col("bin"), col("n"), col("t"), col("cb"), col("sb"))
      // DATA PASS 2: only BOUNDARY-BIN rows ride the rank window; the
      // first t-cb of them (by the same (md5, doc_id) order) complete the
      // quota exactly
      val wsel = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      val boundary = d
        .join(broadcast(btarget.select("source", "bin", "t", "cb")), Seq("source", "bin"))
        .withColumn("rn", row_number().over(wsel))
        .filter(col("rn") <= col("t") - col("cb"))
        .groupBy("source")
        .agg(count(lit(1)).as("bk"), sum("n_chars").as("bchars"))
      btarget.join(boundary, "source")
        .select(col("source"), col("n").cast("long").as("n_docs"), col("t").as("quota"),
          (col("cb") + col("bk")).cast("long").as("n_kept"),
          (col("sb") + col("bchars")).cast("long").as("sum_kept_chars"))
        .orderBy("source")
    },

    // ───── q82: unigram NLL scoring (perplexity-proxy quality filter) ────
    // The cheap stand-in for a KenLM perplexity filter: score each document
    // by the mean negative log-likelihood of its tokens under the corpus's
    // own unigram distribution, surface the 25 most-surprising documents.
    // Shape at 100 TB: the vocabulary is Zipf-bounded (≪ corpus), so the
    // token→probability lookup BROADCASTS into the token stream — the only
    // corpus-sized movement is the per-doc partial+final agg; if a vocab
    // ever outgrew the broadcast threshold Spark falls back to a hash join
    // on the token key automatically. Decimal-summed ln keeps the mean
    // order-independent and engine-exact.
    QueryDef.df(
      "q82_unigram_nll",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM vocab),
        |scored AS (
        |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CAST(-ln(v.n / tot.nn) AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*) AS nll
        |  FROM toks t JOIN vocab v ON t.tok = v.tok CROSS JOIN tot
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, nll FROM scored
        |ORDER BY nll DESC, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      val tot = vocab.agg(sum(col("n")).cast("double").as("nn"))
      toks.join(broadcast(vocab), "tok")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          (sum((-log(col("n") / col("nn"))).cast("decimal(18,6)")).cast("double")
            / count(lit(1))).as("nll"))
        .orderBy(col("nll").desc, col("doc_id")).limit(25)
    },

    // ───── q86: SemDeDup — cluster-bucketed semantic dedup ───────────────
    // SemDeDup (Abbas et al. 2023): cluster embeddings, then dedup only
    // WITHIN clusters — the cluster is the candidate generator, so the
    // pairwise stage is bounded by cluster size, never all-pairs. Scale:
    // K grows with the corpus (K ≈ N/target-cluster-size), the centroid
    // set broadcasts, assignment is one hash-agg, and the within-cluster
    // pair join shuffles on cluster id only. Deterministic end to end:
    // md5-ranked seed centroids (no Lloyd iterations — seeds ARE the
    // centroids, so the oracle can replay assignment exactly), ties by id.
    QueryDef.df(
      "q86_semdedup",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |seeds AS (SELECT vec_id AS cid, emb AS cvec FROM e
        |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |scored AS (SELECT e.vec_id, e.emb, s.cid,
        |                  list_cosine_similarity(e.emb, s.cvec) AS sim
        |           FROM e, seeds s),
        |assigned AS (
        |  SELECT vec_id, emb, cid, sim AS csim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |                                 ORDER BY sim DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1)
        |SELECT DISTINCT a.vec_id, a.cid
        |FROM assigned a JOIN assigned b
        |  ON a.cid = b.cid AND a.vec_id <> b.vec_id
        |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
        |  AND (b.csim < a.csim OR (b.csim = a.csim AND b.vec_id < a.vec_id))
        |ORDER BY a.vec_id""".stripMargin) { (s, dir) =>
      // csim stays internal: a seed's SELF-cosine lands one ulp apart in
      // the two engines (1.0 vs 1.0+2e-16); every comparison is in-engine
      // consistent, so membership matches — only the raw value wouldn't
      semDedup(t(s, dir, "embeddings"), 16, 0.35).select("vec_id", "cid")
    },

    // ───── q91: decontamination via Bloom-sketch runtime filter ──────────
    // q76's scale-path twin for when the benchmark side is too big to
    // broadcast as ROWS (a billion 13-gram entries) but fits as a SKETCH
    // 100x smaller: build `bloom_build` over the bench grams (partial
    // sketches per task, one fixed-size merge), then kill non-bench corpus
    // grams with the codegen `bloom_probe` BEFORE the exact join's
    // shuffle — only the ~contaminated sliver of the 100 TB side ever
    // shuffles. The join here is deliberately a SHUFFLED hash join (no
    // broadcast) to model that shape; false positives just ride the
    // shuffle and die in the exact join, so the result is bit-identical
    // to the sketch-free plan (fully oracled). Sideways information
    // passing made explicit — same pattern as Spark's runtime row-level
    // filters and parquet bloom pushdown (BloomFilterSpec's write side).
    QueryDef.df(
      "q91_bloom_decontaminate",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
        |  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 8)
        |SELECT c.doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared
        |FROM grams c JOIN bench USING (g)
        |WHERE c.doc_id >= 8
        |GROUP BY c.doc_id HAVING count(DISTINCT c.g) >= 2
        |ORDER BY c.doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      def grams(df: DataFrame) = df
        .select(col("doc_id"), expr("explode_ngrams(split(lower(text), ' '), 3)").as("g"))
      val bench = grams(docs.filter(col("doc_id") < 8)).select("g").distinct()
      // ONE fixed-size sketch row to the driver (the same driver-side cost
      // as Spark's own runtime-filter scalar subquery); production sizes
      // expectedItems to the bench gram count
      val sketch = bench.agg(expr("bloom_build(xxhash64(g), 65536)"))
        .head().getAs[Array[Byte]](0)
      grams(docs.filter(col("doc_id") >= 8))
        .filter(call_function("bloom_probe", lit(sketch), xxhash64(col("g"))))
        .join(bench.hint("shuffle_hash"), "g")
        .groupBy("doc_id").agg(countDistinct(col("g")).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy("doc_id")
    },

    // ───── q92: image near-dup via DCT perceptual hash ───────────────────
    // Content-based image dedup — the multimodal twin of q33's simhash
    // text pass: phash64 over the binary payload (REAL JDK decode + DCT;
    // NULL for non-images composes over mixed corpora), then 8×8-bit
    // banded bucketing. The band join is LOSSLESS for the hamming ≤ 7
    // cut (pigeonhole: 7 bit-errors cannot dirty all 8 bands), unlike
    // LSH recall curves — at billions of images, widen the hash and the
    // bands together to keep buckets cold and the guarantee intact. Only
    // (band, bandValue, id, hash) shuffles; payloads never move after the
    // hash projection. Planted fixtures (dense-spectrum PNGs + their
    // brightness/noise re-encodes) prove the pipeline end-to-end; corpus
    // text payloads ride along and die at the NULL filter. Rows-only at
    // the driver (DuckDB cannot decode PNG); the exact pair set is pinned
    // in PerceptualHashSpec.
    // ORACLED in r11 (VERDICT #3): DuckDB still cannot decode PNG, but the
    // fixtures are deterministic, so their REAL phash64 values are frozen
    // literals ([[phashFixtureLiterals]]) and the oracle replays the ENTIRE
    // downstream pipeline — 8×8-bit banding, bucket join, pairwise XOR
    // popcount verify, distinct, census ordering — over those BIGINTs. The
    // Spark side recomputes the hashes through the real JDK decode at query
    // time: decoder drift, banding drift, or verify drift each fail the
    // gate. (`(ph >> (band*8)) & 255` matches shiftrightunsigned because
    // the mask discards the sign extension.)
    QueryDef.df(
      "q92_image_phash_neardup",
      s"""WITH p(img_id, ph) AS (
        |  SELECT * FROM (VALUES
        |${phashFixtureLiterals.map { case (id, ph) =>
            s"    (CAST($id AS BIGINT), CAST($ph AS BIGINT))"
          }.mkString(",\n")}) AS v(img_id, ph)),
        |b AS (
        |  SELECT img_id, ph, band, (ph >> (CAST(band AS INTEGER) * 8)) & 255 AS bv
        |  FROM p, LATERAL unnest(generate_series(0, 7)) AS t(band)),
        |cand AS (
        |  SELECT DISTINCT a.img_id AS id_a, b2.img_id AS id_b,
        |    CAST(bit_count(xor(a.ph, b2.ph)) AS INTEGER) AS hamming
        |  FROM b a JOIN b b2
        |    ON a.band = b2.band AND a.bv = b2.bv AND a.img_id < b2.img_id
        |  WHERE bit_count(xor(a.ph, b2.ph)) <= 7)
        |SELECT id_a, id_b, hamming FROM cand ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import graft.functions.Multimodal
      val planted = s.createDataFrame(
        phashFixtureIds.map(id => (id, phashFixturePayload(id))))
        .toDF("img_id", "payload")
      val corpus = t(s, dir, "documents")
        .select((col("doc_id") + 1000000L).as("img_id"),
          encode(col("text"), "UTF-8").as("payload"))
      val hashed = planted.union(corpus)
        .select(col("img_id"), Multimodal.phash64(col("payload")).as("ph"))
        .filter(col("ph").isNotNull)
      val bandStructs = (0 until 8).map(c =>
        struct(lit(c).as("band"),
          shiftrightunsigned(col("ph"), c * 8).bitwiseAND(lit(0xFFL)).as("bv")))
      val pairs = hashed
        .select(col("img_id"), col("ph"), explode(array(bandStructs: _*)).as("e"))
        .select(col("img_id"), col("ph"), col("e.band"), col("e.bv"))
        .groupBy("band", "bv")
        .agg(sort_array(collect_list(struct(col("img_id"), col("ph")))).as("xs"))
        .filter(size(col("xs")) > 1)
        .select(explode(flatten(transform(col("xs"), (a, i) =>
          filter(
            transform(slice(col("xs"), i + 2, size(col("xs"))), b =>
              struct(a.getField("img_id").as("id_a"), b.getField("img_id").as("id_b"),
                bit_count(a.getField("ph").bitwiseXOR(b.getField("ph"))).as("hamming"))),
            p => p.getField("hamming") <= 7)))).as("p"))
        .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
        .distinct()
      pairs.orderBy("id_a", "id_b")
    },

    // ───── q94: exact substring dedup (overlapping windows) ──────────────
    // The ExactSubstr pass of Lee et al., "Deduplicating Training Data
    // Makes Language Models Better" (2022), re-expressed Spark-first: a
    // window of K consecutive tokens that occurs anywhere else in the
    // corpus is a duplicate unless it is the corpus-wide FIRST occurrence
    // (by doc_id, pos); every token covered by a non-canonical duplicated
    // window is removed, and overlapping removals merge into maximal
    // spans — the suffix-array formulation's output, computed with joins
    // and hash-aggs instead of a monolithic sorted suffix array. The
    // 100 TB shape: only (fingerprint, doc_id, pos) triples ever shuffle
    // (window TEXT never leaves the scan task), the winner per
    // fingerprint is one hash-agg min(struct), non-canonical occurrences
    // come from one fingerprint-keyed join, and span-merging + text
    // reassembly happen inside per-document array lambdas after a single
    // doc_id-keyed join of integer position lists. Production would use a
    // 128-bit fingerprint instead of md5-string (same plan shape); K=10
    // ≈ the paper's 50-character unit at these token lengths.
    QueryDef.df(
      "q94_substring_dedup",
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |wins AS (
        |  SELECT doc_id, i AS pos,
        |    md5(array_to_string(w[(i+1):(i+10)], ' ')) AS fp
        |  FROM toks, LATERAL unnest(generate_series(0, len(w) - 10)) AS t(i)
        |  WHERE len(w) >= 10),
        |marked AS (
        |  SELECT doc_id, pos,
        |    count(*) OVER (PARTITION BY fp) AS c,
        |    row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
        |  FROM wins),
        |dups AS (SELECT doc_id, pos FROM marked WHERE c > 1 AND rn > 1),
        |spans AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN prev IS NULL OR pos > prev + 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
        |  FROM (SELECT doc_id, pos,
        |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM dups) GROUP BY doc_id),
        |cov AS (
        |  SELECT DISTINCT d.doc_id, j.idx
        |  FROM dups d, LATERAL unnest(generate_series(d.pos, d.pos + 9)) AS j(idx)),
        |toki AS (
        |  SELECT t.doc_id, i.idx, t.w[i.idx + 1] AS tok
        |  FROM toks t, LATERAL unnest(generate_series(0, len(t.w) - 1)) AS i(idx)),
        |kept AS (
        |  SELECT k.doc_id,
        |    md5(string_agg(k.tok, ' ' ORDER BY k.idx)) AS kept_md5
        |  FROM toki k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.idx = c.idx
        |  WHERE c.idx IS NULL GROUP BY k.doc_id)
        |SELECT t.doc_id,
        |  CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  CAST(greatest(len(t.w) - 9, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(nd.n_dup, 0) AS BIGINT) AS n_dup_wins,
        |  CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(cv.n_removed, 0) AS BIGINT) AS n_removed,
        |  k.kept_md5 AS kept_md5
        |FROM toks t
        |LEFT JOIN (SELECT doc_id, count(*) AS n_dup FROM dups GROUP BY doc_id) nd USING (doc_id)
        |LEFT JOIN spans s USING (doc_id)
        |LEFT JOIN (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id) cv USING (doc_id)
        |LEFT JOIN kept k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      val K = 10
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      // fingerprints only — the window text never leaves the scan task
      val wins = docs.filter(size(col("w")) >= K)
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("w")) - K)).as("pos"), col("w"))
        .select(col("doc_id"), col("pos"),
          md5(array_join(slice(col("w"), col("pos") + 1, lit(K)), " ")).as("fp"))
      // one hash-agg per fingerprint: occurrence count + canonical winner
      val byFp = wins.groupBy("fp")
        .agg(count(lit(1)).as("c"),
          min(struct(col("doc_id"), col("pos"))).as("win"))
        .filter(col("c") > 1)
      // non-canonical occurrences of duplicated windows (fp-keyed join)
      val dups = wins.join(byFp, "fp")
        .filter(struct(col("doc_id"), col("pos")) =!= col("win"))
        .select(col("doc_id"), col("pos"))
      // per-doc: sorted dup positions -> covered index set + merged spans
      val perDoc = dups.groupBy("doc_id")
        .agg(sort_array(collect_list(col("pos"))).as("dpos"))
        .select(col("doc_id"), col("dpos"),
          array_distinct(flatten(transform(col("dpos"),
            p => sequence(p, p + K - 1)))).as("cov"),
          aggregate(col("dpos"),
            struct(lit(0L).as("n"), lit(-100).as("prev")),
            (acc, p) => struct(
              (acc.getField("n") +
                when(p > acc.getField("prev") + K, 1L).otherwise(0L)).as("n"),
              p.as("prev")),
            acc => acc.getField("n")).as("n_spans"))
      docs.join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          greatest(size(col("w")) - (K - 1), lit(0)).cast("long").as("n_windows"),
          coalesce(size(col("dpos")), lit(0)).cast("long").as("n_dup_wins"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"),
          {
            val covSafe = coalesce(col("cov"), array().cast("array<int>"))
            val keptArr = filter(col("w"), (tok, i) => !array_contains(covSafe, i))
            when(size(keptArr) === 0, lit(null).cast("string"))
              .otherwise(md5(array_join(keptArr, " "))).as("kept_md5")
          })
        .orderBy("doc_id")
    },

    // ───── q95: exact heavy hitters via frequent-items sketch ────────────
    // Exact top-frequency bigrams at bounded memory — the sketch twin of
    // q42's full group-by: pass 1 builds ONE Misra-Gries sketch over the
    // corpus (fixed-size partials per task, one merge; no per-term shuffle
    // at all), whose NO_FALSE_NEGATIVES extraction is a guaranteed
    // SUPERSET of every bigram with count >= T (the runtime require
    // checks T exceeds the sketch's error bound — size maxMapSize > n/T);
    // pass 2 exact-counts ONLY the candidates (the InSet filter kills
    // ~everything before the shuffle) and applies the real threshold, so
    // the result is bit-identical to the sketch-free plan — fully
    // oracled. At 100 TB: the full group-by shuffles every (term, 1)
    // pair; this shuffles one ~16k-entry sketch per task plus the counts
    // of a few hundred candidate terms. Hash collisions (64-bit
    // pre-hashes) can only ADD candidates, which pass 2 discards.
    QueryDef.df(
      "q95_heavy_hitters",
      """WITH toks AS (
        |  SELECT string_split(lower(text), ' ') AS w FROM documents),
        |grams AS (
        |  SELECT array_to_string(w[i:i+1], ' ') AS g
        |  FROM toks, unnest(range(1, len(w))) AS t(i))
        |SELECT g, CAST(count(*) AS BIGINT) AS cnt
        |FROM grams GROUP BY g HAVING count(*) >= 40
        |ORDER BY cnt DESC, g""".stripMargin) { (s, dir) =>
      import graft.functions.FreqSketch
      val T = 40L
      def grams = t(s, dir, "documents")
        .select(expr("explode_ngrams(split(lower(text), ' '), 2)").as("g"))
      // pass 1: one bounded-size sketch to the driver — same driver-side
      // cost shape as a broadcast-join build or a runtime-filter subquery
      val sketchBytes = grams
        .agg(expr("freq_build(xxhash64(g), 16384)")).head().getAs[Array[Byte]](0)
      require(T > FreqSketch.maxError(sketchBytes),
        s"heavy-hitter threshold $T must exceed sketch error bound " +
          s"${FreqSketch.maxError(sketchBytes)} — raise maxMapSize")
      val cands = FreqSketch.candidates(sketchBytes, T)
      // pass 2: exact counts of the candidate superset only
      grams
        .filter(xxhash64(col("g")).isInCollection(cands))
        .groupBy("g").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= T)
        .orderBy(col("cnt").desc, col("g"))
    },

    // ───── q96: cross-source vocabulary overlap via theta sketches ───────
    // "How much does each source's trigram vocabulary overlap every
    // other's?" — the contamination/diversity matrix a corpus curator
    // reads before mixing sources. Exact pairwise overlap needs a
    // full-vocabulary shuffle per PAIR (O(S²) joins); theta sketches are
    // closed under set algebra, so ONE grouped aggregation builds a
    // fixed-size sketch per source and every pairwise |A∩B| / |A∪B| /
    // Jaccard is a driver-side set operation over those summaries —
    // S sketches, S·(S-1)/2 estimates, zero extra scans. Sketches are
    // exact below 2^lgK distincts (this corpus: ~1.3k trigrams/source at
    // lgK=16 → exact, hence fully oracled) and deterministic ~1%
    // estimators beyond — at 100 TB the same plan emits estimates with
    // stated error instead of falling over.
    QueryDef.df(
      "q96_source_overlap",
      """WITH toks AS (
        |  SELECT source, string_split(lower(text), ' ') AS w FROM documents),
        |grams AS (
        |  SELECT DISTINCT source, array_to_string(w[i:i+2], ' ') AS g
        |  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)),
        |c AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
        |i AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT ca.source AS src_a, cb.source AS src_b,
        |  CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
        |  CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
        |  CAST(ca.n + cb.n - coalesce(i.n_inter, 0) AS BIGINT) AS n_union,
        |  round(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
        |    / (ca.n + cb.n - coalesce(i.n_inter, 0)), 6) AS jaccard,
        |  TRUE AS sketch_within_5pct
        |FROM c ca JOIN c cb ON ca.source < cb.source
        |LEFT JOIN i ON i.src_a = ca.source AND i.src_b = cb.source
        |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
      import graft.functions.ThetaOps
      // one pass, one sketch per source (grouped TypedImperativeAggregate:
      // partial sketches per task, theta-union merge)
      val perSource = t(s, dir, "documents")
        .select(col("source"),
          expr("explode_ngrams(split(lower(text), ' '), 3)").as("g"))
        .groupBy("source").agg(expr("theta_build(g, 16)").as("sk"))
        .collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
        .sortBy(_._1)
      // r9 (VERDICT r8 Next #4): the exact distinct-gram pass is GATED, not
      // unconditional. When every per-source sketch is still in exact mode
      // (retained < 2^lgK, theta=1 — true at every gate SF, where each
      // vocabulary is < 65k trigrams) the exact pass is cheap by
      // construction and supplies the oracle-matching columns + the 5%
      // gate over the estimates. Once any sketch samples (the 100 TB
      // regime) the exact pass would be the O(S²) vocabulary shuffle this
      // query exists to avoid — the product answer IS the sketch
      // estimates, whose ±O(1%) designed error at lgK=16 backs the flag.
      val exactMode = perSource.forall { case (_, sk) => ThetaOps.isExact(sk) }
      def close(est: Long, exact: Long): Boolean =
        math.abs(est - exact) <= math.max(5L, math.ceil(0.05 * exact).toLong)
      val rows = if (exactMode) {
        val grams = t(s, dir, "documents")
          .select(col("source"),
            expr("explode_ngrams(split(lower(text), ' '), 3)").as("g"))
          .distinct()
        val exactN = grams.groupBy("source").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val a = grams.select(col("source").as("sa"), col("g"))
        val b = grams.select(col("source").as("sb"), col("g"))
        val exactInter = a.join(b, Seq("g")).where(col("sa") < col("sb"))
          .groupBy("sa", "sb").count()
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        for {
          (sa, ska) <- perSource.toSeq
          (sb, skb) <- perSource.toSeq if sa < sb
        } yield {
          val (na, nb) = (exactN(sa), exactN(sb))
          val inter = exactInter.getOrElse((sa, sb), 0L)
          val uni = na + nb - inter
          val ok = close(Math.round(ThetaOps.estimate(ska)), na) &&
            close(Math.round(ThetaOps.estimate(skb)), nb) &&
            close(Math.round(ThetaOps.intersect(ska, skb)), inter) &&
            close(Math.round(ThetaOps.unionEst(ska, skb)), uni)
          (sa, sb, na, nb, inter, uni,
            BigDecimal(inter.toDouble / uni).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            ok)
        }
      } else for {
        (sa, ska) <- perSource.toSeq
        (sb, skb) <- perSource.toSeq if sa < sb
      } yield {
        val na = Math.round(ThetaOps.estimate(ska))
        val nb = Math.round(ThetaOps.estimate(skb))
        val inter = Math.round(ThetaOps.intersect(ska, skb))
        val uni = math.max(na + nb - inter, Math.round(ThetaOps.unionEst(ska, skb)))
        (sa, sb, na, nb, inter, uni,
          BigDecimal(if (uni == 0L) 0.0 else inter.toDouble / uni)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          true)
      }
      import s.implicits._
      rows.toDF("src_a", "src_b", "n_a", "n_b", "n_inter", "n_union", "jaccard",
          "sketch_within_5pct")
        .orderBy("src_a", "src_b")
    },

    // ───── q99: incremental near-dup against a persisted band index ──────
    // The production shape of q28: dedup TODAY'S batch against the whole
    // historical corpus WITHOUT rescanning history. The corpus's minhash
    // band fingerprints live in a catalog table (bucket-partitioned on the
    // band hash); each incoming batch (1) probes its bands against the
    // index — shuffle cost O(batch + matched index rows), never O(corpus)
    // — (2) exact-verifies the candidates at J>=0.6, (3) APPENDS its own
    // bands in an O(batch) commit so the next batch dedups against it.
    // Two consecutive batches run here; the second provably sees the
    // first (its accepted docs are probe targets). The oracle computes
    // the same cross-batch pairs by brute force (bounded to the doc-id
    // window the batches actually process — the corpus grows past it at
    // sf>=0.1). Banding recall at 16x4: a planted near-dup (J>0.9)
    // misses with probability <1e-12, so the exact-verified output
    // matches the brute-force oracle deterministically in practice;
    // borderline J~0.6 pairs would miss ~10% and this corpus contains
    // none (q28's analysis).
    QueryDef.df(
      "q99_incremental_neardup",
      """WITH d AS (
        |  SELECT doc_id, list_distinct(
        |    [lower(text).string_split(' ')[i] || ' ' || lower(text).string_split(' ')[i+1] || ' ' || lower(text).string_split(' ')[i+2]
        |     for i in range(1, greatest(len(string_split(lower(text),' ')) - 1, 2))]) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |FROM d a JOIN d b ON
        |  ((b.doc_id >= 350 AND b.doc_id < 425 AND a.doc_id < 350) OR
        |   (b.doc_id >= 425 AND b.doc_id < 500 AND a.doc_id < 425))
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val bands = 16
      val rpb = 4
      val docs = t(s, dir, "documents")
      def shingled(df: DataFrame) = df.select(col("doc_id"), shingles3(col("text")).as("sh"))
      def bandsOf(df: DataFrame): DataFrame = {
        val sigs = shingled(df).select(col("doc_id"),
          minhashSignature(col("sh"), bands * rpb, 42L).as("sig"))
        val bandStructs = (0 until bands).map(b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rpb + 1, rpb)).as("bh")))
        sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
          .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS lake.verify")
      s.sql("DROP TABLE IF EXISTS lake.verify.nd_idx")
      s.sql("DROP TABLE IF EXISTS lake.verify.nd_pairs")
      s.sql(
        """CREATE TABLE lake.verify.nd_idx (doc_id BIGINT, band INT, bh BIGINT)
          |PARTITIONED BY (bucket(8, bh))""".stripMargin)
      s.sql("CREATE TABLE lake.verify.nd_pairs (id_a BIGINT, id_b BIGINT, jaccard DOUBLE)")
      bandsOf(docs.filter(col("doc_id") < 350)).writeTo("lake.verify.nd_idx").append()
      val shAll = shingled(docs)
      // probe the CURRENT index, then ingest the batch (O(batch) append);
      // verified pairs land in a lake results table — never the driver —
      // so a pathological corpus with an unbounded pair set still runs.
      // The pairs append is the action that materializes the probe, and
      // it commits BEFORE the band ingest, so batch N never probes itself
      def probeAndIngest(lo: Long, hi: Long): Unit = {
        val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        val probe = bandsOf(batch).select(col("doc_id").as("id_b"), col("band"), col("bh"))
        val idx = s.table("lake.verify.nd_idx")
          .select(col("doc_id").as("id_a"), col("band"), col("bh"))
        val cands = probe.join(idx, Seq("band", "bh"))
          .select(col("id_a"), col("id_b")).distinct()
        cands
          .join(shAll.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(shAll.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
          .filter(col("jaccard") >= 0.6)
          .writeTo("lake.verify.nd_pairs").append()
        bandsOf(batch).writeTo("lake.verify.nd_idx").append()
      }
      // storage-aligned probe: with v2 bucketing shuffle on, the join
      // repartitions ONLY the batch side to match the index's bucket
      // layout — the 100 TB index is read in place (plan-asserted in
      // RuntimePruningSpec). Execution is eager inside probeAndIngest
      // (both writeTo appends are actions), so the conf toggle cannot
      // leak into other queries.
      val prevShuffle = s.conf.get("spark.sql.sources.v2.bucketing.shuffle.enabled", "false")
      s.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      try { probeAndIngest(350, 425); probeAndIngest(425, 500) }
      finally s.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", prevShuffle)
      s.table("lake.verify.nd_pairs").orderBy("id_a", "id_b")
    },

    // ───── q100: the full curation pipeline, end to end ──────────────────
    // The capstone composition — the whole corpus-curation funnel a
    // training run actually uses, every stage one of this engine's
    // already-oracled operators, chained over ONE corpus with per-stage
    // retention accounting: language filter (q34's heuristic) → quality
    // cut (q35's score ≥ 0.6) → benchmark decontamination (q76's shared
    // 4-gram rule) → exact dedup (q27, keep first) → near-dup dedup (q28's
    // LSH + exact verify at J≥0.6, drop the newer of each pair) →
    // deterministic 50% sample (q57's md5 rule). Output = docs/tokens
    // surviving each stage — the funnel report a curator reads. Every
    // stage is a hash-agg / join / filter over the previous survivor set;
    // nothing rescans the corpus more than the stage needs, nothing
    // collects rows to the driver, and the oracle replays the identical
    // funnel in SQL (IEEE-identical arithmetic, same tie handling).
    QueryDef.df(
      "q100_curation_pipeline",
      """WITH d0 AS (
        |  SELECT doc_id, text, n_chars, string_split(lower(text), ' ') AS w FROM documents),
        |l1 AS (SELECT * FROM d0 WHERE
        |  CASE
        |    WHEN (' ' || lower(text) || ' ') LIKE '% the %' OR (' ' || lower(text) || ' ') LIKE '% and %' THEN 'en'
        |    WHEN (' ' || lower(text) || ' ') LIKE '% der %' OR (' ' || lower(text) || ' ') LIKE '% und %' THEN 'de'
        |    WHEN (' ' || lower(text) || ' ') LIKE '% les %' OR (' ' || lower(text) || ' ') LIKE '% est %' THEN 'fr'
        |    WHEN (' ' || lower(text) || ' ') LIKE '% los %' OR (' ' || lower(text) || ' ') LIKE '% una %' THEN 'es'
        |    ELSE 'und'
        |  END = 'en'),
        |l2 AS (SELECT * FROM l1 WHERE
        |  (CASE WHEN n_chars BETWEEN 120 AND 2000 THEN 0.4 ELSE 0.1 END)
        |  + 0.4 * (CAST(len(list_distinct(w)) AS DOUBLE) / len(w))
        |  + (CASE WHEN CAST(n_chars AS DOUBLE) / len(w) BETWEEN 3 AND 9 THEN 0.2 ELSE 0.0 END)
        |  >= 0.6),
        |grams AS (
        |  SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
        |  FROM d0, unnest(range(1, len(w) - 2)) AS t(i)),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5),
        |contam AS (
        |  SELECT c.doc_id FROM grams c JOIN bench USING (g)
        |  WHERE c.doc_id >= 5 GROUP BY c.doc_id HAVING count(DISTINCT c.g) >= 2),
        |l3 AS (SELECT * FROM l2 WHERE doc_id >= 5
        |  AND doc_id NOT IN (SELECT doc_id FROM contam)),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM l3 GROUP BY md5(lower(text))),
        |l4 AS (SELECT * FROM l3 WHERE doc_id IN (SELECT doc_id FROM keepers)),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    [lower(text).string_split(' ')[i] || ' ' || lower(text).string_split(' ')[i+1] || ' ' || lower(text).string_split(' ')[i+2]
        |     for i in range(1, greatest(len(string_split(lower(text),' ')) - 1, 2))]) AS shg
        |  FROM l4),
        |dropped AS (
        |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.shg, b.shg)) AS DOUBLE)
        |    / (len(a.shg) + len(b.shg) - len(list_intersect(a.shg, b.shg))) >= 0.6),
        |l5 AS (SELECT * FROM l4 WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
        |l6 AS (SELECT * FROM l5 WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
        |stages AS (
        |  SELECT 0 AS stage, 'corpus' AS label, count(*) AS n, sum(len(w)) AS tok FROM d0
        |  UNION ALL SELECT 1, 'lang_en', count(*), sum(len(w)) FROM l1
        |  UNION ALL SELECT 2, 'quality', count(*), sum(len(w)) FROM l2
        |  UNION ALL SELECT 3, 'decontaminated', count(*), sum(len(w)) FROM l3
        |  UNION ALL SELECT 4, 'exact_dedup', count(*), sum(len(w)) FROM l4
        |  UNION ALL SELECT 5, 'near_dedup', count(*), sum(len(w)) FROM l5
        |  UNION ALL SELECT 6, 'sampled', count(*), sum(len(w)) FROM l6)
        |SELECT CAST(stage AS BIGINT) AS stage, label,
        |  CAST(n AS BIGINT) AS n_docs, CAST(tok AS BIGINT) AS n_tokens
        |FROM stages ORDER BY stage""".stripMargin) { (s, dir) =>
      val d0 = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"),
          words(col("text")).as("w"))
      // stages 1-2 are row-local FLAGS (no set dependence): the funnel is
      // computed as nested booleans per document and aggregated in ONE
      // conditional pass at the end — a naive per-stage re-aggregation
      // re-executes the whole cascade once per stage (7 corpus passes;
      // measured 3x slower at sf0.1 and fatal at 100 TB).
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      val predicted =
        when(padded.contains(" the ") || padded.contains(" and "), "en")
          .when(padded.contains(" der ") || padded.contains(" und "), "de")
          .when(padded.contains(" les ") || padded.contains(" est "), "fr")
          .when(padded.contains(" los ") || padded.contains(" una "), "es")
          .otherwise("und")
      // q35's score, SAME operation order as the oracle so the >= 0.6
      // boundary decides identically in IEEE
      val q = when(col("n_chars").between(120, 2000), 0.4).otherwise(0.1) +
        lit(0.4) * (size(array_distinct(col("w"))).cast("double") / size(col("w"))) +
        when((col("n_chars").cast("double") / size(col("w"))).between(3, 9), 0.2)
          .otherwise(0.0)
      val base = d0
        .withColumn("s1", predicted === "en")
        .withColumn("s2", col("s1") && q >= 0.6)
      // stage 3: decontamination (q76's rule: >= 2 shared distinct
      // 4-grams with the benchmark docs; bench docs themselves dropped)
      def grams4(df: DataFrame) = df.select(col("doc_id"),
        expr("explode_ngrams(split(lower(text), ' '), 4)").as("g"))
      val bench = grams4(d0.filter(col("doc_id") < 5)).select("g").distinct()
      val contam = grams4(d0.filter(col("doc_id") >= 5))
        .join(broadcast(bench), "g")
        .groupBy("doc_id").agg(countDistinct(col("g")).as("ns"))
        .filter(col("ns") >= 2).select(col("doc_id"), lit(true).as("contaminated"))
      val withS3 = base.join(contam, Seq("doc_id"), "left")
        .withColumn("s3", col("s2") && col("doc_id") >= 5 &&
          !coalesce(col("contaminated"), lit(false)))
        .drop("contaminated")
      // stage 4: exact dedup among stage-3 survivors (keep the first doc
      // per fingerprint — one hash-agg + one join; keepers ⊆ survivors,
      // so the flag implies s3)
      val keepers = withS3.filter(col("s3"))
        .groupBy(md5(lower(col("text"))).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), lit(true).as("kept"))
      val withS4 = withS3.join(keepers, Seq("doc_id"), "left")
        .withColumn("s4", coalesce(col("kept"), lit(false))).drop("kept")
      // stage 5: near-dup dedup among stage-4 survivors (q28's LSH +
      // exact verify at J>=0.6; drop the newer doc of each pair) — the
      // LSH subplan appears ONCE in the DAG
      val shL4 = withS4.filter(col("s4"))
        .select(col("doc_id"), shingles3(col("text")).as("sh"))
      val bands = 16
      val rpb = 4
      val sigs = shL4.select(col("doc_id"),
        minhashSignature(col("sh"), bands * rpb, 42L).as("sig"))
      val bandStructs = (0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rpb + 1, rpb)).as("bh")))
      val cands = sigs
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
        .select(col("doc_id"), col("e.band"), col("e.bh"))
        .groupBy("band", "bh")
        .agg(sort_array(collect_list("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(flatten(transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
            struct(a.as("id_a"), b.as("id_b")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .distinct()
      val dropped = cands
        .join(shL4.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(shL4.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .filter(jaccard(col("sh_a"), col("sh_b")) >= 0.6)
        .select(col("id_b").as("doc_id")).distinct()
        .withColumn("dup", lit(true))
      val flagged = withS4.join(dropped, Seq("doc_id"), "left")
        .withColumn("s5", col("s4") && !coalesce(col("dup"), lit(false)))
        .drop("dup")
        // stage 6: deterministic 50% sample (q57's md5 rule)
        .withColumn("s6", col("s5") &&
          substring(md5(col("doc_id").cast("string")), 1, 1) < "8")
      // ONE conditional aggregation pass produces the whole funnel
      val flags = Seq("s1", "s2", "s3", "s4", "s5", "s6")
      val aggs =
        Seq(count(lit(1)).cast("long").as("n0"),
          sum(size(col("w"))).cast("long").as("t0")) ++
        flags.zipWithIndex.flatMap { case (f, i) =>
          Seq(sum(when(col(f), 1L).otherwise(0L)).as(s"n${i + 1}"),
            sum(when(col(f), size(col("w"))).otherwise(0)).cast("long").as(s"t${i + 1}"))
        }
      val row = flagged.agg(aggs.head, aggs.tail: _*).head()
      val labels = Seq("corpus", "lang_en", "quality", "decontaminated",
        "exact_dedup", "near_dedup", "sampled")
      import s.implicits._
      labels.zipWithIndex.map { case (label, i) =>
        (i.toLong, label, row.getLong(2 * i), row.getLong(2 * i + 1))
      }.toDF("stage", "label", "n_docs", "n_tokens").orderBy("stage")
    },

    // ───── q104: substring search via a winnowed inverted index ──────────
    // "Which docs contain this phrase?" without scanning text: a PERSISTED
    // index table of winnowing fingerprints (k=8-byte grams, window w=8),
    // bucket-partitioned by fingerprint. The winnowing guarantee (every
    // window's rightmost-min hash is emitted) makes the probe LOSSLESS for
    // needles of length >= k+w-1 = 15: any occurrence shares at least one
    // selected fingerprint with the needle's own winnowing. Probe shape =
    // fingerprint the needle (one-row plan), bucket-pruned IN-probe of the
    // index (RuntimePruningSpec asserts files skipped), exact contains()
    // verify over only the candidate docs — at 100 TB a LIKE '%phrase%'
    // becomes a few index buckets + a handful of doc reads, not a corpus
    // scan. Oracle = the LIKE scan itself.
    QueryDef.df(
      "q104_substring_index",
      """SELECT needle, doc_id FROM (
        |  SELECT 'row column sort' AS needle, doc_id FROM documents
        |    WHERE text LIKE '%row column sort%'
        |  UNION ALL
        |  SELECT 'stream table hash' AS needle, doc_id FROM documents
        |    WHERE text LIKE '%stream table hash%'
        |  UNION ALL
        |  SELECT 'window fast query' AS needle, doc_id FROM documents
        |    WHERE text LIKE '%window fast query%') s
        |ORDER BY needle, doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.Winnowing.winnowFingerprints
      val (k, w) = (8, 8)
      s.sql("CREATE NAMESPACE IF NOT EXISTS lake.verify")
      s.sql("DROP TABLE IF EXISTS lake.verify.sub_idx")
      s.sql(
        """CREATE TABLE lake.verify.sub_idx (fp BIGINT, doc_id BIGINT)
          |PARTITIONED BY (bucket(8, fp))""".stripMargin)
      t(s, dir, "documents")
        .select(explode(array_distinct(winnowFingerprints(col("text"), k, w))).as("fp"),
          col("doc_id"))
        .writeTo("lake.verify.sub_idx").append()
      val docs = t(s, dir, "documents")
      val results = Seq("row column sort", "stream table hash", "window fast query")
        .map { needle =>
          // the needle's own fingerprints: a bounded handful (|needle|),
          // computed by the same expression — collect is O(needle), not data
          val fps = s.range(1)
            .select(explode(winnowFingerprints(lit(needle), k, w)).as("fp"))
            .collect().map(_.getLong(0)).distinct.toSeq
          val cands = s.table("lake.verify.sub_idx")
            .where(col("fp").isin(fps: _*))
            .select(col("doc_id")).distinct()
          docs.join(cands, "doc_id") // candidate set is tiny → broadcast-able
            .where(col("text").contains(needle))
            .select(lit(needle).as("needle"), col("doc_id"))
        }
      results.reduce(_ unionAll _).orderBy("needle", "doc_id")
    },

    // ───── q127: blocked edit-distance fuzzy dedup ────────────────────────
    // The dedup modality the family was missing: EDIT DISTANCE (typo-level
    // near-identity — author names, source URLs, titles), the classic
    // record-linkage shape [Fellegi & Sunter 1969]. Never all-pairs: pairs
    // generate ONLY inside equi-join BLOCKS — same nation, same length,
    // same name-minus-trailing-3 (suffix-window blocking: lossless for
    // edits confined to the trailing window, the standard recall/scale
    // trade of record linkage; coarse nation+length blocks alone left
    // 4.5M DP evaluations at sf0.1 — 25 s — vs 0.3M with the window key).
    // At 100 TB the block keys are the table's cluster keys, so the join
    // is co-partitioned and shuffle-free; the O(len²) levenshtein DP — a
    // codegen Catalyst expression — runs once per blocked candidate,
    // filtered to distance ≤ 2. Output is the per-distance pair census.
    // Shared SQL: both engines run the identical statement (unit-cost
    // Levenshtein on ASCII is engine-independent).
    QueryDef.shared(
      "q127_fuzzy_blocked_dedup",
      // BLOCK-SIZE CAP (r9, found by SkewBench): a hot block — thousands
      // of records sharing (nation, length, name-stem), the "John Smith"
      // case — generates C(b,2) DP evaluations with no downstream cut, the
      // same cliff shape as q121's pre-backbone pair join (3.2x on the
      // planted skew fixture). The ranked CTE keeps the 512
      // smallest-custkey rows per block, the standard record-linkage
      // block-size cap (stated recall trade, like the suffix-window key
      // itself); row_number+filter compiles to a map-side WindowGroupLimit
      // in Spark, and the cap lives IN the shared SQL so the oracle
      // replays it by construction. 512 is far above this corpus's max
      // block (uniform keys: blocks of ~1-4 at every SF), so gate results
      // are unchanged; the planted-hot-block test pins the binding case.
      """WITH ranked AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    row_number() OVER (
        |      PARTITION BY c_nationkey, length(c_name),
        |        substring(c_name, 1, length(c_name) - 3)
        |      ORDER BY c_custkey) AS rn
        |  FROM customer),
        |c AS (SELECT * FROM ranked WHERE rn <= 512),
        |p AS (
        |  SELECT levenshtein(a.c_name, b.c_name) AS dist
        |  FROM c a JOIN c b
        |    ON a.c_nationkey = b.c_nationkey
        |   AND substring(a.c_name, 1, length(a.c_name) - 3)
        |     = substring(b.c_name, 1, length(b.c_name) - 3)
        |   AND length(a.c_name) = length(b.c_name)
        |   AND a.c_custkey < b.c_custkey)
        |SELECT dist, CAST(count(*) AS BIGINT) AS n
        |FROM p WHERE dist <= 2 GROUP BY dist ORDER BY dist""".stripMargin),

    // ───── q128: banded suffix-hamming dedup (pigeonhole-lossless) ────────
    // q127's levenshtein needed a recall-trading block key; HAMMING over a
    // fixed identifier window admits a LOSSLESS one: partition the 9
    // tail positions into three disjoint 3-position bands — two mismatches
    // cannot touch all three, so any pair at tail-distance ≤ 2 agrees on
    // ≥ 1 band (pigeonhole; same trick as the phash bands of q92, valid
    // for ANY choice of disjoint covering bands). Two skew defenses, both
    // found by benching: the bands INTERLEAVE (positions {i, i+3, i+6}) so
    // each mixes high- and low-entropy character positions — contiguous
    // bands left one value shared by every row (a quadratic block, 19 s at
    // sf0.1) — and the exact `hamming_distance` verify (codegen,
    // TextHashing.scala; DuckDB's built-in `hamming` is its oracle twin)
    // runs INSIDE the join condition, so skewed-band candidates are probe
    // iterations, never materialized rows. The oracle brute-forces within
    // stem blocks — candidate generation never does; at 100 TB the band
    // join shuffles only (stem, band, id, tail), never the corpus.
    //
    // SATURATION vs THIS GATE: the oracle below is the LOSSLESS census.
    // Under the r12 defaults, a corpus whose band blocks saturate (q185's
    // pre-flight audit; the in-query profile) AUTO-ENGAGES the block cap —
    // an approximation with a printed dropped-pair bound — so a saturated
    // run fails this hash gate LOUDLY by design rather than burning the
    // quadratic census silently. To re-green the gate at such scale, opt
    // into graft.hamming.lossless=true (and pay the documented 23.6×-at-
    // 10× curve) or dedup the key column first. Unsaturated corpora (this
    // testdata at every SF) match bit-for-bit under the defaults.
    QueryDef.df(
      "q128_hamming_banded",
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |p AS (SELECT hamming(right(a.name, 9), right(b.name, 9)) AS dist
        |      FROM c a JOIN c b
        |        ON substr(a.name, 1, length(a.name) - 9)
        |         = substr(b.name, 1, length(b.name) - 9)
        |       AND length(a.name) = length(b.name)
        |       AND a.id < b.id)
        |SELECT dist, CAST(count(*) AS BIGINT) AS n
        |FROM p WHERE dist <= 2 GROUP BY dist ORDER BY dist""".stripMargin) { (s, dir) =>
      hammingBandedCensus(s, t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name")))
    },

    // ───── q185: band block-size profile (q128's saturation audit) ────────
    // The guardrail r10's scale curve demanded: q128's lossless banding is
    // Ω(pairs-sharing-a-band), and a LOW-ENTROPY key space (dense sequential
    // ids — ≤10³ values per 3-char band) saturates the band alphabet, so
    // blocks grow ~n/const and probe pairs ~n² (measured 27.4× for 10× data
    // on the dense-id fixture). This query IS the audit a 100 TB deployment
    // runs before the join: per-band block count, max block, and the exact
    // candidate-pair bill Σ C(block,2). One skinny hash-agg — names never
    // shuffle with their text, output is O(bands). The same profile runs
    // INSIDE q128 as a guardrail (warn / opt-in cap / fail-fast; see
    // hammingBandedCensus).
    QueryDef.df(
      "q185_hamming_block_profile",
      """WITH c AS (
        |  SELECT substr(c_name, 1, length(c_name) - 9) AS stem,
        |         length(c_name) AS len, right(c_name, 9) AS tail
        |  FROM customer),
        |bands AS (
        |  SELECT 0 AS band, stem, len,
        |    substr(tail,1,1) || substr(tail,4,1) || substr(tail,7,1) AS bval FROM c
        |  UNION ALL
        |  SELECT 1, stem, len,
        |    substr(tail,2,1) || substr(tail,5,1) || substr(tail,8,1) FROM c
        |  UNION ALL
        |  SELECT 2, stem, len,
        |    substr(tail,3,1) || substr(tail,6,1) || substr(tail,9,1) FROM c),
        |blocks AS (
        |  SELECT band, stem, len, bval, count(*) AS n
        |  FROM bands GROUP BY 1, 2, 3, 4)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(max(n) AS BIGINT) AS max_block,
        |  CAST(sum(n * (n - 1) // 2) AS BIGINT) AS pairs_upper
        |FROM blocks GROUP BY band ORDER BY band""".stripMargin) { (s, dir) =>
      hammingBandProfile(hammingKeyed(t(s, dir, "customer")
          .select(col("c_custkey").as("id"), col("c_name").as("name"))), None)
        .select(col("band"), col("n_blocks"), col("max_block"), col("pairs_upper"))
        .orderBy("band")
    },

    // ───── q144: dedup cluster CANONICAL selection (keep-best) ────────────
    // The step after q56: a dedup pipeline doesn't just find clusters, it
    // keeps ONE representative per cluster — here the highest-quality doc
    // (quality = n_chars, integer-deterministic; ties -> smallest doc_id)
    // and reports how many the choice drops. Spark side: the same
    // large-star/small-star components as q56, one hash-agg argmax per
    // cluster (max(struct(quality, -id)) — no window over the corpus);
    // the oracle replays the transitive closure with a recursive CTE and
    // a window. Composition is the point: dedup -> curation in one plan.
    QueryDef.df(
      "q144_dedup_keep_best",
      """WITH RECURSIVE edges AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 2 AND a.doc_id <> b.doc_id
        |),
        |reach(node, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
        |),
        |comp AS (SELECT node, min(lbl) AS comp FROM reach GROUP BY node),
        |sized AS (SELECT comp, count(*) AS n FROM comp GROUP BY comp),
        |best AS (
        |  SELECT c.comp, d.doc_id, row_number() OVER (
        |    PARTITION BY c.comp ORDER BY d.n_chars DESC, d.doc_id) AS rk
        |  FROM comp c JOIN documents d ON d.doc_id = c.node)
        |SELECT b.comp, b.doc_id AS kept_doc, CAST(s.n - 1 AS BIGINT) AS n_dropped
        |FROM best b JOIN sized s USING (comp)
        |WHERE b.rk = 1 AND s.n > 1 ORDER BY b.comp""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
      val (comp, release) = graft.functions.ConnectedComponents.runWithRelease(
        d.select(col("doc_id").as("node")), docNearDupEdges(d))
      val out = comp.join(d, col("node") === col("doc_id"))
        .groupBy("comp")
        .agg(count(lit(1)).as("n"),
          max(struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("m"))
        .where(col("n") > 1)
        .select(col("comp"), (-col("m.nid")).as("kept_doc"),
          (col("n") - 1).as("n_dropped"))
        .orderBy("comp")
      try {
        import scala.jdk.CollectionConverters._
        s.createDataFrame(out.collect().toSeq.asJava, out.schema)
      } finally release()
    },

    // ───── q145: n-gram NOVELTY vs a reference corpus ─────────────────────
    // Decontamination's sibling: how much of each source's distinct
    // 8-gram set is NOT already in the reference source (src0)? The
    // pretraining-mix question "what does this source add". Distinct
    // fingerprints per source (md5 of the window — the text never
    // shuffles), one anti-join against the reference set; all counts
    // integer-exact, ratio fixed to 6 decimals in one double expression.
    QueryDef.df(
      "q145_ngram_novelty",
      """WITH toks AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT source, md5(array_to_string(w[(i+1):(i+8)], ' ')) AS g
        |  FROM toks, LATERAL unnest(generate_series(0, len(w) - 8)) AS t(i)
        |  WHERE len(w) >= 8),
        |ref AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
        |SELECT gr.source,
        |  CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(*) FILTER (WHERE r.g IS NULL) AS BIGINT) AS n_novel,
        |  CAST(round(count(*) FILTER (WHERE r.g IS NULL)
        |    / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS novelty
        |FROM grams gr LEFT JOIN ref r ON gr.g = r.g
        |WHERE gr.source <> 'src0'
        |GROUP BY gr.source ORDER BY gr.source""".stripMargin) { (s, dir) =>
      val K = 8
      val grams = t(s, dir, "documents")
        .select(col("source"), split(lower(col("text")), " ").as("w"))
        .filter(size(col("w")) >= K)
        .select(col("source"),
          explode(transform(sequence(lit(0), size(col("w")) - K),
            i => md5(array_join(slice(col("w"), i + 1, lit(K)), " ")))).as("g"))
        .distinct()
      val ref = grams.filter(col("source") === "src0").select(col("g").as("rg")).distinct()
      // left join + null-count (not anti-join) so one pass yields both the
      // total and the novel count per source
      grams.filter(col("source") =!= "src0")
        .join(ref, col("g") === col("rg"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_grams"),
          count_if(col("rg").isNull).as("n_novel"))
        .select(col("source"), col("n_grams"), col("n_novel"),
          round(col("n_novel") / col("n_grams").cast("double"), 6).as("novelty"))
        .orderBy("source")
    },

    // ───── q147: deterministic stratified train/val/test split ────────────
    // Every training pipeline's first cut: assign each doc to a split by a
    // SALTED CONTENT-INDEPENDENT hash (md5 of "doc_id:source" — stable
    // across reshards, no RNG state, reproducible on any engine), 80/10/10,
    // then report per-(lang, split) doc and token counts so strata can be
    // checked for balance. One scan, one hash-agg on (lang, split) — the
    // assignment is a pure projection, so at 100 TB this is a single
    // map-side pass; no shuffle carries text.
    QueryDef.df(
      "q147_stratified_split",
      """WITH d AS (
        |  SELECT lang,
        |    CAST(concat('0x', substr(md5(doc_id || ':' || source), 1, 8)) AS BIGINT) % 100 AS bucket,
        |    len(string_split(lower(text), ' ')) AS n_toks
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |FROM d GROUP BY 1, 2 ORDER BY lang, split""".stripMargin) { (s, dir) =>
      val bucket = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))), 1, 8),
        16, 10).cast("long") % 100
      t(s, dir, "documents")
        .select(col("lang"),
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"),
          size(words(col("text"))).cast("long").as("n_toks"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        .orderBy("lang", "split")
    },

    // ───── q148: temperature-tempered source mixture weights ──────────────
    // The pretraining-mix allocator: per-source sampling weight ∝
    // n_tokens^0.5 (square-root tempering — α=0.5 because sqrt is
    // IEEE-correctly-rounded, so BOTH engines compute the identical double
    // where pow(x, 0.7) would not be reproducible). Normalization follows
    // the QueryDef decimal discipline: tempered weights pass through
    // DECIMAL(18,6) so the denominator sum is exact and order-independent,
    // then one double division. `oversample` = weight / natural token
    // share — the epochs-over-corpus factor a sampler applies. The per-
    // source aggregate is corpus-wide but its OUTPUT is O(sources), so the
    // window normalization runs over a handful of rows at any scale.
    QueryDef.df(
      "q148_mixture_weights",
      """WITH src AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(len(string_split(lower(text), ' '))) AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT *, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,6)) AS sq
        |      FROM src)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(sq AS DOUBLE) / CAST(sum(sq) OVER () AS DOUBLE) AS weight,
        |  CAST(sq AS DOUBLE) / CAST(sum(sq) OVER () AS DOUBLE)
        |    * CAST(sum(n_tokens) OVER () AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    AS oversample
        |FROM t ORDER BY source""".stripMargin) { (s, dir) =>
      val all = Window.partitionBy()
      val src = t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(words(col("text"))).cast("long")).as("n_tokens"))
        .withColumn("sq", sqrt(col("n_tokens").cast("double")).cast("decimal(18,6)"))
      src
        .withColumn("weight",
          col("sq").cast("double") / sum(col("sq")).over(all).cast("double"))
        .withColumn("oversample",
          col("weight") * sum(col("n_tokens")).over(all).cast("double")
            / col("n_tokens").cast("double"))
        .select("source", "n_docs", "n_tokens", "weight", "oversample")
        .orderBy("source")
    },

    // ───── q149: bigram collocations by lift (PMI without the log) ───────
    // Which word pairs co-occur far above chance — the collocation signal
    // feeding tokenizer vocab curation and boilerplate detection. lift =
    // P(w1w2) / (P(w1)·P(w2)) = n12·U/T·U/(n1·n2), computed WITHOUT ln so
    // the value is a fixed sequence of IEEE double ops (exact integer
    // inputs, left-to-right — bit-identical across engines; log is not
    // correctly-rounded and would need the rounding crutch). Scale: bigram
    // and unigram counts are two hash-aggs; the unigram side is vocab-sized
    // and BROADCAST back onto the bigram counts; totals are single-row
    // cross joins. Nothing shuffles but (gram, count) pairs.
    QueryDef.df(
      "q149_collocation_lift",
      """WITH toks AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
        |big AS (
        |  SELECT w[i] || ' ' || w[i + 1] AS bg
        |  FROM toks, unnest(range(1, len(w))) AS t(i)),
        |bgc AS (SELECT bg, count(*) AS n12 FROM big GROUP BY bg),
        |uc AS (SELECT u, count(*) AS n FROM (SELECT unnest(w) AS u FROM toks) GROUP BY u),
        |tot AS (
        |  SELECT (SELECT count(*) FROM big) AS tbig,
        |         (SELECT sum(len(w)) FROM toks) AS tuni)
        |SELECT bg AS bigram, CAST(n12 AS BIGINT) AS n_pair,
        |  CAST(a.n AS BIGINT) AS n_left, CAST(b.n AS BIGINT) AS n_right,
        |  CAST(n12 AS DOUBLE) * tuni / tbig * tuni / CAST(a.n * b.n AS DOUBLE) AS lift
        |FROM bgc, tot
        |JOIN uc a ON a.u = string_split(bg, ' ')[1]
        |JOIN uc b ON b.u = string_split(bg, ' ')[2]
        |WHERE n12 >= 20
        |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
      val toks = t(s, dir, "documents").select(words(col("text")).as("w"))
      val big = toks.select(expr("explode_ngrams(w, 2)").as("bg"))
      val bgc = big.groupBy("bg").agg(count(lit(1)).as("n12"))
      val uc = toks.select(explode(col("w")).as("u"))
        .groupBy("u").agg(count(lit(1)).as("n"))
      val tot = big.agg(count(lit(1)).as("tbig"))
        .crossJoin(toks.agg(sum(size(col("w")).cast("long")).as("tuni")))
      bgc.filter(col("n12") >= 20)
        .crossJoin(broadcast(tot))
        .join(broadcast(uc.select(col("u").as("ul"), col("n").as("n_left"))),
          element_at(split(col("bg"), " "), 1) === col("ul"))
        .join(broadcast(uc.select(col("u").as("ur"), col("n").as("n_right"))),
          element_at(split(col("bg"), " "), 2) === col("ur"))
        .select(col("bg").as("bigram"), col("n12").as("n_pair"),
          col("n_left"), col("n_right"),
          (col("n12").cast("double") * col("tuni") / col("tbig") * col("tuni")
            / (col("n_left") * col("n_right")).cast("double")).as("lift"))
        .orderBy(col("lift").desc, col("bigram"))
        .limit(20)
    },

    // ───── q150: positional phrase search via an inverted index ──────────
    // Exact multi-word PHRASE matching (q104 finds substrings; this finds
    // token-aligned phrases): tokens become an (doc, pos, term) positional
    // index, the phrase list explodes to a TINY (phrase, offset, term)
    // table that BROADCASTS onto the index — the corpus never shuffles —
    // and a candidate start position is a hit when it covers every offset
    // of the phrase (count(DISTINCT offset) = phrase length, which is
    // repeated-term-safe). Per phrase: matching docs and total
    // occurrences. At 100 TB the index is the materialized artifact and a
    // probe is this same broadcast join.
    QueryDef.df(
      "q150_phrase_search",
      s"""WITH ph(phrase) AS (VALUES ${Q150Phrases.map(p => s"('$p')").mkString(", ")}),
        |pt AS (
        |  SELECT phrase, string_split(phrase, ' ')[i] AS term, i - 1 AS off,
        |    len(string_split(phrase, ' ')) AS plen
        |  FROM ph, unnest(range(1, len(string_split(phrase, ' ')) + 1)) AS u(i)),
        |tok AS (
        |  SELECT doc_id, i.i AS pos, ts[i.i] AS term
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
        |       (SELECT unnest(range(1, 1001)) AS i) i
        |  WHERE i.i <= len(ts)),
        |hits AS (
        |  SELECT p.phrase, p.plen, k.doc_id, k.pos - p.off AS start, p.off
        |  FROM tok k JOIN pt p USING (term)),
        |m AS (
        |  SELECT phrase, doc_id, start
        |  FROM hits GROUP BY phrase, plen, doc_id, start
        |  HAVING count(DISTINCT off) = plen)
        |SELECT phrase, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_matches
        |FROM m GROUP BY phrase ORDER BY phrase""".stripMargin) { (s, dir) =>
      import s.implicits._
      val pt = Q150Phrases.toSeq.flatMap { p =>
        val terms = p.split(' ')
        terms.zipWithIndex.map { case (term, off) => (p, term, off, terms.length) }
      }.toDF("phrase", "term", "off", "plen")
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos0", "term")))
      tok.join(broadcast(pt), "term") // corpus never shuffles; phrases broadcast
        .select(col("phrase"), col("plen"), col("doc_id"),
          (col("pos0") + 1 - col("off")).as("start"), col("off"))
        .groupBy("phrase", "plen", "doc_id", "start")
        .agg(countDistinct(col("off")).as("cov"))
        .filter(col("cov") === col("plen"))
        .groupBy("phrase")
        .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_matches"))
        .orderBy("phrase")
    },

    // ───── q151: embedding outliers vs label centroid ─────────────────────
    // The embedding-space quality filter: per label, the 5 vectors least
    // like their class (lowest cosine to the label centroid) — mislabeled
    // or junk points a curation pass reviews first. Each engine computes
    // its own centroid (float sums in partition order differ at ~1e-16),
    // so the comparable surface rounds sim to 4 decimals — the q41
    // discipline — and RANKS ON THE ROUNDED value with a vec_id tiebreak,
    // keeping the ordering engine-independent. Spark side: one UDAF
    // hash-agg to O(labels) centroids, broadcast back, per-row double
    // arithmetic, rank<=5 per label compiles to a map-side
    // WindowGroupLimit — no corpus-wide sort.
    QueryDef.df(
      "q151_embedding_outliers",
      """WITH d AS (
        |  SELECT label, vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |c AS (SELECT label, i, avg(v) AS m FROM d GROUP BY 1, 2),
        |cl AS (SELECT label, list(m ORDER BY i) AS cent FROM c GROUP BY label),
        |scored AS (
        |  SELECT e.label, e.vec_id,
        |    round(list_cosine_similarity(e.embedding::DOUBLE[], cl.cent), 4) AS sim
        |  FROM embeddings e JOIN cl ON cl.label = e.label),
        |rk AS (
        |  SELECT label, vec_id, sim,
        |    row_number() OVER (PARTITION BY label ORDER BY sim, vec_id) AS rn
        |  FROM scored)
        |SELECT CAST(label AS INT) AS label, vec_id, sim
        |FROM rk WHERE rn <= 5 ORDER BY label, sim, vec_id""".stripMargin) { (s, dir) =>
      val vavg = udaf(graft.functions.VectorAvg)
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
      val cents = emb.groupBy("label").agg(vavg(col("embedding")).as("cent"))
      val dot = aggregate(
        zip_with(col("embedding"), col("cent"), (x, y) => x.cast("double") * y),
        lit(0.0d), (a, v) => a + v)
      val na = aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))
      val nb = aggregate(col("cent"), lit(0.0d), (a, x) => a + x * x)
      emb.join(broadcast(cents), "label")
        .withColumn("sim", round(dot / (sqrt(na) * sqrt(nb)), 4))
        .withColumn("rn", row_number().over(
          Window.partitionBy("label").orderBy(col("sim"), col("vec_id"))))
        .filter(col("rn") <= 5)
        .select(col("label"), col("vec_id"), col("sim"))
        .orderBy("label", "sim", "vec_id")
    },

    // ───── q152: near-CONTAINMENT dedup (quote-expansion detection) ───────
    // Jaccard (q53) misses the doc that quotes most of a shorter one and
    // adds new text; max-containment max(|A∩B|/|A|, |A∩B|/|B|) >= 0.8
    // catches it symmetrically. Both sides of the ratio are computed over
    // INFORMATIVE shingles only — distinct 3-grams whose doc frequency is
    // <= 16 (boilerplate shingles shared by many docs carry no copying
    // signal AND are the quadratic hazard; dropping them is MOSS's stop-
    // fingerprint move, replicated in the oracle so it is the operator's
    // contract). That definition makes the whole query count-shaped: the
    // intersection IS the per-pair co-occurrence count from capped
    // buckets, the denominators are per-doc informative counts — shingle
    // ARRAYS never join, never shuffle, no pair ships a document's text.
    // (A first cut verified true intersections by joining both docs' full
    // shingle arrays per pair: each doc's array shipped once per pair —
    // quadratic bytes in a hot doc's degree, 11.2 s at sf0.1 vs 3.6 s for
    // this shape, and strictly worse precision on boilerplate overlap.)
    // Divisions are exact-int, deterministic with no rounding.
    QueryDef.df(
      "q152_containment_dedup",
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |d AS (
        |  SELECT doc_id, list_distinct(
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS sh
        |  FROM toks WHERE len(w) >= 3),
        |inv AS (SELECT doc_id, unnest(sh) AS g FROM d WHERE len(sh) >= 5),
        |df AS (SELECT g, count(*) AS n FROM inv GROUP BY g),
        |inf AS (SELECT inv.doc_id, inv.g, df.n FROM inv JOIN df USING (g) WHERE df.n <= 16),
        |na AS (SELECT doc_id, count(*) AS n_inf FROM inf GROUP BY doc_id),
        |pc AS (
        |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_shared
        |  FROM inf x JOIN inf y ON x.g = y.g AND x.doc_id < y.doc_id
        |  WHERE x.n >= 2
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
        |  greatest(n_shared / CAST(a.n_inf AS DOUBLE),
        |           n_shared / CAST(b.n_inf AS DOUBLE)) AS containment
        |FROM pc JOIN na a ON a.doc_id = pc.id_a JOIN na b ON b.doc_id = pc.id_b
        |WHERE greatest(n_shared / CAST(a.n_inf AS DOUBLE),
        |               n_shared / CAST(b.n_inf AS DOUBLE)) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), shingles3(col("text")).as("sh"))
        .filter(size(col("sh")) >= 5)
      val inv = d.select(col("doc_id"), explode(col("sh")).as("g"))
      // shingle doc-frequency (arrays are distinct per doc, so count = docs)
      val dfreq = inv.groupBy("g").agg(count(lit(1)).as("n"))
      val inf = inv.join(dfreq.filter(col("n") <= 16), "g")
      val na = inf.groupBy("doc_id").agg(count(lit(1)).as("n_inf"))
      // co-occurrence count per pair == informative-intersection size;
      // buckets are <= 16 docs so pair fan-out is bounded per shingle
      val pairCounts = inf.filter(col("n") >= 2)
        .groupBy("g").agg(sort_array(collect_list("doc_id")).as("ids"))
        .select(expr("explode_pairs(ids)").as(Seq("id_a", "id_b")))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      pairCounts
        .join(na.select(col("doc_id").as("id_a"), col("n_inf").as("na")), "id_a")
        .join(na.select(col("doc_id").as("id_b"), col("n_inf").as("nb")), "id_b")
        .withColumn("containment", greatest(
          col("n_shared").cast("double") / col("na").cast("double"),
          col("n_shared").cast("double") / col("nb").cast("double")))
        .filter(col("containment") >= 0.8)
        .select("id_a", "id_b", "n_shared", "containment")
        .orderBy("id_a", "id_b")
    },

    // ───── q153: int8 scalar-quantized ANN (integer-dot top-k) ───────────
    // The memory-bound retrieval path: per-vector symmetric int8
    // quantization (scale = max|x|; the max element always maps to ±127),
    // then top-20 neighbors of a probe by INTEGER dot product. The whole
    // comparable surface is exact: scale is a comparison-only max
    // (order-free), x*127.0/s+0.5 is three correctly-rounded IEEE ops on
    // identical inputs so BOTH engines floor the identical double, and the
    // ranking dot is int arithmetic — no rounding crutch anywhere. n_sat
    // (dims at ±127) audits clipping. Scale shape: quantization is a pure
    // projection (4 bytes/dim → 1), the single probe broadcasts, top-k is
    // TakeOrderedAndProject — per-partition heads + one 20-row merge, no
    // global sort, nothing quadratic.
    QueryDef.df(
      "q153_quantized_ann",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max([abs(x) for x in v]) AS s FROM e),
        |q AS (SELECT vec_id, [CAST(floor(x * 127.0 / s + 0.5) AS INT) for x in v] AS qv
        |      FROM m WHERE s > 0),
        |p AS (SELECT qv AS pq FROM q WHERE vec_id = 0)
        |SELECT q.vec_id,
        |  CAST(list_sum([q.qv[i] * p.pq[i] for i in range(1, len(q.qv) + 1)]) AS BIGINT) AS qdot,
        |  CAST(len([x for x in q.qv if abs(x) = 127]) AS BIGINT) AS n_sat
        |FROM q, p
        |WHERE q.vec_id <> 0
        |ORDER BY qdot DESC, vec_id
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val q = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .withColumn("s", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
        .filter(col("s") > 0)
        .withColumn("qv", transform(col("embedding"),
          x => floor(x.cast("double") * lit(127.0) / col("s") + lit(0.5)).cast("int")))
        .select(col("vec_id"), col("qv"))
      val probe = q.filter(col("vec_id") === 0).select(col("qv").as("pq"))
      q.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .withColumn("qdot", aggregate(
          zip_with(col("qv"), col("pq"), (a, b) => (a * b).cast("long")),
          lit(0L), (acc, v) => acc + v))
        .withColumn("n_sat",
          size(filter(col("qv"), x => abs(x) === 127)).cast("long"))
        .select(col("vec_id"), col("qdot"), col("n_sat"))
        .orderBy(col("qdot").desc, col("vec_id"))
        .limit(20)
    },

    // ───── q154: Gopher-style rule-based document filter ──────────────────
    // The composite heuristic gate every pretraining pipeline runs before
    // anything expensive: five rules (length bounds, distinct-word ratio,
    // mean word length band, stopword floor, top-word-fraction cap), with
    // per-source per-rule violation counts plus the all-rules pass count.
    // EVERY threshold compares via integer cross-multiplication (nd*100 >=
    // nw*35, not nd/nw >= 0.35) — zero float hazard in the contract. The
    // Spark side computes ALL five stats within the row (the top-word count
    // is a max-run fold over the sorted token array), so the plan is one
    // map pass + one hash-agg on source: no token ever shuffles, output is
    // O(sources). The oracle replays the top-word stat by unnest+count —
    // max run over a sorted multiset ≡ max multiplicity.
    QueryDef.df(
      "q154_gopher_rules",
      """WITH d AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w FROM documents),
        |tw AS (SELECT doc_id, max(cnt) AS mx FROM (
        |    SELECT doc_id, count(*) AS cnt
        |    FROM (SELECT doc_id, unnest(w) AS word FROM d) GROUP BY doc_id, word)
        |  GROUP BY doc_id),
        |m AS (SELECT d.source, len(w) AS nw, len(list_distinct(w)) AS nd,
        |    list_sum([len(x) for x in w]) AS sumlen,
        |    len([x for x in w if x IN ('the', 'a')]) AS nstop,
        |    tw.mx
        |  FROM d JOIN tw USING (doc_id))
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE NOT (nw BETWEEN 20 AND 90)) AS BIGINT) AS v_len,
        |  CAST(count(*) FILTER (WHERE nd * 100 < nw * 35) AS BIGINT) AS v_distinct,
        |  CAST(count(*) FILTER (WHERE NOT (sumlen * 100 BETWEEN nw * 425 AND nw * 500)) AS BIGINT) AS v_meanlen,
        |  CAST(count(*) FILTER (WHERE nstop * 50 < nw) AS BIGINT) AS v_stop,
        |  CAST(count(*) FILTER (WHERE mx * 8 > nw) AS BIGINT) AS v_topword,
        |  CAST(count(*) FILTER (WHERE nw BETWEEN 20 AND 90 AND nd * 100 >= nw * 35
        |    AND sumlen * 100 BETWEEN nw * 425 AND nw * 500
        |    AND nstop * 50 >= nw AND mx * 8 <= nw) AS BIGINT) AS n_pass
        |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val w = words(col("text"))
      val maxRun = maxTokenMultiplicity(w)
      val d = t(s, dir, "documents").select(col("source"),
        size(w).as("nw"),
        size(array_distinct(w)).as("nd"),
        aggregate(w, lit(0), (a, x) => a + length(x)).as("sumlen"),
        size(filter(w, x => x === "the" || x === "a")).as("nstop"),
        maxRun.as("mx"))
      def v(c: Column): Column = sum(when(c, 1L).otherwise(0L))
      d.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          v(!col("nw").between(20, 90)).as("v_len"),
          v(col("nd") * 100 < col("nw") * 35).as("v_distinct"),
          v(!(col("sumlen") * 100).between(col("nw") * 425, col("nw") * 500)).as("v_meanlen"),
          v(col("nstop") * 50 < col("nw")).as("v_stop"),
          v(col("mx") * 8 > col("nw")).as("v_topword"),
          v(col("nw").between(20, 90) && col("nd") * 100 >= col("nw") * 35 &&
            (col("sumlen") * 100).between(col("nw") * 425, col("nw") * 500) &&
            col("nstop") * 50 >= col("nw") && col("mx") * 8 <= col("nw")).as("n_pass"))
        .orderBy("source")
    },

    // ───── q155: per-stratum source caps (domain quota sampling) ──────────
    // The over-represented-domain guard: cap every (source, lang) stratum
    // at 8 docs, chosen by a deterministic hash rank (md5 of the doc id —
    // content-independent, reproducible across reshards, no RNG state), and report per
    // source what survives. Scale shape: the window input is projected to
    // (ids, lang, n_toks, hash) BEFORE the shuffle — text never moves —
    // and the per-stratum rank feeds a hash-agg back to O(sources) rows.
    QueryDef.df(
      "q155_source_caps",
      """WITH r AS (
        |  SELECT source, lang, doc_id,
        |    len(string_split(lower(text), ' ')) AS n_toks,
        |    row_number() OVER (PARTITION BY source, lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE rn <= 8) AS BIGINT) AS kept_docs,
        |  CAST(coalesce(sum(n_toks) FILTER (WHERE rn <= 8), 0) AS BIGINT) AS kept_tokens,
        |  CAST(count(*) FILTER (WHERE rn > 8) AS BIGINT) AS dropped_docs
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("source"), col("lang"), col("doc_id"),
        size(words(col("text"))).cast("long").as("n_toks"),
        md5(col("doc_id").cast("string")).as("h"))
      d.withColumn("rn", row_number().over(
          Window.partitionBy("source", "lang").orderBy(col("h"), col("doc_id"))))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rn") <= 8, 1L).otherwise(0L)).as("kept_docs"),
          sum(when(col("rn") <= 8, col("n_toks")).otherwise(0L)).as("kept_tokens"),
          sum(when(col("rn") > 8, 1L).otherwise(0L)).as("dropped_docs"))
        .orderBy("source")
    },

    // ───── q156: k-NN label audit (mislabel detection) ────────────────────
    // Confident-learning-style label QA: for the 20 lowest-id vectors,
    // find the 10 nearest neighbors by cosine and majority-vote a label;
    // a vote that disagrees with the stored label flags a candidate
    // mislabel. Determinism follows q151's discipline: each engine's
    // cosine is bit-identical on identical inputs (q26/q151 precedent),
    // the RANKING key is the 4-decimal rounding with vec_id tiebreak, and
    // the vote argmax tiebreaks on label. Scale shape: P probes broadcast
    // (a BroadcastNestedLoopJoin by construction — O(P·n) work is the
    // operator's definition), per-probe top-k compiles to a map-side
    // WindowGroupLimit, the vote runs on ≤ P·10 rows.
    QueryDef.df(
      "q156_knn_label_audit",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT vec_id AS pid, label AS plabel, v AS pv FROM e WHERE vec_id < 20),
        |scored AS (
        |  SELECT p.pid, p.plabel, e.vec_id, e.label,
        |    round(list_cosine_similarity(e.v, p.pv), 4) AS sim
        |  FROM p JOIN e ON e.vec_id <> p.pid),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
        |       FROM scored),
        |nn AS (SELECT pid, plabel, label, count(*) AS votes FROM rk WHERE rn <= 10
        |       GROUP BY 1, 2, 3),
        |best AS (SELECT pid, plabel, label AS pred, votes,
        |    row_number() OVER (PARTITION BY pid ORDER BY votes DESC, label) AS r2 FROM nn)
        |SELECT pid AS vec_id, CAST(plabel AS INT) AS true_label,
        |  CAST(pred AS INT) AS pred_label, CAST(votes AS BIGINT) AS votes,
        |  CAST(CASE WHEN pred <> plabel THEN 1 ELSE 0 END AS INT) AS mismatch
        |FROM best WHERE r2 = 1 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
      val probes = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("pid"), col("label").as("plabel"),
          col("embedding").as("pv"))
      val dot = aggregate(
        zip_with(col("embedding"), col("pv"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0d), (a, v) => a + v)
      val na = aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))
      val nb = aggregate(col("pv"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))
      val scored = e.join(broadcast(probes), col("vec_id") =!= col("pid"))
        .withColumn("sim", round(dot / (sqrt(na) * sqrt(nb)), 4))
      val rk = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy("pid").orderBy(col("sim").desc, col("vec_id"))))
        .filter(col("rn") <= 10)
      val votes = rk.groupBy("pid", "plabel", "label").agg(count(lit(1)).as("votes"))
      votes
        .withColumn("r2", row_number().over(
          Window.partitionBy("pid").orderBy(col("votes").desc, col("label"))))
        .filter(col("r2") === 1)
        .select(col("pid").as("vec_id"), col("plabel").as("true_label"),
          col("label").as("pred_label"), col("votes"),
          when(col("label") =!= col("plabel"), 1).otherwise(0).cast("int").as("mismatch"))
        .orderBy("vec_id")
    },

    // ───── q157: ENGINE-REPRODUCIBLE IVF (integer-space Lloyd's) ──────────
    // The float IVF family (q51/q68/q69/q72) cannot be oracled: float
    // centroid sums are partition-order-dependent and a 1e-16 flip reroutes
    // the argmin assignment discretely. This variant removes the float from
    // the TRAINING LOOP entirely, making k-means itself engine-exact:
    //   1. GLOBAL int8 quantization (scale = corpus max|x| — a comparison-
    //      only max, order-free; one global scale preserves geometry where
    //      q153's per-vector scale would not);
    //   2. centroids live on a 1/256 grid — recompute is floor(CAST(256*sum
    //      AS DOUBLE)/n): integer sum (exact, order-free), ONE correctly-
    //      rounded int→double conversion + division, floor — bit-identical
    //      in any IEEE engine;
    //   3. assignment argmin is a pure-BIGINT distance sum((256·q-c)²),
    //      ≤ 64·(2·256·127)² ≈ 2.7e11 per pair — no overflow, no rounding,
    //      ties broken by cell id.
    // Two unrolled Lloyd's iterations, then an IVF probe: vector 42's cell
    // only is searched by exact integer distance. Scale shape: centroids
    // are k rows broadcast everywhere (assignment is the intrinsic O(k·n)
    // map pass + a map-side WindowGroupLimit argmin); the recompute
    // shuffles (cell, dim) partial sums — k·d groups, corpus never moves;
    // at scale the cell id becomes a partition column and the probe prunes
    // to one cell's files (the q52 materialized-index path).
    QueryDef.df(
      "q157_ivf_int8",
      q157OracleSql) { (s, dir) =>
      val (out, release) = ivfInt8WithRelease(s, dir)
      try {
        import scala.jdk.CollectionConverters._
        s.createDataFrame(out.collect().toSeq.asJava, out.schema)
      } finally release()
    },

    // ───── q162: deterministic weighted sampling (priority sampling) ─────
    // Duffield–Lund–Thorup priority sampling with DETERMINISTIC-HASH randomness:
    // priority = w / u with u = (60-bit md5 of the doc id + 1) — higher
    // weight → higher expected priority, inclusion ∝ weight, reproducible
    // on any engine and across reshards (no RNG state). The one float op
    // is a single correctly-rounded double division of exact integers, so
    // both engines rank identically; ties at the boundary break on
    // doc_id. The ORACLE states the sample via a corpus-wide row_number
    // (fine at oracle scale); the Spark plan is the SCALABLE shape — the
    // top-200 sample set is a TakeOrderedAndProject (per-partition heads,
    // never a global sort), broadcast back as a membership flag, then one
    // hash-agg per source. Weighted corpus subsampling is the pretraining
    // step between quality scoring and tokenization.
    QueryDef.df(
      "q162_weighted_sample",
      """WITH d AS (SELECT doc_id, source, n_chars AS w,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1 AS h
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY CAST(w AS DOUBLE) / CAST(h AS DOUBLE) DESC, doc_id) AS rk FROM d)
        |SELECT source,
        |  CAST(count(*) FILTER (WHERE rk <= 200) AS BIGINT) AS n_sampled,
        |  CAST(coalesce(sum(w) FILTER (WHERE rk <= 200), 0) AS BIGINT) AS w_sampled,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(w) AS BIGINT) AS w_total
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        col("n_chars").as("w"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") + 1).as("h"))
      val pri = col("w").cast("double") / col("h").cast("double")
      val top = d.select(col("doc_id"), pri.as("p"))
        .orderBy(col("p").desc, col("doc_id")).limit(200)
        .select(col("doc_id").as("sid"))
      d.join(broadcast(top), col("doc_id") === col("sid"), "left")
        .groupBy("source")
        .agg(
          sum(when(col("sid").isNotNull, 1L).otherwise(0L)).as("n_sampled"),
          sum(when(col("sid").isNotNull, col("w")).otherwise(0L)).as("w_sampled"),
          count(lit(1)).as("n_docs"),
          sum(col("w")).as("w_total"))
        .orderBy("source")
    },

    // ───── q167: source drift vs the corpus character profile ────────────
    // The distribution-shift detector a corpus QA pass runs per ingest:
    // cosine similarity between each source's character-3-gram count
    // vector and the whole corpus's — a source whose profile drifts
    // (new language, boilerplate flood, encoding corruption) drops out of
    // the pack. All counts are exact ints (order-free sums); the final
    // value is cast-sqrt-multiply-divide, four correctly-rounded IEEE ops
    // on identical inputs → bit-identical across engines with NO rounding
    // crutch. Scale shape: the (source, gram) profile is a hash-agg; the
    // corpus profile is a second hash-agg over it (never re-reads text);
    // the dot is an equi-join on gram between a |sources|·|grams| table
    // and a |grams| table — text shuffles never, and output is O(sources).
    QueryDef.df(
      "q167_source_drift",
      """WITH g AS (
        |  SELECT source, substr(lower(text), i, 3) AS g3
        |  FROM documents, LATERAL unnest(generate_series(1, len(text) - 2)) AS t(i)),
        |sc AS (SELECT source, g3, count(*) AS c FROM g GROUP BY 1, 2),
        |cc AS (SELECT g3, sum(c) AS c FROM sc GROUP BY 1),
        |dot AS (SELECT sc.source, sum(sc.c * cc.c) AS d FROM sc JOIN cc USING (g3) GROUP BY 1),
        |ns AS (SELECT source, sum(c * c) AS n2 FROM sc GROUP BY 1),
        |nc AS (SELECT sum(c * c) AS n2 FROM cc)
        |SELECT dot.source,
        |  CAST(dot.d AS DOUBLE) / (sqrt(CAST(ns.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cos_sim
        |FROM dot JOIN ns USING (source), nc
        |ORDER BY source""".stripMargin) { (s, dir) =>
      val lt = lower(col("text"))
      // consumer structure: the corpus profile cc persists (tiny —
      // O(grams) rows — and read twice: the dot join and the corpus
      // norm); the per-source profile recomputes its explode once per
      // consumer (2×) — measured CHEAPER at bench scale than caching it
      // (5.2 s vs 4.4 s median: the cache write stalls pipelining), and
      // a 100 TB deployment that wants one text pass persists sc too —
      // the profile is O(sources × grams), nowhere near corpus-sized
      // length guard: DuckDB's generate_series(1, len-2) is EMPTY when
      // len < 3, but Spark's sequence(1, len-2) would count DOWN (step -1)
      // and inject spurious grams for 0–2-char docs — filter first so both
      // engines agree on the empty range
      val sc = t(s, dir, "documents")
        .where(length(lt) >= 3)
        .select(col("source"), explode(transform(
          sequence(lit(1), length(lt) - 2),
          i => substr(lt, i, lit(3)))).as("g3"))
        .groupBy("source", "g3").agg(count(lit(1)).as("c"))
      val cc = sc.groupBy("g3").agg(sum(col("c")).as("cc")).persist()
      // ONE grouped pass computes both the dot and the per-source norm —
      // every g3 matches by construction (cc is built from sc), so n2
      // folded after the join equals the pre-join sum of c²
      val dotNs = sc.join(cc, "g3")
        .groupBy("source").agg(sum(col("c") * col("cc")).as("d"),
          sum(col("c") * col("c")).as("n2"))
      val nc = cc.agg(sum(col("cc") * col("cc")).as("nc2"))
      val out = dotNs
        .crossJoin(broadcast(nc))
        .select(col("source"),
          (col("d").cast("double") /
            (sqrt(col("n2").cast("double")) * sqrt(col("nc2").cast("double"))))
            .as("cos_sim"))
        .orderBy("source")
      try {
        import scala.jdk.CollectionConverters._
        s.createDataFrame(out.collect().toSeq.asJava, out.schema)
      } finally cc.unpersist()
    },

    // ───── q170: token-budget curriculum fill (greedy mix building) ──────
    // "Fill the budget from the best source down": rank sources by a
    // per-mille quality score (share of docs in the target length band —
    // FLOORED, because Spark's double→int CAST truncates while DuckDB's
    // rounds; floor() is identical in both), then a running token total
    // in rank order marks which sources fit a 15k-token budget. The
    // corpus reduces to O(sources) BEFORE the window, so the cumulative
    // sum runs over a handful of rows at any scale.
    QueryDef.df(
      "q170_token_budget_fill",
      """WITH src AS (
        |  SELECT source,
        |    sum(len(string_split(lower(text), ' '))) AS toks,
        |    CAST(floor(count(*) FILTER (WHERE n_chars BETWEEN 120 AND 2000) * 1000.0
        |      / count(*)) AS BIGINT) AS q
        |  FROM documents GROUP BY source),
        |r AS (SELECT *, sum(toks) OVER (ORDER BY q DESC, source) AS cum FROM src)
        |SELECT source, CAST(toks AS BIGINT) AS n_tokens, q AS quality_pm,
        |  CAST(cum AS BIGINT) AS cum_tokens,
        |  CAST(CASE WHEN cum <= 15000 THEN 1 ELSE 0 END AS INT) AS included
        |FROM r ORDER BY quality_pm DESC, source""".stripMargin) { (s, dir) =>
      val src = t(s, dir, "documents")
        .groupBy("source")
        .agg(sum(size(words(col("text"))).cast("long")).as("toks"),
          floor(sum(when(col("n_chars").between(120, 2000), 1).otherwise(0)) * 1000.0
            / count(lit(1))).cast("long").as("q"))
      src
        .withColumn("cum", sum(col("toks")).over(
          Window.orderBy(col("q").desc, col("source"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("source"), col("toks").as("n_tokens"), col("q").as("quality_pm"),
          col("cum").as("cum_tokens"),
          when(col("cum") <= 15000, 1).otherwise(0).cast("int").as("included"))
        .orderBy(col("quality_pm").desc, col("source"))
    },

    // ───── q171: hard-negative mining for contrastive training ───────────
    // For each probe, the most-similar vectors with a DIFFERENT label —
    // the hard negatives a retrieval/contrastive trainer pairs with each
    // anchor. Same determinism discipline as q156 (rank on 4-dp cosine,
    // vec_id tiebreak) and the same scale shape: probes broadcast,
    // per-probe top-k is a map-side WindowGroupLimit.
    QueryDef.df(
      "q171_hard_negatives",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT vec_id AS pid, label AS plabel, v AS pv FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT p.pid, e.vec_id, e.label,
        |    round(list_cosine_similarity(e.v, p.pv), 4) AS sim
        |  FROM p JOIN e ON e.vec_id <> p.pid AND e.label <> p.plabel),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
        |       FROM scored)
        |SELECT pid AS probe_id, vec_id AS negative_id, CAST(label AS INT) AS neg_label, sim
        |FROM rk WHERE rn <= 3 ORDER BY probe_id, sim DESC, negative_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("pid"), col("label").as("plabel"),
          col("embedding").as("pv"))
      val dot = aggregate(
        zip_with(col("embedding"), col("pv"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0d), (a, v) => a + v)
      val na = aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))
      val nb = aggregate(col("pv"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))
      e.join(broadcast(probes),
          col("vec_id") =!= col("pid") && col("label") =!= col("plabel"))
        .withColumn("sim", round(dot / (sqrt(na) * sqrt(nb)), 4))
        .withColumn("rn", row_number().over(
          Window.partitionBy("pid").orderBy(col("sim").desc, col("vec_id"))))
        .filter(col("rn") <= 3)
        .select(col("pid").as("probe_id"), col("vec_id").as("negative_id"),
          col("label").as("neg_label"), col("sim"))
        .orderBy(col("probe_id"), col("sim").desc, col("negative_id"))
    },

    // ───── q175: per-user value anomalies (3σ outlier detection) ─────────
    // The streaming-adjacent QA op every metrics pipeline runs: per user,
    // events whose value deviates more than 3σ from that user's own mean.
    // Moments follow the QueryDef decimal discipline (each square is ONE
    // correctly-rounded double, decimal-cast, summed exactly), so μ and σ
    // are bit-identical across engines and the 3σ predicate can't flip.
    // Two passes over events, both one hash-agg on user_id; output only
    // users with anomalies.
    QueryDef.df(
      "q175_value_anomalies",
      """WITH m AS (
        |  SELECT user_id, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS sxx
        |  FROM events GROUP BY user_id),
        |s AS (SELECT user_id, n, sx / n AS mu,
        |        sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)) AS sigma
        |      FROM m WHERE n >= 20),
        |a AS (
        |  SELECT e.user_id, count(*) FILTER (
        |    WHERE abs(CAST(e.value AS DOUBLE) - s.mu) > 3.0 * s.sigma) AS n_anom
        |  FROM events e JOIN s ON s.user_id = e.user_id GROUP BY e.user_id)
        |SELECT a.user_id, CAST(s.n AS BIGINT) AS n_events,
        |  CAST(a.n_anom AS BIGINT) AS n_anomalies
        |FROM a JOIN s USING (user_id)
        |WHERE a.n_anom > 0
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events").select(col("user_id"), col("value"))
      val m = ev.groupBy("user_id").agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sx"),
        sum((col("value") * col("value")).cast("decimal(18,6)")).cast("double").as("sxx"))
      val st = m.filter(col("n") >= 20)
        .withColumn("mu", col("sx") / col("n"))
        .withColumn("sigma", sqrt(greatest(
          col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")),
          lit(0.0))))
      ev.join(st, "user_id")
        .groupBy("user_id")
        .agg(first(col("n")).as("n_events"),
          sum(when(abs(col("value").cast("double") - col("mu")) > lit(3.0) * col("sigma"),
            1L).otherwise(0L)).as("n_anomalies"))
        .filter(col("n_anomalies") > 0)
        .select(col("user_id"), col("n_events").cast("long"), col("n_anomalies"))
        .orderBy("user_id")
    },

    // ───── q176: cross-modal correlation (text quality × embedding) ──────
    // Does embedding-space oddness track text quality? Per label, the
    // Pearson correlation between q35's text-quality score and q151's
    // cosine-to-centroid — the multimodal join a curation pass runs
    // before trusting either signal alone. Both inputs round to 4dp (the
    // q151/q41 discipline covers the engines' 1e-16 centroid variance),
    // then EVERY moment is an exact decimal sum and the final value is
    // one double expression — deterministic end to end. Scale shape: the
    // doc↔vector join is a plain equi-join on id; centroids broadcast;
    // moments are one hash-agg on label.
    QueryDef.df(
      "q176_quality_embedding_corr",
      """WITH d AS (
        |  SELECT label, vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |c AS (SELECT label, i, avg(v) AS m FROM d GROUP BY 1, 2),
        |cl AS (SELECT label, list(m ORDER BY i) AS cent FROM c GROUP BY label),
        |y AS (SELECT e.label, e.vec_id,
        |        round(list_cosine_similarity(e.embedding::DOUBLE[], cl.cent), 4) AS sim
        |      FROM embeddings e JOIN cl ON cl.label = e.label),
        |x AS (SELECT doc_id,
        |        round((CASE WHEN n_chars BETWEEN 120 AND 2000 THEN 0.4 ELSE 0.1 END)
        |        + 0.4 * (CAST(len(list_distinct(string_split(lower(text),' '))) AS DOUBLE)
        |                 / len(string_split(lower(text),' ')))
        |        + (CASE WHEN CAST(n_chars AS DOUBLE) / len(string_split(lower(text),' ')) BETWEEN 3 AND 9 THEN 0.2 ELSE 0.0 END), 4) AS q
        |      FROM documents),
        |j AS (SELECT y.label, CAST(x.q AS DECIMAL(18,6)) AS xq, CAST(y.sim AS DECIMAL(18,6)) AS ys
        |      FROM y JOIN x ON x.doc_id = y.vec_id),
        |mo AS (SELECT label, count(*) AS n,
        |         sum(xq) AS sx, sum(ys) AS sy, sum(xq * ys) AS sxy,
        |         sum(xq * xq) AS sxx, sum(ys * ys) AS syy
        |       FROM j GROUP BY label)
        |SELECT CAST(label AS INT) AS label, CAST(n AS BIGINT) AS n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qs
        |FROM mo ORDER BY label""".stripMargin) { (s, dir) =>
      val vavg = udaf(graft.functions.VectorAvg)
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("int").as("label"), col("embedding"))
      val cents = emb.groupBy("label").agg(vavg(col("embedding")).as("cent"))
      val dot = aggregate(
        zip_with(col("embedding"), col("cent"), (p, q) => p.cast("double") * q),
        lit(0.0d), (a, v) => a + v)
      val na = aggregate(col("embedding"), lit(0.0d),
        (a, p) => a + p.cast("double") * p.cast("double"))
      val nb = aggregate(col("cent"), lit(0.0d), (a, p) => a + p * p)
      val y = emb.join(broadcast(cents), "label")
        .withColumn("sim", round(dot / (sqrt(na) * sqrt(nb)), 4))
        .select(col("label"), col("vec_id"), col("sim"))
      val w = words(col("text"))
      val x = t(s, dir, "documents").select(col("doc_id"),
        round(when(col("n_chars").between(120, 2000), 0.4).otherwise(0.1)
          + lit(0.4) * (size(array_distinct(w)).cast("double") / size(w))
          + when((col("n_chars").cast("double") / size(w)).between(3, 9), 0.2)
            .otherwise(0.0), 4).as("q"))
      val j = y.join(x, col("doc_id") === col("vec_id"))
        .select(col("label"), col("q").cast("decimal(18,6)").as("xq"),
          col("sim").cast("decimal(18,6)").as("ys"))
      val mo = j.groupBy("label").agg(count(lit(1)).as("n"),
        sum(col("xq")).as("sx"), sum(col("ys")).as("sy"),
        sum(col("xq") * col("ys")).as("sxy"),
        sum(col("xq") * col("xq")).as("sxx"),
        sum(col("ys") * col("ys")).as("syy"))
      // moments leave the exact-decimal domain through ONE double cast
      // each, THEN combine — in-decimal products would trip Spark's
      // precision-loss scale reduction and diverge from DuckDB's exact
      // decimals in the 7th digit (observed; the gate caught it)
      def d(c: Column): Column = c.cast("double")
      mo.select(col("label"), col("n"),
          ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
            / (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
              * sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))))
            .as("corr_qs"))
        .orderBy("label")
    },

    // ───── q160: ENGINE-REPRODUCIBLE PQ (integer-space codebooks + ADC) ───
    // q157's integer-Lloyd's trick applied to PRODUCT quantization — the
    // other unoracleable ANN family member. M=8 subspaces × 8 dims, k=4
    // centroids per subspace trained by one integer Lloyd's round on the
    // 1/256 grid, every vector encoded to its per-subspace argmin code,
    // then ADC (asymmetric distance computation): the probe's exact
    // integer distance to every (subspace, cell) centroid forms a 32-row
    // lookup table and a vector's approximate distance is the sum of its
    // codes' table entries. Every comparison is BIGINT; the one division
    // per centroid coordinate is the same single correctly-rounded op as
    // q157 — bit-identical across engines. exact_dist rides along (same
    // 256 scale) so the ADC approximation quality is visible in the
    // output. Scale shape: codebooks are M·k = 32 rows broadcast
    // everywhere; encoding is the intrinsic O(M·k·n) map pass with a
    // map-side WindowGroupLimit argmin; ADC probes join a BROADCAST
    // 32-row table and hash-agg per vector — at serving scale the codes
    // table (8 bytes/vector) is the only thing scanned, 32× smaller than
    // the float vectors.
    QueryDef.df(
      "q160_pq_int8",
      q160OracleSql) { (s, dir) =>
      val (out, release) = pqInt8WithRelease(s, dir)
      try {
        import scala.jdk.CollectionConverters._
        s.createDataFrame(out.collect().toSeq.asJava, out.schema)
      } finally release()
    },

    // ───── q186: contamination SPAN (longest shared n-gram run) ──────────
    // q76 counts shared 4-grams; real decontamination decisions key on the
    // longest CONTIGUOUS overlap (the "13-gram span" rule): a doc sharing
    // 40 scattered grams is thematic overlap, one sharing a 40-token RUN
    // is a copy. Shared gram POSITIONS per doc → gaps-and-islands (p −
    // row_number inside the doc) → max island. Only (doc_id, md5(gram),
    // position) triples shuffle; the benchmark set broadcasts; the window
    // partitions by doc over the SHARED positions only (output-sized, not
    // corpus-sized). max_span_tokens = longest run + 3 (a run of k
    // consecutive 4-gram starts covers k+3 tokens).
    QueryDef.df(
      "q186_contamination_span",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, i AS p, array_to_string(w[i:i+3], ' ') AS g
        |  FROM toks, unnest(range(1, len(w) - 2)) AS t(i)),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5),
        |shared AS (
        |  SELECT c.doc_id, c.p,
        |    row_number() OVER (PARTITION BY c.doc_id ORDER BY c.p) AS rn
        |  FROM grams c JOIN bench USING (g) WHERE c.doc_id >= 5),
        |runs AS (
        |  SELECT doc_id, p - rn AS isl, count(*) AS run
        |  FROM shared GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_shared_pos,
        |  CAST(max(run) AS BIGINT) AS max_run,
        |  CAST(max(run) + 3 AS BIGINT) AS max_span_tokens
        |FROM runs GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val w = split(lower(col("text")), " ")
      // size guard: sequence(1, size-3) counts DOWN for <4-token docs (the
      // q167 lesson); DuckDB's range is empty there
      def posGrams(df: DataFrame) = df
        .filter(size(w) >= 4)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(1), size(w) - 3),
          i => md5(array_join(slice(w, i, lit(4)), " ")))).as(Seq("p0", "g")))
        .select(col("doc_id"), (col("p0") + 1).as("p"), col("g"))
      val bench = posGrams(docs.filter(col("doc_id") < 5)).select("g").distinct()
      val shared = posGrams(docs.filter(col("doc_id") >= 5))
        .join(broadcast(bench), "g")
      val byDoc = Window.partitionBy("doc_id").orderBy("p")
      shared
        .withColumn("isl", col("p") - row_number().over(byDoc))
        .groupBy("doc_id", "isl").agg(count(lit(1)).as("run"))
        .groupBy("doc_id").agg(sum(col("run")).as("n_shared_pos"),
          max(col("run")).as("max_run"))
        .select(col("doc_id"), col("n_shared_pos"), col("max_run"),
          (col("max_run") + 3).as("max_span_tokens"))
        .orderBy("doc_id")
    },

    // ───── q187: dedup IMPACT report (cluster-size histogram) ────────────
    // The number a curation review actually reads: how many clusters of
    // each size, how many docs and chars keep-best would drop. Composes
    // q56's connected components with two hash-aggs — per-cluster
    // (size, chars, kept-chars), then the histogram over clusters. The
    // corpus reduces to O(clusters) before anything global; output is
    // O(distinct sizes). Oracle replays the closure with q144's recursive
    // CTE. chars_dropped = cluster chars − max(n_chars) is tie-break-free:
    // whichever max-chars doc keep-best keeps, the dropped total is equal.
    QueryDef.df(
      "q187_dedup_impact",
      """WITH RECURSIVE edges AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 2 AND a.doc_id <> b.doc_id
        |),
        |reach(node, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
        |),
        |comp AS (SELECT node, min(lbl) AS comp FROM reach GROUP BY node),
        |cl AS (
        |  SELECT c.comp, count(*) AS sz, sum(d.n_chars) AS chars,
        |    max(d.n_chars) AS mx
        |  FROM comp c JOIN documents d ON d.doc_id = c.node GROUP BY c.comp)
        |SELECT CAST(sz AS BIGINT) AS cluster_size,
        |  CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(sum(sz - 1) AS BIGINT) AS docs_dropped,
        |  CAST(sum(chars - mx) AS BIGINT) AS chars_dropped
        |FROM cl WHERE sz > 1 GROUP BY sz ORDER BY sz""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars"))
      val (comp, release) = graft.functions.ConnectedComponents.runWithRelease(
        d.select(col("doc_id").as("node")), docNearDupEdges(d))
      val out = comp.join(d, col("node") === col("doc_id"))
        .groupBy("comp")
        .agg(count(lit(1)).as("sz"), sum(col("n_chars")).as("chars"),
          max(col("n_chars")).as("mx"))
        .where(col("sz") > 1)
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("sz") - 1).as("docs_dropped"),
          sum(col("chars") - col("mx")).as("chars_dropped"))
        .orderBy("cluster_size")
      try {
        import scala.jdk.CollectionConverters._
        s.createDataFrame(out.collect().toSeq.asJava, out.schema)
      } finally release()
    },

    // ───── q188: per-source length QUANTILES (exact percentiles) ─────────
    // The distribution profile behind every curation length rule: exact
    // interpolated p50/p95/p99 of per-doc token counts, per source. Token
    // counts reduce to one integer per doc in the scan projection (text
    // never shuffles); percentile_cont and DuckDB's quantile_cont share
    // the SQL-standard (N−1)·p interpolation, and the 4-dp round absorbs
    // any final-ulp divergence of the lerp. Exact (sort-based) percentiles
    // are fine at any scale HERE because the aggregation runs per source
    // over integers — a 100 TB corpus with few sources sorts a few
    // integer columns, not text.
    QueryDef.df(
      "q188_length_quantiles",
      """WITH toks AS (
        |  SELECT source, len(string_split(lower(text), ' ')) AS n_toks
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(round(quantile_cont(n_toks, 0.5), 4) AS DOUBLE) AS p50,
        |  CAST(round(quantile_cont(n_toks, 0.95), 4) AS DOUBLE) AS p95,
        |  CAST(round(quantile_cont(n_toks, 0.99), 4) AS DOUBLE) AS p99
        |FROM toks GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("source"),
          size(split(lower(col("text")), " ")).cast("long").as("n_toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(n_toks, 0.5)"), 4).as("p50"),
          round(expr("percentile(n_toks, 0.95)"), 4).as("p95"),
          round(expr("percentile(n_toks, 0.99)"), 4).as("p99"))
        .orderBy("source")
    })

  // def, not val: `defs` above references this during object init — a val
  // declared below it would still be null at that point
  private def q157OracleSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |gs AS (SELECT max(list_max([abs(x) for x in v])) AS s FROM e),
        |q AS (SELECT vec_id, [CAST(floor(x * 127.0 / s + 0.5) AS INT) for x in v] AS qv FROM e, gs),
        |c0 AS (SELECT vec_id AS cell, [CAST(x * 256 AS BIGINT) for x in qv] AS c FROM q WHERE vec_id < 8),
        |a1 AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT q.vec_id, c0.cell,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_sum([(256 * q.qv[i] - c0.c[i]) * (256 * q.qv[i] - c0.c[i]) for i in range(1, len(q.qv) + 1)]),
        |        c0.cell) AS rn
        |    FROM q, c0) WHERE rn = 1),
        |d1 AS (SELECT a1.cell, t.i, q.qv[t.i] AS val
        |       FROM a1 JOIN q USING (vec_id), unnest(range(1, len(q.qv) + 1)) AS t(i)),
        |c1 AS (SELECT cell, list(CAST(floor(CAST(256 * s AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS c
        |       FROM (SELECT cell, i, sum(val) AS s, count(*) AS n FROM d1 GROUP BY 1, 2) GROUP BY cell),
        |a2 AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT q.vec_id, c1.cell,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_sum([(256 * q.qv[i] - c1.c[i]) * (256 * q.qv[i] - c1.c[i]) for i in range(1, len(q.qv) + 1)]),
        |        c1.cell) AS rn
        |    FROM q, c1) WHERE rn = 1),
        |pc AS (SELECT cell FROM a2 WHERE vec_id = 42),
        |cn AS (SELECT count(*) AS cell_n FROM a2 JOIN pc USING (cell)),
        |pq AS (SELECT qv AS pv FROM q WHERE vec_id = 42)
        |SELECT m.vec_id,
        |  CAST(list_sum([(m.qv[i] - pq.pv[i]) * (m.qv[i] - pq.pv[i]) for i in range(1, len(m.qv) + 1)]) AS BIGINT) AS dist,
        |  CAST(pc.cell AS BIGINT) AS cell,
        |  CAST(cn.cell_n AS BIGINT) AS cell_n
        |FROM a2 JOIN q m USING (vec_id), pc, cn, pq
        |WHERE a2.cell = pc.cell AND m.vec_id <> 42
        |ORDER BY dist, m.vec_id
        |LIMIT 5""".stripMargin

  /** q157's lazy plan plus the release callback freeing the persisted
    * quantized working set — the plan-audit spec reads the plan without
    * executing it; the QueryDef materializes the 5-row output then
    * releases (the q144 bounded-output pattern).
    */
  private[graft] def ivfInt8WithRelease(s: SparkSession, dir: String): (DataFrame, () => Unit) = {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val gs = e.agg(max(array_max(transform(col("embedding"),
        x => abs(x.cast("double"))))).as("s"))
      // the quantized corpus is the k-means WORKING SET — persisted once
      // (one scan + quantize) instead of recomputed by each of the ~6
      // consumers (both assignment rounds, the recompute, c0, probe,
      // members); released after the 5-row output materializes, the q144
      // bounded-output pattern, so no cache survives the query
      val q = e.crossJoin(broadcast(gs))
        .select(col("vec_id"), transform(col("embedding"),
          x => floor(x.cast("double") * lit(127.0) / col("s") + lit(0.5)).cast("int")).as("qv"))
        .persist()
      // exact BIGINT distance of a quantized vector to a 1/256-grid centroid
      def cdist(qc: Column, cc: Column): Column = aggregate(
        zip_with(qc, cc, (a, b) => {
          val d = a.cast("long") * 256L - b
          d * d
        }), lit(0L), (acc, v) => acc + v)
      def assign(cents: DataFrame): DataFrame =
        q.crossJoin(broadcast(cents))
          .withColumn("rn", row_number().over(
            Window.partitionBy("vec_id").orderBy(cdist(col("qv"), col("c")), col("cell"))))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("qv"), col("cell"))
      val c0 = q.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"),
          transform(col("qv"), x => (x * 256).cast("long")).as("c"))
      val a1 = assign(c0)
      // centroid recompute: exact integer (cell, dim) sums, then the one
      // correctly-rounded grid division — mirrors the oracle op-for-op
      val c1 = a1.select(col("cell"), posexplode(col("qv")).as(Seq("i", "val")))
        .groupBy("cell", "i").agg(sum(col("val")).as("s"), count(lit(1)).as("n"))
        .withColumn("cv",
          floor((col("s") * 256).cast("double") / col("n").cast("double")).cast("long"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("cv")))),
          st => st.getField("cv")).as("c"))
      val a2 = assign(c1)
      val pc = a2.filter(col("vec_id") === 42).select(col("cell"))
      val cn = a2.join(broadcast(pc), "cell").agg(count(lit(1)).as("cell_n"))
      val pq = q.filter(col("vec_id") === 42).select(col("qv").as("pv"))
      val out = a2.join(broadcast(pc), "cell")
        .filter(col("vec_id") =!= 42)
        .crossJoin(broadcast(pq))
        .crossJoin(broadcast(cn))
        .withColumn("dist", aggregate(
          zip_with(col("qv"), col("pv"), (a, b) => {
            val d = (a - b).cast("long")
            d * d
          }), lit(0L), (acc, v) => acc + v))
        .select(col("vec_id"), col("dist"), col("cell").cast("long").as("cell"),
          col("cell_n"))
        .orderBy("dist", "vec_id")
        .limit(5)
      (out, () => { q.unpersist(); () })
  }

  private def q160OracleSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |gs AS (SELECT max(list_max([abs(x) for x in v])) AS s FROM e),
      |q AS (SELECT vec_id, [CAST(floor(x * 127.0 / s + 0.5) AS INT) for x in v] AS qv FROM e, gs),
      |sub AS (
      |  SELECT vec_id, t.m, [q.qv[t.m * 8 + j] for j in range(1, 9)] AS sv
      |  FROM q, unnest(range(0, 8)) AS t(m)),
      |c0 AS (SELECT m, vec_id AS cell, [CAST(x * 256 AS BIGINT) for x in sv] AS c
      |       FROM sub WHERE vec_id < 4),
      |a1 AS (
      |  SELECT vec_id, m, cell FROM (
      |    SELECT sub.vec_id, sub.m, c0.cell,
      |      row_number() OVER (PARTITION BY sub.vec_id, sub.m ORDER BY
      |        list_sum([(256 * sub.sv[i] - c0.c[i]) * (256 * sub.sv[i] - c0.c[i]) for i in range(1, 9)]),
      |        c0.cell) AS rn
      |    FROM sub JOIN c0 ON c0.m = sub.m) WHERE rn = 1),
      |d1 AS (SELECT a1.m, a1.cell, t.i, sub.sv[t.i] AS val
      |       FROM a1 JOIN sub ON sub.vec_id = a1.vec_id AND sub.m = a1.m,
      |       unnest(range(1, 9)) AS t(i)),
      |c1 AS (SELECT m, cell, list(CAST(floor(CAST(256 * s AS DOUBLE) / n) AS BIGINT) ORDER BY i) AS c
      |       FROM (SELECT m, cell, i, sum(val) AS s, count(*) AS n FROM d1 GROUP BY 1, 2, 3)
      |       GROUP BY m, cell),
      |codes AS (
      |  SELECT vec_id, m, cell FROM (
      |    SELECT sub.vec_id, sub.m, c1.cell,
      |      row_number() OVER (PARTITION BY sub.vec_id, sub.m ORDER BY
      |        list_sum([(256 * sub.sv[i] - c1.c[i]) * (256 * sub.sv[i] - c1.c[i]) for i in range(1, 9)]),
      |        c1.cell) AS rn
      |    FROM sub JOIN c1 ON c1.m = sub.m) WHERE rn = 1),
      |dtab AS (
      |  SELECT c1.m, c1.cell,
      |    list_sum([(256 * p.sv[i] - c1.c[i]) * (256 * p.sv[i] - c1.c[i]) for i in range(1, 9)]) AS d
      |  FROM c1 JOIN (SELECT m, sv FROM sub WHERE vec_id = 42) p ON p.m = c1.m),
      |adc AS (
      |  SELECT codes.vec_id, sum(dtab.d) AS adc_dist
      |  FROM codes JOIN dtab ON dtab.m = codes.m AND dtab.cell = codes.cell
      |  WHERE codes.vec_id <> 42
      |  GROUP BY codes.vec_id)
      |SELECT adc.vec_id, CAST(adc.adc_dist AS BIGINT) AS adc_dist,
      |  CAST(list_sum([65536::BIGINT * (m.qv[i] - p.qv[i]) * (m.qv[i] - p.qv[i]) for i in range(1, len(m.qv) + 1)]) AS BIGINT) AS exact_dist
      |FROM adc JOIN q m USING (vec_id), (SELECT qv FROM q WHERE vec_id = 42) p
      |ORDER BY adc_dist, adc.vec_id
      |LIMIT 10""".stripMargin

  /** q160's lazy plan + release (same contract as [[ivfInt8WithRelease]]).
    */
  private[graft] def pqInt8WithRelease(s: SparkSession, dir: String): (DataFrame, () => Unit) = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val gs = e.agg(max(array_max(transform(col("embedding"),
      x => abs(x.cast("double"))))).as("s"))
    val q = e.crossJoin(broadcast(gs))
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * lit(127.0) / col("s") + lit(0.5)).cast("int")).as("qv"))
    // the per-subspace working set — persisted once, released after the
    // 10-row output materializes (bounded-output pattern, as q157)
    val sub = q.select(col("vec_id"), col("qv"),
        explode(sequence(lit(0), lit(7))).as("m"))
      .select(col("vec_id"), col("m"),
        slice(col("qv"), col("m") * 8 + 1, lit(8)).as("sv"))
      .persist()
    def cdist(svc: Column, cc: Column): Column = aggregate(
      zip_with(svc, cc, (a, b) => {
        val d = a.cast("long") * 256L - b
        d * d
      }), lit(0L), (acc, v) => acc + v)
    def assign(cents: DataFrame): DataFrame =
      sub.join(broadcast(cents), "m")
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id", "m").orderBy(cdist(col("sv"), col("c")), col("cell"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("sv"), col("cell"))
    val c0 = sub.filter(col("vec_id") < 4)
      .select(col("m"), col("vec_id").as("cell"),
        transform(col("sv"), x => (x * 256).cast("long")).as("c"))
    val a1 = assign(c0)
    val c1 = a1.select(col("m"), col("cell"), posexplode(col("sv")).as(Seq("i", "val")))
      .groupBy("m", "cell", "i").agg(sum(col("val")).as("s"), count(lit(1)).as("n"))
      .withColumn("cv",
        floor((col("s") * 256).cast("double") / col("n").cast("double")).cast("long"))
      .groupBy("m", "cell")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("cv")))),
        st => st.getField("cv")).as("c"))
    val codes = assign(c1).select(col("vec_id"), col("m"), col("cell"))
    val probeSub = sub.filter(col("vec_id") === 42).select(col("m").as("pm"), col("sv").as("psv"))
    val dtab = c1.join(broadcast(probeSub), col("m") === col("pm"))
      .select(col("m"), col("cell"), cdist(col("psv"), col("c")).as("d"))
    val adc = codes.filter(col("vec_id") =!= 42)
      .join(broadcast(dtab), Seq("m", "cell"))
      .groupBy("vec_id").agg(sum(col("d")).as("adc_dist"))
    val pq = q.filter(col("vec_id") === 42).select(col("qv").as("pv"))
    val out = adc.join(q, "vec_id")
      .crossJoin(broadcast(pq))
      .withColumn("exact_dist", aggregate(
        zip_with(col("qv"), col("pv"), (a, b) => {
          val d = (a - b).cast("long") * 256L
          d * d
        }), lit(0L), (acc, v) => acc + v))
      .select(col("vec_id"), col("adc_dist"), col("exact_dist"))
      .orderBy("adc_dist", "vec_id")
      .limit(10)
    (out, () => { sub.unpersist(); () })
  }

  /** q154's top-word statistic, computed WITHIN the row (no token
    * shuffle): max run length over the sorted token array ≡ the max word
    * multiplicity the oracle computes by unnest+count. Exposed for the
    * randomized equivalence test in LlmSpec.
    */
  private[graft] def maxTokenMultiplicity(w: Column): Column = aggregate(
    sort_array(w),
    struct(lit("").as("p"), lit(0).as("r"), lit(0).as("b")),
    (acc, x) => {
      val run = when(x === acc.getField("p"), acc.getField("r") + 1).otherwise(lit(1))
      struct(x.as("p"), run.as("r"), greatest(acc.getField("b"), run).as("b"))
    },
    acc => acc.getField("b"))

  /** q128's banded-key projection: stem/len plus the 9-char tail the three
    * interleaved bands are cut from. One definition shared by the census
    * join, the profile (q185), and the guardrail, so all three agree on the
    * key construction by construction.
    */
  private[graft] def hammingKeyed(c0: DataFrame): DataFrame =
    c0.select(col("id"), col("name"), length(col("name")).as("len"),
      expr("substring(name, 1, length(name) - 9)").as("stem"),
      expr("right(name, 9)").as("tail"))

  private def bandVal(i: Int): Column = concat(
    substring(col("tail"), i + 1, 1),
    substring(col("tail"), i + 4, 1),
    substring(col("tail"), i + 7, 1))

  /** Per-band block-size profile of the banded-hamming key space: block
    * count, max block, exact candidate-pair bill Σ C(n,2), and (when a cap
    * is supplied) the upper bound of pairs the cap would drop,
    * Σ C(n,2) − C(min(n,cap),2). One skinny hash-agg — O(bands) output.
    */
  private[graft] def hammingBandProfile(c: DataFrame, cap: Option[Int]): DataFrame = {
    val blocks = (0 until 3).map(i =>
        c.select(lit(i).as("band"), col("stem"), col("len"), bandVal(i).as("bval")))
      .reduce(_ unionAll _)
      .groupBy("band", "stem", "len", "bval").agg(count(lit(1)).as("n"))
    // integral C(n,2): Column./ is DOUBLE division, and doubles lose
    // exactness past 2^53 — shiftright keeps the pair bill a long
    def pairs(n: Column): Column = shiftright(n * (n - 1), 1)
    val kept = cap.map(k => least(col("n"), lit(k.toLong))).getOrElse(col("n"))
    blocks.groupBy("band").agg(
        count(lit(1)).as("n_blocks"),
        max(col("n")).as("max_block"),
        sum(pairs(col("n"))).as("pairs_upper"),
        sum(pairs(col("n")) - pairs(kept)).as("dropped_pairs_upper"))
      .orderBy("band")
  }

  /** q128's pair census with the SATURATION GUARDRAIL — capping is the
    * DEFAULT under saturation since r12 (VERDICT r11 #3: the naive 100 TB
    * user must get the bounded curve, not the quadratic one). The band
    * profile runs first (one skinny hash-agg + 3-row collect — the
    * guardrail's documented cost), then:
    *   - UNSATURATED corpora (every band's max block <=
    *     `graft.hamming.saturation-bound`, default 4096) run the lossless
    *     pigeonhole census unchanged — the oracle gate's semantics;
    *   - SATURATED corpora AUTO-ENGAGE a per-block cap
    *     (`graft.hamming.auto-cap`, default 512): keep the K smallest-id
    *     rows per band block — q127's row_number pattern, a map-side
    *     WindowGroupLimit — and print the exact dropped-pair upper bound.
    *     Measured on the dense-id fixture: 3.2× wall at 10× data vs 23.6×
    *     lossless;
    *   - `graft.hamming.lossless=true` opts back into the unbounded census
    *     (warn-only, the pre-r12 default);
    *   - `graft.hamming.fail-on-saturation=true` FAILS FAST before any
    *     join (the posture for an unattended run that must not silently
    *     trade recall OR run quadratic);
    *   - `graft.hamming.block-cap=K` forces the cap unconditionally.
    */
  private[graft] def hammingBandedCensus(s: SparkSession, c0: DataFrame): DataFrame = {
    import graft.functions.TextHashing.hammingDistance
    // session conf first, env-var fallback (GRAFT_HAMMING_BLOCK_CAP etc.) so
    // bench/submit wrappers can set the knobs without touching session code
    def gconf(key: String, default: String): String = {
      val v = s.conf.get(key, "")
      if (v.nonEmpty) v
      else sys.env.getOrElse(key.toUpperCase.replace('.', '_').replace('-', '_'), default)
    }
    val explicitCap =
      Option(gconf("graft.hamming.block-cap", "")).filter(_.nonEmpty).map(_.toInt)
    val autoCap = gconf("graft.hamming.auto-cap", "512").toInt
    val lossless = gconf("graft.hamming.lossless", "false").toBoolean
    val bound = gconf("graft.hamming.saturation-bound", "4096").toLong
    val failFast = gconf("graft.hamming.fail-on-saturation", "false").toBoolean
    val c = hammingKeyed(c0)
    // profile against the cap that WOULD engage, so the dropped-pair bound
    // printed below is the one the chosen plan actually incurs
    val prof = hammingBandProfile(c, explicitCap.orElse(Some(autoCap))).collect()
    val saturated = prof.exists(_.getAs[Long]("max_block") > bound)
    prof.filter(_.getAs[Long]("max_block") > bound).foreach { r =>
      val msg = s"[graft][q128] band-alphabet SATURATION: band ${r.getAs[Int]("band")} " +
        s"max block ${r.getAs[Long]("max_block")} > bound $bound " +
        s"(candidate-pair bill ${r.getAs[Long]("pairs_upper")}); probe pairs grow ~n² " +
        "on this key space"
      if (failFast && explicitCap.isEmpty) throw new IllegalStateException(msg)
      System.err.println(msg)
    }
    // cap precedence: explicit > auto-under-saturation > none; lossless=true
    // opts back into the unbounded census (pre-r12 default)
    val cap = explicitCap.orElse(
      if (saturated && !lossless) Some(autoCap) else None)
    cap.foreach { k =>
      val dropped = prof.map(_.getAs[Long]("dropped_pairs_upper")).sum
      val how = if (explicitCap.isDefined) "ACTIVE (explicit)"
        else "AUTO-ENGAGED under saturation (set graft.hamming.lossless=true " +
          "to opt into the quadratic lossless census)"
      System.err.println(s"[graft][q128] block cap $k $how: dropping at most " +
        s"$dropped candidate pairs (Σ C(n,2)−C(min(n,$k),2) over all band blocks) — " +
        "recall trade is explicit")
    }
    if (saturated && lossless && explicitCap.isEmpty)
      System.err.println("[graft][q128] lossless census on a SATURATED key space " +
        "(opted in): expect ~n² candidate pairs")
    val cand = (0 until 3).map { i =>
      val cb0 = c.withColumn("bval", bandVal(i))
      val cb = cap match {
        case Some(k) => cb0
          .withColumn("rn", row_number().over(Window
            .partitionBy("stem", "len", "bval").orderBy("id")))
          .where(col("rn") <= k).drop("rn")
        case None => cb0
      }
      cb.as("a").join(cb.as("b"),
          col("a.stem") === col("b.stem") && col("a.len") === col("b.len") &&
            col("a.bval") === col("b.bval") && col("a.id") < col("b.id") &&
            hammingDistance(col("a.tail"), col("b.tail")) <= 2)
        .select(col("a.id").as("ida"), col("b.id").as("idb"),
          hammingDistance(col("a.tail"), col("b.tail")).as("dist"))
    }.reduce(_ unionAll _).distinct()
    cand.groupBy("dist").agg(count(lit(1)).as("n"))
      .orderBy("dist")
  }

  /** q92's planted phash corpus: 12 base sinusoid PNGs, brightness+noise
    * re-encodes of the first 6 (ids 100–105), and an exact re-render of #6
    * (id 106). ONE authority for the id → payload mapping, used by the
    * query and by the PerceptualHashSpec pin of [[phashFixtureLiterals]].
    */
  // defs, not vals: `val defs` above initializes FIRST (the q157 r10
  // object-init-order lesson) — a val here would be null during its build
  private[graft] def phashFixtureIds: Seq[Long] =
    (0L until 12L) ++ (100L until 106L) :+ 106L

  private[graft] def phashFixturePayload(id: Long): Array[Byte] = {
    import graft.functions.Multimodal
    if (id >= 100L && id < 106L)
      Multimodal.syntheticPng((id - 100L).toInt, brightness = 6, noisePixels = 12)
    else if (id == 106L) Multimodal.syntheticPng(6)
    else Multimodal.syntheticPng(id.toInt)
  }

  /** The REAL `phash64` of every fixture payload, frozen as literals (the
    * q33/q38 fixed-literal oracle precedent): the DuckDB oracle replays
    * q92's banding + hamming verify over these BIGINTs while the Spark
    * side recomputes them through the JDK decode + DCT at query time — a
    * decoder drift fails the hash gate. Regenerate by printing
    * `phash64(phashFixturePayload(id))` for each id; PerceptualHashSpec
    * pins table ≡ decode.
    */
  private[graft] def phashFixtureLiterals: Seq[(Long, Long)] = Seq(
    0L -> 2099307902868769662L, 1L -> 242496775838989042L,
    2L -> 4587867128339646690L, 3L -> 541774663966194478L,
    4L -> 4497068913828547424L, 5L -> 182664812415217298L,
    6L -> 1604299329096672154L, 7L -> 4976434332464822320L,
    8L -> 5076834248432601560L, 9L -> 8080985320069697296L,
    10L -> 1531121266042961410L, 11L -> 8670461516213237784L,
    100L -> 2099307902868769662L, 101L -> 242496775838989042L,
    102L -> 4587867128339646690L, 103L -> 541774663966194478L,
    104L -> 4497068913828547424L, 105L -> 182664812415217298L,
    106L -> 1604299329096672154L)

  /** q56/q144's SQL-expressible near-dup candidate edges: same lang,
    * |n_chars diff| <= 2 — banded so candidate generation is a pure
    * equi-join (bucket = n_chars/3, probe own + both neighbor buckets).
    */
  private def docNearDupEdges(d: DataFrame): DataFrame = {
    val bucketed = d.withColumn("b", floor(col("n_chars") / 3))
    val probes = bucketed.withColumn("pb", explode(array(
      col("b") - 1, col("b"), col("b") + 1)))
    probes.as("a").join(bucketed.as("b"),
        col("a.lang") === col("b.lang") && col("a.pb") === col("b.b") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          abs(col("a.n_chars") - col("b.n_chars")) <= 2)
      .select(col("a.doc_id").as("u"), col("b.doc_id").as("v"))
  }

  /** SemDeDup core: assign each vector to its nearest of `k` md5-seeded
    * centroids, then inside each cluster DROP every vector that has a
    * ≥`eps`-cosine neighbor which is FARTHER from the centroid (SemDeDup
    * keeps the member farthest from the centroid; ties break toward the
    * smaller vec_id). Returns the dropped rows (vec_id, cid, csim).
    */
  def semDedup(emb: DataFrame, k: Int, eps: Double,
      maxClusterSize: Int = 4096): DataFrame = {
    val assigned = semDedupAssign(emb, k, maxClusterSize)
    val a = assigned.select(col("cid"), col("vec_id"), col("emb"), col("csim"))
    val b = assigned.select(col("cid").as("b_cid"), col("vec_id").as("b_vec_id"),
      col("emb").as("b_emb"), col("csim").as("b_csim"))
    // left-semi: "∃ an eps-close in-cluster neighbor farther from the
    // centroid" — returns each dropped vector once, no DISTINCT needed
    a.join(b,
        col("cid") === col("b_cid") && col("vec_id") =!= col("b_vec_id") &&
          cosineSim(col("emb"), col("b_emb")) >= eps &&
          (col("b_csim") < col("csim") ||
            (col("b_csim") === col("csim") && col("b_vec_id") < col("vec_id"))),
        "left_semi")
      .select(col("vec_id"), col("cid"), col("csim"))
      .orderBy("vec_id")
  }

  /** Cluster assignment for [[semDedup]] with an OVERSIZED-CLUSTER GUARD.
    * Base step: broadcast the k md5-ranked seed vectors, ONE hash-agg per
    * vector (max over (sim, -cid) → highest sim, ties → smaller cid) — no
    * window, embeddings shuffle once keyed by vec_id. Guard: a degenerate
    * corpus (every vector near one centroid) would otherwise collapse into
    * one cluster and make the within-cluster pair join quadratic in N, so
    * any cluster larger than `maxClusterSize` is re-split by re-running
    * the SAME md5-ranked seeding within the cluster (up to 3 rounds; the
    * seed-selection window sorts only the oversized clusters — the
    * O(n log n) escape from an O(n²) join); a cluster that still refuses
    * to shrink (all-identical vectors, where nearest-centroid ties always
    * collapse to one seed) is hash-bucketed to the cap — deterministic,
    * at the cost of keeping one representative per bucket instead of one
    * per cluster. The guard costs one count-pass when no cluster is over
    * the cap; the default cap is far above what sf-scale corpora reach,
    * so q86's oracle replays the unguarded assignment exactly.
    */
  def semDedupAssign(emb: DataFrame, k: Int, maxClusterSize: Int = 4096): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
    // deterministic seeds: the k vectors of smallest md5(vec_id) rank
    val seeds = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def nearest(scored: DataFrame): DataFrame = scored
      .groupBy("vec_id")
      .agg(first(col("embedding")).as("emb"),
        max(struct(col("sim"), (-col("cid")).as("ncid"))).as("m"))
      .select(col("vec_id"), col("emb"),
        (-col("m.ncid")).as("cid"), col("m.sim").as("csim"))
    var assigned = nearest(e.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("embedding"),
        cosineSim(col("embedding"), col("cvec")).as("sim"), col("cid")))
    var round = 0
    var clean = false
    while (round < 3 && !clean) {
      // ≤ N/cap oversized ids — bounded driver list
      val big = assigned.groupBy("cid").count()
        .where(col("count") > maxClusterSize).select("cid")
        .collect().map(_.getLong(0)).toIndexedSeq
      if (big.isEmpty) clean = true
      else {
        val keep = assigned.where(!col("cid").isin(big: _*))
        val split = assigned.where(col("cid").isin(big: _*))
        val w = Window.partitionBy("cid")
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        val subSeeds = split
          .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
          .select(col("cid").as("pcid"), col("vec_id").as("scid"),
            col("emb").as("cvec"))
        val rescored = split.select(col("cid").as("pcid"), col("vec_id"), col("emb"))
          .join(broadcast(subSeeds), "pcid")
          .select(col("vec_id"), col("emb").as("embedding"),
            cosineSim(col("emb"), col("cvec")).as("sim"), col("scid").as("cid"))
        assigned = keep.unionByName(nearest(rescored))
        round += 1
      }
    }
    if (!clean) {
      // identical-vector stragglers: deterministic hash buckets targeting
      // cap/2 fill (2x headroom keeps hash variance from breaching the cap)
      val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("csz"))
      assigned = assigned.join(sizes, "cid")
        .withColumn("cid", when(col("csz") > maxClusterSize,
          xxhash64(col("cid"),
            pmod(xxhash64(col("vec_id")), ceil(col("csz") * 2 / maxClusterSize))))
          .otherwise(col("cid")))
        .drop("csz")
    }
    assigned.select(col("vec_id"), col("emb"), col("cid"), col("csim"))
  }
}
