package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe
import graft.queries.LlmPipeline

/** The trained BPE tokenizer: hand-computed merges, encode/decode
  * roundtrip over the corpus, codegen agreement, and the q71 contract.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("trainMerges: hand-computed merge sequence on a tiny histogram") {
    // words [a,a,a,b] x2 and [a,a,b] x1:
    //   round 1: (a,a)=5, (a,b)=3            -> merge "a a"
    //   round 2: (aa,a)=2, (a,b)=2 tie       -> lexicographically ("a","b")
    //   round 3: (aa,ab)=2                   -> merge "aa ab"
    //   round 4: only (aa,b)=1 left          -> stop (no pair repeats)
    val merges = Bpe.trainMerges(Seq(("aaab", 2L), ("aab", 1L)), numMerges = 10)
    assert(merges.toSeq == Seq("a a", "a b", "aa ab"))
  }

  test("trainMergesDetailed: selection-time counts (the q195 gate values)") {
    // same histogram as above; counts at selection: (a,a)=5 (overlapping
    // occurrences in "aaab" both counted), then the (aa,a)=2/(a,b)=2 tie
    // resolves to the lexicographically smaller pair at count 2, then
    // (aa,ab)=2; round 4 has only (aa,b)=1 -> early stop.
    val detailed = Bpe.trainMergesDetailed(Seq(("aaab", 2L), ("aab", 1L)), numMerges = 10)
    assert(detailed.toSeq == Seq(("a", "a", 5L), ("a", "b", 2L), ("aa", "ab", 2L)))
  }

  test("encodeWord follows merge ranks greedily, lowest rank first") {
    val ranks = Bpe.ranksOf(Array("a a", "a b", "aa ab"))
    assert(Bpe.encodeWord("aaab", ranks).toSeq == Seq("aaab"))
    assert(Bpe.encodeWord("aab", ranks).toSeq == Seq("aa", "b"))
    assert(Bpe.encodeWord("ab", ranks).toSeq == Seq("ab"))
    assert(Bpe.encodeWord("ba", ranks).toSeq == Seq("b", "a"))
    assert(Bpe.encodeWord("x", ranks).toSeq == Seq("x"))
  }

  test("encode/decode roundtrip: concatenated tokens reconstruct every document") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100).cache()
    val merges = LlmPipeline.trainBpe(docs, numMerges = 100)
    // the 100-doc sample's vocabulary runs dry just before 100 merges —
    // early stop is part of the contract (no pair repeats -> done)
    assert(merges.length > 50, s"expected substantial training, got ${merges.length} merges")
    val bad = docs
      .select(col("text"),
        concat_ws("", Bpe.bpeEncode(col("text"), merges)).as("detok"),
        regexp_replace(col("text"), "\\s+", "").as("squashed"))
      .filter(col("detok") =!= col("squashed"))
      .count()
    assert(bad == 0, "tokens must concatenate back to the text modulo whitespace")
  }

  test("trained merges compress: fewer tokens than characters") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
    val merges = LlmPipeline.trainBpe(docs, numMerges = 200)
    val r = docs.select(
      sum(size(Bpe.bpeEncode(col("text"), merges))).as("toks"),
      sum(length(regexp_replace(col("text"), "\\s+", ""))).as("chars")).head()
    val (toks, chars) = (r.getLong(0), r.getLong(1))
    assert(toks < chars / 2,
      s"learned merges should at least halve the seed-character count: $toks vs $chars chars")
  }

  test("bpe_encode: codegen and interpreted agree") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val merges = LlmPipeline.trainBpe(docs, numMerges = 50)
    def run(): Seq[String] = docs
      .select(col("doc_id"), Bpe.bpeEncode(col("text"), merges).as("toks"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val viaCodegen = run()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == viaCodegen)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("q71: 25 learned subwords, multi-char, deterministically ordered") {
    val rows = SparkEntry.queries("q71_bpe_tokens")(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getString(0).length > 1), "seed characters are not learned subwords")
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse, "ordered by count desc")
    // training twice yields the identical table (determinism across runs)
    val again = SparkEntry.queries("q71_bpe_tokens")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
