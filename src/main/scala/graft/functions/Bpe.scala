package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units" — the tokenizer family behind GPT-style
  * vocabularies): train a merge table from a corpus, encode text into
  * learned subword tokens. The LLM-pipeline upgrade over regex "token
  * counting": real trained merges, exact token counts, corpus compression
  * statistics.
  *
  * The 100 TB split: training needs only the WORD HISTOGRAM, so the corpus
  * pass is one distributed groupBy(word).count with a top-N cap, and the
  * merge loop runs on the driver over that bounded histogram (the same
  * shape every production tokenizer trainer uses). Encoding is the hot
  * path: a per-row greedy merge loop as a codegen expression with the
  * merge-rank table attached as a reference object — no UDF, no broadcast
  * plumbing in user code.
  */
object Bpe {

  /** Greedy BPE merge training over a word histogram. Words are sequences
    * of single characters; each round merges the adjacent pair with the
    * highest total count (ties: lexicographically smallest pair —
    * deterministic across runs and partition orders). Returns merges as
    * "left right" strings, index = rank. Stops early when no pair
    * repeats.
    */
  def trainMerges(histogram: Seq[(String, Long)], numMerges: Int): Array[String] =
    trainMergesDetailed(histogram, numMerges).map { case (l, r, _) => s"$l $r" }

  /** [[trainMerges]] plus each merge's weighted pair count at selection
    * time — the value the q195 oracle hash-gates, so a drift anywhere in
    * the counting/tie-break/rewrite loop changes the output.
    */
  def trainMergesDetailed(
      histogram: Seq[(String, Long)],
      numMerges: Int): Array[(String, String, Long)] = {
    val words = histogram.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer.from(w.map(_.toString)), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (parts, c) =>
        var i = 0
        while (i < parts.length - 1) {
          val k = (parts(i), parts(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      val repeats = counts.filter(_._2 > 1)
      if (repeats.isEmpty) done = true
      else {
        // highest count; ties -> lexicographically smallest pair
        val (negC, l, r) = repeats.iterator.map { case ((pl, pr), c) => (-c, pl, pr) }.min
        merges += ((l, r, -negC))
        words.foreach { case (parts, _) =>
          var i = 0
          while (i < parts.length - 1) {
            if (parts(i) == l && parts(i + 1) == r) {
              parts(i) = l + r
              parts.remove(i + 1)
            } else i += 1
          }
        }
        round += 1
      }
    }
    merges.toArray
  }

  /** Column API: BPE tokens (array<string>) of a text column under a
    * trained merge table. Registered in [[graft.GraftExtensions]] as
    * `bpe_encode`.
    */
  def bpeEncode(text: Column, merges: Array[String]): Column =
    call_function("bpe_encode", text, lit(merges))

  /** Encode one text: whitespace pre-tokenization, then per word the
    * classic greedy loop — repeatedly merge every occurrence of the
    * lowest-rank adjacent pair. Concatenating the output tokens
    * reconstructs the text modulo whitespace (no marker tokens).
    */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var parts = word.map(_.toString).toArray
    var continue = parts.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.get(parts(i) + " " + parts(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        // bestRank identifies one unique pair: merge all its occurrences,
        // left to right, non-overlapping
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && {
            val r = ranks.get(parts(j) + " " + parts(j + 1)); r != null && r == bestRank
          }) {
            out += parts(j) + parts(j + 1)
            j += 2
          } else {
            out += parts(j)
            j += 1
          }
        }
        parts = out.toArray
        continue = parts.length > 1
      }
    }
    parts
  }

  /** The expression hot path: tokenize a full text value. */
  def compute(text: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    text.toString.split("\\s+").foreach { w =>
      if (w.nonEmpty) encodeWord(w, ranks).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Merge strings -> rank lookup table (built once per expression). */
  def ranksOf(merges: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case (s, i) => m.put(s, i) }
    m
  }
}

/** `bpe_encode(text, merges) -> array<string>`: trained-subword tokens.
  * The merge-rank table rides as a codegen reference object; the per-row
  * loop runs inside whole-stage codegen via a direct static call (the
  * DecodeImage/DecodeAudio pattern).
  */
final case class BpeEncode(child: Expression, merges: Array[String])
  extends UnaryExpression {

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = Bpe.ranksOf(merges)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $dt")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    Bpe.compute(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Bpe$$.MODULE$$.compute($t, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
