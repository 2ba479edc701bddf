package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-pair-encoding tokenization (the GPT-2 `bpe()` shape): per
  * word, repeatedly merge the lowest-rank adjacent token pair until no
  * ranked pair remains. `tx_token_bpe` counts tokens with the regex
  * PRE-tokenizer only; this is the merge loop a production tokenizer runs
  * after it.
  *
  * Oracle-checkable by construction: one merge rank applied once, in
  * ascending rank order, with leftmost non-overlapping occurrences, is
  * provably equal to the exhaust-lowest-rank loop — any pair CONTAINING a
  * token ranks after the merge that created that token, so a processed
  * rank can never reappear. The DuckDB oracle exploits this: it wraps each
  * character as `<c>` and folds one boundary-safe `replace('<a><b>' →
  * '<ab>')` per rank over the SAME pinned merge list (QualityOps builds
  * that SQL from [[Bpe.CorpusMerges]]); this expression runs the real
  * algorithm in one pass per rank with a rank hash map and no string
  * rescans — the per-row cost a 100 TB tokenization job actually pays.
  */
final class BpeVocab(val merges: Seq[(String, String)]) extends Serializable {
  private val rank = new java.util.HashMap[String, Integer](merges.size * 2)
  merges.zipWithIndex.foreach { case ((a, b), i) => rank.put(a + "\u0000" + b, i) }

  private def rankOf(a: String, b: String): Int = {
    val r = rank.get(a + "\u0000" + b)
    if (r == null) Int.MaxValue else r.intValue()
  }

  /** tokenize one word (no spaces) — the GPT-2 merge loop. Seed tokens are
    * Unicode CODEPOINTS (not UTF-16 chars), so non-BMP input (emoji, rare
    * CJK) never splits into lone surrogates. */
  def encodeWord(w: String): ArrayBuffer[String] = {
    var toks = new ArrayBuffer[String](w.length)
    var c = 0
    while (c < w.length) {
      val cp = w.codePointAt(c)
      toks += new String(Character.toChars(cp))
      c += Character.charCount(cp)
    }
    var done = toks.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rankOf(toks(i), toks(i + 1))
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = new ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
            out += a + b; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out
        done = toks.length < 2
      }
    }
    toks
  }

  /** tokenize whitespace-split text; token stream preserves word order. */
  def encodeText(t: UTF8String): GenericArrayData = {
    val out = new ArrayBuffer[AnyRef]()
    t.toString.split(' ').foreach { w =>
      if (w.nonEmpty) encodeWord(w).foreach(tok => out += UTF8String.fromString(tok))
    }
    new GenericArrayData(out.toArray)
  }
}

object Bpe {
  /** 32-merge vocabulary learned by standard iterative BPE over the
    * sf0.01 `documents` word-frequency table (deterministic tie-break:
    * count desc, then pair lexicographic) — pinned here the way a
    * production tokenizer ships its merges file, and DERIVED for real by
    * [[train]] (BpeSpec asserts `train(documents@sf0.01, 32)` reproduces
    * exactly this list; `tx_bpe_train` oracle-checks the loop end to
    * end, `tx_bpe_learn` one counting round). */
  val CorpusMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"))

  val Corpus: BpeVocab = new BpeVocab(CorpusMerges)

  /** The DISTRIBUTED BPE training loop — count pairs → take the global
    * max → apply the merge → repeat — run for real instead of asserting
    * its pinned result. Each round runs over the distinct-word frequency
    * table (vastly smaller than the corpus: the standard corpus-scale BPE
    * shape): explode adjacent token pairs of the CURRENT encoding weighted
    * by word count, partial-agg the pair counts, TakeOrdered the single
    * argmax row to the driver (tie-break: count desc, then (a, b)
    * lexicographic — for space-free tokens identical to the pinned
    * derivation's "pair lexicographic"), then apply JUST the winning merge
    * to the cached encoding ([[BpeMergePairExpr]] — one linear array pass,
    * a no-op on the words that don't contain the pair). Re-encoding every
    * word from scratch with the full merge list each round (O(len·R) per
    * word per round) is provably equal but R× more work — the header's
    * rank-order argument: a processed rank can never reappear, so one
    * application of the new rank over the previous fixpoint IS the next
    * fixpoint. Only the ~bytes-sized winning pair crosses to the driver
    * per round. [[CorpusMerges]] is exactly `train(documents@sf0.01, 32)`
    * — asserted by BpeSpec and oracle-checked end to end by
    * `tx_bpe_train`. */
  def train(docs: org.apache.spark.sql.DataFrame, rounds: Int): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val empty = new BpeVocab(Nil) // codepoint seed tokens, zero merges
    // localCheckpoint (not persist) each round: it truncates the plan to a
    // materialized leaf, so 32 rounds don't accrete 32 nested cached plans
    // (which OOMs the driver on plan/codegen metadata, not data)
    var enc = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), toCol(BpeEncodeExpr(toExpr(col("word")), empty)).as("t"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(String, String)]
    // at toy scale each round is scheduler-bound, so keep it to ONE job:
    // the round's pair-count action also materializes the LAZY checkpoint
    // of the previous round's merge; the parent table is only released
    // after that materialization (dropping a localCheckpoint's parent
    // cache before it materializes would lose the blocks it copies from)
    var parent: org.apache.spark.sql.DataFrame = null
    var exhausted = false
    while (merges.length < rounds && !exhausted) {
      val best = enc
        .filter(size(col("t")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(t)-1), i -> struct(element_at(t, i) AS a, element_at(t, i+1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (parent != null) { parent.unpersist(); parent = null }
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val next = enc
          .select(col("cnt"), toCol(BpeMergePairExpr(toExpr(col("t")), a, b)).as("t"))
          .localCheckpoint(eager = false)
        parent = enc
        enc = next
      }
    }
    if (parent != null) parent.unpersist()
    enc.unpersist()
    merges.toSeq
  }
}

/** One BPE training-round update: replace every leftmost non-overlapping
  * adjacent (a, b) in a token array with the merged token a+b. Strings are
  * cloned out of the (possibly buffer-reusing) input row. */
final class PairMerger(a: String, b: String) extends Serializable {
  private val ua = UTF8String.fromString(a)
  private val ub = UTF8String.fromString(b)
  private val uab = UTF8String.fromString(a + b)
  def merge(in: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = in.numElements()
    val out = new ArrayBuffer[AnyRef](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && ua.equals(in.getUTF8String(i)) && ub.equals(in.getUTF8String(i + 1))) {
        out += uab
        i += 2
      } else {
        out += in.getUTF8String(i).clone()
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpe_merge_pair(t)` → t with one merge rank applied (see [[PairMerger]]);
  * the per-round incremental step of [[Bpe.train]]. */
case class BpeMergePairExpr(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_merge_pair"

  private lazy val merger = new PairMerger(a, b)

  override def nullSafeEval(v: Any): Any =
    merger.merge(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairMerger", merger, classOf[PairMerger].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.merge($c);")
  }

  override protected def withNewChildInternal(c: Expression): BpeMergePairExpr =
    copy(child = c)
}

/** `bpe_encode(text)` → array<string> of BPE tokens. Input StringType. */
case class BpeEncodeExpr(child: Expression, vocab: BpeVocab = Bpe.Corpus)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(v: Any): Any =
    vocab.encodeText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $vocabRef.encodeText($c);")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)
}
