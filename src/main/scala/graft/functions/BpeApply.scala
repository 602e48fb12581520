package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-built BPE merge table, embedded by reference in the apply
  * kernel (the [[PqCodebookRef]] pattern). A production tokenizer is a
  * fixed artifact of N merges (GPT-2: 50k — a few MB of strings), so
  * shipping it as expression state via the task closure is the same
  * cost class as a broadcast join build side.
  *
  * `ranks` maps a delimiter-joined pair key `a␟b` to the SORTED array
  * of 0-based merge ranks carrying that pair. A pair can in principle
  * appear at more than one rank: BPE's string-identity caveat lets a
  * later merge re-create a symbol string an earlier merge produced
  * (e.g. "aaa" via both (a,aa) and (aa,a)), after which an
  * already-consumed pair can win again at a later training step — so
  * the lookup must find the smallest rank ≥ the caller's floor, not
  * "the" rank. Rebuilt lazily per JVM after deserialization. */
final class BpeMergeTableRef(
    val lhs: Array[String], val rhs: Array[String]) extends Serializable {
  require(lhs.length == rhs.length,
    s"merge table sides disagree: ${lhs.length} vs ${rhs.length}")

  @transient private lazy val ranks: java.util.HashMap[String, Array[Int]] = {
    // build per-key growable buffers, convert to Array once at the end —
    // the `prev :+ r` form re-copied the array per duplicate rank
    val buf = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
    var r = 0
    while (r < lhs.length) {
      val k = lhs(r) + BpeKernel.D + rhs(r)
      var b = buf.get(k)
      if (b == null) { b = new java.util.ArrayList[Integer](1); buf.put(k, b) }
      b.add(r)
      r += 1
    }
    val m = new java.util.HashMap[String, Array[Int]](buf.size() * 2)
    buf.forEach { (k, b) =>
      val a = new Array[Int](b.size())
      var i = 0
      while (i < a.length) { a(i) = b.get(i).intValue(); i += 1 }
      m.put(k, a) // r ascended during the fill, so each array is sorted
    }
    m
  }

  /** Smallest rank ≥ `floor` at which pair (a, b) merges, or -1. */
  def rankAtLeast(a: String, b: String, floor: Int): Int = {
    val rs = ranks.get(a + BpeKernel.D + b)
    if (rs == null) return -1
    var i = 0
    while (i < rs.length) { if (rs(i) >= floor) return rs(i); i += 1 }
    -1
  }
}

/** Shared eval body for interpreted eval and generated Java.
  *
  * Applies a learned merge table to one word and returns its BPE token
  * count — semantically EXACTLY the sequential N-replace chain (merge 1
  * rewrites the whole word, then merge 2, … then merge N; each rewrite
  * the left-to-right non-overlapping single-pair pass both engines'
  * `replace` implements), but costing O(applied merges × word length)
  * instead of O(N × word length): ranks are visited in increasing order
  * through a monotone floor, and ranks whose pair is absent from the
  * word cost nothing. The floor is what preserves chain semantics — a
  * pair occurrence CREATED by a later merge (string identity) must stay
  * unmerged, exactly as the chain leaves it, because its rank's replace
  * pass has already run; a min-rank loop without the floor would merge
  * it and diverge from training replay. Spec-pinned against the chained
  * twin ([[graft.operators.Bpe.tokenizeWithMergesChained]]) and the
  * plain-Scala Sennrich reference on generated corpora, including
  * N=1024 merge tables.
  *
  * Words split into CODEPOINT symbols (never lone surrogates) —
  * matching Spark's `split(word, "")` (Java regex zero-width matches
  * skip surrogate interiors, probed empirically on this Spark) and
  * DuckDB's `string_split(word, '')`. */
object BpeKernel {

  /** Symbol delimiter (U+001F) — the [[graft.operators.Bpe]] contract:
    * it cannot occur in corpus tokens, and every encode path fails loud
    * rather than trusting the caller. */
  val D = "\u001f"

  /** Split into codepoint strings; empty array for the empty word.
    * Shared with the driver-side trainer ([[graft.operators.Bpe]]) so
    * trainer and kernel can never disagree on symbol boundaries. */
  def cpSplit(w: String): Array[String] = {
    val n = w.codePointCount(0, w.length)
    val out = new Array[String](n)
    var i = 0
    var k = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val c = Character.charCount(cp)
      out(k) = w.substring(i, i + c)
      i += c
      k += 1
    }
    out
  }

  /** Left-to-right non-overlapping single-pair merge — `replace`'s scan
    * in symbol-array form. Returns `syms` unchanged (same reference)
    * when the pair is absent, so callers can cheaply skip stale index
    * entries. */
  def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    var hit = false
    var i = 0
    while (i < syms.length - 1 && !hit) {
      if (syms(i) == a && syms(i + 1) == b) hit = true
      i += 1
    }
    if (!hit) return syms
    val out = new Array[String](syms.length)
    var n = 0
    i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out(n) = a + b; n = n + 1; i += 2
      } else { out(n) = syms(i); n = n + 1; i += 1 }
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** The fail-loud delimiter guard, shared by the kernel and the
    * driver-side trainer: a U+001F in a token would silently splice
    * symbol boundaries (and make the rank map's `a\u241Fb` keys
    * ambiguous), so every encode path rejects it. */
  def guardToken(w: String): String = {
    if (w.indexOf('\u001f') >= 0)
      throw new IllegalArgumentException(
        "Bpe: corpus token contains the U+001F symbol delimiter — " +
          "symbol boundaries would corrupt")
    w
  }

  /** Token count of one word under the merge table — called from
    * generated code, so it must be a public static-reachable method. */
  def tokenCount(word: UTF8String, mt: BpeMergeTableRef): Int = {
    val w = guardToken(word.toString)
    var syms = cpSplit(w)
    var floor = 0
    var more = syms.length > 1
    while (more) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = mt.rankAtLeast(syms(i), syms(i + 1), floor)
        if (r >= 0 && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) more = false
      else {
        syms = mergeOnce(syms, mt.lhs(best), mt.rhs(best))
        floor = best + 1
        more = syms.length > 1
      }
    }
    syms.length
  }
}

/** `string` word → `int` BPE token count against the embedded merge
  * table — the zero-shuffle production apply path (the per-epoch
  * tokenization scan a 100 TB corpus pays): a pure per-row projection
  * whose cost tracks the merges that actually FIRE in the word
  * (≤ len−1), not the size of the merge table. */
case class BpeTokenCount(child: Expression, merges: BpeMergeTableRef)
    extends UnaryExpression with NullIntolerantKernel {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_token_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.tokenCount(input.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, classOf[BpeMergeTableRef].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernel.tokenCount($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
