package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-phrase automaton over UTF-8 bytes — the
  * blocklist-scan kernel: matching P phrases with P regex passes reads
  * the corpus P times; the automaton reads each byte ONCE regardless
  * of P (the FlashText observation, done properly). Built once per
  * plan from the foldable phrase array, shipped to executors as a
  * codegen reference object.
  *
  * Counting semantics are leftmost NON-overlapping per phrase,
  * independently (exactly what a per-phrase literal-split scan
  * computes — the oracle's `string_split(t, phrase)` replays it
  * verbatim); distinct phrases still count independently even when
  * their matches overlap each other, and a phrase that is a suffix of
  * another (e.g. `table` inside `fast table`) fires through the
  * automaton's output links at the same end position. Substring
  * semantics, not word-boundary — token-level filters are the
  * token-join operators' job.
  */
final class AcAutomaton(phraseBytes: Array[Array[Byte]]) extends Serializable {
  val nPhrases: Int = phraseBytes.length

  // goto is dense 256-wide per state: states ≈ Σ phrase bytes (blocklists
  // are small); fail + output links per standard AC construction
  private val (goto_, fail, outPhrase, outLen, outNext) = {
    val maxStates = 1 + phraseBytes.map(_.length).sum
    val g = Array.fill(maxStates)(Array.fill(256)(-1))
    val ends = Array.fill(maxStates)(-1) // phrase ending exactly at this state
    var nStates = 1
    phraseBytes.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val b = p(i) & 0xff
        if (g(s)(b) < 0) { g(s)(b) = nStates; nStates += 1 }
        s = g(s)(b)
        i += 1
      }
      ends(s) = pi
    }
    val f = new Array[Int](nStates)
    // output chains: head per state -> linked list of (phrase, len)
    val oPhrase = new java.util.ArrayList[Integer]()
    val oLen = new java.util.ArrayList[Integer]()
    val oNext = new java.util.ArrayList[Integer]()
    val outHead = Array.fill(nStates)(-1)
    def addOut(s: Int, pi: Int, len: Int): Unit = {
      oPhrase.add(pi); oLen.add(len); oNext.add(outHead(s))
      outHead(s) = oPhrase.size() - 1
    }
    phraseBytes.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b => s = g(s)(b & 0xff) }
      addOut(s, pi, p.length)
    }
    // BFS for fail links; merge suffix outputs
    val q = new java.util.ArrayDeque[Integer]()
    for (b <- 0 until 256) {
      val s = g(0)(b)
      if (s < 0) g(0)(b) = 0
      else { f(s) = 0; q.add(s) }
    }
    while (!q.isEmpty) {
      val s = q.poll()
      // inherit the fail state's output chain (suffix matches)
      var o = outHead(f(s))
      while (o >= 0) { addOut(s, oPhrase.get(o), oLen.get(o)); o = oNext.get(o) }
      for (b <- 0 until 256) {
        val t = g(s)(b)
        if (t < 0) g(s)(b) = g(f(s))(b)
        else { f(t) = g(f(s))(b); q.add(t) }
      }
    }
    (g, f, oPhrase.toArray(new Array[Integer](0)).map(_.intValue),
      oLen.toArray(new Array[Integer](0)).map(_.intValue),
      (outHead, oNext.toArray(new Array[Integer](0)).map(_.intValue)))
  }
  private val outHead = outNext._1
  private val outLink = outNext._2

  /** Per-phrase leftmost non-overlapping match counts. */
  def counts(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val c = new Array[Int](nPhrases)
    val lastEnd = Array.fill(nPhrases)(-1) // exclusive end of last counted match
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = goto_(s)(bytes(i) & 0xff)
      var o = outHead(s)
      while (o >= 0) {
        val pi = outPhrase(o)
        val start = i + 1 - outLen(o)
        // greedy by end position ≡ leftmost non-overlapping scan
        // (all of one phrase's matches share a length)
        if (start > lastEnd(pi)) { c(pi) += 1; lastEnd(pi) = i } // i = inclusive end
        o = outLink(o)
      }
      i += 1
    }
    new GenericArrayData(c.map(Int.box))
  }
}

/** `graft_multi_match(text, array('p1','p2',…))` → array<int> of
  * per-phrase counts via one [[AcAutomaton]] pass.
  */
case class MultiMatch(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: first argument must be string")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType != StringType ||
      !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: phrases must be a foldable array<string>")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val automaton: AcAutomaton = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val phrases = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).getBytes.clone())
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      s"$prettyName: phrases must be non-empty")
    new AcAutomaton(phrases.toArray)
  }

  override protected def nullSafeEval(t: Any, p: Any): Any =
    automaton.counts(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $acRef.counts($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiMatch =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_multi_match"
}
