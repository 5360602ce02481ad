package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Positional n-gram hash array as ONE native codegen expression
  * (`graft_gram_hashes(words, n)`): element i is a 64-bit hash of the n-word
  * gram starting at word i (1 ≤ n, output length = max(0, len − n + 1)).
  *
  * This is the shared in-row primitive behind the hash-keyed n-gram family
  * (q103 novelty, q130 boilerplate, q65 repetition runs, q227 repeat spans —
  * round 11, VERDICT r10 #3/#4): those operators group/join on a gram HASH so
  * that gram strings never cross an exchange, and the hash must therefore be
  * cheap to produce per row. The composable form
  * (`transform(sequence(...), i -> xxhash64(concat_ws(' ', slice(...))))`)
  * evaluates every lambda INTERPRETED and allocates a concatenated
  * UTF8String per gram per row — measured as the dominant cost of q103 at
  * sf0.1 once the exchange was fixed. Here each WORD is hashed once
  * (XXH64 over its UTF-8 bytes, seed 42) and each gram folds its n word
  * hashes through XXH64.hashLong — zero string allocation, one primitive
  * loop inside WholeStageCodegen.
  *
  * The hash domain is INTERNAL (grouping/join keys only; no output column
  * carries it), so it owes no oracle parity — only determinism and collision
  * quality. Two distinct grams collide only if their (per-word-hash)
  * sequences collide under the fold — the callers' collision notes budget
  * this at the same 2⁻⁶⁴ rate as direct string hashing. Word boundaries are
  * preserved by construction (each word hashed separately), so no
  * concatenation aliasing is possible at all — strictly cleaner than
  * hashing the space-joined string.
  *
  * Same once-per-plan discipline as [[MinHashSignature]]: the generated code
  * calls one virtual method per ROW; all per-gram work stays in private
  * primitive loops. Fewer than n words → EMPTY array (callers filter
  * `size(words) >= n`; an empty array explodes to nothing, which matches the
  * `sequence`-form's guarded behavior without its descending-sequence trap).
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_gram_hashes needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires array<string> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  /** The gram-hash loop shared by eval and the generated code. */
  def hashes(words: ArrayData): GenericArrayData = {
    val len = words.numElements()
    if (len < n) return GramHashes.empty
    // hash every word once; grams then fold longs, never re-touch bytes
    val wh = new Array[Long](len)
    var i = 0
    while (i < len) {
      val w = words.getUTF8String(i)
      wh(i) = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
      i += 1
    }
    val out = new Array[Long](len - n + 1)
    i = 0
    while (i <= len - n) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(wh(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(words: Any): Any = hashes(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $self.hashes($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {
  private val empty = new GenericArrayData(Array.empty[Long])
}
