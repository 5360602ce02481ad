package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Whole-row MinHash signature as ONE native codegen expression
  * (`graft_minhash_sig`): given a document's word array, returns the 12-slot
  * signature `s0..s11` — for every 3-word shingle, the 28-bit md5-prefix base
  * hash expanded through the fixed universal-hash family
  * `h_i(x) = (a_i·H(x) + b_i) mod p` and folded to the per-slot minimum.
  *
  * Bit-parity contract (pinned by the q150 oracle, which recomputes q28's
  * exhaustive form in DuckDB): shingles are the space-joined word triples
  * over the raw split — duplicates need no `array_distinct` here because a
  * MIN fold is multiset-invariant; the base hash is the integer value of the
  * first 7 lowercase-hex chars of `md5(shingle)` = the top 28 bits of the
  * digest, exactly `conv(substring(md5(sh), 1, 7), 16, 10)`; `a·H + b` stays
  * under 2⁵⁹ + 2³¹ so the Java `%` is the mathematical mod. Seeds and p are
  * [[graft.ext.Dedup.P]]/`seedsAB` — the same constants the oracle SQL
  * embeds.
  *
  * Why an expression when the composable form exists: the HOF pipeline
  * (`transform` to hash, 12 × `aggregate` to fold) evaluates every lambda
  * INTERPRETED — per (shingle, slot) it allocates boxed rows and evaluates an
  * expression tree, and the md5 `transform` materializes an intermediate
  * array per document. Under memory pressure that allocation rate is exactly
  * what made q150's sf10 timings swing run-to-run. This expression runs the
  * whole signature in one tight primitive loop inside WholeStageCodegen — one
  * `byte[]` per shingle for the digest input, a stack `long[12]` accumulator,
  * zero boxing. Fewer than 3 words → null (the callers' `size >= 3` filter
  * semantics; flagged nullable).
  *
  * Same once-per-plan discipline as [[ArgMaxCell]]: the generated code calls
  * one virtual method per ROW; all per-shingle work stays in private
  * primitive loops. MD5 instances are thread-local (MessageDigest is not
  * thread-safe; local[32] shares the expression across task threads).
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<string> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  /** The signature loop shared by eval and the generated code. Returns null
    * for fewer than 3 words (no shingle exists). */
  def sig(words: ArrayData): GenericArrayData = {
    val n = words.numElements()
    if (n < 3) return null
    val md = MinHashSignature.digests.get()
    val as = MinHashSignature.seedA
    val bs = MinHashSignature.seedB
    val mins = Array.fill(MinHashSignature.numSeeds)(MinHashSignature.P)
    val space = ' '.toByte
    var i = 0
    while (i <= n - 3) {
      // shingle bytes = w(i) ' ' w(i+1) ' ' w(i+2) — concat_ws parity
      val w0 = words.getUTF8String(i).getBytes
      val w1 = words.getUTF8String(i + 1).getBytes
      val w2 = words.getUTF8String(i + 2).getBytes
      md.reset()
      md.update(w0); md.update(space)
      md.update(w1); md.update(space)
      md.update(w2)
      val d = md.digest()
      // first 7 hex chars = top 28 bits: bytes 0..2 plus the high nibble of 3
      val h = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >>> 4)
      var k = 0
      while (k < MinHashSignature.numSeeds) {
        val v = (h * as(k) + bs(k)) % MinHashSignature.P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(words: Any): Any = sig(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this,
      classOf[MinHashSignature].getName)
    // the helper returns null below 3 words — propagate as SQL NULL
    nullSafeCodeGen(ctx, ev, w => {
      s"""
         |${ev.value} = $self.sig($w);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Mirrors [[graft.ext.Dedup.P]] / `seedsAB` (kept here as primitives so the
    * expression has no dependency on the operator layer; `DedupSpec`-level
    * parity is pinned by the q150 oracle and the bands equivalence test). */
  val P: Long = 2147483647L
  val seedA: Array[Long] = Array(
    1099087573L, 2034674923L, 1293847261L, 1847265431L, 1555555557L,
    1777777781L, 1234567891L, 1987654321L, 1357913579L, 1468024681L,
    1696969697L, 1818181819L)
  val seedB: Array[Long] = Array(
    98764321L, 1122334455L, 778899001L, 445566771L, 246813579L,
    135792467L, 987654323L, 123456791L, 864208642L, 975319753L,
    314159265L, 271828183L)
  val numSeeds: Int = 12

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
