package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen) form of the shingle-signature hot loop
  * `transform(TextHash.wordShingles(text, 2), polyHash)` — the DISTINCT
  * word-bigram shingles of `trim(text)`, each hashed with the polynomial
  * rolling hash, in one pass over the string.
  *
  * The HOF formulation builds every shingle through an interpreted lambda
  * chain (sequence → transform → concat_ws(slice) → distinct), then hashes
  * — measured as the dominant cost of `prep_shingle_signatures`, the
  * single most expensive bench entry. This expression walks the word list
  * once, deduplicates through one hash set, and hashes codepoints
  * directly; the HOF form remains the cross-engine SEMANTIC definition
  * (the DuckDB oracle's `sqlShingles` rendering) and the equivalence
  * witness (`ShingleHashExprSpec` pins them together).
  *
  * Parity notes: the word split replicates Spark `split(trim(text), " ")`
  * — a literal-space regex with limit -1, so consecutive spaces yield
  * empty words, exactly as the HOF path sees them; distinctness is on the
  * SHINGLE STRING (two distinct shingles colliding to one hash value
  * stay two `sz` entries, one `ds` entry — same as `array_distinct`
  * before hashing); the hash folds CODEPOINTS like [[PolyHashExpr]].
  * Element order is first-occurrence order (`array_distinct`'s order);
  * every consumer sorts or counts, so order never reaches a result.
  */
case class ShingleHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashExpr.shingleHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ShingleHashExpr$$.MODULE$$.shingleHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

object ShingleHashExpr {
  private val P = 1000000007L

  /** polyHash fold over a String's codepoints, continued from `acc0`. */
  private def foldCodepoints(s: String, acc0: Long): Long = {
    var acc = acc0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  def shingleHashes(text: UTF8String): ArrayData = {
    // replicate split(trim(text), " "): UTF8String.trim trims ASCII
    // space only — same as Column trim's default
    val words = text.trim().toString.split(" ", -1)
    if (words.length < 2) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[String]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](words.length - 1)
    var i = 0
    while (i < words.length - 1) {
      val shingle = words(i) + " " + words(i + 1)
      if (seen.add(shingle)) {
        // hash(w1 ∥ ' ' ∥ w2) without re-walking a fresh concat buffer
        val h1 = foldCodepoints(words(i), 0L)
        val h = foldCodepoints(words(i + 1), (h1 * 31L + 32L) % P)
        out += java.lang.Long.valueOf(h)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def column(c: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      ShingleHashExpr(org.apache.spark.sql.classic.ExpressionUtils.expression(c)))
}
