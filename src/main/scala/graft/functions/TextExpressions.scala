package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column as ONE narrow projection.
  *
  * The previous corpus path tokenized with `posexplode` and formed n-grams
  * with a `lead` window — a full shuffle + per-doc sort — then `distinct()`
  * (a second shuffle) before the rows could be materialized. This kernel
  * does tokenize → n-gram → per-doc dedup in a single pass per row, so
  * `Dedup.shingleRows` becomes explode-only (NO wide exchange before the
  * shingle write — at 100 TB the two saved shuffles are the whole cost).
  *
  * Tokenization replicates the Column pipeline it replaced bit-for-bit so
  * the DuckDB oracles keep matching:
  *   - `trim()`: SQL trim strips 0x20 SPACE only (not Java trim's <= ' ')
  *   - `lower()`: UTF8String's lowercase = ASCII fast path, JVM default
  *     elsewhere — plain `toLowerCase()` matches both
  *   - `split(text, "\\W+")` with Spark's limit = -1 (KEEPS trailing empty
  *     tokens, unlike Java's default split)
  *   - n-grams join with a single space including empty tokens (the
  *     `concat_ws` behavior), zero-length shingles dropped, per-doc set
  *     dedup (the old global `distinct()` was per-(doc,shingle) anyway).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_shingles_$n"

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.toString
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val toks = raw.substring(st, en).toLowerCase.split("\\W+", -1)
    val out = new java.util.LinkedHashSet[UTF8String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  /** Distinct n-gram shingle array of a text column. */
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
