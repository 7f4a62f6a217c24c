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
    val toks = SimHash.tokSplit.split(raw.substring(st, en).toLowerCase, -1)
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

/** Per-row SimHash kernel: tokenize → hash each token → per-bit majority
  * vote, in ONE pass per row — no explode, no per-doc aggregate, no
  * shuffle, which is what makes SimHash computable on a STREAMING row
  * (the batch `Dedup.simhashes` path aggregates per doc; a stream has no
  * such stage before the stateful operator).
  *
  * Bit-parity contract with the batch path (unit-asserted):
  *   - tokenization identical to [[WordShingles]] (space-only trim,
  *     toLowerCase, `\\W+` split, empty tokens dropped by the hash loop's
  *     nonEmpty filter — the batch path's `filter(length > 0)`)
  *   - `md5Hash = true`: the first 15 md5 hex digits as a long — DuckDB's
  *     `('0x' || substr(md5(tok), 1, 15))::BIGINT` (`Dedup.md5TokenHash`)
  *   - `md5Hash = false`: Spark's `xxhash64` (XXH64, seed 42) over the
  *     token's UTF-8 bytes
  *   - bit i of the result set iff 2 × (tokens with bit i set) > ntok —
  *     exactly the batch majority vote; empty document → 0L.
  */
case class SimHash(child: Expression, nbits: Int, md5Hash: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(nbits >= 1 && nbits <= 64, "nbits must be in [1, 64]")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = s"graft_simhash_$nbits"

  private def hashTok(tok: String): Long =
    if (md5Hash) {
      // PER-TOKEN hot path: reuse a thread-local digest (getInstance does
      // a provider lookup per call) and read the value straight off the
      // digest bytes — the original's per-byte "%02x".format + parseLong
      // of the first 15 hex nibbles is EXACTLY the big-endian first 8
      // bytes >>> 4 (60 bits), same value, ~10x cheaper. This kernel is
      // what a streaming near-dup pays per arriving document.
      val md = SimHash.md5.get()
      md.reset()
      val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var be = 0L
      var i = 0
      while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
      be >>> 4
    } else {
      val u = UTF8String.fromString(tok)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    }

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.toString
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val toks = SimHash.tokSplit.split(raw.substring(st, en).toLowerCase, -1)
    val counts = new Array[Long](nbits)
    var ntok = 0L
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        ntok += 1
        val h = hashTok(toks(i))
        var b = 0
        while (b < nbits) {
          counts(b) += (h >>> b) & 1L
          b += 1
        }
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < nbits) {
      if (counts(b) * 2 > ntok) sh |= 1L << b
      b += 1
    }
    sh
  }

  override protected def withNewChildInternal(c: Expression): SimHash =
    copy(child = c)
}

object SimHash {
  /** SimHash key of a text column, one pass per row. */
  def apply(text: Column, nbits: Int, md5Hash: Boolean): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(text), nbits, md5Hash))

  private[functions] val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private[functions] val tokSplit = java.util.regex.Pattern.compile("\\W+")
}
