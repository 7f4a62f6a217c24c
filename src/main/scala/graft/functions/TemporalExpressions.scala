package graft.functions

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Rdf

/** XPath temporal/duration arithmetic as ONE native plan node (r18 perf).
  *
  * The Column-combinator formulation of the duration branches (canonical
  * lexical composition, timezone-preserving renders, calendar month adds)
  * put several hundred dead-branch nodes into EVERY `+`/`-`/`*`/`/` call
  * site, and Catalyst analysis cost scales with tree size — the same
  * planning blow-up RingRelate fixed for the geo predicates
  * (`GeoExpressions.scala`). This expression carries the entire special
  * semantics in Scala; the Column wrappers in [[SparqlFunctions]] guard
  * with one small `isin` so NUMERIC rows keep the codegen'd `arith2` fast
  * path and only temporal/duration rows evaluate here (CodegenFallback —
  * cold by construction).
  *
  * Semantics are an exact mirror of the r18 Column formulation (which the
  * `f_duration` / `f_ymduration` oracles replay in DuckDB):
  *   - op:subtract-dateTimes/-dates/-times → canonical dayTimeDuration
  *   - dateTime/date/time ± dayTimeDuration → rendered in the operand's
  *     ORIGINAL timezone suffix (date floors to its starting instant,
  *     time wraps mod 24 h)
  *   - dateTime/date ± yearMonthDuration → calendar month-add with XPath
  *     day-of-month clamping (java.time `plusMonths` = Spark
  *     `make_ym_interval` clamping)
  *   - duration ± duration, unary negate (times −1), × and ÷ by numerics
  *     (yearMonthDuration rounds to whole months per fn:round),
  *     duration ÷ duration → xsd:decimal
  * Families never mix; every undefined pairing returns null (the open-
  * world type error = unbound term).
  */
case class TemporalArith(op: String, left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!TemporalArith.ops.contains(op))
      TypeCheckResult.TypeCheckFailure(s"unknown temporal op '$op'")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = TemporalArith.termType
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_temporal_$op"

  // BinaryExpression.eval short-circuits on null children; that is the
  // right unbound-in → unbound-out behavior here.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ra = a.asInstanceOf[InternalRow]
    val rb = b.asInstanceOf[InternalRow]
    TemporalArith.eval(op, ra, rb)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TemporalArith =
    copy(left = newLeft, right = newRight)
}

object TemporalArith {
  val ops: Set[String] = Set("plus", "minus", "times", "div")

  val termType: StructType = StructType(Seq(
    StructField("kind", ByteType), StructField("value", StringType),
    StructField("dtype", StringType), StructField("lang", StringType),
    StructField("num", DoubleType)))

  /** The five shadow families (mirrors SparqlFunctions.tempFam). */
  private def fam(dtype: String): Int = dtype match {
    case Rdf.XsdDateTime => 1
    case "http://www.w3.org/2001/XMLSchema#date" => 2
    case Rdf.XsdTime => 3
    case Rdf.XsdDayTimeDuration => 4
    case Rdf.XsdYearMonthDuration => 5
    case _ => 0
  }
  private def isNumericDt(dtype: String): Boolean =
    dtype == Rdf.XsdInteger || dtype == Rdf.XsdDecimal ||
      dtype == Rdf.XsdFloat || dtype == Rdf.XsdDouble

  private val TzRe = "(Z|[+-]\\d{2}:\\d{2})$".r

  private def tzSuffix(value: String): String =
    TzRe.findFirstIn(value).getOrElse("")

  private def tzOffMicros(z: String): Long =
    if (z.isEmpty || z == "Z") 0L
    else {
      val sign = if (z.startsWith("-")) -1L else 1L
      val hh = z.substring(1, 3).toLong
      val mm = z.substring(4, 6).toLong
      sign * (hh * 3600000000L + mm * 60000000L)
    }

  /** "." + up-to-6 fraction digits, trailing zeros trimmed; "" if none
    * (mirrors fracSuffix: pmod of the LOCAL micros).
    */
  private def frac(local: Long): String = {
    val f = Math.floorMod(local, 1000000L)
    if (f == 0) ""
    else "." + f"$f%06d".reverse.dropWhile(_ == '0').reverse
  }

  private def fmt(localMicros: Long, datePattern: Boolean): String = {
    val sec = Math.floorDiv(localMicros, 1000000L)
    val ldt = LocalDateTime.ofEpochSecond(sec, 0, ZoneOffset.UTC)
    if (datePattern) f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d"
    else f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d" +
      f"T${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
  }

  private def term(value: String, dtype: String, num: Double): InternalRow =
    InternalRow(Rdf.KindLiteral, UTF8String.fromString(value),
      UTF8String.fromString(dtype), null, num)

  /** Canonical dayTimeDuration lexical from the signed-micros shadow
    * (mirrors durLex: whole-micro truncation, PT0S for zero, trimmed
    * fraction).
    */
  private def durLex(microsD: Double): String = {
    val mAll = Math.abs(microsD.toLong)
    if (mAll == 0) return "PT0S"
    val us = mAll % 60000000L
    val mi = (mAll % 3600000000L - us) / 60000000L
    val hh = (mAll % 86400000000L - mAll % 3600000000L) / 3600000000L
    val dd = (mAll - mAll % 86400000000L) / 86400000000L
    val sWhole = (us - us % 1000000L) / 1000000L
    val fr = us % 1000000L
    val secStr =
      if (fr == 0) sWhole.toString
      else sWhole.toString + "." +
        f"$fr%06d".reverse.dropWhile(_ == '0').reverse
    val tPart = (if (hh > 0) s"${hh}H" else "") +
      (if (mi > 0) s"${mi}M" else "") + (if (us > 0) s"${secStr}S" else "")
    (if (microsD < 0) "-" else "") + "P" +
      (if (dd > 0) s"${dd}D" else "") +
      (if (tPart.nonEmpty) "T" + tPart else "")
  }
  private def durT(microsD: Double): InternalRow =
    term(durLex(microsD), Rdf.XsdDayTimeDuration, microsD)

  /** Canonical yearMonthDuration lexical from the signed-months shadow. */
  private def ymLex(monthsD: Double): String = {
    val mAll = Math.abs(monthsD.toLong)
    if (mAll == 0) return "P0M"
    val yy = mAll / 12L
    val mm = mAll % 12L
    (if (monthsD < 0) "-" else "") + "P" +
      (if (yy > 0) s"${yy}Y" else "") + (if (mm > 0) s"${mm}M" else "")
  }
  private def ymT(monthsD: Double): InternalRow =
    term(ymLex(monthsD), Rdf.XsdYearMonthDuration, monthsD)

  /** Temporal term of family 1/2/3 from a UTC-normalized shadow, rendered
    * in the original timezone suffix `z` (mirrors temporalT exactly:
    * date floors, time wraps, shadows follow each family's convention).
    */
  private def temporalT(famN: Int, shadowRaw: Double, z: String): InternalRow = {
    val off = tzOffMicros(z)
    val local = shadowRaw.toLong + off
    famN match {
      case 1 =>
        term(fmt(local, datePattern = false) + frac(local) + z,
          Rdf.XsdDateTime, shadowRaw)
      case 2 =>
        val dayStart = local - Math.floorMod(local, 86400000000L)
        term(fmt(dayStart, datePattern = true) + z,
          "http://www.w3.org/2001/XMLSchema#date", (dayStart - off).toDouble)
      case _ =>
        val tod = Math.floorMod(local, 86400000000L)
        val sec = Math.floorDiv(tod, 1000000L)
        val lex = f"${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d" +
          frac(tod) + z
        term(lex, Rdf.XsdTime, (tod - off).toDouble)
    }
  }

  /** Calendar month-add on the LOCAL clock (mirrors ymAdd: java.time
    * `plusMonths` clamps day-of-month exactly like `make_ym_interval`).
    */
  private def ymAdd(famN: Int, value: String, shadow: Double,
      months: Double): InternalRow = {
    val z = tzSuffix(value)
    val off = tzOffMicros(z)
    val local = shadow.toLong + off
    val ldt = LocalDateTime.ofEpochSecond(Math.floorDiv(local, 1000000L),
      (Math.floorMod(local, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    val shifted = ldt.plusMonths(months.toLong)
    val shiftedMicros = shifted.toEpochSecond(ZoneOffset.UTC) * 1000000L +
      shifted.getNano / 1000L
    temporalT(famN, (shiftedMicros - off).toDouble, z)
  }

  /** xsd:decimal result (mirrors typedNumTerm rank 1: decimal(38,15)
    * HALF_UP, trailing fractional zeros and a bare point stripped).
    */
  private def decimalT(x: Double): InternalRow = {
    val s0 = java.math.BigDecimal.valueOf(x)
      .setScale(15, java.math.RoundingMode.HALF_UP).toPlainString
    val s1 = s0.replaceAll("(\\.\\d*?)0+$", "$1").replaceAll("\\.$", "")
    term(s1, Rdf.XsdDecimal, x)
  }

  /** XPath fn:round (half toward +∞) for yearMonthDuration scaling. */
  private def round(x: Double): Double = Math.floor(x + 0.5)

  // Field offsets in the term struct.
  private def value(r: InternalRow): String = r.getUTF8String(1).toString
  private def dtype(r: InternalRow): String =
    if (r.isNullAt(2)) "" else r.getUTF8String(2).toString
  private def num(r: InternalRow): java.lang.Double =
    if (r.isNullAt(4)) null else r.getDouble(4)

  def eval(op: String, a: InternalRow, b: InternalRow): InternalRow = {
    val fa = fam(dtype(a))
    val fb = fam(dtype(b))
    val na = num(a)
    val nb = num(b)
    if (na == null || nb == null) return null
    val x = na.doubleValue()
    val y = nb.doubleValue()
    op match {
      case "plus" =>
        if (fa >= 1 && fa <= 3 && fb == 4) temporalT(fa, x + y, tzSuffix(value(a)))
        else if (fa == 4 && fb >= 1 && fb <= 3) temporalT(fb, x + y, tzSuffix(value(b)))
        else if (fa == 4 && fb == 4) durT(x + y)
        else if ((fa == 1 || fa == 2) && fb == 5) ymAdd(fa, value(a), x, y)
        else if (fa == 5 && (fb == 1 || fb == 2)) ymAdd(fb, value(b), y, x)
        else if (fa == 5 && fb == 5) ymT(x + y)
        else null
      case "minus" =>
        if (fa >= 1 && fa <= 3 && fa == fb) durT(x - y)
        else if (fa >= 1 && fa <= 3 && fb == 4) temporalT(fa, x - y, tzSuffix(value(a)))
        else if (fa == 4 && fb == 4) durT(x - y)
        else if ((fa == 1 || fa == 2) && fb == 5) ymAdd(fa, value(a), x, -y)
        else if (fa == 5 && fb == 5) ymT(x - y)
        else null
      case "times" =>
        if (fa == 4 && isNumericDt(dtype(b))) durT(x * y)
        else if (fb == 4 && isNumericDt(dtype(a))) durT(x * y)
        else if (fa == 5 && isNumericDt(dtype(b))) ymT(round(x * y))
        else if (fb == 5 && isNumericDt(dtype(a))) ymT(round(x * y))
        else null
      case "div" =>
        if (fa == 4 && isNumericDt(dtype(b))) { if (y != 0.0) durT(x / y) else null }
        else if (fa == 4 && fb == 4) { if (y != 0.0) decimalT(x / y) else null }
        else if (fa == 5 && isNumericDt(dtype(b))) { if (y != 0.0) ymT(round(x / y)) else null }
        else if (fa == 5 && fb == 5) { if (y != 0.0) decimalT(x / y) else null }
        else null
      case _ => null
    }
  }
}
