package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pandas-style frequency / timedelta alias parser.
  *
  * The reference accepts pandas offset aliases ("1d", "10min", "-15min",
  * "2h", "1w") for both `freq` (resample grid step) and `time_travel`
  * deltas (see /root/reference/bytehub/_storage/dask.py:121,172 and
  * tests/test_featurestore.py:583-587). Spark has no pandas-alias parser,
  * so this maps the alias onto a Catalyst interval expression / micros.
  *
  * Only calendar-stable units are supported (week and below), which is
  * what the reference's test matrix uses; month/quarter aliases would
  * need CalendarInterval arithmetic and are rejected explicitly.
  */
object Freq {
  private val Pattern = """^\s*(-?)(\d*)\s*([a-zA-Z]+)\s*$""".r

  private val unitMicros: Map[String, Long] = Map(
    "us" -> 1L, "micros" -> 1L,
    "ms" -> 1000L, "millis" -> 1000L, "l" -> 1000L,
    "s" -> 1000000L, "sec" -> 1000000L, "second" -> 1000000L, "seconds" -> 1000000L,
    "min" -> 60000000L, "t" -> 60000000L, "minute" -> 60000000L, "minutes" -> 60000000L,
    "h" -> 3600000000L, "hour" -> 3600000000L, "hours" -> 3600000000L,
    "d" -> 86400000000L, "day" -> 86400000000L, "days" -> 86400000000L,
    "w" -> 604800000000L, "week" -> 604800000000L, "weeks" -> 604800000000L
  )

  /** "10min" -> 600000000 micros; "-15min" -> -900000000. Counts too
    * large to represent in Long micros (or to parse at all) raise the
    * same IllegalArgumentException as an unknown unit — a silent
    * two's-complement wrap would hand timeTravel/resample a valid-
    * looking but wildly wrong (possibly negative) interval.
    */
  def toMicros(alias: String): Long = alias match {
    case Pattern(sign, num, unit) =>
      val micros = unitMicros.getOrElse(
        unit.toLowerCase,
        throw new IllegalArgumentException(s"unsupported frequency alias: '$alias'"))
      try {
        val n = if (num.isEmpty) 1L else num.toLong
        Math.multiplyExact((if (sign == "-") -1L else 1L) * n, micros)
      } catch {
        case _: NumberFormatException | _: ArithmeticException =>
          throw new IllegalArgumentException(s"frequency alias out of range: '$alias'")
      }
    case _ =>
      throw new IllegalArgumentException(s"unsupported frequency alias: '$alias'")
  }

  /** Column interval usable in timestamp arithmetic and `sequence()`. */
  def toInterval(alias: String): Column =
    expr(s"INTERVAL ${toMicros(alias)} MICROSECOND")

  private val CalendarPattern = """^\s*(\d*)\s*(mo|month|months|M|y|yr|year|years|Y)\s*$""".r

  /** Calendar-stepped aliases ("1mo", "M", "2y") as a month count —
    * these cannot be a fixed micros step (months vary in length), so
    * `resample` builds their spine with calendar arithmetic instead.
    * Distinct from the fixed-duration aliases above ("min" is minutes;
    * only uppercase M means month, as in pandas).
    */
  def calendarMonths(alias: String): Option[Int] = alias match {
    case CalendarPattern(num, unit) =>
      val n = if (num.isEmpty) 1 else num.toInt
      val months = unit match {
        case "mo" | "month" | "months" | "M" => n
        case _                               => 12 * n
      }
      Some(months)
    case _ => None
  }
}
