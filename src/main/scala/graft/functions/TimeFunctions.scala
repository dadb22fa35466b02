package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Datetime parsing with the reference's semantics
  * (`/root/reference/src/config/datetime.rs:16-123`): an ordered list of
  * formats, first successful parse wins; integer timestamps get their unit
  * (seconds/millis/micros/nanos) inferred from magnitude, valid only inside
  * the window 1972-04-13T23:59:55Z .. 2242-03-16T12:56:31Z.
  *
  * Everything is `when`/`coalesce` over built-in functions — fully
  * codegen'd, no UDFs — and the output is `TimestampType` (microsecond
  * precision; nanosecond inputs truncate, same as the reference's tantivy
  * DateTime storage at micros).
  */
object TimeFunctions {

  // Window bounds in seconds, from the reference (datetime.rs:16-28).
  private val MinSec = 72057595L
  private val MaxSec = 8589934591L

  /** Magnitude-inferred unix timestamp → timestamp; null outside all
    * ranges. Input column must be LongType (or castable). */
  def timestampFromMagnitude(c: Column): Column = {
    // try_cast: Spark 4 runs with ANSI on, where a plain cast throws on
    // malformed/overflowing input instead of yielding null.
    val v = c.try_cast("long")
    when(v.between(MinSec, MaxSec), timestamp_seconds(v))
      .when(v.between(MinSec * 1000, MaxSec * 1000), timestamp_millis(v))
      .when(v.between(MinSec * 1000000L, MaxSec * 1000000L), timestamp_micros(v))
      .when(v.between(MinSec * 1000000000L, MaxSec * 1000000000L),
        timestamp_micros((v / 1000L).cast("long")))
      .otherwise(lit(null).cast("timestamp"))
  }

  /** Parse one string column with one named format; null on failure. */
  def parseFormat(raw: Column, format: String): Column = format match {
    case "timestamp" =>
      // Only pure integers qualify (serde_json::from_value::<i64>); a
      // float or non-numeric string must not match this format.
      timestampFromMagnitude(
        when(raw.rlike("^-?\\d{1,19}$"), raw.try_cast("long")))
    case "rfc3339" =>
      // 2016-04-13T06:46:53Z / +02:00 offsets / fractional seconds.
      when(raw.rlike("^\\d{4}-\\d{2}-\\d{2}[Tt ]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?([Zz]|[+-]\\d{2}:\\d{2})$"),
        try_to_timestamp(raw))
    case "iso8601" =>
      // Lenient ISO-8601 (what Spark's to_timestamp natively accepts).
      try_to_timestamp(raw)
    case "rfc2822" =>
      // e.g. "Wed, 13 Apr 2016 06:46:53 +0000" (day-of-week optional).
      coalesce(
        try_to_timestamp(raw, lit("EEE, d MMM yyyy HH:mm:ss Z")),
        try_to_timestamp(raw, lit("d MMM yyyy HH:mm:ss Z")))
    case other =>
      throw new IllegalArgumentException(s"unknown datetime format: $other")
  }

  /** Format cascade: first format that parses wins. */
  def parseCascade(raw: Column, formats: Seq[String]): Column =
    coalesce(formats.map(parseFormat(raw, _)): _*)

  /** RFC 3339 echo used in stored-document output (`2016-04-13T06:46:53Z`).
    * Sub-second part included only when non-zero, matching the reference's
    * time-crate Rfc3339 serialization. */
  def formatRfc3339(ts: Column): Column =
    when(ts.isNull, lit(null).cast("string"))
      .when(date_format(ts, "SSSSSS") === "000000",
        date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .otherwise(concat(
        date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
        lit("."),
        regexp_replace(date_format(ts, "SSSSSS"), "0+$", ""),
        lit("Z")))
}
