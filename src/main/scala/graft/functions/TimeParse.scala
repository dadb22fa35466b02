package graft.functions

import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter

/** Driver-side datetime literal parsing with the same semantics as the
  * ingest-time column cascade in [[TimeFunctions]] (reference:
  * `/root/reference/src/config/datetime.rs:16-123`). Used by the query
  * planner for split pruning, where a Long epoch-micros value is needed at
  * plan time rather than a Column.
  */
object TimeParse {
  private val MinSec = 72057595L
  private val MaxSec = 8589934591L

  /** Magnitude-inferred unix timestamp → epoch micros. */
  def fromMagnitude(v: Long): Option[Long] =
    if (v >= MinSec && v <= MaxSec) Some(v * 1000000L)
    else if (v >= MinSec * 1000 && v <= MaxSec * 1000) Some(v * 1000L)
    else if (v >= MinSec * 1000000L && v <= MaxSec * 1000000L) Some(v)
    else if (v >= MinSec * 1000000000L && v <= MaxSec * 1000000000L) Some(v / 1000L)
    else None

  def parseFormat(raw: String, format: String): Option[Long] = format match {
    case "timestamp" =>
      raw.toLongOption.flatMap(fromMagnitude)
    case "rfc3339" | "iso8601" =>
      try Some(toMicros(OffsetDateTime.parse(raw, DateTimeFormatter.ISO_OFFSET_DATE_TIME)
        .toInstant))
      catch {
        case _: Exception =>
          // lenient: bare date/datetime without offset, treated as UTC
          try Some(toMicros(java.time.LocalDateTime.parse(raw.replace(" ", "T"))
            .toInstant(java.time.ZoneOffset.UTC)))
          catch { case _: Exception => None }
      }
    case "rfc2822" =>
      try Some(toMicros(OffsetDateTime.parse(raw, DateTimeFormatter.RFC_1123_DATE_TIME)
        .toInstant))
      catch { case _: Exception => None }
    case _ => None
  }

  /** Full-microsecond precision — truncating to millis here would let split
    * pruning drop a split whose contents the compiled predicate matches. */
  private def toMicros(inst: java.time.Instant): Long =
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L

  def parseCascade(raw: String, formats: Seq[String]): Option[Long] =
    formats.iterator.flatMap(f => parseFormat(raw, f)).nextOption()
}
