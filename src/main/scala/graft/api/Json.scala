package graft.api

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Shared JSON boundary helpers for the REST and MCP transports — ONE
  * implementation of the DataFrame→JSON serialization and the lenient
  * ISO-8601 timestamp parse, so the two surfaces cannot drift. */
private[api] object Json {
  implicit private val formats: Formats = DefaultFormats

  /** DataFrame rows as json4s values via Spark's own JSON encoder. */
  def rows(df: DataFrame): Seq[JValue] =
    df.toJSON.collect().toSeq.map(JsonMethods.parse(_))

  /** Lenient ISO 8601 parse: accepts offsetted ("…Z", "…+02:00") and
    * offset-less ("2024-01-15T10:00:00") datetimes — the reference's
    * FastAPI models accept both. Unparseable input raises
    * IllegalArgumentException with the offending text, which the
    * transports surface as a 400, not a 500. */
  def timestamp(v: JValue): Option[java.sql.Timestamp] =
    v.extractOpt[String].map { s =>
      val instant =
        try java.time.OffsetDateTime.parse(s).toInstant
        catch {
          case _: java.time.format.DateTimeParseException =>
            try java.time.LocalDateTime.parse(s)
              .atOffset(java.time.ZoneOffset.UTC).toInstant
            catch {
              case _: java.time.format.DateTimeParseException =>
                throw new IllegalArgumentException(
                  s"not an ISO 8601 datetime: '$s'")
            }
        }
      java.sql.Timestamp.from(instant)
    }
}
