package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JacksonParser, JSONOptionsInRead}
import org.apache.spark.sql.catalyst.util.{FailureSafeParser, PermissiveMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Bridge to Catalyst's Jackson JSON machinery for custom DataSource V2
  * readers: parse one JSON text line into InternalRows against an
  * arbitrary (possibly pruned) schema — the same parser the built-in
  * JSON file source uses, so nested-type handling, permissive-mode
  * corrupt records, and timezone semantics match it exactly. The raw
  * JacksonParser THROWS BadRecordException on malformed input; wrapping it
  * in [[FailureSafeParser]] (exactly as the built-in source does) turns a
  * bad line into one all-null permissive row instead of a task failure,
  * so a single corrupt line in a batch file cannot kill the whole scan.
  * Serializable holder; the parsers are rebuilt lazily per executor.
  */
final class JsonLineParser(schema: StructType, tz: String) extends Serializable {
  @transient private lazy val parser = new JacksonParser(
    schema,
    new JSONOptionsInRead(Map.empty[String, String], tz, "_corrupt_record"),
    allowArrayAsStructs = false)

  @transient private lazy val safeParser = new FailureSafeParser[String](
    line => parser.parse[String](line, CreateJacksonParser.string, UTF8String.fromString),
    PermissiveMode,
    schema,
    "_corrupt_record")

  def parse(line: String): Iterator[InternalRow] =
    safeParser.parse(line).map(_.copy())
}
