package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JacksonParser, JSONOptionsInRead}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Bridge to Catalyst's Jackson JSON machinery for custom DataSource V2
  * readers: parse one JSON text line into InternalRows against an
  * arbitrary (possibly pruned) schema — the same parser the built-in
  * JSON file source uses, so nested-type handling, permissive-mode
  * corrupt records, and timezone semantics match it exactly. Serializable
  * holder; the parser itself is rebuilt lazily per executor.
  */
final class JsonLineParser(schema: StructType, tz: String) extends Serializable {
  @transient private lazy val parser = new JacksonParser(
    schema,
    new JSONOptionsInRead(Map.empty[String, String], tz, "_corrupt_record"),
    allowArrayAsStructs = false)

  def parse(line: String): Iterator[InternalRow] =
    parser.parse[String](line, CreateJacksonParser.string, UTF8String.fromString)
      .iterator.map(_.copy())
}
