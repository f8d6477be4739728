package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

/** Shared numeric-parity policy for every oracle-checked query (see the
  * RelationalQueries scaladoc for the full rationale): exact decimal
  * arithmetic inside the aggregate, final value cast to DOUBLE on both
  * sides. ONE definition — the policy fixed the round-1 hash mismatches
  * and must never fork between query files.
  */
package object queries {
  private[queries] def dec(c: Column, scale: Int): Column =
    c.cast(DecimalType(18, scale))

  private[queries] def decSum(c: Column, scale: Int): Column =
    sum(dec(c, scale)).cast("double")
}
