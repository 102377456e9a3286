package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-free, duplicate-sensitive row fingerprint shared by the probe
  * tools (GateOffProbe, CboBench): (row count, Σ crc32(canonical row
  * string)), computed with no driver-side row materialization — the
  * library's no-collect rule applies to tools too. Both compared runs
  * execute the same final projection, so identical values imply identical
  * formatting.
  *
  * NULL renders as the NUL (u0000) sentinel: a raw NUL cannot appear in a
  * column's string form, so NULL can never collide with a real value. (An
  * earlier CboBench copy used a single space — under which a NULL on one
  * side and a literal " " on the other fingerprint identically, masking
  * exactly the plan-change-induced result drift the probe exists to
  * catch. One shared helper, one sentinel.) */
object RowFingerprint {
  def apply(df: DataFrame): (Long, Long) = {
    val rowStr = concat_ws("|",
      df.columns.sorted.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val r = df.select(crc32(rowStr).as("h"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("h")), lit(0L)).as("s"))
      .head()
    (r.getLong(0), r.getLong(1))
  }
}
