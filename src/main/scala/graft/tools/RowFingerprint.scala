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
  * NULL is disambiguated STRUCTURALLY, not by a sentinel value: the
  * canonical row string leads with a per-column null bitmap (isnull as
  * 0/1 over the sorted columns) before the coalesced values. Rows that
  * differ only in NULL-vs-some-literal — including a literal NUL, which
  * a payload-derived string column CAN legitimately contain — differ in
  * the bitmap, so no sentinel choice can collide. (An earlier CboBench
  * copy coalesced NULL to a bare " " — under which a NULL on one side
  * and a literal " " on the other fingerprint identically, masking
  * exactly the plan-change-induced result drift the probe exists to
  * catch; a NUL sentinel narrowed but did not close that hole. One
  * shared helper, zero sentinel assumptions.) */
object RowFingerprint {
  def apply(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted
    val bitmap = concat(cols.map(c => isnull(col(c)).cast("int").cast("string")): _*)
    val rowStr = concat_ws("|",
      bitmap +: cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val r = df.select(crc32(rowStr).as("h"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("h")), lit(0L)).as("s"))
      .head()
    (r.getLong(0), r.getLong(1))
  }
}
