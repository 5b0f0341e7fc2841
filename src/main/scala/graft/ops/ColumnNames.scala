package graft.ops

import org.apache.spark.sql.DataFrame

/** Collision-free staging-column naming (review r12: Blocklist and Layout
  * each grew a hand-rolled variant of the same probe — one shared helper,
  * case-insensitive because Spark's default resolver is). A hardcoded
  * staging name silently overwrites — then drops — a caller column of the
  * same name; the probe makes that structurally impossible: first free
  * suffix wins, deterministically. */
private[graft] object ColumnNames {

  /** First `"${base}_$i"` not matching any existing column
    * (case-insensitive exact match) — for a single staging column. */
  def freeName(df: DataFrame, base: String): String =
    Iterator.from(0).map(i => s"${base}_$i")
      .find(n => !df.columns.exists(_.equalsIgnoreCase(n))).get

  /** First `"${base}${i}_"` that no existing column starts with
    * (case-insensitive) — for a FAMILY of staging columns derived by
    * appending to the returned prefix. */
  def freePrefix(df: DataFrame, base: String): String =
    Iterator.from(0).map(i => s"$base${i}_")
      .find { p =>
        val lp = p.toLowerCase
        !df.columns.exists(_.toLowerCase.startsWith(lp))
      }.get
}
