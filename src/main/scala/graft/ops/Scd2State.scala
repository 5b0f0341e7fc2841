package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import BucketedTables._

/** Incremental SCD2 (VERDICT r13 #3): [[Temporal.scd2WithDeletions]]
  * recomputes from ALL snapshots each run — at a daily cadence over a
  * 100 TB dimension that is a full history rescan for one day of news.
  * This state folds each daily snapshot into persisted intervals in ONE
  * key-shuffle over (current ∪ delta), never touching closed history:
  *
  * State under `<root>/scd2_state/`:
  *  - `current/` — one row per key EVER seen: the key's latest version
  *    (`version, valid_from, valid_to, nb_snapshots, attrs…`) plus
  *    `is_open` (was the key present in the last folded snapshot?).
  *    BUCKETED by the key columns, so the daily fold's full-outer join
  *    plans no state-side exchange; rewritten per fold (the standard
  *    SCD2 merge cost — the rewrite IS the output). The fold ledger
  *    (`_graft_scd2.json`: bucket count, key/attr pinning, applied
  *    snapshot dates) rides INSIDE the dir, so ledger and data become
  *    visible in the same atomic swap — a replayed date is a provable
  *    no-op, never a double-extend;
  *  - `history/d=<date>/` — closed intervals retired by that date's
  *    fold, append-only and per-date OVERWRITTEN, so the crash window
  *    between the history write and the current swap replays cleanly
  *    (the re-run overwrites the same subdir, then lands the swap).
  *
  * Fold semantics per key — exactly [[Temporal.scd2WithDeletions]]'s,
  * one snapshot date at a time (each fold call IS one calendar date on
  * which other keys were observed; fold an empty frame and it no-ops,
  * matching a date absent from the batch calendar):
  *  - present, attrs unchanged, open → EXTEND (`valid_to` = date,
  *    `nb_snapshots` + 1);
  *  - present, attrs changed, open → old row retires to history, a new
  *    version opens at the date;
  *  - absent, open → CLOSE (`is_open` = false; `valid_to` stays the
  *    last OBSERVED date — absence never extends an interval);
  *  - present, closed → reopen as a NEW version even when the
  *    attributes return identical (a presence gap splits the version,
  *    the absence-as-deletion contract);
  *  - new key → version 1 opens at the date.
  *
  * `intervals` = history ∪ current, column-identical to
  * [[Temporal.scd2WithDeletions]] output — property-tested: N daily
  * folds == one-shot scd2WithDeletions over all N snapshots.
  *
  * Precondition (as [[Temporal.scd2]]): one row per key per snapshot.
  * Dates must fold in increasing order; out-of-order folds error rather
  * than silently corrupting run numbering.
  */
object Scd2State {

  private def stateDir(root: String) = s"$root/scd2_state"
  private def curDir(root: String) = s"${stateDir(root)}/current"
  private def histDir(root: String) = s"${stateDir(root)}/history"
  private def metaPath(root: String) = new Path(s"${curDir(root)}/_graft_scd2.json")

  private def curTable(root: String) = tableName("scd", curDir(root))

  private case class Meta(buckets: Int, keyCols: Seq[String],
                          attrCols: Seq[String], applied: Set[String],
                          last: String)

  private def metaJson(m: Meta): String = {
    def arr(xs: Seq[String]) = xs.map(x => s""""$x"""").mkString("[", ",", "]")
    s"""{"buckets": ${m.buckets}, "keys": ${arr(m.keyCols)}, """ +
      s""""attrs": ${arr(m.attrCols)}, "last": "${m.last}", """ +
      s""""applied": ${arr(m.applied.toSeq.sorted)}}"""
  }

  private def readMeta(spark: SparkSession, root: String): Meta = {
    val body = readJsonSidecar(spark, metaPath(root))
      .getOrElse(sys.error(s"no scd2 state at $root"))
    def arr(field: String): Seq[String] =
      s""""$field"\\s*:\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(body)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq)
        .getOrElse(sys.error(s"scd2 meta missing $field: $body"))
    Meta(
      jsonInt(body, "buckets").getOrElse(sys.error(s"scd2 meta missing buckets")),
      arr("keys"), arr("attrs"), arr("applied").toSet,
      """"last"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1))
        .getOrElse(sys.error("scd2 meta missing last")))
  }

  /** Bucketed snapshot of the current table WITH the ledger sidecar in
    * the same atomic swap ([[BucketedTables.writeBucketedSnapshot]] plus
    * a `_`-prefixed file parquet readers ignore — the
    * `ledgeredAdditiveFold` discipline, bucketed). */
  private def writeCurrent(df: DataFrame, root: String, m: Meta): Unit = {
    val spark = df.sparkSession
    val live = new Path(curDir(root))
    val fs = hadoopFs(spark, live)
    recoverSwap(fs, live)
    val tmp = new Path(curDir(root) + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    spark.sql(s"DROP TABLE IF EXISTS ${curTable(root)}")
    df.repartition(m.buckets, m.keyCols.map(col): _*)
      .write.bucketBy(m.buckets, m.keyCols.head, m.keyCols.tail: _*)
      .sortBy(m.keyCols.head, m.keyCols.tail: _*)
      .option("path", tmp.toString).mode("overwrite").saveAsTable(curTable(root))
    writeJsonSidecar(spark, new Path(tmp, "_graft_scd2.json"), metaJson(m))
    swapInto(fs, tmp, live)
    registerBucketed(spark, curDir(root), curTable(root), m.buckets, m.keyCols)
  }

  private def loadCurrent(spark: SparkSession, root: String, m: Meta): DataFrame = {
    ensureRegistered(spark, curDir(root), curTable(root), m.buckets, m.keyCols)
    spark.table(curTable(root))
  }

  /** The registered current table (test/diagnostic face). */
  private[graft] def currentTable(spark: SparkSession, root: String): DataFrame =
    loadCurrent(spark, root, readMeta(spark, root))

  /** Day-0 bootstrap: batch-collapse the history so far
    * ([[Temporal.scd2WithDeletions]]) and persist it as fold state —
    * each key's latest version becomes the `current` row (`is_open` iff
    * its run reaches the latest snapshot date), earlier versions land in
    * `history/d=bootstrap`. */
  def bootstrap(snapshots: DataFrame, keyCols: Seq[String],
                attrCols: Seq[String], dateCol: String, root: String,
                buckets: Int = 0): Unit = {
    val spark = snapshots.sparkSession
    val n = if (buckets > 0) buckets
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val iv = Temporal.scd2WithDeletions(snapshots, keyCols, attrCols, dateCol)
    val dates = snapshots.select(date_format(col(dateCol), "yyyy-MM-dd").as("d"))
      .distinct().orderBy("d")
      .collect().map(_.getString(0)).toSeq // calendar-bounded
    require(dates.nonEmpty, "scd2 bootstrap needs at least one snapshot")
    val last = dates.last
    val keys = keyCols.map(col)
    val maxVer = iv.groupBy(keys: _*).agg(max(col("version")).as("version"))
    val latest = iv.join(maxVer, keyCols :+ "version")
      .withColumn("is_open",
        date_format(col("valid_to"), "yyyy-MM-dd") === lit(last))
    val older = iv.join(maxVer.withColumnRenamed("version", "__mv"), keyCols)
      .filter(col("version") < col("__mv")).drop("__mv")
    val cols = keyCols.map(col) ++
      Seq(col("version"), col("valid_from"), col("valid_to"),
        col("nb_snapshots")) ++ attrCols.map(col)
    older.select(cols: _*).write.mode("overwrite")
      .parquet(s"${histDir(root)}/d=bootstrap")
    writeCurrent(latest.select(cols :+ col("is_open"): _*), root,
      Meta(n, keyCols, attrCols, dates.toSet, last))
  }

  /** Fold one snapshot date. `date` is ISO `yyyy-MM-dd`; a date already
    * in the ledger no-ops (crash replay), an out-of-order date errors,
    * an EMPTY snapshot no-ops (a date with no observations is not in the
    * batch calendar either). ONE key-shuffle: the full-outer join plans
    * no state-side exchange (current is key-bucketed); the joined frame
    * evaluates twice (history filter, current rewrite) — two scans, no
    * corpus-sized pin. */
  def fold(snapshot: DataFrame, root: String, date: String): Unit = {
    val spark = snapshot.sparkSession
    val m = readMeta(spark, root)
    if (m.applied.contains(date)) return
    require(date > m.last,
      s"scd2 folds must be date-ordered: $date <= last folded ${m.last}")
    if (snapshot.isEmpty) return
    val cur = loadCurrent(spark, root, m)
    val (retired, nextCur) =
      foldFrames(cur, snapshot, m.keyCols, m.attrCols, date)
    // history first (per-date overwrite = replay-idempotent), then the
    // current swap carries the ledger — a crash between them re-runs the
    // date: same history bytes, then the swap lands
    retired.write.mode("overwrite").parquet(s"${histDir(root)}/d=$date")
    writeCurrent(nextCur, root,
      m.copy(applied = m.applied + date, last = date))
  }

  /** The fold's two output frames (retired-to-history, next current) —
    * pure plan construction, shared by [[fold]] and the plan-shape
    * tests: the full-outer join's keys equal the current table's bucket
    * columns exactly, so the corpus-scale state side must plan no
    * exchange (asserted in PlanShapeSpec). */
  private[graft] def foldFrames(cur: DataFrame, snapshot: DataFrame,
                                keyCols: Seq[String], attrCols: Seq[String],
                                date: String): (DataFrame, DataFrame) = {
    val keys = keyCols.map(col)
    val dLit = lit(date).cast("date")
    val d = snapshot.select(keys ++
        attrCols.map(c => col(c).as(s"__d_$c")): _*)
      .withColumn("__in_d", lit(true))
    val j = cur.join(d, keyCols, "full_outer")
    val inDelta = col("__in_d").isNotNull
    val hasCur = col("version").isNotNull
    val open = coalesce(col("is_open"), lit(false))
    val sameAttrs = struct(attrCols.map(col): _*) <=>
      struct(attrCols.map(c => col(s"__d_$c")): _*)
    val extendRun = inDelta && hasCur && open && sameAttrs
    val newRun = inDelta && (!hasCur || !open || !sameAttrs)
    // rows whose CURRENT version retires to history this fold: an open
    // run broken by attribute change, or a closed run superseded by a
    // reappearance
    val retired = j.filter(hasCur && inDelta && (!open || !sameAttrs))
      .select(keys ++ Seq(col("version"), col("valid_from"), col("valid_to"),
        col("nb_snapshots")) ++ attrCols.map(col): _*)
    val nextCur = j.select(keys ++ Seq(
        when(newRun, coalesce(col("version"), lit(0L)) + 1L)
          .otherwise(col("version")).as("version"),
        when(newRun, dLit).otherwise(col("valid_from")).as("valid_from"),
        when(newRun, dLit).when(extendRun, dLit)
          .otherwise(col("valid_to")).as("valid_to"),
        when(newRun, lit(1L)).when(extendRun, col("nb_snapshots") + 1L)
          .otherwise(col("nb_snapshots")).as("nb_snapshots")) ++
      attrCols.map(c =>
        when(inDelta, col(s"__d_$c")).otherwise(col(c)).as(c)) :+
      inDelta.as("is_open"): _*)
    (retired, nextCur)
  }

  /** All intervals so far: history ∪ current — column-identical to a
    * [[Temporal.scd2WithDeletions]] run over every folded snapshot. */
  def intervals(spark: SparkSession, root: String): DataFrame = {
    val m = readMeta(spark, root)
    val cols = m.keyCols.map(col) ++
      Seq(col("version"), col("valid_from"), col("valid_to"),
        col("nb_snapshots")) ++ m.attrCols.map(col)
    val cur = loadCurrent(spark, root, m).select(cols: _*)
    val hp = new Path(histDir(root))
    if (!hadoopFs(spark, hp).exists(hp)) cur
    else spark.read.parquet(histDir(root)).select(cols: _*).unionByName(cur)
  }
}
