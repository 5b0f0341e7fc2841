package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the lake-operability half of the layout layer
  * (`Layout.zorderWrite` clusters a table once; daily appends then
  * fragment it, and at 100 TB a year of hourly landings is ~10⁵ tiny
  * files whose per-file open/footer cost dominates every scan).
  *
  * Scale posture:
  *
  *  - Planning is driver-side over the file LISTING (names + sizes,
  *    O(files) — the same cost class as the stats manifest): only files
  *    below `smallFraction · targetBytes` are selected, greedily binned
  *    to `⌈Σsmall ∕ targetBytes⌉` output files. Large files are never
  *    read, never rewritten — the scan cost is the fragmentation's, not
  *    the table's.
  *  - The rewrite is ONE distributed job over the small files:
  *    `repartitionByRange(bins, sortCols)` + in-partition sort when the
  *    caller names the clustering (so a z-ordered table keeps narrow
  *    per-file envelopes through compaction), plain `repartition(bins)`
  *    otherwise.
  *  - Index refresh composes with [[graft.io.StatsManifest]]'s
  *    incremental faces: compaction vanishes the small files (their
  *    manifest rows drop driver-side) and lands `bins` new ones (the
  *    only files `updateStats`/`updateBloom` rescan). The refresh cost
  *    is the compacted bytes, never the table.
  *
  * Crash safety — a write-ahead plan + backup-rename protocol, mirroring
  * `LakeZones.mergeUpsertByDay`:
  *
  *  1. stage the rewritten bins to `.compact_staging_*` (invisible to
  *     readers — dot-dirs are not data files);
  *  2. write `_graft_compact_plan.json` naming every old (to vanish) and
  *     new (to land) file;
  *  3. move the olds into `.compact_undo`, then the staged news into the
  *     table, then drop plan + undo + staging.
  *
  * A crash at ANY point leaves a state [[sweep]] rolls BACK at the next
  * entry: while the plan exists the undo dir still holds every moved-out
  * old (undo is only deleted after the plan), so repair = delete listed
  * news from the table, restore olds from undo, drop the leftovers —
  * converging to the pre-compaction table with no window where rows are
  * lost or doubled. Readers planned BETWEEN the renames can race the
  * moves, exactly as with any non-transactional path-based table (the
  * sanctioned scope — snapshot isolation needs a transaction log).
  * SINGLE WRITER per table, externally serialized — same contract as
  * `mergeUpsertByDay` and dynamic partition overwrite.
  *
  * Scope: one directory of parquet files (a table root, or ONE Hive
  * partition directory — call per partition to compact a partitioned
  * table; files in subdirectories are ignored by design).
  */
object Compact {

  val PlanFile = "_graft_compact_plan.json"
  private val UndoDir = ".compact_undo"
  private val StagingPrefix = ".compact_staging_"

  /** What one [[compact]] pass did. `filesBefore` counts live data files
    * at entry; `filesCompacted` of them were rewritten into
    * `filesWritten` bins covering `bytesCompacted`. */
  case class Report(filesBefore: Int, filesCompacted: Int,
                    filesWritten: Int, bytesCompacted: Long)

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Live data files DIRECTLY under `path` (no recursion — subdirs are
    * partitions, compacted per-directory), with sizes. */
  private def dataFiles(spark: SparkSession, path: String) = {
    val root = new org.apache.hadoop.fs.Path(path)
    fsOf(spark, root).listStatus(root).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
  }

  /** Roll back a crashed compaction, if one is on disk. Idempotent; call
    * at entry (compact does) or any time. Returns true if repair ran. */
  def sweep(spark: SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, root)
    val planPath = new org.apache.hadoop.fs.Path(root, PlanFile)
    val undo = new org.apache.hadoop.fs.Path(root, UndoDir)
    val repaired = fs.exists(planPath)
    if (repaired) {
      val txt = {
        val in = fs.open(planPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      }
      // the plan is two JSON string arrays written by us — parse with the
      // same minimal reader the manifest layer uses (no extra deps)
      def arr(key: String): Seq[String] = {
        val m = java.util.regex.Pattern
          .compile("\"" + key + "\"\\s*:\\s*\\[(.*?)\\]", java.util.regex.Pattern.DOTALL)
          .matcher(txt)
        require(m.find(), s"malformed compaction plan: no $key in $planPath")
        "\"(.*?)\"".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      }
      // 1. delete any landed news (their rows live on in the undo'd olds)
      arr("newFiles").foreach { n =>
        val p = new org.apache.hadoop.fs.Path(root, n)
        if (fs.exists(p)) fs.delete(p, false)
      }
      // 2. restore every old still sitting in undo
      arr("oldFiles").foreach { o =>
        val b = new org.apache.hadoop.fs.Path(undo, o)
        if (fs.exists(b)) {
          require(fs.rename(b, new org.apache.hadoop.fs.Path(root, o)),
            s"compaction repair: could not restore $o from $undo")
        }
      }
      fs.delete(planPath, false)
    }
    if (fs.exists(undo)) fs.delete(undo, true)
    // orphaned staging dirs (crash before the plan was written)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(StagingPrefix))
      .foreach(s => fs.delete(s.getPath, true))
    repaired
  }

  /** Compact the small files of the parquet directory at `path` into
    * ~`targetBytes` bins. Files ≥ `smallFraction · targetBytes` are left
    * in place. Pass `sortCols` to preserve (re-establish) the table's
    * clustering inside the rewritten bins. No-op (zero-valued report
    * fields) when fewer than two files qualify. */
  def compact(spark: SparkSession, path: String, targetBytes: Long,
              sortCols: Seq[String] = Nil,
              smallFraction: Double = 0.5): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(smallFraction > 0 && smallFraction <= 1,
      s"smallFraction must be in (0, 1] (got $smallFraction)")
    sweep(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, root)
    val files = dataFiles(spark, path)
    val small = files.filter(_.getLen < smallFraction * targetBytes)
    if (small.size < 2)
      return Report(files.size, 0, 0, 0L)
    val bytes = small.map(_.getLen).sum
    val bins = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    // 1. stage the rewrite (readers can't see dot-dirs)
    val staging = new org.apache.hadoop.fs.Path(
      root, StagingPrefix + java.util.UUID.randomUUID().toString.take(8))
    val src = spark.read.option("basePath", path)
      .parquet(small.map(_.getPath.toString): _*)
    val binned =
      if (sortCols.nonEmpty)
        src.repartitionByRange(bins, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else src.repartition(bins)
    binned.write.mode("overwrite")
      .option("compression", "snappy").parquet(staging.toString)
    val staged = fs.listStatus(staging).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))

    // 2. write-ahead plan: olds to vanish, news to land. The plan embeds
    // raw names in JSON quotes with no escaping; a name carrying a quote
    // or backslash would serialize a plan the crash-sweep mis-parses and
    // the rollback would lose files — refuse up front (ADVICE r12; the
    // cmUpdateState deltaId guard's posture). Spark part-files never
    // contain either character, so this only bites hand-placed files.
    val oldNames = small.map(_.getPath.getName)
    val newNames = staged.map(_.getPath.getName)
    (oldNames ++ newNames).foreach { n =>
      require(!n.contains('"') && !n.contains('\\'),
        s"""compact: data file name '$n' contains '"' or '\\' — the
           |write-ahead plan cannot represent it safely""".stripMargin)
    }
    def jarr(xs: Seq[String]) = xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    val planPath = new org.apache.hadoop.fs.Path(root, PlanFile)
    val out = fs.create(planPath, true)
    try out.write(
      s"""{"oldFiles":${jarr(oldNames)},"newFiles":${jarr(newNames)}}"""
        .getBytes("UTF-8"))
    finally out.close()

    // 3. swap: olds out to undo, news in, then drop the protocol files.
    // Every rename boolean is checked — HDFS reports failures by
    // returning false; a throw here leaves a plan+undo state the next
    // sweep() rolls back losslessly.
    val undo = new org.apache.hadoop.fs.Path(root, UndoDir)
    require(fs.mkdirs(undo), s"compact: mkdirs failed for $undo")
    small.foreach { s =>
      require(fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(undo, s.getPath.getName)),
        s"compact: backup rename failed for ${s.getPath.getName}")
    }
    staged.foreach { s =>
      require(fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(root, s.getPath.getName)),
        s"compact: landing rename failed for ${s.getPath.getName}")
    }
    fs.delete(planPath, false)
    fs.delete(undo, true)
    fs.delete(staging, true)
    Report(files.size, small.size, staged.size, bytes)
  }
}
