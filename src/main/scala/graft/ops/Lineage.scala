package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lineage-cut seam for the iterative operators (PageRank, connected
  * components, the curation pins): every cut in the engine routes
  * through here so the CUT MECHANISM is a deployment choice, not a
  * code path.
  *
  * Default — `localCheckpoint`: blocks pin in executor storage
  * (MEMORY_AND_DISK), zero external infrastructure, the right local /
  * single-tenant answer. Its known limit (VERDICT r12): the lineage is
  * FORFEITED, so on a real cluster a single lost executor makes the
  * pinned partitions unrecoverable and kills a multi-hour iterative
  * job.
  *
  * Opt-in — `spark.graft.checkpoint.reliable=true` (runtime conf) plus
  * `sparkContext.setCheckpointDir(...)`: cuts go through Spark's
  * RELIABLE checkpoint to the (HDFS/S3) checkpoint dir instead, so any
  * executor can be lost and the job replans from the checkpoint files.
  * The trade is one write+read of the cut frame per iteration against
  * distributed storage — for a 1000-executor, k-iteration job that is
  * the standard price of restartability, and the per-round frames these
  * operators cut are id/label-sized (longs), never the corpus.
  * Checkpoint files live until the application cleans its dir (set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` for eager GC
  * — files are otherwise bounded by the dir's lifecycle, not leaked per
  * run).
  *
  * Both paths produce BIT-IDENTICAL results (LineageSpec): a checkpoint
  * only changes where blocks live, never row values or the downstream
  * plan semantics.
  */
object Lineage {

  /** Runtime-conf key selecting the reliable path. */
  val ReliableConf = "spark.graft.checkpoint.reliable"

  /** Is the reliable path selected (and usable) for this session?
    * Throws if selected without a checkpoint dir — a silent fallback
    * would hand a cluster operator the exact executor-loss fragility
    * they opted out of. */
  def reliable(spark: SparkSession): Boolean = {
    val on = spark.conf.get(ReliableConf, "false").toBoolean
    require(!on || spark.sparkContext.getCheckpointDir.isDefined,
      s"$ReliableConf=true requires sparkContext.setCheckpointDir(...)")
    on
  }

  /** EAGER DataFrame cut: materializes now, returns the cut frame. */
  def cut(df: DataFrame): DataFrame =
    cut(df, reliable(df.sparkSession))

  /** [[cut]] with the reliable flag PRE-RESOLVED — iterative operators
    * snapshot the conf once per invocation and pass it into their loop
    * (ADVICE r13): re-reading the session conf per cut lets a mid-job
    * flip of `spark.graft.checkpoint.reliable` mix local and reliable
    * cuts within one job, making the recoverability the flag promises
    * only partial. Results are bit-identical either way. */
  def cut(df: DataFrame, reliableResolved: Boolean): DataFrame =
    if (reliableResolved) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** LAZY RDD mark (the componentsWithRounds discipline): the caller's
    * next action materializes the cut, and the caller keeps its
    * unpersist bookkeeping. On the reliable path the RDD is persisted
    * BEFORE the checkpoint mark so the materializing action doesn't pay
    * a second recompute for the checkpoint write. */
  def mark(rdd: RDD[_], spark: SparkSession): Unit =
    mark(rdd, reliable(spark))

  /** [[mark]] with the reliable flag pre-resolved (see the two-arg
    * [[cut]] for why loops snapshot it once). */
  def mark(rdd: RDD[_], reliableResolved: Boolean): Unit =
    if (reliableResolved) {
      rdd.persist(StorageLevel.MEMORY_AND_DISK)
      rdd.checkpoint()
    } else {
      rdd.localCheckpoint()
      ()
    }
}
