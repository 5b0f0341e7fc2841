package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import BucketedTables._

/** Incremental face of [[Retrieval.bm25TopK]] — the persisted inverted
  * index. A probe set arrives daily (benchmark decontamination sweeps,
  * capability-probe curation) but the corpus only GROWS by deltas, so
  * re-tokenizing 100 TB per probe is the one scale-killer in the lexical
  * lane; this state pays the corpus pass once at bootstrap and
  * delta-bounded cost thereafter.
  *
  * State tables under `<root>/bm25_state/`:
  *  - `postings` (term, id, dl, tf) BUCKETED BY `term` — the probe's join
  *    key equals the bucket column, so the corpus-scale side plans NO
  *    exchange (the [[ExactJoinState]] discipline); `dl` is denormalized
  *    onto every posting so scoring never needs a doc-side join;
  *  - `stats` — a [[Sketches.counterUpdateState]] additive-counter state
  *    (rows `('docs', N)`, `('tokens', A)`), folded exactly-once per
  *    deltaId: the corpus aggregates BM25 needs, maintained without ever
  *    rescanning the corpus. df needs NO state at all — a term's
  *    postings ARE its document frequency, and the probe only ever
  *    counts postings of its own query vocabulary;
  *  - `_graft_bm25.json` — bucket count.
  *
  * [[appendExactlyOnce]] runs the [[AnnIndex.appendExactlyOnce]]
  * marker + ledger protocol (pending marker {deltaId, filesBefore} →
  * postings append → stats fold → ledger → marker delete): duplicate
  * postings are NOT harmless here (a doc indexed twice doubles its tf
  * and double-counts df), so plain append was not replay-safe. The
  * stats fold rides the counter state's OWN per-deltaId ledger, which is
  * what makes the crash window between postings and ledger repairable:
  * the repair rolls unledgered postings files back and the re-run's
  * stats re-fold no-ops if it already landed. Ledger caps at 64 ids
  * with a lexicographic watermark — callers that may exceed the cap use
  * monotone deltaIds. Doc ids must be disjoint between state and delta
  * (the [[CurateIncremental]] contract).
  *
  * [[probe]] == [[Retrieval.bm25TopK]] over the full indexed corpus,
  * bit-for-bit (same scoring tail, RetrievalSpec property + q158's
  * oracle IS q156's batch SQL over the union): the probe broadcasts the
  * query vocabulary as an `isin` FILTER pushed into the bucketed
  * parquet scan (postings sort by `term` inside each bucket file, so
  * row groups outside the query vocabulary skip on min/max stats), and
  * everything downstream is query-vocabulary-bounded. */
object RetrievalState {

  private def stateDir(root: String) = s"$root/bm25_state"
  private def postingsDir(root: String) = s"${stateDir(root)}/postings"
  private def statsDir(root: String) = s"${stateDir(root)}/stats"
  private def metaPath(root: String) =
    new Path(s"${stateDir(root)}/_graft_bm25.json")
  private def ledgerPath(root: String) =
    new Path(s"${stateDir(root)}/_graft_append_ledger.json")
  private def pendingPath(root: String) =
    new Path(s"${stateDir(root)}/_append_pending.json")
  private val BucketCols = Seq("term")
  private val MaxAppliedIds = 64

  /** (term, id, dl, tf) — one row per (doc, distinct term). Zero-token
    * docs post nothing but still count in the stats (BM25's N and A are
    * corpus totals, exactly like the batch face's 1-row aggregate). */
  private def postingRows(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("ts"))
      .withColumn("dl", size(col("ts")).cast("long"))
      .select(col("id"), col("dl"), explode(col("ts")).as("term"))
      .groupBy("term", "id", "dl")
      .agg(count(lit(1)).as("tf"))

  private def statsDelta(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val agg = docs.agg(
      count(lit(1)).cast("long").as("nd"),
      coalesce(sum(size(TextAnalysis.tokens(col(textCol))).cast("long")),
        lit(0L)).as("nt"))
    agg.select(lit("docs").as("k"), col("nd").as("cnt"))
      .unionByName(agg.select(lit("tokens").as("k"), col("nt").as("cnt")))
  }

  /** Build the state from the current corpus (once; deltas then extend
    * it via [[appendExactlyOnce]]). `buckets = 0` →
    * `spark.sql.shuffle.partitions`. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            root: String, buckets: Int = 0): Unit = {
    val spark = docs.sparkSession
    val n = if (buckets > 0) buckets
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // a RE-build starts the stats and ledger over (the counter state's
    // ledger would otherwise no-op the new bootstrap fold)
    val sd = new Path(statsDir(root))
    hadoopFs(spark, sd).delete(sd, true)
    hadoopFs(spark, ledgerPath(root)).delete(ledgerPath(root), false)
    writeBucketedSnapshot(postingRows(docs, idCol, textCol),
      postingsDir(root), tableName("bmp", postingsDir(root)), n, BucketCols)
    Sketches.counterUpdateState(spark, statsDir(root),
      statsDelta(docs, idCol, textCol), deltaId = "bootstrap")
    writeJsonSidecar(spark, metaPath(root), s"""{"buckets": $n}""")
  }

  /** Is there a persisted BM25 state under `root`? */
  def exists(spark: SparkSession, root: String): Boolean = {
    val p = new Path(stateDir(root))
    hadoopFs(spark, p).exists(p)
  }

  private def load(spark: SparkSession, root: String): (DataFrame, Int) = {
    recoverSwap(hadoopFs(spark, new Path(postingsDir(root))),
      new Path(postingsDir(root)))
    repairPendingAppend(spark, root)
    val body = readJsonSidecar(spark, metaPath(root))
      .getOrElse(sys.error(s"no bm25 state at $root"))
    val n = jsonInt(body, "buckets")
      .getOrElse(sys.error(s"bm25 meta missing buckets: $body"))
    ensureRegistered(spark, postingsDir(root),
      tableName("bmp", postingsDir(root)), n, BucketCols)
    (spark.table(tableName("bmp", postingsDir(root))), n)
  }

  // ---- exactly-once append: the AnnIndex marker + ledger protocol ----

  private def readAppendLedger(spark: SparkSession,
                               root: String): (Set[String], String) =
    readJsonSidecar(spark, ledgerPath(root)) match {
      case None => (Set.empty, "")
      case Some(body) =>
        val applied = """"applied"\s*:\s*\[([^\]]*)\]""".r
          .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
        val ids = """"([^"]+)"""".r.findAllMatchIn(applied)
          .map(_.group(1)).toSet
        val wm = """"watermark"\s*:\s*"([^"]*)"""".r
          .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
        (ids, wm)
    }

  private def writeAppendLedger(spark: SparkSession, root: String,
                                applied: Set[String], wm: String): Unit = {
    val (keep, wm2) =
      if (applied.size <= MaxAppliedIds) (applied, wm)
      else {
        val sorted = applied.toSeq.sorted
        val dropped = sorted.dropRight(MaxAppliedIds)
        (sorted.takeRight(MaxAppliedIds).toSet,
          if (dropped.last > wm) dropped.last else wm)
      }
    writeJsonSidecar(spark, ledgerPath(root),
      s"""{"watermark": "$wm2", "applied": ${keep.toSeq.sorted
        .map(i => s""""$i"""").mkString("[", ",", "]")}}""")
  }

  private def postingFileNames(spark: SparkSession, root: String): Set[String] = {
    val p = new Path(postingsDir(root))
    val fs = hadoopFs(spark, p)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filter(_.startsWith("part-")).toSet
  }

  /** Finish or roll back a crashed [[appendExactlyOnce]]: an UNLEDGERED
    * partial append rolls back (delete files not in the marker); a
    * ledgered one keeps. Safe any time (no-op without a marker). */
  private def repairPendingAppend(spark: SparkSession, root: String): Unit = {
    val mp = pendingPath(root)
    val fs = hadoopFs(spark, mp)
    if (!fs.exists(mp)) return
    val body = readJsonSidecar(spark, mp).getOrElse("")
    val deltaId = """"delta"\s*:\s*"([^"]*)"""".r
      .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
    val before = """"([^"]+)"""".r.findAllMatchIn(
      """"files"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(body)
        .map(_.group(1)).getOrElse("")).map(_.group(1)).toSet
    val (applied, wm) = readAppendLedger(spark, root)
    val ledgered = applied.contains(deltaId) ||
      (wm.nonEmpty && deltaId.nonEmpty && deltaId <= wm)
    if (!ledgered) {
      val pd = new Path(postingsDir(root))
      (postingFileNames(spark, root) -- before)
        .foreach(f => fs.delete(new Path(pd, f), false))
      spark.catalog.refreshByPath(postingsDir(root))
    }
    fs.delete(mp, false)
    ()
  }

  /** Extend the index with a delta, exactly-once per `deltaId` (replay
    * no-ops, crash anywhere repairs on the next call — see object doc).
    * Returns whether the delta landed. */
  def appendExactlyOnce(delta: DataFrame, idCol: String, textCol: String,
                        root: String, deltaId: String,
                        autoCompact: Option[Int] = None): Boolean =
    appendHooked(delta, idCol, textCol, root, deltaId, autoCompact, () => ())

  /** [[appendExactlyOnce]] with a fault-injection point between the
    * postings append and the ledger write — test-only seam. */
  private[graft] def appendHooked(delta: DataFrame, idCol: String,
                                  textCol: String, root: String,
                                  deltaId: String, autoCompact: Option[Int],
                                  beforeLedger: () => Unit): Boolean = {
    require(deltaId.matches("[A-Za-z0-9_-]+"),
      s"deltaId is ledger-pinned and restricted to [A-Za-z0-9_-]: '$deltaId'")
    val spark = delta.sparkSession
    val (_, n) = load(spark, root) // runs recover + pending repair
    val (applied, wm) = readAppendLedger(spark, root)
    if (applied.contains(deltaId) || (wm.nonEmpty && deltaId <= wm))
      return false
    val before = postingFileNames(spark, root)
    writeJsonSidecar(spark, pendingPath(root),
      s"""{"delta": "$deltaId", "files": ${before.toSeq.sorted
        .map(f => s""""$f"""").mkString("[", ",", "]")}}""")
    appendBucketed(postingRows(delta, idCol, textCol),
      postingsDir(root), tableName("bmp", postingsDir(root)), n, BucketCols)
    // idempotent by the counter state's OWN deltaId ledger — the crash
    // window between this fold and the ledger below re-folds as a no-op
    Sketches.counterUpdateState(spark, statsDir(root),
      statsDelta(delta, idCol, textCol), deltaId)
    beforeLedger()
    writeAppendLedger(spark, root, applied + deltaId, wm)
    val fs = hadoopFs(spark, pendingPath(root))
    fs.delete(pendingPath(root), false)
    autoCompact.foreach(t => maybeCompact(spark, root, t))
    true
  }

  /** Top-k docs per query against the PERSISTED index — bit-identical
    * to [[Retrieval.bm25TopK]] over everything indexed so far. The
    * query vocabulary (driver-known-small by the probe contract) pushes
    * into the postings scan as an `isin` filter: bucket files sort by
    * `term`, so parquet min/max stats skip every row group outside it. */
  def probe(queries: DataFrame, qidCol: String, qtextCol: String,
            root: String, k: Int = 10): DataFrame = {
    val spark = queries.sparkSession
    val (postings, _) = load(spark, root)
    val qterms = Retrieval.queryTerms(queries, qidCol, qtextCol)
    val vocab = qterms.select("term").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val counters = Sketches.readState(spark, statsDir(root))
    val stats = counters.agg(
      coalesce(max(when(col("k") === "docs", col("cnt"))), lit(0L)).as("__n"),
      coalesce(max(when(col("k") === "tokens", col("cnt"))), lit(0L)).as("__a"))
    val qpost = postings.filter(col("term").isin(vocab: _*))
      .select(col("id"), col("dl").as("__dl"), col("term"), col("tf"))
    Retrieval.rankMatches(qpost, "id", qterms, qidCol, stats, k)
  }

  /** Fold multi-file buckets back to one file per bucket; postings are
    * row-identical before and after. */
  def compact(spark: SparkSession, root: String): Unit = {
    val (_, n) = load(spark, root)
    writeBucketedSnapshot(spark.read.parquet(postingsDir(root)),
      postingsDir(root), tableName("bmp", postingsDir(root)), n, BucketCols)
  }

  /** Files-per-bucket in the postings dir — ≈ appends-since-compaction+1. */
  def filesPerBucket(spark: SparkSession, root: String): Double =
    if (!exists(spark, root)) 0.0
    else {
      val body = readJsonSidecar(spark, metaPath(root)).getOrElse(return 0.0)
      val n = jsonInt(body, "buckets").getOrElse(return 0.0)
      partFileCount(spark, postingsDir(root)).toDouble / n
    }

  /** Opt-in hands-off compaction ([[AnnIndex.maybeCompact]]'s policy):
    * [[compact]] when the postings exceed `maxFilesPerBucket` files per
    * bucket. Returns whether it ran. */
  def maybeCompact(spark: SparkSession, root: String,
                   maxFilesPerBucket: Int): Boolean = {
    require(maxFilesPerBucket >= 1,
      s"maxFilesPerBucket must be >= 1 (got $maxFilesPerBucket)")
    val over = filesPerBucket(spark, root) > maxFilesPerBucket
    if (over) compact(spark, root)
    over
  }
}
