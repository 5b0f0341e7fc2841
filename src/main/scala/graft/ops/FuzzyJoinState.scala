package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import BucketedTables._

/** Incremental face of the FUZZY edit-distance join (VERDICT r14 #3):
  * [[FuzzyJoin.editSelfJoin]] is batch-only, so an alias arriving a day
  * after its original never matched across the state boundary (the
  * exact-Jaccard index cannot see edit-distance pairs). This state
  * persists the corpus's rarest-first padded q-gram PREFIX index and
  * its strings in the [[ExactJoinState]] bucketed-state discipline, so
  * a daily delta finds every pair within `maxDist` it participates in
  * WITHOUT re-gramming the corpus.
  *
  * State tables under `<root>/fuzzy_state/`:
  *  - `prefix` (ge, id, len) — each indexed string's `maxDist·q+1`
  *    rarest gram-occurrence ELEMENTS (the ED-Join prefix), where
  *    `ge = gram ++ occurrence-number` (grams are exactly q chars, so
  *    the concatenation is unambiguous): multiset gram intersection is
  *    set intersection of elements, and folding the occurrence INTO
  *    the key keeps the probe join on ONE column that equals the
  *    bucket column exactly — a (gram, j) two-column join key would
  *    disable the bucketed scan (the r14 subset-key finding; a
  *    residual `j = j_d` filter doesn't survive either, Catalyst
  *    re-extracts it into the join keys). BUCKETED BY `ge`;
  *  - `strings` (id, str, len) — the indexed strings, BUCKETED BY `id`:
  *    the confirm joins candidates on `id` (the bucket column) and the
  *    codegen'd `levenshtein` runs against the delta string riding the
  *    candidate row. Exactly-once (an id anti-join on the same bucket
  *    hash guards appends) because a duplicated string row WOULD
  *    duplicate confirmed pairs;
  *  - `_graft_fuzzy.json` — bucket count + the state's (maxDist, q):
  *    a prefix index is only lossless for distances ≤ the one it was
  *    built with, so probe and build are pinned together.
  *
  * Losslessness across index generations — the [[ExactJoinState]]
  * argument, rephrased for edit distance: one edit destroys at most q
  * padded grams, so strings within distance k share (as (gram, j)
  * sets) all but at most k·q of the STATE string's |s|+q−1 elements.
  * ANY choice of k·q+1 of its elements therefore intersects the shared
  * set (pigeonhole), and the probe joins the state's prefix CHOICE
  * against the delta's FULL element rows — recall cannot depend on how
  * the rarity order drifts between the build corpus and later appends
  * (each append ranks its own delta; rarity only tunes selectivity).
  *
  * Strings too short for gram signal (`len ≤ maxDist·q − q + 1`) and
  * the mixed short↔long window route through
  * [[FuzzyJoin.lengthWindowJoin]] directly against the state's SHORT
  * slice — the one state-side exchange in this lane, bounded by
  * construction to strings of ≤ `maxDist·q − q + 1 + maxDist`
  * characters (at the q=2, k=1 default: 1-to-2-char strings), never
  * corpus-scale text.
  *
  * Probe output = every pair within `maxDist` INVOLVING the delta
  * (delta↔state via the persisted index + delta↔delta via
  * [[FuzzyJoin.editSelfJoin]]), normalized to `id_a < id_b` — so
  * `editSelfJoin(state) ∪ probe(delta)` equals a full
  * `editSelfJoin(state ∪ delta)` recompute (FuzzyJoinSpec property).
  * Ids must be disjoint between state and delta. [[append]] is
  * idempotent (the string anti-join); its crash window mirrors
  * [[ExactJoinState.appendHooked]]: strings exactly-once, duplicate
  * PREFIX rows harmless (candidates are `distinct()`-ed), repair via
  * the `_append_pending` marker re-prefixing the whole delta. */
object FuzzyJoinState {

  private def stateDir(root: String) = s"$root/fuzzy_state"
  private def prefixDir(root: String) = s"${stateDir(root)}/prefix"
  private def strsDir(root: String) = s"${stateDir(root)}/strings"
  private def metaPath(root: String) = new Path(s"${stateDir(root)}/_graft_fuzzy.json")
  private def pendingPath(root: String) = new Path(s"${stateDir(root)}/_append_pending")
  private def removeMarker(root: String) = new Path(s"${stateDir(root)}/_remove_pending")

  private val PrefixBucketCols = Seq("ge")
  private val StrsBucketCols = Seq("id")

  /** (ge, id, len) element rows from (gram, j, id, len) ones — the
    * fixed-width gram makes `gram ++ j` collision-free. */
  private def elemKeyed(elems: DataFrame): DataFrame =
    elems.select(concat(col("gram"), col("j").cast("string")).as("ge"),
      col("id"), col("len"))

  /** (id, str, len) rows — null strings drop (they never pair: a null
    * levenshtein is null, exactly [[FuzzyJoin.editSelfJoin]]'s
    * behavior). */
  private def stringRows(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(strCol).as("str"),
      length(col(strCol)).as("len")).filter(col("len").isNotNull)

  /** Rarest-first prefix elements (ge, id, len) of the frame's own
    * gram-element rows — order-agnostic lossless, see the object doc. */
  private def prefixOf(elems: DataFrame, maxDist: Int, q: Int): DataFrame = {
    val dfTable = elems.groupBy("gram").agg(count(lit(1)).as("gdf"))
    elemKeyed(elems.join(broadcast(dfTable), "gram")
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy("gdf", "gram", "j")))
      .filter(col("rk") <= maxDist * q + 1)
      .select("gram", "j", "id", "len"))
  }

  /** Build the state from the current corpus (once; deltas then extend
    * it via [[append]]). `buckets = 0` → `spark.sql.shuffle.partitions`. */
  def build(df: DataFrame, idCol: String, strCol: String, maxDist: Int,
            q: Int = 2, root: String, buckets: Int = 0): Unit = {
    require(maxDist >= 1, s"maxDist must be >= 1 (got $maxDist — use exact dedup at 0)")
    require(q >= 2, s"q must be >= 2 (got $q)")
    val spark = df.sparkSession
    val n = if (buckets > 0) buckets
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val shortLen = maxDist * q - q + 1
    val pref = prefixOf(
      FuzzyJoin.gramElems(df.filter(length(col(strCol)) > shortLen),
        idCol, strCol, q), maxDist, q)
    writeBucketedSnapshot(pref, prefixDir(root),
      tableName("fzp", prefixDir(root)), n, PrefixBucketCols)
    writeBucketedSnapshot(stringRows(df, idCol, strCol), strsDir(root),
      tableName("fzs", strsDir(root)), n, StrsBucketCols)
    writeJsonSidecar(spark, metaPath(root),
      s"""{"buckets": $n, "maxDist": $maxDist, "q": $q}""")
  }

  private def load(spark: SparkSession, root: String)
      : (DataFrame, DataFrame, Int, Int, Int) = {
    recoverSwap(hadoopFs(spark, new Path(prefixDir(root))), new Path(prefixDir(root)))
    recoverSwap(hadoopFs(spark, new Path(strsDir(root))), new Path(strsDir(root)))
    repairPendingRemove(spark, root)
    val body = readJsonSidecar(spark, metaPath(root))
      .getOrElse(sys.error(s"no fuzzy-join state at $root"))
    val n = jsonInt(body, "buckets")
      .getOrElse(sys.error(s"fuzzy meta missing buckets: $body"))
    val k = jsonInt(body, "maxDist")
      .getOrElse(sys.error(s"fuzzy meta missing maxDist: $body"))
    val q = jsonInt(body, "q").getOrElse(sys.error(s"fuzzy meta missing q: $body"))
    ensureRegistered(spark, prefixDir(root),
      tableName("fzp", prefixDir(root)), n, PrefixBucketCols)
    ensureRegistered(spark, strsDir(root),
      tableName("fzs", strsDir(root)), n, StrsBucketCols)
    (spark.table(tableName("fzp", prefixDir(root))),
      spark.table(tableName("fzs", strsDir(root))), n, k, q)
  }

  /** Every pair within the state's `maxDist` involving the delta:
    * delta↔state through the persisted prefix index plus delta↔delta in
    * full. Returns (id_a, id_b, dist) with `id_a < id_b`. */
  def probe(delta: DataFrame, idCol: String, strCol: String,
            root: String): DataFrame = {
    val spark = delta.sparkSession
    val (pref, strs, _, k, q) = load(spark, root)
    val dd = FuzzyJoin.editSelfJoin(delta, idCol, strCol, k, q)
    val shortLen = k * q - q + 1
    val dStr = stringRows(delta, idCol, strCol)
    // gram lane: state PREFIX elements ⋈ delta FULL gram elements on
    // `ge` — the bucket column exactly, zero state-side exchange; the
    // length filter rides as a non-equi join residual
    val dElems = elemKeyed(FuzzyJoin.gramElems(
        delta.filter(length(col(strCol)) > shortLen), idCol, strCol, q))
      .withColumnsRenamed(Map("id" -> "id_d", "len" -> "len_d"))
    val cand = pref
      .withColumnsRenamed(Map("id" -> "id_s", "len" -> "len_s"))
      .join(dElems, Seq("ge"))
      .filter(abs(col("len_s") - col("len_d")) <= k)
      .select("id_s", "id_d").distinct()
    // confirm: candidates join the id-bucketed strings on the bucket
    // column; the delta string rides the candidate row into the
    // codegen'd levenshtein
    val confirmed = cand
      .join(dStr.select(col("id").as("id_d"), col("str").as("str_d")), "id_d")
      .join(strs.select(col("id").as("id_s"), col("str").as("str_s")), Seq("id_s"))
      .select(col("id_s"), col("id_d"),
        levenshtein(col("str_s"), col("str_d")).as("dist"))
      .filter(col("dist") <= k)
    // short/mixed lanes: no gram signal below the count bound — meet the
    // state's SHORT slice (strings of ≤ shortLen + k chars, bounded by
    // construction) through the salted length-window equi-join
    val sShort = strs.filter(col("len") <= shortLen + k)
      .select(col("id").as("id_s"), col("str").as("str_s"), col("len").as("len_s"))
    val dWin = dStr
      .select(col("id").as("id_a"), col("str").as("str_a"), col("len").as("len_a"))
    val salt = FuzzyJoin.saltFor(
      strs.filter(col("len") <= shortLen + k).count())
    def winPairs(a: DataFrame, b: DataFrame): DataFrame =
      FuzzyJoin.lengthWindowJoin(a,
          b.withColumnsRenamed(Map("id_s" -> "id_b", "str_s" -> "str_b",
            "len_s" -> "len_b")), k, salt)
        .select(col("id_b").as("id_s"), col("id_a").as("id_d"),
          levenshtein(col("str_b"), col("str_a")).as("dist"))
        .filter(col("dist") <= k)
    val shortMixed = winPairs(dWin.filter(col("len_a") <= shortLen),
        sShort.filter(col("len_s") <= shortLen + k))
      .unionByName(winPairs(
        dWin.filter(col("len_a") > shortLen && col("len_a") <= shortLen + k),
        sShort.filter(col("len_s") <= shortLen)))
    val cross = confirmed.unionByName(shortMixed)
      .select(least(col("id_s"), col("id_d")).as("id_a"),
        greatest(col("id_s"), col("id_d")).as("id_b"), col("dist"))
      .distinct() // the short and mixed windows can meet a pair twice
    dd.unionByName(cross)
  }

  def append(delta: DataFrame, idCol: String, strCol: String,
             root: String): Unit =
    appendHooked(delta, idCol, strCol, root, () => ())

  /** [[append]] with a fault-injection point between the string and
    * prefix writes — the [[ExactJoinState.appendHooked]] contract:
    * strings exactly-once through the id-bucketed anti-join (zero
    * state-side exchange), prefix repair via the `_append_pending`
    * marker (duplicate prefix rows harmless — candidates are
    * distinct-ed and the confirm reads the exactly-once strings). */
  private[graft] def appendHooked(delta: DataFrame, idCol: String,
                                  strCol: String, root: String,
                                  betweenWrites: () => Unit): Unit = {
    val spark = delta.sparkSession
    val (_, strs, n, k, q) = load(spark, root)
    val shortLen = k * q - q + 1
    val fs = hadoopFs(spark, pendingPath(root))
    val repair = fs.exists(pendingPath(root))
    fs.create(pendingPath(root), true).close()
    val allDf = stringRows(delta, idCol, strCol)
    val allRdd = allDf.rdd
    Lineage.mark(allRdd, spark)
    val allPinned = spark.createDataFrame(allRdd, allDf.schema)
    val freshDf = allPinned.join(strs.select(col("id")).distinct(),
      Seq("id"), "left_anti")
    val freshRdd = freshDf.rdd
    Lineage.mark(freshRdd, spark)
    freshRdd.count() // materialize BEFORE the write mutates its input
    val freshPinned = spark.createDataFrame(freshRdd, freshDf.schema)
    try {
      appendBucketed(freshPinned,
        strsDir(root), tableName("fzs", strsDir(root)), n, StrsBucketCols)
      betweenWrites()
      val src = if (repair) allPinned else freshPinned
      appendBucketed(
        prefixOf(FuzzyJoin.gramElems(src.filter(col("len") > shortLen),
          "id", "str", q), k, q),
        prefixDir(root), tableName("fzp", prefixDir(root)), n, PrefixBucketCols)
      fs.delete(pendingPath(root), false)
      ()
    } finally {
      allRdd.unpersist(blocking = false)
      freshRdd.unpersist(blocking = false); ()
    }
  }

  /** Is there a persisted fuzzy-join state under `root`? */
  def exists(spark: SparkSession, root: String): Boolean = {
    val p = new Path(stateDir(root))
    hadoopFs(spark, p).exists(p)
  }

  /** Remove every string/prefix row of `del` (a one-column `__del_id`
    * frame) — marker-recovered like [[ExactJoinState.remove]]: a crash
    * between the sweeps is finished by the next load. */
  def remove(del: DataFrame, root: String): Unit =
    removeHooked(del, root, () => ())

  private[graft] def removeHooked(del: DataFrame, root: String,
                                  betweenSweeps: () => Unit): Unit = {
    val spark = del.sparkSession
    val (pref, strs, n, _, _) = load(spark, root)
    val fs = hadoopFs(spark, removeMarker(root))
    val tmp = new Path(removeMarker(root).toString + ".tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    del.select(col("__del_id")).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(removeMarker(root))) fs.delete(removeMarker(root), true)
    if (!fs.rename(tmp, removeMarker(root)))
      sys.error(s"fuzzy remove marker rename failed at $root")
    completeRemove(spark, root, n, betweenSweeps)
    val _ = (pref, strs) // force load before the path-based sweeps
  }

  private def completeRemove(spark: SparkSession, root: String, n: Int,
                             betweenSweeps: () => Unit = () => ()): Unit = {
    val fs = hadoopFs(spark, removeMarker(root))
    val del = spark.read.parquet(removeMarker(root).toString)
    def sweep(df: DataFrame) =
      df.join(del, df("id") === col("__del_id"), "left_anti")
    // strings first: the content-bearing table
    writeBucketedSnapshot(sweep(spark.read.parquet(strsDir(root))),
      strsDir(root), tableName("fzs", strsDir(root)), n, StrsBucketCols)
    betweenSweeps()
    writeBucketedSnapshot(sweep(spark.read.parquet(prefixDir(root))),
      prefixDir(root), tableName("fzp", prefixDir(root)), n, PrefixBucketCols)
    fs.delete(removeMarker(root), true)
    ()
  }

  private def repairPendingRemove(spark: SparkSession, root: String): Unit = {
    val fs = hadoopFs(spark, removeMarker(root))
    if (fs.exists(removeMarker(root))) {
      val body = readJsonSidecar(spark, metaPath(root))
        .getOrElse(sys.error(s"no fuzzy-join state at $root"))
      val n = jsonInt(body, "buckets")
        .getOrElse(sys.error(s"fuzzy meta missing buckets: $body"))
      completeRemove(spark, root, n)
    }
  }

  /** Rewrite both tables back to one file per bucket; the prefix
    * rewrite folds away crash-repair duplicates. */
  def compact(spark: SparkSession, root: String): Unit = {
    val (_, _, n, _, _) = load(spark, root)
    writeBucketedSnapshot(spark.read.parquet(prefixDir(root)).distinct(),
      prefixDir(root), tableName("fzp", prefixDir(root)), n, PrefixBucketCols)
    writeBucketedSnapshot(spark.read.parquet(strsDir(root)),
      strsDir(root), tableName("fzs", strsDir(root)), n, StrsBucketCols)
  }

  /** Max files-per-bucket across the two tables — feeds the caller's
    * auto-compaction policy. 0.0 when the state is absent. */
  def filesPerBucket(spark: SparkSession, root: String): Double =
    if (!exists(spark, root)) 0.0
    else {
      val body = readJsonSidecar(spark, metaPath(root)).getOrElse(return 0.0)
      val n = jsonInt(body, "buckets").getOrElse(return 0.0)
      val counts = Seq(prefixDir(root), strsDir(root))
        .map(d => partFileCount(spark, d)).filter(_ > 0)
      if (counts.isEmpty) 0.0 else counts.max.toDouble / n
    }

  /** Opt-in hands-off compaction ([[AnnIndex.maybeCompact]]'s policy on
    * this state): [[compact]] when either table exceeds
    * `maxFilesPerBucket` files per bucket. Returns whether it ran. */
  def maybeCompact(spark: SparkSession, root: String,
                   maxFilesPerBucket: Int): Boolean = {
    require(maxFilesPerBucket >= 1,
      s"maxFilesPerBucket must be >= 1 (got $maxFilesPerBucket)")
    val over = filesPerBucket(spark, root) > maxFilesPerBucket
    if (over) compact(spark, root)
    over
  }

  /** Roll half-finished swaps forward and finish a half-done removal. */
  def recover(spark: SparkSession, root: String): Unit = {
    for (d <- Seq(prefixDir(root), strsDir(root)))
      recoverSwap(hadoopFs(spark, new Path(d)), new Path(d))
    repairPendingRemove(spark, root)
  }
}
