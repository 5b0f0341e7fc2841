package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * Everything here derives from content hashes, never `rand()`: the same
  * row lands in the same split on every run, at every partition count, in
  * every engine — the reproducibility contract a 100 TB training corpus
  * needs (re-running a backfill must not shuffle documents across
  * train/val/test).
  *
  * 100 TB posture: all pure map-side Column expressions — no shuffle, no
  * state, no driver round-trips; codegen'd md5 + arithmetic per row.
  */
object Sampling {

  /** Value of one lowercase hex digit (portable: ASCII arithmetic only). */
  private def hexDigitVal(c: Column): Column =
    when(ascii(c) <= 57, ascii(c) - 48).otherwise(ascii(c) - 87)

  /** Stable bucket ∈ [0, 256): the first two hex digits of md5(key).
    * Cross-engine reproducible (md5 hex is bit-identical everywhere). */
  def hashBucket(key: Column): Column = {
    val h = md5(key.cast("string"))
    hexDigitVal(substring(h, 1, 1)) * 16 + hexDigitVal(substring(h, 2, 1))
  }

  /** The split lanes' purpose salt — appended to the key as
    * `"<key>|graft-split"` before hashing, so split assignment is
    * statistically INDEPENDENT of every sampler's keep test (review
    * r12: the samplers hash the UNsalted key and keep LOW buckets, so
    * an unsalted split was perfectly correlated with survival — any
    * source down-sampled below trainPct/100 kept only bucket < cut
    * rows and lost ALL val/test representation). SQL users replicate
    * the lane as `graft_bucket(concat(key, '|graft-split'))`. */
  val SplitSalt = "graft-split"

  private def splitBucket(key: Column): Column =
    hashBucket(concat(key.cast("string"), lit("|" + SplitSalt)))

  /** Deterministic train/val/test assignment by hash bucket. Cut points
    * are integer bucket counts (256×pct/100, floor), so the realized
    * fractions are exact and documented: 80/10/10 → 204/26/26 buckets.
    * The bucket rides the [[SplitSalt]]-salted lane (independent of all
    * sampling decisions). A NULL key has no stable identity — it is
    * routed to `train`, never the eval splits (review r12: it used to
    * fall through to `test`, concentrating null-id rows in the eval
    * set). */
  def splitAssign(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = splitBucket(key)
    val trainCut = 256 * trainPct / 100
    val valCut = 256 * (trainPct + valPct) / 100
    when(key.isNull, "train")
      .when(b < trainCut, "train").when(b < valCut, "val").otherwise("test")
  }

  /** Deterministic fraction-sample: keep rows whose bucket falls under
    * `256×fraction` — the hash-derived analog of `df.sample` that is
    * stable across runs and engines. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"invalid fraction $fraction")
    // clamp to one bucket like temperatureSample (review r12): a legal
    // fraction below 1/256 floored to cut 0 and silently emptied the
    // result; the 256-lane grid's floor resolution is 1/256
    df.filter(hashBucket(col(keyCol)) < math.max((256 * fraction).toInt, 1))
  }

  /** Deterministic per-group volume cap: keep at most `k` rows per group,
    * chosen by md5-hash rank (ties broken by key) — a seedless,
    * partition-count-independent "uniform" pick of k that reproduces in
    * any engine, unlike reservoir sampling (order-dependent) or
    * `rand()`-ranked rows. The per-source cap step of mixture
    * construction: an over-represented domain is clipped to a budget
    * BEFORE fraction tuning. One window shuffle keyed on the group; rows
    * beyond rank k are dropped group-locally (WindowGroupLimit), so the
    * post-filter volume, not the input, bounds what survives the window. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int): DataFrame = {
    require(k > 0, s"cap must be positive (got $k)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Stratified train/val/test split with per-group floors: within each
    * group (language, domain), rows are ranked by md5(key) and the first
    * `max(⌊n·valPct∕100⌋, minVal)` go to val, the next
    * `max(⌊n·testPct∕100⌋, minTest)` to test, the rest to train — so a
    * low-resource group ALWAYS fields an eval set, which the global
    * hash-bucket [[splitAssign]] cannot promise (a 30-doc language has a
    * ~4% chance of zero val docs at 10%). Tiny-group degradation is
    * explicit: val takes its floor first, test takes what remains, train
    * may be empty. Exact integer arithmetic (`div`), md5 rank with key
    * tie-break — reproducible at any partitioning, in any engine.
    *
    * 100 TB posture: ONE window shuffle keyed on the group (rank and
    * group-count ride the same exchange); no second pass, no driver
    * counts. Like [[splitAssign]], run dedup first — and note the
    * assignment is a function of the GROUP'S membership, not the row
    * alone: appending rows to a group can reassign that group's existing
    * rows (use splitAssign when per-row stability under appends matters
    * more than per-group floors). */
  def stratifiedSplit(df: DataFrame, keyCol: String, groupCol: String,
                      trainPct: Int = 80, valPct: Int = 10,
                      minVal: Int = 1, minTest: Int = 1): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    require(minVal >= 0 && minTest >= 0,
      s"invalid floors: minVal=$minVal minTest=$minTest")
    val testPct = 100 - trainPct - valPct
    // rank on the SplitSalt lane too: the eval floors must not
    // preferentially pick rows a sampler's unsalted hash already favored
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit("|" + SplitSalt))).asc,
        col(keyCol).asc)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.withColumn("__r", row_number().over(w) - 1)
      .withColumn("__n", count(lit(1)).over(cw))
      .withColumn("__nval",
        least(greatest(expr(s"(__n * $valPct) div 100"), lit(minVal.toLong)),
          col("__n")))
      .withColumn("__ntest",
        least(greatest(expr(s"(__n * $testPct) div 100"), lit(minTest.toLong)),
          col("__n") - col("__nval")))
      .withColumn("split",
        when(col("__r") < col("__nval"), "val")
          .when(col("__r") < col("__nval") + col("__ntest"), "test")
          .otherwise("train"))
      .drop("__r", "__n", "__nval", "__ntest")
  }

  /** Split-integrity check: content-duplicate groups that straddle split
    * boundaries — the train/test leakage a by-ID split silently creates
    * whenever the same content survives under several ids (the reason
    * curation runs dedup BEFORE [[splitAssign]]). One fingerprint-keyed
    * partial+final aggregate; an empty result is the pass condition, so a
    * pipeline gates on `splitLeakage(...).isEmpty`. Returns one row per
    * leaking group: (content_key, nb_docs, nb_splits, min_id). */
  def splitLeakage(df: DataFrame, textCol: String, idCol: String,
                   splitCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("content_key"))
      .agg(
        count(lit(1)).as("nb_docs"),
        count_distinct(col(splitCol)).as("nb_splits"),
        min(col(idCol)).as("min_id"))
      .filter(col("nb_docs") > 1 && col("nb_splits") > 1)

  /** Deterministic corpus shuffle + sharding — the terminal "shuffle and
    * shard" step that fixes a training-data read order: every row gets a
    * shard ∈ [0, nShards) and a dense position within its shard, both
    * derived from md5(key) so the permutation is reproducible across
    * runs, engines, and input partitionings (re-running a backfill must
    * not reorder the corpus a trainer already consumed).
    *
    * 100 TB posture: ONE shuffle, keyed on the shard column; the
    * within-shard position is a per-shard `row_number` window, so shard
    * count is the scale lever — size it to the output-file target
    * (e.g. ~100k shards of ~1 GB at 100 TB) and each window partition
    * stays file-sized. Shard spread uses 16 bits of the hash (65,536
    * lanes), so shard populations stay even up to that shard count. */
  def shuffleShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0 && nShards <= 65536,
      s"nShards must be in [1, 65536] (got $nShards)")
    val h = md5(col(keyCol).cast("string"))
    // first 4 hex digits → [0, 65536): the same digit arithmetic as
    // hashBucket, widened (portable — no engine-specific hex parsing)
    val h16 = (0 until 4).map(i =>
      hexDigitVal(substring(h, i + 1, 1)) * (1 << (4 * (3 - i)))).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("shard", pmod(h16, lit(nShards)))
      .withColumn("pos", row_number().over(w) - 1)
  }

  /** Temperature-balanced mixture (α = 1/2): per-source keep fraction
    * f_s = √(c_min / c_s), where c_s is the source's observed row count —
    * the standard temperature-resampling rule used to flatten skewed
    * multilingual / multi-domain mixtures (sampling share ∝ c_s^α): the
    * rarest source keeps everything, a source 100× larger keeps 10%.
    * α is pinned to 1/2 because √ and ÷ are the IEEE correctly-rounded
    * operations — f_s is bit-identical in every engine, which a general
    * pow(α) cannot promise; the keep test then floors 256·f onto the
    * [[hashBucket]] grid, inheriting its determinism.
    *
    * NULL-source policy (explicit): rows with a NULL source carry no
    * provenance to balance on, so they are EXCLUDED — from the count/min
    * frames (a tiny NULL group must never set c_min and shrink every real
    * source's cut) and from the output (the null-unsafe inner join would
    * have dropped them silently; the upstream filter makes that the
    * documented contract). Callers that want NULL rows kept tag them with
    * a sentinel source first.
    *
    * Floor clamp: the 256-lane grid floors 256·√(c_min/c_s) to 0 once
    * c_s > 65536·c_min, which would drop a dominant source ENTIRELY —
    * the opposite of what temperature balancing promises (it should keep
    * ~√(c_min·c_s) rows). The cut is clamped to ≥ 1 so a source past the
    * grid's resolution degrades to its floor fraction (1/256) instead of
    * vanishing; the bias is conservative (keeps slightly more of the
    * heaviest sources than the exact rule) and disappears below the
    * 65536× skew point.
    *
    * 100 TB posture: one partial+final count aggregate (rows = number of
    * sources, not corpus rows) broadcast back onto the corpus; the keep
    * filter itself is map-side — no corpus-scale shuffle anywhere. */
  def temperatureSample(df: DataFrame, keyCol: String, sourceCol: String): DataFrame = {
    val counts = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("__c"))
    // global min as a broadcast 1-row cross join — the frames here are
    // dimension-sized (one row per source), never corpus-sized
    val minC = counts.agg(min(col("__c")).as("__cmin"))
    val cuts = counts.crossJoin(broadcast(minC))
      .withColumn("__cut",
        greatest(
          floor(lit(256) * sqrt(col("__cmin").cast("double") / col("__c").cast("double"))),
          lit(1L)))
      .select(col(sourceCol), col("__cut"))
    df.join(broadcast(cuts), Seq(sourceCol))
      .filter(hashBucket(col(keyCol)) < col("__cut"))
      .drop("__cut")
  }

  /** Deterministic per-source mixture sampling: each row keeps or drops by
    * its hash bucket against its source's fraction — how a training mix
    * downsamples over-represented domains. The per-source cut is a chained
    * CASE (linear expression, map-side); unknown sources fall back to
    * `defaultFraction`. */
  def mixtureSample(df: DataFrame, keyCol: String, sourceCol: String,
                    fractions: Map[String, Double],
                    defaultFraction: Double = 1.0): DataFrame = {
    // fraction 0 means DROP the source; any POSITIVE fraction clamps to
    // at least one bucket (review r12: 0 < f < 1/256 floored to cut 0
    // and silently emptied the source instead of degrading to 1/256)
    def cutOf(f: Double): Int = if (f <= 0) 0 else math.max((256 * f).toInt, 1)
    val cut = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(cutOf(defaultFraction))) { case (acc, (src, f)) =>
        when(col(sourceCol) === src, lit(cutOf(f))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < cut)
  }

  /** Mixture construction WITH REPETITION: replicate or subsample each
    * source so its share of the output token mass matches a target weight —
    * the "epochs over each subset" treatment of heterogeneous training
    * corpora (a rare high-value source is seen several times per pass, a
    * dominant crawl less than once). [[mixtureSample]] / [[temperatureSample]]
    * can only DROP rows; this is the missing upsampling half.
    *
    * Per source s with observed token mass T_s and target share w_s
    * (weights are normalized over the sources PRESENT, so the output total
    * stays ≈ the corpus total unless `totalBudget` overrides it):
    * epochs e_s = (w_s/Σw × budget) / T_s. Every row of s is emitted
    * ⌊e_s⌋ times, plus once more iff its [[hashBucket]] falls under the
    * 256-lane floor of the fractional part — so realized mass converges to
    * the target per-source (hash-uniform over rows) and the SAME rows are
    * replicated on every run, engine-independently. Rows get an `epoch`
    * index ∈ [0, copies): downstream shuffle-sharding spreads copies apart
    * ([[shuffleShard]] keyed on a concat of (id, epoch) — the composed
    * permutation is itself tested partition-stable). A source with w_s = 0 (or
    * absent from `weights`) is dropped; NULL sources are excluded under
    * the same contract as [[temperatureSample]].
    *
    * Determinism note: e_s is one IEEE division of exact integers; the
    * fractional cut is ⌊256·(e − ⌊e⌋)⌋ — multiply/subtract/floor are all
    * correctly rounded, so both engines compute identical cuts.
    *
    * 100 TB posture: one dimension-sized partial+final aggregate (rows =
    * sources) broadcast back; replication is a map-side
    * `explode(sequence)` — no corpus-scale shuffle, output volume is
    * budget-bound by construction. `maxEpochs` caps the blow-up a typo'd
    * weight could cause (a 10⁶× replication request is a config bug, not
    * a plan). */
  def epochMixture(df: DataFrame, keyCol: String, sourceCol: String,
                   tokCol: String, weights: Map[String, Double],
                   totalBudget: Option[Long] = None,
                   maxEpochs: Int = 100): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0),
      "weights must be non-negative")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1 (got $maxEpochs)")
    require(weights.values.sum > 0.0, "at least one weight must be positive")
    val masses = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(sum(col(tokCol).cast("long")).as("__t"))
      .filter(col("__t") > 0)
    // Normalize over the sources PRESENT — the documented contract
    // (review r12: dividing by the full map's Σw undershot the budget
    // whenever a weighted source was absent or had zero token mass).
    // Presence is resolved with ONE dimension-sized driver action so the
    // normalizer stays a DETERMINISTIC Scala fold over the sorted map —
    // an in-plan double sum over a weights frame would be
    // partition-order-dependent, breaking the bit-identical-cuts
    // contract the oracle hash relies on.
    val present = masses.select(col(sourceCol).cast("string"))
      .collect().map(_.getString(0)).toSet
    val wPresent = weights.toSeq.sortBy(_._1)
      .filter { case (s, w) => w > 0.0 && present.contains(s) }
    require(wPresent.nonEmpty,
      "no positively-weighted source present in the corpus " +
        s"(weights over ${weights.keySet.toSeq.sorted.mkString(",")}; " +
        s"present: ${present.toSeq.sorted.mkString(",")})")
    val wSum = wPresent.foldLeft(0.0) { case (acc, (_, w)) => acc + w }
    val wExpr = wPresent.foldLeft(lit(0.0)) {
      case (acc, (src, w)) =>
        when(col(sourceCol) === src, lit(w / wSum)).otherwise(acc)
    }
    // budget: caller-pinned, else the observed corpus total (output mass
    // then ≈ input mass, reshaped to the weights). Lazy 1-row broadcast
    // cross join, same shape as temperatureSample's min.
    val budgetFrame = totalBudget match {
      case Some(b) => masses.sparkSession.range(1).select(lit(b).as("__b"))
      case None    => masses.agg(sum(col("__t")).as("__b"))
    }
    val plan = masses.crossJoin(broadcast(budgetFrame))
      .withColumn("__e",
        least(wExpr * col("__b").cast("double") / col("__t").cast("double"),
          lit(maxEpochs.toDouble)))
      .withColumn("__full", floor(col("__e")))
      .withColumn("__cut", floor(lit(256) * (col("__e") - col("__full"))))
      .select(col(sourceCol), col("__full"), col("__cut"))
    df.join(broadcast(plan), Seq(sourceCol))
      .withColumn("__copies",
        col("__full") + when(hashBucket(col(keyCol)) < col("__cut"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__full", "__cut", "__copies")
  }

  /** Terminal training-shard writer: materialize [[shuffleShard]]'s
    * deterministic read order as one pos-ordered parquet file per
    * `shard=N` directory plus an order-digest manifest — the layout a
    * trainer's data loader consumes (open shard k, read rows in file
    * order) and the artifact a re-run must reproduce byte-for-byte.
    *
    * Plan shape: the per-shard window already hash-partitions on `shard`,
    * so every shard's rows sit WHOLE inside one task;
    * `sortWithinPartitions(shard, pos)` orders them without a new
    * exchange (it also satisfies the partitioned write's required
    * ordering, so the writer adds no sort of its own) and the
    * `partitionBy(shard)` write emits exactly one file per shard — ONE
    * shuffle end-to-end, the same single exchange [[shuffleShard]] plans.
    *
    * Returns the manifest (shard, nb_rows, order_digest) — order_digest
    * is md5 over the comma-joined keys in pos order, the cheap equality
    * witness for "the trainer will read the same corpus in the same
    * order as last run"; it is also written to `<path>/_graft_manifest`
    * so the check needs no recompute. Shard count is the scale lever
    * (see [[shuffleShard]]); at 100 TB size it to the output-file target
    * and each task streams one file. */
  def writeTrainingShards(df: DataFrame, keyCol: String, nShards: Int,
                          path: String): DataFrame = {
    // persist the sharded frame: the parquet write and the manifest
    // aggregate both consume it, and without the pin the md5 hashing +
    // shard shuffle + per-shard window — the most expensive pass — ran
    // end-to-end TWICE (review r12)
    val sharded = shuffleShard(df, keyCol, nShards)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sharded.sortWithinPartitions(col("shard"), col("pos"))
        .write.partitionBy("shard").mode("overwrite").parquet(path)
      val manifest = sharded
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("nb_rows"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col(keyCol).cast("string").as("k")))),
            s => s.getField("k")), ",")).as("order_digest"))
      manifest.coalesce(1).sortWithinPartitions("shard")
        .write.mode("overwrite").json(s"$path/_graft_manifest")
      // pin the shard-count-sized manifest before releasing the corpus
      // cache, so the RETURNED frame doesn't recompute the whole pass
      Lineage.cut(manifest)
    } finally sharded.unpersist(blocking = false)
  }

  /** Shard-integrity audit: recompute each shard's row count and order
    * digest from the WRITTEN layout and diff against `_graft_manifest` —
    * the pre-epoch check a trainer runs so bitrot, a torn write, or a
    * manual edit is caught before it silently changes the training
    * order. Returns one row per disagreeing shard (EMPTY = verified):
    * a shard missing on either side, a row-count drift, or a digest
    * mismatch all surface, with both sides' values for triage.
    *
    * 100 TB posture: one shard-keyed aggregate over the layout (the
    * same digest formula [[writeTrainingShards]] used) joined against
    * the shard-count-sized manifest — reading the corpus once is the
    * floor for any content check; the manifest makes everything else
    * metadata-sized. */
  def verifyShards(spark: org.apache.spark.sql.SparkSession, path: String,
                   keyCol: String): DataFrame = {
    val manifest = spark.read.json(s"$path/_graft_manifest")
      .select(col("shard").cast("long").as("shard"),
        col("nb_rows").cast("long").as("manifest_rows"),
        col("order_digest").as("manifest_digest"))
    val actual = spark.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("actual_rows"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col(keyCol).cast("string").as("k")))),
          s => s.getField("k")), ",")).as("actual_digest"))
    manifest.join(actual, Seq("shard"), "full_outer")
      .filter(
        col("manifest_rows").isNull || col("actual_rows").isNull ||
        col("manifest_rows") =!= col("actual_rows") ||
        col("manifest_digest") =!= col("actual_digest"))
  }

  /** Per-row weighted sampling: keep each row with probability equal to
    * its own weight ∈ [0, 1] (clamped), decided by content hash — the
    * quality-resampling step that keeps documents in proportion to a
    * model-free quality score instead of a hard threshold (soft filtering:
    * borderline docs survive at reduced rate rather than vanishing at a
    * cliff). Unlike [[mixtureSample]] the weight is a per-row COLUMN, not
    * a per-source constant, so any upstream score works.
    *
    * The keep test floors 256·w onto the [[hashBucket]] grid (weight
    * exactly 1.0 → cut 256 → always kept; weight < 1/256 → dropped —
    * document the floor to callers scoring in tight ranges).
    *
    * 100 TB posture: pure map-side expression — no shuffle, no state. */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column): DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.filter(hashBucket(col(keyCol)) < floor(lit(256) * w))
  }

  /** DSIR feature grams: word unigrams + space-joined bigrams (the
    * hashed n-gram feature map of Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"). NULL text yields an
    * EMPTY gram array (via [[TextAnalysis.tokens]]' null guard), so a
    * NULL-text doc scores as a zero-gram doc rather than poisoning the
    * fold with NULL. */
  private[graft] def dsirGrams(text: Column): Column = {
    val ts = graft.ops.TextAnalysis.tokens(text)
    val n1 = greatest(size(ts) - 1, lit(0))
    concat(ts, zip_with(slice(ts, lit(1), n1), slice(ts, lit(2), n1),
      (a, b) => concat(a, lit(" "), b)))
  }

  /** [[hashBucket]] widened to `hexDigits` md5 hex digits — bucket ∈
    * [0, 16^hexDigits). The hashing-trick feature space is FIXED at
    * 16^hexDigits whatever the vocabulary (collisions are part of the
    * estimator and collide identically in every engine). */
  def hashBucketHex(key: Column, hexDigits: Int): Column = {
    require(hexDigits >= 1 && hexDigits <= 7,
      s"hexDigits must be in [1, 7] (got $hexDigits)")
    val h = md5(key.cast("string"))
    (1 to hexDigits).map { i =>
      hexDigitVal(substring(h, i, 1)) *
        lit(math.pow(16, (hexDigits - i).toDouble).toLong)
    }.reduce(_ + _)
  }

  /** The per-corpus gram face selector (VERDICT r15 #2): `charN = None`
    * is the word uni+bigram face ([[dsirGrams]]); `Some(n)` is hashed
    * char n-grams ([[TextAnalysis.charNgrams]]) for UNSEGMENTED scripts
    * — whitespace grams reduce an unspaced document to ONE giant token,
    * so the token face's importance estimate collapses (every doc
    * scores by corpus-size difference alone; q151 plants the fixture).
    * Same bucket space, same profile state format either way — pick the
    * face PER CORPUS and keep fit/score consistent. */
  private def dsirGramFace(text: Column, charN: Option[Int]): Column =
    charN match {
      case Some(n) => graft.ops.TextAnalysis.charNgrams(text, n)
      case None => dsirGrams(text)
    }

  /** One corpus pass to the hashed-n-gram bag: (bucket, cnt) — at most
    * 16^hexDigits rows however large the corpus, the distribution
    * profile DSIR scoring consumes. Fit it ONCE per corpus (target and
    * raw) and reuse across scoring runs. `charN` selects the char-gram
    * face (see [[dsirGramFace]]). */
  def hashedNgramCounts(docs: DataFrame, textCol: String,
                        hexDigits: Int = 2,
                        charN: Option[Int] = None): DataFrame =
    // gram explode + md5 bucket hashing + partial count all run before
    // the first exchange — floor the scan parallelism (Par doc; the
    // profile is an additive counter bag, partition-invariant)
    Par.ensureMinPartitions(docs)
      .select(explode(dsirGramFace(col(textCol), charN)).as("g"))
      .select(hashBucketHex(col("g"), hexDigits).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  private def bucketMap(counts: DataFrame): (Map[Int, Long], BigInt) = {
    // bounded by the bucket space (16^hexDigits), never the corpus;
    // the TOTAL sums per-bucket Longs in BigInt — at multi-billion-gram
    // corpora the sum of 2^16 near-2^63 buckets wraps a Long (ADVICE r16)
    val rows = counts.select(col("bucket").cast("int"), col("cnt").cast("long"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    (rows.toMap, rows.map(c => BigInt(c._2)).sum)
  }

  /** O(1) per-gram profile lookup: the bucket space is DENSE, so the
    * profile ships as an array literal indexed by bucket — a literal
    * MAP's `element_at` is a linear scan over every entry per probe
    * (measured 16× on q147's plan), an array `element_at` is an index.
    * Falls back to the map form above 16⁴ buckets (a 65k-element
    * literal is fine; a 16⁷ one is not). */
  private def profileLookup(m: Map[Int, Long], b: Long)(bucket: Column): Column =
    if (b <= 65536L) {
      val arr = typedlit(Array.tabulate(b.toInt)(i => m.getOrElse(i, 0L)).toSeq)
      element_at(arr, bucket.cast("int") + 1)
    } else coalesce(element_at(typedlit(m), bucket.cast("int")), lit(0L))

  /** DSIR importance scoring, exact-integer face: rank raw documents by
    * how much more target-like than raw-like their hashed-n-gram bag
    * is. With add-one smoothing over the 16^hexDigits bucket space, the
    * linear-pooled likelihood of doc x under profile P is
    * (gn + Σ_g c_P(b(g))) / (N_P + B) — the [[TextAnalysis.nbTrain]]
    * pooling, the price of cross-engine exactness — and the margin is
    * the cross-multiplied difference
    *
    *   (gn + dot_t)·(N_r + B) − (gn + dot_r)·(N_t + B)
    *
    * exact in DECIMAL(38,0) (the [[TextAnalysis.nbPredict]] discipline —
    * Long cross-products would silently wrap past 9.2·10¹⁸, which
    * per-bucket counts of a multi-billion-gram corpus reach): positive
    * ⇔ the doc is more target-like than raw-like (`kept`, decided on
    * the decimal). `dsir_margin` is exposed as BIGINT for downstream
    * compactness — when the exact margin exceeds the Long range the
    * column is NULL (never a wrapped value) while `kept` stays correct
    * from the decimal sign. The TRUE log-pooled DSIR weight is
    * [[dsirLogWeights]] — engine-side floats, sign/rank-tested against
    * this face.
    *
    * 100 TB posture: the two profiles ride in as bucket-space-bounded
    * literal maps (fit once by [[hashedNgramCounts]] — the only corpus
    * passes); scoring is a pure map-side fold per row — no UDF, no
    * shuffle, no join, no driver round-trip per doc. */
  def dsirScores(docs: DataFrame, textCol: String,
                 target: DataFrame, raw: DataFrame,
                 hexDigits: Int = 2,
                 charN: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val b = math.pow(16, hexDigits.toDouble).toLong
    val (tm, tn) = bucketMap(target)
    val (rm, rn) = bucketMap(raw)
    // each gram hashes ONCE into a pinned bucket array (md5 is the
    // per-gram cost; the two profile folds then index ints).
    // NOTE deliberately NOT Par-guarded: dsirScores is the recipe's
    // zero-exchange scoring contract (PlanShapeSpec pins dsirSelect to
    // zero exchanges, the delta-bounded daily guarantee) — standalone
    // corpus-scale callers apply Par.ensureMinPartitions to their input
    // themselves when the whole pass would otherwise ride one scan
    // partition (q147/q148/q151 do).
    val withB = docs.withColumn("__dsir_bs",
      transform(dsirGramFace(col(textCol), charN),
        g => hashBucketHex(g, hexDigits).cast("int")))
    // the dot-product FOLD itself runs in DECIMAL(38,0) (ADVICE r16):
    // a Long accumulator wraps silently at ~1e6 grams against ~1e13
    // per-bucket counts, before any decimal cast could save it
    val dec38 = DecimalType(38, 0)
    def dot(m: Map[Int, Long]): Column =
      aggregate(col("__dsir_bs"), lit(BigDecimal(0)).cast(dec38),
        (acc, bk) => (acc + profileLookup(m, b)(bk).cast(dec38)).cast(dec38))
    val gn = size(col("__dsir_bs")).cast(dec38)
    def decLit(v: BigInt): Column = lit(BigDecimal(v)).cast(dec38)
    val marginDec =
      (gn + dot(tm)) * decLit(rn + b) -
      (gn + dot(rm)) * decLit(tn + b)
    // explicit range gate: non-ANSI decimal→long WRAPS on overflow
    // (Decimal.toLong truncates), so out-of-range margins are nulled
    // by hand — NULL, never a wrapped value
    withB.withColumn("dsir_margin",
        when(marginDec.between(lit(Long.MinValue), lit(Long.MaxValue)),
          marginDec.cast("long")))
      .withColumn("kept", marginDec > 0)
      .drop("__dsir_bs")
  }

  /** Incremental face of the DSIR profiles: fold a day's documents into
    * a persisted hashed-n-gram profile state (target or raw),
    * exactly-once per `deltaId` through the
    * [[Sketches.counterUpdateState]] ledger — the profile is an
    * additive counter bag, so N daily folds equal the one-shot
    * [[hashedNgramCounts]] of the union bit-for-bit. A daily selection
    * pass then reads BOTH states (bounded by the bucket space) and
    * scores only the day's delta: no corpus rescan, ever. */
  def dsirProfileUpdateState(spark: org.apache.spark.sql.SparkSession,
                             path: String, docs: DataFrame, textCol: String,
                             deltaId: String, hexDigits: Int = 2,
                             charN: Option[Int] = None): DataFrame =
    Sketches.counterUpdateState(spark, path,
      hashedNgramCounts(docs, textCol, hexDigits, charN), deltaId)

  /** Takedown face of the profile state: SUBTRACT the removed
    * documents' gram counts — additive counters un-fold exactly, so
    * after the ledgered negative fold the state equals the profile the
    * surviving corpus would have built (zero-count buckets may linger
    * as explicit rows; scoring treats absent and zero identically).
    * Ledgered like any fold: re-running a takedown deltaId no-ops
    * rather than double-subtracting. The caller supplies the removed
    * docs' TEXT (profiles hold no per-document rows to sweep — this is
    * the counter-state analog of [[graft.ops.CurateIncremental]]'s
    * removeFromState). */
  def dsirProfileRemoveState(spark: org.apache.spark.sql.SparkSession,
                             path: String, docs: DataFrame, textCol: String,
                             deltaId: String, hexDigits: Int = 2,
                             charN: Option[Int] = None): DataFrame =
    Sketches.counterUpdateState(spark, path,
      hashedNgramCounts(docs, textCol, hexDigits, charN)
        .withColumn("cnt", -col("cnt")), deltaId)

  /** The true DSIR log importance weight (log-pooled, add-one smoothed):
    *
    *   log w(x) = Σ_g [ln(c_t(b(g))+1) − ln(c_r(b(g))+1)]
    *              + gn·[ln(N_r+B) − ln(N_t+B)]
    *
    * Engine-side doubles (float summation order is partition-stable here
    * because the fold runs left-to-right inside one row). Compose with
    * [[weightedSample]] (e.g. `exp(least(log_w, 0))` keeps docs in
    * proportion to capped importance) or [[TextAnalysis.quantileFilter]]
    * for top-quantile selection. Same map-side posture as
    * [[dsirScores]]. */
  def dsirLogWeights(docs: DataFrame, textCol: String,
                     target: DataFrame, raw: DataFrame,
                     hexDigits: Int = 2,
                     outCol: String = "dsir_log_w",
                     charN: Option[Int] = None): DataFrame = {
    val b = math.pow(16, hexDigits.toDouble).toLong
    val (tm, tn) = bucketMap(target)
    val (rm, rn) = bucketMap(raw)
    val withB = docs.withColumn("__dsir_bs",
      transform(dsirGramFace(col(textCol), charN),
        g => hashBucketHex(g, hexDigits).cast("int")))
    // greatest(c, 0): a mis-specified takedown (dsirProfileRemoveState
    // with text that never folded in) can leave negative counters —
    // arithmetic stays defined on the integer face, but log(c+1) would
    // NaN here; clamp so the log face degrades to "absent" instead
    val perGram = aggregate(col("__dsir_bs"), lit(0.0), (acc, bk) =>
      acc + log(greatest(profileLookup(tm, b)(bk), lit(0L)) + lit(1.0)) -
        log(greatest(profileLookup(rm, b)(bk), lit(0L)) + lit(1.0)))
    val lenTerm = size(col("__dsir_bs")).cast("double") *
      lit(math.log((rn + b).toDouble) - math.log((tn + b).toDouble))
    withB.withColumn(outCol, perGram + lenTerm).drop("__dsir_bs")
  }

  /** Rendezvous (highest-random-weight) routing: the key goes to the
    * shard whose `md5(key ":" shard)` weight is lexicographically
    * largest over the candidate `shards` array (ties — md5-impossible in
    * practice, but pinned anyway — break toward the SMALLEST shard id
    * via the negated-id struct field).
    *
    * Why HRW instead of [[shuffleShard]]'s hash-mod: removing (or
    * adding) a shard reassigns ONLY that shard's keys — every surviving
    * shard keeps its population bit-for-bit, where hash-mod reshuffles
    * ~everything. That is the property a 100 TB corpus mirrored across
    * storage shards needs for incremental rebalancing: drain one shard
    * without churning the other N−1.
    *
    * Pass the candidate set as an array column (`sequence(0, n-1)`,
    * optionally `filter`ed) so before/after assignments under a removal
    * are two calls over the SAME row — no join, no second pass.
    *
    * 100 TB posture: pure map-side expression — O(|shards|) md5 calls
    * per row, no shuffle, no state, no driver round-trips. Keep the
    * candidate set at physical-shard granularity (≤ thousands); for
    * file-count-sized sharding use [[shuffleShard]]. */
  def rendezvousPick(key: Column, shards: Column): Column =
    (lit(0) - array_max(transform(shards, s =>
      struct(
        md5(concat(key.cast("string"), lit(":"), s.cast("string"))).as("h"),
        (lit(0) - s).as("ns")))).getField("ns")).cast("int")
}
