package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Incremental curation: curate TODAY's delta against the PERSISTED
  * corpus state, instead of re-running [[Curate.curate]] over the whole
  * lake — the operator a daily 100 TB pipeline hits first. Yesterday's
  * expensive artifacts (content fingerprints, MinHash LSH band keys) are
  * lake tables written once and PROBED daily, never recomputed:
  *
  *  - exact dedup: the delta dedups within itself, then anti-joins its
  *    fingerprints against the persisted fingerprint table — one shuffle
  *    on the content key, state side never re-hashed;
  *  - near-dup: delta band keys (computed for the delta only) join the
  *    persisted band-key table on (band, key) — the same bucket-keyed
  *    shuffle as [[Dedup.lshCandidates]], with the corpus side read from
  *    parquet instead of re-signed. Exact Jaccard confirms candidates,
  *    re-shingling ONLY the state docs a candidate pair references
  *    (the [[Dedup.jaccardOnPairs]] semi-join shape);
  *  - survivor policy: the EXISTING corpus always wins — a delta doc in
  *    any near-dup component that touches a persisted survivor is
  *    dropped, whatever its id; delta-only components keep their min id
  *    (the [[Curate.curate]] policy). With ingest-monotone ids (delta ids
  *    above state ids — the normal case) this makes
  *    `state ∪ curateDelta(state, delta)` EQUAL a full re-curate of
  *    `state.corpus ∪ delta` (property-tested via the curate fixpoint);
  *  - quality floor / decontamination / split assignment are per-doc and
  *    run on the delta survivors exactly as in the full recipe. Split
  *    assignment is a hash of the id ([[Sampling.splitAssign]]), so a doc
  *    gets the same split whether it arrived in the base load or a delta.
  *
  * Boilerplate removal is corpus-global (line frequencies shift with
  * every delta) and is rejected here — run it in the periodic full
  * re-curate, not the daily increment.
  *
  * Contract: state and delta ids are disjoint (enforce upstream with
  * ingest-assigned monotone ids). After a delta lands, [[appendState]]
  * extends the state tables with the new survivors so the next delta
  * probes them too.
  */
object CurateIncremental {

  /** The persisted curation state: the curated corpus (id, text — text
    * already PII-redacted by the curate run that produced it) plus its
    * two derived index tables. */
  case class State(corpus: DataFrame, fingerprints: DataFrame, bandKeys: DataFrame)

  /** (id, content_key) for every doc — the exact-dedup index table. */
  def fingerprintTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("content_key"))

  /** Derive the full state from a curated corpus (used once, after the
    * initial full curate; deltas then extend it via [[appendState]]). */
  def buildState(curated: DataFrame, idCol: String, textCol: String,
                 cfg: Curate.Config = Curate.Config()): State =
    State(
      curated.select(col(idCol), col(textCol)),
      fingerprintTable(curated, idCol, textCol),
      Dedup.lshBandKeys(curated, idCol, textCol,
        cfg.shingleN, cfg.minhashK, cfg.lshBands, cfg.lshRows))

  private def stateDir(root: String) = s"$root/curate_state"

  /** Pin a frame's rows before writing INTO its own input directories:
    * the state writes mutate the very parquet dirs a [[curateDelta]]
    * result's lineage reads, and Spark's post-write `refreshByPath`
    * drops the dependent cache — without pinning, the second and third
    * table writes would silently RECOMPUTE the survivors against the
    * half-updated state (observed: a survivor present in the corpus
    * table but missing from the fingerprint table). A localCheckpoint
    * cuts the lineage at materialization, so every write sees the same
    * rows and none re-reads the mutated dirs. */
  private def pinned(df: DataFrame, eager: Boolean = false)
                    (writes: DataFrame => Unit): Unit = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    if (eager) rdd.count() // materialize BEFORE any write mutates an input
    try writes(df.sparkSession.createDataFrame(rdd, df.schema))
    finally { rdd.unpersist(blocking = false); () }
  }

  /** Persist the state as three snappy-parquet lake tables under
    * `<root>/curate_state/`. Overwrites — this is the post-full-curate
    * snapshot; daily increments go through [[appendState]]. All three
    * frames are pinned EAGERLY: in a load→transform→save flow they read
    * the very dirs the overwrite deletes, so each must be materialized
    * before the first delete (one extra pass per table, once per
    * snapshot). */
  def saveState(st: State, root: String): Unit =
    pinned(st.corpus, eager = true) { corpus =>
      pinned(st.fingerprints, eager = true) { fps =>
        pinned(st.bandKeys, eager = true) { bks =>
          corpus.write.mode("overwrite").parquet(s"${stateDir(root)}/corpus")
          fps.write.mode("overwrite").parquet(s"${stateDir(root)}/fingerprints")
          bks.write.mode("overwrite").parquet(s"${stateDir(root)}/band_keys")
        }
      }
    }

  def loadState(spark: SparkSession, root: String): State =
    State(
      spark.read.parquet(s"${stateDir(root)}/corpus"),
      spark.read.parquet(s"${stateDir(root)}/fingerprints"),
      spark.read.parquet(s"${stateDir(root)}/band_keys"))

  /** Append a delta's survivors (a [[curateDelta]] result corpus) to the
    * persisted state tables, so the next delta probes them too. The
    * survivors are pinned first — their lineage reads the same dirs
    * these writes mutate (see [[pinned]]). */
  def appendState(survivors: DataFrame, idCol: String, textCol: String,
                  root: String, cfg: Curate.Config = Curate.Config()): Unit =
    pinned(survivors.select(col(idCol), col(textCol))) { slim =>
      slim.write.mode("append").parquet(s"${stateDir(root)}/corpus")
      fingerprintTable(slim, idCol, textCol)
        .write.mode("append").parquet(s"${stateDir(root)}/fingerprints")
      Dedup.lshBandKeys(slim, idCol, textCol,
          cfg.shingleN, cfg.minhashK, cfg.lshBands, cfg.lshRows)
        .write.mode("append").parquet(s"${stateDir(root)}/band_keys")
    }

  /** Day-0 bootstrap — the first of the two calls a daily pipeline
    * makes: full-curate `docs` ([[Curate.curate]]) and persist the
    * survivors' state tables under `root`, ready for [[daily]] deltas.
    * Chunking must stay off here: the state must be DOCUMENT-level
    * (chunk downstream of curation instead). */
  def bootstrap(docs: DataFrame, benchmark: DataFrame,
                idCol: String, textCol: String, root: String,
                cfg: Curate.Config = Curate.Config()): Curate.Result = {
    require(cfg.chunk.isEmpty,
      "state must be document-level — chunk downstream of curation")
    val r = Curate.curate(docs, benchmark, idCol, textCol, cfg)
    saveState(buildState(r.corpus.select(col(idCol), col(textCol)),
      idCol, textCol, cfg), root)
    r
  }

  /** The daily increment — load the state under `root`, curate the delta
    * against it, append the delta's survivors to the state tables, and
    * return those survivors (the rows to append to the serving corpus).
    * Day N's survivors are probe-able by day N+1 automatically. */
  def daily(delta: DataFrame, benchmark: DataFrame,
            idCol: String, textCol: String, root: String,
            cfg: Curate.Config = Curate.Config()): Curate.Result = {
    require(cfg.chunk.isEmpty,
      "state must be document-level — chunk downstream of curation")
    val st = loadState(delta.sparkSession, root)
    val r = curateDelta(delta, benchmark, idCol, textCol, st, cfg)
    // pin the survivors EAGERLY before appendState mutates the dirs their
    // lineage reads: the append's refreshByPath drops the result's cache,
    // and an unpinned corpus re-read by the CALLER would recompute
    // against the updated state — every survivor would anti-join against
    // its own just-appended fingerprint and vanish
    val rdd = r.corpus.rdd
    rdd.localCheckpoint()
    rdd.count()
    val corpus = delta.sparkSession.createDataFrame(rdd, r.corpus.schema)
    appendState(corpus, idCol, textCol, root, cfg)
    Curate.Result(corpus, r.stats,
      () => { r.release(); rdd.unpersist(blocking = false); () })
  }

  /** Curate a delta against the persisted state. Output: the DELTA's
    * survivors (text redacted, `split` assigned) — the rows to append to
    * the lake; the existing corpus is untouched by construction. Stats
    * mirror [[Curate.curate]]'s one-row frame. */
  def curateDelta(delta: DataFrame, benchmark: DataFrame,
                  idCol: String, textCol: String, st: State,
                  cfg: Curate.Config = Curate.Config()): Curate.Result = {
    require(cfg.boilerplateMaxDocs.isEmpty,
      "boilerplate removal is corpus-global; run it in the periodic full re-curate")

    // 1. redact PII first, exactly like the full recipe — the persisted
    // corpus text was redacted by the run that produced it, so delta
    // fingerprints/shingles compare redacted-to-redacted
    val redacted = delta.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
    val total = redacted.count()

    // 2. exact dedup: within the delta, then against the persisted
    // fingerprint table (probe side is the delta — the state table is
    // never re-hashed)
    val exact = Dedup.dedupCorpus(redacted, textCol, idCol)
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(st.fingerprints.select(col("content_key").as("__fp")).distinct(),
        Seq("__fp"), "left_anti")
      .drop("__fp")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count()

    // 3. near-dup collapse: delta-vs-delta candidates from the delta's own
    // LSH buckets, delta-vs-state candidates from probing the persisted
    // band keys; exact Jaccard confirms both kinds. Degenerate-key
    // posture: the delta self-join takes cfg.lshMaxBucket; the CROSS join
    // is linear, not quadratic, in a delta-side flood (m_delta × the
    // state bucket's cardinality, and the state is curated — its exact
    // dups are gone and near-dup families are collapsed, so state
    // buckets are false-positive-sized, not boilerplate-sized; identical
    // delta docs additionally collapse in stage 2 before LSH runs)
    val (nearDeduped, nNear) =
      if (cfg.nearDupThreshold > 1.0) (exact, nExact)
      else {
        val selfPairs = Dedup.lshCandidates(exact, idCol, textCol,
          cfg.shingleN, cfg.minhashK, cfg.lshBands, cfg.lshRows, cfg.lshMaxBucket)
        val deltaBands = Dedup.lshBandKeys(exact, idCol, textCol,
          cfg.shingleN, cfg.minhashK, cfg.lshBands, cfg.lshRows)
        val crossPairs = st.bandKeys.as("o")
          .join(deltaBands.as("n"),
            col("o.band") === col("n.band") && col("o.key") === col("n.key"))
          .select(col("o.id").as("id_a"), col("n.id").as("id_b"))
          .distinct()
        // Jaccard re-shingles only docs referenced by a candidate pair
        // (semi-join inside jaccardOnPairs) — the state corpus is scanned,
        // not re-signed
        val lookup = exact.select(col(idCol), col(textCol))
          .unionByName(st.corpus.select(col(idCol), col(textCol)))
        val pairs = Dedup.jaccardOnPairs(
            selfPairs.unionByName(crossPairs), lookup, idCol, textCol, cfg.shingleN)
          .filter(col("jaccard") >= cfg.nearDupThreshold)
        // existing corpus wins: any delta doc whose component touches a
        // persisted survivor drops (whatever the ids); delta-only
        // components keep their min id, as in the full recipe
        val comp = Dedup.components(pairs)
        val oldIds = st.corpus.select(col(idCol).as("id"))
        val stateLbls = comp.join(oldIds, Seq("id"), "left_semi")
          .select(col("lbl")).distinct()
        val dups = comp.join(stateLbls, Seq("lbl"), "left_semi").select(col("id"))
          .unionByName(comp.filter(col("lbl") < col("id")).select(col("id")))
          .distinct()
          .withColumnRenamed("id", "__dup")
        val nd = exact.join(dups, exact(idCol) === col("__dup"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val n = nd.count()
        exact.unpersist()
        (nd, n)
      }

    // 4.–6. per-doc stages, identical to the full recipe
    val quality = nearDeduped
      .filter(TextAnalysis.qualityScore(col(textCol)).cast("double") >= cfg.qualityFloor)
    val benchmarkRedacted = benchmark
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
    val contaminated = Dedup.ngramOverlap(quality, benchmarkRedacted, idCol, textCol,
        cfg.contaminationN)
      .select(col(idCol).as("__contaminated_id"))
    val clean = quality
      .join(contaminated, quality(idCol) === col("__contaminated_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nClean = clean.count()
    nearDeduped.unpersist()

    val curated = clean
      .withColumn("split",
        Sampling.splitAssign(col(idCol), cfg.trainPct, cfg.valPct))
    val emitted = cfg.chunk match {
      case Some((size, overlap)) =>
        Packing.chunkTokens(curated, idCol, textCol, size, overlap)
          .join(curated.select(col(idCol), col("split")), Seq(idCol))
      case None => curated
    }

    val stats = curated.sparkSession.createDataFrame(Seq(
      (total, nExact, nNear, nClean)
    )).toDF("nb_input", "nb_after_exact_dedup", "nb_after_near_dedup",
      "nb_after_quality_decontam")
    Curate.Result(emitted, stats, () => { clean.unpersist(); () })
  }
}
