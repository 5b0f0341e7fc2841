package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data team
  * actually runs, wired from the library's own operators in the order
  * that minimizes downstream work —
  *
  *   0. (opt-in) boilerplate line removal ([[TextAnalysis.removeBoilerplate]]
  *      — BEFORE dedup, so shared footers can't mask real duplicates or
  *      fake near-dups; docs left empty by it are dropped),
  *   0¾. (opt-in) Unicode NFC canonicalization ([[TextAnalysis.nfc]] —
  *      text rewritten to its composed form BEFORE any hashing, so
  *      composed vs decomposed encoder toolchains collapse in every
  *      downstream fingerprint; rendering-invariant and idempotent),
  *   1. PII redaction ([[TextAnalysis.redactPii]] — BEFORE any hashing:
  *      docs that differ only in the PII value collapse to identical
  *      content, so the dedup stages catch them, and every later stage
  *      scores the text that actually ships),
  *   1¾. (opt-in) blocklist subtraction ([[Blocklist.bloomAntiJoin]] —
  *      docs whose REDACTED-content fingerprint is on a takedown list
  *      drop before dedup, so a blocked doc can never become a content
  *      key's survivor and shadow a legitimate copy; keyed after
  *      redaction so variants differing only in a PII value block
  *      together; Bloom-prefiltered, the corpus never shuffles for it),
  *   2. exact dedup (cheapest filter first: one content-hash shuffle),
  *   3. transitive near-dup collapse (MinHash→LSH→Jaccard→components),
  *   3½. (opt-in) exact-substring span dedup ([[Dedup.spanDedup]] — after
  *      the doc-level collapses so whole-doc dups never read as spans;
  *      docs emptied by it are dropped),
  *   3¾. (opt-in) winnowed borrowed-content filter
  *      ([[Dedup.winnowedPairs]] — docs sharing ≥ minShared sampled
  *      span fingerprints with an earlier-id doc drop whole: the
  *      detector for partial borrowing BELOW the near-dup Jaccard
  *      threshold, at ~2∕(w+1) of the exhaustive span index's state),
  *   4. quality floor ([[TextAnalysis.qualityScore]] ≥ threshold),
  *   4¼. (opt-in) per-group quantile quality cut
  *      ([[TextAnalysis.quantileFilter]] — keep the top fraction of each
  *      group (language/domain) by score: the RELATIVE cut that can't
  *      empty a low-resource group the absolute floor might; runs after
  *      the floor so the window prices the already-thinned corpus),
  *   4½. (opt-in) corpus-LM bigram floor ([[TextAnalysis.bigramCommonRatio]]
  *      — the corpus as its own LM; salad and too-short docs drop),
  *   5. decontamination against a benchmark set ([[Dedup.ngramOverlap]]),
  *   5¼. (opt-in) DSIR importance selection ([[Sampling.dsirScores]], or
  *      [[Sampling.dsirLogWeights]] + [[Sampling.weightedSample]] in
  *      resample mode, against caller-supplied target/raw hashed-n-gram
  *      profiles — AFTER cleaning so the selection budget prices text
  *      that survived, BEFORE temperature so the √-rule balances what
  *      selection kept; per-doc deterministic under fixed profiles, so
  *      the fixpoint property is preserved),
  *   5½. (opt-in) temperature mixture balancing
  *      ([[Sampling.temperatureSample]] — AFTER cleaning so junk never
  *      consumes a dominant source's budget, BEFORE splits so every
  *      split sees the same balanced mixture),
  *   6. deterministic split assignment ([[Sampling.splitAssign]]),
  *   7. (opt-in) sliding-window chunking ([[Packing.chunkTokens]] — LAST,
  *      over redacted survivors only; chunks inherit the doc's split so a
  *      document never straddles train/val).
  *
  * Every stage is the library operator itself — no re-implementation —
  * so each stage's scale posture (bucketed candidates, broadcast-bounded
  * benchmark, hash-bucket splits) is inherited. Returns the curated
  * corpus plus a one-row stats frame for pipeline observability.
  *
  * With redaction idempotent (its placeholders match none of its own
  * patterns) and the LSH/minhash machinery deterministic, the whole
  * recipe is a FIXPOINT: curating an already-curated corpus eliminates
  * nothing and changes no text or split (property-tested). That is the
  * contract an incrementally re-run pipeline relies on. (The opt-in
  * temperature stage is the documented exception, like spanDedupK: the
  * √-rule moves counts TOWARD balance each application — c_s →
  * √(c_s·c_min) — so re-curating with it on keeps shaving the dominant
  * sources; qualityQuantile likewise re-cuts each group to the top
  * fraction of its current survivors. winnowFilter is corpus-dependent
  * the same way: its df cap is
  * computed over the CURRENT corpus, so fingerprints capped out in run 1
  * can fall under the cap among run-1 survivors and pair in run 2. The
  * fixpoint property holds for the default Config.)
  */
object Curate {

  /** Fused per-doc disposition walk (VERDICT r16 #1): the recipe's stage
    * handoffs form a subset CHAIN (every stage filters its
    * predecessor), so ONE union + max-depth aggregation labels every
    * input doc with the first stage it vanished from — the old walk
    * planned a broadcast anti-join per stage and read every handoff
    * twice behind its own persist (q150 profiled ~90% fixed
    * broadcast-job overhead); this plans a single hash aggregation and
    * reads each handoff once. Returns (idCol, stage, __last) — `__last`
    * is the 1-based index of the last handoff the doc survived (0 =
    * dropped at the first), so callers can derive the stage-count stats
    * from the SAME pass instead of one count() action per stage. */
  private[ops] def fusedAudit(input: DataFrame, idCol: String,
                              handoffs: Seq[(String, DataFrame)]): DataFrame = {
    val names = handoffs.map(_._1)
    val tagged = (input.select(col(idCol)).withColumn("__d", lit(0)) +:
      handoffs.zipWithIndex.map { case ((_, f), i) =>
        f.select(col(idCol)).withColumn("__d", lit(i + 1)) })
      .reduce(_.unionByName(_))
    tagged.groupBy(col(idCol)).agg(max(col("__d")).as("__last"))
      .withColumn("stage",
        when(col("__last") === names.size, lit("survived"))
          .otherwise(element_at(typedlit(names), col("__last") + 1)))
  }

  /** Knobs of the opt-in winnowed borrowed-content filter (stage 3¾):
    * [[TextAnalysis.winnowedFingerprints]]'s (k, w) plus the pair rules
    * of [[Dedup.winnowedPairs]] — docs sharing ≥ `minShared` fingerprints
    * (each seen in ≤ `maxDf` docs) with an earlier-id doc are dropped. */
  case class Winnow(k: Int = 5, w: Int = 4, minShared: Int = 2,
                    maxDf: Int = 10)

  /** Knobs of the EXACT-JACCARD entity matcher — the special case of
    * [[Config.entityMatcher]] the INCREMENTAL pipeline can run (VERDICT
    * r13 #1): pairs are [[Dedup.exactJaccardPairs]] over
    * `tokens(textCol)` at threshold `tNum/tDen`, and because the pair
    * predicate is token-set-local, [[ExactJoinState]] can persist the
    * corpus's prefix/token index and a daily delta probes it for every
    * state↔delta match a delta-only matcher would miss. `tokens` maps
    * the text column to a token-array Column (e.g. word 3-shingles);
    * docs with no tokens never pair. The threshold is PINNED in the
    * persisted state's sidecar at bootstrap — later runs must pass the
    * same values or the state probe and the batch matcher drift. */
  case class EntityExact(tokens: Column => Column, tNum: Long, tDen: Long)

  /** Knobs of the FUZZY edit-distance entity matcher — the second
    * incremental-capable [[Config.entityMatcher]] special case (VERDICT
    * r14 #3): pairs are [[FuzzyJoin.editSelfJoin]] over the text at
    * Levenshtein distance ≤ `maxDist` (padded `q`-grams drive the
    * lossless prefix filter), and because the verdict is
    * pairwise-text-local, [[FuzzyJoinState]] persists the corpus's
    * rarest-gram prefix index so a daily delta probes it for every
    * state↔delta match. Sized for entity-matching strings (names,
    * titles, short records) — the per-doc gram fold is O(len²).
    * `maxDist` and `q` are PINNED in the persisted state's sidecar at
    * bootstrap. */
  case class EntityFuzzy(maxDist: Int, q: Int = 2)

  /** Knobs of the opt-in DSIR importance-selection stage (5¼): the
    * hashed-n-gram profiles of the TARGET distribution and of the RAW
    * pool, each a (bucket, cnt) frame — fit in one corpus pass by
    * [[Sampling.hashedNgramCounts]] (batch), or read via
    * [[Sketches.readState]] from the persisted counter state
    * [[Sampling.dsirProfileUpdateState]] maintains, which is how the
    * incremental pipeline scores a day's delta against corpus-LIFETIME
    * profiles without ever rescanning the corpus. `resample = false`
    * keeps margin-positive docs (more target-like than raw-like, the
    * exact-integer [[Sampling.dsirScores]] decision); `resample = true`
    * keeps each doc with probability exp(min(log w, 0)) — capped
    * importance resampling ([[Sampling.dsirLogWeights]] through
    * [[Sampling.weightedSample]]), the Xie et al. 2023 sampling rule.
    * Fixpoint note: the profiles are INPUTS (never re-derived from the
    * corpus being curated) and both keep rules are per-doc
    * deterministic, so the recipe's fixpoint property is preserved —
    * survivors re-curated against the same profiles all survive. */
  case class Dsir(target: DataFrame, raw: DataFrame, hexDigits: Int = 2,
                  resample: Boolean = false, charN: Option[Int] = None)

  case class Config(
      nearDupThreshold: Double = 0.5,
      shingleN: Int = 3,
      minhashK: Int = 12,
      lshBands: Int = 3,
      lshRows: Int = 4,
      // degenerate-key guard for the LSH stage (see Dedup.lshCandidates):
      // buckets above this cardinality degrade clique→chain candidates
      lshMaxBucket: Int = Int.MaxValue,
      qualityFloor: Double = 0.5,
      contaminationN: Int = 5,
      trainPct: Int = 80,
      valPct: Int = 10,
      boilerplateMaxDocs: Option[Long] = None,
      // opt-in Unicode NFC canonicalization (stage 0¾): idempotent,
      // rendering-invariant — the fixpoint property is preserved
      nfcCanonical: Boolean = false,
      // opt-in takedown/blocklist subtraction (stage 1¾): a one-column
      // (`content_key`) frame of md5 content fingerprints (the
      // [[TextAnalysis.fingerprint]] of the REDACTED text). Note: a
      // DataFrame is a plan, not a value — two Configs carrying the
      // "same" blocklist are not `==`, which nothing here relies on
      blocklist: Option[DataFrame] = None,
      // opt-in per-doc disposition audit: Result.audit carries one row
      // per INPUT doc — (id, stage) where stage names the FIRST stage
      // that dropped it, or "survived". Diagnostics only (the id frames
      // re-derive from the recipe's own stage handoffs, roughly doubling
      // the work) — the "why did my doc disappear" answer at corpus scale
      audit: Boolean = false,
      // opt-in exact-substring span dedup after the doc-level collapses
      // (window size k): cross-doc verbatim runs ≥ k are removed from all
      // but their canonical occurrence; docs left empty are dropped. One
      // pass: removal can create new token adjacencies at the seam, so a
      // corpus needing exhaustive span removal re-runs until nb_removed=0
      // (the default recipe's fixpoint property is for spanDedupK=None).
      spanDedupK: Option[Int] = None,
      // opt-in winnowed borrowed-content filter after the doc-level
      // collapses (and span dedup, when both are on): whole-doc drop of
      // later-id docs sharing sampled span fingerprints with a keeper
      winnowFilter: Option[Winnow] = None,
      // opt-in entity resolution (stage 3.9): the matcher proposes match
      // pairs (id_a, id_b) over the collapse survivors — edit-distance
      // join, exact Jaccard, LSH+confirm, whatever fits the corpus —
      // and the transitive closure keeps each cluster's min-id member
      // (the recipe's survivor policy). Fixpoint note: the property is
      // preserved for PAIRWISE-CORPUS-INDEPENDENT matchers (a pair's
      // verdict depends only on the two texts — exactJaccardPairs,
      // editSelfJoin): survivors are cluster minima, and any pair among
      // minima would have merged their clusters in the previous run. A
      // corpus-dependent matcher (rarity-weighted) is the documented
      // fourth exception.
      entityMatcher: Option[(DataFrame, String, String) => DataFrame] = None,
      // opt-in exact-Jaccard entity resolution — the entityMatcher
      // special case the incremental pipeline supports (see
      // [[EntityExact]]); mutually exclusive with entityMatcher. Runs
      // as the same stage 3.9 with the same survivor policy, and is
      // pairwise-corpus-independent, so the fixpoint property holds.
      entityExact: Option[EntityExact] = None,
      // opt-in fuzzy edit-distance entity resolution — the second
      // incremental-capable special case (see [[EntityFuzzy]]); same
      // stage 3.9, same survivor policy, pairwise-corpus-independent
      // (the rarity order only tunes candidate selectivity, never the
      // exact levenshtein verdict), so the fixpoint property holds.
      // Mutually exclusive with entityMatcher and entityExact.
      entityFuzzy: Option[EntityFuzzy] = None,
      // opt-in per-group relative quality cut: (groupCol, keepFrac) keeps
      // the top fraction of each group by qualityScore — corpus-dependent
      // like the temperature stage (re-curating with it on keeps shaving
      // each group to its top fraction of the SURVIVORS), so it is the
      // documented third exception to the fixpoint property
      qualityQuantile: Option[(String, Double)] = None,
      // opt-in corpus-LM quality proxy floor: (minCount, floor) keeps docs
      // whose share of corpus-frequent bigrams reaches the floor; docs too
      // short to score (< 2 tokens) are dropped with the salad
      bigramLmFloor: Option[(Long, Double)] = None,
      // opt-in DSIR importance selection (stage 5¼, see [[Dsir]]): docs
      // are kept by how target-like their hashed-n-gram bag is under
      // the supplied target/raw profiles — AFTER cleaning/decontam (so
      // selection never spends its budget on junk the recipe drops
      // anyway), BEFORE temperature balancing (selection changes source
      // counts; the √-rule must price what selection kept)
      dsir: Option[Dsir] = None,
      // opt-in α=1/2 temperature mixture balancing keyed on this source
      // column (Sampling.temperatureSample): dominant sources are
      // down-sampled toward √-balance after cleaning, before splits
      temperatureBalanceCol: Option[String] = None,
      chunk: Option[(Int, Int)] = None)

  /** `release()` drops the cached stage backing `corpus` — call it after
    * the curated corpus has been materialized (written to the lake). */
  case class Result(corpus: DataFrame, stats: DataFrame,
                    release: () => Unit = () => (),
                    audit: Option[DataFrame] = None)

  /** The DSIR keep rule, shared by the batch recipe (stage 5¼) and the
    * incremental delta face ([[CurateIncremental.curateDelta]] — the
    * delta is scored against the caller's corpus-lifetime profiles, so
    * selection is delta-only by construction). Threshold mode keeps
    * margin-positive docs; resample mode keeps docs with probability
    * exp(min(log w, 0)). Working columns are dropped either way — the
    * stage is a pure filter on the recipe's frame. */
  private[graft] def dsirSelect(docs: DataFrame, idCol: String,
                                textCol: String, d: Dsir): DataFrame =
    if (d.resample) {
      val w = Sampling.dsirLogWeights(docs, textCol, d.target, d.raw,
        d.hexDigits, outCol = "__dsir_log_w", charN = d.charN)
      Sampling.weightedSample(w, idCol,
        exp(least(col("__dsir_log_w"), lit(0.0)))).drop("__dsir_log_w")
    } else
      Sampling.dsirScores(docs, textCol, d.target, d.raw, d.hexDigits,
          charN = d.charN)
        .filter(col("kept")).drop("dsir_margin", "kept")

  /** Curate `docs` (idCol, textCol) against `benchmark` (same shape).
    * Output: survivors with `text` redacted and a `split` column; stats
    * counts per stage. Intermediates are cached while consumed and
    * unpersisted as each stage hands off; the final `clean` stays cached
    * (the returned corpus reads it) — call `Result.release()` once the
    * corpus has been written out. */
  def curate(docs: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String,
             cfg: Config = Config()): Result = {
    require(Seq(cfg.entityMatcher.nonEmpty, cfg.entityExact.nonEmpty,
        cfg.entityFuzzy.nonEmpty).count(identity) <= 1,
      "entityMatcher, entityExact and entityFuzzy are mutually exclusive — " +
        "the latter two ARE entity matchers (the incremental-capable " +
        "exact-Jaccard and edit-distance ones)")
    // 0. boilerplate removal (opt-in): corpus-frequent lines stripped
    // before any hashing; docs reduced to nothing are dropped
    val docs0 = cfg.boilerplateMaxDocs match {
      case Some(maxDocs) =>
        val bp = TextAnalysis.removeBoilerplate(docs, idCol, textCol, maxDocs)
          .filter(col("nb_kept") > 0)
          .select(col(idCol), col("clean_text"))
        docs.drop(textCol).join(bp, Seq(idCol))
          .withColumnRenamed("clean_text", textCol)
      case None => docs
    }
    // 0.75 (opt-in) NFC canonicalization: composed and decomposed encoder
    // outputs become byte-identical before any fingerprint is taken
    // (graft_nfc registered defensively — sessions built without the
    // spark.sql.extensions config still resolve it)
    val docs1 =
      if (cfg.nfcCanonical) {
        graft.plans.GraftExtensions.install(docs.sparkSession)
        docs0.withColumn(textCol, TextAnalysis.nfc(col(textCol)))
      } else docs0

    // 1. redact PII before any content hashing (see the fixpoint note in
    // the object doc); rows are never dropped here so the input count is
    // unchanged
    val redacted = docs1.withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
    val total = redacted.count()

    // 1.75 (opt-in) blocklist subtraction on the redacted fingerprint:
    // runs BEFORE exact dedup so a blocked doc can never be a content
    // key's min-id survivor and shadow a legitimate later copy
    val admitted = cfg.blocklist match {
      case Some(bl) =>
        val keyed = redacted.withColumn("__fp",
          TextAnalysis.fingerprint(col(textCol)))
        Blocklist.bloomAntiJoin(keyed, "__fp", bl, "content_key").drop("__fp")
      case None => redacted
    }

    // 2. exact dedup — survivors keep the smallest id per content key
    val exact = Dedup.dedupCorpus(admitted, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count()

    // 3. transitive near-dup collapse. Jaccard is bounded by 1, so a
    // threshold above it provably admits no pair — short-circuit the whole
    // MinHash→LSH→Jaccard→components machinery (the recipe's most
    // expensive stages) instead of running it to compute an empty edge
    // set. A threshold > 1 is the documented "near-dup stage off" knob.
    val (nearDeduped, nNear) =
      if (cfg.nearDupThreshold > 1.0) (exact, nExact)
      else {
        val pairs = Dedup.nearDupPairs(exact, idCol, textCol,
          threshold = cfg.nearDupThreshold, shingleN = cfg.shingleN,
          k = cfg.minhashK, bands = cfg.lshBands, rows = cfg.lshRows,
          maxBucket = cfg.lshMaxBucket)
        val nd = Dedup.survivorsTransitive(exact, pairs, idCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = nd.count()
        // audit=on keeps the cache alive: the fused audit's exact_dup
        // branch reads it instead of re-running dedupCorpus (released
        // in auditRelease)
        if (!cfg.audit) { exact.unpersist(); () }
        (nd, n)
      }

    // 3.5 (opt-in) exact-substring span dedup: verbatim cross-doc runs the
    // LINE-based boilerplate stage can't see (mid-line quotes, templated
    // sentences) are stripped from every non-canonical occurrence; docs
    // reduced to nothing are dropped. Runs AFTER the doc-level collapses so
    // whole-doc duplicates never masquerade as giant spans.
    val spanned = cfg.spanDedupK match {
      case Some(k) =>
        val sd = Dedup.spanDedup(nearDeduped, idCol, textCol, k)
          .withColumn(textCol, col("clean_text"))
          .drop("clean_text", "nb_removed")
          .filter(TextAnalysis.tokenCount(col(textCol)) > 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sd.count()
        if (!cfg.audit) { nearDeduped.unpersist(); () }
        sd
      case None => nearDeduped
    }

    // 3.75 (opt-in) winnowed borrowed-content filter: a doc sharing
    // >= minShared df-capped span fingerprints with an EARLIER-id doc is
    // a partial borrow below the near-dup threshold — it drops whole
    // (span dedup edits text; this stage drops docs: the policy for
    // corpora where borrowing means the doc is derivative, not salvage)
    val winnowed = cfg.winnowFilter match {
      case Some(wf) =>
        val dropIds = Dedup.winnowedPairs(spanned, idCol, textCol,
            wf.k, wf.w, wf.minShared, wf.maxDf)
          .select(col("b_id").as("__borrower")).distinct()
        spanned.join(dropIds, spanned(idCol) === col("__borrower"), "left_anti")
      case None => spanned
    }

    // 3.9 (opt-in) entity resolution: matcher pairs → transitive
    // closure → min-id survivor per cluster. Runs after the content
    // collapses so the matcher prices the deduped corpus, before
    // quality so a cluster's survivor is judged once. The survivors are
    // PERSISTED and materialized like every other stage handoff
    // (recomputable spill-safe cache, not a lineage cut): the matcher +
    // closure is the recipe's most expensive optional pipeline, and
    // without the pin every downstream consumer (quality, decontam, the
    // audit's per-stage id frames) re-ran it — measured 13.5 s → ~6 s
    // on the q135 bench fixture at sf0.1.
    val effectiveMatcher: Option[(DataFrame, String, String) => DataFrame] =
      cfg.entityMatcher.orElse(cfg.entityExact.map(ee =>
        (df: DataFrame, ic: String, tc: String) =>
          Dedup.exactJaccardPairs(df, ic, ee.tokens(col(tc)), ee.tNum, ee.tDen)))
        .orElse(cfg.entityFuzzy.map(ef =>
          (df: DataFrame, ic: String, tc: String) =>
            FuzzyJoin.editSelfJoin(df, ic, tc, ef.maxDist, ef.q)))
    val resolved = effectiveMatcher match {
      case Some(matcher) =>
        val pairs = matcher(winnowed, idCol, textCol).select("id_a", "id_b")
        val res = Dedup.entityIds(winnowed, idCol, pairs)
          .filter(col("entity_id") === col(idCol))
          .drop("entity_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        res.count()
        res
      case None => winnowed
    }

    // 4. quality floor
    val qualityAbs = resolved
      .filter(TextAnalysis.qualityScore(col(textCol)).cast("double") >= cfg.qualityFloor)

    // 4.25 (opt-in) per-group relative quality cut: top keepFrac of each
    // group by score — after the absolute floor so the one window shuffle
    // prices the thinned corpus, before the bigram LM so the corpus model
    // trains on what survives the cut
    val qualityBase = cfg.qualityQuantile match {
      case Some((groupCol, keepFrac)) =>
        TextAnalysis.quantileFilter(qualityAbs, groupCol,
          TextAnalysis.qualityScore(col(textCol)), idCol, keepFrac)
      case None => qualityAbs
    }

    // 4.5 (opt-in) corpus-LM quality proxy: the corpus is its own language
    // model — docs whose share of corpus-frequent bigrams falls below the
    // floor (word salad, mangled encodings) drop, as do docs too short to
    // score (NULL ratio fails the >= filter by design)
    val quality = cfg.bigramLmFloor match {
      case Some((minCount, floor)) =>
        val keep = TextAnalysis
          .bigramCommonRatio(qualityBase, idCol, textCol, minCount)
          .filter(col("common_ratio") >= floor)
          .select(col(idCol))
        qualityBase.join(keep, Seq(idCol), "left_semi")
      case None => qualityBase
    }
    // 5. decontamination: drop docs sharing any n-gram with the benchmark.
    // The corpus side was redacted in stage 1, so the benchmark side gets
    // the SAME redaction first — otherwise every gram spanning an email/
    // phone token differs ("[EMAIL]" vs the literal) and contamination
    // centered on PII values slips through undetected.
    val benchmarkRedacted = benchmark
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
    val contaminated = Dedup.ngramOverlap(quality, benchmarkRedacted, idCol, textCol,
        cfg.contaminationN)
      .select(col(idCol).as("__contaminated_id"))
    val clean = quality
      .join(contaminated, quality(idCol) === col("__contaminated_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClean = clean.count()
    // == nearDeduped when the span stage is off; with audit on the pin
    // survives until auditRelease so the span/winnow audit branches read
    // the cache instead of re-running the near-dedup machinery
    if (!cfg.audit) { spanned.unpersist(); () }

    // 5.25 (opt-in) DSIR importance selection: keep docs by how
    // target-like their hashed-n-gram bag is under the supplied
    // profiles — pure map-side scoring against bucket-space-bounded
    // profile literals, so the stage adds NO shuffle to the recipe
    // persisted when the stage is ON: the per-gram scoring fold is the
    // recipe's heaviest per-doc expression and multiple consumers read
    // this frame (balanced/curated/emitted suffixes, the audit's dsir
    // branch) — unpinned, each re-ran the fold (r17 profile)
    val selected = cfg.dsir match {
      case Some(d) => dsirSelect(clean, idCol, textCol, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case None => clean
    }

    // 5.5 (opt-in) temperature mixture balancing: the √(c_min/c_s) keep
    // rule over SELECTED counts (post-dedup/quality/decontam/DSIR), so a
    // source's budget is spent on text that survived — and before
    // splits, so the balanced mixture is what train/val/test all sample
    // from
    val balanced = cfg.temperatureBalanceCol match {
      case Some(srcCol) => Sampling.temperatureSample(selected, idCol, srcCol)
      case None => selected
    }

    // 6. assign splits (text already redacted before dedup)
    val curated = balanced
      .withColumn("split",
        Sampling.splitAssign(col(idCol), cfg.trainPct, cfg.valPct))

    // 7. chunking (opt-in): emit fixed windows instead of whole docs;
    // each chunk carries its document's split assignment
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

    // opt-in per-doc disposition: walk the stage handoffs in order and
    // tag each doc with the FIRST frame it vanished from. Every join is
    // id-only; the union partitions the INPUT id set exactly (asserted
    // in LlmOpsSpec). Stage names appear even when their stage is
    // configured off — an off stage drops nothing, so it never labels.
    val (auditFrame, auditRelease: (() => Unit)) =
      if (!cfg.audit) (None, () => ())
      else {
        val handoffs: Seq[(String, DataFrame)] = Seq(
          "boilerplate_empty" -> docs1,
          "blocklist" -> admitted,
          "exact_dup" -> exact,
          "near_dup" -> nearDeduped,
          "span_empty" -> spanned,
          "winnow_borrow" -> winnowed,
          "entity_dup" -> resolved,
          "quality_floor" -> qualityAbs,
          "quality_quantile" -> qualityBase,
          "bigram_lm" -> quality,
          "contaminated" -> clean,
          "dsir_dropped" -> selected,
          "temperature_cut" -> balanced) ++
          // the chunk stage can drop a doc too (a zero-token text emits
          // no window) — without this handoff the audit labeled such a
          // doc "survived" while the output contained nothing of it
          // (review r12); distinct because chunking fans each doc out
          (cfg.chunk match {
            case Some(_) =>
              Seq("chunk_empty" -> emitted.select(col(idCol)).distinct())
            case None => Seq.empty
          })
        // fused walk (VERDICT r16 #1): one union + max-depth aggregation
        // instead of one broadcast anti-join per stage. Two pins make it
        // byte-clean (q100's gate caught both regressions): the depth
        // frame is PERSISTED (unpinned, every consumer re-ran all the
        // handoff suffixes), and the exact/nearDeduped/spanned stage
        // caches — already materialized by the recipe's own counts —
        // stay alive until release, so the union's early branches read
        // caches instead of re-running dedupCorpus/LSH/spanDedup (their
        // exchanges were only reused WITHIN the audit job, doubling
        // shuffle-read)
        val depth = fusedAudit(docs, idCol, handoffs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (Some(depth.select(col(idCol), col("stage"))),
          () => {
            depth.unpersist()
            exact.unpersist(); nearDeduped.unpersist(); spanned.unpersist()
            ()
          })
      }
    Result(emitted, stats,
      () => {
        clean.unpersist()
        if (cfg.dsir.nonEmpty) { selected.unpersist(); () }
        if (effectiveMatcher.nonEmpty) { resolved.unpersist(); () }
        auditRelease()
      }, auditFrame)
  }
}
