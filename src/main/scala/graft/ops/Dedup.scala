package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (content-hash), MinHash+LSH near-dup,
  * SimHash, and n-gram Jaccard verification.
  *
  * 100 TB posture: every stage is bucketed — candidate generation goes
  * through LSH band buckets (shuffle on band key), NEVER all-pairs; exact
  * Jaccard runs only on candidate pairs. MinHash signatures use md5 hex
  * strings with lexicographic min as the permutation surrogate: md5 is
  * uniform, so the min over hex strings is a valid MinHash, and the same
  * value is computable in any engine (the DuckDB oracle runs the identical
  * formula).
  */
object Dedup {

  /** Exact content dedup: group by the normalized content fingerprint,
    * keep the smallest id as survivor. One hash-shuffle, partial+final. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("content_key"))
      .agg(
        min(col(idCol)).as("keeper"),
        count(lit(1)).as("nb_copies"))

  /** End-to-end exact dedup: return the corpus with one survivor (the
    * smallest id) per normalized-content group — what a training-data
    * pipeline actually feeds downstream. One shuffle on the content key. */
  def dedupCorpus(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Priority-aware exact dedup: one survivor per normalized-content
    * group, chosen by the caller's priority expression (ascending; ties
    * broken by smallest id) instead of blindly by min id — the "keep the
    * curated copy over the crawl copy" policy of a multi-source corpus.
    * Same single hash-shuffle shape as [[dedupCorpus]]. */
  def dedupCorpusByPriority(df: DataFrame, textCol: String, idCol: String,
                            priority: Column): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(priority.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct word n-gram shingles of a token array. */
  def shingles(tokens: Column, n: Int): Column =
    array_distinct(
      when(size(tokens) >= n,
        transform(sequence(lit(1), size(tokens) - (n - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(n)))))
        .otherwise(array(concat_ws(" ", tokens))))

  /** MinHash permutation constants: k ≤ 16 affine maps h → (a·h+b) mod P
    * over the base hash. All < 2^31 so products stay in signed 64-bit. */
  val MinhashP = 2147483647L // 2^31 - 1
  val MinhashA: Seq[Long] = Seq(1000000007L, 998244353L, 805306457L,
    735632797L, 652567963L, 591861871L, 536870923L, 479001599L, 433494437L,
    370248451L, 312500003L, 268435459L, 201326611L, 167772161L, 134217757L,
    100000007L)
  val MinhashB: Seq[Long] = Seq(12582917L, 23068673L, 37748737L, 52428847L,
    67108879L, 79691779L, 93871597L, 104857601L, 122949829L, 134217689L,
    152339483L, 167772107L, 181818181L, 198491317L, 211106233L, 223092871L)

  /** Engine-portable base hash of a string: the first 12 hex digits of its
    * md5 as a 48-bit integer, reduced mod P. One digest + one codegen'd
    * base conversion per shingle; the k permutations are then integer
    * affine maps, not k more digests. (The DuckDB oracle computes the
    * same integer with an ascii-digit fold — identical values.) */
  def baseHash(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long") % MinhashP

  /** MinHash signature: k affine-permutation minima over the shingle set,
    * as an array of longs. The hashed-shingle array is bound once per row
    * (single-element-array lambda — the interpreted-HOF idiom from
    * [[TextAnalysis.winnowedFingerprints]]): k unbound references would
    * re-digest the whole shingle set k times. The SCALE path is still
    * [[lshBandKeys]]'s explode + k min-aggregates (partial+final); this
    * Column form is for signature-at-rest use cases. */
  def minhashSignature(shingleSet: Column, k: Int): Column = {
    require(k <= MinhashA.length, s"k must be <= ${MinhashA.length}")
    element_at(transform(array(transform(shingleSet, s => baseHash(s))),
      hashes => array((0 until k).map { j =>
        array_min(transform(hashes,
          h => (h * MinhashA(j) + MinhashB(j)) % MinhashP))
      }: _*)), 1)
  }

  /** LSH banding: split the k-length signature into bands of `rows`
    * contiguous values; each band's key is its joined signature slice.
    * Docs sharing ANY band key become candidates. Returns
    * array<struct<band:int, key:string>> for posexplode. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        concat_ws("|",
          transform(slice(sig, b * rows + 1, lit(rows)), x => x.cast("string")))
          .as("key")))

  /** Candidate near-dup pairs via LSH: explode shingles, hash each ONCE,
    * build the k-permutation signature as k min-aggregates (partial+final
    * — the scale shape; a Column-level transform would re-inline the
    * digest k times, higher-order funcs get no subexpression sharing),
    * band the signature, self-join each bucket, emit distinct (a < b)
    * pairs. Joins shuffle on the band key only — bucket sizes, not corpus
    * size, bound the pair blow-up.
    *
    * `maxBucket` is the degenerate-key guard: a boilerplate-heavy or
    * adversarial corpus can put m docs in ONE band bucket, and the clique
    * self-join then emits m² pairs — the one quadratic path in the
    * pipeline. Buckets above the cap degrade to a consecutive-id CHAIN
    * (m−1 pairs): downstream exact verification still scores every emitted
    * pair, and a genuine boilerplate family stays one connected component
    * for [[survivorsTransitive]], so collapse semantics survive while
    * candidate volume turns linear. (Dropping the bucket outright would
    * silently un-dedup the flood.) Pairs whose ONLY collision is an
    * oversized bucket and that are not chain-adjacent are missed — the
    * documented recall trade of any bucket cap. Default = no cap: the
    * plan is byte-identical to the uncapped shape. */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    shingleN: Int, k: Int, bands: Int, rows: Int,
                    maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2 (got $maxBucket)")
    cappedBucketSelfJoin(
      lshBandKeys(df, idCol, textCol, shingleN, k, bands, rows),
      maxBucket).distinct()
  }

  /** (id, band, key) LSH band keys for every doc — the join-ready banded
    * signature form. [[lshCandidates]] self-joins it; incremental curation
    * ([[CurateIncremental]]) persists it as a lake table so tomorrow's
    * delta probes today's corpus without recomputing its signatures. */
  def lshBandKeys(df: DataFrame, idCol: String, textCol: String,
                  shingleN: Int, k: Int, bands: Int, rows: Int): DataFrame = {
    require(bands * rows == k, s"bands*rows must equal k (got $bands*$rows != $k)")
    val hv = df
      .select(col(idCol).as("id"),
        explode(shingles(TextAnalysis.tokens(col(textCol)), shingleN)).as("s"))
      .select(col("id"), baseHash(col("s")).as("hv"))
    val aggs = (0 until k).map(j =>
      min((col("hv") * MinhashA(j) + MinhashB(j)) % MinhashP).as(s"sig$j"))
    val sig = hv.groupBy("id").agg(aggs.head, aggs.tail: _*)
    val bandCols = (0 until bands).map { b =>
      concat_ws("|", (0 until rows).map(r => col(s"sig${b * rows + r}").cast("string")): _*)
    }
    sig.select(col("id"), posexplode(array(bandCols: _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("key"))
  }

  /** Self-join of a banded frame (id, band, key, carry…) with the
    * per-bucket cardinality cap: buckets of size ≤ `maxBucket` pair as a
    * clique, larger buckets as a consecutive-id chain. Both window
    * functions and both joins key on (band, key) — one extra shuffle over
    * the uncapped shape, reused across the four references. Emits
    * (id_a < id_b) plus `c_a`/`c_b` for every carried column. */
  private def cappedBucketSelfJoin(banded: DataFrame, maxBucket: Int,
                                   carry: Seq[String] = Nil): DataFrame = {
    val sameBucket =
      col("a.band") === col("b.band") && col("a.key") === col("b.key")
    def pairCols: Seq[Column] =
      Seq(col("a.id").as("id_a"), col("b.id").as("id_b")) ++
        carry.flatMap(c => Seq(col(s"a.$c").as(s"${c}_a"), col(s"b.$c").as(s"${c}_b")))
    if (maxBucket == Int.MaxValue)
      banded.as("a")
        .join(banded.as("b"), sameBucket && col("a.id") < col("b.id"))
        .select(pairCols: _*)
    else {
      val w = Window.partitionBy("band", "key")
      val sized = banded
        .withColumn("__n", count(lit(1)).over(w))
        .withColumn("__rn", row_number().over(w.orderBy(col("id"))))
      val small = sized.filter(col("__n") <= maxBucket)
      val clique = small.as("a")
        .join(small.as("b"), sameBucket && col("a.id") < col("b.id"))
        .select(pairCols: _*)
      // row_number is ordered by id, so rn adjacency implies id_a < id_b
      val big = sized.filter(col("__n") > maxBucket)
      val chain = big.as("a")
        .join(big.as("b"), sameBucket && col("b.__rn") === col("a.__rn") + 1)
        .select(pairCols: _*)
      clique.unionByName(chain)
    }
  }

  /** Diagnostic for the `maxBucket` guard: the LSH band buckets whose
    * cardinality exceeds the cap under the given config, as
    * (band, key, nb_docs) — the metric a pipeline logs alongside a capped
    * run so degraded buckets are visible, not silent. Empty means the cap
    * never engaged and the run was exactly the uncapped computation. */
  def lshOversizedBuckets(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int, k: Int, bands: Int, rows: Int,
                          maxBucket: Int): DataFrame =
    lshBandKeys(df, idCol, textCol, shingleN, k, bands, rows)
      .groupBy("band", "key")
      .agg(count(lit(1)).as("nb_docs"))
      .filter(col("nb_docs") > maxBucket)

  /** Shared candidate-pair scaffold for the exact set-similarity
    * confirms (review r12: [[jaccardOnPairs]] and [[containmentOnPairs]]
    * each carried a verbatim copy): semi-join the corpus down to the
    * docs the pairs actually reference — candidate pairs are a tiny
    * fraction of the corpus, so the expensive shingle/hash pass must not
    * run corpus-wide — re-shingle just those, attach both sides' shingle
    * sets, and pre-compute the intersection size. */
  private def pairShingles(pairs: DataFrame, df: DataFrame, idCol: String,
                           textCol: String, shingleN: Int): DataFrame = {
    // r17-opt: `pairs` is typically the WHOLE candidate-generation
    // pipeline (minhash signatures → banded self-join → distinct) and is
    // consumed three times below (both id columns feed the semi-join,
    // then the verify joins ride it) — cut it once or every reference
    // re-runs that subtree (the q129 finding: the uncut shape doubled
    // bytes and wall)
    val pairsC = Lineage.cut(pairs)
    val ids = pairsC.select(col("id_a").as("id"))
      .union(pairsC.select(col("id_b").as("id"))).distinct()
    val needed = df.join(ids, df(idCol) === ids("id"), "left_semi")
    // sh feeds BOTH verify joins — uncut, each reference re-ran the
    // corpus scan + semi-join + tokenize/shingle chain (r18-opt, the
    // exactJaccardPairs candSets finding). The pin is candidate-doc-
    // bounded (semi-joined first), never corpus-sized.
    val sh = Lineage.cut(needed.select(col(idCol).as("id"),
      shingles(TextAnalysis.tokens(col(textCol)), shingleN).as("sh")))
    pairsC
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("nb_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
  }

  /** Exact n-gram Jaccard for given pairs: |A∩B| / |A∪B| over distinct
    * shingle sets. Runs only on the candidate pairs (two broadcast-or-
    * shuffle joins against the shingle table), never all-pairs. */
  def jaccardOnPairs(pairs: DataFrame, df: DataFrame, idCol: String,
                     textCol: String, shingleN: Int): DataFrame =
    pairShingles(pairs, df, idCol, textCol, shingleN)
      .withColumn("nb_union",
        size(col("sh_a")) + size(col("sh_b")) - col("nb_inter"))
      // IEEE double division of two exact ints — bit-identical in any
      // engine (decimal division type rules are not)
      .withColumn("jaccard",
        col("nb_inter").cast("double") / col("nb_union").cast("double"))
      .select("id_a", "id_b", "jaccard")

  /** Exact n-gram containment for candidate pairs: |A∩B| ∕ |A| and ∕ |B|
    * over distinct shingle sets — the asymmetric complement to
    * [[jaccardOnPairs]]. An excerpt wholly inside a larger doc scores
    * containment ≈ 1 on its own side while Jaccard (÷ the union) stays
    * low, so symmetric thresholds miss exactly the quote/aggregator-page
    * duplicates this catches. Runs only on candidate pairs, same
    * semi-join-then-reshingle shape as [[jaccardOnPairs]]. */
  def containmentOnPairs(pairs: DataFrame, df: DataFrame, idCol: String,
                         textCol: String, shingleN: Int): DataFrame =
    pairShingles(pairs, df, idCol, textCol, shingleN)
      // IEEE double divisions of exact ints — engine-portable
      .withColumn("containment_a",
        col("nb_inter").cast("double") / size(col("sh_a")).cast("double"))
      .withColumn("containment_b",
        col("nb_inter").cast("double") / size(col("sh_b")).cast("double"))
      .select("id_a", "id_b", "nb_inter", "containment_a", "containment_b")

  /** Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold.
    * `maxBucket` (default unlimited) is the degenerate-key guard passed
    * through to [[lshCandidates]]. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleN: Int = 3, k: Int = 12,
                   bands: Int = 3, rows: Int = 4,
                   maxBucket: Int = Int.MaxValue): DataFrame =
    jaccardOnPairs(
      lshCandidates(df, idCol, textCol, shingleN, k, bands, rows, maxBucket),
      df, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)

  /** 64-bit SimHash over a doc's token array, as a pure columnar fold (no
    * UDF): per token take xxhash64, accumulate a ±1 counter per bit, then
    * assemble the sign bits. Near-duplicate docs land at small Hamming
    * distance; equal buckets are exact-similar clusters. */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    (0 until 64).map { b =>
      val cnt = aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(cnt > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two 64-bit SimHash values. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Keep one survivor per near-dup cluster: treat pairs as edges, collapse
    * each doc to min(neighbor) as cluster rep. SINGLE-HOP: exact for the
    * transitive closure only when clusters are cliques. Near-dup chains
    * (A~B, B~C with no A~C edge — common at scale: successive edits)
    * need [[survivorsTransitive]]. */
  def survivors(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val rep = pairs.select(col("id_a").as("id"), col("id_b").as("dup"))
      .groupBy("dup").agg(min("id").as("rep"))
    df.join(rep, df(idCol) === rep("dup"), "left")
      .filter(col("rep").isNull) // drop docs that point at an earlier rep
      .drop("dup", "rep")
  }

  /** Connected components of the near-dup pair graph by iterated min-label
    * propagation with path halving (the alternating-star family): each
    * round every node adopts the smallest label among itself, its
    * neighbors, and its current label's label, until a fixpoint. Converges
    * in O(log diameter) rounds; each round is two shuffles keyed on id
    * (edge propagation + label-of-label), with a [[Lineage]] cut
    * (executor-local by default, reliable-checkpoint opt-in) keeping
    * the plan flat at any iteration count. Returns
    * (id, lbl) for every node that appears in `pairs`, lbl = component
    * minimum. Throws if `maxIter` rounds don't converge (pathological
    * diameter — raise the bound). */
  def components(pairs: DataFrame, maxIter: Int = 30): DataFrame =
    componentsWithRounds(pairs, maxIter)._1

  /** Edge-count ceiling of the DRIVER union-find fast path (overridable
    * via `spark.graft.components.driverMaxEdges`): the label-propagation
    * rounds cost a fixed ~3 jobs each regardless of data — for the
    * candidate-bounded pair sets an incremental daily produces
    * (hundreds of edges), those fixed costs ARE the wall
    * (tools/ProfileQuery: a composite daily is ~90% per-job overhead).
    * Below the ceiling the edges collect (two longs each — 4096 edges
    * ≈ 64 KiB) and a path-compressed union-find labels them in one
    * pass; above it the distributed rounds run untouched, and the
    * bench's corpus-scale closures (q40's 49k-pair set at 10×) stay on
    * the distributed path so its O(log diameter) evidence keeps being
    * exercised. */
  private val DriverComponentsMaxEdges = 4096L

  /** Path-compressed min-label union-find over collected edges — the
    * driver face of [[components]]: identical (id, lbl = component
    * minimum) contract, property-tested equal to the distributed rounds
    * on random graphs, chains, and cliques. */
  private def driverComponents(edges: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
      }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      // attach the LARGER root under the smaller: the root is always
      // the component minimum, which is exactly the distributed label
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    nodes.toSeq.sorted.map(n => n -> find(n))
  }

  /** [[components]] plus the number of propagation rounds it took to
    * converge — the observable behind the O(log diameter) claim, reported
    * by the scale-stress harness (`graft.tools.ScaleStress`). Returns
    * rounds = 0 when the driver fast path labeled a small pair set. */
  def componentsWithRounds(pairs: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    // Per-round frames are pinned as lazily-localCheckpointed RDDs we hold
    // a handle on: ONE action per round (the convergence count) both
    // materializes the round's labels and counts changed labels, and the
    // superseded round's blocks are unpersisted immediately — r3 ran a
    // second convergence-join job per round and accumulated up to 30 label
    // snapshots in block storage.
    // snapshot the reliable-checkpoint flag ONCE for the whole loop
    // (ADVICE r13): a mid-loop conf flip must not mix cut mechanisms
    // within one invocation — recoverability is all-or-nothing per job
    val rel = Lineage.reliable(spark)

    val pairsDf = pairs.select(col("id_a").as("a"), col("id_b").as("b"))

    // r16 driver fast path (long-keyed only: the driver ordering must
    // equal Spark's `least`/`min`, which holds for integral types but
    // not for every string collation), r18-opt: ONE bounded action —
    // `limit(max+1).collect()` — both decides fit and fetches the edges.
    // The r17 shape materialized the pair RDD (under AQE, `.rdd` alone
    // runs each shuffle stage of the candidate plan as its own job),
    // counted it, then collected from the cache — three driver round
    // trips per call, and for the candidate-bounded pair sets an
    // incremental daily produces (hundreds of edges) those fixed costs
    // WERE the wall (q150: the components pins were the profile's
    // biggest job root, ~69 jobs). The trade: when the probe OVERFLOWS
    // (> maxDriverEdges), the distributed path below re-executes the
    // pair plan once more — measured at q40 scale (49k pairs, the
    // bench's corpus-scale closure) and priced under the per-call fixed
    // cost it saves everywhere else; `driverMaxEdges = 0` disables the
    // probe entirely for callers that know they are corpus-scale.
    val isLongKeyed =
      pairsDf.schema("a").dataType == org.apache.spark.sql.types.LongType
    val maxDriverEdges = spark.conf
      .getOption("spark.graft.components.driverMaxEdges")
      .flatMap(v => scala.util.Try(v.toLong).toOption) // malformed conf
      .getOrElse(DriverComponentsMaxEdges)             // falls back (ADVICE r16)
    if (isLongKeyed && maxDriverEdges > 0) {
      // coalesce(1): CollectLimit otherwise scans the final stage
      // incrementally (1, 4, 16, … partitions — one JOB each) hunting
      // for max+1 rows it usually won't find; one merged partition makes
      // the probe exactly one job, and the limit's early stop keeps the
      // single task from draining more than max+1 rows of the upstream
      // shuffle when the pair set IS huge
      val probe = pairsDf.coalesce(1)
        .limit(math.min(maxDriverEdges + 1, Int.MaxValue.toLong).toInt)
        .collect()
      if (probe.length <= maxDriverEdges) {
        import spark.implicits._
        return (driverComponents(probe.map(r => (r.getLong(0), r.getLong(1))))
          .toDF("id", "lbl"), 0)
      }
    }

    // r17: pin the PAIR set before symmetrizing — the edge frame unions
    // the pair plan with its swapped self, and Spark evaluates the two
    // union branches independently, so an unpinned upstream (an entity
    // probe, an LSH band walk) ran END TO END TWICE (q150 profiled 156
    // AQE-stage jobs rooted at this line; half were the second
    // evaluation). One count materializes the pinned pairs; everything
    // downstream reads the cache.
    val pairsRdd = pairsDf.rdd
    Lineage.mark(pairsRdd, rel)
    pairsRdd.count()
    val pinned = spark.createDataFrame(pairsRdd, pairsDf.schema)

    val edgesDf = pinned
      .unionByName(pinned.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val edgesRdd = edgesDf.rdd
    Lineage.mark(edgesRdd, rel)
    edgesRdd.count() // materialize once; the rounds read the cache
    pairsRdd.unpersist(blocking = false)
    val edges = spark.createDataFrame(edgesRdd, edgesDf.schema)

    val labels0 = edges.groupBy("a").agg(min(col("b")).as("m"))
      .select(col("a").as("id"), least(col("a"), col("m")).as("lbl"))
    var labelsRdd = labels0.rdd
    Lineage.mark(labelsRdd, rel)
    var labels = spark.createDataFrame(labelsRdd, labels0.schema)

    // r17 adaptive handoff (VERDICT r16 #2): after 1-2 rounds the
    // un-converged residual of a typical closure is tiny, yet every
    // remaining O(log diameter) round still costs ~3 fixed-overhead
    // jobs. When the changed-label count drops under the threshold,
    // probe the CONTRACTED (quotient) graph — one edge per pair of
    // adjacent label classes — with a limit-capped collect; if it fits,
    // a driver union-find over the contracted edges finishes the merge
    // and the root map broadcasts back over the cached labels. Exact at
    // ANY round boundary: lbl(n) is always an id from n's component, a
    // connected component's label classes are quotient-connected, and
    // the component minimum m always holds lbl(m)=m and is
    // edge-incident while >1 class remains — so the quotient union-find
    // root IS the component minimum (property-gated against the pure
    // distributed rounds). `spark.graft.components.handoffMaxEdges`
    // overrides; 0 disables.
    val handoffMax = spark.conf
      .getOption("spark.graft.components.handoffMaxEdges")
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .getOrElse(DriverComponentsMaxEdges)
    var probeBelow = handoffMax // halves after a failed probe

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // propagate each neighbor's current label across every edge, carrying
      // each node's previous label through the aggregate (max ignores the
      // NULLs on edge-propagated rows; every node has exactly one own-row)…
      val viaEdge = edges.join(labels, edges("b") === labels("id"))
        .select(edges("a").as("id"), col("lbl"),
          lit(null).cast(labels.schema("lbl").dataType).as("old"))
      val prop = labels.select(col("id"), col("lbl"), col("lbl").as("old"))
        .unionByName(viaEdge)
        .groupBy("id").agg(min(col("lbl")).as("lbl"), max(col("old")).as("old"))
      // …then path-halve: adopt the label of the current label
      val hop = prop.select(col("id").as("lbl"), col("lbl").as("lbl2"))
      val newLbl = least(col("lbl"), coalesce(col("lbl2"), col("lbl")))
      val nextDf = prop.join(hop, Seq("lbl"), "left")
        .select(col("id"), newLbl.as("lbl"), (newLbl =!= col("old")).as("chg"))
      val nextRdd = nextDf.rdd
      Lineage.mark(nextRdd, rel)
      // the single per-round action: caches this round, counts the delta
      changed = nextRdd.filter(_.getBoolean(2)).count()
      val prev = labelsRdd
      labelsRdd = nextRdd
      labels = spark.createDataFrame(nextRdd, nextDf.schema).drop("chg")
      prev.unpersist(blocking = false)
      iter += 1

      if (changed > 0 && changed <= probeBelow && isLongKeyed) {
        val q = edges
          .join(labels.select(col("id").as("a"), col("lbl").as("__la")), Seq("a"))
          .join(labels.select(col("id").as("b"), col("lbl").as("__lb")), Seq("b"))
          .filter(col("__la") =!= col("__lb"))
          .select(least(col("__la"), col("__lb")).as("x"),
            greatest(col("__la"), col("__lb")).as("y"))
          .distinct()
        // limit(n+1): ONE bounded job decides fit AND fetches the edges
        val qRows = q.limit(math.min(handoffMax + 1, Int.MaxValue.toLong).toInt)
          .collect()
        if (qRows.length <= handoffMax) {
          val roots = driverComponents(
            qRows.map(r => (r.getLong(0), r.getLong(1)))).toMap
          import spark.implicits._
          val finished =
            if (roots.isEmpty) labels
            else labels.join(
                broadcast(roots.toSeq.toDF("lbl", "__root")), Seq("lbl"), "left")
              .select(col("id"),
                coalesce(col("__root"), col("lbl")).as("lbl"))
          edgesRdd.unpersist(blocking = false)
          return (finished, iter)
        }
        probeBelow = changed / 2 // don't re-probe until the frontier halves
      }
    }
    require(changed == 0, s"components did not converge in $maxIter rounds")
    // the result is a leaf over labelsRdd's cached blocks — the edge blocks
    // are no longer reachable from it
    edgesRdd.unpersist(blocking = false)
    (labels, iter)
  }

  /** Transitive near-dup survivors: collapse each connected component of
    * the pair graph to its smallest id, so chains (A~B~C) fold to one
    * survivor even without an A~C edge. Docs in no pair survive
    * untouched (anti-join keeps them). */
  def survivorsTransitive(df: DataFrame, pairs: DataFrame, idCol: String,
                          maxIter: Int = 30): DataFrame = {
    val dups = components(pairs, maxIter)
      .filter(col("lbl") < col("id")).select(col("id").as("__dup"))
    df.join(dups, df(idCol) === dups("__dup"), "left_anti")
  }

  /** [[survivorsTransitive]] with a caller-chosen representative: each
    * near-dup cluster keeps its best row by `priority` (ascending, ties
    * by smallest id) instead of blindly the min id — the policy that
    * keeps the ORIGINAL over its truncations/re-crawls when derived
    * copies happen to carry smaller ids (the near-dup analog of
    * [[dedupCorpusByPriority]]: same ascending-priority contract).
    *
    * 100 TB posture: the components rounds are [[components]]' (id-keyed
    * shuffles, O(log diameter)); the representative window shuffles ONLY
    * cluster-member rows — dup-mass-bound, a few % of a deduped corpus,
    * never corpus-sized — and everything else passes through one
    * anti-join against the member-id frame. */
  def survivorsTransitiveByPriority(df: DataFrame, pairs: DataFrame,
                                    idCol: String, priority: Column,
                                    maxIter: Int = 30): DataFrame = {
    val comps = components(pairs, maxIter)
      .select(col("id").as("__cid"), col("lbl").as("__lbl"))
    val members = df.join(comps, df(idCol) === col("__cid"))
    val w = Window.partitionBy(col("__lbl"))
      .orderBy(priority.asc, col(idCol).asc)
    val winners = members.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__cid", "__lbl")
    val loners = df.join(comps, df(idCol) === col("__cid"), "left_anti")
    loners.unionByName(winners)
  }

  /** SimHash near-dup pairs via bit-band bucketing: each hash splits into
    * `bands` contiguous `width`-bit keys; candidates share at least one
    * (band, key) — by pigeonhole, every pair with hamming < bands is
    * guaranteed caught, pairs beyond that are caught with probability
    * falling in their distance. Exact popcount verifies candidates.
    *
    * 100 TB posture: the join shuffles on (band, key) — bucket count is
    * bands × 2^width, so pair the 64-bit [[graft.functions.SimHash64Expr]]
    * hash with 16-bit bands (4 × 65536 buckets) at scale; the 16-bit demo
    * surface (q50) uses 4-bit bands so its DuckDB oracle stays cheap.
    *
    * `maxBucket` caps per-bucket cardinality exactly as in
    * [[lshCandidates]]: an oversized (band, key) bucket — e.g. every
    * template page hashing to the same prefix — degrades from an m²
    * clique to an m−1 consecutive-id chain; exact popcount still verifies
    * every emitted pair. */
  def simhashNearDups(df: DataFrame, idCol: String, hashCol: String,
                      bands: Int = 4, width: Int = 16,
                      maxHamming: Int = 3,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    val mask = (1L << width) - 1
    val bandKeys = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("h"), b * width).bitwiseAND(mask).as("key"))
    }: _*)
    val banded = df
      .select(col(idCol).as("id"), col(hashCol).cast("long").as("h"))
      .select(col("id"), col("h"), explode(bandKeys).as("bk"))
      .select(col("id"), col("h"), col("bk.band").as("band"), col("bk.key").as("key"))
    cappedBucketSelfJoin(banded, maxBucket, carry = Seq("h"))
      .select(col("id_a"), col("id_b"), col("h_a").as("ha"), col("h_b").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Decontamination: corpus docs sharing at least one word n-gram with
    * any benchmark doc, with the count of distinct shared grams. The
    * benchmark side (an eval suite) is bounded by construction, so its
    * distinct gram set is broadcast and the corpus never shuffles — each
    * corpus partition streams its grams past the broadcast set. Returns
    * (idCol, nb_shared) for contaminated docs only. */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame): DataFrame = {
      val toks = TextAnalysis.tokens(col(textCol))
      df.withColumn("__toks", toks).filter(size(col("__toks")) >= n)
        .select(col(idCol),
          explode(array_distinct(TextAnalysis.ngrams(col("__toks"), n))).as("__g"))
    }
    val benchGrams = grams(benchmark).select("__g").distinct()
    grams(corpus)
      .join(broadcast(benchGrams), Seq("__g"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("nb_shared")) // grams are distinct per doc already
  }

  /** Exact-substring span dedup — the within-document flavor of dedup the
    * whole-doc operators above cannot express: a k-token window whose text
    * occurs verbatim anywhere else in the corpus is removed from every
    * occurrence EXCEPT the canonical one (lexicographically least
    * (id, position)), and the surviving tokens are re-joined. This is the
    * distributed re-expression of suffix-array substring dedup (reference
    * corpora dedup this way to kill boilerplate shared across otherwise
    * distinct pages); a window-hash equi-group replaces the suffix array,
    * trading "any length ≥ k" for "aligned k-windows" — overlapping
    * duplicated windows merge back into maximal spans via position union,
    * so a shared run of m ≥ k tokens is removed in full (its m−k+1
    * windows all collide).
    *
    * Scale shape: windows are hashed map-side (one md5 per window; the
    * full 128 bits as a 16-byte BINARY group key — a 31-bit reduction
    * would manufacture false duplicate pairs at corpus scale, and the
    * hex string would double the width of the op's dominant shuffle);
    * the duplicate scan shuffles (hash, id, pos) triples only, never
    * text; marked span
    * starts return to their doc via one int-only shuffle keyed by id; the
    * final join back to the corpus is AQE-broadcastable whenever few docs
    * are affected (the common case) and falls back to a key shuffle
    * otherwise. Token removal is a map-side higher-order filter: cost
    * O(len · covered) per AFFECTED doc only, bounded by doc length —
    * chunk pathological megadocs upstream (Packing.chunk) as usual.
    *
    * Returns every input row with `clean_text` (textCol with duplicated
    * spans removed — possibly empty) and `nb_removed` (tokens dropped).
    * Docs shorter than k tokens pass through untouched. */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
                k: Int = 10): DataFrame = {
    require(k >= 2, "span window must cover at least 2 tokens")
    val toks = TextAnalysis.tokens(col(textCol))
    // (id, pos, h): one row per k-token window, hashed before the shuffle
    val wins = df
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col(idCol), explode(
        transform(sequence(lit(1), size(col("__toks")) - (k - 1)),
          i => struct(i.as("pos"),
            unhex(md5(concat_ws(" ", slice(col("__toks"), i, lit(k))))).as("h"))))
        .as("w"))
      .select(col(idCol), col("w.pos").as("pos"), col("w.h").as("h"))
    // canonical occurrence = least (id, pos) per hash; every later
    // occurrence of a duplicated hash is a span to remove. One shuffle
    // on h serves both window functions.
    val byHash = Window.partitionBy("h").orderBy(col(idCol), col("pos"))
    val marked = wins
      .withColumn("rn", row_number().over(byHash))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("cnt") > 1 && col("rn") > 1)
    // per-doc covered token positions (ints only through the shuffle)
    val covered = marked
      .groupBy(col(idCol))
      .agg(array_sort(array_distinct(flatten(collect_list(
        sequence(col("pos"), col("pos") + (k - 1)))))).as("__covered"))
    df.join(covered, Seq(idCol), "left")
      .withColumn("__cov",
        coalesce(col("__covered"), array().cast("array<int>")))
      .withColumn("__kept", filter(TextAnalysis.tokens(col(textCol)),
        (t, i) => !array_contains(col("__cov"), (i + 1).cast("int"))))
      .withColumn("clean_text", concat_ws(" ", col("__kept")))
      .withColumn("nb_removed",
        size(TextAnalysis.tokens(col(textCol))) - size(col("__kept")))
      .drop("__covered", "__cov", "__kept")
  }

  /** Winnowed-fingerprint candidate pairs: docs sharing at least
    * `minShared` winnowed k-gram fingerprints
    * ([[TextAnalysis.winnowedFingerprints]]), with the shared count —
    * the MOSS-style plagiarism/borrowed-span detector. Where [[spanDedup]]
    * indexes EVERY k-gram window (exact, token-linear state),
    * winnowing samples ~2∕(w+1) of them with the guarantee that any
    * shared run of ≥ w+k-1 tokens still collides — the dial for
    * span-level matching when the exhaustive index is too heavy.
    *
    * Shape: fingerprints computed map-side, exploded to (fp, id) pairs
    * (a hash + a long — no text rides any shuffle); fingerprints seen in
    * more than `maxDf` docs are dropped before pairing (corpus-frequent
    * boilerplate spans otherwise flood their bucket quadratically — the
    * same cap rationale as `lshCandidates.maxBucket`, and ubiquitous
    * spans are boilerplate, not borrowing); then a self-join per
    * fingerprint and a partial+final count per (a, b). */
  /** (id, fp) winnowed-fingerprint rows for every doc — the join-ready
    * exploded form [[winnowedPairs]] pairs on and the incremental layer
    * ([[CurateIncremental]]) persists so tomorrow's delta probes today's
    * corpus spans without recomputing them. */
  def winnowTable(df: DataFrame, idCol: String, textCol: String,
                  k: Int, w: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(TextAnalysis.winnowedFingerprints(
        TextAnalysis.tokens(col(textCol)), k, w)).as("fp"))

  def winnowedPairs(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 5, w: Int = 4, minShared: Int = 2,
                    maxDf: Int = 10): DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"minShared >= 1 and maxDf >= 2 required (got $minShared, $maxDf)")
    val fps = winnowTable(df, idCol, textCol, k, w)
    val rare = Window.partitionBy("fp")
    val pairs = fps
      .withColumn("__df", count(lit(1)).over(rare))
      .filter(col("__df") <= maxDf)
    pairs.as("a").join(pairs.as("b"), Seq("fp"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("nb_shared"))
      .filter(col("nb_shared") >= minShared)
  }

  /** Entity ids for EVERY row of `df` from a match-pair frame
    * (id_a, id_b): transitive closure assigns each matched row its
    * cluster's smallest member id; unmatched rows are their own entity.
    * The resolution face of the dedup machinery — compose the pair
    * frame from whatever matchers fit (edit-distance join, exact
    * Jaccard, LSH+confirm) and this turns pairs into a stable
    * entity-keyed corpus. Costs [[components]]' id-keyed rounds plus
    * one left join; singleton rows never enter the closure. */
  def entityIds(df: DataFrame, idCol: String, pairs: DataFrame,
                maxIter: Int = 30): DataFrame = {
    // reserved __-prefixed names on the closure side: a caller frame that
    // already carries a column named `lbl` (or `id`) must not make the
    // coalesce ambiguous (ADVICE r12)
    val labels = components(pairs, maxIter)
      .withColumnsRenamed(Map("id" -> "__cid", "lbl" -> "__lbl"))
    df.join(labels, df(idCol) === col("__cid"), "left")
      .withColumn("entity_id", coalesce(col("__lbl"), col(idCol)))
      .drop("__cid", "__lbl")
  }

  /** EXACT set-similarity self-join (AllPairs/PPJoin family): all
    * unordered pairs whose token-set Jaccard is ≥ tNum/tDen — the exact
    * complement of [[nearDupPairs]] (MinHash-LSH trades recall for
    * bounded candidates; this trades a larger-but-still-prefix-bounded
    * candidate set for a guarantee).
    *
    * Lossless pruning chain, every step integer-exact:
    *  - size filter: t·|A| ≤ |B| ≤ |A|∕t (cross-multiplied);
    *  - prefix filter: order each set's tokens by global rarity
    *    (df asc, token); a pair with J ≥ t has overlap
    *    α ≥ ⌈t·max(|A|,|B|)⌉, so each side's first |S| − ⌈t·|S|⌉ + 1
    *    tokens must intersect — only those are indexed, and corpus-wide
    *    boilerplate tokens (everyone's commonest) fall outside every
    *    prefix;
    *  - verify (r17-opt): the PACKED distinct-token arrays of exactly
    *    the docs some candidate pair references (a semi-join against the
    *    candidate ids) attach to each pair and the overlap is
    *    `size(array_intersect)` — no aggregation, and the verify
    *    exchanges are bounded by candidate-doc arrays (4 longs + two
    *    packed arrays per pair), never the exploded corpus — passing
    *    `o·tDen ≥ tNum·(|A|+|B|−o)`.
    *
    * The token-df table is corpus-scale (shingle vocabularies grow with
    * the corpus), so rarity attaches via a token-keyed shuffle join,
    * never a broadcast. Executor-storage pins are CANDIDATE-BOUNDED,
    * never corpus-sized: the candidate-pair frame (4 longs per row) and
    * the candidate docs' packed token arrays are `Lineage.cut` because
    * each feeds multiple consumers (re-execution doubled bytes/wall —
    * r17/r18 measurements), while the corpus tokenization itself is
    * recomputed per consumer (scan + split are cheap and
    * lineage-recoverable — r12 eagerly `localCheckpoint`ed the whole
    * token-array corpus, a corpus-sized, non-recomputable executor-
    * storage pin that a single lost executor would kill at cluster
    * scale; the cut frames here are pair-mass-sized, a few % of a
    * deduped corpus).
    *
    * NULL-token contract: `array_intersect` counts a shared NULL element
    * as overlap where the old explode + null-unsafe equi-join never
    * matched NULLs — `base` therefore drops NULL tokens explicitly, so
    * both shapes agree on any input (no engine tokenizer emits NULLs
    * today; the filter is the guard that keeps that a non-assumption).
    * Returns (id_a, id_b, overlap, n_a, n_b) with id_a < id_b —
    * integer columns only, so the result hash-compares exactly. Empty
    * token sets drop. */
  def exactJaccardPairs(df: DataFrame, idCol: String, tokensCol: Column,
                        tNum: Long, tDen: Long): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"threshold must be in (0, 1]: got $tNum/$tDen")
    val base = df.select(col(idCol).as("id"),
      // NULL tokens drop (see scaladoc: array_intersect would count a
      // shared NULL; the exploded equi-join shape never did)
      array_distinct(filter(tokensCol, x => x.isNotNull)).as("ts"))
      .filter(size(col("ts")) > 0)
    val toks = base.select(col("id"), size(col("ts")).cast("long").as("n"),
      explode(col("ts")).as("tok"))
    // prefix length: n - ceil(t*n) + 1, ceil in exact integers
    val prefLen = col("n") - expr(s"($tNum * n + $tDen - 1) div $tDen") + lit(1)
    // token df via a WINDOW over the one exploded pass, not a separate
    // groupBy + join (r18-opt, guide §2.4): the join form consumed
    // `toks` twice, so the corpus tokenize/shingle/explode subtree ran
    // twice per invocation — the window computes the same per-token
    // count on the single pass and drops the df-aggregation exchange
    // (both forms shuffle the full exploded rows by tok exactly once;
    // a pathologically hot token now lands in one window partition
    // where the join form could AQE-skew-split it, but the hot-key
    // flood this could matter for is exactly what `lshCandidates.
    // maxBucket`-style upstream hygiene bounds)
    val pref = toks
      .withColumn("tdf", count(lit(1)).over(Window.partitionBy("tok")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy("tdf", "tok")))
      .filter(col("rk") <= prefLen)
      .select("id", "n", "tok")
    val ca = pref.withColumnsRenamed(Map("id" -> "id_a", "n" -> "n_a"))
    val cb = pref.withColumnsRenamed(Map("id" -> "id_b", "n" -> "n_b"))
    // n_a/n_b are functionally dependent on the ids — carrying them
    // through the distinct costs nothing and saves the verify step two
    // size joins
    val cand = ca.join(cb, "tok")
      .filter(col("id_a") < col("id_b") &&
        col("n_b") * tDen >= col("n_a") * tNum &&
        col("n_a") * tDen >= col("n_b") * tNum)
      .select("id_a", "id_b", "n_a", "n_b").distinct()
    // verify (r17-opt, guide §2.3): overlap = |ts_a ∩ ts_b| computed
    // map-side from the two docs' PACKED token arrays, attached only
    // for ids that actually appear in a candidate pair (semi-join).
    // The previous shape fanned every pair out to ALL of side a's
    // exploded tokens and re-aggregated (cand ⋈ toks_a ⋈ toks_b →
    // groupBy) — two corpus-exploded shuffles plus a fan-out-sized
    // aggregation exchange; this shape shuffles candidate-doc arrays
    // once and needs no aggregation at all. array_intersect hashes the
    // smaller side (O(n_a + n_b) per pair), and both arrays are
    // already distinct, so its size is exactly the old shared-token
    // count.
    // cand is consumed three times below (both id columns feed the
    // semi-join, then the verify joins ride it) — cut it once or every
    // reference re-runs the whole prefix/window/self-join subtree
    // (measured: the uncut shape DOUBLED q129's bytes)
    val candC = Lineage.cut(cand)
    val ids = candC.select(col("id_a").as("id"))
      .unionAll(candC.select(col("id_b").as("id"))).distinct()
    // candSets feeds BOTH verify joins — uncut, each reference re-ran
    // the whole corpus tokenize/shingle pass plus the semi-join (the
    // r17-opt cut-placement rule: the re-executed subtree has its own
    // shuffles, so the cut wins; measured r18: q129 two full
    // scan→split→shingle→Exchange subtrees → one). The pin is
    // candidate-bounded (packed arrays of candidate docs only), never
    // corpus-sized — see the scaladoc.
    val candSets = Lineage.cut(base.join(ids, Seq("id"), "left_semi"))
    candC
      .join(candSets.select(col("id").as("id_a"), col("ts").as("__ts_a")), "id_a")
      .join(candSets.select(col("id").as("id_b"), col("ts").as("__ts_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__ts_a"), col("__ts_b"))).cast("long")
          .as("overlap"),
        col("n_a"), col("n_b"))
      .filter(col("overlap") * tDen >=
        (col("n_a") + col("n_b") - col("overlap")) * tNum)
      .select("id_a", "id_b", "overlap", "n_a", "n_b")
  }
}
