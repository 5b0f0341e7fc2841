package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths, per the training-data-pipeline contract:
  *  - brute-force cosine/dot top-k — the exactness baseline, O(|Q|·|C|),
  *    correct at any scale when |Q| is small (the query side broadcasts);
  *  - LSH-bucketed ANN (signed random projections) — the scale path:
  *    candidates come from hash buckets, so the join shuffles on the
  *    sketch key instead of crossing the full corpus.
  *
  * All arithmetic is columnar fold over built-ins (zip_with/aggregate) —
  * no UDFs, no collect.
  */
object Similarity {

  /** Dot product of two equal-length float/double array columns, folded
    * left-to-right in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (NULL when either vector has zero norm). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn)
  }

  /** Probe the embedding dimensionality from the data (one-row action).
    * Callers that know the dim statically should pass it instead. Returns 0
    * on an empty / all-NULL frame so callers degrade to an empty result
    * instead of throwing. */
  def probeDim(df: DataFrame, vecCol: String): Int =
    df.filter(col(vecCol).isNotNull).select(size(col(vecCol))).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)

  /** Brute-force top-k by cosine: every query row against every corpus
    * row, ranked per query with an id tiebreak.
    *
    * CONTRACT: `queries` must be a FIXED-cardinality set (a bounded list
    * of probe vectors — thousands, not a fraction of the corpus). It is
    * broadcast, so the corpus never shuffles and the per-query ranking is
    * a window over the corpus partition; a query side that grows with the
    * corpus grows the broadcast with it and OOMs executors at scale. For
    * corpus-proportional query sides use [[annTopK]] /
    * [[annTopKQuantized]] (bucket-keyed shuffle, no broadcast). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 qId: String = "q_id", qVec: String = "q_vec",
                 cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val scored = broadcast(queries).crossJoin(corpus)
      .filter(col(qId) =!= col(cId))
      .withColumn("cosine", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(qId).orderBy(col("cosine").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(qId, cId, "rank", "cosine")
  }

  /** Hard-negative mining for contrastive training pairs: per query, the
    * top-k most-similar corpus rows from a DIFFERENT group — the nearest
    * vectors that are NOT positives, which is exactly what an embedding
    * model trains against. `group` is whatever defines a positive set:
    * a class label, a near-dup cluster id, a source document.
    *
    * Same broadcast-bounded shape and CONTRACT as [[cosineTopK]] (fixed
    * query cardinality; corpus never shuffles); the group exclusion is
    * applied BEFORE the per-query ranking window, so same-group rows
    * never occupy candidate slots. NULL groups are treated as distinct
    * from everything, including other NULLs (a row with no positive set
    * can only serve as a negative). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    qId: String = "q_id", qVec: String = "q_vec",
                    qGroup: String = "q_group",
                    cId: String = "c_id", cVec: String = "c_vec",
                    cGroup: String = "c_group"): DataFrame = {
    val differentGroup =
      col(qGroup).isNull || col(cGroup).isNull || col(qGroup) =!= col(cGroup)
    val scored = broadcast(queries).crossJoin(corpus)
      .filter(col(qId) =!= col(cId) && differentGroup)
      .withColumn("cosine", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(qId).orderBy(col("cosine").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(qId, qGroup, cId, cGroup, "rank", "cosine")
  }

  /** Deterministic signed-random-projection planes: `nPlanes` × `dim`
    * ±1 entries from a seeded PRNG (driver-side constants, folded into
    * the plan as literals — broadcast for free). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Fixed-point quantization of a float/double vector column onto the
    * integer grid — THE shared primitive behind every `*Quantized`
    * operator (review r12: seven call sites each re-defined the same
    * lambda; one formula, one place). float×2^20 is exact in double and
    * round-ties-away agrees across engines. */
  private[ops] def quantize(c: Column, quantScale: Double): Column =
    transform(c, x => round(x.cast("double") * quantScale).cast("long"))

  /** Exact integer dot product of two quantized vector columns — the
    * shared confirm/rerank primitive. */
  private def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** LSH sketch: the vector's sign bit against each projection plane,
    * packed into a long. Nearby vectors agree on most bits. */
  def srpSketch(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Distributed spherical k-means (Lloyd's) over an embedding column —
    * the centroid trainer for [[ivfTopK]]: random pseudo-centroids give
    * cells of wildly uneven quality; `iters` rounds of trained means lift
    * recall-per-probe (measured in PERF.md §recall).
    *
    * Scale shape: each round is (a) a MAP-SIDE cell assignment — the k
    * current centroids fold into the plan as literals, argmax over k dot
    * products, no join, no broadcast variable — then (b) one aggregate of
    * `posexplode`d (cell, dimIdx, value) rows. Partial aggregation means
    * the exchange carries at most `partitions × k × dim` pre-combined
    * rows, INDEPENDENT of corpus size; the driver holds only k×dim
    * doubles.
    *
    * Init is deterministic k-means‖ (Bahmani et al., VLDB'12): one
    * bounded action picks the lexicographically-least vector, then
    * ⌈log₂ k⌉ oversampling rounds each draw ~2k candidates with
    * probability ∝ their spherical distance 1−maxCos to the candidates
    * so far — "randomness" is a seeded xxhash64 of the vector itself, so
    * the draw is identical at any partition count — and one weighting
    * pass counts the corpus behind each candidate; the ≤1+2k·log₂k
    * weighted candidates are then clustered on the driver (greedy
    * k-center seeding + weighted Lloyd — k-center greedy on the FULL
    * corpus was the r4–r6 init, O(k) sequential full scans; k-means‖
    * needs O(log k) passes for the same no-merged-seeds guarantee, and
    * `seed` now genuinely varies the draw). Zero-norm vectors are
    * excluded (no direction to cluster); a corpus with fewer than k
    * distinct directions yields a SHORTER centroid list, never padded
    * duplicates. Empty cells keep their previous centroid; means are
    * L2-normalized each round (spherical k-means — consistent with
    * cosine/dot cell scoring). */
  def kmeansCentroids(corpus: DataFrame, vecCol: String,
                      k: Int, iters: Int = 5, seed: Long = 42L,
                      dim: Int = -1): Seq[Seq[Double]] = {
    val d = if (dim > 0) dim else probeDim(corpus, vecCol)
    if (d == 0) return Nil
    // zero-norm vectors (failed-embed artifacts) carry no direction: they
    // cosine-NULL against everything and oversampling would rank them
    // "most distant" and burn draws on them — drop them up front
    val vecsAll = corpus.filter(col(vecCol).isNotNull)
      .select(transform(col(vecCol), x => x.cast("double")).as("__v"))
    val vecs = vecsAll.filter(dot(col("__v"), col("__v")) > 0).cache()
    def normalize(p: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(p.map(x => x * x).sum)
      if (n > 0) p.map(_ / n) else p
    }
    // the init works on the DISTINCT-vector frame with multiplicities:
    // the per-row "coin" is a seeded hash of the vector itself (partition-
    // independent), so duplicate vectors share one coin — drawing each
    // distinct value with P = 1−(1−p)^m marginalizes the per-point
    // independent coins of the paper exactly, where hashing raw rows
    // would under-sample duplicate-heavy mass
    val grouped = vecs.groupBy("__v").agg(count(lit(1)).as("__m")).cache()
    // seed candidate: the lexicographically-least vector — deterministic
    // under any partitioning, one bounded one-row action
    val first = grouped.orderBy(col("__v").asc).limit(1).collect().headOption
      .map(r => normalize(r.getSeq[Double](0).toVector).toVector)
      .getOrElse { grouped.unpersist(); vecs.unpersist(); return Nil }
    var cands = Vector(first)
    def worstSim = {
      val sims = cands.map(c => cosine(col("__v"), array(c.map(lit): _*)))
      if (sims.length == 1) sims.head else greatest(sims: _*)
    }
    // oversampling rounds: ℓ = 2k expected draws per round, ⌈log₂ k⌉ rounds
    val ell = 2.0 * k
    val rounds = math.max(1, math.ceil(math.log(k.toDouble) / math.log(2.0)).toInt)
    var round = 0
    var saturated = false
    while (round < rounds && !saturated) {
      val dist = lit(1.0) - worstSim // spherical distance proxy, ∈ [0, 2]
      // one action: total distance mass φ over points (m-weighted)
      val phi = grouped.agg(sum(dist * col("__m"))).head().getDouble(0)
      if (phi <= 1e-12) saturated = true // every vector sits ON a candidate
      else {
        // seeded uniform in [0,1) from the vector's own components —
        // identical at any partition count, varies with seed and round
        val u = pmod(
          xxhash64(concat_ws(",",
            transform(col("__v"), x => x.cast("string"))), lit(seed + round)),
          lit(1000000L)).cast("double") / 1000000.0
        val pPoint = least(lit(1.0), dist * ell / phi)
        val pValue = lit(1.0) - pow(lit(1.0) - pPoint, col("__m").cast("double"))
        // one action: collect this round's draws (expected ≤ ℓ values)
        val drawn = grouped.filter(u < pValue)
          .select(col("__v")).collect()
          .map(r => normalize(r.getSeq[Double](0).toVector).toVector)
        val fresh = drawn.filterNot(v => cands.exists(c => sqDist(c, v) < 1e-24))
          .distinct.sortBy(_.mkString(","))
        if (fresh.isEmpty) saturated = true
        else cands = cands ++ fresh
      }
      round += 1
    }
    // rescue for degenerate draws (tiny or duplicate-heavy corpora where
    // oversampling under-delivered): greedy farthest-point one-row
    // actions top the candidate set up to k — bounded by k and normally
    // never taken at scale
    var exhausted = false
    while (cands.length < k && !exhausted) {
      val top = grouped.select((lit(1.0) - worstSim).as("__d"), col("__v"))
        .orderBy(col("__d").desc, col("__v").asc).limit(1).collect().headOption
      top match {
        case Some(r) if r.getDouble(0) > 1e-12 =>
          cands = cands :+ normalize(r.getSeq[Double](1).toVector).toVector
        case _ => exhausted = true // only duplicates of candidates remain
      }
    }
    // one action: weight every candidate by the point mass it would absorb
    // (nearest-candidate argmax via array_max over (score, -index))
    val cellExpr = -array_max(array(cands.zipWithIndex.map { case (c, i) =>
      struct(dot(col("__v"), array(c.map(lit): _*)).as("s"), lit(-i).as("ni"))
    }: _*)).getField("ni")
    val weights = grouped.select(cellExpr.as("__cell"), col("__m"))
      .groupBy("__cell").agg(sum("__m").as("__w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    grouped.unpersist()
    var centroids = weightedKCenterLloyd(
      cands.zipWithIndex.map { case (c, i) => (c, weights.getOrElse(i, 0L)) },
      k)
    for (_ <- 0 until iters) {
      val cell = -array_max(array(centroids.zipWithIndex.map { case (ctr, i) =>
        struct(dot(col("__v"), array(ctr.map(lit): _*)).as("s"), lit(-i).as("ni"))
      }: _*)).getField("ni")
      val means = vecs.withColumn("__cell", cell)
        .select(col("__cell"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos").agg(avg("__x").as("__m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          val m = new Array[Double](d)
          rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
          c -> m.toSeq
        }
      centroids = centroids.zipWithIndex.map { case (prev, i) =>
        means.get(i).map { m =>
          val n = math.sqrt(m.map(x => x * x).sum)
          if (n > 0) m.map(_ / n) else prev
        }.getOrElse(prev) // empty cell keeps its previous centroid
      }
    }
    vecs.unpersist()
    centroids
  }

  private def sqDist(a: Seq[Double], b: Seq[Double]): Double =
    a.iterator.zip(b.iterator).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Driver-side weighted spherical k-means over the tiny k-means‖
    * candidate set (≤ 1 + 2k·⌈log₂k⌉ rows): greedy k-center seeding —
    * the farthest-point rule that used to run as k DISTRIBUTED full
    * scans, now over candidates only — then weighted Lloyd to a
    * fixpoint. Deterministic throughout: candidates are processed in
    * (weight desc, lexicographic) order and every argmax tie breaks on
    * the first index. Identical centroids collapse, so fewer than k
    * distinct directions yield a shorter list. */
  private[ops] def weightedKCenterLloyd(cands: Seq[(Seq[Double], Long)],
                                        k: Int): Seq[Seq[Double]] = {
    def dotD(a: Seq[Double], b: Seq[Double]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    def normalize(p: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(dotD(p, p)); if (n > 0) p.map(_ / n) else p
    }
    // a zero-count candidate is still a real data vector — floor at 1
    val pts = cands.map { case (v, w) => (normalize(v), math.max(w, 1L)) }
    if (pts.isEmpty) return Nil
    val ordered = pts.sortBy { case (v, w) => (-w, v.mkString(",")) }
    var seeds = Vector(ordered.head._1)
    var exhausted = false
    while (seeds.length < k && !exhausted) {
      val (bestV, bestD) = ordered.iterator.map { case (v, _) =>
        (v, 1.0 - seeds.iterator.map(s => dotD(v, s)).max)
      }.maxBy(_._2)
      if (bestD < 1e-12) exhausted = true else seeds = seeds :+ bestV
    }
    var ctrs: Seq[Seq[Double]] = seeds
    var it = 0
    var changed = true
    while (changed && it < 30) {
      val assign = pts.map { case (v, w) =>
        val best = ctrs.indices.maxBy(i => (dotD(v, ctrs(i)), -i))
        (best, v, w)
      }
      val next = ctrs.indices.map { i =>
        val mine = assign.filter(_._1 == i)
        if (mine.isEmpty) ctrs(i)
        else {
          val tw = mine.map(_._3).sum.toDouble
          normalize(mine
            .map { case (_, v, w) => v.map(_ * w) }
            .reduce((a, b) => a.lazyZip(b).map(_ + _))
            .map(_ / tw))
        }
      }
      changed = ctrs.lazyZip(next).exists((a, b) => sqDist(a, b) > 1e-18)
      ctrs = next
      it += 1
    }
    ctrs.distinct
  }

  /** IVF-style ANN top-k: corpus vectors are assigned to their nearest
    * of `nCentroids` deterministic pseudo-centroids (seeded ±1 planes
    * reused as centroid directions — or the [[kmeansCentroids]]-trained
    * set when `centroids` is passed), queries probe their `nProbes`
    * nearest centroids, and exact cosine ranks within the probed cells.
    * The inverted-file analog of [[annTopK]]: same bucket-join shape,
    * cell assignment by nearest-centroid instead of hash prefix. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbes: Int = 4, seed: Long = 42L,
              dim: Int = -1, trained: Seq[Seq[Double]] = Nil,
              qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    // trained centroids carry the dimension — no probe action needed
    val centroids =
      if (trained.nonEmpty) trained
      else randomPlanes(nCentroids,
        if (dim > 0) dim else probeDim(corpus, cVec), seed)
    def cellScores(vec: Column): Seq[(Int, Column)] =
      centroids.zipWithIndex.map { case (ctr, i) =>
        i -> dot(vec, array(ctr.map(lit): _*))
      }
    // corpus: single best cell — array_max over (score, -index) structs, so
    // ties go to the lowest centroid index. NOT a struct reduce with
    // when(): that duplicates the accumulated tree each step and the
    // expression grows 2^nCentroids (OOMs the planner at 16 centroids).
    val cCell = corpus.withColumn("cell",
      -array_max(array(cellScores(col(cVec)).map { case (i, s) =>
        struct(s.as("s"), lit(-i).as("ni")) }: _*))
        .getField("ni"))
    // queries: top nProbes cells, exploded. Ties on the score break to
    // the LOWEST centroid index — struct(s, -i) desc — matching the
    // corpus assignment above and the quantized flavor (review r12: the
    // old struct(s, i) desc broke ties to the HIGHEST index, so the
    // float and quantized flavors could probe different cells at a tie
    // on the nProbes boundary)
    val qCells = queries.withColumn("cell",
      explode(transform(slice(
        sort_array(array(cellScores(col(qVec)).map { case (i, s) =>
          struct(s.as("s"), lit(-i).as("ni")) }: _*), asc = false),
        1, nProbes), s => -s.getField("ni"))))
    // corpus rows live in exactly one cell and query probes are distinct
    // cells, so each (q, c) pair appears at most once — no dedup exchange
    // needed; the ranking window sees only (q_id, c_id, cosine)
    val scored = qCells.join(cCell, Seq("cell"))
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("cosine"))
    val w = Window.partitionBy(qId).orderBy(col("cosine").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(qId, cId, "rank", "cosine")
  }

  /** Deterministic quantized IVF top-k — the bit-reproducible flavor of
    * [[ivfTopK]] and its oracle-checkable face: vectors are rounded to
    * fixed point (float×2^20 exact in double), the seeded ±1
    * pseudo-centroid scores and the rerank dot are then pure integer
    * arithmetic, so cell assignment, probing and ranking are identical at
    * any partition count and in any engine. Tie-breaks are pinned: the
    * corpus cell is the FIRST maximum-score centroid (score desc, index
    * asc), query probes are the top `nProbes` by the same order.
    *
    * 100 TB posture: same inverted-file shape as [[ivfTopK]] — candidates
    * come only from probed cells, the join shuffles on the cell id,
    * nothing broadcasts, nothing crosses the full corpus.
    *
    * `trained` accepts [[kmeansCentroids]] output: fractional components
    * are rounded onto the SAME fixed-point scale as the vectors, so the
    * cell scores stay exact longs and results are bit-reproducible GIVEN
    * A FIXED trained list (with ±1 defaults the centroid scale is 1 — the
    * historical scoring — so existing oracle results are unchanged).
    * Re-TRAINING is only partition-stable to ~1e-9 (avg combine order),
    * so a component near a rounding boundary could flip between training
    * runs — persist the trained list once via [[IndexStore]] and load it
    * everywhere the index is queried; the lake table is the fixed set. */
  def ivfTopKQuantized(queries: DataFrame, corpus: DataFrame, k: Int,
                       nCentroids: Int = 16, nProbes: Int = 4, seed: Long = 42L,
                       quantScale: Double = 1048576.0, dim: Int = -1,
                       trained: Seq[Seq[Double]] = Nil,
                       qId: String = "q_id", qVec: String = "q_vec",
                       cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    // integer centroid components: ±1 stay ±1; trained fractions round
    // onto the vector fixed-point grid (trained centroids carry the
    // dimension — no probe action needed)
    val centroids: Seq[Seq[Long]] =
      if (trained.nonEmpty) trained.map(_.map(x => math.round(x * quantScale)))
      else randomPlanes(nCentroids,
        if (dim > 0) dim else probeDim(corpus, cVec), seed).map(_.map(_.toLong))
    def quant(c: Column): Column = quantize(c, quantScale)
    // integer centroid score: quantized components × integer centroid —
    // exact longs (quantScale² × dim ≈ 2^46 headroom)
    def cellScore(vec: Column, ctr: Seq[Long]): Column =
      aggregate(zip_with(vec, array(ctr.map(lit): _*), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    val q = queries.select(col(qId), quant(col(qVec)).as("__qv"))
    val c = corpus.select(col(cId), quant(col(cVec)).as("__cv"))
    // corpus: single best cell — array_max over (score, -index) structs
    // (lexicographic), so ties go to the lowest centroid index. NOT a
    // struct reduce with when(): that duplicates the accumulated tree each
    // step and the expression grows 2^nCentroids.
    val cCell = c.withColumn("__cell",
      -array_max(array(centroids.zipWithIndex.map { case (ctr, i) =>
        struct(cellScore(col("__cv"), ctr).as("s"), lit(-i).as("ni")) }: _*))
        .getField("ni"))
    // queries: top nProbes cells — the struct carries -i so the descending
    // lexicographic sort breaks score ties on the lowest index
    val qCells = q.withColumn("__cell",
      explode(transform(slice(
        sort_array(array(centroids.zipWithIndex.map { case (ctr, i) =>
          struct(cellScore(col("__qv"), ctr).as("s"), lit(-i).as("ni")) }: _*),
          asc = false),
        1, nProbes), s => -s.getField("ni"))))
    // corpus rows live in exactly one cell and query probes are distinct
    // cells, so each (q, c) pair appears at most once — no dedup needed;
    // the ranking window sees only (q_id, c_id, dot_i)
    val scored = qCells.join(cCell, Seq("__cell"))
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId),
        aggregate(zip_with(col("__qv"), col("__cv"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot_i"))
    val w = Window.partitionBy(qId).orderBy(col("dot_i").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("rank"),
        (col("dot_i").cast("double") / (quantScale * quantScale)).as("dot"))
  }

  /** Per-block PQ codebooks: `nBlocks` independent sets of `codebookSize`
    * seeded ±1 sub-centroids of dimension `subDim` (block b seeds with
    * seed+b so blocks differ). Driver-side literals, like [[randomPlanes]]. */
  def pqCodebooks(nBlocks: Int, codebookSize: Int, subDim: Int,
                  seed: Long): Seq[Seq[Seq[Double]]] =
    (0 until nBlocks).map(b => randomPlanes(codebookSize, subDim, seed + b))

  /** Train per-block PQ codebooks on the corpus: block b of every vector
    * (dim/nBlocks entries) is clustered with the same deterministic
    * k-means‖ machinery as the IVF cells ([[kmeansCentroids]], seeded
    * seed+b so blocks differ), then each unit sub-centroid is rescaled to
    * the least-squares magnitude of its cell — s = mean projection of the
    * cell's sub-vectors onto the direction, the optimal per-codeword
    * scalar — so codewords carry magnitude, which spherical centroids
    * alone would lose and ADC reconstruction needs. Driver-side result
    * ([[pqCodebooks]] shape); persist via
    * [[IndexStore.savePqCodebooks]]. A degenerate block (fewer distinct
    * directions than `codebookSize`) yields a shorter book, never padded
    * duplicates. */
  def trainPqCodebooks(corpus: DataFrame, vecCol: String,
                       nBlocks: Int, codebookSize: Int, iters: Int = 5,
                       seed: Long = 11L, dim: Int = -1): Seq[Seq[Seq[Double]]] = {
    val d = if (dim > 0) dim else probeDim(corpus, vecCol)
    require(d % nBlocks == 0, s"dim $d not divisible into $nBlocks blocks")
    val w = d / nBlocks
    val dv = corpus.filter(col(vecCol).isNotNull)
      .select(transform(col(vecCol), x => x.cast("double")).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (0 until nBlocks).map { b =>
        val blk = dv.select(slice(col("__v"), b * w + 1, w).as("__blk"))
        val dirs = kmeansCentroids(blk, "__blk", codebookSize,
          iters, seed + b, w)
        // degenerate block (every sub-vector zero-norm, e.g. zero-padded
        // dims): degrade to ONE zero codeword — its ADC contribution is
        // exactly 0 for every query, which is also the true dot product
        // against an all-zero block. An EMPTY book broke scoring outright
        // (array_max over zero struct columns fails analysis — review r12).
        if (dirs.isEmpty) Seq(Seq.fill(w)(0.0))
        else {
          // one bounded pass per block: cell assignment by max projection
          // (argmax via the struct/array_max idiom), then per-cell mean
          // projection = the least-squares codeword magnitude
          val projs = array(dirs.map(c =>
            dot(col("__blk"), array(c.map(lit): _*))): _*)
          val cell = (-array_max(array(dirs.zipWithIndex.map { case (c, i) =>
            struct(dot(col("__blk"), array(c.map(lit): _*)).as("s"),
              lit(-i).as("ni")) }: _*)).getField("ni")).cast("int")
          val scales = blk
            .withColumn("__cell", cell)
            .withColumn("__proj", element_at(projs, col("__cell") + 1))
            .groupBy("__cell").agg(avg("__proj").as("__s"))
            .collect()
            .map(r => r.getInt(0) -> r.getDouble(1)).toMap
          dirs.zipWithIndex.map { case (c, i) =>
            val s = scales.getOrElse(i, 1.0)
            if (s > 0) c.map(_ * s) else c // degenerate cell: keep the unit direction
          }
        }
      }
    } finally { dv.unpersist(); () }
  }

  /** Product-quantization top-k with asymmetric-distance scoring — the
    * standard memory-compression ANN: each corpus vector is reduced to
    * `nBlocks` small codes (nearest ±1 sub-centroid per block, exact
    * integer scores, ties to the lowest code), its full vector is
    * DROPPED, and queries score candidates as Σ_b dot(q_block,
    * centroid[code_b]) — the ADC approximation, exact integers here so
    * ranking is bit-reproducible and the DuckDB oracle replays it.
    *
    * 100 TB posture: the corpus side carries nBlocks small ints instead
    * of `dim` floats (~32× smaller shuffle/cache footprint); the scoring
    * join is against the CODES, with the bounded query side broadcast.
    * Compose with [[annTopKQuantized]]-style buckets when the query side
    * is corpus-sized. */
  /** Integer codebooks for the PQ scoring expressions: trained books
    * (fractional doubles) quantize by `quantScale` like the vectors;
    * the seeded ±1 books stay ±1 (their entries are already exact).
    * The score unit differs accordingly — scale² vs scale — which only
    * affects the display column, never the ranking. */
  private def intBooks(trained: Seq[Seq[Seq[Double]]], nBlocks: Int,
                       codebookSize: Int, w: Int, seed: Long,
                       quantScale: Double): (Seq[Seq[Seq[Long]]], Double) =
    if (trained.nonEmpty) {
      require(trained.length == nBlocks,
        s"trained books cover ${trained.length} blocks, expected $nBlocks")
      (trained.map(_.map(_.map(x => math.round(x * quantScale)))),
        quantScale * quantScale)
    } else
      (pqCodebooks(nBlocks, codebookSize, w, seed).map(_.map(_.map(_.toLong))),
        quantScale)

  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             nBlocks: Int = 8, codebookSize: Int = 8, seed: Long = 11L,
             quantScale: Double = 1048576.0, dim: Int = -1,
             trained: Seq[Seq[Seq[Double]]] = Nil,
             qId: String = "q_id", qVec: String = "q_vec",
             cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val d = if (dim > 0) dim else probeDim(corpus, cVec)
    require(d % nBlocks == 0, s"dim $d not divisible into $nBlocks blocks")
    val w = d / nBlocks
    val (books, scoreDiv) =
      intBooks(trained, nBlocks, codebookSize, w, seed, quantScale)
    def quant(c: Column): Column = quantize(c, quantScale)
    def dotLit(block: Column, ctr: Seq[Long]): Column =
      aggregate(zip_with(block, array(ctr.map(lit): _*),
        (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    val q = queries.select(col(qId), quant(col(qVec)).as("__qv"))
    // corpus → codes only (the vector is dropped — that IS the point).
    // Code assignment is nearest-codeword by Euclidean distance:
    // argmax(2·dot − ‖c‖²). For the ±1 books every ‖c‖² = w, so this is
    // the historical max-dot rule shifted by a constant — identical
    // codes, identical ties (q52/q53 oracles unaffected); for trained
    // books with varying magnitudes the norm term is what makes the
    // assignment correct.
    val cCoded = corpus.select(col(cId), quant(col(cVec)).as("__cv"))
      .withColumn("__codes", array((0 until nBlocks).map { b =>
        val cBlock = slice(col("__cv"), b * w + 1, w)
        -array_max(array(books(b).zipWithIndex.map { case (ctr, j) =>
          struct((dotLit(cBlock, ctr) * 2 - lit(ctr.map(x => x * x).sum)).as("s"),
            lit(-j).as("nj")) }: _*))
          .getField("nj")
      }: _*))
      .drop("__cv")
    val scoreI = (0 until nBlocks).map { b =>
      val qBlock = slice(col("__qv"), b * w + 1, w)
      val ctrTable = array(books(b).map(ctr =>
        array(ctr.map(lit): _*)): _*)
      aggregate(zip_with(qBlock,
        element_at(ctrTable, element_at(col("__codes"), b + 1) + 1),
        (a, c) => a * c), lit(0L), (acc, x) => acc + x)
    }.reduce(_ + _)
    // score inside the projection so the ranking window carries only
    // (q_id, c_id, score_i), not the query vector and code arrays
    val scored = broadcast(q).crossJoin(cCoded)
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId), scoreI.as("score_i"))
    val win = Window.partitionBy(qId).orderBy(col("score_i").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("rank"),
        (col("score_i").cast("double") / scoreDiv).as("score"))
  }

  /** IVF-PQ top-k — the standard big-corpus ANN architecture, composed
    * from the library's two verified pieces: [[ivfTopKQuantized]]'s cell
    * probing bounds the CANDIDATES (no broadcast of anything
    * corpus-sized, join keyed on the cell) and [[pqTopK]]'s codes
    * compress the CORPUS (codes instead of floats, integer ADC scoring).
    * All arithmetic exact integers, all tie-breaks pinned, so the DuckDB
    * oracle replays cell assignment, code assignment and ADC ranking
    * bit-for-bit. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                nCentroids: Int = 16, nProbes: Int = 4, cellSeed: Long = 42L,
                nBlocks: Int = 8, codebookSize: Int = 8, pqSeed: Long = 11L,
                quantScale: Double = 1048576.0, dim: Int = -1,
                trained: Seq[Seq[Seq[Double]]] = Nil,
                qId: String = "q_id", qVec: String = "q_vec",
                cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val d = if (dim > 0) dim else probeDim(corpus, cVec)
    require(d % nBlocks == 0, s"dim $d not divisible into $nBlocks blocks")
    val w = d / nBlocks
    val centroids = randomPlanes(nCentroids, d, cellSeed)
    val (books, scoreDiv) =
      intBooks(trained, nBlocks, codebookSize, w, pqSeed, quantScale)
    def quant(c: Column): Column = quantize(c, quantScale)
    def dotCell(vec: Column, ctr: Seq[Double]): Column =
      aggregate(zip_with(vec, array(ctr.map(x => lit(x.toLong)): _*),
        (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    def dotLit(vec: Column, ctr: Seq[Long]): Column =
      aggregate(zip_with(vec, array(ctr.map(lit): _*),
        (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    val q = queries.select(col(qId), quant(col(qVec)).as("__qv"))
    val c = corpus.select(col(cId), quant(col(cVec)).as("__cv"))
    // corpus: best cell + PQ codes, full vector dropped. Code assignment
    // is distance-correct argmax(2·dot − ‖c‖²) — a constant shift for the
    // ±1 books (see pqTopK), required for trained books.
    val cCoded = c
      .withColumn("__cell",
        -array_max(array(centroids.zipWithIndex.map { case (ctr, i) =>
          struct(dotCell(col("__cv"), ctr).as("s"), lit(-i).as("ni")) }: _*))
          .getField("ni"))
      .withColumn("__codes", array((0 until nBlocks).map { b =>
        val cBlock = slice(col("__cv"), b * w + 1, w)
        -array_max(array(books(b).zipWithIndex.map { case (ctr, j) =>
          struct((dotLit(cBlock, ctr) * 2 - lit(ctr.map(x => x * x).sum)).as("s"),
            lit(-j).as("nj")) }: _*))
          .getField("nj")
      }: _*))
      .drop("__cv")
    // queries: top nProbes cells, full vector kept for ADC tables
    val qCells = q.withColumn("__cell",
      explode(transform(slice(
        sort_array(array(centroids.zipWithIndex.map { case (ctr, i) =>
          struct(dotCell(col("__qv"), ctr).as("s"), lit(-i).as("ni")) }: _*),
          asc = false),
        1, nProbes), s => -s.getField("ni"))))
    val scoreI = (0 until nBlocks).map { b =>
      val qBlock = slice(col("__qv"), b * w + 1, w)
      val ctrTable = array(books(b).map(ctr =>
        array(ctr.map(lit): _*)): _*)
      aggregate(zip_with(qBlock,
        element_at(ctrTable, element_at(col("__codes"), b + 1) + 1),
        (a, x) => a * x), lit(0L), (acc, x) => acc + x)
    }.reduce(_ + _)
    // score inside the projection so the ranking window carries only
    // (q_id, c_id, score_i), not the query vector and code arrays
    val scored = qCells.join(cCoded, Seq("__cell"))
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId), scoreI.as("score_i"))
    val win = Window.partitionBy(qId).orderBy(col("score_i").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("rank"),
        (col("score_i").cast("double") / scoreDiv).as("score"))
  }

  /** Deterministic quantized embedding near-dup pairs — the
    * bit-reproducible flavor of [[embeddingNearDups]]: fixed-point
    * quantization makes the SRP bucket bits and the dot/norm sums exact
    * integers; the only floating-point step is the final
    * dot/√(‖a‖²·‖b‖²) with a pinned evaluation order (each IEEE op
    * rounds once, identically in any engine). Returns
    * (id_a < id_b, cosine ≥ threshold).
    *
    * 100 TB posture: identical to [[embeddingNearDups]] — candidates only
    * from shared sketch buckets, bucket-keyed shuffle, never all-pairs. */
  def embeddingNearDupsQuantized(df: DataFrame, idCol: String, vecCol: String,
                                 threshold: Double, nPlanes: Int = 8,
                                 prefixBits: Int = 8,
                                 seeds: Seq[Long] = Seq(42L, 1042L),
                                 quantScale: Double = 1048576.0,
                                 dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else probeDim(df, vecCol)
    val mask = (1L << prefixBits) - 1
    // prefix planes only — bit-identical after the mask (see annTopK)
    val nEff = math.min(nPlanes, prefixBits)
    def quant(c: Column): Column = quantize(c, quantScale)
    val base = df.select(col(idCol).as("id"), quant(col(vecCol)).as("v"))
    // candidate generation carries ONLY (id, bucket) — the bucket self-join
    // and the multi-seed distinct() exchange small fixed-width keys, never
    // the vectors; vectors come back via two id-keyed joins on the (tiny)
    // candidate set, the jaccardOnPairs shape (Dedup.jaccardOnPairs)
    val pairs = seeds.map { seed =>
      val planes = randomPlanes(nEff, d, seed)
      // srpSketch folds integer-valued doubles < 2^53 — exact sign bits
      val b = base.select(col("id"),
        srpSketch(col("v"), planes).bitwiseAND(mask).as("bucket"))
      b.as("a").join(b.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    }.reduce(_ unionByName _).distinct()
    def dotL(a: Column, b: Column): Column = dotLong(a, b)
    // norms fold once per VECTOR before the candidate join (ids are
    // linear, candidates are not) — each candidate pair then pays exactly
    // one fold, the dot; the integers are identical either way
    val withNorm = base.withColumn("n2", dotL(col("v"), col("v")))
    pairs
      .join(withNorm.select(col("id").as("id_a"),
        col("v").as("va"), col("n2").as("na2")), Seq("id_a"))
      .join(withNorm.select(col("id").as("id_b"),
        col("v").as("vb"), col("n2").as("nb2")), Seq("id_b"))
      .withColumn("dot_i", dotL(col("va"), col("vb")))
      .withColumn("cosine",
        when(col("na2") > 0 && col("nb2") > 0,
          col("dot_i").cast("double")
            / sqrt(col("na2").cast("double") * col("nb2").cast("double"))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** SemDeDup-style clustered semantic dedup: assign every vector to its
    * ONE nearest-centroid cell (the [[ivfTopKQuantized]] assignment —
    * seeded ±1 pseudo-centroids, or trained/persisted centroids rounded
    * onto the same fixed-point grid; first-max tie-break), then confirm
    * near-duplicates with exact integer cosine WITHIN each cell only.
    * This is the cluster-then-dedup recipe (SemDeDup): against
    * [[embeddingNearDupsQuantized]] the candidates come from a spatial
    * partition instead of hyperplane buckets — denser recall inside a
    * cell, the documented miss for pairs straddling a cell boundary, and
    * candidate volume Σ|cell|² bounded by choosing nCentroids ≈
    * corpus ∕ target-cell-size (reuse the corpus's persisted IVF
    * centroids via [[IndexStore]] so the dedup geometry matches the
    * serving index and training happens once).
    *
    * 100 TB posture: the cell self-join shuffles (id, cell) pairs only;
    * vectors return via two id-keyed joins onto the candidate set; the
    * cosine is exact integer arithmetic surfaced as one pinned IEEE
    * expression, so any engine reproduces it bit-for-bit. Returns
    * (id_a < id_b, cosine ≥ threshold). */
  def semanticNearDupsQuantized(df: DataFrame, idCol: String, vecCol: String,
                                threshold: Double, nCentroids: Int = 16,
                                seed: Long = 42L,
                                quantScale: Double = 1048576.0, dim: Int = -1,
                                trained: Seq[Seq[Double]] = Nil): DataFrame = {
    val centroids: Seq[Seq[Long]] =
      if (trained.nonEmpty) trained.map(_.map(x => math.round(x * quantScale)))
      else randomPlanes(nCentroids,
        if (dim > 0) dim else probeDim(df, vecCol), seed).map(_.map(_.toLong))
    def quant(c: Column): Column = quantize(c, quantScale)
    def cellScore(vec: Column, ctr: Seq[Long]): Column =
      aggregate(zip_with(vec, array(ctr.map(lit): _*), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    val base = df.select(col(idCol).as("id"), quant(col(vecCol)).as("v"))
    // single best cell per vector — array_max over (score, -index)
    // structs (ties → lowest centroid index); never a when() reduce
    val cells0 = base.select(col("id"),
      (-array_max(array(centroids.zipWithIndex.map { case (ctr, i) =>
        struct(cellScore(col("v"), ctr).as("s"), lit(-i).as("ni")) }: _*))
        .getField("ni")).as("cell"))
    // The assignment is the op's hottest expression (nCentroids folds per
    // row, interpreted HOFs) and feeds BOTH sides of the self-join;
    // without a lineage cut the planner duplicates it per join side AND
    // pushes an isnotnull(cell) copy into the scan filter — 4 evaluations
    // per row (measured 4× the op's wall). Materialize the skinny
    // (id, cell) frame once instead: two longs per vector, bounded at any
    // corpus size the (id, cell) shuffle itself can handle.
    val cells = Lineage.cut(cells0)
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    def dotL(a: Column, b: Column): Column = dotLong(a, b)
    // norms are per-VECTOR, so fold them once per id before the candidate
    // join — a pair then pays one fold (the dot), not three (same exact
    // integers either way; candidates within a cell are quadratic, ids
    // are linear)
    val withNorm = base.withColumn("n2", dotL(col("v"), col("v")))
    pairs
      .join(withNorm.select(col("id").as("id_a"),
        col("v").as("va"), col("n2").as("na2")), Seq("id_a"))
      .join(withNorm.select(col("id").as("id_b"),
        col("v").as("vb"), col("n2").as("nb2")), Seq("id_b"))
      .withColumn("dot_i", dotL(col("va"), col("vb")))
      .withColumn("cosine",
        when(col("na2") > 0 && col("nb2") > 0,
          col("dot_i").cast("double")
            / sqrt(col("na2").cast("double") * col("nb2").cast("double"))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs: SRP-bucketed candidates (multi
    * -probe), exact cosine ≥ threshold confirmation — the embedding-space
    * dedup family (never all-pairs). Returns (id_a < id_b, cosine). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, nPlanes: Int = 16,
                        prefixBits: Int = 8,
                        seeds: Seq[Long] = Seq(42L, 1042L),
                        dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else probeDim(df, vecCol)
    val mask = (1L << prefixBits) - 1
    // prefix planes only — bit-identical after the mask, half the
    // per-row dot products at the defaults (see annTopK, review r12)
    val nEff = math.min(nPlanes, prefixBits)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // (id, bucket) only through the self-join and distinct — vectors are
    // joined back onto the candidate pairs afterward (jaccardOnPairs shape),
    // so no exchange keys on array payloads
    val pairs = seeds.map { seed =>
      val planes = randomPlanes(nEff, d, seed)
      val b = base.select(col("id"),
        srpSketch(col("v"), planes).bitwiseAND(mask).as("bucket"))
      b.as("a").join(b.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    }.reduce(_ unionByName _).distinct()
    pairs
      .join(base.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Semantic decontamination: corpus rows whose embedding cosine against
    * ANY benchmark vector reaches `threshold` — the embedding-space
    * complement of [[Dedup.ngramOverlap]]: a paraphrased or re-worded eval
    * item shares no verbatim n-grams with its source but stays nearly
    * collinear in embedding space, so the n-gram gate misses exactly what
    * this one catches (and vice versa — run both).
    *
    * 100 TB posture, same as the n-gram gate: the benchmark side (an eval
    * suite) is bounded by construction, so its quantized vectors BROADCAST
    * and each corpus partition streams past them map-side — corpus vectors
    * never shuffle; the only exchange is the final per-id partial+final
    * aggregate. Scoring quantizes both sides onto a fixed-point grid and
    * accumulates exact integer dot/norms, surfaced as one pinned IEEE
    * division — bit-reproducible in any engine. Returns (idCol,
    * nb_matches, max_cosine) for contaminated corpus rows only. */
  def semanticOverlap(corpus: DataFrame, benchmark: DataFrame,
                      idCol: String, vecCol: String, threshold: Double,
                      quantScale: Double = 1048576.0): DataFrame = {
    def quant(c: Column): Column = quantize(c, quantScale)
    def dotL(a: Column, b: Column): Column = dotLong(a, b)
    val bench = benchmark
      .select(quant(col(vecCol)).as("__bv"))
      .withColumn("__nb2", dotL(col("__bv"), col("__bv")))
      .filter(col("__nb2") > 0)
    corpus
      .select(col(idCol), quant(col(vecCol)).as("__cv"))
      .withColumn("__na2", dotL(col("__cv"), col("__cv")))
      .filter(col("__na2") > 0)
      .crossJoin(broadcast(bench))
      .withColumn("__cos",
        dotL(col("__cv"), col("__bv")).cast("double")
          / sqrt(col("__na2").cast("double") * col("__nb2").cast("double")))
      .filter(col("__cos") >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nb_matches"), max(col("__cos")).as("max_cosine"))
  }

  /** ANN top-k: bucket corpus and queries by the first `prefixBits` of the
    * SRP sketch, rank by exact cosine within the bucket only. Recall is
    * traded for a shuffle keyed on the bucket instead of a cross join —
    * the 100 TB path. Increase recall with multiple plane seeds (probes). */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int = 16, prefixBits: Int = 8, seeds: Seq[Long] = Seq(42L, 1042L),
              dim: Int = -1,
              qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val d = if (dim > 0) dim else probeDim(corpus, cVec)
    val mask = (1L << prefixBits) - 1
    // only the low prefixBits bits survive the mask, and randomPlanes is
    // a sequential seeded draw (plane p of n is plane p of any n' > p) —
    // so generating planes beyond the prefix paid dim-length dot products
    // per row for bits the mask discarded (review r12); the sketch is
    // bit-identical with just the prefix planes
    val nEff = math.min(nPlanes, prefixBits)
    // bucket join and multi-probe distinct carry only (q_id, c_id) —
    // vectors join back onto the deduped pairs, and the ranking window
    // sees only (q_id, c_id, cosine)
    val pairs = seeds.map { seed =>
      val planes = randomPlanes(nEff, d, seed)
      val qb = queries.select(col(qId),
        srpSketch(col(qVec), planes).bitwiseAND(mask).as("bucket"))
      val cb = corpus.select(col(cId),
        srpSketch(col(cVec), planes).bitwiseAND(mask).as("bucket"))
      qb.join(cb, Seq("bucket")).filter(col(qId) =!= col(cId))
        .select(col(qId), col(cId))
    }.reduce(_ unionByName _).distinct()
    val scored = pairs
      .join(queries.select(col(qId), col(qVec)), Seq(qId))
      .join(corpus.select(col(cId), col(cVec)), Seq(cId))
      .select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("cosine"))
    val w = Window.partitionBy(qId).orderBy(col("cosine").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(qId, cId, "rank", "cosine")
  }

  /** Deterministic SRP-bucketed ANN top-k over QUANTIZED vectors — the
    * bit-reproducible flavor of [[annTopK]] and the preferred production
    * shape: components are rounded to fixed point (`quantScale` = 2^20 by
    * default; float×2^20 is exact in double, round-ties-away agrees
    * across engines), the SRP sign sketch and the rerank dot are then
    * pure integer arithmetic — no floating-point sums anywhere, so the
    * result is identical at any partition count and in any engine (the
    * DuckDB oracle runs the same formula with the same ±1 plane
    * literals).
    *
    * 100 TB posture: candidates come only from shared sketch buckets —
    * the join shuffles on the bucket key, nothing broadcasts, nothing
    * crosses the full corpus. The surfaced `dot` is dot_int/quantScale²,
    * exactly representable. */
  def annTopKQuantized(queries: DataFrame, corpus: DataFrame, k: Int,
                       nPlanes: Int = 4, seeds: Seq[Long] = Seq(42L, 1042L),
                       quantScale: Double = 1048576.0, dim: Int = -1,
                       qId: String = "q_id", qVec: String = "q_vec",
                       cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val d = if (dim > 0) dim else probeDim(corpus, cVec)
    def quant(c: Column): Column = quantize(c, quantScale)
    val q = queries.select(col(qId), quant(col(qVec)).as("__qv"))
    val c = corpus.select(col(cId), quant(col(cVec)).as("__cv"))
    // (q_id, c_id) only through the bucket join and multi-probe distinct;
    // quantized vectors join back onto the deduped pairs and the window
    // sees only (q_id, c_id, dot_i)
    val pairs = seeds.map { seed =>
      val planes = randomPlanes(nPlanes, d, seed)
      // srpSketch's dot folds integer-valued doubles < 2^53 — exact, so
      // the sign bits (and buckets) are deterministic
      q.select(col(qId), srpSketch(col("__qv"), planes).as("__bucket"))
        .join(c.select(col(cId), srpSketch(col("__cv"), planes).as("__bucket")),
          Seq("__bucket"))
        .filter(col(qId) =!= col(cId))
        .select(col(qId), col(cId))
    }.reduce(_ unionByName _).distinct()
    val scored = pairs
      .join(q, Seq(qId)).join(c, Seq(cId))
      .select(col(qId), col(cId),
        aggregate(zip_with(col("__qv"), col("__cv"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot_i"))
    val w = Window.partitionBy(qId).orderBy(col("dot_i").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("rank"),
        (col("dot_i").cast("double") / (quantScale * quantScale)).as("dot"))
  }
}
