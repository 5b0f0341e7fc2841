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

  /** Deterministic signed-random-projection planes: `nPlanes` × `dim`
    * ±1 entries from a seeded PRNG (driver-side constants, folded into
    * the plan as literals — broadcast for free). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

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
    * doubles. Init is deterministic farthest-point traversal (k-center
    * greedy: each next seed is the vector most dissimilar to all chosen
    * so far — ±1 random planes routinely drop two seeds into one cluster
    * and Lloyd's cannot split the merged cell), costing k bounded
    * one-row actions before the iterations start. Zero-norm vectors are
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
    // cosine-NULL against everything, so farthest-point init would rank
    // them "most dissimilar" and burn seeds on them — drop them up front
    val vecsAll = corpus.filter(col(vecCol).isNotNull)
      .select(transform(col(vecCol), x => x.cast("double")).as("__v"))
    val vecs = vecsAll.filter(dot(col("__v"), col("__v")) > 0).cache()
    def normalize(p: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(p.map(x => x * x).sum)
      if (n > 0) p.map(_ / n) else p
    }
    // (worstSim, vector) of the best next seed under `order`
    def headScored(order: Column): Option[(Double, Seq[Double])] =
      vecs.select(order.as("__s"), col("__v"))
        .orderBy(col("__s").asc, col("__v").asc).limit(1).collect().headOption
        .map(r => (r.getDouble(0), r.getSeq[Double](1).toVector))
    // farthest-point init: seed 1 is the lexicographically-least vector
    // (deterministic under any partitioning), each next seed minimizes its
    // max cosine to the seeds chosen so far; a best candidate at cosine 1
    // is a duplicate of an existing seed — fewer than k distinct
    // directions exist, so return the shorter list rather than padding
    // with duplicates (callers size probes off centroids.length)
    var centroids = headScored(lit(0.0))
      .map { case (_, v) => Vector(normalize(v)) }
      .getOrElse { vecs.unpersist(); return Nil } // empty / all-zero corpus
    var exhausted = false
    while (centroids.length < k && !exhausted) {
      val sims = centroids.map(c => cosine(col("__v"), array(c.map(lit): _*)))
      val worst = if (sims.length == 1) sims.head else greatest(sims: _*)
      headScored(worst) match {
        case Some((s, v)) if s < 1.0 - 1e-12 =>
          centroids = centroids :+ normalize(v).toVector
        case _ => exhausted = true // only duplicates of existing seeds remain
      }
    }
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
    // queries: top nProbes cells, exploded
    val qCells = queries.withColumn("cell",
      explode(slice(
        sort_array(array(cellScores(col(qVec)).map { case (i, s) =>
          struct(s.as("s"), lit(i).as("i")) }: _*), asc = false),
        1, nProbes).getField("i")))
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
    * cell scores stay exact longs and the bit-reproducibility contract
    * survives training (with ±1 defaults the centroid scale is 1 — the
    * historical scoring — so existing oracle results are unchanged). */
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
    def quant(c: Column): Column =
      transform(c, x => round(x.cast("double") * quantScale).cast("long"))
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
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             nBlocks: Int = 8, codebookSize: Int = 8, seed: Long = 11L,
             quantScale: Double = 1048576.0, dim: Int = -1,
             qId: String = "q_id", qVec: String = "q_vec",
             cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val d = if (dim > 0) dim else probeDim(corpus, cVec)
    require(d % nBlocks == 0, s"dim $d not divisible into $nBlocks blocks")
    val w = d / nBlocks
    val books = pqCodebooks(nBlocks, codebookSize, w, seed)
    def quant(c: Column): Column =
      transform(c, x => round(x.cast("double") * quantScale).cast("long"))
    def dotLit(block: Column, ctr: Seq[Double]): Column =
      aggregate(zip_with(block, array(ctr.map(x => lit(x.toLong)): _*),
        (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    val q = queries.select(col(qId), quant(col(qVec)).as("__qv"))
    // corpus → codes only (the vector is dropped — that IS the point)
    val cCoded = corpus.select(col(cId), quant(col(cVec)).as("__cv"))
      .withColumn("__codes", array((0 until nBlocks).map { b =>
        val cBlock = slice(col("__cv"), b * w + 1, w)
        -array_max(array(books(b).zipWithIndex.map { case (ctr, j) =>
          struct(dotLit(cBlock, ctr).as("s"), lit(-j).as("nj")) }: _*))
          .getField("nj")
      }: _*))
      .drop("__cv")
    val scoreI = (0 until nBlocks).map { b =>
      val qBlock = slice(col("__qv"), b * w + 1, w)
      val ctrTable = array(books(b).map(ctr =>
        array(ctr.map(x => lit(x.toLong)): _*)): _*)
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
        (col("score_i").cast("double") / quantScale).as("score"))
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
                qId: String = "q_id", qVec: String = "q_vec",
                cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val d = if (dim > 0) dim else probeDim(corpus, cVec)
    require(d % nBlocks == 0, s"dim $d not divisible into $nBlocks blocks")
    val w = d / nBlocks
    val centroids = randomPlanes(nCentroids, d, cellSeed)
    val books = pqCodebooks(nBlocks, codebookSize, w, pqSeed)
    def quant(c: Column): Column =
      transform(c, x => round(x.cast("double") * quantScale).cast("long"))
    def dotLit(vec: Column, ctr: Seq[Double]): Column =
      aggregate(zip_with(vec, array(ctr.map(x => lit(x.toLong)): _*),
        (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    val q = queries.select(col(qId), quant(col(qVec)).as("__qv"))
    val c = corpus.select(col(cId), quant(col(cVec)).as("__cv"))
    // corpus: best cell + PQ codes, full vector dropped
    val cCoded = c
      .withColumn("__cell",
        -array_max(array(centroids.zipWithIndex.map { case (ctr, i) =>
          struct(dotLit(col("__cv"), ctr).as("s"), lit(-i).as("ni")) }: _*))
          .getField("ni"))
      .withColumn("__codes", array((0 until nBlocks).map { b =>
        val cBlock = slice(col("__cv"), b * w + 1, w)
        -array_max(array(books(b).zipWithIndex.map { case (ctr, j) =>
          struct(dotLit(cBlock, ctr).as("s"), lit(-j).as("nj")) }: _*))
          .getField("nj")
      }: _*))
      .drop("__cv")
    // queries: top nProbes cells, full vector kept for ADC tables
    val qCells = q.withColumn("__cell",
      explode(transform(slice(
        sort_array(array(centroids.zipWithIndex.map { case (ctr, i) =>
          struct(dotLit(col("__qv"), ctr).as("s"), lit(-i).as("ni")) }: _*),
          asc = false),
        1, nProbes), s => -s.getField("ni"))))
    val scoreI = (0 until nBlocks).map { b =>
      val qBlock = slice(col("__qv"), b * w + 1, w)
      val ctrTable = array(books(b).map(ctr =>
        array(ctr.map(x => lit(x.toLong)): _*)): _*)
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
        (col("score_i").cast("double") / quantScale).as("score"))
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
    def quant(c: Column): Column =
      transform(c, x => round(x.cast("double") * quantScale).cast("long"))
    val base = df.select(col(idCol).as("id"), quant(col(vecCol)).as("v"))
    // candidate generation carries ONLY (id, bucket) — the bucket self-join
    // and the multi-seed distinct() exchange small fixed-width keys, never
    // the vectors; vectors come back via two id-keyed joins on the (tiny)
    // candidate set, the jaccardOnPairs shape (Dedup.jaccardOnPairs)
    val pairs = seeds.map { seed =>
      val planes = randomPlanes(nPlanes, d, seed)
      // srpSketch folds integer-valued doubles < 2^53 — exact sign bits
      val b = base.select(col("id"),
        srpSketch(col("v"), planes).bitwiseAND(mask).as("bucket"))
      b.as("a").join(b.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    }.reduce(_ unionByName _).distinct()
    val candidates = pairs
      .join(base.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
    def dotL(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    candidates
      .withColumn("dot_i", dotL(col("va"), col("vb")))
      .withColumn("na2", dotL(col("va"), col("va")))
      .withColumn("nb2", dotL(col("vb"), col("vb")))
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
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // (id, bucket) only through the self-join and distinct — vectors are
    // joined back onto the candidate pairs afterward (jaccardOnPairs shape),
    // so no exchange keys on array payloads
    val pairs = seeds.map { seed =>
      val planes = randomPlanes(nPlanes, d, seed)
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
    // bucket join and multi-probe distinct carry only (q_id, c_id) —
    // vectors join back onto the deduped pairs, and the ranking window
    // sees only (q_id, c_id, cosine)
    val pairs = seeds.map { seed =>
      val planes = randomPlanes(nPlanes, d, seed)
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
    def quant(c: Column): Column =
      transform(c, x => round(x.cast("double") * quantScale).cast("long"))
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
