package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction step of an embedding-heavy curation pipeline
  * (shrinking the ANN candidate scan from d to k dims, whitening before
  * SemDeDup-style clustering), shaped for scale the same way the rest of
  * the similarity stack is:
  *
  *  - ONE corpus pass computes exact integer second moments on the shared
  *    fixed-point grid ([[Similarity]]'s quantization contract,
  *    float×2^20 exact in double, round-ties-away): per dimension pair
  *    i ≤ j, (n, Σqᵢ, Σqⱼ, Σqᵢqⱼ) as BIGINTs. The double posexplode fans
  *    each row into d² pair rows, but partial (map-side) hash aggregation
  *    collapses them to ≤ d(d+1)/2 cells per task before the exchange —
  *    the shuffle carries O(d²) longs per partition, independent of
  *    corpus size. Compute is O(N·d²), the unavoidable Gram cost.
  *  - The d×d covariance eigendecomposition runs driver-side (cyclic
  *    Jacobi): O(d³) on a ~64-dim matrix is microseconds, and because the
  *    input moments are exact integers the fitted model is bit-identical
  *    on any partitioning — the same determinism contract as the
  *    quantized ANN operators ([[graft.tools.DeterminismGate]]).
  *  - Projection is map-side only: k literal basis rows folded into the
  *    plan (the IVF-centroid-literal pattern), no UDF, no shuffle.
  *
  * Overflow bound (documented posture, same as [[Monitor]]'s drift sums):
  * |Σqᵢqⱼ| ≤ N·(quantScale·maxAbs)². Unit-norm embeddings on the default
  * 2^20 grid are safe to N ≈ 3·10^7 rows; a 100 TB corpus passes a
  * coarser grid (2^10 → N ≈ 8·10^12) — the eigenbasis is insensitive to
  * grid resolution long before estimation error matters.
  */
object Pca {

  /** Fitted model. `basis` rows are orthonormal eigenvectors of the
    * sample covariance in descending-eigenvalue order, each
    * sign-canonicalized (largest-|component| entry positive, first index
    * winning ties) so the fit is unique. `mean` is in original units. */
  final case class PcaModel(dim: Int, k: Int, mean: Seq[Double],
                            basis: Seq[Seq[Double]], eigenvalues: Seq[Double])

  /** Exact integer second moments of a float/double array column: one row
    * per dimension pair i ≤ j with (n, Σqᵢ, Σqⱼ, Σqᵢqⱼ) on the
    * `quantScale` fixed-point grid. The only corpus-scale pass in PCA —
    * everything downstream is driver-side on ≤ d(d+1)/2 rows.
    *
    * `decimalSums = true` accumulates Σqᵢqⱼ in DECIMAL(38,0) (operands
    * widened to DECIMAL(19,0) before the multiply, same posture as
    * [[Monitor]]'s drift numerators) — the overflow-proof surface for
    * corpora past the documented N·(quantScale·maxAbs)² < 2⁶³ BIGINT
    * bound, at a modest per-cell cost. The hash-checked q110 face stays
    * on BIGINT. */
  def moments(df: DataFrame, vecCol: String,
              quantScale: Double = (1L << 20).toDouble,
              decimalSums: Boolean = false): DataFrame = {
    val q = Similarity.quantize(col(vecCol), quantScale)
    val crossSum =
      if (decimalSums)
        sum(col("qi").cast("decimal(19,0)") * col("qj").cast("decimal(19,0)"))
          .cast("decimal(38,0)")
      else sum(col("qi") * col("qj"))
    df.select(q.as("__q"))
      .select(col("__q"), posexplode(col("__q")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"), posexplode(col("__q")).as(Seq("j", "qj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("qi")).as("sum_qi"),
        sum(col("qj")).as("sum_qj"),
        crossSum.as("sum_qij"))
  }

  /** Pearson correlation matrix over exact-integer feature columns (cast
    * to long; callers pre-quantize non-integer features) — the
    * scalar-feature face of the same one-pass moments contract, for
    * quality-signal design over a corpus. Output per pair (a ≤ b by
    * column order): exact BIGINT moments plus `corr`, derived in a pinned
    * double formula both engines replay bit-identically. Zero-variance
    * features yield NULL corr (SQL semantics). */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "corrMatrix needs at least one feature column")
    val feats = array(cols.map(c => col(c).cast("long")): _*)
    val named = array(cols.map(lit): _*)
    val base = df
      .select(feats.as("__f"))
      .select(col("__f"), posexplode(col("__f")).as(Seq("ia", "fa")))
      .select(col("ia"), col("fa"), posexplode(col("__f")).as(Seq("ib", "fb")))
      .filter(col("ib") >= col("ia"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("n"),
        sum(col("fa")).as("sum_a"),
        sum(col("fb")).as("sum_b"),
        sum(col("fa") * col("fa")).as("sum_aa"),
        sum(col("fb") * col("fb")).as("sum_bb"),
        sum(col("fa") * col("fb")).as("sum_ab"))
    // corr in a pinned double chain over the exact longs: numerator and
    // the two variance terms each as (n·sxy − sx·sy) with every operand
    // cast to double FIRST, so DuckDB replays the identical IEEE ops.
    def d(c: Column) = c.cast("double")
    val num = d(col("n")) * d(col("sum_ab")) - d(col("sum_a")) * d(col("sum_b"))
    val va = d(col("n")) * d(col("sum_aa")) - d(col("sum_a")) * d(col("sum_a"))
    val vb = d(col("n")) * d(col("sum_bb")) - d(col("sum_b")) * d(col("sum_b"))
    base
      .withColumn("feat_a", element_at(named, col("ia") + 1))
      .withColumn("feat_b", element_at(named, col("ib") + 1))
      .withColumn("corr", when(va > 0 && vb > 0, num / (sqrt(va) * sqrt(vb))))
      .select("feat_a", "feat_b", "n", "sum_a", "sum_b", "sum_aa", "sum_bb",
        "sum_ab", "corr")
  }

  /** Per-row embedding sanity score: the max over dimensions of the
    * squared standardized deviation z²ᵢ = (n·qᵢ − Σq)² ∕ (n·Σq² − (Σq)²),
    * against per-dimension stats computed IN-QUERY (one diagonal-moments
    * pass — d rows, broadcast back onto the posexploded corpus; the
    * grouped max collapses map-side so the exchange is one (id, double)
    * row per vector). The corrupt-embedding filter of an ingest pipeline:
    * a NaN-free, exact-integer-stats flavor of "drop rows > z σ out on
    * any dimension". Zero-variance dimensions contribute NULL and are
    * skipped by max(). Deterministic: stats are exact longs, z² is one
    * pinned double chain, max is order-independent. */
  def outlierScores(df: DataFrame, idCol: String, vecCol: String,
                    quantScale: Double = (1L << 20).toDouble): DataFrame = {
    val q = Similarity.quantize(col(vecCol), quantScale)
    val exploded = df.select(col(idCol), posexplode(q).as(Seq("i", "qi")))
    val stats = exploded.groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(col("qi")).as("s1"),
        sum(col("qi") * col("qi")).as("s2"))
    def d(c: Column) = c.cast("double")
    val varNum = d(col("n")) * d(col("s2")) - d(col("s1")) * d(col("s1"))
    val devNum = d(col("n")) * d(col("qi")) - d(col("s1"))
    exploded.join(broadcast(stats), "i")
      .withColumn("z2", when(varNum > 0, devNum * devNum / varNum))
      .groupBy(col(idCol))
      .agg(max(col("z2")).as("max_z2"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-rows), unsorted. Deterministic: fixed
    * sweep order, rotation skipped below `tol`·(Frobenius scale). */
  private[graft] def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 64,
                               tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(1e-300, a0.map(_.map(math.abs).max).max)
    var sweep = 0
    var rotated = true
    while (sweep < maxSweeps && rotated) {
      rotated = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol * scale) {
            rotated = true
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = Array.tabulate(d)(i => a(i)(i))
    val rows = Array.tabulate(d, d)((r, k) => v(k)(r)) // eigenvector r as a row
    (eig, rows)
  }

  /** Fit a k-component PCA model: one exact-moments pass (the d(d+1)/2
    * result rows are the ONLY driver collect — dimension-bounded, not
    * corpus-bounded), then driver-side covariance + Jacobi. */
  def fit(df: DataFrame, vecCol: String, k: Int,
          quantScale: Double = (1L << 20).toDouble,
          decimalSums: Boolean = false): PcaModel = {
    val rows = moments(df, vecCol, quantScale, decimalSums).collect()
    require(rows.nonEmpty, "Pca.fit on an empty corpus")
    val dim = rows.iterator.map(_.getAs[Int]("j")).max + 1
    require(k >= 1 && k <= dim, s"k=$k out of range for dim=$dim")
    // Every (i, j) cell must have aggregated the SAME row count, or the
    // corpus is ragged (mixed dims / NULL elements) and a single n would
    // silently skew the covariance — fail loudly instead (review r12c).
    val ns = rows.iterator.map(_.getAs[Long]("n")).toSet
    require(ns.size == 1,
      s"Pca.fit: ragged corpus — moment cells saw row counts $ns " +
        "(mixed vector dimensions or NULL elements); fix the input")
    val n = ns.head.toDouble
    require(n >= 2, "Pca.fit needs at least 2 rows")
    val sum1 = Array.ofDim[Double](dim)
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val i = r.getAs[Int]("i"); val j = r.getAs[Int]("j")
      val si = r.getAs[Long]("sum_qi").toDouble
      val sj = r.getAs[Long]("sum_qj").toDouble
      val sij = r.get(r.fieldIndex("sum_qij")) match {
        case l: java.lang.Long => l.toDouble
        case d: java.math.BigDecimal => d.doubleValue()
        case other => throw new IllegalStateException(s"sum_qij: $other")
      }
      sum1(i) = si; sum1(j) = if (i == j) si else sj
      val c = (sij - si * sj / n) / ((n - 1.0) * quantScale * quantScale)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val mean = sum1.map(_ / (n * quantScale))
    val (eig, vecRows) = jacobiEigen(cov)
    val order = (0 until dim).sortBy(i => (-eig(i), i)).take(k)
    val basis = order.map { i =>
      val row = vecRows(i)
      val pivot = row.indices.maxBy(j => (math.abs(row(j)), -j))
      if (row(pivot) < 0) row.map(x => -x).toSeq else row.toSeq
    }
    PcaModel(dim, k, mean.toSeq, basis, order.map(eig))
  }

  /** Map-side projection onto the model's basis: out_j = (v − mean)·bⱼ,
    * folded as v·bⱼ − mean·bⱼ with the mean dot a driver constant. Basis
    * rows ride the plan as literals — no shuffle, no UDF.
    *
    * `whiten = true` additionally scales component j by 1∕√λⱼ so every
    * output component has unit sample variance — the standard
    * pre-conditioning before distance-based clustering (SemDeDup-style
    * [[Similarity.semanticNearDupsQuantized]]) when the leading
    * components would otherwise dominate the metric. Requires strictly
    * positive kept eigenvalues (a zero-variance component cannot be
    * whitened — refit with smaller k). */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
              outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    if (whiten) require(model.eigenvalues.forall(_ > 0),
      s"whiten requires positive eigenvalues, got ${model.eigenvalues}")
    val comps = model.basis.zip(model.eigenvalues).map { case (b, ev) =>
      val bl = array(b.map(lit): _*)
      val meanDot = model.mean.zip(b).map { case (m, x) => m * x }.sum
      val raw = Similarity.dot(col(vecCol), bl) - lit(meanDot)
      if (whiten) raw / lit(math.sqrt(ev)) else raw
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** ANN with a PCA-reduced candidate stage: rank candidates by cosine in
    * the k-dim projected space (the cheap scan — d→k fewer multiplies per
    * pair), then rerank the `candidates` survivors per query by EXACT
    * full-dimension cosine and keep `topK`. Reduced-space error can only
    * cost recall, never wrong scores, because every returned cosine is
    * computed on the original vectors. Same broadcast contract as
    * [[Similarity.cosineTopK]]: the query side must be a bounded probe
    * set.
    *
    * WHEN to reduce: only when the spectrum decays. Check the model's
    * eigenvalue mass first — `model.eigenvalues.sum / fit(..., dim)
    * .eigenvalues.sum` — and keep enough components to hold most of it.
    * On an isotropic corpus (varKept ≈ k/dim) reduction buys little
    * recall per candidate (RecallEval's `pcaTopK` lines measure exactly
    * this on the flat-spectrum testdata; its `pcaTopK-rank8` lines show
    * the decayed-spectrum regime where the same knobs recover the true
    * top-k). The fit is one d(d+1)/2-cell pass either way, so measuring
    * before deciding is cheap. */
  def pcaTopK(queries: DataFrame, corpus: DataFrame, topK: Int,
              candidates: Int, model: PcaModel,
              qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    require(candidates >= topK, s"candidates=$candidates < topK=$topK")
    val qp = project(queries, qVec, model, "__qp")
    val cp = project(corpus, cVec, model, "__cp")
    val cand = Similarity.cosineTopK(
      qp.select(col(qId), col("__qp").as(qVec)),
      cp.select(col(cId), col("__cp").as(cVec)),
      candidates, qId, qVec, cId, cVec)
      .select(col(qId), col(cId))
    // the candidate sliver (|queries| × candidates id pairs) is the
    // bounded side — broadcast it so the corpus's full-dim vectors stay
    // map-side instead of shuffling by c_id (review r12c; the r5
    // id-only-exchange invariant)
    val rescored = corpus.select(col(cId), col(cVec))
      .join(broadcast(cand), cId)
      .join(broadcast(queries.select(col(qId), col(qVec))), qId)
      .withColumn("cosine", Similarity.cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(qId).orderBy(col("cosine").desc, col(cId).asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(qId, cId, "rank", "cosine")
  }
}
