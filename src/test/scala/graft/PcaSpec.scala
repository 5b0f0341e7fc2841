package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pca, Similarity}

/** Unit/golden tests for the driver-side half of PCA (covariance → Jacobi →
  * projection) — the corpus-scale moments face is oracle-checked in
  * queries/LlmQueries (q110/q111). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def seededVec(seed: Int, dim: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(dim)(r.nextGaussian())
  }

  test("moments: exact integer sums on a tiny hand-checked frame") {
    val df = Seq(Tuple1(Seq(1.0, 2.0)), Tuple1(Seq(3.0, 4.0))).toDF("v")
    val m = Pca.moments(df, "v", quantScale = 1.0).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_qi"), r.getAs[Long]("sum_qj"),
          r.getAs[Long]("sum_qij"))).toMap
    assert(m.size == 3)
    assert(m((0, 0)) == ((2L, 4L, 4L, 1L * 1 + 3L * 3)))
    assert(m((0, 1)) == ((2L, 4L, 6L, 1L * 2 + 3L * 4)))
    assert(m((1, 1)) == ((2L, 6L, 6L, 2L * 2 + 4L * 4)))
  }

  test("decimalSums moments agree with the BIGINT face; fit reads both") {
    val vecs = (0 until 50).map(i => i -> seededVec(400 + i, 5))
    val df = vecs.toDF("id", "v")
    val longM = Pca.moments(df, "v").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        BigDecimal(r.getAs[Long]("sum_qij"))).toMap
    val decM = Pca.moments(df, "v", decimalSums = true).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        BigDecimal(r.getAs[java.math.BigDecimal]("sum_qij"))).toMap
    assert(longM == decM)
    assert(Pca.fit(df, "v", k = 2, decimalSums = true) == Pca.fit(df, "v", k = 2))
  }

  test("jacobiEigen: known 2x2 spectrum, orthonormal vectors, A·v = λ·v") {
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (eig, rows) = Pca.jacobiEigen(a)
    val sorted = eig.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // orthonormal rows
    for (r <- rows; s <- rows) {
      val d = r.zip(s).map { case (x, y) => x * y }.sum
      val expect = if (r eq s) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-12)
    }
    // residual ‖A·v − λ·v‖ per pair
    for (k <- 0 until 2) {
      val v = rows(k)
      val av = a.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
      val res = av.zip(v.map(_ * eig(k))).map { case (x, y) => math.abs(x - y) }.max
      assert(res < 1e-12)
    }
  }

  test("fit is bit-identical across partitioning (exact integer moments)") {
    val vecs = (0 until 120).map(i => i -> seededVec(i, 8))
    val df1 = vecs.toDF("id", "v").repartition(1)
    val df7 = vecs.toDF("id", "v").repartition(7)
    val m1 = Pca.fit(df1, "v", k = 3)
    val m7 = Pca.fit(df7, "v", k = 3)
    assert(m1 == m7) // Seq[Double] equality is element-wise — bit-identical
  }

  test("fit recovers a planted 2-D subspace; projection reconstructs") {
    // rows = a·e1 + b·e2 + tiny seeded noise, embedded in dim 8
    val r = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      val a = r.nextGaussian() * 3.0
      val b = r.nextGaussian() * 1.5
      i -> (0 until 8).map(d =>
        (if (d == 1) a else 0.0) + (if (d == 4) b else 0.0) +
          r.nextGaussian() * 1e-3)
    }
    val df = vecs.toDF("id", "v")
    val model = Pca.fit(df, "v", k = 2)
    // top-2 variance dominates
    val total = Pca.fit(df, "v", k = 8).eigenvalues.sum
    assert(model.eigenvalues.sum / total > 0.999)
    // reconstruction: (v − mean) ≈ Σ_j ((v − mean)·b_j)·b_j for every row
    vecs.take(20).foreach { case (_, v) =>
      val c = v.zip(model.mean).map { case (x, m) => x - m }
      val rec = Array.ofDim[Double](8)
      model.basis.foreach { b =>
        val t = c.zip(b).map { case (x, y) => x * y }.sum
        b.zipWithIndex.foreach { case (y, d) => rec(d) += t * y }
      }
      val err = c.zip(rec).map { case (x, y) => math.abs(x - y) }.max
      assert(err < 1e-2, s"reconstruction error $err")
    }
  }

  test("project matches a driver-side dot with the same basis") {
    val vecs = (0 until 10).map(i => i -> seededVec(100 + i, 6))
    val df = vecs.toDF("id", "v")
    val model = Pca.fit(df, "v", k = 2)
    val out = Pca.project(df, "v", model).select("id", "pca").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (id, v) =>
      val expect = model.basis.map { b =>
        v.zip(b).map { case (x, y) => x * y }.sum -
          model.mean.zip(b).map { case (m, y) => m * y }.sum
      }
      out(id).zip(expect).foreach { case (got, e) =>
        assert(math.abs(got - e) < 1e-9)
      }
    }
  }

  test("whitened projection has unit sample variance per component") {
    val vecs = (0 until 150).map(i => i -> seededVec(500 + i, 6))
    val df = vecs.toDF("id", "v")
    val model = Pca.fit(df, "v", k = 3)
    val proj = Pca.project(df, "v", model, whiten = true)
      .select("pca").collect().map(_.getSeq[Double](0))
    for (j <- 0 until 3) {
      val xs = proj.map(_(j))
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      assert(math.abs(variance - 1.0) < 0.02,
        s"component $j variance $variance") // exact up to quantization noise
    }
    // zero-variance component cannot be whitened: fail loudly
    val flat = (0 until 10).map(i => i -> Seq(1.0, i.toDouble)).toDF("id", "v")
    val m2 = Pca.fit(flat, "v", k = 2)
    intercept[IllegalArgumentException] {
      Pca.project(flat, "v", m2, whiten = true)
    }
  }

  test("pcaTopK with candidates = corpus equals brute-force cosineTopK") {
    val corpus = (0 until 40).map(i => i -> seededVec(200 + i, 8))
      .toDF("c_id", "c_vec")
    val queries = (100 until 103).map(i => i -> seededVec(i, 8))
      .toDF("q_id", "q_vec")
    val model = Pca.fit(corpus, "c_vec", k = 2)
    val brute = Similarity.cosineTopK(queries, corpus, 5)
      .orderBy("q_id", "rank").collect().map(_.toSeq)
    val pca = Pca.pcaTopK(queries, corpus, topK = 5, candidates = 40, model)
      .orderBy("q_id", "rank").collect().map(_.toSeq)
    assert(pca.toSeq == brute.toSeq)
  }

  test("pcaTopK: planted clusters, reduced candidates, exact top-k recall") {
    // 3 well-separated unit centers in dim 16; 20 members each with tiny
    // seeded noise. PCA to k=3 keeps the between-cluster structure, so a
    // 20-candidate reduced scan already contains each query's true top-10;
    // exact rerank then reproduces brute-force output bit-for-bit.
    val r = new scala.util.Random(11)
    val centers = Seq(
      (0 until 16).map(d => if (d < 5) 1.0 else 0.0),
      (0 until 16).map(d => if (d >= 5 && d < 10) 1.0 else 0.0),
      (0 until 16).map(d => if (d >= 10) 1.0 else 0.0))
    def member(c: Seq[Double]): Seq[Double] = c.map(_ + r.nextGaussian() * 0.01)
    val corpus = (0 until 60).map(i => i -> member(centers(i % 3)))
      .toDF("c_id", "c_vec")
    val queries = (100 until 106).map(i => i -> member(centers(i % 3)))
      .toDF("q_id", "q_vec")
    val model = Pca.fit(corpus, "c_vec", k = 3)
    val brute = Similarity.cosineTopK(queries, corpus, 10)
      .orderBy("q_id", "rank").collect().map(_.toSeq)
    val pca = Pca.pcaTopK(queries, corpus, topK = 10, candidates = 20, model)
      .orderBy("q_id", "rank").collect().map(_.toSeq)
    assert(pca.toSeq == brute.toSeq)
  }

  test("outlierScores: planted stuck-feature row dominates; constant dims skipped") {
    // 30 clean seeded rows + one with dim 2 bumped far out; dim 0 is
    // constant across all rows (zero variance → NULL z², skipped by max)
    val clean = (0 until 30).map { i =>
      val v = seededVec(300 + i, 6)
      i -> (Seq(1.0) ++ v.tail)
    }
    val bumped = {
      val v = clean(3)._2
      99 -> v.updated(2, v(2) + 50.0)
    }
    val df = (clean :+ bumped).toDF("id", "v")
    val out = Pca.outlierScores(df, "id", "v").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out.size == 31)
    val cleanMax = (out - 99).values.max
    assert(out(99) > cleanMax * 2, s"planted ${out(99)} vs clean $cleanMax")
  }

  test("corrMatrix: perfect correlation, NULL on zero variance") {
    val df = Seq((1L, 2L, 5L), (2L, 4L, 5L), (3L, 6L, 5L))
      .toDF("a", "b", "c")
    val out = Pca.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getAs[String]("feat_a"), r.getAs[String]("feat_b")) ->
        Option(r.getAs[java.lang.Double]("corr"))).toMap
    assert(out.size == 6)
    assert(math.abs(out(("a", "b")).get - 1.0) < 1e-12)
    assert(math.abs(out(("a", "a")).get - 1.0) < 1e-12)
    assert(out(("a", "c")).isEmpty) // zero-variance feature → NULL
    assert(out(("c", "c")).isEmpty)
  }
}
