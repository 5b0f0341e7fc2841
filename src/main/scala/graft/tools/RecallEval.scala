package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Recall evidence for the approximate similarity flavors at sf0.1 (the
  * numbers behind PERF.md §recall): ground truth is brute-force cosine
  * ([[Similarity.cosineTopK]] for top-k, an all-pairs threshold scan for
  * near-dup pairs), each ANN flavor is swept over its bucketing knobs,
  * and the printed `RECALL` lines record recall@10 (mean fraction of the
  * true top-10 recovered per query) / pair-recall per setting — so a user
  * knows which knobs reach ≥0.9 and what they cost in candidate volume.
  *
  * Usage: `runMain graft.tools.RecallEval [sfDir]`.
  */
object RecallEval {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.sources.Testdata.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .cache()
    val corpus = emb.select(col("vec_id").as("c_id"), col("v").as("c_vec"))
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_vec"))
    val nQueries = queries.count()
    println(s"=== recall eval: ${corpus.count()} vectors, $nQueries queries, k=10 ===")

    val k = 10
    val truth = Similarity.cosineTopK(queries, corpus, k)
      .select(col("q_id"), col("c_id")).cache()
    truth.count()

    def recallAt10(approx: DataFrame): Double = {
      val hits = truth.join(approx.select("q_id", "c_id"), Seq("q_id", "c_id"))
        .count()
      hits.toDouble / (nQueries * k)
    }

    // --- annTopK: SRP buckets, swept over planes/prefix/probes ---
    for ((nPlanes, prefixBits, nSeeds) <- Seq((16, 8, 2), (16, 6, 2), (16, 6, 4),
                                              (8, 4, 2), (8, 4, 4), (8, 3, 4),
                                              (8, 3, 8), (8, 2, 4), (8, 2, 8))) {
      val seeds = (0 until nSeeds).map(i => 42L + 1000L * i)
      val r = recallAt10(Similarity.annTopK(queries, corpus, k,
        nPlanes = nPlanes, prefixBits = prefixBits, seeds = seeds, dim = 64))
      println(f"RECALL annTopK planes=$nPlanes prefixBits=$prefixBits " +
        f"seeds=$nSeeds recall@10=$r%.3f")
    }

    // --- ivfTopK: random-centroid cells, swept over cells/probes ---
    for ((nCells, nProbes) <- Seq((16, 4), (16, 8), (8, 4), (8, 6), (4, 3))) {
      val r = recallAt10(Similarity.ivfTopK(queries, corpus, k,
        nCentroids = nCells, nProbes = nProbes, dim = 64))
      println(f"RECALL ivfTopK cells=$nCells probes=$nProbes recall@10=$r%.3f")
    }

    // --- ivfTopK with kmeansCentroids-trained cells: recall-per-probe ---
    for (nCells <- Seq(8, 16)) {
      val trained = Similarity.kmeansCentroids(
        emb.select(col("v")), "v", k = nCells, iters = 5, dim = 64)
      for (nProbes <- Seq(2, 4, 6, 8).filter(_ <= nCells)) {
        val r = recallAt10(Similarity.ivfTopK(queries, corpus, k,
          nProbes = nProbes, dim = 64, trained = trained))
        println(f"RECALL ivfTopK-trained cells=$nCells probes=$nProbes recall@10=$r%.3f")
      }
    }

    // --- pcaTopK: PCA-reduced candidate scan + exact full-dim rerank —
    // recall vs kept components and candidate budget. The candidate
    // scan's per-pair multiply cost shrinks by comps/64; varKept is the
    // eigenvalue mass the kept basis explains ---
    {
      val full = graft.ops.Pca.fit(emb.select(col("v")), "v", k = 64)
      val totalVar = full.eigenvalues.sum
      for (comps <- Seq(4, 8, 16)) {
        val model = graft.ops.Pca.PcaModel(full.dim, comps, full.mean,
          full.basis.take(comps), full.eigenvalues.take(comps))
        val varKept = model.eigenvalues.sum / totalVar
        for (cands <- Seq(20, 50)) {
          val r = recallAt10(graft.ops.Pca.pcaTopK(queries, corpus, k, cands, model))
          println(f"RECALL pcaTopK comps=$comps cands=$cands " +
            f"varKept=$varKept%.3f recall@10=$r%.3f")
        }
      }
    }

    // --- pcaTopK on a DECAYED spectrum: the synthetic embeddings above
    // are isotropic (varKept ≈ comps/64 — spectral reduction's worst
    // case, and the recall lines above show it honestly). Real embedding
    // corpora have decaying spectra, so also measure on a deterministic
    // rank-8 mix of the same vectors (64×8 seeded literal matrix applied
    // map-side + 0.5% tail noise): varKept ≈ 1 at comps=8 and the
    // reduced-candidate scan should recover the true top-10 ---
    {
      val rnd = new scala.util.Random(123)
      val mix = Seq.fill(64)(Seq.fill(8)(rnd.nextGaussian() * 0.35))
      val lowRank = emb.select(col("vec_id"),
        array((0 until 64).map { d =>
          (0 until 8).map(b => element_at(col("v"), b + 1) * lit(mix(d)(b)))
            .reduce(_ + _) + element_at(col("v"), d + 1) * lit(0.005)
        }: _*).as("v")).cache()
      val lrCorpus = lowRank.select(col("vec_id").as("c_id"), col("v").as("c_vec"))
      val lrQueries = lowRank.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("q_vec"))
      val nLr = lrQueries.count()
      val lrTruth = Similarity.cosineTopK(lrQueries, lrCorpus, k)
        .select("q_id", "c_id").cache()
      lrTruth.count()
      val full = graft.ops.Pca.fit(lowRank.select(col("v")), "v", k = 64)
      val totalVar = full.eigenvalues.sum
      for (comps <- Seq(4, 8, 16); cands <- Seq(20, 50)) {
        val model = graft.ops.Pca.PcaModel(full.dim, comps, full.mean,
          full.basis.take(comps), full.eigenvalues.take(comps))
        val got = graft.ops.Pca.pcaTopK(lrQueries, lrCorpus, k, cands, model)
        val r = lrTruth.join(got.select("q_id", "c_id"), Seq("q_id", "c_id"))
          .count().toDouble / (nLr * k)
        println(f"RECALL pcaTopK-rank8 comps=$comps cands=$cands " +
          f"varKept=${model.eigenvalues.sum / totalVar}%.3f recall@10=$r%.3f")
      }
      lowRank.unpersist(); lrTruth.unpersist()
    }

    // --- pqTopK / ivfPqTopK: seeded ±1 codebooks vs trained (equal
    // settings otherwise — the trained-vs-fixed delta IS the number) ---
    val trainedBooks = Similarity.trainPqCodebooks(
      emb.select(col("v")), "v", nBlocks = 8, codebookSize = 8,
      iters = 5, dim = 64)
    val bookFlavors: Seq[(String, Seq[Seq[Seq[Double]]])] =
      Seq("fixed" -> Nil, "trained" -> trainedBooks)
    for ((label, tb) <- bookFlavors) {
      val r = recallAt10(Similarity.pqTopK(queries, corpus, k,
        nBlocks = 8, codebookSize = 8, dim = 64, trained = tb))
      println(f"RECALL pqTopK blocks=8 codebook=8 books=$label recall@10=$r%.3f")
    }
    for ((label, tb) <- bookFlavors; nProbes <- Seq(4, 8)) {
      val r = recallAt10(Similarity.ivfPqTopK(queries, corpus, k,
        nCentroids = 16, nProbes = nProbes, nBlocks = 8, codebookSize = 8,
        dim = 64, trained = tb))
      println(f"RECALL ivfPqTopK cells=16 probes=$nProbes books=$label recall@10=$r%.3f")
    }

    // --- embeddingNearDups: pair recall vs all-pairs ground truth ---
    // the synthetic corpus has NO natural pairs at a useful threshold, so
    // near-dups are PLANTED (same posture as ScaleStress): every 4th base
    // vector gets a deterministically-jittered copy (cosine ≈0.97-0.99 for
    // unit-ish 64-dim vectors), then ground truth is an all-pairs scan of
    // the augmented corpus — bounded here (2.5k vectors), never at scale
    // --- persisted-index drift: append a drifted family (directions in
    // dims the base corpus barely uses), then measure the probe's cost
    // (candidates scanned per query) and recall before and after
    // retrain — the DRIFT lines behind PERF.md's retrain-policy numbers.
    // The drifted family here is the base embedding mirrored into its
    // negated-odd-dims image scaled onto the back dims: deterministic,
    // orthogonal-ish to the base mass.
    {
      import graft.ops.{AnnIndex, IndexStore}
      val root = java.nio.file.Files.createTempDirectory("graft-recall-drift-").toString
      AnnIndex.build(corpus.select(col("c_id").as("id"), col("c_vec").as("v")),
        "id", "v", root, AnnIndex.Config(nCells = 16, kmeansIters = 5, dim = 64))
      val driftVecs = emb.select((col("vec_id") + 5000000L).as("id"),
        transform(col("v"), (x, i) =>
          when(pmod(i, lit(2)) === 0, lit(0.0)).otherwise(x * 3.0)).as("v"))
      AnnIndex.append(driftVecs, "id", "v", root)
      val unionCorpus = corpus.union(
        driftVecs.select(col("id").as("c_id"), col("v").as("c_vec")))
      val dq = driftVecs.filter(col("id") % 20 === 0)
        .select((col("id") + 1000000L).as("q_id"), col("v").as("q_vec"))
      val nDq = dq.count()
      val dTruth = Similarity.cosineTopK(dq, unionCorpus, k)
        .select("q_id", "c_id").cache()
      dTruth.count()
      def probeStats(label: String): Unit = {
        val d = AnnIndex.drift(spark, root)
        val got = AnnIndex.topK(dq, root, k, nProbes = 4)
        val r = dTruth.join(got.select("q_id", "c_id"), Seq("q_id", "c_id")).count()
          .toDouble / (nDq * k)
        val cands = AnnIndex.topK(dq, root, k = Int.MaxValue, nProbes = 4).count()
        println(f"DRIFT $label skew=${d.cellSkew}%.2f ownCos=${d.meanOwnCellCos}%.3f " +
          f"recall@10=$r%.3f candidatesPerQuery=${cands / math.max(1, nDq)}%d")
      }
      probeStats("appended-no-retrain")
      AnnIndex.retrain(spark, root, AnnIndex.Config(nCells = 16, kmeansIters = 5, dim = 64))
      probeStats("after-retrain")
    }

    val thr = 0.9
    val aug = emb.union(
      emb.filter(col("vec_id") % 4 === 0).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"),
          (x, i) => x * (lit(1.0) + (pmod(col("vec_id") * 31 + i, lit(7)) - 3) * 0.05))
          .as("v"))).cache()
    val left = aug.select(col("vec_id").as("id_a"), col("v").as("va"))
    val right = aug.select(col("vec_id").as("id_b"), col("v").as("vb"))
    val truePairs = left.join(right, col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= thr)
      .select("id_a", "id_b").cache()
    val nTrue = truePairs.count()
    println(s"=== near-dup ground truth: $nTrue pairs at cosine>=$thr ===")
    for ((nPlanes, prefixBits, nSeeds) <- Seq((16, 8, 2), (16, 6, 2), (8, 4, 2),
                                              (8, 4, 4), (8, 3, 4))) {
      val seeds = (0 until nSeeds).map(i => 42L + 1000L * i)
      val found = Similarity.embeddingNearDups(aug, "vec_id", "v",
        threshold = thr, nPlanes = nPlanes, prefixBits = prefixBits,
        seeds = seeds, dim = 64).select("id_a", "id_b")
      val hits = truePairs.join(found, Seq("id_a", "id_b")).count()
      val r = if (nTrue == 0) 1.0 else hits.toDouble / nTrue
      println(f"RECALL embeddingNearDups planes=$nPlanes prefixBits=$prefixBits " +
        f"seeds=$nSeeds pairRecall=$r%.3f")
    }
    spark.stop()
  }
}
