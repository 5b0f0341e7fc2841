package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph, Lineage}

/** The reliable-checkpoint seam (VERDICT r12 #2): the iterative
  * operators' lineage cuts default to executor-local blocks, but a real
  * cluster's multi-hour job needs the checkpoint-dir-backed path that
  * survives executor loss. Both paths must be BIT-IDENTICAL — the cut
  * mechanism may move blocks, never change values. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  // deterministic scale-free-ish digraph: hub 0, two chains, a cycle
  private def edges = (
    (1L to 40L).map(i => (i, i % 7)) ++        // fan into small hubs
      (10L to 30L).map(i => (i, i + 1)) ++     // chain
      Seq((3L, 4L), (4L, 5L), (5L, 3L))        // cycle
    ).toDF("src", "dst")

  // ORDER MATTERS: this must run before any test sets a checkpoint dir
  // (the shared session's dir cannot be unset once set).
  test("reliable=true without a checkpoint dir fails fast, never falls back") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    spark.conf.set(Lineage.ReliableConf, "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Graph.pageRank(edges, "src", "dst", 2).collect()
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.set(Lineage.ReliableConf, "false")
  }

  test("reliable path is bit-identical to the local path (pageRank, components, triangles)") {
    def run(): (Seq[(Long, Long)], Seq[(Long, Long)], Seq[(Long, Long)]) = (
      Graph.pageRank(edges, "src", "dst", iterations = 8)
        .as[(Long, Long)].collect().sorted.toSeq,
      Dedup.components(
        Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 3L)).toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().sorted.toSeq,
      Graph.triangles(edges, "src", "dst")
        .as[(Long, Long)].collect().sorted.toSeq)

    val local = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Lineage.ReliableConf, "true")
    try {
      assert(Lineage.reliable(spark))
      val rel = run()
      assert(rel == local,
        "reliable checkpoint path changed operator results")
      // the reliable path actually wrote checkpoint files (it really
      // took the other branch, not a silent local fallback)
      val wrote = java.nio.file.Files.walk(dir).filter(_.toFile.isFile)
        .count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally {
      spark.conf.set(Lineage.ReliableConf, "false")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }
}
