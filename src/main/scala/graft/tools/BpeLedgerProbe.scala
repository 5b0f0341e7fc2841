package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the batched-BPE raised-pair ledger (VERDICT r15
  * #8): the SHARED-SUFFIX regime — words map to two symbols from
  * disjoint alphabets (frequent, non-chaining pairs) and ~1/3 carry a
  * shared third symbol, so every candidate merge has a SMALL raised
  * gain. Bounds that SUM gains over the batch stop after
  * ~count/gain accepts; the per-candidate top-2 ledger rides the whole
  * window. Usage: `runMain graft.tools.BpeLedgerProbe [sfDir]`. */
object BpeLedgerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.sources.Testdata.table(spark, sfDir, "documents")
      .select(col("doc_id"), expr(
        "array_join(transform(filter(split(text, ' '), w -> w != ''), " +
          "w -> concat(char(65 + pmod(xxhash64(w), 26)), " +
          "char(97 + pmod(xxhash64(concat(w, 'y')), 26)), " +
          "CASE WHEN pmod(xxhash64(concat(w, 'z')), 3) = 0 " +
          "THEN 'u' ELSE '' END)), ' ')").as("text"))
    d.persist(); d.count()
    val t0 = System.nanoTime()
    val (rules, rounds) = graft.ops.Vocab.bpeTrainBatched(
      d, "text", merges = 40, window = 64)
    println(f"BPELEDGER shared-suffix merges=${rules.size} rounds=$rounds " +
      f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    val seqRules = graft.ops.Vocab.bpeTrain(d, "text", merges = 40)
    println(s"BPELEDGER rules==sequential: ${rules == seqRules}")
    spark.stop()
  }
}
