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

  /** Distinct word n-gram shingles of a token array. */
  def shingles(tokens: Column, n: Int): Column =
    array_distinct(
      when(size(tokens) >= n,
        transform(sequence(lit(1), size(tokens) - (n - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(n)))))
        .otherwise(array(concat_ws(" ", tokens))))

  /** MinHash signature: k md5-permutation minima over the shingle set,
    * as an array of hex strings (seed j salts the hash). */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingleSet, s => md5(concat(j, lit("|"), s)))))

  /** LSH banding: split the k-length signature into bands of `rows`
    * contiguous values; each band's key is its joined signature slice.
    * Docs sharing ANY band key become candidates. Returns
    * array<struct<band:int, key:string>> for posexplode. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        concat_ws("|", slice(sig, b * rows + 1, lit(rows))).as("key")))

  /** Candidate near-dup pairs via LSH: explode bands, self-join each
    * bucket, emit distinct (a < b) pairs. The join shuffles on the band
    * key only — bucket sizes, not corpus size, bound the pair blow-up. */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    shingleN: Int, k: Int, bands: Int, rows: Int): DataFrame = {
    require(bands * rows == k, s"bands*rows must equal k (got $bands*$rows != $k)")
    val sh = df.select(col(idCol).as("id"),
      shingles(TextAnalysis.tokens(col(textCol)), shingleN).as("sh"))
    val banded = sh
      .select(col("id"), posexplode(lshBands(minhashSignature(col("sh"), k), bands, rows)))
      .select(col("id"), col("col.band").as("band"), col("col.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard for given pairs: |A∩B| / |A∪B| over distinct
    * shingle sets. Runs only on the candidate pairs (two broadcast-or-
    * shuffle joins against the shingle table), never all-pairs. */
  def jaccardOnPairs(pairs: DataFrame, df: DataFrame, idCol: String,
                     textCol: String, shingleN: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      shingles(TextAnalysis.tokens(col(textCol)), shingleN).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("nb_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("nb_union",
        size(col("sh_a")) + size(col("sh_b")) - col("nb_inter"))
      // IEEE double division of two exact ints — bit-identical in any
      // engine (decimal division type rules are not)
      .withColumn("jaccard",
        col("nb_inter").cast("double") / col("nb_union").cast("double"))
      .select("id_a", "id_b", "jaccard")
  }

  /** Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleN: Int = 3, k: Int = 12,
                   bands: Int = 3, rows: Int = 4): DataFrame =
    jaccardOnPairs(
      lshCandidates(df, idCol, textCol, shingleN, k, bands, rows),
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
    * each doc to min(neighbor) as cluster rep (single-hop union — exact for
    * the transitive closure only when clusters are cliques, which LSH
    * near-dup groups practically are; iterate for chains). */
  def survivors(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val rep = pairs.select(col("id_a").as("id"), col("id_b").as("dup"))
      .groupBy("dup").agg(min("id").as("rep"))
    df.join(rep, df(idCol) === rep("dup"), "left")
      .filter(col("rep").isNull) // drop docs that point at an earlier rep
      .drop("dup", "rep")
  }
}
