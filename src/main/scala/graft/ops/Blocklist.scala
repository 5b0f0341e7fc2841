package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Blocklist subtraction at corpus scale: drop every document whose key
  * appears in a blocklist (takedown lists, known-contaminated fingerprints,
  * opt-out registries) — semantically a plain anti-join, engineered so the
  * CORPUS never shuffles.
  *
  * Why not just `left_anti`? At 100 TB the corpus side of a shuffled
  * anti-join moves every row (text and all) across the wire; a broadcast
  * anti-join caps the blocklist at driver/executor hash-map size (~10⁷
  * keys). The standard third regime — blocklists of 10⁸–10⁹ keys — fits a
  * Bloom filter in tens of MB at a few bits per key. Plan:
  *
  *  1. ONE pass over the blocklist builds a Bloom filter of xxhash64(key)
  *     (`df.stat.bloomFilter` — partial filters merged tree-wise);
  *  2. the corpus is filtered MAP-SIDE through the codegen'd
  *     [[graft.functions.BloomMightContain]]: `might = false` rows are
  *     definitively clean (Bloom filters have no false negatives over the
  *     inserted set, and xxhash64 is deterministic) and exit without ever
  *     touching a join;
  *  3. only the `might = true` sliver (true hits + fpp of the corpus +
  *     any 64-bit hash collisions) takes an exact anti-join ON THE
  *     ORIGINAL KEY, which removes Bloom/hash false positives.
  *
  * The result is therefore EXACTLY the plain anti-join — bit-for-bit,
  * independent of fpp and of the filter's bit layout — which is what the
  * q90 oracle checks. NULL corpus keys never match a blocklist (SQL
  * anti-join semantics): xxhash64(NULL) = seed may Bloom-hit, but the
  * confirm join's null-unsafe equality keeps the row either way.
  */
object Blocklist {

  /** Serialize a Bloom filter for embedding as a binary literal. */
  private[graft] def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Build the 64-bit-key Bloom filter of `block(blockKeyCol)`.
    * `expectedItems` sizes the filter (pass the known blocklist
    * cardinality at scale; 0 → count it with one extra job). */
  private[graft] def buildBloom(block: DataFrame, blockKeyCol: String,
                                expectedItems: Long, fpp: Double): BloomFilter = {
    val n = if (expectedItems > 0) expectedItems else block.count()
    block.stat.bloomFilter(xxhash64(col(blockKeyCol)), math.max(n, 1L), fpp)
  }

  /** The Bloom membership probe as a Column (requires
    * [[graft.plans.GraftExtensions]]' function registrations, installed
    * defensively on the frame's own session). */
  private def mightContain(df: DataFrame, keyCol: String,
                           bloomBytes: Array[Byte]): Column = {
    graft.plans.GraftExtensions.install(df.sparkSession)
    call_function("graft_bloom_might_contain",
      lit(bloomBytes), xxhash64(col(keyCol)))
  }

  /** `corpus` minus rows whose `keyCol` appears in `block(blockKeyCol)` —
    * exact anti-join semantics, Bloom-prefiltered so only the candidate
    * sliver shuffles. See object doc for the three-stage plan. */
  def bloomAntiJoin(corpus: DataFrame, keyCol: String,
                    block: DataFrame, blockKeyCol: String,
                    expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val bytes = serialize(buildBloom(block, blockKeyCol, expectedItems, fpp))
    // Collision-free staging column (ADVICE r11): a hardcoded name would
    // silently overwrite — then drop — a caller's column of the same
    // name. Shared deterministic probe: first free suffix wins.
    val might = ColumnNames.freeName(corpus, "__graft_might")
    val tagged = corpus.withColumn(might,
      mightContain(corpus, keyCol, bytes))
    // NULL key → NULL probe → neither branch would keep it; route NULL
    // (and false) to the clean branch — anti-join keeps null keys anyway.
    val clean = tagged.filter(!coalesce(col(might), lit(false)))
      .drop(might)
    val candidates = tagged.filter(coalesce(col(might), lit(false)))
      .drop(might)
    val confirmed = candidates.join(block.select(col(blockKeyCol)),
      candidates(keyCol) === block(blockKeyCol), "left_anti")
    clean.unionByName(confirmed)
  }
}
