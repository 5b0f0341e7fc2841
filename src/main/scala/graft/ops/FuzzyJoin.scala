package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string join (entity matching): all cross-frame pairs whose
  * Levenshtein edit distance is ≤ `maxDist`, WITHOUT the quadratic
  * compare — rarest-first prefix filtering (ED-Join, Xiao et al.
  * VLDB'08) over padded q-grams by default, with the classic full
  * count-filtering plan (Gravano et al., VLDB'01) as the alternate
  * strategy; both compose from exchanges that carry only ids, grams
  * (≤ q chars) and small ints.
  *
  * Soundness of the prefilter (what makes the result EXACT): one edit
  * operation changes at most q of a string's padded q-grams, so two
  * strings within distance k share, as MULTISETS, at least
  * `max(len_a, len_b) + q − 1 − k·q` grams. The candidate stage computes
  * exactly that multiset intersection — per-(id, gram) counts, gram-keyed
  * join, `Σ min(count_a, count_b)` per pair — and keeps pairs meeting
  * the bound plus the length filter `|len_a − len_b| ≤ k`. No true pair
  * can be lost, so the exact `levenshtein` confirm on the survivors
  * yields precisely the brute-force result (asserted in FuzzyJoinSpec).
  *
  * Degenerate strings shorter than `k·q − q + 2` have a non-positive
  * bound — count filtering carries no signal for them — so they route
  * through a direct compare of the two SHORT buckets. At q=2, k=1 that
  * is strings of ≤ 1 character; at k=2 it is ≤ 3 characters, and on a
  * token-like corpus the short bucket can be a large fraction of the
  * input (ADVICE r12). The compare is therefore NOT a broadcast nested
  * loop: each short pair meets through a salted length-window equi-join
  * (one side explodes its ±k admissible lengths, the other replicates
  * across a fixed salt), so no unbounded frame is ever broadcast and
  * the inherent within-length-window quadratic compare is spread across
  * `ShortSalt` tasks instead of flooding one reducer. The quadratic is
  * irreducible — below the gram length no q-gram signal exists — so the
  * plan distributes it rather than pretending to prune it. Everything
  * else rides the gram plan.
  *
  * Scale posture: candidate volume is Σ over INDEXED grams of
  * df_left(g)·df_right(g). Under the default prefix filter only each
  * string's k·q+1 globally-rarest gram occurrences are indexed, so
  * corpus-wide boilerplate ("Supplier#…", "https://www.…") lands
  * outside every prefix and contributes NOTHING — candidates track the
  * distinguishing rare grams (measured in PERF.md §fuzzy-join: ~linear
  * on a shared-prefix corpus where the count plan grows quadratically).
  * Flood control is therefore lossless — no recall-trading df cap, the
  * knobs are q and the data-adaptive rarity order. Strings themselves
  * never ride the gram exchange; they join back by id for the confirm.
  */
object FuzzyJoin {

  private def padded(str: Column, q: Int): Column = {
    // sentinel pad: the count bound needs |s| + q - 1 grams per string
    // (edits near the ends must still cost grams); data containing the
    // sentinel cannot break soundness - each edit still destroys <= q
    // padded grams whatever the characters are
    val pad = "\u0001" * (q - 1)
    concat(lit(pad), str, lit(pad))
  }

  /** (id, gram, cnt, len) — per-string multiset q-gram counts. */
  private def gramCounts(df: DataFrame, idCol: String, strCol: String,
                         q: Int): DataFrame = {
    val p = padded(col(strCol), q)
    df.select(col(idCol).as("id"), length(col(strCol)).as("len"), p.as("p"))
      .select(col("id"), col("len"), explode(expr(
        s"transform(sequence(1, length(p) - ${q - 1}), i -> substring(p, i, $q))"
      )).as("gram"))
      .groupBy("id", "len", "gram").agg(count(lit(1)).as("cnt"))
  }

  /** (id, len, gram, j) — one row per gram OCCURRENCE, `j` = 1-based
    * occurrence number of that gram within its string, so multiset gram
    * intersection becomes SET intersection of (gram, j) elements (the
    * j-th copy matches the j-th copy). The occurrence numbering is a
    * per-row HOF fold — O(len²) per string, map-side, no shuffle; this
    * operator targets entity-matching strings (names, titles), not
    * documents. */
  private[graft] def gramElems(df: DataFrame, idCol: String, strCol: String,
                        q: Int): DataFrame = {
    val p = padded(col(strCol), q)
    df.select(col(idCol).as("id"), length(col(strCol)).as("len"), p.as("p"))
      .withColumn("gs", expr(
        s"transform(sequence(1, length(p) - ${q - 1}), i -> substring(p, i, $q))"))
      .select(col("id"), col("len"), explode(expr(
        "transform(gs, (g, i) -> struct(g AS gram, " +
          "size(filter(slice(gs, 1, i + 1), x -> x = g)) AS j))")).as("e"))
      .select(col("id"), col("len"), col("e.gram").as("gram"), col("e.j").as("j"))
  }

  /** Rarest-first prefix-filtered candidates (ED-Join's move): order
    * every string's gram occurrences by global rarity; two strings
    * within distance k must share ≥ `max(|G_a|,|G_b|) − k·q` elements,
    * so by the prefix-filtering lemma they share at least one of each
    * side's first `k·q + 1` elements in ANY shared total order. Only
    * those prefix elements are indexed — on a shared-prefix corpus
    * (names all starting "Supplier#") the common grams are everyone's
    * COMMONEST, land outside every prefix, and candidate volume tracks
    * the rare grams (the distinguishing digits) instead of exploding
    * quadratically on the boilerplate. The global order is data-adaptive
    * (df over both sides — the df table is gram-vocabulary-bound, tiny,
    * and broadcast). Lossless: every true pair survives to the confirm. */
  private def prefixCandidates(ga: DataFrame, gb: DataFrame,
                               maxDist: Int, q: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfTable = ga.select("gram").unionAll(gb.select("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
    def prefix(g: DataFrame, suffix: String): DataFrame =
      g.join(broadcast(dfTable), "gram")
        .withColumn("rk", row_number().over(
          Window.partitionBy("id").orderBy("df", "gram", "j")))
        .filter(col("rk") <= maxDist * q + 1)
        .select(col("id").as(s"id_$suffix"), col("len").as(s"len_$suffix"),
          col("gram"), col("j"))
    prefix(ga, "a").join(prefix(gb, "b"), Seq("gram", "j"))
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      .select("id_a", "id_b").distinct()
  }

  /** Salt-fan cap for the short-bucket compare: the quadratic work
    * inside one length window spreads across at most this many tasks. */
  private val ShortSaltMax = 32L

  /** Adaptive salt fan (ADVICE r13 — a fixed 32 made every tiny short
    * bucket pay a 32× b-side replication for no skew benefit): one salt
    * step per ~512 b-side rows in the short/mixed length range, capped.
    * A typical prose corpus at k=1 (short = 1-char strings) gets fan 1 —
    * no replication at all; a token-like corpus at k≥2 still spreads its
    * irreducible quadratic across up to [[ShortSaltMax]] tasks. Costs one
    * count job over the (map-side-filtered) b frame per [[editJoin]]. */
  private[graft] def saltFor(nShortB: Long): Long =
    math.min(ShortSaltMax, math.max(1L, nShortB / 512L))

  /** Every (a, b) row pair with `|len_a − len_b| ≤ maxDist`, met through
    * an EQUI-join: side a explodes its 2k+1 admissible partner lengths
    * and a deterministic id-hash salt, side b replicates across the salt
    * — a pair meets exactly once, at (len_b, salt_a). Replaces the r12
    * broadcast nested-loop (ADVICE: at k ≥ 2 the short bucket is all
    * strings of ≤ k·q−q+1 chars — an unbounded broadcast on token-like
    * corpora). Shuffle rows carry (id, len, str≤shortLen chars, salt);
    * no driver-side size assumption anywhere. */
  private[graft] def lengthWindowJoin(a: DataFrame, b: DataFrame,
                               maxDist: Int, salt: Long): DataFrame = {
    val ae = a
      .withColumn("__pl", explode(sequence(
        col("len_a") - maxDist, col("len_a") + maxDist)))
      .withColumn("__salt", pmod(xxhash64(col("id_a")), lit(salt)))
    val be = b.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    ae.join(be, ae("__pl") === be("len_b") && ae("__salt") === be("__salt"))
      .drop("__pl", "__salt")
  }

  /** All (id_a, id_b, dist) pairs across `left` × `right` with
    * `levenshtein(strA, strB) ≤ maxDist`. Exact — equals the quadratic
    * filter row-for-row, under EITHER candidate plan: `prefixFilter =
    * true` (default) indexes only each string's k·q+1 rarest gram
    * occurrences; `false` runs the full multiset count filter (tighter
    * per pair, but its gram join floods on shared-boilerplate corpora).
    * For a self-join pass the same frame twice and keep `id_a < id_b`
    * afterwards (or use [[editSelfJoin]]). */
  def editJoin(left: DataFrame, leftId: String, leftStr: String,
               right: DataFrame, rightId: String, rightStr: String,
               maxDist: Int, q: Int = 2,
               prefixFilter: Boolean = true): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0 (got $maxDist)")
    require(q >= 2, s"q must be >= 2 (got $q)")
    val la = left.select(col(leftId).as("id_a"), col(leftStr).as("str_a"),
      length(col(leftStr)).as("len_a"))
    val rb = right.select(col(rightId).as("id_b"), col(rightStr).as("str_b"),
      length(col(rightStr)).as("len_b"))

    // strings whose count bound is non-positive: len + q - 1 - k*q < 1
    val shortLen = maxDist * q - q + 1
    // one salt fan for all three length-window joins, sized from the
    // b-side rows any of them can replicate (short + mixed range);
    // maxDist = 0 has no short bucket at q >= 2 — skip the count job
    val salt = if (shortLen < 1) 1L
      else saltFor(rb.filter(col("len_b") <= shortLen + maxDist).count())
    val shortPairs = lengthWindowJoin(
      la.filter(col("len_a") <= shortLen),
      rb.filter(col("len_b") <= shortLen), maxDist, salt)

    val candidates =
      if (prefixFilter)
        prefixCandidates(
          gramElems(left.filter(length(col(leftStr)) > shortLen),
            leftId, leftStr, q),
          gramElems(right.filter(length(col(rightStr)) > shortLen),
            rightId, rightStr, q),
          maxDist, q)
      else {
        val ga = gramCounts(left.filter(length(col(leftStr)) > shortLen),
          leftId, leftStr, q)
          .withColumnsRenamed(Map("id" -> "id_a", "len" -> "len_a", "cnt" -> "cnt_a"))
        val gb = gramCounts(right.filter(length(col(rightStr)) > shortLen),
          rightId, rightStr, q)
          .withColumnsRenamed(Map("id" -> "id_b", "len" -> "len_b", "cnt" -> "cnt_b"))
        ga.join(gb, "gram")
          // length filter inside the gram join keeps the fan-out from
          // pairing strings the bound would discard anyway
          .filter(abs(col("len_a") - col("len_b")) <= maxDist)
          .groupBy("id_a", "id_b")
          .agg(sum(least(col("cnt_a"), col("cnt_b"))).as("shared"),
            first(col("len_a")).as("len_a"), first(col("len_b")).as("len_b"))
          .filter(col("shared") >=
            greatest(col("len_a"), col("len_b")) + lit(q - 1) - lit(maxDist * q))
          .select("id_a", "id_b")
      }
    // a long string can still pair with a short one (|len| gap ≤ k): the
    // long side's bound is positive, so the pair is in `candidates` IF
    // the short side grams too — it does not (filtered out). Cover the
    // mixed bucket directly: short side × long side, length-windowed.
    val mixedPairs = lengthWindowJoin(
      la.filter(col("len_a") <= shortLen),
      rb.filter(col("len_b") > shortLen &&
        col("len_b") <= shortLen + maxDist), maxDist, salt)
      .unionByName(lengthWindowJoin(
        la.filter(col("len_a") > shortLen && col("len_a") <= shortLen + maxDist),
        rb.filter(col("len_b") <= shortLen), maxDist, salt))

    val confirmed = candidates
      .join(la, "id_a").join(rb, "id_b")
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"))
      .unionByName(shortPairs.select("id_a", "id_b", "str_a", "str_b"))
      .unionByName(mixedPairs.select("id_a", "id_b", "str_a", "str_b"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= maxDist)
    confirmed.select("id_a", "id_b", "dist")
  }

  /** Self-join face: unordered pairs `id_a < id_b` within `maxDist`. */
  def editSelfJoin(df: DataFrame, idCol: String, strCol: String,
                   maxDist: Int, q: Int = 2,
                   prefixFilter: Boolean = true): DataFrame =
    editJoin(df, idCol, strCol, df, idCol, strCol, maxDist, q, prefixFilter)
      .filter(col("id_a") < col("id_b"))
}
