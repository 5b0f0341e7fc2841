package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE "beyond the reference" clause): tokenization, language-ID,
  * quality scoring, fingerprinting.
  *
  * Everything is a pure Column expression over built-ins (codegen'd or
  * JVM higher-order functions — no UDFs), so Catalyst can push, prune and
  * pipeline around them; per-row work is O(tokens), embarrassingly
  * partition-parallel at any scale.
  */
object TextAnalysis {

  /** Whitespace tokenization, empty-safe (consecutive/trailing separators
    * yield no empty tokens) and NULL-safe: NULL text yields an EMPTY
    * array, not NULL — gram consumers (langId/NB predict, DSIR scoring)
    * branch on `size(gs) === 0` for their "no signal" row ('und',
    * zero-gram score), and a propagated NULL would silently skip that
    * branch (ADVICE r15). */
  def tokens(text: Column): Column =
    coalesce(filter(split(text, " "), t => t =!= ""),
      array().cast("array<string>"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean token length in characters (NULL for empty docs). */
  def avgTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Share of non-alphanumeric, non-space characters — a punctuation/noise
    * signal for quality filtering. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^a-z0-9A-Z ]", "")))
        .cast("double") / length(text))

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deliberately small and public-knowledge. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "de", "y", "es"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  /** Number of tokens that belong to `set`. */
  def stopwordHits(ts: Column, set: Seq[String]): Column =
    size(filter(ts, t => t.isInCollection(set)))

  /** Stopword share of all tokens (quality signal: natural language has a
    * stable 0.2-0.5 band; word salad and boilerplate fall outside). */
  def stopwordRatio(text: Column, langs: Seq[String] = Seq("en")): Column = {
    val ts = tokens(text)
    val all = langs.flatMap(stopwords).distinct
    when(size(ts) > 0, stopwordHits(ts, all).cast("double") / size(ts))
  }

  /** Language-ID: argmax of per-language stopword hits with a fixed
    * tie/miss order (ties → earlier entry in `order`; zero hits → "und").
    * The scalable form of n-gram language-ID — per-row, no shuffle. */
  def langId(text: Column, order: Seq[String] = Seq("en", "fr", "de", "es", "zh")): Column = {
    val ts = tokens(text)
    val hits = order.map(l => l -> stopwordHits(ts, stopwords(l)))
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((l, h), els) =>
      when(h > 0 && h === best, lit(l)).otherwise(els)
    }
  }

  /** Composite quality score in [0,1]: length band + stopword band + low
    * punctuation noise. Weights are engine policy, not reference parity. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lenScore = when(nTok >= 20 && nTok <= 1000, 1.0)
      .when(nTok >= 5, 0.5).otherwise(0.0)
    val swScore = when(stopwordRatio(text) >= 0.05, 1.0).otherwise(0.3)
    val punctScore = when(coalesce(punctRatio(text), lit(0.0)) <= 0.2, 1.0).otherwise(0.2)
    ((lenScore * 0.4) + (swScore * 0.4) + (punctScore * 0.2)).cast("decimal(4,2)")
  }

  /** Canonical content fingerprint: md5 over the whitespace-normalized
    * token stream. Case/spacing variants of the same content collide —
    * the groupable document fingerprint for exact dedup at scale. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))))

  /** Unicode NFC (canonical composition) via the codegen'd
    * [[graft.functions.NfcNormalize]] — requires
    * [[graft.plans.GraftExtensions]]' function registrations on the
    * session the query runs in (Verify/Bench/production sessions all
    * install them). */
  def nfc(text: Column): Column = call_function("graft_nfc", text)

  /** Full text canonicalization: NFC compose → lowercase → collapse
    * whitespace runs → trim. The equivalence classes [[fingerprint]]
    * misses are exactly the NFC ones — crawl dumps emitted by different
    * toolchains carry composed vs decomposed accents that render
    * identically but hash apart. Pure map-side, codegen'd end to end. */
  def normalizeText(text: Column): Column =
    concat_ws(" ", tokens(lower(nfc(text))))

  /** [[fingerprint]] over the NFC-canonical form — the dedup key to use
    * when the corpus mixes encoder toolchains. */
  def normalizedFingerprint(text: Column): Column = md5(normalizeText(text))

  /** Writing-system character classes for script detection — codepoint
    * RANGES spelled `\x{…}` (the regex subset Java and RE2 agree on;
    * named properties like `\p{IsCyrillic}` vs `\p{Cyrillic}` do NOT
    * agree across engines and are avoided). CJK folds Han + kana. */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "devanagari" -> "[\\x{0900}-\\x{097F}]")

  /** Markup stripping for crawl dumps: drop `<script>`/`<style>` blocks
    * wholesale (their contents are code, not prose), strip remaining
    * tags, decode the five ubiquitous HTML entities, collapse
    * whitespace. Regex subset: `(?s)` + non-greedy `.*?`, both in the
    * Java∩RE2 intersection; NO backreferences (RE2 has none), so script
    * and style close independently. Entity order matters and is pinned:
    * `&amp;` decodes LAST, so `&amp;lt;` yields the literal `&lt;` (one
    * decode pass, exactly — the HTML spec's behavior). Pure map-side. */
  def stripMarkup(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** URL regex (Java∩RE2 subset): scheme + non-space run. */
  val UrlRe = "https?://[^\\s]+"

  /** Number of URLs in the text. */
  def urlCount(text: Column): Column = matchCount(text, UrlRe)

  /** Fraction of characters inside URLs — the link-density quality
    * signal (link farms and nav pages score high, prose scores ~0).
    * Exact integer counts, one IEEE division; NULL for empty text. */
  def linkCharRatio(text: Column): Column =
    when(length(text) === 0, lit(null)).otherwise(
      (charClassCount(text, UrlRe).cast("double")) / length(text))

  /** The host part of every URL in the text (regex group 1) — feeds
    * domain-level aggregation: per-domain doc counts, domain blocklists,
    * domain mixture caps. */
  def urlDomains(text: Column): Column =
    regexp_extract_all(text, lit("https?://([^/\\s]+)"), lit(1))

  /** Pinned tracking-parameter pattern (Java∩RE2 subset): the utm_*
    * family plus the ubiquitous click-id params — the query noise crawl
    * corpora carry the same page under. */
  val TrackingParamRe: String =
    "^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|yclid)(=.*)?$"

  /** URL canonicalization (VERDICT r16 #6): collapse the spelling
    * variants crawl corpora carry the same page under, BEFORE
    * fingerprint/blocklist dedup treats them as distinct —
    *   - scheme and host lowercase (path/query case is significant and
    *     kept),
    *   - default ports dropped (`:80` for http, `:443` for https;
    *     non-default ports kept),
    *   - fragment dropped (never reaches the server),
    *   - trailing slashes stripped from the path,
    *   - tracking params ([[TrackingParamRe]]) dropped, the survivors
    *     sorted (param-order twins collide; a `?`-less form results
    *     when nothing survives).
    * Non-http(s) input passes through trimmed-unchanged (no NULL bomb).
    * Pure map-side — regexp/split/filter/sort, all codegen'd, all in
    * the Java∩RE2 regex subset so DuckDB replays the chain verbatim
    * (q154's oracle). */
  def canonicalUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^(?i)(https?)://", 1))
    val hostport = lower(regexp_extract(u, "^(?i)https?://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(regexp_replace(hostport, ":443$", ""))
    val noFrag = regexp_replace(
      regexp_replace(u, "^(?i)https?://[^/?#]+", ""), "#.*$", "")
    val pathC = regexp_replace(regexp_extract(noFrag, "^([^?]*)", 1), "/+$", "")
    val params = filter(split(regexp_extract(noFrag, "\\?(.*)$", 1), "&"),
      t => length(t) > 0 && !t.rlike(TrackingParamRe))
    val qC = array_join(array_sort(params), "&")
    when(scheme === "", u).otherwise(concat(scheme, lit("://"), host, pathC,
      when(qC === "", lit("")).otherwise(concat(lit("?"), qC))))
  }

  /** Count of characters matching a regex character class: length minus
    * length-after-removal — the subtraction trick that needs only
    * `regexp_replace`, which every engine has (no regexp_count parity
    * concerns). Pure map-side, codegen'd. */
  def charClassCount(text: Column, cls: String): Column =
    length(text) - length(regexp_replace(text, cls, ""))

  /** Dominant writing system: argmax over [[ScriptClasses]] counts with
    * fixed list-order precedence on ties; "none" when no class matches
    * (digits/punctuation-only docs). The routing key for per-script
    * pipeline branches (tokenizer choice, langId applicability) —
    * [[langId]] separates languages WITHIN Latin script; this separates
    * scripts, which langId's Latin-stopword heuristic can't see. */
  def dominantScript(text: Column): Column = {
    val counts = ScriptClasses.map { case (n, cls) => n -> charClassCount(text, cls) }
    val m = greatest(counts.map(_._2): _*)
    counts.foldLeft(when(m === 0, "none")) { case (acc, (n, c)) =>
      acc.when(c === m, n)
    }.otherwise("none")
  }

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * other non-space characters each count as one token — a cheap proxy
    * for subword tokenizer counts (closer to LLM token budgets than
    * whitespace words on punctuation-heavy text). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Rolling polynomial hash over tokens (base-31 Horner fold over each
    * token's xxhash64) — an order-sensitive fingerprint: permuted copies
    * of the same bag of words do NOT collide, unlike [[fingerprint]]. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc * lit(31L) + xxhash64(t))

  /** PII patterns, kept to syntax both Java regex and RE2 accept (char
    * classes, bounded repeats, \b) so external engines redact identically. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Redact emails/phone numbers with typed placeholders — the scrub step
    * of a training-data pipeline. Pure map-side, codegen'd regex. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(EmailRe), lit("[EMAIL]")),
      lit(PhoneRe), lit("[PHONE]"))

  /** Count of pattern matches in the text (whole-match group). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Raw (non-distinct) word n-grams, 1-indexed slices — the input to
    * repetition scoring. Caller must guard `size(tokens) >= n`. */
  def ngrams(toks: Column, n: Int): Column =
    transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))

  /** Winnowed k-gram fingerprints (the MOSS winnowing scheme, Schleimer/
    * Wilkerson/Aiken SIGMOD'03): hash every k-token shingle, slide a
    * window of `w` consecutive hashes, keep each window's minimum, then
    * de-duplicate. The guarantee that makes it the right SAMPLED
    * fingerprint for span-level matching: any shared token run of at
    * least w+k-1 tokens contributes at least one shared fingerprint,
    * while only ~2/(w+1) of the gram hashes are stored — a tunable
    * density/recall dial an exhaustive gram set (q47's decontamination)
    * does not have.
    *
    * Pure map-side columnar expression — no shuffle, no UDF; hashes are
    * md5 hex, whose lexicographic min is identical in every engine.
    * Docs shorter than w+k-1 tokens yield their single minimum gram
    * hash (all-gram window), and shorter than k tokens yield empty.
    *
    * The token and gram arrays are BOUND ONCE per row through
    * single-element-array lambdas: Spark's higher-order functions run
    * interpreted with no common-subexpression elimination, so an
    * unbound `grams` referenced from every window slice would recompute
    * EVERY md5 for EVERY window — O(n·w) hashes instead of O(n),
    * measured ~70× slower on the sf0.1 corpus. */
  def winnowedFingerprints(toks: Column, k: Int, w: Int): Column = {
    require(k >= 1 && w >= 1, s"k and w must be positive (got k=$k w=$w)")
    val empty = array().cast("array<string>")
    def bind(c: Column)(f: Column => Column): Column =
      element_at(transform(array(c), f), 1)
    bind(toks) { ts =>
      bind(when(size(ts) >= k,
          transform(sequence(lit(1), size(ts) - (k - 1)),
            i => md5(concat_ws(" ", slice(ts, i, lit(k))))))
        .otherwise(empty)) { grams =>
        array_distinct(
          when(size(grams) >= w,
            transform(sequence(lit(1), size(grams) - (w - 1)),
              j => array_min(slice(grams, j, lit(w)))))
          .when(size(grams) > 0, array(array_min(grams)))
          .otherwise(empty))
      }
    }
  }

  /** Corpus-LM quality proxy (the CCNet/Gopher filtering idea without an
    * external language model): the share of a document's token bigrams
    * whose corpus-wide occurrence count reaches `minCount`. Fluent text
    * re-uses the corpus's frequent transitions; word salad, mangled
    * encodings, and lorem-style filler do not — so a low `common_ratio`
    * is the perplexity-shaped signal a quality gate thresholds on,
    * computed from the corpus itself (no model download, no UDF, exact
    * integer counts so any engine reproduces it bit-for-bit).
    *
    * 100 TB posture: the "LM" is a partial+final count keyed by the
    * bigram string; scoring joins occurrences to counts on that same key
    * (co-partitioned with the agg — one exchange serves both) and
    * re-aggregates per doc carrying (id, flag) pairs only. Nothing is
    * collected to the driver; the model IS the shuffled count table.
    *
    * Returns one row per input doc: (idCol, nb_bigrams, nb_common,
    * common_ratio) — the ratio an IEEE division of exact longs, NULL for
    * docs with fewer than two tokens. */
  def bigramCommonRatio(docs: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String,
                        minCount: Long): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val bg = docs
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(ngrams(col("__t"), 2)).as("g"))
    val counts = bg.groupBy("g").agg(count(lit(1)).as("__c"))
    val per = bg.join(counts, Seq("g"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("nb_bigrams"),
        sum(when(col("__c") >= minCount, 1L).otherwise(0L)).as("nb_common"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("nb_bigrams"), lit(0L)).as("nb_bigrams"),
        coalesce(col("nb_common"), lit(0L)).as("nb_common"))
      .withColumn("common_ratio",
        when(col("nb_bigrams") > 0,
          col("nb_common").cast("double") / col("nb_bigrams").cast("double")))
  }

  /** Corpus term weighting — the log-free TF-IDF variant
    * weight = tf × N ∕ df (rarity-scaled term frequency). Log-free
    * because libm log is not bit-identical across engines, while
    * tf×N ≤ 2^53 is exact and one IEEE division is — so weights (and
    * their ranking) reproduce bit-for-bit anywhere.
    *
    * 100 TB posture: tf and df are partial+final count aggregates (two
    * key shuffles); the corpus size N is a 1-row broadcast. Returns one
    * row per (doc, term): (idCol, term, tf, df, weight). */
  def termWeights(docs: org.apache.spark.sql.DataFrame,
                  idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count_distinct(col(idCol)).as("__n"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("weight",
        (col("tf") * col("__n")).cast("double") / col("df"))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("weight"))
  }

  /** Corpus composition report — ONE grouping-sets pass producing the
    * per-`dimA` / per-`dimB` / per-(`dimA`,`dimB`) / grand-total summary a
    * data team publishes with every corpus drop: doc count, token and
    * char volume, quality mass. `gid` is the standard GROUPING() bitmask
    * (leftmost dim = most significant bit), so the level of each row is
    * explicit and the output is engine-portable (ANSI GROUPING SETS).
    *
    * Cross-engine stability: counts/token/char sums are integer; the
    * quality column is [[qualityScore]]'s exact decimal(4,2), so its SUM
    * is exact decimal arithmetic — no float summation order anywhere
    * (the one double cast happens on the already-exact total).
    *
    * 100 TB posture: grouping sets expand map-side (one pass over the
    * corpus, partial+final aggregation per set); the output is bounded
    * by the dimension cardinalities, never the corpus. */
  def corpusReport(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   dimA: String, dimB: String): org.apache.spark.sql.DataFrame =
    docs.select(col(dimA), col(dimB),
        tokenCount(col(textCol)).as("__t"),
        length(col(textCol)).cast("long").as("__c"),
        qualityScore(col(textCol)).as("__q"))
      .groupingSets(
        Seq(Seq(col(dimA), col(dimB)), Seq(col(dimA)), Seq(col(dimB)), Seq()),
        col(dimA), col(dimB))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("nb_docs"),
        sum(col("__t")).cast("long").as("total_tokens"),
        sum(col("__c")).as("total_chars"),
        sum(col("__q")).cast("double").as("sum_quality"))
      .select(col("gid"), col(dimA), col(dimB), col("nb_docs"),
        col("total_tokens"), col("total_chars"), col("sum_quality"))

  /** C4-style boilerplate line removal: lines (newline-split, empties
    * dropped) occurring in more than `maxDocs` distinct docs corpus-wide
    * are deleted from every doc; surviving lines reassemble in original
    * order. This is the "terms of service / cookie banner" cleanup of a
    * web-corpus pipeline.
    *
    * 100 TB posture: line doc-frequency is a partial+final distinct-count
    * aggregate; the boilerplate set it yields is tiny by construction
    * (only lines shared by > maxDocs docs), so the line-drop join is an
    * anti-join against a frame AQE will broadcast — the corpus itself
    * shuffles once (the per-doc reassembly aggregate). Returns one row
    * per input doc: (idCol, clean_text, nb_kept, nb_removed); docs that
    * were pure boilerplate — or had no non-empty lines at all — come
    * back with an empty clean_text. */
  def removeBoilerplate(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, maxDocs: Long): org.apache.spark.sql.DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(filter(split(col(textCol), "\n"), l => l =!= "")).as(Seq("pos", "line")))
    val boiler = lines.groupBy("line")
      .agg(count_distinct(col(idCol)).as("line_df"))
      .filter(col("line_df") > maxDocs)
      .select("line")
    val kept = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("nb_kept"))
    // per-doc line totals come from the DOCS frame, not the exploded
    // lines (review r12: grouping the lines dropped docs with zero
    // non-empty lines, breaking the one-row-per-input-doc contract) —
    // and size() is map-side where the old groupBy was a second shuffle
    val totals = docs.select(col(idCol),
      coalesce(size(filter(split(col(textCol), "\n"), l => l =!= "")), lit(0))
        .cast("long").as("nb_lines"))
    totals.join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("nb_kept"), lit(0L)).as("nb_kept"),
        (col("nb_lines") - coalesce(col("nb_kept"), lit(0L))).as("nb_removed"))
  }

  /** Per-group quantile filter: keep the top `keepFrac` of each group by
    * `score` — the relative quality cut used when an absolute threshold
    * can't work because score distributions differ per language / domain
    * ("keep the best 25% of EACH language", not "quality ≥ 0.7", which
    * would empty low-resource languages scored by en-tuned heuristics).
    *
    * Rank semantics: `percent_rank` over (score DESC, id ASC) — the id
    * tiebreak makes the order TOTAL, so ranks (hence the kept set) are
    * bit-identical across engines and partition counts; percent_rank is
    * (rank−1)/(n−1), an IEEE division of exact integers, and a
    * single-row group (n=1, rank 0/0 → 0.0) is always kept. The cut is
    * `< keepFrac` on that exact double; the top-ranked row of every group
    * has percent_rank 0.0, so "top 25%" means ⌈n/4⌉-ish rows, never zero.
    *
    * 100 TB posture: ONE group-keyed window shuffle; the filter is
    * window-local. Group count is the parallelism floor (a 5-language
    * corpus windows over 5 partitions) — for few huge groups, pre-bucket
    * by [[graft.ops.Relational]]'s approx-quantile cut instead; this
    * exact form is for group counts ≥ the cluster's task slots or group
    * sizes that fit a partition. */
  def quantileFilter(docs: org.apache.spark.sql.DataFrame, groupCol: String,
                     score: Column, idCol: String,
                     keepFrac: Double): org.apache.spark.sql.DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"invalid keepFrac $keepFrac")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(score.desc, col(idCol).asc)
    docs.withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") < keepFrac)
      .drop("__pr")
  }

  /** Pairwise source-overlap matrix: exact n-gram Jaccard between every
    * pair of sources — the dataset-to-dataset similarity report that
    * catches a "new" corpus being a re-crawl of one already in the mix
    * (inter-dataset redundancy is invisible to per-doc dedup thresholds
    * when docs differ but the gram population doesn't).
    *
    * Shape: distinct (source, gram-fp60) pairs → per-source distinct
    * counts + a gram-keyed self-join for pair intersections →
    * |A∩B| / (|A|+|B|−|A∩B|). Output is source-pair-sized (dimension²,
    * never corpus). Gram keys are 60-bit md5 prefixes (8-byte longs on
    * the wire, engine-portable, collision-negligible at any realistic
    * distinct-gram count), not 32-char hex strings — a ~5× exchange cut.
    *
    * 100 TB posture: the distinct's exchange carries each partition's
    * LOCAL-distinct (source, fp60) rows — corpus-linear in the worst
    * case (cross-partition duplicates only collapse after the shuffle),
    * so the scale dial is `sampleBuckets` (hash-mod gram sampling: keep
    * grams whose [[Sampling.hashBucket]] < sampleBuckets; Jaccard over a
    * uniform hash-sample of the gram universe estimates the exact matrix,
    * and the SAME grams are sampled in every engine — measured at
    * sf0.1×30: buckets 16 → 15× less shuffle at ≤0.032 abs error,
    * buckets 4 → 58× at ≤0.053; PERF.md §overlap). Per-gram join fan-out
    * is ≤ #sources, so no key explodes. At 100 TB run with
    * sampleBuckets ≈ 4–16 (1.6–6% of grams). */
  def sourceOverlap(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, sourceCol: String, n: Int,
                    sampleBuckets: Int = 256): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1 (got $n)")
    require(sampleBuckets >= 1 && sampleBuckets <= 256,
      s"sampleBuckets must be in [1, 256] (got $sampleBuckets)")
    val grams = docs
      .filter(col(sourceCol).isNotNull)
      .withColumn("__toks", tokens(col(textCol)))
      .filter(size(col("__toks")) >= n) // ngrams' contract: caller guards
      .select(col(sourceCol).as("src"),
        explode(ngrams(col("__toks"), n)).as("g"))
      .select(col("src"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("gh"))
      .filter(Sampling.hashBucket(col("gh")) < sampleBuckets)
      .distinct()
      // r17-opt: consumed three times below (sizes + both self-join
      // sides) — cut the corpus gram pass once (the pairShingles finding)
      .transform(Lineage.cut(_))
    val sizes = grams.groupBy("src").agg(count(lit(1)).as("nb_grams"))
    val a = grams.toDF("src_a", "gh")
    val b = grams.toDF("src_b", "gh")
    val inter = a.join(b, "gh")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("nb_shared"))
    inter
      .join(sizes.toDF("src_a", "nb_a"), "src_a")
      .join(sizes.toDF("src_b", "nb_b"), "src_b")
      .withColumn("jaccard",
        col("nb_shared").cast("double") /
          (col("nb_a") + col("nb_b") - col("nb_shared")))
      .select("src_a", "src_b", "nb_a", "nb_b", "nb_shared", "jaccard")
  }

  /** TRAINED char-trigram language-ID (VERDICT r14 #8): [[langId]] is a
    * stopword+script heuristic — any text outside its tiny inventories
    * comes back "und". This is the classifier real curation pipelines
    * use instead: a multinomial model over character trigrams, fit as
    * ONE corpus pass of (label, trigram) counts and predicted map-side
    * against the broadcast count tables.
    *
    * The score is deliberately INTEGER-EXACT (partition-independent,
    * oracle-replayable — no float log-prob summation order to drift):
    * with add-one smoothing, score(l) = Σ_g cnt_doc(g)·(c(g,l)+1)
    * / (N_l + V) = (G_doc + dot_l) / (N_l + V), and the argmax compares
    * the cross-multiplied integers (G_doc + dot_l)·Π_{l'≠l}(N_{l'}+V)
    * exactly in DECIMAL(38,0) — linear-pooled likelihood rather than
    * log-pooled, the price of exactness, and ample signal for
    * language-ID where the frequent trigrams are disjoint.
    *
    * Scale shape: training is one vocabulary-bound aggregate; the model
    * ships as `topK` grams per language (rank (count desc, gram) — the
    * truncation every n-gram language profiler applies, Cavnar &
    * Trenkle '94), so predict is a pure map-side fold over per-language
    * map LITERALS — no UDF, no shuffle, no join. Magnitude bound:
    * (G + dot) ≤ G·(1 + max c) and the cross-product multiplies k−1
    * totals — within DECIMAL(38,0) for corpora up to ~10¹² training
    * trigrams at k ≤ 6 languages; beyond that shrink topK or partition
    * the fit. */
  case class LangIdModel(langs: Seq[String], v: Long,
                         totals: Map[String, Long],
                         counts: Map[String, Map[String, Long]])

  /** Lowercased character trigrams, one per OCCURRENCE (multiplicity is
    * the multinomial weight); empty below 3 characters. Built from the
    * split char array with aligned-slice zip_with — NOT
    * `transform(sequence(…), i -> substring(t, i, 3))`: SQL substring
    * on a UTF8String scans from the start to find the codepoint offset,
    * so the ordinal form is O(len²) per document (measured: it was 60+
    * of q145's 117 s at sf0.1); the slice form is linear. `split(t,
    * "")` appends one trailing empty element (Java split semantics) —
    * filtered, so the trigram set is exactly the substring form's.
    * NULL text yields an EMPTY array (not NULL) so langIdPredict's
    * `size(gs) === 0` branch still fires → 'und' (ADVICE r15). */
  def charTrigrams(text: Column): Column = charNgrams(text, 3)

  /** [[charTrigrams]] generalized to any n ∈ [1, 8] — the gram face for
    * UNSEGMENTED scripts (CJK, Thai): whitespace tokenization reduces an
    * unspaced document to one giant "token", collapsing every
    * token-gram estimator (language-ID trains fine on trigrams; DSIR's
    * token face degenerates — see [[Sampling.hashedNgramCounts]]'s
    * `charN`). Same aligned-slice zip_with chain as the trigram face
    * (linear, never ordinal-substring), same lowercasing, same
    * one-per-occurrence multiplicity, NULL-safe. */
  def charNgrams(text: Column, n: Int): Column = {
    require(n >= 1 && n <= 8, s"charNgrams n must be in [1, 8] (got $n)")
    // (r17-opt note: an explicit let-binding of the split via a
    // 1-element transform lambda was A/B-benched at sf0.1 and changed
    // nothing — Spark's subexpression elimination already evaluates the
    // repeated split once — so the direct form stays.)
    val cs = coalesce(filter(split(lower(text), ""), c => c =!= ""),
      array().cast("array<string>"))
    val m = greatest(size(cs) - (n - 1), lit(0))
    (2 to n).foldLeft(slice(cs, lit(1), m)) { (acc, i) =>
      zip_with(acc, slice(cs, lit(i), m), (a, b) => concat(a, b))
    }
  }

  /** Fit the model from labeled text: one (label, trigram) count pass;
    * `topK` grams per language ride to the driver (a bounded profile,
    * not the corpus). */
  def langIdTrain(labeled: DataFrame, labelCol: String, textCol: String,
                  topK: Int = 512): LangIdModel =
    // widePar: char-trigram extraction is the expensive-gram regime the
    // parallelism floor exists for (measured −0.9 s on q145's train at
    // sf0.1/local[32]; a token-gram fit measured the floor as pure
    // overhead, so it stays opt-in)
    nbTrain(labeled, labelCol, charTrigrams(col(textCol)), topK,
      widePar = true)

  /** The gram-agnostic fit behind [[langIdTrain]]: a multinomial model
    * over ANY array&lt;string&gt; gram expression — char trigrams for
    * language-ID, [[tokens]] for a domain/source classifier (the
    * DoReMi/DSIR-style classifier trained on source labels), word
    * bigrams for topicality. Same integer-exact contract and scale
    * shape as the langId face.
    *
    * `widePar`: floor the input's scan parallelism before the count
    * pass ([[Par.ensureMinPartitions]]) — the gram explode + partial
    * aggregation run BEFORE the first exchange, so on a one-row-group
    * file they run serial however many cores the session has. Opt-in
    * because the floor's fixed cost only pays off when per-row gram
    * extraction is expensive (char n-grams); for cheap token grams it
    * measured as a net loss at bench scale. */
  def nbTrain(labeled: DataFrame, labelCol: String, grams: Column,
              topK: Int = 512, widePar: Boolean = false): LangIdModel = {
    import org.apache.spark.sql.expressions.Window
    val g = (if (widePar) Par.ensureMinPartitions(labeled) else labeled)
      .select(col(labelCol).cast("string").as("lang"),
        explode(grams).as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val v = g.select("g").distinct().count()
      val totals = g.groupBy("lang").agg(sum(col("c")).as("n"))
        .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n")).toMap
      val top = g.withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("c").desc, col("g"))))
        .filter(col("rk") <= topK)
        .collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[String]("g"), r.getAs[Long]("c")))
      LangIdModel(totals.keys.toSeq.sorted, v, totals,
        top.groupBy(_._1).map { case (l, xs) =>
          l -> xs.map(x => x._2 -> x._3).toMap
        })
    } finally { g.unpersist(blocking = false); () }
  }

  /** Map-side argmax over the broadcast per-language count maps —
    * appends `outCol` with the predicted label ("und" when the text has
    * no trigrams). Exact-integer ranking, ties to the first label in
    * sorted order (both replayed by the q145 oracle). */
  def langIdPredict(df: DataFrame, textCol: String, m: LangIdModel,
                    outCol: String = "lang_pred"): DataFrame =
    nbPredict(df, charTrigrams(col(textCol)), m, outCol)

  /** The gram-agnostic argmax behind [[langIdPredict]] — pass the SAME
    * gram expression the model was fit with. */
  def nbPredict(df: DataFrame, grams: Column, m: LangIdModel,
                outCol: String = "lang_pred"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val gs = grams
    val scored = m.langs.zipWithIndex.map { case (l, i) =>
      val mp = typedlit(m.counts.getOrElse(l, Map.empty[String, Long]))
      val dot = aggregate(gs, lit(0L),
        (acc, x) => acc + coalesce(element_at(mp, x), lit(0L)))
      val others = m.langs.filter(_ != l)
        .map(l2 => BigInt(m.totals(l2) + m.v)).product
      struct(
        ((size(gs).cast("long") + dot).cast(DecimalType(38, 0)) *
          lit(new java.math.BigDecimal(others.bigInteger))).as("s"),
        lit(-i).as("nr"))
    }
    df.withColumn(outCol,
      when(size(gs) === 0, lit("und"))
        .otherwise(element_at(typedlit(m.langs),
          (lit(1) - array_max(array(scored: _*)).getField("nr")).cast("int"))))
  }

  /** Corpus-scale [[nbPredict]]: bit-identical predictions through a
    * BROADCAST JOIN instead of literal-map folds. A literal map's
    * `element_at` is a LINEAR SCAN over all topK entries per gram per
    * label (measured: the map-side q145 plan spent 117 s at sf0.1 on
    * ~10⁹ × topK string compares; this face runs it in seconds) — the
    * relational form explodes (id, gram) rows, hash-joins the broadcast
    * (gram, label, count) profile, and partial-aggregates k conditional
    * dot products per id map-side.
    *
    * Returns `(idCol, outCol)` ONLY — deliberately not the input frame:
    * joining predictions back onto the corpus would shuffle the TEXT
    * (measured: the first cut's join-back moved 146 MiB at 30×, linear
    * in the corpus — the exact full-corpus exchange this face exists to
    * avoid). Every exchange here carries (id, longs): the gram-count
    * frame, the dot products, and their id-keyed merge. Join the result
    * back by id if you need other columns — ids and labels shuffle,
    * text never does. `idCol` must be unique per row. [[nbPredict]]
    * stays the zero-shuffle form for small frames and ad-hoc use.
    *
    * `widePar` (default on): floor the input's scan parallelism
    * ([[Par.ensureMinPartitions]]) — the gram explode → broadcast join
    * → partial agg all run BEFORE the first exchange, so on a
    * one-row-group file the whole scoring pass runs serial however
    * many cores the session has (measured: q145 wall-flat between
    * local[4] and local[32] before the floor, −2 s after). Pass false
    * for cheap token grams on small frames, where the floor's fixed
    * cost measured as a net loss (q146). */
  def nbPredictById(df: DataFrame, idCol: String, grams: Column,
                    m: LangIdModel, outCol: String = "lang_pred",
                    widePar: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = df.sparkSession
    val profile = spark.createDataFrame(
      m.counts.toSeq.flatMap { case (l, gc) =>
        gc.toSeq.map { case (g, c) => (g, l, c) }
      }).toDF("__nb_g", "__nb_lang", "__nb_c")
    val dfP = if (widePar) Par.ensureMinPartitions(df) else df
    // (id, gram-count): map-side over the corpus, (id, long) exchange
    val gnF = dfP.select(col(idCol).as("__nb_id"),
      size(grams).cast("long").as("__nb_gn"))
    val dots = dfP.select(col(idCol).as("__nb_id"), explode(grams).as("__nb_g"))
      .join(broadcast(profile), Seq("__nb_g"))
      .groupBy("__nb_id")
      .agg(m.langs.head match { case l0 =>
        sum(when(col("__nb_lang") === l0, col("__nb_c")).otherwise(0L))
          .as(s"__nb_dot_0")
      }, m.langs.tail.zipWithIndex.map { case (l, i) =>
        sum(when(col("__nb_lang") === l, col("__nb_c")).otherwise(0L))
          .as(s"__nb_dot_${i + 1}")
      }: _*)
    val gn = col("__nb_gn")
    val scored = m.langs.zipWithIndex.map { case (l, i) =>
      val dot = coalesce(col(s"__nb_dot_$i"), lit(0L))
      val others = m.langs.filter(_ != l)
        .map(l2 => BigInt(m.totals(l2) + m.v)).product
      struct(
        ((gn + dot).cast(DecimalType(38, 0)) *
          lit(new java.math.BigDecimal(others.bigInteger))).as("s"),
        lit(-i).as("nr"))
    }
    gnF.join(dots, Seq("__nb_id"), "left")
      .select(col("__nb_id").as(idCol),
        when(gn === 0, lit("und"))
          .otherwise(element_at(typedlit(m.langs),
            (lit(1) - array_max(array(scored: _*)).getField("nr")).cast("int")))
          .as(outCol))
  }
}
