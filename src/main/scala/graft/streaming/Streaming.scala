package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery}
import org.apache.spark.sql.types.StructType

import graft.io.{EsTransport, LakeZones, ServingSink}
import graft.model.Schemas

/** Structured Streaming surface — beyond reference parity (the reference
  * is strictly daily batch, SURVEY.md §2.8); this is the engine's
  * incremental story for users who feed the same zones continuously.
  *
  * Design: the streaming plans reuse the batch transforms' semantics —
  * watermarked event-time windows stand in for the snapshot-date group
  * key, `dropDuplicatesWithinWatermark` / keyed state stand in for the
  * keyed last-write-wins upsert.
  */
object Streaming {

  case class Event(user_id: Long, ts: java.sql.Timestamp,
                   event_type: String, value: Double)

  /** Streaming analog of kpi_daily_summary (SURVEY §2.4 A1–A5): daily
    * event-time windows with a watermark bounding state; late data beyond
    * the watermark is dropped instead of reprocessing the day — the
    * streaming counterpart of idempotent partition overwrite. */
  def dailyKpi(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("day"))
      .agg(
        count(lit(1)).as("nb_events"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("nb_clicks"),
        avg(col("value")).as("avg_value"))
      .select(to_date(col("day.start")).as("event_date"),
        col("nb_events"), col("nb_clicks"), col("avg_value"))

  /** Streaming keyed last-write-wins (S7's streaming face): keeps the
    * newest event per user in keyed state and emits it on every update.
    * State is one row per key — bounded by key cardinality, partitioned
    * across executors by the group key. */
  def latestPerUser(events: Dataset[Event]): Dataset[Event] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Event, Event](GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Event], state: GroupState[Event]) =>
          val newest = (batch ++ state.getOption.iterator)
            .maxBy(e => (e.ts.getTime, e.value))
          state.update(newest)
          newest
      }
  }

  case class SessionState(start: Long, end: Long, n: Int)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, nb_events: Int)

  /** Streaming gap sessionization — the incremental face of the batch
    * sessionizer (q31): per-user sessions absorb events arriving within
    * `gapMs` of the session end and CLOSE via event-time timeout once the
    * watermark passes end+gap (so emission is driven by stream progress,
    * not wall clock). State is one open session per user — bounded by key
    * cardinality, partitioned by the group key; `flatMapGroupsWithState`
    * because closing a batch's worth of sessions can emit 0..n rows. */
  def sessionize(events: Dataset[Event],
                 gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n))
          } else {
            // within a micro-batch, order by event time (iterator order is
            // arrival order, not time order)
            val evs = batch.toIndexedSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            for (e <- evs) cur match {
              // merge iff the event falls within gap of the OPEN session's
              // interval on either side — and extend BOTH ends: a
              // non-late out-of-order event from a later micro-batch can
              // legitimately precede the session start (review r12: the
              // old end-only test `ts − end ≤ gap` was vacuously true for
              // any early event, silently absorbing events arbitrarily
              // far before the session and never moving `start`)
              case Some(s) if e.ts.getTime >= s.start - gapMs &&
                  e.ts.getTime - s.end <= gapMs =>
                cur = Some(SessionState(math.min(s.start, e.ts.getTime),
                  math.max(s.end, e.ts.getTime), s.n + 1))
              case Some(s) if e.ts.getTime > s.end =>
                // gap AFTER the session: close it, open a new one
                closed ::= Session(uid, new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(s.end), s.n)
                cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1))
              case Some(s) =>
                // out-of-order event more than gap BEFORE the open
                // session: it belongs to an earlier, already-gapped
                // window. One-open-session state can't reopen history —
                // emit it immediately as its own closed single-event
                // session (documented approximation; the batch
                // sessionizer q31 is the exact-replay face)
                closed ::= Session(uid, new java.sql.Timestamp(e.ts.getTime),
                  new java.sql.Timestamp(e.ts.getTime), 1)
              case None =>
                cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1))
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-static enrich — J1's streaming face: each micro-batch left-
    * joins a bounded static dimension (re-planned per batch, so a small
    * dim broadcasts and a dim refreshed on disk is re-read). No state, no
    * watermark needed: static-side rows can't be late. `missing_dim`
    * mirrors the batch pipeline's missing-join-match flag (P10). */
  def enrichStream(stream: DataFrame, dim: DataFrame, key: String): DataFrame = {
    val dimKeyed = dim.withColumnRenamed(key, "__dim_key")
    stream.join(dimKeyed, stream(key) === dimKeyed("__dim_key"), "left")
      .withColumn("missing_dim", col("__dim_key").isNull)
      .drop("__dim_key")
  }

  /** Stream-stream event-time interval join — the canonical attribution
    * join: each click matches impressions with the same key that happened
    * at most `maxDelay` before it. The time-range predicate plus
    * watermarks on BOTH sides let Spark expire join state (without the
    * range condition a stream-stream join buffers forever). Inner-join
    * matches emit as soon as both sides arrive. */
  def attributionJoin(impressions: DataFrame, clicks: DataFrame,
                      key: String = "ad_id", maxDelay: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val imp = impressions.select(col(key).as("imp_key"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val clk = clicks.select(col(key).as("clk_key"), col("ts").as("clk_ts"))
      .withWatermark("clk_ts", watermark)
    imp.join(clk, expr(
        s"imp_key = clk_key AND clk_ts >= imp_ts AND clk_ts <= imp_ts + INTERVAL $maxDelay"))
      .select(col("imp_key").as(key), col("imp_ts"), col("clk_ts"))
  }

  /** Streaming exact dedup over a content key with watermark-bounded
    * state (the scale-safe streaming dedup: state expires with the
    * watermark instead of growing forever). */
  def dedupStream(df: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermark: String = "1 day"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  case class KmvState(hs: Seq[Long])
  case class KmvUpdate(group: String, k_used: Int, kth_min: Long,
                       est_distinct: Double)

  /** Streaming KMV distinct-count — the streaming face of
    * [[graft.ops.Sketches.kmvDistinct]]: per-group state is the k-minimum
    * hash array (k longs, BOUNDED — unlike exact streaming distinct,
    * whose state grows with cardinality), updated per micro-batch with
    * the same 48-bit md5 hash and emitting the same estimate arithmetic,
    * so after any prefix of batches the emitted estimate equals the batch
    * operator's over the same rows (StreamingSpec pins that equivalence).
    * A not-full sketch IS the group's exhaustive hash set, so its
    * estimate is exact — matching the batch operator's fallback branch.
    *
    * 100 TB posture: one keyed exchange per batch; state k·8 bytes per
    * group, no timeout needed (the sketch is the bound). */
  def kmvDistinctStream(df: DataFrame, groupCol: String, value: Column,
                        k: Int): Dataset[KmvUpdate] = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536] (got $k)")
    import df.sparkSession.implicits._
    df.select(col(groupCol).cast("string").as("g"),
        conv(substring(md5(value.cast("string")), 1, 12), 16, 10)
          .cast("long").as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[KmvState, KmvUpdate](GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[(String, Long)], state: GroupState[KmvState]) =>
          val merged = (state.getOption.map(_.hs).getOrElse(Seq.empty) ++
              batch.map(_._2)).distinct.sorted.take(k)
          state.update(KmvState(merged))
          val est =
            if (merged.size < k) merged.size.toDouble
            else (k - 1).toDouble * 281474976710656.0 / merged.last.toDouble
          KmvUpdate(g, merged.size,
            if (merged.isEmpty) 0L else merged.last, est)
      }
  }

  /** Streaming INCREMENTAL exact dedup — the streaming face of
    * [[graft.ops.CurateIncremental]]'s exact stage: arriving docs dedup
    * within the stream (watermark-bounded state, as [[dedupStream]]) AND
    * against the persisted corpus fingerprint table via a stream-static
    * anti-join, so a re-crawl of anything the lake already holds never
    * reaches the sink. The static side is the fingerprint table AS OF
    * QUERY START — a pipeline that appends state nightly
    * ([[graft.ops.CurateIncremental.appendState]]) restarts the query on
    * the same checkpoint to pick the additions up (exactly-once carries
    * over; the join is stateless on the static side). */
  def incrementalDedupStream(stream: DataFrame, textCol: String, tsCol: String,
                             fingerprints: DataFrame,
                             watermark: String = "1 day"): DataFrame =
    stream
      .withColumn("__fp", graft.ops.TextAnalysis.fingerprint(col(textCol)))
      .join(fingerprints.select(col("content_key").as("__fp")).distinct(),
        Seq("__fp"), "left_anti")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .drop("__fp")

  /** Streaming incremental CURATION — the full daily-delta recipe as a
    * sink: each micro-batch runs [[graft.ops.CurateIncremental.daily]]
    * (PII redaction, exact dedup + persisted-fingerprint probe, LSH
    * near-dup + persisted band-key probe with exact-Jaccard confirm,
    * quality floor, decontamination, split assignment) against the state
    * under `root`, appends the batch's survivors to the state tables, and
    * lands them in `outDir`. Where [[incrementalDedupStream]] gives the
    * stateless exact-dedup guarantee row by row, this gives the WHOLE
    * curation contract per micro-batch, sharing the batch path's code and
    * crash ordering verbatim — near-dup needs joins and components, which
    * are batch ops, so `foreachBatch` is the idiomatic seam (and it
    * serializes batches within the query, so the state mutation needs no
    * external lock). Batch N's survivors are probe-able by batch N+1.
    *
    * Replay safety: `foreachBatch` is at-least-once. `daily` appends
    * state BEFORE the sink write, so a re-delivered batch's docs die at
    * the fingerprint probe and the sink never double-lands a survivor —
    * the over-drop direction ([[graft.ops.CurateIncremental.appendState]]).
    * Survivors of a batch that crashed between the state append and the
    * sink write are absent from `outDir` but present in the state corpus;
    * `outDir` can be repaired by diffing it against the corpus table.
    *
    * A state that carries the embedding tables needs `vecCol` — the
    * stream's embedding column: each batch then also runs the embedding
    * near-dup stage against the persisted sketch/vector tables, exactly
    * like the batch `daily` (which refuses a vec-less delta on an
    * embedding-carrying state rather than desynchronizing it — a
    * `curateSink` without `vecCol` on such a state fails its first
    * batch for the same reason).
    *
    * `autoCompact = Some(t)` bounds every state table at t files per
    * bucket for the stream's LIFE (VERDICT r16 #4 — a long-running
    * stream accrues per-batch appends exactly like the daily cadence),
    * via the same [[graft.ops.CurateIncremental.maybeCompactState]]
    * policy the batch `daily` runs; reads are bit-identical across the
    * compaction swap (StreamingSpec). */
  def curateSink(stream: DataFrame, benchmark: DataFrame,
                 idCol: String, textCol: String, root: String, outDir: String,
                 checkpointDir: String,
                 cfg: graft.ops.Curate.Config = graft.ops.Curate.Config(),
                 vecCol: Option[String] = None,
                 ecfg: graft.ops.CurateIncremental.EmbedConfig =
                   graft.ops.CurateIncremental.EmbedConfig(),
                 autoCompact: Option[Int] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val r = graft.ops.CurateIncremental.daily(
            batch.select(col(idCol), col(textCol)), benchmark, idCol, textCol,
            root, cfg,
            deltaVecs = vecCol.map(v => batch.select(col(idCol), col(v))),
            vecCol = vecCol.getOrElse("v"), ecfg = ecfg,
            autoCompact = autoCompact)
          try r.corpus.write.mode("append").parquet(outDir)
          finally r.release()
        }
      }
      .start()

  /** Stream → persisted SCD2 fold state ([[graft.ops.Scd2State]]'s
    * streaming face): each micro-batch's snapshot rows fold into the
    * interval state DATE BY DATE (ascending — a batch may carry several
    * snapshot dates), so the dimension's open/closed versions stay
    * current for the life of the stream with no history rescan.
    * `foreachBatch` is the seam for the same reason as [[curateSink]]
    * (a fold is a keyed join plus two table writes, and batch
    * serialization is the state's lock); the per-batch date list is a
    * calendar-bounded driver collect.
    *
    * Replay safety: folds are LEDGERED per date inside the state's
    * atomic swap, so a re-delivered batch's dates no-op — at-least-once
    * delivery lands exactly-once state (the Scd2StateSpec replay
    * contract). The batch caller's preconditions carry over: one row
    * per (key, date), and a date arrives COMPLETE within one batch
    * (folds are date-monotone — a later batch cannot reopen an earlier
    * date; bootstrap the state before starting the stream).
    * `autoCompact = Some(t)` runs [[graft.ops.Scd2State.compactIfNeeded]]
    * after each ledgered fold — file counts stay bounded for the
    * stream's life (VERDICT r16 #4). */
  def scd2FoldSink(stream: DataFrame, keyCols: Seq[String],
                   attrCols: Seq[String], dateCol: String, root: String,
                   checkpointDir: String,
                   autoCompact: Option[Int] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val dates = batch
            .select(date_format(col(dateCol), "yyyy-MM-dd").as("__d"))
            .distinct().orderBy("__d").collect().map(_.getString(0))
          for (d <- dates)
            graft.ops.Scd2State.fold(
              batch.filter(date_format(col(dateCol), "yyyy-MM-dd") === d)
                .select((keyCols ++ attrCols).map(col): _*), root, d,
              autoCompact)
        }
      }
      .start()

  /** Stream → persisted EXACT-JACCARD entity probe (VERDICT r15 #5 —
    * the [[graft.ops.ExactJoinState]] probes' streaming face): each
    * micro-batch probes the persisted prefix/token index for EVERY
    * qualifying pair involving the batch — batch↔state through the
    * tok-bucketed index (zero state-side exchange) plus batch↔batch —
    * appends the match pairs to `outDir`, then appends the batch's
    * docs to the index so LATER batches match against them (probe
    * before append, or a batch would pair with itself through the
    * state).
    *
    * Replay safety: the index appends are idempotent by id (the
    * anti-join lands each doc's token rows exactly once; duplicate
    * prefix rows are harmless by the probe contract), so a re-delivered
    * batch leaves the state EXACTLY-ONCE. The pair OUTPUT is
    * at-least-once — a batch replayed after its append emits its pairs
    * again (now through the state side); downstream consumers key on
    * (id_a, id_b), which stays stable because pairs are emitted in
    * canonical orientation. The StreamingSpec golden pins streamed
    * pairs == one batch probe of the union. `autoCompact = Some(t)`
    * bounds the index tables at t files per bucket for the stream's
    * life (VERDICT r16 #4), per-batch results bit-identical across
    * the compaction swap. */
  def exactEntitySink(stream: DataFrame, idCol: String, textCol: String,
                      tokens: Column => Column, root: String,
                      outDir: String, checkpointDir: String,
                      autoCompact: Option[Int] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val docs = batch.select(col(idCol), col(textCol))
          graft.ops.ExactJoinState.probe(docs, idCol, tokens(col(textCol)), root)
            .select(least(col("id_a"), col("id_b")).as("id_a"),
              greatest(col("id_a"), col("id_b")).as("id_b"))
            .filter(col("id_a") =!= col("id_b"))
            .distinct()
            .write.mode("append").parquet(outDir)
          graft.ops.ExactJoinState.append(docs, idCol, tokens(col(textCol)), root)
          autoCompact.foreach { t =>
            graft.ops.ExactJoinState.maybeCompact(spark, root, t); ()
          }
        }
      }
      .start()

  /** Stream → persisted FUZZY edit-distance entity probe — the
    * [[graft.ops.FuzzyJoinState]] analog of [[exactEntitySink]], same
    * probe-then-append order, same exactly-once-state / at-least-once-
    * output contract; pairs carry the exact Levenshtein `dist`. */
  def fuzzyEntitySink(stream: DataFrame, idCol: String, textCol: String,
                      root: String, outDir: String,
                      checkpointDir: String,
                      autoCompact: Option[Int] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val docs = batch.select(col(idCol), col(textCol))
          graft.ops.FuzzyJoinState.probe(docs, idCol, textCol, root)
            .select(least(col("id_a"), col("id_b")).as("id_a"),
              greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
            .filter(col("id_a") =!= col("id_b"))
            .distinct()
            .write.mode("append").parquet(outDir)
          graft.ops.FuzzyJoinState.append(docs, idCol, textCol, root)
          autoCompact.foreach { t =>
            graft.ops.FuzzyJoinState.maybeCompact(spark, root, t); ()
          }
        }
      }
      .start()

  /** Per-batch DSIR profile maintenance: each micro-batch's hashed
    * n-gram counts fold into the persisted profile state
    * ([[graft.ops.Sampling.dsirProfileUpdateState]]). `foreachBatch`
    * is at-least-once; the counter ledger keys on the batch id, so a
    * re-delivered batch no-ops instead of double-counting — the same
    * exactly-once-state argument as [[scd2FoldSink]]. A daily selection
    * job then reads the always-current target/raw profiles (bounded by
    * the bucket space) and scores only new documents. */
  def dsirProfileSink(stream: DataFrame, textCol: String, statePath: String,
                      checkpointDir: String,
                      hexDigits: Int = 2): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.Sampling.dsirProfileUpdateState(batch.sparkSession,
            statePath, batch.toDF(), textCol, s"batch-$batchId", hexDigits)
          ()
        }
      }
      .start()

  /** Stream → lake zone: every micro-batch merge-upserts into the same
    * partitioned Parquet layout the batch pipeline writes
    * ([[LakeZones.mergeUpsertByDay]]), so incremental results land beside
    * — and are readable exactly like — batch snapshots. The stream must
    * carry a `snapshot_date` column (the partition key).
    *
    * Replay safety: `foreachBatch` is at-least-once; the merge-upsert is
    * idempotent (re-delivering a batch re-merges the same keys under
    * last-write-wins and rewrites the same day partitions with identical
    * content), so the checkpoint + sink pair gives effectively-once lake
    * content. */
  def lakeSink(stream: DataFrame, checkpointDir: String, root: String,
               zone: String, name: String, keys: Seq[String],
               order: Seq[Column], outputMode: String = "update"): StreamingQuery =
    stream.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        LakeZones.mergeUpsertByDay(batch, root, zone, name, keys, order): Unit
      }
      .start()

  /** Streaming serving sink: each micro-batch bulk-indexes into
    * Elasticsearch through [[graft.io.EsTransport]] — the streaming face
    * of the reference's daily index job. The mapping is bootstrapped
    * (200-skip/404-create) once per query on the first batch, then each
    * batch ships partition-parallel chunked `_bulk` POSTs straight from
    * the executors.
    *
    * Replay safety: `foreachBatch` is at-least-once; doc `_id`s are
    * stable (built from `idCols`), so ES index-ops upsert and a
    * redelivered batch rewrites the same documents — the same
    * effectively-once argument as [[lakeSink]]. A per-item bulk error
    * fails the batch and the checkpoint replays it, never a silent
    * partial index. */
  def esSink(stream: DataFrame, checkpointDir: String, index: String,
             idCols: Seq[String], spec: ServingSink.FieldSpec,
             cfg: EsTransport.Config,
             clientFactory: () => EsTransport.EsClient = () => new EsTransport.HttpEsClient())
      : StreamingQuery = {
    // driver-side, once per query: transient so the closure checkpoint-
    // restarts cleanly
    var bootstrapped = false
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!bootstrapped) {
          EsTransport.createIndexIfMissing(clientFactory(), cfg, index,
            ServingSink.mappingJson(batch, spec))
          bootstrapped = true
        }
        EsTransport.bulkIndexFrame(batch, index, idCols, cfg, clientFactory): Unit
      }
      .start()
  }

  /** Streaming distribution drift monitor: every micro-batch's
    * `valueCol` histogram is compared against the REFERENCE snapshot
    * through [[graft.ops.Monitor.histogramDrift]]'s exact-integer gaps
    * (reference = side a, batch = side b), and the per-bucket report is
    * appended under `outDir/batch_id=N` — the live early-warning that a
    * crawler or upstream config change shifted the corpus shape BEFORE
    * the data reaches curation (a drifting `gap_ppm` spike per batch is
    * the alert condition; the exact-integer `gap_num` column replays
    * bit-identically in a batch recompute, so alerts are auditable).
    *
    * Replay safety: `foreachBatch` is at-least-once; the report is keyed
    * by `batch_id` and written with dynamic partition overwrite, so a
    * replayed batch rewrites ITS OWN partition with identical content —
    * effectively-once reporting, same discipline as [[lakeSink]]. */
  /** Per-batch QUANTILE-drift sink (VERDICT r13 #6 — [[driftSink]]'s
    * discipline over the log-histogram sketch): each micro-batch's
    * per-group quantile lower bounds compare against a PINNED reference
    * histogram via [[graft.ops.Monitor.quantileDriftFromHists]], and the
    * exact-integer report lands keyed by `batch_id` with dynamic
    * partition overwrite (replayed batches rewrite their own partition —
    * effectively-once). The reference corpus aggregates ONCE to ≤ 8·61
    * counters per group and is lineage-cut, so no batch re-reads it. */
  def quantileDriftSink(stream: DataFrame, groupCol: String, valueCol: String,
                        reference: DataFrame,
                        quantiles: Seq[(String, Long, Long)],
                        outDir: String, checkpointDir: String): StreamingQuery = {
    val refHist = graft.ops.Sketches
      .logHistogram(reference, groupCol, col(valueCol))
      .transform(graft.ops.Lineage.cut)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.Monitor.quantileDriftFromHists(refHist,
              graft.ops.Sketches.logHistogram(batch, groupCol, col(valueCol)),
              groupCol, quantiles)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
        }
      }
      .start()
  }

  def driftSink(stream: DataFrame, valueCol: String, reference: DataFrame,
                bucketWidth: Long, nBuckets: Int, outDir: String,
                checkpointDir: String): StreamingQuery = {
    // The reference histogram is STATIC for the life of the query:
    // aggregate it once to nBuckets rows and pin the tiny result
    // (review r12 — the first cut re-scanned the full reference corpus
    // inside every micro-batch). A Lineage cut severs the lineage so
    // no batch re-reads the reference input.
    val refHist = graft.ops.Monitor
      .histogram(reference, valueCol, bucketWidth, nBuckets)
      .transform(graft.ops.Lineage.cut)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.Monitor
            .histogramDriftFromHists(refHist,
              graft.ops.Monitor.histogram(batch, valueCol, bucketWidth, nBuckets))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
        }
      }
      .start()
  }

  /** Append-with-index streaming sink: each micro-batch lands as a
    * `batch_id=N` partition and the table's data-skipping indexes
    * refresh INCREMENTALLY in the same batch — [[graft.io.StatsManifest
    * .updateStats]] (and `updateBloom` when `bloomKey` is set) scan only
    * the files the batch just wrote, so index maintenance costs the
    * batch's bytes, never the table's, and point/range reads through the
    * manifest stay fresh for the life of the stream (no reader ever
    * takes the staleness fallback between batches).
    *
    * Replay safety: `foreachBatch` is at-least-once; the dynamic
    * partition overwrite on `batch_id` makes a redelivered batch rewrite
    * its own partition (driftSink's posture), and the manifest update
    * treats the replaced files as vanished+new — rows drop driver-side,
    * only the rewrite is rescanned. The first batch bootstraps the
    * manifests with a full build (which IS the batch at that point). */
  def indexedAppendSink(stream: DataFrame, checkpointDir: String,
                        path: String, statCols: Seq[String],
                        bloomKey: Option[String] = None,
                        expectedItemsPerFile: Long = 1L << 20,
                        fpp: Double = 0.01): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          batch.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
          val fs = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(spark.sessionState.newHadoopConf())
          def has(dir: String) =
            fs.exists(new org.apache.hadoop.fs.Path(s"$path/$dir"))
          if (has(graft.io.StatsManifest.ManifestDir))
            graft.io.StatsManifest.updateStats(spark, path, statCols)
          else graft.io.StatsManifest.write(spark, path, statCols)
          bloomKey.foreach { k =>
            if (has(graft.io.StatsManifest.BloomDir))
              graft.io.StatsManifest.updateBloom(spark, path, k,
                expectedItemsPerFile, fpp)
            else graft.io.StatsManifest.writeBloom(spark, path, k,
              expectedItemsPerFile, fpp)
          }
        }
      }
      .start()

  /** Stream → persisted ANN index (VERDICT r16 #7 — the
    * [[graft.ops.AnnIndex.append]] streaming face): each micro-batch's
    * vectors are assigned against the persisted centroids map-side and
    * appended to the cell-bucketed postings, so the index is probe-able
    * after every batch with no retrain and no corpus rescan.
    *
    * Replay safety: plain `append` is NOT idempotent and duplicate
    * postings are NOT harmless (a duplicated candidate can displace a
    * real one from a probe's top-k), so each batch lands through
    * [[graft.ops.AnnIndex.appendExactlyOnce]] keyed on the zero-padded
    * batch id: a re-delivered batch no-ops on the ledger, and a crash
    * anywhere inside the append protocol is rolled back or completed by
    * the next batch — at-least-once delivery, EXACTLY-once postings
    * (StreamingSpec pins streamed == one-shot batch append of the
    * union, and zero new postings on replay). `autoCompact = Some(t)`
    * bounds the postings at t files per bucket for the stream's life. */
  def annAppendSink(stream: DataFrame, idCol: String, vecCol: String,
                    root: String, checkpointDir: String,
                    autoCompact: Option[Int] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.AnnIndex.appendExactlyOnce(
            batch.select(col(idCol), col(vecCol)), idCol, vecCol, root,
            f"stream-$batchId%09d", autoCompact)
          ()
        }
      }
      .start()

  /** Stream → persisted BM25 inverted index (the
    * [[graft.ops.RetrievalState]] streaming face, r17): each
    * micro-batch's documents tokenize map-side and append to the
    * term-bucketed postings + counter-state stats, so the index answers
    * [[graft.ops.RetrievalState.probe]] with every streamed doc after
    * each batch — no corpus rescan, ever.
    *
    * Replay safety: duplicate postings are NOT harmless (a doc indexed
    * twice doubles its tf AND inflates every shared term's df, skewing
    * ALL scores), so each batch lands through
    * [[graft.ops.RetrievalState.appendExactlyOnce]] keyed on the
    * zero-padded batch id — at-least-once delivery, exactly-once
    * postings and stats (StreamingSpec pins streamed probes == the
    * batch bm25TopK of everything streamed, and zero new postings on
    * replay). `autoCompact = Some(t)` bounds the postings at t files
    * per bucket for the stream's life. */
  def bm25AppendSink(stream: DataFrame, idCol: String, textCol: String,
                     root: String, checkpointDir: String,
                     autoCompact: Option[Int] = None): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.RetrievalState.appendExactlyOnce(
            batch.select(col(idCol), col(textCol)), idCol, textCol, root,
            f"stream-$batchId%09d", autoCompact)
          ()
        }
      }
      .start()

  /** Streaming face of [[graft.ops.Monitor.embeddingDrift]]: per
    * micro-batch, the embedding column's distribution is compared
    * against a STATIC reference corpus — encoder-version regressions
    * surface within one batch of the swap. The reference's diagonal
    * moments are computed once (d tiny rows) and pinned with
    * localCheckpoint (driftSink's posture — no batch re-reads the
    * reference input); each batch pays one d-cell moments pass and the
    * map-side join/chain. batch_id-keyed dynamic-overwrite partitions
    * make replays idempotent, and the report is bit-identical to the
    * batch recompute ([[graft.ops.Monitor.embeddingDriftFromMoments]]'s
    * contract, pinned by StreamingSpec). */
  def embedDriftSink(stream: DataFrame, vecCol: String, reference: DataFrame,
                     outDir: String, checkpointDir: String,
                     quantScale: Double = (1L << 20).toDouble): StreamingQuery = {
    val refMoments = graft.ops.Monitor
      .diagMoments(reference, vecCol, quantScale)
      .transform(graft.ops.Lineage.cut)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.ops.Monitor
            .embeddingDriftFromMoments(refMoments,
              graft.ops.Monitor.diagMoments(batch, vecCol, quantScale),
              quantScale)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
        }
      }
      .start()
  }

  /** Incremental raw-zone ingestion: a file stream over the enveloped
    * JSON layout — new `date=` files are picked up per micro-batch and
    * flow through the same staging transforms as batch (S5/S6 streaming
    * face). Batch-parity semantics (review r12 — the first cut lacked
    * all three and broke the documented Staging handoff):
    * `_src_file` is attached (Staging selects it; OMDb derives imdb_id
    * from the file stem), bare un-enveloped payloads are unwrapped into
    * `data`, and corrupt / no-payload records are DROPPED instead of
    * surfacing as all-null rows. `maxFilesPerTrigger` bounds micro-batch
    * size. */
  def rawFileStream(spark: SparkSession, root: String, source: String,
                    endpoint: String, dataSchema: StructType,
                    maxFilesPerTrigger: Int = 1000,
                    multiLine: Boolean = true): DataFrame = {
    val corrupt = "_corrupt_record"
    val readSchema = StructType(
      Seq(
        org.apache.spark.sql.types.StructField("_meta", Schemas.metaSchema),
        org.apache.spark.sql.types.StructField("data", dataSchema),
        org.apache.spark.sql.types.StructField(corrupt,
          org.apache.spark.sql.types.StringType)
      ) ++ dataSchema.fields) // bare-payload form: fields at top level
    val raw = spark.readStream
      .schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("multiLine", multiLine) // pretty one-object-per-file raw form
      .json(s"$root/$source/$endpoint/date=*")
      .withColumn("_src_file", input_file_name())
    val bare = struct(dataSchema.fields.map(f => col(f.name)): _*)
    raw
      .withColumn("data",
        when(col("data").isNotNull, col("data")).otherwise(bare))
      .filter(col(corrupt).isNull &&
        dataSchema.fields.map(f => col(s"data.${f.name}").isNotNull)
          .foldLeft(lit(false))(_ || _))
      .select(col("_meta"), col("data"), col("_src_file"))
  }
}
