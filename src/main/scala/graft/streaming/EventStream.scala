package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface. The reference is strictly batch
  * (SURVEY.md §2.10); its closest analogs are chunked VCF import and the
  * block-streaming seqAddValue callback. This module exposes the streaming
  * shapes a continuously-ingesting variant/training-data store needs:
  * watermarked tumbling-window aggregation and stateful sessionization.
  * The same transformations run on a batch DataFrame (Spark's unified
  * model), which is how the spec verifies them against MemoryStream.
  */
object EventStream {

  /** Per event-type counts + value sums over tumbling windows, tolerating
    * `lateness` of event-time disorder. Input needs `ts TIMESTAMP`,
    * `event_type STRING`, `value DOUBLE`. Works on static or streaming
    * frames. */
  def windowedCounts(events: DataFrame, windowLen: String,
      lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Continuous VCF ingestion (the streaming analog of the reference's
    * chunked import, R/ConvVCF2GDS.R:612-620): body lines arriving on any
    * streaming source parse through the SAME column expressions as the
    * batch reader — `Vcf.parseLines` is pure projection, so it lifts to
    * a streaming frame unchanged. `header` fixes the schema up front
    * (streams can't sniff), as the reference's header pass does. */
  def vcfIngest(lines: DataFrame, header: Seq[String]): DataFrame = {
    val (info, fmt, samples) = graft.sources.Vcf.headerSpecs(header)
    graft.sources.Vcf.parseLines(
      lines.filter(!col("value").startsWith("#")), info, fmt, samples.length)
  }

  /** The genomic ingest chain end-to-end on a stream: [[vcfIngest]] →
    * 2-bit packed REF-dosage encode (`pack_2b`, the engine's storage
    * coding) → the fused per-variant AF/AC/missing kernel on the packed
    * bytes (`geno_stats_packed`) — a live import computing the same
    * per-variant stats the batch packed lane reads straight from a GDS
    * container's stored bit-planes. Every stage is a pure per-row
    * projection (encode and kernel are codegen expressions), so the
    * batch operators lift onto the stream unchanged — no state, no
    * watermark, no shuffle; `StreamingSpec` gates the output against
    * the native CEU container's packed lane row-for-row. */
  def genoStatsStream(lines: DataFrame, header: Seq[String]): DataFrame = {
    import graft.functions.genetics.{genoStatsPacked, pack2b}
    val nSamples = graft.sources.Vcf.headerSpecs(header)._3.length
    val st = genoStatsPacked(pack2b(col("geno")), lit(nSamples))
    vcfIngest(lines, header)
      .select(col("chrom"), col("pos"), col("allele"),
        element_at(st, 2).as("n_called"),
        element_at(st, 3).as("ac_ref"),
        element_at(st, 4).as("miss_calls"))
  }

  /** Ingest-time cleaning for a streaming corpus: markup stripping →
    * PII redaction → [[graft.pipeline.TrainingData.c4Clean]] plus a
    * token count — the full extraction-side cleaning chain. Every stage
    * is a pure per-row projection (the line-scan kernel included), so
    * the batch cleaning operators lift onto any streaming source
    * unchanged — no state, no watermark, no shuffle. */
  def cleanStream(docs: DataFrame): DataFrame = {
    val extracted = graft.pipeline.TrainingData.redactPii(
      graft.pipeline.TrainingData.stripMarkup(docs))
    graft.pipeline.TrainingData.c4Clean(extracted)
      .withColumn("n_tokens",
        graft.functions.textfns.tokenCount(col("clean_text")).cast("long"))
  }

  /** Ingest-time training-example generation: T5 span corruption (and by
    * the same argument the FIM transform) is an md5-deterministic pure
    * projection, so the batch operator lifts onto any streaming source
    * unchanged — admitted documents become (input, target) pairs inside
    * their own micro-batch, no state, no watermark, and re-processing a
    * document after a failure regenerates the identical example. */
  def exampleStream(docs: DataFrame): DataFrame =
    graft.pipeline.TrainingData.spanCorrupt(docs)

  /** Streaming exact dedup for a continuously-ingested document corpus
    * (the training-data-pipeline shape: dedup a crawl as it arrives,
    * not in a nightly batch). Content fingerprints are the SAME
    * order-insensitive md5 used by the batch dedup (q32), so a document
    * already admitted suppresses later arrivals of identical content.
    * The watermark bounds the dedup state: fingerprints older than
    * `lateness` are evicted — at 100 TB/day ingest the state holds one
    * ~16-byte key per distinct document inside the horizon instead of
    * forever. Input needs `ts TIMESTAMP` and `text STRING`. */
  def dedupStream(docs: DataFrame, lateness: String): DataFrame = {
    import graft.functions.textfns._
    val fp = docs.withColumn("fp", fingerprint(tokens(col("text"))))
    // the within-watermark variant (bounded state) exists only for
    // streams; on a static frame plain dropDuplicates is the same query
    if (docs.isStreaming)
      fp.withWatermark("ts", lateness).dropDuplicatesWithinWatermark("fp")
    else fp.dropDuplicates("fp")
  }

  /** Streaming NEAR-dup admission — the single-pass policy for deduping
    * a crawl as it arrives: a document is admitted iff it is the first
    * (arrival-order) holder of EVERY one of its MinHash-LSH band keys
    * inside the watermark horizon; one band collision with an earlier
    * admitted document drops it. This is the batch q33/q62 candidate
    * generator promoted to the admission decision itself — no Jaccard
    * verify pass (the collided-with shingle sets are gone from state),
    * the standard precision/recall tradeoff of one-pass streaming dedup
    * versus the nightly batch job. State is one entry per admitted band
    * key inside the horizon (watermark-evicted), never a shingle set.
    * Documents too short to shingle are always admitted. Input needs
    * `ts TIMESTAMP`, `doc_id`, `text`; returns admitted (ts, doc_id).
    * On a static frame the same decision runs as window ranks — the
    * spec's stream==batch gate. */
  def nearDupStream(docs: DataFrame, lateness: String, shingleN: Int = 3,
      minhashK: Int = 8, bands: Int = 4): DataFrame = {
    import graft.functions.textfns._
    val rows = minhashK / bands
    require(bands * rows == minhashK, "bands must divide minhashK")
    val sh = docs.withColumn("__sh", shingles(col("text"), shingleN))
    // band index prefixes the key: a repetitive doc whose bands hash
    // identically must still hold ALL its bands, not collide with itself
    val banded = sh.filter(size(col("__sh")) > 0)
      .withColumn("__sig", minhashSignature(col("__sh"), minhashK))
      .select(col("ts"), col("doc_id"),
        posexplode(lshBands(col("__sig"), bands, rows))
          .as(Seq("__b", "__k")))
      .select(col("ts"), col("doc_id"),
        concat_ws(":", col("__b"), col("__k")).as("__bk"))
    val tiny = sh.filter(size(col("__sh")) === 0)
      .select(col("ts"), col("doc_id"))
    if (docs.isStreaming) {
      // two chained stateful operators (band-key dedup, then per-doc
      // count-to-quorum), both bounded by the same watermark
      val first = banded.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark("__bk")
      first.groupBy(col("ts"), col("doc_id"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") === bands)
        .select(col("ts"), col("doc_id"))
        .unionByName(tiny)
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__bk")).orderBy(col("ts"), col("doc_id"))
      banded.withColumn("__rn", row_number().over(w))
        .groupBy(col("ts"), col("doc_id"))
        .agg(max(col("__rn")).as("__mx"))
        .filter(col("__mx") === 1)
        .select(col("ts"), col("doc_id"))
        .unionByName(tiny)
    }
  }

  /** Streaming chunk-NOVELTY metering — CDC chunk dedup promoted to a
    * stream: each arriving document splits into content-defined chunks
    * ([[graft.functions.textfns.cdcChunks]]) and `n_new` counts the chunk
    * fingerprints this document is the FIRST holder of inside the
    * watermark horizon — the per-document novel-content meter a crawl
    * pipeline uses to admit or down-weight re-syndicated material (a doc
    * of entirely seen chunks is a re-wrap; CDC anchoring means a moved
    * header doesn't reset chunk identity the way whole-doc fingerprints
    * do). State is one entry per chunk fingerprint inside the horizon
    * (watermark-evicted); chunk text never enters state. On a static
    * frame the same decision runs as first-holder window ranks — the
    * spec's stream==batch gate holds for in-timestamp-order arrival
    * WHOSE duplicate fingerprints recur within the watermark horizon:
    * `dropDuplicatesWithinWatermark` evicts fingerprint state past the
    * horizon, so two in-order docs sharing a chunk more than `lateness`
    * apart BOTH earn novelty credit in the stream, while the batch twin
    * (global first-holder window) credits only the first — horizon-
    * bounded memory is the price of unbounded streams. Under LATE data
    * the two also diverge on who gets the credit: the stream credits
    * the first ARRIVAL (admission-order
    * semantics — the one-pass tradeoff, same as [[nearDupStream]]),
    * the batch twin the (ts, doc_id)-minimal holder. Documents with no
    * chunks (empty text) emit nothing. */
  def chunkNoveltyStream(docs: DataFrame, lateness: String, k: Int = 8,
      d: Int = 64): DataFrame = {
    import graft.functions.textfns._
    val ch = docs.select(col("ts"), col("doc_id"),
      explode(cdcChunks(col("text"), k, d)).as("__fp"))
    if (docs.isStreaming) {
      ch.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark("__fp")
        .groupBy(col("ts"), col("doc_id"))
        .agg(count(lit(1)).as("n_new"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__fp")).orderBy(col("ts"), col("doc_id"))
      ch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .groupBy(col("ts"), col("doc_id"))
        .agg(count(lit(1)).as("n_new"))
    }
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Session(user_id: Long, n_events: Int, total: Double,
      closed: Boolean)

  /** Event-time sessionization as a watermarked session_window
    * aggregate — the streaming twin of the batch gap rule (q194):
    * a session closes after `gap` of event-time inactivity; per (user,
    * session) the event count is emitted once the watermark passes the
    * session end. Stream == batch for arrival inside the watermark
    * horizon (`StreamingSpec` gates it, and cross-checks the session
    * COUNTS against the lag-window batch formulation). */
  def sessionWindows(events: DataFrame, gap: String,
      lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"))

  final case class TypedEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, event_id: Long)
  final case class Transition(user_id: Long, prev_type: String,
      next_type: String)

  /** Stateful per-user event-bigram extraction via
    * flatMapGroupsWithState — the streaming twin of the q214 batch
    * transition matrix: state = the user's last event type, each
    * arriving event emits one (prev, next) record and advances the
    * state, so a user's chain threads CORRECTLY across micro-batch
    * boundaries. Events inside one batch are sorted by the TIE-FREE
    * (ts, event_id) key before chaining (the grouped iterator is
    * unordered; event_id is the batch queries' q214/q321 tie-break, so
    * same-timestamp events replay in the batch order, not
    * alphabetically); the stream==batch gate (`StreamingSpec`) holds
    * for per-user in-EVENT-TIME-order arrival across batches —
    * out-of-order late data would chain in arrival order (documented,
    * as with [[dedupStream]]'s horizon caveat). */
  def transitionStream(events: Dataset[TypedEvent])
      : Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[String, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[TypedEvent],
            state: GroupState[String]) =>
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Transition]
          var prev = state.getOption
          for (e <- evs) {
            prev.foreach(p => out += Transition(uid, p, e.event_type))
            prev = Some(e.event_type)
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  final case class FunnelStep(user_id: Long, step: Int)

  /** Stateful STRICT-SEQUENCE FUNNEL (q321's view → click → purchase
    * semantics, continuously): per-user state is the highest step
    * reached (1 = viewed, 2 = clicked after a view, 3 = purchased
    * after such a click); a row is emitted each time a user ADVANCES,
    * so the appended output is exactly the set of (user, step) rows
    * the batch funnel counts — the spec's stream == batch gate.
    * Within a micro-batch, events replay in q321's exact TIE-FREE
    * (ts, event_id) order, so a same-timestamp view→click pair counts
    * step 2 here iff the batch window (ORDER BY ts, event_id) counts
    * it. Parity holds for per-user in-EVENT-TIME-order arrival across
    * batches: a view arriving in a LATER micro-batch than an
    * already-processed same-or-later-ts click cannot retroactively
    * qualify that click (append-mode state never rewinds — the
    * [[transitionStream]]/[[dedupStream]] late-data caveat; bound
    * disorder with a watermark upstream on a real deployment). State
    * is one Int per user, expirable by timeout. */
  def funnelStream(events: Dataset[TypedEvent]): Dataset[FunnelStep] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Int, FunnelStep](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[TypedEvent],
            state: GroupState[Int]) =>
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[FunnelStep]
          var step = state.getOption.getOrElse(0)
          for (e <- evs) {
            val adv = e.event_type match {
              case "view" if step < 1 => 1
              case "click" if step == 1 => 2
              case "purchase" if step == 2 => 3
              case _ => step
            }
            if (adv > step) { step = adv; out += FunnelStep(uid, step) }
          }
          state.update(step)
          out.result().iterator
      }
  }

  /** Watermarked STREAM–STREAM interval join — the attribution shape:
    * each purchase joins every view by the same user within the
    * preceding `horizon` (event-time bound on BOTH sides, so Spark can
    * expire join state at the watermark instead of buffering the
    * streams forever — the canonical stream-stream-join state-cleanup
    * contract). Inputs need (`user_id`, `ts`, …); views arrive on
    * `views`, purchases on `purchases`; `lateness` bounds event-time
    * disorder on both streams. Emits one row per qualifying
    * (purchase, view) pair with the exact millisecond gap. The same
    * plan runs on static frames (the spec's stream==batch gate). */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      horizon: String, lateness: String): DataFrame = {
    val v = views.withWatermark("ts", lateness)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("view_id"),
        expr("(unix_micros(p_ts) - unix_micros(v_ts)) div 1000")
          .as("gap_ms"))
  }

  /** A scored item flowing into the online Pareto maintainer. */
  final case class MetricPoint(group: String, item: Long,
      ts: java.sql.Timestamp, rev: Long, lat: Long)

  /** A frontier admission: `item` was Pareto-optimal (maximize `rev`,
    * minimize `lat`) among all points of its group seen up to its
    * arrival. */
  final case class FrontierRow(group: String, item: Long, rev: Long,
      lat: Long)

  /** Online Pareto-frontier (skyline) maintenance via
    * flatMapGroupsWithState — the streaming twin of q260's batch
    * skyline: per group the state holds the CURRENT frontier (bounded
    * by the frontier size, never the stream), each arriving point is
    * admitted iff no frontier point dominates it (≥ rev, ≤ lat, one
    * strict), and an admission evicts the points it now dominates.
    * Emits admissions (a later arrival may retroactively dominate an
    * earlier admission — admission is an AT-ARRIVAL property; the
    * end-of-stream frontier is the state, and the batch skyline of all
    * points is always a subset of the admissions). Points inside one
    * batch are ordered by (ts, item) before folding, so the
    * stream==batch gate holds for in-timestamp-order arrival across
    * batches (the [[transitionStream]] caveat). */
  def skylineStream(points: Dataset[MetricPoint]): Dataset[FrontierRow] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.group)
      .flatMapGroupsWithState[List[(Long, Long, Long)], FrontierRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (g: String, batch: Iterator[MetricPoint],
            state: GroupState[List[(Long, Long, Long)]]) =>
          var frontier = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[FrontierRow]
          for (p <- batch.toSeq.sortBy(x => (x.ts.getTime, x.item))) {
            val dominated = frontier.exists { case (_, r, l) =>
              r >= p.rev && l <= p.lat && (r > p.rev || l < p.lat)
            }
            if (!dominated) {
              out += FrontierRow(g, p.item, p.rev, p.lat)
              frontier = (p.item, p.rev, p.lat) :: frontier.filterNot {
                case (_, r, l) =>
                  p.rev >= r && p.lat <= l && (p.rev > r || p.lat < l)
              }
            }
          }
          state.update(frontier)
          out.result().iterator
      }
  }

  /** Stateful per-user sessionization via mapGroupsWithState: a session
    * closes after `gapMs` of inactivity (processing-time timeout — the
    * KeyValueGroupedDataset state-machine shape from the brief). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[(Int, Double), Session](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[(Int, Double)]) =>
          if (state.hasTimedOut) {
            val (n, tot) = state.get
            state.remove()
            Session(uid, n, tot, closed = true)
          } else {
            val evs = batch.toSeq
            val (n0, t0) = state.getOption.getOrElse((0, 0.0))
            val next = (n0 + evs.size, t0 + evs.map(_.value).sum)
            state.update(next)
            state.setTimeoutDuration(gapMs)
            Session(uid, next._1, next._2, closed = false)
          }
      }
  }
}
