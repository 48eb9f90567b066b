package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming surface (SURVEY.md §2.10). The reference is incremental batch
  * (per-date CSV drops, forward/historical labeling); we surface the same
  * semantics on Structured Streaming:
  *   - `sessionWindows`: session_window aggregation, identical code path
  *     batch vs stream (gap-split grouping = W2 as a native operator);
  *   - `runStream`: file-source → availableNow trigger — exactly the
  *     reference's "process what's in the drop directory then stop" model
  *     (parse_bursts.py:1096-1189 skip-if-exists incremental semantics);
  *   - `labelAcquisitions`: flatMapGroupsWithState port of the stateful
  *     per-frame sweep (D5/W5) for continuous pipelines.
  */
object Sessions {

  /** Gap-based session aggregation; works on both batch and streaming
    * DataFrames (the streaming path needs a watermark first). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** File-source incremental run: read whatever parquet is in `inDir`,
    * process with `f`, write to `outDir`, stop (Trigger.AvailableNow). */
  def runStream(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, checkpoint: String,
      f: DataFrame => DataFrame, watermarkDelay: String = "1 hour"): Unit = {
    val schema = spark.read.parquet(inDir).schema
    val in = spark.readStream.schema(schema).parquet(inDir)
    val q = f(in.withWatermark("ts", watermarkDelay))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming exact dedup for incremental ingest (the streaming analogue
    * of the batch hash-groupBy dedup): drops re-deliveries of the same key
    * arriving within the watermark window, with bounded state. */
  def dedupStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream interval join (the streaming form of the
    * range join, operators/RangeJoin): each left row pairs with right rows
    * of the same key whose `ts` falls within `lookback` before the left
    * `ts`. Both sides carry watermarks and the join condition carries the
    * time-range conjunct — that pair is what lets Spark BOUND the join
    * state (right rows older than watermark − lookback are evicted); a
    * stream-stream join without the range conjunct retains state forever,
    * the unbounded-state hazard at production event rates. `withWatermark`
    * is a no-op on batch frames, so the same function is the batch
    * equivalence oracle (StreamingSpec). Both inputs need event-time
    * column `ts`; output qualifies sides as `l` / `r`. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      lookback: String, watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withColumnRenamed("ts", "l_ts")
      .withWatermark("l_ts", watermarkDelay).alias("l")
    val r = right.withColumnRenamed("ts", "r_ts")
      .withWatermark("r_ts", watermarkDelay).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key AND r_ts >= l_ts - INTERVAL $lookback AND r_ts <= l_ts"))
  }

  final case class EwmaEvent(user_id: Long, ts: Timestamp, event_id: Long, x: Long)
  final case class EwmaSnapshot(user_id: Long, n_events: Long, ewma: Long, n_spikes: Long)

  /** Streaming EWMA (α = 16/64) + spike counter — the continuous form of
    * the batch q_ewma fold (operators/Windows): per-key state is ONE
    * (s, n, spikes) triple regardless of history length, and the same
    * integer recursion runs per micro-batch, so a single availableNow
    * drop reproduces the batch result exactly (StreamingSpec proves it).
    * Within a micro-batch rows sort by (ts, event_id); cross-batch order
    * is arrival order, the inherent streaming contract. */
  def ewmaStream(ds: Dataset[EwmaEvent]): Dataset[EwmaSnapshot] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaSnapshot, EwmaSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[EwmaSnapshot]) =>
          var st = state.getOption.getOrElse(EwmaSnapshot(key, 0L, 0L, 0L))
          // MICROSECOND ordering: Timestamp.getTime is millisecond-only,
          // which would order same-millisecond events differently than the
          // batch fold's unix_micros sort — recover the microsecond from
          // getNanos so stream == batch holds at any timestamp density
          def micros(t: Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          rows.toSeq.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
            st =
              if (st.n_events == 0) EwmaSnapshot(key, 1L, r.x, 0L)
              else {
                val (s2, spiked) = graft.operators.Windows.ewmaStep(st.ewma, r.x)
                EwmaSnapshot(key, st.n_events + 1, s2,
                  st.n_spikes + (if (spiked) 1L else 0L))
              }
          }
          state.update(st)
          Iterator(st)
      }
  }

  final case class DebEvent(user_id: Long, ts: Timestamp, event_id: Long)
  final case class DebState(lastKept: Long, n: Long, nKept: Long, ck: Long)
  final case class DebSnapshot(user_id: Long, n_events: Long, n_kept: Long,
      kept_ck: Long)

  /** Streaming debounce / alert throttling — the continuous twin of the
    * batch q_debounce fold (operators/Windows): keep an event only if
    * ≥ `minGapMicros` has passed since the last KEPT event of the same
    * key. Per-key state is one (last_kept, n, n_kept, ck) quadruple
    * regardless of history length — exactly the shape
    * flatMapGroupsWithState bounds — and each micro-batch emits the
    * updated per-key summary, so a single availableNow drop reproduces
    * the batch operator's (n_events, n_kept, kept_ck) exactly
    * (StreamingSpec proves it). Same within-batch (ts, event_id)
    * ordering contract as ewmaStream, microsecond-exact. */
  def debounceStream(ds: Dataset[DebEvent],
      minGapMicros: Long = 21600000000L): Dataset[DebSnapshot] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[DebState, DebSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[DebState]) =>
          def micros(t: Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          var st = state.getOption.getOrElse(DebState(Long.MinValue, 0L, 0L, 0L))
          rows.toSeq.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
            val t = micros(r.ts)
            // n == 0 guards the sentinel (MinValue + gap would overflow)
            val keep = st.n == 0 || t >= st.lastKept + minGapMicros
            st = DebState(
              if (keep) t else st.lastKept,
              st.n + 1,
              st.nKept + (if (keep) 1L else 0L),
              if (keep) (st.ck + r.event_id % 1000003L) % 1000003L else st.ck)
          }
          state.update(st)
          Iterator(DebSnapshot(key, st.n, st.nKept, st.ck))
      }
  }

  final case class WFunnelEvent(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String)
  final case class WFunnelState(t0: Long, t1: Long, t2: Long)
  final case class WFunnelSnapshot(user_id: Long, stage: Long,
      t0_us: Long, t1_us: Long, t2_us: Long)

  /** Streaming conversion-window funnel — the continuous twin of the
    * batch q_funnel_windowed joins (operators/EventAnalytics): per user,
    * t0 = first view, t1 = first click in (t0, t0+24h], t2 = first
    * purchase in (t1, t1+24h]. Scanning a user's events in (ts,
    * event_id) order makes each "first X after t in window" pick exactly
    * the batch MIN-join answer, so state is THREE timestamps per user
    * regardless of history length — the bounded step-timestamp vector
    * flatMapGroupsWithState is built for. Each micro-batch emits the
    * user's current funnel snapshot (stage = deepest step reached);
    * aggregating the final snapshots reproduces the batch operator's
    * stage counts exactly (StreamingSpec proves it). Same within-batch
    * ordering contract as ewmaStream/debounceStream. */
  def windowedFunnelStream(ds: Dataset[WFunnelEvent],
      windowMicros: Long = 86400000000L): Dataset[WFunnelSnapshot] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val unset = Long.MinValue
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[WFunnelState, WFunnelSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[WFunnelState]) =>
          def micros(t: Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          var st = state.getOption.getOrElse(WFunnelState(unset, unset, unset))
          rows.toSeq.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
            val t = micros(r.ts)
            r.event_type match {
              case "view" if st.t0 == unset =>
                st = st.copy(t0 = t)
              case "click" if st.t0 != unset && st.t1 == unset
                  && t > st.t0 && t <= st.t0 + windowMicros =>
                st = st.copy(t1 = t)
              case "purchase" if st.t1 != unset && st.t2 == unset
                  && t > st.t1 && t <= st.t1 + windowMicros =>
                st = st.copy(t2 = t)
              case _ => ()
            }
          }
          state.update(st)
          val stage =
            if (st.t2 != unset) 3L else if (st.t1 != unset) 2L
            else if (st.t0 != unset) 1L else 0L
          Iterator(WFunnelSnapshot(key, stage, st.t0, st.t1, st.t2))
      }
  }

  final case class HoltDaily(event_type: String, ep: Long, xc: Long)
  final case class HoltSnapshot(event_type: String, n_days: Long,
      level_c: Long, trend_c: Long, fc7_c: Long)

  /** Streaming Holt linear-trend smoothing — the continuous twin of the
    * batch q_holt_linear fold (operators/Windows): per-series state is
    * (n, level, trend) regardless of history length; each micro-batch
    * folds its daily rows in day order through the SAME
    * Windows.holtStep (exact binary halving), so one availableNow drop
    * reproduces the batch operator's (n_days, level_c, trend_c, fc7_c)
    * exactly (StreamingSpec proves it). Rows are per-day aggregates —
    * the stream is assumed day-complete per micro-batch, the same
    * pre-reduction contract as the batch operator's daily grid. */
  def holtStream(ds: Dataset[HoltDaily]): Dataset[HoltSnapshot] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[HoltSnapshot, HoltSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[HoltSnapshot]) =>
          var st = state.getOption.getOrElse(HoltSnapshot(key, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.ep).foreach { r =>
            st =
              if (st.n_days == 0) HoltSnapshot(key, 1L, r.xc, 0L, r.xc)
              else {
                val (l2, b2) = graft.operators.Windows.holtStep(
                  st.level_c, st.trend_c, r.xc)
                HoltSnapshot(key, st.n_days + 1, l2, b2, l2 + 7 * b2)
              }
          }
          state.update(st)
          Iterator(st)
      }
  }

  final case class HwState(n: Long, l: Long, b: Long,
      sv: Seq[Long], fw: Seq[Long])
  final case class HwSnapshot(event_type: String, n_days: Long,
      level_c: Long, trend_c: Long, s0_c: Long, s1_c: Long, s2_c: Long,
      s3_c: Long, s4_c: Long, s5_c: Long, s6_c: Long, fc1_c: Long)

  /** Streaming additive Holt-Winters (period 7) — the continuous twin of
    * the batch q_holt_winters fold (operators/StatsTimeSeries): per-series
    * state is 16 longs (n, level, trend, 7 seasonal slots, the first-week
    * seed buffer) regardless of history length; each micro-batch folds its
    * daily rows in day order through the SAME StatsTimeSeries.hwStep, so
    * one availableNow drop reproduces the batch operator's full seasonal
    * readout exactly for every series past its seed week (StreamingSpec
    * proves it). Seasonality is INDEX-based like the batch operator, so
    * the slot is determined by the per-series arrival count, not the
    * calendar — the stream is assumed day-complete per micro-batch, the
    * same pre-reduction contract as the batch daily grid. */
  def holtWintersStream(ds: Dataset[HoltDaily]): Dataset[HwSnapshot] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[HwState, HwSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[HwState]) =>
          var st = state.getOption.getOrElse(
            HwState(0L, 0L, 0L, Seq.fill(7)(0L), Seq.fill(7)(0L)))
          rows.toSeq.sortBy(_.ep).foreach { r =>
            val n = st.n + 1
            if (n <= 7) {
              val fw = st.fw.updated((n - 1).toInt, r.xc)
              st =
                if (n == 7) {
                  val l = fw.sum / 7
                  HwState(n, l, 0L, fw.map(_ - l), fw)
                } else st.copy(n = n, fw = fw)
            } else {
              val slot = ((n - 1) % 7).toInt
              val (l2, b2, s2) = graft.operators.StatsTimeSeries.hwStep(
                st.l, st.b, st.sv(slot), r.xc)
              st = st.copy(n = n, l = l2, b = b2, sv = st.sv.updated(slot, s2))
            }
          }
          state.update(st)
          val fc1 = st.l + st.b + st.sv((st.n % 7).toInt)
          Iterator(HwSnapshot(key, st.n, st.l, st.b,
            st.sv(0), st.sv(1), st.sv(2), st.sv(3), st.sv(4), st.sv(5),
            st.sv(6), fc1))
      }
  }

  final case class CrostonDemand(l_partkey: Long, di: Long, sz: Long)
  final case class CrostonState(n: Long, z: Long, p: Long, lastDi: Long)
  final case class CrostonSnapshot(l_partkey: Long, n_demands: Long,
      z_c: Long, p_c: Long, rate_q6: Long, sba_q6: Long)

  /** Streaming Croston — the continuous twin of the batch q_croston fold
    * (operators/Commerce): per-part state is 4 longs (occurrence count,
    * size EWMA, gap EWMA, last demand day) regardless of history; each
    * micro-batch folds its (part, day, size) demand rows in day order
    * through the same exact-halving updates, so one availableNow drop
    * reproduces the batch operator's (n_demands, z_c, p_c, rate_q6,
    * sba_q6) exactly for every part past its second demand day
    * (StreamingSpec proves it). Same day-complete pre-reduction contract
    * as the batch (part, day) grid. */
  def crostonStream(ds: Dataset[CrostonDemand]): Dataset[CrostonSnapshot] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.l_partkey)
      .flatMapGroupsWithState[CrostonState, CrostonSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[CrostonState]) =>
          var st = state.getOption.getOrElse(CrostonState(0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.di).foreach { r =>
            val n = st.n + 1
            st =
              if (n == 1) CrostonState(1L, r.sz, 0L, r.di)
              else {
                val g = r.di - st.lastDi
                val z = math.floor((r.sz + st.z) / 2.0).toLong
                val p = if (n == 2) g else math.floor((g + st.p) / 2.0).toLong
                CrostonState(n, z, p, r.di)
              }
          }
          state.update(st)
          if (st.n >= 2)
            Iterator(CrostonSnapshot(key, st.n, st.z, st.p,
              (st.z * 1000000L) / st.p, (st.z * 750000L) / st.p))
          else Iterator.empty
      }
  }

  final case class SampleDoc(source: String, doc_id: Long)
  final case class MinKRow(source: String, rk: Long, doc_id: Long)

  /** Streaming uniform sample — the continuous twin of the batch
    * q_sample_exact_k (min-k-by-multiplicative-hash per source): per-key
    * state is the k smallest (hash, id) pairs seen so far — bounded and
    * MERGEABLE (the min-k of a union is the min-k of the min-k's), which
    * also makes it the KMV distinct-count sketch shape. Each micro-batch
    * emits the current ranked sample; after one availableNow drop the
    * snapshot equals the batch operator exactly (StreamingSpec). Same
    * hash, so the sample is deterministic, never rand(). */
  def minKSampleStream(ds: Dataset[SampleDoc], k: Int = 5): Dataset[MinKRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.source)
      .flatMapGroupsWithState[Seq[(Long, Long)], MinKRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Seq[(Long, Long)]]) =>
          def h(id: Long): Long =
            java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
          var st = state.getOption.getOrElse(Seq.empty)
          rows.foreach { r =>
            st = ((h(r.doc_id), r.doc_id) +: st).distinct.sorted.take(k)
          }
          state.update(st)
          st.iterator.zipWithIndex.map { case ((_, id), i) =>
            MinKRow(key, (i + 1).toLong, id)
          }
      }
  }

  final case class CmRowState(counters: Array[Long])
  final case class CmCell(i: Int, bucket: Int, cnt: Long)

  /** Stateful streaming Count-Min (the flatMapGroupsWithState analog of
    * the batch `Sketches.countMin`): total state is exactly the sketch
    * (depth·width counters) no matter how many events stream through.
    * State is keyed by (hash row, bucket SHARD) — depth·shards groups,
    * each holding ~width/shards longs — not by row alone, which would cap
    * shuffle parallelism at `depth` (= 4) reducers; sharding spreads the
    * per-batch fold across depth·shards cores while keeping state size
    * unchanged. Each micro-batch folds its increments into the shard's
    * counters and emits ONLY the cells it touched (not the full non-zero
    * snapshot — per-batch output is O(batch), not O(width)); counters are
    * monotone non-decreasing and an untouched cell's last emission already
    * carries its final value, so max(cnt) per (i, bucket) across the
    * append stream IS the merged sketch, and a single availableNow drop
    * reproduces `Sketches.countMin` exactly (StreamingSpec proves
    * stream == batch). Hashing is shared with the batch build
    * (`Sketches.cmBucket`), so build and probe cannot diverge. */
  def countMinStream(events: DataFrame, key: org.apache.spark.sql.Column,
      depth: Int = graft.pipeline.Sketches.CmDepth,
      width: Int = graft.pipeline.Sketches.CmWidth,
      shards: Int = 8): Dataset[CmCell] = {
    require(depth >= 1 && width >= 2, s"geometry $depth×$width")
    require(shards >= 1 && shards <= width, s"shards $shards vs width $width")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(key.as("k"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("i"), col("k"))
      .select(col("i").cast("int"),
        graft.pipeline.Sketches.cmBucket(col("k"), col("i"), depth, width)
          .cast("int").as("bucket"))
      .as[(Int, Int)]
      .groupByKey { case (i, b) => i * shards + b % shards }
      .flatMapGroupsWithState[CmRowState, CmCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sk, rows, state: GroupState[CmRowState]) =>
          val i = sk / shards
          val shard = sk % shards
          // buckets b ∈ [0, width) with b % shards == shard, stored at
          // local index b / shards
          val shardWidth = (width - shard + shards - 1) / shards
          val ctr = state.getOption.map(_.counters)
            .getOrElse(Array.fill(shardWidth)(0L))
          val touched = new java.util.BitSet(shardWidth)
          rows.foreach { case (_, b) =>
            val j = b / shards; ctr(j) += 1L; touched.set(j)
          }
          state.update(CmRowState(ctr))
          Iterator.range(0, shardWidth)
            .filter(touched.get)
            .map(j => CmCell(i, j * shards + shard, ctr(j)))
      }
  }

  final case class MgState(keys: Array[Long], cnts: Array[Long], dec: Long,
      batch: Long)
  final case class MgEntry(shard: Int, batch: Long, key: Long, est: Long,
      max_err: Long)

  /** Streaming heavy hitters via Misra–Gries summaries: per key-shard,
    * state is AT MOST `capacity` (key, count) pairs plus one decrement
    * counter — fixed regardless of stream length, the property that makes
    * it the continuous analogue of the batch q_countmin_heavy top-k. The
    * classic guarantee holds per shard: for every key,
    * est ≤ true_count ≤ est + dec, and any key whose shard count exceeds
    * shardTotal/(capacity+1) is guaranteed resident (StreamingSpec asserts
    * both against exact batch counts). Sharding by key hash spreads the
    * fold across reducers AND keeps the guarantee exact per shard, since
    * a key's every occurrence lands in the same shard; summaries are also
    * mergeable across shards at read time (estimates add, errors add).
    * Each micro-batch emits the shard's full summary stamped with a batch
    * sequence number — ≤ capacity rows, so output stays O(capacity), and
    * the latest batch per shard IS the summary (append-mode friendly). */
  def heavyHittersStream(events: DataFrame, key: org.apache.spark.sql.Column,
      capacity: Int = 16, shards: Int = 8): Dataset[MgEntry] = {
    require(capacity >= 1 && shards >= 1, s"capacity=$capacity shards=$shards")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(key.cast("long").as("k")).as[Long]
      .groupByKey(k => (math.floorMod(k, shards.toLong)).toInt)
      .flatMapGroupsWithState[MgState, MgEntry](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard, rows, state: GroupState[MgState]) =>
          val st = state.getOption.getOrElse(
            MgState(Array.empty, Array.empty, 0L, 0L))
          val m = scala.collection.mutable.LongMap[Long]()
          st.keys.iterator.zip(st.cnts.iterator).foreach { case (k, c) => m(k) = c }
          var dec = st.dec
          rows.foreach { k =>
            if (m.contains(k)) m(k) += 1L
            else if (m.size < capacity) m(k) = 1L
            else {
              // decrement-all: drops every resident by 1 and charges the
              // shared error counter — the Misra–Gries step that caps the
              // summary at `capacity` entries
              dec += 1L
              m.keysIterator.toArray.foreach { rk =>
                m(rk) -= 1L; if (m(rk) <= 0L) m.remove(rk)
              }
            }
          }
          val batch = st.batch + 1L
          val entries = m.toArray.sortBy(_._1)
          state.update(MgState(entries.map(_._1), entries.map(_._2), dec, batch))
          entries.iterator.map { case (k, c) => MgEntry(shard, batch, k, c, dec) }
      }
  }

  final case class DocKey(key: String, doc_id: Long)
  final case class Kept(key: String, doc_id: Long)

  final case class HllRegState(maxrho: Long)
  final case class HllReg(bucket: Int, maxrho: Long)

  /** Streaming HyperLogLog registers: the continuous approximate-distinct
    * counter. State is EXACTLY 64 rows (one max-rank register per bucket)
    * no matter how many events stream through — registers are monotone
    * maxes, so micro-batches merge by max and the latest emission per
    * bucket IS the sketch. Shares [[graft.pipeline.Sketches.hllMix]] /
    * `rhoOf` with the batch q_hll_distinct build, so stream and batch
    * registers are bit-identical on the same data (StreamingSpec proves
    * it) and a streamed register table can be merged with batch partials
    * — the lambda-architecture property that makes HLL the 100 TB
    * distinct-count shape. Emits a bucket's register only when a batch
    * touched it (output O(64) per batch). */
  def hllStream(events: DataFrame, key: org.apache.spark.sql.Column): Dataset[HllReg] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (bucket, r) = graft.pipeline.Sketches.rhoOf(graft.pipeline.Sketches.hllMix(key))
    events.select(bucket.cast("int").as("bucket"), r.as("r"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HllRegState, HllReg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bkt, rows, state: GroupState[HllRegState]) =>
          val prev = state.getOption.map(_.maxrho).getOrElse(0L)
          var m = prev
          rows.foreach { case (_, rr) => if (rr > m) m = rr }
          state.update(HllRegState(m))
          Iterator.single(HllReg(bkt, m))
      }
  }

  final case class BalEvent(key: Long, seq: Long, x: Long)
  final case class BalState(bal: Long, peak: Long, hits: Long, n: Long)
  final case class BalSnapshot(key: Long, n_moves: Long, bal: Long,
      peak: Long, n_floor_hits: Long)

  /** Streaming floor-clamped balance — the stateful twin of
    * q_clamped_balance's closed-form windows: per key the state is the
    * literal Lindley recursion B ← max(0, B + x) plus its peak and
    * floor-hit count (one quadruple per key). Batch uses the closed form
    * because it can see the whole series; the stream can't, so it runs
    * the recursion — StreamingSpec proves both land on identical final
    * snapshots. Rows must arrive in per-key `seq` order across batches
    * (within a batch they are sorted here). */
  def clampedBalanceStream(ds: Dataset[BalEvent]): Dataset[BalSnapshot] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[BalState, BalSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[BalState]) =>
          var s = state.getOption.getOrElse(BalState(0L, 0L, 0L, 0L))
          it.toSeq.sortBy(_.seq).foreach { ev =>
            val next = s.bal + ev.x
            val bal = if (next < 0) 0L else next
            val hits = s.hits + (if (ev.x < 0 && bal == 0L) 1L else 0L)
            s = BalState(bal, math.max(s.peak, bal), hits, s.n + 1)
          }
          state.update(s)
          Iterator.single(BalSnapshot(key, s.n, s.bal, s.peak, s.hits))
      }
  }

  final case class QSketchState(counts: Map[Long, Long])
  final case class QSketchRow(key: String, e: Long, m: Long, cnt: Long)

  /** Streaming mergeable log-histogram quantile sketch — the stateful twin
    * of the batch q_quantile_sketch/q_quantile_by_group family: per key
    * the state is the bounded bucket-count map (≤ 16 mantissa × 64
    * exponent cells packed as e·16+m), each micro-batch folds its rows in
    * and emits the updated cells. Counts are monotone, so the LAST (= max)
    * snapshot per cell over the append stream is the final sketch, and
    * any quantile answers from the cumulative walk exactly as in batch
    * (StreamingSpec proves cell-for-cell equality and p90 agreement).
    * Input rows: (key, v) with v ≥ 1. */
  def quantileSketchStream(rows: Dataset[(String, Long)]): Dataset[QSketchRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[QSketchState, QSketchRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[QSketchState]) =>
          val acc = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(s => acc ++= s.counts)
          val touched = scala.collection.mutable.Set.empty[Long]
          it.foreach { case (_, v) =>
            // same bucketing as the batch sketch: e = floor(log2 v),
            // m = v·16 / 2^e − 16 ∈ [0, 16)
            val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
            val m = (v * 16 >> e) - 16
            val cell = e * 16 + m
            acc(cell) = acc.getOrElse(cell, 0L) + 1L
            touched += cell
          }
          state.update(QSketchState(acc.toMap))
          touched.iterator.map { cell =>
            QSketchRow(key, cell / 16, cell % 16, acc(cell))
          }.toList.iterator
      }
  }

  /** Streaming exact dedup, first-seen-wins (the stateful analogue of the
    * batch q_dedup_keep hash-groupBy: TextPipeline exact dedup, keeper =
    * min doc_id per content key): the FIRST arrival of each key is emitted,
    * every later re-delivery is dropped. Within a micro-batch ties break
    * to the smallest doc_id (so a single availableNow drop of an id-ordered
    * file reproduces the batch keeper set exactly — StreamingSpec proves
    * it); across micro-batches first arrival wins, the inherent streaming
    * contract. State per distinct key is a single marker — the same O(keys)
    * footprint the batch groupBy's shuffle pays — with no watermark bound,
    * because EXACT dedup must remember every key forever (the bounded
    * variant is [[dedupStream]]). */
  def firstSeenStream(docs: Dataset[DocKey]): Dataset[Kept] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Kept](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator(Kept(key, rows.minBy(_.doc_id).doc_id))
          }
      }
  }

  /** Bounded-state streaming dedup: duplicate keys arriving within the
    * watermark horizon are dropped, and — unlike [[firstSeenStream]],
    * whose one-marker-per-key state grows with distinct keys forever —
    * a key's state is RECLAIMED once the event-time watermark passes
    * it. This is the production form for unbounded streams whose
    * duplicates cluster in time (retries, at-least-once redelivery):
    * state is bounded by keys-per-horizon, not keys-ever-seen. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      keyCols: Seq[String], horizon: String): DataFrame =
    events.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Hopping (sliding) event-time windows: per (key, window) counts and
    * integer value sums over overlapping windows of `width` every
    * `slide`. Each event lands in width/slide windows — state is bounded
    * by open windows inside the watermark horizon, and a window is
    * emitted (append mode) exactly once, when the watermark passes its
    * end. The same call on a batch DataFrame computes the identical
    * grouping — stream == batch is the spec's gate. The caller owns the
    * watermark (runStream sets it), same contract as [[sessionWindows]]. */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
      width: String, slide: String): DataFrame =
    events
      .groupBy(col(keyCol), window(col(tsCol), width, slide).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_v_c"))
      .select(col(keyCol), col("w.start").as("w_start"), col("n_events"),
        col("sum_v_c"))

  final case class LshEdge(b: Int, sig_key: String, doc1: Long, doc2: Long)

  /** Streaming MinHash-LSH near-dup candidate edges: documents stream in,
    * each computes its 16-hash signature ROW-LOCALLY
    * (TextPipeline.rowLocalSignatures — no aggregation, so it is legal in
    * an Append-mode stream and bit-identical to the batch signature),
    * bands explode to (b, sig_key) keys, and per band bucket the state is
    * ONE long — the minimum doc id seen — emitting STAR edges (hub,
    * member) exactly like the batch lshClusterEdges reduction: per-bucket
    * state and per-arrival output are O(1) even when a hot bucket absorbs
    * millions of duplicates, and connected components over the streamed
    * star edges equal components over the batch edges (StreamingSpec
    * proves it across micro-batches). When a later batch brings a new
    * lower hub, the old hub is re-linked to it, preserving connectivity
    * across any arrival order. */
  def lshEdgesStream(docs: DataFrame,
      bands: Int = graft.pipeline.TextPipeline.LshBands,
      rowsPerBand: Int = graft.pipeline.TextPipeline.LshRowsPerBand): Dataset[LshEdge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = graft.pipeline.TextPipeline.rowLocalSignatures(docs)
    graft.pipeline.TextPipeline.bandRows(sig, bands, rowsPerBand)
      .select(col("b").cast("int"), col("sig_key"), col("doc_id").cast("long"))
      .as[(Int, String, Long)]
      .groupByKey { case (b, k, _) => (b, k) }
      .flatMapGroupsWithState[Long, LshEdge](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((b, k), rows, state: GroupState[Long]) =>
          val ids = rows.map(_._3).toArray.distinct.sorted
          val prev = state.getOption
          val hub = prev.fold(ids.head)(m => math.min(m, ids.head))
          state.update(hub)
          (ids.iterator.filter(_ != hub).map(d => LshEdge(b, k, hub, d)) ++
            prev.filter(_ != hub).iterator.map(m => LshEdge(b, k, hub, m)))
      }
  }

  final case class FunnelEvent(user_id: Long, ts_us: Long, event_type: String)
  final case class FunnelStage(stage: Int, tsPrev: Long)
  final case class FunnelHit(user_id: Long, stage: Int, ts_us: Long)

  /** Stateful streaming funnel progression (the streaming form of
    * q_funnel's min-ts chain): per user, stage k+1 is reached by the
    * first stages(k+1) event STRICTLY after the stage-k timestamp. A
    * micro-batch's rows are processed in event-time order, so a single
    * availableNow drop (or any time-ordered file sequence) reproduces
    * the batch chain t0 = min(view), t1 = min(click > t0),
    * t2 = min(purchase > t1) exactly — greedy over the sorted stream IS
    * that chain. Across out-of-order micro-batches, stage advancement
    * is monotone (append mode cannot retract a reached stage), the
    * inherent streaming contract. State per user is one (stage, ts)
    * pair — O(users), independent of event volume. */
  def funnelStream(ds: Dataset[FunnelEvent],
      stages: Seq[String] = Seq("view", "click", "purchase")): Dataset[FunnelHit] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelStage, FunnelHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[FunnelStage]) =>
          var st = state.getOption.getOrElse(FunnelStage(0, Long.MinValue))
          val hits = Seq.newBuilder[FunnelHit]
          rows.toSeq.sortBy(_.ts_us).foreach { e =>
            if (st.stage < stages.length && e.event_type == stages(st.stage) &&
              (st.stage == 0 || e.ts_us > st.tsPrev)) {
              st = FunnelStage(st.stage + 1, e.ts_us)
              hits += FunnelHit(user, st.stage, e.ts_us)
            }
          }
          state.update(st)
          hits.result().iterator
      }
  }

  final case class Acq(key: Long, ts: Timestamp)
  final case class BatchState(count: Long, batchId: Int)
  final case class Labeled(key: Long, ts: Timestamp, batchId: Int, label: String)

  /** Stateful per-key batch labeling (reconcile_and_label_db.py:341-412
    * batch rule, streaming form): every `batchSize` acquisitions of a key
    * form a batch. Labels are assigned at processing time: a row whose
    * batch is already CLOSED by the end of the micro-batch gets
    * "historical_NN" (NN = 1-based batch number); rows in the still-open
    * partial batch get "forward". Append mode cannot retro-relabel a row
    * once its batch later fills, and the reference's gap-based group
    * renumbering is a batch-recompute concern — both live in the batch
    * operator (Windows q_processing_modes), which reruns over history. */
  def labelAcquisitions(ds: Dataset[Acq], batchSize: Int = 50): Dataset[Labeled] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[BatchState, Labeled](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[BatchState]) =>
          var st = state.getOption.getOrElse(BatchState(0L, 0))
          val numbered = rows.toSeq.sortBy(_.ts.getTime).map { a =>
            val batch = (st.count / batchSize).toInt
            st = BatchState(st.count + 1, batch)
            (a, batch)
          }
          state.update(st)
          val nClosed = st.count / batchSize // batches full as of this micro-batch
          numbered.map { case (a, batch) =>
            val label =
              if (batch < nClosed) f"historical_${batch + 1}%02d" else "forward"
            Labeled(key, a.ts, batch, label)
          }.iterator
      }
  }

  final case class MomentEvent(g: String, vq: Long)
  final case class MomentState(n: Long, s1: Long, s2: Long)
  final case class MomentRow(g: String, n: Long, s1: Long, s2: Long)

  /** Streaming per-group moment accumulation — the stateful twin of the
    * q_anova_f reduction: three longs of state per group (n, Σx, Σx²),
    * folded per micro-batch in any arrival order (sums commute, unlike
    * the sequential twins above). The batch path keeps Σx² in
    * DECIMAL(38,0); the stream state is a Long, exact while
    * n·max(vq)² < 2⁶³ (~3·10⁷ rows at this value range) — a per-group
    * continuous-experiment monitor, not an unbounded historical rollup,
    * which is the batch operator's job. StreamingSpec proves the
    * streamed moments — and the F statistic recomputed from them —
    * equal the batch query's. */
  def groupMomentsStream(ds: Dataset[MomentEvent]): Dataset[MomentRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.g)
      .flatMapGroupsWithState[MomentState, MomentRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g, it, state: GroupState[MomentState]) =>
          var s = state.getOption.getOrElse(MomentState(0L, 0L, 0L))
          it.foreach { ev =>
            s = MomentState(s.n + 1, s.s1 + ev.vq, s.s2 + ev.vq * ev.vq)
          }
          state.update(s)
          Iterator.single(MomentRow(g, s.n, s.s1, s.s2))
      }
  }
}
