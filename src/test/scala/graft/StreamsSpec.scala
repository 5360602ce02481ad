package graft

import graft.streaming.{Events, Streams}
import org.apache.spark.sql.functions._

/** Structured Streaming parity: the streaming windowed aggregate must agree
  * with the batch form on a replayed (finite) input, and stateful
  * sessionization must emit the same sessions the batch lag/cumsum finds. */
class StreamsSpec extends SparkSuite {

  private val srcDir = "/tmp/graft_stream_src"

  private def materializeEvents(): Unit = {
    // re-write sf0.001 events with micro timestamps so readStream can scan it
    graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(srcDir)
  }

  test("streaming hourly windows == batch hourly windows on replay") {
    materializeEvents()
    Streams.runToMemory(Streams.hourlyWindowsStream(spark, srcDir), "hourly_out")
    val streamed = spark.table("hourly_out")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = Events.hourlyWindows(spark, "/root/testdata/sf0.001")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // append mode drops windows newer than the final watermark (max_ts - 2h);
    // everything emitted must match batch exactly, and most windows must emit
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size / 2)
  }

  test("streaming dedup with watermark state: planted duplicate event_ids collapse to one") {
    val ev = graft.engine.Tables.events(spark, "/root/testdata/sf0.001").limit(200)
    // plant duplicates: replay the same 200 events twice into the source dir
    val dupDir = "/tmp/graft_stream_dup_src"
    ev.union(ev).write.mode("overwrite").parquet(dupDir)
    Streams.runToMemory(Streams.dedupStream(spark, dupDir), "dedup_out")
    val out = spark.table("dedup_out")
    val ids = out.select("event_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "every event_id emitted exactly once")
    assert(ids.length == 200, "all planted originals survive, all replays dropped")
  }

  test("incrementally-built band index over two waves == batch banding of the corpus") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val srcDir = "/tmp/graft_stream_bands_src"
    val idxDir = "/tmp/graft_stream_bands_idx"
    val ckpt = "/tmp/graft_stream_bands_ckpt"
    Seq(srcDir, idxDir, ckpt).foreach(rmTree)
    // wave 1: even doc ids; drain; wave 2: odd doc ids; drain again
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("append").parquet(srcDir)
    Streams.runBandIndex(spark, srcDir, idxDir, ckpt)
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("append").parquet(srcDir)
    Streams.runBandIndex(spark, srcDir, idxDir, ckpt)
    val streamed = spark.read.parquet(idxDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val batch = graft.ext.Dedup.minhashBandsInline(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed == batch, "at-rest index must equal the batch banding")
    // idempotence: a third drain with no new files appends nothing
    Streams.runBandIndex(spark, srcDir, idxDir, ckpt)
    assert(spark.read.parquet(idxDir).count() == batch.size.toLong)
  }

  test("decontamination-on-arrival over two waves == batch q234 screen of the corpus") {
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val srcDir = "/tmp/graft_stream_decon_src"
    val outDir = "/tmp/graft_stream_decon_out"
    val ckpt = "/tmp/graft_stream_decon_ckpt"
    Seq(srcDir, outDir, ckpt).foreach(rmTree)
    // the benchmark is the fixed artifact (registered from the full corpus
    // dir); waves are the same corpus arriving in two drops
    emb.filter(col("vec_id") % 2 === 0).write.mode("append").parquet(srcDir)
    Streams.runDeconStream(spark, srcDir, "/root/testdata/sf0.001", outDir, ckpt)
    emb.filter(col("vec_id") % 2 === 1).write.mode("append").parquet(srcDir)
    Streams.runDeconStream(spark, srcDir, "/root/testdata/sf0.001", outDir, ckpt)
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("vec_id"),
      r.getAs[Long]("nearest_eval_id"), r.getAs[Double]("cos_sim"),
      r.getAs[Boolean]("contaminated"))
    val streamed = spark.read.parquet(outDir).collect().map(key).toSet
    val batch = graft.ext.Similarity
      .semanticDecontaminate(spark, "/root/testdata/sf0.001")
      .collect().map(key).toSet
    // the stream screens EVERY arriving vector — the benchmark's own
    // membership mod is a property of the benchmark CORPUS, not of the
    // wave: here the waves happen to be that same corpus, so the eval
    // members arrive too and must be screened (each self-matches at cos
    // 1.0), while the batch form excludes them by construction
    val evalMod = 50L // sf0.001 corpus < 50k vectors -> the law's floor
    val (evalRows, nonEval) = streamed.partition(_._1 % evalMod == 0)
    assert(nonEval == batch, "wave screens must equal the batch screen")
    assert(evalRows.nonEmpty, "eval-aliasing wave rows must be screened, not dropped")
    assert(evalRows.forall(r => r._2 == r._1 && r._3 == 1.0 && r._4),
      "an arriving eval member self-matches at cos 1.0")
    // exactly-once: a re-drain with no new waves emits nothing
    Streams.runDeconStream(spark, srcDir, "/root/testdata/sf0.001", outDir, ckpt)
    assert(spark.read.parquet(outDir).count() == streamed.size.toLong)
  }

  test("streaming vector ingest: wave verdicts against the growing at-rest bucket index") {
    val s = spark; import s.implicits._
    val src = "/tmp/graft_stream_vec_src"; val idx = "/tmp/graft_stream_vec_idx"
    val ver = "/tmp/graft_stream_vec_ver"; val ckpt = "/tmp/graft_stream_vec_ckpt"
    Seq(src, idx, ver, ckpt).foreach(rmTree)
    def basis(i: Int): Array[Float] = Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f)
    // wave 1: two orthogonal corpus vectors land in an empty index
    Seq((1L, basis(0)), (2L, basis(2))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(src)
    Streams.runVectorIngest(spark, src, idx, ver, ckpt)
    // wave 2: an exact copy of vec 1 plus a brand-new direction
    Seq((7L, basis(0)), (17L, basis(5))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(src)
    Streams.runVectorIngest(spark, src, idx, ver, ckpt)
    def verdicts() = spark.read.option("recursiveFileLookup", "true").parquet(ver)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_dup_candidates"), r.getAs[Boolean]("is_new")))).toMap
    val out = verdicts()
    assert(out(1L) == ((0L, true)) && out(2L) == ((0L, true)),
      "wave 1 is all-new against the empty index")
    assert(out(7L) == ((1L, false)), "the wave-2 copy is flagged against wave 1's index")
    assert(out(17L) == ((0L, true)), "a new direction stays new")
    assert(spark.read.option("recursiveFileLookup", "true").parquet(idx).count() == 4,
      "the index holds every ingested vector, bucketized")
    // idempotent drain: no new files → no new verdicts, no index growth
    Streams.runVectorIngest(spark, src, idx, ver, ckpt)
    assert(verdicts().size == 4)
    assert(spark.read.option("recursiveFileLookup", "true").parquet(idx).count() == 4)
  }

  test("streaming debounce: rapid-fire (user, type) repeats collapse to one kept event") {
    import java.sql.Timestamp
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    def at(minutes: Int) = new Timestamp(t0.getTime + minutes * 60000L)
    // one triple-fire burst, plus two other keys as controls
    val wave = Seq(
      (1L, at(0), 7L, "click", 1.0, "{}"),
      (2L, at(3), 7L, "click", 1.0, "{}"),
      (3L, at(9), 7L, "click", 1.0, "{}"),
      (4L, at(0), 7L, "view", 1.0, "{}"),
      (5L, at(1), 8L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val burstDir = "/tmp/graft_stream_debounce_src"
    wave.write.mode("overwrite").parquet(burstDir)
    Streams.runToMemory(Streams.debounceStream(spark, burstDir), "debounce_out")
    val kept = spark.table("debounce_out")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.length == 3, "exactly one survivor per (user, type) inside the gap")
    assert(kept.toSet == Set((7L, "click"), (7L, "view"), (8L, "click")))
  }

  test("stream-stream join with watermarks matches the batch range join on replay") {
    materializeEvents()
    Streams.runToMemory(Streams.errorClickJoinStream(spark, srcDir), "ssj_out")
    val streamed = spark.table("ssj_out")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ev = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_event_id"), col("user_id").as("click_user"), col("ts").as("click_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_event_id"), col("user_id"), col("ts").as("error_ts"))
    val batch = errors.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("error_ts") &&
        col("click_ts") >= col("error_ts") - expr("INTERVAL 1 HOUR"))
      .collect().map(r => (r.getAs[Long]("error_event_id"), r.getAs[Long]("click_event_id"))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("windowed aggregation state survives checkpointed restart without duplicates") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val src = "/tmp/graft_ckpt_src"; val sink = "/tmp/graft_ckpt_sink"; val ckpt = "/tmp/graft_ckpt_cp"
    rmTree(src); rmTree(sink); rmTree(ckpt)
    val all = graft.engine.Tables.events(spark, "/root/testdata/sf0.001").cache()
    // land first half, run, land second half, resume from checkpoint
    all.filter(col("event_id") < 500).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(Streams.eventSchema).parquet(src)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"))
        .writeStream.outputMode(OutputMode.Append)
        .format("parquet").option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    all.filter(col("event_id") >= 500).write.mode("append").parquet(src)
    runOnce()
    val out = spark.read.parquet(sink)
      .groupBy("window_start", "event_type").count()
    // each finalized window emitted exactly once across the restart
    assert(out.filter(col("count") > 1).count() == 0)
    val emitted = spark.read.parquet(sink)
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.streaming.Events.hourlyWindows(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(emitted.nonEmpty)
    // every emitted window matches the batch count exactly (late-window subset)
    emitted.foreach { case (k, n) => assert(batch(k) == n, s"window $k: $n vs ${batch.get(k)}") }
  }

  test("stream-static enrichment: broadcast dim join, left-join keeps dim misses") {
    val s = spark; import s.implicits._
    materializeEvents()
    // dim covers only even user_ids — odd ones must survive as 'unknown'
    val users = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().collect().map(_.getLong(0))
    val dim = users.filter(_ % 2 == 0).map(u => (u, s"seg${u % 3}")).toSeq
      .toDF("user_id", "segment")
    Streams.runToMemory(Streams.enrichStream(spark, srcDir, dim), "enrich_out")
    val out = spark.table("enrich_out")
    assert(out.count() == graft.engine.Tables.events(spark, "/root/testdata/sf0.001").count(),
      "left join: no event dropped on a dim miss")
    assert(out.filter(col("user_id") % 2 === 1 && col("segment") =!= "unknown").count() == 0)
    assert(out.filter(col("user_id") % 2 === 0 && col("segment") === "unknown").count() == 0)
    assert(out.filter(col("segment").isNull).count() == 0)
  }

  test("running user stats (mapGroupsWithState, update mode) match the batch profile") {
    materializeEvents()
    Streams.runToMemory(
      Streams.userStatsStream(spark, srcDir).toDF(), "user_stats_out",
      org.apache.spark.sql.streaming.OutputMode.Update)
    // update mode emits one row per key per micro-batch; n_events is monotone,
    // so the final profile is each user's max-n row
    val streamed = spark.table("user_stats_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("n_events").desc)))
      .filter(col("rn") === 1).drop("rn")
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"), r.getAs[Long]("max_event_id")))
      .toMap
    val batch = graft.engine.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"), max(col("event_id")).as("m"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Double]("v"), r.getAs[Long]("m")))
      .toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (u, (n, v, m)) =>
      val (bn, bv, bm) = batch(u)
      assert(n == bn && m == bm, s"user $u count/high-water mismatch")
      // double sums fold in different orders across the two paths
      assert(math.abs(v - bv) < 1e-6, s"user $u value drift: $v vs $bv")
    }
  }

  test("stateful sessionization (flatMapGroupsWithState) matches batch sessionize") {
    materializeEvents()
    Streams.runToMemory(
      Streams.sessionizeStream(spark, srcDir).toDF(), "sessions_out")
    val streamed = spark.table("sessions_out")
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getLong(2))).toSet
    val batch = Events.sessionize(spark, "/root/testdata/sf0.001")
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
  }

  test("streaming transitions across micro-batch boundaries == batch bigram matrix") {
    val dir = "/root/testdata/sf0.001"
    val src = "/tmp/graft_stream_trans_src"
    rmTree(src)
    // two waves split at the median event_id — per-file micro-batches force
    // the cross-batch transition to come from carried state, not batch-local
    // ordering
    val all = graft.engine.Tables.events(spark, dir)
    val mid = all.count() / 2
    all.filter(col("event_id") < mid).coalesce(1).write.mode("append").parquet(src)
    // the file source orders micro-batches by modification time; two appends
    // landing in the same mtime tick would make batch order (and the carried
    // state the test exercises) nondeterministic — pin wave1 strictly earlier
    val wave1Parts = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val base = System.currentTimeMillis() - 60000
    wave1Parts.foreach(f => assert(f.setLastModified(base), s"setLastModified $f"))
    all.filter(col("event_id") >= mid).coalesce(1).write.mode("append").parquet(src)
    new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
      .filterNot(wave1Parts.map(_.getName).toSet contains _.getName)
      .foreach(f => assert(f.setLastModified(base + 30000), s"setLastModified $f"))
    Streams.runToMemory(
      Streams.transitionsStream(spark, src, maxFilesPerTrigger = 1).toDF(),
      "transitions_out")
    val streamed = spark.table("transitions_out")
      .groupBy("prev_type", "next_type").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Events.eventBigrams(spark, dir)
      .collect().map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        r.getAs[Long]("n_pairs")).toMap
    assert(streamed == batch,
      "incremental transition counts must equal the batch matrix on replay")
  }

  test("streaming native session windows == batch session_window on replay") {
    materializeEvents()
    Streams.runToMemory(Streams.sessionWindowStream(spark, srcDir), "swin_out")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))
    val streamed = spark.table("swin_out").collect().map(key).toSet
    val batch = Events.sessionWindowNative(spark, "/root/testdata/sf0.001")
      .collect().map(key).toSet
    // append mode withholds sessions newer than the final watermark; every
    // emitted session must match the batch recompute exactly
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      "every emitted streaming session must equal its batch counterpart")
    assert(streamed.size >= batch.size / 2, "most sessions must emit")
  }

  test("streaming text ingest: wave verdicts against the growing fp/band index") {
    val s = spark; import s.implicits._
    val src = "/tmp/graft_stream_txting_src"
    val idx = "/tmp/graft_stream_txting_idx"
    val ver = "/tmp/graft_stream_txting_ver"
    val ckpt = "/tmp/graft_stream_txting_ckpt"
    Seq(src, idx, ver, ckpt).foreach(rmTree)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    def doc(id: Long, text: String) = (id, text, "en", "s1", text.length.toLong)
    // wave 1: two distinct docs land in an empty index
    Seq(doc(1L, base), doc(2L, "completely different words make totally other content here now"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(src)
    Streams.runTextIngest(spark, src, idx, ver, ckpt)
    // wave 2: an exact copy of doc 1, a near copy (one word changed), a fresh doc
    Seq(doc(11L, base),
        doc(12L, base.replace("dog", "cat")),
        doc(13L, "fresh unseen vocabulary nothing shared with anything prior whatsoever"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("append").parquet(src)
    Streams.runTextIngest(spark, src, idx, ver, ckpt)
    def verdicts() = spark.read.option("recursiveFileLookup", "true").parquet(ver)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getAs[java.lang.Long]("exact_dup_of")).map(_.toLong),
          r.getAs[Long]("n_near_candidates"), r.getAs[Boolean]("is_new")))).toMap
    val out = verdicts()
    assert(out(1L)._3 && out(2L)._3, "wave 1 is all-new against the empty index")
    assert(out(11L)._1 == Some(1L) && !out(11L)._3,
      "the wave-2 exact copy is flagged against wave 1's fingerprint slice")
    assert(out(12L)._1.isEmpty && out(12L)._2 >= 1L && !out(12L)._3,
      "the near copy shares a MinHash band with doc 1 but no fingerprint")
    assert(out(13L)._3, "the fresh doc is new")
    // idempotent re-drain: same checkpoint, no new files -> verdicts unchanged
    Streams.runTextIngest(spark, src, idx, ver, ckpt)
    assert(verdicts() == out)
  }

  test("streaming watermark-lag monitor == batch q184 on arrival-order replay") {
    val dir = "/root/testdata/sf0.001"
    val src = "/tmp/graft_stream_wml_src"
    val late = "/tmp/graft_stream_wml_late"
    val ckpt = "/tmp/graft_stream_wml_ckpt"
    Seq(src, late, ckpt).foreach(rmTree)
    // three waves split at arrival-order terciles: an event's lateness is
    // defined against the max over strictly-EARLIER ARRIVALS, so parity with
    // the batch audit requires waves to land in (arrival_us, event_id) order
    // — the monitor's documented contract
    val all = graft.engine.Tables.events(spark, dir)
      .withColumn("arr", expr(
        "unix_micros(ts) + (CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 7), 16, 10) AS BIGINT) % 7200) * 1000000"))
      .withColumn("wave", ntile(3).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("arr"), col("event_id"))))
    val waveFiles = (1 to 3).map { w =>
      val before = Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
        .map(_.getName).toSet
      all.filter(col("wave") === w)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(src)
      new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet"))
        .filterNot(f => before.contains(f.getName))
    }
    // pin strictly-ascending mtimes so the file source's batch order is the
    // wave order (same discipline as the transitions replay test)
    val base = System.currentTimeMillis() - 60000
    waveFiles.zipWithIndex.foreach { case (fs, i) =>
      fs.foreach(f => assert(f.setLastModified(base + i * 10000L), s"mtime $f"))
    }
    Streams.runWatermarkLagMonitor(spark, src, late, ckpt, maxFilesPerTrigger = 1)
    assert(new java.io.File(late).listFiles().count(_.getName.startsWith("b")) >= 3,
      "per-file triggers must produce one committed slice per wave")
    def row(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val streamed = row(Streams.watermarkLagSummary(spark, late))
    val batch = row(Events.watermarkLag(spark, dir))
    assert(streamed == batch,
      "cross-batch lateness percentiles must equal the batch recompute")
    // idempotent re-drain: same checkpoint, no new files → summary unchanged
    Streams.runWatermarkLagMonitor(spark, src, late, ckpt, maxFilesPerTrigger = 1)
    assert(row(Streams.watermarkLagSummary(spark, late)) == batch)
  }

  test("medallion soak: 4 event-time waves at sf0.1 — bounded dedup state, exactly-once emission") {
    val soak = Streams.dedupSoak(spark, "/root/testdata/sf0.1", "/tmp/graft_soak", waves = 4)
    assert(soak.size == 4)
    val total = graft.engine.Tables.events(spark, "/root/testdata/sf0.1").count()
    // exactly-once: every event emitted once despite the planted duplicate feeds
    assert(soak.last.nEmittedTotal == total, soak.mkString(", "))
    assert(soak.map(_.nInput).sum > total, "planted duplicates were actually fed")
    // emission is monotone per wave (file sink only appends)
    assert(soak.map(_.nEmittedTotal) == soak.map(_.nEmittedTotal).sorted)
    // bounded state: each wave's end-of-drain state is O(wave) — flat as the
    // corpus accumulates, never cumulative. 1.5x headroom covers the
    // sub-watermark carry-over between waves (2h of a ~7.5-day wave).
    val s1 = soak.head.stateRows
    assert(s1 > 0, s"no state observed: ${soak.head}")
    soak.foreach { w =>
      assert(w.stateRows <= (s1 * 3) / 2, s"state grew across waves: $w vs first $s1")
      assert(w.stateRows < total / 2, s"state tracks the corpus, not the wave: $w")
    }
  }

  test("streaming packing: wave manifest == batch q232 at the sealed-shard boundary, exactly-once re-drain") {
    val dir = "/root/testdata/sf0.001"
    val src = "/tmp/graft_stream_pack_src"
    val man = "/tmp/graft_stream_pack_man"
    val ckpt = "/tmp/graft_stream_pack_ckpt"
    Seq(src, man, ckpt).foreach(rmTree)
    val docs = graft.engine.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    // wave 1 = q232's at-rest corpus (doc_id % 10 != 7); wave 2 = its wave
    docs.filter(!(col("doc_id") % 10 === 7)).write.mode("append").parquet(src)
    Streams.runPackingStream(spark, src, man, ckpt)
    docs.filter(col("doc_id") % 10 === 7).write.mode("append").parquet(src)
    Streams.runPackingStream(spark, src, man, ckpt)

    def rows(path: String) = spark.read.parquet(path).orderBy("seq_id")
      .collect().map(_.toString).toSeq
    // replay parity: the drained wave slice is row-identical to the batch
    // incremental packer over the same corpus/wave split
    val batchForm = graft.ext.TextStats.incrementalPacking(spark, dir)
      .collect().map(_.toString).toSeq
    assert(rows(s"$man/b1") == batchForm,
      "streaming wave manifest must equal batch incrementalPacking")
    // sealed-shard append: wave seq ids start at the boundary AFTER the
    // corpus's last (possibly partial) sequence — manifests never overlap
    val corpusMax = spark.read.parquet(s"$man/b0")
      .agg(max(col("seq_id"))).collect()(0).getLong(0)
    val waveMin = spark.read.parquet(s"$man/b1")
      .agg(min(col("seq_id"))).collect()(0).getLong(0)
    assert(waveMin == corpusMax + 1, s"wave starts at $waveMin, corpus ends at $corpusMax")
    // every sequence is full except at most the last per wave
    Seq(s"$man/b0", s"$man/b1").foreach { p =>
      val seqs = spark.read.parquet(p).orderBy("seq_id").collect()
      assert(seqs.dropRight(1).forall(_.getAs[Long]("n_tokens") == 256L),
        s"non-final sequence short in $p")
    }
    // token conservation: manifest totals equal the doc-grain token counts
    val tokTotal = docs.select(org.apache.spark.sql.functions.sum(
      size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    val manTotal = spark.read.option("recursiveFileLookup", "true").parquet(man)
      .agg(org.apache.spark.sql.functions.sum(col("n_tokens")))
      .collect()(0).getLong(0)
    assert(manTotal == tokTotal, s"manifest tokens $manTotal != corpus $tokTotal")
    // idempotent re-drain: same checkpoint, no new files → manifest unchanged
    val before = rows(s"$man/b0") ++ rows(s"$man/b1")
    Streams.runPackingStream(spark, src, man, ckpt)
    assert(rows(s"$man/b0") ++ rows(s"$man/b1") == before)
  }

  test("streaming heavy-hitter candidates: MG state keeps the hot term, exact running n") {
    val s = spark; import s.implicits._
    val src = "/tmp/graft_stream_hh_src"
    rmTree(src)
    // 100 docs × (5 'hot' + 2 unique singletons) = 700 tokens, 201 distinct
    // terms against k=16 slots — constant evictions, yet 'hot' (freq 5/7 >
    // n/k) must survive in the candidate state
    def wave(ids: Range) = ids.map(i =>
      (i.toLong, "hot hot hot hot hot " + s"u${i}_a u${i}_b", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    wave(0 until 50).write.mode("append").parquet(src)
    wave(50 until 100).write.mode("append").parquet(src)
    Streams.runToMemory(
      Streams.heavyHitterCandidatesStream(spark, src, k = 16).toDF("candidates", "n"),
      "hh_out", org.apache.spark.sql.streaming.OutputMode.Update())
    val rows = spark.table("hh_out").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val (cands, n) = rows.maxBy(_._2) // the latest state has the largest n
    assert(n == 700L, "running total is exact regardless of evictions")
    assert(cands.split(" ").contains("hot"), "the >n/k term survives in state")
    assert(cands.split(" ").length <= 16, "state is bounded by k slots")
  }
}
