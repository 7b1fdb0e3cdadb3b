package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import graft.operators.Skew

/** Scale-posture specs: the plan-shape claims the engine makes for
  * 100 TB (salting correctness, bucketed co-located joins that skip
  * the shuffle, streaming watermark aggregation).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: row-equal to the plain join under a hot key") {
    // 10k rows, 90% share one hot key
    val big = (0 until 10000).map(i =>
        (if (i % 10 == 0) i.toLong % 7 else 999L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (5L, "c"))
      .toDF("k", "label")
    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, "k", 8, Seq("payload"))
    assertSameRows(plain.select("k", "payload", "label"),
      salted.select("k", "payload", "label"))
  }

  test("bucketed tables: co-located join plans without a shuffle") {
    val a = (0 until 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (0 until 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("bkt_b")
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 1000)
    spark.sql("DROP TABLE bkt_a")
    spark.sql("DROP TABLE bkt_b")
  }

  test("streaming: windowed counts with watermark over a rate-less source") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val counts = graft.streaming.Incremental.windowedCounts(
      events, "ts", "1 hour", "2 hours")
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((t(0, 10), "click", 1.0), (t(0, 20), "click", 2.0),
      (t(1, 5), "view", 3.0))
    q.processAllAvailable()
    // advance the watermark far enough to close the 00:00 window
    mem.addData((t(5, 0), "click", 1.0))
    q.processAllAvailable()
    mem.addData((t(6, 0), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("wc")
      .select(col("window.start").cast("string"), col("event_type"),
        col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.contains(("2024-01-01 00:00:00", "click", 2L)))
    q.stop()
  }

  test("native hll plan ships buffers through ONE exchange; declarative needs more") {
    val df = spark.range(1000).toDF("v")
    def exchanges(plan: String): Int =
      plan.linesIterator.count(_.trim.startsWith("+- Exchange")) +
        plan.linesIterator.count(_.trim.startsWith("Exchange"))
    val nativePlan = graft.operators.Sketches
      .hllRegistersNative(df, "v", 64)
      .queryExecution.executedPlan.toString
    val declarativePlan = graft.operators.Sketches
      .hllRegisters(df, "v", 64)
      .queryExecution.executedPlan.toString
    assert(exchanges(nativePlan) == 1,
      s"native path must shuffle exactly once (the buffer):\n$nativePlan")
    assert(exchanges(declarativePlan) > 1,
      s"declarative path pays the distinct+group exchanges:\n$declarativePlan")
  }

  test("grouped histogram quantiles: cumulative window is group-partitioned") {
    import spark.implicits._
    val df = spark.range(10000)
      .select((col("id") % 5).as("g"), col("id").as("v"))
    val plan = graft.operators.Sketches.histQuantilesByGroup(
        graft.operators.Sketches.histBinsByGroup(df, "g", "v",
          0L, 500L, 20), 0L, 500L, Seq(500))
      .queryExecution.executedPlan.toString
    // the global-quantile path accepts one SinglePartition window over
    // the ≤nBins sketch; the grouped path must not — its frames
    // partition on grp
    assert(!plan.contains("SinglePartition"),
      s"grouped cumulative window must partition on grp:\n$plan")
  }

  test("zoneMap pruning is sound: skipped zones hold no in-range rows") {
    import spark.implicits._
    val df = spark.range(1000).toDF("v")
    val zones = graft.operators.Layout.zoneMap(df, expr("v div 100"),
      Seq("v"))
    assert(zones.count() == 10L)
    val read = graft.operators.Layout
      .zonesToRead(zones, "v", lit(250), lit(420))
      .select("bucket").as[Long].collect().toSet
    assert(read == Set(2L, 3L, 4L), s"zones read: $read")
    // soundness: every bucket holding an in-range row was selected
    val holding = df.filter(col("v").between(250, 420))
      .select(expr("v div 100").as("b")).distinct()
      .as[Long].collect().toSet
    assert(holding.subsetOf(read))
  }

  test("compactionPlan: prefix-sum groups respect the target, oversized " +
      "files isolate, plan is per-partition") {
    import spark.implicits._
    val files = Seq(
      // grp 0: exclusive cumsums 0/300/600/900, all < 1000 — the
      // group overshoots by at most one file (documented contract)
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L), ("a", 4L, 300L),
      ("a", 5L, 5000L),                  // cum-pre 1200 → grp 1, alone
      ("a", 6L, 100L),                   // cum-pre 6200 → grp 6
      ("b", 1L, 100L), ("b", 2L, 100L)   // partition b packs alone
    ).toDF("part", "file_id", "bytes")
    val planned = graft.operators.Layout
      .compactionPlan(files, "part", "file_id", "bytes", 1000L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(planned(("a", 1L)) == 0L && planned(("a", 4L)) == 0L)
    // the oversized file gets a group no later file shares
    assert(planned(("a", 5L)) == 1L && planned(("a", 6L)) == 6L)
    assert(planned(("b", 1L)) == 0L && planned(("b", 2L)) == 0L)
    // stats: one row per coalesce task, byte totals exact
    val stats = graft.operators.Layout.compactionStats(
        graft.operators.Layout.compactionPlan(
          files, "part", "file_id", "bytes", 1000L),
        "part", "bytes")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(stats(("a", 0L)) == ((4L, 1200L)))
    assert(stats(("a", 1L)) == ((1L, 5000L)))
    assert(stats(("a", 6L)) == ((1L, 100L)))
    assert(stats(("b", 0L)) == ((2L, 200L)))
  }

  test("stream-static enrichment join agrees with the batch plan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "FR"), (2L, "DE"), (3L, "JP"))
      .toDF("user_id", "nation")
    val facts = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (9L, 1.0))
    val mem = MemoryStream[(Long, Double)]
    val stream = mem.toDF().toDF("user_id", "value")
    val q = graft.streaming.StreamOps
      .streamStaticEnrich(stream, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("sse")
      .outputMode("append").start()
    mem.addData(facts.take(2): _*)
    q.processAllAvailable()
    mem.addData(facts.drop(2): _*) // second batch re-resolves the dim
    q.processAllAvailable()
    val streamed = spark.table("sse")
    val batch = graft.streaming.StreamOps.streamStaticEnrich(
      facts.toDF("user_id", "value"), dim, Seq("user_id"))
    // user 9 has no dim row: inner join drops it on both sides
    assert(streamed.count() == 3L)
    assertSameRows(streamed, batch)
    q.stop()
  }

  test("streaming sessions (flatMapGroupsWithState) agree with the batch shape") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // two users, sessions split by a 2h inactivity gap; fed in event-
    // time order (batches split at index 6) — with a 0s watermark
    // delay, an event older than a previous batch's max would be
    // dropped as late, which is watermark semantics, not a bug
    val data = Seq(
      (1L, t(1, 0)), (1L, t(1, 1)), (1L, t(1, 2)),   // u1 session A (3)
      (2L, t(1, 5)),                                 // u2 session A (1)
      (1L, t(1, 10)), (1L, t(1, 11)),                // u1 session B (2)
      (2L, t(2, 0)), (2L, t(2, 1)))                  // u2 session B (2)
    val gapUs = 2L * 3600 * 1000000
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
    val sessions = graft.streaming.Sessionize.streamingSessions(
      events, "user_id", "ts", gapUs)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // feed in two batches, then advance the watermark past every gap
    mem.addData(data.take(6): _*)
    q.processAllAvailable()
    mem.addData(data.drop(6): _*)
    q.processAllAvailable()
    mem.addData((99L, t(20, 0)))
    q.processAllAvailable()
    mem.addData((99L, t(25, 0))) // second advance so the timeout fires
    q.processAllAvailable()
    val streamed = spark.table("sess")
      .filter(col("key") =!= 99L)
      .select("key", "session_start_us", "session_end_us", "n_events")
    val batch = graft.streaming.Sessionize.batchSessions(
        data.toDF("user_id", "ts").withColumn("event_id", lit(0L)),
        "user_id", "ts", "event_id", gapUs)
      .select(col("user_id").as("key"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
    assertSameRows(streamed, batch)
    assert(streamed.count() == 4)
    q.stop()
  }

  test("file-source stream: checkpoint restart resumes where it stopped; " +
      "ledger merge + sessions + interval-left stay batch-equal") {
    // the real-checkpoint integration pass: streamWithLedger through
    // an on-disk parquet source, run TWICE against the same
    // checkpoint with new files landing in between — a kill/resume.
    // Proofs: (1) the resumed run reads ONLY the new file (offsets
    // survived), (2) the idempotent merge drops a replayed event,
    // (3) sessionization and a left-outer interval join over the
    // streamed table equal the same pipeline over the logical input.
    val work = Files.createTempDirectory("graft-restart")
    val srcDir = work.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = work.resolve("ckpt").toString
    val resultDir = work.resolve("result").toString
    def t(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val a = Seq((1L, 1L, t(1, 0)), (2L, 1L, t(1, 1)), (3L, 2L, t(1, 5)))
    val b = Seq((3L, 2L, t(1, 5)), // replayed duplicate — merge drops it
      (4L, 1L, t(1, 10)), (5L, 1L, t(1, 11)), (6L, 2L, t(2, 0)))
    val schema = a.toDF("event_id", "user_id", "ts").schema
    var rowsPerBatch = Seq.empty[Long]
    def ingest(): Unit = {
      val q = graft.streaming.Incremental.streamWithLedger(
        spark, srcDir.toString, schema, Seq("event_id"), ckpt) {
        (batch, _) =>
          rowsPerBatch = rowsPerBatch :+ batch.count()
          val fs = new org.apache.hadoop.fs.Path(resultDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val existing =
            if (fs.exists(new org.apache.hadoop.fs.Path(resultDir)))
              spark.read.parquet(resultDir)
            else spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](),
              batch.schema)
          graft.sources.Sinks.atomicOverwrite(
            graft.operators.Merge
              .insertIfAbsent(existing, batch, Seq("event_id"))
              .localCheckpoint(),
            resultDir)
          ()
      }
      q.awaitTermination()
    }
    a.toDF("event_id", "user_id", "ts").coalesce(1)
      .write.mode("append").parquet(srcDir.toString)
    ingest() // run 1 consumes file A
    assert(rowsPerBatch.sum == 3, s"run 1 saw $rowsPerBatch")
    assert(spark.read.parquet(resultDir).count() == 3)
    b.toDF("event_id", "user_id", "ts").coalesce(1)
      .write.mode("append").parquet(srcDir.toString)
    ingest() // run 2: a fresh query on the SAME checkpoint (restart)
    // offsets survived: the resumed run read only file B's 4 rows —
    // a cold start would have re-read all 7
    assert(rowsPerBatch.sum == 7, s"restart re-read files: $rowsPerBatch")
    val ingested = spark.read.parquet(resultDir)
    assert(ingested.count() == 6, "replayed event_id 3 must merge away")
    // downstream parity: sessions + interval-left over the streamed
    // table == the same pipeline over the logical (deduped) input
    val logical = (a ++ b).toDF("event_id", "user_id", "ts")
      .dropDuplicates("event_id")
    val gapUs = 2L * 3600 * 1000000
    def pipeline(ev: org.apache.spark.sql.DataFrame) = {
      val sessions = graft.streaming.Sessionize
        .batchSessions(ev, "user_id", "ts", "event_id", gapUs)
      val promos = Seq((1L, t(1, 1)), (2L, t(2, 2)), (9L, t(1, 3)))
        .toDF("user_id", "promo_ts")
      graft.streaming.StreamOps.intervalJoinLeft(
        promos, ev.select(col("user_id"), col("ts")),
        "user_id", "promo_ts", "ts", "2 hours")
    }
    assertSameRows(pipeline(ingested), pipeline(logical))
    // u1 sessions split on the >2h gap, u2 on the day gap
    assert(graft.streaming.Sessionize
      .batchSessions(ingested, "user_id", "ts", "event_id", gapUs)
      .count() == 4)
  }

  test("streaming funnel attainments match the batch funnel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val data = Seq(
      (1L, "view", t(1, 0)), (1L, "click", t(2, 0)),
      (1L, "purchase", t(3, 0)),                     // full funnel
      (2L, "click", t(0, 30)), (2L, "view", t(1, 0)),
      (2L, "click", t(1, 0)),                        // same-ts click: no
      (3L, "purchase", t(0, 10)),                    // never views
      (4L, "view", t(5, 0)), (4L, "purchase", t(6, 0))) // skips click
    val stages = Seq("view", "click", "purchase")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = mem.toDF().toDF("user_id", "event_type", "ts")
    val hits = graft.streaming.Sessionize.streamingFunnel(
      stream, "user_id", "event_type", "ts", stages)
    val q = hits.writeStream.format("memory").queryName("fhits")
      .outputMode("append").start()
    mem.addData(data.take(5): _*)
    q.processAllAvailable()
    mem.addData(data.drop(5): _*)
    q.processAllAvailable()
    val streamed = spark.table("fhits")
      .as[(Long, Int, Long)].collect().toSet
    // batch funnel, unpivoted to (user, stage, ts_us)
    val batch = graft.streaming.Sessionize
      .funnel(data.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", stages)
      .collect().flatMap { r =>
        (0 until 3).flatMap { i =>
          Option(r.get(1 + i)).map(ts =>
            (r.getLong(0), i,
              ts.asInstanceOf[java.sql.Timestamp].getTime * 1000L))
        }
      }.toSet
    assert(streamed == batch,
      s"streamed $streamed\nbatch $batch")
    q.stop()
  }

  test("funnel: strict stage ordering, drop-outs keep nulls") {
    val ev = Seq(
      // user 1 completes: view@10 -> click@20 -> buy@30
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2 clicks BEFORE viewing; the click at the same instant
      // as the view must not count (strict >) -> stalls at view
      (2L, "click", 5L), (2L, "view", 8L), (2L, "click", 8L),
      // user 3 never views: excluded entirely despite purchasing
      (3L, "purchase", 9L),
      // user 4 views then buys with no click: stalls after view
      (4L, "view", 1L), (4L, "purchase", 2L)
    ).toDF("u", "et", "ts")
    val r = graft.streaming.Sessionize
      .funnel(ev, "u", "et", "ts", Seq("view", "click", "purchase"))
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r == Map(
      1L -> ((10L, Some(20L), Some(30L))),
      2L -> ((8L, None, None)),
      4L -> ((1L, None, None))))
  }

  test("snapshot diff classifies adds, removals, null-safe changes") {
    val before = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("d"))).toDF("k", "v")
    val after = Seq((1L, Some("a")), (2L, Some("B")), (3L, Some("c")),
      (5L, Some("e"))).toDF("k", "v")
    val r = graft.operators.Constraints
      .snapshotDiff(before, after, Seq("k"), Seq("v"))
      .as[(String, Long)].collect().toMap
    // 1 unchanged; 2 changed; 3 NULL->c must count as changed;
    // 4 removed; 5 added
    assert(r == Map("unchanged" -> 1L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("quarantine: clean/reject split is exact, reasons name every " +
      "broken rule, null FK values are exempt") {
    import graft.operators.Constraints._
    val parent = Seq(10L, 20L).toDF("pk")
    val df = Seq(
      (1L, Some(50.0), Some("O"), Some(10L)),   // clean
      (2L, Some(500.0), Some("O"), Some(10L)),  // range
      (3L, Some(50.0), Some("X"), Some(99L)),   // domain + fk
      (4L, Some(50.0), Some("F"), None),        // clean: null FK exempt
      (5L, None, None, Some(20L)))              // range(null) + domain(null)
      .toDF("id", "price", "status", "ref")
    val rules = Seq(RowInRange("price", 1, 100),
      RowInSet("status", Seq("O", "F")), RowFk("ref", parent, "pk"))
    val (good, rejects) = quarantine(df, rules)
    assert(good.select("id").as[Long].collect().toSet == Set(1L, 4L))
    assert(!good.columns.contains("violations"))
    val why = rejects.select($"id", $"violations")
      .as[(Long, Seq[String])].collect().toMap
    assert(why(2L) == Seq("range:price"))
    assert(why(3L).toSet == Set("domain:status", "fk:ref"))
    assert(why(5L).toSet == Set("range:price", "domain:status"))
    // enforce keeps every input row exactly once
    assert(good.count() + rejects.count() == 5L)
  }

  test("quarantine RowInRange: a NON-CASTABLE value is a violation, " +
      "not a silent pass through a NULL predicate") {
    import graft.operators.Constraints._
    // the CSV-sourced shape: the range column arrives as STRING and a
    // corrupt cell ('abc') casts to NULL — before round 8 the whole
    // range predicate evaluated NULL and the row sailed through CLEAN
    val df = Seq((1L, "50"), (2L, "abc"), (3L, "500"), (4L, null))
      .toDF("id", "price")
    val (good, rejects) = quarantine(df,
      Seq(RowInRange("price", 1, 100)))
    assert(good.select("id").as[Long].collect().toSet == Set(1L))
    val why = rejects.select($"id", $"violations")
      .as[(Long, Seq[String])].collect().toMap
    assert(why(2L) == Seq("range:price"),
      "uncastable must count as a range violation")
    assert(why(3L) == Seq("range:price"))
    assert(why(4L) == Seq("range:price"))
  }

  test("rate anomalies: integer form flags exactly mean + 2 sigma exceeders") {
    // series A: hours with counts 1,1,1,1,11 — mean 3, sigma 4
    // → threshold 11: NOT flagged (strict >); bump to 12: flagged.
    val mk = (series: String, hour: Int, n: Int) =>
      (0 until n).map(i => (series,
        java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:${i % 60}%02d")))
    // series a: 4 ones + one x sits EXACTLY at mean + 2 sigma for
    // every x (max z of one outlier among n-1 constants is
    // sqrt(n-1) = 2 at n=5) — the strict > must exclude it:
    // (11*5-15)^2 = 1600 == 4*(5*125-225).
    val events = (mk("a", 0, 1) ++ mk("a", 1, 1) ++ mk("a", 2, 1) ++
      mk("a", 3, 1) ++ mk("a", 4, 11)).toDF("series", "ts")
    val r = graft.operators.Temporal
      .rateAnomalies(events, "series", "ts")
      .select("series", "c").as[(String, Long)].collect().toSeq
    assert(r.isEmpty)
    // series c: 3,4,3,4,3,20 — dev = 20*6-37 = 83, 83^2 = 6889 >
    // 4*(6*459-37^2) = 5540 → flagged; the 4-count hours have
    // dev < 0 and stay out.
    val events2 = (mk("c", 0, 3) ++ mk("c", 1, 4) ++ mk("c", 2, 3) ++
      mk("c", 3, 4) ++ mk("c", 4, 3) ++ mk("c", 5, 20))
      .toDF("series", "ts")
    val r2 = graft.operators.Temporal
      .rateAnomalies(events2, "series", "ts")
      .select("series", "c").as[(String, Long)].collect().toSeq
    assert(r2 == Seq(("c", 20L)))
  }

  test("ivfTopKWith over trained centroids matches brute force on probed lists") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = graft.operators.Similarity
      .kmeansCentroids(emb, "vec_id", "embedding", 4, 1, 64)
    val q = emb.filter(col("vec_id") === 1)
      .select(col("embedding").as("qvec"))
    val got = graft.operators.Similarity
      .ivfTopKWith(emb, "vec_id", "embedding", q, cents, 4, 5)
      .select("vec_id").as[Long].collect().toSeq
    // probing ALL lists makes IVF exact — must equal brute force
    val brute = graft.operators.Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == brute)
    assert(got.contains(1L)) // the query vector itself is its own top hit
  }

  test("bitextMarginMine demotes the hub raw cosine would pick") {
    // right-side vector h is the cosine top-1 for BOTH anchors (a
    // hub); margin normalizes by neighborhood density, so each anchor
    // mines its true sparse-neighborhood pair instead
    val left = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),          // a1
      (2L, Seq(0.6f, 0.8f, 0f, 0f)))      // a2
      .toDF("vec_id", "embedding")
    val right = Seq(
      (1L, Seq(0.95f, 0.37f, 0f, 0f)),    // hub: top cosine for both
      (3L, Seq(0.92f, 0f, 0.39f, 0f)),    // t1: a1's true pair
      (5L, Seq(0.1f, 0.95f, 0f, 0.3f)))   // t2: a2's true pair
      .toDF("vec_id", "embedding")
    // the hub really is cosine-top-1 for both anchors
    val rawTop = graft.operators.Similarity.batchTopK(right, "vec_id",
        "embedding",
        left.select(col("vec_id").as("qid"),
          col("embedding").as("qvec")), 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    assert(rawTop == Map(0L -> 1L, 2L -> 1L))
    val mined = graft.operators.Similarity
      .bitextMarginMine(left, right, "vec_id", "embedding",
        k = 2, minMargin = 1.02)
      .select("left_id", "right_id").as[(Long, Long)]
      .collect().toMap
    assert(mined == Map(0L -> 3L, 2L -> 5L))
  }

  test("bitextMarginMine on identical sides mines every twin") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(20)
    val mined = graft.operators.Similarity
      .bitextMarginMine(emb, emb, "vec_id", "embedding",
        k = 4, minMargin = 1.0)
      .select("left_id", "right_id", "cosine")
      .as[(Long, Long, Double)].collect()
    // every anchor's best-margin candidate is itself (cos = 1, and
    // dividing by the sub-1 neighborhood average lifts margin > 1)
    assert(mined.length == 20)
    assert(mined.forall { case (l, r, c) =>
      l == r && math.abs(c - 1.0) < 1e-9 })
  }

  test("ivfRecallCurve: monotone in nProbe and exact at full probe") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val curve = graft.operators.Similarity
      .ivfRecallCurve(emb, "vec_id", "embedding", qs,
        nCentroids = 4, maxProbe = 4, k = 5)
      .orderBy("nprobe")
      .select("nprobe", "hits", "total", "recall_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(curve.map(_._1) == Seq(1L, 2L, 3L, 4L))
    // recall can only grow as more lists are probed
    assert(curve.map(_._4) == curve.map(_._4).sorted)
    // probing ALL lists is brute force: recall must be 1000
    assert(curve.last._4 == 1000L && curve.last._2 == curve.last._3)
  }

  test("bqRecallCurve: monotone in radius and exact at the full " +
      "64-bit radius") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val curve = graft.operators.Similarity
      .bqRecallCurve(emb, "vec_id", "embedding", qs,
        maxRadius = 64, k = 5)
      .orderBy("radius")
      .select("radius", "hits", "total", "recall_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(curve.map(_._1) == (0L to 64L))
    // widening the Hamming radius only admits more candidates
    assert(curve.map(_._4) == curve.map(_._4).sorted)
    // radius 64 admits the whole corpus: recall must be 1000
    assert(curve.last._4 == 1000L && curve.last._2 == curve.last._3)
  }

  test("weightedReservoirSample: exact size, deterministic, weight-" +
      "monotone inclusion, fail-fast on non-positive weights") {
    import graft.operators.Curation
    val rows = (1 to 200).map(i =>
      (i.toLong, if (i == 7) 1000000L else 1L)).toDF("id", "w")
    def ids(salt: String) = Curation
      .weightedReservoirSample(rows, "id", "w", 20, salt)
      .select("id").as[Long].collect().toSet
    val a = ids("s1")
    assert(a.size == 20)
    assert(a == ids("s1"), "same salt must select the same rows")
    // the 1e6-weight row wins a slot under every salt (its priority
    // ln(u)/w is ~1e6 closer to 0 than any unit-weight row's)
    Seq("s1", "s2", "s3").foreach(s => assert(ids(s).contains(7L)))
    assert(ids("s2") != a || ids("s3") != a,
      "different salts should reshuffle the unit-weight rows")
    val err = intercept[Exception] {
      Seq((1L, 0L)).toDF("id", "w").transform(df =>
        Curation.weightedReservoirSample(df, "id", "w", 1, "x"))
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("tokenizerFertility: integer rate law on hand counts") {
    import graft.operators.TextAnalysis
    // lang a: 30 toks / 60 chars (500 milli); lang b: 10 / 40 (250);
    // corpus: 40 / 100 (400 milli). premiums: 500000/400=1250,
    // 250000/400=625
    val enc = Seq(
      ("a", 10L, 20L), ("a", 20L, 40L), ("b", 10L, 40L))
      .toDF("lang", "n_toks", "n_chars")
    val got = TextAnalysis
      .tokenizerFertility(enc, "lang", "n_toks", "n_chars")
      .orderBy("lang")
      .select("lang", "n_toks", "n_chars", "fertility_milli",
        "premium_milli")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 30L, 60L, 500L, 1250L),
      ("b", 10L, 40L, 250L, 625L)), got)
  }

  test("columnEntropy: constant column scores 0 with share 1000, " +
      "uniform scores ~ln k, nulls are counted out of the mass") {
    import graft.operators.Constraints
    val df = (0 until 64).map(i => (
      "const",
      s"u${i % 8}",                       // uniform over 8 values
      if (i % 4 == 0) null else "x"       // 16 nulls
    )).toDF("c_const", "c_unif", "c_null")
    val got = Constraints
      .columnEntropy(df, Seq("c_const", "c_unif", "c_null"))
      .orderBy("col_name")
      .select("col_name", "n_rows", "n_null", "n_distinct",
        "entropy_micro", "top_share_milli")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("c_const") ==
      (("c_const", 64L, 0L, 1L, 0L, 1000L)), got("c_const"))
    val unif = got("c_unif")
    // ln 8 = 2.0794; micro-floored arithmetic lands within 2 micro
    assert(unif._4 == 8L &&
      math.abs(unif._5 - 2079441L) <= 2L, unif.toString)
    val nul = got("c_null")
    assert(nul._2 == 48L && nul._3 == 16L && nul._4 == 1L &&
      nul._5 == 0L, nul.toString)
  }

  test("skewReport ranks hot keys with exact integer shares") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // key 7 owns 50 of 100 rows, key 1 owns 30, the rest 20 singles
    val rows = (Seq.fill(50)(7L) ++ Seq.fill(30)(1L) ++
      (100L until 120L)).toDF("k")
    val r = graft.operators.Skew.skewReport(rows, "k", 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((7L, 50L, 500L), (1L, 30L, 300L), (100L, 1L, 10L)))
  }

  test("table fingerprint is row-order/partitioning invariant and change-sensitive") {
    val rows = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    val fp = graft.operators.Constraints
      .tableFingerprint(rows, Seq(col("k"), col("s")))
    val shuffled = graft.operators.Constraints.tableFingerprint(
      rows.orderBy(rand()).repartition(7), Seq(col("k"), col("s")))
    assertSameRows(fp, shuffled)
    val changed = graft.operators.Constraints.tableFingerprint(
      rows.withColumn("s",
        when(col("k") === 500, lit("CHANGED")).otherwise(col("s"))),
      Seq(col("k"), col("s")))
    assert(fp.collect().head != changed.collect().head)
  }

  test("cooccurrenceLift: a degenerate basket is dropped whole, " +
      "stats stay consistent on the survivors") {
    // three normal 2-item baskets of {10,11} plus one bot basket of
    // 500 items — without the cap that basket alone contributes
    // 500·499/2 pairs; with maxBasket=100 it must vanish ENTIRELY
    // (from N and the item totals too, not just the pair join)
    val normal = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L))
    val bot = (0L until 500L).map(i => (99L, 1000L + i))
    val rows = (normal ++ bot).toDF("basket", "item")
    val capped = graft.operators.Graph
      .cooccurrenceLift(rows, "basket", "item", 1, maxBasket = 100)
      .as[(Long, Long, Long, Long)].collect()
    // only the (10,11) pair survives; N=3 baskets → lift 1000 milli,
    // proving the bot basket was excluded from the denominator too
    assert(capped.toSeq == Seq((10L, 11L, 3L, 1000L)))
    // and the uncapped default still sees the bot pairs
    assert(graft.operators.Graph
      .cooccurrenceLift(rows, "basket", "item", 1).count() ==
      1L + 500L * 499L / 2L)
  }

  test("cooccurrenceLift collect_set caveat: skewReport is the " +
      "documented upstream tool and it finds the degenerate key") {
    // the maxBasket cap bounds PAIR fan-out, but a dropped basket's
    // distinct-item set still crosses one collect_set buffer
    // (Graph.scala caveat) — the documented hygiene path is to find
    // such keys upstream with degrees/skewReport and drop them
    // BEFORE the groupBy. Pin that the pointer actually works: the
    // bot basket must top the report with its exact share.
    val normal = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
    val bot = (0L until 996L).map(i => (99L, 1000L + i))
    val rows = (normal ++ bot).toDF("basket", "item")
    val top = Skew.skewReport(rows, "basket", 3)
      .as[(Long, Long, Long)].collect()
    assert(top.head == (99L, 996L, 996L),
      s"bot basket must lead the skew report: ${top.toSeq}")
    // dropping the reported key upstream leaves a basket table whose
    // largest collect_set buffer is bounded by the honest baskets
    val hygienic = rows.join(
        Skew.skewReport(rows, "basket", 1)
          .filter(col("n") > 100).select("basket"),
        Seq("basket"), "left_anti")
      .groupBy("basket").agg(collect_set(col("item")).as("items"))
    assert(hygienic.select(max(size(col("items")))).collect()(0)
      .getInt(0) == 2)
  }

  test("bqBatchTopK at adversarial radius: the salted two-stage rank " +
      "is exact vs batchTopK and bounds the per-query window") {
    import graft.operators.Similarity
    val dim = 8
    def vec(i: Int): Array[Float] = Array.tabulate(dim)(j =>
      math.sin(i * 31 + j * 7).toFloat)
    val corpus = (0 until 2000).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val qs = Seq((100L, vec(3)), (101L, vec(500)), (102L, vec(1234)))
      .toDF("qid", "qvec")
    // maxHamming=64 admits the WHOLE corpus as candidates for every
    // query — the adversarial radius the round-7 verdict flagged. The
    // final rank is exact cosine, so the result must equal the brute
    // batched top-k exactly even through the salt rung.
    val got = Similarity.bqBatchTopK(corpus, "vec_id", "embedding",
      qs, "qid", maxHamming = 64, k = 5)
    val want = Similarity.batchTopK(corpus, "vec_id", "embedding", qs, 5)
    assertSameRows(want.select("qid", "vec_id"),
      got.select("qid", "vec_id"))
    // plan shape: TWO ranking windows — the (qid, salt) rung caps the
    // rows entering the final per-qid window at SALTS·k, so no single
    // sort buffer ever holds the whole admitted candidate set
    val plan = got.queryExecution.executedPlan.toString
    val windows = "row_number".r.findAllIn(plan).length
    assert(windows >= 2,
      s"expected the salt rung + final rank (2 windows):\n$plan")
  }

  test("ivfTopKBatch equals a per-query ivfTopKWith loop — per-qid " +
      "windows change nothing for each query alone") {
    import graft.operators.Similarity
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val qids = Seq(0L, 1L, 2L)
    val qs = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Similarity.ivfTopKBatch(emb, "vec_id", "embedding",
        qs, cents, 3, 5)
      .select("qid", "vec_id", "cosine")
    val looped = qids.map { q =>
      Similarity.ivfTopKWith(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") === q)
            .select(col("embedding").as("qvec")),
          cents, 3, 5)
        .select(lit(q).as("qid"), col("vec_id"), col("cosine"))
    }.reduce(_ unionByName _)
    assertSameRows(batch, looped)
  }

  test("ppjoinCandidates: the aggregated positional bound rejects a " +
      "length-compatible candidate the per-match bound keeps, and " +
      "never a qualifying pair") {
    import graft.operators.Dedup
    // Hand-built prefix table (id, shingle, n_sh, __pos). Pair (A,B):
    // n_a=10, n_b=12, tau=0.5 -> overlap floor 22*(0.5/1.5)-1 = 6.33.
    // Matches at (1,1) and (6,7): the FIRST-match bound (what the
    // verify stage previously shipped sets on) is 1+min(9,11)=10 ->
    // keep; the aggregated bound pm=2 + min(10-6, 12-7) = 6 < 6.33 ->
    // reject before any set is shipped. Pair (C,D) is a near-twin
    // (pm=5 early matches) and must survive.
    val prefix = Seq(
      ("A", "x", 10L, 1), ("A", "y", 10L, 6),
      ("B", "x", 12L, 1), ("B", "y", 12L, 7),
      ("C", "p1", 10L, 1), ("C", "p2", 10L, 2), ("C", "p3", 10L, 3),
      ("C", "p4", 10L, 4), ("C", "p5", 10L, 5),
      ("D", "p1", 10L, 1), ("D", "p2", 10L, 2), ("D", "p3", 10L, 3),
      ("D", "p4", 10L, 4), ("D", "p5", 10L, 5)
    ).toDF("id", "shingle", "n_sh", "__pos")
    val loose = Dedup.ppjoinCandidates(prefix, 0.5,
      positionalBound = false).collect().map(r => (r.getString(0),
      r.getString(1))).toSet
    val tight = Dedup.ppjoinCandidates(prefix, 0.5,
      positionalBound = true).collect().map(r => (r.getString(0),
      r.getString(1))).toSet
    assert(loose == Set(("A", "B"), ("C", "D")), s"loose: $loose")
    assert(tight == Set(("C", "D")),
      s"aggregated bound must drop (A,B) and keep (C,D): $tight")
  }

  test("prefixFilterJaccardPairs still matches brute force with the " +
      "aggregated candidate bound in the plan") {
    import graft.operators.Dedup
    // 40 docs over a small vocab: heavy overlap groups + singletons
    val docs = (0 until 40).map { i =>
      val words =
        if (i % 7 == 0) Seq("alpha", "beta", "gamma", "delta",
          "epsilon", "zeta", s"tail$i")
        else Seq(s"w${i}a", s"w${i}b", "alpha", s"w${i}c", s"w${i}d",
          s"w${i}e", s"w${i}f")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
      n = 2, threshold = 0.5)
    // brute force: all-pairs 2-shingle jaccard
    val sh = docs.select(col("doc_id").as("id"),
      explode(array_distinct(org.apache.spark.sql.functions
        .call_function("graft_shingles",
          graft.functions.tokens(col("text")), lit(2)))).as("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val brute = sh.select(col("id").as("id_a"), col("s"))
      .join(sh.select(col("id").as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")),
        Seq("id_b"))
      .filter(col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")).cast("double")
        >= 0.5)
    assertSameRows(brute.select("id_a", "id_b"),
      got.select("id_a", "id_b"))
  }

  test("epochShuffle: positions are an exact bijection 0..N-1 in " +
      "global salted-hash order; different epochs decorrelate") {
    import graft.operators.Sharding
    import org.apache.spark.sql.functions._
    val df = (0 until 257).map(i => s"doc$i").toDF("id")
    val got = Sharding.epochShuffle(df, "id", 1, 7)
      .select("id", "pos").orderBy("pos")
      .as[(String, Long)].collect()
    assert(got.map(_._2).toList == (0L until 257L).toList,
      "positions must be exactly 0..N-1")
    val expect = df.select(col("id"),
        graft.functions.hash31(concat(lit("ep1:"), col("id"))).as("h"))
      .orderBy("h", "id").as[(String, Long)].collect().map(_._1).toList
    assert(got.map(_._1).toList == expect,
      "bucketed prefix-sum order must equal the global hash sort")
    val e2 = Sharding.epochShuffle(df, "id", 2, 7)
      .select("id", "pos").orderBy("pos")
      .as[(String, Long)].collect().map(_._1).toList
    assert(e2 != got.map(_._1).toList, "epochs must permute differently")
    assert(e2.sorted == expect.sorted, "epoch 2 is still a bijection")
  }

  test("correlatedSample: join of per-table samples equals the " +
      "hash filter of the full join (AQUA join-synopsis law)") {
    import graft.operators.Curation
    import org.apache.spark.sql.functions._
    val orders = (0 until 400)
      .map(i => (i.toLong, i.toLong % 83, i.toLong * 7 % 101))
      .toDF("o_id", "cust", "price")
    val cust = (0L until 83L).map(c => (c, s"seg${c % 5}"))
      .toDF("cust", "seg")
    val sampled = Curation
      .correlatedSample(orders, "cust", 10, 3)
      .join(Curation.correlatedSample(cust, "cust", 10, 3), Seq("cust"))
    val filteredJoin = orders.join(cust, Seq("cust"))
      .filter(graft.functions.hashBucket(col("cust"), 10, "csamp") < 3)
    assertSameRows(sampled.select("cust", "o_id", "price", "seg"),
      filteredJoin.select("cust", "o_id", "price", "seg"))
    assert(sampled.count() > 0, "the 30% key sample must be non-empty")
  }

  test("tagByDomainBlocklist: registrable-suffix semantics — " +
      "longest entry wins, substring hosts don't match, " +
      "case/port/userinfo stripped, unparseable url is clean") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "https://a.b.example.com/x"),
      (2L, "https://notexample.com/"),
      (3L, "https://EXAMPLE.com:8080/p"),
      (4L, "https://user:pw@bad.org/x"),
      (5L, "not a url"),
      (6L, "https://deep.sub.bad.org/")
    ).toDF("id", "url")
    val got = TextAnalysis.tagByDomainBlocklist(df, "id", "url",
        Seq("example.com", "bad.org", "sub.bad.org"))
      .select("id", "host", "blocked_by").orderBy("id")
      .as[(Long, String, Option[String])].collect().toList
    assert(got == List(
      (1L, "a.b.example.com", Some("example.com")),
      (2L, "notexample.com", None),
      (3L, "example.com", Some("example.com")),
      (4L, "bad.org", Some("bad.org")),
      (5L, "", None),
      (6L, "deep.sub.bad.org", Some("sub.bad.org"))), got.toString)
  }

  test("winnowFingerprints: any shared run of >= w+k-1 tokens " +
      "shares a selected fingerprint; short docs still fingerprint; " +
      "selection density is the ~2/(w+1) regime") {
    import graft.operators.Dedup
    val common = (0 until 12).map(i => s"shared$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha beta gamma delta $common tail one two"),
      (2L, s"zig zag $common completely different ending here"),
      (3L, "tiny doc of five tokens"),
      (4L, "solo text nothing in common with others at all ok")
    ).toDF("id", "text")
    // k=4, w=5: guarantee threshold w+k-1 = 8 <= 12 shared tokens
    val fp = Dedup.winnowFingerprints(df, "id", "text", 4, 5)
    val byDoc = fp.select("id", "fp_hash").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "docs sharing a 12-token run must share a fingerprint")
    assert((byDoc(4L) & byDoc(1L)).isEmpty &&
      (byDoc(4L) & byDoc(2L)).isEmpty,
      "no shared grams, no shared fingerprints")
    // 5 tokens -> 2 shingles < w=5: the partial-window fallback fires
    assert(byDoc(3L).nonEmpty,
      "a doc shorter than w shingles still emits its min")
    val nShingles1 = 20 - 3 // doc 1 has 20 tokens -> 17 4-gram shingles
    assert(byDoc(1L).size <= nShingles1 / 2 + 1,
      s"winnowing must select a small fraction, got ${byDoc(1L).size}")
  }

  test("scoreBucketsByGroup: equal-mass terciles within each group, " +
      "equal scores share a bucket, singleton group is bucket 0") {
    import graft.operators.TextAnalysis
    val rows =
      (0 until 90).map(i => ("big", i.toLong, s"d$i")) ++
      Seq(("tie", 5L, "t1"), ("tie", 5L, "t2"), ("tie", 5L, "t3"),
        ("tie", 9L, "t4"), ("solo", 42L, "s1"))
    val got = TextAnalysis.scoreBucketsByGroup(
        rows.toDF("g", "score", "id"), "g", "score", 3)
      .select("g", "id", "bucket").as[(String, String, Long)]
      .collect()
    val big = got.filter(_._1 == "big").groupBy(_._3)
      .map { case (b, v) => b -> v.size }
    assert(big == Map(0L -> 30, 1L -> 30, 2L -> 30),
      s"90 distinct scores must cut 30/30/30: $big")
    val tie = got.filter(_._1 == "tie").map(t => t._2 -> t._3).toMap
    assert(tie("t1") == tie("t2") && tie("t2") == tie("t3"),
      s"equal scores must share a bucket: $tie")
    assert(tie("t4") == 2L, s"the strict max of 4 ranks to the top: $tie")
    assert(got.filter(_._1 == "solo").head._3 == 0L,
      "singleton group sits in bucket 0")
  }

  test("winnowPairs: full recall on long verbatim overlaps; the " +
      "bucket cap drops boilerplate fingerprints, not matches") {
    import graft.operators.Dedup
    val common = (0 until 15).map(i => s"run$i").mkString(" ")
    val boiler = "standard footer text appears everywhere always"
    val df = Seq(
      (1L, s"intro one $common outro alpha"),
      (2L, s"other beginning $common different close beta"),
      (3L, s"unrelated content entirely $boiler"),
      (4L, s"more unrelated material here $boiler"),
      (5L, "nothing shared with anything else at all whatsoever")
    ).toDF("id", "text")
    val fp = Dedup.winnowFingerprints(df, "id", "text", 4, 5)
    val pairs = Dedup.winnowPairs(fp, "id", 2, 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      s"15-token shared run must pair (guarantee threshold 8): $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      s"disjoint doc must not pair: $pairs")
    // cap 1: every fingerprint shared by 2+ docs is dropped -> no pairs
    val capped = Dedup.winnowPairs(fp, "id", 1, 1)
      .as[(Long, Long, Long)].collect()
    assert(capped.isEmpty, s"cap 1 must drop all shared buckets: " +
      capped.mkString(","))
  }

  test("linkPairs: nulls carry zero evidence, the two-threshold " +
      "band classifies exactly, oversize blocks drop via the cap") {
    import graft.operators.Linkage
    val df = Seq(
      (1L, "b1", "ann", Some("x")),   // 1-2: name+tag agree = 5000
      (2L, "b1", "ann", Some("x")),
      (3L, "b1", "ann", None),        // 1-3: name agrees, tag null = 4000
      (4L, "b1", "bob", Some("x")),   // 1-4: name dis, tag agree = -500
      (5L, "b2", "eve", Some("y")),   // other block: no cross pairs
      (6L, "b2", "eve", Some("z"))    // 5-6: 4000 - 1000 = 3000
    ).toDF("id", "blk", "name", "tag")
    val got = Linkage.linkPairs(df, "id", "blk",
        Seq(("name", 4000L, -1500L), ("tag", 1000L, -1000L)),
        upperMilli = 4500L, lowerMilli = 0L)
      .select("id_a", "id_b", "score_milli", "verdict")
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got((1L, 2L)) == ((5000L, "match")))
    assert(got((1L, 3L)) == ((4000L, "possible")),
      "null field must contribute zero, not disagreement")
    assert(got((1L, 4L)) == ((-500L, "non_match")))
    assert(got((5L, 6L)) == ((3000L, "possible")))
    assert(!got.contains((1L, 5L)) && !got.contains((4L, 6L)),
      "cross-block pairs must not exist")
    val capped = Linkage.linkPairs(df, "id", "blk",
      Seq(("name", 1L, -1L)), 1L, 0L, maxBlock = 3)
      .collect()
    // block b1 has 4 rows > cap 3; only b2's single pair survives
    assert(capped.length == 1, s"cap must drop block b1: " +
      capped.mkString(","))
  }

  test("concentrationReport: monopoly scores 10^6 micro, uniform " +
      "over 4 groups scores 250000, head share exact") {
    import graft.operators.Curation
    val mono = (1 to 50).map(i => ("only", i)).toDF("src", "i")
    val m = Curation.concentrationReport(mono, "src")
      .select("n_groups", "n_docs", "top_share_milli", "hhi_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(m == ((1L, 50L, 1000L, 1000000L)), m.toString)
    val unif = (0 until 80).map(i => (s"s${i % 4}", i)).toDF("src", "i")
    val u = Curation.concentrationReport(unif, "src")
      .select("n_groups", "n_docs", "top_share_milli", "hhi_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(u == ((4L, 80L, 250L, 250000L)), u.toString)
  }

  test("softDedupWeights: cluster mass sums to ~1000 per distinct " +
      "unit, singletons keep full weight, every doc survives") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    val all = (1L to 10L).toDF("id")
    val clusters = Seq( // cluster A: 4 copies, cluster B: 2 copies
      (1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
      (5L, "B"), (6L, "B")).toDF("id", "cid")
    val got = Dedup.softDedupWeights(all, clusters, "id", "cid")
      .select("id", "cluster_size", "weight_milli")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 10, "every doc survives")
    assert(got.filter(_._2 == 4L).forall(_._3 == 250L))
    assert(got.filter(_._2 == 2L).forall(_._3 == 500L))
    assert(got.filter(_._1 > 6L).forall(r => r._2 == 1L && r._3 == 1000L))
    // floor law: a cluster past 1000 members keeps weight 1 milli
    // (1000 div size alone would zero it and break the samplers)
    val bigAll = (1L to 1200L).toDF("id")
    val bigClusters = bigAll.withColumn("cid", lit("BIG"))
    val floorW = Dedup.softDedupWeights(bigAll, bigClusters, "id", "cid")
      .agg(min(col("weight_milli")), max(col("weight_milli")))
      .as[(Long, Long)].head()
    assert(floorW == ((1L, 1L)), floorW.toString)
    // mass conservation: 4*250 + 2*500 + 4*1000 = 6000 = 6 units
    assert(got.map(_._3).sum == 6000L)
  }

  test("hits: a pure star makes the center the sole authority and " +
      "the leaves equal hubs; scores stay on the integer Scale") {
    import graft.operators.Graph
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val got = Graph.hits(edges, "src", "dst", iters = 2)
      .orderBy("node")
      .as[(Long, Long, Long)].collect().toSeq
    val third = Graph.Scale / 3
    assert(got == Seq(
      (0L, Graph.Scale, 0L),
      (1L, 0L, third), (2L, 0L, third), (3L, 0L, third)), got.toString)
  }

  test("kCore: a clique survives its own degree, pendant chains " +
      "peel away in cascading rounds, and k above the clique " +
      "empties the graph") {
    import graft.operators.Graph
    // K4 clique (1..4) + a pendant chain 4-5-6-7: the chain peels
    // one link per round under k=2 (5 survives round 1 via 6, dies
    // round 2, ...) — the cascade the synchronous peel must follow
    val edges = (for (a <- 1L to 4L; b <- (a + 1) to 4L)
        yield (a, b)) ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val df = edges.toDF("src", "dst")
    val core2 = Graph.kCore(df, "src", "dst", k = 2, rounds = 8)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core2 == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)),
      s"2-core must be exactly the clique: $core2")
    // k=3: same fixpoint (each clique node has deg 3 inside it)
    val core3 = Graph.kCore(df, "src", "dst", k = 3, rounds = 8)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core3.map(_._1) == Seq(1L, 2L, 3L, 4L), core3.toString)
    // k=4 exceeds the clique's internal degree: nothing survives
    assert(Graph.kCore(df, "src", "dst", k = 4).count() == 0L)
    // truncation honesty: ONE round at k=2 only strips the then-
    // degree-1 leaf (7); the chain's next link is still in
    val r1 = Graph.kCore(df, "src", "dst", k = 2, rounds = 1)
      .select("node").as[Long].collect().toSet
    assert(r1 == Set(1L, 2L, 3L, 4L, 5L, 6L),
      s"round-1 truncation must keep the not-yet-cascaded chain: $r1")
  }

  test("excessLossWeights: only above-corpus-rate domains carry " +
      "weight, shares are exact floors, and a flat corpus falls " +
      "back to uniform") {
    import graft.operators.Curation
    // lang a: 100 units, 200k milli-loss (rate 2000)
    // lang b: 100 units, 100k milli-loss (rate 1000)
    // corpus: 300k / 200 = 1500 -> excess a=500, b=0
    val rows = Seq(
      ("a", 60L, 120000L), ("a", 40L, 80000L),
      ("b", 50L, 50000L), ("b", 50L, 50000L))
      .toDF("lang", "units", "loss_milli")
    val got = Curation.excessLossWeights(rows, "lang", "units",
        "loss_milli")
      .orderBy("lang").as[(String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("a", 100L, 2000L, 500L, 1000L),
      ("b", 100L, 1000L, 0L, 0L)), got.toString)
    // flat corpus: every rate equals the corpus rate -> no excess
    // anywhere -> uniform fallback shares
    val flat = Seq(("a", 10L, 10000L), ("b", 30L, 30000L),
        ("c", 60L, 60000L))
      .toDF("lang", "units", "loss_milli")
    val gotF = Curation.excessLossWeights(flat, "lang", "units",
        "loss_milli")
      .orderBy("lang").as[(String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(gotF.map(r => (r._1, r._5)) ==
      Seq(("a", 333L), ("b", 333L), ("c", 333L)), gotF.toString)
  }

  test("lengthBucketedBatches: same-bin docs batch together in " +
      "length order, partial tails report honestly, pad share exact") {
    import graft.operators.Sharding
    // bin 0 (len < 4): lengths 1,2,3,3 -> batch0 = [1,2] pad (2*2-3)/4,
    // batch1 = [3,3] pad 0; bin 1: single doc 5 -> partial batch
    val rows = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("id", "n")
    val got = Sharding.lengthBucketedBatches(rows, "id", "n", 4L, 2)
      .orderBy("bin", "batch_in_bin")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 2L, 3L, 250L),
      (0L, 1L, 2L, 3L, 6L, 0L),
      (1L, 0L, 1L, 5L, 5L, 0L)), got.toString)
  }

  test("kAnonymityReport: worst class sets k, homogeneous sensitive " +
      "values trip l even in a large class, milli shares exact") {
    import graft.operators.Constraints
    // class (a,x): 4 rows, all same sensitive -> k-safe at 3, l=1
    // class (a,y): 2 rows, 2 values -> below k=3
    // class (b,x): 3 rows, 3 values -> clean
    val rows = Seq(
      ("a", "x", "s1"), ("a", "x", "s1"), ("a", "x", "s1"),
      ("a", "x", "s1"),
      ("a", "y", "s1"), ("a", "y", "s2"),
      ("b", "x", "s1"), ("b", "x", "s2"), ("b", "x", "s3"))
      .toDF("q1", "q2", "sens")
    val r = Constraints.kAnonymityReport(rows, Seq("q1", "q2"),
        "sens", 3L, 2L)
      .select("n_rows", "n_classes", "k_anonymity", "rows_below_k",
        "l_diversity", "rows_below_l", "below_k_milli", "below_l_milli")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((9L, 3L, 2L, 2L, 1L, 4L, 222L, 444L)), r.toString)
    val v = Constraints.kAnonymityViolations(rows, Seq("q1", "q2"),
        "sens", 3L, 2L)
      .as[(String, String, Long, Long)].collect().toSet
    assert(v == Set(("a", "x", 4L, 1L), ("a", "y", 2L, 2L)), v.toString)
  }

  test("linkPairsBy lev1: a one-char typo scores as agreement; " +
      "sequential low-entropy keys are the documented trap") {
    import graft.operators.Linkage
    val df = Seq(
      (1L, "b", "kxq93f", "p1"), (2L, "b", "kxq93fx", "p1"), // typo pair
      (3L, "b", "cust001", "p2"), (4L, "b", "cust002", "p3") // trap pair
    ).toDF("id", "blk", "name", "tag")
    val got = Linkage.linkPairsBy(df, "id", "blk",
        Seq(("name", "lev1", 3000L, -1000L), ("tag", "exact", 500L, -500L)),
        upperMilli = 3000L, lowerMilli = 0L)
      .select("id_a", "id_b", "score_milli", "verdict")
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got((1L, 2L)) == ((3500L, "match")),
      s"lev1 must absorb the single typo: $got")
    // distance-1 DISTINCT entities also 'agree' on name — the
    // low-entropy-key trap: fuzzy comparators need distinctive fields
    assert(got((3L, 4L)) == ((2500L, "possible")),
      s"sequential ids fire the fuzzy comparator (by design): $got")
    assert(got((1L, 3L))._2 == "non_match", got.toString)
  }

  test("neighborJaccard: twin leaves of a star score 1000 with " +
      "is_edge 0, linked near-twins keep their edge flag, and the " +
      "threshold prunes the diffuse tail") {
    import graft.operators.Graph
    // 1 and 2 both link only to {0}: twins, not linked themselves.
    // 3 and 4 link to {0, each other}: linked near-twins.
    val canonical = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (3L, 4L))
      .toDF("u", "v")
    val got = Graph.neighborJaccard(canonical, minMilli = 100L)
      .select("a", "b", "common", "jaccard_milli", "is_edge")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    // (1,2): N={0} vs {0} -> 1/1 = 1000, no edge
    assert(got.contains((1L, 2L, 1L, 1000L, 0L)), got.toString)
    // (3,4): N(3)={0,4}, N(4)={0,3} -> common {0} =1, union 3 -> 333, edge
    assert(got.contains((3L, 4L, 1L, 333L, 1L)), got.toString)
    // every surviving pair respects the threshold
    assert(got.forall(_._4 >= 100L), got.toString)
    // a high threshold keeps only the perfect twins
    val strict = Graph.neighborJaccard(canonical, minMilli = 1000L)
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(strict == Seq((1L, 2L)), strict.toString)
  }

  test("madOutliers: lower medians pick exactly, the 3-MAD rule " +
      "flags the spike, and MAD 0 degenerates to any-deviation") {
    import graft.operators.Temporal
    val rows = Seq(
      // series b: med 3.0, MAD 1.0 -> only the 100.0 spike crosses 3-MAD
      ("b", 1L, 1.0), ("b", 2L, 2.0), ("b", 3L, 3.0),
      ("b", 4L, 4.0), ("b", 5L, 5.0), ("b", 6L, 100.0),
      // series a: over half identical -> MAD 0, nonzero dev flags
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0),
      ("a", 4L, 10.0), ("a", 5L, 50.0),
      // series c: negative center, MAD 0 again
      ("c", 1L, -5.0), ("c", 2L, -5.0), ("c", 3L, -5.0),
      ("c", 4L, 10.0))
      .toDF("series", "id", "value")
    val got = Temporal.madOutliers(rows, "series", "id", "value")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().toSeq.sorted
    assert(got == Seq(
      ("a", 5L, 50000000L, 10000000L, 0L, 40000000L),
      ("b", 6L, 100000000L, 3000000L, 1000000L, 97000000L),
      ("c", 4L, 10000000L, -5000000L, 0L, 15000000L)), got.toString)
  }

  test("neymanAllocate: variance-heavy strata out-draw their head " +
      "count, zero-variance strata get nothing, remainders go to " +
      "the largest fraction") {
    import graft.operators.Curation
    val rows = Seq(("a", 0L), ("a", 10L),
      ("b", 5L), ("b", 5L), ("b", 5L),
      ("c", 0L), ("c", 20L)).toDF("grp", "v")
    val got = Curation.neymanAllocate(rows, "grp", "v", 10L)
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    // w_a = floor(sqrt(2*100/1)*1000) = 14142, w_b = 0 (no spread),
    // w_c = floor(sqrt(2*400/1)*1000) = 28284; floors 3/0/6, the one
    // leftover goes to c (largest remainder) -> 3/0/7
    assert(got == Seq(("a", 2L, 14142L, 3L), ("b", 3L, 0L, 0L),
      ("c", 2L, 28284L, 7L)), got.toString)
  }

  test("giniIndex: uniform mass scores 0, monopoly scores (n-1)/n, " +
      "and the textbook 1..4 case lands on 250 milli") {
    import graft.operators.Curation
    def g(xs: Seq[Long]): (Long, Long, Long) =
      Curation.giniIndex(xs.toDF("m"), "m")
        .as[(Long, Long, Long)].head()
    assert(g(Seq(5L, 5L, 5L, 5L)) == ((4L, 20L, 0L)))
    // one holder of everything among n=4: G = (n-1)/n = 0.75
    assert(g(Seq(0L, 0L, 0L, 10L)) == ((4L, 10L, 750L)))
    assert(g(Seq(4L, 2L, 1L, 3L)) == ((4L, 10L, 250L)))
  }

  test("quantileNormalize maps every group onto the pooled marginal " +
      "and unequal group sizes hit the pooled max at their top rank") {
    import graft.operators.Curation
    val even = Seq(("g1", 1L, 10L), ("g1", 2L, 20L),
      ("g2", 3L, 30L), ("g2", 4L, 40L)).toDF("grp", "id", "v")
    val gotEven = Curation.quantileNormalize(even, "grp", "id", "v")
      .select("id", "norm").as[(Long, Long)].collect().toMap
    // pooled [10,20,30,40]; both groups map rank 1 -> ordinal 2,
    // rank 2 -> ordinal 4: identical marginals {20, 40}
    assert(gotEven == Map(1L -> 20L, 2L -> 40L, 3L -> 20L,
      4L -> 40L), gotEven.toString)
    val uneven = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 4L, 100L)).toDF("grp", "id", "v")
    val gotUneven = Curation.quantileNormalize(uneven, "grp", "id", "v")
      .select("id", "norm").as[(Long, Long)].collect().toMap
    // a: ceil(4/3)=2 -> 2, ceil(8/3)=3 -> 3, ceil(12/3)=4 -> 100;
    // b's single row is its own max -> pooled max 100
    assert(gotUneven == Map(1L -> 2L, 2L -> 3L, 3L -> 100L,
      4L -> 100L), gotUneven.toString)
  }

  test("cusumDrift: the reflection form replays the recursive fold " +
      "exactly, resets absorb at zero, and only crossings alarm") {
    import graft.operators.Temporal
    import java.sql.Timestamp
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:0$i:00")
    // ref 10: y = [2,3,-2,5,6,-5] -> S = [2,5,3,8,14,9]
    val rows = Seq(12.0, 13.0, 8.0, 15.0, 16.0, 5.0).zipWithIndex
      .map { case (v, i) => ("a", (i + 1).toLong, t(i + 1), v) }
      .toDF("series", "id", "ts", "value")
    val got = Temporal.cusumDrift(rows, "series", "id", "ts", "value",
        10000000L, 7000000L)
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq(
      ("a", 4L, 15000000L, 8000000L),
      ("a", 5L, 16000000L, 14000000L),
      ("a", 6L, 5000000L, 9000000L)), got.toString)
    // a run below ref absorbs at zero (max(0, .) law), then the
    // jump alarms with no debt carried from the quiet stretch
    val reset = Seq(5.0, 6.0, 20.0).zipWithIndex
      .map { case (v, i) => ("b", (i + 1).toLong, t(i + 1), v) }
      .toDF("series", "id", "ts", "value")
    val g2 = Temporal.cusumDrift(reset, "series", "id", "ts", "value",
        10000000L, 9000000L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(g2 == Seq(("b", 3L, 20000000L, 10000000L)), g2.toString)
  }

  test("labelPropagation: bridged triangles collapse to two " +
      "communities, and the synchronous two-cycle on a lone edge is " +
      "the documented truncation") {
    import graft.operators.Graph
    // two triangles {0,1,2} and {3,4,5} joined by the bridge 2-3
    val tri = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 4L), (3L, 5L), (4L, 5L), (2L, 3L)).toDF("u", "v")
    val got = Graph.labelPropagation(tri, rounds = 4)
      .as[(Long, Long)].collect().toMap
    // hand-replayed sync rounds: the left triangle settles on 0,
    // the right on 2 (the bridge keeps pulling 3 leftward labels,
    // its triangle majority overrules them)
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 2L, 4L -> 2L, 5L -> 2L), got.toString)
    // a lone edge two-cycles under synchronous updates: even round
    // counts return the identity labeling — deterministic honesty,
    // not nontermination
    val pair = Seq((0L, 1L)).toDF("u", "v")
    val even = Graph.labelPropagation(pair, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(even == Map(0L -> 0L, 1L -> 1L), even.toString)
    val odd = Graph.labelPropagation(pair, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(odd == Map(0L -> 1L, 1L -> 0L), odd.toString)
  }

  test("modularityOf: bridged triangles score 5/14 exactly, and a " +
      "singleton-per-node labeling goes negative") {
    import graft.operators.Graph
    val tri = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 4L), (3L, 5L), (4L, 5L), (2L, 3L)).toDF("u", "v")
    val labels = Seq(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 2L, 4L -> 2L, 5L -> 2L).toDF("node", "community")
    val q = Graph.modularityOf(tri, labels)
      .as[(Long, Long, Long)].head()
    // m=7, each community: e_c=3, d_c=7 -> Q = 5/14 -> 357 milli
    assert(q == ((7L, 2L, 357L)), q.toString)
    // one edge, each endpoint its own community: Q = -1/2
    val lone = Seq((0L, 1L)).toDF("u", "v")
    val selfLabels = Seq(0L -> 0L, 1L -> 1L).toDF("node", "community")
    val neg = Graph.modularityOf(lone, selfLabels)
      .as[(Long, Long, Long)].head()
    assert(neg == ((1L, 2L, -500L)), neg.toString)
  }

  test("evalRanking: the documented milli laws hold exactly, a " +
      "hitless query reports zeros, and ranks past the cutoff are " +
      "invisible") {
    import graft.operators.Retrieval
    // q1: rel {a,b,c}; run hits a@1, b@3 -> R=3, hits=2
    //   recall = 2000/3 = 666; mrr = 1000/1 = 1000
    //   ap terms: (1000*1)//1=1000, (1000*2)//3=666 -> (1666)//3=555
    // q2: rel {z}; run has no z in top-k -> zeros with n_rel=1
    val run = Seq(
      ("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 3),
      ("q2", "m", 1), ("q2", "z", 9))
      .toDF("qid", "id", "rank")
    val qrels = Seq(("q1", "a"), ("q1", "b"), ("q1", "c"), ("q2", "z"))
      .toDF("qid", "id")
    val got = Retrieval.evalRanking(run, qrels, "qid", "id", "rank", 5)
      .orderBy("qid")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("q1", 3L, 2L, 666L, 1000L, 555L),
      ("q2", 1L, 0L, 0L, 0L, 0L)), got.toString)
    // raising the cutoff lets q2's rank-9 hit in: mrr 1000//9=111,
    // ap = ((1000*1)//9) // min(1,10) = 111
    val wide = Retrieval.evalRanking(run, qrels, "qid", "id", "rank", 10)
      .filter(col("qid") === "q2")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(wide == (("q2", 1L, 1L, 1000L, 111L, 111L)), wide.toString)
  }

  test("resampleOhlc: open/close follow the (ts, tie) pick exactly " +
      "on shared timestamps, extrema and counts are per-bucket, and " +
      "the plan is one aggregation") {
    import graft.operators.Temporal
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 10:55:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-01-01 11:10:00")
    val df = Seq(
      ("s", ts0, 5.0, 2L), ("s", ts0, 9.0, 1L), // tie: id 1 opens
      ("s", ts1, 1.0, 3L),
      ("s", ts2, 4.0, 4L))
      .toDF("series", "ts", "value", "id")
    val got = Temporal.resampleOhlc(df, "series", "ts", "value", "id")
      .orderBy("bucket")
      .select("open", "high", "low", "close", "n")
      .as[(Double, Double, Double, Double, Long)].collect().toSeq
    assert(got == Seq((9.0, 9.0, 1.0, 1.0, 3L), (4.0, 4.0, 4.0, 4.0, 1L)),
      got.toString)
    val plan = Temporal
      .resampleOhlc(df, "series", "ts", "value", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no window over the data")
  }
}
