package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Merge
import graft.streaming.Incremental

/** The §2.9 idempotency contract: re-running any merge with the same
  * batch is a no-op (run-twice == run-once). Checked over seeded
  * random inputs (poor-man property testing: 20 seeds per law) plus
  * hand-written edge cases.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def randFrame(seed: Int, n: Int): DataFrame = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(_ =>
        (rng.nextInt(20).toLong, rng.nextInt(5).toString, rng.nextInt(100)))
      .toDF("k", "cat", "v")
      .dropDuplicates("k")
  }

  test("upsertByKey: run-twice == run-once, over 20 seeds") {
    for (seed <- 0 until 20) {
      val existing = randFrame(seed, 15)
      val updates = randFrame(seed + 1000, 8)
      val once = Merge.upsertByKey(existing, updates, Seq("k"))
      val twice = Merge.upsertByKey(once, updates, Seq("k"))
      assertSameRows(once, twice)
    }
  }

  test("upsertByKey: update rows win, unmatched rows insert") {
    val existing = Seq((1L, "a", 1), (2L, "b", 2)).toDF("k", "cat", "v")
    val updates = Seq((2L, "B", 20), (3L, "c", 3)).toDF("k", "cat", "v")
    val out = Merge.upsertByKey(existing, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 1), (2L, "B", 20), (3L, "c", 3)))
  }

  test("insertIfAbsent: run-twice == run-once, over 20 seeds") {
    for (seed <- 20 until 40) {
      val existing = randFrame(seed, 15)
      val inserts = randFrame(seed + 2000, 8)
      val once = Merge.insertIfAbsent(existing, inserts, Seq("k"))
      val twice = Merge.insertIfAbsent(once, inserts, Seq("k"))
      assertSameRows(once, twice)
    }
  }

  test("insertIfAbsent: existing rows never change") {
    val existing = Seq((1L, "a", 1)).toDF("k", "cat", "v")
    val inserts = Seq((1L, "CLOBBER", 99), (2L, "b", 2)).toDF("k", "cat", "v")
    val out = Merge.insertIfAbsent(existing, inserts, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("deleteByKeys: idempotent and exact") {
    for (seed <- 40 until 50) {
      val target = randFrame(seed, 20)
      val tomb = randFrame(seed + 3000, 6)
      val once = Merge.deleteByKeys(target, tomb, Seq("k"))
      val twice = Merge.deleteByKeys(once, tomb, Seq("k"))
      assertSameRows(once, twice)
      assert(once.join(tomb.select("k"), Seq("k"), "left_semi").count() == 0)
    }
  }

  test("upsertPartial: null update values keep existing; new keys insert") {
    val existing = Seq((1L, "n1", "s1"), (2L, "n2", "s2"))
      .toDF("k", "name", "seg")
    val updates = Seq((2L, Option.empty[String], Some("S2X")),
        (9L, Some("n9"), Option.empty[String]))
      .toDF("k", "name", "seg")
    val out = Merge.upsertPartial(existing, updates, Seq("k"),
        Seq("name", "seg"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, "n1", "s1"), (2L, "n2", "S2X"),
      (9L, "n9", null)))
  }

  test("keepReferenced: drops rows missing from any parent") {
    val target = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("a", "b")
    val pa = Seq(Tuple1(1L), Tuple1(2L)).toDF("pa")
    val pb = Seq(Tuple1(10L), Tuple1(30L)).toDF("pb")
    val out = Merge.keepReferenced(target,
        Seq((pa, "a", "pa"), (pb, "b", "pb")))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L))
  }

  test("inheritBackfill: only null child fields inherit") {
    val child = Seq((1L, null.asInstanceOf[String]), (2L, "own"))
      .toDF("k", "f")
    val parent = Seq((1L, "inh1"), (2L, "inh2")).toDF("pk", "pf")
    val out = Merge.inheritBackfill(child, parent, "k", "pk",
        Map("f" -> "pf"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "inh1"), (2L, "own")))
  }

  test("exceptByKey: set difference") {
    val l = Seq(1L, 2L, 3L).toDF("k")
    val r = Seq(2L).toDF("k")
    assert(Merge.exceptByKey(l, r, Seq("k")).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 3L))
  }

  test("asofJoin: latest right row at-or-before each left ts, else null") {
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val probes = Seq((1L, t(0)), (1L, t(5)), (1L, t(10)), (2L, t(5)))
      .toDF("k", "pts")
    val states = Seq((1L, t(2), "a"), (1L, t(5), "b"), (1L, t(9), "c"))
      .toDF("k", "sts", "v")
    val out = graft.operators.Temporal
      .asofJoin(probes, states, "k", "pts", "sts", Seq("v"))
      .select("k", "pts", "v")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getHours,
        r.getString(2))).sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq(
      (1L, 0, null),   // before any state
      (1L, 5, "b"),    // equal ts matches (inclusive)
      (1L, 10, "c"),   // latest earlier state wins
      (2L, 5, null)))  // key with no states at all
  }

  test("bucketedRangeJoin: row-equal to the naive containment join") {
    val rng = new scala.util.Random(7)
    val points = (0 until 300).map(_ => Tuple1(rng.nextInt(10000).toLong))
      .toDF("p")
    val intervals = (0 until 40).map { i =>
      val s = rng.nextInt(9000).toLong
      (i.toLong, s, s + rng.nextInt(800).toLong)
    }.toDF("iv_id", "lo", "hi")
    val naive = points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .select("p", "iv_id")
    val bucketed = graft.operators.Temporal
      .bucketedRangeJoin(points, intervals, "p", "lo", "hi", 256L)
      .select("p", "iv_id")
    assertSameRows(naive, bucketed)
  }

  test("Incremental.run: second run processes nothing") {
    val input = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val ledger0 = Seq(Tuple1(1L)).toDF("k")
    val (res1, ledger1) = Incremental.run(input, ledger0, Seq("k"))(identity)
    assert(res1.count() == 2)
    assert(ledger1.count() == 3)
    val (res2, ledger2) = Incremental.run(input, ledger1, Seq("k"))(identity)
    assert(res2.count() == 0)
    assert(ledger2.count() == 3)
  }

  test("scd2Intervals compresses runs and chains validity (null-safe)") {
    val changes = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"),      // duplicate run compresses
      (1L, 30L, "b"), (1L, 40L, null),     // change to b, then to null
      (1L, 50L, null),                     // null run compresses too
      (1L, 60L, "a"),                      // back to a (new interval)
      (2L, 15L, "x"))                      // second key independent
      .toDF("k", "ts", "v")
    val out = Merge.scd2Intervals(changes, Seq("k"), "ts", "ts", "v")
      .select("k", "ts", "v", "valid_from", "valid_to")
      .as[(Long, Long, Option[String], Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._4)).toSeq
    assert(out == Seq(
      (1L, 10L, Some("a"), 10L, Some(30L)),
      (1L, 30L, Some("b"), 30L, Some(40L)),
      (1L, 40L, None, 40L, Some(60L)),
      (1L, 60L, Some("a"), 60L, None),
      (2L, 15L, Some("x"), 15L, None)))
  }

  test("saltedJoin is row-equal to the plain join") {
    val big = (1 to 500).map(i => (i.toLong % 7, i.toLong))
      .toDF("key", "payload")
    val small = Seq((0L, "z"), (1L, "o"), (2L, "t"), (6L, "s"))
      .toDF("key", "name")
    val salted = graft.operators.Skew
      .saltedJoin(big, small, "key", 8, Seq("payload"))
    assertSameRows(salted, big.join(small, Seq("key")))
  }

  test("applyChangeLog: latest wins, inserts land, deletes drop; idempotent") {
    import org.apache.spark.sql.functions._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "B1", "U", 10L), (2L, "B2", "U", 20L), // latest U wins
      (3L, "x", "D", 10L),                        // delete
      (4L, "d", "U", 10L),                        // insert new key
      (5L, "e", "U", 10L), (5L, "x", "D", 20L)    // insert then delete
    ).toDF("k", "v", "op", "ts")
    val once = graft.operators.Merge
      .applyChangeLog(base, changes, Seq("k"), "ts", "op")
    assert(once.as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "B2"), (4L, "d")))
    // re-applying the same log to the result changes nothing
    val twice = graft.operators.Merge
      .applyChangeLog(once, changes, Seq("k"), "ts", "op")
    assertSameRows(once, twice)
  }

  test("changeLogFromSnapshots round-trips: apply(derive(old, new), old) == new") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val neu = Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val log = graft.operators.Merge
      .changeLogFromSnapshots(old, neu, Seq("k"))
    val ops = log.select("k", "op").as[(Long, String)].collect().toMap
    assert(ops == Map(1L -> "D", 2L -> "U", 4L -> "I"), ops) // 3 unchanged
    assertSameRows(
      graft.operators.Merge.applyChangeLog(old, log, Seq("k"), "ts", "op"),
      neu)
    // identical snapshots derive an empty log
    assert(graft.operators.Merge
      .changeLogFromSnapshots(old, old, Seq("k")).count() == 0L)
  }

  test("changeLogFromSnapshots: key column need not lead the schema") {
    // (v, k) layout — a positional rename would swap key and value
    // and classify everything as I/D garbage
    val old = Seq(("a", 1L), ("b", 2L)).toDF("v", "k")
    val neu = Seq(("a", 1L), ("B", 2L), ("c", 3L)).toDF("v", "k")
    val log = graft.operators.Merge
      .changeLogFromSnapshots(old, neu, Seq("k"))
    val ops = log.select("k", "op").as[(Long, String)].collect().toMap
    assert(ops == Map(2L -> "U", 3L -> "I"), ops)
    assertSameRows(
      graft.operators.Merge.applyChangeLog(old, log, Seq("k"), "ts", "op")
        .select("v", "k"),
      neu)
  }

  test("signedAggState: insert ⊕ retract == state of survivors; zeroed groups vanish") {
    val all = Seq((1L, "a", 1.5), (2L, "a", 2.5), (3L, "b", 3.5),
      (4L, "b", 0.5)).toDF("id", "k", "v")
    val dels = all.filter($"id" === 2L || $"id" === 3L)
    val survivors = all.filter($"id" === 1L || $"id" === 4L)
    val merged = Incremental.mergeSignedAggStates(Seq(
      Incremental.signedAggState(all, Seq("k"), "v", 1),
      Incremental.signedAggState(dels, Seq("k"), "v", -1)), Seq("k"))
    assertSameRows(merged,
      Incremental.signedAggState(survivors, Seq("k"), "v", 1))
    // retracting every 'b' row removes the group from the view
    val allB = all.filter($"k" === "b")
    val gone = Incremental.mergeSignedAggStates(Seq(
      Incremental.signedAggState(all, Seq("k"), "v", 1),
      Incremental.signedAggState(allB, Seq("k"), "v", -1)), Seq("k"))
    assert(gone.filter($"k" === "b").count() == 0L)
    assert(gone.count() == 1L)
  }

  test("ewma: constant series stays put, a spike decays by halves") {
    val series = Seq(
      ("c", 1L, 4.0), ("c", 2L, 4.0), ("c", 3L, 4.0),   // constant
      ("s", 1L, 0.0), ("s", 2L, 8.0), ("s", 3L, 0.0),   // spike
      ("s", 4L, 0.0)).toDF("k", "o", "x")
    val out = graft.operators.Temporal.ewma(series, "k", "o", "x", 0.5)
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("c", 0L)) == 4.0 && out(("c", 2L)) == 4.0, out)
    // seed 0, then 0*.5+8*.5=4, 4*.5=2, 2*.5=1 — exact halving
    assert(out(("s", 1L)) == 4.0 && out(("s", 2L)) == 2.0 &&
      out(("s", 3L)) == 1.0, out)
  }

  test("forwardFill: leading nulls stay, later nulls take the last value") {
    val v = Seq((1L, 1L, null.asInstanceOf[java.lang.Long]),
      (1L, 2L, java.lang.Long.valueOf(7L)),
      (1L, 3L, null.asInstanceOf[java.lang.Long]),
      (1L, 4L, java.lang.Long.valueOf(9L)),
      (1L, 5L, null.asInstanceOf[java.lang.Long]))
      .toDF("k", "ts", "v")
    val filled = graft.operators.Temporal
      .forwardFill(v, "k", "ts", "ts", "v")
      .select("ts", "v_filled")
      .as[(Long, Option[Long])].collect().toMap
    assert(filled == Map(1L -> None, 2L -> Some(7L), 3L -> Some(7L),
      4L -> Some(9L), 5L -> Some(9L)), filled)
  }

  test("coalesceIntervals: overlap and touch merge, gaps split spans") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap → one span
      (1L, 20L, 30L),                 // touches (equal endpoint) → merges
      (1L, 40L, 50L),                 // gap → new span
      (2L, 0L, 5L)).toDF("k", "s", "e")
    val spans = graft.operators.Temporal
      .coalesceIntervals(iv, "k", "s", "e")
      .select("k", "span", "s", "e", "n_intervals")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans == Set(
      (1L, 1L, 0L, 30L, 3L),
      (1L, 2L, 40L, 50L, 1L),
      (2L, 1L, 0L, 5L, 1L)), spans)
  }

  test("joinDelta: old view ∪ delta == full rebuild (insert-only IVM law)") {
    // keys overlap across old/delta on BOTH sides so every delta term
    // (ΔA⋈B, A⋈ΔB, ΔA⋈ΔB) is non-empty
    val oldA = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val dA = Seq((2L, "a3"), (3L, "a4")).toDF("k", "av")
    val oldB = Seq((1L, "b1"), (3L, "b2")).toDF("k", "bv")
    val dB = Seq((2L, "b3"), (3L, "b4")).toDF("k", "bv")
    val delta = Incremental.joinDelta(oldA, dA, oldB, dB, Seq("k"))
    val oldView = oldA.join(oldB, Seq("k"))
    val rebuilt = oldA.unionByName(dA)
      .join(oldB.unionByName(dB), Seq("k"))
    assertSameRows(oldView.unionByName(delta), rebuilt)
    // empty deltas produce an empty view delta
    val empty = Incremental.joinDelta(oldA, dA.limit(0), oldB,
      dB.limit(0), Seq("k"))
    assert(empty.count() == 0L)
  }
}
