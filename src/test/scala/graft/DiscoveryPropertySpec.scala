package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the K1 batch-discovery kernel over random
  * small logs — the adversarial complement to the golden replays (which pin
  * two real logs) and PmKernelSpec (hand-picked branches). Each property is
  * a structural truth of the reference semantics (batch_detection.R +
  * discovery.py raw-label mapping) that must hold for EVERY input:
  *
  *   1. event preservation — discovery annotates, never drops/duplicates;
  *   2. batch well-formedness — ≥2 distinct cases (min_batch_instance_size),
  *      single (activity, resource) per task batch, known type label;
  *   3. canonical renumbering — batch ids are dense 1..N (W8);
  *   4. input-order invariance — shuffling input rows changes nothing
  *      (all internal orderings are total; at cluster scale partition order
  *      is arbitrary, so this is the distributed-correctness property).
  *
  * Times sit on a small grid so the generator actually produces the hard
  * collisions (simultaneous, abutting, overlapping, equal-end). Seeded:
  * a failure reproduces by its printed sample index.
  */
class DiscoveryPropertySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def randomLog(rnd: scala.util.Random): List[(Long, Long, String, String, Long, Long, Long)] = {
    val nCases = 1 + rnd.nextInt(6)
    (for {
      c <- 1 to nCases
      e <- 1 to (1 + rnd.nextInt(3))
    } yield (c, e)).zipWithIndex.map { case ((c, _), i) =>
      val start = rnd.nextInt(9) * 100L
      val dur = (1 + rnd.nextInt(4)) * 100L
      (i.toLong + 1, c.toLong,
        if (rnd.nextBoolean()) "A" else "B",
        s"r${rnd.nextInt(2)}",
        start, start + dur, math.max(0L, start - 50L))
    }.toList
  }

  private def toDf(rows: List[(Long, Long, String, String, Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "case_id", "activity", "resource", "start_us", "end_us", "enabled_us")
  }

  test("discovery invariants hold on random logs; output is input-order invariant") {
    val rnd = new scala.util.Random(20260813L)
    for (sample <- 1 to 8) {
      val rows = randomLog(rnd)
      def clue(msg: String) = s"[sample $sample] $msg (log: $rows)"

      val out = pm.BatchDiscovery.discover(toDf(rows))
        .select("event_id", "case_id", "activity", "resource", "batch_id", "batch_type")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]), Option(r.getString(5))))
        .sortBy(_._1)

      // 1. preservation
      assert(out.map(_._1).toSeq == rows.map(_._1).sorted, clue("event ids not preserved"))

      val byBatch = out.filter(_._5.isDefined).groupBy(_._5.get)
      byBatch.foreach { case (bid, evs) =>
        // 2. well-formedness
        assert(evs.map(_._2).distinct.length >= 2, clue(s"batch $bid has <2 distinct cases"))
        assert(evs.map(e => (e._3, e._4)).distinct.length == 1,
          clue(s"batch $bid spans multiple (activity, resource)"))
        assert(evs.forall(e => Set("Parallel", "Sequential task-based",
          "Concurrent task-based")(e._6.get)), clue(s"batch $bid has unknown type"))
        assert(evs.map(_._6).distinct.length == 1, clue(s"batch $bid mixes type labels"))
      }
      // 3. dense renumbering
      val ids = byBatch.keySet
      assert(ids == (1L to ids.size).toSet, clue(s"batch ids not dense 1..N: $ids"))

      // 4. input-order invariance (cluster partition order is arbitrary)
      val shuffled = rnd.shuffle(rows)
      val out2 = pm.BatchDiscovery.discover(toDf(shuffled))
        .select("event_id", "batch_id", "batch_type").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.getString(2))))
        .sortBy(_._1)
      assert(out2.toSeq == out.map(e => (e._1, e._5, e._6)).toSeq,
        clue("discovery output depends on input row order"))
      Pinned.release(spark)
    }
  }

  test("K3 waiting-time decomposition invariants hold on random discovered logs") {
    val rnd = new scala.util.Random(8132026L)
    for (sample <- 1 to 6) {
      val rows = randomLog(rnd)
      def clue(msg: String) = s"[sample $sample] $msg (log: $rows)"
      val d = pm.BatchDiscovery.discover(toDf(rows))
      val wt = pm.WaitingTimes.batchCaseWT(d).collect()
      wt.foreach { r =>
        val total = r.getAs[Long]("total_wt_us")
        val parts = Seq("creation_wt_us", "ready_wt_us", "other_wt_us")
          .map(r.getAs[Long])
        // the decomposition is exact and each component non-negative
        assert(parts.forall(_ >= 0L), clue(s"negative WT component: $r"))
        assert(total == parts.sum, clue(s"WT decomposition not exact: $r"))
      }
      // one WT row per (batch, case): no duplicates, only batched cases
      val keys = wt.map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("case_id")))
      assert(keys.distinct.length == keys.length, clue("duplicate (batch, case) WT rows"))
      Pinned.release(spark)
    }
  }
}
