package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for global-order windows. A bare
  * `Window.orderBy(...)` moves the whole table through ONE task (the
  * round-1 `WindowExec: No Partition Defined` warnings) — correct at test
  * scale, dead at 100 TB. The shape here is the classic scale-safe form:
  * range-partition on the order key, rank locally per partition, then add
  * per-partition offsets computed from a tiny (numPartitions-row) count
  * table. Two extra exchanges, no single-task stage. */
object Dist {
  /** Default range-partition count: the session's shuffle parallelism
    * (bounded below by 1), so a cluster-sized `spark.sql.shuffle.partitions`
    * scales the rank stage with it instead of pinning a magic 32. */
  private def defaultParts(df: DataFrame): Int =
    math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Exact global dense row rank (1-based) by `order`, computed without a
    * single-partition window. `order` must be a total order (include a
    * unique tiebreak column) for deterministic ids. `numParts <= 0` (the
    * default) derives the partition count from the session's
    * `spark.sql.shuffle.partitions`. */
  def withGlobalRank(df: DataFrame, rankCol: String, order: Seq[Column],
                     numParts: Int = 0): DataFrame = {
    val parts = if (numParts > 0) numParts else defaultParts(df)
    val parted = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    // local rank within each range partition (parallel window on __pid)
    //
    // PERSISTED — correctness, not speed. `local` feeds two plan branches
    // (the offsets aggregate below and the final join), and nothing
    // guarantees Spark evaluates the shared subtree once: when the
    // upstream's partition layout is not stable across evaluations (e.g. an
    // anti-join over a frame being cached concurrently), the branches can
    // see DIFFERENT spark_partition_id assignments — offsets computed for
    // one layout, local ranks joined from another, yielding duplicate and
    // shifted global ranks (caught at sf0.1 in discoverFull's task-side
    // renumbering: 12443 keys -> 12265 distinct ranks). The cache pins ONE
    // materialization; any single consistent (pid, lrn) assignment gives
    // the exact total-order rank. Partition-level recompute after eviction
    // is safe: InMemoryRelation holds one child RDD, so recomputed blocks
    // reuse the same shuffle output.
    val local = Pinned.track(parted.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*)).cast("long")))
    // per-partition row counts -> prefix-sum offsets (numParts rows: the
    // single-partition window here is bounded and deliberate)
    val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }

  /** Exact global running (prefix-inclusive) sums of `sumCols` by `order`,
    * computed with the same two-phase shape as [[withGlobalRank]]: local
    * cumsum per range partition, plus per-partition offsets from a tiny
    * (numPartitions-row) aggregate — no single-task window over the data
    * grain. `order` must be a total order for deterministic output. */
  def withGlobalCumSums(df: DataFrame, sumCols: Seq[String], order: Seq[Column],
                        numParts: Int = 0): DataFrame = {
    val parts = if (numParts > 0) numParts else defaultParts(df)
    val parted = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    // same persistence rationale as withGlobalRank: both branches must see
    // ONE spark_partition_id assignment
    val local = Pinned.track(sumCols.foldLeft(parted) { (acc, c) =>
      acc.withColumn(s"__l_$c", sum(col(c)).over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    })
    val offsets = local.groupBy(col("__pid"))
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .select(col("__pid") +: sumCols.map(c => col(s"sum($c)").as(s"__s_$c")): _*)
      .select(col("__pid") +: sumCols.map { c =>
        coalesce(sum(col(s"__s_$c")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as(s"__o_$c")
      }: _*)
    sumCols.foldLeft(local.join(broadcast(offsets), Seq("__pid"))) { (acc, c) =>
      acc.withColumn(s"cum_$c", col(s"__o_$c") + col(s"__l_$c"))
        .drop(s"__o_$c", s"__l_$c")
    }.drop("__pid")
  }

  /** Exact ntile(k) by `order` from the distributed global rank — identical
    * result to `ntile(k) over (order by ...)` (first n%k tiles get
    * ceil(n/k) rows), without the all-rows-to-one-task WindowExec. */
  def ntileBy(df: DataFrame, k: Int, tileCol: String, order: Seq[Column],
              numParts: Int = 0): DataFrame = {
    val ranked = withGlobalRank(df, "__rank", order, numParts)
    val total = ranked.groupBy().agg(count(lit(1)).as("__n"))
    // Spark's `/` is ALWAYS double division, even on integral columns —
    // every quotient here must go through `idiv` or tile boundaries drift
    // whenever k does not divide n (caught by DistSpec; the oracle query's
    // n happens to divide evenly).
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val n = col("__n"); val r0 = col("__rank") - 1
    val small = idiv(n, lit(k))            // floor tile size
    val bigger = n % k                     // first `bigger` tiles get small+1
    val cut = bigger * (small + 1)         // rows covered by the big tiles
    ranked.crossJoin(broadcast(total))
      .withColumn(tileCol,
        when(lit(k) >= n, col("__rank"))   // degenerate: every row its own tile
          .when(r0 < cut, idiv(r0, small + 1) + 1)
          .otherwise(bigger + idiv(r0 - cut, small) + 1))
      .drop("__rank", "__n")
  }
}
