package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: explicit key salting for hot-key equi-joins.
  *
  * When one join key carries a disproportionate share of the rows (a hot
  * user, a dominant event type), a plain shuffle join lands the whole hot
  * key in ONE reducer task — the classic straggler that AQE's skew-join
  * splitting only fixes for sort-merge joins after a stage has already
  * materialized its skewed map output. Salting fixes it at plan level:
  *
  *   - fact side: add `salt = pmod(hash(entire row), n)` — any per-row value
  *     works, the join result is salt-independent; hashing the full row
  *     spreads even a single hot key's rows uniformly over n sub-keys;
  *   - dim side: explode each row into n replicas, one per salt value;
  *   - join on (keys :+ salt): each fact row matches exactly the one
  *     replica carrying its salt, so the result multiset is IDENTICAL to
  *     the unsalted join while the hot key's work fans out over n tasks.
  *
  * Cost: the dim side is shuffled n-fold (and must NOT be broadcast —
  * salting and broadcasting are alternatives; broadcast when the dim fits,
  * salt when both sides are too big to broadcast AND a key is hot). Inner
  * and left_outer semantics are exact: every fact row has exactly one salt,
  * so unmatched fact rows null-extend once, as unsalted.
  */
object SkewOps {
  /** Default salt fan-out: enough to split a hot key across a 32-slot
    * stage; a cluster run sizes this to ~2-4x the executor-core count. */
  val DefaultSalt = 16

  /** Equi-join `fact` with `dim` on `keys`, salted `n` ways.
    * @param joinType "inner" or "left_outer" (fact-preserving). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 n: Int = DefaultSalt, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"saltedJoin supports inner/left_outer, got $joinType")
    require(!(fact.columns ++ dim.columns).contains("__salt"),
      "saltedJoin: input already has a __salt column")
    // hash(all fact columns) spreads rows of a single hot key; pmod keeps
    // the salt in [0, n) for negative hashes
    val salted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(n)))
    // shuffle_hash hint: salting and broadcasting are ALTERNATIVES — if
    // the dim were broadcastable you would not salt, and a planner that
    // auto-broadcasts the replicated dim would silently skip the salted
    // shuffle this operator exists to produce (pure n-fold overhead).
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1)))).hint("shuffle_hash")
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
