package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DETERMINISTIC sketches (SURVEY J6): count-min and HyperLogLog built on
  * md5 hashing so the ENTIRE sketch — cells, registers, and estimate — is
  * bit-reproducible in DuckDB. Spark's own sketch aggregates
  * (approx_count_distinct, percentile_approx) are engine-specific
  * internals the oracle can only bound (j6_sketch's self-check columns);
  * these two carry full hash-compared oracles.
  *
  * 100 TB posture: both sketches are the textbook bounded-state shapes —
  * the count-min grid is depth x width cells and the HLL register file is
  * m rows NO MATTER the corpus size, both partial-aggregable (map-side
  * combine does the heavy lifting; the final shuffle moves only the
  * sketch). Queries against the sketch broadcast it.
  */
object Sketches {
  // ---------------------------------------------------------------- count-min
  /** Count-min depth (independent hash rows; seeds CmsSeed0 + r). */
  val CmsDepth = 4
  /** Count-min width (cells per row). Error bound: est - exact <= e*N/width
    * with probability 1 - (1/2)^depth (Cormode & Muthukrishnan 2005). */
  val CmsWidth = 256
  val CmsSeed0 = 21

  /** Sketch cells for a token multiset: one row per (r, cell) with the
    * summed count of all tokens hashing there — at most depth*width rows
    * total, regardless of corpus size. */
  def cmsSketch(toks: DataFrame, tokCol: String = "tok"): DataFrame = {
    import toks.sparkSession.implicits._
    toks.select(posexplode(array((0 until CmsDepth).map { r =>
      pmod(Dedup.md5Hash32(CmsSeed0 + r, col(tokCol)), lit(CmsWidth.toLong))
    }: _*)).as(Seq("r", "cell")))
      .groupBy($"r".cast("long").as("r"), $"cell")
      .agg(count(lit(1)).as("n"))
  }

  /** Point-query the sketch for the corpus's top-k tokens: the count-min
    * estimate (min over the depth rows' cells) beside the exact count —
    * est >= exact always (one-sided error), the self-check the spec pins.
    * The sketch side is depth*width rows, broadcast into the lookup. */
  def cmsTopTokens(docs: DataFrame, k: Int = 20): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = Dedup.tokens(docs).select($"tok")
    val sketch = cmsSketch(toks)
    val top = toks.groupBy($"tok").agg(count(lit(1)).as("exact_n"))
      .orderBy($"exact_n".desc, $"tok").limit(k)
    val probes = top.select($"tok", $"exact_n",
      posexplode(array((0 until CmsDepth).map { r =>
        pmod(Dedup.md5Hash32(CmsSeed0 + r, $"tok"), lit(CmsWidth.toLong))
      }: _*)).as(Seq("r", "cell")))
      .select($"tok", $"exact_n", $"r".cast("long").as("r"), $"cell")
    probes.join(broadcast(sketch), Seq("r", "cell"))
      .groupBy($"tok", $"exact_n")
      .agg(min($"n").as("cms_n"))
      .select($"tok", $"exact_n", $"cms_n",
        ($"cms_n" >= $"exact_n").cast("long").as("no_undercount"))
  }

  // ---------------------------------------------------------------- KMV
  /** KMV sketch size (minimum hash values kept per set). */
  val KmvK = 64
  val KmvSeed = 41
  /** Hash space size for the KMV estimator ((k-1)·2^32 / h_k). */
  val KmvSpace: Long = 1L << 32

  /** K-minimum-values set sketches + the KMV set-operation estimators
    * (Beyer et al., SIGMOD 2007): distinct cardinality, union, and
    * INTERSECTION between two sets — the set-expression sketch HLL alone
    * can't provide (HLL unions; it cannot intersect). Sets here: the
    * distinct shingle (word 3-gram) vocabularies of two languages' docs —
    * "how much does corpus B's phrasing overlap corpus A's?", the
    * cross-corpus contamination / redundancy probe.
    *
    * Everything is deterministic and integral: sketches are the k smallest
    * distinct md5 hashes (total order, no ties), estimates are single
    * floor divisions of exact longs — (k−1)·2^32 // h_k for cardinality,
    * |sketch_∩| · est_union // k for the intersection — so the DuckDB
    * oracle reproduces sketch contents and every estimate bit-for-bit.
    * Exact |A| and |B| ride along as the self-check columns (cheap at
    * harness scale; at 100 TB a caller would drop them — the sketches are
    * the product).
    *
    * 100 TB posture: a KMV sketch is an order-statistic — per-partition
    * top-k then global top-k (TakeOrdered, no full sort); every estimator
    * input is a k-row frame. */
  def kmvIntersect(docs: DataFrame, langA: String = "en", langB: String = "de",
                   k: Int = KmvK): DataFrame = {
    import docs.sparkSession.implicits._
    def hashSet(lang: String): DataFrame =
      Dedup.shingleArrays(docs.filter($"lang" === lang))
        .select(explode($"shings").as("s"))
        .select(Dedup.md5Hash32(KmvSeed, $"s").as("h"))
        .distinct()
    val hsA = hashSet(langA)
    val hsB = hashSet(langB)
    val ska = hsA.orderBy($"h").limit(k)
    val skb = hsB.orderBy($"h").limit(k)
    // k-min of the union: merge the two sketches, dedup, re-take k — the
    // standard KMV merge (identical to sketching A ∪ B directly)
    val unionK = ska.union(skb).distinct().orderBy($"h").limit(k)
    val kthA = ska.agg(max($"h").as("kth_a"), count(lit(1)).as("ka"))
    val kthB = skb.agg(max($"h").as("kth_b"), count(lit(1)).as("kb"))
    val kthU = unionK.agg(max($"h").as("kth_u"), count(lit(1)).as("ku"))
    // hashes of the union k-min present in BOTH sketches
    val interInSketch = unionK
      .join(ska.select($"h".as("h1")), $"h" === $"h1", "left_semi")
      .join(skb.select($"h".as("h2")), $"h" === $"h2", "left_semi")
      .agg(count(lit(1)).as("inter_k"))
    // (k−1)·2^32 // h_k; a sketch smaller than k IS its whole set
    def est(cnt: String, kth: String): Column =
      when(col(cnt) < k, col(cnt))
        .otherwise(expr(s"((${k - 1} * ${KmvSpace}L) div $kth)"))
    kthA.crossJoin(broadcast(kthB)).crossJoin(broadcast(kthU))
      .crossJoin(broadcast(interInSketch))
      .crossJoin(broadcast(hsA.agg(count(lit(1)).as("n_a_exact"))))
      .crossJoin(broadcast(hsB.agg(count(lit(1)).as("n_b_exact"))))
      .select(
        lit(k.toLong).as("k"),
        $"n_a_exact", $"n_b_exact", $"inter_k", $"ku",
        est("ka", "kth_a").as("est_a"),
        est("kb", "kth_b").as("est_b"),
        est("ku", "kth_u").as("est_union"))
      .select($"k", $"n_a_exact", $"n_b_exact", $"inter_k",
        $"est_a", $"est_b", $"est_union",
        // denominators are the UNION sketch's actual size (= min(k, |A∪B|):
        // below k the sketch is the whole union and the ratio is exact)
        when($"ku" === 0L, 0L)
          .otherwise(expr("(inter_k * 1000000) div ku")).as("jaccard_e6"),
        when($"ku" === 0L, 0L)
          .otherwise(expr("(inter_k * est_union) div ku")).as("est_inter"))
  }

  // ---------------------------------------------------------------- HLL
  /** Register-count exponent: m = 2^HllB registers. */
  val HllB = 6
  val HllM = 1 << HllB // 64
  val HllSeed = 31
  /** alpha_64 * m^2 (Flajolet et al. 2007, m >= 64). */
  val HllAlphaM2: Double = (0.709 * HllM * HllM)
  /** Registers hold rho in [1, 27] (26 payload bits); the indicator sum is
    * scaled by 2^27 so every term 2^(27-rho) is an exact BIGINT. */
  val HllRhoMax = 27
  val HllScale: Long = 1L << HllRhoMax

  /** rho = leading-zero count of the 26-bit payload + 1, computed in PURE
    * INTEGER bit arithmetic (smear the MSB downward, then bit_count) —
    * floor(log2(v)) in doubles is exactly the off-by-one trap the engines
    * would disagree on. v = 0 (all payload bits zero) gives rho = 27. */
  private def rho(v: Column): Column = {
    val s1 = v.bitwiseOR(shiftright(v, 1))
    val s2 = s1.bitwiseOR(shiftright(s1, 2))
    val s3 = s2.bitwiseOR(shiftright(s2, 4))
    val s4 = s3.bitwiseOR(shiftright(s3, 8))
    val s5 = s4.bitwiseOR(shiftright(s4, 16))
    lit(HllRhoMax.toLong) - bit_count(s5).cast("long")
  }

  /** (bucket, rho) of one item expression — the per-row HLL kernel, shared
    * by the batch register file and the streaming windowed variant.
    * Bucket = top HllB bits of the 32-bit md5 head; rho = leading-zero
    * count of the remaining 26 payload bits + 1. */
  def bucketAndRho(item: Column): (Column, Column) = {
    val h = Dedup.md5Hash32(HllSeed, item)
    (shiftright(h, 32 - HllB),
      rho(h.bitwiseAND(lit((1L << (32 - HllB)) - 1L))))
  }

  /** Register file over arbitrary string items: (bucket, max_rho), at most
    * m rows. */
  def hllRegisters(items: DataFrame, itemCol: String = "item"): DataFrame = {
    import items.sparkSession.implicits._
    val (bucket, r) = bucketAndRho(col(itemCol))
    items.select(bucket.as("bucket"), r.as("rho"))
      .groupBy($"bucket").agg(max($"rho").as("max_rho"))
  }

  /** One-row deterministic-HLL summary over the distinct (doc_id, token)
    * pairs of a corpus: register stats, the scaled indicator sum (exact
    * BIGINT — absent registers contribute 2^27 each), the raw HLL estimate
    * in integer millionths (one IEEE division of exact integers — same
    * bits in any engine), the exact distinct count, and the in-query
    * error self-check (|est - exact| <= 3 standard errors; se = 1.04/8).
    *
    * The item stream sits far above the 2.5m linear-counting cutoff at
    * every harness SF (27k+ vs 160), so the RAW estimator is the correct
    * regime — the small-range correction needs ln(), whose libm rounding
    * is engine-specific, and is deliberately out of scope. */
  def hllDistinctPairs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val items = Dedup.tokens(docs)
      .select(concat($"doc_id".cast("string"), lit(":"), $"tok").as("item"))
      .distinct()
    val regs = hllRegisters(items)
    val exact = items.agg(count(lit(1)).as("exact_distinct"))
    regs.agg(
      count(lit(1)).as("n_buckets_present"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllRhoMax - max_rho AS INT))"))
        .as("sum_present"))
      .crossJoin(broadcast(exact))
      .select(
        lit(HllM.toLong).as("m"),
        $"n_buckets_present",
        ($"sum_present" + (lit(HllM.toLong) - $"n_buckets_present") * HllScale)
          .as("sum_scaled"),
        $"exact_distinct")
      .select($"m", $"n_buckets_present", $"sum_scaled", $"exact_distinct",
        round(lit(HllAlphaM2 * HllScale.toDouble) / $"sum_scaled".cast("double") * 1000000d)
          .cast("long").as("hll_est_e6"))
      .select($"m", $"n_buckets_present", $"sum_scaled", $"exact_distinct", $"hll_est_e6",
        // |est - exact| <= 3 * (1.04/sqrt(64)) * exact, all in exact e6
        // BIGINTs (3 * 0.13 * 1e6 = 390000)
        (abs($"hll_est_e6" - $"exact_distinct" * 1000000L) <=
          $"exact_distinct" * 390000L).cast("long").as("within_3se"))
  }
}
